#!/usr/bin/env bash
# Interleaved A/B SUBSET bench between two prebuilt class snapshots.
# The per-change iteration tool behind tools/benchab.sh's full-suite
# discipline: same alternation + per-side min-merge, but restricted via
# SPARK_GRAFT_BENCH_ONLY to the queries a change touches, so one A/B costs
# minutes instead of two hours. Use benchab.sh (full suite) for the
# round-level verdict artifact; use this while iterating.
#
# Usage: tools/benchab_subset.sh <headClasses> <refClasses> <q1,q2,...> [rounds] [outJson] [sfDir]
set -euo pipefail
HEADC=${1:?head classes dir}
REFC=${2:?ref classes dir}
QS=${3:?comma-separated query names}
ROUNDS=${4:-3}
OUT=${5:-/tmp/benchab_subset.json}
SF=${6:-/root/testdata/sf0.1}
WORK=$(mktemp -d /tmp/absub.XXXX)

ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"

run_side() { # $1=classes dir  $2=out json
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_OUT="$2" \
    SPARK_GRAFT_BENCH_ONLY="$QS" \
    java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Xmx16g -cp "$1:/opt/spark/jars/*" graft.Bench >/dev/null 2>&1
}

for i in $(seq 1 "$ROUNDS"); do
  echo "[absub] round $i/$ROUNDS: HEAD" >&2
  run_side "$HEADC" "$WORK/head_$i.json"
  echo "[absub] round $i/$ROUNDS: REF" >&2
  run_side "$REFC" "$WORK/ref_$i.json"
done

python3 - "$WORK" "$OUT" <<'PY'
import json, sys, glob
work, out = sys.argv[1:3]
def minmerge(side):
    qs = {}
    for f in sorted(glob.glob(f"{work}/{side}_*.json")):
        d = json.load(open(f))
        for q, t in d["queries"].items():
            if isinstance(t, str): continue
            qs[q] = min(qs.get(q, float("inf")), t)
    return qs
head, ref = minmerge("head"), minmerge("ref")
common = sorted(set(head) & set(ref))
ht, rt = sum(head[q] for q in common), sum(ref[q] for q in common)
rows = sorted(common, key=lambda q: head[q]-ref[q])
rep = {"per_query": {q: {"head": round(head[q],3), "ref": round(ref[q],3),
                          "ratio": round(head[q]/ref[q],3)} for q in rows},
       "head_total": round(ht,2), "ref_total": round(rt,2),
       "ratio": round(ht/rt,3)}
json.dump(rep, open(out,"w"), indent=1)
for q in rows:
    print(f"{q:28s} head={head[q]:6.2f} ref={ref[q]:6.2f} ratio={head[q]/ref[q]:5.2f}")
print(f"TOTAL head={ht:.2f} ref={rt:.2f} ratio={ht/rt:.3f} -> {out}")
PY
rm -rf "$WORK"
