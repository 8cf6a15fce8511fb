#!/usr/bin/env bash
# Interleaved A/B bench: HEAD vs a named ref commit, alternated on one box.
#
# Why this exists (r15→r16 lesson): this host's envelope drifts ±5% across
# hours, so two single-invocation totals from different rounds CANNOT
# attribute a regression to code. The settled methodology — used to prove
# r15's "14% regression" was environmental — is to build BOTH class trees
# once, then alternate full Bench invocations A,B,A,B,... within one
# session and min-merge per side. Host drift hits both sides equally;
# whatever difference survives the min-merge is code.
#
# Run this whenever a round's headline total moves >5% vs the previous
# committed BENCH artifact (the r16 verdict made it the standard), BEFORE
# claiming either a regression or a win.
#
# Usage: tools/benchab.sh <refCommit> [sfDir] [rounds] [outJson]
#   refCommit  commit to compare HEAD against (e.g. the last round tag)
#   sfDir      fixture dir            (default /root/testdata/sf0.1)
#   rounds     A/B alternations       (default 3 → 3 invocations per side)
#   outJson    comparison artifact    (default target/benchab.json)
#
# Each invocation is a normal multi-pass Bench (per-query minima inside),
# run ALONE; the merge takes per-query minima ACROSS invocations per side
# and reports head_total, ref_total, ratio, worst per-query regressions,
# with full provenance (commits, host, timestamps) in the artifact.
set -euo pipefail

REF=${1:?usage: tools/benchab.sh <refCommit> [sfDir] [rounds] [outJson]}
SF=${2:-/root/testdata/sf0.1}
ROUNDS=${3:-3}
OUT=${4:-target/benchab.json}
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"

HEAD_SHA=$(git rev-parse HEAD)
REF_SHA=$(git rev-parse "$REF")
WORK=$(mktemp -d /tmp/benchab.XXXX)
trap 'git worktree remove --force "$WORK/ref" 2>/dev/null || true; rm -rf "$WORK"' EXIT

echo "[benchab] HEAD=$HEAD_SHA vs REF=$REF_SHA sf=$SF rounds=$ROUNDS" >&2

# Build both trees ONCE; snapshot classes so later compiles can't mutate
# classfiles under a running JVM (a known footgun on this host).
sbt -batch compile >/dev/null
cp -r target/scala-2.13/classes "$WORK/head_classes"
git worktree add --detach "$WORK/ref" "$REF_SHA" >/dev/null
(cd "$WORK/ref" && sbt -batch compile >/dev/null)
cp -r "$WORK/ref/target/scala-2.13/classes" "$WORK/ref_classes"

ADDOPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"

run_side() { # $1=classes dir  $2=out json
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_OUT="$2" \
    java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Xmx16g -cp "$1:/opt/spark/jars/*" graft.Bench >/dev/null 2>&1
}

for i in $(seq 1 "$ROUNDS"); do
  echo "[benchab] round $i/$ROUNDS: HEAD" >&2
  run_side "$WORK/head_classes" "$WORK/head_$i.json"
  echo "[benchab] round $i/$ROUNDS: REF" >&2
  run_side "$WORK/ref_classes" "$WORK/ref_$i.json"
done

python3 - "$WORK" "$ROUNDS" "$HEAD_SHA" "$REF_SHA" "$SF" "$OUT" <<'PY'
import json, sys, glob, time, socket
work, rounds, head_sha, ref_sha, sf, out = sys.argv[1:7]

def minmerge(side):
    qs = {}
    for f in sorted(glob.glob(f"{work}/{side}_*.json")):
        d = json.load(open(f))
        for q, t in d["queries"].items():
            qs[q] = min(qs.get(q, float("inf")), t)
    return qs

head, ref = minmerge("head"), minmerge("ref")
common = sorted(set(head) & set(ref))
only_head, only_ref = sorted(set(head) - set(ref)), sorted(set(ref) - set(head))
ht, rt = sum(head[q] for q in common), sum(ref[q] for q in common)
diffs = sorted(((head[q] - ref[q], q) for q in common), reverse=True)
report = {
    # per-side min-merged per-query seconds ride IN the artifact: the
    # work tree is deleted on exit, and a later bench_last refresh wants
    # these minima without re-running 6 invocations
    "head_queries": {q: round(t, 4) for q, t in sorted(head.items())},
    "ref_queries": {q: round(t, 4) for q, t in sorted(ref.items())},
    "head_commit": head_sha, "ref_commit": ref_sha, "sf_dir": sf,
    "rounds": int(rounds), "host": socket.gethostname(),
    "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    "methodology": ("interleaved full-Bench invocations alternating HEAD/REF "
                    "class snapshots on one box; per-query min across "
                    "invocations per side; totals over the common query set"),
    "common_queries": len(common),
    "head_total_s": round(ht, 1), "ref_total_s": round(rt, 1),
    "ratio_head_over_ref": round(ht / rt, 3) if rt else None,
    "only_in_head": only_head, "only_in_ref": only_ref,
    "top_regressions": [{"query": q, "delta_s": round(d, 2),
                         "head_s": round(head[q], 2), "ref_s": round(ref[q], 2)}
                        for d, q in diffs[:10] if d > 0.05],
    "top_improvements": [{"query": q, "delta_s": round(d, 2),
                          "head_s": round(head[q], 2), "ref_s": round(ref[q], 2)}
                         for d, q in reversed(diffs[-10:]) if d < -0.05],
}
json.dump(report, open(out, "w"), indent=1)
print(f"[benchab] common={len(common)} head={ht:.1f}s ref={rt:.1f}s "
      f"ratio={ht/rt:.3f} -> {out}")
PY
