#!/usr/bin/env python3
"""Bench-regression gate: diff a fresh bench artifact against the last
committed one and fail loudly on per-query regressions — perf drift
should be as loud as correctness drift (FixtureSchemaSpec) became in r9.

Usage:
  python3 tools/benchdiff.py [new.json[,new2.json,...]] [old.json[,old2.json,...]]

Defaults: new = ./bench_last.json, old = git show HEAD:bench_last.json.
Each file is the per-query line Bench writes:
  {"metric":"per_query","queries":{"q_x":sec,...},...}

Either side may be a COMMA-SEPARATED list of artifacts: they are merged
per query by MINIMUM (a query failed only if it failed in every run).
This is the min-of-N adjudication path — run the bench (or an isolated
SPARK_GRAFT_BENCH_ONLY probe) N times into N files and diff the merged
minimum, so a host contention spike in any single run cannot flag a
regression and "probably noise" stops being a human judgment call.

A row regresses when BOTH hold (the documented host-noise envelope —
this VM shows sporadic contention spikes, so a ratio alone over-fires
on sub-second rows):
  - new >= 1.5x old
  - new - old >= 0.3 s absolute

Exit 1 if any query regressed or went missing/failed; prints a summary
either way (improvements included, so wins are recorded too). Dev-only
tool — not part of the shipped library.
"""
import json
import subprocess
import sys

RATIO = 1.5
ABS_FLOOR = 0.3


def load(path):
    with open(path) as f:
        return json.load(f)


def merge_min(arts, names=None):
    """Merge per-query dicts by minimum; 'failed' only if failed in all.

    The merged artifact gets its OWN provenance naming the inputs and the
    min-merge rule — inheriting arts[0]'s provenance wholesale would
    misdescribe the merge (e.g. claim 1 invocation for a min-of-3), which
    contradicts the provenance contract in Bench.scala.
    """
    out = dict(arts[0])
    qs = dict(arts[0]["queries"])
    for art in arts[1:]:
        for name, v in art["queries"].items():
            cur = qs.get(name)
            if cur is None or cur == "failed":
                qs[name] = v
            elif v != "failed" and v < cur:
                qs[name] = v
    out["queries"] = qs
    if len(arts) > 1:
        out["provenance"] = {
            "inputs": names if names else [f"artifact[{i}]"
                                           for i in range(len(arts))],
            "merge": f"per-query min over {len(arts)} artifact(s)",
        }
    return out


def load_many(spec):
    paths = [p for p in spec.split(",") if p]
    merged = merge_min([load(p) for p in paths], names=paths)
    name = paths[0] if len(paths) == 1 else f"min-of-{len(paths)}({spec})"
    return merged, name


def load_old(arg):
    if arg is not None:
        return load_many(arg)
    out = subprocess.run(
        ["git", "show", "HEAD:bench_last.json"],
        capture_output=True, text=True)
    if out.returncode != 0:
        print("benchdiff: no committed bench_last.json at HEAD — "
              "nothing to diff against (first run is self-baselining)")
        sys.exit(0)
    return json.loads(out.stdout), "HEAD:bench_last.json"


def main():
    new_spec = sys.argv[1] if len(sys.argv) > 1 else "bench_last.json"
    old_arg = sys.argv[2] if len(sys.argv) > 2 else None
    new, new_path = load_many(new_spec)
    old, old_name = load_old(old_arg)
    nq, oq = new["queries"], old["queries"]

    # a SPARK_GRAFT_BENCH_ONLY probe legitimately covers a few queries —
    # only a (near-)full run can assert that nothing went missing
    full_run = len(set(nq) & set(oq)) >= 0.9 * len(oq)
    if not full_run:
        print(f"benchdiff: subset run ({len(nq)} of {len(oq)} queries) — "
              "comparing the intersection only")

    bad = []
    improved = []
    for name in sorted(oq):
        if name not in nq:
            if full_run:
                bad.append(f"  ✗ {name}: present at {old_name}, MISSING now")
            continue
        o, n = oq[name], nq[name]
        if n == "failed":
            bad.append(f"  ✗ {name}: FAILED (was {o if o == 'failed' else f'{o:.2f}s'})")
            continue
        if o == "failed":
            improved.append(f"  ✓ {name}: was failed, now {n:.2f}s")
            continue
        if n >= o * RATIO and n - o >= ABS_FLOOR:
            bad.append(f"  ✗ {name}: {o:.2f}s → {n:.2f}s ({n/o:.1f}×)")
        elif o >= n * RATIO and o - n >= ABS_FLOOR:
            improved.append(f"  ✓ {name}: {o:.2f}s → {n:.2f}s")
    added = sorted(set(nq) - set(oq))

    tot_o = sum(v for v in oq.values() if v != "failed")
    tot_n = sum(v for v in nq.values() if v != "failed")
    print(f"benchdiff: {new_path} vs {old_name}  "
          f"total {tot_o:.1f}s → {tot_n:.1f}s  "
          f"({len(nq)} queries, {len(added)} new)")
    if improved:
        print(f"improved ({len(improved)}):")
        print("\n".join(improved))
    if added:
        print(f"new queries: {', '.join(added)}")
    if bad:
        print(f"REGRESSIONS (>{RATIO}× and >{ABS_FLOOR}s) ({len(bad)}):")
        print("\n".join(bad))
        print("if host contention is suspected, re-probe in isolation: "
              "SPARK_GRAFT_BENCH_ONLY=<names> graft.Bench")
        sys.exit(1)
    print("no per-query regressions outside the noise envelope")


if __name__ == "__main__":
    main()
