#!/usr/bin/env python3
"""Cross-run perf ledger: one committed JSONL with each round's per-query
bench, so a 3-round slow creep (invisible to benchdiff's pairwise diff)
fails as loudly as a single-round regression.

Usage:
  python3 tools/perfledger.py add <label> <bench.json | gitref:path>[,more...]
      Append one row {"label", "sf", "total", "queries", "provenance"} to
      PERF_LEDGER.jsonl (replaces an existing row with the same label, so
      re-running a round's bench updates in place). A comma-separated list
      of artifacts is min-merged per query (the benchdiff adjudication
      path) and every input is named in the row's provenance — a ledger
      total and a raw artifact total may differ ONLY via a min-merge the
      row itself describes. Inputs must be COMMITTED (tracked and
      unmodified, or gitref:path): an untracked/dirty artifact is refused
      so the ledger can never cite evidence the repo doesn't carry.
      --allow-dirty overrides, marking the row {"dirty": true}.
  python3 tools/perfledger.py report
      Print per-query trends over the ledger and exit 1 on CREEP: the
      latest value >= 1.5x the ledger minimum AND >= 0.3 s absolute above
      it AND the last three rounds are non-decreasing (a one-round spike
      is benchdiff's job; this catches the slow kind that never trips a
      pairwise gate).

Rows with different `sf` are never compared. Dev-only tool — not part of
the shipped library.
"""
import json
import subprocess
import sys

LEDGER = "PERF_LEDGER.jsonl"
RATIO = 1.5
ABS_FLOOR = 0.3


def load_artifact(src):
    # plain file first; a `gitref:path` spec falls through to `git show`
    try:
        with open(src) as f:
            return json.load(f)
    except FileNotFoundError:
        out = subprocess.run(["git", "show", src],
                             capture_output=True, text=True)
        if out.returncode != 0:
            sys.exit(f"perfledger: cannot read {src} as file or git ref")
        return json.loads(out.stdout)


def read_ledger():
    try:
        with open(LEDGER) as f:
            return [json.loads(line) for line in f if line.strip()]
    except FileNotFoundError:
        return []


def check_committed(src):
    """A plain-file input must be git-tracked AND unmodified; a
    gitref:path input is committed by definition. Returns an error
    string, or None if clean."""
    if ":" in src and not src.startswith(("./", "/")):
        return None  # gitref:path — resolvable only from history
    tracked = subprocess.run(["git", "ls-files", "--error-unmatch", src],
                             capture_output=True, text=True)
    if tracked.returncode != 0:
        return f"{src} is not git-tracked"
    status = subprocess.run(["git", "status", "--porcelain", "--", src],
                            capture_output=True, text=True)
    if status.stdout.strip():
        return f"{src} has uncommitted modifications"
    return None


def cmd_add(label, spec, allow_dirty=False):
    srcs = [s for s in spec.split(",") if s.strip()]
    problems = [p for p in (check_committed(s) for s in srcs) if p]
    if problems and not allow_dirty:
        sys.exit("perfledger: REFUSED — ledger rows must cite committed "
                 "evidence:\n  " + "\n  ".join(problems) +
                 "\ncommit the artifact(s) first, or pass --allow-dirty "
                 "to record a self-confessed dirty row")
    arts = [load_artifact(s) for s in srcs]
    sfs = {a.get("sf", "?") for a in arts}
    if len(sfs) > 1:
        sys.exit(f"perfledger: inputs disagree on sf: {sorted(sfs)}")
    # per-query min across artifacts; 'failed' only if failed everywhere
    qs = {}
    for name in {n for a in arts for n in a["queries"]}:
        vals = [a["queries"][name] for a in arts
                if name in a["queries"] and a["queries"][name] != "failed"]
        qs[name] = min(vals) if vals else "failed"
    total = sum(v for v in qs.values() if v != "failed")
    prov = {"inputs": srcs,
            "merge": f"per-query min over {len(srcs)} artifact(s)"}
    if problems:
        prov["dirty"] = True
        print("perfledger: WARNING — recording DIRTY row: "
              + "; ".join(problems))
    row = {"label": label, "sf": sfs.pop(),
           "total": round(total, 2), "queries": qs, "provenance": prov}
    rows = [r for r in read_ledger() if r["label"] != label]
    rows.append(row)
    with open(LEDGER, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"perfledger: {label} recorded "
          f"({len(qs)} queries, total {total:.1f}s, sf={row['sf']}, "
          f"{len(srcs)} input(s))")


def cmd_report():
    rows = read_ledger()
    if len(rows) < 2:
        print("perfledger: fewer than 2 rows — nothing to trend")
        return
    # trend only rows at the same sf as the latest
    sf = rows[-1]["sf"]
    rows = [r for r in rows if r["sf"] == sf]
    labels = [r["label"] for r in rows]
    latest = rows[-1]["queries"]
    creep = []
    for name in sorted(latest):
        series = [(r["label"], r["queries"].get(name)) for r in rows]
        vals = [(lb, v) for lb, v in series
                if isinstance(v, (int, float))]
        if len(vals) < 3 or not isinstance(latest.get(name), (int, float)):
            continue
        lo_label, lo = min(vals, key=lambda t: t[1])
        cur = latest[name]
        tail = [v for _, v in vals[-3:]]
        monotonic = all(a <= b + 1e-9 for a, b in zip(tail, tail[1:]))
        if cur >= lo * RATIO and cur - lo >= ABS_FLOOR and monotonic:
            path = " -> ".join(f"{lb}:{v:.2f}" for lb, v in vals)
            creep.append(f"  ✗ {name}: min {lo:.2f}s @{lo_label}, "
                         f"now {cur:.2f}s ({cur/lo:.1f}x)  [{path}]")
    totals = "  ".join(f"{r['label']}:{r['total']}" for r in rows)
    print(f"perfledger: {len(rows)} rows at sf={sf}  totals: {totals}")
    if creep:
        print(f"CREEP (>{RATIO}x ledger-min, >{ABS_FLOOR}s, "
              f"non-decreasing last 3 rounds) ({len(creep)}):")
        print("\n".join(creep))
        sys.exit(1)
    print("no multi-round creep outside the noise envelope")


def main():
    args = [a for a in sys.argv[1:] if a != "--allow-dirty"]
    allow_dirty = "--allow-dirty" in sys.argv
    if len(args) >= 3 and args[0] == "add":
        cmd_add(args[1], args[2], allow_dirty)
    elif len(args) >= 1 and args[0] == "report":
        cmd_report()
    else:
        sys.exit(__doc__)


if __name__ == "__main__":
    main()
