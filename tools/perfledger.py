#!/usr/bin/env python3
"""Cross-run perf ledger: one committed JSONL with each round's per-query
bench, so a 3-round slow creep (invisible to benchdiff's pairwise diff)
fails as loudly as a single-round regression.

Usage:
  python3 tools/perfledger.py add <label> <bench.json | gitref:path>
      Append one row {"label", "sf", "total", "queries"} to
      PERF_LEDGER.jsonl (replaces an existing row with the same label, so
      re-running a round's bench updates in place).
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


def cmd_add(label, src):
    art = load_artifact(src)
    qs = art["queries"]
    total = sum(v for v in qs.values() if v != "failed")
    row = {"label": label, "sf": art.get("sf", "?"),
           "total": round(total, 2), "queries": qs}
    rows = [r for r in read_ledger() if r["label"] != label]
    rows.append(row)
    with open(LEDGER, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"perfledger: {label} recorded "
          f"({len(qs)} queries, total {total:.1f}s, sf={row['sf']})")


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
    if len(sys.argv) >= 4 and sys.argv[1] == "add":
        cmd_add(sys.argv[2], sys.argv[3])
    elif len(sys.argv) >= 2 and sys.argv[1] == "report":
        cmd_report()
    else:
        sys.exit(__doc__)


if __name__ == "__main__":
    main()
