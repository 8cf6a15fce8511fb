#!/usr/bin/env python3
"""Per-query scale-up table: ratio of two bench artifacts at different
scale factors (default sf0.1 -> sf1, i.e. 10x data), flagging outliers.

Usage:
  python3 tools/scaletable.py [small.json] [big.json] [--md] [--bar N]

A query is an OUTLIER when big >= BAR x small (default 15 on 10x data —
linear scaling with some fixed-cost amortization headroom) AND the
absolute delta exceeds 0.5 s (sub-second rows are noise-dominated).
Prints the full table sorted by ratio descending; exit 1 if outliers
exist. Dev-only tool — not part of the shipped library.
"""
import json
import sys

ABS_FLOOR = 0.5


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    md = "--md" in sys.argv
    bar = 15.0
    if "--bar" in sys.argv:
        bar = float(sys.argv[sys.argv.index("--bar") + 1])
    small_p = args[0] if args else "bench_last.json"
    big_p = args[1] if len(args) > 1 else "bench_sf1.json"
    small = json.load(open(small_p))["queries"]
    big = json.load(open(big_p))["queries"]
    rows = []
    for name in sorted(set(small) & set(big)):
        s, b = small[name], big[name]
        if s == "failed" or b == "failed":
            rows.append((float("inf"), name, s, b, "FAILED"))
            continue
        ratio = b / s if s > 0 else float("inf")
        flag = "OUTLIER" if (ratio >= bar and b - s >= ABS_FLOOR) else ""
        rows.append((ratio, name, s, b, flag))
    rows.sort(reverse=True)
    ts = sum(v for v in small.values() if v != "failed")
    tb = sum(v for v in big.values() if v != "failed")
    if md:
        print(f"| query | {small_p} | {big_p} | ratio | |")
        print("|---|---|---|---|---|")
        for r, n, s, b, f in rows:
            sv = s if isinstance(s, str) else f"{s:.2f}"
            bv = b if isinstance(b, str) else f"{b:.2f}"
            rv = "-" if r == float("inf") else f"{r:.1f}x"
            print(f"| {n} | {sv} | {bv} | {rv} | {f} |")
        print(f"| TOTAL | {ts:.1f} | {tb:.1f} | {tb/ts:.1f}x | |")
    else:
        for r, n, s, b, f in rows:
            sv = s if isinstance(s, str) else f"{s:7.2f}"
            bv = b if isinstance(b, str) else f"{b:7.2f}"
            rv = "   -" if r == float("inf") else f"{r:5.1f}x"
            print(f"{n:28s} {sv} -> {bv}  {rv}  {f}")
        print(f"{'TOTAL':28s} {ts:7.1f} -> {tb:7.1f}  {tb/ts:5.1f}x")
    n_out = sum(1 for r in rows if r[4])
    print(f"{n_out} outliers (>= {bar}x and >= {ABS_FLOOR}s)")
    sys.exit(1 if n_out else 0)


if __name__ == "__main__":
    main()
