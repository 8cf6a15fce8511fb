#!/usr/bin/env python3
"""Engine-vs-engine verify-dump compare (r14): diff two graft.Verify
output dirs query by query — same canonicalization as check.py (columns
sorted by name, types exact, rows sorted, floats to 9 significant
digits) but BOTH sides are engine parquet, no DuckDB oracle replay.

Built for the local-cluster validation run: the same query at the same
SF under local[32] and local-cluster[2,16,…] must be bit-identical
after canonicalization; a mismatch is a closure-serialization /
executor-static-state / broadcast-delivery bug by construction.

Usage: python3 tools/enginediff.py <dirA> <dirB> [name ...]
  (names default to the intersection of both dirs' query subdirs)
Exit 1 on any mismatch. Dev-only tool — not part of the shipped library.
"""
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import canon  # same canonicalization as the oracle gate


def read(con, d, name):
    rel = con.sql(f"SELECT * FROM '{os.path.join(d, name)}/*.parquet'")
    return canon(rel.fetchall(), list(rel.columns),
                 [str(t) for t in rel.types])


def main():
    da, db = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or sorted(
        set(n for n in os.listdir(da) if os.path.isdir(os.path.join(da, n)))
        & set(n for n in os.listdir(db) if os.path.isdir(os.path.join(db, n))))
    con = duckdb.connect()
    n_pass = n_fail = 0
    for name in names:
        try:
            ca, ta, ra = read(con, da, name)
            cb, tb, rb = read(con, db, name)
        except Exception as ex:
            print(f"  ✗ {name}: READ ERROR: {ex}")
            n_fail += 1
            continue
        if ca != cb:
            print(f"  ✗ {name}: column mismatch A={ca} B={cb}")
            n_fail += 1
        elif ta != tb:
            print(f"  ✗ {name}: type mismatch A={ta} B={tb}")
            n_fail += 1
        elif ra != rb:
            diff = [i for i, (x, y) in enumerate(zip(ra, rb)) if x != y]
            msg = (f"rowcount A={len(ra)} B={len(rb)}" if len(ra) != len(rb)
                   else f"first diff row {diff[0]}:\n"
                        f"    A: {ra[diff[0]]}\n    B: {rb[diff[0]]}")
            print(f"  ✗ {name}: {msg}")
            n_fail += 1
        else:
            print(f"  ✓ {name}: {len(ra)} rows identical")
            n_pass += 1
    print(f"IDENTICAL={n_pass} MISMATCH={n_fail} (of {len(names)})")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
