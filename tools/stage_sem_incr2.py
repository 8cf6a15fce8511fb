#!/usr/bin/env python3
"""Staged replay of q_semantic_dedup_incr2 at a scaled SF: DuckDB 1.0
inlines each CTE per reference, so the n*k streaming-aggregate `asn`
chain is re-evaluated ~6x (cand1/drops1/v1/cand2/drops2/v2) and the
single-statement form exhausts spill disk. Stage the VERBATIM prefix
(e, cent, bd, asn) into a temp table once, then run the unchanged tail
against it — same SQL text, same semantics, only the evaluation staged.
This is the committed r18 sf100-coarse methodology (SCALECHECK_sf100).

Usage: stage_sem_incr2.py <sfDir> <verifyOutDir> [query]
"""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check

sf_dir, out_dir = sys.argv[1], sys.argv[2]
name = sys.argv[3] if len(sys.argv) > 3 else "q_semantic_dedup_incr2"

sql = json.load(open(os.path.join(out_dir, "oracle_sql.json")))[name]
idx = sql.find("cand1 AS")
assert idx > 0, "oracle shape changed — no cand1 CTE"
head = sql[:idx].rstrip().rstrip(",")
tail = "WITH asn AS (SELECT * FROM asn_t),\n" + sql[idx:]

con = check.connect(sf_dir, mem="48GB")
t0 = time.time()
con.execute(f"CREATE TEMP TABLE asn_t AS {head} SELECT * FROM asn")
t1 = time.time()
print(f"asn staged: {con.sql('SELECT count(*) FROM asn_t').fetchall()[0][0]}"
      f" rows in {t1 - t0:.1f} s")
rel = con.sql(tail)
e_cols, e_types, e_rows = (list(rel.columns),
                           [str(t) for t in rel.types], rel.fetchall())
t2 = time.time()
print(f"tail evaluated: {len(e_rows)} rows in {t2 - t1:.1f} s")
g = con.sql(f"SELECT * FROM '{os.path.join(out_dir, name)}/*.parquet'")
g_cols, g_types, g_rows = (list(g.columns),
                           [str(t) for t in g.types], g.fetchall())
gc, gt, gr = check.canon(g_rows, g_cols, g_types)
ec, et, er = check.canon(e_rows, e_cols, e_types)
if gc != ec:
    print(f"FAIL column mismatch spark={gc} oracle={ec}"); sys.exit(1)
if gt != et:
    print(f"FAIL type mismatch spark={gt} oracle={et}"); sys.exit(1)
if gr != er:
    diff = [i for i, (a, b) in enumerate(zip(gr, er)) if a != b]
    print(f"FAIL rows spark={len(gr)} oracle={len(er)}"
          + (f" first diff {diff[0]}: {gr[diff[0]]} vs {er[diff[0]]}"
             if diff else "")); sys.exit(1)
print(f"PASS {name}: {len(gr)} rows hash-identical (staged replay)")
