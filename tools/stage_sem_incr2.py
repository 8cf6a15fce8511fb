#!/usr/bin/env python3
"""Staged replay of a heavy gated oracle at a scaled SF: DuckDB 1.0
inlines each CTE per reference, so an n*k streaming-aggregate chain
referenced k times (the semantic epoch oracles reference `asn` ~6x)
re-evaluates k times and the single-statement form exhausts spill
disk. Stage the VERBATIM prefix instead: every CTE before the cut
point is materialized ONCE as a temp table of the same name (in
definition order, so each body's references resolve to the already
staged tables), then the unchanged tail runs against them — same SQL
text per CTE, same semantics, only the evaluation staged. This is the
committed r18 sf100-coarse methodology (SCALECHECK_sf100), generalized
in r20 from the single hard-wired `asn` split so the coarse and
pipeline oracles (whose tails reference several prefix CTEs) stage
too.

Usage: stage_sem_incr2.py <sfDir> <verifyOutDir> [query] [cutCte]
  query   gated query name (default q_semantic_dedup_incr2)
  cutCte  first CTE to leave UNstaged (default cand1 — the start of
          the per-epoch tail in the epoch/pipeline oracles; use
          `reps` for q_semantic_dedup_incr_coarse)
"""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import check

sf_dir, out_dir = sys.argv[1], sys.argv[2]
name = sys.argv[3] if len(sys.argv) > 3 else "q_semantic_dedup_incr2"
cut = sys.argv[4] if len(sys.argv) > 4 else "cand1"

sql = json.load(open(os.path.join(out_dir, "oracle_sql.json")))[name]
assert sql.upper().startswith("WITH "), "oracle is not a WITH query"


def split_ctes(text):
    """Top-level (name, body) pairs of a WITH clause plus the trailing
    main SELECT. Parses by paren depth; quoted strings respected."""
    body = text[5:]  # strip "WITH "
    ctes, i, n = [], 0, len(body)
    while True:
        # read CTE name up to " AS ("
        j = body.index(" AS (", i)
        cte_name = body[i:j].strip().strip(",").strip()
        # find matching close paren
        depth, k, quote = 0, j + 4, False
        while k < n:
            c = body[k]
            if quote:
                quote = c != "'"
            elif c == "'":
                quote = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        ctes.append((cte_name, body[j + 5:k]))
        # after ')': either ',' (next CTE) or the main SELECT
        m = k + 1
        while m < n and body[m] in " \n\t":
            m += 1
        if m < n and body[m] == ",":
            i = m + 1
        else:
            return ctes, body[m:]


ctes, main_select = split_ctes(sql)
names = [c[0] for c in ctes]
assert cut in names, f"cut CTE '{cut}' not in oracle ({names})"
ci = names.index(cut)
staged, tail_ctes = ctes[:ci], ctes[ci:]

con = check.connect(sf_dir, mem=os.environ.get("STAGE_MEM", "48GB"))
if os.environ.get("STAGE_SYNTACTIC_JOINS"):
    # Evaluation-only knob (semantics untouched): on the widest argmax
    # chains DuckDB's join-order pass can pick the n*k CROSS product as
    # a hash-join BUILD side (~150 GB at sf10 pipeline width) instead of
    # streaming it as the probe; syntactic left-deep order builds the
    # small aggregate side and streams the product, which is the plan
    # the SQL was written for.
    con.execute("SET disabled_optimizers='join_order'")
t0 = time.time()
for cte_name, body in staged:
    ts = time.time()
    con.execute(f"CREATE TEMP TABLE {cte_name} AS {body}")
    rows = con.sql(f"SELECT count(*) FROM {cte_name}").fetchall()[0][0]
    print(f"staged {cte_name}: {rows} rows in {time.time() - ts:.1f} s",
          flush=True)
t1 = time.time()
print(f"{len(staged)} CTEs staged in {t1 - t0:.1f} s", flush=True)
tail = ("WITH " + ",\n".join(f"{n} AS ({b})" for n, b in tail_ctes)
        + "\n" + main_select)
rel = con.sql(tail)
e_cols, e_types, e_rows = (list(rel.columns),
                           [str(t) for t in rel.types], rel.fetchall())
t2 = time.time()
print(f"tail evaluated: {len(e_rows)} rows in {t2 - t1:.1f} s", flush=True)
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
