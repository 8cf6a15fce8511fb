#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against the same fixture tables,
and compares: columns sorted by name, COLUMN TYPES (DuckDB's view of both
result sets — the class of drift repr-comparison is blind to: HUGEINT vs
BIGINT, DECIMAL vs DOUBLE), rows sorted by all columns, values compared
exactly (floats to 9 significant digits).

Dev-only tool — not part of the shipped library.
"""
import sys, os, json, math, threading
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon_type(t):
    """DuckDB type → comparison class. Only truncation-by-design is
    normalized: the events fixture is timestamp[ns], which Spark can only
    hold at µs (Tables.t truncates; DuckDB reads TIMESTAMP_NS) — so ns vs µs
    timestamps are the same class. Everything else (HUGEINT vs BIGINT,
    DECIMAL vs DOUBLE, INT vs BIGINT) must match exactly: those pass a
    repr-compare locally and fail the driver's schema gate.
    """
    s = str(t)
    return "TIMESTAMP" if s in ("TIMESTAMP_NS", "TIMESTAMP") else s


def canon(rows, cols, types):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    if v == 0.0:
                        v = 0.0  # IEEE -0.0 == 0.0; don't let the sign
                        # bit of a rounded-to-zero value fail the row
                        # (first hit: sf1 mean-centered stats where one
                        # engine rounds to -0.0 and the other to +0.0)
                    v = f"{v:.9g}"
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return ([cols[i] for i in order],
            [canon_type(types[i]) for i in order], out)


# DuckDB constructs whose semantics have MOVED across DuckDB versions —
# the local gate runs one DuckDB, the driver may run another, so an oracle
# leaning on any of these can be locally green yet driver-red
# (q_decimal_money was, twice, via sum(BIGINT)→HUGEINT × DECIMAL).
# Flagged statically so the drift is named before it costs a round.
VERSION_SENSITIVE = [
    ("* CAST(0.01 AS DECIMAL", "HUGEINT×DECIMAL reconstitution"),
    ("AS DECIMAL", "DECIMAL in gated output (prefer integer cents/BIGINT)"),
    ("::DECIMAL", "DECIMAL cast in gated output"),
]


def lint_oracles(oracle):
    hits = []
    for name, sql in sorted(oracle.items()):
        for pat, why in VERSION_SENSITIVE:
            if pat in sql:
                hits.append(f"  ! {name}: oracle uses '{pat}' — {why}")
                break
    if hits:
        print(f"version-sensitive oracle constructs ({len(hits)}):")
        for h in hits:
            print(h)


def connect(sf_dir, mem=None):
    """Fresh DuckDB connection with the fixture views. `mem` caps DuckDB
    (scale runs: an uncapped oracle can eat the whole box and poison the
    shared connection — every later row then OOMs spuriously); spill goes
    to a temp dir so a capped heavy oracle degrades instead of dying."""
    con = duckdb.connect()
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
        con.execute("SET temp_directory='/tmp/duckdb_spill'")
        # scale runs reconnect on poisoned connections; uncapped worker
        # pools across reconnects exhausted the process thread limit
        # ("can't start new thread" 273 queries into the first sf1 run)
        con.execute("SET threads=16")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        # driver fixtures are single files; ScaleUp fixtures are
        # directories of part files — glob the latter so the oracle can
        # run at scaled SFs too
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


# Errors after which the CONNECTION itself is suspect (r14, seen in the
# first sf1 widening run: one oracle OOM'd and every subsequent row —
# including trivial engine-parquet reads — failed with OOM / "closed
# pending query result" until reconnect).
POISON = ("OUT OF MEMORY", "CLOSED PENDING QUERY")


def main(sf_dir, out_dir, timeout=None, fail_on_timeout=False, mem=None,
         only=None):
    # The gate's verdict depends on the DuckDB that renders the oracle;
    # record it so a locally-green/driver-red row can be attributed to a
    # version gap instead of re-litigating the query.
    print(f"duckdb={duckdb.__version__}")
    con = connect(sf_dir, mem)
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    lint_oracles(oracle)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    if only:
        # resume/re-check a subset (e.g. after a crash partway through a
        # scale run) without replaying every oracle
        names = [n for n in names if n in only]
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = n_noracle = n_timeout = 0
    # A registered oracle with no output dir means the Spark query CRASHED
    # (Verify records why in errors.json) — that must be a red row, not a
    # silently absent one.
    errors = {}
    err_path = os.path.join(out_dir, "errors.json")
    if os.path.exists(err_path):
        with open(err_path) as f:
            errors = json.load(f)
    if only:
        # --only must also scope the error ledger, or a subset/resume run
        # reports every out-of-subset errored query as NO OUTPUT
        errors = {k: v for k, v in errors.items() if k in only}
    for name in sorted((set(oracle) | set(errors)) - set(names)):
        print(f"  ✗ {name}: NO OUTPUT — {errors.get(name, 'query produced no result dir')}")
        n_fail += 1
    # Watchdog state shared with the timer thread. The lock + "running"
    # flag close the race the bare `Timer(timeout, con.interrupt)` had:
    # a timer firing between fetchall() returning and cancel() would
    # interrupt an IDLE connection, and the stale interrupt then aborted
    # the NEXT query's engine-parquet read (outside any try/except).
    wd_lock = threading.Lock()
    wd = {"running": False, "fired": False}
    holder = {"con": con}

    def on_timeout():
        with wd_lock:
            if wd["running"]:
                wd["fired"] = True
                holder["con"].interrupt()

    def timed_out(ex):
        # A timeout verdict requires BOTH a configured budget and the
        # watchdog having actually fired — a genuine engine error that
        # merely mentions "interrupt" must stay a red row.
        return (timeout is not None and wd["fired"]
                and (isinstance(ex, KeyboardInterrupt)
                     or "INTERRUPT" in str(ex).upper()))

    def reconnect():
        try:
            holder["con"].close()
        except Exception:
            pass
        holder["con"] = connect(sf_dir, mem)

    def fetch(sql):
        # relation API, not DB-API execute(): cursor.description only
        # exposes generic DB-API codes (HUGEINT and BIGINT are both
        # 'NUMBER') — .types carries the real DuckDB types
        rel = holder["con"].sql(sql)
        return list(rel.columns), [str(t) for t in rel.types], rel.fetchall()

    def fetch_retrying(sql):
        """One retry on recoverable connection states: a stale watchdog
        interrupt from the previous row, or a poisoned connection after
        an OOM (reconnect first)."""
        try:
            return fetch(sql)
        except (Exception, KeyboardInterrupt) as ex:
            msg = str(ex).upper()
            stale = (timeout is not None and wd["fired"]
                     and "INTERRUPT" in msg)
            poisoned = any(p in msg for p in POISON)
            if not (stale or poisoned):
                raise
            wd["fired"] = False
            if poisoned:
                reconnect()
            return fetch(sql)

    for name in names:
        # Wrapped so a stray watchdog interrupt / poisoned connection /
        # corrupt engine dump is classified per-row, not a gate crash.
        try:
            g_cols, g_types, g_rows = fetch_retrying(
                f"SELECT * FROM '{os.path.join(out_dir, name)}/*.parquet'")
        except (Exception, KeyboardInterrupt) as ex:
            print(f"  ✗ {name}: ENGINE RESULT READ ERROR: {ex}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"  ~ {name}: no oracle (rows={len(g_rows)})")
            n_noracle += 1
            continue
        # Optional per-oracle wall budget (scale runs): a watchdog thread
        # interrupts DuckDB so a quadratic oracle NAMES itself as a
        # timeout row instead of hanging the whole gate. TIMEOUT is its
        # own verdict — the ENGINE result exists; only the oracle replay
        # was too expensive at this SF.
        timer = None
        if timeout:
            with wd_lock:
                wd["running"] = True
                wd["fired"] = False
            timer = threading.Timer(timeout, on_timeout)
            timer.start()
        try:
            e_cols, e_types, e_rows = fetch(oracle[name])
        except (Exception, KeyboardInterrupt) as ex:
            if timed_out(ex):
                print(f"  ⏱ {name}: ORACLE TIMEOUT (> {timeout}s)")
                n_timeout += 1
            else:
                print(f"  ✗ {name}: ORACLE SQL ERROR: {ex}")
                n_fail += 1
            if any(p in str(ex).upper() for p in POISON):
                reconnect()  # don't let one OOM poison every later row
            continue
        finally:
            if timer:
                with wd_lock:
                    wd["running"] = False
                timer.cancel()
        gc, gt, gr = canon(g_rows, g_cols, g_types)
        ec, et, er = canon(e_rows, e_cols, e_types)
        if gc != ec:
            print(f"  ✗ {name}: column mismatch spark={gc} oracle={ec}")
            n_fail += 1
        elif gt != et:
            mism = [f"{c}: spark={a} oracle={b}"
                    for c, a, b in zip(gc, gt, et) if a != b]
            print(f"  ✗ {name}: TYPE mismatch {'; '.join(mism)}")
            n_fail += 1
        elif gr != er:
            diff = [i for i, (a, b) in enumerate(zip(gr, er)) if a != b]
            msg = (f"rowcount spark={len(gr)} oracle={len(er)}"
                   if len(gr) != len(er) else
                   f"first diff row {diff[0]}:\n    spark : {gr[diff[0]]}\n    oracle: {er[diff[0]]}")
            print(f"  ✗ {name}: {msg}")
            n_fail += 1
        else:
            print(f"  ✓ {name}: {len(gr)} rows")
            n_pass += 1
    tmo = f" TIMEOUT={n_timeout}" if n_timeout else ""
    print(f"PASS={n_pass} FAIL={n_fail} NO_ORACLE={n_noracle}{tmo}")
    if n_fail:
        return 1
    # An all-timeout run must never read as green: with zero passes and
    # any timeouts there is no correctness evidence at all. --fail-on-
    # timeout tightens this to "any timeout is a failure" for gates that
    # demand full oracle coverage.
    if n_timeout and (fail_on_timeout or n_pass == 0):
        return 2
    return 0


if __name__ == "__main__":
    tmo = None
    fot = False
    memcap = None
    args = [a for a in sys.argv[1:]]
    if "--timeout" in args:
        i = args.index("--timeout")
        tmo = float(args[i + 1])
        del args[i:i + 2]
    if "--mem" in args:
        i = args.index("--mem")
        memcap = args[i + 1]
        del args[i:i + 2]
    if "--fail-on-timeout" in args:
        args.remove("--fail-on-timeout")
        fot = True
    subset = None
    if "--only" in args:
        i = args.index("--only")
        subset = set(x for x in args[i + 1].split(",") if x)
        del args[i:i + 2]
    sys.exit(main(args[0], args[1], tmo, fot, memcap, subset))
