package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ops.{Coerce, Flatten}

/** SURVEY.md §2.2 (P1–P18) scalar/coercion shapes as verifiable queries.
  * DuckDB notes: regexp_replace needs 'g' for Spark's replace-all semantics;
  * epoch() is DOUBLE (cast to BIGINT); year()/month() are BIGINT (cast to
  * INT to match Spark); json fields come out of json_extract_string.
  */
object ScalarQueries {

  val defs: Seq[QueryDef] = Seq(

    // P1/P2/A4 — JSON flatten with explicit schema; absent fields NULL-safe
    // (biilwerk_contracts.py:124-170; churn_reasons.py:68).
    QueryDef(
      "q_json_flatten",
      Some("""SELECT event_id,
             |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
             |  json_extract_string(props, '$.missing') AS prop_missing,
             |  value
             |FROM events""".stripMargin),
      (s, dir) => Flatten.fromJsonCols(
          Tables.t(s, dir, "events").select("event_id", "props", "value"),
          "props", "k int, missing string", Seq("k", "missing"))
        .select(col("event_id"), col("k").as("prop_k"),
          col("missing").as("prop_missing"), col("value"))),

    // P2 — generic auto-flatten: nested structs → parent_child columns,
    // depth-first (pd.json_normalize(max_level=5), churn_reasons.py:68).
    // The struct is synthesized in-plan; the oracle is the flat projection
    // the flatten must reduce to.
    QueryDef(
      "q_auto_flatten",
      Some("""SELECT o_orderkey,
             |  o_custkey AS payload_customer_id,
             |  o_orderstatus AS payload_customer_status,
             |  o_totalprice AS payload_amount
             |FROM orders""".stripMargin),
      (s, dir) => Flatten.flatten(
        Tables.t(s, dir, "orders").select(
          col("o_orderkey"),
          struct(
            struct(col("o_custkey").as("id"),
              col("o_orderstatus").as("status")).as("customer"),
            col("o_totalprice").as("amount")).as("payload")))),

    // P12 — numeric string cleanup: thousands separators, percentages,
    // n.a. sentinels (import_bi_dev_ltv.py:55-59). The dirty strings are
    // synthesized in-plan from numeric columns; the oracle states the
    // expected round-trip values directly — an independent check that the
    // cleanup actually inverts the formatting.
    QueryDef(
      "q_numeric_cleanup",
      Some("""SELECT o_orderkey,
             |  o_custkey::DOUBLE AS amount_clean,
             |  round(((o_orderkey % 100) + 0.5) / 100.0, 6) AS pct_clean,
             |  CAST(CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_custkey END AS BIGINT) AS cust_or_null
             |FROM orders""".stripMargin),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
          .select("o_orderkey", "o_custkey")
          .withColumn("th_str", format_number(col("o_custkey"), 0))
          .withColumn("pct_str",
            concat((col("o_orderkey") % 100).cast("string"), lit(".5%")))
          .withColumn("na_str",
            when(col("o_orderkey") % 10 === 0, lit("n.a."))
              .otherwise(col("o_custkey").cast("string")))
        o.select(
          col("o_orderkey"),
          Coerce.stripThousands(col("th_str")).as("amount_clean"),
          Coerce.pctToFraction(col("pct_str")).as("pct_clean"),
          Coerce.naToNull(col("na_str")).try_cast("long").as("cust_or_null"))
      }),

    // P10 — `MMM-yy` parse + month-end snap
    // (import_bi_dev_gross_margin.py:52-54). Month strings synthesized
    // in-plan; the oracle computes the month end from the parts.
    QueryDef(
      "q_month_end",
      Some("""SELECT o_orderkey,
             |  last_day(make_date(2024, CAST(o_orderkey % 12 AS INT) + 1, 1)) AS month_end
             |FROM orders""".stripMargin),
      (s, dir) => {
        val months = Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun",
          "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
        Tables.t(s, dir, "orders").select(
          col("o_orderkey"),
          Coerce.monthYearToMonthEnd(
            concat(
              element_at(typedlit(months), (col("o_orderkey") % 12).cast("int") + 1),
              lit("-24"))).as("month_end"))
      }),

    // P17 — struct → JSON string (json.dumps(CustomFields),
    // biilwerk_contracts.py:167). Non-null fields only: Spark's to_json
    // omits null fields where DuckDB's emits them, so nullable payloads
    // are a schema decision, not a serializer one.
    QueryDef(
      "q_struct_json",
      Some("""SELECT o_orderkey,
             |  to_json(struct_pack(o_orderkey := o_orderkey,
             |                      o_orderstatus := o_orderstatus))::VARCHAR AS payload_json
             |FROM orders""".stripMargin),
      (s, dir) => Tables.t(s, dir, "orders").select(
        col("o_orderkey"),
        Coerce.structToJson(
          struct(col("o_orderkey"), col("o_orderstatus"))).as("payload_json"))),

    // P8/P9 — error-tolerant numeric coercion + fillna/int-cast
    // (pd.to_numeric(errors='coerce'); fillna(0).astype(int)).
    QueryDef(
      "q_coerce_numeric",
      Some("""SELECT doc_id,
             |  try_cast(raw AS DOUBLE) AS parsed,
             |  CAST(coalesce(try_cast(raw AS DOUBLE), 0) AS BIGINT) AS filled
             |FROM (SELECT doc_id,
             |        CASE WHEN doc_id % 10 = 0 THEN 'n.a.'
             |             ELSE CAST(n_chars AS VARCHAR) END AS raw
             |      FROM documents)""".stripMargin),
      (s, dir) => Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 10 === 0, lit("n.a."))
            .otherwise(col("n_chars").cast("string")).as("raw"))
        .select(col("doc_id"),
          Coerce.toNumeric(col("raw")).as("parsed"),
          Coerce.fillIntCast(col("raw")).as("filled"))),

    // P10 — timestamp conversion family: ISO formatting, dd.MM.yyyy
    // round-trip, month-end snap, epoch seconds, year/month parts.
    QueryDef(
      "q_time_convert",
      Some("""SELECT o_orderkey,
             |  CAST(o_orderdate AS DATE) AS order_date,
             |  strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
             |  strftime(o_orderdate, '%d.%m.%Y') AS german_date,
             |  CAST(strptime(strftime(o_orderdate, '%d.%m.%Y'), '%d.%m.%Y') AS DATE) AS german_parsed,
             |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
             |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
             |  CAST(year(o_orderdate) AS INT) AS y,
             |  CAST(month(o_orderdate) AS INT) AS m
             |FROM orders""".stripMargin),
      (s, dir) => Tables.t(s, dir, "orders")
        .select(col("o_orderkey"),
          col("o_orderdate").cast("date").as("order_date"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date_str"),
          date_format(col("o_orderdate"), "dd.MM.yyyy").as("german_date"),
          Coerce.germanDateToDate(date_format(col("o_orderdate"), "dd.MM.yyyy")).as("german_parsed"),
          last_day(col("o_orderdate")).as("month_end"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"))),

    // P13/P14/P16 — CASE WHEN buckets, literal/audit columns, concat
    // (bexio_orders_de.py:247-251; shore_bexio_all.py:55-57;
    // biilwerk_customers.py:140).
    QueryDef(
      "q_case_concat",
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_orderstatus = 'F' THEN 'finished'
             |       WHEN o_orderstatus = 'O' THEN 'open'
             |       ELSE 'pending' END AS status_label,
             |  concat_ws('-', o_orderpriority, o_orderstatus) AS priority_code,
             |  'engine' AS src
             |FROM orders""".stripMargin),
      (s, dir) => Tables.t(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "F", lit("finished"))
            .when(col("o_orderstatus") === "O", lit("open"))
            .otherwise(lit("pending")).as("status_label"),
          concat_ws("-", col("o_orderpriority"), col("o_orderstatus")).as("priority_code"),
          lit("engine").as("src"))),

    // P11/P12 — string cleaning: whitespace collapse, SQL-literal escape,
    // replace, case-fold (clean_text / convert_value, duplicated across ~8
    // reference files).
    QueryDef(
      "q_string_clean",
      Some("""SELECT doc_id,
             |  trim(regexp_replace(text, '\s+', ' ', 'g')) AS clean,
             |  replace(trim(regexp_replace(text, '\s+', ' ', 'g')), 'a', '@') AS replaced,
             |  upper(substring(trim(regexp_replace(text, '\s+', ' ', 'g')), 1, 20)) AS head20,
             |  length(text) AS n_raw
             |FROM documents""".stripMargin),
      (s, dir) => {
        val clean = Coerce.cleanText(col("text"))
        Tables.t(s, dir, "documents")
          .select(col("doc_id"),
            clean.as("clean"),
            regexp_replace(clean, "a", "@").as("replaced"),
            upper(substring(clean, 1, 20)).as("head20"),
            length(col("text")).cast("long").as("n_raw"))
      }),

    // S8/P9 — sheet-style all-string ingestion then typed casts
    // (get_all_records(dtype=str) → typed columns; active_orgs.py:25-40).
    QueryDef(
      "q_sheet_cast",
      Some("""SELECT CAST(CAST(n_nationkey AS VARCHAR) AS INT) AS n_nationkey,
             |  upper(CAST(n_name AS VARCHAR)) AS n_name,
             |  CAST(coalesce(try_cast(CAST(n_regionkey AS VARCHAR) AS DOUBLE), 0) AS BIGINT) AS n_regionkey
             |FROM nation""".stripMargin),
      (s, dir) => {
        // simulate the all-string sheet payload, then coerce back to types
        val asSheet = Tables.t(s, dir, "nation")
          .select(Seq("n_nationkey", "n_name", "n_regionkey")
            .map(c => col(c).cast("string").as(c)): _*)
        asSheet.select(
          col("n_nationkey").cast("int").as("n_nationkey"),
          upper(col("n_name")).as("n_name"),
          Coerce.fillIntCast(col("n_regionkey")).as("n_regionkey"))
      }),

    // ANSI error-channel arithmetic: under Spark 4's default ANSI mode,
    // mod-by-zero and bigint overflow THROW — try_mod/try_add are the
    // per-row error channel (NULL instead of a dead job, the P8 coercion
    // stance applied to arithmetic). The oracle reproduces the NULL rule
    // with lazy CASE guards; an engine that wraps instead of nulling (or
    // nulls the wrong rows) reddens the hash.
    //
    // The overflow is made deliberately RARE (~1% of rows, o_custkey
    // divisible by 97): the plan is whole-stage codegen either way, but
    // try_add's overflow path is a thrown-and-caught ArithmeticException
    // PER ROW — measured at sf0.1: 3.97 s when ~95% of 150k rows
    // overflow vs 0.10 s when none do (try_mod's zero-divisor path is a
    // branch, not an exception, and was never the cost). An error channel
    // priced for the common case — errors are the exception — is the
    // 100 TB-honest shape; an all-rows-overflow fixture benchmarks JVM
    // exception fill-in, not the engine.
    QueryDef(
      "q_try_arith",
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_custkey % 5 = 0 THEN NULL
             |       ELSE o_orderkey % (o_custkey % 5) END AS safe_mod,
             |  CASE WHEN o_custkey % 97 = 0 THEN NULL
             |       ELSE 9223372036854775807 END AS safe_add
             |FROM orders""".stripMargin),
      (s, dir) => Tables.t(s, dir, "orders")
        .select(col("o_orderkey"),
          expr("try_mod(o_orderkey, o_custkey % 5)").as("safe_mod"),
          // Long.MaxValue - c + (c + [c%97=0]) == MaxValue + [c%97=0]:
          // overflows exactly on the indicator rows, is MaxValue otherwise
          expr("try_add(9223372036854775807L - o_custkey, " +
            "o_custkey + CAST(o_custkey % 97 = 0 AS BIGINT))").as("safe_add"))),

    // EXACT money aggregation — the warehouse-finance contract the
    // reference's BigQuery NUMERIC columns rely on. The boundary goes
    // through integer CENTS, not a double→DECIMAL cast: engines disagree on
    // double→decimal rounding (Spark rounds the shortest decimal repr
    // HALF_UP; DuckDB versions differ on whether they round the exact
    // binary expansion), but round(x*100) on 2-dp prices lands far from any
    // .5 boundary, so BIGINT cents are engine-independent — the same path
    // q_rollup proves. The GATED output is pure BIGINT end to end: two
    // rounds of evidence showed the DECIMAL reconstitution
    // (sum(BIGINT)→HUGEINT × DECIMAL(3,2)) drifts across DuckDB versions,
    // so DECIMAL never appears in the contract — a consumer reconstitutes
    // display decimals at the edge (`total_cents * 0.01`), outside the
    // exactness boundary.
    QueryDef(
      "q_decimal_money",
      Some("""SELECT o_orderstatus,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             |    AS total_cents,
             |  CAST(max(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             |    AS max_cents
             |FROM orders GROUP BY 1""".stripMargin),
      (s, dir) => Tables.t(s, dir, "orders")
        .select(col("o_orderstatus"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum("cents").cast("long").as("total_cents"),
          max("cents").cast("long").as("max_cents"))
        .select(col("o_orderstatus"), col("n"),
          col("total_cents"), col("max_cents")))
  )
}
