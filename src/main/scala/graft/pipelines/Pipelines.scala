package graft.pipelines

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.{Enrich, Paginator}
import graft.ops.{Nested, Relational}
import graft.reverse.BatchSink
import graft.tables.Warehouse

/** The reference's three top-level job shapes (SURVEY.md §3), composed from
  * the operator library. Each is one Spark job — the reference's per-task
  * XCom/CSV materialization boundaries disappear into Catalyst stage
  * fusion.
  */
object Pipelines {

  /** §3.1 — full-refresh ingest (billwerk_subscriptions shape): paginated
    * fetch → transform → audit column → WRITE_TRUNCATE. `fetch` is the
    * injected transport; `transform` the per-source projection/coercion.
    */
  def ingestFullRefresh(
      spark: SparkSession,
      wh: Warehouse,
      table: String,
      fetch: Option[String] => Paginator.Page,
      transform: DataFrame => DataFrame,
      auditTag: String): Long = {
    val raw = Paginator.toDf(spark, Paginator.keysetCursor(fetch))
    val out = transform(raw).withColumn("ingest_source", lit(auditTag))
    wh.overwrite(table, out)
    wh.read(table).count()
  }

  /** §3.2 — delete+insert upsert with audit preservation and dependent
    * child-item fan-out (bexio_orders shape): incoming batch keeps u_id /
    * created_at of known keys, new keys get deterministic surrogates; the
    * child table is fetched per parent key (stubbed transport), exploded,
    * and upserted by parent key. Idempotent: re-running with the same batch
    * leaves both tables unchanged.
    */
  def upsertWithItems(
      spark: SparkSession,
      wh: Warehouse,
      parentTable: String,
      itemsTable: String,
      batch: DataFrame,
      key: String,
      fetchDetail: String => String,
      itemSchemaDdl: String,
      enrichPartitions: Int = 8): (Long, Long) = {
    val existing =
      if (wh.exists(parentTable)) wh.read(parentTable)
      else batch.limit(0)
        .withColumn("u_id", lit(null).cast("string"))
        .withColumn("created_at", lit(null).cast("date"))
    val preserved = Relational.lookupPreserve(
      batch, existing, key,
      preserve = Seq("u_id", "created_at"),
      fresh = Map(
        "u_id" -> sha2(concat(lit("u"), col(key).cast("string")), 256),
        "created_at" -> lit(java.sql.Date.valueOf("2026-01-01"))))
    wh.upsert(parentTable, preserved, Seq(key))

    val enriched = Enrich.perKeyFetch(
      preserved.select(key), key, fetchDetail, enrichPartitions)
    val withItems = enriched.withColumn("items",
      expr(s"from_json(detail, 'array<struct<$itemSchemaDdl>>')"))
    val items = Nested.explodeChild(withItems, Seq(key), "items")
    wh.upsert(itemsTable, items, Seq(key))
    (wh.read(parentTable).count(), wh.read(itemsTable).count())
  }

  /** §3.3 — reverse ETL (hubspot_bm_contact shape): warehouse SQL →
    * first-write-wins property maps → batched POSTs via the injected
    * `post`. Returns number of batches sent.
    */
  def reverseEtl(
      spark: SparkSession,
      sql: String,
      entityCol: String,
      propCol: String,
      valueCol: String,
      batchSize: Int,
      post: Seq[Row] => Unit): Long = {
    val maps = BatchSink.propertyMaps(spark.sql(sql), entityCol, propCol, valueCol)
    BatchSink.postBatches(maps, batchSize, post)
  }
}
