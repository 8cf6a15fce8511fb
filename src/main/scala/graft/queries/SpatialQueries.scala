package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.expressions.Hashing

/** SPATIAL operators: the radius self-join (find-everything-nearby) that
  * naive SQL writes as an O(n²) theta join, re-expressed as the standard
  * grid-bucket equi-join — assign each point a cell, fan candidates to
  * the 3×3 cell neighborhood (bounded ×9, the q_rolling_wau shape), and
  * apply the exact haversine only to candidates. Same plan family as
  * ops/Temporal.rangeJoin, in two dimensions.
  *
  * Coordinates are synthesized deterministically from sha60 (the fixture
  * has no geo columns): 1500·SF points in a ~110×140 km box, so the
  * 5 km radius is non-vacuous (5.5k pairs at sf0.01). Cell size 0.1° —
  * wider than the radius in both axes at this latitude, so the 3×3
  * neighborhood is a complete candidate cover (no false negatives).
  */
object SpatialQueries {

  private val R = 6371000.0 // mean earth radius, meters

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_spatial_join",
      Some(s"""WITH p AS (SELECT c_custkey AS id,
             |    50.0 + (${Hashing.sha60Sql(
                    "CAST(c_custkey AS VARCHAR) || ':lat'")} % 1000000)
             |      / 1000000.0 AS lat,
             |    8.0 + 2 * (${Hashing.sha60Sql(
                    "CAST(c_custkey AS VARCHAR) || ':lon'")} % 1000000)
             |      / 1000000.0 AS lon
             |  FROM customer),
             |c AS (SELECT id, lat, lon,
             |    CAST(floor(lat / 0.1) AS BIGINT) AS cl,
             |    CAST(floor(lon / 0.1) AS BIGINT) AS cn
             |  FROM p),
             |off AS (SELECT a.dy, b.dx
             |  FROM (VALUES (-1),(0),(1)) a(dy), (VALUES (-1),(0),(1)) b(dx)),
             |cand AS (SELECT a.id AS id_a, b.id AS id_b,
             |    a.lat AS la, a.lon AS na, b.lat AS lb, b.lon AS nb
             |  FROM c a JOIN off ON TRUE
             |  JOIN c b ON b.cl = a.cl + off.dy AND b.cn = a.cn + off.dx
             |    AND a.id < b.id),
             |d AS (SELECT id_a, id_b,
             |    2 * $R * asin(sqrt(
             |      sin(radians(lb - la) / 2) * sin(radians(lb - la) / 2)
             |      + cos(radians(la)) * cos(radians(lb))
             |        * sin(radians(nb - na) / 2) * sin(radians(nb - na) / 2)))
             |      AS dist_m
             |  FROM cand)
             |SELECT id_a, id_b, round(dist_m, 1) AS dist_m
             |FROM d WHERE dist_m <= 5000""".stripMargin),
      (s, dir) => {
        def coord(salt: String, base: Double, span: Double) =
          lit(base) + lit(span) *
            (Hashing.sha60(concat(col("c_custkey").cast("string"),
              lit(s":$salt"))) % 1000000) / 1000000.0
        val p = Tables.t(s, dir, "customer")
          .select(col("c_custkey").as("id"),
            coord("lat", 50.0, 1.0).as("lat"),
            coord("lon", 8.0, 2.0).as("lon"))
          .withColumn("cl", floor(col("lat") / 0.1).cast("long"))
          .withColumn("cn", floor(col("lon") / 0.1).cast("long"))
        val off = s.createDataFrame(
          for (dy <- Seq(-1, 0, 1); dx <- Seq(-1, 0, 1)) yield (dy, dx))
          .toDF("dy", "dx")
        val b = p.select(col("id").as("id_b"), col("lat").as("lb"),
          col("lon").as("nb"), col("cl").as("bcl"), col("cn").as("bcn"))
        val cand = p.crossJoin(broadcast(off))
          .join(b,
            col("bcl") === col("cl") + col("dy") &&
              col("bcn") === col("cn") + col("dx") &&
              col("id") < col("id_b"))
        val dLat = radians(col("lb") - col("lat")) / 2
        val dLon = radians(col("nb") - col("lon")) / 2
        val dist = lit(2 * R) * asin(sqrt(
          sin(dLat) * sin(dLat) +
            cos(radians(col("lat"))) * cos(radians(col("lb"))) *
              sin(dLon) * sin(dLon)))
        cand.select(col("id").as("id_a"), col("id_b"), dist.as("d"))
          .filter(col("d") <= 5000) // filter BEFORE rounding, like the oracle
          .select(col("id_a"), col("id_b"), round(col("d"), 1).as("dist_m"))
      })
  )
}
