package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{Nested, Relational}

/** ScalaCheck-generated properties for the algebraic laws the engine
  * depends on (SURVEY.md §5): nest∘explode identity and upsert idempotence
  * over arbitrary key multisets. (scalatestplus isn't on the offline
  * classpath, so generators are sampled with fixed seeds directly.)
  */
class PropertySpec extends SparkSpec {

  private val rowsGen: Gen[List[(Long, Int, Double)]] =
    Gen.listOf(for {
      k <- Gen.choose(0L, 8L)
      ln <- Gen.choose(1, 5)
      v <- Gen.choose(0, 1000).map(_ / 10.0)
    } yield (k, ln, v))

  private def samples(n: Int): Seq[List[(Long, Int, Double)]] =
    (1 to n).flatMap(i =>
      rowsGen.apply(Gen.Parameters.default.withSize(30), Seed(i.toLong)))
      .filter(_.nonEmpty)

  test("resolveClusters matches a union-find reference on random graphs") {
    import spark.implicits._
    val edgeGen: Gen[List[(Long, Long)]] =
      Gen.listOf(for {
        a <- Gen.choose(0L, 29L)
        b <- Gen.choose(0L, 29L) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    (1 to 5).flatMap(i =>
      edgeGen.apply(Gen.Parameters.default.withSize(25), Seed(100L + i)))
      .filter(_.nonEmpty)
      .foreach { edges =>
        // driver-side union-find reference
        val parent = scala.collection.mutable.Map((0L to 29L).map(i => i -> i): _*)
        def find(x: Long): Long =
          if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = (0L to 29L).map(i => i -> find(i)).toMap
        val docs = (0L to 29L).toDF("doc_id")
        val pairs = edges.toDF("doc_a", "doc_b")
        val got = graft.dedup.Dedup.resolveClusters(docs, "doc_id", pairs, maxRounds = 30)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected, s"edges=$edges")
      }
  }

  test("jaccard strategies agree with each other and local brute force") {
    import spark.implicits._
    import graft.dedup.Dedup
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu")
    val corpusGen: Gen[List[(Long, String)]] = Gen.listOfN(18, for {
      n <- Gen.choose(3, 8)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" ")).map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    (1 to 4).foreach { seed =>
      val docs = corpusGen(Gen.Parameters.default, Seed(seed.toLong)).get
      val df = docs.toDF("doc_id", "text")
      def run(st: Dedup.JaccardStrategy) =
        Dedup.jaccardPairs(df, "doc_id", "text", 0.5, strategy = st)
          .collect().map(r => (r.getLong(0), r.getLong(1),
            r.getDouble(2))).toSet
      val viaBitmask = run(Dedup.JaccardBitmask)
      val viaInverted = run(Dedup.JaccardInverted)
      // local brute force over distinct word sets
      val sets = docs.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toSet }.toMap
      val brute = (for {
        a <- sets.keys; b <- sets.keys if a < b
        j = sets(a).intersect(sets(b)).size.toDouble /
          sets(a).union(sets(b)).size
        if j >= 0.5
      } yield (a, b, math.rint(j * 10000) / 10000)).toSet
      assert(viaBitmask == brute, s"seed=$seed bitmask")
      assert(viaInverted == brute, s"seed=$seed inverted")
    }
  }

  test("chunkTokens covers every token when stride <= chunkSize") {
    import spark.implicits._
    val df = Seq((1L, (1 to 100).map(i => s"t$i").mkString(" ")),
      (2L, "a b c"), (3L, "single")).toDF("doc_id", "text")
    val chunks = graft.text.Chunker.chunkTokens(df, "text", Seq("doc_id"),
      chunkSize = 32, stride = 24).collect()
    val covered = chunks.filter(_.getLong(0) == 1L)
      .flatMap(_.getString(2).split(" ")).toSet
    assert(covered == (1 to 100).map(i => s"t$i").toSet)
    // short docs yield exactly one (possibly short) chunk
    assert(chunks.count(_.getLong(0) == 2L) == 1)
    assert(chunks.find(_.getLong(0) == 2L).get.getInt(3) == 3)
  }

  test("nest ∘ explode is the multiset identity for arbitrary inputs") {
    import spark.implicits._
    samples(5).foreach { rows =>
      val df = rows.toDF("k", "ln", "v")
      val round = Nested.explodeChild(
        Nested.nest(df, "k", Seq("ln", "v")), Seq("k"), "items")
      assert(round.exceptAll(df.select("k", "ln", "v")).isEmpty, s"rows=$rows")
      assert(df.select("k", "ln", "v").exceptAll(round).isEmpty, s"rows=$rows")
    }
  }

  test("PrefixSum.runningTotal equals the naive global scan on random inputs") {
    import org.apache.spark.sql.functions._
    val gen: Gen[List[(Long, Long)]] = Gen.listOf(for {
      k <- Gen.choose(0L, 1000000L)
      v <- Gen.choose(0L, 500L)
    } yield (k, v))
    for (seed <- 1 to 5) {
      val rows = gen.apply(Gen.Parameters.default.withSize(60), Seed(seed.toLong))
        .getOrElse(Nil).distinctBy(_._1)
      if (rows.nonEmpty) {
        val df = spark.createDataFrame(rows).toDF("k", "v")
        val got = graft.ops.PrefixSum.runningTotal(
            df, Seq(col("k")), col("v"), "run")
          .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("run")).toMap
        var acc = 0L
        for ((k, v) <- rows.sortBy(_._1)) {
          acc += v
          assert(got(k) == acc, s"seed=$seed k=$k: ${got(k)} != $acc")
        }
      }
    }
  }

  test("normalizeEventTs is generation-invariant on random instants") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val gen = Gen.listOf(Gen.choose(0L, 4102444800000000L)) // 1970..2100 µs
    for (seed <- 1 to 3) {
      val micros = gen.apply(Gen.Parameters.default.withSize(40), Seed(seed.toLong))
        .getOrElse(Nil).distinct
      if (micros.nonEmpty) {
        val base = spark.createDataFrame(micros.map(Tuple1(_))).toDF("us")
        def out(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
          val n = Tables.normalizeEventTs(df)
          assert(n.schema("ts").dataType == TimestampType)
          n.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted
        }
        val fromNs = out(base.select((col("us") * 1000).as("ts")))
        val fromNtz = out(base.select(
          timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))
        val fromTs = out(base.select(timestamp_micros(col("us")).as("ts")))
        assert(fromNs == fromNtz && fromNtz == fromTs,
          s"seed=$seed: generations disagree")
        assert(fromTs == micros.sorted)
      }
    }
  }

  test("deleteInsert is idempotent and preserves the key partition") {
    import spark.implicits._
    samples(4).zip(samples(4).reverse).foreach { case (target, batch) =>
      val t = target.toDF("k", "ln", "v").dropDuplicates("k")
      val b = batch.toDF("k", "ln", "v").dropDuplicates("k")
      val once = Relational.deleteInsert(t, b, Seq("k")).localCheckpoint()
      val twice = Relational.deleteInsert(once, b, Seq("k"))
      assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
      assert(once.select("k").distinct().count() ==
        t.select("k").union(b.select("k")).distinct().count())
    }
  }

  test("nearestJoin matches brute force on random timelines") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val tsGen: Gen[(List[(Long, Long, Long)], List[(Long, Long, Long)])] =
      for {
        left <- Gen.listOf(for {
          k <- Gen.choose(0L, 4L); t <- Gen.choose(0L, 100L)
          id <- Gen.choose(0L, 10000L)
        } yield (k, t, id))
        right <- Gen.listOf(for {
          k <- Gen.choose(0L, 4L); t <- Gen.choose(0L, 100L)
          p <- Gen.choose(0L, 999L)
        } yield (k, t, p))
      } yield (left, right)
    (1 to 6).flatMap(i =>
      tsGen.apply(Gen.Parameters.default.withSize(25), Seed(500L + i)))
      .filter { case (l, r) => l.nonEmpty }
      .foreach { case (lRows0, rRows0) =>
        // unique left ids; right unique per (key, ts) like the contract
        val lRows = lRows0.zipWithIndex
          .map { case ((k, t, _), i) => (k, t, i.toLong) }
        val rRows = rRows0.groupBy(r => (r._1, r._2))
          .map { case ((k, t), xs) => (k, t, xs.map(_._3).max) }.toList
        val left = lRows.toDF("k", "ts", "lid")
        val right = rRows.toDF("k", "rts", "payload")
          .select(col("k"), col("rts").as("ts2"), col("payload"))
        val got = graft.ops.Temporal
          .nearestJoin(left, right, "k", "ts", "ts2")
          .collect()
          .map(r => r.getAs[Long]("lid") ->
            (if (r.isNullAt(r.fieldIndex("__near_ts"))) None
             else Some(r.getAs[Long]("__near_ts")))).toMap
        for ((k, t, lid) <- lRows) {
          val cand = rRows.filter(_._1 == k)
          val expect =
            if (cand.isEmpty) None
            else {
              val best = cand.map(c => (math.abs(c._2 - t), c._2)).sorted
              // backward wins distance ties: among min-distance, the
              // earlier right ts
              val minD = best.head._1
              Some(best.filter(_._1 == minD).map(_._2).min)
            }
          assert(got(lid) == expect,
            s"key $k ts $t: got ${got(lid)}, expected $expect " +
              s"among ${cand.map(_._2).sorted}")
        }
      }
  }
}
