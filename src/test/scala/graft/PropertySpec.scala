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
}
