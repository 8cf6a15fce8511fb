package graft

import org.apache.spark.sql.functions._

import graft.ops.Fuzzy

class FuzzySpec extends SparkSpec {

  // varied-length corpus with planted near-matches: n strings, a handful
  // within distance 1, everything else content-distinct
  private def corpus(n: Int) = {
    import spark.implicits._
    val rows = (1 to n).map { i =>
      val s = s"entity-$i-${"x" * (i % 13)}-${i * 7919}"
      (i.toLong, s)
    } ++ Seq(
      (9001L, "entity-42-xxx-332598"),  // dist 1 from id 42's "...332598"
      (9002L, "entity-77-pad-609763"))
    rows.toDF("id", "s")
  }

  test("edit-distance pairs equal the brute-force theta join") {
    val df = corpus(150)
    val blocked = Fuzzy.editDistancePairs(df, "id", "s", maxDist = 1)
    val a = df.select(col("id").as("id_a"), col("s").as("s_a"))
    val b = df.select(col("id").as("id_b"), col("s").as("s_b"))
    val brute = a.join(b, col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= 1)
      .select(col("id_a"), col("id_b"), col("dist").cast("int").as("dist"))
    assert(brute.count() > 0, "fixture must contain planted matches")
    assert(blocked.exceptAll(brute).isEmpty && brute.exceptAll(blocked).isEmpty)
  }

  test("blocking prunes uniform-length keys the length block cannot") {
    import spark.implicits._
    // every string the SAME length — the degenerate distribution where the
    // length block alone collapses to one all-pairs bucket (TPC-H c_name).
    // Content here is digits-only (~100 possible bigrams shared corpus-wide
    // — the worst case for content blocking), so the honest expectation is
    // "meaningfully under all-pairs", not orders of magnitude.
    val n = 300
    val allPairs = n.toLong * (n - 1) / 2
    val digits = (1 to n).map(i => (i.toLong, f"Customer#$i%09d")).toDF("id", "s")
    val candDigits = Fuzzy.candidatePairs(digits, "id", "s", maxDist = 1).count()
    assert(candDigits < allPairs / 2,
      s"digit corpus: candidates=$candDigits of $allPairs all-pairs")
    // realistic entropy at uniform length (hash-suffixed keys): the rare
    // grams genuinely partition the corpus — candidates collapse to ~nothing
    val hashed = (1 to n).map { i =>
      (i.toLong, f"Customer#${Integer.toHexString(i * 2654435761L.toInt)}%8s")
    }.toDF("id", "s")
    val candHashed = Fuzzy.candidatePairs(hashed, "id", "s", maxDist = 1).count()
    assert(candHashed < allPairs / 20,
      s"hashed corpus: candidates=$candHashed of $allPairs all-pairs")
    // and the verified result still matches brute force on the digit corpus
    val blocked = Fuzzy.editDistancePairs(digits, "id", "s", maxDist = 1)
    val a = digits.select(col("id").as("id_a"), col("s").as("s_a"))
    val b = digits.select(col("id").as("id_b"), col("s").as("s_b"))
    val brute = a.join(b, col("id_a") < col("id_b"))
      .filter(levenshtein(col("s_a"), col("s_b")) <= 1)
      .select("id_a", "id_b")
    assert(blocked.select("id_a", "id_b").exceptAll(brute).isEmpty
      && brute.exceptAll(blocked.select("id_a", "id_b")).isEmpty)
  }

  test("short strings below the prefix guarantee fall back to the length block") {
    import spark.implicits._
    // len < q·(d+1) = 4: pairs sharing ZERO bigrams can still be dist ≤ 1
    val df = Seq((1L, "ab"), (2L, "xy"), (3L, "ay"), (4L, "longer-string-a"),
      (5L, "longer-string-b")).toDF("id", "s")
    val out = Fuzzy.editDistancePairs(df, "id", "s", maxDist = 1)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: (1,3) dist1, (2,3) dist1, (1,2) dist2 excluded, (4,5) dist1
    assert(out == Set((1L, 3L), (2L, 3L), (4L, 5L)))
  }
}
