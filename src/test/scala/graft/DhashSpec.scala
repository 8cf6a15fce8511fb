package graft

/** q_image_dhash semantics: the gate's DuckDB oracle recomputes the hash
  * from the seed formula — this spec recomputes it INDEPENDENTLY in plain
  * Scala (no SQL, no Spark expressions), so a shared convention bug
  * between the two expression trees can't hide. Also pins the structural
  * near-dup bound the operator exists for: the 9 perturbed bytes touch at
  * most 9 luminance blocks, and each block participates in at most 2
  * neighbor comparisons, so Hamming(orig, perturbed) ≤ 18 by construction.
  */
class DhashSpec extends SparkSpec {

  private def reference(seed: Long): (Long, Long, Long, Long, Int) = {
    val px = Array.tabulate(864)(j => ((seed * 31 + j * 7) % 256).toInt)
    val px2 = px.zipWithIndex.map { case (v, i) =>
      if (i % 97 == 0) (v + 120) % 256 else v
    }
    def bits(p: Array[Int]): Array[Int] = {
      def block(k: Int) = {
        val x0 = (k % 9) * 2; val y0 = (k / 9) * 2
        (for (dy <- 0 to 1; dx <- 0 to 1; c <- 0 to 2)
          yield p(3 * ((y0 + dy) * 18 + (x0 + dx)) + c)).sum
      }
      Array.tabulate(64) { i =>
        val base = (i / 8) * 9 + (i % 8)
        if (block(base + 1) > block(base)) 1 else 0
      }
    }
    val b1 = bits(px); val b2 = bits(px2)
    def pack(bs: Array[Int], from: Int) =
      (0 until 32).map(i => bs(from + i).toLong << i).sum
    val ham = (0 until 64).map(i => (b1(i) - b2(i)).abs).sum
    (pack(b1, 32), pack(b1, 0), pack(b2, 32), pack(b2, 0), ham)
  }

  test("q_image_dhash equals an independent Scala recomputation") {
    val rows = q("q_image_dhash").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (hi, lo, phi, plo, ham) = reference(r.getLong(0))
      assert(r.getLong(1) == hi && r.getLong(2) == lo,
        s"doc ${r.getLong(0)}: dhash mismatch")
      assert(r.getLong(3) == phi && r.getLong(4) == plo,
        s"doc ${r.getLong(0)}: perturbed hash mismatch")
      assert(r.getInt(5) == ham && r.getBoolean(6) == (ham <= 10),
        s"doc ${r.getLong(0)}: hamming/near mismatch")
      // structural near-dup bound: 9 perturbed bytes, ≤2 bits per block
      assert(ham <= 18, s"doc ${r.getLong(0)}: hamming $ham > 18")
    }
  }

  test("dhash identity: seeds congruent mod 256 share an image and a hash") {
    // pixel byte = (seed·31 + j·7) mod 256 depends on seed only mod 256
    val (hi1, lo1, _, _, _) = reference(3L)
    val (hi2, lo2, _, _, _) = reference(3L + 256L)
    assert(hi1 == hi2 && lo1 == lo2)
  }
}
