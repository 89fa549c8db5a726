package graft.operators

import graft.SparkSpec

class AssemblySpec extends SparkSpec {
  import spark.implicits._

  test("cross-slot exclusion: a product topping two slots fills only the first") {
    // product 10 is rank-1 in BOTH slots; slot a (processed first) takes it,
    // slot b must fall back to its #2 (product 20).
    val cands = Seq(
      ("a", 10L, 100L), ("a", 11L, 90L),
      ("b", 10L, 95L), ("b", 20L, 80L), ("b", 21L, 70L))
      .toDF("slot", "product_id", "score")
    val out = Assembly.assembleDistinct(cands, "slot", "product_id", "score")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("a", 10L, 100L), ("b", 20L, 80L)))
  }

  test("ties break by ascending product id; within-slot duplicates keep max score") {
    val cands = Seq(
      ("a", 5L, 50L), ("a", 3L, 50L), // tie → product 3
      ("b", 3L, 60L), ("b", 3L, 40L), // dup product rows collapse to max=60
      ("b", 7L, 55L))
      .toDF("slot", "product_id", "score")
    val out = Assembly.assembleDistinct(cands, "slot", "product_id", "score")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    // slot a takes 3 (tie-break), so slot b's best (3 @ 60) is consumed → 7.
    assert(out.toSeq == Seq(("a", 3L, 50L), ("b", 7L, 55L)))
  }

  test("slot with fully-consumed pool stays unfilled") {
    val cands = Seq(
      ("a", 1L, 100L),
      ("b", 1L, 99L)) // b's only product is taken by a
      .toDF("slot", "product_id", "score")
    val out = Assembly.assembleDistinct(cands, "slot", "product_id", "score")
      .as[(String, Long, Long)].collect()
    assert(out.toSeq == Seq(("a", 1L, 100L)))
  }
}
