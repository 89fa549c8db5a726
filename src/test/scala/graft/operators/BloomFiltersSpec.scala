package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomFiltersSpec extends SparkSpec {
  import spark.implicits._

  private def bitmap(keys: org.apache.spark.sql.DataFrame): Array[Byte] =
    keys.agg(BloomFilters.bloomAgg(col("k"), 5000L, 5000L * 16).as("b"))
      .head().getAs[Array[Byte]](0)

  test("no false negatives: every inserted key hits") {
    val keys = spark.range(0, 5000).select(concat(lit("k"), col("id")).as("k"))
    val b = bitmap(keys)
    val misses = keys
      .filter(!BloomFilters.mightContain(lit(b), col("k"))).count()
    assert(misses === 0, "bloom filters must never false-negative")
  }

  test("absent keys mostly miss (fp rate bounded well under 5%)") {
    val keys = spark.range(0, 5000).select(concat(lit("k"), col("id")).as("k"))
    val b = bitmap(keys)
    val absent = spark.range(0, 5000).select(concat(lit("ABSENT"), col("id")).as("k"))
    val fp = absent.filter(BloomFilters.mightContain(lit(b), col("k"))).count()
    assert(fp < 250, s"fp=$fp of 5000 — rate too high for 16 bits/item")
  }

  test("approxContamination upper-bounds the exact q71-style join") {
    // train shingles t0..t999; eval docs: doc 1 fully contained, doc 2
    // half contained, doc 3 disjoint
    val train = (0 until 1000).map(i => s"t$i").toDF("shingle")
    val eval_ = (
      (1 to 20).map(i => (1L, s"t$i")) ++
      (1 to 10).map(i => (2L, s"t$i")) ++ (1 to 10).map(i => (2L, s"x$i")) ++
      (1 to 20).map(i => (3L, s"y$i"))).toDF("doc_id", "shingle")
    val approx = BloomFilters.approxContamination(
        train, eval_, "doc_id", "shingle", expectedItems = 1000L,
        numBits = 1000L * 16)
      .select(col("doc_id"), col("contamination_ub"))
      .as[(Long, Double)].collect().toMap
    val exact = eval_.join(train.withColumn("hit", lit(1)), Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg((sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1)))
        .as("c"))
      .as[(Long, Double)].collect().toMap
    exact.foreach { case (d, e) =>
      assert(approx(d) >= e - 1e-9, s"doc $d: approx ${approx(d)} < exact $e")
    }
    assert(approx(1L) === 1.0)      // fully contained: exact, no FP possible
    assert(approx(3L) < 0.3)        // disjoint: only FPs can hit
  }
}
