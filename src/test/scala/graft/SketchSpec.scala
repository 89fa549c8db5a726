package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates asserted against their exact twins (q68 oracles the
  * exact side; approximate answers are engine-specific so they are pinned
  * here, not cross-engine). Covers the two properties that matter at
  * 100 TB: bounded error, and mergeability (partial sketches from
  * map-side combine must union to the global answer — that is what makes
  * them one-shuffle aggregates). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet").cache()

  test("approx_count_distinct within 5% of exact per group") {
    val rows = docs.groupBy("lang")
      .agg(countDistinct($"source").as("exact"),
        approx_count_distinct($"source", 0.02).as("approx"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, exact, approx) =>
      assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.05).toLong),
        s"$lang: approx=$approx exact=$exact")
    }
  }

  test("approx_percentile lands on a value within 2% rank of the target") {
    val n = docs.count()
    val approx = docs.agg(
      expr("approx_percentile(n_chars, 0.5D, 10000)")).as[Long].head()
    // rank of the approximate answer must be within accuracy bounds
    val rankBelow = docs.filter($"n_chars" <= approx).count()
    val rank = rankBelow.toDouble / n
    assert(math.abs(rank - 0.5) <= 0.02, s"approx=$approx rank=$rank")
  }

  test("HLL sketches merge: per-source partials union to the global estimate") {
    // partial sketches per source (the map-side-combine shape) ...
    val partials = docs.groupBy("source")
      .agg(hll_sketch_agg($"doc_id").as("sk"))
    val merged = partials
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
      .as[Long].head()
    // ... must estimate the same universe as one global sketch
    val direct = docs
      .agg(hll_sketch_estimate(hll_sketch_agg($"doc_id")).as("est"))
      .as[Long].head()
    val exact = docs.select("doc_id").distinct().count()
    // Not asserted equal to `direct`: a small one-pass sketch stays in
    // datasketches' exact sparse mode while a union promotes to the dense
    // HLL array — both must stay within the configured error bound.
    assert(math.abs(direct - exact) <= math.max(1L, (exact * 0.05).toLong))
    assert(math.abs(merged - exact) <= math.max(1L, (exact * 0.05).toLong),
      s"merged=$merged exact=$exact")
  }
}
