package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter containment — the approximate form of the q71 shingle
  * semi-join, for the corpus size where even the distinct train-shingle
  * set is too large to broadcast or join cheaply.
  *
  * Built on Spark's own runtime-filter machinery (the
  * `BloomFilterAggregate` / `BloomFilterMightContain` pair AQE injects
  * for join pruning), surfaced as the `graft_bloom_agg` /
  * `graft_bloom_contains` functions: the filter is built as a
  * DISTRIBUTED aggregate (per-partition sketches OR-merged
  * associatively — no node ever holds the item set, only the fixed-size
  * bitmap) and the probe is a codegen'd bit test. One-sided error: a
  * contained item always hits; an absent item false-positives at the
  * bits/item-configured rate, so contamination estimates are UPPER
  * bounds — the safe direction for a train/eval leakage gate (it can
  * quarantine a clean doc, never clear a contaminated one).
  */
object BloomFilters {

  /** Aggregate column: bloom bitmap (binary) over the keys. */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    call_function("graft_bloom_agg", key, lit(expectedItems), lit(numBits))

  /** Probe: might `key` be in `bloom`? `bloom` must be a CONSTANT
    * (literal bitmap) — Catalyst requires a foldable filter side. */
  def mightContain(bloom: Column, key: Column): Column =
    call_function("graft_bloom_contains", bloom, key)

  /** Approximate contamination (q71's semantics, bloom-bounded): per
    * eval doc, the fraction of its distinct `keyCol` values that MIGHT
    * appear in `trainKeys`. The aggregate runs distributed; only the
    * final bitmap (numBits/8 bytes — e.g. 20 MB for 10^9 shingles at
    * 16 bits each) returns to the driver and ships to probes as a
    * literal, the same transfer Spark's own runtime filters make. */
  def approxContamination(trainKeys: DataFrame, evalKeyed: DataFrame,
                          idCol: String, keyCol: String,
                          expectedItems: Long, numBits: Long): DataFrame = {
    val bitmap = trainKeys
      .agg(bloomAgg(col(keyCol), expectedItems, numBits).as("b"))
      .head().getAs[Array[Byte]](0)
    evalKeyed
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(mightContain(lit(bitmap), col(keyCol)), 1L).otherwise(0L))
          .as("n_might_hit"))
      .withColumn("contamination_ub",
        col("n_might_hit").cast("double") / col("n_keys"))
  }
}
