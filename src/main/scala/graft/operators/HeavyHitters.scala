package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Heavy-hitter detection past the all-keys-shuffle ceiling — the
  * count-min-sketch twin of [[BloomFilters]]' membership gate.
  *
  * The exact formulation (`GROUP BY key HAVING count >= T`) shuffles
  * EVERY key occurrence: at 10^11 token rows with 10^9 distinct keys
  * that shuffle is the job. A count-min sketch is a fixed-size counter
  * matrix whose build is a distributed aggregate (per-partition
  * matrices, element-wise added on merge — only depth×width counters
  * ever move) and whose estimate is ONE-SIDED: never below a key's true
  * count. So `estimate(key) >= T` keeps every true heavy hitter, and
  * filtering on it MAP-SIDE, before the shuffle, leaves the exact
  * group-by touching only candidate rows — frequency above a real
  * threshold is rare by definition, so the surviving fraction is tiny.
  * The final exact count then discards the sketch's false positives:
  * the result is EXACT at any sketch sizing; sizing only tunes how much
  * pruning the sketch buys (overestimate ≈ eps × total row count, so
  * choose eps ≈ T / (10 × N) to prune keys an order of magnitude below
  * the threshold).
  */
object HeavyHitters {

  /** Build a count-min sketch over `key` (the builtin distributed
    * aggregate) and return its serialized form. Only the depth×width
    * counter matrix reaches the driver — never a key set. */
  def sketchBytes(df: DataFrame, key: Column,
                  eps: Double, confidence: Double, seed: Int): Array[Byte] =
    df.agg(call_function("count_min_sketch",
        key, lit(eps), lit(confidence), lit(seed)).as("s"))
      .head().getAs[Array[Byte]](0)

  /** Frequency (over-)estimate of `key` under a built sketch — a
    * codegen'd probe usable in any filter/projection. */
  def estimate(sketch: Array[Byte], key: Column): Column =
    call_function("graft_cms_estimate", lit(sketch), key)

  /** All keys occurring at least `threshold` times, with their EXACT
    * counts — sketch-pruned, exact-verified (see scaladoc above).
    * Output: (<keyCol>, n). */
  def exactAtLeast(df: DataFrame, keyCol: String, threshold: Long,
                   eps: Double = 1e-4, confidence: Double = 0.99,
                   seed: Int = 42): DataFrame = {
    require(threshold >= 1, s"threshold must be positive, got $threshold")
    val sk = sketchBytes(df, col(keyCol), eps, confidence, seed)
    df.filter(estimate(sk, col(keyCol)) >= threshold)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
  }

  /** [[exactAtLeast]] with the threshold expressed as a fraction of the
    * total row count: keys occurring at least once per `denom` rows.
    * The total comes from the sketch itself (`totalCount` counts every
    * add exactly), so the build pass is not repeated. */
  def exactAtLeastFraction(df: DataFrame, keyCol: String, denom: Long,
                           eps: Double = 1e-4, confidence: Double = 0.99,
                           seed: Int = 42): DataFrame = {
    require(denom >= 1, s"denom must be positive, got $denom")
    val sk = sketchBytes(df, col(keyCol), eps, confidence, seed)
    val threshold =
      math.max(1L, CountMinSketch.readFrom(sk).totalCount() / denom)
    df.filter(estimate(sk, col(keyCol)) >= threshold)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
  }

  /** The mergeable per-key count state an accumulating deployment
    * persists: (keyCol, n). States of disjoint corpora merge by
    * union + re-sum — the additive-state contract. */
  def countState(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))

  /** Incremental heavy hitters — the count-state form of
    * [[exactAtLeastFraction]] for the daily-batch shape: the persisted
    * warehouse count state (vocabulary-bounded) merges with the
    * batch's counts by addition, the fractional threshold recomputes
    * from the MERGED total (heavy-hitterhood is global: a batch moves
    * the bar for every key), and the hitters read straight off the
    * merged relation. Only the batch is ever tokenized/scanned; no
    * sketch is needed because the state already IS exact counts — the
    * CM sketch in the from-scratch form exists to prune the full
    * corpus shuffle this form never performs. Answers exactly what
    * [[exactAtLeastFraction]] over warehouse ∪ batch answers
    * (oracle-gated, the q181 contract). Output: (keyCol, n). */
  def exactAtLeastFractionIncremental(warehouseCounts: DataFrame,
                                      batch: DataFrame, keyCol: String,
                                      denom: Long): DataFrame = {
    require(denom >= 1, s"denom must be positive, got $denom")
    val merged = warehouseCounts.select(col(keyCol), col("n"))
      .unionByName(countState(batch, keyCol))
      .groupBy(col(keyCol)).agg(sum(col("n")).as("n"))
    val total = merged.agg(sum(col("n")).as("__tot"))
    merged.crossJoin(broadcast(total))
      .filter(col("n") >= greatest(lit(1L), expr(s"__tot div $denom")))
      .select(col(keyCol), col("n"))
  }
}
