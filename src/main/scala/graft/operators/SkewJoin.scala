package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join by key salting.
  *
  * A shuffle join partitions both sides by the join key; a hot key (one
  * celebrity user, one stop-word shingle, one "unknown" category) funnels
  * its entire partition through a single task and the stage runs at the
  * straggler's pace. AQE's skew-join split helps when statistics catch it
  * at runtime; salting is the DETERMINISTIC form of the same idea and the
  * only one available when the skewed side must join a side too large to
  * broadcast but too small to justify a stats pass.
  *
  * Shape: the skewed (fact) side gets a uniform salt in [0, buckets); the
  * other side is replicated `buckets`× via a literal-range explode. The
  * join key becomes (key, salt) — a hot key now spreads over `buckets`
  * tasks. Replication multiplies the small side's shuffle volume by
  * `buckets`, so this is for dimension-vs-fact skew, not fact-vs-fact
  * (there, split the hot keys out and broadcast just them).
  *
  * The salt column is non-deterministic-free: it hashes the fact side's
  * own row via a caller-chosen distribution column, so retried tasks
  * salt identically (a `rand()` salt breaks exactly-once under task
  * retry — the retried partition would re-shuffle rows to different
  * buckets than the first attempt's committed output).
  */
object SkewJoin {

  /** Inner/left equi-join `fact ⋈ dim` on `key`, salted `buckets` ways.
    * `distributeBy` picks the fact-side column whose hash spreads the hot
    * key's rows (a unique row id is ideal). */
  def salted(fact: DataFrame, dim: DataFrame, key: String,
             distributeBy: Column, buckets: Int = 16,
             joinType: String = "inner"): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(joinType == "inner" || joinType == "left",
      s"salted join supports inner/left, got $joinType")
    // withColumn silently REPLACES an existing column — a pre-existing
    // __salt on either input would corrupt the join keys, not fail
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "inputs must not already have a __salt column")
    val salted = fact.withColumn("__salt", pmod(hash(distributeBy), lit(buckets)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Fact-vs-fact equi-join with a hot-key split — the variant salting
    * cannot cover (replicating a FACT side `buckets`× multiplies a big
    * shuffle by `buckets`).
    *
    * Shape: one aggregation pass over `left` finds the keys whose row
    * count reaches `hotThreshold` (map-side partial agg — only the
    * distinct keys shuffle, and the surviving hot list is tiny by
    * definition: k keys can exceed a threshold of n/k at most k times).
    * Both sides then split on that broadcast list:
    *   - COLD keys: plain shuffle join — no hot key present, so every
    *     partition is bounded by the threshold and no straggler forms;
    *   - HOT keys: `left`'s hot rows stream map-side against a BROADCAST
    *     of `right`'s hot rows — the hot keys never enter a shuffle at
    *     all, so the one partition that would have stalled the stage is
    *     instead spread across every task that holds hot left rows.
    * The union is exactly `left ⋈ right`: leftHot/leftCold partition
    * `left`, and cold⋈rightCold loses nothing because cold keys cannot
    * match right's hot rows (hot membership is a property of the key).
    *
    * Contract: `right`'s hot-key rows must fit in a broadcast (they are
    * |hotKeys| × right's per-key multiplicity — small whenever the skew
    * is on `left`, which is the scenario; if BOTH sides are hot on the
    * same key the join is genuinely quadratic and no plan shape fixes
    * that). `left`-hot keys absent from `right` null-extend correctly
    * under `joinType = "left"` via the broadcast branch. */
  def hotSplit(left: DataFrame, right: DataFrame, key: String,
               hotThreshold: Long, joinType: String = "inner"): DataFrame = {
    require(hotThreshold >= 1, s"hotThreshold must be >= 1, got $hotThreshold")
    require(joinType == "inner" || joinType == "left",
      s"hotSplit join supports inner/left, got $joinType")
    val hotKeys = broadcast(
      left.groupBy(col(key)).agg(count(lit(1)).as("__hot_n"))
        .filter(col("__hot_n") >= hotThreshold)
        .select(col(key)))
    val leftHot  = left.join(hotKeys, Seq(key), "left_semi")
    val leftCold = left.join(hotKeys, Seq(key), "left_anti")
    val rightHot  = right.join(hotKeys, Seq(key), "left_semi")
    val rightCold = right.join(hotKeys, Seq(key), "left_anti")
    leftHot.join(broadcast(rightHot), Seq(key), joinType)
      .unionByName(leftCold.join(rightCold, Seq(key), joinType))
  }
}
