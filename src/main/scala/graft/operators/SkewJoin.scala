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
    val salted = fact.withColumn("__salt", pmod(hash(distributeBy), lit(buckets)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
