package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: match point rows with `timeCol` in
  * `[startCol, endCol)` to interval rows sharing the same key, without a
  * theta-join.
  *
  * Spark executes a plain `l.key = r.key AND t >= start AND t < end` join
  * as a hash join on the key followed by a per-key cross-product filter —
  * quadratic in the rows per key, which is exactly the shape that dies on
  * a hot key at 100 TB. This operator makes the join an EQUI-join by
  * time-binning (the trick behind Databricks' range-join hints and
  * Flink's interval join): each interval is exploded into the fixed-width
  * bins it overlaps, each point hashes to its own bin, and the join key
  * becomes (key, bin). The exact bound predicate then filters the
  * candidates.
  *
  * Cost model: an interval of length L produces ⌈L/binWidth⌉+1 bin rows,
  * so fan-out is bounded and chosen by `binWidth` — set it near the
  * median interval length so most intervals land in 1-2 bins; candidates
  * per point are the intervals overlapping its bin, not all intervals of
  * the key. All arithmetic is integer (`DIV`) — no double rounding on
  * epoch-nanos magnitudes (2^60; double division would lose the low
  * bits).
  *
  * Contract: times are non-negative longs on a shared clock; key columns
  * share names across the two sides; all other column names must be
  * disjoint (select/rename first). Returns matched (interval ⋈ point)
  * rows — aggregate or re-join to the interval table for outer semantics.
  */
object RangeJoin {

  /** Conservative fan-out assumed by the auto-broadcast decision: binWidth
    * is chosen near the interval length, so intervals land in 1-2 bins —
    * 4× covers that plus Catalyst's size-estimate optimism. */
  private val AutoBroadcastFanoutSafety = 4L

  /** @param broadcastIntervals Some(true): force-broadcast the binned
    *   interval side (the join then probes points in place — no shuffle of
    *   the large side at all). Some(false): never. None (default): AUTO —
    *   broadcast when the interval side's Catalyst size estimate, scaled
    *   by a conservative bin fan-out, fits the session's
    *   autoBroadcastJoinThreshold. The explicit decision exists because
    *   `explode` defeats Catalyst's size estimation: left to itself the
    *   planner sees an unknown-size side and will NOT broadcast, and AQE
    *   only discovers it after the interval side has already been
    *   shuffled once. */
  def intervalJoin(
      intervals: DataFrame,
      points: DataFrame,
      keys: Seq[String],
      startCol: String,
      endCol: String,
      timeCol: String,
      binWidth: Long,
      broadcastIntervals: Option[Boolean] = None): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val doBroadcast = broadcastIntervals.getOrElse {
      val threshold = intervals.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
      threshold > 0 && {
        val est = intervals.queryExecution.optimizedPlan.stats.sizeInBytes
        est * AutoBroadcastFanoutSafety <= threshold
      }
    }
    // Empty/inverted intervals ([s, e) with e <= s) match nothing; without
    // the guard, sequence(hi, lo) would emit a DESCENDING bin list — still
    // filtered out by the exact-bound predicate, but each degenerate
    // interval would fan out spurious candidate rows first.
    val binned0 = intervals.withColumn(
      "__bin",
      explode(when(col(endCol) > col(startCol),
        sequence(
          expr(s"$startCol DIV $binWidth"),
          expr(s"($endCol - 1) DIV $binWidth")))
        .otherwise(array())))
    val binned = if (doBroadcast) broadcast(binned0) else binned0
    val pts = points.withColumn("__bin", expr(s"$timeCol DIV $binWidth"))
    binned
      .join(pts, keys :+ "__bin")
      .filter(col(timeCol) >= col(startCol) && col(timeCol) < col(endCol))
      .drop("__bin")
  }

  /** Interval-INTERVAL overlap join: every (a, b) pair sharing `keys`
    * whose half-open intervals overlap (`aStart < bEnd && bStart < aEnd`
    * — touching intervals do NOT overlap), as an equi-join.
    *
    * Same binning trick as [[intervalJoin]], both sides exploded, with
    * the classic duplicate-free refinement: an overlapping pair shares
    * every bin their intersection covers, so the join would emit it
    * once per shared bin — instead the predicate keeps ONLY the bin
    * containing `max(aStart, bStart)` (the first instant of the
    * intersection), which each pair matches in EXACTLY one bin. No
    * distinct, no post-dedup shuffle — the join output IS the answer.
    *
    * Contract as [[intervalJoin]] (non-negative longs, shared key
    * names, otherwise-disjoint columns; empty intervals match nothing).
    * Fan-out per row is ceil(L/binWidth)+1 bins — pick binWidth near
    * the median interval length. */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn(
        "__bin",
        explode(when(col(e) > col(s),
          sequence(
            expr(s"$s DIV $binWidth"),
            expr(s"($e - 1) DIV $binWidth")))
          .otherwise(array())))
    binned(left, leftStart, leftEnd)
      .join(binned(right, rightStart, rightEnd), keys :+ "__bin")
      .filter(
        col(leftStart) < col(rightEnd) && col(rightStart) < col(leftEnd) &&
          // integer DIV — a double division would lose low bits at
          // epoch-nanos magnitudes (the intervalJoin scaladoc's rule)
          col("__bin") === expr(s"greatest($leftStart, $rightStart) DIV $binWidth"))
      .drop("__bin")
  }
}
