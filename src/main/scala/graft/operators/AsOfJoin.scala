package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the payload of the most
  * recent right row with the same key and `rightTime <= leftTime`.
  *
  * The classic training-data shapes — attribution (purchase → latest prior
  * click), point-in-time feature lookup (example → latest feature snapshot
  * at label time, avoiding leakage from the future) — are as-of joins.
  * Spark has no native ASOF operator (DuckDB does; the reference's
  * time-ordered lookups are row-local loops, e.g. the freshness pick in
  * pipeline.py), so this composes one from existing operators rather than
  * a custom physical plan:
  *
  *   union both sides → window over (key) ordered by (time, side) →
  *   `last(payload, ignoreNulls)` carried forward → keep left rows.
  *
  * Why this beats the naive formulations at 100 TB:
  *   - A theta-join `l.key = r.key AND r.t <= l.t` + argmax is a per-key
  *     cross product: O(|L_k|·|R_k|) per key before the reduction.
  *   - This plan is ONE hash shuffle of |L|+|R| rows on the key plus a
  *     per-key sort — O((|L_k|+|R_k|)·log) with no intermediate blowup,
  *     and the window's carry-forward state is a single struct.
  *   - Equal timestamps: right rows sort before left rows (side 0 < 1),
  *     so a right row at exactly `leftTime` IS visible — the `<=`
  *     convention, matching DuckDB `ASOF JOIN ... ON l.t >= r.t`.
  *
  * Contract: `right` must be unique per (keys, rightTime) — pre-aggregate
  * (e.g. argmax by a tie-break column) so the match is deterministic.
  * Key columns must share names across the two sides; left rows with no
  * prior right row get a null payload (left-outer semantics). Null keys
  * follow SQL join semantics: null-key right rows are dropped before the
  * union (Window.partitionBy would otherwise group them with null-key
  * left rows — a match SQL/DuckDB ASOF would never produce), so a
  * null-key left row always gets a null payload. Skewed keys
  * serialize within their partition (the carry-forward is inherently
  * sequential per key); for a monster key, pre-split by coarse time range
  * and replicate the last right row of each range into the next.
  */
object AsOfJoin {

  /** @param payload right-side columns to attach to each left row,
    *                emitted as `{prefix}{name}`; include a copy of the
    *                right time column if the match time is wanted. */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi-key")
    val rightSel = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .select((keys.map(col) :+ col(rightTime).as("__t") :+
        struct(payload.map(col): _*).as("__p")): _*)
      .withColumn("__side", lit(0))
    val leftSel = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    leftSel
      .unionByName(rightSel, allowMissingColumns = true)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        payload.map(c => col(s"__p.$c").as(s"$prefix$c")): _*)
  }

  /** Join-based backward as-of for the BUCKETED-HISTORY regime (r6,
    * VERDICT item 4): when the right side is a warehouse table bucketed
    * on the keys (e.g. a persisted SCD2 history), the union-window form
    * above throws that partitioning away — `UnionExec` reports unknown
    * partitioning, so the window re-shuffles |L|+|R| rows no matter how
    * the inputs arrive. This form instead LEFT-JOINs on the keys — the
    * bucketed scan satisfies the join's distribution, zero exchange on
    * the history side — and picks the latest `rightTime <= leftTime`
    * version per left row with a max-struct aggregate whose map-side
    * combine collapses to one row per left row before its exchange.
    *
    * The trade: the join expands each left row by its key's version
    * count before the partial aggregate collapses it — O(|L_k|·|R_k|)
    * per key, exactly what the union-window form avoids — so this is
    * the right shape ONLY when versions-per-key is small (SCD2
    * histories: a handful) and the history's exchange is already paid.
    * Same `<=` match convention and left-outer null payload as
    * [[backward]]; additional contract: left rows must be DISTINCT as
    * tuples (they become the group key).
    */
  def backwardViaJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi-key")
    val rightSel = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .select((keys.map(col) :+ col(rightTime).as("__t") :+
        struct(payload.map(col): _*).as("__p")): _*)
    left.join(rightSel, keys, "left")
      .groupBy(left.columns.map(col): _*)
      // max over (t, payload) structs = latest visible version; right is
      // unique per (keys, t) so the payload never decides the max
      .agg(max(when(col("__t") <= col(leftTime),
        struct(col("__t"), col("__p")))).as("__m"))
      .select(left.columns.map(col) ++
        payload.map(c => col(s"__m.__p.$c").as(s"$prefix$c")): _*)
  }
}
