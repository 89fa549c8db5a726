package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history from a change log.
  *
  * The reference keeps only latest-wins state (`supabase_loader.py`
  * upsert semantics — our S5/S6, `Pipeline.upsert`); a warehouse that
  * feeds time-travel joins and training-data reproducibility needs the
  * OTHER half: every version a key ever had, with its validity interval.
  * This operator derives that history from an append-only change log in
  * one pass:
  *
  *  1. one window over (keys, orderCol, tieBreak) drops log rows whose
  *     tracked attributes are unchanged vs the previous row (null-safe
  *     `<=>`, so null→value and value→null transitions version correctly);
  *  2. a second window over the surviving version rows assigns
  *     `version` ordinals and half-open validity: `valid_from` =
  *     change time, `valid_to` = next change time, null = current row.
  *
  * Scale shape: both windows partition by the SAME keys, so Catalyst
  * plans ONE hash exchange; the change-filter preserves distribution
  * and sort, so the second window adds no shuffle and no re-sort
  * (Scd2Spec asserts exactly one Exchange in the plan). Per-key state
  * is the window frame row — nothing accumulates. The output then
  * joins facts as-of (`AsOfJoin`) or by `valid_from <= t < valid_to`
  * range (`RangeJoin`) without ever rebuilding history.
  *
  * Determinism: `tieBreak` must be unique per (keys, orderCol) —
  * simultaneous log rows version in a stable order on both engines.
  */
object Scd2 {

  def fromChangeLog(
      log: DataFrame,
      keys: Seq[String],
      orderCol: String,
      tieBreak: String,
      tracked: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "scd2 needs at least one key column")
    require(tracked.nonEmpty, "scd2 needs at least one tracked column")
    val reserved = Seq("__rn", "__chg", "version", "valid_from", "valid_to", "is_current")
    reserved.foreach { c =>
      require(!log.columns.contains(c), s"input already has a $c column")
    }

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).asc, col(tieBreak).asc)
    val changed: Column = tracked
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _)

    log
      .withColumn("__rn", row_number().over(w))
      .withColumn("__chg", col("__rn") === 1 || changed)
      .filter(col("__chg"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keys ++ tracked ++
        Seq("version", "valid_from", "valid_to", "is_current")).map(col): _*)
  }
}
