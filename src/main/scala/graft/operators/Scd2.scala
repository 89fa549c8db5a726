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

  // backquoted column refs: a key/tracked name containing a dot must not
  // parse as nested-field access (round-4 ADVICE class)
  private def ref(c: String): Column = col("`" + c.replace("`", "``") + "`")

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

    val w = Window.partitionBy(keys.map(ref): _*)
      .orderBy(ref(orderCol).asc, ref(tieBreak).asc)
    val changed: Column = tracked
      .map(c => !(ref(c) <=> lag(ref(c), 1).over(w)))
      .reduce(_ || _)

    log
      .withColumn("__rn", row_number().over(w))
      .withColumn("__chg", col("__rn") === 1 || changed)
      .filter(col("__chg"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from", ref(orderCol))
      .withColumn("valid_to", lead(ref(orderCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keys ++ tracked).map(ref) ++
        Seq("version", "valid_from", "valid_to", "is_current").map(col): _*)
  }

  /** Incremental history maintenance: fold a NEW batch of log rows into
    * an existing [[fromChangeLog]]-shaped history — the operation a
    * nightly warehouse job actually runs, where rebuilding history from
    * the full log is exactly what a 100 TB store cannot afford.
    *
    * Closed versions pass through UNTOUCHED (never shuffled, never even
    * deserialized past the is_current filter); only each key's open
    * version (one row per key) seeds the re-derivation window together
    * with the new batch. The seed carries its original `version` and
    * `valid_from`, so version ordinals continue and an unchanged key's
    * open row re-emits byte-identical. The work is therefore
    * O(open keys + batch), independent of history depth — that asymmetry
    * is the operator (same argument as [[AggState.merge]]).
    *
    * Contract: every batch `orderCol` value must be ≥ the open versions'
    * `valid_from` (an append-only log delivers this); `tieBreak` is
    * assumed non-negative — the seed sorts first at an equal timestamp
    * via a −1 sentinel. Scd2Spec proves incremental ≡ full rebuild on
    * random splits; the q129 oracle proves it cross-engine (DuckDB
    * rebuilds the FULL history while Spark applies the increment).
    */
  def applyIncrement(
      history: DataFrame,
      batch: DataFrame,
      keys: Seq[String],
      orderCol: String,
      tieBreak: String,
      tracked: Seq[String]): DataFrame = {
    val meta = Seq("version", "valid_from", "valid_to", "is_current")
    (keys ++ tracked ++ meta).foreach { c =>
      require(history.columns.contains(c),
        s"history is not fromChangeLog-shaped: missing '$c'")
    }
    meta.foreach { c =>
      require(!batch.columns.contains(c), s"batch already has a '$c' column")
    }
    val outCols = (keys ++ tracked).map(ref) ++
      Seq("version", "valid_from", "valid_to", "is_current").map(col)
    val closed = history.filter(!col("is_current")).select(outCols: _*)
    val seed = history.filter(col("is_current"))
      .select((keys ++ tracked).map(ref) ++ Seq(
        col("valid_from").as(orderCol),
        // Long.MinValue, not -1: the seed must sort strictly before ANY
        // batch row at an equal timestamp, including batches that carry
        // negative tieBreak values.
        lit(Long.MinValue).as(tieBreak),
        col("version").as("__v0")): _*)
    val delta = batch
      .select((keys ++ tracked ++ Seq(orderCol, tieBreak)).map(ref): _*)
      .withColumn("__v0", lit(null).cast("long"))
      .unionByName(seed)

    val w = Window.partitionBy(keys.map(ref): _*)
      .orderBy(ref(orderCol).asc, ref(tieBreak).asc)
    val wAll = Window.partitionBy(keys.map(ref): _*)
      .orderBy(ref(orderCol).asc, ref(tieBreak).asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val changed: Column = tracked
      .map(c => !(ref(c) <=> lag(ref(c), 1).over(w)))
      .reduce(_ || _)

    val reVersioned = delta
      .withColumn("__rn", row_number().over(w))
      .withColumn("__chg", col("__rn") === 1 || changed)
      .filter(col("__chg"))
      // seeded keys: continue from the open version's ordinal; brand-new
      // keys (no seed in the partition): start at 1
      .withColumn("__base", coalesce(max(col("__v0")).over(wAll), lit(1L)))
      .withColumn("version",
        (col("__base") + row_number().over(w) - lit(1)).cast("long"))
      .withColumn("valid_from", ref(orderCol))
      .withColumn("valid_to", lead(ref(orderCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(outCols: _*)
    closed.unionByName(reVersioned)
  }
}
