package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable aggregate state — incremental rollup maintenance.
  *
  * The 100 TB pattern this encodes: a running rollup over an append-only
  * fact table must never re-scan history. Keep a compact per-group STATE
  * table of mergeable statistics; each new batch builds its own state
  * from just the new files and the two states merge group-wise. Merge
  * cost is proportional to |groups|, not |facts| — the whole point.
  *
  * Every statistic here is exactly mergeable AND engine-exact:
  *   n (count), sum_cents (money as long cents — associative integer
  *   addition, no float drift), min_v / max_v (doubles compared, never
  *   added). Average and range re-derive from state at read time.
  * Deliberately absent: exact distinct counts (not mergeable without
  *   the full key set — that is what [[graft.operators.Profile]]'s HLL
  *   pass and Spark's `hll_union_agg` sketches are for, see q68/q108).
  *
  * `AggStateSpec` proves the algebra (merge ≡ rebuild on random splits,
  * associativity, empty-side identity); the q124 oracle proves it
  * cross-engine — DuckDB re-derives the rollup from the FULL fact scan
  * while Spark answers from history-state ⊕ batch-state.
  */
object AggState {

  val statCols: Seq[String] = Seq("n", "sum_cents", "min_v", "max_v")

  /** Per-group state from a fact slice. One map-side-combined shuffle on
    * the group keys; sign-aware long-cents rounding matches the q25/q56
    * money convention (exact in both engines for two-decimal inputs of
    * either sign — half-away-from-zero, same as DECIMAL semantics). */
  // backquoted refs: dotted key/value names must not parse as nesting
  private def ref(c: String) = col("`" + c.replace("`", "``") + "`")

  /** Two-decimal money → long cents, exact for negative values too:
    * cast(long) truncates toward zero, so the 0.5 offset must carry the
    * value's sign (a bare +0.5 turns -1.25 into -124, not -125). */
  def cents(c: Column): Column =
    (c * 100 + when(c < 0, lit(-0.5)).otherwise(lit(0.5))).cast("long")

  def build(facts: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    require(keys.nonEmpty, "agg state needs at least one key column")
    facts.groupBy(keys.map(ref): _*).agg(
      count(lit(1)).as("n"),
      sum(cents(ref(valueCol))).as("sum_cents"),
      min(ref(valueCol)).as("min_v"),
      max(ref(valueCol)).as("max_v"))
  }

  /** Group-wise merge of any number of states. Groups absent from one
    * side pass through unchanged (union semantics); the shuffle moves
    * only state rows. */
  def merge(keys: Seq[String], states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "nothing to merge")
    states.foreach { st =>
      (keys ++ statCols).foreach { c =>
        require(st.columns.contains(c),
          s"state is not build-shaped: missing '$c'")
      }
    }
    states.reduce(_.unionByName(_)).groupBy(keys.map(ref): _*).agg(
      sum(col("n")).as("n"),
      sum(col("sum_cents")).as("sum_cents"),
      min(col("min_v")).as("min_v"),
      max(col("max_v")).as("max_v"))
  }

  // ---- frequency state: exact mergeable QUANTILES on the cents grid ----
  //
  // count/sum/min/max merge trivially; quantiles famously don't — the
  // standard answers are approximate sketches (q68's hll/approx_percentile
  // path). For MONEY-like columns there is an exact mergeable form: the
  // value domain is a discrete grid (long cents), so per-(group, value)
  // COUNTS are a complete, exactly mergeable description of the
  // distribution. State size is |groups| x |distinct values| — bounded by
  // the price grid, NOT by fact count, so a 100 TB fact history still
  // compacts to a small state table; any quantile then reads off the
  // state with one cumulative walk. All integer arithmetic: the rank
  // threshold `cum*qDen >= qNum*total` is the cross-multiplied form of
  // `cum >= ceil(total*q)` (equivalent over integers), no float rounding
  // anywhere — both engines agree bit-for-bit.

  /** Per-(group, cents-value) counts from a fact slice. One map-side
    * combined shuffle; same sign-aware cents convention as [[build]]. */
  def buildFreq(facts: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    buildFreqExpr(facts, keys, cents(ref(valueCol)))

  /** [[buildFreq]] with the grid value given as an arbitrary INTEGRAL
    * expression (already-long deviations, char counts, ...) — the
    * cents transform is just the money instance of the discrete grid. */
  def buildFreqExpr(facts: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    require(keys.nonEmpty, "freq state needs at least one key column")
    facts
      .groupBy(keys.map(ref) :+ value.cast("long").as("v_cents"): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Group-wise merge of freq states: counts add; values absent from one
    * side pass through (union semantics). Shuffles state rows only. */
  def mergeFreq(keys: Seq[String], states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "nothing to merge")
    states.foreach { st =>
      (keys ++ Seq("v_cents", "n")).foreach { c =>
        require(st.columns.contains(c),
          s"state is not buildFreq-shaped: missing '$c'")
      }
    }
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(ref) :+ col("v_cents"): _*)
      .agg(sum(col("n")).as("n"))
  }

  /** Median + MAD + k·MAD outlier count per group, read from a freq
    * state in ONE compact pass (q144's shape, r7). The state is
    * grid-bounded (that is the freq-state contract — |distinct values|
    * is a property of the value DOMAIN, not the fact count), so each
    * group's state packs into one sorted array row and everything
    * after the pack is one row-local kernel call
    * ([[graft.plans.GraftFreqStats]]: median walk, two-pointer
    * merge of the monotone deviation runs — no second sort — and the
    * k·MAD counting pass, all over primitive long arrays). Two
    * exchanges total (facts→state with map-side combine, state→group
    * arrays); the old two-chained-quantileFromFreq shape ran ~12
    * single-task stages. Measured (sf0.1, interleaved A/B): 1.9-2.2 s
    * → 1.1-1.4 s with interpreted HOF folds, → kernel replaces the
    * three folds + dev sort (same A/B protocol, numbers in
    * BASELINE.md). A repartition(keys)-first variant that fuses the
    * two exchanges into one reads another ~0.1 s faster but shuffles
    * RAW FACTS to |groups| partitions — scale-dishonest for few
    * groups, rejected.
    *
    * Regime note: this packs each group's grid into one row — right
    * whenever the grid fits a row (the same boundedness the freq-state
    * design already assumes). For grids beyond row capacity, the
    * distributed window walk [[quantileFromFreq]] remains the general
    * path (q135 keeps it for the merge-shaped median).
    *
    * Same integer rank rule as [[quantileFromFreq]] (cum*2 >= total,
    * lower median) — bit-identical to the window walk (AggStateSpec
    * pins equality on random data; the q144 oracle pins it
    * cross-engine). Returns (keys..., n, median_cents, mad_cents,
    * n_outliers). */
  def medianMadOutliers(state: DataFrame, keys: Seq[String],
                        madK: Long = 3L): DataFrame = {
    graft.plans.GraftExtensions.ensure(state.sparkSession)
    state.groupBy(keys.map(ref): _*)
      .agg(array_sort(collect_list(struct(col("v_cents"), col("n")))).as("fs"),
        sum(col("n")).as("total"))
      .withColumn("__s", call_function("graft_freq_stats",
        col("fs"), col("total"), lit(madK)))
      .select(
        keys.map(ref) ++ Seq(
          col("total").as("n"),
          element_at(col("__s"), 1).as("median_cents"),
          element_at(col("__s"), 2).as("mad_cents"),
          element_at(col("__s"), 3).as("n_outliers")): _*)
  }

  /** The qNum/qDen quantile (lower/disc convention: smallest value whose
    * cumulative count reaches ceil(total*q)) per group, read from a freq
    * state. Returns (keys..., n, q_cents). The two windows share one
    * exchange (same partition keys) and run over STATE rows, never facts. */
  def quantileFromFreq(state: DataFrame, keys: Seq[String],
                       qNum: Int, qDen: Int): DataFrame = {
    require(qNum > 0 && qNum <= qDen, s"quantile $qNum/$qDen out of (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val byKeys = Window.partitionBy(keys.map(ref): _*)
    val cum = byKeys.orderBy(col("v_cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    state
      .withColumn("cum", sum(col("n")).over(cum))
      .withColumn("total", sum(col("n")).over(byKeys))
      .filter(col("cum") * lit(qDen.toLong) >= lit(qNum.toLong) * col("total"))
      .groupBy(keys.map(ref): _*)
      .agg(max(col("total")).as("n"), min(col("v_cents")).as("q_cents"))
  }
}
