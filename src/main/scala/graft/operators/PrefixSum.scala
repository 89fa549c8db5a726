package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact distributed prefix sum (running total) without the
  * single-partition window exchange.
  *
  * `sum(w) OVER (ORDER BY ...)` with no PARTITION BY serializes the whole
  * table through ONE window task — the same scale-killer
  * [[GlobalRank]] removes for row_number. Identical cure: range-partition
  * on the sort key, per-partition sums to the driver (one numPartitions-
  * long array — the sanctioned tiny collect), broadcast the exclusive
  * offsets, then add `offset(partition) + running local sum` in one
  * mapPartitions pass over the SAME shuffle output (stage reuse — the
  * sort is not recomputed).
  *
  * The caller must pass a TOTAL order (tie-break to a unique column) or
  * the running total within ties is partition-placement-dependent. The
  * value column must be integral (LongType after cast) — exact
  * associative addition, no float drift.
  *
  * Two corpus-curation consumers ride on it:
  *  - [[budgetFill]]: "fill a token budget in priority order" — THE
  *    training-mix selection op (keep documents while the running token
  *    total fits the budget).
  *  - [[systematicPps]]: deterministic weighted sampling without
  *    replacement — systematic probability-proportional-to-size over the
  *    cumulative weight axis: k equally-spaced thresholds j*W/k hit row i
  *    iff cum_{i-1} <= j*W/k < cum_i, so row i is drawn with multiplicity
  *    floor(cum_i*k/W) - floor(cum_{i-1}*k/W) — expectation exactly
  *    proportional to weight, integer arithmetic end to end (the
  *    float-keyed alternative, Efraimidis-Sampling u^(1/w) order, is NOT
  *    cross-engine reproducible: libm pow differs in ulps).
  *
  * Reference shape: export batching/budgeting passes
  * (/root/reference/src/export/training_export.py cost-estimate sections)
  * generalized to corpus scale.
  */
object PrefixSum {

  /** Returns `df` plus `cumCol` = inclusive running total of `valueCol`
    * (cast to long) under the total order `sortCols`, and the grand
    * total, computed on the driver from the per-partition sums (no extra
    * job: the same array yields offsets and total). */
  def withRunningTotal(df: DataFrame, valueCol: String, cumCol: String,
                       sortCols: Column*): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    require(df.columns.contains(valueCol),
      s"value column '$valueCol' not in ${df.columns.mkString(",")}")
    require(!df.columns.contains("__w"), "reserved column name '__w' in input")
    require(!df.columns.contains(cumCol),
      s"cum column '$cumCol' already in input — downstream references " +
        "would be ambiguous")
    val withV = df.withColumn("__w", col(valueCol).cast(LongType))
    val ranged = withV.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val rdd = ranged.rdd // one RDD -> sums job and cumsum job share the shuffle
    val wIdx = ranged.columns.indexOf("__w")
    val sums = rdd
      .mapPartitionsWithIndex { case (i, it) =>
        var s = 0L
        it.foreach { r =>
          if (r.isNullAt(wIdx))
            throw new IllegalArgumentException(
              s"null/non-numeric '$valueCol' in prefix sum")
          // addExact: a corpus-scale weight sum past 2^63 must fail
          // loudly, not wrap into wrong running totals
          s = Math.addExact(s, r.getLong(wIdx))
        }
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(0L)(Math.addExact)
    val total = offsets.last
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    val cum = rdd.mapPartitionsWithIndex { case (i, it) =>
      var s = bcOffsets.value(i)
      it.map { row =>
        s = Math.addExact(s, row.getLong(wIdx))
        Row.fromSeq(row.toSeq.dropRight(1) :+ s)
      }
    }
    val schema = StructType(df.schema.fields :+ StructField(cumCol, LongType, nullable = false))
    (spark.createDataFrame(cum, schema), total)
  }

  /** Keep rows, in `sortCols` priority order, while the running total of
    * `valueCol` stays within `budget` (first row over the line is cut —
    * greedy prefix, the standard token-budget contract). */
  def budgetFill(df: DataFrame, valueCol: String, budget: Long,
                 sortCols: Column*): DataFrame = {
    val (cum, _) = withRunningTotal(df, valueCol, "cum_total", sortCols: _*)
    cum.filter(col("cum_total") <= budget)
  }

  /** Systematic PPS sample of size exactly `k` when no single weight
    * exceeds W/k (heavier rows draw with multiplicity — the standard
    * systematic-sampling contract). Returns picked rows + `cumCol` +
    * `n_picks`. Zero-weight rows are never picked. Caller contract:
    * weights non-negative (negative cumulative steps would make the
    * threshold count non-monotonic). */
  def systematicPps(df: DataFrame, weightCol: String, k: Int,
                    cumCol: String, sortCols: Column*): DataFrame = {
    require(k >= 1, s"sample size $k must be >= 1")
    val (cum, total) = withRunningTotal(df, weightCol, cumCol, sortCols: _*)
    require(total > 0, s"total weight $total must be positive")
    // cum*k is evaluated in Long SQL arithmetic below: past 2^63 it
    // would wrap silently and yield wrong multiplicities with no error
    require(total <= Long.MaxValue / k,
      s"total weight $total * k=$k would overflow 64-bit multiplicity " +
        "arithmetic; rescale the weights (divide by a common factor)")
    // integer floor-div (`div`) — operands non-negative, so both engines
    // agree; a double `/` would lose exactness once cum*k nears 2^53.
    // Backquoted refs: dotted/spaced column names must not parse as
    // nesting (same rule as AggState.ref).
    def bq(c: String) = "`" + c.replace("`", "``") + "`"
    val nPicks = expr(s"((${bq(cumCol)} * ${k}L) div ${total}L) - " +
      s"(((${bq(cumCol)} - CAST(${bq(weightCol)} AS BIGINT)) * ${k}L) div ${total}L)")
    cum.withColumn("n_picks", nPicks).filter(col("n_picks") >= 1)
  }
}
