package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of several scan
  * dimensions into one sort key so that range-partitioned files are
  * tight boxes in EVERY interleaved dimension at once.
  *
  * Why this matters at 100 TB: parquet min/max pruning skips a file only
  * when the filter column's range excludes it. A linear sort gives
  * perfect skipping on the sort column and none on the others; Z-order
  * gives near-uniform skipping on all d interleaved columns — the
  * standard layout trick for multi-dimensional point/box queries
  * (Databricks OPTIMIZE ZORDER, Iceberg sort orders).
  *
  * The interleave is plain integer bit arithmetic (shift/mask/add of
  * disjoint bits), fully codegen'd and bit-identical in any engine, so
  * Z-values are oracle-checkable (q120).
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of each (non-negative
    * integral) column: bit b of column c lands at position
    * b * ncols + c. Total bits must fit a signed long. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val n = cols.length
    require(n >= 2, "zValue needs at least 2 dimensions")
    require(bits * n <= 62, s"$n cols x $bits bits overflow a signed long")
    val terms = for {
      b <- 0 until bits
      c <- 0 until n
    } yield shiftleft(shiftright(cols(c).cast("long"), b).bitwiseAND(lit(1L)), b * n + c)
    terms.reduce(_ + _) // disjoint bit positions: + is |, and + is what DuckDB folds too
  }

  /** Range-partition by Z-value: the write-side layout operator. Each of
    * the `numFiles` output partitions covers a contiguous Z-range — a
    * tight box in every interleaved dimension — so a reader filtering on
    * ANY of `cols` can skip most files on min/max stats alone. */
  def layoutByZ(df: DataFrame, cols: Seq[String], bits: Int, numFiles: Int): DataFrame =
    df.withColumn("__z", zValue(cols.map(col), bits))
      .repartitionByRange(numFiles, org.apache.spark.sql.functions.col("__z"))
      .drop("__z")

  /** Per-partition min/max of each dimension — the file-footer stats a
    * reader would prune on. Diagnostic for specs/smokes. */
  def partitionStats(df: DataFrame, cols: Seq[String]): Array[(Int, Seq[(Long, Long)])] = {
    val idx = cols.map(c => df.columns.indexOf(c))
    require(idx.forall(_ >= 0), s"missing columns in ${df.columns.mkString(",")}")
    df.rdd.mapPartitionsWithIndex { case (pid, it) =>
      val mins = Array.fill(idx.length)(Long.MaxValue)
      val maxs = Array.fill(idx.length)(Long.MinValue)
      var any = false
      it.foreach { r =>
        any = true
        var i = 0
        while (i < idx.length) {
          val v = r.getLong(idx(i))
          if (v < mins(i)) mins(i) = v
          if (v > maxs(i)) maxs(i) = v
          i += 1
        }
      }
      if (any) Iterator.single((pid, mins.zip(maxs).toSeq)) else Iterator.empty
    }.collect()
  }
}
