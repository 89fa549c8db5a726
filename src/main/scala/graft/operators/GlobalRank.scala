package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact global row-number without the single-partition window exchange.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY collapses the
  * whole dataset into ONE window partition — a scale-killer for a corpus
  * ranking pass (every row through one task). This operator produces the
  * identical ranks with the classic two-pass zipWithIndex scheme:
  *
  *   1. range-partition on the sort key (the same exchange a global
  *      `orderBy` performs) and sort within partitions;
  *   2. count rows per partition — one numPartitions-long array to the
  *      driver (the sanctioned tiny collect, like IVF centroids);
  *   3. re-read the SAME shuffle output (stage reuse: both jobs hang off
  *      one RDD, so the sort is not recomputed) and add
  *      `offset(partition) + local index`.
  *
  * The caller must pass a TOTAL order (tie-break to a unique column) or
  * ranks within ties are partition-placement-dependent.
  *
  * Reference shape: the top-N stats queries in the curation dashboard
  * (/root/reference/curate.py:7659-7698 top-counts sections);
  * at 100 TB those sorts must not serialize through one task.
  */
object GlobalRank {

  /** Returns `df` with an additional `rankCol` (1-based LongType) ordered
    * by `sortCols`. Output partitioning is the range partitioning of the
    * sort — downstream aggregations re-shuffle as usual.
    */
  def withGlobalRank(df: DataFrame, rankCol: String, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val ranged = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val rdd = ranged.rdd // one RDD object -> the count and rank jobs share the shuffle
    val counts = rdd
      .mapPartitionsWithIndex { case (i, it) => Iterator((i, it.size.toLong)) }
      .collect()
      .sortBy(_._1)
      .map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    val ranked = rdd.mapPartitionsWithIndex { case (i, it) =>
      var k = bcOffsets.value(i)
      it.map { row => k += 1; Row.fromSeq(row.toSeq :+ k) }
    }
    val schema = StructType(df.schema.fields :+ StructField(rankCol, LongType, nullable = false))
    spark.createDataFrame(ranked, schema)
  }
}
