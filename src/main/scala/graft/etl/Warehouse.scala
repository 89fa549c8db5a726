package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Warehouse layout management (SURVEY §7.1 step 5): partitioned +
  * bucketed persistent tables so the hot keyed operations (S5 upsert
  * merge, J1-J5 product joins, P9 group-bys) run WITHOUT a shuffle.
  *
  * Layout policy for the products star (mirrors §1.1):
  *  - fact-ish tables bucketed by their join/merge key (`product_id`) —
  *    two tables bucketed the same way join bucket-to-bucket (no
  *    Exchange), and an upsert merge windows within buckets;
  *  - partitioned by a low-cardinality pruning column (e.g.
  *    `category_refitd`) so per-category queries touch one directory;
  *  - bucket counts are powers of two so they can be coalesced (Spark
  *    joins tables with differing bucket counts when one divides the
  *    other, `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
  *
  * At 100 TB this is the difference between an O(data) shuffle per merge
  * and a local per-bucket sort.
  */
object Warehouse {

  /** Write a table bucketed by `key` (and optionally partitioned), as a
    * persistent table in the session catalog (bucketing metadata lives in
    * the metastore; plain `.parquet()` writes cannot carry it).
    *
    * Partitioned writes CLUSTER on the partition columns first: without
    * the repartition every write task holds rows of every partition
    * value and the table explodes into |tasks| × |partitions| tiny
    * files — the r7 ANN x250 smoke measured it directly (IVF-256 build
    * at 500k vectors: ~15k files, 22 s, all filesystem overhead;
    * clustered: |cells| × |buckets| files and the build is
    * assignment-bound). The extra exchange is data-proportional and is
    * exactly what a production partitioned-table writer does. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8, partitionBy: Seq[String] = Nil,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    writeBucketedKeys(df, table, Seq(key), buckets, partitionBy, mode)

  /** [[writeBucketed]] on a COMPOSITE key: tables probed by a
    * multi-column equi-join (e.g. the LSH band state's (band, bhash))
    * bucket + sort on the full key tuple, so the probe's required
    * distribution is satisfied by the scan for ANY
    * requireAllClusterKeys setting — the warehouse side never
    * exchanges, only the (batch-proportional) probe side shuffles. */
  def writeBucketedKeys(df: DataFrame, table: String, keys: Seq[String],
                        buckets: Int = 8, partitionBy: Seq[String] = Nil,
                        mode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.functions.col
    require(keys.nonEmpty, "bucketed write needs at least one key")
    val clustered =
      if (partitionBy.nonEmpty) df.repartition(partitionBy.map(col): _*)
      else df
    val w = clustered.write.mode(mode).format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .saveAsTable(table)
  }

  /** Bucket-local upsert: merge updates into a bucketed table and rewrite
    * it. With both sides bucketed on the key, the row_number window
    * reuses the bucket hash-partitioning — no exchange on the big side. */
  def upsertBucketed(spark: SparkSession, table: String, updates: DataFrame,
                     key: String, version: String, buckets: Int = 8): Unit = {
    val merged = Pipeline.upsert(spark.table(table), updates, key, version)
    // rewrite via a stable staging name, then swap
    val staging = table + "__staging"
    writeBucketed(merged, staging, key, buckets)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"ALTER TABLE $staging RENAME TO $table")
  }
}
