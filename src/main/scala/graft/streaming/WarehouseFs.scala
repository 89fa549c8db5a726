package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Warehouse-path existence through the Hadoop FileSystem resolved
  * FOR that path (r12, ADVICE): the streaming sinks' prefix-state
  * reads used `java.io.File.exists`, which silently reads empty prior
  * state (or fails a require) whenever the warehouse lives on a
  * non-local URI (hdfs://, s3a://) — the very deployment the
  * foreachBatch warehouses are designed for. `path.getFileSystem`
  * resolves the scheme against the session's Hadoop conf, so local
  * test warehouses and cluster URIs take the same code path.
  */
object WarehouseFs {
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Integral partition values under `path` (`<col>=<id>` directories),
    * via one FileSystem listing — the O(1-listing) way to find the
    * latest partition of an ever-growing history (vs scanning every
    * partition's rows, which is O(batches) per micro-batch). Non-pattern
    * entries (e.g. `_SUCCESS`) are skipped. */
  def listPartitionIds(spark: SparkSession, path: String,
                       col: String): Seq[Long] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq()
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith(col + "=") =>
        n.stripPrefix(col + "=") }
      .flatMap(v => scala.util.Try(v.toLong).toOption)
  }
}
