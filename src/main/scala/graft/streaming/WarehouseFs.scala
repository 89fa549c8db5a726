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
}
