package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Chunked replay of the sf0.001 documents through the accumulating
  * LSH warehouse sink: the drained pair log must equal the
  * from-scratch batch pair list (q38's oracle-green machinery) over
  * the same corpus — each pair emitted exactly once, in the
  * micro-batch where its later member arrived. */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming LSH warehouse replay equals the batch full rebuild") {
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val docs: Seq[(Long, String)] = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
      .as[(Long, String)].collect().toSeq
    val whDir = java.nio.file.Files
      .createTempDirectory("graft-stream-lsh").toString
    val ckDir = java.nio.file.Files
      .createTempDirectory("graft-stream-lsh-ck").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamingNearDup.run(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      whDir, ckDir, numPerms = 32, numBands = 8, shingleN = 3,
      threshold = 0.3)
    val size = math.max(1, math.ceil(docs.size / 7.0).toInt)
    docs.grouped(size).foreach { c =>
      input.addData(c); q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.read.parquet(s"$whDir/pairs")
      .select("id_a", "id_b", "n_common", "n_union")
      .as[(Long, Long, Int, Int)].collect().toSeq
    val batch = graft.operators.Dedup.minHashLshPortable(
        docs.toDF("doc_id", "text"), "doc_id", "text",
        numPerms = 32, numBands = 8, shingleN = 3, threshold = 0.3)
      .select("id_a", "id_b", "n_common", "n_union")
      .as[(Long, Long, Int, Int)].collect().toSeq
    assert(batch.nonEmpty, "fixture must contain near-dups")
    // exactly-once: multiset equality, not just set equality
    assert(streamed.sorted === batch.sorted)
  }
}
