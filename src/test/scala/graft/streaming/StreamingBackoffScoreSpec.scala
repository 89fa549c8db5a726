package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Live replay of the q161 Stupid Backoff scorer as a stream-static
  * join chain: all documents arrive over 6 micro-batches, the trained
  * gram table + token total are static, and the drained per-doc scores
  * must equal the oracle-green batch query exactly (the streaming
  * surface inherits the batch oracle's authority — the
  * StreamingLmScore precedent, one model deeper).
  */
class StreamingBackoffScoreSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"

  test("streamed docs vs static backoff tables equals batch q161") {
    graft.plans.GraftExtensions.ensure(spark)
    implicit val sqlCtx = spark.sqlContext

    val docs = graft.Tables.documents(spark, sfDir)
    val (grams0, nTok) = graft.operators.NgramLm.backoffTables(
      docs.filter(col("doc_id") % 10 =!= 0), "text", n = 3)
    // static side: materialized once, like warehouse tables
    val grams = grams0.localCheckpoint()

    val allDocs: Seq[(Long, String)] = docs
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq

    val input = MemoryStream[(Long, String)]
    val streamed = StreamingBackoffScore.scores(
      input.toDF().toDF("doc_id", "text"),
      col("doc_id"), col("text"), grams, nTok, n = 3)
    val q = streamed.writeStream
      .format("memory").queryName("backoff_stream")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      val size = math.max(1, math.ceil(allDocs.size / 6.0).toInt)
      allDocs.grouped(size).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
      val got = spark.table("backoff_stream")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
      val want = graft.SparkEntry.queries("q161_stupid_backoff_lm")(spark, sfDir)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
      assert(want.nonEmpty)
      assert(got === want)
    } finally q.stop()
  }
}
