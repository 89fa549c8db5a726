package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Live replay of the q155 LM scorer as a stream-static join: all
  * documents arrive over 6 micro-batches, the trained count tables are
  * static, and the drained per-doc scores must equal the oracle-green
  * batch query exactly (the streaming surface inherits the batch
  * oracle's authority).
  */
class StreamingLmScoreSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"

  test("streamed docs vs static LM tables equals batch q155") {
    graft.plans.GraftExtensions.ensure(spark)
    implicit val sqlCtx = spark.sqlContext

    val docs = graft.Tables.documents(spark, sfDir)
    val (bi0, uni0, v) = graft.operators.NgramLm.modelTables(
      docs.filter(col("doc_id") % 10 =!= 0), "text")
    // static side: materialized once, like warehouse tables
    val bi = bi0.localCheckpoint()
    val uni = uni0.localCheckpoint()

    val allDocs: Seq[(Long, String)] = docs
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq

    val input = MemoryStream[(Long, String)]
    val streamed = StreamingLmScore.scores(
      input.toDF().toDF("doc_id", "text"),
      col("doc_id"), col("text"), bi, uni, v)
    val q = streamed.writeStream
      .format("memory").queryName("lm_stream")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      val size = math.max(1, math.ceil(allDocs.size / 6.0).toInt)
      allDocs.grouped(size).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
      val got = spark.table("lm_stream")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
      val want = graft.SparkEntry.queries("q155_ngram_lm_score")(spark, sfDir)
        .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
      assert(want.nonEmpty)
      assert(got === want)
    } finally q.stop()
  }
}
