package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Live replay of the q153 decontamination as a stream-static join:
  * eval documents arrive over 7 micro-batches, the train shingle set is
  * static, and the drained per-doc dirty counts must equal the
  * oracle-green batch query exactly (the streaming surface inherits the
  * batch oracle's authority — the T1/SCD2 precedent).
  */
class StreamingContaminationSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"

  test("streamed eval docs vs static train shingles equals batch q153") {
    graft.plans.GraftExtensions.ensure(spark)
    implicit val sqlCtx = spark.sqlContext

    val docs = graft.Tables.documents(spark, sfDir)
    val trainShingles = docs.filter(col("doc_id") % 10 =!= 0)
      .select(explode(call_function("graft_shingles", col("text"), lit(13)))
        .as("shingle"))
      .distinct()
      .localCheckpoint() // static side: materialized once, like a warehouse table

    val evalDocs: Seq[(Long, String)] = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq

    val input = MemoryStream[(Long, String)]
    val streamed = StreamingContamination.dirtyCounts(
      input.toDF().toDF("doc_id", "text"),
      col("text"), col("doc_id"), trainShingles, n = 13)
    val q = streamed.writeStream
      .format("memory").queryName("dirty_stream")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      val size = math.max(1, math.ceil(evalDocs.size / 7.0).toInt)
      evalDocs.grouped(size).foreach { chunk =>
        input.addData(chunk: _*)
        q.processAllAvailable()
      }
      val got = spark.table("dirty_stream")
        .as[(Long, Long)].collect().toSeq.sorted
      val want = graft.SparkEntry.queries("q153_decontaminate_13gram")(spark, sfDir)
        .as[(Long, Long)].collect().toSeq.sorted
      assert(want.nonEmpty, "fixture produced no dirty docs — test is vacuous")
      assert(got === want)
    } finally q.stop()
  }
}
