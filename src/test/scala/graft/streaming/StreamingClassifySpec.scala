package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Chunked replay of the sf0.001 documents through the accumulating NB
  * model sink: each chunk's streamed decisions must equal the batch
  * incremental operator (q195's oracle-green path) run against the
  * same prefix warehouse — every doc classified exactly once, against
  * the model of everything seen up to and including its batch. */
class StreamingClassifySpec extends SparkSpec {
  import spark.implicits._

  test("streaming NB warehouse replay equals per-chunk batch incremental") {
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val docs: Seq[(Long, String, String)] = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
      .orderBy(col("doc_id"))
      .as[(Long, String, String)].collect().toSeq
    val whDir = java.nio.file.Files
      .createTempDirectory("graft-stream-nb").toString
    val ckDir = java.nio.file.Files
      .createTempDirectory("graft-stream-nb-ck").toString
    val input = MemoryStream[(Long, String, String)]
    val q = StreamingClassify.run(
      input.toDF().toDF("doc_id", "lang", "text"),
      "doc_id", "lang", "text", whDir, ckDir)
    val size = math.max(1, math.ceil(docs.size / 5.0).toInt)
    val chunks = docs.grouped(size).toSeq
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()
    def readDecisions() = spark.read.parquet(s"$whDir/decisions")
      .select(col("doc_id"), col("lang"), col("predicted"),
        col("score_e16"), col("margin_e16"), col("correct"))
      .as[(Long, String, String, Long, Long, Boolean)]
      .collect().toSeq.sortBy(_._1)
    val streamed = readDecisions()
    // exactly-once: one decision per streamed doc
    assert(streamed.map(_._1) === docs.map(_._1))
    // replay idempotency (r11, ADVICE): re-running the LAST micro-batch
    // through the sink — the restart-replay shape — must leave the
    // decision log AND the additive count state unchanged, not append
    // duplicates that would permanently skew priors/likelihoods
    def wcTotal() = spark.read.parquet(s"$whDir/word_counts")
      .groupBy().agg(sum(col("c"))).as[Long].head()
    val wcBefore = wcTotal()
    StreamingClassify.nbSink(whDir, "doc_id", "lang", "text")(
      chunks.last.toDF("doc_id", "lang", "text"), chunks.size - 1L)
    assert(readDecisions() === streamed)
    assert(wcTotal() === wcBefore)
    // per-chunk: the batch incremental operator against the prefix
    val expected = chunks.zipWithIndex.flatMap { case (c, i) =>
      val prefix = chunks.take(i).flatten
      val wh = prefix.toDF("doc_id", "lang", "text")
      graft.operators.NaiveBayes.classifyIncremental(
          graft.operators.NaiveBayes.wordCounts(wh, "lang", "text"),
          graft.operators.NaiveBayes.docCounts(wh, "lang"),
          c.toDF("doc_id", "lang", "text"), "doc_id", "lang", "text")
        .as[(Long, String, String, Long, Long, Boolean)].collect().toSeq
    }.sortBy(_._1)
    assert(streamed === expected)
  }
}
