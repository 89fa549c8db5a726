package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Chunked replay of the sf0.001 document lengths through the
  * accumulating PSI sink: each chunk's gate artifact must equal the
  * batch operator (q205's oracle-green path) run on (reference bins,
  * prefix ∪ chunk), i.e. transitively the q203 full scan over the same
  * rows — plus the r11 replay-idempotency contract. */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  test("streaming PSI warehouse replay equals per-chunk batch operator; " +
      "replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sfDir)
    val isNew = col("doc_id") % 7 === 0
    val ref = docs.filter(!isNew).select(col("n_chars"))
    val cur: Seq[Long] = docs.filter(isNew)
      .orderBy(col("doc_id")).select(col("n_chars")).as[Long].collect().toSeq
    val whDir = java.nio.file.Files
      .createTempDirectory("graft-stream-psi").toString
    val ckDir = java.nio.file.Files
      .createTempDirectory("graft-stream-psi-ck").toString
    StreamingDrift.writeReference(ref, "n_chars", 100L, whDir)
    val input = MemoryStream[Long]
    val q = StreamingDrift.run(input.toDF().toDF("n_chars"),
      "n_chars", 100L, whDir, ckDir)
    val size = math.max(1, math.ceil(cur.size / 4.0).toInt)
    val chunks = cur.grouped(size).toSeq
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()
    def psiOf(batch: Long) = spark.read
      .parquet(s"$whDir/psi/batch=$batch")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // per chunk: the batch operator over (ref, prefix-through-chunk)
    chunks.indices.foreach { i =>
      val upTo = chunks.take(i + 1).flatten
      val expect = graft.operators.DriftMonitor
        .psiByBin(ref, upTo.toDF("n_chars"), "n_chars", 100L)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(psiOf(i.toLong) === expect, s"chunk $i")
    }
    // replay idempotency: re-running the last micro-batch replaces its
    // own output and never double-counts the additive histogram state
    val last = chunks.size - 1L
    val before = psiOf(last)
    StreamingDrift.psiSink(whDir, "n_chars", 100L)(
      chunks.last.toDF("n_chars"), last)
    assert(psiOf(last) === before)
    val stateTotal = spark.read.parquet(s"$whDir/cur_bins")
      .groupBy().agg(sum(col("n"))).as[Long].head()
    assert(stateTotal === cur.size.toLong)
  }
}
