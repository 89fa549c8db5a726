package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.nio.file.Files

class IncrementalIngestSpec extends SparkSpec {
  import spark.implicits._
  import IncrementalIngest.Keyed

  test("firstSeenOnly: cross-batch keyed-state dedup (T1)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Keyed]
    val q = IncrementalIngest.firstSeenOnly(input.toDS())
      .writeStream.format("memory").queryName("first_seen")
      .outputMode(OutputMode.Append).start()
    input.addData(Keyed("a", "v1"), Keyed("b", "v1"), Keyed("a", "v2"))
    q.processAllAvailable()
    input.addData(Keyed("a", "v3"), Keyed("c", "v1")) // a already seen
    q.processAllAvailable()
    val out = spark.table("first_seen").as[Keyed].collect()
      .map(k => k.key -> k.payload).sortBy(_._1)
    q.stop()
    assert(out.map(_._1).toSeq == Seq("a", "b", "c")) // one row per key, ever
  }

  test("windowedEventCounts: watermark drops late data, windows aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val q = IncrementalIngest.windowedEventCounts(df, "ts", "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append).start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    input.addData((ts(0), "click", 1.0), (ts(1), "click", 2.0), (ts(7), "view", 1.0))
    q.processAllAvailable()
    // advance watermark far past the first windows, then emit late row
    input.addData((ts(40), "click", 1.0))
    q.processAllAvailable()
    input.addData((ts(2), "click", 99.0)) // late beyond watermark → dropped
    q.processAllAvailable()
    val rows = spark.table("win_counts")
      .selectExpr("window.start", "event_type", "n").collect()
    q.stop()
    val clickWindow = rows.find(r => r.getString(1) == "click")
    assert(clickWindow.isDefined)
    assert(clickWindow.get.getLong(2) == 2) // late 99.0 row not counted
  }

  test("foreachBatch dedup sink appends only unseen keys (T1 batch twin)") {
    val dir = Files.createTempDirectory("graft-wh").toString + "/products"
    val b1 = Seq(("p1", "v1"), ("p2", "v1")).toDF("product_id", "payload")
    IncrementalIngest.dedupedAppendSink(dir, "product_id")(b1, 0L)
    val b2 = Seq(("p2", "v2"), ("p3", "v1")).toDF("product_id", "payload")
    IncrementalIngest.dedupedAppendSink(dir, "product_id")(b2, 1L)
    val state = spark.read.parquet(dir).as[(String, String)].collect().sortBy(_._1)
    assert(state.toSeq == Seq(("p1", "v1"), ("p2", "v1"), ("p3", "v1")))
  }

  test("refreshQueue ranks stale items first (T4)") {
    val products = Seq(
      ("p_old", java.sql.Date.valueOf("2001-01-01")),
      ("p_new", java.sql.Date.valueOf("2001-12-25")))
      .toDF("product_id", "last_checked_at")
    val queue = IncrementalIngest.refreshQueue(
      products, "last_checked_at", "2002-01-01",
      org.apache.spark.sql.functions.lit(0.0), limit = 10)
    val order = queue.select("product_id").as[String].collect()
    assert(order.head == "p_old")
  }
}
