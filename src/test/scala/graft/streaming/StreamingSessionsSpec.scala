package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamingSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int, s: Int = 0) =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")

  test("sessionize: gap splits sessions, watermark finalizes them (q57 streaming twin)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val q = StreamingSessions.sessionize(
      input.toDF().toDF("ts", "user_id", "value"),
      "ts", "user_id", gap = "5 minutes", watermark = "2 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    // user 1: two bursts 10:00-10:01 and 10:20 (gap > 5m → 2 sessions)
    input.addData((ts(0), 1L, 1.0), (ts(1), 1L, 2.0), (ts(20), 1L, 4.0))
    q.processAllAvailable()
    // advance the watermark far enough to close everything
    input.addData((ts(50), 2L, 8.0))
    q.processAllAvailable()
    input.addData((ts(59), 2L, 0.5)) // pushes watermark past user 2's first burst
    q.processAllAvailable()
    val out = spark.table("sessions")
      .select($"user_id", $"n_events", $"total_value")
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, -r._3))
    q.stop()
    val u1 = out.filter(_._1 == 1L)
    assert(u1.length == 2, s"expected 2 sessions for user 1: ${out.toSeq}")
    assert(u1.map(_._2).sorted.toSeq == Seq(1L, 2L)) // burst sizes
    assert(u1.map(_._3).sum == 7.0)
  }

  test("attributionJoin: clicks in the lookback window match, outside do not") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val clicks = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val q = StreamingSessions.attributionJoin(
      purchases.toDF().toDF("p_ts", "p_user", "purchase_id"),
      clicks.toDF().toDF("c_ts", "c_user", "click_id"),
      "p_user", "c_user", "p_ts", "c_ts",
      lookback = "10 minutes", watermark = "5 minutes")
      .select($"purchase_id", $"click_id")
      .writeStream.format("memory").queryName("attribution")
      .outputMode(OutputMode.Append).start()
    // user 1 purchase at 10:20; clicks at 10:12/10:18 (in window),
    // 10:05 (too old), 10:25 (after purchase); user 2's click never joins
    clicks.addData((ts(5), 1L, 100L), (ts(12), 1L, 101L),
      (ts(18), 1L, 102L), (ts(25), 1L, 103L), (ts(15), 2L, 200L))
    purchases.addData((ts(20), 1L, 900L))
    q.processAllAvailable()
    val out = spark.table("attribution").as[(Long, Long)].collect().toSet
    q.stop()
    assert(out === Set((900L, 101L), (900L, 102L)), s"got $out")
  }

  test("contentDedup: duplicates within the watermark horizon are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = StreamingSessions.contentDedup(
      input.toDF().toDF("ts", "doc_id", "text"),
      "ts", "text", watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    input.addData(
      (ts(0), 1L, "The quick  brown fox"),
      (ts(1), 2L, "the quick brown fox"), // same normalized content → dropped
      (ts(2), 3L, "another document"))
    q.processAllAvailable()
    input.addData((ts(3), 4L, "THE QUICK BROWN FOX")) // still duplicate
    q.processAllAvailable()
    val kept = spark.table("dedup_out").select($"doc_id")
      .as[Long].collect().sorted.toSeq
    q.stop()
    assert(kept == Seq(1L, 3L), s"first occurrence wins: $kept")
  }

  test("enrich: stream-static broadcast join fills dimension values") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("a", "Alpha"), ("b", "Beta")).toDF("key", "label")
    val input = MemoryStream[(String, Long)]
    val q = StreamingSessions.enrich(
      input.toDF().toDF("key", "n"), dim, "key")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append).start()
    input.addData(("a", 1L), ("c", 2L))
    q.processAllAvailable()
    val out = spark.table("enriched")
      .select($"key", $"label").as[(String, Option[String])]
      .collect().sortBy(_._1)
    q.stop()
    assert(out.toSeq == Seq(("a", Some("Alpha")), ("c", None)))
  }

  test("slidingActivity: overlapping windows count each event once per window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val q = StreamingSessions.slidingActivity(
      input.toDF().toDF("ts", "key"),
      "ts", "key", window = "10 minutes", slide = "5 minutes",
      watermark = "1 minute")
      .writeStream.format("memory").queryName("activity")
      .outputMode(OutputMode.Append).start()
    input.addData((ts(7), 9L)) // falls in windows [10:00,10:10) and [10:05,10:15)
    q.processAllAvailable()
    input.addData((ts(40), 9L)) // advance watermark to close both
    q.processAllAvailable()
    val wins = spark.table("activity")
      .selectExpr("window.start", "n_events").collect()
    q.stop()
    assert(wins.count(_.getLong(1) == 1L) >= 2,
      s"event must appear in both overlapping windows: ${wins.toSeq}")
  }

  test("streamingFunnel: stages advance in order across micro-batches; " +
    "out-of-sequence events never advance (q86 streaming twin)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = StreamingSessions.streamingFunnel(
      input.toDF().toDF("ts", "user_id", "event_type"),
      "ts", "user_id", "event_type", watermark = "5 minutes")
      .writeStream.format("memory").queryName("funnel")
      .outputMode(OutputMode.Append).start()
    // batch 1: user 1 clicks BEFORE any view (must not advance), then views;
    //          user 2 views
    input.addData((ts(0), 1L, "click"), (ts(1), 1L, "view"), (ts(1), 2L, "view"))
    q.processAllAvailable()
    // batch 2: user 1 clicks after the view, user 2 purchases with no click
    // (must not advance past view)
    input.addData((ts(2), 1L, "click"), (ts(2), 2L, "purchase"))
    q.processAllAvailable()
    // batch 3: user 1 completes; the purchase strictly after the click
    input.addData((ts(3), 1L, "purchase"))
    q.processAllAvailable()
    // memory-sink row order across batches is not contractual — order by
    // the stage times (later stages have more slots filled, and -1 sorts
    // before any real timestamp)
    val out = spark.table("funnel")
      .select($"user_id", $"stage", $"view_t", $"click_t", $"purchase_t")
      .as[(Long, String, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._3, r._4, r._5))
    q.stop()
    val u1 = out.filter(_._1 == 1L).map(_._2).toSeq
    assert(u1 == Seq("view", "click", "purchase"),
      s"user 1 advances one stage per batch: $out")
    val u2 = out.filter(_._1 == 2L)
    assert(u2.map(_._2).toSeq == Seq("view"),
      s"user 2 must not reach purchase without a click: $out")
    val done = out.find(r => r._1 == 1L && r._2 == "purchase").get
    assert(done._3 < done._4 && done._4 < done._5, "strict time ordering")
  }
}
