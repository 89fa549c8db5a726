package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming-batch equivalence replays (VERDICT r3 item 5): the driver's
  * sf0.01 events fixture is fed through the streaming operators in event
  * order via MemoryStream, and the FINAL streaming state must equal the
  * oracle-green batch query outputs — the streaming surface inherits the
  * batch oracle's authority.
  *
  * Resolution note: the streaming funnel works at epoch-ms
  * (`Timestamp.getTime`) while batch q86 emits µs-truncated nanos; the
  * fixture's minimum same-user inter-event gap is 8.15 s (measured), so
  * flooring both sides to ms preserves every ordering and strict
  * inequality. Similarly no same-user gap lands within 1 ms of the 30-min
  * session threshold, so q57's `gap > 30min` split and session_window's
  * overlap merge agree on this data.
  */
class BatchEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"

  /** (ms timestamp, user_id, event_type, value) in global event order. */
  private lazy val orderedEvents: Seq[(java.sql.Timestamp, Long, String, Double)] =
    graft.Tables.events(spark, sfDir) // loader owns the ts→nanos surface
      // integral `div`, not `/`: float division of ~1.7e18 ns loses
      // sub-µs precision and can floor across an exact-ms boundary
      .select(expr("ts div 1000000").as("ms"),
        col("user_id"), col("event_type"), col("value"))
      .orderBy(col("ms"), col("user_id"))
      .as[(Long, Long, String, Double)].collect().toSeq
      .map { case (ms, u, e, v) => (new java.sql.Timestamp(ms), u, e, v) }

  private def chunks[T](xs: Seq[T], n: Int): Seq[Seq[T]] = {
    val size = math.max(1, math.ceil(xs.size.toDouble / n).toInt)
    xs.grouped(size).toSeq
  }

  /** (ms timestamp, user_id, event_id, event_type) sorted by (ms, id) —
    * the (t, id) tie-break order the SCD2 window uses, so chunking can
    * never deliver same-millisecond events of one key across batches in
    * a different order than the batch operator applies them. */
  private lazy val orderedEventsWithId: Seq[(java.sql.Timestamp, Long, Long, String)] =
    graft.Tables.events(spark, sfDir)
      .select(expr("ts div 1000000").as("ms"),
        col("user_id"), col("event_id"), col("event_type"))
      .orderBy(col("ms"), col("event_id"))
      .as[(Long, Long, Long, String)].collect().toSeq
      .map { case (ms, u, id, e) => (new java.sql.Timestamp(ms), u, id, e) }

  test("streamingScd2 chunked replay equals the batch operator, closed and open versions") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, Long, String)]
    val idleMs = 100L * 24 * 3600 * 1000
    val q = StreamingSessions.streamingScd2(
      input.toDF().toDF("ts", "user_id", "event_id", "event_type"),
      "ts", "user_id", "event_id", "event_type",
      idleMs = idleMs, watermark = "1 second")
      .writeStream.format("memory").queryName("scd2_replay")
      .outputMode(OutputMode.Append).start()
    chunks(orderedEventsWithId, 10).foreach { c =>
      input.addData(c)
      q.processAllAvailable()
    }
    // two sentinel batches push the watermark past every key's
    // maxT + idle so the OPEN versions flush via state timeout
    val far = orderedEventsWithId.last._1.getTime + 2 * idleMs
    input.addData(Seq((new java.sql.Timestamp(far), -1L, 0L, "x")))
    q.processAllAvailable()
    input.addData(Seq((new java.sql.Timestamp(far + 1000), -1L, 1L, "x")))
    q.processAllAvailable()
    val streamed = spark.table("scd2_replay")
      .filter(col("key") >= 0)
      .select(col("key"), col("attr"), col("version"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .as[(Long, String, Long, Long, Long, Boolean)].collect().toSet
    q.stop()
    val batch = graft.operators.Scd2.fromChangeLog(
      orderedEventsWithId.map(e => (e._2, e._1.getTime, e._3, e._4))
        .toDF("k", "t", "id", "a"),
      Seq("k"), "t", "id", Seq("a"))
      .select(col("k"), col("a"), col("version"), col("valid_from"),
        coalesce(col("valid_to"), lit(-1L)), col("is_current"))
      .as[(Long, String, Long, Long, Long, Boolean)].collect().toSet
    assert(batch.nonEmpty && batch.exists(_._6) && batch.exists(!_._6))
    assert(streamed === batch,
      s"streaming-only: ${(streamed -- batch).take(3)}; " +
        s"batch-only: ${(batch -- streamed).take(3)}")
  }

  test("streamingCdcApply chunked replay equals the batch changelog fold") {
    implicit val sqlCtx = spark.sqlContext
    // events as an op stream: errors delete the user's state, anything
    // else upserts the event type as the payload
    val ops = orderedEventsWithId.map { case (ts, u, id, e) =>
      (ts, u, id, if (e == "error") "delete" else "upsert", e)
    }
    val input = MemoryStream[(java.sql.Timestamp, Long, Long, String, String)]
    val q = StreamingSessions.streamingCdcApply(
      input.toDF().toDF("ts", "user_id", "event_id", "op", "v"),
      "ts", "user_id", "event_id", "op", "v",
      idleMs = 100L * 24 * 3600 * 1000, watermark = "1 second")
      .writeStream.format("memory").queryName("cdc_replay")
      .outputMode(OutputMode.Append).start()
    chunks(ops, 10).foreach { c => input.addData(c); q.processAllAvailable() }
    val lastPerKey = spark.table("cdc_replay")
      .groupBy(col("key"))
      .agg(max_by(struct(col("v"), col("deleted")),
        struct(col("up_to_t"), col("up_to_id"))).as("w"))
      .select(col("key"), col("w.v"), col("w.deleted"))
      .as[(Long, Option[String], Boolean)].collect().toSeq
    q.stop()
    val streamedAlive = lastPerKey.collect { case (k, Some(v), false) => k -> v }.toMap
    val streamedDead = lastPerKey.collect { case (k, _, true) => k }.toSet
    val opDf = ops.map { case (ts, u, id, op, v) => (u, ts.getTime, id, op, v) }
      .toDF("k", "t", "id", "op", "v")
    val batch = graft.operators.Cdc
      .applyLog(opDf.drop("op").filter(lit(false)), opDf,
        Seq("k"), "op", Seq("t", "id"))
      .select(col("k"), col("v")).as[(Long, String)].collect().toMap
    assert(batch.nonEmpty && streamedDead.nonEmpty)
    assert(streamedAlive === batch)
    assert(streamedDead === ops.map(_._2).toSet -- batch.keySet)
  }

  test("streamingFunnel replay of sf0.01 events equals batch q86") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    // idle horizon far past the fixture's 30-day span: the replay verifies
    // the transition semantics; timeout eviction is exercised separately
    // in StreamingSessionsSpec
    val q = StreamingSessions.streamingFunnel(
      input.toDF().toDF("ts", "user_id", "event_type"),
      "ts", "user_id", "event_type",
      idleMs = 100L * 24 * 3600 * 1000, watermark = "1 second")
      .writeStream.format("memory").queryName("funnel_replay")
      .outputMode(OutputMode.Append).start()
    chunks(orderedEvents, 10).foreach { c =>
      input.addData(c.map(e => (e._1, e._2, e._3)))
      q.processAllAvailable()
    }
    // stage slots are monotone (-1 → set-once), so the final state per
    // user is the column-wise max over its emitted updates
    val streamed = spark.table("funnel_replay")
      .groupBy(col("user_id"))
      .agg(max(col("view_t")).as("v"), max(col("click_t")).as("c"),
        max(col("purchase_t")).as("p"))
      .as[(Long, Long, Long, Long)].collect().toSet
    q.stop()
    val batch = graft.SparkEntry.queries("q86_event_funnel")(spark, sfDir)
      .select(col("user_id"),
        expr("view_t div 1000000"),
        coalesce(expr("click_t div 1000000"), lit(-1L)),
        coalesce(expr("purchase_t div 1000000"), lit(-1L)))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    assert(streamed === batch,
      s"streaming-only: ${(streamed -- batch).take(3)}; " +
        s"batch-only: ${(batch -- streamed).take(3)}")
  }

  test("sessionize replay of sf0.01 events equals batch q57") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val q = StreamingSessions.sessionize(
      input.toDF().toDF("ts", "user_id", "value"),
      "ts", "user_id", gap = "30 minutes", watermark = "1 second")
      .writeStream.format("memory").queryName("sessions_replay")
      .outputMode(OutputMode.Append).start()
    chunks(orderedEvents, 10).foreach { c =>
      input.addData(c.map(e => (e._1, e._2, e._4)))
      q.processAllAvailable()
    }
    // two far-future sentinel batches push the watermark past every real
    // session's end so Append mode finalizes them; the sentinel user's
    // own session never closes and is filtered out
    val far = orderedEvents.last._1.getTime + 100L * 24 * 3600 * 1000
    input.addData(Seq((new java.sql.Timestamp(far), -1L, 0.0)))
    q.processAllAvailable()
    input.addData(Seq((new java.sql.Timestamp(far + 1000), -1L, 0.0)))
    q.processAllAvailable()
    val streamed = spark.table("sessions_replay")
      .filter(col("user_id") >= 0)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"),
        max(col("n_events")).as("max_session_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    q.stop()
    val batch = graft.SparkEntry.queries("q57_sessionization")(spark, sfDir)
      .select(col("user_id"), col("n_sessions"), col("n_events"),
        col("max_session_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty)
    assert(streamed === batch,
      s"streaming-only: ${(streamed -- batch).take(3)}; " +
        s"batch-only: ${(batch -- streamed).take(3)}")
  }

  test("attributionJoin replay equals the batch time-range join") {
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[(java.sql.Timestamp, Long)]
    val cIn = MemoryStream[(java.sql.Timestamp, Long)]
    val q = StreamingSessions.attributionJoin(
        pIn.toDF().toDF("p_ts", "p_user"), cIn.toDF().toDF("c_ts", "c_user"),
        "p_user", "c_user", "p_ts", "c_ts",
        lookback = "30 minutes", watermark = "1 second")
      .select(col("p_user"), col("p_ts"), col("c_ts"))
      .writeStream.format("memory").queryName("attr_replay")
      .outputMode(OutputMode.Append).start()
    // both streams fed in global event order, chunked together so their
    // watermarks advance in step like a real ingest
    chunks(orderedEvents, 10).foreach { c =>
      pIn.addData(c.filter(_._3 == "purchase").map(e => (e._1, e._2)))
      cIn.addData(c.filter(_._3 == "click").map(e => (e._1, e._2)))
      q.processAllAvailable()
    }
    val streamed = spark.table("attr_replay")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet
    q.stop()
    val purch = orderedEvents.filter(_._3 == "purchase").map(e => (e._1, e._2))
      .toDF("p_ts", "p_user")
    val clk = orderedEvents.filter(_._3 == "click").map(e => (e._1, e._2))
      .toDF("c_ts", "c_user")
    val batch = purch.join(clk,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("interval 30 minutes") &&
          col("c_ts") <= col("p_ts"))
      .select(col("p_user"), col("p_ts"), col("c_ts"))
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp)].collect().toSet
    assert(batch.nonEmpty, "fixture produced no attributable pairs")
    assert(streamed === batch,
      s"streaming-only: ${(streamed -- batch).take(3)}; " +
        s"batch-only: ${(batch -- streamed).take(3)}")
  }

  test("streamingHeavyHitters replay of the sf0.01 token stream equals the exact HAVING scan") {
    implicit val sqlCtx = spark.sqlContext
    // token stream: sf0.01 documents exploded to tokens in doc order,
    // synthetic 1-ms-per-token event time (the counts are time-free; the
    // timestamps only drive watermark/timeout machinery)
    val toks = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("token"))
      .orderBy(col("doc_id"))
      .select("token").as[String].collect().toSeq
      // +1000: a ts=0 first row is "late" against the initial watermark 0
      // (<= comparison) and silently dropped before the state function
      .zipWithIndex.map { case (t, i) => (new java.sql.Timestamp(1000L + i), t) }
    val threshold = 100L
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val q = StreamingSessions.streamingHeavyHitters(
      input.toDF().toDF("ts", "token"), "ts", "token", threshold,
      idleMs = 100L * 24 * 3600 * 1000, watermark = "1 second")
      .writeStream.format("memory").queryName("hh_replay")
      .outputMode(OutputMode.Append).start()
    chunks(toks, 10).foreach { c => input.addData(c); q.processAllAvailable() }
    val streamed = spark.table("hh_replay")
      .groupBy(col("key")).agg(max(col("n")).as("n"))
      .as[(String, Long)].collect().toSet
    q.stop()
    val batch = toks.map(_._2).toDF("token")
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
      .as[(String, Long)].collect().toSet
    assert(batch.nonEmpty, "fixture has no heavy tokens at threshold 100")
    assert(streamed === batch,
      s"streaming-only: ${(streamed -- batch).take(3)}; " +
        s"batch-only: ${(batch -- streamed).take(3)}")
  }

  test("streaming linear-model training: the sufficient-statistics " +
      "aggregate maintains the exact model online — final state equals " +
      "the batch fit") {
    // LinearFit.normalEquations3 IS the streaming twin: the 9 Decimal
    // sums are an associative aggregate, so the SAME code runs over a
    // streaming frame in Complete mode and each micro-batch emits the
    // current exact model (online training, no operator fork to drift)
    implicit val sqlCtx = spark.sqlContext
    val feats: Seq[(Long, Long, Long)] = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long"),
        length(col("text")).cast("long"),
        (size(array_distinct(split(col("text"), "\\s+"))) * 100).cast("long"))
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, Long)].collect().toSeq
      .map { case (_, x1, x2, y) => (x1, x2, y) }
    val input = MemoryStream[(Long, Long, Long)]
    val q = graft.operators.LinearFit.normalEquations3(
        input.toDF().toDF("x1", "x2", "y"),
        col("x1"), col("x2"), col("y"))
      .writeStream.format("memory").queryName("linfit_replay")
      .outputMode(OutputMode.Complete).start()
    chunks(feats, 10).foreach { c => input.addData(c); q.processAllAvailable() }
    val streamed = spark.table("linfit_replay").head()
    q.stop()
    val batch = graft.operators.LinearFit.normalEquations3(
      feats.toDF("x1", "x2", "y"), col("x1"), col("x2"), col("y")).head()
    (0 until batch.length).foreach { i =>
      assert(streamed.getDecimal(i) === batch.getDecimal(i),
        s"column ${batch.schema(i).name}")
    }
  }

  test("streaming segment dedup chunked replay equals the batch operator " +
      "(counts and the rebuilt text)") {
    implicit val sqlCtx = spark.sqlContext
    // q167's corpus: sf0.01 documents re-segmented into 3-token lines;
    // replay ordered by doc_id so first-ARRIVAL == the batch operator's
    // (doc_id, pos) first-occurrence rule
    val lined: Seq[(Long, String)] = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id"))
      .as[(Long, String)].collect().toSeq
      .map { case (id, t) =>
        id -> t.split("\\s+").grouped(3).map(_.mkString(" ")).mkString("\n")
      }
    val base = 1700000000000L
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = StreamingSegmentDedup.dedupSegments(
      input.toDF().toDF("ts", "doc_id", "text"),
      "doc_id", "text", "ts", "\n",
      idleMs = 100L * 24 * 3600 * 1000, watermark = "1 second")
      .writeStream.format("memory").queryName("segdedup_replay")
      .outputMode(OutputMode.Append).start()
    val rows = lined.map { case (id, t) =>
      (new java.sql.Timestamp(base + id), id, t)
    }
    chunks(rows, 10).foreach { c => input.addData(c); q.processAllAvailable() }
    val streamed = spark.table("segdedup_replay")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("n_removed"))
      .as[(Long, Long, Long)].collect().toSeq
      .map { case (id, n, r) => id -> ((n, r)) }.toMap
    // rebuilt text: kept segments in pos order
    val streamedText = spark.table("segdedup_replay")
      .filter(col("kept"))
      .groupBy(col("doc_id"))
      .agg(array_join(transform(sort_array(collect_list(
        struct(col("pos"), col("seg")))), s => s.getField("seg")), "\n")
        .as("t"))
      .as[(Long, String)].collect().toMap
    q.stop()
    val batch = graft.operators.SegmentDedup
      .dedupSegments(lined.toDF("doc_id", "text"), "doc_id", "text", "\n")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(batch.exists(_._4 > 0), "fixture must exercise removal")
    batch.foreach { case (id, clean, nSeg, nRem) =>
      assert(streamed(id) === ((nSeg, nRem)), s"doc $id counts")
      assert(streamedText.getOrElse(id, "") === clean, s"doc $id rebuild")
    }
  }
}
