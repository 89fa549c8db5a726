package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Streaming twins of the batch event/dedup analytics (q56/q57/q36):
  * event-time sessionization via `session_window` and content-level
  * stream dedup with watermark-bounded state.
  *
  * Scale notes: session state is keyed by (user, open session) and closed
  * by the watermark — memory is bounded by active users within the gap,
  * not stream length. Dedup state is TTL'd by the watermark
  * (`dropDuplicatesWithinWatermark`), so a forever-running ingest stream
  * holds state only for the dedup horizon, not the full corpus — the
  * batch [[graft.operators.Dedup.exactDedup]] covers full-corpus exact
  * dedup; this covers the at-ingest hot path.
  */
object StreamingSessions {

  /** Event-time sessionization (q57's streaming twin): sessions close
    * after `gap` of per-user inactivity; watermark bounds how late events
    * may arrive and when session state finalizes. Output rows appear once
    * a session is closed by the watermark (Append mode). */
  def sessionize(events: DataFrame, tsCol: String, userCol: String,
                 gap: String = "30 minutes",
                 watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .select(
        col(userCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** At-ingest exact content dedup: first document with a given
    * normalized-content hash wins; duplicates arriving within the
    * watermark horizon are dropped, and state for a hash is evicted once
    * the watermark passes it. */
  def contentDedup(docs: DataFrame, tsCol: String, textCol: String,
                   watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_key", sha2(Dedup.normalized(col(textCol)), 256))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_key")

  /** Stream-static enrichment: left-join the stream against a batch
    * dimension, explicitly broadcast. The static side is re-evaluated per
    * micro-batch, so a slowly-changing dimension (vocabulary, category
    * map, curated products) refreshes without restarting the stream; the
    * join itself never shuffles the stream. */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Streaming refresh-priority signal (T3/T4 flavored): per-key decayed
    * activity over sliding windows — emits (key, window, n_events) that a
    * downstream refresh queue consumes. */
  def slidingActivity(events: DataFrame, tsCol: String, keyCol: String,
                      window: String = "1 hour", slide: String = "15 minutes",
                      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), window, slide),
        col(keyCol))
      .agg(count(lit(1)).as("n_events"))

  /** Stream-stream attribution join (q66's streaming counterpart): each
    * purchase paired with the same user's clicks from the `lookback`
    * window before it. The equi-key plus the two-sided time-range
    * condition is what lets Structured Streaming BOUND the buffered
    * state — clicks are evicted once the purchase-side watermark passes
    * `click time + lookback`, so state holds one lookback horizon of
    * clicks per active user, not the stream's history. Column names must
    * be disjoint across the two sides (rename before calling). Emits ALL
    * in-window pairs (append mode cannot retract); the batch
    * [[graft.operators.AsOfJoin]] computes the exact latest-only match,
    * and a per-micro-batch argmax over this output approximates it
    * online. */
  def attributionJoin(purchases: DataFrame, clicks: DataFrame,
                      pUser: String, cUser: String, pTs: String, cTs: String,
                      lookback: String = "30 minutes",
                      watermark: String = "10 minutes"): DataFrame =
    purchases.withWatermark(pTs, watermark)
      .join(clicks.withWatermark(cTs, watermark),
        col(pUser) === col(cUser) &&
          col(cTs) >= col(pTs) - expr(s"interval $lookback") &&
          col(cTs) <= col(pTs))

  /** Per-user funnel progress: epoch-ms of the first view, the first
    * click strictly after it, the first purchase strictly after that;
    * −1 = stage not reached. `maxT` tracks the user's latest event seen
    * across ALL batches — the idle timeout anchors to it, so a late
    * (but within-watermark) straggler cannot pull an already-set timeout
    * earlier and evict mid-funnel state. */
  final case class FunnelProgress(viewT: Long, clickT: Long,
                                  purchaseT: Long, maxT: Long)

  /** One emitted funnel advance (Append mode — a user appears once per
    * micro-batch in which a stage advanced). */
  final case class FunnelUpdate(user_id: Long, view_t: Long, click_t: Long,
                                purchase_t: Long, stage: String)

  /** Streaming ordered funnel — q86's streaming twin, as the keyed state
    * machine `flatMapGroupsWithState` exists for: per user the state is
    * three epoch-ms slots, advanced in event order, emitted only when a
    * stage advances. State is evicted by an event-time timeout `idleMs`
    * past the watermark, so memory holds only users active within the
    * idle horizon — a forever-running stream never accumulates the full
    * user base. Out-of-order events inside a micro-batch are sorted
    * before applying; ordering across batches is the watermark's
    * contract (same as every streaming aggregate here).
    */
  def streamingFunnel(events: DataFrame, tsCol: String, userCol: String,
                      typeCol: String, idleMs: Long = 3600000L,
                      watermark: String = "10 minutes")
      : org.apache.spark.sql.Dataset[FunnelUpdate] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    events
      .select(col(userCol).cast("long").as("u"),
        col(tsCol).cast("timestamp").as("t"),
        col(typeCol).cast("string").as("e"))
      // watermark AFTER the cast projection — a watermark tagged before a
      // select that rewrites the column does not survive the new attribute
      .withWatermark("t", watermark)
      .as[(Long, java.sql.Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelProgress, FunnelUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val before = state.getOption
              .getOrElse(FunnelProgress(-1L, -1L, -1L, -1L))
            var st = before
            val ordered = rows.toSeq.sortBy(_._2.getTime)
            ordered.foreach { case (_, ts, e) =>
              val t = ts.getTime
              e match {
                case "view" if st.viewT < 0 =>
                  st = st.copy(viewT = t)
                case "click" if st.viewT >= 0 && st.clickT < 0 && t > st.viewT =>
                  st = st.copy(clickT = t)
                case "purchase" if st.clickT >= 0 && st.purchaseT < 0 && t > st.clickT =>
                  st = st.copy(purchaseT = t)
                case _ => // stage already reached, or out of sequence
              }
            }
            // idle horizon counts from the user's latest event EVER (a late
            // straggler in this batch must not pull the timeout earlier),
            // not the global watermark: in the first micro-batch the
            // watermark is still 0, and watermark+idle would be an
            // epoch-1970 timeout expiring the state before the next batch
            st = st.copy(maxT = math.max(before.maxT, ordered.last._2.getTime))
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(st.maxT + idleMs, state.getCurrentWatermarkMs() + 1))
            val advanced = (st.viewT, st.clickT, st.purchaseT) !=
              ((before.viewT, before.clickT, before.purchaseT))
            if (advanced)
              Iterator(FunnelUpdate(user, st.viewT, st.clickT, st.purchaseT,
                if (st.purchaseT >= 0) "purchase"
                else if (st.clickT >= 0) "click" else "view"))
            else Iterator.empty
          }
      }
  }

  /** CDC fold state: the key's current payload, tombstone flag, latest
    * applied (t, id) and event time (timeout anchor). */
  final case class CdcProgress(v: String, deleted: Boolean,
                               upToT: Long, upToId: Long, maxT: Long)

  /** One emitted state change. `up_to_t`/`up_to_id` identify the last
    * applied op, so a consumer (and the replay spec) takes the row with
    * the max (up_to_t, up_to_id) per key as the current state. */
  final case class CdcUpdate(key: Long, v: String, deleted: Boolean,
                             up_to_t: Long, up_to_id: Long)

  /** Streaming twin of [[graft.operators.Cdc.applyLog]]: the changelog
    * folded ONLINE — last op wins, deletes tombstone, a later upsert
    * revives. Emits one [[CdcUpdate]] per key per micro-batch in which
    * the folded state actually changed; state is one small case class
    * per key, evicted on idle timeout (a retired key's tombstone/value
    * lives in the emitted stream — replay it into the batch snapshot
    * with [[graft.operators.Cdc.applyLog]], which is exactly what the
    * StreamingCdc replay spec proves round-trips). Within a micro-batch
    * ops apply in (t, id) order — the batch operator's ordering
    * contract; across batches, the watermark's.
    */
  def streamingCdcApply(log: DataFrame, tsCol: String, keyCol: String,
                        idCol: String, opCol: String, valueCol: String,
                        deleteOp: String = "delete",
                        idleMs: Long = 3600000L,
                        watermark: String = "10 minutes")
      : org.apache.spark.sql.Dataset[CdcUpdate] = {
    import log.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    log
      .select(col(keyCol).cast("long").as("k"),
        col(tsCol).cast("timestamp").as("t"),
        col(idCol).cast("long").as("id"),
        col(opCol).cast("string").as("op"),
        col(valueCol).cast("string").as("v"))
      .withWatermark("t", watermark)
      .as[(Long, java.sql.Timestamp, Long, String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CdcProgress, CdcUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val before = state.getOption.orNull
            var st = before
            val ordered = rows.toSeq.sortBy(r => (r._2.getTime, r._3))
            ordered.foreach { case (_, ts, id, op, v) =>
              val t = ts.getTime
              val mx = if (st == null) t else math.max(st.maxT, t)
              st =
                if (op == deleteOp) CdcProgress(null, deleted = true, t, id, mx)
                else CdcProgress(v, deleted = false, t, id, mx)
            }
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(st.maxT + idleMs, state.getCurrentWatermarkMs() + 1))
            val changed = before == null ||
              (before.v, before.deleted) != ((st.v, st.deleted))
            if (changed)
              Iterator(CdcUpdate(key, st.v, st.deleted, st.upToT, st.upToId))
            else Iterator.empty
          }
      }
  }

  /** Open SCD2 version per key: the tracked attribute, when it started,
    * its ordinal, and the key's latest event time (timeout anchor — same
    * straggler rule as [[FunnelProgress.maxT]]). */
  final case class ScdProgress(attr: String, validFrom: Long, version: Long,
                               maxT: Long)

  /** One emitted version row. `valid_to` = −1 and `is_current` = true on
    * the OPEN version a key retires with (emitted at state timeout);
    * closed versions emit the moment the attribute changes. */
  final case class ScdVersion(key: Long, attr: String, version: Long,
                              valid_from: Long, valid_to: Long,
                              is_current: Boolean)

  /** Streaming twin of [[graft.operators.Scd2.fromChangeLog]]: per-key
    * type-2 history maintained online. A version row emits exactly when
    * the next change CLOSES it (so downstream sees every historical
    * version once, in Append mode), and the still-open version emits when
    * the key's idle timeout retires its state — after which a revived key
    * restarts at version 1, the horizon contract every keyed state here
    * shares. Within a micro-batch events apply in (t, id) order — the
    * same tie-break the batch operator's window uses; ordering across
    * batches is the watermark's contract.
    *
    * Scale shape: state is ONE small case class per active key (the open
    * version), evicted on idle — a forever-running changelog stream holds
    * the active-key working set, never the history (history lives in the
    * emitted rows / the batch table). StreamingScd2 replay spec: chunked
    * replay of a log ≡ the batch operator on the identical ms-granular
    * log, closed and open versions both.
    */
  def streamingScd2(log: DataFrame, tsCol: String, keyCol: String,
                    idCol: String, attrCol: String, idleMs: Long = 3600000L,
                    watermark: String = "10 minutes")
      : org.apache.spark.sql.Dataset[ScdVersion] = {
    import log.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    log
      .select(col(keyCol).cast("long").as("k"),
        col(tsCol).cast("timestamp").as("t"),
        col(idCol).cast("long").as("id"),
        col(attrCol).cast("string").as("a"))
      .withWatermark("t", watermark)
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[ScdProgress, ScdVersion](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, rows, state) =>
          if (state.hasTimedOut) {
            val open = state.get
            state.remove()
            Iterator(ScdVersion(key, open.attr, open.version,
              open.validFrom, -1L, is_current = true))
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[ScdVersion]
            var st = state.getOption.orNull
            val ordered = rows.toSeq.sortBy(r => (r._2.getTime, r._3))
            ordered.foreach { case (_, ts, _, attr) =>
              val t = ts.getTime
              if (st == null)
                st = ScdProgress(attr, t, 1L, t)
              else if (!(st.attr == null && attr == null) &&
                  (st.attr == null || attr == null || st.attr != attr)) {
                out += ScdVersion(key, st.attr, st.version, st.validFrom, t,
                  is_current = false)
                st = ScdProgress(attr, t, st.version + 1, st.maxT)
              }
              st = st.copy(maxT = math.max(st.maxT, t))
            }
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(st.maxT + idleMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** Running count + timeout anchor for one tracked key. */
  final case class HhState(n: Long, maxT: Long)

  /** One over-threshold count update; consumers keep max(n) per key. */
  final case class HhCount(key: String, n: Long)

  /** Streaming twin of [[graft.operators.HeavyHitters]]'s exact gate
    * (q115): per-key running counts as keyed state; a key emits an
    * updated (key, n) whenever a batch grows its count while at or past
    * `threshold`, so downstream takes max(n) per key and holds exactly
    * the batch HAVING-scan answer at every point in stream time.
    *
    * Scale/state honesty: state is ONE (long, long) per distinct key
    * seen inside the idle TTL — the streaming analogue of the exact
    * aggregate's hash table, evicted by event-time timeout. For
    * vocabulary-sized key domains pre-gate the stream with the CMS probe
    * (`graft_cms_estimate` over a sketch of a historical window) so only
    * candidate keys reach the stateful stage — the same sketch-prune /
    * exact-verify split the batch operator uses. */
  def streamingHeavyHitters(events: DataFrame, tsCol: String, keyCol: String,
                            threshold: Long,
                            idleMs: Long = 3600000L,
                            watermark: String = "10 minutes")
      : org.apache.spark.sql.Dataset[HhCount] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(threshold >= 1, s"threshold $threshold must be >= 1")
    events
      .select(col(keyCol).cast("string").as("k"),
        col(tsCol).cast("timestamp").as("t"))
      .withWatermark("t", watermark)
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[HhState, HhCount](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val before = state.getOption.getOrElse(HhState(0L, Long.MinValue))
            var n = before.n
            var maxT = before.maxT
            rows.foreach { case (_, ts) =>
              n += 1; maxT = math.max(maxT, ts.getTime)
            }
            state.update(HhState(n, maxT))
            state.setTimeoutTimestamp(
              math.max(maxT + idleMs, state.getCurrentWatermarkMs() + 1))
            if (n >= threshold && n > before.n) Iterator(HhCount(key, n))
            else Iterator.empty
          }
      }
  }
}
