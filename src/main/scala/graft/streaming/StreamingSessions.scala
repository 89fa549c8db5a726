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
}
