package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.SegmentDedup]] — first-ARRIVAL
  * wins: an ingest pipeline dedups boilerplate lines as documents
  * stream in, instead of re-scanning the accumulated corpus per batch
  * (the CCNet stage run incrementally). Spark's own watermarked
  * `dropDuplicates` is the degenerate whole-row form; this keeps the
  * per-document bookkeeping (which positions died) that the rebuild
  * needs.
  *
  * Keyed state = ONE (winner doc, winner pos) pair per distinct
  * segment hash seen inside the idle TTL — the same bounded-state
  * contract as the heavy-hitters twin: a segment hash idle for
  * `idleMs` is evicted (its next occurrence wins again, exactly how a
  * time-windowed dedup is specified; an infinite-horizon streaming
  * dedup is unbounded state by definition, in ANY engine).
  *
  * Batch equivalence (BatchEquivalenceSpec): replaying a corpus
  * ordered by (doc_id, pos) makes first-arrival coincide with the
  * batch operator's (doc_id, pos) rule — kept/removed flags and the
  * per-doc rebuild match [[graft.operators.SegmentDedup.dedupSegments]]
  * exactly on the same docs. Output is one row per nonblank segment:
  * (doc_id, pos, seg, kept) — the consumer's groupBy(doc_id) rebuild
  * is the batch operator's own tail.
  */
object StreamingSegmentDedup {

  /** Winner bookkeeping per segment hash. */
  final case class SegState(docId: Long, pos: Int, maxT: Long)

  /** One decided segment occurrence. */
  final case class SegVerdict(doc_id: Long, pos: Int, seg: String, kept: Boolean)

  /** `docs` is a streaming frame with (idCol: long, textCol: string,
    * tsCol: timestamp). Segments split on `delimRegex` row-locally;
    * the shuffle carries (16-byte md5, id, pos, seg). */
  def dedupSegments(docs: DataFrame, idCol: String, textCol: String,
                    tsCol: String, delimRegex: String,
                    idleMs: Long = 3600000L,
                    watermark: String = "10 minutes"): Dataset[SegVerdict] = {
    import docs.sparkSession.implicits._
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        col(tsCol).cast("timestamp").as("t"),
        posexplode(split(col(textCol), delimRegex)).as(Seq("pos", "seg")))
      .filter(length(col("seg")) > 0)
      .withWatermark("t", watermark)
      .select(md5(col("seg")).as("h"), col("doc_id"), col("pos"),
        col("seg"), col("t"))
      .as[(String, Long, Int, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SegState, SegVerdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // decide WITHIN the batch in (doc_id, pos) order too, so a
            // replayed corpus reproduces the batch operator bit-for-bit
            val sorted = rows.toVector.sortBy(r => (r._2, r._3))
            val prior = state.getOption
            var winner = prior
            var maxT = prior.map(_.maxT).getOrElse(Long.MinValue)
            val out = sorted.map { case (_, id, pos, seg, ts) =>
              maxT = math.max(maxT, ts.getTime)
              if (winner.isEmpty) {
                winner = Some(SegState(id, pos, maxT))
                SegVerdict(id, pos, seg, kept = true)
              } else SegVerdict(id, pos, seg, kept = false)
            }
            val w = winner.get
            state.update(SegState(w.docId, w.pos, maxT))
            state.setTimeoutTimestamp(
              math.max(maxT + idleMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }
}
