package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-source overlap matrix — the corpus-provenance audit a
  * curation pass runs before mixture weighting trusts per-source
  * counts: for every pair of sources, how many distinct keys
  * (13-grams) they share. Finds sources that copy from each other
  * (mirror sites, scraped re-posts, shared boilerplate).
  *
  * Output: (source_a, source_b, n_shared, n_a, n_b), one row per
  * UNORDERED pair with n_shared >= 1 (source_a < source_b), ordered.
  * Integers only — Jaccard/containment is the consumer's monotone
  * transform (the q117/q138 convention).
  *
  * Scale shape: ONE distinct over (source, md5(key)) — the join and
  * the distinct ride the 32-byte digest, not the raw ~100-byte
  * 13-gram (the q123/q127 hashed-shuffle-key lesson; an oracle
  * replays the same md5, so collisions are seen identically and the
  * compare stays hash-exact) — then an ordered self-join on the
  * digest. Per-key fan-out is (sources containing it choose 2) <= S²:
  * bounded by the SOURCE count, never the corpus. Output <= S(S-1)/2
  * rows; per-source totals ride broadcast joins.
  *
  * The distinct relation is consumed THREE times (both join sides +
  * the totals), so it is retained for the call via the one-slot
  * [[CacheRegistry]]: without the cache the x100 smoke measured
  * exchange reuse breaking at scale — per-row shuffle bytes exactly
  * doubled (39 -> 78 B/row) as the distinct subtree was recomputed
  * for the second join side. Alternatives measured and rejected at
  * sf0.1 ONLY-mode: raw-string keys 1.53 s (vs 1.51 md5-keyed);
  * collect_set-by-key + row-local pair explode 1.88 s
  * (ObjectHashAggregate leaves whole-stage codegen — costs more than
  * the saved shuffle on a page-cached local box).
  */
object SourceOverlap {

  private val registry = new CacheRegistry

  /** Release the retained distinct relation (idempotent). */
  def releaseCache(): Unit = registry.release()

  private[operators] def retainedFrames: Seq[DataFrame] =
    registry.retainedFrames

  /** The overlap matrix over `df`, keyed on md5 of `keyCol` values
    * grouped by `srcCol`. `keyed` rows are (src, k) BEFORE distinct —
    * pass the exploded key stream; dedup happens here. */
  def matrix(keyed: DataFrame, srcCol: String, keyCol: String): DataFrame = {
    val Seq(sh) = registry.retainAll(Seq(
      keyed
        .select(col(srcCol).cast("string").as("__src"),
          md5(col(keyCol).cast("string")).as("__k"))
        .distinct()))
    val counts = sh.groupBy(col("__src")).agg(count(lit(1)).as("n"))
    sh.as("a")
      .join(sh.as("b"),
        col("a.__k") === col("b.__k") && col("a.__src") < col("b.__src"))
      .select(col("a.__src").as("source_a"), col("b.__src").as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(counts.select(col("__src").as("source_a"),
        col("n").as("n_a"))), Seq("source_a"))
      .join(broadcast(counts.select(col("__src").as("source_b"),
        col("n").as("n_b"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        col("n_a"), col("n_b"))
      .orderBy(col("source_a"), col("source_b"))
  }
}
