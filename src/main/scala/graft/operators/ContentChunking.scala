package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — the dedup segmentation that is
  * robust to INSERTIONS: a chunk boundary falls after position `i`
  * whenever a hash of the `w`-character window ENDING at `i` matches a
  * mask, so boundaries are a function of local content alone. Editing a
  * document shifts every fixed-width shingle after the edit
  * ([[SpanDedup]]'s unit) and every author-delimiter segment containing
  * it ([[SegmentDedup]]'s unit), but CDC boundaries RE-ALIGN `w`
  * characters past the edit and the whole shared tail dedupes chunk-for
  * -chunk — the rsync/LBFS/FastCDC argument (Muthitacharoen et al.
  * 2001; Xia et al. 2016), applied to corpus text dedup.
  *
  * Engine-portable boundary rule: the window hash is md5 of the
  * `w`-character substring and the mask is its FIRST hex nibble being
  * '0' — boundary probability 1/16 per position, expected chunk ≈ 16
  * characters plus the tail (production CDC uses a gear/Rabin rolling
  * hash with min/max clamps; min/max make boundary selection
  * SEQUENTIAL — each boundary masks the next minSize candidates — which
  * no positional SQL replay can express, while the unclamped rule is a
  * pure per-position predicate BOTH engines evaluate identically; md5
  * here is the portable-hash convention of [[SegmentDedup]]/q112).
  * Cost: one md5 per character — row-local, embarrassingly parallel,
  * zero shuffle; the corpus-scale cost centre stays the ONE hash
  * exchange of the downstream dedup, not the chunker.
  *
  * Chunks partition the text exactly: ends = matching positions in
  * [w, len-1] plus len; chunk k = substr(prev_end+1 .. end_k). A text
  * shorter than `w+1` is one single chunk; an empty text produces one
  * empty chunk (dropped by [[SegmentDedup.dedupSegmentArray]]'s blank
  * filter, the shared convention).
  *
  * Compose with [[SegmentDedup.dedupSegmentArray]] (joinDelim = "") for
  * first-occurrence chunk dedup + exact-concatenation rebuild — q174.
  */
object ContentChunking {

  /** Adds `outCol` (array&lt;string&gt; of content-defined chunks) to
    * `docs` via the codegen'd [[graft.plans.GraftCdcChunks]] kernel —
    * one byte walk, windows digested in place from the UTF-8 buffer,
    * zero-copy chunk slices (the interpreted HOF twin pays a lambda +
    * hex-string md5 + substring per POSITION; A-B-A measured 2.8× at
    * sf0.1 — BASELINE.md round-10 post-closing). Requires graft
    * functions on the session
    * (GraftExtensions.ensure — every SparkEntry query does this). */
  def withCdcChunks(docs: DataFrame, textCol: String, outCol: String,
                    w: Int = 16): DataFrame = {
    require(w >= 1, s"window width $w < 1")
    docs.withColumn(outCol,
      call_function("graft_cdc_chunks", col(textCol), lit(w)))
  }

  /** The declarative HOF twin of [[withCdcChunks]] — same rule through
    * Spark's own `filter`/`transform`/`md5`/`substr`, kept as the
    * independent in-engine replica ContentChunkingSpec pins the kernel
    * against (the GraftWinnow/GraftMinHash kernel-twin convention).
    * The boundary array is materialized as its own projection column so
    * the md5-per-position pass runs ONCE per row (the q31/q167
    * CollapseProject convention: the chunk transform references it once
    * per element and CSE cannot dedupe interpreted HOF chains). */
  def withCdcChunksHof(docs: DataFrame, textCol: String, outCol: String,
                       w: Int = 16): DataFrame = {
    require(w >= 1, s"window width $w < 1")
    require(textCol != "__cdc_ends" && outCol != "__cdc_ends",
      "'__cdc_ends' is reserved by withCdcChunks")
    val text = col(textCol)
    val len = length(text)
    val cands =
      when(len - 1 >= w, filter(sequence(lit(w), len - 1), i =>
        substring(md5(text.substr(i - lit(w) + lit(1), lit(w))), 1, 1) === "0"))
        .otherwise(array().cast("array<int>"))
    val ends = concat(cands, array(len))
    val prevEnd: (Column, Column) => Column = (e, k) =>
      when(k === 0, lit(0)).otherwise(element_at(col("__cdc_ends"), k))
    docs
      .withColumn("__cdc_ends", ends)
      .withColumn(outCol, transform(col("__cdc_ends"), (e, k) =>
        text.substr(prevEnd(e, k) + lit(1), e - prevEnd(e, k))))
      .drop("__cdc_ends")
  }
}
