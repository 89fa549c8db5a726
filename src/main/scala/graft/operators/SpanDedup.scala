package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring-span deduplication (the corpus-level "repeated
  * passage" analysis of Lee et al. 2022, "Deduplicating Training Data
  * Makes Language Models Better" — suffix-array ExactSubstr, re-expressed
  * for a distributed engine as shingle algebra):
  *
  * a token position is DUPLICATED when the n-token shingle starting there
  * occurs more than once in the whole corpus; maximal runs of duplicated
  * positions merge into spans — the passages a span-removal pass would
  * cut, and the signal a curation pass reports (boilerplate, license
  * headers, templated pages).
  *
  * Plan shape, scan to spans:
  *  1. `graft_shingle_hashes` emits each doc's 64-bit shingle hashes
  *     row-locally — no shingle STRING is ever materialized or shuffled
  *     (30-60 bytes each for 5-token shingles; at corpus scale the
  *     string shuffle is the operator's whole cost, and even locally
  *     the string kernel measured 0.55 s vs 0.35 s at x10) → posexplode
  *     — ONCE;
  *  2. one shuffle on the 8-byte hash, then a full-partition `count`
  *     window flags positions whose shingle-hash occurs more than once.
  *     Five shapes measured interleaved at x10 (warm, candidates
  *     250.9k/2.5M positions): window 0.89-0.98 s; repartition +
  *     per-partition hash-count mapPartitions 0.84-1.27 (encoder
  *     serialization eats the sort saving, and the row buffer does not
  *     spill — rejected); count-agg + broadcast semi-join back
  *     1.63-1.86 (second kernel run + join); ObjectHashAggregate
  *     collect_list 2.9; localCheckpoint + count-agg + semi-join
  *     2.1-2.8. The window also spills gracefully and assumes nothing
  *     about dup-set size — it is the 100 TB shape. A degenerate
  *     boilerplate shingle makes a straggler task (linear, count-only —
  *     never quadratic); salt the hash key two-level if a corpus ever
  *     hits that;
  *  2b. [[dupSpansExact]] adds a CONFIRM pass: a hash collision between
  *     two distinct shingles can only ADD candidates (equal strings
  *     always share a hash — no false negatives), so re-derive the
  *     exact shingle string at candidate positions only (inner join
  *     back to the candidate docs, row-local `slice` of the token
  *     array) and re-count over the exact string. This second shuffle
  *     carries strings for just the duplicated fraction of positions;
  *     the result is bit-identical to an all-strings plan at any
  *     collision rate (SpanDedupSpec forces collisions via the
  *     coarse-hash hook and asserts equality). The default [[dupSpans]]
  *     skips it and carries the standard ExactSubstr production
  *     contract instead: one-sided over-flag with probability
  *     ~positions²/2^64 (~3e-7 for the x10 corpus' 2.5M positions) —
  *     never an under-flag. Measured at x10 the confirm pass costs
  *     +0.8 s on a 10%-duplicated corpus;
  *  3. per-doc gaps-and-islands merges overlapping [pos, pos+n)
  *     intervals: island starts where pos exceeds the running max end
  *     of every earlier interval — two windows over ONE doc_id
  *     exchange, then a tiny per-island aggregate. Measured negative
  *     (r6, x10 interleaved): fusing this stage into a single
  *     groupBy(doc) + sort_array + `aggregate` HOF fold is time-parity
  *     (1.51-1.54 vs 1.50-1.70 s full-operator) — the stage is
  *     exchange-floor-bound, not window-bound — so the declarative
  *     two-window form stays.
  *
  * r6 scale note: swapping the string key for the 8-byte hash is
  * time-PARITY at the local x10 point (1.52 vs 1.50 s — local shuffles
  * ride the page cache, so the bottleneck is explode+window CPU, not
  * shuffle bytes). The 4-7× shuffle-byte reduction is a network-scale
  * property: on a real cluster the exchange serializes to the wire and
  * the string key IS the operator's cost. The local pin vs DuckDB
  * (4.3×, BASELINE.md r6) is the multi-stage floor, with every
  * alternative shape measured and rejected above.
  *
  * All outputs are integer token positions/counts — engine-exact; the
  * q123 oracle re-derives the same spans in DuckDB from
  * `string_split_regex` shingles (the q71-proven tokenizer parity; the
  * hash kernel reproduces split's token boundaries byte-exactly, see
  * GraftShingleHashes).
  */
object SpanDedup {

  /** Merged duplicated spans: (idCol, span_start, span_end) with
    * half-open token intervals [span_start, span_end). Production
    * contract: ~2^-64-per-pair one-sided over-flag (scaladoc above);
    * use [[dupSpansExact]] where bit-exactness is required. */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    dupSpansImpl(docs, idCol, textCol, n, coarseBuckets = 0L, exact = false)

  /** [[dupSpans]] plus the exact-string confirm pass — bit-identical to
    * an all-strings plan at any hash-collision rate. */
  def dupSpansExact(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    dupSpansImpl(docs, idCol, textCol, n, coarseBuckets = 0L, exact = true)

  /** Impl with a test hook: coarseBuckets > 0 folds the shingle hash
    * into that many buckets, forcing collisions so the confirm pass's
    * correctness is observable (production always passes 0 — the full
    * 64-bit key). */
  private[graft] def dupSpansImpl(
      docs: DataFrame, idCol: String, textCol: String, n: Int,
      coarseBuckets: Long, exact: Boolean): DataFrame = {
    require(n >= 2, s"span shingle width must be >= 2, got $n")
    Seq("pos", "sh", "end", "__h", "__cpos", "__toks",
        "__occ", "__new_island", "__island").foreach { c =>
      require(idCol != c && textCol != c, s"'$c' is reserved by dupSpans")
    }
    val hashArr = call_function("graft_shingle_hashes", col(textCol), lit(n))
    val hs = docs.select(col(idCol),
      posexplode(if (coarseBuckets > 0)
        transform(hashArr, h => pmod(h, lit(coarseBuckets))) else hashArr)
        .as(Seq("pos", "__h")))
    // Pass 1 — candidates by 8-byte hash; shingle strings never exist.
    val cand = hs
      .withColumn("__occ", count(lit(1)).over(Window.partitionBy(col("__h"))))
      .filter(col("__occ") > 1)
      .select(col(idCol), col("pos"))
    val flagged = (if (!exact) cand else {
      // Pass 2 — exact confirm over candidate positions only: rebuild
      // each candidate shingle row-locally from the doc's token array
      // and re-count on the exact string. All occurrences of a truly
      // duplicated shingle are candidates (hash equality is implied by
      // string equality), so counting within the candidate set is exact.
      val candByDoc = cand.groupBy(col(idCol))
        .agg(collect_list(col("pos")).as("__cpos"))
      docs.select(col(idCol), col(textCol))
        .join(candByDoc, Seq(idCol))
        .withColumn("__toks", split(col(textCol), "\\s+"))
        .select(col(idCol), explode(col("__cpos")).as("pos"), col("__toks"))
        // slice is 1-based; tokens have no whitespace, so the space-join
        // is injective and mirrors graft_shingles' output format
        .select(col(idCol), col("pos"),
          concat_ws(" ", slice(col("__toks"), col("pos") + lit(1), lit(n))).as("sh"))
        .withColumn("__occ", count(lit(1)).over(Window.partitionBy(col("sh"))))
        .filter(col("__occ") > 1)
        .select(col(idCol), col("pos"))
    }).select(col(idCol), col("pos"), (col("pos") + lit(n)).as("end"))
    islandSpans(flagged, idCol)
  }

  /** Gaps-and-islands merge of flagged (idCol, pos, end) position
    * intervals into maximal spans — stage 3 of the scaladoc, shared by
    * the full and incremental forms. */
  private def islandSpans(flagged: DataFrame, idCol: String): DataFrame = {
    val byPos = Window.partitionBy(col(idCol)).orderBy(col("pos").asc)
    val runMaxEnd = max(col("end"))
      .over(byPos.rowsBetween(Window.unboundedPreceding, -1))
    flagged
      .withColumn("__new_island",
        when(runMaxEnd.isNull || col("pos") > runMaxEnd, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new_island"))
        .over(byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("__island"))
      .agg(min(col("pos")).as("span_start"), max(col("end")).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"))
  }

  /** The mergeable state an accumulating ExactSubstr deployment
    * persists: per-shingle-hash occurrence counts over a corpus split
    * (counts ADD across disjoint corpora — the additive-state
    * contract; strings never exist, exactly as in [[dupSpans]]'s
    * pass 1). */
  def shingleHashCounts(docs: DataFrame, textCol: String, n: Int): DataFrame =
    docs
      .select(explode(call_function("graft_shingle_hashes",
        col(textCol), lit(n))).as("__h"))
      .groupBy(col("__h")).agg(count(lit(1)).as("n"))

  /** Incremental span report — the daily shape for ExactSubstr: only
    * the BATCH is shingled; a batch position is duplicated when its
    * shingle-hash occurs anywhere else in warehouse ∪ batch (global
    * occurrence = persisted warehouse count + within-batch count > 1),
    * probed with ONE left join against the state plus the same
    * within-batch hash window (which shares the join's __h exchange —
    * the q171 plan shape). Output = [[spanReport]]'s schema over batch
    * docs only; gated by full-rebuild equality (the oracle re-derives
    * every span from the whole corpus and restricts to batch docs).
    * Same ~2^-64 one-sided over-flag contract as [[dupSpans]]. */
  def spanReportIncremental(warehouseCounts: DataFrame, batch: DataFrame,
                            idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 2, s"span shingle width must be >= 2, got $n")
    val hs = batch.select(col(idCol),
      posexplode(call_function("graft_shingle_hashes", col(textCol), lit(n)))
        .as(Seq("pos", "__h")))
    val flagged = hs
      .join(warehouseCounts.withColumnRenamed("n", "__wn"), Seq("__h"), "left")
      .withColumn("__occ",
        count(lit(1)).over(Window.partitionBy(col("__h"))) +
          coalesce(col("__wn"), lit(0L)))
      .filter(col("__occ") > 1)
      .select(col(idCol), col("pos"), (col("pos") + lit(n)).as("end"))
    val spans = islandSpans(flagged, idCol)
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_dup_spans"),
        sum(col("span_end") - col("span_start")).as("dup_tokens"),
        max(col("span_end") - col("span_start")).as("longest_span"))
    batch.select(col(idCol)).join(spans, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("longest_span"), lit(0L)).as("longest_span"))
  }

  /** The removal pass over [[dupSpans]]: re-tokenize each document, drop
    * every token a duplicated span covers, re-join with single spaces.
    * Output is (idCol, cleaned_md5, n_removed) — the md5 pins the exact
    * reconstructed text cross-engine without hauling it around.
    *
    * Row-local after one broadcast-sized join: the merged span list per
    * doc collects into an array (spans are disjoint and few — bounded by
    * tokens/n), and the token filter is a codegen'd HOF over the split
    * array (`filter` with index + `exists` over the span structs) — no
    * shuffle beyond dupSpans' own. Tokenization is `split(text, "\\s+")`
    * with Spark's default -1 limit: the exact JDK semantics
    * `graft_shingles` mirrors, so span positions line up with token
    * positions by construction.
    */
  def removeSpans(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val spanArr = dupSpans(docs, idCol, textCol, n)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(
        col("span_start").as("s"), col("span_end").as("e")))).as("__spans"))
    docs.select(col(idCol), col(textCol))
      .join(spanArr, Seq(idCol), "left")
      .withColumn("__spans",
        coalesce(col("__spans"), array().cast("array<struct<s:int,e:int>>")))
      .withColumn("__toks", split(col(textCol), "\\s+"))
      .withColumn("__kept", filter(col("__toks"), (_, i) =>
        !exists(col("__spans"),
          sp => i >= sp.getField("s") && i < sp.getField("e"))))
      .select(col(idCol),
        md5(concat_ws(" ", col("__kept"))).as("cleaned_md5"),
        (size(col("__toks")) - size(col("__kept"))).cast("long").as("n_removed"))
  }

  /** Per-document rollup over [[dupSpans]], keeping zero-span documents
    * (the curation report shape): n_dup_spans, dup_tokens (Σ span
    * lengths), longest_span. */
  def spanReport(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val spans = dupSpans(docs, idCol, textCol, n)
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_dup_spans"),
        sum(col("span_end") - col("span_start")).as("dup_tokens"),
        max(col("span_end") - col("span_start")).as("longest_span"))
    docs.select(col(idCol)).join(spans, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("longest_span"), lit(0L)).as("longest_span"))
  }
}
