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
  *  1. `graft_shingles` emits each doc's shingle array row-locally
  *     (no corpus-wide lead/lag shuffle) → posexplode — ONCE;
  *  2. one shuffle on the shingle, then a full-partition `count`
  *     window flags positions whose shingle occurs more than once —
  *     chosen over the groupBy-count + join-back shape by interleaved
  *     A/B at x10 (2.0 vs 5.3 s): the join shape re-runs the
  *     kernel+explode pass for the probe side and pays a second
  *     shuffle, while the window consumes the single exploded stream
  *     in place. A degenerate boilerplate shingle makes a straggler
  *     task here (linear, count-only — never quadratic); salt the
  *     shingle key two-level if a corpus ever hits that;
  *  3. per-doc gaps-and-islands merges overlapping [pos, pos+n)
  *     intervals: island starts where pos exceeds the running max end
  *     of every earlier interval — two windows over ONE doc_id
  *     exchange, then a tiny per-island aggregate.
  *
  * All outputs are integer token positions/counts — engine-exact; the
  * q123 oracle re-derives the same spans in DuckDB from
  * `string_split_regex` shingles (the q71-proven tokenizer parity).
  */
object SpanDedup {

  /** Merged duplicated spans: (idCol, span_start, span_end) with
    * half-open token intervals [span_start, span_end). */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 2, s"span shingle width must be >= 2, got $n")
    Seq("pos", "sh", "end", "__occ", "__new_island", "__island").foreach { c =>
      require(idCol != c && textCol != c, s"'$c' is reserved by dupSpans")
    }
    val sh = docs.select(col(idCol),
      posexplode(call_function("graft_shingles", col(textCol), lit(n)))
        .as(Seq("pos", "sh")))
    val flagged = sh
      .withColumn("__occ", count(lit(1)).over(Window.partitionBy(col("sh"))))
      .filter(col("__occ") > 1)
      .select(col(idCol), col("pos"), (col("pos") + lit(n)).as("end"))

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
