package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise Kullback–Leibler divergence between per-source unigram
  * token distributions — the mixture-design diagnostic (which corpus
  * sources are distributionally close decides merge/temperature/
  * curriculum choices; the DoReMi/DSIR line of work conditions on
  * exactly this kind of domain-shift measurement, and q157's DSIR
  * importance weights are the per-DOCUMENT cousin of this per-SOURCE
  * matrix).
  *
  * Distributions are add-one smoothed over the GLOBAL vocabulary V:
  * p_s(w) = (c_s(w)+1)/(N_s+|V|). Every log2 is the exact fixed-point
  * [[graft.plans.GraftIlog2]] (2^16·log2 via integer mantissa
  * squaring) so the whole matrix is engine-portable exact arithmetic —
  * KL with transcendental logs would be a different number on every
  * libm (the PMI caveat, q138).
  *
  * The naive form sums |V| terms per ORDERED PAIR (S²·|V| work, a
  * pair-keyed shuffle per pair). This operator factors the sum so the
  * only pairwise work is an inner join on SHARED words:
  *
  *   KLnum(a,b) = Σ_{w∈V} (c_a+1)·[lg(c_a+1) − lg(c_b+1) − K_ab]
  *              = A_a − B_b − J_ab − K_ab·(N_a+|V|)
  *
  * with A_a = Σ_{w∈V_a} (c_a+1)·lg(c_a+1) and B_b = Σ_{w∈V_b}
  * lg(c_b+1) per-source scalars (one groupBy each, pair-independent),
  * K_ab = lg(N_a+|V|) − lg(N_b+|V|) from broadcast-sized per-source
  * rows, and J_ab = Σ_{w∈V_a∩V_b} c_a·lg(c_b+1) the single genuinely
  * pairwise term — an equi-join of the (source, word) count table
  * with itself on `word`, one word-keyed shuffle total for ALL pairs
  * (words absent from either side contribute lg(1)=0 and vanish, which
  * is what makes the factoring exact). The emitted score is
  * `kl_e9 = (10⁹·max(KLnum,0)) div ((N_a+|V|)·2^16)` — bits·1e9; the
  * max guards the few-ULP fixed-point noise floor when two sources are
  * near-identical (true KL ≥ 0 by Gibbs' inequality).
  *
  * Scale shape: one token explode + one (source, word) count shuffle +
  * one word-keyed self-join; per-word join fan-out is bounded by
  * (sources containing the word)² ≤ S². The matrix is inherently S²
  * OUTPUT — the operator targets corpus-level source taxonomies
  * (S ~ 10..10³); for web-scale provenance (S ~ 10⁵ domains) the same
  * frequent-key argument as [[SourceOverlap]] applies: cap or block
  * the source list first, the pairwise object itself is the blowup.
  */
object SourceDivergence {

  private def lg(c: org.apache.spark.sql.Column) =
    call_function("graft_ilog2_e16", c)
  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")

  /** The (src, w, c) token-count relation — the operator family's
    * MERGEABLE STATE (counts add; [[mergeCounts]]). One explode + one
    * map-side-combined shuffle. */
  def tokenCounts(docs: DataFrame, sourceCol: String, textCol: String): DataFrame =
    docs
      .select(col(sourceCol).cast("string").as("src"),
        explode(call_function("graft_tokens", coalesce(col(textCol), lit("")))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("src"), col("w")).agg(count(lit(1)).as("c"))

  /** Merge two count states (counts are exactly mergeable: they add —
    * the AggState argument applied to token histograms). Shuffles
    * 2×|state| rows, never documents. */
  def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("src"), col("w"))
      .agg(sum(col("c")).as("c"))

  /** KL(a‖b) for every ordered pair of distinct values of `sourceCol`,
    * as (source_a, source_b, n_shared, kl_e9), exact integers.
    * Tokens = whitespace runs of `textCol` (graft_tokens, empty tokens
    * dropped), the corpus-wide convention. */
  def klMatrix(docs: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    graft.plans.GraftExtensions.ensure(docs.sparkSession)
    klMatrixFromCounts(tokenCounts(docs, sourceCol, textCol))
  }

  /** The incremental form (the q129/q171/q176 daily-crawl contract):
    * yesterday's persisted count STATE plus today's batch answers
    * exactly what a from-scratch run over the full corpus answers —
    * counts add, so the merge is one vocabulary-bounded shuffle and
    * only the BATCH is ever tokenized. Work is O(state + batch),
    * independent of how many documents the warehouse counts summarize. */
  def klMatrixIncremental(warehouseCounts: DataFrame, batchDocs: DataFrame,
                          sourceCol: String, textCol: String): DataFrame = {
    graft.plans.GraftExtensions.ensure(batchDocs.sparkSession)
    klMatrixFromCounts(
      mergeCounts(warehouseCounts, tokenCounts(batchDocs, sourceCol, textCol)))
  }

  /** The matrix over an explicit (src, w, c) count relation. */
  def klMatrixFromCounts(countsIn: DataFrame): DataFrame = {
    val counts = countsIn
      // three consumers (per-source scalars, both sides of the J join)
      // — materialize the tokenize+count once (the q167/q174 lesson)
      .localCheckpoint(true)

    val vocab = counts.agg(countDistinct(col("w")).as("v"))
    val perSource = counts.groupBy(col("src")).agg(
      sum(col("c")).as("n"),
      // cast each factor BEFORE multiplying: count × lg-value products
      // must not round-trip through long (10¹² tokens × 2.6e6 lg units
      // already brushes 2^63)
      sum(dec(col("c") + 1L) * dec(lg(col("c") + 1L))).as("a_term"),
      sum(dec(lg(col("c") + 1L))).as("b_term"))
      .crossJoin(broadcast(vocab))
      .withColumn("nv", col("n") + col("v"))
      .withColumn("lgnv", lg(col("nv")))

    val jTerm = counts.as("ca")
      .join(counts.as("cb"), col("ca.w") === col("cb.w") &&
        col("ca.src") =!= col("cb.src"))
      .groupBy(col("ca.src").as("src_a"), col("cb.src").as("src_b"))
      .agg(sum(dec(col("ca.c")) * dec(lg(col("cb.c") + 1L))).as("j_term"),
        count(lit(1)).as("n_shared"))

    perSource.as("pa").crossJoin(perSource.as("pb"))
      .filter(col("pa.src") =!= col("pb.src"))
      .join(jTerm,
        col("pa.src") === col("src_a") && col("pb.src") === col("src_b"), "left")
      .select(col("pa.src").as("source_a"), col("pb.src").as("source_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (col("pa.a_term") - col("pb.b_term") - coalesce(col("j_term"), dec(lit(0)))
          - (dec(col("pa.lgnv")) - dec(col("pb.lgnv"))) * dec(col("pa.nv"))).as("klnum"),
        dec(col("pa.nv") * 65536L).as("den"))
      .withColumn("kl_e9", expr(
        "CAST((cast(1000000000 as decimal(38,0)) * " +
          "greatest(klnum, cast(0 as decimal(38,0)))) div den AS BIGINT)"))
      .select(col("source_a"), col("source_b"), col("n_shared"), col("kl_e9"))
  }

  /** WHICH words drive each pair's divergence — the interpretability
    * companion to [[klMatrix]]: for every ordered pair (a,b), the top-k
    * words of source a by their exact per-word KL contribution
    * `t_w = (c_a+1)·[lg(c_a+1) − lg(c_b+1) − K_ab]` (the same algebra,
    * unfactored, restricted to w ∈ V_a — the over-represented-in-a
    * deviation vocabulary; unobserved words all share the constant
    * −K_ab and carry no interpretive signal).
    *
    * Scale shape: the term table is counts × (S−1) rows (the S² pair
    * list broadcasts; absent-in-b words must surface — they are the
    * point — so the c_b lookup is a word-keyed LEFT join and the
    * fanned table rides that one exchange: S²·|V| is the inherent size
    * of the per-pair term object, the klMatrix S-regime note applies).
    * The top-k itself is the bounded-heap grouped aggregate
    * ([[TopK.perGroup]]) — ≤ k rows per (pair, map partition) reach
    * the final shuffle, never the full term table. Ties break
    * word-descending (the sort_array struct order); exact longs
    * end-to-end (c·lg products stay under 2⁶³ through ~10¹² tokens per
    * word — cast to Decimal at the klMatrix scale if that regime ever
    * matters). */
  def divergingTerms(docs: DataFrame, sourceCol: String, textCol: String,
                     k: Int = 5): DataFrame = {
    graft.plans.GraftExtensions.ensure(docs.sparkSession)
    val counts = tokenCounts(docs, sourceCol, textCol).localCheckpoint(true)
    val vocab = counts.agg(countDistinct(col("w")).as("v"))
    val scal = counts.groupBy(col("src")).agg(sum(col("c")).as("n"))
      .crossJoin(broadcast(vocab))
      .select(col("src"), lg(col("n") + col("v")).as("lgnv"))
    val pairsK = scal.as("sa").join(broadcast(scal.as("sb")),
        col("sa.src") =!= col("sb.src"))
      .select(col("sa.src").as("src_a"), col("sb.src").as("src_b"),
        (col("sa.lgnv") - col("sb.lgnv")).as("k_ab"))
    // fan each of a's count rows out to every b (pairsK is S² rows —
    // broadcast), then ONE word-keyed left join picks up c_b
    val fanned = counts.join(broadcast(pairsK), col("src") === col("src_a"))
      .select(col("src_a"), col("src_b"), col("w"), col("c"), col("k_ab"))
    val withB = fanned.join(
      counts.select(col("src").as("__sb"), col("w").as("__wb"), col("c").as("cb")),
      col("__wb") === col("w") && col("__sb") === col("src_b"), "left")
      .select(col("src_a").as("source_a"), col("src_b").as("source_b"),
        col("w").as("word"),
        ((col("c") + 1L) * (lg(col("c") + 1L)
          - lg(coalesce(col("cb"), lit(0L)) + 1L) - col("k_ab"))).as("contrib"))
    TopK.perGroup(withB, Seq("source_a", "source_b"),
      Seq("contrib", "word"), Seq(), k)
  }
}
