package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Smoothed bigram language-model scoring — the CCNet-style LM quality
  * filter (Wenzek et al. 2020 trains a KenLM and buckets documents by
  * perplexity; the counting side is the classic distributed n-gram LM
  * of Brants et al. 2007): train bigram/unigram counts on a reference
  * split, score every document by its mean smoothed bigram likelihood,
  * gate or bucket on the score.
  *
  * Likelihood is add-one (Laplace) smoothed:
  *
  *   P(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)
  *
  * reported per bigram as the FIXED-POINT integer
  * `floor((1e9 * (c12+1)) / (c1+V))` — one exact integer-valued
  * multiply (exact while (c12+1)·1e9 < 2^53, i.e. bigram counts below
  * ~9·10^6; a larger corpus flips to log-space doubles and keeps the
  * same counting plan, the [[Collocations]] caveat) and ONE IEEE
  * division, then floor — bit-reproducible cross-engine, the
  * oracle-compat ruleset's q117/q138 convention. The per-document
  * score is the integer mean `sum_p_e9 div n_bigrams`: integer sums
  * are order-free, so no float-summation-order hazard exists anywhere
  * in the plan. Perplexity's log/geometric mean is a monotone
  * transform of per-bigram likelihoods omitted for the same reason
  * PMI's log is (transcendentals are not correctly-rounded
  * cross-engine); the mean-likelihood ORDERING differs from mean-log
  * ordering in general, which is fine for a gate trained to its own
  * threshold and is what keeps the operator hash-exact.
  *
  * Scale shape: two map-side-combined count aggregates over the train
  * split (unigram and bigram types are vocabulary-bounded — Brants'
  * observation: counts shuffle once into their aggregates); scoring
  * explodes each document's bigrams row-locally (`graft_shingles`
  * n=2), joins the count tables by key (shuffle linear in corpus
  * bigrams; the unigram side is vocabulary-sized), and one
  * map-side-combined integer aggregate rolls up per document. V rides
  * a single-row broadcast. Nothing collects to the driver.
  *
  * Beyond-reference (north star): model-based quality filtering for
  * the training-data pipeline family, per SURVEY §7.5 — the
  * statistical sibling of q150's hashed linear classifier. The
  * nearest reference analogue is the per-field confidence thresholds
  * of /root/reference/src/ai/tag_policy.py:285-340 (score-gated
  * acceptance), generalized to corpus LM statistics.
  */
object NgramLm {

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document under a TARGET-domain bigram LM and a SOURCE (general)
    * bigram LM; documents whose target likelihood exceeds their source
    * likelihood are the ones importance resampling up-weights. The
    * published weight is the probability ratio (log-ratio in
    * practice); the engine-exact variant here is the integer
    * DIFFERENCE of the two fixed-point mean likelihoods
    * (`importance_e9 = score_target_e9 - score_source_e9`) — same
    * up/down-weight direction, hash-exact cross-engine, no
    * transcendentals (the [[scoreDocs]] ruleset). Selection composes
    * with the existing machinery: top-k by weight, or
    * [[Sampling]]/[[PrefixSum]] for PPS-by-weight.
    *
    * One row-local bigram explode over `docs`, each model's count
    * tables joined by key — the doc side is touched once, not twice.
    *
    * Output: (idCol, n_bigrams, sum_p_target_e9, sum_p_source_e9,
    * score_target_e9, score_source_e9, importance_e9), one row per
    * document with >= 1 bigram. */
  def importanceWeights(target: DataFrame, source: DataFrame, docs: DataFrame,
                        idCol: String, textCol: String): DataFrame = {
    // Both models' count tables come out of ONE flagged union: the
    // unigram/bigram type spaces are keyed once and each side's count
    // is a conditional sum, so the two models cost two aggregates (not
    // four) and the corpus bigrams join TWO count relations (not
    // four). A key absent from one side carries count 0 where the
    // two-table shape carried NULL — identical under pE9's coalesce.
    // Disjointness of the splits is not assumed: a doc passed in both
    // contributes to both models, exactly as two separate counts
    // would. Measured at sf0.1 ONLY-mode: 0.92 -> see BASELINE r8.
    val text = target.select(col(textCol).as("__text"), lit(1L).as("__t"))
      .unionByName(source.select(col(textCol).as("__text"), lit(0L).as("__t")))
    val uni = text
      .select(explode(call_function("graft_tokens", col("__text"))).as("w1"),
        col("__t"))
      .groupBy(col("w1"))
      .agg(sum(col("__t")).as("c1_t"),
        sum(lit(1L) - col("__t")).as("c1_s"))
    val bi = text
      .select(explode(call_function("graft_shingles", col("__text"), lit(2)))
        .as("bg"), col("__t"))
      .groupBy(col("bg"))
      .agg(sum(col("__t")).as("c12_t"),
        sum(lit(1L) - col("__t")).as("c12_s"))
    val vd = uni.agg(
      sum(when(col("c1_t") > 0, 1L).otherwise(0L)).as("v_t"),
      sum(when(col("c1_s") > 0, 1L).otherwise(0L)).as("v_s"))
    val docBg = docs
      .select(col(idCol),
        explode(call_function("graft_shingles", col(textCol), lit(2))).as("bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
    docBg
      .join(bi, Seq("bg"), "left")
      .join(uni, Seq("w1"), "left")
      .crossJoin(broadcast(vd))
      .withColumn("p_t_e9", pE9(col("c12_t"), col("c1_t"), col("v_t")))
      .withColumn("p_s_e9", pE9(col("c12_s"), col("c1_s"), col("v_s")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("p_t_e9")).as("sum_p_target_e9"),
        sum(col("p_s_e9")).as("sum_p_source_e9"))
      .withColumn("score_target_e9", expr("sum_p_target_e9 div n_bigrams"))
      .withColumn("score_source_e9", expr("sum_p_source_e9 div n_bigrams"))
      .withColumn("importance_e9",
        col("score_target_e9") - col("score_source_e9"))
  }

  /** floor((1e9 * (c12+1)) / (c1+V)) with null counts as 0 — the one
    * multiply + one IEEE division + floor fixed-point rule. */
  private def pE9(c12: org.apache.spark.sql.Column,
                  c1: org.apache.spark.sql.Column,
                  v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor((lit(1000000000.0) * (coalesce(c12, lit(0L)) + lit(1L)).cast("double")) /
      (coalesce(c1, lit(0L)) + v).cast("double")).cast("long")

  /** Model relations: bigram counts (bg, c12), unigram counts (w1,
    * c1), vocabulary size as a 1-row frame (v) — all lazy. */
  private def modelFrames(train: DataFrame, textCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val text = train.select(col(textCol).as("__text"))
    val uni = text
      .select(explode(call_function("graft_tokens", col("__text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
      .withColumnRenamed("w", "w1")
    val bi = text
      .select(explode(call_function("graft_shingles", col("__text"), lit(2)))
        .as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    (bi, uni, uni.agg(count(lit(1)).as("v")))
  }

  /** The trained model as warehouse tables: bigram counts (bg, c12),
    * unigram counts (w1, c1), and the vocabulary size — the artifact a
    * deployment materializes once and every scoring pass (batch OR the
    * [[graft.streaming.StreamingLmScore]] stream-static twin) joins
    * against. The vocabulary size is a bounded 1-row collect. */
  def modelTables(train: DataFrame, textCol: String)
      : (DataFrame, DataFrame, Long) = {
    val (bi, uni, vd) = modelFrames(train, textCol)
    (bi, uni, vd.head().getLong(0))
  }

  /** Scoring tail over pre-exploded document bigrams (idCol, bg, w1) —
    * shared verbatim by the batch path and the streaming twin, so the
    * twin cannot drift. `v` is either `col("v")` with `vocab` supplied
    * (batch: the vocabulary count rides the SAME job as a 1-row
    * broadcast — no separate count job per construction) or a literal
    * from [[modelTables]] (streaming: computed once at setup). */
  private[graft] def scoreExploded(docBg: DataFrame, idCol: String,
                                   bi: DataFrame, uni: DataFrame,
                                   v: org.apache.spark.sql.Column,
                                   vocab: Option[DataFrame] = None): DataFrame = {
    val joined0 = docBg
      .join(bi, Seq("bg"), "left")
      .join(uni, Seq("w1"), "left")
    val joined = vocab.map(vd => joined0.crossJoin(broadcast(vd)))
      .getOrElse(joined0)
    joined
      .withColumn("p_e9", pE9(col("c12"), col("c1"), v))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c12").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(col("p_e9")).as("sum_p_e9"))
      .withColumn("score_e9", expr("sum_p_e9 div n_bigrams"))
  }

  /** Pre-exploded bigram rows (idCol, bg, w1) for `docs` — row-local. */
  private[graft] def explodeBigrams(docs: DataFrame, idCol: String,
                                    textCol: String): DataFrame =
    docs
      .select(col(idCol),
        explode(call_function("graft_shingles", col(textCol), lit(2))).as("bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))

  /** Score `docs` under a bigram LM counted on `train`. Output:
    * (idCol, n_bigrams, n_oov, sum_p_e9, score_e9) — one row per
    * document with at least one bigram (single-token documents have no
    * bigram evidence and do not appear); `n_oov` counts bigrams never
    * seen in train; `score_e9` in [0, 1e9]. Fully lazy — one job end
    * to end when executed. */
  def scoreDocs(train: DataFrame, docs: DataFrame,
                idCol: String, textCol: String): DataFrame = {
    val (bi, uni, vd) = modelFrames(train, textCol)
    scoreExploded(explodeBigrams(docs, idCol, textCol), idCol, bi, uni,
      col("v"), Some(vd))
  }
}
