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

  /** Score `docs` under a bigram LM counted on `train`. Output:
    * (idCol, n_bigrams, n_oov, sum_p_e9, score_e9) — one row per
    * document with at least one bigram (single-token documents have no
    * bigram evidence and do not appear); `n_oov` counts bigrams never
    * seen in train; `score_e9` in [0, 1e9]. */
  def scoreDocs(train: DataFrame, docs: DataFrame,
                idCol: String, textCol: String): DataFrame = {
    val trainText = train.select(col(textCol).as("__text"))
    val uni = trainText
      .select(explode(call_function("graft_tokens", col("__text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bi = trainText
      .select(explode(call_function("graft_shingles", col("__text"), lit(2)))
        .as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    val docBg = docs
      .select(col(idCol),
        explode(call_function("graft_shingles", col(textCol), lit(2))).as("bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
    docBg
      .join(bi, Seq("bg"), "left")
      .join(uni.select(col("w").as("w1"), col("c1")), Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("p_e9", floor(
        (lit(1000000000.0) * (coalesce(col("c12"), lit(0L)) + lit(1L)).cast("double")) /
          (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c12").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(col("p_e9")).as("sum_p_e9"))
      .withColumn("score_e9", expr("sum_p_e9 div n_bigrams"))
  }
}
