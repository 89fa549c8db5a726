package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PMI collocation mining — statistically-bound phrases ("new york"-style
  * bigrams) for tokenizer vocabulary building and phrase-aware dedup.
  *
  * Lift (the PMI argument, log omitted — see below) for bigram (x, y):
  *
  *   lift = p(xy) / (p(x)·p(y)) = (c_xy/B) / ((c_x/N)·(c_y/N))
  *        = c_xy·N² / (B·c_x·c_y)
  *
  * computed as ONE integer numerator, one integer denominator, one IEEE
  * division — bit-reproducible cross-engine (the oracle-compat ruleset:
  * log is a transcendental no engine guarantees correctly rounded, and
  * monotone transforms don't change the ranking). Numerator exactness
  * holds while c_xy·N² < 2^53 — fine at bench scale; a 10^12-token corpus
  * flips to log-space doubles and keeps the same counting plan.
  *
  * Scale shape: one map-side-combined aggregate over exploded tokens, one
  * over exploded bigrams (`graft_shingles` n=2 — row-local, no window
  * shuffle), a min-count gate BEFORE the two vocabulary joins (the gate
  * is what bounds the join: surviving bigrams are the frequent head, not
  * the long tail), and the two corpus totals ride single-row broadcasts.
  * Nothing collects to the driver.
  *
  * Beyond-reference (north star): corpus n-gram collocation statistics
  * for a training-data pipeline, per SURVEY §7.5. The nearest reference
  * analogue is the tag-vocabulary frequency accounting in
  * /root/reference/src/ai/refitd_tagger.py:56-257 (frozen vocabulary tables),
  * generalized here to arbitrary corpus n-gram statistics.
  */
object Collocations {

  /** Bigram lift table: (w1, w2, n_xy, n_w1, n_w2, lift) for bigrams
    * occurring at least `minCount` times. Tokens are `\s+`-split, so a
    * bigram key joined with one space splits back unambiguously. */
  def pmiBigrams(docs: DataFrame, textCol: String, minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount $minCount must be >= 1")
    val text = docs.select(col(textCol).as("__text"))
    val toks = text.select(explode(call_function("graft_tokens", col("__text"))).as("w"))
    val un = toks.groupBy(col("w")).agg(count(lit(1)).as("n_w"))
    val nt = toks.agg(count(lit(1)).as("n"))
    val big = text.select(
      explode(call_function("graft_shingles", col("__text"), lit(2))).as("bg"))
    val bt = big.agg(count(lit(1)).as("b"))
    val bc = big.groupBy(col("bg")).agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minCount)
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
    bc
      .join(un.select(col("w").as("w1"), col("n_w").as("n_w1")), "w1")
      .join(un.select(col("w").as("w2"), col("n_w").as("n_w2")), "w2")
      .crossJoin(broadcast(nt))
      .crossJoin(broadcast(bt))
      .select(col("w1"), col("w2"), col("n_xy"), col("n_w1"), col("n_w2"),
        (col("n_xy") * col("n") * col("n")).cast("double")
          ./(col("b") * col("n_w1") * col("n_w2")).as("lift"))
  }
}
