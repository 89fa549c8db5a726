package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — the model-based corpus
  * gate LLM pipelines train for quality/domain/language filtering (the
  * CCNet/fastText-classifier line of work: score every document with a
  * cheap supervised model, keep or re-weight by the score; McCallum &
  * Nigam 1998 for the multinomial event model). The reference has no
  * classifier — this is a beyond-reference pipeline operator in the
  * q168/q170 (fit-then-filter) family, with TOKENS as features instead
  * of numeric stats.
  *
  * Add-one smoothing over the global vocabulary V, priors from class
  * document counts, every log2 the exact fixed-point
  * [[graft.plans.GraftIlog2]] (2^16·log2 by integer mantissa squaring)
  * so scores are engine-portable exact integers — transcendental logs
  * would differ per libm (the q179 argument):
  *
  *   score_e16(d, s) = lg(D_s) − lg(D)
  *                   + Σ_{w∈d} tf(d,w)·lg(c_s(w)+1)
  *                   − n_words(d)·lg(N_s+|V|)
  *
  * with c_s(w) the class token counts, N_s = Σ_w c_s(w), D_s / D the
  * class / total document counts and lg = GraftIlog2. Words unseen in
  * class s contribute lg(0+1) = 0 to the sum, so the per-class numerator
  * needs only the words the class HAS seen — the same absent-term
  * vanishing that factors [[SourceDivergence.klMatrix]], and what makes
  * the scoring join word-keyed instead of |V|-wide.
  *
  * MODEL STATE is two exactly-mergeable relations (counts add — the
  * AggState/q181 argument): the (label, word, c) token counts (shared
  * shape with [[SourceDivergence.tokenCounts]]) and the (label, d)
  * document counts. The incremental form merges a batch's state onto a
  * persisted warehouse and classifies only the batch — work
  * O(state + batch), the corpus text is never re-read.
  *
  * Scale shape: state is |V|·S-bounded (S = #classes, small); scoring
  * is ONE word-keyed join of the per-doc tf relation (doc-linear)
  * against the count state, one (doc, class) rollup, and a broadcast of
  * the S per-class scalar rows; the argmax window partitions by doc id
  * (S rows per partition key — no global window). No all-pairs, no
  * driver loops; at 1000 executors every stage keys on doc ids or
  * words.
  */
object NaiveBayes {

  private def lg(c: Column) = call_function("graft_ilog2_e16", c)
  private def dec(c: Column) = c.cast("decimal(38,0)")

  /** (src, w, c) class token counts — the first mergeable state
    * relation (identical shape to [[SourceDivergence.tokenCounts]],
    * reused so a deployment can serve KL *and* NB from one warehouse
    * table). */
  def wordCounts(docs: DataFrame, labelCol: String, textCol: String): DataFrame =
    SourceDivergence.tokenCounts(docs, labelCol, textCol)

  /** (src, d) class document counts — the second (prior) state
    * relation. */
  def docCounts(docs: DataFrame, labelCol: String): DataFrame =
    docs.groupBy(col(labelCol).cast("string").as("src"))
      .agg(count(lit(1)).as("d"))

  /** Merge two doc-count states (counts add). */
  def mergeDocCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("src")).agg(sum(col("d")).as("d"))

  /** Train on `docs` and classify the same corpus (in-sample — the
    * corpus-report form: "which documents look unlike their own
    * label" is itself a quality signal; for held-out scoring use
    * [[classifyFromState]] with state built elsewhere).
    *
    * Output: one row per document —
    * (idCol, labelCol, predicted, score_e16, margin_e16, correct)
    * where predicted is the argmax class (ties break label-ascending),
    * margin_e16 = best − runner-up score (0 when S = 1) and correct =
    * predicted = true label. */
  def classify(docs: DataFrame, idCol: String, labelCol: String,
               textCol: String): DataFrame = {
    graft.plans.GraftExtensions.ensure(docs.sparkSession)
    classifyFromState(wordCounts(docs, labelCol, textCol),
      docCounts(docs, labelCol), docs, idCol, labelCol, textCol)
  }

  /** The incremental (daily-crawl) form: yesterday's persisted state
    * plus today's batch classifies the batch exactly as a from-scratch
    * train over warehouse ∪ batch would — both state relations merge by
    * addition, and only the BATCH is ever tokenized (its tf relation is
    * reused as its state contribution). Priors, smoothing denominators
    * and |V| all move with the merged state, exactly as the full
    * rebuild's would. */
  def classifyIncremental(warehouseWordCounts: DataFrame,
                          warehouseDocCounts: DataFrame,
                          batch: DataFrame, idCol: String, labelCol: String,
                          textCol: String): DataFrame = {
    graft.plans.GraftExtensions.ensure(batch.sparkSession)
    classifyFromState(
      SourceDivergence.mergeCounts(
        warehouseWordCounts, wordCounts(batch, labelCol, textCol)),
      mergeDocCounts(warehouseDocCounts, docCounts(batch, labelCol)),
      batch, idCol, labelCol, textCol)
  }

  /** Classify `toScore` against an explicit model state. Every document
    * in `toScore` yields exactly one output row (token-less documents
    * score on the prior alone). */
  def classifyFromState(wordCountsIn: DataFrame, docCountsIn: DataFrame,
                        toScore: DataFrame, idCol: String, labelCol: String,
                        textCol: String): DataFrame = {
    graft.plans.GraftExtensions.ensure(toScore.sparkSession)
    // three consumers (vocab distinct, per-class scalars, scoring join)
    // — materialize the count state once (the q167/q174 lesson)
    val counts = wordCountsIn.localCheckpoint(true)

    val vocab = counts.agg(countDistinct(col("w")).as("v"))
    val dTotal = docCountsIn.agg(sum(col("d")).as("dt"))
    // S rows: everything per-class the scorer needs, broadcast
    val perClass = counts.groupBy(col("src")).agg(sum(col("c")).as("n"))
      .join(docCountsIn, Seq("src"))
      .crossJoin(broadcast(vocab)).crossJoin(broadcast(dTotal))
      .select(col("src"),
        lg(col("n") + col("v")).as("lgnv"),
        (lg(col("d")) - lg(col("dt"))).as("prior_e16"))

    val tf = toScore
      .select(col(idCol).as("__id"),
        explode(call_function("graft_tokens",
          coalesce(col(textCol).cast("string"), lit("")))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("__id"), col("w")).agg(count(lit(1)).as("tf"))

    // Σ tf·lg(c+1) over the class's seen words — the only model-sized
    // join, word-keyed (absent words contribute lg(1) = 0 and vanish)
    val mTerm = tf.join(counts, Seq("w"))
      .groupBy(col("__id"), col("src"))
      .agg(sum(dec(col("tf")) * dec(lg(col("c") + 1L))).as("m_term"))

    val docLen = tf.groupBy(col("__id")).agg(sum(col("tf")).as("nw"))
    val grid = toScore.select(col(idCol).as("__id"),
        col(labelCol).cast("string").as("__lbl"))
      .join(docLen, Seq("__id"), "left")
      .withColumn("nw", coalesce(col("nw"), lit(0L)))
      .crossJoin(broadcast(perClass))
      .join(mTerm, Seq("__id", "src"), "left")
      .select(col("__id"), col("__lbl"), col("src"),
        (dec(col("prior_e16")) + coalesce(col("m_term"), dec(lit(0)))
          - dec(col("nw")) * dec(col("lgnv"))).cast("long").as("score_e16"))

    val byDoc = Window.partitionBy(col("__id"))
      .orderBy(col("score_e16").desc, col("src").asc)
    val ranked = grid.withColumn("__rn", row_number().over(byDoc))
    ranked.filter(col("__rn") === 1)
      .join(ranked.filter(col("__rn") === 2)
          .select(col("__id"), col("score_e16").as("__s2")),
        Seq("__id"), "left")
      .select(col("__id").as(idCol), col("__lbl").as(labelCol),
        col("src").as("predicted"), col("score_e16"),
        (col("score_e16") - coalesce(col("__s2"), col("score_e16")))
          .as("margin_e16"),
        (col("src") === col("__lbl")).as("correct"))
  }

  /** Per-class evaluation rollup of a [[classify]] output — the
    * classifier-eval report artifact (one row per TRUE class):
    * (label, n_docs, n_predicted, n_correct, precision_e6, recall_e6).
    * n_predicted counts docs the model ASSIGNED to the class anywhere
    * in the corpus; precision guards its zero with greatest(·,1). */
  def classReport(classified: DataFrame, labelCol: String): DataFrame = {
    val truth = classified.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("correct"), 1L).otherwise(0L)).as("n_correct"))
    val pred = classified.groupBy(col("predicted").as("label"))
      .agg(count(lit(1)).as("n_predicted"))
    truth.join(pred, Seq("label"), "left")
      .select(col("label"), col("n_docs"),
        coalesce(col("n_predicted"), lit(0L)).as("n_predicted"),
        col("n_correct"),
        expr("n_correct * 1000000L div greatest(coalesce(n_predicted, 0L), 1L)")
          .as("precision_e6"),
        expr("n_correct * 1000000L div greatest(n_docs, 1L)").as("recall_e6"))
  }
}
