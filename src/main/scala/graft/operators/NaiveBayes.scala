package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * Scale shape: state is |V|·S-bounded (S = #classes, small). Below
  * the [[MaxBroadcastModelRows]] guard the model broadcasts as a map
  * and every document scores ROW-LOCALLY in one corpus pass — zero
  * scoring shuffles, argmax in place; past the guard a word-keyed join
  * of the per-doc tf relation (doc-linear) + one (doc, class) rollup +
  * one per-doc argmax aggregate computes the same integers. No
  * all-pairs, no driver loops beyond the S-bounded class scalars; at
  * 1000 executors every stage keys on doc ids or words.
  */
object NaiveBayes {

  /** Model rows (|V|·S) at or below this broadcast; above it the
    * scoring join falls back to a word-keyed shuffle. ~4M rows of
    * (string, string, decimal) is low hundreds of MB on the wire —
    * the BloomFilters guard sizing argument. */
  val MaxBroadcastModelRows: Long = 4000000L

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

  /** Per-doc term frequencies of `df` — (`__id`, w, tf), one explode +
    * one map-side-combined rollup. */
  private def tfRelation(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("__id"),
        explode(call_function("graft_tokens",
          coalesce(col(textCol).cast("string"), lit("")))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("__id"), col("w"))
      .agg(count(lit(1)).as("tf"))

  /** Train on `docs` and classify the same corpus (in-sample — the
    * corpus-report form: "which documents look unlike their own
    * label" is itself a quality signal; for held-out scoring use
    * [[classifyFromState]] with state built elsewhere). Two corpus
    * passes: the count-state build and the row-local scoring map.
    *
    * Output: one row per document —
    * (idCol, labelCol, predicted, score_e16, margin_e16, correct)
    * where predicted is the argmax class (ties break label-ascending),
    * margin_e16 = best − runner-up score (0 when S = 1) and correct =
    * predicted = true label. */
  def classify(docs: DataFrame, idCol: String, labelCol: String,
               textCol: String,
               maxBroadcastModelRows: Long = MaxBroadcastModelRows): DataFrame = {
    graft.plans.GraftExtensions.ensure(docs.sparkSession)
    scoreCore(wordCounts(docs, labelCol, textCol), docCounts(docs, labelCol),
      docs, idCol, labelCol, textCol, maxBroadcastModelRows)
  }

  /** The incremental (daily-crawl) form: yesterday's persisted state
    * plus today's batch classifies the batch exactly as a from-scratch
    * train over warehouse ∪ batch would — both state relations merge by
    * addition, and only the BATCH is ever tokenized, ONCE (its tf
    * relation doubles as its state contribution). Priors, smoothing
    * denominators and |V| all move with the merged state, exactly as
    * the full rebuild's would. */
  def classifyIncremental(warehouseWordCounts: DataFrame,
                          warehouseDocCounts: DataFrame,
                          batch: DataFrame, idCol: String, labelCol: String,
                          textCol: String,
                          maxBroadcastModelRows: Long = MaxBroadcastModelRows): DataFrame = {
    graft.plans.GraftExtensions.ensure(batch.sparkSession)
    scoreCore(
      SourceDivergence.mergeCounts(warehouseWordCounts,
        wordCounts(batch, labelCol, textCol)),
      mergeDocCounts(warehouseDocCounts, docCounts(batch, labelCol)),
      batch, idCol, labelCol, textCol, maxBroadcastModelRows)
  }

  /** Classify `toScore` against an explicit model state. Every document
    * in `toScore` yields exactly one output row (token-less documents
    * score on the prior alone). */
  def classifyFromState(wordCountsIn: DataFrame, docCountsIn: DataFrame,
                        toScore: DataFrame, idCol: String, labelCol: String,
                        textCol: String,
                        maxBroadcastModelRows: Long = MaxBroadcastModelRows): DataFrame = {
    graft.plans.GraftExtensions.ensure(toScore.sparkSession)
    scoreCore(wordCountsIn, docCountsIn, toScore, idCol, labelCol, textCol,
      maxBroadcastModelRows)
  }

  /** The eager half of [[scoreCore]] — everything that depends only on
    * the model STATE (never on the rows to score): the count-state
    * checkpoint, the per-class scalars, and (when the state fits the
    * broadcast guard) the broadcast w → lg-vector map. Split out (r14,
    * guide §2.6) so a composed pipeline (IngestCapstone) can build the
    * model on a driver thread CONCURRENTLY with its other rungs'
    * actions instead of serializing ~6 driver round trips behind them;
    * [[prepareModel]] + [[scoreWithModel]] compute exactly what the
    * fused scoreCore did, in the same order. The map is built whenever
    * the state fits the guard — a non-integral-id caller would waste
    * that one vocab-bounded collect, but every current caller routes
    * integral ids (the r11 idIntegral rule decides at apply time). */
  private[graft] final case class NbModel(
      counts: DataFrame, srcs: Array[String], lgnvArr: Array[Long],
      priorArr: Array[Long], v: Long, modelRows: Long, maxModel: Long,
      bc: Option[org.apache.spark.broadcast.Broadcast[
        java.util.HashMap[String, Array[Long]]]])

  private[graft] def prepareModel(wordCountsIn: DataFrame,
                                  docCountsIn: DataFrame,
                                  maxModel: Long = MaxBroadcastModelRows): NbModel = {
    val spark = wordCountsIn.sparkSession
    // three consumers (per-class rollup, size rollup, model build)
    // — materialize the count state once (the q167/q174 lesson)
    val counts = wordCountsIn.localCheckpoint(true)

    // Per-class scalars via TWO tiny driver collects (the
    // KMeans-centroid rule — S is bounded like a centroid list), with
    // lgnv/prior computed by the SAME IntLog2 kernel the column
    // expression would run. Classes are those with ≥ 1 training token
    // (token-less classes carry no usable likelihood — the oracle's
    // pn ⋈ dc inner-join semantics).
    val perSrcN = counts.groupBy(col("src")).agg(sum(col("c")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizesRow = counts
      .agg(countDistinct(col("w")).as("v"), count(lit(1)).as("rows"))
      .head()
    val (v, modelRows) = (sizesRow.getLong(0), sizesRow.getLong(1))
    val dBySrc = docCountsIn.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dt = dBySrc.values.sum
    val ilg = graft.functions.IntLog2.ilog2e16 _
    val srcs = perSrcN.keys.toArray.sorted
    // r11 (ADVICE): an all-token-less corpus leaves no scorable class —
    // the fast path would AIOOBE at bcSrcs(best) and the fallback would
    // silently emit zero rows, both breaking the one-row-per-document
    // contract. Fail with the exclusion rule spelled out instead.
    require(srcs.nonEmpty,
      "NaiveBayes: no class has any training token (classes without " +
        "tokens are excluded from the candidate set, so an all-token-less " +
        "state cannot score anything)")
    val lgnvArr = srcs.map(s => ilg(perSrcN(s) + v))
    val priorArr = srcs.map(s => ilg(dBySrc(s)) - ilg(dt))
    val bc = if (modelRows <= maxModel) {
      val srcIdx = srcs.zipWithIndex.toMap
      val nSrc = srcs.length
      val modelMap = new java.util.HashMap[String, Array[Long]](
        math.max(16, (modelRows / 2).toInt))
      counts.select(col("src"), col("w"), col("c")).collect().foreach { r =>
        val arr = modelMap.computeIfAbsent(r.getString(1),
          _ => new Array[Long](nSrc))
        arr(srcIdx(r.getString(0))) = ilg(r.getLong(2) + 1L)
      }
      Some(spark.sparkContext.broadcast(modelMap))
    } else None
    NbModel(counts, srcs, lgnvArr, priorArr, v, modelRows, maxModel, bc)
  }

  /** Shared scorer over the model state (src, w, c) + (src, d). Below
    * the model-size guard, the apply path is the q177 shape — model
    * broadcast as a map, every document scored row-locally in ONE
    * corpus pass with zero shuffles; above it, a word-keyed relational
    * join chain computes the same integers. */
  private def scoreCore(wordCountsIn: DataFrame, docCountsIn: DataFrame,
                        toScore: DataFrame, idCol: String, labelCol: String,
                        textCol: String, maxModel: Long): DataFrame =
    scoreWithModel(prepareModel(wordCountsIn, docCountsIn, maxModel),
      toScore, idCol, labelCol, textCol)

  private[graft] def scoreWithModel(m: NbModel, toScore: DataFrame,
                                    idCol: String, labelCol: String,
                                    textCol: String): DataFrame = {
    val spark = toScore.sparkSession
    import spark.implicits._
    val NbModel(counts, srcs, lgnvArr, priorArr, _, modelRows, maxModel, bcOpt) = m

    // r11 (ADVICE): the typed fast path scores ids as Long — a
    // non-integral id column would silently null out under the cast and
    // diverge from the fallback (which carries ids untouched). Integral
    // ids cast back to their exact input type after scoring; any other
    // id type routes to the relational path, which is id-type-agnostic.
    val idType = toScore.schema(idCol).dataType
    val idIntegral = idType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }

    if (modelRows <= maxModel && idIntegral) {
      // FAST PATH: the model is exactly the thing small enough to ship
      // to every executor (that is the point of NB) — w → per-class
      // lg(c+1) vector, broadcast once; each document then scores in
      // place: Σ-accumulate over its tokens, subtract n_words·lgnv,
      // argmax with the (score desc, label asc) ladder. ONE corpus
      // pass, ZERO scoring shuffles (the q177 broadcast-vocab apply
      // shape). Long arithmetic end to end — exact through ~2·10¹²
      // tokens per DOCUMENT (lg ≤ 63·2¹⁶), the q183 regime convention.
      val bc = bcOpt.get
      val bcLgnv = lgnvArr; val bcPrior = priorArr; val bcSrcs = srcs
      toScore
        .select(col(idCol).cast("long"), col(labelCol).cast("string"),
          col(textCol).cast("string"))
        .as[(Long, String, String)]
        .mapPartitions { rows =>
          val model = bc.value
          // one compiled pattern per PARTITION (r11, VERDICT r10 #5):
          // String.split(regex) re-compiles per call — the exact cost
          // plans/GraftTokens exists to avoid on the relational paths
          val ws = java.util.regex.Pattern.compile("\\s+")
          rows.map { case (id, lbl, text) =>
            val s = bcPrior.clone()
            var nw = 0L
            ws.split(Option(text).getOrElse("")).iterator
              .filter(_.nonEmpty).foreach { w =>
                nw += 1
                val arr = model.get(w)
                if (arr != null) {
                  var i = 0
                  while (i < s.length) { s(i) += arr(i); i += 1 }
                }
              }
            var i = 0
            while (i < s.length) { s(i) -= nw * bcLgnv(i); i += 1 }
            // ascending label order + strict > = the tie ladder
            var best = 0; var second = -1
            i = 1
            while (i < s.length) {
              if (s(i) > s(best)) { second = best; best = i }
              else if (second == -1 || s(i) > s(second)) second = i
              i += 1
            }
            val margin = if (second == -1) 0L else s(best) - s(second)
            (id, lbl, bcSrcs(best), s(best), margin, bcSrcs(best) == lbl)
          }
        }
        .toDF(idCol, labelCol, "predicted", "score_e16", "margin_e16",
          "correct")
        .withColumn(idCol, col(idCol).cast(idType))
    } else {
      // FALLBACK: model past the broadcast bound — the same integers
      // via a word-keyed join (lg(c+1) precomputed per MODEL row, not
      // per joined token row) + (doc, class) rollup + one argmax
      // aggregate whose sorted (−score, src) array IS the tie ladder.
      val perClass = srcs.indices
        .map(i => (srcs(i), lgnvArr(i), priorArr(i)))
        .toDF("src", "lgnv", "prior_e16")
      val model = counts.select(col("src"), col("w"),
        dec(lg(col("c") + 1L)).as("lgc1"))
      val tf = tfRelation(toScore, idCol, textCol)
      val mTerm = tf.join(model, Seq("w"))
        .groupBy(col("__id"), col("src"))
        .agg(sum(dec(col("tf")) * col("lgc1")).as("m_term"))
      val docLen = tf.groupBy(col("__id")).agg(sum(col("tf")).as("nw"))
      val grid = toScore
        .select(col(idCol).as("__id"), col(labelCol).cast("string").as("__lbl"))
        .join(docLen, Seq("__id"), "left")
        .withColumn("nw", coalesce(col("nw"), lit(0L)))
        .crossJoin(broadcast(perClass))
        .join(mTerm, Seq("__id", "src"), "left")
        .select(col("__id"), col("__lbl"), col("src"),
          (dec(col("prior_e16")) + coalesce(col("m_term"), dec(lit(0)))
            - dec(col("nw")) * dec(col("lgnv"))).cast("long").as("score_e16"))
      grid.groupBy(col("__id"), col("__lbl"))
        .agg(sort_array(collect_list(
          struct((-col("score_e16")).as("ns"), col("src")))).as("r"))
        .select(col("__id").as(idCol), col("__lbl").as(labelCol),
          col("r").getItem(0).getField("src").as("predicted"),
          (-col("r").getItem(0).getField("ns")).as("score_e16"),
          when(size(col("r")) > 1,
            col("r").getItem(1).getField("ns") - col("r").getItem(0).getField("ns"))
            .otherwise(0L).as("margin_e16"),
          (col("r").getItem(0).getField("src") === col("__lbl")).as("correct"))
    }
  }


  /** Leave-one-out classification — the honest evaluation (in-sample
    * [[classify]] scores every document against a model its own tokens
    * helped train, which flatters accuracy). NB supports LOO in closed
    * form: scoring document d against "train on everything but d" just
    * subtracts d's own contributions —
    *
    *   own class t = label(d):  c_t(w) → c_t(w) − tf_d(w),
    *                            N_t → N_t − n_words(d), D_t → D_t − 1
    *   every class:             D → D − 1
    *
    * — with the vocabulary held FIXED at the full training V (held-out
    * smoothing over the training vocabulary; true retrain-without-d
    * would also shrink V by d's hapaxes, making |V| per-doc — a
    * different, costlier estimator, documented out). A document whose
    * class it is the ONLY member of (D_t = 1) has no own-class LOO
    * model; that class is excluded from its candidate set, and a
    * single-class corpus yields no output rows.
    *
    * Same output shape as [[classify]]. Broadcast-model row-local
    * scorer only (the model map must fit the [[MaxBroadcastModelRows]]
    * guard — per-word RAW counts ship so the subtraction happens in
    * place; each partition memoizes the unadjusted per-word lg vector,
    * and only own-class seen words pay a fresh ilog2). */
  def classifyLoo(docs: DataFrame, idCol: String, labelCol: String,
                  textCol: String,
                  maxBroadcastModelRows: Long = MaxBroadcastModelRows): DataFrame = {
    graft.plans.GraftExtensions.ensure(docs.sparkSession)
    val spark = docs.sparkSession
    import spark.implicits._
    // LOO has no relational fallback, so a non-integral id cannot be
    // routed around the Long-typed scorer (r11, ADVICE) — refuse loudly
    // instead of nulling ids out under the cast
    val looIdType = docs.schema(idCol).dataType
    require(looIdType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }, s"classifyLoo requires an integral id column; '$idCol' is " +
      s"$looIdType — project a numeric id first")
    val counts = wordCounts(docs, labelCol, textCol).localCheckpoint(true)
    val perSrcN = counts.groupBy(col("src")).agg(sum(col("c")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizesRow = counts
      .agg(countDistinct(col("w")).as("v"), count(lit(1)).as("rows")).head()
    val (v, modelRows) = (sizesRow.getLong(0), sizesRow.getLong(1))
    require(modelRows <= maxBroadcastModelRows,
      s"classifyLoo ships raw counts to every executor; model has $modelRows" +
        s" rows > $maxBroadcastModelRows — raise the guard or sample")
    val dBySrc = docCounts(docs, labelCol).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dt = dBySrc.values.sum
    val ilg = graft.functions.IntLog2.ilog2e16 _
    val srcs = perSrcN.keys.toArray.sorted
    val srcIdx = srcs.zipWithIndex.toMap
    val nSrc = srcs.length
    val nArr = srcs.map(perSrcN)
    val dArr = srcs.map(dBySrc)
    val modelMap = new java.util.HashMap[String, Array[Long]](
      math.max(16, (modelRows / 2).toInt))
    counts.select(col("src"), col("w"), col("c")).collect().foreach { r =>
      val arr = modelMap.computeIfAbsent(r.getString(1),
        _ => new Array[Long](nSrc))
      arr(srcIdx(r.getString(0))) = r.getLong(2) // RAW counts
    }
    val bc = spark.sparkContext.broadcast(modelMap)
    val (bcSrcs, bcN, bcD, bcV, bcDt) = (srcs, nArr, dArr, v, dt)
    docs
      .select(col(idCol).cast("long"), col(labelCol).cast("string"),
        col(textCol).cast("string"))
      .as[(Long, String, String)]
      .mapPartitions { rows =>
        val model = bc.value
        val idx = bcSrcs.zipWithIndex.toMap
        // unadjusted per-word lg(c+1) vectors, memoized per partition
        // (Zipfian corpora repeat words — the q177 memo argument)
        val lgMemo = new java.util.HashMap[String, Array[Long]]()
        val ilgF = graft.functions.IntLog2.ilog2e16 _
        // dt == 1 → the lone doc's own class is excluded below and no
        // other class exists, so this value is never read
        val lgDt1 = if (bcDt > 1L) ilgF(bcDt - 1L) else 0L
        // one compiled pattern per partition (r11, VERDICT r10 #5)
        val ws = java.util.regex.Pattern.compile("\\s+")
        rows.flatMap { case (id, lbl, text) =>
          val own = idx.getOrElse(lbl, -1)
          val tf = scala.collection.mutable.HashMap.empty[String, Long]
          var nw = 0L
          ws.split(Option(text).getOrElse("")).iterator
            .filter(_.nonEmpty).foreach { w =>
              nw += 1
              tf.update(w, tf.getOrElse(w, 0L) + 1L)
            }
          val s = new Array[Long](bcSrcs.length)
          var i = 0
          while (i < s.length) {
            // prior + length terms, own-class-adjusted
            val dAdj = if (i == own) bcD(i) - 1L else bcD(i)
            val nAdj = if (i == own) bcN(i) - nw else bcN(i)
            s(i) =
              if (dAdj == 0L) Long.MinValue // excluded class sentinel
              else ilgF(dAdj) - lgDt1 - nw * ilgF(nAdj + bcV)
            i += 1
          }
          tf.foreach { case (w, f) =>
            val arr = model.get(w) // w ∈ V always (trained on docs)
            val lgArr = lgMemo.computeIfAbsent(w,
              _ => arr.map(c => ilgF(c + 1L)))
            var j = 0
            while (j < s.length) {
              if (s(j) != Long.MinValue) {
                s(j) +=
                  (if (j == own) f * ilgF(arr(j) - f + 1L) else f * lgArr(j))
              }
              j += 1
            }
          }
          var best = -1; var second = -1
          i = 0
          while (i < s.length) {
            if (s(i) != Long.MinValue) {
              if (best == -1 || s(i) > s(best)) { second = best; best = i }
              else if (second == -1 || s(i) > s(second)) second = i
            }
            i += 1
          }
          if (best == -1) Iterator.empty
          else {
            val margin = if (second == -1) 0L else s(best) - s(second)
            Iterator.single(
              (id, lbl, bcSrcs(best), s(best), margin, bcSrcs(best) == lbl))
          }
        }
      }
      .toDF(idCol, labelCol, "predicted", "score_e16", "margin_e16", "correct")
      .withColumn(idCol, col(idCol).cast(looIdType))
  }

  /** The default margin cutoffs for [[thresholdSweep]] — 0 to 32 bits
    * of decision margin in doublings, e16 fixed-point (2¹⁶ = one bit
    * of log2 evidence between the best and runner-up class). */
  val DefaultMarginCutoffsE16: Seq[Long] =
    Seq(0L, 32768L, 65536L, 131072L, 262144L, 524288L, 1048576L, 2097152L)

  /** Margin-threshold calibration sweep over a [[classify]] decision
    * table — the operating-curve artifact a deployment reads to PICK
    * the gate threshold (q194 reports precision/recall only at the
    * argmax decision; a corpus gate keeps documents whose decision
    * CONFIDENCE clears a bar, trading kept volume for precision).
    * Margin (best − runner-up, always ≥ 0) is the confidence signal —
    * absolute scores scale with document length and cannot share one
    * cutoff across documents.
    *
    * One row per cutoff: (cutoff_e16, n_kept, n_correct, keep_rate_e6,
    * precision_e6, recall_e6) where n_kept counts docs with
    * margin ≥ cutoff, n_correct the correctly-predicted among them,
    * keep_rate over ALL docs, precision over the kept, and recall
    * against ALL correctly-predicted docs (the share of good decisions
    * the gate retains). All integer arithmetic, non-negative divisions.
    *
    * ONE pass over the decision table (VERDICT r10 #2's "no
    * re-scoring"): each doc bins to the largest cutoff ≤ its margin
    * (map-side combine to ≤ cutoffs+1 rows), and the cumulative-from-
    * above rollup runs on the collected bin table — bounded like a
    * centroid list, no window over the corpus. */
  def thresholdSweep(classified: DataFrame,
                     cutoffsE16: Seq[Long] = DefaultMarginCutoffsE16): DataFrame = {
    require(cutoffsE16.nonEmpty, "thresholdSweep needs at least one cutoff")
    val cuts = cutoffsE16.distinct.sorted
    val spark = classified.sparkSession
    import spark.implicits._
    // largest cutoff index whose cutoff <= margin; -1 below the lowest
    val binExpr = cuts.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (c, i)) =>
        when(col("margin_e16") >= lit(c), lit(i)).otherwise(acc)
    }
    val bins = classified
      .groupBy(binExpr.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("correct"), 1L).otherwise(0L)).as("nc"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val total = bins.values.map(_._1).sum
    val totalCorrect = bins.values.map(_._2).sum
    // suffix sums: kept at cutoff i = every bin >= i
    val rows = cuts.indices.map { i =>
      val kept = (i until cuts.length)
        .map(j => bins.getOrElse(j, (0L, 0L))).reduce[(Long, Long)] {
          case ((a, b), (c2, d2)) => (a + c2, b + d2)
        }
      val (nKept, nCorrect) = kept
      (cuts(i), nKept, nCorrect,
        nKept * 1000000L / math.max(total, 1L),
        nCorrect * 1000000L / math.max(nKept, 1L),
        nCorrect * 1000000L / math.max(totalCorrect, 1L))
    }
    rows.toDF("cutoff_e16", "n_kept", "n_correct", "keep_rate_e6",
      "precision_e6", "recall_e6")
  }

  /** Per-class top-k evidence words — the model-explanation artifact
    * ("WHY does the gate route documents to this class"): for every
    * (class, word) the model has seen, the exact one-vs-rest log-odds
    * of the word under the same add-one/ilog2 algebra the scorer uses,
    *
    *   logodds_e16(s, w) = [lg(c_s(w)+1) − lg(N_s+|V|)]
    *                     − [lg(c_rest(w)+1) − lg(N−N_s+|V|)]
    *
    * with c_rest = Σ_{t≠s} c_t(w) — positive means w pulls documents
    * TOWARD s. Top `k` per class, (logodds desc, word asc) ties.
    * Output: (src, rank, w, c_in, c_rest, logodds_e16).
    *
    * Scale shape: the relation is the |V|·S count state (never the
    * corpus); one word-keyed total rollup + one S-bounded
    * sort_array(collect_list) top-k aggregate (the q55 argmax
    * convention — no rank window, no self-join); per-class smoothing
    * constants ride a broadcast S-row join. */
  def classEvidence(wordCountsIn: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = wordCountsIn.sparkSession
    graft.plans.GraftExtensions.ensure(spark)
    import spark.implicits._
    val counts = wordCountsIn.localCheckpoint(true)
    val perSrcN = counts.groupBy(col("src")).agg(sum(col("c")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(perSrcN.nonEmpty,
      "classEvidence: no class has any training token")
    val v = counts.agg(countDistinct(col("w"))).head().getLong(0)
    val nAll = perSrcN.values.sum
    val ilg = graft.functions.IntLog2.ilog2e16 _
    val consts = perSrcN.toSeq.sorted
      .map { case (s, n) => (s, ilg(n + v), ilg(nAll - n + v)) }
      .toDF("src", "lgnv_in", "lgnv_rest")
    val wordTot = counts.groupBy(col("w")).agg(sum(col("c")).as("tot"))
    counts
      .join(wordTot, Seq("w"))
      .join(broadcast(consts), Seq("src"))
      .select(col("src"), col("w"), col("c").as("c_in"),
        (col("tot") - col("c")).as("c_rest"),
        (lg(col("c") + 1L) - col("lgnv_in")
          - lg(col("tot") - col("c") + 1L) + col("lgnv_rest"))
          .as("logodds_e16"))
      .groupBy(col("src"))
      .agg(slice(sort_array(collect_list(struct(
        (-col("logodds_e16")).as("no"), col("w"),
        col("c_in"), col("c_rest")))), 1, k).as("top"))
      .select(col("src"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("src"), (col("pos") + 1).cast("long").as("rank"),
        col("r.w").as("w"), col("r.c_in").as("c_in"),
        col("r.c_rest").as("c_rest"),
        (-col("r.no")).as("logodds_e16"))
  }

  /** [[classReport]] off a PERSISTED decision table (r13, VERDICT r12
    * #3, the q209/q210 state-form contract): q194 re-scores the corpus
    * through the classify chain every run; a deployment reads the
    * decisions table the classify batch job (or
    * [[graft.streaming.StreamingClassify]]'s `decisions/` sink)
    * already persisted, paying only the S²-row rollup — no tokenize,
    * no model, no document scan. Decision state is keyed by doc id
    * and accumulates one append per ingest batch; a replay-idempotent
    * writer can leave EXACT duplicate rows across reads mid-replay
    * (the r11 overwrite-partition convention, read defensively) —
    * `distinct()` restores per-doc uniqueness without choosing among
    * rows, because scoring is deterministic fixed-point integer
    * algebra: duplicates are bit-identical. */
  def classReportFromState(decisions: DataFrame, labelCol: String): DataFrame =
    classReport(decisions.distinct(), labelCol)

  /** [[thresholdSweep]] off a PERSISTED decision table — same state
    * contract as [[classReportFromState]]. */
  def thresholdSweepFromState(decisions: DataFrame,
                              cutoffsE16: Seq[Long] = DefaultMarginCutoffsE16): DataFrame =
    thresholdSweep(decisions.distinct(), cutoffsE16)

  /** Per-class evaluation rollup of a [[classify]] output — the
    * classifier-eval report artifact (one row per TRUE class):
    * (label, n_docs, n_predicted, n_correct, precision_e6, recall_e6).
    * n_predicted counts docs the model ASSIGNED to the class anywhere
    * in the corpus; precision guards its zero with greatest(·,1). */
  def classReport(classified: DataFrame, labelCol: String): DataFrame = {
    // ONE pass over the decision table: the S² confusion relation is
    // tiny and both rollups (truth-side and predicted-side) derive
    // from it — without the pin the two consumers would re-execute the
    // whole scoring chain twice
    val conf = classified
      .groupBy(col(labelCol).as("label"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val truth = conf.groupBy(col("label"))
      .agg(sum(col("n")).as("n_docs"),
        sum(when(col("predicted") === col("label"), col("n")).otherwise(0L))
          .as("n_correct"))
    val pred = conf.groupBy(col("predicted").as("label"))
      .agg(sum(col("n")).as("n_predicted"))
    truth.join(pred, Seq("label"), "left")
      .select(col("label"), col("n_docs"),
        coalesce(col("n_predicted"), lit(0L)).as("n_predicted"),
        col("n_correct"),
        expr("n_correct * 1000000L div greatest(coalesce(n_predicted, 0L), 1L)")
          .as("precision_e6"),
        expr("n_correct * 1000000L div greatest(n_docs, 1L)").as("recall_e6"))
  }
}
