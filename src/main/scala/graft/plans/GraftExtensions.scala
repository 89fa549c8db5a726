package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions registering graft's native expressions with the
  * Catalyst function registry (activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions`).
  *
  * Only genuinely-custom kernels live here (SURVEY §7.3: everything else
  * in the surface is stock Catalyst); currently `graft_cosine`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineEntry)
    ext.injectFunction(GraftExtensions.md5Entry)
    ext.injectFunction(GraftExtensions.winnowEntry)
    ext.injectFunction(GraftExtensions.minHashEntry)
    ext.injectFunction(GraftExtensions.simHashEntry)
    ext.injectFunction(GraftExtensions.shingleCountEntry)
    ext.injectFunction(GraftExtensions.textMetricsEntry)
    ext.injectFunction(GraftExtensions.repetitionEntry)
    ext.injectFunction(GraftExtensions.shinglesEntry)
    ext.injectFunction(GraftExtensions.tokensEntry)
    ext.injectFunction(GraftExtensions.shingleHashesEntry)
    ext.injectFunction(GraftExtensions.jsonLongEntry)
    ext.injectFunction(GraftExtensions.keywordCountsEntry)
    ext.injectFunction(GraftExtensions.argmaxCosineEntry)
    ext.injectFunction(GraftExtensions.bloomAggEntry)
    ext.injectFunction(GraftExtensions.bloomContainsEntry)
    ext.injectFunction(GraftExtensions.cmsEstimateEntry)
    ext.injectFunction(GraftExtensions.argminL2Entry)
    ext.injectFunction(GraftExtensions.tsNanosEntry)
    ext.injectFunction(GraftExtensions.topKEntry)
    ext.injectFunction(GraftExtensions.freqStatsEntry)
    ext.injectFunction(GraftExtensions.blocklistEntry)
    ext.injectFunction(GraftExtensions.cdcChunksEntry)
    ext.injectFunction(GraftExtensions.ilog2Entry)
    ext.injectFunction(GraftExtensions.charEntropyEntry)
  }
}

object GraftExtensions {

  private[graft] val cosineEntry = (
    new FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_cosine(a, b) takes two array arguments")
      CosineSimilarity(children.head, children(1)): Expression
    })

  private[graft] val md5Entry = (
    new FunctionIdentifier("graft_md5"),
    new ExpressionInfo(classOf[GraftMd5].getName, "graft_md5"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_md5(x) takes one argument")
      GraftMd5(children.head): Expression
    })

  private[graft] val winnowEntry = (
    new FunctionIdentifier("graft_winnow"),
    new ExpressionInfo(classOf[GraftWinnow].getName, "graft_winnow"),
    (children: Seq[Expression]) => {
      require(children.size == 3, "graft_winnow(text, k, w) takes three arguments")
      GraftWinnow(children(0), children(1), children(2)): Expression
    })

  private[graft] val minHashEntry = (
    new FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[GraftMinHash].getName, "graft_minhash"),
    (children: Seq[Expression]) => {
      require(children.size == 3,
        "graft_minhash(normText, numPerms, n) takes three arguments")
      GraftMinHash(children(0), children(1), children(2)): Expression
    })

  private[graft] val simHashEntry = (
    new FunctionIdentifier("graft_simhash"),
    new ExpressionInfo(classOf[GraftSimHash].getName, "graft_simhash"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_simhash(normText) takes one argument")
      GraftSimHash(children.head): Expression
    })

  private[graft] val shingleCountEntry = (
    new FunctionIdentifier("graft_shingle_count"),
    new ExpressionInfo(classOf[GraftShingleCount].getName, "graft_shingle_count"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_shingle_count(text, n) takes two arguments")
      GraftShingleCount(children(0), children(1)): Expression
    })

  private[graft] val textMetricsEntry = (
    new FunctionIdentifier("graft_text_metrics"),
    new ExpressionInfo(classOf[GraftTextMetrics].getName, "graft_text_metrics"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_text_metrics(text) takes one argument")
      GraftTextMetrics(children.head): Expression
    })

  private[graft] val repetitionEntry = (
    new FunctionIdentifier("graft_repetition"),
    new ExpressionInfo(classOf[GraftRepetition].getName, "graft_repetition"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_repetition(text) takes one argument")
      GraftRepetition(children.head): Expression
    })


  private[graft] val ilog2Entry = (
    new FunctionIdentifier("graft_ilog2_e16"),
    new ExpressionInfo(classOf[GraftIlog2].getName, "graft_ilog2_e16"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_ilog2_e16(x) takes one argument")
      GraftIlog2(children.head): Expression
    })

  private[graft] val charEntropyEntry = (
    new FunctionIdentifier("graft_char_entropy"),
    new ExpressionInfo(classOf[GraftCharEntropy].getName, "graft_char_entropy"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_char_entropy(text) takes one argument")
      GraftCharEntropy(children.head): Expression
    })

  private[graft] val cdcChunksEntry = (
    new FunctionIdentifier("graft_cdc_chunks"),
    new ExpressionInfo(classOf[GraftCdcChunks].getName, "graft_cdc_chunks"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_cdc_chunks(text, w) takes two arguments")
      GraftCdcChunks(children(0), children(1)): Expression
    })

  private[graft] val shinglesEntry = (
    new FunctionIdentifier("graft_shingles"),
    new ExpressionInfo(classOf[GraftShingles].getName, "graft_shingles"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_shingles(text, n) takes two arguments")
      GraftShingles(children(0), children(1)): Expression
    })

  private[graft] val tokensEntry = (
    new FunctionIdentifier("graft_tokens"),
    new ExpressionInfo(classOf[GraftTokens].getName, "graft_tokens"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_tokens(text) takes one argument")
      GraftTokens(children.head): Expression
    })

  private[graft] val shingleHashesEntry = (
    new FunctionIdentifier("graft_shingle_hashes"),
    new ExpressionInfo(classOf[GraftShingleHashes].getName, "graft_shingle_hashes"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_shingle_hashes(text, n) takes two arguments")
      GraftShingleHashes(children(0), children(1)): Expression
    })

  private[graft] val jsonLongEntry = (
    new FunctionIdentifier("graft_json_long"),
    new ExpressionInfo(classOf[GraftJsonLong].getName, "graft_json_long"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "graft_json_long(json, field) takes two arguments")
      GraftJsonLong(children(0), children(1)): Expression
    })

  private[graft] val keywordCountsEntry = (
    new FunctionIdentifier("graft_keyword_counts"),
    new ExpressionInfo(classOf[GraftKeywordCounts].getName, "graft_keyword_counts"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        "graft_keyword_counts(text, vocabularies) takes two arguments")
      GraftKeywordCounts(children(0), children(1)): Expression
    })

  private[graft] val argmaxCosineEntry = (
    new FunctionIdentifier("graft_argmax_cosine"),
    new ExpressionInfo(classOf[GraftArgmaxCosine].getName, "graft_argmax_cosine"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        "graft_argmax_cosine(vec, centroids) takes two arguments")
      GraftArgmaxCosine(children(0), children(1)): Expression
    })

  // Spark's own runtime-filter bloom pair, surfaced as functions: the
  // aggregate builds the sketch DISTRIBUTED (per-partition bitmaps
  // OR-merged), the probe is a codegen'd bit test. Keys are xxhash64'd
  // on both sides so build and probe hashing always agree.
  private[graft] val bloomAggEntry = (
    new FunctionIdentifier("graft_bloom_agg"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
      "graft_bloom_agg"),
    (children: Seq[Expression]) => {
      require(children.size == 3,
        "graft_bloom_agg(key, expectedItems, numBits) takes three arguments")
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(children(0))),
        children(1), children(2)): Expression
    })

  private[graft] val bloomContainsEntry = (
    new FunctionIdentifier("graft_bloom_contains"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
      "graft_bloom_contains"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        "graft_bloom_contains(bloom, key) takes two arguments")
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        children(0),
        new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(children(1)))): Expression
    })

  private[graft] val cmsEstimateEntry = (
    new FunctionIdentifier("graft_cms_estimate"),
    new ExpressionInfo(classOf[GraftCmsEstimate].getName, "graft_cms_estimate"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        "graft_cms_estimate(sketch, key) takes two arguments")
      GraftCmsEstimate(children(0), children(1)): Expression
    })

  private[graft] val argminL2Entry = (
    new FunctionIdentifier("graft_argmin_l2"),
    new ExpressionInfo(classOf[GraftArgminL2].getName, "graft_argmin_l2"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        "graft_argmin_l2(vec, centroids) takes two arguments")
      GraftArgminL2(children(0), children(1)): Expression
    })

  // Spark's internal bounded-priority-queue collector (the ML
  // recommend-for-all top-k), surfaced as a function: a
  // TypedImperativeAggregate, so ObjectHashAggregate partial-merges the
  // k-bounded heap map-side — the grouped top-k that replaces the
  // window row_number's full shuffle+sort (see operators/TopK).
  private[graft] val topKEntry = (
    new FunctionIdentifier("graft_collect_top_k"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK].getName,
      "graft_collect_top_k"),
    (children: Seq[Expression]) => {
      require(children.size == 3,
        "graft_collect_top_k(expr, k, reverse) takes three arguments")
      new org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK(
        children(0), children(1), children(2)): Expression
    })

  private[graft] val freqStatsEntry = (
    new FunctionIdentifier("graft_freq_stats"),
    new ExpressionInfo(classOf[GraftFreqStats].getName, "graft_freq_stats"),
    (children: Seq[Expression]) => {
      require(children.size == 3,
        "graft_freq_stats(fs, total, madK) takes three arguments")
      GraftFreqStats(children(0), children(1), children(2)): Expression
    })

  private[graft] val blocklistEntry = (
    new FunctionIdentifier("graft_blocklist"),
    new ExpressionInfo(classOf[GraftBlocklist].getName, "graft_blocklist"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        "graft_blocklist(text, patterns) takes two arguments")
      GraftBlocklist(children(0), children(1)): Expression
    })

  private[graft] val tsNanosEntry = (
    new FunctionIdentifier("graft_ts_nanos"),
    new ExpressionInfo(classOf[GraftTsNanos].getName, "graft_ts_nanos"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "graft_ts_nanos(ts) takes one argument")
      GraftTsNanos(children.head): Expression
    })

  /** Imperative fallback: register graft functions on a session that was
    * built without `spark.sql.extensions` (e.g. a host application's own
    * session handed to SparkEntry). Idempotent. */
  def ensure(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // repetitionEntry was absent from this list through r9 (apply() had
    // it, so extension-built sessions never noticed) — a host session
    // registering via ensure() alone would have missed graft_repetition.
    Seq(cosineEntry, md5Entry, winnowEntry, minHashEntry, simHashEntry,
      shingleCountEntry, textMetricsEntry, repetitionEntry, shinglesEntry,
      tokensEntry, shingleHashesEntry, jsonLongEntry,
      keywordCountsEntry, argmaxCosineEntry, bloomAggEntry,
      bloomContainsEntry, cmsEstimateEntry, argminL2Entry,
      tsNanosEntry, topKEntry, freqStatsEntry, blocklistEntry,
      cdcChunksEntry, ilog2Entry, charEntropyEntry).foreach { e =>
      if (!reg.functionExists(e._1)) {
        reg.registerFunction(e._1, e._2, e._3)
      }
    }
  }
}
