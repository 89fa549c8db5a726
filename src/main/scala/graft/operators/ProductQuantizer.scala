package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the memory-compression rung of the ANN
  * ladder (brute → LSH → IVF → PQ): split each d-dim embedding into M
  * contiguous subvectors, k-means each subspace independently, and store
  * every vector as M small codes. A 64-dim float vector (256 B) becomes
  * M=4 bytes-ish of codes; at 10^10 vectors that is the difference
  * between an in-memory index and none.
  *
  * Query-time ADC (asymmetric distance): the query stays UNquantized —
  * per subspace, a k-entry table of exact distances query-subvector →
  * centroid is computed once on the driver, and each row's approximate
  * distance is M table lookups + a sum, codegen'd over broadcast
  * literals. The scan never touches the original vectors.
  *
  * Everything rides [[KMeans]]' integer determinism: floats quantize
  * once via floor(x·2²⁰), codebooks train in exact integer Lloyd
  * (subspace-sliced), ADC distances are integer squared-L2 — so the
  * DuckDB oracle replays codebook training, encoding, AND the ADC
  * ranking bit-for-bit (q132). Recall vs exact brute force is pinned in
  * ProductQuantizerSpec; exactness of the ARITHMETIC is the oracle's
  * job, approximation quality is the spec's.
  *
  * Scale shape: training = M × KMeans.fit (driver traffic O(M·k·subDim)
  * per iteration); encoding = M row-local codegen'd argmin kernels over
  * broadcast codebooks; ADC = row-local lookups + `TakeOrderedAndProject`
  * global top-k (per-partition heads, no full sort).
  */
object ProductQuantizer {

  /** [m][cell] → centroid (quantized longs, length subDim). */
  final case class Model(m: Int, subDim: Int, codebooks: Array[Array[Seq[Long]]])

  def fit(df: DataFrame, idCol: String, vecCol: String,
          m: Int, k: Int, iters: Int): Model = {
    val d = df.select(size(col(vecCol)).as("d")).head().getInt(0)
    require(m >= 1 && d % m == 0, s"dim $d not divisible into $m subspaces")
    val sub = d / m
    // The m sub-quantizers are independent (PQ's defining property), so
    // their Lloyd jobs run CONCURRENTLY — each fit's assignment jobs are
    // small (one slice of the corpus), and sequential fits left most of
    // the scheduler idle. Results are deterministic regardless of
    // scheduling (each fit is a pure function of its slice); measured
    // at sf0.1: x132 train 2.6 -> see BASELINE r8.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    // Bounded await (r8 VERDICT): Duration.Inf hung forever if a Lloyd
    // job was interrupted; an hour is far beyond any real fit (sf0.1
    // trains in seconds, and the fits are sample-bound at scale) so a
    // timeout here only ever fires on a genuinely wedged job.
    val books = Await.result(
      Future.sequence((0 until m).map { i =>
        Future(KMeans.fit(
          df.withColumn("__sub", slice(col(vecCol), i * sub + 1, sub)),
          idCol, "__sub", k, iters, "__pqc")._2)
      }), 1.hour).toArray
    Model(m, sub, books)
  }

  /** Adds `pq_code` (array<int>, length m): per subspace, the nearest
    * codebook cell by the same argmin-L2 kernel k-means assignment uses. */
  def encode(df: DataFrame, vecCol: String, model: Model): DataFrame = {
    val codes = (0 until model.m).map { i =>
      call_function("graft_argmin_l2",
        KMeans.quantize(slice(col(vecCol), i * model.subDim + 1, model.subDim)),
        typedlit(model.codebooks(i).toSeq))
    }
    df.withColumn("pq_code", array(codes: _*))
  }

  /** Driver-side exact integer sqDist between quantized subvectors. */
  private def sqDistLong(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => val z = x - y; z * z }.sum

  /** Quantize a raw float query exactly as [[KMeans.quantize]] does. */
  def quantizeQuery(q: Seq[Float]): Seq[Long] =
    q.map(x => math.floor(x.toDouble * KMeans.Scale).toLong)

  /** ADC top-k: approximate distance = Σ_m table_m[code_m], where
    * table_m holds the exact distances query-subvector → every centroid
    * of subspace m. Ties break on `idCol`. Input must carry `pq_code`. */
  def adcTopK(encoded: DataFrame, idCol: String, model: Model,
              query: Seq[Float], k: Int): DataFrame = {
    val qv = quantizeQuery(query)
    require(qv.length == model.m * model.subDim,
      s"query dim ${qv.length} != ${model.m * model.subDim}")
    val tables = (0 until model.m).map { i =>
      val qSub = qv.slice(i * model.subDim, (i + 1) * model.subDim)
      model.codebooks(i).map(c => sqDistLong(qSub, c)).toSeq
    }
    val dist = (0 until model.m)
      .map(i => element_at(typedlit(tables(i)),
        element_at(col("pq_code"), i + 1) + 1))
      .reduce(_ + _)
    encoded
      .withColumn("adc_dist", dist)
      .orderBy(col("adc_dist").asc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("adc_dist"))
  }

  /** The production PQ query path: ADC shortlist of `shortlist`
    * candidates (codes only — the scan never touches vectors), then an
    * exact integer re-rank of just the shortlist against the full query.
    * On the synthetic sf0.01 embeddings (mostly unclustered — PQ's
    * hardest case) measured recall@10 vs exact search: ADC alone
    * 0.38-0.44, rerank@50 0.80-0.82, rerank@100 0.88-0.92 at m=8, k=64
    * (ProductQuantizerSpec pins conservative floors). The re-rank join
    * touches `shortlist` rows — at 10^10 vectors the full-vector read is
    * per-candidate random access, not a scan.
    */
  def adcRerankTopK(encoded: DataFrame, idCol: String, vecCol: String,
                    model: Model, query: Seq[Float],
                    shortlist: Int, k: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k=$k")
    rerank(encoded, adcTopK(encoded, idCol, model, query, shortlist),
      idCol, vecCol, query, k)
  }

  /** Exact integer re-rank of a shortlist against the full query: joins
    * the id-only shortlist back to a table carrying the raw vectors —
    * at 10^10 vectors a per-candidate random access, never a scan. */
  private[operators] def rerank(vectors: DataFrame, short: DataFrame,
                                idCol: String, vecCol: String,
                                query: Seq[Float], k: Int): DataFrame = {
    val qv = quantizeQuery(query)
    vectors.select(col(idCol), col(vecCol))
      .join(short.select(col(idCol)), Seq(idCol))
      .withColumn("exact_dist",
        KMeans.sqDist(KMeans.quantize(col(vecCol)), typedlit(qv)))
      .orderBy(col("exact_dist").asc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("exact_dist"))
  }

  // ---- persisted index (VERDICT r5 item 5) -----------------------------

  /** Persist the PQ index: the CODES table — (idCol, pq_code) ONLY, no
    * vectors, because at 10^10 vectors the m-byte codes ARE the index
    * while the 256 B raw vectors stay in the source table for
    * per-candidate re-rank access — plus a `<table>_codebooks` sidecar
    * (m_idx, cell, centroid). Codes are bucketed by id so the re-rank
    * join co-locates with an id-bucketed source table. Training and
    * encoding run ONCE here; [[adcTopKIndexed]] never re-runs either. */
  def buildPqIndex(df: DataFrame, idCol: String, vecCol: String, table: String,
                   m: Int, k: Int, iters: Int, buckets: Int = 8): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    val model = fit(df, idCol, vecCol, m, k, iters)
    (0 until model.m).flatMap(i => model.codebooks(i).zipWithIndex.map {
      case (c, cell) => (i, cell, c)
    }).toDF("m_idx", "cell", "centroid")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet").saveAsTable(table + "_codebooks")
    graft.etl.Warehouse.writeBucketed(
      encode(df, vecCol, model).select(col(idCol), col("pq_code")),
      table, idCol, buckets)
    model
  }

  /** Rehydrate a persisted model from the `<table>_codebooks` sidecar —
    * an O(m·k·subDim) driver read, like the IVF centroid sidecar. */
  def loadModel(spark: org.apache.spark.sql.SparkSession, table: String): Model = {
    val rows = spark.table(table + "_codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2)))
    val m = rows.map(_._1).max + 1
    val books = (0 until m).map { i =>
      rows.filter(_._1 == i).sortBy(_._2).map(_._3: Seq[Long])
    }.toArray
    require(books.forall(_.length == books(0).length),
      s"codebook sidecar for '$table' is ragged across subspaces")
    Model(m, books(0)(0).length, books)
  }

  /** Incremental codes maintenance: encode NEW vectors with the
    * PERSISTED codebooks and append to the codes table — no retrain
    * (codebooks refit on operator schedule; FAISS IndexPQ.add
    * semantics). Appended codes are bit-identical to what a rebuild
    * with the same model would produce (IndexAppendSpec). */
  def appendToIndex(spark: org.apache.spark.sql.SparkSession, table: String,
                    newRows: DataFrame, idCol: String, vecCol: String,
                    buckets: Int = 8): Unit = {
    val model = loadModel(spark, table)
    graft.etl.Warehouse.writeBucketed(
      encode(newRows, vecCol, model).select(col(idCol), col("pq_code")),
      table, idCol, buckets,
      mode = org.apache.spark.sql.SaveMode.Append)
  }

  /** ADC top-k over the persisted codes table: no training, no encode —
    * the scan reads (id, pq_code) and does m lookups + a sum per row.
    * PersistedPqIndexSpec asserts the plan carries zero argmin kernels. */
  def adcTopKIndexed(spark: org.apache.spark.sql.SparkSession, table: String,
                     idCol: String, query: Seq[Float], k: Int): DataFrame =
    adcTopK(spark.table(table), idCol, loadModel(spark, table), query, k)

  /** Indexed ADC shortlist + exact re-rank against the caller's vector
    * table (the source table the codes were built from). */
  def adcRerankTopKIndexed(spark: org.apache.spark.sql.SparkSession,
                           table: String, vectors: DataFrame,
                           idCol: String, vecCol: String, query: Seq[Float],
                           shortlist: Int, k: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k=$k")
    val model = loadModel(spark, table)
    rerank(vectors, adcTopK(spark.table(table), idCol, model, query, shortlist),
      idCol, vecCol, query, k)
  }
}
