package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization — the 4×-compression rung of the ANN ladder
  * between raw floats and PQ codes (FAISS IndexScalarQuantizer QT_8bit
  * shape): each vector stores one byte per dimension plus one scale.
  *
  *   m      = max_i |x_i|                 (per-vector, double)
  *   code_i = clamp(floor(x_i·127/m + 0.5), -127, 127)   (half-up)
  *   scale  = m / 127                     (reconstruction factor)
  *
  * Query scoring is asymmetric-inner-product: the query quantizes ONCE,
  * candidates score with an INTEGER dot product of code arrays scaled
  * by the two reconstruction factors — `dot·scale_a·scale_b` — then an
  * exact cosine re-rank of the shortlist fixes the metric (same
  * shortlist-then-rerank contract as [[ProductQuantizer]]; the
  * shortlist is MIPS-flavored, the final answer exact cosine). Every
  * step is deterministic cross-engine: integer dot, one division per
  * scale, fixed multiply tree — floor/least/greatest are exact and the
  * IEEE ops are correctly rounded in both engines (the oracle-compat
  * ruleset; no transcendentals anywhere).
  *
  * Scale shape: quantization is row-local (one pass per vector); the
  * codes table is (id, sq_code, sq_scale) — 1 byte/dim vs 4 — bucketed
  * by id so the re-rank join co-locates; scoring is a scan of codes +
  * TakeOrderedAndProject; re-rank touches shortlist rows only. Persist
  * with [[buildSqIndex]], append with [[appendToSqIndex]] (no model to
  * train — SQ8's "model" is per-vector, so append is trivially
  * rebuild-identical).
  */
object ScalarQuantizer {

  /** Adds `sq_code` (array<tinyint>) and `sq_scale` (double). Zero
    * vectors quantize to all-zero codes with scale 0 (they score 0
    * against everything — same as their true inner product). Caller
    * contract: finite components (a NaN/Inf would poison the max-abs
    * scale — same contract as every cosine path in the engine). */
  def quantize(df: DataFrame, vecCol: String): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val m = array_max(transform(v, x => abs(x)))
    df
      .withColumn("__m", m)
      .withColumn("sq_code",
        when(col("__m") === 0.0 || col("__m").isNull,
          transform(v, _ => lit(0).cast("byte")))
          .otherwise(transform(v, x =>
            greatest(lit(-127L), least(lit(127L),
              floor(x * lit(127.0) / col("__m") + lit(0.5))))
              .cast("byte"))))
      .withColumn("sq_scale", col("__m") / lit(127.0))
      .drop("__m")
  }

  /** Driver-side query quantization — same arithmetic as [[quantize]]. */
  def quantizeQuery(q: Seq[Float]): (Seq[Byte], Double) = {
    val m = q.map(x => math.abs(x.toDouble)).foldLeft(0.0)(math.max)
    if (m == 0.0) (q.map(_ => 0.toByte), 0.0)
    else (q.map { x =>
      val c = math.floor(x.toDouble * 127.0 / m + 0.5)
      math.max(-127.0, math.min(127.0, c)).toByte
    }, m / 127.0)
  }

  /** Integer code dot product (exact) — the ADC hot loop. */
  private def codeDot(codes: Column, qCodes: Seq[Byte]): Column =
    aggregate(
      zip_with(codes, typedlit(qCodes.map(_.toLong)),
        (a, b) => a.cast("long") * b),
      lit(0L), (acc, x) => acc + x)

  /** SQ8 shortlist + exact cosine re-rank. Output (idCol, payload...,
    * sim_e6) — the q41/q59 result convention. */
  def sqRerankTopK(df: DataFrame, idCol: String, vecCol: String,
                   query: Seq[Float], shortlist: Int, k: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k=$k")
    val quantized = quantize(df, vecCol)
    rerank(df, shortlistOf(quantized, idCol, query, shortlist),
      idCol, vecCol, query, k)
  }

  /** The MIPS shortlist from a quantized/codes table: rank by
    * `dot·scale_a·scale_b` descending (fixed multiply tree), tie by id. */
  private def shortlistOf(codes: DataFrame, idCol: String,
                          query: Seq[Float], shortlist: Int): DataFrame = {
    val (qc, qs) = quantizeQuery(query)
    codes
      .withColumn("__score",
        codeDot(col("sq_code"), qc).cast("double") * col("sq_scale") * lit(qs))
      .orderBy(col("__score").desc, col(idCol).asc)
      .limit(shortlist)
      .select(col(idCol))
  }

  /** Exact cosine re-rank of shortlist ids against the vector table. */
  private def rerank(vectors: DataFrame, short: DataFrame,
                     idCol: String, vecCol: String,
                     query: Seq[Float], k: Int): DataFrame = {
    vectors
      .join(short, Seq(idCol))
      .withColumn("sim",
        call_function("graft_cosine", col(vecCol), typedlit(query)))
      .filter(col("sim") > 0)
      .withColumn("sim_e6", floor(col("sim") * 1e6).cast("long"))
      .orderBy(col("sim_e6").desc, col(idCol).asc)
      .limit(k)
      .drop("sim", vecCol)
  }

  /** Persist the SQ8 index: (idCol, sq_code, sq_scale) bucketed by id —
    * 1 byte/dim + 8; raw vectors stay in the source table for re-rank. */
  def buildSqIndex(df: DataFrame, idCol: String, vecCol: String,
                   table: String, buckets: Int = 8): Unit =
    graft.etl.Warehouse.writeBucketed(
      quantize(df, vecCol).select(col(idCol), col("sq_code"), col("sq_scale")),
      table, idCol, buckets)

  /** Incremental maintenance — SQ8 has no trained model (scales are
    * per-vector), so append is rebuild-identical by construction. */
  def appendToSqIndex(spark: org.apache.spark.sql.SparkSession, table: String,
                      newRows: DataFrame, idCol: String, vecCol: String,
                      buckets: Int = 8): Unit =
    graft.etl.Warehouse.writeBucketed(
      quantize(newRows, vecCol).select(col(idCol), col("sq_code"), col("sq_scale")),
      table, idCol, buckets,
      mode = org.apache.spark.sql.SaveMode.Append)

  /** Shortlist + re-rank over the PERSISTED codes (no re-quantize). */
  def sqRerankTopKIndexed(spark: org.apache.spark.sql.SparkSession,
                          table: String, vectors: DataFrame,
                          idCol: String, vecCol: String,
                          query: Seq[Float], shortlist: Int, k: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k=$k")
    rerank(vectors, shortlistOf(spark.table(table), idCol, query, shortlist),
      idCol, vecCol, query, k)
  }
}
