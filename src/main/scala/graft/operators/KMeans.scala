package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means over an embedding column, in EXACT
  * integer arithmetic so the DuckDB oracle replays every iteration
  * bit-identically (the q88 PageRank strategy applied to clustering).
  *
  * Purpose (SemDeDup, Abbas et al. 2023, arXiv:2303.09540): k-means is
  * the blocking stage of semantic dedup — cluster the corpus, then
  * compare pairs only WITHIN clusters, turning the O(N²) corpus-wide
  * sweep into O(Σ n_c²) with k chosen so n_c ≈ N/k stays bounded.
  *
  * Determinism strategy:
  *  - floats are quantized once via floor(x·2²⁰): a float widens to
  *    double exactly, scaling by a power of two only shifts the
  *    exponent (no rounding), and floor lands on a long — identical in
  *    any IEEE-754 engine;
  *  - distances are squared-L2 over the quantized longs (integer sums,
  *    order-free);
  *  - centroid updates are exact floor division sum/count
  *    (`Math.floorDiv`; the oracle mirrors with the %/`//` identity);
  *  - seeds are the k rows with smallest (md5(id), id) — the IvfIndex
  *    idiom, identical in both engines;
  *  - argmin ties break to the lowest cell id (array_position takes
  *    the first occurrence; the oracle sorts by (dist, cell)).
  *
  * Scale shape: assignment is row-local over a broadcast k×d literal
  * (the data never moves); each update is ONE map-side-combined
  * aggregate producing k rows of d+1 longs collected to the driver —
  * per-iteration driver traffic is O(k·d), independent of corpus size.
  * Overflow headroom: |component| ≤ 2²⁰ padded to 2²¹, so per-dim sums
  * stay in-long up to ~2⁴² rows per cluster.
  */
object KMeans {

  /** 2²⁰ — power of two so `x * Scale` is exact for every float x. */
  val Scale = 1048576.0

  /** Array[Float] → Array[Long] via floor(x·2²⁰); exact cross-engine. */
  def quantize(vecCol: Column): Column =
    transform(vecCol.cast("array<double>"), x => floor(x * lit(Scale)))

  /** Squared L2 distance between two quantized (long) vectors. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)

  /** Deterministic seeds: quantized vectors of the k rows with smallest
    * (md5(id-as-string), id) — a uniform pseudo-random pick both engines
    * compute identically. */
  def seeds(df: DataFrame, idCol: String, vecCol: String, k: Int): Array[Seq[Long]] = {
    val picked = df
      .select(quantize(col(vecCol)).as("__v"),
        md5(col(idCol).cast("string")).as("__h"), col(idCol).as("__id"))
      .orderBy(col("__h"), col("__id"))
      .limit(k)
      .collect()
      .map(_.getSeq[Long](0))
    require(picked.length == k, s"corpus has only ${picked.length} rows for k=$k seeds")
    picked
  }

  /** Nearest-centroid assignment: one row-local argmin over the
    * broadcast k×d literal via the codegen'd `graft_argmin_l2` kernel;
    * ties take the lowest cell id. Input must carry the quantized vector
    * as `__v`; adds `cellCol`. [[assignHof]] is the declarative twin the
    * spec pins the kernel against. */
  def assign(quantized: DataFrame, cents: Array[Seq[Long]],
             cellCol: String = "cluster_id"): DataFrame =
    quantized.withColumn(cellCol,
      call_function("graft_argmin_l2", col("__v"), typedlit(cents.toSeq)))

  /** HOF twin of [[assign]] (interpreted — `transform`/`zip_with`/
    * `aggregate` fall out of codegen; measured ~96 µs/row at k=8, d=64
    * vs the kernel's loop). Kept as the parity oracle for KMeansSpec. */
  def assignHof(quantized: DataFrame, cents: Array[Seq[Long]],
                cellCol: String = "cluster_id"): DataFrame = {
    val cl = typedlit(cents.toSeq)
    quantized
      .withColumn("__dists", transform(cl, c => sqDist(col("__v"), c)))
      .withColumn(cellCol,
        (array_position(col("__dists"), array_min(col("__dists"))) - 1).cast("int"))
      .drop("__dists")
  }

  /** Run `iters` full Lloyd iterations (assign → exact-floor-div
    * update, empty cells carry their previous centroid) then a final
    * assignment. Returns (input + `__v` + `cellCol`, final centroids).
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int,
          cellCol: String = "cluster_id"): (DataFrame, Array[Seq[Long]]) = {
    require(k >= 1 && iters >= 0, s"need k>=1, iters>=0 (got k=$k iters=$iters)")
    var cents = seeds(df, idCol, vecCol, k)
    val d = cents.head.length
    val base = df.withColumn("__v", quantize(col(vecCol)))
    for (_ <- 1 to iters) {
      val assigned = assign(base, cents, "__cell")
      val aggCols = count(lit(1)).as("__n") +:
        (0 until d).map(i => sum(element_at(col("__v"), i + 1)).as(s"__s$i"))
      val rows = assigned.groupBy(col("__cell"))
        .agg(aggCols.head, aggCols.tail: _*)
        .collect()
      val updated = rows.map { r =>
        val n = r.getLong(1)
        r.getInt(0) -> (0 until d).map(j => Math.floorDiv(r.getLong(j + 2), n))
      }.toMap
      cents = cents.indices.map(i => updated.getOrElse(i, cents(i))).toArray
    }
    (assign(base, cents, cellCol), cents)
  }
}
