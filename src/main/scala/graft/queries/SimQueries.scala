package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.SimilaritySearch

/** Similarity-search query set over `embeddings` (SURVEY §2.11 M2/M3 + the
  * ANN scale path). The probe is the corpus's own vec_id=0 vector —
  * deterministic and available to the DuckDB oracle via subquery.
  *
  * sim values are emitted as exact integers (`floor(sim*1e6)`) so the hash
  * compare is immune to sub-ulp formula differences between engines.
  */
object SimQueries {

  private def probeVec(s: SparkSession, d: String): Seq[Float] =
    embeddings(s, d).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)

  // M2: cosine against the probe for every row (self excluded — J9).
  private def q40(s: SparkSession, d: String): DataFrame =
    SimilaritySearch.scoreAll(embeddings(s, d), "embedding", probeVec(s, d))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("label"), col("sim_e6"))
      .orderBy(col("vec_id"))

  // M3: threshold + top-k, ordered on the exact integer score.
  private def q41(s: SparkSession, d: String): DataFrame =
    SimilaritySearch.scoreAll(embeddings(s, d), "embedding", probeVec(s, d))
      .filter(col("vec_id") =!= 0 && col("sim_e6") > 0)
      .orderBy(col("sim_e6").desc, col("vec_id"))
      .limit(20)
      .select(col("vec_id"), col("label"), col("sim_e6"))

  // KNN-flavored rollup: per label, how many vectors clear the similarity
  // bar and their total integer score (exact arithmetic only).
  private def q42(s: SparkSession, d: String): DataFrame =
    SimilaritySearch.scoreAll(embeddings(s, d), "embedding", probeVec(s, d))
      .filter(col("vec_id") =!= 0 && col("sim_e6") >= 50000)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), sum(col("sim_e6")).as("sum_sim_e6"))
      .orderBy(col("label"))

  // ANN (LSH-bucketed) top-k — the 100 TB path; rows-only check (xxhash-
  // seeded hyperplanes have no DuckDB equivalent). ScalaTest asserts recall
  // vs brute force.
  private def q43(s: SparkSession, d: String): DataFrame =
    SimilaritySearch.annTopK(embeddings(s, d).filter(col("vec_id") =!= 0),
      "vec_id", "embedding", probeVec(s, d), k = 10,
      numPlanes = 16, maxHamming = 6)
      .select(col("vec_id"), col("label"), col("sim_e6"))
      .orderBy(col("sim_e6").desc, col("vec_id"))

  // q40 twin on the NATIVE codegen'd expression (plans/CosineSimilarity,
  // registered by GraftExtensions) — identical results by construction
  // (same sequential fold), same oracle SQL; exists to keep the native
  // kernel continuously oracle-checked and benchmarked.
  private def q58(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .withColumn("sim",
        call_function("graft_cosine", col("embedding"), typedlit(probeVec(s, d))))
      .withColumn("sim_e6", floor(col("sim") * 1e6).cast("long"))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("label"), col("sim_e6"))
      .orderBy(col("vec_id"))

  // IVF-cell ANN (rows-only): deterministic coarse quantization, probe
  // 2 of 8 cells, exact re-rank.
  private def q59(s: SparkSession, d: String): DataFrame =
    graft.operators.IvfIndex.topK(
      embeddings(s, d).filter(col("vec_id") =!= 0),
      "vec_id", "embedding", probeVec(s, d), k = 10, numCells = 8, nprobe = 2)
      .select(col("vec_id"), col("label"), col("sim_e6"))
      .orderBy(col("sim_e6").desc, col("vec_id"))

  // Embedding-cosine near-dup candidates (rows-only): LSH-bucketed
  // self-join + exact cosine verification.
  private def q60(s: SparkSession, d: String): DataFrame =
    graft.operators.Dedup.embeddingNearDup(
      embeddings(s, d), "vec_id", "embedding",
      threshold = 0.2, numPlanes = 6)
      .orderBy(col("id_a"), col("id_b"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_cosine_scores" -> q40 _,
    "q41_cosine_topk" -> q41 _,
    "q42_sim_label_rollup" -> q42 _,
    "q43_ann_lsh_topk" -> q43 _,
    "q58_cosine_native" -> q58 _,
    "q59_ivf_topk" -> q59 _,
    "q60_embedding_near_dup" -> q60 _
  )

  private val probeCte =
    "WITH probe AS (SELECT CAST(embedding AS DOUBLE[]) AS p FROM embeddings WHERE vec_id = 0), " +
      "scored AS (SELECT vec_id, label, " +
      "CAST(FLOOR(list_cosine_similarity(CAST(embedding AS DOUBLE[]), p) * 1000000.0) AS BIGINT) AS sim_e6 " +
      "FROM embeddings, probe WHERE vec_id <> 0) "

  val oracle: Map[String, String] = Map(
    "q40_cosine_scores" ->
      (probeCte + "SELECT vec_id, label, sim_e6 FROM scored ORDER BY vec_id"),
    "q41_cosine_topk" ->
      (probeCte + "SELECT vec_id, label, sim_e6 FROM scored WHERE sim_e6 > 0 " +
        "ORDER BY sim_e6 DESC, vec_id LIMIT 20"),
    "q42_sim_label_rollup" ->
      (probeCte + "SELECT label, COUNT(*) AS n, CAST(SUM(sim_e6) AS BIGINT) AS sum_sim_e6 " +
        "FROM scored WHERE sim_e6 >= 50000 GROUP BY label ORDER BY label"),
    "q58_cosine_native" ->
      (probeCte + "SELECT vec_id, label, sim_e6 FROM scored ORDER BY vec_id")
  )
}
