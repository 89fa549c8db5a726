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

  // the probe rides a broadcast cross join (scoreAllVs) — an eager
  // head() fetch pays a whole job floor for one row
  private def probeRow(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).filter(col("vec_id") === 0)

  // M2: cosine against the probe for every row (self excluded — J9).
  private def q40(s: SparkSession, d: String): DataFrame =
    SimilaritySearch.scoreAllVs(embeddings(s, d), "embedding",
        probeRow(s, d), "embedding")
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("label"), col("sim_e6"))
      .orderBy(col("vec_id"))

  // M3: threshold + top-k, ordered on the exact integer score.
  private def q41(s: SparkSession, d: String): DataFrame =
    SimilaritySearch.scoreAllVs(embeddings(s, d), "embedding",
        probeRow(s, d), "embedding")
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

  // ANN (LSH-bucketed) top-k — the 100 TB path. Oracle-checked: the
  // splitmix hyperplanes are pure and deterministic, so the oracle embeds
  // them as DOUBLE[] literals and re-derives every signature bit via
  // list_cosine_similarity (bit-identical to graft_cosine — sign of the
  // cosine is the sign of the dot product). ScalaTest asserts recall vs
  // brute force.
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

  // IVF-cell ANN (oracle-checked): deterministic md5-keyed coarse
  // quantization, probe 2 of 8 cells, exact re-rank.
  private def q59(s: SparkSession, d: String): DataFrame =
    graft.operators.IvfIndex.topK(
      embeddings(s, d).filter(col("vec_id") =!= 0),
      "vec_id", "embedding", probeVec(s, d), k = 10, numCells = 8, nprobe = 2)
      .select(col("vec_id"), col("label"), col("sim_e6"))
      .orderBy(col("sim_e6").desc, col("vec_id"))

  // ANN recall curve (r10): recall@10 of the IVF probe path against the
  // exact scan, per nprobe ∈ {1,2,4,8} — "measure, don't guess" applied
  // to the engine's own ANN ladder: the number a deployment reads off
  // to pick its speed/recall point. Everything is deterministic (the
  // md5-keyed centroid rule + integer tie orders), so the WHOLE curve
  // is one oracle hash — the DuckDB twin re-derives exact top-10 and
  // all four probe paths from first principles. The exact leg is
  // computed once and pinned (five consumers).
  private def q192(s: SparkSession, d: String): DataFrame = {
    val corpus = embeddings(s, d).filter(col("vec_id") =!= 0)
    val p = probeVec(s, d)
    val exact = SimilaritySearch.scoreAll(corpus, "embedding", p)
      .filter(col("sim_e6") > 0)
      .orderBy(col("sim_e6").desc, col("vec_id")).limit(10)
      .select(col("vec_id"))
      .localCheckpoint(true)
    val nExact = exact.agg(count(lit(1)).as("n_exact"))
    // r13: the centroid table is a function of the corpus alone — compute
    // its driver collect ONCE and share it across the four probe points
    // (IvfIndex.topK used to re-run the centroid-selection job per call:
    // 4 identical sort+limit jobs for one curve). Same cents → same cell
    // ranking → identical rows.
    val cents = graft.operators.IvfIndex.centroids(corpus, "vec_id", "embedding", 8)
    Seq(1, 2, 4, 8).map { np =>
      graft.operators.IvfIndex.topKWithCentroids(corpus, "vec_id", "embedding", p,
          k = 10, cents, nprobe = np)
        .select(col("vec_id"))
        .join(exact, Seq("vec_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(np.toLong).as("nprobe"), col("n_hits"))
    }.reduce(_ unionByName _)
      .crossJoin(broadcast(nExact))
      .select(col("nprobe"), col("n_hits"),
        expr("(n_hits * 1000000L) div greatest(n_exact, 1L)").as("recall_e6"))
      .orderBy(col("nprobe"))
  }

  // Embedding-cosine near-dup candidates (oracle-checked): LSH-bucketed
  // self-join + exact cosine verification. dim=64 is the fixture embedding
  // width (TESTDATA.md) — passed explicitly so no driver round-trip sniffs
  // it per run.
  private def q60(s: SparkSession, d: String): DataFrame =
    graft.operators.Dedup.embeddingNearDup(
      embeddings(s, d), "vec_id", "embedding",
      threshold = 0.2, numPlanes = 6, dim = EmbeddingDim)
      .orderBy(col("id_a"), col("id_b"))

  // Batch ANN (the serving/join shape — many probes in one plan):
  // vec_id % 100 == 0 rows are the probe batch, the rest the corpus;
  // per probe, its nprobe=2 IVF cells and exact top-10 inside them.
  // One cell-keyed join + the bounded-heap grouped top-k; no per-probe
  // driver round-trips (IvfIndex.topKBatch scaladoc).
  private def q141(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val probes = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pvec"))
    val corpus = emb.filter(col("vec_id") % 100 =!= 0)
    graft.operators.IvfIndex.topKBatch(
      corpus, "vec_id", "embedding", probes, "probe_id", "pvec",
      k = 10, numCells = 8, nprobe = 2)
      .select(col("probe_id"), col("rank"), col("vec_id"), col("label"),
        col("sim_e6"))
  }

  // MMR diversified re-rank (r9): top-8 of the 20-row relevance
  // shortlist, greedily trading probe relevance against redundancy with
  // the already-picked set (λ = 1/2 as the exact integer rel_e6 −
  // maxsim_e6). The corpus scan + shortlist are distributed; the greedy
  // loop is driver-bounded at m like PQ codebooks; every cosine stays
  // in the graft_cosine kernel. Oracle: the greedy unrolled as 8
  // chained CTE steps (the q154 convention).
  private def q178(s: SparkSession, d: String): DataFrame =
    graft.operators.SimilaritySearch.mmrRerank(
      embeddings(s, d).filter(col("vec_id") =!= 0), "vec_id", "embedding",
      probeRow(s, d), "embedding", m = 20, k = 8)
      .orderBy(col("rank"))

  // Incremental embedding near-dup (r10): the EMBEDDING rung closes
  // the incremental dedup ladder's last modality (text MinHash q185 /
  // SimHash q186, images q190, this one semantic vectors). vec_id %
  // 7 == 0 plays the incoming batch (69 batch-involving pairs kept,
  // 222 warehouse-internal excluded at sf0.001 — both gate sides
  // exercised); the rest's (id, sig, vec) rows are the persisted
  // warehouse, simulated in-plan. Only the batch is signed; oracle =
  // q60's full-rebuild SQL filtered to batch-involving pairs.
  private def q199(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val isNew = col("vec_id") % 7 === 0
    graft.operators.Dedup.embeddingNearDupIncremental(
      graft.operators.Dedup.embeddingSigWarehouse(
        emb.filter(!isNew), "vec_id", "embedding",
        numPlanes = 6, dim = EmbeddingDim),
      emb.filter(isNew), "vec_id", "embedding",
      threshold = 0.2, numPlanes = 6, dim = EmbeddingDim)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q199_embed_neardup_incr" -> q199 _,
    "q178_mmr_rerank" -> q178 _,
    "q141_ivf_batch_topk" -> q141 _,
    "q40_cosine_scores" -> q40 _,
    "q41_cosine_topk" -> q41 _,
    "q42_sim_label_rollup" -> q42 _,
    "q43_ann_lsh_topk" -> q43 _,
    "q58_cosine_native" -> q58 _,
    "q59_ivf_topk" -> q59 _,
    "q192_ann_recall_curve" -> q192 _,
    "q60_embedding_near_dup" -> q60 _
  )

  private val probeCte =
    "WITH probe AS (SELECT CAST(embedding AS DOUBLE[]) AS p FROM embeddings WHERE vec_id = 0), " +
      "scored AS (SELECT vec_id, label, " +
      "CAST(FLOOR(list_cosine_similarity(CAST(embedding AS DOUBLE[]), p) * 1000000.0) AS BIGINT) AS sim_e6 " +
      "FROM embeddings, probe WHERE vec_id <> 0) "

  /** Fixture embedding width (TESTDATA.md — constant across scale
    * factors); the generated oracles embed hyperplane/centroid literals at
    * this dimensionality. */
  private val EmbeddingDim = 64

  /** Hyperplane literals for the generated oracles — the same pure
    * splitmix values [[SimilaritySearch.hyperplanes]] evaluates on
    * executors, rendered as a DuckDB VALUES list of (bit, DOUBLE[]). */
  private def planesSql(numPlanes: Int): String =
    SimilaritySearch.hyperplanes(numPlanes, EmbeddingDim).zipWithIndex
      .map { case (pl, b) => s"($b, CAST([${pl.mkString(", ")}] AS DOUBLE[]))" }
      .mkString(", ")

  /** Oracle for q43: hamming distance re-derived per plane as a sign
    * disagreement count (no bit packing needed), then the exact top-k. */
  private def annLshOracle: String =
    "WITH probe AS (SELECT CAST(embedding AS DOUBLE[]) AS p FROM embeddings WHERE vec_id = 0), " +
      s"planes(b, pl) AS (VALUES ${planesSql(16)}), " +
      "ham AS (SELECT e.vec_id, " +
      "SUM(CASE WHEN (list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), pl) > 0) " +
      "<> (list_cosine_similarity(p, pl) > 0) THEN 1 ELSE 0 END) AS hamming " +
      "FROM embeddings e, planes, probe WHERE e.vec_id <> 0 GROUP BY e.vec_id), " +
      "scored AS (SELECT vec_id, label, " +
      "list_cosine_similarity(CAST(embedding AS DOUBLE[]), p) AS sim " +
      "FROM embeddings, probe WHERE vec_id <> 0) " +
      "SELECT s.vec_id, s.label, CAST(FLOOR(sim * 1000000.0) AS BIGINT) AS sim_e6 " +
      "FROM scored s JOIN ham USING (vec_id) " +
      "WHERE hamming <= 6 AND s.sim > 0 " +
      "ORDER BY sim_e6 DESC, vec_id LIMIT 10"

  /** Oracle for q59: md5-keyed centroid pick, row_number argmax cell
    * assignment (ties → lowest cell, matching the Spark fold), nprobe=2
    * probe cells, exact re-rank. */
  private def ivfOracle: String =
    "WITH probe AS (SELECT CAST(embedding AS DOUBLE[]) AS p FROM embeddings WHERE vec_id = 0), " +
      "cents AS (SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell, " +
      "CAST(embedding AS DOUBLE[]) AS cv FROM embeddings WHERE vec_id <> 0 " +
      "QUALIFY ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 8), " +
      "assign AS (SELECT e.vec_id, e.label, CAST(e.embedding AS DOUBLE[]) AS v, c.cell, " +
      "ROW_NUMBER() OVER (PARTITION BY e.vec_id " +
      "ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv) DESC, c.cell) AS rn " +
      "FROM embeddings e, cents c WHERE e.vec_id <> 0), " +
      "pcells AS (SELECT c.cell FROM cents c, probe " +
      "ORDER BY list_cosine_similarity(p, c.cv) DESC, c.cell LIMIT 2), " +
      "cand AS (SELECT a.vec_id, a.label, a.v FROM assign a " +
      "WHERE a.rn = 1 AND a.cell IN (SELECT cell FROM pcells)), " +
      "scored AS (SELECT vec_id, label, list_cosine_similarity(v, p) AS sim FROM cand, probe) " +
      "SELECT vec_id, label, CAST(FLOOR(sim * 1000000.0) AS BIGINT) AS sim_e6 " +
      "FROM scored WHERE sim > 0 ORDER BY sim_e6 DESC, vec_id LIMIT 10"

  /** q192 oracle: exact top-10 + all four nprobe probe paths re-derived
    * from first principles (the q59 centroid/assignment CTEs, one
    * pc/sel/h leg per nprobe), hit counts against the exact set,
    * integer recall. */
  private def ivfRecallOracle: String = {
    val head =
      "WITH probe AS (SELECT CAST(embedding AS DOUBLE[]) AS p FROM embeddings WHERE vec_id = 0), " +
        "cents AS (SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell, " +
        "CAST(embedding AS DOUBLE[]) AS cv FROM embeddings WHERE vec_id <> 0 " +
        "QUALIFY ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 8), " +
        "assign AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, c.cell, " +
        "ROW_NUMBER() OVER (PARTITION BY e.vec_id " +
        "ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv) DESC, c.cell) AS rn " +
        "FROM embeddings e, cents c WHERE e.vec_id <> 0), " +
        "ex AS (SELECT vec_id FROM (SELECT vec_id, " +
        "CAST(FLOOR(list_cosine_similarity(CAST(embedding AS DOUBLE[]), p) * 1000000.0) AS BIGINT) AS sim_e6 " +
        "FROM embeddings, probe WHERE vec_id <> 0) " +
        "WHERE sim_e6 > 0 ORDER BY sim_e6 DESC, vec_id LIMIT 10), " +
        "exn AS (SELECT COUNT(*) AS n_exact FROM ex)"
    val legs = Seq(1, 2, 4, 8).map { np =>
      s"pc$np AS (SELECT c.cell FROM cents c, probe " +
        s"ORDER BY list_cosine_similarity(p, c.cv) DESC, c.cell LIMIT $np), " +
        s"sel$np AS (SELECT vec_id FROM (SELECT a.vec_id, " +
        "list_cosine_similarity(a.v, p) AS sim FROM assign a, probe " +
        s"WHERE a.rn = 1 AND a.cell IN (SELECT cell FROM pc$np)) " +
        "WHERE sim > 0 ORDER BY CAST(FLOOR(sim * 1000000.0) AS BIGINT) DESC, vec_id LIMIT 10), " +
        s"h$np AS (SELECT COUNT(*) AS n_hits FROM sel$np JOIN ex USING (vec_id))"
    }.mkString(", ")
    val sel = Seq(1, 2, 4, 8).map { np =>
      s"SELECT CAST($np AS BIGINT) AS nprobe, n_hits, " +
        s"n_hits * 1000000 // GREATEST(n_exact, 1) AS recall_e6 FROM h$np, exn"
    }.mkString(" UNION ALL ")
    s"$head, $legs $sel ORDER BY nprobe"
  }

  /** Oracle for q60: 6-plane signature bucketing (bounded), bucket-local
    * self-join, exact cosine ≥ 0.2. */
  private def nearDupOracle: String = nearDupOracle("")

  /** q60's chain with an optional extra pair predicate — q199's
    * incremental form must answer exactly the batch-involving subset
    * of this full rebuild (the q181 contract). */
  private def nearDupOracle(pairFilter: String): String =
    s"WITH planes(b, pl) AS (VALUES ${planesSql(6)}), " +
      "sigs AS (SELECT e.vec_id, " +
      "CAST(SUM(CASE WHEN list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), pl) > 0 " +
      "THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sig " +
      "FROM embeddings e, planes GROUP BY e.vec_id), " +
      "sv AS (SELECT s.vec_id, s.sig, CAST(e.embedding AS DOUBLE[]) AS v " +
      "FROM sigs s JOIN embeddings e USING (vec_id)), " +
      "bounded AS (SELECT * FROM sv QUALIFY COUNT(*) OVER (PARTITION BY sig) <= 10000) " +
      "SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
      "CAST(FLOOR(list_cosine_similarity(a.v, b.v) * 1000000.0) AS BIGINT) AS cosine_e6 " +
      "FROM bounded a JOIN bounded b ON a.sig = b.sig AND a.vec_id < b.vec_id " +
      "WHERE list_cosine_similarity(a.v, b.v) >= 0.2 " +
      s"$pairFilter" +
      "ORDER BY id_a, id_b"

  /** Oracle for q141: the q59 derivation generalized to a probe SET —
    * per-probe cell ranking and per-probe top-10 windows; centroids and
    * assignment computed over the corpus (vec_id % 100 <> 0) only. */
  private def ivfBatchOracle: String =
    "WITH probes AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS p " +
      "FROM embeddings WHERE vec_id % 100 = 0), " +
      "corpus AS (SELECT * FROM embeddings WHERE vec_id % 100 <> 0), " +
      "cents AS (SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell, " +
      "CAST(embedding AS DOUBLE[]) AS cv FROM corpus " +
      "QUALIFY ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 8), " +
      "assign AS (SELECT e.vec_id, e.label, CAST(e.embedding AS DOUBLE[]) AS v, c.cell, " +
      "ROW_NUMBER() OVER (PARTITION BY e.vec_id " +
      "ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv) DESC, c.cell) AS rn " +
      "FROM corpus e, cents c), " +
      "pcells AS (SELECT probe_id, cell FROM (" +
      "SELECT pr.probe_id, c.cell, ROW_NUMBER() OVER (PARTITION BY pr.probe_id " +
      "ORDER BY list_cosine_similarity(pr.p, c.cv) DESC, c.cell) AS crn " +
      "FROM probes pr, cents c) WHERE crn <= 2), " +
      "cand AS (SELECT pc.probe_id, a.vec_id, a.label, a.v FROM assign a " +
      "JOIN pcells pc ON a.cell = pc.cell AND a.rn = 1), " +
      "scored AS (SELECT c.probe_id, c.vec_id, c.label, " +
      "list_cosine_similarity(c.v, pr.p) AS sim FROM cand c " +
      "JOIN probes pr ON pr.probe_id = c.probe_id) " +
      "SELECT probe_id, CAST(rnk AS BIGINT) AS rank, vec_id, label, " +
      "CAST(FLOOR(sim * 1000000.0) AS BIGINT) AS sim_e6 FROM (" +
      "SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id " +
      "ORDER BY CAST(FLOOR(sim * 1000000.0) AS BIGINT) DESC, vec_id) AS rnk " +
      "FROM scored WHERE sim > 0) WHERE rnk <= 10"

  /** q178 twin: same shortlist (floor-e6 relevance, desc, id
    * tie-break, LIMIT m), same pairwise e6 cosines, and the greedy
    * selection unrolled as k chained single-row CTEs — each step's
    * maxsim is a correlated MAX over the pair table restricted to the
    * picked-so-far list, each pick ORDER BY (mmr_e6 DESC, vec_id)
    * LIMIT 1, exactly the operator's tie ladder. */
  private def mmrOracle: String = {
    val m = 20; val k = 8
    val b = Seq.newBuilder[String]
    b += "probe AS (SELECT CAST(embedding AS DOUBLE[]) AS p FROM embeddings WHERE vec_id = 0)"
    b += ("sl AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, " +
      "CAST(FLOOR(list_cosine_similarity(CAST(embedding AS DOUBLE[]), p) * 1000000.0) AS BIGINT) AS rel_e6 " +
      s"FROM embeddings, probe WHERE vec_id <> 0 ORDER BY rel_e6 DESC, vec_id LIMIT $m)")
    b += ("ps AS MATERIALIZED (SELECT a.vec_id AS ia, b.vec_id AS ib, " +
      "CAST(FLOOR(list_cosine_similarity(a.emb, b.emb) * 1000000.0) AS BIGINT) AS sim " +
      "FROM sl a JOIN sl b ON a.vec_id <> b.vec_id)")
    b += ("s1 AS MATERIALIZED (SELECT vec_id, rel_e6, CAST(0 AS BIGINT) AS maxsim_e6, " +
      "rel_e6 AS mmr_e6 FROM sl ORDER BY rel_e6 DESC, vec_id LIMIT 1)")
    b += "p1 AS (SELECT vec_id FROM s1)"
    (2 to k).foreach { r =>
      val ms = "(SELECT MAX(ps.sim) FROM ps WHERE ps.ia = c.vec_id " +
        s"AND ps.ib IN (SELECT vec_id FROM p${r - 1}))"
      b += (s"s$r AS MATERIALIZED (SELECT c.vec_id, c.rel_e6, " +
        s"$ms AS maxsim_e6, c.rel_e6 - $ms AS mmr_e6 " +
        s"FROM sl c WHERE c.vec_id NOT IN (SELECT vec_id FROM p${r - 1}) " +
        "ORDER BY mmr_e6 DESC, vec_id LIMIT 1)")
      b += s"p$r AS (SELECT vec_id FROM p${r - 1} UNION ALL SELECT vec_id FROM s$r)"
    }
    "WITH " + b.result().mkString(", ") + " " +
      (1 to k).map(r =>
        s"SELECT CAST($r AS BIGINT) AS rank, vec_id, rel_e6, maxsim_e6, mmr_e6 FROM s$r")
        .mkString(" UNION ALL ") + " ORDER BY rank"
  }

  val oracle: Map[String, String] = Map(
    "q178_mmr_rerank" -> mmrOracle,
    "q141_ivf_batch_topk" -> ivfBatchOracle,
    "q43_ann_lsh_topk" -> annLshOracle,
    "q59_ivf_topk" -> ivfOracle,
    "q192_ann_recall_curve" -> ivfRecallOracle,
    "q60_embedding_near_dup" -> nearDupOracle,
    "q199_embed_neardup_incr" ->
      nearDupOracle("AND (a.vec_id % 7 = 0 OR b.vec_id % 7 = 0) "),
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
