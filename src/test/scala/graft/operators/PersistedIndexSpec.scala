package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted ANN index paths: result parity with the per-query variants,
  * plus plan assertions that the persisted paths do NOT recompute
  * signatures/cell assignments — the scan reads them (LSH) or prunes whole
  * partitions (IVF).
  */
class PersistedIndexSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val probe: Seq[Float] =
    emb.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
  private lazy val corpus = emb.filter(col("vec_id") =!= 0)

  private def cosineCount(df: org.apache.spark.sql.DataFrame): Int =
    "graft_cosine".r.findAllIn(df.queryExecution.executedPlan.toString).length

  test("LSH: indexed results match the per-query path; no signature recompute in plan") {
    graft.plans.GraftExtensions.ensure(spark)
    SimilaritySearch.buildLshIndex(corpus, "vec_id", "embedding",
      "lsh_idx_spec", numPlanes = 16, dim = probe.length)
    val live = SimilaritySearch.annTopK(corpus, "vec_id", "embedding",
      probe, k = 10, numPlanes = 16, maxHamming = 6)
      .select("vec_id", "sim_e6").collect().toSeq
    val idx = SimilaritySearch.annTopKIndexed(spark, "lsh_idx_spec",
      "vec_id", "embedding", probe, k = 10, numPlanes = 16, maxHamming = 6)
      .select("vec_id", "sim_e6")
    assert(idx.collect().toSeq == live)

    // per-query path evaluates one cosine per plane + the re-rank;
    // the indexed plan keeps ONLY the re-rank
    val livePlan = SimilaritySearch.annTopK(corpus, "vec_id", "embedding",
      probe, k = 10, numPlanes = 16, maxHamming = 6)
    // the re-rank cosine is referenced up to 3 times in the plan text
    // (project + filter + sort key); per-plane recompute would add 16 more
    assert(cosineCount(livePlan) >= 16)
    assert(cosineCount(idx) <= 3,
      s"indexed LSH plan must not recompute signatures:\n${idx.queryExecution.executedPlan}")
  }

  test("IVF: indexed results match the per-query path; partition pruning, no assignment recompute") {
    graft.plans.GraftExtensions.ensure(spark)
    IvfIndex.build(corpus, "vec_id", "embedding", "ivf_idx_spec", numCells = 8)
    val live = IvfIndex.topK(corpus, "vec_id", "embedding", probe,
      k = 10, numCells = 8, nprobe = 2)
      .select("vec_id", "sim_e6").collect().toSeq
    val idx = IvfIndex.topKIndexed(spark, "ivf_idx_spec",
      "vec_id", "embedding", probe, k = 10, nprobe = 2)
      .select("vec_id", "sim_e6")
    assert(idx.collect().toSeq == live)

    val planStr = idx.queryExecution.executedPlan.toString
    assert(cosineCount(idx) <= 3,
      s"indexed IVF plan must not recompute cell assignment:\n$planStr")
    assert(planStr.contains("PartitionFilters") && planStr.contains("ivf_cell"),
      s"indexed IVF scan must prune on ivf_cell partitions:\n$planStr")
  }
}
