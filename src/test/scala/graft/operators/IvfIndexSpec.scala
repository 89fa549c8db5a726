package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  // deterministic clustered corpus: 120 vectors in 4 tight clusters
  private def corpus = {
    val dim = 16
    (0 until 120).map { i =>
      val c = i % 4
      val v = Array.tabulate(dim) { j =>
        (if (j % 4 == c) 1.0f else 0.0f) + ((i * 31 + j * 17) % 7).toFloat / 100.0f
      }
      (i.toLong, v.toSeq)
    }.toDF("id", "embedding")
  }

  test("centroids are deterministic") {
    val a = IvfIndex.centroids(corpus, "id", "embedding", 4).map(_._2)
    val b = IvfIndex.centroids(corpus, "id", "embedding", 4).map(_._2)
    assert(a.toSeq == b.toSeq)
  }

  test("IVF top-k recall vs brute force on clustered data") {
    val probe = corpus.filter($"id" === 0).select("embedding")
      .as[Seq[Float]].head()
    val rest = corpus.filter($"id" =!= 0)
    val brute = SimilaritySearch.topK(rest, "id", "embedding", probe, 10)
      .select("id").as[Long].collect().toSet
    val ivf = IvfIndex.topK(rest, "id", "embedding", probe, 10,
      numCells = 6, nprobe = 3)
      .select("id").as[Long].collect().toSet
    assert(ivf.intersect(brute).size >= 7,
      s"recall ${ivf.intersect(brute).size}/10 (ivf=$ivf brute=$brute)")
  }

  test("embedding near-dup finds planted duplicates, skips unrelated") {
    val base = (0 until 40).map { i =>
      val v = Array.tabulate(8)(j => ((i * 13 + j * 7) % 11).toFloat / 11.0f - 0.4f)
      (i.toLong, v.toSeq)
    }
    // plant an exact duplicate of id 3 as id 100 and a near-dup as id 101
    val planted = base ++ Seq(
      (100L, base(3)._2),
      (101L, base(3)._2.updated(0, base(3)._2.head + 0.01f)))
    val df = planted.toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(df, "vec_id", "embedding",
      threshold = 0.98, numPlanes = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((3L, 100L)), s"missing exact dup: $pairs")
    assert(pairs.contains((3L, 101L)) || pairs.contains((100L, 101L)),
      s"missing near dup: $pairs")
  }

  test("batch ANN equals a per-probe loop of topK (same cells, same tie rule)") {
    val probeIds = Seq(0L, 17L, 55L, 99L)
    val probesDf = corpus.filter(col("id").isin(probeIds: _*))
      .select(col("id").as("probe_id"), col("embedding").as("pvec"))
    val rest = corpus.filter(!col("id").isin(probeIds: _*))
    val batch = IvfIndex.topKBatch(rest, "id", "embedding",
        probesDf, "probe_id", "pvec", k = 5, numCells = 6, nprobe = 3)
      .select("probe_id", "rank", "id", "sim_e6")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    val loop = probeIds.map { pid =>
      val p = corpus.filter(col("id") === pid).select("embedding").as[Seq[Float]].head()
      pid -> IvfIndex.topK(rest, "id", "embedding", p, k = 5,
          numCells = 6, nprobe = 3)
        .select("id", "sim_e6").as[(Long, Long)].collect().toSeq
    }.toMap
    assert(batch === loop)
  }

  test("batch ANN over the persisted index matches the inline batch") {
    graft.plans.GraftExtensions.ensure(spark)
    val probeIds = Seq(0L, 60L)
    val probesDf = corpus.filter(col("id").isin(probeIds: _*))
      .select(col("id").as("probe_id"), col("embedding").as("pvec"))
    val rest = corpus.filter(!col("id").isin(probeIds: _*))
    IvfIndex.build(rest, "id", "embedding", "ivf_batch_spec", numCells = 6)
    val inline = IvfIndex.topKBatch(rest, "id", "embedding",
        probesDf, "probe_id", "pvec", k = 5, numCells = 6, nprobe = 3)
      .select("probe_id", "rank", "id", "sim_e6")
      .as[(Long, Long, Long, Long)].collect().toSet
    val indexed = IvfIndex.topKBatchIndexed(spark, "ivf_batch_spec",
        "id", "embedding", probesDf, "probe_id", "pvec", k = 5, nprobe = 3)
      .select("probe_id", "rank", "id", "sim_e6")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(indexed === inline)
    // indexed plan must not re-run cell assignment
    val plan = IvfIndex.topKBatchIndexed(spark, "ivf_batch_spec",
        "id", "embedding", probesDf, "probe_id", "pvec", k = 5, nprobe = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("graft_argmax_cosine"),
      s"indexed batch plan recomputes assignment:\n$plan")
  }
}
