package graft.operators

import graft.SparkSpec
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

class SimilaritySearchSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f)),
    (2L, Seq(0.9f, 0.1f, 0.0f)),
    (3L, Seq(0.0f, 1.0f, 0.0f)),
    (4L, Seq(-1.0f, 0.0f, 0.0f)),
    (5L, Seq(0.0f, 0.0f, 0.0f))) // zero vector
    .toDF("id", "embedding")

  test("cosine: guards for zero magnitude and length mismatch (embeddings.py:394-402)") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f, 0.0f)))
      .toDF("a", "b")
    val sims = df.select(VectorOps.cosine(col("a"), col("b"))).as[Double].collect()
    assert(sims(0) == 1.0)
    assert(sims(1) == 0.0) // zero magnitude
    assert(sims(2) == 0.0) // length mismatch
  }

  test("topK: ordered by similarity, threshold applied, probe-like best first") {
    val top = SimilaritySearch.topK(vecs, "id", "embedding",
      Seq(1.0f, 0.0f, 0.0f), k = 3, threshold = -1.0)
      .select("id").as[Long].collect()
    assert(top.head == 1L) // identical vector
    assert(top(1) == 2L)   // near
    assert(!top.contains(4L) || top.last == 4L) // opposite ranks last if present
  }

  test("scoreAllVs (broadcast probe row) is bit-identical to scoreAll (literal probe)") {
    val probe = vecs.filter(col("id") === 1L)
    val viaLit = SimilaritySearch.scoreAll(vecs, "embedding", Seq(1.0f, 0.0f, 0.0f))
      .select(col("id"), col("sim_e6")).as[(Long, Long)].collect().sorted.toSeq
    val viaRow = SimilaritySearch.scoreAllVs(vecs, "embedding", probe, "embedding")
      .select(col("id"), col("sim_e6")).as[(Long, Long)].collect().sorted.toSeq
    assert(viaRow === viaLit)
  }

  test("annTopK recall matches brute force on clustered data") {
    // deterministic clustered corpus: 100 vectors in 4 tight clusters
    val dim = 16
    val rows = (0 until 100).map { i =>
      val c = i % 4
      val v = Array.tabulate(dim) { j =>
        val base = if (j % 4 == c) 1.0f else 0.0f
        base + ((i * 31 + j * 17) % 7).toFloat / 100.0f
      }
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("id", "embedding")
    val probe = rows.head._2
    val brute = SimilaritySearch.topK(df.filter($"id" =!= 0), "id", "embedding", probe, 10)
      .select("id").as[Long].collect().toSet
    val ann = SimilaritySearch.annTopK(df.filter($"id" =!= 0), "id", "embedding", probe, 10,
      numPlanes = 12, maxHamming = 4)
      .select("id").as[Long].collect().toSet
    // LSH with generous hamming ball should recover most of the true top-10
    assert(ann.intersect(brute).size >= 7,
      s"recall too low: ${ann.intersect(brute).size}/10 (ann=$ann brute=$brute)")
  }

  test("hyperplanes are deterministic and in [-0.5, 0.5)") {
    val a = SimilaritySearch.hyperplanes(4, 8)
    val b = SimilaritySearch.hyperplanes(4, 8)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(v => v >= -0.5 && v < 0.5))
  }
}
