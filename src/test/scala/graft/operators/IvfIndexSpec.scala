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
}
