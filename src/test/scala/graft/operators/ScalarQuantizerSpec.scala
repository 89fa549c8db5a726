package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScalarQuantizerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val probe: Seq[Float] =
    emb.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
  private lazy val corpus = emb.filter(col("vec_id") =!= 0)

  test("codes are bounded and reconstruct within half a scale step") {
    val rows = ScalarQuantizer.quantize(corpus, "embedding")
      .select(col("embedding"), col("sq_code"), col("sq_scale"))
      .as[(Seq[Float], Seq[Byte], Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (v, code, scale) =>
      assert(code.length === v.length)
      assert(code.forall(c => c >= -127 && c <= 127))
      v.zip(code).foreach { case (x, c) =>
        assert(math.abs(c * scale - x) <= scale / 2 + 1e-12,
          s"reconstruction off: x=$x c=$c scale=$scale")
      }
    }
  }

  test("zero vectors quantize to zero codes with scale 0") {
    val df = Seq((1L, Seq.fill(8)(0.0f)), (2L, Seq(1.0f, -2.0f, 0.5f, 0f, 0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val byId = ScalarQuantizer.quantize(df, "embedding")
      .select("vec_id", "sq_code", "sq_scale")
      .as[(Long, Seq[Byte], Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byId(1L)._1.forall(_ == 0) && byId(1L)._2 === 0.0)
    assert(byId(2L)._1(1) === -127, "max-abs element maps to ±127")
  }

  test("recall: SQ8 shortlist + exact re-rank recovers the exact top-10") {
    graft.plans.GraftExtensions.ensure(spark)
    val exact = SimilaritySearch.topK(corpus, "vec_id", "embedding", probe, 10)
      .select("vec_id").as[Long].collect().toSeq
    val sq = ScalarQuantizer.sqRerankTopK(corpus, "vec_id", "embedding",
        probe, shortlist = 100, k = 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(sq.toSet.intersect(exact.toSet).size >= 8,
      s"recall ${sq.toSet.intersect(exact.toSet).size}/10")
    // shortlist = corpus -> identical to exact (same tie rule)
    val full = ScalarQuantizer.sqRerankTopK(corpus, "vec_id", "embedding",
        probe, shortlist = corpus.count().toInt, k = 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(full === exact)
  }

  test("indexed path matches inline; append equals rebuild") {
    graft.plans.GraftExtensions.ensure(spark)
    val initial = corpus.filter(col("vec_id") % 3 =!= 0)
    val batch = corpus.filter(col("vec_id") % 3 === 0)
    ScalarQuantizer.buildSqIndex(initial, "vec_id", "embedding", "sq_app_spec")
    ScalarQuantizer.appendToSqIndex(spark, "sq_app_spec", batch, "vec_id", "embedding")
    val appended = spark.table("sq_app_spec")
      .select("vec_id", "sq_code", "sq_scale")
      .as[(Long, Seq[Byte], Double)].collect().toSeq.sortBy(_._1)
    val rebuilt = ScalarQuantizer.quantize(corpus, "embedding")
      .select("vec_id", "sq_code", "sq_scale")
      .as[(Long, Seq[Byte], Double)].collect().toSeq.sortBy(_._1)
    assert(appended === rebuilt)
    val inline = ScalarQuantizer.sqRerankTopK(corpus, "vec_id", "embedding",
        probe, 100, 10).select("vec_id", "sim_e6").as[(Long, Long)].collect().toSeq
    val indexed = ScalarQuantizer.sqRerankTopKIndexed(spark, "sq_app_spec",
        corpus, "vec_id", "embedding", probe, 100, 10)
      .select("vec_id", "sim_e6").as[(Long, Long)].collect().toSeq
    assert(indexed === inline)
  }
}
