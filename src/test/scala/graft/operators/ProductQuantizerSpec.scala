package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet").cache()
  private lazy val model =
    ProductQuantizer.fit(emb, "vec_id", "embedding", m = 8, k = 64, iters = 1)
  private lazy val encoded =
    ProductQuantizer.encode(emb, "embedding", model).cache()

  private def exactTop10(q: Seq[Float]): Set[Long] =
    emb.withColumn("d", KMeans.sqDist(KMeans.quantize(col("embedding")),
        typedlit(ProductQuantizer.quantizeQuery(q))))
      .orderBy(col("d").asc, col("vec_id").asc).limit(10)
      .collect().map(_.getLong(0)).toSet

  test("model shape and code ranges") {
    assert(model.m === 8 && model.subDim === 8)
    assert(model.codebooks.forall(_.length === 64))
    assert(model.codebooks.flatten.forall(_.length === 8))
    val bad = encoded.filter(exists(col("pq_code"),
      c => c < 0 || c >= 64) || size(col("pq_code")) =!= 8).count()
    assert(bad === 0)
  }

  test("fit is deterministic (codebooks identical across runs)") {
    val again = ProductQuantizer.fit(emb, "vec_id", "embedding", 8, 64, 1)
    assert(again.codebooks.map(_.toSeq).toSeq === model.codebooks.map(_.toSeq).toSeq)
  }

  test("recall@10 floors vs exact search over 5 queries (hardest case: unclustered vectors)") {
    val ids = emb.select("vec_id").orderBy("vec_id").limit(5)
      .collect().map(_.getLong(0))
    var adcHits = 0
    var rerankHits = 0
    for (qid <- ids) {
      val q = emb.filter(col("vec_id") === qid)
        .select("embedding").head().getSeq[Float](0)
      val exact = exactTop10(q)
      val adc = ProductQuantizer.adcTopK(encoded, "vec_id", model, q, 10)
        .collect().map(_.getLong(0)).toSet
      val rer = ProductQuantizer
        .adcRerankTopK(encoded, "vec_id", "embedding", model, q, 100, 10)
        .collect().map(_.getLong(0)).toSet
      adcHits += (adc & exact).size
      rerankHits += (rer & exact).size
    }
    // measured 19-22/50 ADC and 44-46/50 rerank@100 — conservative floors
    assert(adcHits >= 13, s"ADC recall@10 $adcHits/50 below floor")
    assert(rerankHits >= 35, s"rerank@100 recall@10 $rerankHits/50 below floor")
    assert(rerankHits > adcHits, "re-rank must improve on raw ADC")
  }

  test("rerank with shortlist = corpus size equals exact search") {
    val q = emb.orderBy(col("vec_id").asc)
      .select("embedding").head().getSeq[Float](0)
    val n = emb.count().toInt
    val full = ProductQuantizer
      .adcRerankTopK(encoded, "vec_id", "embedding", model, q, n, 10)
      .collect().map(_.getLong(0)).toSet
    assert(full === exactTop10(q))
  }

  test("adc distance is the sum of per-subspace table entries (spot check)") {
    val q = emb.orderBy(col("vec_id").asc)
      .select("embedding").head().getSeq[Float](0)
    val qv = ProductQuantizer.quantizeQuery(q)
    val row = ProductQuantizer.adcTopK(encoded, "vec_id", model, q, 1).head()
    val code = encoded.filter(col("vec_id") === row.getLong(0))
      .select("pq_code").head().getSeq[Int](0)
    val expected = (0 until model.m).map { i =>
      val qs = qv.slice(i * model.subDim, (i + 1) * model.subDim)
      val c = model.codebooks(i)(code(i))
      qs.zip(c).map { case (x, y) => val z = x - y; z * z }.sum
    }.sum
    assert(row.getLong(1) === expected)
  }
}
