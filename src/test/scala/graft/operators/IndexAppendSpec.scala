package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental index maintenance: appending a batch to a persisted ANN
  * index must be indistinguishable from rebuilding the index over the
  * full corpus WITH THE SAME model (centroids / codebooks / hyperplanes).
  * That is the FAISS `add` contract: assignment and encoding are pure
  * functions of the frozen model, so only centroid choice itself can
  * differ — and these builds freeze it from the initial corpus.
  */
class IndexAppendSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val probe: Seq[Float] =
    emb.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
  private lazy val corpus = emb.filter(col("vec_id") =!= 0).cache()
  // deterministic split: initial build gets ~2/3, the append batch ~1/3
  private lazy val initial = corpus.filter(col("vec_id") % 3 =!= 0)
  private lazy val batch = corpus.filter(col("vec_id") % 3 === 0)

  private def rows(df: DataFrame, cols: String*): Seq[Seq[Any]] =
    df.select(cols.map(col): _*).collect().toSeq.map(_.toSeq)
      .sortBy(_.mkString("|"))

  test("IVF append: appended index equals assignCells over the full corpus with the build's centroids") {
    graft.plans.GraftExtensions.ensure(spark)
    IvfIndex.build(initial, "vec_id", "embedding", "ivf_app_spec", numCells = 8)
    IvfIndex.append(spark, "ivf_app_spec", batch, "vec_id", "embedding")
    val cents = IvfIndex.loadCentroids(spark, "ivf_app_spec")
    val want = rows(IvfIndex.assignCells(corpus, "embedding", cents),
      "vec_id", "ivf_cell")
    assert(rows(spark.table("ivf_app_spec"), "vec_id", "ivf_cell") === want)
    // and a query over the appended index CAN return appended rows
    val got = IvfIndex.topKIndexed(spark, "ivf_app_spec", "vec_id",
      "embedding", probe, k = 50, nprobe = 8) // nprobe=all -> exact top-50
    val exact = SimilaritySearch.topK(corpus, "vec_id", "embedding", probe, 50)
    assert(rows(got, "vec_id", "sim_e6") === rows(exact, "vec_id", "sim_e6"),
      "all-cells probe over appended index must equal exact search on the full corpus")
  }

  test("PQ append: appended codes are bit-identical to encoding the full corpus with the build's model") {
    graft.plans.GraftExtensions.ensure(spark)
    val model = ProductQuantizer.buildPqIndex(initial, "vec_id", "embedding",
      "pq_app_spec", m = 8, k = 16, iters = 1)
    ProductQuantizer.appendToIndex(spark, "pq_app_spec", batch, "vec_id", "embedding")
    val want = rows(
      ProductQuantizer.encode(corpus, "embedding", model)
        .select(col("vec_id"), col("pq_code")), "vec_id", "pq_code")
    assert(rows(spark.table("pq_app_spec"), "vec_id", "pq_code") === want)
  }

  test("IVF x PQ append: cells and codes both match a same-model full encode") {
    graft.plans.GraftExtensions.ensure(spark)
    IvfPq.build(initial, "vec_id", "embedding", "ivfpq_app_spec",
      numCells = 8, m = 8, codesK = 16, iters = 1)
    IvfPq.append(spark, "ivfpq_app_spec", batch, "vec_id", "embedding")
    val cents = IvfIndex.loadCentroids(spark, "ivfpq_app_spec")
    val model = ProductQuantizer.loadModel(spark, "ivfpq_app_spec")
    val want = rows(
      ProductQuantizer.encode(
          IvfIndex.assignCells(corpus, "embedding", cents), "embedding", model)
        .select(col("vec_id"), col("pq_code"), col("ivf_cell")),
      "vec_id", "pq_code", "ivf_cell")
    assert(rows(spark.table("ivfpq_app_spec"), "vec_id", "pq_code", "ivf_cell") === want)
  }

  test("LSH append: appended signatures equal a full rebuild (same plane family)") {
    graft.plans.GraftExtensions.ensure(spark)
    SimilaritySearch.buildLshIndex(initial, "vec_id", "embedding",
      "lsh_app_spec", numPlanes = 16, dim = probe.length)
    SimilaritySearch.appendLshIndex(batch, "vec_id", "embedding",
      "lsh_app_spec", numPlanes = 16, dim = probe.length)
    SimilaritySearch.buildLshIndex(corpus, "vec_id", "embedding",
      "lsh_full_spec", numPlanes = 16, dim = probe.length)
    assert(rows(spark.table("lsh_app_spec"), "vec_id", "lsh_sig")
      === rows(spark.table("lsh_full_spec"), "vec_id", "lsh_sig"))
  }

  test("append touches only new files: initial partition files are not rewritten") {
    graft.plans.GraftExtensions.ensure(spark)
    IvfIndex.build(initial, "vec_id", "embedding", "ivf_files_spec", numCells = 4)
    val loc = spark.sql("DESCRIBE TABLE EXTENDED ivf_files_spec")
      .filter(col("col_name") === "Location").select("data_type").head().getString(0)
    val dir = new java.io.File(new java.net.URI(loc))
    def files(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Seq()
      walk(dir).map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = files()
    IvfIndex.append(spark, "ivf_files_spec", batch, "vec_id", "embedding")
    val after = files()
    assert(before.keySet.subsetOf(after.keySet), "append must not delete files")
    before.foreach { case (p, ts) =>
      assert(after(p) === ts, s"append rewrote existing file $p")
    }
    assert(after.size > before.size, "append produced no new files")
  }
}
