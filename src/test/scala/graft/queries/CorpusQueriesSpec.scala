package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants for the corpus-statistics queries (q79/q81/q83/q85)
  * and the dedup-deliverable queries (q80/q84). Cross-engine value parity
  * is the oracle gate's job; these pin the properties the oracle cannot
  * see — bounds, conservation, and decision consistency. */
class CorpusQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q79: novelty is a fraction; the first doc is fully novel") {
    val out = run("q79_ngram_novelty").cache()
    assert(out.filter(col("n_novel") > col("n_shingles")).count() === 0)
    assert(out.filter(col("novelty") < 0 || col("novelty") > 1).count() === 0)
    // min doc_id with shingles has nothing before it -> novelty 1.0
    val firstDoc = out.agg(min(col("doc_id"))).head().getLong(0)
    val firstNovelty = out.filter(col("doc_id") === firstDoc)
      .head().getAs[Double]("novelty")
    assert(firstNovelty === 1.0)
    // novel shingle totals conserve: every shingle is first seen exactly once
    val sums = out.agg(sum(col("n_novel"))).head().getLong(0)
    val distinctShingles = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(call_function("graft_shingles", col("text"), lit(3)))
        .as("s")).distinct().count()
    assert(sums === distinctShingles)
    out.unpersist()
  }

  test("q81: z-scores are centered and the outlier flag matches z_e6") {
    val out = run("q81_source_zscore").cache()
    // |floored z| > 2e6 implies flagged (boundary rows can only differ by
    // the floor direction, so check the strict implication both ways)
    assert(out.filter(col("z_e6") > 2000000L && !col("is_outlier")).count() === 0)
    assert(out.filter(col("z_e6") < -2000001L && !col("is_outlier")).count() === 0)
    // per-source z_e6 sums stay near zero (floor bias is < 1 per row)
    val rows = out.groupBy(col("source"))
      .agg(sum(col("z_e6")).as("s"), count(lit(1)).as("n")).collect()
    rows.foreach { r =>
      assert(math.abs(r.getAs[Long]("s")) <= r.getAs[Long]("n"))
    }
    out.unpersist()
  }

  test("q83: quartiles partition the corpus near-evenly, ordered by quality") {
    val out = run("q83_quality_quartiles").collect().sortBy(_.getAs[Int]("quartile"))
    assert(out.map(_.getAs[Int]("quartile")).toSeq === Seq(1, 2, 3, 4))
    val sizes = out.map(_.getAs[Long]("n_docs"))
    assert(sizes.max - sizes.min <= 1)
    // quartile 1 holds the best scores: its min >= quartile 2's max, etc.
    out.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi.getAs[Long]("min_q_e6") >= lo.getAs[Long]("max_q_e6"))
    }
  }

  test("q85: five terms per language, scores descending, tf >= df-languages") {
    val out = run("q85_tfidf_terms").cache()
    val perLang = out.groupBy(col("lang")).agg(count(lit(1)).as("n")).collect()
    perLang.foreach(r => assert(r.getAs[Long]("n") === 5L))
    val badOrder = out.as("a").join(out.as("b"),
      col("a.lang") === col("b.lang") && col("a.rk") === col("b.rk") - 1)
      .filter(col("a.score_e6") < col("b.score_e6")).count()
    assert(badOrder === 0L)
    out.unpersist()
  }

  test("q80: kept counts bound by totals and agree with q69's components") {
    val out = run("q80_near_dup_survivors").cache()
    assert(out.filter(col("n_kept") > col("n_docs")).count() === 0)
    val totalKept = out.agg(sum(col("n_kept"))).head().getLong(0)
    val comps = run("q69_near_dup_components")
      .agg(countDistinct(col("component"))).head().getLong(0)
    assert(totalKept === comps)
    out.unpersist()
  }

  test("q84: decisions are consistent with the flags") {
    val out = run("q84_incremental_dedup").cache()
    assert(out.filter(col("is_exact_dup") && col("decision") =!= "drop_exact")
      .count() === 0)
    assert(out.filter(!col("is_exact_dup") && col("n_near_dups") > 0 &&
      col("decision") =!= "review").count() === 0)
    assert(out.filter(!col("is_exact_dup") && col("n_near_dups") === 0 &&
      col("decision") =!= "ingest").count() === 0)
    // every batch doc gets exactly one decision row
    val batch = spark.read.parquet(s"$sf/documents.parquet")
      .filter(pmod(col("doc_id"), lit(7)) === 0).count()
    assert(out.count() === batch)
    out.unpersist()
  }
}
