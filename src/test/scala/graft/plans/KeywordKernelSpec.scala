package graft.plans

import graft.SparkSpec
import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._

/** graft_keyword_counts pinned to the explode → conditional-SUM twin on
  * the real corpus plus edge shapes. */
class KeywordKernelSpec extends SparkSpec {
  import spark.implicits._

  private val profiles = Seq(
    "db" -> Seq("table", "join", "query"),
    "ml" -> Seq("vector", "model"))

  private def vocabLit =
    array(profiles.map { case (_, ws) => array(ws.map(lit): _*) }: _*)

  test("kernel counts each occurrence, matching the exploded SUM twin") {
    graft.plans.GraftExtensions.ensure(spark)
    val docs = Seq(
      (1L, "table join table vector"),
      (2L, "nothing matches here"),
      (3L, ""),
      (4L, "  model  model "), // leading/trailing whitespace token edges
      (5L, "query query query join model vector"))
      .toDF("doc_id", "text")

    val kernel = docs
      .withColumn("c", call_function("graft_keyword_counts", col("text"), vocabLit))
      .select(col("doc_id"), element_at(col("c"), 1).as("s0"),
        element_at(col("c"), 2).as("s1"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)

    val twin = docs
      .select(col("doc_id"), explode_outer(TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("t").isin(profiles(0)._2: _*), 1L).otherwise(0L)).as("s0"),
        sum(when(col("t").isin(profiles(1)._2: _*), 1L).otherwise(0L)).as("s1"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)

    assert(kernel.toSeq == twin.toSeq)
    assert(kernel.find(_._1 == 1L).get._2 == 3L) // "table" twice + "join"
    assert(kernel.find(_._1 == 5L).get._2 == 4L)
  }

  test("kernel matches twin on the sf0.001 documents corpus") {
    graft.plans.GraftExtensions.ensure(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val kernel = docs
      .withColumn("c", call_function("graft_keyword_counts", col("text"), vocabLit))
      .select(col("doc_id"), element_at(col("c"), 1).as("s0"),
        element_at(col("c"), 2).as("s1"))
    val twin = docs
      .select(col("doc_id"), explode_outer(TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("t").isin(profiles(0)._2: _*), 1L).otherwise(0L)).as("s0"),
        sum(when(col("t").isin(profiles(1)._2: _*), 1L).otherwise(0L)).as("s1"))
    assert(kernel.exceptAll(twin).isEmpty && twin.exceptAll(kernel).isEmpty)
  }
}
