package graft.ops

import graft.SparkSpec
import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._

/** The codegen'd text kernels must be VALUE-IDENTICAL to their
  * interpreted-HOF originals — these rewrites exist for performance only
  * (BASELINE.md "scale findings"), never for semantics.
  */
class TextKernelEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  // adversarial whitespace shapes + the real corpus
  private val battery = Seq(
    "", " ", "   ", "a", " a", "a ", "  a  b  ", "a\tb", "\ta\n b \n",
    "the quick brown fox", "a  double  space", "tabs\t\tand\nnewlines",
    "ends with spaces   ", "   starts with spaces", "one-token",
    "ünïcode tökens  here", "a b c d e f g h i j k l m n o p")

  test("contentCharsOf(text) == contentChars(tokens) on adversarial whitespace + corpus") {
    val fromBattery = battery.toDF("text")
    val fromCorpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").select($"text")
    Seq(fromBattery, fromCorpus).foreach { df =>
      val rows = df.select(
        TextAnalysis.contentChars(TextAnalysis.tokens($"text")).as("hof"),
        TextAnalysis.contentCharsOf($"text").as("re")).collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
    }
  }

  test("langIdTable == row-local langId fold on the documents fixture") {
    val profiles = Seq(
      "db" -> Seq("table", "join", "query", "scan", "merge"),
      "stream" -> Seq("stream", "batch", "window", "event"),
      "ml" -> Seq("vector", "data", "model", "spark"))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rowLocal = docs.select($"doc_id",
      TextAnalysis.langId(TextAnalysis.tokens($"text"), profiles).as("pred"))
      .as[(Long, String)].collect().toMap
    val tabled = TextAnalysis.langIdTable(docs, Seq("doc_id"), "text", profiles)
      .as[(Long, String)].collect().toMap
    assert(tabled.keySet == rowLocal.keySet)
    tabled.foreach { case (id, pred) =>
      assert(pred == rowLocal(id), s"doc $id: table=$pred rowLocal=${rowLocal(id)}")
    }
  }
}
