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

  test("winnowing fingerprints survive local edits; whole-doc hash does not") {
    val original = "the quick brown fox jumps over the lazy dog " * 6
    val edited = original.replace("lazy dog", "sleepy cat") // one local edit
    val df = Seq((1L, original), (2L, edited)).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowingFingerprints(df, "doc_id", "text", k = 8, w = 4)
      .as[(Long, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val a = fps(1L); val b = fps(2L)
    val overlap = (a & b).size.toDouble / (a | b).size
    assert(overlap > 0.5, s"edited doc must share most fingerprints: $overlap")
    assert(a != b, "but not all of them")
    // the whole-document fingerprint sees them as completely different
    val whole = df.select(TextAnalysis.fingerprint($"text")).as[String].collect()
    assert(whole.distinct.length == 2)
  }

  test("graft_winnow kernel equals the declarative explode/substr/window pipeline") {
    val rnd = new scala.util.Random(5)
    val cases = Seq(
      "", "short", "exactly8", "exactly8c", // below/at/above k=8 chars
      "abcdefghijk", // grams exist but fewer than w=4 windows
      "née Müller über alles ϕϑ ω and some ascii tail to make grams",
      "aaaaaaaaaaaaaaaaaaaaaa" // constant text: all gram hashes tie
    ) ++ (1 to 40).map(_ => (1 to rnd.nextInt(30)).map(_ =>
      Seq("fox", "dog", "née", "42").apply(rnd.nextInt(4))).mkString(" "))
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val kernel = TextAnalysis.winnowingFingerprints(df, "doc_id", "text", 8, 4)
    val declar = TextAnalysis.winnowingFingerprintsDeclarative(df, "doc_id", "text", 8, 4)
    assert(kernel.exceptAll(declar).isEmpty && declar.exceptAll(kernel).isEmpty)
  }

  test("graft_text_metrics equals the declarative token/char/bpe columns") {
    val rnd = new scala.util.Random(23)
    val cases = Seq("", " ", "  ", "a", " a b ", "abc123, def!", "a-b_c", "42",
      "née über ϕϑ 𝄞clef mixed", "tab\tsep\nnewline\rcr", "x" * 500) ++
      (1 to 40).map(_ => (1 to rnd.nextInt(30)).map(_ =>
        Seq("fox", "42", "a,b", "né!", "_")(rnd.nextInt(5))).mkString(" "))
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val m = col("__m")
    val kernel = df.withColumn("__m", call_function("graft_text_metrics", col("text")))
      .select(col("doc_id"),
        element_at(m, 1).cast("int").as("n_tokens"),
        element_at(m, 2).as("content_chars"),
        element_at(m, 3).cast("int").as("bpe_tokens"),
        element_at(m, 4).cast("int").as("n_chars"))
    val declar = df.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      TextAnalysis.contentCharsOf(col("text")).as("content_chars"),
      TextAnalysis.bpeishTokenCount(col("text")).as("bpe_tokens"),
      length(col("text")).as("n_chars"))
    assert(kernel.exceptAll(declar).isEmpty && declar.exceptAll(kernel).isEmpty)
  }

  test("explode(graft_shingles) equals the shingleRows window pipeline") {
    val rnd = new scala.util.Random(29)
    val words = Seq("fox", "dog", "née", "42", "the")
    val cases = Seq("", " ", "one two", "one two three", " lead", "trail ",
      "tab\tsep here now", "a b c d e") ++ (1 to 30).map(_ =>
      (1 to rnd.nextInt(20)).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val kernel = df.select(col("doc_id").as("id"),
      explode(call_function("graft_shingles", col("text"), lit(3))).as("shingle"))
    val declar = TextAnalysis.shingleRows(df, "doc_id", "text", 3)
      .filter(col("shingle").isNotNull)
    assert(kernel.exceptAll(declar).isEmpty && declar.exceptAll(kernel).isEmpty)
  }

  test("graft_shingle_count equals the explode/countDistinct pipeline") {
    val rnd = new scala.util.Random(17)
    val words = Seq("fox", "dog", "née", "42", "the")
    val cases = Seq("", " ", "  ", "one two", "one two three",
      " leading space", "trailing space ", "tab\tand\nnewline seps here",
      "dup dup dup dup dup") ++ (1 to 40).map(_ =>
      (1 to rnd.nextInt(25)).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val kernel = df.select(col("doc_id"),
      call_function("graft_shingle_count", col("text"), lit(3)).as("n"))
    val declar = TextAnalysis.shingleRows(df, "doc_id", "text", 3)
      .groupBy(col("id").as("doc_id"))
      .agg(countDistinct(col("shingle")).as("n"))
    assert(kernel.exceptAll(declar).isEmpty && declar.exceptAll(kernel).isEmpty)
  }

  test("bpeishTokenCount splits letter/digit/punct runs like a pre-tokenizer") {
    val rows = Seq("abc123, def!", "  ", "a-b_c", "42").toDF("text")
      .select(TextAnalysis.bpeishTokenCount($"text")).as[Int].collect()
    // "abc","123",",","def","!" = 5; "" = 0; "a","-","b","_","c" = 5; "42" = 1
    assert(rows.toSeq == Seq(5, 0, 5, 1))
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
