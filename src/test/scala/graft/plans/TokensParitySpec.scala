package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_tokens must be bit-compatible with split(text, '\\s+') — the
  * token contract every oracle's string_split_regex twin relies on. */
class TokensParitySpec extends SparkSpec {
  import spark.implicits._

  private def both(texts: Seq[String]): Seq[(Seq[String], Seq[String])] = {
    graft.plans.GraftExtensions.ensure(spark)
    texts.toDF("t")
      .select(
        split(col("t"), "\\s+").as("a"),
        call_function("graft_tokens", col("t")).as("b"))
      .as[(Seq[String], Seq[String])].collect().toSeq
  }

  test("edge battery: empties, runs, leading/trailing ws, every \\s byte") {
    val cases = Seq(
      "", " ", "  ", "a", "a b", "a  b", " a", "a ", " a b ", "\ta\nb\r",
      "a\fb", "a\t\n\f\r b", "word", "  multiple   runs  here ")
    both(cases).zip(cases).foreach { case ((a, b), t) =>
      assert(a === b, s"mismatch on ${t.map(_.toInt.toHexString)}")
    }
  }

  test("multi-byte UTF-8 and non-\\s Unicode spaces do not split") {
    val cases = Seq(
      "héllo wörld", "日本語 テスト", "emoji 🎉🎊 mix",
      "nbsp stays", "thin space", "ideographic　space",
      "mixed café au\tlait")
    both(cases).foreach { case (a, b) => assert(a === b) }
    // and the non-breaking space really is one token under BOTH
    // (default Java \s is ASCII-only -- U+00A0 must NOT split)
    assert(both(Seq("x\u00A0y")).head._1 === Seq("x\u00A0y"))
  }

  test("random fuzz corpus") {
    val rnd = new scala.util.Random(7)
    val alphabet = "ab \t\n é日🎉\r\f"
    val cases = Seq.fill(300)(
      (0 until rnd.nextInt(30)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    both(cases).zip(cases).foreach { case ((a, b), t) =>
      assert(a === b, s"mismatch on ${t.map(_.toInt.toHexString)}")
    }
  }

  test("fixture parity: every document tokenizes identically") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    graft.plans.GraftExtensions.ensure(spark)
    val n = docs.filter(
      !(split(col("text"), "\\s+") === call_function("graft_tokens", col("text"))))
      .count()
    assert(n === 0L)
  }
}
