package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraftRepetitionSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: naive per-order counting over Scala Maps,
    * the Gopher definitions verbatim (top = max count then longest
    * gram; dup = Σ count·len over count ≥ 2; lengths in code points
    * including joining spaces). */
  private def reference(text: String): Seq[Long] = {
    val toks = text.split("\\s+", -1).toSeq
    def grams(n: Int): Seq[String] =
      toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
    def cpLen(s: String): Long = s.codePointCount(0, s.length).toLong
    val top = (2 to 4).map { n =>
      val c = grams(n).groupBy(identity).view.mapValues(_.size.toLong).toMap
      if (c.isEmpty) 0L
      else {
        val mc = c.values.max
        mc * c.collect { case (g, cc) if cc == mc => cpLen(g) }.max
      }
    }
    val dup = (5 to 10).map { n =>
      grams(n).groupBy(identity).collect {
        case (g, occ) if occ.size >= 2 => occ.size.toLong * cpLen(g)
      }.sum
    }
    top ++ dup
  }

  private def run(texts: Seq[String]): Seq[Seq[Long]] =
    texts.toDF("text")
      .select(call_function("graft_repetition", col("text")).as("b"))
      .as[Seq[Long]].collect().toSeq

  test("matches the independent reference on crafted documents") {
    val docs = Seq(
      "spam spam spam spam spam spam spam",            // total repetition
      "a fully unique sentence with no repeats at all", // zero dup mass
      "one two three four five one two three four five one two three four five",
      "x",                                              // single token
      "",                                               // empty
      "  leading and   multiple   spaces  ",            // empty tokens
      "café déjà café déjà café déjà café déjà café déjà café déjà")
    run(docs).zip(docs).foreach { case (got, d) =>
      assert(got === reference(d), s"doc: '$d'")
    }
  }

  test("matches the reference on random corpora (small vocab forces repeats)") {
    val rnd = new scala.util.Random(162)
    val vocab = Vector("a", "bb", "ccc", "dd", "e")
    val docs = Seq.fill(60)(
      Seq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    run(docs).zip(docs).foreach { case (got, d) =>
      assert(got === reference(d), s"doc: '$d'")
    }
  }

  test("boilerplate reads high, unique text reads ~zero (the filter signal)") {
    val spam = "click here to win click here to win click here to win click here to win"
    val clean = "the northern shore holds a quiet light each morning before the gulls arrive"
    val Seq(s, c) = run(Seq(spam, clean))
    // dup5 mass: spam has every 5-gram repeated; clean has none
    assert(s(3) > 0 && c(3) === 0L)
    // top2 FRACTION (mass/chars — Gopher's actual gate unit): spam's
    // dominant bigram covers >50% of the doc, clean's under 20%
    assert(s.head * 2 > spam.length && c.head * 5 < clean.length)
  }

  test("code points, not UTF-16 units: emoji grams measure per code point") {
    // "😀 😀 😀" : top2 gram "😀 😀" = 3 code points (NOT 5 UTF-16 units),
    // count 2 -> mass 6
    val Seq(b) = run(Seq("😀 😀 😀"))
    assert(b.head === 6L)
  }
}
