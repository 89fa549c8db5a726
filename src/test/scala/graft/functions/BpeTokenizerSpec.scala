package graft.functions

import graft.SparkSpec

class BpeTokenizerSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(pairs: (String, String)*): Map[(String, String), Int] =
    pairs.zipWithIndex.toMap

  test("golden: the GPT-2 textbook walk") {
    // merges in priority order: (l,o) -> (lo,w) -> (e,r)
    val r = ranks(("l", "o"), ("lo", "w"), ("e", "r"))
    assert(BpeTokenizer.encodeWord("lower", r) === Vector("low", "er"))
    assert(BpeTokenizer.encodeWord("low", r) === Vector("low"))
    assert(BpeTokenizer.encodeWord("lowlow", r) === Vector("low", "low"))
  }

  test("rank priority beats position: the global-lowest pair fuses first") {
    // (e,r) outranks (l,o) here — "lower" must fuse er before lo
    val r = ranks(("e", "r"), ("l", "o"), ("lo", "w"))
    assert(BpeTokenizer.encodeWord("lower", r) === Vector("low", "er"))
    // and a chain that only exists if er fused first
    val r2 = ranks(("e", "r"), ("w", "er"))
    assert(BpeTokenizer.encodeWord("wer", r2) === Vector("wer"))
  }

  test("leftmost occurrence wins on equal rank; overlaps resolve left-first") {
    val r = ranks(("a", "a"))
    // "aaaa": fuse leftmost -> aa,a,a -> again leftmost pair (a,a) at the
    // tail (aa,aa has no rank) -> aa,aa
    assert(BpeTokenizer.encodeWord("aaaa", r) === Vector("aa", "aa"))
    assert(BpeTokenizer.encodeWord("aaa", r) === Vector("aa", "a"))
  }

  test("no merges -> characters; empty word -> empty") {
    assert(BpeTokenizer.encodeWord("abc", Map.empty) === Vector("a", "b", "c"))
    assert(BpeTokenizer.encodeWord("", ranks(("a", "b"))) === Vector.empty)
  }

  test("subword count is monotone: more merges never increase it") {
    val words = Seq("lower", "slowest", "low", "wow", "error")
    val m = Seq(("l", "o"), ("lo", "w"), ("e", "r"), ("er", "r"), ("s", "low"))
    for (k <- 0 until m.size) {
      val a = words.map(w => BpeTokenizer.encodeWord(w, m.take(k).zipWithIndex.toMap).size).sum
      val b = words.map(w => BpeTokenizer.encodeWord(w, m.take(k + 1).zipWithIndex.toMap).size).sum
      assert(b <= a, s"adding merge ${m(k)} increased token count")
    }
  }

  test("subwordStats over a corpus: counts and unknown-char signal") {
    val df = Seq(
      (1L, "lower low"),
      (2L, "zzz"),
      (3L, ""),
      (4L, "  lower  ")).toDF("doc_id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"))
    val got = BpeTokenizer.subwordStats(df, "doc_id", "text", merges)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // "lower" -> low+er (2 subwords, 0 single-char), "low" -> 1
    assert(got(1L) === (2L, 3L, 0L))
    // "zzz" -> z z z: 3 single-char unknowns
    assert(got(2L) === (1L, 3L, 3L))
    assert(got(3L) === (0L, 0L, 0L))
    assert(got(4L) === (1L, 2L, 0L), "whitespace-padded text: one word")
  }
}
