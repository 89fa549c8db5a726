package graft.functions

import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.SparkSpec

/** [[BpeTokenizer.train]] pinned against the INDEPENDENT trainer in
  * `tools/gen_bpe_golden.py` (classic BPE: fuse the globally most
  * frequent adjacent pair, ties lexicographic by CODE POINT,
  * instance-weighted) on five corpora: English text with natural word
  * repeats, overlap-heavy repeats, supplementary-character words, a
  * 300-word randomized corpus, and a PUA-vs-supplementary tie corpus
  * (r8 ADVICE). Both training regimes are pinned: the local (collected
  * histogram) path on every corpus and the distributed per-round
  * aggregate path (forced with `localVocabMax = 0`) on three of them —
  * the SetSimJoin both-paths convention.
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private case class TrainGolden(name: String, corpus: Seq[String], n: Int,
                                 merges: Seq[(String, String)])

  private def goldens(): Seq[TrainGolden] = {
    val in = getClass.getResourceAsStream("/golden/bpe_golden.jsonl")
    require(in != null, "missing fixture — run tools/gen_bpe_golden.py")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val lines = try src.getLines().filter(_.nonEmpty)
      .map(JsonMethods.parse(_)).toList finally src.close()
    lines.collect {
      case o: JObject if (o \ "train") != JNothing =>
        val corpus = (o \ "corpus") match {
          case JArray(ws) => ws.map { case JString(s) => s
            case other => sys.error(s"non-string $other") }
          case other => sys.error(s"bad corpus $other")
        }
        val merges = (o \ "merges") match {
          case JArray(ps) => ps.map {
            case JArray(List(JString(a), JString(b))) => (a, b)
            case other => sys.error(s"bad pair $other") }
          case other => sys.error(s"bad merges $other")
        }
        TrainGolden((o \ "train").values.toString, corpus,
          (o \ "n").values.toString.toInt, merges)
    }
  }

  test("local path matches the independent trainer on all five corpora") {
    val gs = goldens()
    assert(gs.size === 5)
    gs.foreach { g =>
      val df = g.corpus.toDF("text")
      val got = BpeTokenizer.train(df, "text", g.n)
      assert(got === g.merges, s"corpus ${g.name}")
    }
  }

  test("distributed path (forced) matches the golden tables") {
    // the three short tables keep the per-round job count test-friendly;
    // train_surrogate_tie pins the tie-break on BOTH paths (r8 ADVICE:
    // the local path's UTF-16 minBy diverged from the distributed
    // path's UTF8String binary order on supplementary-vs-PUA ties)
    goldens().filter(g => Set("train_repeats", "train_emoji",
        "train_surrogate_tie")(g.name))
      .foreach { g =>
        val got = BpeTokenizer.train(g.corpus.toDF("text"), "text", g.n,
          localVocabMax = 0)
        assert(got === g.merges, s"corpus ${g.name} (distributed)")
      }
  }

  test("tie-break is code-point order, not UTF-16 order (r8 ADVICE)") {
    // U+E001 (PUA, one UTF-16 unit 0xE001) vs U+10000 (surrogate pair
    // starting 0xD800): code-point order says E001 < 10000; UTF-16
    // code-unit order says the opposite. With both pairs tied at one
    // occurrence the trainer must pick the PUA pair first.
    val corpus = Seq("\uE001\uE001", "\uD800\uDC00\uD800\uDC00")
    val merges = BpeTokenizer.train(corpus.toDF("text"), "text", 1)
    assert(merges === Seq(("\uE001", "\uE001")))
    // and the ordering helper itself
    val o = BpeTokenizer.codePointOrder
    assert(o.compare("\uE001", "\uD800\uDC00") < 0)
    assert(o.compare("a", "ab") < 0)   // prefix sorts first
    assert(o.compare("b", "a") > 0)
    assert(o.equiv("\uD800\uDC00", "\uD800\uDC00"))
  }

  test("training stops early when pairs are exhausted") {
    val merges = BpeTokenizer.train(Seq("ab", "ab").toDF("text"), "text", 10)
    assert(merges === Seq(("a", "b")))
    assert(BpeTokenizer.train(Seq("x").toDF("text"), "text", 5) === Seq())
  }

  test("instance weighting: a repeated word outvotes a longer unique one") {
    // 'zz' appears 3 times (3 votes for (z,z)); 'qrs' once (1 vote each)
    val merges = BpeTokenizer.train(
      Seq("zz", "zz", "zz", "qrs").toDF("text"), "text", 1)
    assert(merges === Seq(("z", "z")))
  }

  test("learned tables are VALID and encode-consistent on random corpora") {
    // Validity (each merge's parts are single code points or tokens
    // formed by earlier merges) is the precondition under which the
    // batch fuse and encodeWord's greedy lowest-rank loop are provably
    // equivalent — the property tools/gen_bpe_golden.py asserts in
    // Python for its tables, re-asserted here in Scala for tables the
    // ENGINE learns, across seeds.
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val vocabChars = "abcdefgh"
      val corpus = Seq.fill(60)(
        Seq.fill(1 + rnd.nextInt(9))(vocabChars(rnd.nextInt(vocabChars.size)))
          .mkString)
      val merges = BpeTokenizer.train(corpus.toDF("text"), "text", 25)
      // validity: grow the token set in rank order
      val tokens = scala.collection.mutable.Set[String](
        corpus.flatMap(BpeTokenizer.codePoints(_)): _*)
      merges.foreach { case (a, b) =>
        assert(tokens(a) && tokens(b),
          s"seed $seed: merge ($a, $b) uses a token never formed")
        tokens += (a + b)
      }
      assert(merges.distinct === merges, s"seed $seed: duplicate merge")
      // equivalence: rank-ordered batch fuse == greedy encodeWord
      val ranks = merges.zipWithIndex.toMap
      corpus.distinct.foreach { w =>
        val batch = merges.foldLeft(BpeTokenizer.codePoints(w)) {
          case (ps, (a, b)) => BpeTokenizer.fusePair(ps, a, b)
        }
        assert(BpeTokenizer.encodeWord(w, ranks) === batch,
          s"seed $seed word $w")
      }
    }
  }

  test("learned table round-trips through encodeWord to full words") {
    // after enough merges, every corpus word encodes to a single token
    val corpus = Seq("alpha", "beta", "alpha", "gamma")
    val merges = BpeTokenizer.train(corpus.toDF("text"), "text", 50)
    val ranks = merges.zipWithIndex.toMap
    corpus.distinct.foreach { w =>
      assert(BpeTokenizer.encodeWord(w, ranks) === Vector(w), w)
    }
  }
}
