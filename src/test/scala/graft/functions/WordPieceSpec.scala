package graft.functions

import graft.SparkSpec

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference trainer: naive recount per round, EXACT
    * rational score comparison (cross-multiplied BigInt — no
    * fixed-point), ties by code-point (a, b). Agreement with
    * WordPiece.train also pins that the 10^18 floor key never
    * coarsens the selection on these corpora. */
  private def referenceTrain(corpus: Seq[String], k: Int): Seq[(String, String)] = {
    var words: Seq[(Vector[String], Long)] = corpus
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).toSeq
      .map { case (w, o) => (WordPiece.seedUnits(w), o.size.toLong) }
    val merges = Seq.newBuilder[(String, String)]
    var r = 0
    var done = false
    while (r < k && !done) {
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val units = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (ps, f) =>
        ps.foreach(u => units.update(u, units.getOrElse(u, 0L) + f))
        ps.sliding(2).filter(_.size == 2).foreach { s =>
          val key = (s(0), s(1))
          pairs.update(key, pairs.getOrElse(key, 0L) + f)
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val best = pairs.toSeq.map { case ((a, b), n) =>
          (a, b, BigInt(n), BigInt(units(a)) * BigInt(units(b)))
        }.reduceLeft { (x, y) =>
          val cmp = (y._3 * x._4).compare(x._3 * y._4) // exact rational
          if (cmp > 0) y
          else if (cmp < 0) x
          else {
            val ca = BpeTokenizer.codePointOrder.compare(y._1, x._1)
            if (ca < 0 || (ca == 0 &&
                BpeTokenizer.codePointOrder.compare(y._2, x._2) < 0)) y else x
          }
        }
        merges += ((best._1, best._2))
        words = words.map { case (ps, f) => (WordPiece.fuse(ps, best._1, best._2), f) }
      }
      r += 1
    }
    merges.result()
  }

  test("likelihood-ratio selection differs from raw pair frequency: the " +
      "surprising pair beats the merely frequent one") {
    // (a,##a): n=10, units 10*10 -> score 0.10; (b,##c): n=9, 9*9 -> 0.111
    val corpus = Seq.fill(10)("aa") ++ Seq.fill(9)("bc")
    val wp = WordPiece.train(corpus.toDF("text"), "text", 1)
    assert(wp === Seq(("b", "##c")), "WordPiece picks the higher-lift pair")
    val bpe = BpeTokenizer.train(corpus.toDF("text"), "text", 1)
    assert(bpe === Seq(("a", "a")), "BPE picks the more frequent pair")
  }

  test("matches the exact-rational reference on random corpora (the " +
      "10^18 floor key never coarsens the pick)") {
    val rnd = new scala.util.Random(169)
    (0 until 3).foreach { trial =>
      val vocab = Vector("ab", "abc", "bca", "ca", "aabb", "cab", "bb", "c")
      val corpus = Seq.fill(120)(
        Seq.fill(1 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val got = WordPiece.train(corpus.toDF("text"), "text", 12)
      assert(got === referenceTrain(corpus, 12), s"trial $trial")
    }
  }

  test("local and distributed regimes learn identical merges") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("spark", "scala", "shuffle", "scan", "sort", "skew")
    val corpus = Seq.fill(80)(
      Seq.fill(1 + rnd.nextInt(4))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val df = corpus.toDF("text")
    val local = WordPiece.train(df, "text", 10)
    val dist = WordPiece.train(df, "text", 10, localVocabMax = 0)
    assert(local === dist)
  }

  test("## bookkeeping: continuation parts stay ##-prefixed through " +
      "merges; fusing strips exactly the right part's marker") {
    assert(WordPiece.seedUnits("abc") === Vector("a", "##b", "##c"))
    assert(WordPiece.fuse(Vector("a", "##b", "##c"), "a", "##b")
      === Vector("ab", "##c"))
    assert(WordPiece.fuse(Vector("ab", "##c"), "ab", "##c") === Vector("abc"))
    assert(WordPiece.fuse(Vector("##b", "##c", "##b", "##c"), "##b", "##c")
      === Vector("##bc", "##bc"), "continuation-continuation keeps the left ##")
    // a literal '#' character in the data is just another code point
    assert(WordPiece.seedUnits("a#") === Vector("a", "###"))
    assert(WordPiece.fuse(Vector("a", "###"), "a", "###") === Vector("a#"))
  }

  test("greedy longest-match encoding (the BERT rule), incl. [UNK]") {
    val vocab = Set("un", "##aff", "##able", "##ffa", "aff", "a", "##n")
    assert(WordPiece.encodeWord("unaffable", vocab)
      === Vector("un", "##aff", "##able"))
    assert(WordPiece.encodeWord("an", vocab) === Vector("a", "##n"))
    assert(WordPiece.encodeWord("unz", vocab) === Vector("[UNK]"),
      "unmatchable remainder collapses the whole word")
    assert(WordPiece.encodeWord("aff", vocab) === Vector("aff"),
      "word-initial match never takes a ## entry")
  }

  test("a trained vocab round-trips its own training words") {
    val corpus = Seq.fill(30)("spark shuffle") ++ Seq.fill(20)("scala")
    val df = corpus.toDF("text")
    val merges = WordPiece.train(df, "text", 15)
    val words = corpus.flatMap(_.split(" ")).distinct
    val vocab = WordPiece.vocabFrom(words, merges)
    words.foreach { w =>
      val enc = WordPiece.encodeWord(w, vocab)
      assert(enc.nonEmpty && enc != Vector("[UNK]"), w)
      assert(enc.head + enc.tail.map(_.stripPrefix("##")).mkString === w, w)
    }
  }

  test("byte-level seeding rides the GPT-2 byte table") {
    val u = WordPiece.seedUnits(" a", byteLevel = true)
    assert(u.head === "Ġ", "space maps to the printable byte alias")
    assert(u(1) === "##a")
  }

  test("encodeStats ≡ per-word encodeWord fold (stats, unk accounting, empties)") {
    val docs = Seq(
      (1L, "hugging huggable hub"),
      (2L, ""),
      (3L, "  zz  qq hugging  "),
      (4L, "hug"))
    val merges = WordPiece.train(docs.toDF("doc_id", "text"), "text", 4)
    val vocab = WordPiece.vocabFrom(
      docs.flatMap(_._2.split("\\s+")).filter(_.nonEmpty), merges)
    val expected = docs.map { case (id, text) =>
      val ws = text.split("\\s+").filter(_.nonEmpty)
      val encs = ws.map(w => WordPiece.encodeWord(w, vocab))
      id -> ((ws.length.toLong, encs.map(_.length.toLong).sum,
        encs.count(e => e.length == 1 && e.head == "[UNK]").toLong))
    }.toMap
    val got = WordPiece
      .encodeStats(docs.toDF("doc_id", "text"), "doc_id", "text", merges)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
    assert(got === expected)
    assert(got(2L) === ((0L, 0L, 0L)))
  }

  test("bounded greedy window ≡ unbounded encode on random words " +
      "(the r10 maxPieceLen fast path is exact)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abco🌟" // incl. a supplementary char
    def randWord(n: Int): String =
      Seq.fill(n)(alphabet.charAt(rnd.nextInt(4)).toString)
        .mkString + (if (rnd.nextBoolean()) "🌟" else "")
    val corpus = Seq.fill(60)(randWord(1 + rnd.nextInt(12)))
    val merges = Seq.tabulate(6) { i =>
      // fabricate plausible merges from seeds so fused pieces exist
      val w = corpus(i * 3); val u = WordPiece.seedUnits(w)
      if (u.length >= 2) (u(0), u(1)) else ("a", "##b")
    }
    val vocab = WordPiece.vocabFrom(corpus, merges)
    val bound = WordPiece.maxPieceLen(vocab)
    assert(bound >= 1)
    for (w <- corpus ++ Seq("zzzzzz", "", "🌟🌟🌟")) {
      assert(WordPiece.encodeWord(w, vocab, bound) ===
        WordPiece.encodeWord(w, vocab))
    }
    // a vocab-external long word still [UNK]s identically
    assert(WordPiece.encodeWord("qqqq", vocab, bound) === Vector("[UNK]"))
  }

  test("trainAndVocab: vocabulary comes from the TRAINING corpus and " +
      "equals vocabFrom(train words, merges) (r9 ADVICE)") {
    import spark.implicits._
    val train = Seq("abab abab cd", "abab cd cd").toDF("text")
    val (merges, vocab) = WordPiece.trainAndVocab(train, "text", 3)
    val words = Seq("abab", "cd")
    assert(vocab === WordPiece.vocabFrom(words, merges))
    assert(merges === WordPiece.train(train, "text", 3))
    // encode of a DIFFERENT corpus through the explicit vocab does NOT
    // absorb the encode corpus's charset: 'xy' is un-tileable → [UNK]
    val enc = WordPiece
      .encodeStats(Seq((1L, "abab xy")).toDF("doc_id", "text"),
        "doc_id", "text", vocab)
      .as[(Long, Long, Long, Long)].collect().head
    assert(enc === ((1L, 2L, /* abab pieces + [UNK] */ enc._3, 1L)))
    // the merges-overload on the encode df WOULD have tiled 'xy' from
    // its own charset — the documented trap this overload avoids
  }
}
