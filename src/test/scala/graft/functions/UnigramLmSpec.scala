package graft.functions

import graft.SparkSpec

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  // ---- IntLog2 ----

  test("ilog2e16 is exact on powers of two and within 3 ULP elsewhere") {
    (0 to 62).foreach { k =>
      assert(IntLog2.ilog2e16(1L << k) === k.toLong << 16, s"2^$k")
    }
    val rnd = new scala.util.Random(175)
    (1 to 500).foreach { _ =>
      val x = math.abs(rnd.nextLong() % (1L << 50)) + 1
      val got = IntLog2.ilog2e16(x)
      val real = math.log(x.toDouble) / math.log(2.0) * 65536.0
      assert(math.abs(got - real) < 3.0, s"x=$x got=$got real=$real")
    }
  }

  test("ilog2e16 is monotone non-decreasing") {
    val xs = (1L to 2000L) ++ Seq(1L << 40, (1L << 40) + 1, Long.MaxValue)
    xs.sliding(2).foreach { case Seq(a, b) =>
      assert(IntLog2.ilog2e16(a) <= IntLog2.ilog2e16(b), s"$a vs $b")
    }
  }

  // ---- Viterbi vs brute-force enumeration ----

  /** Fully independent reference: enumerate EVERY segmentation, pick
    * the min by the composite (cost, pieces, joined-seg) order. */
  private def bruteBest(word: String, costs: Map[String, Long],
                        m: Int): Option[Vector[String]] = {
    val cps = BpeTokenizer.codePoints(word)
    def segs(from: Int): Seq[List[String]] =
      if (from == cps.length) Seq(Nil)
      else (1 to math.min(m, cps.length - from)).flatMap { l =>
        val p = cps.slice(from, from + l).mkString
        if (costs.contains(p)) segs(from + l).map(p :: _) else Nil
      }
    val all = segs(0)
    if (all.isEmpty) None
    else Some(all.map { s =>
      (s.map(costs).sum, s.length, s.mkString("\u001f"), s)
    }.minBy { case (c, n, j, _) => (c, n, j) }(
      Ordering.Tuple3(Ordering.Long, Ordering.Int,
        BpeTokenizer.codePointOrder))._4.toVector)
  }

  test("viterbi equals brute-force enumeration on random cost tables") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcd"
    (1 to 200).foreach { _ =>
      val word = Seq.fill(1 + rnd.nextInt(10))(alpha(rnd.nextInt(4))).mkString
      // price all single chars + random multi pieces (ties likely: few
      // distinct cost values)
      val singles = alpha.map(c => c.toString -> (1L + rnd.nextInt(3)) * 100L)
      val multis = (1 to 8).map { _ =>
        val s = Seq.fill(2 + rnd.nextInt(3))(alpha(rnd.nextInt(4))).mkString
        s -> (1L + rnd.nextInt(3)) * 100L
      }
      val costs = (singles ++ multis).toMap
      assert(UnigramLm.viterbi(word, costs, 4) === bruteBest(word, costs, 4).get,
        s"word=$word costs=$costs")
    }
  }

  // ---- training: independent reference over the whole loop ----

  /** Independent trainer: same definition, structurally different code
    * (brute-force segmentation, eager maps, no DataFrames). */
  private def refTrain(corpus: Seq[String], m: Int, rounds: Int,
                       seedSize: Int, vocabSize: Int,
                       maxWordLen: Int): Seq[(String, Long)] = {
    val ord = BpeTokenizer.codePointOrder
    def cpl(s: String) = s.codePointCount(0, s.length)
    val words = corpus.flatMap(_.split("\\s+")).filter(w =>
      w.nonEmpty && cpl(w) <= maxWordLen)
      .groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    val seedCounts = words.toSeq.flatMap { case (w, f) =>
      UnigramLm.substrings(w, m).map(_ -> f)
    }.groupBy(_._1).map { case (p, o) => p -> o.map(_._2).sum }
    val (s1, sm) = seedCounts.toSeq.partition { case (p, _) => cpl(p) == 1 }
    var vocab = (s1 ++ sm.sortWith { case ((pa, ca), (pb, cb)) =>
      if (ca != cb) ca > cb else ord.compare(pa, pb) < 0
    }.take(seedSize)).toMap
    (1 to rounds).foreach { _ =>
      val t = IntLog2.ilog2e16(vocab.values.sum)
      val costs = vocab.map { case (p, c) => p -> (t - IntLog2.ilog2e16(c)) }
      val usage = words.toSeq.flatMap { case (w, f) =>
        bruteBest(w, costs, m).get.map(_ -> f)
      }.groupBy(_._1).map { case (p, o) => p -> o.map(_._2).sum }
      vocab = vocab.flatMap { case (p, _) =>
        val u = usage.getOrElse(p, 0L)
        if (cpl(p) == 1) Some(p -> math.max(u, 1L))
        else if (u > 0) Some(p -> u) else None
      }
    }
    val (f1, fm) = vocab.toSeq.partition { case (p, _) => cpl(p) == 1 }
    val kept = f1 ++ fm.sortWith { case ((pa, ca), (pb, cb)) =>
      if (ca != cb) ca > cb else ord.compare(pa, pb) < 0
    }.take(math.max(0, vocabSize - f1.size))
    kept.sortWith { case ((pa, ca), (pb, cb)) =>
      if (ca != cb) ca > cb else ord.compare(pa, pb) < 0
    }
  }

  private val crafted = Seq(
    "the cat sat on the mat the cat",
    "ababab ababab abab",
    "running jumping walking",
    "the dog ran")

  test("train matches the independent brute-force trainer (crafted corpus)") {
    val got = UnigramLm.train(crafted.toDF("text"), "text",
      m = 4, rounds = 2, seedSize = 30, vocabSize = 20, maxWordLen = 16)
    val ref = refTrain(crafted, 4, 2, 30, 20, 16)
    assert(got === ref)
  }

  test("train matches the reference on a random corpus") {
    val rnd = new scala.util.Random(175)
    val alpha = "abcde"
    def word() = Seq.fill(1 + rnd.nextInt(8))(alpha(rnd.nextInt(5))).mkString
    val corpus = Seq.fill(60)(Seq.fill(3 + rnd.nextInt(6))(word()).mkString(" "))
    val got = UnigramLm.train(corpus.toDF("text"), "text",
      m = 4, rounds = 3, seedSize = 40, vocabSize = 25, maxWordLen = 16)
    assert(got === refTrain(corpus, 4, 3, 40, 25, 16))
  }

  test("local and distributed regimes agree") {
    val local = UnigramLm.train(crafted.toDF("text"), "text",
      m = 4, rounds = 2, seedSize = 30, vocabSize = 20)
    val dist = UnigramLm.train(crafted.toDF("text"), "text",
      m = 4, rounds = 2, seedSize = 30, vocabSize = 20, localVocabMax = 0)
    assert(local === dist)
  }

  test("every corpus word stays coverable and single-cp pieces never leave") {
    val vocab = UnigramLm.train(crafted.toDF("text"), "text",
      m = 4, rounds = 2, seedSize = 30, vocabSize = 8).toMap
    val chars = crafted.flatMap(_.split("\\s+")).flatMap(
      BpeTokenizer.codePoints(_)).toSet
    chars.foreach(c => assert(vocab.contains(c), s"char '$c' pruned"))
    val t = IntLog2.ilog2e16(vocab.values.sum)
    val costs = vocab.map { case (p, c) => p -> (t - IntLog2.ilog2e16(c)) }
    crafted.flatMap(_.split("\\s+")).filter(_.nonEmpty).foreach { w =>
      UnigramLm.viterbi(w, costs, 4) // must not throw
    }
  }

  test("repetitive corpus promotes a multi-cp piece into the final vocabulary") {
    val corpus = Seq.fill(20)("ababab ababab")
    val vocab = UnigramLm.train(corpus.toDF("text"), "text",
      m = 4, rounds = 2, seedSize = 10, vocabSize = 6)
    assert(vocab.exists { case (p, _) => p.length > 1 && p.startsWith("ab") },
      s"expected an 'ab*' piece in $vocab")
  }

  test("encodeStats matches a brute-force per-doc encode under the trained vocab") {
    val docs = crafted.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      Seq((99L, "supercalifragilisticexpialidocious tiny"), (100L, ""))
    val vocab = UnigramLm.train(crafted.toDF("text"), "text",
      m = 4, rounds = 2, seedSize = 30, vocabSize = 20)
    val t = IntLog2.ilog2e16(vocab.map(_._2).sum)
    val costs = vocab.map { case (p, c) => p -> (t - IntLog2.ilog2e16(c)) }.toMap
    val want = docs.map { case (id, text) =>
      var nw = 0L; var np = 0L; var nc = 0L; var nl = 0L; var nu = 0L
      text.split("\\s+").filter(_.nonEmpty).foreach { w =>
        val len = w.codePointCount(0, w.length)
        if (len > 16) nl += 1
        else bruteBest(w, costs, 4) match {
          case Some(ps) => nw += 1; np += ps.size; nc += len
          case None => nu += 1
        }
      }
      id -> ((nw, np, nc, nl, nu))
    }.toMap
    val got = UnigramLm.encodeStats(docs.toDF("doc_id", "text"),
        "doc_id", "text", vocab, m = 4, maxWordLen = 16)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map { case (id, a, b, c, dd, e) => id -> ((a, b, c, dd, e)) }.toMap
    assert(got === want)
    assert(want(99L)._4 === 1L, "the 34-char word must count as long")
    // doc 99's 'tiny' has chars outside the crafted training corpus ->
    // uncoverable -> unk... unless covered; assert via the reference
    assert(got(99L) === want(99L))
  }

  test("vocabSize bounds the multi-cp pieces kept (singles exempt)") {
    val corpus = Seq("abcdefgh abcd efgh abcdefgh")
    val vocab = UnigramLm.train(corpus.toDF("text"), "text",
      m = 4, rounds = 1, seedSize = 50, vocabSize = 10)
    val singles = vocab.count(_._1.length == 1)
    assert(vocab.size <= math.max(10, singles))
  }
}
