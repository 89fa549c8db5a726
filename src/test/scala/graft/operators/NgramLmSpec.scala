package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.lit

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  /** Independent driver-side reference: same add-one smoothing, same
    * fixed-point floor, plain Scala Maps. */
  private def reference(train: Seq[String], docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long, Long)] = {
    def toks(t: String) = t.split("\\s+").toSeq
    def bigrams(t: String) = { val l = toks(t); l.zip(l.drop(1)) }
    val uni = train.flatMap(toks).groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    val bi = train.flatMap(bigrams).groupBy(identity).map { case (b, o) => b -> o.size.toLong }
    val v = uni.size.toLong
    docs.flatMap { case (id, t) =>
      val bgs = bigrams(t)
      if (bgs.isEmpty) None
      else {
        val ps = bgs.map { case (a, b) =>
          val c12 = bi.getOrElse((a, b), 0L)
          val c1 = uni.getOrElse(a, 0L)
          (math.floor((1e9 * (c12 + 1)) / (c1 + v)).toLong, c12 == 0L)
        }
        val sum = ps.map(_._1).sum
        Some(id -> ((bgs.size.toLong, ps.count(_._2).toLong, sum, sum / bgs.size)))
      }
    }.toMap
  }

  private val train = Seq(
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog")
  private val docs: Seq[(Long, String)] = Seq(
    1L -> "the cat sat on the mat",   // all bigrams in-vocabulary
    2L -> "the cat flew over paris",  // OOV tail
    3L -> "zzz qqq www",              // fully OOV
    4L -> "single")                   // no bigram -> absent from output

  private def run(): Map[Long, (Long, Long, Long, Long)] =
    NgramLm.scoreDocs(train.toDF("text"), docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (id, n, oov, s, sc) => id -> ((n, oov, s, sc)) }.toMap

  test("matches the independent reference on a crafted corpus") {
    assert(run() === reference(train, docs))
  }

  test("in-train document has zero OOV bigrams and the best score") {
    val got = run()
    assert(got(1L)._2 === 0L)
    assert(got(1L)._4 > got(2L)._4 && got(2L)._4 > got(3L)._4,
      "score must fall as OOV mass rises")
  }

  test("single-token documents produce no row (no bigram evidence)") {
    assert(!run().contains(4L))
  }

  test("scores stay in [0, 1e9]") {
    val got = run()
    got.values.foreach { case (_, _, _, sc) =>
      assert(sc >= 0L && sc <= 1000000000L)
    }
  }

  // ---- DSIR-style importance weighting ----

  test("importance weights agree with two independent scoreDocs-style references") {
    val target = Seq("alpha beta gamma", "alpha beta delta", "beta gamma eps")
    val source = Seq("one two three", "two three four", "alpha one two")
    val ds: Seq[(Long, String)] = Seq(
      10L -> "alpha beta gamma",  // target-ish
      20L -> "one two three",     // source-ish
      30L -> "alpha one two")     // mixed
    val got = NgramLm.importanceWeights(
        target.toDF("text"), source.toDF("text"), ds.toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val refT = reference(target, ds)
    val refS = reference(source, ds)
    ds.foreach { case (id, _) =>
      val (nT, _, sumT, scT) = refT(id)
      val (nS, _, sumS, scS) = refS(id)
      assert(nT === nS)
      val (_, n, spt, sps, sct, scs, imp) = got(id)
      assert((n, spt, sps, sct, scs) === ((nT, sumT, sumS, scT, scS)), s"doc $id")
      assert(imp === scT - scS, s"doc $id importance")
    }
    // direction: the target-domain doc up-weights, the source-domain down
    assert(got(10L)._7 > 0L)
    assert(got(20L)._7 < 0L)
  }

  test("factored scoreDocs equals the scoreExploded tail the streaming twin shares") {
    // the equality chain: StreamingLmScore shares scoreExploded
    // verbatim; this pin closes batch-factored ≡ tail, so the twin
    // cannot drift from the oracle-green q155 semantics
    val (bi, uni, v) = NgramLm.modelTables(train.toDF("text"), "text")
    val viaTail = NgramLm.scoreExploded(
        NgramLm.explodeBigrams(docs.toDF("doc_id", "text"), "doc_id", "text"),
        "doc_id", bi, uni, lit(v))
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val factored = NgramLm.scoreDocs(train.toDF("text"),
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(factored === viaTail)
  }

  // ---- order-n Stupid Backoff ----

  /** Independent reference: literal recursive Stupid Backoff over
    * plain Scala Maps, exact-rational fixed point (2^d/5^d). */
  private def referenceBackoff(train: Seq[String], docs: Seq[(Long, String)],
                               n: Int, minCount: Int = 1)
      : Map[Long, (Long, Long, Long, Long)] = {
    def toks(t: String) = t.split("\\s+", -1).toSeq
    def kgrams(t: String, k: Int) = toks(t).sliding(k).filter(_.size == k)
      .map(_.mkString(" ")).toSeq
    val raw: Map[String, Long] = (1 to n).flatMap(k => train.flatMap(kgrams(_, k)))
      .groupBy(identity).map { case (g, o) => g -> o.size.toLong }
    // count-cutoff pruning: orders >= 2 below minCount leave the model;
    // unigrams always stay. A surviving gram's context (its own prefix)
    // always survives too — prefix count >= gram count — so the
    // `counts(ctx)` lookup below stays total under pruning.
    val counts = raw.filter { case (g, c) => !g.contains(" ") || c >= minCount }
    val nTok = train.map(toks(_).size.toLong).sum
    def score(ts: Seq[String]): Long = { // ts = one n-gram's tokens
      var l = n
      while (l >= 2) {
        val c = counts.getOrElse(ts.takeRight(l).mkString(" "), 0L)
        if (c > 0) {
          val d = n - l
          val ctx = counts(ts.slice(n - l, n - 1).mkString(" "))
          return (1000000000L * (1L << d) * c) / (Seq.fill(d)(5L).product * ctx)
        }
        l -= 1
      }
      val d = n - 1
      val c1 = counts.getOrElse(ts.last, 0L)
      (1000000000L * (1L << d) * c1) / (Seq.fill(d)(5L).product * nTok)
    }
    docs.flatMap { case (id, t) =>
      val ng = toks(t).sliding(n).filter(_.size == n).toSeq
      if (ng.isEmpty) None
      else {
        val ss = ng.map(score)
        val oov = ng.count(g => !counts.contains(g.mkString(" ")))
        Some(id -> ((ng.size.toLong, oov.toLong, ss.sum, ss.sum / ng.size)))
      }
    }.toMap
  }

  private def runBackoff(tr: Seq[String], ds: Seq[(Long, String)], n: Int,
                         minCount: Int = 1)
      : Map[Long, (Long, Long, Long, Long)] =
    NgramLm.scoreDocsBackoff(tr.toDF("text"), ds.toDF("doc_id", "text"),
        "doc_id", "text", n, minCount)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (id, g, oov, s, sc) => id -> ((g, oov, s, sc)) }.toMap

  test("stupid backoff matches the independent reference at n=3 (crafted corpus)") {
    val ds: Seq[(Long, String)] = Seq(
      1L -> "the cat sat on the mat",   // full trigrams found, no backoff
      2L -> "the cat sat on my mat",    // backs off mid-sentence
      3L -> "dog the cat jumps qqq",    // down to unigram + OOV floor
      4L -> "zzz qqq www",              // every level misses -> score 0
      5L -> "two words")                // no trigram -> absent
    val got = runBackoff(train, ds, 3)
    assert(got === referenceBackoff(train, ds, 3))
    assert(!got.contains(5L))
    assert(got(4L)._4 === 0L, "all-OOV doc scores exactly 0")
    assert(got(1L)._2 === 0L, "in-train doc has no OOV trigram")
    assert(got(1L)._4 > got(2L)._4 && got(2L)._4 > got(3L)._4)
  }

  test("stupid backoff matches the reference on a random corpus at n=2..5") {
    val rnd = new scala.util.Random(161)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    def sentence() =
      Seq.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val tr = Seq.fill(50)(sentence())
    val ds = (1L to 30L).map(i => i -> sentence())
    (2 to 5).foreach { n =>
      assert(runBackoff(tr, ds, n) === referenceBackoff(tr, ds, n), s"order $n")
    }
  }

  test("count-pruned backoff matches the reference; minCount=1 is the identity") {
    val rnd = new scala.util.Random(166)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    def sentence() =
      Seq.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val tr = Seq.fill(40)(sentence())
    val ds = (1L to 25L).map(i => i -> sentence())
    val unpruned = runBackoff(tr, ds, 3)
    assert(runBackoff(tr, ds, 3, minCount = 1) === unpruned,
      "minCount=1 must be plan-identical to the default")
    Seq(2, 3).foreach { t =>
      val got = runBackoff(tr, ds, 3, minCount = t)
      assert(got === referenceBackoff(tr, ds, 3, minCount = t), s"minCount=$t")
      assert(got !== unpruned,
        s"minCount=$t should drop singleton trigrams on this corpus")
    }
    // a doc whose trigram was seen once: pruned model backs off, so its
    // OOV count can only grow and its score can only move
    val oovUp = ds.map(_._1).forall { id =>
      (got2Oov(runBackoff(tr, ds, 3, minCount = 2), id)
        >= got2Oov(unpruned, id))
    }
    assert(oovUp, "pruning can only increase per-doc OOV counts")
  }

  private def got2Oov(m: Map[Long, (Long, Long, Long, Long)], id: Long): Long =
    m.get(id).map(_._2).getOrElse(0L)

  test("backoff depth d multiplies by exactly (2/5)^d: a found bigram in an " +
      "unseen trigram context scores 0.4x its bigram ratio") {
    // train contains "b c" (once) and unigrams; doc trigram "x b c" has
    // unseen "x b c" and context "x b", so S = 0.4 * c("b c")/c("b")
    val tr = Seq("a b c", "b d e")           // c("b c")=1, c("b")=2
    val ds = Seq(9L -> "x b c")
    val got = runBackoff(tr, ds, 3)
    assert(got(9L)._3 === (1000000000L * 2L * 1L) / (5L * 2L), // 0.4 * 1/2
      "exact-rational 0.4 multiply violated")
  }

  test("matches the reference on a random corpus (weighted repeats)") {
    val rnd = new scala.util.Random(155)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    def sentence() =
      Seq.fill(2 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val tr = Seq.fill(40)(sentence())
    val ds = (1L to 25L).map(i => i -> sentence())
    val got = NgramLm.scoreDocs(tr.toDF("text"), ds.toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (id, n, oov, s, sc) => id -> ((n, oov, s, sc)) }.toMap
    assert(got === reference(tr, ds))
  }

  // ---- interpolated Kneser-Ney ----

  /** Independent KN reference: exact BigInt rationals on the common
    * denominator 4·c(v·)·B, D = 3/4, unseen-context fallback
    * (N1+(·w)+1)/(B+Vc) — plain Scala Maps, no DataFrames. */
  private def referenceKn(train: Seq[String], docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long, Long)] = {
    def toks(t: String) = t.split("\\s+").toSeq
    def bigrams(t: String) = { val l = toks(t); l.zip(l.drop(1)) }
    val bi = train.flatMap(bigrams).groupBy(identity)
      .map { case (b, o) => b -> o.size.toLong }
    val ctxTot = bi.groupBy(_._1._1).map { case (v, m) => v -> m.values.sum }
    val ctxTypes = bi.groupBy(_._1._1).map { case (v, m) => v -> m.size.toLong }
    val contTypes = bi.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val b = bi.size.toLong
    val vc = contTypes.size.toLong
    docs.flatMap { case (id, t) =>
      val bgs = bigrams(t)
      if (bgs.isEmpty) None
      else {
        val ps = bgs.map { case (v, w) =>
          val c12 = bi.getOrElse((v, w), 0L)
          val pe9 = ctxTot.get(v) match {
            case Some(cv) =>
              val num = BigInt(math.max(4L * c12 - 3L, 0L)) * b +
                BigInt(3L) * ctxTypes(v) * BigInt(contTypes.getOrElse(w, 0L))
              (BigInt(1000000000L) * num / (BigInt(4L) * cv * b)).toLong
            case None =>
              (BigInt(1000000000L) * (contTypes.getOrElse(w, 0L) + 1L) /
                BigInt(b + vc)).toLong
          }
          (pe9, c12 == 0L)
        }
        val sum = ps.map(_._1).sum
        Some(id -> ((bgs.size.toLong, ps.count(_._2).toLong, sum, sum / bgs.size)))
      }
    }.toMap
  }

  private def runKn(tr: Seq[String], ds: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long, Long)] =
    NgramLm.scoreDocsKneserNey(tr.toDF("text"), ds.toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (id, n, oov, s, sc) => id -> ((n, oov, s, sc)) }.toMap

  test("Kneser-Ney matches the independent reference on the crafted corpus") {
    assert(runKn(train, docs) === referenceKn(train, docs))
  }

  test("Kneser-Ney matches the reference on a random corpus") {
    val rnd = new scala.util.Random(173)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    def sentence() =
      Seq.fill(2 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val tr = Seq.fill(50)(sentence())
    val ds = (1L to 30L).map(i => i -> sentence())
    assert(runKn(tr, ds) === referenceKn(tr, ds))
  }

  test("the continuation count drives unseen-bigram mass (the Francisco effect)") {
    // 'francisco' is FREQUENT but occurs after a single context;
    // 'cup' is rarer but follows four distinct contexts. After an
    // unseen context both bigrams are unseen — KN gives the
    // diverse-context continuation MORE mass, the reverse of raw
    // unigram frequency (the discrimination add-one cannot make).
    val tr = Seq.fill(6)("san francisco") ++
      Seq("tea cup", "coffee cup", "paper cup", "metal cup")
    val got = runKn(tr, Seq(1L -> "unseen francisco", 2L -> "unseen cup"))
    assert(got(1L)._2 === 1L && got(2L)._2 === 1L, "both bigrams must be OOV")
    assert(got(2L)._4 > got(1L)._4,
      "4-context 'cup' must out-score 1-context 'francisco' despite 6 raw occurrences")
  }
}
