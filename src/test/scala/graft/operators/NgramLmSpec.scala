package graft.operators

import graft.SparkSpec

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
}
