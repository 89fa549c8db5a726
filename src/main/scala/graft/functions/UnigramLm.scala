package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer training (Kudo 2018, "Subword
  * Regularization" — SentencePiece's unigram model): the THIRD major
  * subword family beside [[BpeTokenizer]] (frequency merges) and
  * [[WordPiece]] (likelihood-ratio merges). Where BPE/WordPiece GROW a
  * vocabulary bottom-up one merge at a time, unigram training SHRINKS
  * one: seed with candidate substrings, then alternate (E) best-path
  * Viterbi segmentation of the corpus under current piece likelihoods
  * and (M) re-estimating piece counts from the segmentations, pruning
  * pieces that no longer earn usage.
  *
  * This is the HARD-EM (Viterbi-EM) variant: the E-step uses the single
  * best segmentation, not forward-backward expectations. Soft EM's
  * per-path posterior weights are products of IEEE ratios no two
  * engines sum identically; hard EM's argmax is exactly replayable once
  * the selection rule is engine-portable (Kudo's own sentencepiece
  * exposes exactly this as `--use_viterbi`-style hard EM in spirit; the
  * result is the standard quality/portability trade the repo's
  * hash-exact ruleset mandates throughout).
  *
  * Engine-portable selection: a segmentation's score is the SUM of
  * fixed-point piece costs `cost(p) = ilog2e16(T) − ilog2e16(c_p)`
  * ([[IntLog2]] — exact integer shift-and-square, no transcendental),
  * i.e. ≈ 2^16·(−log2 p(piece)); Viterbi minimizes total cost with the
  * deterministic tie ladder (cost asc, piece-count asc, joined
  * segmentation string code-point asc — the last compare only ever
  * fires between equal-length strings, same characters + same number of
  * US separators, so prefix-extension preserves it and the DP is valid).
  * The q175 oracle replays the ENTIRE training loop in SQL: seed
  * counting, the 16-step ilog2 chain, per-word Viterbi as a recursive
  * -CTE path enumeration, usage re-estimation, pruning — hash-exact.
  *
  * Scale shape (the [[BpeTokenizer.train]] contract): ONE corpus pass
  * builds the distinct-word histogram (map-side combined,
  * vocabulary-bounded; words above `maxWordLen` code points are dropped
  * — SentencePiece's max-piece-length analog and the oracle's
  * enumeration bound). The piece table is vocabulary-bounded
  * (`seedSize` + alphabet) and lives driver-side like KMeans centroids;
  * each EM round broadcasts the cost table, Viterbi-segments the
  * DISTINCT words row-locally, and usage counts come back through one
  * map-side-combined aggregate whose result is a bounded collect.
  * Local/distributed regime split as in BPE/WordPiece, both paths
  * spec-pinned equal; the local top-seed sort uses
  * [[BpeTokenizer.codePointOrder]], NOT Scala's UTF-16 default (the r8
  * ADVICE tie-break lesson).
  */
object UnigramLm {

  private val Sep = "\u001f" // US, matches the oracle's chr(31)

  /** All code-point substrings of length 1..m, one per start position
    * (overlapping occurrences each count — the seed statistic). */
  def substrings(word: String, m: Int): Seq[String] = {
    val cps = BpeTokenizer.codePoints(word)
    for {
      s <- 0 until cps.length
      l <- 1 to math.min(m, cps.length - s)
    } yield cps.slice(s, s + l).mkString
  }

  /** Min-cost segmentation of `word` over `costs` (every single code
    * point of the word must be priced — the training invariant; encode
    * paths handle OOV before calling). Tie ladder: cost asc, piece
    * count asc, joined-segmentation code-point asc. */
  def viterbi(word: String, costs: Map[String, Long], m: Int): Vector[String] = {
    val cps = BpeTokenizer.codePoints(word)
    val n = cps.length
    // dp(i) = best state covering cps[0, i)
    final case class St(cost: Long, np: Int, seg: String, pieces: List[String])
    val dp = new Array[St](n + 1)
    dp(0) = St(0L, 0, "", Nil)
    var i = 1
    while (i <= n) {
      var best: St = null
      var l = 1
      val lMax = math.min(m, i)
      while (l <= lMax) {
        if (dp(i - l) != null) {
          val p = cps.slice(i - l, i).mkString
          costs.get(p) match {
            case Some(c) =>
              val prev = dp(i - l)
              val seg = if (prev.seg.isEmpty) p else prev.seg + Sep + p
              val cand = St(prev.cost + c, prev.np + 1, seg, p :: prev.pieces)
              if (best == null || cand.cost < best.cost ||
                  (cand.cost == best.cost && (cand.np < best.np ||
                   (cand.np == best.np &&
                    BpeTokenizer.codePointOrder.compare(cand.seg, best.seg) < 0))))
                best = cand
            case None =>
          }
        }
        l += 1
      }
      dp(i) = best
      i += 1
    }
    require(dp(n) != null, s"viterbi: '$word' not coverable by the cost table")
    dp(n).pieces.reverse.toVector
  }

  private def costTable(vocab: Map[String, Long]): Map[String, Long] = {
    val t = IntLog2.ilog2e16(vocab.valuesIterator.sum)
    vocab.map { case (p, c) => p -> (t - IntLog2.ilog2e16(c)) }
  }

  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** One M-step: next vocabulary from usage counts. Multi-cp pieces
    * keep their usage (dropped at zero); single-cp pieces never leave
    * (coverage invariant) with count max(usage, 1). */
  private def mStep(vocab: Map[String, Long],
                    usage: Map[String, Long]): Map[String, Long] =
    vocab.flatMap { case (p, _) =>
      val u = usage.getOrElse(p, 0L)
      if (cpLen(p) == 1) Some(p -> math.max(u, 1L))
      else if (u > 0L) Some(p -> u)
      else None
    }

  /** Final prune: every single-cp piece stays; multi-cp pieces ranked
    * (count desc, code-point asc) fill up to `vocabSize`. */
  private def prune(vocab: Map[String, Long], vocabSize: Int): Seq[(String, Long)] = {
    val (singles, multi) = vocab.toSeq.partition { case (p, _) => cpLen(p) == 1 }
    val keepMulti = multi
      .sortWith { case ((pa, ca), (pb, cb)) =>
        if (ca != cb) ca > cb else BpeTokenizer.codePointOrder.compare(pa, pb) < 0
      }
      .take(math.max(0, vocabSize - singles.size))
    (singles ++ keepMulti)
      .sortWith { case ((pa, ca), (pb, cb)) =>
        if (ca != cb) ca > cb else BpeTokenizer.codePointOrder.compare(pa, pb) < 0
      }
  }

  /** Train on `df(textCol)`. Returns the final (piece, count) table in
    * (count desc, piece code-point asc) order. */
  def train(df: DataFrame, textCol: String,
            m: Int = 4, rounds: Int = 2, seedSize: Int = 80,
            vocabSize: Int = 40, maxWordLen: Int = 16,
            localVocabMax: Int = 1 << 20): Seq[(String, Long)] = {
    require(m >= 1 && rounds >= 0 && seedSize >= 0 && vocabSize >= 0)
    val spark = df.sparkSession
    import spark.implicits._
    val hist = df
      .select(explode(split(col(textCol).cast("string"), "\\s+")).as("w"))
      .filter(col("w") =!= "" && length(col("w")) <= maxWordLen)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val head =
      if (localVocabMax > 0) hist.limit(localVocabMax + 1).as[(String, Long)].collect()
      else Array.empty[(String, Long)]
    if (localVocabMax > 0 && head.length <= localVocabMax)
      trainLoop(usageLocal(head), seedLocal(head, m, seedSize),
        m, rounds, vocabSize)
    else {
      val words = hist.localCheckpoint(true)
      try trainLoop(usageDistributed(words), seedDistributed(words, m, seedSize),
        m, rounds, vocabSize)
      finally words.unpersist()
    }
  }

  private def trainLoop(usage: Map[String, Long] => Map[String, Long],
                        seed: Map[String, Long],
                        m: Int, rounds: Int, vocabSize: Int): Seq[(String, Long)] = {
    var vocab = seed
    var r = 0
    while (r < rounds && vocab.nonEmpty) {
      vocab = mStep(vocab, usage(costTable(vocab)))
      r += 1
    }
    prune(vocab, vocabSize)
  }

  /** Seed vocabulary: ALL single code points plus the top `seedSize`
    * multi-cp substrings by (count desc, code-point asc). */
  private def seedLocal(hist: Array[(String, Long)], m: Int,
                        seedSize: Int): Map[String, Long] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    hist.foreach { case (w, f) =>
      substrings(w, m).foreach(p => counts.update(p, counts.getOrElse(p, 0L) + f))
    }
    val (singles, multi) = counts.toSeq.partition { case (p, _) => cpLen(p) == 1 }
    val top = multi.sortWith { case ((pa, ca), (pb, cb)) =>
      if (ca != cb) ca > cb else BpeTokenizer.codePointOrder.compare(pa, pb) < 0
    }.take(seedSize)
    (singles ++ top).toMap
  }

  private def seedDistributed(words: DataFrame, m: Int,
                              seedSize: Int): Map[String, Long] = {
    val spark = words.sparkSession
    import spark.implicits._
    val mm = m
    val counts = words.as[(String, Long)]
      .flatMap { case (w, f) => substrings(w, mm).map(p => (p, f)) }
      .toDF("p", "f")
      .groupBy(col("p")).agg(sum(col("f")).as("cnt"))
    val singles = counts.filter(length(col("p")) === 1)
      .as[(String, Long)].collect()
    // UTF8String binary sort == code-point order (matches the oracle)
    val top = counts.filter(length(col("p")) > 1)
      .orderBy(col("cnt").desc, col("p").asc)
      .limit(seedSize)
      .as[(String, Long)].collect()
    (singles ++ top).toMap
  }

  /** Viterbi encoding of a corpus under a trained vocabulary — the
    * apply side of the train/apply loop (the q148 shape for the unigram
    * family). Fully row-local: the (vocabulary-bounded) cost table
    * broadcasts, each document's words segment where the document
    * lives, zero shuffle, one stat row per document.
    *
    * Words longer than `maxWordLen` code points are counted
    * (`n_long_words`) and skipped — the training cap's apply-side
    * mirror and the oracle's enumeration bound; a word containing a
    * code point the vocabulary cannot cover counts as `n_unk_words`
    * (zero on the training corpus by the single-cp coverage
    * invariant). */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
                  vocab: Seq[(String, Long)], m: Int,
                  maxWordLen: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val t = IntLog2.ilog2e16(vocab.iterator.map(_._2).sum)
    val costs = vocab.map { case (p, c) => p -> (t - IntLog2.ilog2e16(c)) }.toMap
    val bc = spark.sparkContext.broadcast(costs)
    val mm = m
    val cap = maxWordLen
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        // per-partition word memo: Zipfian corpora repeat words heavily,
        // so the DP runs ~once per distinct word per partition (the
        // Brants distinct-gram factoring, kept zero-shuffle)
        val memo = scala.collection.mutable.HashMap.empty[String, (Int, Int)]
        rows.map { case (id, text) =>
          var nw = 0L; var np = 0L; var nc = 0L; var nl = 0L; var nu = 0L
          Option(text).getOrElse("").split("\\s+").iterator
            .filter(_.nonEmpty).foreach { w =>
              val len = w.codePointCount(0, w.length)
              if (len > cap) nl += 1
              else {
                // np > 0: encodable with np pieces; np == -1: unk
                val (pieces, wl) = memo.getOrElseUpdate(w,
                  try { (viterbi(w, bc.value, mm).size, len) }
                  catch { case _: IllegalArgumentException => (-1, len) })
                if (pieces >= 0) { nw += 1; np += pieces; nc += wl }
                else nu += 1
              }
            }
          (id, nw, np, nc, nl, nu)
        }
      }
      .toDF(idCol, "n_words", "n_pieces", "n_chars",
        "n_long_words", "n_unk_words")
  }

  private def usageLocal(hist: Array[(String, Long)])
      : Map[String, Long] => Map[String, Long] = costs => {
    val mFromCosts = costs.keysIterator.map(cpLen).max
    val u = scala.collection.mutable.HashMap.empty[String, Long]
    hist.foreach { case (w, f) =>
      viterbi(w, costs, mFromCosts).foreach(p =>
        u.update(p, u.getOrElse(p, 0L) + f))
    }
    u.toMap
  }

  private def usageDistributed(words: DataFrame)
      : Map[String, Long] => Map[String, Long] = costs => {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(costs)
    val mv = costs.keysIterator.map(cpLen).max
    // row-local Viterbi over distinct words; one map-side-combined
    // aggregate; the collect is bounded by the current vocabulary
    words.as[(String, Long)]
      .flatMap { case (w, f) => viterbi(w, bc.value, mv).map(p => (p, f)) }
      .toDF("p", "f")
      .groupBy(col("p")).agg(sum(col("f")).as("u"))
      .as[(String, Long)].collect().toMap
  }
}
