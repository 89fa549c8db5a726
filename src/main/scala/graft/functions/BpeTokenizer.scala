package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer — the real subword encoder behind the
  * `bpeishTokenCount` estimate (GPT-2-style merge application).
  *
  * Algorithm (the deterministic contract): a word starts as its
  * character sequence; repeatedly find the adjacent pair with the
  * LOWEST merge rank (leftmost occurrence on rank ties) and fuse it;
  * stop when no adjacent pair has a rank. This is exactly the greedy
  * loop GPT-2's encoder runs per word; the merges table is the trained
  * artifact — either an external input (like embeddings) or learned
  * in-engine by [[train]] (round 8).
  *
  * Not SQL-expressible (data-dependent loop), so no DuckDB oracle: the
  * driver records the rows-only check and correctness rides
  * BpeTokenizerSpec's golden cases + properties (the X20/T1/T2
  * precedent for non-oracle operators).
  *
  * Scale shape: the merges table broadcasts once (vocab-sized, the
  * same artifact every worker of a 100 TB tokenization run holds); the
  * encode is a typed `Dataset.map` — row-local, no shuffle; per-word
  * cost is O(len²·lookup) worst case on pathological words, O(len·
  * merges-applied) typical. Word pre-tokenization is the engine's
  * whitespace contract ([[TextAnalysis.tokens]] semantics).
  */
object BpeTokenizer {

  /** A word as its code-point sequence — NOT UTF-16 chars:
    * supplementary characters (emoji, rare CJK) must enter as one unit,
    * not two unpaired surrogate halves (GPT-2's encoder, the cited
    * contract, never produces invalid strings). */
  def codePoints(word: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      b += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    b.result()
  }

  /** GPT-2's byte-to-unicode table, re-derived from the PUBLISHED
    * construction (openai/gpt-2 encoder.py `bytes_to_unicode`): the 188
    * printable latin-1 bytes (0x21-0x7E, 0xA1-0xAC, 0xAE-0xFF) map to
    * themselves; the remaining 68 (controls, space, 0x7F-0xA0, 0xAD)
    * map to U+0100+i in byte-scan order — so EVERY byte is exactly one
    * printable BMP char and byte-level merge tables stay readable,
    * lossless strings (space is the famous "Ġ" = U+0120, newline "Ċ",
    * tab "ĉ"). Byte-level tokens never leave the BMP, so code-point,
    * UTF-16 and UTF-8 byte orderings coincide — the r8 tie-break
    * hazard cannot arise in byte mode. */
  val byteToUnicode: Array[String] = {
    val printable = ((0x21 to 0x7E) ++ (0xA1 to 0xAC) ++ (0xAE to 0xFF)).toSet
    var shift = 0
    (0 until 256).map { b =>
      if (printable(b)) String.valueOf(b.toChar)
      else { val s = String.valueOf((256 + shift).toChar); shift += 1; s }
    }.toArray
  }

  private val unicodeToByte: Map[Char, Int] =
    byteToUnicode.zipWithIndex.map { case (s, b) => s.charAt(0) -> b }.toMap

  /** A word as its UTF-8 BYTE sequence, each byte rendered through
    * [[byteToUnicode]] — GPT-2's actual unit alphabet (its published
    * vocab merges these units, not code points). Every unit is one
    * char; multi-byte characters become several units ("é" -> Ã ©). */
  def byteUnits(word: String): Vector[String] = {
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < bytes.length) { b += byteToUnicode(bytes(i) & 0xFF); i += 1 }
    b.result()
  }

  /** Inverse of [[byteUnits]] on any concatenation of its units — the
    * decode side of GPT-2's byte-level round trip. Throws on a char
    * outside the table (not a byte-level token). */
  def decodeByteLevel(subwords: Seq[String]): String = {
    val joined = subwords.mkString
    val bytes = new Array[Byte](joined.length)
    var i = 0
    while (i < joined.length) {
      bytes(i) = unicodeToByte(joined.charAt(i)).toByte
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Encode one word under `ranks` (pair -> priority; lower fuses
    * first). Returns the subword sequence. `byteLevel = true` merges
    * over [[byteUnits]] instead of [[codePoints]] — the GPT-2 variant
    * whose published vocab round-trips. */
  def encodeWord(word: String, ranks: Map[(String, String), Int],
                 byteLevel: Boolean = false): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    var parts: Vector[String] =
      if (byteLevel) byteUnits(word) else codePoints(word)
    var done = false
    while (!done && parts.size >= 2) {
      var best = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < parts.size - 1) {
        val r = ranks.getOrElse((parts(i), parts(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = i } // leftmost on ties
        i += 1
      }
      if (best < 0 || bestRank == Int.MaxValue) done = true
      else parts = (parts.take(best) :+ (parts(best) + parts(best + 1))) ++
        parts.drop(best + 2)
    }
    parts
  }

  /** Per-document subword statistics: (idCol, n_words, n_subwords,
    * n_unk_chars) where n_unk_chars counts single-character subwords
    * (the fragments no merge covered — the vocabulary-coverage signal a
    * tokenizer rollout watches). Row-local typed map; merges broadcast. */
  def subwordStats(df: DataFrame, idCol: String, textCol: String,
                   merges: Seq[(String, String)],
                   byteLevel: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranks = merges.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val rows: Dataset[(Long, String)] = df
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
    rows.map { case (id, text) =>
      val words = Option(text).getOrElse("")
        .split("\\s+").filter(_.nonEmpty)
      var nSub = 0L
      var nUnk = 0L
      words.foreach { w =>
        val enc = encodeWord(w, bc.value, byteLevel)
        nSub += enc.length
        // single CODE POINT (not single UTF-16 char): a surrogate-pair
        // emoji no merge covered is one unknown, not zero. In byte
        // mode every unit is one BMP char, so the same predicate
        // counts single-BYTE fragments.
        nUnk += enc.count(s => s.codePointCount(0, s.length) == 1)
      }
      (id, words.length.toLong, nSub, nUnk)
    }.toDF(idCol, "n_words", "n_subwords", "n_unk_chars")
  }

  /** Fuse every LEFT-TO-RIGHT NON-OVERLAPPING occurrence of the
    * adjacent pair (a, b) in one pass — the classic BPE training
    * step (and provably what k single-leftmost fuses of the same pair
    * produce; tools/gen_bpe_golden.py makes that argument executable
    * for the encode side). */
  def fusePair(parts: Seq[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < parts.length) {
      if (i < parts.length - 1 && parts(i) == a && parts(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += parts(i); i += 1 }
    }
    out.result()
  }

  /** LEARN a BPE merge table from a corpus — the training half of the
    * tokenizer story (encode/subwordStats apply a given table; a real
    * pipeline must first produce one). Classic BPE (Sennrich et al.
    * 2016; the same loop GPT-2's tables were trained with): repeat
    * `numMerges` times — count every adjacent part pair across the
    * corpus (instance-weighted, adjacency overlap counted), fuse the
    * most frequent pair everywhere (ties: lexicographically smallest
    * (a, b), deterministic across engines — UTF-8 byte order equals
    * code-point order), stop early if no pair remains.
    *
    * Scale shape (the part that matters at 100 TB): the corpus is
    * touched EXACTLY ONCE — a map-side-combined distinct-word
    * histogram (`groupBy(word).count`). Training then runs over the
    * histogram, which is vocabulary-bounded (natural-language vocab
    * ~10^7 no matter the corpus size), in one of two regimes, the
    * [[graft.operators.SetSimJoin]] dictionary pattern:
    *
    *  - **Local** (histogram <= `localVocabMax` rows — one bounded
    *    `limit(max+1).collect()` decides): the k merge rounds run
    *    driver-side over the collected histogram, zero jobs per round
    *    (the Hugging-Face-tokenizers shape). O(k · Σ|word|) worst
    *    case.
    *  - **Distributed** (histogram too large, or `localVocabMax = 0`
    *    to force it — the spec pins both paths equal): per round ONE
    *    map-side-combined pair-count aggregate over the (parts, freq)
    *    table + a 1-row argmax collect + a row-local re-encode map;
    *    k merges = k bounded rounds, lineage truncated per round via
    *    `localCheckpoint` so round r never re-plans rounds 0..r-1.
    *
    * The training loop is representation-agnostic: `byteLevel = true`
    * seeds each word with [[byteUnits]] instead of [[codePoints]] —
    * the GPT-2 byte-level variant — and nothing else changes (both
    * regimes, both pinned against the independent trainer's byte mode).
    *
    * @return the learned merges, rank order (earliest = rank 0) */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            localVocabMax: Int = 1 << 20,
            byteLevel: Boolean = false): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges $numMerges < 0")
    val spark = df.sparkSession
    import spark.implicits._
    val units: String => Vector[String] =
      if (byteLevel) byteUnits else codePoints
    val hist = df
      .select(explode(split(col(textCol).cast("string"), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val head =
      if (localVocabMax > 0) hist.limit(localVocabMax + 1)
        .as[(String, Long)].collect()
      else Array.empty[(String, Long)]
    if (localVocabMax > 0 && head.length <= localVocabMax)
      trainLocal(head, numMerges, units)
    else trainDistributed(hist, numMerges, units)
  }

  /** Code-point lexicographic string order (== UTF-8 byte order ==
    * Spark `UTF8String` binary order). Differs from `String`'s natural
    * UTF-16 code-unit order only when a supplementary character ties
    * against one in [U+E000, U+FFFF]. */
  private[functions] val codePointOrder: Ordering[String] =
    (x: String, y: String) => {
      val xi = x.codePoints().iterator()
      val yi = y.codePoints().iterator()
      var r = 0
      while (r == 0 && xi.hasNext && yi.hasNext)
        r = Integer.compare(xi.nextInt(), yi.nextInt())
      if (r != 0) r else java.lang.Boolean.compare(xi.hasNext, yi.hasNext)
    }

  private def trainLocal(hist: Array[(String, Long)], numMerges: Int,
                         units: String => Vector[String]): Seq[(String, String)] = {
    var words: Array[(Vector[String], Long)] =
      hist.map { case (w, f) => (units(w), f) }
    val merges = Seq.newBuilder[(String, String)]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (ps, f) =>
        var i = 0
        while (i < ps.length - 1) {
          val k = (ps(i), ps(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // max count, ties by lexicographically smallest (a, b) in CODE
        // POINT order — matching trainDistributed (UTF8String binary =
        // UTF-8 byte = code-point order), the DuckDB oracle, and the
        // Python golden trainer. Scala's default String ordering is
        // UTF-16 code-UNIT order, which ranks supplementary characters
        // (>= U+10000, stored as surrogate pairs 0xD800-0xDFFF) BELOW
        // [U+E000, U+FFFF] — a tie mixing the two picked a different
        // merge here than everywhere else (r8 ADVICE).
        val ord = Ordering.Tuple3(Ordering.Long, codePointOrder, codePointOrder)
        val (a, b) = counts.toSeq
          .minBy { case ((pa, pb), n) => (-n, pa, pb) }(ord)._1
        merges += ((a, b))
        words = words.map { case (ps, f) => (fusePair(ps, a, b), f) }
      }
      r += 1
    }
    merges.result()
  }

  private def trainDistributed(hist: DataFrame, numMerges: Int,
                               units: String => Vector[String]): Seq[(String, String)] = {
    val spark = hist.sparkSession
    import spark.implicits._
    var words = hist.as[(String, Long)]
      .map { case (w, f) => (units(w), f) }
      .toDF("parts", "freq")
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val top = words
        .select(col("freq"), explode(zip_with(
          slice(col("parts"), lit(1), size(col("parts")) - 1),
          slice(col("parts"), lit(2), size(col("parts")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val a = top(0).getString(0)
        val b = top(0).getString(1)
        merges += ((a, b))
        val next = words.as[(Seq[String], Long)]
          .map { case (ps, f) => (fusePair(ps, a, b), f) }
          .toDF("parts", "freq")
          .localCheckpoint(true)
        words.unpersist()
        words = next
      }
      r += 1
    }
    words.unpersist()
    merges.result()
  }
}
