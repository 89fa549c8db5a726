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
  * artifact (an external input here, like embeddings — the engine
  * applies it, training it is the reference's Python/external boundary).
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

  /** Encode one word under `ranks` (pair -> priority; lower fuses
    * first). Returns the subword sequence. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    // Seed from CODE POINTS, not UTF-16 chars: supplementary characters
    // (emoji, rare CJK) must enter as one unit, not two unpaired
    // surrogate halves (GPT-2's encoder, the cited contract, never
    // produces invalid strings).
    var parts: Vector[String] = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b.result()
    }
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
                   merges: Seq[(String, String)]): DataFrame = {
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
        val enc = encodeWord(w, bc.value)
        nSub += enc.length
        // single CODE POINT (not single UTF-16 char): a surrogate-pair
        // emoji no merge covered is one unknown, not zero
        nUnk += enc.count(s => s.codePointCount(0, s.length) == 1)
      }
      (id, words.length.toLong, nSub, nUnk)
    }.toDF(idCol, "n_words", "n_subwords", "n_unk_chars")
  }
}
