package graft.functions

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Golden cross-validation of [[BpeTokenizer.encodeWord]] against an
  * INDEPENDENT implementation of the GPT-2 BPE merge algorithm
  * (`tools/gen_bpe_golden.py` — the published batch-merge encoder loop,
  * re-written from the algorithm description, with a single-merge twin
  * asserted equivalent at generation time).
  *
  * Tables cover the exact q148 merges artifact, a 50-merge table trained
  * on English text, an overlap-heavy table (("a","a"), ("aa","a"),
  * ("aa","aaa") — the left-to-right non-overlapping fuse cases), and a
  * supplementary-character table (emoji / rare CJK seed as single code
  * points, never surrogate halves). 452 (word, table) cases total,
  * including empty/single-char/fully-merging/unseen-word boundaries.
  */
class BpeGoldenSpec extends AnyFunSuite {

  private def loadLines(): Seq[JValue] = {
    val in = getClass.getResourceAsStream("/golden/bpe_golden.jsonl")
    require(in != null, "missing fixture — run tools/gen_bpe_golden.py")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map(JsonMethods.parse(_)).toList
    finally src.close()
  }

  private def strings(j: JValue): Vector[String] = j match {
    case JArray(items) => items.map { case JString(s) => s
      case other => sys.error(s"non-string $other") }.toVector
    case other => sys.error(s"non-array $other")
  }

  test("618 independently-generated GPT-2 cases (code-point + byte-level) " +
      "match encodeWord exactly") {
    val lines = loadLines()
    val tables: Map[String, Map[(String, String), Int]] = lines.collect {
      // "table" records only — train goldens (r8) also carry "merges"
      case o: JObject if (o \ "merges") != JNothing && (o \ "table") != JNothing =>
        val name = (o \ "table").values.toString
        val merges = (o \ "merges") match {
          case JArray(ps) => ps.map { case JArray(List(JString(a), JString(b))) => (a, b)
            case other => sys.error(s"bad pair $other") }
          case other => sys.error(s"bad merges $other")
        }
        name -> merges.zipWithIndex.toMap
    }.toMap
    assert(tables.size == 6) // 4 code-point + 2 byte-level (r9)
    assert(tables("q148") ==
      graft.queries.TextQueries.bpeMerges.zipWithIndex.toMap,
      "fixture q148 table drifted from TextQueries.bpeMerges — regenerate")

    val cases = lines.filter(j => (j \ "word") != JNothing)
    assert(cases.size == 618) // 452 code-point + 166 byte-level
    assert(cases.count(c => (c \ "mode") != JNothing) == 166)
    var failures = 0
    cases.zipWithIndex.foreach { case (c, i) =>
      val word = (c \ "word").values.toString
      val table = (c \ "table").values.toString
      val byteLevel = (c \ "mode") match {
        case JString("byte") => true
        case JNothing => false
        case other => sys.error(s"bad mode $other")
      }
      val got = BpeTokenizer.encodeWord(word, tables(table), byteLevel)
      val want = strings(c \ "expected")
      if (got != want) {
        failures += 1
        if (failures <= 3)
          info(s"case $i table=$table word=$word:\n  got  $got\n  want $want")
      }
    }
    assert(failures == 0,
      s"$failures / ${cases.size} golden BPE cases diverge from GPT-2 semantics")
  }
}
