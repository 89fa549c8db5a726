package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins q202's decision semantics on a planted corpus covering the
  * branch the sf fixtures never reach (exact_dup) and the precedence
  * ladder: exact beats 13-gram beats 3-gram-suspect beats clean.
  * Eval docs are doc_id % 10 == 0 (the q71/q153 split). */
class ContaminationDecisionsSpec extends SparkSpec {
  import spark.implicits._

  private val thirteen = (1 to 13).map(i => s"w$i").mkString(" ")

  test("verdict precedence and evidence columns on planted docs") {
    val docs = Seq(
      // train side
      (1L, s"unique train text $thirteen and more tail words here"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "totally separate train content nothing shared at all"),
      // eval docs (ids % 10 == 0):
      // 10: EXACT copy of train doc 1 modulo case/whitespace → exact_dup
      //     (it also shares every 13-gram — precedence must pick exact)
      (10L, s"UNIQUE  train text $thirteen and more tail words here"),
      // 20: shares the 13-token run with train doc 1 but not the whole
      //     text → dirty_13gram
      (20L, s"prefix differs $thirteen suffix differs"),
      // 30: high 3-gram containment of train doc 2 without any 13-gram
      //     (only 10 tokens) → suspect_3gram
      (30L, "the quick brown fox jumps over the lazy dog tonight"),
      // 40: nothing shared → clean
      (40L, "completely fresh evaluation content with novel phrasing")
    ).toDF("doc_id", "text")
    val out = TrainingQueries.contaminationDecisions(docs)
      .as[(Long, java.lang.Long, Long, Long, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(out.keySet === Set(10L, 20L, 30L, 40L))
    val (_, m10, n10, c10, v10) = out(10L)
    assert(v10 === "exact_dup" && m10 === 1L)
    assert(n10 > 0L, "the exact copy also shares 13-grams — evidence rides along")
    val (_, m20, n20, _, v20) = out(20L)
    assert(v20 === "dirty_13gram" && m20 == null && n20 >= 1L)
    val (_, m30, n30, c30, v30) = out(30L)
    assert(v30 === "suspect_3gram" && m30 == null && n30 === 0L)
    assert(c30 >= 800000L && c30 < 1000000L)
    val (_, m40, n40, c40, v40) = out(40L)
    assert(v40 === "clean" && m40 == null && n40 === 0L && c40 < 800000L)
  }
}
