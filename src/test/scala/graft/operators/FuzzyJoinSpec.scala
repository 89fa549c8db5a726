package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[FuzzyJoin]] — deletion-neighborhood blocking must find EXACTLY the
  * all-pairs Levenshtein ground truth (the blocking is complete, the
  * verify pass is exact, so the result is not approximate). */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def groundTruth(names: Seq[String], maxDist: Int): Set[(String, String, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      a <- names.distinct; b <- names.distinct
      if a < b
      ed = lev(a, b)
      if ed <= maxDist
    } yield (a, b, ed)).toSet
  }

  private def run(names: Seq[String], maxDist: Int,
                  maxBucket: Int = 100000): Set[(String, String, Int)] =
    FuzzyJoin.selfJoin(names.toDF("k"), "k", maxDist, maxBucket)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  private val names = Seq(
    "cold widget", "old widget", "bold widget",   // first-char edits (defeat prefix blocking)
    "large bolt", "large bolts", "large volt",    // insert + substitute
    "red anvil", "red anvil",                     // exact duplicate rows → one distinct key
    "anvil red",                                  // transposed words (far)
    "gear", "gearbox",                            // distance 3 at the boundary
    "ab", "ba", "a", "",                          // short/empty edge cases
    "totally unrelated phrase")

  test("selfJoin(maxDist=2) equals all-pairs levenshtein ground truth") {
    assert(run(names, 2) === groundTruth(names, 2))
    assert(groundTruth(names, 2).nonEmpty) // the fixture actually exercises it
  }

  test("selfJoin(maxDist=1) equals ground truth — including first-char edits") {
    val got = run(names, 1)
    assert(got === groundTruth(names, 1))
    assert(got.contains(("bold widget", "cold widget", 1)))
  }

  test("null keys are ignored, duplicates collapse to distinct keys") {
    val df = Seq(Some("aaa"), None, Some("aaa"), Some("aab")).toDF("k")
    val got = FuzzyJoin.selfJoin(df, "k", 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got === Set(("aaa", "aab", 1)))
  }

  test("maxBucket drops degenerate variants (recall trade, never precision)") {
    // every key is within distance 2 of every other via the "" variant;
    // maxBucket=2 kills the shared buckets, so pairs disappear — but
    // nothing outside the ground truth ever appears
    val shorts = Seq("a", "b", "c", "d", "e")
    val bounded = run(shorts, 2, maxBucket = 2)
    assert(bounded.subsetOf(groundTruth(shorts, 2)))
    assert(run(shorts, 2) === groundTruth(shorts, 2)) // default bound: exact
  }

  test("deletionVariants is the documented neighborhood") {
    val got = Seq("abc").toDF("s")
      .select(FuzzyJoin.deletionVariants(col("s"), 2).as("v"))
      .head().getSeq[String](0).toSet
    assert(got === Set("abc", "ab", "ac", "bc", "a", "b", "c"))
  }
}
