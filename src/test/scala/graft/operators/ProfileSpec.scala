package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some("a"), Some(1.5)),
    (2L, Some("b"), None),
    (3L, None, Some(2.5)),
    (4L, Some("a"), Some(1.5)),
    (5L, None, None)
  ).toDF("id", "s", "x")

  test("exact profile: nulls, distincts, min/max over mixed types") {
    val p = Profile.profile(fixture, exact = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(p("id") == ((5L, 0L, 5L, "1", "5")))
    assert(p("s") == ((5L, 2L, 2L, "a", "b")))
    // doubles profile fine — their string form is engine-specific, which
    // is why q108's oracle sticks to ints/strings, not an operator limit
    assert(p("x") == ((5L, 2L, 2L, "1.5", "2.5")))
  }

  test("approx (default, single-pass HLL) matches exact at small cardinality") {
    val exact = Profile.profile(fixture, exact = true)
      .select("col_name", "n_distinct").as[(String, Long)].collect().toMap
    val approx = Profile.profile(fixture)
      .select("col_name", "n_distinct").as[(String, Long)].collect().toMap
    exact.foreach { case (c, n) =>
      assert(math.abs(approx(c) - n) <= math.max(1L, (n * 0.1).toLong),
        s"$c: approx ${approx(c)} vs exact $n")
    }
  }

  test("neither mode plans an Expand; exact is a per-column union") {
    // a single wide agg with N count_distincts would Expand (replicate
    // every row N×) — both shapes avoid it: approx via HLL in one pass,
    // exact via one column-pruned aggregate per column
    val approxPlan = Profile.profile(fixture).queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"), approxPlan)
    val exactPlan =
      Profile.profile(fixture, exact = true).queryExecution.executedPlan.toString
    assert(!exactPlan.contains("Expand"), exactPlan)
    assert(exactPlan.contains("Union"), exactPlan)
  }

  test("column subset and empty-table behavior") {
    val p = Profile.profile(fixture, Seq("id"), exact = true)
    assert(p.select("col_name").as[String].collect().toSeq == Seq("id"))
    val empty = Profile.profile(fixture.filter(lit(false)), Seq("id", "s"), exact = true)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(empty.toSeq == Seq(("id", 0L, 0L, 0L), ("s", 0L, 0L, 0L)))
  }
}
