package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Warehouse column profiling — the distributed generalization of the
  * reference's load-summary reporting (file_loader.py:232-281 counts
  * per-field presence before declaring a load healthy).
  *
  * One global aggregate over the table produces, per column: row count,
  * null count, distinct count, and min/max rendered as strings. Output is
  * long-format (one row per column) so the profile of a 400-column table
  * is queryable like any other table.
  *
  * Scale shape: the default `exact = false` uses `approx_count_distinct`
  * (HyperLogLog++), which keeps the whole profile a SINGLE map-side
  * combined pass — no Expand, no shuffle of data rows, one tiny final
  * reduce. `exact = true` swaps in `count_distinct`, which Catalyst plans
  * as an Expand (one replicated pass per distinct column) — fine for
  * gate checks at moderate width, wrong as a routine 100 TB health probe.
  * The min/max casts happen AFTER aggregation on the native type, so the
  * scan stays codegen'd and types with engine-specific rendering (float,
  * timestamp) profile correctly even if their string form is
  * engine-specific.
  */
object Profile {

  def profile(df: DataFrame, columns: Seq[String] = Nil,
              exact: Boolean = false, rsd: Double = 0.02): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    require(cols.nonEmpty, "profile requires at least one column")
    val aggs = cols.flatMap { c =>
      val nd = if (exact) count_distinct(col(c))
               else approx_count_distinct(col(c), rsd)
      Seq(
        count(col(c)).as(s"__nn_$c"),
        nd.as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))): _*)).as("p"))
      .select("p.*")
  }
}
