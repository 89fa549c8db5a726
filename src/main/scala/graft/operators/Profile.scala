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
  * reduce. `exact = true` runs one column-pruned aggregate PER column and
  * unions the one-row results: a single wide aggregate with N
  * `count_distinct`s plans as an Expand that replicates every row N×
  * through one pass over ALL profiled columns (measured 1.72 s vs 0.33 s
  * for 4 columns over sf0.1 orders), while the union's branches each
  * scan exactly one column and run concurrently within one job. The
  * min/max casts happen AFTER aggregation on the native type, so the
  * scan stays codegen'd and types with engine-specific rendering (float,
  * timestamp) profile correctly even if their string form is
  * engine-specific.
  */
object Profile {

  /** Backquoted attribute reference: a bare `col(name)` parses dots as
    * nested-field access, so a column literally named "a.b" would fail
    * to resolve (round-4 ADVICE). Doubling is the parser's backtick
    * escape. */
  private def ref(name: String) = col("`" + name.replace("`", "``") + "`")

  def profile(df: DataFrame, columns: Seq[String] = Nil,
              exact: Boolean = false, rsd: Double = 0.02): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    require(cols.nonEmpty, "profile requires at least one column")
    if (exact) {
      cols.map { c =>
        df.select(ref(c).as("__c")).agg(
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col("__c"))).as("n_null"),
          count_distinct(col("__c")).as("n_distinct"),
          min(col("__c")).cast("string").as("min_value"),
          max(col("__c")).cast("string").as("max_value"))
          .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
            col("n_distinct"), col("min_value"), col("max_value"))
      }.reduce(_ unionAll _)
    } else {
      val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
        // positional generated aliases — immune to any characters in c
        Seq(
          count(ref(c)).as(s"__nn_$i"),
          approx_count_distinct(ref(c), rsd).as(s"__nd_$i"),
          min(ref(c)).cast("string").as(s"__min_$i"),
          max(ref(c)).cast("string").as(s"__max_$i"))
      } :+ count(lit(1)).as("__n")
      val one = df.agg(aggs.head, aggs.tail: _*)
      one.select(explode(array(cols.zipWithIndex.map { case (c, i) => struct(
          lit(c).as("col_name"),
          col("__n").as("n_rows"),
          (col("__n") - col(s"__nn_$i")).as("n_null"),
          col(s"__nd_$i").as("n_distinct"),
          col(s"__min_$i").as("min_value"),
          col(s"__max_$i").as("max_value")) }: _*)).as("p"))
        .select("p.*")
    }
  }
}
