package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ops.ColumnOps
import graft.functions.VocabularyOps

/** Remaining scalar/array operator coverage: URL functions (X4/X5/X9/X10),
  * embedding-text builder (X12), summary round-trip (X16→X17), composition
  * flatten (E9 — oracle-checked via its flattened string projection), and
  * vocabulary validation (X24/P10). All hash-matched.
  */
object MiscQueries {

  // X4/X5/X9/X10 over URLs synthesized deterministically from part rows.
  private def q50(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .withColumn("url",
        concat(lit("https://shop.example/c/"),
          ColumnOps.slugify(col("p_name")), lit("-p"), col("p_partkey"),
          lit(".html")))
      .withColumn("price_text",
        concat(lit("USD "), format_string("%.2f", col("p_retailprice"))))
      .select(
        col("p_partkey"),
        ColumnOps.productIdFromUrl(col("url")).as("extracted_id"),
        ColumnOps.nameFromUrlSlug(col("url")).as("name_from_slug"),
        ColumnOps.parsePriceText(col("price_text")).as("parsed_price"),
        ColumnOps.extensionFromUrl(concat(col("url"), lit("?x=1"))).as("ext"))
      .orderBy(col("p_partkey"))

  // E9: nested composition flatten (oracle-checked: DuckDB mirrors the
  // struct literal and the filter/transform/flatten chain with its own
  // list lambdas; ColumnOpsSpec goldens pin the reference shape).
  private def q51(s: SparkSession, d: String): DataFrame = {
    val comp = struct(array(
      struct(
        when(pmod(col("p_partkey"), lit(2)) === 0, lit("UPPER"))
          .otherwise(lit("LINING")).as("name"),
        array(struct(
          lit("MAIN FABRIC").as("name"),
          array(
            struct(lit("cotton").as("material"), lit("82%").as("percentage")),
            struct(lit("linen").as("material"), lit("18%").as("percentage")))
            .as("components"))).as("areas"))).as("parts"))
    part(s, d)
      .withColumn("composition_structured", comp)
      .select(
        col("p_partkey"),
        array_join(ColumnOps.flattenComposition(
          col("composition_structured"),
          pmod(col("p_partkey"), lit(3)) === 0), ", ").as("composition_flat"))
      .orderBy(col("p_partkey"))
  }

  // X16→X17 round trip: build a change summary from diffed arrays, parse
  // the removed list back out (oracle-checked end to end).
  private def q52(s: SparkSession, d: String): DataFrame = {
    val ref = array(lit("widget"), lit("small"), lit("bolt"))
    part(s, d)
      .withColumn("tokens", split(col("p_name"), " "))
      .withColumn("summary", ColumnOps.changeSummary(
        ColumnOps.addedTags(col("tokens"), ref),
        ColumnOps.removedTags(col("tokens"), ref)))
      .select(col("p_partkey"),
        array_join(ColumnOps.parseRemovedFromSummary(col("summary")), "|")
          .as("removed_roundtrip"))
      .orderBy(col("p_partkey"))
  }

  // X24: vocabulary validation with substring near-match (sorted output —
  // DuckDB's list_distinct has no order guarantee).
  private def q53(s: SparkSession, d: String): DataFrame = {
    val vocab = Seq("widget", "bolt", "gear", "large-gizmo")
    part(s, d)
      .withColumn("tokens", split(col("p_name"), " "))
      .select(col("p_partkey"),
        array_join(array_sort(VocabularyOps.validateTags(col("tokens"), vocab)), ",")
          .as("valid_tags"))
      .orderBy(col("p_partkey"))
  }

  // A7: multi-source per-key activity aggregate — independent aggregates
  // from multiple tables full-outer-joined on the shared key with zero
  // fills (curate.py:7466-7503 per-curator across 3 tables).
  private def q54(s: SparkSession, d: String): DataFrame = {
    val custs = customer(s, d).groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_customers"))
    val supps = supplier(s, d).groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"))
    val balances = customer(s, d).filter(col("c_acctbal") > 0)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("pos_balance"))
    custs.join(supps, Seq("nationkey"), "full_outer")
      .join(balances, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"),
        coalesce(col("pos_balance"), lit(0.0)).as("pos_balance"))
      .orderBy(col("nationkey"))
  }

  // O7: longest-match pick (zara_extractor.py:1500-1506) — max by
  // (length, lexicographic) over the token list, as an array_max on
  // (length, token) structs (no explode, no shuffle).
  private def q55(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .withColumn("tokens", split(col("p_name"), " "))
      .select(col("p_partkey"),
        array_max(transform(col("tokens"),
          t => struct(length(t).as("l"), t.as("t")))).getField("t")
          .as("longest_token"))
      .orderBy(col("p_partkey"))

  // Column profiling (the load-summary health check generalized): exact
  // distinct counts here so DuckDB can reproduce them; the operator's
  // default is the single-pass HLL shape (Profile scaladoc). Doubles and
  // timestamps are profiled too in the spec — excluded here only because
  // their min/max STRING RENDERING is engine-specific.
  private def q108(s: SparkSession, d: String): DataFrame =
    graft.operators.Profile.profile(orders(s, d),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"),
      exact = true)

  // Z-order locality rollup: Morton-interleave (l_partkey, l_suppkey) —
  // the write-layout sort key of operators/ZOrder.layoutByZ — and show
  // per-coarse-Z-bucket dimension ranges. Pure bit arithmetic, so the
  // oracle recomputes every interleaved bit; ZOrderSpec measures the
  // actual file-skipping win (tight boxes in BOTH dims per partition).
  private def q120(s: SparkSession, d: String): DataFrame = {
    val z = graft.operators.ZOrder.zValue(Seq(col("l_partkey"), col("l_suppkey")), 15)
    lineitem(s, d)
      .select(z.as("z"), col("l_partkey"), col("l_suppkey"))
      .groupBy(shiftright(col("z"), 12).as("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("l_partkey")).as("min_pk"), max(col("l_partkey")).as("max_pk"),
        min(col("l_suppkey")).as("min_sk"), max(col("l_suppkey")).as("max_sk"))
  }

  private def q120Sql: String = {
    val terms = (0 until 15).flatMap(b => Seq(
      s"(((l_partkey >> $b) & 1) << ${2 * b})",
      s"(((l_suppkey >> $b) & 1) << ${2 * b + 1})"))
    s"WITH zd AS (SELECT ${terms.mkString(" + ")} AS z, l_partkey, l_suppkey FROM lineitem) " +
      "SELECT (z >> 12) AS z_bucket, COUNT(*) AS n, " +
      "MIN(l_partkey) AS min_pk, MAX(l_partkey) AS max_pk, " +
      "MIN(l_suppkey) AS min_sk, MAX(l_suppkey) AS max_sk " +
      "FROM zd GROUP BY 1"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_url_functions" -> q50 _,
    "q51_composition_flatten" -> q51 _,
    "q52_summary_roundtrip" -> q52 _,
    "q53_vocab_validate" -> q53 _,
    "q54_multi_source_agg" -> q54 _,
    "q55_longest_token" -> q55 _,
    "q108_column_profile" -> q108 _,
    "q120_zorder_buckets" -> q120 _
  )

  val oracle: Map[String, String] = Map(
    "q51_composition_flatten" ->
      ("SELECT p_partkey, " +
        "COALESCE(array_to_string(flatten(flatten(list_transform(parts_f, " +
        "p -> list_transform(p.areas, a -> list_transform(a.components, " +
        "c -> c.percentage || ' ' || c.material))))), ', '), '') AS composition_flat " +
        "FROM (SELECT p_partkey, " +
        "CASE WHEN p_partkey % 3 = 0 " +
        "THEN list_filter(parts, p -> upper(p.name) = 'UPPER') " +
        "ELSE parts END AS parts_f " +
        "FROM (SELECT p_partkey, " +
        "[{'name': CASE WHEN p_partkey % 2 = 0 THEN 'UPPER' ELSE 'LINING' END, " +
        "'areas': [{'name': 'MAIN FABRIC', " +
        "'components': [{'material': 'cotton', 'percentage': '82%'}, " +
        "{'material': 'linen', 'percentage': '18%'}]}]}] AS parts " +
        "FROM part)) ORDER BY p_partkey"),
    "q50_url_functions" ->
      ("SELECT p_partkey, " +
        "regexp_extract(url, '-p(\\d+)\\.html', 1) AS extracted_id, " +
        "array_to_string(list_transform(string_split(" +
        "regexp_replace(regexp_extract(url, '([^/]+)$', 1), '-p\\d+\\.html$', ''), '-'), " +
        "t -> upper(t[1]) || lower(t[2:])), ' ') AS name_from_slug, " +
        "CAST(replace(regexp_extract(price_text, '([0-9.,]+)', 1), ',', '') AS DOUBLE) AS parsed_price, " +
        "'.jpg' AS ext FROM " +
        "(SELECT p_partkey, 'https://shop.example/c/' || " +
        "regexp_replace(regexp_replace(lower(p_name), '[^a-z0-9]+', '_', 'g'), '^_+|_+$', '', 'g') " +
        "|| '-p' || p_partkey || '.html' AS url, " +
        "'USD ' || format('{:.2f}', p_retailprice) AS price_text FROM part) " +
        "ORDER BY p_partkey"),
    "q52_summary_roundtrip" ->
      ("SELECT p_partkey, COALESCE(array_to_string(removed, '|'), '') AS removed_roundtrip FROM " +
        "(SELECT p_partkey, list_sort(list_distinct(list_filter(l, x -> NOT list_contains(r, x)))) AS removed FROM " +
        "(SELECT p_partkey, string_split(p_name, ' ') AS l, " +
        "['widget','small','bolt'] AS r FROM part)) ORDER BY p_partkey"),
    "q53_vocab_validate" ->
      ("SELECT p_partkey, COALESCE(array_to_string(list_sort(list_distinct(" +
        "list_filter(l, c -> list_contains(v, c) OR " +
        "len(list_filter(v, t -> contains(t, c) OR contains(c, t))) > 0))), ','), '') AS valid_tags FROM " +
        "(SELECT p_partkey, string_split(p_name, ' ') AS l, " +
        "['widget','bolt','gear','large-gizmo'] AS v FROM part) ORDER BY p_partkey"),
    "q54_multi_source_agg" ->
      ("WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers " +
        "FROM customer GROUP BY 1), " +
        "s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers " +
        "FROM supplier GROUP BY 1), " +
        "b AS (SELECT c_nationkey AS nationkey, " +
        "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS pos_balance " +
        "FROM customer WHERE c_acctbal > 0 GROUP BY 1) " +
        "SELECT COALESCE(c.nationkey, s.nationkey, b.nationkey) AS nationkey, " +
        "COALESCE(n_customers, 0) AS n_customers, " +
        "COALESCE(n_suppliers, 0) AS n_suppliers, " +
        "COALESCE(pos_balance, 0.0) AS pos_balance " +
        "FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey " +
        "FULL OUTER JOIN b ON COALESCE(c.nationkey, s.nationkey) = b.nationkey " +
        "ORDER BY nationkey"),
    "q55_longest_token" ->
      ("SELECT p_partkey, t AS longest_token FROM " +
        "(SELECT p_partkey, unnest(string_split(p_name, ' ')) AS t FROM part) x " +
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY p_partkey " +
        "ORDER BY LENGTH(t) DESC, t DESC) = 1 ORDER BY p_partkey"),
    "q108_column_profile" -> Seq(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
      .map(c =>
        s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(MIN($c) AS VARCHAR) AS min_value,
           |  CAST(MAX($c) AS VARCHAR) AS max_value
           |FROM orders""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    "q120_zorder_buckets" -> q120Sql
  )
}
