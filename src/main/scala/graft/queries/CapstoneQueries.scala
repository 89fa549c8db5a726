package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.documents

/** The incremental-pipeline capstone query (r12, VERDICT r11 #1) —
  * one oracle-hash-gated artifact proving the proven state rungs
  * COMPOSE. See [[graft.etl.IngestCapstone]] for the ladder; the
  * oracle below is the member full-rebuild SQLs composed under ONE
  * hash, filtered to batch rows (the q202 composition convention):
  * q188's exact-keeper class, q171's segment CTEs, q185's
  * MinHash-LSH pair CTEs, q202's 13/3-gram layers, q193's NB CTEs
  * trained over "documents minus this batch's dedup/decontam drops"
  * (the drops-feed-priors composition point), q203's PSI algebra
  * summed into the gate scalar, and q206's budgeted re-plan
  * recursion with the delta pointed at the verdicts' kept set.
  */
object CapstoneQueries {

  // batch = %7 (the q171/q185/q203 incremental convention); benchmark
  // = the warehouse's held-out %10 slice (the q202 eval convention)
  private def q208(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val isBatch = col("doc_id") % 7 === 0
    graft.etl.IngestCapstone.ingestDecisions(
      docs.filter(!isBatch), docs.filter(isBatch),
      docs.filter(!isBatch && col("doc_id") % 10 === 0),
      "doc_id", "lang", "source", "text", "n_chars")
  }

  // Mixture weights off persisted count state (r12, VERDICT r11 #5):
  // three ingest batches' per-source counts ride as UNAGGREGATED state
  // rows (the q181 merge-by-addition contract, simulated in-plan over
  // a %3 split); the operator merges and weights without touching a
  // document. Oracle = q77's SQL verbatim → artifact hash EQUALS
  // q77's (the q187/q189 design-working reading).
  private def q210(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val state = (0 until 3).map(i =>
        docs.filter(col("doc_id") % 3 === i)
          .groupBy(col("source")).agg(count(lit(1)).as("n_docs")))
      .reduce(_.unionByName(_))
    graft.operators.Sampling.mixtureWeightsFromState(state)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q210_mixture_from_state" -> q210 _,
    "q208_ingest_capstone" -> q208 _)

  private def ingestCapstoneOracle: String = {
    val wsRe = DedupQueries.wsRe
    val normSql = DedupQueries.normSql
    val ctes = Seq.newBuilder[String]
    // exact: min id over the normalized-text class of ALL docs
    ctes += s"nt8 AS (SELECT doc_id, $normSql AS nx FROM documents)"
    ctes += "th8 AS (SELECT nx, MIN(doc_id) AS m FROM nt8 GROUP BY 1)"
    ctes += ("ex8 AS (SELECT nt8.doc_id, " +
      "CASE WHEN th8.m < nt8.doc_id THEN th8.m END AS exs " +
      "FROM nt8 JOIN th8 USING (nx) WHERE nt8.doc_id % 7 = 0)")
    // segments: q171's CTEs verbatim (sg-prefixed)
    ctes += s"sgt AS MATERIALIZED (SELECT doc_id, string_split_regex(text, $wsRe) AS l FROM documents)"
    ctes += ("sgc AS (SELECT doc_id, i - 1 AS pos, " +
      "array_to_string(l[((i-1)*3+1):((i-1)*3+3)], ' ') AS seg " +
      "FROM (SELECT doc_id, l, unnest(generate_series(1, (len(l)+2)//3)) AS i FROM sgt))")
    ctes += ("sgw AS (SELECT DISTINCT md5(seg) AS h FROM sgc " +
      "WHERE doc_id % 7 <> 0 AND seg <> '')")
    ctes += ("sgb AS (SELECT doc_id, pos, md5(seg) AS h, " +
      "ROW_NUMBER() OVER (PARTITION BY md5(seg) ORDER BY doc_id, pos) AS rn " +
      "FROM sgc WHERE doc_id % 7 = 0 AND seg <> '')")
    ctes += ("sgr AS (SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments, " +
      "CAST(SUM(CASE WHEN sgw.h IS NOT NULL OR b.rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed " +
      "FROM sgb b LEFT JOIN sgw ON sgw.h = b.h GROUP BY 1)")
    // near-dup: q185's pair CTEs + smallest similar counterpart
    ctes += DedupQueries.minHashPairCtes
    // jpass materialized: near8 reads it twice (both orientations) —
    // a plain CTE would run the whole signature chain twice in DuckDB
    ctes += ("jpass AS MATERIALIZED (SELECT id_a, id_b FROM jac " +
      "WHERE CAST(n_common AS DOUBLE) / n_union >= 0.3)")
    ctes += ("near8 AS (SELECT x AS doc_id, MIN(y) AS nrs FROM (" +
      "SELECT id_b AS x, id_a AS y FROM jpass " +
      "UNION ALL SELECT id_a, id_b FROM jpass) " +
      "WHERE y < x AND x % 7 = 0 GROUP BY 1)")
    // decontamination vs the warehouse's %10 benchmark (q202's layers)
    ctes += ("cs13 AS (SELECT doc_id, list_distinct(list_transform(" +
      "generate_series(1, len(l) - 12), " +
      "i -> array_to_string(l[i:i+12], ' '))) AS ss FROM sgt)")
    ctes += ("cd13 AS (SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n13 FROM " +
      "(SELECT doc_id, unnest(ss) AS s FROM cs13 WHERE doc_id % 7 = 0) e JOIN " +
      "(SELECT DISTINCT unnest(ss) AS s FROM cs13 " +
      "WHERE doc_id % 7 <> 0 AND doc_id % 10 = 0) bm USING (s) GROUP BY 1)")
    ctes += ("cs3 AS (SELECT doc_id, list_distinct(list_transform(" +
      "generate_series(1, len(l) - 2), " +
      "i -> array_to_string(l[i:i+2], ' '))) AS ss FROM sgt)")
    ctes += ("cc3 AS (SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n, " +
      "CAST(SUM(CASE WHEN bm.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS nh FROM " +
      "(SELECT doc_id, unnest(ss) AS s FROM cs3 WHERE doc_id % 7 = 0) e LEFT JOIN " +
      "(SELECT DISTINCT unnest(ss) AS s FROM cs3 " +
      "WHERE doc_id % 7 <> 0 AND doc_id % 10 = 0) bm USING (s) GROUP BY 1)")
    // the pre-NB verdict ladder
    ctes += ("pre8 AS MATERIALIZED (SELECT e.doc_id, " +
      "COALESCE(sgr.n_segments, 0) AS n_segments, " +
      "COALESCE(sgr.n_removed, 0) AS n_removed, e.exs, nr.nrs, " +
      "CAST(COALESCE(cd13.n13, 0) AS BIGINT) AS n13, " +
      "CAST(COALESCE(cc3.nh, 0) * 1000000 // GREATEST(COALESCE(cc3.n, 1), 1) AS BIGINT) AS cont, " +
      "CASE WHEN e.exs IS NOT NULL THEN 'exact_dup' " +
      "WHEN COALESCE(sgr.n_segments, 0) > 0 " +
      "AND COALESCE(sgr.n_removed, 0) = COALESCE(sgr.n_segments, 0) THEN 'shell_doc' " +
      "WHEN nr.nrs IS NOT NULL THEN 'near_dup' " +
      "WHEN COALESCE(cd13.n13, 0) > 0 THEN 'dirty_13gram' " +
      "WHEN COALESCE(cc3.nh, 0) * 1000000 // GREATEST(COALESCE(cc3.n, 1), 1) >= 800000 " +
      "THEN 'suspect_3gram' END AS pre " +
      "FROM ex8 e LEFT JOIN sgr USING (doc_id) LEFT JOIN near8 nr USING (doc_id) " +
      "LEFT JOIN cd13 USING (doc_id) LEFT JOIN cc3 USING (doc_id))")
    // NB over "documents minus drops" — drops feed priors
    ctes += ("nbcorp AS MATERIALIZED (SELECT d.* FROM documents d WHERE NOT EXISTS " +
      "(SELECT 1 FROM pre8 p WHERE p.doc_id = d.doc_id AND p.pre IS NOT NULL))")
    ctes ++= TextQueries.naiveBayesCtes("nbcorp")
    ctes += ("nbdec AS (SELECT a.doc_id, a.lang, a.lbl AS predicted, " +
      "a.score - COALESCE(bq.score, a.score) AS margin " +
      "FROM rkb a LEFT JOIN rkb bq ON bq.doc_id = a.doc_id AND bq.rn = 2 " +
      "WHERE a.rn = 1 AND a.doc_id % 7 = 0)")
    // PSI gate scalar (q203's algebra summed)
    ctes ++= TextQueries.psiCtes
    ctes += ("psitot AS MATERIALIZED (SELECT CAST(SUM(" + TextQueries.psiTermSql +
      ") AS BIGINT) AS psi FROM jq, scq)")
    // final verdict
    ctes += ("ver8 AS MATERIALIZED (SELECT p.doc_id, p.n_segments, p.n_removed, " +
      "CASE WHEN p.pre = 'exact_dup' THEN p.exs " +
      "WHEN p.pre = 'near_dup' THEN p.nrs END AS survivor, " +
      "p.n13 AS n_dirty_13grams, p.cont AS containment_e6, " +
      "n.predicted, n.margin AS margin_e16, " +
      "COALESCE(p.pre, CASE WHEN n.predicted <> n.lang " +
      "THEN 'nb_disagrees' ELSE 'kept' END) AS verdict " +
      "FROM pre8 p LEFT JOIN nbdec n USING (doc_id))")
    // budgeted re-plan over the kept docs only (q206's recursion)
    ctes += ("kept8 AS (SELECT v.doc_id, d.source, d.n_chars " +
      "FROM ver8 v JOIN documents d USING (doc_id) WHERE v.verdict = 'kept')")
    ctes += WarehouseQueries.shardReplanCtes(
      "FROM documents WHERE doc_id % 7 <> 0", "FROM kept8")
    ctes += "plan8 AS (SELECT g, shard, moved FROM rstep WHERE g IS NOT NULL)"
    "WITH RECURSIVE " + ctes.result().mkString(", ") + " " +
      "SELECT v.doc_id, d.source, v.n_segments, v.n_removed, v.survivor, " +
      "v.n_dirty_13grams, v.containment_e6, v.predicted, v.margin_e16, " +
      "v.verdict, (SELECT psi FROM psitot) AS psi_e9, " +
      "(SELECT psi FROM psitot) >= 100000000 AS drift_alert, " +
      "CAST(CASE WHEN v.verdict = 'kept' THEN p.shard END AS INT) AS shard, " +
      "CASE WHEN v.verdict = 'kept' THEN p.moved END AS moved " +
      "FROM ver8 v JOIN documents d USING (doc_id) " +
      "LEFT JOIN plan8 p ON p.g = d.source ORDER BY v.doc_id"
  }

  val oracle: Map[String, String] = Map(
    // q210: the state path must answer exactly what the corpus scan
    // answers — q77's oracle verbatim, hashes equal
    "q210_mixture_from_state" ->
      ("WITH ps AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source), " +
        "m AS (SELECT MAX(n_docs) AS n_max FROM ps) " +
        "SELECT source, CAST(n_docs AS BIGINT) AS n_docs, " +
        "CAST(FLOOR(sqrt(CAST(n_docs AS DOUBLE)) / sqrt(CAST(n_max AS DOUBLE)) * 1000000.0) AS BIGINT) AS weight_e6 " +
        "FROM ps, m ORDER BY source"),
    "q208_ingest_capstone" -> ingestCapstoneOracle)
}
