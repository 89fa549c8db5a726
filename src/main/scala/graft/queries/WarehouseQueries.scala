package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.{AggState, Scd2}

/** Warehouse-maintenance queries: the operations a long-lived 100 TB
  * store runs BETWEEN queries — versioned dimension history (SCD2) and
  * incremental rollup maintenance (mergeable aggregate state). Both are
  * oracle-checked the strong way: DuckDB re-derives the same answer from
  * first principles over the raw tables, while Spark runs the actual
  * maintenance machinery.
  */
object WarehouseQueries {

  // SCD2 history over the events change log: per user, the versioned
  // event_type timeline (a new version only when the type actually
  // changes), with half-open [valid_from, valid_to) nanos validity and
  // a current-row flag. One exchange for both windows (Scd2Spec).
  private def q122(s: SparkSession, d: String): DataFrame = {
    val log = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    Scd2.fromChangeLog(log, Seq("user_id"), "ts", "event_id", Seq("event_type"))
    // (user_id, version) is a key — transform-shaped output, no sort:
    // the harness canonical-sorts, a trailing orderBy would re-run the
    // whole window pipeline in the range-sampling pass (q114 lesson).
  }

  // Incremental rollup maintenance: history state (orders strictly
  // before the cut) ⊕ batch state (the rest) must equal the rollup a
  // full re-scan derives — which is exactly what the DuckDB twin
  // computes. The merge shuffle moves 2×|groups| state rows, never the
  // fact table; that asymmetry IS the operator (AggState scaladoc).
  private def q124(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val keys = Seq("o_orderpriority", "o_orderstatus")
    val cut = to_date(lit("1995-06-01"))
    // to_date works on DATE / NTZ / LTZ alike — the split only needs to
    // partition rows exactly once (the oracle re-derives from ALL rows).
    // A null date fails BOTH `< cut` and `>= cut`, so the split is
    // isHist / NOT isHist with nulls routed to the batch side — a true
    // partition even if the fixture ever gains null dates.
    val isHist = coalesce(to_date(col("o_orderdate")) < cut, lit(false))
    val hist = AggState.build(o.filter(isHist), keys, "o_totalprice")
    val batch = AggState.build(o.filter(!isHist), keys, "o_totalprice")
    AggState.merge(keys, Seq(hist, batch))
  }

  // CDC changelog apply: lineitem replayed as a per-order op stream —
  // line 1 is the base snapshot, lines >= 2 are ordered ops where
  // returnflag 'R' deletes the order and anything else upserts its
  // payload. The final snapshot (last-op-wins incl. deletes, untouched
  // keys passing through) rolls up per order priority. The oracle
  // re-derives the same state with a DESC row_number window over the
  // log — Spark runs the one-aggregate machinery (Cdc scaladoc).
  private def q126(s: SparkSession, d: String): DataFrame = {
    // The synthetic lineitem does NOT have unique (orderkey, linenumber)
    // pairs (977 dups at sf0.001, some with differing payloads), so the
    // op order is the FULL payload tuple: any remaining tie is between
    // identical rows and every tie-break picks the same winner — the
    // applyLog determinism contract holds by construction on both
    // engines. Real CDC logs order by their LSN instead.
    //
    // Measured (r6, x10 interleaved, VERDICT item 7): fusing the rollup
    // into the apply — join priority onto the op stream BEFORE the
    // aggregate, group by (orderkey, priority) so the rollup reuses the
    // partitioning — reads 2.36-2.76 s vs 1.37-1.67 s for this shape:
    // the pre-join moves the full 6M-row fact through the join before
    // the aggregate collapses it. REJECTED. A broadcast(orders) hint is
    // time-parity (1.42-1.57 s — the orders shuffle was never the cost;
    // the op-stream exchange is) and scale-dishonest for a fact-sized
    // orders table. REJECTED. The remaining gap vs DuckDB's two
    // in-process window scans is the pinned multi-stage floor.
    val li = lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"),
      col("l_partkey"), col("l_quantity"), col("l_returnflag"))
    val base = li.filter(col("l_linenumber") === 1)
    val log = li.filter(col("l_linenumber") >= 2)
      .withColumn("op",
        when(col("l_returnflag") === "R", lit("delete")).otherwise(lit("upsert")))
    val fin = graft.operators.Cdc.applyLog(base, log,
      Seq("l_orderkey"), "op",
      Seq("l_linenumber", "l_partkey", "l_quantity", "l_returnflag"))
    fin.join(orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(AggState.cents(col("l_quantity"))).as("qty_cents"))
  }

  // Incremental SCD2 maintenance: history built from the first half of
  // the log (cut 2024-01-16T00Z, mid-range of the 30-day fixture), then
  // the second half applied as a batch — must equal the full rebuild,
  // which is EXACTLY what the DuckDB twin computes (q122's oracle over
  // all events). Closed versions never re-shuffle; work is
  // O(open keys + batch) — see Scd2.applyIncrement.
  private def q129(s: SparkSession, d: String): DataFrame = {
    val cutNs = 1705363200L * 1000000000L
    val log = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val hist = Scd2.fromChangeLog(log.filter(col("ts") <= cutNs),
      Seq("user_id"), "ts", "event_id", Seq("event_type"))
    Scd2.applyIncrement(hist, log.filter(col("ts") > cutNs),
      Seq("user_id"), "ts", "event_id", Seq("event_type"))
  }

  // Exact mergeable MEDIAN over the incremental split: same history ⊕
  // batch state pattern as q124, but the state is per-(group, cents)
  // counts — the exact mergeable form quantiles admit on a discrete
  // money grid (AggState.buildFreq scaladoc). DuckDB re-derives the
  // median from the FULL fact scan with the same integer rank rule;
  // Spark answers from the merged freq state without touching history
  // facts. Quantile rank is integer cross-multiplied — no float.
  private def q135(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val keys = Seq("o_orderpriority")
    val cut = to_date(lit("1995-06-01"))
    val isHist = coalesce(to_date(col("o_orderdate")) < cut, lit(false))
    val hist = AggState.buildFreq(o.filter(isHist), keys, "o_totalprice")
    val batch = AggState.buildFreq(o.filter(!isHist), keys, "o_totalprice")
    val merged = AggState.mergeFreq(keys, Seq(hist, batch))
    AggState.quantileFromFreq(merged, keys, 1, 2)
      .withColumnRenamed("q_cents", "median_cents")
  }

  // Robust outlier gate (median + MAD — the quality-filtering shape
  // that survives heavy tails where mean/stddev z-scores don't): per
  // priority, the median price, the median absolute deviation from it,
  // and the count of rows beyond 3 MADs. Exact end to end on the cents
  // grid: both medians read off freq states (the q135 machinery — MAD
  // is just a second quantile walk over the DEVIATION grid), the flag
  // is an integer comparison. DuckDB re-derives with the same integer
  // rank rule over full-scan windows.
  //
  // r7 fusion (VERDICT r6 item 4): the old shape ran TWO chained
  // freq-state pipelines — orders scanned twice, the median joined onto
  // the full fact table to build a second fact-sized deviation state,
  // ~12 single-task stages end to end. But the deviation grid is a pure
  // FUNCTION of the cents freq state (freq_dev(d) = Σ freq(median±d)),
  // and the state is grid-bounded — so one fact pass builds the state
  // and everything after is AggState.medianMadOutliers' row-local array
  // walks. Measured (sf0.1, interleaved A/B, values bit-equal):
  // old 1.9-2.2 s → 1.1-1.4 s; the A/B dossier incl. the rejected
  // repartition-first variant is on the operator's scaladoc.
  private def q144(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val keys = Seq("o_orderpriority")
    val priced = o.select(col("o_orderpriority"),
      AggState.cents(col("o_totalprice")).as("cents"))
    AggState.medianMadOutliers(
      AggState.buildFreqExpr(priced, keys, col("cents")), keys)
  }

  // Capacity-balanced shard plan (r10): LPT assignment of sources to
  // 4 shards by total bytes — the compaction/write-fan-out planning
  // artifact (greedy is driver-side over the BOUNDED group list, the
  // KMeans-centroid rule; the weights aggregate is distributed). The
  // oracle replays the greedy as a recursive CTE whose state is the
  // 4-slot load list.
  private def q200(s: SparkSession, d: String): DataFrame =
    graft.etl.ShardPlanner
      .planShards(documents(s, d), "source", "n_chars", numShards = 4)

  // Incremental shard re-plan (r11, VERDICT #4): a compaction pipeline
  // re-plans against the EXISTING assignment with a bounded move
  // budget — untouched groups keep their shard, touched groups
  // re-enter the greedy at their merged weight (new groups place,
  // changed groups move only while the budget lasts). The delta here
  // exercises all three classes: src19 arrives whole (NEW), the
  // sub-'src2' sources grow by their %4 docs (CHANGED), src2..src9
  // stay untouched (KEPT). Oracle = BOTH greedies replayed as
  // recursive CTEs (the q200 pattern): the warehouse LPT builds the
  // existing plan, the budgeted re-plan walks candidates over the
  // kept groups' loads with the moves counter in its state.
  private def q206(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val isBatch = (col("doc_id") % 4 === 0 && col("source") < "src2") ||
      col("source") === "src19"
    val existing = graft.etl.ShardPlanner.planShards(
      docs.filter(!isBatch), "source", "n_chars", numShards = 4)
    graft.etl.ShardPlanner.replanShards(existing, docs.filter(isBatch),
      "source", "n_chars", numShards = 4, maxMoves = 2)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q206_shard_replan" -> q206 _,
    "q200_shard_plan" -> q200 _,
    "q135_freq_state_median" -> q135 _,
    "q144_mad_outliers" -> q144 _,
    "q122_scd2_history" -> q122 _,
    "q124_agg_state_merge" -> q124 _,
    "q126_cdc_apply" -> q126 _,
    "q129_scd2_increment" -> q129 _)

  /** q200 twin: LPT replayed step by step — srcs in (weight DESC,
    * source ASC) order, state = the 4-slot load list, each step adds
    * to the first minimal slot (list_indexof finds the FIRST match —
    * the operator's strict-< scan). */
  private def shardPlanOracle: String =
    // COALESCE mirrors the operator (r12, ADVICE): planShards
    // coalesces an all-NULL-weight group to 0, so the oracle must too
    // — a bare SUM would propagate NULL through w and the rank order.
    "WITH RECURSIVE srcs AS (SELECT source AS g, " +
      "CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS w, " +
      "ROW_NUMBER() OVER (ORDER BY COALESCE(SUM(n_chars), 0) DESC, source) AS rn " +
      "FROM documents GROUP BY 1), " +
      "step AS (" +
      "SELECT 0 AS i, [CAST(0 AS BIGINT), 0, 0, 0] AS loads, " +
      "CAST(NULL AS VARCHAR) AS g, CAST(NULL AS BIGINT) AS w, " +
      "CAST(NULL AS INT) AS shard " +
      "UNION ALL " +
      "SELECT s.rn, " +
      "list_transform([1, 2, 3, 4], j -> CASE " +
      "WHEN j = list_indexof(st.loads, list_min(st.loads)) " +
      "THEN st.loads[j] + s.w ELSE st.loads[j] END), " +
      "s.g, s.w, " +
      "CAST(list_indexof(st.loads, list_min(st.loads)) - 1 AS INT) " +
      "FROM step st JOIN srcs s ON s.rn = st.i + 1), " +
      "fin AS (SELECT loads FROM step ORDER BY i DESC LIMIT 1) " +
      "SELECT st.g AS source, st.w AS weight, st.shard, " +
      "fin.loads[st.shard + 1] AS shard_load " +
      "FROM step st, fin WHERE st.g IS NOT NULL ORDER BY source"

  /** q206 twin: both greedies replayed — `estep` rebuilds the existing
    * plan (q200's LPT over the warehouse split), `rstep` walks the
    * delta candidates (merged weight DESC, group ASC) with the budget
    * counter in its recursion state: new groups take the first-minimal
    * slot, changed groups take it only while moves < 2 and their
    * target differs from their kept shard. Kept groups ride through
    * from `unchg` with moved = FALSE. */
  private def shardReplanOracle: String = {
    val batchPred = "(doc_id % 4 = 0 AND source < 'src2') OR source = 'src19'"
    "WITH RECURSIVE " +
      shardReplanCtes(s"FROM documents WHERE NOT ($batchPred)",
        s"FROM documents WHERE $batchPred") + " " +
      "SELECT u.g AS source, u.w AS weight, u.shard, " +
      "fin.loads[u.shard + 1] AS shard_load, FALSE AS moved " +
      "FROM unchg u, fin " +
      "UNION ALL " +
      "SELECT st.g, st.w, st.shard, fin.loads[st.shard + 1], st.moved " +
      "FROM rstep st, fin WHERE st.g IS NOT NULL " +
      "ORDER BY source"
  }

  /** The q206 recursion factored for reuse (r12, q208): the full
    * existing-plan rebuild (`whd`/`estep`/`oldp`), the delta rollup
    * (`dlq` — its FROM/WHERE is the parameter, so the capstone can
    * point it at the batch docs its own verdict ladder KEPT), and the
    * budgeted re-plan walk (`unchg`/`base`/`cand`/`rstep`/`fin`).
    * Both relations must expose `source` and `n_chars`; 4 shards,
    * 2 moves (the q206/q208 configuration). Emits CTEs only — callers
    * prepend WITH RECURSIVE and select from unchg/rstep/fin. */
  private[queries] def shardReplanCtes(whdFromWhere: String,
                                       dlqFromWhere: String): String = {
    // the budgeted target shard for the candidate row c over state st
    val tgt = "CASE WHEN c.old_shard IS NULL " +
      "THEN list_indexof(st.loads, list_min(st.loads)) - 1 " +
      "WHEN list_indexof(st.loads, list_min(st.loads)) - 1 = c.old_shard " +
      "THEN c.old_shard " +
      "WHEN st.moves < 2 " +
      "THEN list_indexof(st.loads, list_min(st.loads)) - 1 " +
      "ELSE c.old_shard END"
    val isMove = "(c.old_shard IS NOT NULL " +
      "AND list_indexof(st.loads, list_min(st.loads)) - 1 <> c.old_shard " +
      "AND st.moves < 2)"
    // COALESCE in whd/dlq mirrors replanShards (r12, ADVICE): an
    // all-NULL-weight group plans at 0 operator-side; a bare SUM
    // would send NULL through cand's merged weight and diverge.
    "whd AS (SELECT source AS g, " +
      "CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS w, " +
      "ROW_NUMBER() OVER (ORDER BY COALESCE(SUM(n_chars), 0) DESC, source) AS rn " +
      s"$whdFromWhere GROUP BY 1), " +
      "estep AS (" +
      "SELECT 0 AS i, [CAST(0 AS BIGINT), 0, 0, 0] AS loads, " +
      "CAST(NULL AS VARCHAR) AS g, CAST(NULL AS BIGINT) AS w, " +
      "CAST(NULL AS INT) AS shard " +
      "UNION ALL " +
      "SELECT s.rn, " +
      "list_transform([1, 2, 3, 4], j -> CASE " +
      "WHEN j = list_indexof(st.loads, list_min(st.loads)) " +
      "THEN st.loads[j] + s.w ELSE st.loads[j] END), " +
      "s.g, s.w, " +
      "CAST(list_indexof(st.loads, list_min(st.loads)) - 1 AS INT) " +
      "FROM estep st JOIN whd s ON s.rn = st.i + 1), " +
      "oldp AS (SELECT g, w, shard FROM estep WHERE g IS NOT NULL), " +
      "dlq AS (SELECT source AS g, " +
      "CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS dw " +
      s"$dlqFromWhere GROUP BY 1), " +
      "unchg AS (SELECT o.g, o.w, o.shard FROM oldp o " +
      "WHERE NOT EXISTS (SELECT 1 FROM dlq d WHERE d.g = o.g)), " +
      "base AS (SELECT [" +
      "CAST(COALESCE(SUM(CASE WHEN shard = 0 THEN w END), 0) AS BIGINT), " +
      "CAST(COALESCE(SUM(CASE WHEN shard = 1 THEN w END), 0) AS BIGINT), " +
      "CAST(COALESCE(SUM(CASE WHEN shard = 2 THEN w END), 0) AS BIGINT), " +
      "CAST(COALESCE(SUM(CASE WHEN shard = 3 THEN w END), 0) AS BIGINT)" +
      "] AS loads FROM unchg), " +
      "cand AS (SELECT d.g, COALESCE(o.w, 0) + d.dw AS w, " +
      "o.shard AS old_shard, " +
      "ROW_NUMBER() OVER (ORDER BY COALESCE(o.w, 0) + d.dw DESC, d.g) AS rn " +
      "FROM dlq d LEFT JOIN oldp o ON o.g = d.g), " +
      "rstep AS (" +
      "SELECT 0 AS i, (SELECT loads FROM base) AS loads, 0 AS moves, " +
      "CAST(NULL AS VARCHAR) AS g, CAST(NULL AS BIGINT) AS w, " +
      "CAST(NULL AS INT) AS shard, CAST(NULL AS BOOLEAN) AS moved " +
      "UNION ALL " +
      "SELECT c.rn, " +
      s"list_transform([1, 2, 3, 4], j -> CASE WHEN j = 1 + ($tgt) " +
      "THEN st.loads[j] + c.w ELSE st.loads[j] END), " +
      s"st.moves + CASE WHEN $isMove THEN 1 ELSE 0 END, " +
      s"c.g, c.w, CAST($tgt AS INT), $isMove " +
      "FROM rstep st JOIN cand c ON c.rn = st.i + 1), " +
      "fin AS (SELECT loads FROM rstep ORDER BY i DESC LIMIT 1)"
  }

  val oracle: Map[String, String] = Map(
    "q206_shard_replan" -> shardReplanOracle,
    "q200_shard_plan" -> shardPlanOracle,
    // q144: medians via the same cum*2 >= total rank rule, MAD as the
    // median of the absolute-deviation grid, 3-MAD integer flag
    "q144_mad_outliers" ->
      ("WITH f AS (SELECT o_orderpriority AS k, " +
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v " +
        "FROM orders), " +
        "mw AS (SELECT k, v, sum(count(*)) OVER (PARTITION BY k ORDER BY v " +
        "ROWS UNBOUNDED PRECEDING) AS cum, " +
        "sum(count(*)) OVER (PARTITION BY k) AS total FROM f GROUP BY k, v), " +
        "med AS (SELECT k, CAST(max(total) AS BIGINT) AS n, " +
        "min(v) AS median_cents FROM mw WHERE cum * 2 >= total GROUP BY k), " +
        "d AS (SELECT f.k, f.v, abs(f.v - med.median_cents) AS dev, " +
        "med.n, med.median_cents FROM f JOIN med ON f.k = med.k), " +
        "dw AS (SELECT k, dev, sum(count(*)) OVER (PARTITION BY k ORDER BY dev " +
        "ROWS UNBOUNDED PRECEDING) AS cum, " +
        "sum(count(*)) OVER (PARTITION BY k) AS total FROM d GROUP BY k, dev), " +
        "mad AS (SELECT k, min(dev) AS mad_cents FROM dw " +
        "WHERE cum * 2 >= total GROUP BY k) " +
        "SELECT d.k AS o_orderpriority, CAST(max(d.n) AS BIGINT) AS n, " +
        "max(d.median_cents) AS median_cents, max(mad.mad_cents) AS mad_cents, " +
        "CAST(SUM(CASE WHEN d.dev > 3 * mad.mad_cents THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_outliers " +
        "FROM d JOIN mad ON d.k = mad.k GROUP BY d.k"),
    // q135: full-scan re-derivation of the exact median on the cents
    // grid — same lower-quantile rank rule (cum*2 >= total) the state
    // walk applies, so merge-vs-rebuild equality is cross-engine-checked
    "q135_freq_state_median" ->
      ("WITH f AS (SELECT o_orderpriority, " +
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v " +
        "FROM orders), " +
        "c AS (SELECT o_orderpriority, v, count(*) AS n FROM f GROUP BY 1, 2), " +
        "w AS (SELECT o_orderpriority, v, " +
        "sum(n) OVER (PARTITION BY o_orderpriority ORDER BY v " +
        "ROWS UNBOUNDED PRECEDING) AS cum, " +
        "sum(n) OVER (PARTITION BY o_orderpriority) AS total FROM c) " +
        "SELECT o_orderpriority, CAST(max(total) AS BIGINT) AS n, " +
        "min(v) AS median_cents FROM w WHERE cum * 2 >= total GROUP BY 1"),
    "q122_scd2_history" ->
      ("WITH e AS (SELECT user_id, epoch_ns(ts) AS t, event_id, event_type " +
        "FROM events), " +
        "o AS (SELECT user_id, t, event_id, event_type, " +
        "lag(event_type) OVER w AS prev, row_number() OVER w AS rn FROM e " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), " +
        "c AS (SELECT * FROM o WHERE rn = 1 OR prev IS DISTINCT FROM event_type), " +
        "v AS (SELECT user_id, event_type, " +
        "CAST(row_number() OVER w2 AS BIGINT) AS version, " +
        "t AS valid_from, lead(t) OVER w2 AS valid_to FROM c " +
        "WINDOW w2 AS (PARTITION BY user_id ORDER BY t, event_id)) " +
        "SELECT user_id, event_type, version, valid_from, valid_to, " +
        "valid_to IS NULL AS is_current FROM v"),
    "q124_agg_state_merge" ->
      ("SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS sum_cents, " +
        "MIN(o_totalprice) AS min_v, MAX(o_totalprice) AS max_v " +
        "FROM orders GROUP BY o_orderpriority, o_orderstatus"),
    // q129 oracle: the FULL-history rebuild (q122's derivation verbatim)
    // — incremental apply must be indistinguishable from it
    "q129_scd2_increment" ->
      ("WITH e AS (SELECT user_id, epoch_ns(ts) AS t, event_id, event_type " +
        "FROM events), " +
        "o AS (SELECT user_id, t, event_id, event_type, " +
        "lag(event_type) OVER w AS prev, row_number() OVER w AS rn FROM e " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), " +
        "c AS (SELECT * FROM o WHERE rn = 1 OR prev IS DISTINCT FROM event_type), " +
        "v AS (SELECT user_id, event_type, " +
        "CAST(row_number() OVER w2 AS BIGINT) AS version, " +
        "t AS valid_from, lead(t) OVER w2 AS valid_to FROM c " +
        "WINDOW w2 AS (PARTITION BY user_id ORDER BY t, event_id)) " +
        "SELECT user_id, event_type, version, valid_from, valid_to, " +
        "valid_to IS NULL AS is_current FROM v"),
    // q126: base rows (line 1) dedup by the same full-tuple max the
    // operator's aggregate applies; log winner = max full tuple among
    // lines >= 2; FULL join so log-inserted keys (814 sf0.001 orders
    // have no line 1) and untouched base keys both survive.
    "q126_cdc_apply" ->
      ("WITH r5 AS (SELECT l_orderkey, l_linenumber, l_partkey, " +
        "l_quantity, l_returnflag FROM lineitem), " +
        "lastop AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey " +
        "ORDER BY l_linenumber DESC, l_partkey DESC, l_quantity DESC, " +
        "l_returnflag DESC) AS rn FROM r5 WHERE l_linenumber >= 2), " +
        "basewin AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey " +
        "ORDER BY l_partkey DESC, l_quantity DESC, l_returnflag DESC) AS rn " +
        "FROM r5 WHERE l_linenumber = 1), " +
        "fin AS (SELECT COALESCE(b.l_orderkey, lo.l_orderkey) AS k, " +
        "COALESCE(lo.l_quantity, b.l_quantity) AS q, " +
        "COALESCE(lo.l_returnflag, 'N') AS rf " +
        "FROM (SELECT * FROM basewin WHERE rn = 1) b " +
        "FULL JOIN (SELECT * FROM lastop WHERE rn = 1) lo " +
        "ON b.l_orderkey = lo.l_orderkey) " +
        "SELECT o_orderpriority, COUNT(*) AS n, " +
        "CAST(SUM(CAST(q AS DECIMAL(18,2)) * 100) AS BIGINT) AS qty_cents " +
        "FROM fin JOIN orders ON o_orderkey = k " +
        "WHERE rf <> 'R' GROUP BY o_orderpriority"))
}
