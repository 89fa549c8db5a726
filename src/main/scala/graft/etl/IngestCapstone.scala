package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DriftMonitor, NaiveBayes, SegmentDedup}

/** The incremental-pipeline capstone (r12, VERDICT r11 #1): one batch
  * flows state-to-state through every proven incremental rung —
  * segment dedup → exact dedup → MinHash-LSH near-dup →
  * 13-gram/3-gram decontamination → Naive-Bayes quality gate →
  * PSI drift check → budgeted shard re-plan — and emits ONE
  * keep/drop/route decision row per batch document. This is the
  * artifact a 100-TB pipeline ships daily; each rung is individually
  * oracle-green (q171/q188/q185/q202/q195/q205/q206), and the
  * capstone proves the state contracts COMPOSE:
  *
  *  - the NB gate's model is the warehouse count state merged with
  *    the counts of ONLY the batch docs that survived dedup +
  *    decontamination — dedup drops feed the priors (a dropped near
  *    dup never inflates its class), which is exactly what a
  *    from-scratch train over "corpus minus drops" would see;
  *  - the shard re-plan's delta weights are ONLY the kept docs —
  *    verdicts feed the planner, so a contaminated source's weight
  *    never moves shards.
  *
  * Verdict precedence (first match wins; reference semantics are the
  * member rungs' own — `tag_comparison.py:53-224`-style precedence
  * ladders re-expressed over documents):
  *   1. `exact_dup`    — the normalized-text class (warehouse ∪ batch)
  *                       has a smaller-id member (q188's keeper rule;
  *                       evidence: `survivor` = the class min).
  *   2. `shell_doc`    — ≥ 1 segment and EVERY segment already exists
  *                       (warehouse segment state or an earlier
  *                       position — q171's dead rule). Checked after
  *                       exact_dup because every exact dup is also a
  *                       shell; the more specific verdict wins.
  *   3. `near_dup`     — a MinHash-LSH pair (q185's banded probe +
  *                       exact-Jaccard verify) links it to a
  *                       smaller-id doc (evidence: min counterpart).
  *   4. `dirty_13gram` — shares a 13-token shingle with the benchmark
  *                       set (q202's rule; evidence: hit count).
  *   5. `suspect_3gram`— distinct-3-gram containment vs the benchmark
  *                       ≥ 0.8 (q202's rule; evidence: exact e6).
  *   6. `nb_disagrees` — the NB gate's argmax label contradicts the
  *                       declared one (label-noise routing; evidence:
  *                       `predicted`, `margin_e16`).
  *   7. `kept`         — routed: `shard` from the budgeted re-plan.
  *
  * The PSI gate is corpus-level, not per-doc: `psi_e9` (the exact
  * fixed-point total over `weightCol` bins, q203's algebra) and
  * `drift_alert` ride every row as constants — the batch-level
  * go/no-go a monitoring consumer reads off any row.
  *
  * Scale shape: the batch is pinned once (`localCheckpoint`) and
  * every rung touches warehouse state the way its proven incremental
  * form does — segment hashes, LSH bands, count/histogram state are
  * all bounded or banded, never all-pairs; the NB gate scores only
  * survivors (candidate restriction before the heavy kernel, the
  * q196 lesson); the re-plan collects one bounded row per SOURCE.
  * In production each state relation is a persisted table (the
  * streaming twins' warehouse layout); here they are derived in-plan
  * from the warehouse relation, the q171/q185/q195 simulation
  * convention.
  */
object IngestCapstone {

  /** One decision row per batch doc:
    * (idCol, sourceCol, n_segments, n_removed, survivor,
    * n_dirty_13grams, containment_e6, predicted, margin_e16, verdict,
    * psi_e9, drift_alert, shard, moved).
    *
    * `warehouse`/`batch`/`benchmark` must carry `idCol` (integral),
    * `labelCol`, `sourceCol`, `textCol`, `weightCol` (integral —
    * chars/bytes/tokens; doubles as the PSI feature). `benchmark` is
    * the decontamination reference (typically a held-out slice of the
    * warehouse). */
  def ingestDecisions(warehouse: DataFrame, batch0: DataFrame,
                      benchmark: DataFrame, idCol: String, labelCol: String,
                      sourceCol: String, textCol: String, weightCol: String,
                      numShards: Int = 4, maxMoves: Int = 2,
                      psiBinWidth: Long = 100L,
                      psiAlertE9: Long = 100000000L,
                      lshThreshold: Double = 0.3): DataFrame = {
    graft.plans.GraftExtensions.ensure(batch0.sparkSession)
    // every rung reads the batch — pin it once (multi-consumer rule)
    val batch = batch0
      .select(col(idCol), col(labelCol), col(sourceCol), col(textCol),
        col(weightCol))
      .localCheckpoint(true)

    // 1. segment evidence: 3-word lines (the q171 convention), batch
    //    lines dead when in the warehouse segment state or repeated
    def lined(df: DataFrame): DataFrame = df
      .withColumn("__toks", split(col(textCol), "\\s+"))
      .withColumn("__lined", array_join(
        transform(
          sequence(lit(1), expr("(size(__toks) + 2) div 3")),
          i => concat_ws(" ",
            slice(col("__toks"), (i - lit(1)) * lit(3) + lit(1), lit(3)))),
        "\n"))
      .select(col(idCol), col("__lined"))
    val seg = SegmentDedup
      .dedupSegmentsIncremental(lined(warehouse), lined(batch),
        idCol, "__lined", "\n")
      .select(col(idCol), col("n_segments"), col("n_removed"))

    // 2. exact: min id over the normalized-text class of warehouse ∪
    //    batch — one hash-partitioned shuffle, no skew
    val nh = md5(Dedup.normalized(col(textCol)))
    val classMin = warehouse.select(nh.as("__nh"), col(idCol))
      .unionByName(batch.select(nh.as("__nh"), col(idCol)))
      .groupBy(col("__nh")).agg(min(col(idCol)).as("__m"))
    val exact = batch.select(col(idCol), nh.as("__nh"))
      .join(classMin, Seq("__nh"))
      .select(col(idCol),
        when(col("__m") < col(idCol), col("__m")).as("__exs"))

    // 3. near: the q185 banded probe; a doc is flagged by its smallest
    //    similar counterpart (warehouse or batch), whatever that
    //    counterpart's own verdict — redundancy is transitive enough
    //    for a keep/drop table (q188 keeps the component min likewise)
    val pairs = Dedup.minHashLshIncremental(
      Dedup.lshBandWarehouse(warehouse, idCol, textCol),
      warehouse, batch, idCol, textCol, threshold = lshThreshold)
    val near = pairs
      .select(col("id_a").as("__x"), col("id_b").as("__y"))
      .unionByName(pairs.select(col("id_b").as("__x"), col("id_a").as("__y")))
      .filter(col("__y") < col("__x"))
      .join(batch.select(col(idCol).as("__x")), Seq("__x"), "left_semi")
      .groupBy(col("__x").as(idCol)).agg(min(col("__y")).as("__nrs"))

    // 4. decontamination vs the benchmark (q202's layers): distinct
    //    13-gram hits, distinct-3-gram containment
    def shingleSet(df: DataFrame, n: Int): DataFrame = df
      .select(col(idCol),
        explode(call_function("graft_shingles", col(textCol), lit(n)))
          .as("__s"))
      .distinct()
    def benchSet(n: Int): DataFrame =
      shingleSet(benchmark, n).select(col("__s")).distinct()
    val d13 = shingleSet(batch, 13).join(benchSet(13), Seq("__s"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("__n13"))
    val c3 = shingleSet(batch, 3)
      .join(benchSet(3).withColumn("__hit", lit(1L)), Seq("__s"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n3"),
        sum(coalesce(col("__hit"), lit(0L))).as("__nh3"))

    // pre-NB evidence + the dedup/decontam rungs of the ladder — one
    // batch-sized row set consumed by the survivor semi-join, the NB
    // join and the final assembly: pin it (the q167 lesson)
    val pre = batch
      .select(col(idCol), col(labelCol), col(sourceCol), col(weightCol))
      .join(seg, Seq(idCol), "left")
      .join(exact, Seq(idCol), "left")
      .join(near, Seq(idCol), "left")
      .join(d13, Seq(idCol), "left")
      .join(c3, Seq(idCol), "left")
      .select(col(idCol), col(labelCol), col(sourceCol), col(weightCol),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        col("__exs"), col("__nrs"),
        coalesce(col("__n13"), lit(0L)).as("n_dirty_13grams"),
        // exact integer containment — `div` on non-negatives (the
        // q202/q71 oracle-compat rule; `/` would round-trip a double)
        expr("coalesce(__nh3, 0L) * 1000000L div " +
          "greatest(coalesce(__n3, 1L), 1L)").as("containment_e6"))
      .withColumn("__pre",
        when(col("__exs").isNotNull, lit("exact_dup"))
          .when(col("n_segments") > 0 &&
            col("n_removed") === col("n_segments"), lit("shell_doc"))
          .when(col("__nrs").isNotNull, lit("near_dup"))
          .when(col("n_dirty_13grams") > 0, lit("dirty_13gram"))
          .when(col("containment_e6") >= 800000L, lit("suspect_3gram")))
      .localCheckpoint(true)

    // 5. NB gate over SURVIVORS only — warehouse count state merged
    //    with the survivors' own counts (drops feed priors)
    val survivors = batch.join(
      pre.filter(col("__pre").isNull).select(col(idCol)),
      Seq(idCol), "left_semi")
    val nb = NaiveBayes.classifyIncremental(
        NaiveBayes.wordCounts(warehouse, labelCol, textCol),
        NaiveBayes.docCounts(warehouse, labelCol),
        survivors, idCol, labelCol, textCol)
      .select(col(idCol), col("predicted"), col("margin_e16"))

    // 6. PSI gate — one bounded driver scalar (q203's exact algebra)
    val psiE9 = DriftMonitor
      .psiByBin(warehouse, batch, weightCol, psiBinWidth)
      .agg(coalesce(sum(col("psi_term_e9")), lit(0L)))
      .head().getLong(0)

    val decided = pre.join(nb, Seq(idCol), "left")
      .withColumn("verdict", coalesce(col("__pre"),
        when(col("predicted") =!= col(labelCol), lit("nb_disagrees"))
          .otherwise(lit("kept"))))

    // 7. budgeted shard re-plan over the kept docs only
    val existing = ShardPlanner
      .planShards(warehouse, sourceCol, weightCol, numShards)
    val plan = ShardPlanner.replanShards(existing,
        decided.filter(col("verdict") === "kept")
          .select(col(sourceCol), col(weightCol)),
        sourceCol, weightCol, numShards, maxMoves)
      .select(col(sourceCol), col("shard").as("__shard"),
        col("moved").as("__moved"))

    decided.join(plan, Seq(sourceCol), "left")
      .select(col(idCol), col(sourceCol),
        col("n_segments"), col("n_removed"),
        when(col("verdict") === "exact_dup", col("__exs"))
          .when(col("verdict") === "near_dup", col("__nrs"))
          .as("survivor"),
        col("n_dirty_13grams"), col("containment_e6"),
        col("predicted"), col("margin_e16"), col("verdict"),
        lit(psiE9).as("psi_e9"),
        lit(psiE9 >= psiAlertE9).as("drift_alert"),
        when(col("verdict") === "kept", col("__shard")).as("shard"),
        when(col("verdict") === "kept", col("__moved")).as("moved"))
  }
}
