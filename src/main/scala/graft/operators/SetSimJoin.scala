package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join with prefix filtering (AllPairs /
  * PPJoin family: Bayardo et al. WWW'07, Xiao et al. WWW'08).
  *
  * Finds EVERY pair with token-set Jaccard >= tau — a completeness
  * guarantee [[Dedup.minHashLsh]] cannot give (LSH recall is
  * probabilistic and its `maxBucket` cap drops degenerate buckets).
  * This is the exact-recall rung of the near-dup ladder, the same way
  * [[FuzzyJoin]] is for edit distance.
  *
  * Never all-pairs. Three independent prunes bound the candidate join:
  *
  *  1. **Prefix filter.** Order every set by ascending global document
  *     frequency (ties by token); two sets with Jaccard >= tau MUST
  *     share a token within their first `sz - ceil(tau*sz) + 1` tokens
  *     under ANY common total order, so only those prefixes join. The
  *     df-ascending order makes prefix tokens the RARE ones, so join
  *     buckets stay small — frequent tokens never block anything.
  *  2. **Length filter.** Jaccard >= tau forces tau <= sz_a/sz_b <= 1/tau;
  *     applied in the join condition.
  *  3. **Positional filter** (PPJoin). A prefix hit at position p_a/p_b
  *     caps the achievable overlap at `1 + min(sz_a-p_a, sz_b-p_b)`;
  *     candidates that cannot reach `ceil(tau/(1+tau)*(sz_a+sz_b))`
  *     common tokens are dropped before the distinct.
  *
  * tau is a rational `simNum/simDen` and every prune plus the final
  * verification is integer arithmetic (`n_common*den >= num*(sz_a+sz_b
  * -n_common)`) — bit-identical across engines, no float epsilon.
  *
  * Scale shape: tokenize/explode is row-local; df is one token-keyed
  * aggregate (never a driver collect — the "dictionary" stays
  * distributed and joins back by token); the candidate join shuffles
  * prefix tokens only; verification joins token arrays for SURVIVING
  * candidates only. Optional `blockCols` (metadata blocking — standard
  * entity-resolution practice) intersect the join on equal block keys,
  * bounding the join to within-block pairs; the completeness guarantee
  * then holds within blocks. Worst-case candidate volume on adversarial
  * single-token corpora is quadratic in the largest bucket — that is
  * inherent to EXACT joins (Xiao et al. §2); use minHashLsh when
  * approximate recall is acceptable and the data is degenerate.
  *
  * Reference shape: exact near-dup pass of the curation dedup family
  * (/root/reference/src/analysis/dedup.py jaccard sections re-expressed
  * as a complete join rather than per-pair checks).
  */
object SetSimJoin {

  /** ceil(a/b) for non-negative integer columns (exact: values are far
    * below 2^53, so the double division is exact after floor). */
  private def ceilDiv(a: Column, b: Column): Column =
    floor((a + b - lit(1)) / b).cast("long")

  /** All pairs (id_a < id_b) whose DISTINCT-token Jaccard >= simNum/simDen,
    * with equal `blockCols` values (empty seq = corpus-wide).
    *
    * @param df       input rows
    * @param idCol    unique id (total order — ids must not repeat)
    * @param tokensCol expression producing the token array (pre-distinct
    *                 not required; duplicates are removed here)
    * @return (id_a, id_b, n_common, sz_a, sz_b) — all LongType
    */
  def selfJoin(df: DataFrame, idCol: String, tokensCol: Column,
               simNum: Int, simDen: Int,
               blockCols: Seq[String] = Seq.empty): DataFrame = {
    require(simNum > 0 && simNum <= simDen,
      s"similarity threshold $simNum/$simDen out of (0, 1]")
    val num = lit(simNum.toLong)
    val den = lit(simDen.toLong)
    val blocks = blockCols.map(col)

    val t = df.select(
      (col(idCol).cast("long").as("id") +: blocks) :+
        array_distinct(tokensCol).as("l"): _*)
      .withColumn("sz", size(col("l")).cast("long"))

    val tok = t.select(
      (col("id") +: blocks) ++ Seq(col("sz"), explode(col("l")).as("token")): _*)

    // Global df per token — the ordering only needs to be SOME total
    // order shared by all sets, so block-local dfs are unnecessary.
    val dfreq = tok.groupBy(col("token")).agg(count(lit(1)).as("df"))

    // Per-set prefix under (df asc, token asc): sort a collected
    // (df, token) struct array row-locally — sets are documents, so the
    // array is memory-bounded; no per-set window shuffle.
    val ordered = tok.join(dfreq, "token")
      .groupBy((col("id") +: blocks) :+ col("sz"): _*)
      .agg(array_sort(collect_list(struct(col("df"), col("token")))).as("ord"))
    val prefLen = (col("sz") - ceilDiv(num * col("sz"), den) + lit(1)).cast("int")
    val prefix = ordered
      .select((col("id") +: blocks) ++ Seq(col("sz"),
        posexplode(slice(col("ord"), lit(1), greatest(prefLen, lit(0))))): _*)
      .select((col("id") +: blocks) ++ Seq(col("sz"),
        (col("pos") + lit(1)).as("pos"), col("col.token").as("token")): _*)

    val a = prefix.alias("a")
    val b = prefix.alias("b")
    val blockEq = blockCols
      .map(c => col(s"a.$c") === col(s"b.$c"))
      .foldLeft(lit(true))(_ && _)
    val overlapNeed = ceilDiv(num * (col("a.sz") + col("b.sz")), num + den)
    val cand = a.join(b,
        col("a.token") === col("b.token") && blockEq &&
          col("a.id") < col("b.id") &&
          col("a.sz") * den >= num * col("b.sz") &&
          col("b.sz") * den >= num * col("a.sz") &&
          lit(1) + least(col("a.sz") - col("a.pos"),
            col("b.sz") - col("b.pos")) >= overlapNeed)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .distinct()

    cand
      .join(t.select(col("id").as("id_a"), col("l").as("l_a")), "id_a")
      .join(t.select(col("id").as("id_b"), col("l").as("l_b")), "id_b")
      .withColumn("n_common", size(array_intersect(col("l_a"), col("l_b"))).cast("long"))
      .filter(col("n_common") * den >= num * (col("sz_a") + col("sz_b") - col("n_common")))
      .select(col("id_a"), col("id_b"), col("n_common"), col("sz_a"), col("sz_b"))
  }
}
