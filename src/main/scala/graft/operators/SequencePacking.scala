package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Sequence packing for LLM pretraining pipelines: place documents into
  * fixed-capacity context windows.
  *
  * Two semantics, matching what real pipelines use:
  *
  *  - [[concatChop]] — the "packed pretraining" layout: documents are
  *    concatenated in a deterministic order and chopped every `capacity`
  *    tokens (documents may straddle window boundaries; the attention mask
  *    handles document edges downstream). Fully declarative: a windowed
  *    running sum per shard — one shuffle, oracle-verifiable, scales
  *    linearly.
  *  - [[greedyPack]] — no-straddle first-fit-in-order bins: a document
  *    never splits; a new bin opens when the current one cannot fit the
  *    next document. Inherently sequential per shard, so it runs as a
  *    sorted `mapPartitions` over range-sharded input — the ONE
  *    per-partition imperative loop this library allows itself, bounded
  *    by shard size.
  *
  * Sharding: `pmod(hash(id), shards)` spreads documents uniformly;
  * each shard packs independently (real pipelines pack per worker the
  * same way — global order is not semantically meaningful, determinism
  * is). At 100 TB choose shards ≈ cluster parallelism.
  */
object SequencePacking {

  /** Deterministic shard for a document id (decorrelates id ranges). For
    * oracle-checked pipelines pass an explicit portable expression (e.g.
    * `pmod(id, shards)`) as `shardBy` instead — xxhash64 has no DuckDB
    * twin. */
  def shardOf(id: Column, shards: Int): Column =
    pmod(xxhash64(id), lit(shards.toLong))

  /** Concat-and-chop packing: returns one row per document with its
    * window span — (shard, doc id, n_tokens, start_offset, first window,
    * last window, n_windows spanned). `windowOf(t) = floor(t / capacity)`
    * over the running token offset in shard order (id-ordered within
    * shard). */
  def concatChop(df: DataFrame, idCol: String, textCol: String,
                 capacity: Int, shards: Int,
                 shardBy: Option[Column] = None): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("shard", shardBy.getOrElse(shardOf(col(idCol), shards)))
      .withColumn("start_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("first_window", floor(col("start_offset") / capacity))
      .withColumn("last_window",
        floor((col("start_offset") + col("n_tokens") - 1) / capacity))
      .withColumn("n_windows", col("last_window") - col("first_window") + 1)
  }

  /** First-fit greedy packing (no straddle): returns (shard, doc id,
    * n_tokens, bin) with bin numbering local to the shard. Documents
    * longer than `capacity` get their own bin. Sequential within a shard:
    * repartition by shard, sort by (shard, id), run the fill loop per
    * partition. */
  def greedyPack(df: DataFrame, idCol: String, textCol: String,
                 capacity: Int, shards: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df
      .select(col(idCol).cast("long").as("id"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("shard", shardOf(col("id"), shards))
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
      .as[(Long, Long, Long)]
    prepared.mapPartitions { rows =>
      var curShard = Long.MinValue
      var bin = -1L
      // capacity+1 forces the first document to open bin 0 without the
      // overflow a MaxValue sentinel would hit in `fill + n`
      var fill = capacity + 1L
      rows.map { case (id, n, shard) =>
        if (shard != curShard) { curShard = shard; bin = -1L; fill = capacity + 1L }
        if (fill + n > capacity) { bin += 1; fill = 0L }
        fill += n
        (shard, id, n, bin)
      }
    }.toDF("shard", "id", "n_tokens", "bin")
  }
}
