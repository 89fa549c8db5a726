package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Capacity-balanced shard planning — the warehouse-maintenance
  * primitive behind file compaction and write fan-out control: given a
  * weight per group (bytes, rows, tokens), assign groups to N shards
  * so loads balance. Greedy LPT (longest-processing-time: sort weights
  * descending, place each on the currently-lightest shard) — the
  * classic 4/3-OPT makespan bound (Graham 1969), fully deterministic
  * with the (weight desc, group asc) order and lowest-index tie-break
  * on shards.
  *
  * The per-group weights come from a distributed aggregate; the greedy
  * itself runs driver-side over the collected group list — bounded
  * like a centroid list (the KMeans/MMR convention: shard planning is
  * over GROUPS — sources, partitions, file buckets — whose count a
  * deployment keeps in the thousands, not over rows). Output is the
  * assignment artifact a writer consumes: one row per group with its
  * weight, shard, and the shard's FINAL load (so consumers can read
  * imbalance straight off the plan).
  */
object ShardPlanner {

  /** Assign each distinct value of `groupCol` to one of `numShards`
    * shards, weighting groups by `sum(weightCol)`. Returns
    * (group, weight, shard, shard_load) — shard ids are 0-based.
    * `maxGroups` bounds the driver collect (the limit(max+1) decider
    * convention): planning is for group-level objects, and a caller
    * holding more groups than the bound should pre-bucket them. */
  def planShards(df: DataFrame, groupCol: String, weightCol: String,
                 numShards: Int, maxGroups: Int = 100000): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    // r11 (ADVICE): getLong below assumed a non-null Long sum — a
    // double weight column ClassCastException'd and an all-null group
    // NPE'd, both without a message. Weights are capacity units
    // (bytes/rows/tokens): require an integral column, and let a group
    // whose weights are all NULL plan at weight 0.
    val wType = df.schema(weightCol).dataType
    require(wType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }, s"planShards weights are capacity units (bytes/rows/tokens) and " +
      s"must be integral; '$weightCol' is $wType — pre-scale and cast")
    val spark = df.sparkSession
    import spark.implicits._
    val rolled = df
      .groupBy(col(groupCol).cast("string").as("g"))
      .agg(coalesce(sum(col(weightCol)), lit(0L)).as("w"))
    val collected = rolled
      .limit(maxGroups + 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    require(collected.length <= maxGroups,
      s"planShards collects the group list to the driver; more than " +
        s"$maxGroups groups — pre-bucket the group column or raise maxGroups")
    // LPT order: heaviest first, group-ascending ties
    val groups = collected.sortBy { case (g, w) => (-w, g) }
    val loads = new Array[Long](numShards)
    val assigned = groups.map { case (g, w) =>
      var best = 0
      var i = 1
      while (i < numShards) {
        if (loads(i) < loads(best)) best = i // strict < = lowest-index ties
        i += 1
      }
      loads(best) += w
      (g, w, best)
    }
    assigned.toSeq
      .map { case (g, w, s) => (g, w, s, loads(s)) }
      .toDF(groupCol, "weight", "shard", "shard_load")
  }
}
