package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog (CDC) apply: fold an ordered stream of upsert/delete ops
  * into a base snapshot — the Debezium-shaped ingestion pattern, and the
  * delete-aware generalization of `Pipeline.upsert` (S5/S6; S8 covers
  * predicate deletes, this covers KEYED deletes carried by the log).
  *
  * Semantics: per key, the LAST op in (base ≺ log, then `orderCols`)
  * wins — a delete op erases the key, an upsert op replaces the payload,
  * keys the log never touches pass through from base. Exactly the state
  * a per-key replay would produce, computed in ONE map-side-combined
  * `max_by` aggregate: no window, no per-partition sort, and the shuffle
  * carries at most one candidate row per (key, map partition) — the same
  * shuffle-volume argument as the upsert reshape (Pipeline.scala), which
  * is what holds at a 100 TB changelog backlog. Skew-safe for the same
  * reason: partial aggregation collapses a hot key map-side.
  *
  * Determinism contract: `orderCols` must be unique per key within the
  * log (CDC logs carry an LSN/offset that is); ties otherwise resolve by
  * the struct's payload comparison, which is deterministic but arbitrary.
  */
object Cdc {

  /** @param base     snapshot: key columns + payload columns
    * @param log      ops: same schema as base PLUS `opCol`
    * @param opCol    op discriminator column in `log`
    * @param orderCols log ordering within a key (LSN / sequence / line no)
    * @param deleteOp `opCol` value marking a delete; anything else upserts
    */
  def applyLog(
      base: DataFrame,
      log: DataFrame,
      keys: Seq[String],
      opCol: String,
      orderCols: Seq[String],
      deleteOp: String = "delete"): DataFrame = {
    require(keys.nonEmpty, "cdc apply needs at least one key column")
    require(orderCols.nonEmpty, "cdc apply needs log ordering columns")
    require(log.columns.toSet == base.columns.toSet + opCol,
      s"log schema must be base schema plus '$opCol' " +
        s"(base=${base.columns.mkString(",")} log=${log.columns.mkString(",")})")
    require(!base.columns.contains("__op") && !base.columns.contains("__seq"),
      "input already has a __op/__seq column")
    require(opCol != "__op" && opCol != "__seq",
      s"opCol must not be the reserved '__op'/'__seq' name (got '$opCol')")

    def ref(c: String) = col("`" + c.replace("`", "``") + "`")
    val payload = base.columns.filterNot(keys.contains).toSeq
    val b = base
      .withColumn("__op", lit("u"))
      .withColumn("__seq", lit(0))
    val l = log
      .withColumn("__op", when(ref(opCol) === deleteOp, lit("d")).otherwise(lit("u")))
      .drop(opCol)
      .withColumn("__seq", lit(1))
    val ordered = (Seq("__seq") ++ orderCols).map(ref)
    b.unionByName(l)
      .groupBy(keys.map(ref): _*)
      .agg(max_by(struct(("__op" +: payload).map(ref): _*),
        struct(ordered: _*)).as("__w"))
      .filter(col("__w").getField("__op") =!= "d")
      .select(base.columns.map(c =>
        if (keys.contains(c)) ref(c) else col("__w").getField(c).as(c)).toSeq: _*)
  }
}
