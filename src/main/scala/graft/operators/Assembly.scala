package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T5 assembly — "Outfits are assembled by combining exactly one item per
  * enabled slot … No duplicate products within an outfit"
  * (reference docs/Generator Execution & Scoring Model - RF (1.15.2026).md:198-214).
  *
  * Greedy, deterministic: slots are processed in ascending slot order (for
  * the reference's named slots that IS priority order); each slot takes its
  * best-scoring product not already used by an earlier slot, ties broken by
  * ascending product id. A slot whose whole pool is already consumed is
  * left unfilled (the reference discards incoherent assemblies rather than
  * duplicating an item).
  *
  * Scale shape: only the top-S candidates per slot (S = #slots) can ever be
  * picked — at most S-1 products are consumed by the other slots — so the
  * catalog-sized input is reduced by one per-slot window to ≤ S² rows, and
  * the inherently sequential greedy walk runs on that bounded set
  * driver-side (same sanctioned pattern as the k-row IVF centroid seed).
  */
object Assembly {

  /** One row per filled slot: (slotCol, productCol, scoreCol), best-score
    * greedy assignment with no product reuse across slots. */
  def assembleDistinct(candidates: DataFrame, slotCol: String,
                       productCol: String, scoreCol: String): DataFrame = {
    val spark = candidates.sparkSession
    // A product listed twice within a slot is one candidate at its best score.
    val best = candidates.groupBy(col(slotCol), col(productCol))
      .agg(max(col(scoreCol)).as(scoreCol))
    // r13: the slot count rides the SAME job as the top-S collect (a
    // 1-row broadcast cross join) instead of its own count() action —
    // the old two-action form re-ran the whole candidate groupBy once
    // just to size the window's rank bound. distinct-then-count keeps
    // a NULL slot counted exactly as count() did (countDistinct would
    // silently drop it).
    val nSlotsDf = best.select(col(slotCol)).distinct()
      .agg(count(lit(1)).as("__n_slots"))
    val w = Window.partitionBy(col(slotCol))
      .orderBy(col(scoreCol).desc, col(productCol))
    val topS = best
      .withColumn("__rk", row_number().over(w))
      .crossJoin(broadcast(nSlotsDf))
      .filter(col("__rk") <= col("__n_slots"))
      .orderBy(col(slotCol), col("__rk"))
      .drop("__rk", "__n_slots")
      .collect() // bounded: ≤ S² rows
    if (topS.isEmpty) return best.limit(0)

    val used = scala.collection.mutable.Set.empty[Any]
    val filled = scala.collection.mutable.Set.empty[Any]
    val picks = new java.util.ArrayList[Row]()
    topS.foreach { r =>
      val slot = r.get(0)
      val product = r.get(1)
      if (!filled.contains(slot) && !used.contains(product)) {
        filled += slot
        used += product
        picks.add(r)
      }
    }
    spark.createDataFrame(picks, best.schema)
  }
}
