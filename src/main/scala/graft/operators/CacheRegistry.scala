package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.storage.StorageLevel

/** One-call cache registry (round 8) — the bounded middle ground
  * between "persist and leak" (the r6 SetSimJoin leak: CacheManager
  * holds persisted corpora strongly, so looping calls in one session
  * accumulate them) and "eager checkpoint + unpersist" (the r7 shape:
  * bounded, but every re-run of the SAME call re-paid the full
  * upstream pass, and DataFrame construction became eager).
  *
  * The registry keeps the live caches of the MOST RECENT call only:
  * each [[retainAll]] unpersists every previously-retained frame whose
  * canonicalized plan is not among the new call's, then persists (or
  * re-uses, when the plan is identical — CacheManager matches
  * canonicalized plans, so a repeated call hits the existing blocks)
  * the new ones. Memory stays bounded at one call's frames, results
  * stay fully lazy (persist marks the plan; nothing executes here),
  * and repeated identical calls — the bench shape, and the production
  * loop shape (dedup rounds, probe batches against one train corpus)
  * — keep their cache.
  *
  * One instance per operator object, so each operator's bound and
  * [[release]] lifecycle are independent (SetSimJoinSpec /
  * BloomFiltersSpec pin their own bounds). */
final class CacheRegistry {

  /** Key = (canonicalized plan, output column names). Canonicalization
    * alone normalizes exprIds and strips aliases (r8 ADVICE): two frames
    * computing the same relation under DIFFERENT column names would
    * otherwise collide, and the caller would get back the stale frame —
    * its own `col(name)` then failing to resolve. Carrying the output
    * names in the key keeps the reuse (same plan, same names → cache
    * hit) while never handing a caller a frame with the wrong schema. */
  private type Key = (LogicalPlan, Seq[String])

  private var retained: Map[Key, DataFrame] = Map.empty

  /** Retain exactly `ts` (deduplicated by canonicalized plan + names):
    * unpersist everything previously retained that is not in `ts`,
    * persist what is new, pass through what is already retained. */
  def retainAll(ts: Seq[DataFrame]): Seq[DataFrame] = synchronized {
    val keyed = ts.map { t =>
      (t.queryExecution.analyzed.canonicalized,
        t.schema.fieldNames.toSeq): Key
    }.zip(ts)
    val keep = keyed.map(_._1).toSet
    retained.foreach { case (k, df) => if (!keep(k)) df.unpersist() }
    val next = keyed.map { case (k, t) =>
      k -> retained.getOrElse(k, {
        t.persist(StorageLevel.MEMORY_AND_DISK)
        t
      })
    }
    retained = next.toMap
    next.map(_._2)
  }

  /** Release every retained cache (idempotent). Results stay correct
    * afterwards — lineage is intact, plans recompute. */
  def release(): Unit = synchronized {
    retained.foreach(_._2.unpersist())
    retained = Map.empty
  }

  /** Test observability (specs must not count the session-global
    * persistent-RDD set — other suites persist concurrently). */
  def retainedFrames: Seq[DataFrame] = synchronized(retained.values.toSeq)
}
