package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components — the step that turns pairwise
  * near-duplicate candidates (MinHash-LSH / SimHash / embedding buckets)
  * into duplicate CLUSTERS with a canonical representative, which is what
  * a dedup pass over a 100 TB corpus actually keeps: one doc per
  * component, not one doc per pair.
  *
  * Algorithm: min-label propagation. Every node starts labeled with its
  * own id; each round every node takes the minimum label in its 1-hop
  * neighborhood; at the fixpoint every component is labeled by its
  * minimum id. A
  * round is one shuffle join (neighbor labels) + one aggregation, so k
  * rounds cost k·2 shuffles of |V|+|E| rows — no per-component data
  * concentration, so a giant component cannot hot-spot a partition the
  * way a groupBy-component would. Rounds needed = graph diameter, which
  * for near-dup clusters (cliques-with-bridges around a base document)
  * is small; for adversarial long-chain graphs switch to the
  * small-star/large-star alternation of Kiveris et al., "Connected
  * Components in MapReduce and Beyond" (SoCC'14), which converges in
  * O(log²) rounds with the same per-round shape.
  *
  * Iteration mechanics (the standard Spark pattern, same as GraphFrames
  * CC): each round `localCheckpoint`s the label table to truncate the
  * exponentially-growing lineage, and the convergence test (`changed ==
  * 0`) is a driver-side count — a sanctioned mid-query action because the
  * iteration count is data-dependent; everything inside a round is a
  * declarative plan Catalyst optimizes normally.
  */
object ConnectedComponents {

  /** @param edges undirected edges as columns `src`, `dst` (any long ids)
    * @param nodes node universe as column `id` (isolated nodes become
    *              singleton components)
    * @return one row per node: (id, component) with component = min node
    *         id reachable from `id` */
  def minLabel(edges: DataFrame, nodes: DataFrame, maxIter: Int = 25): DataFrame = {
    // materialized once: the edge list is re-joined every round, and an
    // expensive upstream (e.g. the LSH candidate pipeline) must not be
    // re-executed per iteration
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = nodes.select(col("id"), col("id").as("component"))
      .localCheckpoint(true)
    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      val nbrMin = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(sym("src").as("nid"))
        .agg(min(col("component")).as("nbr_min"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(labels("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"),
          (col("nbr_min") < col("component")).as("changed"))
        .localCheckpoint(true)
      converged = next.filter(col("changed")).isEmpty
      labels = next.select("id", "component")
      round += 1
    }
    labels
  }
}
