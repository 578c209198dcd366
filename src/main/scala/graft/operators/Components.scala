package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the cluster-
  * resolution step a dedup pipeline needs between near-dup PAIR
  * generation (x22/x23) and survivor selection: near-duplication is
  * transitive in intent (A~B, B~C ⇒ one cluster), so keeping one doc
  * per PAIR over-deletes and keeping one per CLUSTER is the actual
  * semantics.
  *
  * Algorithm: distributed min-label propagation. Every node starts
  * labeled with itself; each round every node takes the min of its own
  * and its neighbors' labels (one equi-join on node id + one groupBy —
  * two shuffles per round); fixpoint when the global label sum stops
  * changing (labels only ever decrease, so the sum is a strictly
  * decreasing convergence witness — one cheap scalar agg per round, no
  * full-table compare join).
  *
  * Scale notes: rounds = O(max component diameter). Near-dup clusters
  * are dense and shallow (diameter ≲ 5 in practice), so this converges
  * in a handful of data-parallel rounds at any data size. For
  * adversarially long path-shaped graphs the same primitive upgrades
  * to large-star/small-star (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14) with O(log n) rounds; the join/agg
  * loop below is the building block either way. The driver loop only
  * ever sees ONE scalar per round — never row data.
  */
object Components {

  /** @param edges undirected edge list; both columns must be integral
    *              node ids (the component label is the component's min
    *              node id)
    * @param a     left endpoint column name
    * @param b     right endpoint column name
    * @return (node, component) — one row per node that appears in any
    *         edge; component = min node id reachable from it
    */
  def connectedComponents(edges: DataFrame, a: String, b: String,
      maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col(a).cast("long").as("src"), col(b).cast("long").as("dst"))
      .unionByName(edges.select(col(b).cast("long").as("src"), col(a).cast("long").as("dst")))
      .distinct()
      .persist()

    // localCheckpoint, not persist: each round's plan references the
    // previous labels TWICE (join + union), so lineage doubles per
    // round — without truncation the logical plan grows 2^rounds and
    // planning itself OOMs. Checkpointing materializes the ~2-column
    // label table and restarts the plan from it. (On a production
    // cluster prefer reliable checkpoints — setCheckpointDir +
    // .checkpoint() — so executor loss can't kill a long run.)
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    // coalesce: sum over an EMPTY node set is NULL (no edges at all —
    // the clean-corpus case), which must read as converged-at-zero,
    // not an NPE
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum("label"), lit(0L))).head().getLong(0)
    var prevSum = labelSum(labels)

    var i = 0
    var converged = labels.isEmpty
    while (!converged && i < maxIter) {
      val nbr = sym.as("e").join(labels.as("lb"), col("e.dst") === col("lb.node"))
        .select(col("e.src").as("node"), col("lb.label").as("label"))
      val updated = labels.unionByName(nbr)
        .groupBy("node").agg(min("label").as("label"))
        .localCheckpoint()
      val newSum = labelSum(updated)
      // bound storage to two label tables: the superseded round's
      // checkpoint blocks would otherwise sit in memory until GC +
      // ContextCleaner get around to them (up to maxIter copies)
      labels.unpersist(blocking = false)
      labels = updated
      converged = newSum == prevSum
      prevSum = newSum
      i += 1
    }
    sym.unpersist(blocking = false)
    // labels only ever decrease, so a converged sum is a true fixpoint;
    // hitting the round cap without one means the output would contain
    // pseudo-components (labels that are no member's id) — refuse to
    // return silently-wrong clusters
    require(converged,
      s"connected components did not converge in $maxIter rounds — " +
        "raise maxIter (rounds scale with component diameter) or switch " +
        "to the large-star/small-star formulation for path-shaped graphs")
    labels.select(col("node"), col("label").as("component"))
  }
}
