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
        "raise maxIter (rounds scale with component diameter) or use " +
        "connectedComponentsAlternating for path-shaped graphs")
    labels.select(col("node"), col("label").as("component"))
  }

  /** Large-star/small-star connected components (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14):
    * converges in O(log n) rounds regardless of component DIAMETER,
    * where min-label propagation needs O(diameter) — the difference
    * between 5 and 50 shuffles on a chain-shaped near-dup corpus
    * (sequentially drifted edits form exactly such chains).
    *
    * Each round is two data-parallel star operations over the canonical
    * (hi > lo) edge list:
    *   - large-star: every edge (hi, lo) re-points hi at
    *     m(lo) = min(N(lo) ∪ {lo}) — one groupBy for the per-node min,
    *     one join to apply it;
    *   - small-star: every center hi gathers its smaller neighbors and
    *     re-points them (and itself) at their minimum.
    * Both only ever REPLACE an endpoint with a smaller one, so the
    * (count, endpoint-sum, mixed-hash) triple is stationary iff the
    * edge multiset is — the fixpoint test is one 4-scalar aggregate per
    * half-round, never a driver-side edge compare.
    *
    * Output contract matches [[connectedComponents]]: one (node,
    * component) row per distinct endpoint (self-loop-only nodes
    * included), component = the member minimum.
    */
  def connectedComponentsAlternating(edges: DataFrame, a: String, b: String,
      maxIter: Int = 30): DataFrame = {
    val nodes = edges.select(col(a).cast("long").as("node"))
      .unionByName(edges.select(col(b).cast("long").as("node")))
      .distinct()
      .persist()

    def canon(df: DataFrame): DataFrame = df
      .filter(col("hi") =!= col("lo"))
      .distinct()

    var e = canon(edges.select(
        greatest(col(a).cast("long"), col(b).cast("long")).as("hi"),
        least(col(a).cast("long"), col(b).cast("long")).as("lo")))
      .localCheckpoint()

    def sig(df: DataFrame): (Long, Long, Long, Long) = {
      val r = df.agg(
        count(lit(1)),
        coalesce(sum("hi"), lit(0L)),
        coalesce(sum("lo"), lit(0L)),
        // endpoints reduced mod M before the multiply so the mixed hash
        // can't overflow a long (ANSI mode would throw) for any id
        coalesce(sum(pmod(
          pmod(col("hi"), lit(1000000007L)) * 2654435761L +
            pmod(col("lo"), lit(1000000007L)) * 40503L,
          lit(1000000007L))), lit(0L))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }

    var prev = sig(e)
    var i = 0
    var converged = prev._1 == 0L
    while (!converged && i < maxIter) {
      // large-star: m over ALL neighbors of each node (both roles)
      val nbrs = e.select(col("hi").as("u"), col("lo").as("v"))
        .unionByName(e.select(col("lo").as("u"), col("hi").as("v")))
      val mins = nbrs.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val large = canon(e
        .join(mins.withColumnRenamed("u", "lo"), "lo")
        .select(col("hi"), col("m").as("lo")))
        .localCheckpoint()
      e.unpersist(blocking = false)

      // small-star: per center hi, re-point the smaller neighbors and
      // the center itself at their minimum
      val mins2 = large.groupBy("hi").agg(min("lo").as("m"))
      val small = canon(large
        .join(mins2, "hi")
        .select(col("lo").as("hi"), col("m").as("lo"))
        .unionByName(mins2.select(col("hi"), col("m").as("lo"))))
        .localCheckpoint()
      large.unpersist(blocking = false)

      val cur = sig(small)
      e = small
      converged = cur == prev
      prev = cur
      i += 1
    }
    require(converged,
      s"alternating components did not converge in $maxIter rounds")
    // fixpoint = star forest: every edge is (member, root)
    val out = nodes.join(e.withColumnRenamed("hi", "node"), Seq("node"), "left")
      .select(col("node"), coalesce(col("lo"), col("node")).as("component"))
    nodes.unpersist(blocking = false)
    out
  }
}
