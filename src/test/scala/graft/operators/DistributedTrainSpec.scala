package graft.operators

import org.apache.spark.sql.functions._

/** Bit-parity and plan-shape contract for the distributed Lloyd's path
  * ([[LlmData.trainCentroidsDf]] / [[LlmData.assignDf]]) that
  * [[LlmData.assignedByTrainedQuantizer]] routes to above
  * [[LlmData.LiteralKMax]].
  *
  * The dial that makes x48 linear (corpusK: K ∝ N) also makes K grow
  * without bound, eroding the literal path's two K-bounded comforts —
  * the K×dim driver collect in the Lloyd's loop and the K-literal
  * argmax expression. The distributed path removes both (centroids
  * stay a DataFrame, assignment is a broadcast join); this spec proves
  * the switch is SAFE by pinning bit-equality against the literal path
  * at K=16 — the same path every oracle-checked query exercises — and
  * pins the plan shape the dispatcher promises above the threshold. */
class DistributedTrainSpec extends graft.SparkSpec {

  private lazy val e = graft.sources.Tables.load(spark, sf0001, "embeddings")

  test("distributed Lloyd's reproduces the literal centroids bit-for-bit at K=16") {
    val literal = LlmData.trainedCentroids(spark, sf0001, 16)
    val df = LlmData.trainCentroidsDf(e, 16)
    val dist = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toIndexedSeq)
      .sortBy(_._1).toSeq
    df.unpersist(blocking = false)
    assert(dist.map(_._1) == literal.map(_._1), "same cluster ids")
    // exact Float equality — micro-unit sums are order-free integers
    // and both paths replay the identical divide/cast sequence
    assert(dist == literal, "centroid values must match bit-for-bit")
  }

  test("forced-distributed assignment equals the literal assignment at K=16") {
    val lit16 = LlmData.assignedByTrainedQuantizer(spark, sf0001, 16)
      .select("vec_id", "cid").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = LlmData.assignedByTrainedQuantizer(spark, sf0001, 16, literalMax = 0)
    val distMap = dist.select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distMap.size == lit16.size, "same corpus coverage")
    assert(distMap == lit16,
      "every vector must land in the same cluster under both paths")
  }

  test("sf1/K=160: the distributed path reproduces the literal assignment at corpusK scale") {
    // the width corpusK actually derives at sf1 — the parity claim is
    // only as strong as the largest K it is checked at, and K=160 is
    // where the dial lives today (LiteralKMax=256 keeps sf1 on the
    // literal path in production; this forces both paths and compares)
    assume(new java.io.File("/tmp/graft-sf1/embeddings.parquet").exists(),
      "sf1 corpus not generated (tools/gen_scale.py) — skipping")
    val dir = "/tmp/graft-sf1"
    def timeIt[A](f: => A): (A, Long) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1000000)
    }
    val (litMap, msLit) = timeIt {
      LlmData.assignedByTrainedQuantizer(spark, dir, 160)
        .select("vec_id", "cid").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val (distMap, msDist) = timeIt {
      LlmData.assignedByTrainedQuantizer(spark, dir, 160, literalMax = 0)
        .select("vec_id", "cid").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    info(s"K=160 at sf1: literal ${msLit}ms, distributed ${msDist}ms (${litMap.size} vectors)")
    assert(distMap.size == litMap.size)
    assert(distMap == litMap,
      "distributed Lloyd's + join assignment must equal the literal path at K=160")
  }

  test("above the threshold the plan broadcasts the packed centroids; corpus side never shuffles") {
    val dist = LlmData.assignedByTrainedQuantizer(spark, sf0001, 16, literalMax = 0)
    val plan = dist.queryExecution.sparkPlan.toString
    // the centroids are packed into ONE array row (collect_list) and
    // broadcast; the argmax runs WITHIN each corpus row, so the corpus
    // side must carry no shuffle, no sort-based aggregate, and no join
    // back — the failure mode this pins out is the pair-row form whose
    // struct-max buffer forced SortAggregate over N×K materialized rows
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"centroid scoring must broadcast the packed centroid row, got:\n${plan.take(1500)}")
    assert(plan.contains("collect_list"),
      "the broadcast side must pack the centroid frame into one array row")
    // scope the shuffle asserts to the ASSIGNMENT plan: the broadcast
    // side scans the persisted trained-centroid frame, and the plan
    // string inlines that cache's own training plan (whose groupBy
    // shuffles are legitimate) below the InMemoryRelation line
    val assignPlan = plan.split("InMemoryRelation")(0)
    assert(!assignPlan.contains("SortAggregate"),
      "per-row argmax must not reintroduce the sort-based struct-max aggregate")
    assert(!assignPlan.contains("SortMergeJoin") && !assignPlan.contains("hashpartitioning"),
      "the corpus side must not shuffle or join back for assignment")
  }
}
