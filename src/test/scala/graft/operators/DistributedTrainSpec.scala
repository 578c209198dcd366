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

  test("above the threshold the plan is join-based: broadcast scoring, no literal argmax") {
    val dist = LlmData.assignedByTrainedQuantizer(spark, sf0001, 16, literalMax = 0)
    val plan = dist.queryExecution.sparkPlan.toString
    // scoring rides a broadcast of the centroid FRAME (nested-loop over
    // the K-row broadcast side — the sanctioned Lloyd's shape, K-bounded
    // per row), and the assignment rejoins the corpus by vec_id; the
    // K-literal transform/array_max expression must be absent
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"centroid scoring must broadcast the centroid frame, got:\n${plan.take(1500)}")
    assert(!plan.contains("array_max"),
      "the distributed path must not fall back to the literal argmax")
  }
}
