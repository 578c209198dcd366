package graft.operators

/** Measures the scale DIAL the slope table (BASELINE.md r8) prescribes
  * for the one by-design super-linear query: x48 SemDeDup's per-cluster
  * pairwise stage is quadratic in cluster size, so at fixed K a 10×
  * corpus pays ~100× pairs — and the documented rule is K ∝ N. This
  * spec measures the rule instead of asserting it: same pipeline, same
  * session, K=16 vs K=160 on the sf1 corpus (and the sf0.1/K=16
  * baseline for the slope denominator). Recorded r8 numbers
  * (local[4]): sf1/K=16 31.1 s, sf1/K=160 2.55 s, sf0.1/K=16 0.47 s —
  * the dial collapses the 10×-data slope from ~66× to ~5.4×.
  *
  * Guarded by assume(): the sf1 corpus is generated locally
  * (`python3 tools/gen_scale.py /root/testdata/sf0.1 /tmp/graft-sf1 10`)
  * and doesn't exist on the driver box — the test cancels, not fails,
  * when absent.
  */
class ScaleDialSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.expressions.Window

  /** x48's assignment + pair stage (the measured cost center), K as
    * the dial; returns (clusters-with-pairs, wall ms). */
  private def pairStage(dir: String, k: Int): (Long, Long) = {
    val s = spark
    val asg = graft.sources.Tables.load(s, dir, "embeddings")
      .withColumn("cid",
        array_max(LlmData.ivfScored(LlmData.trainedCentroids(s, dir, k))(
          col("embedding"))).getField("cid"))
      .persist()
    asg.count() // materialize assignment outside the timed window
    val w = Window.partitionBy("cid").orderBy(desc("cos"), asc("va"), asc("vb"))
    val t0 = System.nanoTime()
    val n = LlmData.cosinePairs(asg, "cid")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .count()
    val ms = (System.nanoTime() - t0) / 1000000
    asg.unpersist()
    (n, ms)
  }

  test("x48's K ∝ N dial collapses the pair-stage quadratic at sf1") {
    assume(new java.io.File("/tmp/graft-sf1/embeddings.parquet").exists(),
      "sf1 corpus not generated (tools/gen_scale.py) — skipping")
    val (nFixed, msFixed) = pairStage("/tmp/graft-sf1", 16)
    val (nScaled, msScaled) = pairStage("/tmp/graft-sf1", 160)
    assert(nFixed == 16 && nScaled == 160,
      "every cluster should contain pairs at these sizes")
    // the dial must recover at least 4× — the measured gap is ~12×,
    // asserted loosely so scheduler noise can't flake the suite
    assert(msScaled * 4 < msFixed,
      s"K∝N should collapse the quadratic: K=16 ${msFixed}ms vs K=160 ${msScaled}ms")
  }
}
