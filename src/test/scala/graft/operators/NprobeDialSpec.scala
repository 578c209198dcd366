package graft.operators

import org.apache.spark.sql.functions._

/** IVF's nprobe recall/cost dial, measured at the bench SF (the r8
  * verdict's gap: x35 measures recall at sf0.01 only, where IVF@
  * nprobe=2 reads 0.6). Mirrors the x51 multiprobe story for LSH:
  * probing more inverted lists trades linearly more scanned
  * candidates for monotonically higher recall. The registered x34 and
  * the oracle chain stay at nprobe=2 (the cheap default whose recall
  * x35 audits); this spec pins the dial's shape — candidates grow
  * with nprobe, recall never decreases, and a recall ≥ 0.8
  * configuration exists within nprobe ≤ 8 of the 16 lists — so the
  * production rule ("raise nprobe until the recall target, cost is
  * linear in probed-list mass") is a measurement, not prose.
  * Numbers land in BASELINE.md's r9 dial table. */
class NprobeDialSpec extends graft.SparkSpec {

  test("nprobe 2->4->8 at the bench SF: candidates grow, recall rises to >= 0.8") {
    assume(sf01Exists, s"bench corpus $sf01 not present on this box")
    val k = 10
    val exact = LlmData.annExactTopK(spark, sf01, k).select("vec_id")
    val curve = Seq(2, 4, 8).map { np =>
      val approx = LlmData.annIvfTopK(spark, sf01, k, nprobe = np)
      val t0 = System.nanoTime()
      val hits = approx.select("vec_id").join(exact, "vec_id").count()
      val ms = (System.nanoTime() - t0) / 1000000
      // probe cost = corpus rows in the probed lists (the rows the
      // ADC/cosine stage must score) — recomputed from the same
      // assignment the probe join reads
      val e = graft.sources.Tables.load(spark, sf01, "embeddings")
      val scored = LlmData.ivfScored(LlmData.trainedCentroids(spark, sf01)) _
      val probed = e.filter(col("vec_id") === 0)
        .select(explode(slice(reverse(array_sort(scored(col("embedding")))), 1, np))
          .as("p")).select(col("p").getField("cid").as("qcid"))
      val cands = e.filter(col("vec_id") =!= 0)
        .withColumn("cid", array_max(scored(col("embedding"))).getField("cid"))
        .join(probed, col("cid") === col("qcid")).count()
      val recall = hits.toDouble / k
      info(f"nprobe=$np%d: recall $recall%.2f ($hits%d/$k%d), candidates $cands%d, ${ms}ms")
      (np, recall, cands)
    }
    // cost is monotone in probed-list mass
    assert(curve.sliding(2).forall { case Seq((_, _, c1), (_, _, c2)) => c1 <= c2 },
      s"candidate count must grow with nprobe: $curve")
    // recall is monotone: a superset of probed lists can only add hits
    assert(curve.sliding(2).forall { case Seq((_, r1, _), (_, r2, _)) => r1 <= r2 },
      s"recall must not decrease with nprobe: $curve")
    assert(curve.last._2 >= 0.8,
      s"an nprobe <= 8 configuration must reach recall 0.8, got: $curve")
  }
}
