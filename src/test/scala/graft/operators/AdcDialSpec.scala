package graft.operators

/** The ADC arm of the recall-dial story (r9 verdict #4): NprobeDialSpec
  * pins IVF's nprobe dial at the bench SF; this pins PQ-ADC's RERANK
  * DEPTH dial for the x67/x72/x73 family. Direct 4-byte-code ADC top-k
  * carries little fine ranking power on near-uniform synthetic vectors
  * (x73's scaladoc reports the honest 0.0 at sf0.01) — the production
  * lever is the two-stage shape: ADC shortlist of R, exact re-rank of
  * the survivors, recall monotone in R because a grown shortlist's
  * re-rank can only be displaced by true top-k members. This spec
  * measures the R curve at sf0.1 and pins that a recall ≥ 0.8
  * configuration exists by R ≤ 2000 (the registered x73 stays at the
  * oracle'd R=50). The honest scale rule the curve exposes: on THIS
  * corpus (near-uniform random vectors — the hardest case for PQ) the
  * shortlist quality is fraction-of-corpus-like, so R must scale ∝ N
  * to hold recall (measured: R = 0.4·N reaches 1.0 at BOTH sf0.01 and
  * sf0.1 — 200/500 and 2000/5000); real clustered embeddings hold the
  * fraction far lower, and the corpusK ∝ N discipline applies to R
  * exactly as it does to K. Numbers land in BASELINE.md's r10 dial
  * table. */
class AdcDialSpec extends graft.SparkSpec {

  test("ADC rerank depth 50->100->200 at the bench SF: recall rises to >= 0.8") {
    assume(sf01Exists, s"bench corpus $sf01 not present on this box")
    val k = 10
    val exact = LlmData.annExactTopK(spark, sf01, k).select("vec_id")
    // stage-1 context: direct ADC top-k recall (no re-rank) — reported,
    // not asserted; 4-byte codes are a shortlist generator, not a ranker
    val direct = Curation.adcTopK(spark, sf01, k)
      .select("vec_id").join(exact, "vec_id").count()
    info(f"direct ADC top-$k recall ${direct.toDouble / k}%.2f ($direct/$k)")
    val curve = Seq(50, 200, 800, 2000).map { r =>
      val t0 = System.nanoTime()
      val hits = Curation.adcRerankTopK(spark, sf01, k, depth = r)
        .select("vec_id").join(exact, "vec_id").count()
      val ms = (System.nanoTime() - t0) / 1000000
      val recall = hits.toDouble / k
      info(f"R=$r%d: recall $recall%.2f ($hits%d/$k%d), ${ms}ms")
      (r, recall)
    }
    assert(curve.sliding(2).forall { case Seq((_, r1), (_, r2)) => r1 <= r2 },
      s"recall must not decrease with rerank depth: $curve")
    assert(curve.last._2 >= 0.8,
      s"an R <= 2000 configuration must reach recall 0.8, got: $curve")
  }
}
