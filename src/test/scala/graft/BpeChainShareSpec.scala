package graft

import org.apache.spark.sql.functions._

/** r13 verdict #7's measurement: x94 (iterative BPE) and x114
  * (tokenizer coverage) share ONE bpeChain staging through the
  * session memo — the largest by-design sf3 cold cost (32-34 s each
  * in the whole-registry pass). The question was whether one shared
  * chain materialization per suite (instead of per query) moves the
  * suite number. This spec MEASURES the split: the second consumer's
  * cold with the memo warm vs with the memo cleared — the delta IS
  * the chain-build share a shared-across-queries policy would save.
  *
  * The measurement is also the adoption DECISION (recorded in
  * BASELINE.md r14): any real long-lived session already gets the
  * sharing (the memo is session-scoped; nothing to build). Only
  * Bench's clearMemo-between-queries forces each query to pay the
  * chain on its own cold sample — and that is deliberate ATTRIBUTION
  * (a query's bench number must carry its own derivation cost, or
  * Map iteration order decides which query looks expensive — the
  * exact hazard the r7 warmup work closed). So the suite number is
  * left as-is, honest and attributed; the saving is documented as a
  * session property, not a bench patch.
  *
  * Gated on the session-ephemeral sf3 corpus like the other scale
  * probes (cancels cleanly when /tmp/graft-sf3 is absent; generate
  * with tools/gen_scale.py). Assertions are deliberately loose
  * (ratios, not absolutes): the point is the artifact's printed
  * split, the pin is just "sharing saves a non-trivial fraction".
  */
class BpeChainShareSpec extends SparkSpec {

  private val sf3 = "/tmp/graft-sf3"

  test("x114 cold with the x94 chain memo warm vs cleared: the shared-staging split, measured") {
    assume(new java.io.File(sf3).exists(), "sf3 corpus not generated")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sf3).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    operators.LlmData.clearMemo(spark)
    val x94Cold = run("x94_bpe_iterative")          // builds the chain
    val x114Shared = run("x114_tokenizer_coverage") // rides the memo
    operators.LlmData.clearMemo(spark)
    val x114Cold = run("x114_tokenizer_coverage")   // rebuilds the chain
    operators.LlmData.clearMemo(spark)
    info(f"x94 cold (chain build) $x94Cold%.1f s; x114 shared $x114Shared%.1f s; " +
      f"x114 cold (own chain) $x114Cold%.1f s; chain share ${x114Cold - x114Shared}%.1f s")
    assert(x114Shared < x114Cold,
      "riding the session memo must beat rebuilding the chain")
    // the chain is the DOMINANT cost of a fresh x114 — the documented
    // reason its sf3 cold is large, and the bound that keeps this
    // probe honest if a refactor ever silently unshares the staging
    assert(x114Shared < x114Cold * 0.7,
      f"sharing should save >30%% of a fresh x114: $x114Shared%.1f vs $x114Cold%.1f")
  }
}
