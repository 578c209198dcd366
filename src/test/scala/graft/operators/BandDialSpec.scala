package graft.operators

/** Measures x22's band/width dial (BASELINE.md r8 prose → r9 numbers):
  * for a 16-slot minhash, 4×4 banding fires a bucket collision at
  * Jaccard s with probability 1−(1−s⁴)⁴ (threshold s* ≈ 0.71) while
  * 2×8 raises the threshold to s* ≈ 0.92 — so as the corpus (and with
  * it band-bucket occupancy) grows, the tighter setting sheds the
  * sub-threshold false-positive candidates that the confirm stage
  * would otherwise pay an array_intersect for. This spec measures the
  * candidate-pair count for BOTH settings at sf0.1 and sf1 (10× data)
  * and pins the dial's direction: tighter bands admit no more
  * candidates at either SF, and their candidate growth across the 10×
  * step is no worse. The registered x22/x58 stay at 4×4 (mirrored in
  * the shared oracle chain — no oracle change); the dial is the
  * production lever for corpora where near-dup means "almost
  * identical" (crawl dedup: s ≥ 0.9), exactly when 2×8's threshold
  * fits.
  *
  * Guarded by assume(): needs the bench corpus and the locally
  * generated sf1 corpus (`tools/gen_scale.py`), cancels when absent. */
class BandDialSpec extends graft.SparkSpec {

  private def candidates(dir: String, bands: Int, rows: Int): (Long, Long) = {
    val d = LlmData.minhashHashed(spark, dir)
    val t0 = System.nanoTime()
    val n = LlmData.minhashCandPairs(d, bands, rows).count()
    (n, (System.nanoTime() - t0) / 1000000)
  }

  test("tighter banding (2x8) sheds sub-threshold candidates and its growth at 10x data is no worse") {
    assume(sf01Exists, s"bench corpus $sf01 not present on this box")
    assume(new java.io.File("/tmp/graft-sf1/documents.parquet").exists(),
      "sf1 corpus not generated (tools/gen_scale.py) — skipping")
    val (c44s, ms44s) = candidates(sf01, 4, 4)
    val (c28s, ms28s) = candidates(sf01, 2, 8)
    val (c44l, ms44l) = candidates("/tmp/graft-sf1", 4, 4)
    val (c28l, ms28l) = candidates("/tmp/graft-sf1", 2, 8)
    info(s"sf0.1: 4x4 $c44s cands (${ms44s}ms), 2x8 $c28s cands (${ms28s}ms)")
    info(s"sf1:   4x4 $c44l cands (${ms44l}ms), 2x8 $c28l cands (${ms28l}ms)")
    // direction: a strictly higher collision threshold can only shrink
    // the candidate set (the planted near-identical dups survive both)
    assert(c28s <= c44s && c28l <= c44l,
      "2x8 must admit no more candidates than 4x4 at any corpus size")
    assert(c28l > 0, "planted near-identical dups must survive the tighter bands")
    // the dial's point: candidate GROWTH across the 10x step is no
    // worse under the tighter setting (small slack for integer noise)
    val g44 = c44l.toDouble / math.max(c44s, 1L)
    val g28 = c28l.toDouble / math.max(c28s, 1L)
    info(s"10x-data candidate growth: 4x4 ${g44}x, 2x8 ${g28}x")
    assert(g28 <= g44 * 1.05,
      s"tighter bands must not grow candidates faster (4x4 ${g44}x vs 2x8 ${g28}x)")
  }
}
