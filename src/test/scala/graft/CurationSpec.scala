package graft

/** Plan-shape + invariant audits for the Curation module (x63–x66).
  * Values are oracle-checked by the driver; these pin the physical
  * shapes (map-side compute, no stray shuffles/joins) and the
  * mathematical invariants the oracle can't express. */
class CurationSpec extends SparkSpec {

  private def df(name: String) = SparkEntry.queries(name)(spark, sf0001)
  private def plan(name: String): String =
    df(name).queryExecution.executedPlan.toString

  test("x63: diversity is a map-side projection — one scan, no aggregation shuffle") {
    val p = plan("x63_token_diversity")
    assert("Scan parquet".r.findAllIn(p).size == 1)
    assert(!p.contains("HashAggregate"), "per-doc score must not shuffle")
  }

  test("x63: simpson bounds and degenerate cases hold") {
    val rows = df("x63_token_diversity").collect()
    rows.foreach { r =>
      val (n, d, s) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(d <= n)
      assert(s >= 0.0 && s < 1.0)
      if (d == 1) assert(s == 0.0, s"single-token doc must score 0, got $s")
    }
  }

  test("x64: weighted top-50 plans a distributed heap, not a global sort") {
    assert(plan("x64_weighted_sample").contains("TakeOrderedAndProject"))
  }

  test("x65: PQ assignment is map-side — no join, one embeddings scan") {
    val p = plan("x65_pq_codes")
    assert(!p.contains("Join"), "codebook must ride the expression, not a join")
    // 2 scans total: one for the codebook collect is eager and gone by
    // plan time; the returned frame scans embeddings exactly once
    assert("Scan parquet".r.findAllIn(p).size == 1)
  }

  test("x65: codebook vectors quantize to themselves in every subspace") {
    val rows = df("x65_pq_codes").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    (1L to 8L).foreach { cid =>
      assert(rows(cid) == ((cid, cid, cid, cid)),
        s"codebook vec $cid must be its own nearest code, got ${rows(cid)}")
    }
  }

  test("x67: ADC search broadcasts the query table and plans a heap") {
    val p = plan("x67_ann_adc")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the 4×8 distance table must broadcast")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("x67: ADC distances are non-negative and ascending") {
    val rows = df("x67_ann_adc").collect()
    assert(rows.length == 5)
    val ds = rows.map(_.getDouble(1))
    assert(ds.forall(_ >= 0.0))
    assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
  }

  test("x69: fuzzy matching blocks on deletion keys — no cartesian, no nested loop") {
    val p = plan("x69_symdel_fuzzy")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate generation must be a key-equality join")
  }

  test("x69: every suggested correction is within edit distance 1") {
    val rows = df("x69_symdel_fuzzy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (typo, sug) = (r.getString(1), r.getString(2))
      // the confirm filter's own guarantee, re-checked independently
      assert(levenshtein(typo, sug) <= 1, s"$typo -> $sug")
    }
  }

  private def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("x66: rarity is bounded below by 1 and vocabulary join stays one pass") {
    val rows = df("x66_rarity_score").collect()
    rows.foreach(r => assert(r.getDouble(2) >= 1.0,
      s"mean inverse frequency can't dip under 1: ${r}"))
  }
}
