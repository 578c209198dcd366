package graft

import org.apache.spark.sql.functions._

/** Cross-cutting invariants of the relational query surface over the
  * sf0.001 testdata (SURVEY.md §5: percentages sum to 100, top-k is a
  * sorted prefix, dedup is idempotent, integrity checks are clean,
  * set ops are disjoint). The per-value correctness gate is the DuckDB
  * oracle (Verify + parity); these assert the *algebraic* properties
  * the oracle can't see. */
class RelationalInvariantsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("entry: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() == 10)
  }

  test("q02: percentage column sums to ~100") {
    val pct = q("q02_pct_by_priority").agg(sum("pct")).collect()(0).getDouble(0)
    assert(math.abs(pct - 100.0) < 0.1)
  }

  test("q01: top-k is the prefix of the fully sorted join") {
    val topK = q("q01_top10_star_join").collect().map(_.getLong(0)).toSeq
    val sorted = {
      val o = graft.sources.Tables.load(spark, sf0001, "orders")
      val c = graft.sources.Tables.load(spark, sf0001, "customer")
      val n = graft.sources.Tables.load(spark, sf0001, "nation")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .select("o_orderkey").limit(10).collect().map(_.getLong(0)).toSeq
    }
    assert(topK == sorted)
  }

  test("q06: dedup is idempotent and keys are unique") {
    val deduped = q("q06_dedup_latest")
    assert(deduped.count() == deduped.select("user_id").distinct().count())
  }

  test("q08: referential integrity of the synthetic star schema is clean") {
    val orphanTotals = q("q08_integrity_orphans")
      .agg(sum("orphans")).collect()(0).getLong(0)
    assert(orphanTotals == 0L)
  }

  test("q15: result is disjoint from the subtrahend side") {
    val result = q("q15_setops_except").collect().map(_.getLong(0)).toSet
    val subtrahend = graft.sources.Tables.load(spark, sf0001, "events")
      .filter(col("event_type") === "error" &&
        col("ts") < lit("2024-01-05").cast("timestamp"))
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(result.intersect(subtrahend).isEmpty)
  }

  test("x22/x23: near-dup candidates are symmetric-free ordered pairs") {
    for (name <- Seq("x22_minhash_lsh_pairs", "x23_simhash_neardup")) {
      val pairs = SparkEntry.queries(name)(spark, sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.forall { case (a, b) => a < b })
      assert(pairs.distinct.length == pairs.length)
    }
  }

  test("x25: every ANN hit scores exactly what the brute-force scorer says") {
    import graft.functions.Vectors
    val ann = SparkEntry.queries("x25_ann_sign_lsh")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ann.nonEmpty)
    // recompute each ANN hit's cosine independently (HOF path, not the
    // fused kernel) and require exact agreement — a broken bucket join
    // or ranking would surface as a score mismatch
    val e = graft.sources.Tables.load(spark, sf0001, "embeddings")
    val q0 = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val recomputed = e.filter(col("vec_id").isin(ann.keys.toSeq: _*))
      .crossJoin(broadcast(q0))
      .select(col("vec_id"),
        graft.functions.Rounding.pround(
          Vectors.cosine(Vectors.toDouble(col("embedding")), Vectors.toDouble(col("qe"))),
          6).as("cos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(recomputed == ann)
    // and ANN never out-ranks the exact scorer: its best hit's score
    // cannot exceed the exact top-1
    val exactTop = SparkEntry.queries("x24_topk_cosine")(spark, sf0001)
      .collect().map(_.getDouble(1)).max
    assert(ann.values.max <= exactTop)
  }

  test("q25: day-binning reproduces the direct interval predicate exactly") {
    // reference = the semantically obvious (but unscalable) nested-loop
    // interval join; the binned hash join must be value-identical
    val got = q("q25_range_join").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val o = graft.sources.Tables.load(spark, sf0001, "orders")
      .filter(pmod(col("o_orderkey"), lit(1000)) === 1)
      .select(col("o_orderkey").as("w_id"),
        (col("o_orderdate") - expr("INTERVAL 3 DAYS")).as("w_start"),
        (col("o_orderdate") + expr("INTERVAL 3 DAYS")).as("w_end"))
    val ref = graft.sources.Tables.load(spark, sf0001, "lineitem")
      .select("l_shipdate").crossJoin(o)
      .filter(col("l_shipdate") >= col("w_start") && col("l_shipdate") <= col("w_end"))
      .groupBy("w_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref, "binning must not drop or double-count any (line, window) match")
  }

  test("q30: pivot cells partition each priority's order count") {
    // every order has status F, O, or P, so the three pivot counts must
    // sum to the priority's total row count — the reshaping loses nothing
    val totals = graft.sources.Tables.load(spark, sf0001, "orders")
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = q("q30_pivot").collect()
    assert(rows.map(_.getString(0)).toSet == totals.keySet)
    rows.foreach { r =>
      val cells = r.getLong(1) + r.getLong(3) + r.getLong(5)
      assert(cells == totals(r.getString(0)),
        s"${r.getString(0)}: pivot cells $cells != total ${totals(r.getString(0))}")
    }
  }

  test("q31: ranks are bounded below by the damping floor and sorted") {
    val rows = q("q31_pagerank").collect()
    assert(rows.length == 20)
    val ranks = rows.map(_.getLong(1)).toSeq
    // every node receives at least the (1-d) teleport floor; micro-unit
    // integer ranks make this exactly 150000
    ranks.foreach(r => assert(r >= 150000L, s"rank $r below teleport floor"))
    assert(ranks == ranks.sorted.reverse, "top-k must be rank-descending")
    // determinism: a second evaluation bit-matches (integer arithmetic
    // has no accumulation-order sensitivity to hide)
    assert(q("q31_pagerank").collect().map(_.getLong(1)).toSeq == ranks)
  }

  test("every oracle-bearing query's Spark columns appear in its oracle SQL") {
    // cheap schema audit: the driver sorts columns by name before
    // hashing, so an alias mismatch is an automatic FAIL — catch it
    // here without needing DuckDB
    for ((name, sql) <- SparkEntry.oracleSql) {
      val sparkCols = SparkEntry.queries(name)(spark, sf0001).columns
      for (c <- sparkCols)
        assert(sql.toLowerCase.contains(c.toLowerCase),
          s"$name: Spark column '$c' absent from oracle SQL text")
    }
  }
}
