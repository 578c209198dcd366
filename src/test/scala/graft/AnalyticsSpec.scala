package graft

/** Plan-shape + semantics audits for the q33+ analytics module. The
  * value-level contract is the DuckDB oracle (driver gate); these
  * tests pin what the oracle can't see — the physical shapes that make
  * the queries survive a 100× scale-up. */
class AnalyticsSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("q37: EXISTS/NOT EXISTS decorrelate to semi + anti hash joins") {
    val p = plan("q37_exists_subquery")
    assert(p.contains("LeftSemi"), "EXISTS must plan as a left-semi join")
    assert(p.contains("LeftAnti"), "NOT EXISTS must plan as a left-anti join")
    // decorrelation failed if any subquery survives to the physical plan
    assert(!p.toLowerCase.contains("subquery"),
      "correlated subqueries must not reach execution")
  }

  test("q34: CUBE plans ONE Expand feeding one partial+final agg") {
    val p = plan("q34_cube")
    assert("Expand".r.findAllIn(p).size == 1,
      "all 4 grouping combinations must ride a single Expand")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "partial aggregation must happen before the shuffle")
  }

  test("q40: dim⋈dim join broadcasts; no sort-merge") {
    val p = plan("q40_string_agg")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q33: INTERSECT distinct-aggregates before the join") {
    val p = plan("q33_intersect")
    assert(p.contains("LeftSemi"), "INTERSECT must plan as a semi join")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "set semantics need distinct aggregation on the inputs")
  }

  test("q36: conditional aggregates stay a single-pass partial agg (one scan)") {
    val p = plan("q36_conditional_agg")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      "FILTER-style counts must not fan into per-predicate scans")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q38: both window frames evaluate in one Window node over one sort") {
    val p = plan("q38_running_window")
    // same partitioning + ordering ⇒ Spark fuses the running and
    // sliding frames; two Window nodes would mean a redundant sort
    assert("Window".r.findAllIn(p).size <= 2,
      s"expected fused window evaluation, got:\n${p.take(1500)}")
    assert("Exchange".r.findAllIn(p).size <= 2,
      "frames must reuse the user_id partitioning, not reshuffle per frame")
  }

  test("q41: NOT IN lowers to null-aware anti joins; the poisoned variant returns 0") {
    val d = SparkEntry.queries("q41_not_in_nulls")(spark, sf0001)
    val p = d.queryExecution.executedPlan.toString
    // NAAJ prints as the trailing `true` flag on the broadcast anti join
    assert(p.contains("LeftAnti, BuildRight, true"),
      s"expected null-aware anti joins, got:\n${p.take(1500)}")
    val rows = d.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("null_poisoned") == 0L,
      "one NULL in the NOT IN list must empty the result (3VL)")
    assert(rows("clean_list") > 0L)
  }

  test("q42: interpolated days lie between their knots; ends carry the nearest knot") {
    val rows = SparkEntry.queries("q42_interpolate")(spark, sf0001).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getBoolean(1), r.getDouble(2)))
    assert(rows.length == 30)
    val knots = rows.filter(_._2).map(r => r._1 -> r._3)
    assert(knots.nonEmpty)
    rows.filterNot(_._2).foreach { case (d, _, v) =>
      val prev = knots.filter(_._1.isBefore(d)).lastOption
      val next = knots.find(_._1.isAfter(d))
      (prev, next) match {
        case (Some((_, a)), Some((_, b))) =>
          assert(v >= math.min(a, b) - 1e-9 && v <= math.max(a, b) + 1e-9,
            s"$d: $v outside [$a, $b]")
        case (Some((_, a)), None) => assert(v == a, s"tail must carry last knot")
        case (None, Some((_, b))) => assert(v == b, s"head must carry first knot")
        case _ => fail("no knots")
      }
    }
  }

  test("q43: unpivot expands AFTER the aggregate, not over raw rows") {
    val q = SparkEntry.queries("q43_unpivot")(spark, sf0001)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("Expand"))
    // the Expand must sit above the aggregate: the wide table is 3
    // rows, so the reshape replicates aggregate output, never the scan
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(q.count() == 6)
  }

  test("q44: variant extraction stays a single scan with the aggregate on top") {
    val p = plan("q44_variant")
    assert("Scan parquet".r.findAllIn(p).size == 1)
    assert(p.contains("variant_get") || p.contains("parse_json"),
      s"expected variant path in plan:\n${p.take(1200)}")
  }

  test("q39: ntile bucketing agrees with manual quartile arithmetic") {
    val out = SparkEntry.queries("q39_ntile_buckets")(spark, sf0001).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    val ns = out.map(_.getLong(1))
    // ntile: sizes differ by at most 1, earlier buckets take the remainder
    assert(ns.max - ns.min <= 1)
    assert(ns.sorted.reverse.toSeq == ns.toSeq)
    // buckets tile the price range in order
    val mins = out.map(_.getDouble(2)); val maxs = out.map(_.getDouble(3))
    (0 until 3).foreach(i => assert(maxs(i) <= mins(i + 1)))
  }
}
