package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's stdout SIZE CONTRACT: the driver captures only the last
  * 2000 chars of stdout and parses the JSON line out of that tail, with
  * sbt's `[success] Total time ...` line (~80 chars) landing after it.
  * Round 4's line overflowed the tail (two 9-decimal per-query maps)
  * and the round's bench artifact parsed as null — this spec makes that
  * failure a compile-time-adjacent one: registering enough new queries
  * to overflow the budget fails the build here, not in the driver.
  *
  * No Spark session needed: the line is assembled from the registered
  * query NAMES plus worst-case-width fake timings.
  */
class BenchFormatSpec extends AnyFunSuite {

  test("fmt emits minimal adaptive-precision JSON numbers, max 3 chars under 1000") {
    assert(Bench.fmt(1.504999) == "1.5")
    assert(Bench.fmt(2.0) == "2")
    assert(Bench.fmt(0.176) == "0.2")
    assert(Bench.fmt(43.658835076) == "44")
    assert(Bench.fmt(-1.0) == "-1")
    assert(Bench.fmt(0.0) == "0")
    assert(Bench.fmt(0.5) == "0.5")
    assert(Bench.fmt(11.197) == "11")
    assert(Bench.fmt(9.96) == "10")
    assert(Bench.fmt(100.4) == "100")
    // the budget's uniform width bound: nothing through 999.4 prints
    // wider; from 999.5 HALF_UP yields "1000" (the documented 4-char
    // boundary case the budget's slack absorbs)
    for (v <- Seq(0.01, 0.99, 0.176, 5.55, 9.94, 99.9, 999.4))
      assert(Bench.fmt(v).length <= 3, s"fmt($v) = ${Bench.fmt(v)} wider than 3")
    assert(Bench.fmt(999.5) == "1000")
  }

  test("worst-case JSON line fits the driver's 2000-char tail with headroom") {
    // fmt bounds every value below 1000 s to 3 chars (asserted above),
    // so 999.0 IS the worst per-query width — the perf bar is
    // single-digit seconds, so a suite where any query broke 1000 s is
    // a lost round regardless of whether the line parses, and a
    // straggler costs 1 extra char, well inside the margin this budget
    // leaves.
    // +1 for the visible "staging" warmup row the real bench prepends
    val names = "staging" +: SparkEntry.queries.keys.toSeq.sorted
    val worst = names.map(_ -> (999.0, 999.0))
    // worst-case adjudication widths ride the line too (the r15 #3
    // columns + the r16 iowait column): the real bench always passes
    // the full map
    val adj = names.map(_ -> (99999L, 999L, 999L, 0.99, 0.99, 0.99)).toMap
    val line = Bench.jsonLine(worst, "/root/testdata/sf0.1", None, adj)
    assert(line.contains("\"slow_adj\":{"),
      "the slowest-row adjudication block must ride the driver line")
    assert(!line.contains("\n"), "must be ONE line")
    // 2000-char tail − ~85 chars for sbt's trailing "[success] Total
    // time ..." line − 35 slack (Bench.LineBudget). The 166-query
    // registry plus the r15-#3 adjudication block crossed the full-map
    // capacity line: the self-cap now sheds the FASTEST rows (declared
    // via queries_omitted; BENCH_DETAIL always carries all) so the
    // slowest rows' timings AND their adjudication columns stay on the
    // driver line — the judge-directed priority. Bound the shed so a
    // format regression (not mere growth) still fails here.
    assert(Bench.LineBudget == 1880)
    assert(line.length <= Bench.LineBudget,
      s"bench line worst-case ${line.length} chars exceeds ${Bench.LineBudget}")
    val omitted = "\"queries_omitted\":(\\d+)".r.findFirstMatchIn(line)
      .fold(0)(_.group(1).toInt)
    // registry GROWTH legitimately raises the shed roughly one-for-one
    // past the line's ~150-row worst-case capacity (every new query
    // adds ~11-14 worst-case chars to the full map); a FORMAT
    // regression (longer keys, wider numbers) raises it
    // disproportionately. So the bound is the OVERFLOW past capacity,
    // not a fraction of the registry — fractional bounds (/10 at r16,
    // /8 at r17) broke on growth alone every few added queries while
    // staying blind to a many-rows-wide regression at small registries
    // capacity dropped 150 → 149 at r18: the slow_adj rows carry a 6th
    // (self_bg) column, ~5 worst-case chars × AdjSlowest rows — a
    // deliberate format change, not drift
    assert(omitted <= math.max(0, names.length - 149),
      s"self-cap shed $omitted of ${names.length} rows — format regressed " +
        s"(worst-case capacity ~149 rows)")
  }

  test("self-cap at a simulated 200-query registry: slowest rows stay, line fits (r14 #5)") {
    // the shape two more rounds of growth produces: 200 queries, mixed
    // magnitudes, one failed row buried among the fast ones
    val names = (1 to 100).map(i => f"q$i%02d_simulated_query_name") ++
      (101 to 200).map(i => f"x$i%03d_simulated_query_name")
    val sims = names.zipWithIndex.map { case (n, i) =>
      n -> (if (i == 150) (-1.0, -1.0) else ((i % 37) * 3.3 + 0.1, 0.5))
    }
    val line = Bench.jsonLine(sims, "/root/testdata/sf0.1", None)
    assert(line.length <= Bench.LineBudget,
      s"self-capped line still ${line.length} chars at 200 queries")
    assert(line.contains("\"queries_omitted\":"), "the omission must be declared")
    assert(line.contains("\"detail\":\"BENCH_DETAIL.json\""))
    // the slowest rows survive on the line; the fastest are the omitted
    val slowest = sims.filter(_._2._1 >= 0).maxBy(_._2._1)._1.split("_")(0)
    assert(line.contains("\"" + slowest + "\":"),
      "the slowest query must keep its per-query entry")
    // a FAILED query stays visible however many healthy rows outrank it
    assert(line.contains(":-1"), "failed rows must never be omitted from the line")
    // totals cover ALL queries, not just the retained map
    val total = sims.map(_._2._1).filter(_ >= 0).sum
    assert(line.contains(s""""value":${Bench.fmt(total)}"""))
    // and a registry at today's size is untouched by the cap machinery
    val small = sims.take(100)
    assert(!Bench.jsonLine(small, "/root/testdata/sf0.1", None)
      .contains("queries_omitted"))
  }

  test("registry prefixes are unique so line keys stay short") {
    val names = SparkEntry.queries.keys.toSeq
    val keys = Bench.lineKeys(names)
    assert(keys.distinct.size == names.size)
    // every key collapsed to its prefix — a full-name fallback means two
    // queries share a number, which breaks round-over-round comparability
    assert(keys.forall(k => !k.contains("_")),
      s"prefix collision: ${keys.filter(_.contains("_")).mkString(",")}")
  }

  test("env_contended calibration separates the r12 canonical/contaminated runs") {
    // Threshold 0.375×cores = 12 on the 32-core box, pinned against the
    // r12 run pair (the instrument's calibration data): the canonical
    // run (load1 median 5.76, floor max 10.8) must flag NOTHING; the
    // contaminated 03:41 run (median 13.88, floors to 25.9) must flag.
    assert(Bench.floorThreshold(32) == 12.0)
    // canonical run, worst row: floor 10.8 under a quiet-run median
    assert(!Bench.envContended(32, runLoad1Median = 5.76, 10.8, 10.8))
    // contaminated run, typical row: floor above threshold
    assert(Bench.envContended(32, runLoad1Median = 13.88, 20.2, 13.4))
    // the r12 x48 shape: 737.9 s cold with a LOW own-bracket (4.8/3.6)
    // inside a contended run — the run-median leg must still flag it
    assert(Bench.envContended(32, runLoad1Median = 13.88, 4.8, 3.6))
    // high-AFTER alone is the query's own 32 threads, not contention
    assert(!Bench.envContended(32, runLoad1Median = 5.0, 1.2, 31.0))
    // failed load1 reads (-1) must not satisfy the floor leg
    assert(!Bench.envContended(32, runLoad1Median = 5.0, -1.0, 31.0))
  }

  test("busy-fraction gate separates self-load decay from external contention (r13)") {
    // The r13 sf3 self-load shape: high lagging load1 (back-to-back
    // 32-thread queries) but the box is INSTANTANEOUSLY idle between
    // queries — must NOT flag (the first sf3 pass marked 69/154 rows
    // this way on a box running nothing else)
    assert(!Bench.envContended(32, runLoad1Median = 11.6, 14.9, 21.0, busyBefore = 0.03))
    // genuinely contended: load high AND someone is consuming CPU now
    assert(Bench.envContended(32, runLoad1Median = 13.88, 20.2, 13.4, busyBefore = 0.8))
    // missing busy sample (-1) falls back to the load-only test — the
    // conservative over-marking direction, and the pre-r13 behavior
    assert(Bench.envContended(32, runLoad1Median = 13.88, 20.2, 13.4, busyBefore = -1.0))
    // an idle busy reading alone never flags a quiet run
    assert(!Bench.envContended(32, runLoad1Median = 5.0, 1.2, 1.4, busyBefore = 0.9) ==
      !Bench.envContended(32, runLoad1Median = 5.0, 1.2, 1.4))
    // busy high but load quiet: a short burst on an otherwise quiet box
    // is not sustained contention — the load leg still gates
    assert(!Bench.envContended(32, runLoad1Median = 5.0, 1.2, 1.4, busyBefore = 0.9))
  }

  test("during-query gate catches contention the gap samples are blind to (r14)") {
    assert(Bench.busyDuringThreshold == 0.15)
    // the r13 driver-artifact x118 shape: clean gap brackets (load1
    // decayed by sample time, busy_before idle) but a contender was
    // live DURING the timed window — busy_during alone must flag
    assert(Bench.envContended(32, runLoad1Median = 5.0, 1.2, 9.8,
      busyBefore = 0.02, busyDuring = 0.31))
    // idle-box rows: self-subtraction keeps the suite's own 32 threads
    // out of the numerator (calibrated ~0.00-0.02 on this box)
    assert(!Bench.envContended(32, runLoad1Median = 5.0, 1.2, 9.8,
      busyBefore = 0.02, busyDuring = 0.02))
    // missing during sample (-1) leaves the gap-pair verdict unchanged
    // in both directions
    assert(Bench.envContended(32, runLoad1Median = 13.88, 20.2, 13.4,
      busyBefore = 0.8, busyDuring = -1.0))
    assert(!Bench.envContended(32, runLoad1Median = 11.6, 14.9, 21.0,
      busyBefore = 0.03, busyDuring = -1.0))
  }

  test("slow_adj: adjudication columns for the slowest cold rows, shed last under the cap (r15 #3)") {
    val names = (1 to 200).map(i => f"x$i%03d_simulated_query_name")
    val sims = names.zipWithIndex.map { case (n, i) => n -> ((i % 37) * 3.3 + 0.1, 0.5) }
    val adj = names.map(_ -> (123L, 0L, 0L, 0.02, 0.4, 0.07)).toMap
    val line = Bench.jsonLine(sims, "/root/testdata/sf0.1", None, adj)
    assert(line.length <= Bench.LineBudget)
    // the block survives the 200-query self-cap (queries shed first)
    assert(line.contains("\"slow_adj\":{"), line.takeRight(200))
    assert(line.contains("queries_omitted"))
    // exactly the slowest rows carry columns, in [hw,ev,re,bd,iw,sb]
    // form (6th column = own-process background share, r17 #5)
    val slowest = sims.maxBy(_._2._1)._1.split("_")(0)
    assert(line.contains("\"" + slowest + "\":[123,0,0,0.02,0.4,0.07]"), line)
    assert(line.split("slow_adj")(1).takeWhile(_ != '}').count(_ == '[') ==
      Bench.AdjSlowest)
    // no adjudication map → byte-identical to the old format
    assert(!Bench.jsonLine(sims, "/root/testdata/sf0.1", None).contains("slow_adj"))
    // a missing busy sample prints -1, never NaN
    val line2 = Bench.jsonLine(Seq("q01_x" -> (5.0, 1.0)), "/sf", None,
      Map("q01_x" -> (7L, 0L, 0L, -1.0, -1.0, -1.0)))
    assert(line2.contains("\"q01\":[7,0,0,-1,-1,-1]"), line2)
  }

  test("line is valid JSON shape with the driver-contract fields") {
    val line = Bench.jsonLine(
      Seq("q01_top10_star_join" -> (0.26, 0.21), "x20_exact_dedup_groups" -> (-1.0, 0.2)),
      "/root/testdata/sf0.01", Some(Set("q01_top10_star_join", "x20_exact_dedup_groups")))
    assert(line.startsWith("""{"metric":"total","value":0.3,"unit":"sec","queries":{"""))
    // failed (-1) runs are excluded from totals but visible per-query
    assert(line.contains(""""x20":-1"""))
    assert(line.contains(""""total_warm":0.4"""))
    assert(line.contains(""""filter":"q01_top10_star_join,x20_exact_dedup_groups""""))
    assert(line.endsWith(""""sf":"/root/testdata/sf0.01"}"""))
  }
}
