package graft

import graft.etl.Normalize
import graft.functions.Text
import org.apache.spark.sql.functions.{col, lit}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.2) over generated frames:
  * the algebraic laws that must hold for ANY input, not just the
  * fixtures — dedup idempotence and PK uniqueness, incremental
  * anti-join disjointness and completeness. Generators are sampled at
  * fixed seeds (no scalatest-scalacheck bridge in the offline cache;
  * fixed seeds also keep failures reproducible). */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rowGen = for {
    pk <- Gen.choose(0, 8)
    ts <- Gen.choose(0L, 4L)
    payload <- Gen.choose(0, 100)
  } yield (s"k$pk", new java.sql.Timestamp(ts * 86400000L), payload)

  private val tableGen = Gen.listOfN(40, rowGen)

  private def samples(n: Int): Seq[List[(String, java.sql.Timestamp, Int)]] =
    (1 to n).map(i => tableGen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("dedupLatest: idempotent, unique PKs, survivor is max-(ts,tie) per key") {
    for (rows <- samples(8)) {
      val df = rows.toDF("pk", "extracted_at", "payload")
      val once = Normalize.dedupLatest(df, "pk", tieBreak = Seq("payload"))
      val twice = Normalize.dedupLatest(once, "pk", tieBreak = Seq("payload"))
      val onceRows = once.collect().toSet
      assert(once.count() == once.select("pk").distinct().count())
      assert(twice.collect().toSet == onceRows)          // idempotent
      assert(onceRows.subsetOf(df.collect().toSet))      // no invented rows
      val expected = rows.groupBy(_._1).view
        .mapValues(_.maxBy(r => (r._2.getTime, r._3))).values.toSet
      assert(onceRows.map(r => (r.getString(0), r.getTimestamp(1), r.getInt(2))) == expected)
    }
  }

  test("pairMergeCount: Spark fold equals the sequential reference on any stream") {
    // the x61 BPE-apply kernel's one subtle rule is NON-OVERLAP: after a
    // merge at (i, i+1), position i+1 cannot open the next match. A
    // 2-symbol alphabet forces long same-symbol runs ("x x x x"), the
    // exact case where an off-by-one doubles the count.
    def ref(toks: List[String], a: String, b: String): Long = {
      var i = 0; var c = 0L
      while (i < toks.length - 1) {
        if (toks(i) == a && toks(i + 1) == b) { c += 1; i += 2 } else i += 1
      }
      c
    }
    val tokGen = Gen.listOfN(12, Gen.oneOf("x", "y"))
    val cases = (1 to 40).map(i =>
      tokGen.pureApply(Gen.Parameters.default, Seed(100L + i))) ++
      Seq(List("x", "x", "x"), List("x", "x", "x", "x"), List("x"), Nil)
    val df = cases.zipWithIndex.map { case (tk, i) => (i, tk) }.toDF("id", "tk")
    for (a <- Seq("x", "y"); b <- Seq("x", "y")) {
      val got = df.select(col("id"),
          Text.pairMergeCount(col("tk"), lit(a), lit(b)).as("m"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      cases.zipWithIndex.foreach { case (tk, i) =>
        assert(got(i) == ref(tk, a, b),
          s"tokens=$tk pair=($a,$b): spark=${got(i)} ref=${ref(tk, a, b)}")
      }
    }
  }

  test("x78 vt split-division identity: (q·S + r·S div w) == floor(rn·S/w) for any rank/weight") {
    // the overflow-safe virtual-time form x78 registers on BOTH
    // engines rests on one algebraic identity; pin it over the full
    // Long-safe domain, including ranks far past the ~9M/lang point
    // where the naive rn·S numerator wraps (BigInt is the referee)
    val S = BigInt(1000000000000L)
    val caseGen = for {
      rn <- Gen.oneOf(Gen.choose(1L, 1000L), Gen.choose(1L, Long.MaxValue / 2))
      w <- Gen.choose(1L, 1000000L)
    } yield (rn, w)
    val cases = Gen.listOfN(2000, caseGen)
      .pureApply(Gen.Parameters.default, Seed(78L))
    for ((rn, w) <- cases) {
      val split = BigInt(rn / w) * S + BigInt(((rn % w) * 1000000000000L) / w)
      val reference = BigInt(rn) * S / BigInt(w) // floor: both operands positive
      assert(split == reference, s"identity broke at rn=$rn w=$w")
      // the split form's intermediates stay inside Long for any rn —
      // the residual numerator bound the x78 comment claims
      assert((rn % w) <= 1000000L && (rn % w) * 1000000000000L >= 0)
    }
  }

  test("incremental: delta and existing are disjoint and cover incoming") {
    for (Seq(newRows, oldRows) <- samples(8).grouped(2).toSeq if true) {
      val incoming = newRows.toDF("pk", "extracted_at", "payload")
      val existing = oldRows.toDF("pk", "extracted_at", "payload")
      val delta = Normalize.incremental(incoming, existing, "pk")
      val deltaKeys = delta.select("pk").collect().map(_.getString(0)).toSet
      val oldKeys = oldRows.map(_._1).toSet
      val newKeys = newRows.map(_._1).toSet
      assert(deltaKeys.intersect(oldKeys).isEmpty)     // nothing re-processed
      assert(deltaKeys == newKeys.diff(oldKeys))       // nothing missed
    }
  }
}
