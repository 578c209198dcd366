package graft

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** graft_intradup_starts (plans.IntraDupStarts): the array-local twin
  * of x115's former positionalGrams + (doc_id, g) first-occurrence
  * window. Pins bit-parity between the kernel and the declarative
  * window formulation — the same HOF-vs-kernel equivalence contract
  * NativeKernelSpec pins for minhash/simhash — so the registered
  * query's rewrite is proven, not assumed. */
class ScrubKernelSpec extends SparkSpec {

  /** The r10 declarative formulation, verbatim: one row per gram
    * position, first-occurrence window per (doc_id, g), offsets past
    * the first kept. */
  private def windowedDupStarts(docs: DataFrame, w: Int): DataFrame = {
    val grams = docs.select(col("doc_id"),
      posexplode(transform(sequence(lit(1), size(col("tk")) - (w - 1)),
        i => concat_ws(" ", (0 until w).map(d =>
          element_at(col("tk"), i + d)): _*)))
        .as(Seq("off", "g")))
    val wf = Window.partitionBy("doc_id", "g")
    grams.withColumn("fo", min("off").over(wf))
      .filter(col("off") > col("fo"))
      .select("doc_id", "off")
  }

  private def kernelDupStarts(docs: DataFrame, w: Int): DataFrame =
    docs.select(col("doc_id"),
      explode(Text.intraDupStartsNative(col("tk"), w)).as("off"))

  private def toks(dir: String): DataFrame =
    sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), "\\s+").as("tk"))
      .filter(size(col("tk")) >= 3)

  test("kernel == window formulation on the corpus (w=3 and w=5)") {
    val docs = toks(sf0001)
    for (w <- Seq(3, 5)) {
      val a = kernelDupStarts(docs, w).orderBy("doc_id", "off").collect()
      val b = windowedDupStarts(docs, w).orderBy("doc_id", "off").collect()
      assert(a.length == b.length, s"w=$w row counts differ")
      assert(a.sameElements(b), s"w=$w offsets differ")
      // w=5 legitimately finds nothing at this SF (both sides agree on
      // empty); only the w=3 case must be non-vacuous
      if (w == 3)
        assert(a.nonEmpty, s"w=$w fixture has no repeats — parity test is vacuous")
    }
  }

  test("edge cases: short docs, all-same tokens, adjacent and overlapping repeats") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq("a", "b")),                               // shorter than w
      (2L, Seq("a", "a", "a", "a", "a")),                // every gram identical
      (3L, Seq("a", "b", "c", "a", "b", "c")),           // clean repeat
      (4L, Seq("x", "y", "x", "y", "x", "y", "x")),      // overlapping period-2
      (5L, Seq("p", "q", "r"))                           // exactly w, no repeat
    ).toDF("doc_id", "tk")
    val got = kernelDupStarts(docs, 3).orderBy("doc_id", "off")
      .as[(Long, Int)].collect().toSeq
    // doc 2: grams at 0,1,2 all "a a a" -> dups 1,2
    // doc 3: gram(3) "a b c" repeats gram(0) -> dup 3
    // doc 4: grams "x y x"(0,2,4) "y x y"(1,3) -> dups 2,3,4
    assert(got == Seq((2L, 1), (2L, 2), (3L, 3), (4L, 2), (4L, 3), (4L, 4)))
    // and the window formulation agrees on the same frame
    val win = windowedDupStarts(docs.filter(size(col("tk")) >= 3), 3)
      .orderBy("doc_id", "off").as[(Long, Int)].collect().toSeq
    assert(win == got)
  }

  test("graft_grams == the positional transform/sequence HOF (w=2, 3, 10)") {
    // the r20 gram kernel behind bigramCounts (w=2) and
    // positionalGrams (x91 w=10, x92/x95 w=3): posexplode over the
    // kernel's array must yield byte-identical (off, gram) rows to the
    // HOF chain it replaced
    val docs = toks(sf0001)
    for (w <- Seq(2, 3, 10)) {
      val filtered = docs.filter(size(col("tk")) >= w)
      val hof = filtered.select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("tk")) - (w - 1)),
          i => concat_ws(" ", (0 until w).map(d =>
            element_at(col("tk"), i + d)): _*)))
          .as(Seq("off", "g")))
      val native = filtered.select(col("doc_id"),
        posexplode(Text.gramsNative(col("tk"), w)).as(Seq("off", "g")))
      val a = native.orderBy("doc_id", "off").collect()
      val b = hof.orderBy("doc_id", "off").collect()
      assert(a.length == b.length && a.nonEmpty, s"w=$w row counts differ or vacuous")
      assert(a.sameElements(b), s"w=$w gram rows differ")
    }
    // short input: fewer than w tokens yields an empty array, not a
    // descending-sequence artifact
    import spark.implicits._
    val short = Seq((1L, Seq("a"))).toDF("doc_id", "tk")
    assert(short.select(explode(Text.gramsNative(col("tk"), 2))).count() == 0)
  }

  test("whole-stage codegen carries the kernel (no fallback in the hot path)") {
    val plan = kernelDupStarts(toks(sf0001), 3)
      .queryExecution.executedPlan.toString
    // the executed plan prints codegen stages as "*(<id>)" prefixes;
    // the Generate carrying the kernel must sit inside one
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_intradup_starts") && l.trim.startsWith("*(")),
      s"kernel projection fell out of codegen:\n$plan")
  }
}
