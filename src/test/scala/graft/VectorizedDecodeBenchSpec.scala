package graft

import graft.sources.PageSource
import org.apache.spark.sql.functions._

/** The adoption measurement for the columnar byte-level decode
  * (sources/VectorizedFrame.scala) — the BpeChainShareSpec pattern:
  * the printed split is the artifact (quoted in BASELINE.md r14), the
  * assertion is just the loose tripwire that keeps the adoption
  * honest if a refactor ever regresses the byte path below the row
  * path it replaced.
  *
  * Shape: the q50 full-corpus decode (every frame field referenced,
  * aggregation cheap enough that the scan dominates) over the staged
  * page layout at the largest locally available SF, A/B'd via the
  * connector's `vectorize` option — same layout, same plan shape,
  * only the scan bottom differs. Medians of repeated warm runs; the
  * staging write is shared and paid before either side is timed. */
class VectorizedDecodeBenchSpec extends SparkSpec {

  test("columnar vs row decode, full-field scan: measured split, columnar must not lose") {
    val sfDir = if (sf01Exists) sf01 else sf0001
    val staged = PageSource.stageDocuments(spark, sfDir)
    def read(vectorize: Boolean) =
      spark.read.format("graft-pages")
        .option("path", staged)
        .option("schema", PageSource.DDL)
        .option("vectorize", vectorize.toString)
        .load()
    def run(vectorize: Boolean): Double = {
      val t0 = System.nanoTime()
      read(vectorize).agg(
        sum("doc_id"), sum(length(col("text")).cast("long")),
        count("lang"), count("source"), sum("n_chars"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    // values identical on both paths before any timing claim
    assert(read(true).orderBy("doc_id").collect()
      .sameElements(read(false).orderBy("doc_id").collect()))
    run(true); run(false) // warm the page cache and JIT both paths
    val interleaved = (1 to 3).map(_ => (run(true), run(false)))
    val colMed = median(interleaved.map(_._1))
    val rowMed = median(interleaved.map(_._2))
    info(f"full-field decode at $sfDir: columnar $colMed%.3f s median, " +
      f"row $rowMed%.3f s median (x${rowMed / colMed}%.2f) over 3 interleaved reps")
    // tripwire, not the claim: the measured BASELINE.md split is the
    // claim; this bound only trips if the byte path regresses to
    // clearly WORSE than the row path it replaced (noise headroom 25%)
    assert(colMed <= rowMed * 1.25,
      f"columnar decode regressed below the row path: $colMed%.3f vs $rowMed%.3f")
  }

  test("sf1 split: the decode-bound reading (scale probe, gated like BpeChainShareSpec)") {
    // MEASURED VERDICT (BASELINE.md r14): at every locally available
    // shape the page scan is task-launch- and checksum-I/O-bound, so
    // end-to-end reads FLAT (sf0.1 x1.06, sf1 x1.01) — the decode
    // advantage only shows at the reader level (the third test,
    // x1.20 per-record) and structurally (codegen-consumable batches,
    // no UTF-16 round trip). Recorded honestly; the adoption claim is
    // "never slower locally, decode-bound wins at GET-body scale",
    // not a local wall-time win.
    val sf1 = "/tmp/graft-sf1"
    assume(new java.io.File(sf1).exists(), "sf1 corpus not generated")
    val staged = PageSource.stageDocuments(spark, sf1)
    def run(vectorize: Boolean): Double = {
      val t0 = System.nanoTime()
      spark.read.format("graft-pages")
        .option("path", staged).option("schema", PageSource.DDL)
        .option("vectorize", vectorize.toString).load()
        .agg(sum("doc_id"), sum(length(col("text")).cast("long")),
          count("lang"), count("source"), sum("n_chars"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    run(true); run(false)
    val reps = (1 to 3).map(_ => (run(true), run(false)))
    val colMed = median(reps.map(_._1))
    val rowMed = median(reps.map(_._2))
    info(f"full-field decode at sf1: columnar $colMed%.3f s median, " +
      f"row $rowMed%.3f s median (x${rowMed / colMed}%.2f) over 3 interleaved reps")
    assert(colMed <= rowMed * 1.25)
  }

  test("per-record decode cost, reader-level: the number the 100 TB claim rests on") {
    // End-to-end at the local corpus shapes is TASK-LAUNCH-bound (500
    // hundred-row pages; both paths read identical wall time) — the
    // decode itself only becomes the bound when a page carries real
    // payload, which is exactly the 100 TB shape (MB-scale GET bodies).
    // So measure the decode where it lives: both readers driven
    // directly, single thread, over ONE page holding the whole corpus.
    val sf1 = "/tmp/graft-sf1"
    assume(new java.io.File(sf1).exists(), "sf1 corpus not generated")
    val staged = PageSource.stageDocuments(spark, sf1, pageSize = 10000000L)
    val pageDir = new java.io.File(staged).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("page=")).head.toString
    val full = org.apache.spark.sql.types.StructType.fromDDL(PageSource.DDL)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val part = graft.sources.PagePartition(pageDir)
    def rowPass(): (Long, Double) = {
      val t0 = System.nanoTime()
      val r = new graft.sources.PageReaderFactory(full, full, conf).createReader(part)
      var n = 0L
      var sink = 0L // consume every field like a real scan would
      while (r.next()) {
        val row = r.get(); n += 1
        sink += row.getLong(0) + row.getUTF8String(1).numBytes() +
          row.getUTF8String(2).numBytes() + row.getUTF8String(3).numBytes() + row.getLong(4)
      }
      r.close(); assert(sink != 42)
      (n, (System.nanoTime() - t0) / 1e9)
    }
    def colPass(): (Long, Double) = {
      val t0 = System.nanoTime()
      val r = new graft.sources.PageReaderFactory(full, full, conf).createColumnarReader(part)
      var n = 0L
      var sink = 0L
      while (r.next()) {
        val b = r.get()
        val rows = b.rowIterator()
        while (rows.hasNext) {
          val row = rows.next(); n += 1
          sink += row.getLong(0) + row.getUTF8String(1).numBytes() +
            row.getUTF8String(2).numBytes() + row.getUTF8String(3).numBytes() + row.getLong(4)
        }
      }
      r.close(); assert(sink != 42)
      (n, (System.nanoTime() - t0) / 1e9)
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    rowPass(); colPass() // JIT + page cache
    val reps = (1 to 5).map(_ => (colPass(), rowPass()))
    val n = reps.head._1._1
    val colMed = median(reps.map(_._1._2))
    val rowMed = median(reps.map(_._2._2))
    info(f"reader-level full decode of $n rows: columnar $colMed%.3f s " +
      f"(${n / colMed / 1e6}%.2f M rows/s), row $rowMed%.3f s " +
      f"(${n / rowMed / 1e6}%.2f M rows/s) — x${rowMed / colMed}%.2f per-record")
    assert(n > 0 && colMed <= rowMed * 1.25)
  }
}
