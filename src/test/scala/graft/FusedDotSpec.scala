package graft

import graft.functions.Vectors
import org.apache.spark.sql.functions._

/** The native fused dot product (graft.plans.FusedDotProduct) must be
  * bit-equal to the HOF formulation — same sequential accumulation —
  * while skipping the per-row intermediate products array. */
class FusedDotSpec extends SparkSpec {

  private lazy val emb = graft.sources.Tables.load(spark, sf0001, "embeddings")

  test("graft_dot registers via SparkSessionExtensions and resolves") {
    val r = spark.sql("SELECT graft_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d")
      .collect()(0).getDouble(0)
    assert(r == 11.0)
  }

  test("bit-equal to the HOF dot over real embeddings") {
    val both = emb.select(
      call_function("graft_dot", col("embedding"), col("embedding")).as("fused"),
      Vectors.dot(Vectors.toDouble(col("embedding")), Vectors.toDouble(col("embedding"))).as("hof"))
    assert(both.filter(col("fused") =!= col("hof")).isEmpty)
  }

  test("null array propagates null; interpreted eval matches codegen") {
    val r = spark.sql(
      "SELECT graft_dot(CAST(NULL AS ARRAY<FLOAT>), array(1.0f)) AS d").collect()(0)
    assert(r.isNullAt(0))
  }

  test("dimension mismatch yields null, matching the HOF null contract") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0f, 2.0f, 3.0f), array(1.0f)) AS d").collect()(0)
    assert(r.isNullAt(0),
      "truncating to the shorter vector would fake a plausible similarity")
  }

  test("throughput: fused path is not slower than the HOF path") {
    // 200k-row working set (explode the 500 embeddings x 400): time a
    // full aggregation through each expression. One-time codegen noise
    // dominates small gaps, so only assert a generous bound.
    val big = emb.select(explode(sequence(lit(1), lit(400))).as("rep"), col("embedding"))
      .select(col("embedding")).cache()
    big.count()
    def time(f: => Unit): Double = { val t = System.nanoTime; f; (System.nanoTime - t) / 1e9 }
    val tHof = time {
      big.select(sum(Vectors.dot(Vectors.toDouble(col("embedding")),
        Vectors.toDouble(col("embedding")))).as("s")).collect()
    }
    val tFused = time {
      big.select(sum(call_function("graft_dot", col("embedding"), col("embedding"))).as("s")).collect()
    }
    info(f"hof=$tHof%.3fs fused=$tFused%.3fs")
    assert(tFused <= tHof * 3.0, "fused path should never be drastically slower")
    big.unpersist()
  }
}
