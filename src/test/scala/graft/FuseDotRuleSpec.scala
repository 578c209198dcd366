package graft

import graft.functions.Vectors
import org.apache.spark.sql.functions._

/** FuseDotProductRule: the declarative HOF dot-product pattern must
  * fuse to the native kernel on this session, produce bit-identical
  * values, and NEVER fire on lookalike folds or nullable-element
  * arrays. */
class FuseDotRuleSpec extends SparkSpec {

  private def emb = sources.Tables.load(spark, sf0001, "embeddings")

  test("declarative dot over the embeddings table fuses to graft_dot") {
    val d = emb.select(Vectors.dotDecl(col("embedding"), col("embedding")).as("d"))
    val p = d.queryExecution.executedPlan.toString
    assert(p.contains("graft_dot"), s"rule did not fire:\n${p.take(1200)}")
    assert(!p.contains("aggregate("), "the HOF fold must be gone after fusion")
  }

  test("fused and declarative paths agree bit-for-bit on real vectors") {
    val rows = emb.select(
        Vectors.dotFused(col("embedding"), col("embedding")).as("fused"),
        Vectors.dotDecl(col("embedding"), col("embedding")).as("decl"))
      .collect()
    assert(rows.length > 0)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("cosine6-shaped expression fuses all three dots") {
    val d = emb.select(Vectors.cosineDecl(col("embedding"), col("embedding")).as("c"))
    val p = d.queryExecution.executedPlan.toString
    assert("graft_dot".r.findAllIn(p).size >= 3)
  }

  test("squared-difference fold (PQ distance shape) is NOT rewritten") {
    val sub = slice(Vectors.toDouble(col("embedding")), 1, 16)
    val lit16 = typedlit(IndexedSeq.fill(16)(0.5))
    val d2 = aggregate(zip_with(sub, lit16, (x, y) => (x - y) * (x - y)),
      lit(0.0), _ + _)
    val p = emb.select(d2.as("d2")).queryExecution.executedPlan.toString
    assert(!p.contains("graft_dot"), "only the product fold may fuse")
  }

  test("null elements still yield NULL through the fused kernel") {
    // file scans force containsNull=true, so the rule fires on nullable
    // arrays — soundly, because the kernel poisons a null element to a
    // NULL result exactly like zip_with's null product poisons the fold
    val nullable = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS v")
    val d = nullable.select(Vectors.dotDecl(col("v"), col("v")).as("d"))
    assert(d.collect()(0).isNullAt(0), "null element must yield NULL")
    // and the direct kernel call agrees
    val direct = nullable.select(Vectors.dotFused(col("v"), col("v")).as("d"))
    assert(direct.collect()(0).isNullAt(0))
  }

  test("non-zero fold seed is NOT rewritten") {
    val a = Vectors.toDouble(col("embedding"))
    val seeded = aggregate(zip_with(a, a, _ * _), lit(1.0), _ + _)
    val p = emb.select(seeded.as("s")).queryExecution.executedPlan.toString
    assert(!p.contains("graft_dot"))
  }

  test("negative-zero fold seed is NOT rewritten (raw-bits guard)") {
    // Scala's -0.0 == 0.0 would let a naive guard rewrite this fold,
    // but the kernel seeds +0.0: on an EMPTY array the fold returns its
    // seed, so Literal(-0.0) must keep the HOF form to preserve the
    // -0.0 result bit. The guard compares doubleToRawLongBits — pin the
    // direction it changed.
    val a = Vectors.toDouble(col("embedding"))
    val seeded = aggregate(zip_with(a, a, _ * _), lit(-0.0), _ + _)
    val p = emb.select(seeded.as("s")).queryExecution.executedPlan.toString
    assert(!p.contains("graft_dot"),
      "a -0.0-seeded fold is not bit-equal to the +0.0 kernel seed")
  }
}
