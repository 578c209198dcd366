package graft.operators

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

/** Pins the x110 bigram-count overflow fence (r19 verdict #9): the
  * BIGINT micro-likelihood (cb+1)·10^6 wraps silently past
  * cb ≈ 9.2·10^12, so [[Shaping.fencedCb]] must THROW on an over-bound
  * count instead of letting a wrong-but-plausible score through, and
  * must pass every in-bound count through bit-unchanged (the oracle
  * hash-parity depends on the pass-through being exact). */
class LmOverflowFenceSpec extends graft.SparkSpec {

  test("fencedCb passes in-bound counts through unchanged") {
    import spark.implicits._
    val in = Seq(0L, 1L, 123456789L, Shaping.LmCbOverflowBound).toDF("cb")
    val out = in.select(Shaping.fencedCb(col("cb")).as("cb"))
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(0L, 1L, 123456789L, Shaping.LmCbOverflowBound))
  }

  test("fencedCb throws loudly on a synthetic over-bound count") {
    import spark.implicits._
    val in = Seq(Shaping.LmCbOverflowBound + 1L).toDF("cb")
    val e = intercept[Exception] {
      in.select(Shaping.fencedCb(col("cb")).as("cb")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("BIGINT smoothing bound")),
      s"expected the fence's message, got: $e")
    assert(e.isInstanceOf[SparkException] ||
      messages(e).exists(_.contains("BIGINT smoothing bound")))
  }
}
