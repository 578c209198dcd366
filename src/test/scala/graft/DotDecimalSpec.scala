package graft

import graft.functions.Vectors
import org.apache.spark.sql.functions._

/** graft_dot_dec (plans/DotDecimal.scala) must equal the exploded
  * decimal-aggregate formulation it replaces in the embedding-audit
  * family — `sum(CAST(a AS DECIMAL(38,0)) * b)` over position-joined
  * elements — including past long range, where the kernel's exact
  * BigInteger fallback takes over. */
class DotDecimalSpec extends SparkSpec {

  private lazy val emb = graft.sources.Tables.load(spark, sf0001, "embeddings")

  /** The micro-unit long arrays x116 feeds the kernel. */
  private def vmArr = transform(col("embedding"),
    v => round(v.cast("double") * 1000000, 0).cast("long"))

  test("graft_dot_dec registers and computes an exact integer dot") {
    val r = spark.sql(
      "SELECT CAST(graft_dot_dec(array(2L, 3L), array(5L, 7L)) AS BIGINT) AS d")
      .collect()(0).getLong(0)
    assert(r == 31L)
  }

  test("equals the exploded decimal-aggregate over real micro-unit embeddings") {
    // the r10 x116 per-vector shape: posexplode + self-position sums
    val agg = emb.select(col("vec_id"), posexplode(vmArr).as(Seq("dim", "vm")))
      .groupBy("vec_id")
      .agg(expr("sum(CAST(vm AS DECIMAL(38,0)) * vm)").as("nv_agg"))
    val kern = emb.select(col("vec_id"),
      Vectors.dotDec(vmArr, vmArr).as("nv_kern"))
    assert(agg.join(kern, "vec_id")
      .filter(col("nv_agg") =!= col("nv_kern")).isEmpty)
  }

  test("long-overflow rows fall back to exact BigInteger accumulation") {
    // products and sums chosen to overflow a long mid-accumulation;
    // the expected value is plain BigInt math
    val a = Seq(Long.MaxValue / 2, Long.MaxValue / 2, -(Long.MaxValue / 3), 1234567891011L)
    val b = Seq(7L, 9L, 11L, -4L)
    val expect = a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
    val r = spark.sql(
      s"SELECT graft_dot_dec(array(${a.map(_ + "L").mkString(",")}), " +
        s"array(${b.map(_ + "L").mkString(",")})) AS d")
      .collect()(0).getDecimal(0)
    assert(BigInt(r.toBigInteger) == expect)
  }

  test("a true value past DECIMAL(38,0) is null, not a wrapped number") {
    // 64 max-magnitude products ≈ 5.4e39 > 1e38: the decimal-agg
    // formulation nulls on precision overflow; the kernel must too
    val xs = Seq.fill(64)(s"${Long.MaxValue}L").mkString(",")
    val r = spark.sql(
      s"SELECT graft_dot_dec(array($xs), array($xs)) AS d").collect()(0)
    assert(r.isNullAt(0))
  }

  test("null array, null element, and length mismatch are null") {
    val rows = spark.sql(
      """SELECT
        |  graft_dot_dec(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS a,
        |  graft_dot_dec(array(1L, CAST(NULL AS BIGINT)), array(1L, 2L)) AS b,
        |  graft_dot_dec(array(1L, 2L, 3L), array(1L)) AS c,
        |  graft_dot_dec(array(CAST(NULL AS BIGINT), 1L),
        |    array(${Long.MaxValue}L, ${Long.MaxValue}L)) AS d
        |""".stripMargin.replace("${Long.MaxValue}", Long.MaxValue.toString))
      .collect()(0)
    (0 to 3).foreach(i => assert(rows.isNullAt(i),
      s"slot $i must be null (null/mismatch contract); null wins over overflow"))
  }

  test("empty arrays dot to zero") {
    // bare array() is array<void> — cast the inputs explicitly
    val r = spark.sql(
      "SELECT CAST(graft_dot_dec(CAST(array() AS ARRAY<BIGINT>), " +
        "CAST(array() AS ARRAY<BIGINT>)) AS BIGINT) AS d").collect()(0)
    assert(!r.isNullAt(0) && r.getLong(0) == 0L)
  }
}
