package graft

import graft.functions.Vectors
import org.apache.spark.sql.functions._

class VectorsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
    (2L, Seq(3.0f, 4.0f, 0.0f), Seq(3.0f, 4.0f, 0.0f)),
    (3L, Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f))
  ).toDF("id", "a", "b")
    .withColumn("ad", Vectors.toDouble(col("a")))
    .withColumn("bd", Vectors.toDouble(col("b")))

  test("dot, norm, cosine on known values") {
    val r = df.select(col("id"),
      Vectors.dot(col("ad"), col("bd")).as("dot"),
      Vectors.norm(col("ad")).as("na"),
      Vectors.cosine(col("ad"), col("bd")).as("cos"))
      .orderBy("id").collect()
    assert(r(0).getDouble(1) == 32.0)                    // 4+10+18
    assert(r(1).getDouble(2) == 5.0)                     // 3-4-5
    assert(math.abs(r(1).getDouble(3) - 1.0) < 1e-12)    // self-cosine
    assert(r(2).getDouble(3) == 0.0)                     // orthogonal
  }

  test("signKey: sign bits of leading dims") {
    val r = Seq((1L, Seq(0.5f, -0.25f, 0.0f, -1.0f)))
      .toDF("id", "v")
      .select(Vectors.signKey(col("v"), 4).as("k")).collect()
    assert(r(0).getString(0) == "1010") // 0.0 counts as non-negative
  }
}
