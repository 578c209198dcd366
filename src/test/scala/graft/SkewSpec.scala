package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90%-hot-key skew: the shape that drowns a single reducer
  private lazy val skewedFact = (1 to 20000).map { i =>
    val key = if (i % 10 != 0) "hot" else s"k${i % 7}"
    (key, i.toLong)
  }.toDF("key", "v").repartition(4)

  private lazy val dim =
    (Seq("hot") ++ (0 until 7).map(i => s"k$i")).map(k => (k, s"label_$k"))
      .toDF("key", "label")

  test("saltedJoin: row-identical to the plain join under 90% skew") {
    val plain = skewedFact.join(dim, Seq("key"))
      .groupBy("key", "label").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val salted = Skew.saltedJoin(skewedFact, dim, "key", salts = 8)
      .groupBy("key", "label").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(salted == plain)
  }

  test("saltedJoin: shuffle key includes the salt (hot key spreads)") {
    val p = Skew.saltedJoin(skewedFact, dim, "key", salts = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("__salt"), "salt must be part of the join key")
  }

  test("saltedSumCount: equals direct aggregation") {
    val direct = skewedFact.groupBy("key")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(skewedFact, "key", "v", salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }
}
