package graft

import graft.io.Bucketing
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Pins the bucketed-layout contract (io.Bucketing): equally-bucketed
  * fact tables join AND aggregate with zero Exchange nodes — the plan
  * property that makes the one-time layout shuffle worth paying at
  * 100 TB. Runs with broadcast disabled so the assertion exercises the
  * co-located shuffle-join path the layout exists for (at real scale
  * neither fact side broadcasts). */
class BucketingSpec extends SparkSpec {

  test("equally-bucketed fact tables join and aggregate with zero exchanges") {
    Bucketing.writeBucketed(
      Tables.load(spark, sf0001, "orders").select("o_orderkey", "o_totalprice"),
      "b_orders", "o_orderkey", buckets = 8)
    Bucketing.writeBucketed(
      Tables.load(spark, sf0001, "lineitem").select("l_orderkey", "l_quantity"),
      "b_lineitem", "l_orderkey", buckets = 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.table(spark, "b_lineitem")
        .join(Bucketing.table(spark, "b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(sum("l_quantity").as("q"))
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed join+agg must plan no shuffle at all, got:\n${p.take(3000)}")

      // correctness: identical to the un-bucketed join
      val plain = Tables.load(spark, sf0001, "lineitem")
        .join(Tables.load(spark, sf0001, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(sum("l_quantity").as("q"))
      assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty,
        "bucketed layout must not change results")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("a mismatched bucket count re-shuffles only the mismatched side") {
    Bucketing.writeBucketed(
      Tables.load(spark, sf0001, "orders").select("o_orderkey", "o_totalprice"),
      "b_orders4", "o_orderkey", buckets = 4)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = Bucketing.table(spark, "b_lineitem")
        .join(Bucketing.table(spark, "b_orders4"),
          col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
      // exactly one exchange: the 4-bucket side re-partitions to 8; the
      // 8-bucket fact side must stay put (that's the sizing-rule cost)
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
        s"expected exactly one exchange for the mismatched side, got:\n${p.take(3000)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
