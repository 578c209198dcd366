package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Bucketing = the co-located-join discipline for fact-fact joins at
  * scale: both sides written bucketed (and sorted) on the join key
  * join WITHOUT a shuffle exchange — at 100 TB that shuffle IS the
  * bottleneck, and broadcast is off the table when neither side is a
  * dim. Broadcast is disabled here to force the strategy decision the
  * big cluster would face. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans with no shuffle exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.load(spark, sf0001, "lineitem")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_bucketed")
      Tables.load(spark, sf0001, "orders")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")

      val joined = spark.table("lineitem_bucketed")
        .join(spark.table("orders_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), "forced non-broadcast join")
      assert(plan.contains("Bucketed: true"), "scans must use the bucket layout")
      // no shuffle on the JOIN keys (the final groupBy exchange on
      // o_orderpriority is a different key and is expected)
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed sides must join without a shuffle, got:\n${plan.take(3000)}")

      // co-located result == shuffled result
      val expected = Tables.load(spark, sf0001, "lineitem")
        .join(Tables.load(spark, sf0001, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    }
  }

  test("date-partitioned layout prunes directories at the scan") {
    // the OTHER half of the layout story: bucketing co-locates joins,
    // partitionBy(date) makes time predicates skip whole directories —
    // at 100 TB a day-scoped query must read one partition, not filter
    // the full table post-scan
    val tmp = java.nio.file.Files.createTempDirectory("graft-part").toString
    try {
      Tables.load(spark, sf0001, "orders")
        .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
        .write.mode("overwrite").partitionBy("order_month")
        .parquet(s"$tmp/orders_bymonth")
      val pruned = spark.read.parquet(s"$tmp/orders_bymonth")
        .filter(col("order_month") === "1995-03")
      val plan = pruned.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*order_month".r.findFirstIn(plan).isDefined,
        s"month predicate must land in PartitionFilters, got:\n${plan.take(2000)}")
      val expected = Tables.load(spark, sf0001, "orders")
        .filter(date_format(col("o_orderdate"), "yyyy-MM") === "1995-03").count()
      assert(expected > 0 && pruned.count() == expected,
        "pruned read must return exactly the partition's rows")
    } finally {
      val p = new org.apache.hadoop.fs.Path(tmp)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
  }
}
