package graft

import graft.io.Bucketing
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Pins the physical-layout contracts (io.Bucketing + partitionBy):
  * equally-bucketed fact tables join AND aggregate with zero Exchange
  * nodes — the plan property that makes the one-time layout shuffle
  * worth paying at 100 TB — and date-partitioned layouts prune
  * directories at the scan. Broadcast is disabled around the join
  * audits to force the strategy decision the big cluster would face
  * (at real scale neither fact side broadcasts). Each test writes its
  * own tables and drops them: the session catalog is shared JVM-wide
  * across suites. */
class BucketingSpec extends SparkSpec {

  private def withoutBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("equally-bucketed fact tables join and aggregate with zero exchanges") {
    try withoutBroadcast {
      Bucketing.writeBucketed(
        Tables.load(spark, sf0001, "orders").select("o_orderkey", "o_totalprice"),
        "b_orders", "o_orderkey", buckets = 8)
      Bucketing.writeBucketed(
        Tables.load(spark, sf0001, "lineitem").select("l_orderkey", "l_quantity"),
        "b_lineitem", "l_orderkey", buckets = 8)

      val joined = Bucketing.table(spark, "b_lineitem")
        .join(Bucketing.table(spark, "b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(sum("l_quantity").as("q"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("Bucketed: true"), "scans must use the bucket layout")
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
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("a mismatched bucket count re-shuffles only the mismatched side") {
    try withoutBroadcast {
      Bucketing.writeBucketed(
        Tables.load(spark, sf0001, "lineitem").select("l_orderkey", "l_quantity"),
        "b_lineitem8", "l_orderkey", buckets = 8)
      Bucketing.writeBucketed(
        Tables.load(spark, sf0001, "orders").select("o_orderkey", "o_totalprice"),
        "b_orders4", "o_orderkey", buckets = 4)

      val p = Bucketing.table(spark, "b_lineitem8")
        .join(Bucketing.table(spark, "b_orders4"),
          col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
      // exactly one exchange: the 4-bucket side re-partitions to 8; the
      // 8-bucket fact side must stay put (that's the sizing-rule cost)
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
        s"expected exactly one exchange for the mismatched side, got:\n${p.take(3000)}")
      assert(!p.contains("Exchange hashpartitioning(l_orderkey"),
        "the larger 8-bucket side must never re-shuffle")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_lineitem8")
      spark.sql("DROP TABLE IF EXISTS b_orders4")
    }
  }

  test("compact bounds per-bucket files after appends; results and zero-Exchange survive") {
    // the third lifecycle op (write once / append daily / compact
    // periodically): x74/x75's append regime adds one file per bucket
    // per batch, so file counts grow without bound until compaction
    // rewrites one-file-per-bucket and swaps through the catalog
    try withoutBroadcast {
      val src = Tables.load(spark, sf0001, "lineitem")
        .select("l_orderkey", "l_quantity")
      Bucketing.writeBucketed(src.filter(col("l_orderkey") % 3 === 0),
        "b_comp", "l_orderkey", buckets = 8, sorted = false)
      Bucketing.appendBucketed(src.filter(col("l_orderkey") % 3 === 1),
        "b_comp", "l_orderkey", 8, sorted = false)
      Bucketing.appendBucketed(src.filter(col("l_orderkey") % 3 === 2),
        "b_comp", "l_orderkey", 8, sorted = false)
      val before = spark.table("b_comp").inputFiles.length
      assert(before > 8, s"three batches should proliferate files (got $before)")
      val expectRows = src.count()
      val expectSum = src.agg(sum(col("l_quantity").cast("long"))).collect()(0).getLong(0)

      Bucketing.compact(spark, "b_comp", "l_orderkey", 8, sorted = false)

      assert(spark.table("b_comp").inputFiles.length == 8,
        "compaction must leave exactly one file per bucket")
      val after = spark.table("b_comp")
      assert(after.count() == expectRows, "compaction must not drop or duplicate rows")
      assert(after.agg(sum(col("l_quantity").cast("long"))).collect()(0).getLong(0)
        == expectSum, "compaction must preserve values")
      // the whole point of keeping the spec through the swap: key-
      // grouped consumers still plan no shuffle over the compacted scan
      val agg = after.groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      val p = agg.queryExecution.executedPlan.toString
      assert(p.contains("Bucketed: true") && !p.contains("Exchange"),
        s"compacted table must keep the zero-Exchange layout, got:\n${p.take(2000)}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_comp")
      spark.sql("DROP TABLE IF EXISTS b_comp__compacting")
    }
  }

  test("table() heals a compact() that crashed between DROP and RENAME") {
    // simulate the crash window: the compacted copy exists only under
    // __compacting and the live name is gone — a reader via
    // Bucketing.table must finish the swap, not fail on a missing table
    try {
      val src = Tables.load(spark, sf0001, "region").select("r_regionkey", "r_name")
      Bucketing.writeBucketed(src, "b_heal", "r_regionkey", buckets = 2, sorted = false)
      val expect = spark.table("b_heal").count()
      spark.sql("ALTER TABLE b_heal RENAME TO b_heal__compacting")
      assert(!spark.catalog.tableExists("b_heal"))
      val healed = Bucketing.table(spark, "b_heal")
      assert(healed.count() == expect, "recovered table must carry the compacted rows")
      assert(spark.catalog.tableExists("b_heal") &&
        !spark.catalog.tableExists("b_heal__compacting"),
        "recovery must complete the interrupted swap")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_heal")
      spark.sql("DROP TABLE IF EXISTS b_heal__compacting")
    }
  }

  test("date-partitioned layout prunes directories at the scan") {
    // the OTHER half of the layout story: bucketing co-locates joins,
    // partitionBy(date) makes time predicates skip whole directories —
    // at 100 TB a day-scoped query must read one partition, not filter
    // the full table post-scan
    val tmp = graft.io.TempDirs.scratch("graft-part")
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
