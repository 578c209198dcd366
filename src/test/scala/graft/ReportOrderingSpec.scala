package graft

import graft.sources.KeyedSource
import org.apache.spark.sql.functions._

/** Write-time sort order reported to the planner
  * (SupportsReportOrdering on the keyed scan, licensed by the
  * `_graft_keyed_order` marker stageKeyed writes for a non-empty
  * `sortBy`). Pins that the stored order is physically TRUE, that the
  * claim is exactly as wide as column pruning allows (key leads only
  * while present; a pruned mid-prefix truncates), that unordered and
  * re-staged layouts claim nothing, and the payoff: the q54-shape
  * co-keyed SMJ plans ZERO Exchange and ZERO Sort. */
class ReportOrderingSpec extends SparkSpec {
  import spark.implicits._

  private val ddl = "kb BIGINT, doc_id BIGINT, n_chars BIGINT"

  // deliberately scrambled input: the write-side sort must do the work
  private lazy val df = (0L until 256L).map(i => (i * 2654435761L) % 256L)
    .map(i => (i % 8L, i, (i * 13L) % 101L)).toDF("kb", "doc_id", "n_chars")

  private def stage(sortBy: Seq[String]): String =
    KeyedSource.stageKeyed(spark, df,
      graft.io.TempDirs.scratch("graft_order_") + "/t", "kb", sortBy)

  private def readKeyed(dir: String) =
    spark.read.format("graft-keyed").option("path", dir)
      .option("schema", ddl).option("key", "kb").load()

  private def ordering(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.sparkPlan.collectLeaves()
      .collect { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
      .head.ordering.getOrElse(Seq.empty).map(_.child.toString)

  test("the stored order is physically true; the scan reports it") {
    val dir = stage(Seq("doc_id"))
    // file-level truth, no Spark ordering involved: each key file's
    // doc_ids must already be ascending on disk
    for (kDir <- new java.io.File(KeyedSource.committedRoot(spark, dir)).listFiles()
        if kDir.isDirectory && kDir.getName.startsWith("k=")) {
      val f = kDir.listFiles().filter(x => x.isFile && !x.getName.startsWith("_")
        && !x.getName.startsWith(".")).head
      val ids = scala.io.Source.fromFile(f, "UTF-8").getLines()
        .map(_.split("")(1).toLong).toSeq
      assert(ids.nonEmpty && ids == ids.sorted,
        s"${kDir.getName}: file must be written in doc_id order, got head ${ids.take(5)}")
    }
    val ord = ordering(readKeyed(dir).select("kb", "doc_id", "n_chars"))
    assert(ord.exists(_.contains("kb")) && ord.size == 2 &&
      ord.last.contains("doc_id"), s"expected (kb, doc_id) reported, got $ord")
  }

  test("claim width follows column pruning: key leads while present, mid-prefix truncates") {
    val dir = KeyedSource.stageKeyed(spark, df,
      graft.io.TempDirs.scratch("graft_order2_") + "/t", "kb",
      sortBy = Seq("doc_id", "n_chars"))
    // full projection: (kb, doc_id, n_chars)
    assert(ordering(readKeyed(dir).select("kb", "doc_id", "n_chars")).size == 3)
    // key pruned away: (doc_id, n_chars) — exact, the key is constant
    // per partition so the per-partition order is unchanged
    assert(ordering(readKeyed(dir).select("doc_id", "n_chars")).size == 2)
    // mid-prefix pruned (doc_id gone): n_chars alone is NOT ordered —
    // the claim must truncate to just the key
    val truncated = ordering(readKeyed(dir).select("kb", "n_chars"))
    assert(truncated.size == 1 && truncated.head.contains("kb"),
      s"n_chars is only ordered under its doc_id prefix, got $truncated")
  }

  test("unordered layouts and restages claim nothing; values never depend on the claim") {
    val plain = stage(Nil)
    assert(!new java.io.File(KeyedSource.committedRoot(spark, plain),
      KeyedSource.OrderFile).exists())
    assert(ordering(readKeyed(plain).select("kb", "doc_id")).isEmpty)
    // restage the SAME dir without sortBy: the stale marker must go
    val dir = stage(Seq("doc_id"))
    assert(new java.io.File(KeyedSource.committedRoot(spark, dir),
      KeyedSource.OrderFile).exists())
    KeyedSource.stageKeyed(spark, df, dir, "kb")
    assert(!new java.io.File(KeyedSource.committedRoot(spark, dir),
      KeyedSource.OrderFile).exists(),
      "a re-stage without sortBy must not leave a false ordering claim")
    assert(ordering(readKeyed(dir).select("kb", "doc_id")).isEmpty)
    // and the data round-trips identically either way
    assert(readKeyed(dir).orderBy("doc_id").collect()
      .sameElements(readKeyed(plain).orderBy("doc_id").collect()))
  }

  test("the payoff: co-keyed SMJ plans zero Exchange AND zero Sort") {
    val base = graft.io.TempDirs.scratch("graft_order_join_")
    KeyedSource.stageKeyed(spark, df, s"$base/L", "kb", sortBy = Seq("doc_id"))
    KeyedSource.stageKeyed(spark,
      df.withColumnRenamed("n_chars", "n2"), s"$base/R", "kb", sortBy = Seq("doc_id"))
    val bucketing = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val requireAll = spark.conf.getOption("spark.sql.requireAllClusterKeysForCoPartition")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try {
      val l = readKeyed(s"$base/L")
      val r = spark.read.format("graft-keyed").option("path", s"$base/R")
        .option("schema", "kb BIGINT, doc_id BIGINT, n2 BIGINT")
        .option("key", "kb").load()
      val j = l.hint("merge").join(r.hint("merge"), Seq("kb", "doc_id"))
      // toString over executedPlan (the KeyedSourceSpec convention):
      // Sort/Exchange only exist AFTER EnsureRequirements, and
      // AdaptiveSparkPlanExec hides children from exists/collect but
      // prints the full tree. "- Sort [" cannot match SortMergeJoin.
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"SPJ must keep the join exchange-free:\n${plan.take(2000)}")
      assert(plan.contains("SortMergeJoin"),
        s"the merge hint must keep this an SMJ (the Sort-elision subject):\n${plan.take(2000)}")
      assert(!plan.contains("- Sort ["),
        s"write-time order must delete BOTH per-partition sorts:\n${plan.take(2000)}")
      // values: every row matches itself once
      assert(j.count() == 256L)
      // control: the UNORDERED twin keeps the sorts (the claim is the
      // marker's, not the planner's guess)
      val plainBase = graft.io.TempDirs.scratch("graft_order_ctrl_")
      KeyedSource.stageKeyed(spark, df, s"$plainBase/L", "kb")
      KeyedSource.stageKeyed(spark,
        df.withColumnRenamed("n_chars", "n2"), s"$plainBase/R", "kb")
      val pj = readKeyed(s"$plainBase/L").hint("merge")
        .join(spark.read.format("graft-keyed").option("path", s"$plainBase/R")
          .option("schema", "kb BIGINT, doc_id BIGINT, n2 BIGINT")
          .option("key", "kb").load().hint("merge"), Seq("kb", "doc_id"))
      assert(pj.queryExecution.executedPlan.toString.contains("- Sort ["),
        "without the marker the SMJ must keep its own sorts")
      assert(pj.count() == 256L)
    } finally {
      bucketing.fold(spark.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
        v => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v))
      requireAll.fold(spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition"))(
        v => spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", v))
    }
  }
}
