package graft

import graft.sources.{KeyedSource, KeyedStats, PageSource}
import org.apache.spark.sql.functions._

/** Connector-reported statistics (SupportsReportStatistics on both
  * scans): pruning-aware sizeInBytes from the surviving partitions'
  * file bytes, numRows from the keyed stats sidecar when one matches.
  * Pins the exact estimates (full vs key-pruned vs page-pruned), the
  * trust rule (no sidecar ⇒ size-only), the planner effect (a
  * hint-free join flips its build side / join shape against a
  * reportStats=false twin under a controlled broadcast threshold),
  * and value parity across the flip. */
class ReportStatisticsSpec extends SparkSpec {
  import spark.implicits._

  private val ddl = "kb BIGINT, doc_id BIGINT, source STRING, n_chars BIGINT"

  // a fixture big enough that parquet bytes exceed a small controlled
  // threshold while ONE keyed directory stays under it
  private lazy val rows = (0L until 4096L).map(i =>
    (i % 16L, i, s"src_${i % 7L}_${(i * 2654435761L) % 100000L}", (i * 13L) % 997L))
  private lazy val keyedDir = KeyedSource.stageKeyed(spark,
    rows.toDF("kb", "doc_id", "source", "n_chars"),
    graft.io.TempDirs.scratch("graft_rstats_") + "/docs", "kb")
  private lazy val parquetDir = {
    val d = graft.io.TempDirs.scratch("graft_rstats_pq_")
    rows.toDF("kb", "doc_id", "source", "n_chars")
      .select(col("doc_id"), col("source").as("lang"))
      .write.parquet(s"$d/documents.parquet")
    s"$d/documents.parquet"
  }

  private def readKeyed(reportStats: Boolean = true) =
    spark.read.format("graft-keyed").option("path", keyedDir)
      .option("schema", ddl).option("key", "kb")
      .option("reportStats", reportStats.toString).load()

  private def scanOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.sparkPlan.collectLeaves()
      .collect { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
      .head.scan

  private def dirBytes(dir: java.io.File): Long =
    dir.listFiles().filter(f => f.isFile && !f.getName.startsWith("_")
      && !f.getName.startsWith(".")).map(_.length).sum

  test("keyed estimate: full layout bytes + sidecar row count; pruned read shrinks both") {
    val full = scanOf(readKeyed().select("doc_id", "n_chars"))
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    val kDirs = new java.io.File(KeyedSource.committedRoot(spark, keyedDir))
      .listFiles().filter(f => f.isDirectory && f.getName.startsWith("k="))
    assert(full.sizeInBytes.getAsLong == kDirs.map(dirBytes).sum,
      "unpruned size must be the layout's data bytes, sidecar excluded")
    assert(full.numRows.getAsLong == 4096L, "row count comes from the sidecar")
    val pruned = scanOf(readKeyed().filter(col("kb") === 3L).select("doc_id"))
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    val dir3 = kDirs.find(_.getName == "k=3").get
    assert(pruned.sizeInBytes.getAsLong == dirBytes(dir3),
      "pushed key filter must shrink the estimate to the surviving directory")
    assert(pruned.numRows.getAsLong == 4096L / 16L)
    assert(pruned.sizeInBytes.getAsLong * 8 < full.sizeInBytes.getAsLong,
      "the 1-of-16 prune must be visible in the size estimate")
  }

  test("trust rule: no sidecar ⇒ size still reported, row count honestly absent") {
    val dir = KeyedSource.stageKeyed(spark,
      rows.take(64).toDF("kb", "doc_id", "source", "n_chars"),
      graft.io.TempDirs.scratch("graft_rstats_nosc_") + "/docs", "kb")
    val root = KeyedSource.committedRoot(spark, dir)
    new java.io.File(root, KeyedStats.SidecarFile).delete()
    new java.io.File(root, s".${KeyedStats.SidecarFile}.crc").delete()
    val st = scanOf(spark.read.format("graft-keyed").option("path", dir)
        .option("schema", ddl).option("key", "kb").load().select("doc_id"))
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(st.sizeInBytes.isPresent && !st.numRows.isPresent)
  }

  test("pages estimate: page-range prune shrinks the size; row count absent by design") {
    val dir = graft.io.TempDirs.scratch("graft_rstats_pages_")
    rows.take(256).map { case (_, id, src, n) => (id, s"text $id", "en", src, n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val staged = PageSource.stageDocuments(spark, dir, pageSize = 32L)
    def pageScan(df: org.apache.spark.sql.DataFrame) = scanOf(df)
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    val read = spark.read.format("graft-pages").option("path", staged)
      .option("schema", PageSource.DDL).load()
    val full = pageScan(read.select("doc_id"))
    val pages = new java.io.File(staged).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("page="))
    assert(full.sizeInBytes.getAsLong == pages.map(dirBytes).sum)
    assert(!full.numRows.isPresent, "pages keep no row manifest — absent, not guessed")
    val pruned = pageScan(read.filter(col("doc_id") < 32L).select("doc_id"))
    assert(pruned.sizeInBytes.getAsLong == dirBytes(pages.find(_.getName == "page=0").get))
  }

  test("the planner effect: hint-free join broadcasts the pruned keyed read, stats-off twin shuffles") {
    val threshold = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    // controlled threshold: above ONE keyed directory (~20 KB), below
    // the parquet side — so the flip is decided by the connector's
    // reported estimate alone
    val oneDir = dirBytes(new java.io.File(KeyedSource.committedRoot(spark, keyedDir))
      .listFiles().filter(f => f.isDirectory && f.getName.startsWith("k=")).minBy(_.getName))
    val pqBytes = new java.io.File(parquetDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    assert(oneDir * 2 < pqBytes,
      s"fixture must separate the two sides ($oneDir vs $pqBytes bytes)")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (oneDir * 2).toString)
    try {
      def q(reportStats: Boolean) =
        spark.read.parquet(parquetDir)
          .join(readKeyed(reportStats).filter(col("kb") === 3L)
            .select("doc_id", "n_chars"), "doc_id")
          .groupBy("lang")
          .agg(count(lit(1)).as("n"), sum("n_chars").as("s"))
          .orderBy("lang")
      val on = q(reportStats = true)
      val onPlan = on.queryExecution.sparkPlan
      assert(onPlan.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
        s"reported stats must let the pruned read broadcast:\n$onPlan")
      val off = q(reportStats = false)
      val offPlan = off.queryExecution.sparkPlan
      assert(!offPlan.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
        s"without reported stats neither side fits the threshold:\n$offPlan")
      assert(on.collect().sameElements(off.collect()),
        "the estimate changes the plan, never the answer")
    } finally {
      threshold.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        v => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v))
    }
  }
}
