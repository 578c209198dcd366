package graft

import graft.sources.{KeyedSource, KeyedStats}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TopN pushdown on the keyed scan (r14 verdict #6,
  * SupportsPushDownTopN): `ORDER BY <stored prefix> LIMIT k` used to
  * heap the FULL scan through TakeOrderedAndProject; the write-time
  * sort makes the files already the answer. Pins (1) the plan — no
  * TakeOrderedAndProject/Sort above the scan, the topN visible in the
  * scan description, directories past the sidecar-counted budget not
  * planned at all; (2) exact values against the unpushed twin; (3) the
  * refusal legs — DESC, non-prefix orders, residual filters, and a
  * missing sidecar all keep Spark's own Sort+Limit. */
class KeyedTopNSpec extends SparkSpec {
  import spark.implicits._

  private val ddl = "kb BIGINT, doc_id BIGINT, n_chars BIGINT"

  // 6 keys × 40 rows; doc_id unique, deliberately interleaved across
  // keys so file order ≠ doc_id order globally
  private lazy val dir: String = {
    val df = (0L until 240L).map(i => (i % 6L, i, (i * 13L) % 97L))
      .toDF("kb", "doc_id", "n_chars")
    KeyedSource.stageKeyed(spark, df,
      graft.io.TempDirs.scratch("graft_topn_") + "/t", "kb",
      sortBy = Seq("doc_id"))
  }

  private def readKeyed(path: String = dir) =
    spark.read.format("graft-keyed").option("path", path)
      .option("schema", ddl).option("key", "kb").load()

  private def scanDesc(df: DataFrame): String =
    df.queryExecution.executedPlan.collectLeaves()
      .collect { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
      .head.scan.description()

  private def hasTopNOperator(df: DataFrame): Boolean = {
    val p = df.queryExecution.executedPlan
    p.exists(_.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]) ||
      p.exists(_.isInstanceOf[org.apache.spark.sql.execution.SortExec])
  }

  test("ORDER BY stored prefix LIMIT k: Sort deleted, LIMIT reaches the reader, values exact") {
    val q = readKeyed().orderBy("kb", "doc_id").limit(7)
    assert(!hasTopNOperator(q),
      s"the Sort must be fully pushed, got\n${q.queryExecution.executedPlan}")
    assert(scanDesc(q).contains("topN=7"), scanDesc(q))
    // budget planning: 7 rows fit inside the first key's 40 — ONE
    // directory planned, not 6
    assert(q.rdd.getNumPartitions == 1,
      "the sidecar row budget must stop planning after the first directory")
    // exact values vs the unpushed twin (sidecar stripped ⇒ refusal
    // path ⇒ Spark's own TakeOrderedAndProject over the full scan)
    val twin = readKeyed(stripSidecar()).orderBy("kb", "doc_id").limit(7)
    assert(hasTopNOperator(twin), "the no-sidecar twin must keep Spark's sort")
    assert(q.collect().sameElements(twin.collect()))
    // a budget crossing key boundaries plans exactly the needed dirs
    val wide = readKeyed().orderBy("kb", "doc_id").limit(85)
    assert(wide.rdd.getNumPartitions == 3, "85 rows = 40+40+5 → 3 directories")
    assert(wide.collect().sameElements(
      readKeyed(stripSidecar()).orderBy("kb", "doc_id").limit(85).collect()))
  }

  test("key-only prefix and single-directory sortBy prefix both push") {
    val byKey = readKeyed().orderBy("kb").limit(50)
    assert(!hasTopNOperator(byKey) && scanDesc(byKey).contains("topN=50"))
    // single surviving directory: the key is constant there, so a
    // sortBy-only order is servable
    val oneDir = readKeyed().filter(col("kb") === 4L).orderBy("doc_id").limit(5)
    assert(!hasTopNOperator(oneDir) && scanDesc(oneDir).contains("topN=5"))
    assert(oneDir.collect().map(_.getLong(1)).toSeq ==
      (0L until 240L).filter(_ % 6 == 4).sorted.take(5))
  }

  test("refusal legs: DESC, non-prefix, residual filter, unordered layout") {
    // DESC: the stored order is ascending — refuse
    val desc = readKeyed().orderBy(col("kb").desc).limit(5)
    assert(hasTopNOperator(desc) && !scanDesc(desc).contains("topN"))
    // non-prefix (skips the key): n_chars is not a stored prefix
    val nonPrefix = readKeyed().orderBy("n_chars").limit(5)
    assert(hasTopNOperator(nonPrefix) && !scanDesc(nonPrefix).contains("topN"))
    // sortBy-only order across MULTIPLE directories: refused (only a
    // single pruned directory makes it servable)
    val multiDir = readKeyed().orderBy("doc_id").limit(5)
    assert(hasTopNOperator(multiDir) && !scanDesc(multiDir).contains("topN"))
    // residual (non-key) filter must apply before the top-N — refuse
    val residual = readKeyed().filter(col("n_chars") > 50L)
      .orderBy("kb", "doc_id").limit(5)
    assert(hasTopNOperator(residual) && !scanDesc(residual).contains("topN"))
    assert(residual.collect().length == 5)
    // unordered layout (no marker): nothing to serve from
    val plain = KeyedSource.stageKeyed(spark,
      (0L until 60L).map(i => (i % 3L, i, i)).toDF("kb", "doc_id", "n_chars"),
      graft.io.TempDirs.scratch("graft_topn_plain_") + "/t", "kb")
    val unordered = readKeyed(plain).orderBy("kb", "doc_id").limit(5)
    assert(hasTopNOperator(unordered) && !scanDesc(unordered).contains("topN"))
  }

  test("TopN survives patched deletion vectors: live-row budgets, fully-deleted keys skipped") {
    val d = graft.io.TempDirs.scratch("graft_topn_dv_") + "/t"
    KeyedSource.stageKeyed(spark,
      (0L until 240L).map(i => (i % 6L, i, (i * 13L) % 97L))
        .toDF("kb", "doc_id", "n_chars"),
      d, "kb", sortBy = Seq("doc_id"))
    val cat = "gtopn"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.sql(s"DROP TABLE IF EXISTS $cat.t")
    spark.sql(
      s"""CREATE TABLE $cat.t (kb BIGINT, doc_id BIGINT, n_chars BIGINT)
         |USING `graft-keyed` LOCATION '$d'
         |TBLPROPERTIES('key'='kb','sortBy'='doc_id','dmlMode'='mor',
         |'retain'='4')""".stripMargin)
    // kb=0 loses EVERY row (the budget must skip its directory);
    // kb=1 loses half (its budget must count LIVE rows)
    spark.sql(s"DELETE FROM $cat.t WHERE kb = 0 AND doc_id >= 0")
    spark.sql(s"DELETE FROM $cat.t WHERE kb = 1 AND doc_id % 12 = 1")
    val hconf = spark.sessionState.newHadoopConf()
    assert(KeyedSource.readCommitLog(d, hconf).get.head.dvs.keySet ==
      Set("0", "1"))

    val q = readKeyed(d).orderBy("kb", "doc_id").limit(25)
    assert(!hasTopNOperator(q),
      s"TopN must stay pushed under patched dvs, got\n${q.queryExecution.executedPlan}")
    assert(scanDesc(q).contains("topN=25"), scanDesc(q))
    // kb=0 contributes nothing (skipped), kb=1's 20 live rows + 5 of
    // kb=2 fill the budget: exactly TWO directories planned
    assert(q.rdd.getNumPartitions == 2,
      "the live-row budget must skip the fully-deleted key and stop after two directories")
    val expect = (0L until 240L).map(i => (i % 6L, i, (i * 13L) % 97L))
      .filterNot { case (kb, id, _) => kb == 0L || (kb == 1L && id % 12L == 1L) }
      .sortBy(t => (t._1, t._2)).take(25)
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == expect)

    // with the patch gone (a pre-r17 dv commit), the budget math loses
    // its exact counts and the pushdown refuses — values unchanged
    val dvGen = KeyedSource.readCommitLog(d, hconf).get.head.dvs("1")
      .head.takeWhile(_ != '/')
    assert(new java.io.File(s"$d/$dvGen", "_graft_keyed_stats_patch").delete())
    new java.io.File(s"$d/$dvGen", "._graft_keyed_stats_patch.crc").delete()
    val q2 = readKeyed(d).orderBy("kb", "doc_id").limit(25)
    assert(hasTopNOperator(q2), "TopN must refuse without the stats patch")
    assert(q2.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == expect)
  }

  test("pushed key filters compose with TopN: pruned directories first, then the budget") {
    val q = readKeyed().filter(col("kb").isin(2L, 5L))
      .orderBy("kb", "doc_id").limit(45)
    assert(!hasTopNOperator(q) && scanDesc(q).contains("topN=45"))
    assert(q.rdd.getNumPartitions == 2, "both surviving dirs needed: 40 + 5")
    val expect = (0L until 240L).filter(i => i % 6 == 2 || i % 6 == 5)
      .map(i => (i % 6, i)).sortBy(identity).take(45)
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == expect)
  }

  /** Fresh layout with the sidecar removed — the refusal twin. */
  private def stripSidecar(): String = {
    val df = (0L until 240L).map(i => (i % 6L, i, (i * 13L) % 97L))
      .toDF("kb", "doc_id", "n_chars")
    val d = KeyedSource.stageKeyed(spark, df,
      graft.io.TempDirs.scratch("graft_topn_nosc_") + "/t", "kb",
      sortBy = Seq("doc_id"))
    val root = KeyedSource.committedRoot(spark, d)
    new java.io.File(root, KeyedStats.SidecarFile).delete()
    new java.io.File(root, s".${KeyedStats.SidecarFile}.crc").delete()
    d
  }
}
