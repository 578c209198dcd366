package graft

import graft.sources.{GraftCatalog, KeyedSource}
import org.apache.spark.sql.functions._

/** Row-level DML on `graft-keyed` (r16 — SupportsRowLevelOperations,
  * group-based copy-on-write over affected key directories). Pins:
  * (1) row-grain DELETE rewrites ONLY the affected key directories —
  * unaffected keys carry forward BY REFERENCE, byte-identical files;
  * (2) key-grain DELETE still takes the metadata tombstone path (no
  * new generation — q64's contract); (3) UPDATE; (4) MERGE upsert
  * incl. an INSERT into an unaffected key (the file APPENDS after the
  * key's existing one — multi-directory partition, ordering claim
  * dropped); (5) full-group row-deletes tombstone the group; (6) time
  * travel sees the pre-DML snapshot; (7) a concurrent commit between
  * scan and commit fails LOUDLY (serializable conflict, never a
  * rebase); (8) metadata aggregates stay correct over edited
  * snapshots (merged sidecar). */
class KeyedRowLevelSpec extends SparkSpec {
  import spark.implicits._

  private val ddl = "kb BIGINT, doc_id BIGINT, source STRING, n_chars BIGINT"
  private val cat = "growlvl"
  spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)

  private def df(n: Long, srcTag: String = "s") =
    (0L until n).map(i => (i % 4L, i, s"$srcTag${i % 3L}", (i * 7L) % 101L))
      .toDF("kb", "doc_id", "source", "n_chars")

  private def readKeyed(dir: String, asOf: Option[Long] = None) = {
    val r = spark.read.format("graft-keyed").option("path", dir)
      .option("schema", ddl).option("key", "kb")
    asOf.fold(r)(v => r.option("asOf", v.toString)).load()
  }

  private def registerTable(name: String, dir: String, retain: Int = 2): String = {
    spark.sql(s"DROP TABLE IF EXISTS $cat.$name")
    spark.sql(
      s"""CREATE TABLE $cat.$name (kb BIGINT, doc_id BIGINT, source STRING,
         |n_chars BIGINT) USING `graft-keyed` LOCATION '$dir'
         |TBLPROPERTIES('key'='kb', 'sortBy'='doc_id', 'retain'='$retain')"""
        .stripMargin)
    s"$cat.$name"
  }

  private def dataFiles(dir: String): Map[String, Set[(String, Long)]] = {
    // key dirname -> {(file path, size)} across ALL generations
    new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("_gen-"))
      .flatMap(_.listFiles().filter(d => d.isDirectory && d.getName.startsWith("k=")))
      .flatMap { d =>
        d.listFiles().filter(f => f.isFile && !f.getName.startsWith(".")).map(f =>
          d.getName.stripPrefix("k=") -> (f.getPath, f.length))
      }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  private def genDirs(dir: String): Set[String] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("_gen-"))
      .map(_.getName).toSet

  test("row-grain DELETE rewrites only the affected key directory; others carry by reference") {
    val dir = graft.io.TempDirs.scratch("graft_rl_del_") + "/t"
    KeyedSource.stageKeyed(spark, df(64L), dir, "kb",
      sortBy = Seq("doc_id"), retain = 2)
    val t = registerTable("rldel", dir)
    val before = dataFiles(dir)
    val hconf = spark.sessionState.newHadoopConf()

    // doc_ids 5 and 21 both live in kb=1 — the condition touches no key
    // literal, so the affected group is discovered by the runtime group
    // filter, not static pushdown
    spark.sql(s"DELETE FROM $t WHERE doc_id IN (5, 21)")

    val log = KeyedSource.readCommitLog(dir, hconf).get
    assert(log.head.edits.keySet == Set("1"),
      s"only kb=1 may be rewritten, got edits=${log.head.edits}")
    assert(log.head.tombstones.isEmpty)
    val after = dataFiles(dir)
    // unaffected keys: same file paths, same bytes — referenced, not copied
    Seq("0", "2", "3").foreach { k =>
      assert(after(k) == before(k), s"k=$k must carry forward by reference")
    }
    // kb=1: the retained old generation's file is untouched, a NEW
    // generation's file serves the head (the edits entry names it)
    assert(before("1").subsetOf(after("1")) && after("1").size == 2,
      s"kb=1 must gain its rewrite alongside the retained original, got ${after("1")}")
    assert(after("1").exists(_._1.contains(log.head.edits("1").head)),
      "the head must be served from the edit generation")
    // values
    val expect = df(64L).filter(!col("doc_id").isin(5L, 21L))
    assert(readKeyed(dir).orderBy("doc_id").collect()
      .sameElements(expect.orderBy("doc_id").collect()))
    // time travel: the pre-DML snapshot still sees the rows
    assert(readKeyed(dir, asOf = Some(1L)).count() == 64L)
    // metadata aggregates answer from the MERGED sidecar (edited key's
    // entry from its generation, others from the base)
    val agg = spark.sql(s"SELECT kb, count(*) AS n, sum(n_chars) AS sc FROM $t " +
      "GROUP BY kb ORDER BY kb")
    assert(agg.queryExecution.executedPlan.toString.contains("GraftKeyedStats"),
      "the stats fast path must survive row-level edits")
    assert(agg.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      expect.groupBy("kb").count().orderBy("kb")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("key-grain DELETE still takes the metadata tombstone path — no rewrite") {
    val dir = graft.io.TempDirs.scratch("graft_rl_meta_") + "/t"
    KeyedSource.stageKeyed(spark, df(32L), dir, "kb",
      sortBy = Seq("doc_id"), retain = 2)
    val t = registerTable("rlmeta", dir)
    val gens = genDirs(dir)
    spark.sql(s"DELETE FROM $t WHERE kb IN (1, 3)")
    assert(genDirs(dir) == gens,
      "a key-grain delete must not write a generation (metadata only)")
    val log = KeyedSource.readCommitLog(dir, spark.sessionState.newHadoopConf()).get
    assert(log.head.tombstones == Set("1", "3") && log.head.edits.isEmpty)
    assert(readKeyed(dir).count() == 16L)
  }

  test("UPDATE rewrites affected directories in place of the snapshot, values exact") {
    val dir = graft.io.TempDirs.scratch("graft_rl_upd_") + "/t"
    KeyedSource.stageKeyed(spark, df(64L), dir, "kb",
      sortBy = Seq("doc_id"), retain = 2)
    val t = registerTable("rlupd", dir)
    spark.sql(s"UPDATE $t SET n_chars = n_chars + 1000 WHERE doc_id IN (9, 13)")
    // doc 9 -> kb=1, doc 13 -> kb=1: one rewritten directory
    val log = KeyedSource.readCommitLog(dir, spark.sessionState.newHadoopConf()).get
    assert(log.head.edits.keySet == Set("1"), s"got ${log.head.edits}")
    val expect = df(64L).withColumn("n_chars",
      when(col("doc_id").isin(9L, 13L), col("n_chars") + 1000L)
        .otherwise(col("n_chars")))
    assert(readKeyed(dir).orderBy("doc_id").collect()
      .sameElements(expect.orderBy("doc_id").collect()))
    // the rewritten file was staged sorted with the layout's sortBy and
    // carries its own order marker: single-dir keys keep the ordering
    // claim alive across the rewrite
    val scan = readKeyed(dir).queryExecution.sparkPlan.collectLeaves().collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportOrdering]
    assert(scan.outputOrdering().nonEmpty,
      "a sortBy-preserving rewrite must keep the stored-order claim")
  }

  test("MERGE upsert: matched groups rewrite, inserts into unaffected keys APPEND") {
    val dir = graft.io.TempDirs.scratch("graft_rl_merge_") + "/t"
    KeyedSource.stageKeyed(spark, df(32L), dir, "kb",
      sortBy = Seq("doc_id"), retain = 2)
    val t = registerTable("rlmerge", dir)
    // source: update doc 6 (kb=2), insert doc 101 (kb=1 — a key with NO
    // matches: its new file must APPEND after the existing one) and doc
    // 200 (kb=0 ... 200 % 4 = 0; also no match in kb=0? doc 6 is kb=2;
    // kb=0 has no matched docs either)
    val src = Seq(
      (2L, 6L, "upd", 999L),    // matched: kb=2 rewritten
      (1L, 101L, "new", 11L),   // not matched: append into kb=1
      (0L, 200L, "new", 22L))   // not matched: append into kb=0
      .toDF("kb", "doc_id", "source", "n_chars")
    src.createOrReplaceTempView("rl_merge_src")
    spark.sql(
      s"""MERGE INTO $t AS t USING rl_merge_src AS s ON t.doc_id = s.doc_id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val log = KeyedSource.readCommitLog(dir, spark.sessionState.newHadoopConf()).get
    val edits = log.head.edits
    assert(edits.keySet == Set("0", "1", "2"), s"got $edits")
    assert(edits("2").length == 1, "a matched group is REPLACED by its rewrite")
    assert(edits("0").length == 2 && edits("1").length == 2,
      s"insert-only keys must APPEND after their existing file, got $edits")
    val expect = df(32L)
      .withColumn("source", when(col("doc_id") === 6L, lit("upd")).otherwise(col("source")))
      .withColumn("n_chars", when(col("doc_id") === 6L, lit(999L)).otherwise(col("n_chars")))
      .unionAll(Seq((1L, 101L, "new", 11L), (0L, 200L, "new", 22L))
        .toDF("kb", "doc_id", "source", "n_chars"))
    assert(readKeyed(dir).orderBy("doc_id").collect()
      .sameElements(expect.orderBy("doc_id").collect()))
    // appended keys are multi-file: the ordering claim must drop (two
    // sorted files concatenated are not sorted)
    val scan = readKeyed(dir).queryExecution.sparkPlan.collectLeaves().collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportOrdering]
    assert(scan.outputOrdering().isEmpty,
      "multi-file keys must poison the stored-order claim")
    // the merged sidecar still answers metadata aggregates exactly
    val agg = spark.sql(s"SELECT count(*) AS n, sum(n_chars) AS sc FROM $t")
    assert(agg.queryExecution.executedPlan.toString.contains("GraftKeyedStats"))
    val exp = expect.agg(count(lit(1)), sum("n_chars")).collect().head
    assert(agg.collect().head.toSeq == exp.toSeq)
  }

  test("deleting every row of a group tombstones it; conflicting commits fail loudly") {
    val dir = graft.io.TempDirs.scratch("graft_rl_tomb_") + "/t"
    KeyedSource.stageKeyed(spark, df(32L), dir, "kb",
      sortBy = Seq("doc_id"), retain = 2)
    val t = registerTable("rltomb", dir)
    // every kb=3 row has doc_id % 4 == 3: a row-grain spelling that
    // empties the whole group
    spark.sql(s"DELETE FROM $t WHERE doc_id % 4 = 3")
    val log = KeyedSource.readCommitLog(dir, spark.sessionState.newHadoopConf()).get
    assert(log.head.tombstones == Set("3"),
      s"an emptied group must be tombstoned, got ${log.head.tombstones}")
    assert(!log.head.edits.contains("3"))
    assert(readKeyed(dir).count() == 24L)

    // a commit racing between the DML's scan and its commit must fail
    // LOUDLY (serializable conflict), never rebase the derived rows
    KeyedSource.raceHook.set(() =>
      KeyedSource.stageKeyed(spark, df(16L, "race"), dir, "kb",
        sortBy = Seq("doc_id"), retain = 2))
    val e = intercept[Exception] {
      spark.sql(s"DELETE FROM $t WHERE doc_id IN (1)")
    }
    def messages(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(c => Option(c.getMessage).toSeq ++ messages(c.getCause))
    assert(messages(e).exists(_.contains("re-run the DML")),
      s"expected a serializable-conflict failure, got: ${messages(e).mkString(" | ")}")
    // the winner's commit is intact; the loser changed nothing
    assert(readKeyed(dir).count() == 16L)
  }

  test("snapshots metadata table and reported statistics see edited snapshots correctly") {
    val dir = graft.io.TempDirs.scratch("graft_rl_meta2_") + "/t"
    KeyedSource.stageKeyed(spark, df(32L), dir, "kb",
      sortBy = Seq("doc_id"), retain = 2)
    val t = registerTable("rlmeta2", dir)
    spark.sql(s"DELETE FROM $t WHERE doc_id IN (5, 21)") // kb=1 rewritten
    val meta = spark.read.format("graft-keyed").option("path", dir)
      .option("schema", ddl).option("key", "kb")
      .option("metadata", "snapshots").load().orderBy("seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(meta.toSeq == Seq((1L, 4L, 0L, 32L), (2L, 4L, 0L, 30L)), meta.toSeq)
    // reported statistics ride the merged sidecar
    val q = readKeyed(dir)
    val stats = q.queryExecution.sparkPlan.collectLeaves().collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(stats.numRows().getAsLong == 30L)
  }
}
