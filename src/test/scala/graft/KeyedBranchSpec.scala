package graft

import graft.sources.KeyedSource
import org.apache.spark.sql.DataFrame

/** Branch refs on the keyed snapshot log (r17 — write-audit-publish at
  * the table layer, the reference's staged promotion
  * `to_processed` → `already_processed` as a ref lifecycle). Pins:
  * (1) ISOLATION — appends on a branch are invisible to main, to main
  *     time travel, and to tags, while branch reads see them;
  * (2) PROMOTE — fastForward makes main's head the branch state in one
  *     metadata commit (no data movement), and consumes the branch;
  * (3) fast-forward REFUSES when main took a data commit past the
  *     fork (never silently discards main's writes), but tolerates
  *     metadata-only head burns (tags);
  * (4) RETENTION — branch snapshots and the fork survive main-side
  *     trims while the branch lives; a dropped branch's snapshots age
  *     out at the next commit;
  * (5) name hygiene — numeric/duplicate branch names refuse. */
class KeyedBranchSpec extends SparkSpec {
  import spark.implicits._

  private val ddl = "kb BIGINT, doc_id BIGINT, source STRING, n_chars BIGINT"
  private def hconf = spark.sessionState.newHadoopConf()

  private def df(n: Long, off: Long = 0L) =
    (0L until n).map(i => ((i + off) % 4L, i + off, s"s${i % 3L}", (i * 7L) % 101L))
      .toDF("kb", "doc_id", "source", "n_chars")

  private def readKeyed(dir: String, asOf: Option[Long] = None,
      branch: Option[String] = None): DataFrame = {
    var r = spark.read.format("graft-keyed").option("path", dir)
      .option("schema", ddl).option("key", "kb")
    asOf.foreach(v => r = r.option("asOf", v.toString))
    branch.foreach(b => r = r.option("branch", b))
    r.load()
  }

  private def appendTo(dir: String, d: DataFrame, branch: Option[String] = None): Unit = {
    var w = d.write.format("graft-keyed").option("schema", ddl)
      .option("key", "kb").option("sortBy", "doc_id")
    branch.foreach(b => w = w.option("branch", b))
    w.mode("append").save(dir)
  }

  test("branch appends are invisible to main until fastForward promotes them") {
    val dir = graft.io.TempDirs.scratch("graft_branch_") + "/t"
    KeyedSource.stageKeyed(spark, df(16L), dir, "kb",
      sortBy = Seq("doc_id"), retain = 4)
    val fork = KeyedSource.createBranch(spark, dir, "backfill")
    assert(fork == 1L)

    appendTo(dir, df(4L, off = 100L), branch = Some("backfill"))
    appendTo(dir, df(2L, off = 200L), branch = Some("backfill"))

    // ISOLATION: main sees none of it, on any main read surface
    assert(readKeyed(dir).count() == 16L, "main must not see branch writes")
    assert(spark.read.format("graft-keyed").option("path", dir)
      .option("schema", ddl).option("key", "kb").load()
      .where($"doc_id" >= 100L).count() == 0L)
    // the branch sees its own lineage
    assert(readKeyed(dir, branch = Some("backfill")).count() == 22L)
    // time travel within the branch lineage: each branch commit is a
    // retained snapshot
    val log = KeyedSource.readCommitLog(dir, hconf).get
    val branchSeqs = log.snapshots.filter(_.branch.contains("backfill")).map(_.seq)
    assert(branchSeqs.length == 2)
    assert(readKeyed(dir, asOf = Some(branchSeqs.head)).count() == 20L)

    // PROMOTE: one metadata commit; main adopts the branch state; the
    // branch is consumed
    val promoted = KeyedSource.fastForward(spark, dir, "backfill")
    assert(readKeyed(dir).count() == 22L)
    assert(readKeyed(dir).where($"doc_id" >= 100L).count() == 6L)
    val after = KeyedSource.readCommitLog(dir, hconf).get
    assert(after.head.seq == promoted)
    assert(after.branches.isEmpty, "promote consumes the branch")
    intercept[IllegalArgumentException] {
      readKeyed(dir, branch = Some("backfill")).collect()
    }
    // pre-promotion main time travel still reads the pre-branch state
    assert(readKeyed(dir, asOf = Some(1L)).count() == 16L)
  }

  test("fastForward refuses after a main data commit, tolerates metadata-only burns") {
    val dir = graft.io.TempDirs.scratch("graft_branch_ff_") + "/t"
    KeyedSource.stageKeyed(spark, df(8L), dir, "kb",
      sortBy = Seq("doc_id"), retain = 4)
    KeyedSource.createBranch(spark, dir, "risky")
    appendTo(dir, df(2L, off = 500L), branch = Some("risky"))

    // a metadata-only head burn (tag) must NOT block the fast-forward
    KeyedSource.tagSnapshot(spark, dir, "pin")
    // ...but a DATA commit on main touching a key the branch also
    // touched must (branch wrote kb 0,1 via offsets 500,501; main's
    // row 900 lands on kb 0 — overlap, the write-skew grain)
    appendTo(dir, df(1L, off = 900L))
    val e = intercept[IllegalStateException] {
      KeyedSource.fastForward(spark, dir, "risky")
    }
    assert(e.getMessage.contains("both lineages touched key(s) 0"), e.getMessage)
    // main's commit survived; the branch is still intact for re-work
    assert(readKeyed(dir).count() == 9L)
    assert(readKeyed(dir, branch = Some("risky")).count() == 10L)

    // drop instead: main never sees the branch rows; snapshots age out
    // at the next commit's trim
    KeyedSource.dropBranch(spark, dir, "risky")
    assert(readKeyed(dir).count() == 9L)
    appendTo(dir, df(1L, off = 901L)) // trim sweeps the dropped branch
    val log = KeyedSource.readCommitLog(dir, hconf).get
    assert(!log.snapshots.exists(_.branch.isDefined),
      "a dropped branch's snapshots must age out at the next trim")
    assert(readKeyed(dir).count() == 10L)
  }

  test("retention: branch snapshots and fork survive main-side trims while the branch lives") {
    val dir = graft.io.TempDirs.scratch("graft_branch_ret_") + "/t"
    KeyedSource.stageKeyed(spark, df(8L), dir, "kb", retain = 1)
    KeyedSource.createBranch(spark, dir, "slow")
    appendTo(dir, df(2L, off = 300L), branch = Some("slow"))
    // main churns: retain=1 trims main history aggressively
    KeyedSource.stageKeyed(spark, df(6L, off = 50L), dir, "kb", retain = 1)
    KeyedSource.stageKeyed(spark, df(4L, off = 60L), dir, "kb", retain = 1)
    val log = KeyedSource.readCommitLog(dir, hconf).get
    assert(log.snapshots.exists(_.seq == 1L), "the fork point must survive")
    assert(log.snapshots.exists(_.branch.contains("slow")),
      "branch snapshots must survive main trims")
    // the branch still reads its full pre-churn lineage
    assert(readKeyed(dir, branch = Some("slow")).count() == 10L)
    // main reads the latest overwrite only
    assert(readKeyed(dir).count() == 4L)
    // promote now refuses (main rewrote itself past the fork)
    intercept[IllegalStateException] {
      KeyedSource.fastForward(spark, dir, "slow")
    }
  }

  test("DML through a branch-pinned table: UPDATE/DELETE land on the branch, main untouched until promote") {
    val dir = graft.io.TempDirs.scratch("graft_branch_dml_") + "/t"
    KeyedSource.stageKeyed(spark, df(32L), dir, "kb",
      sortBy = Seq("doc_id"), retain = 8)
    KeyedSource.createBranch(spark, dir, "fix")
    spark.conf.set("spark.sql.catalog.gbrd",
      classOf[graft.sources.GraftCatalog].getName)
    spark.sql("DROP TABLE IF EXISTS gbrd.fix")
    spark.sql(
      s"""CREATE TABLE gbrd.fix (kb BIGINT, doc_id BIGINT, source STRING,
         |n_chars BIGINT) USING `graft-keyed` LOCATION '$dir'
         |TBLPROPERTIES('key'='kb','sortBy'='doc_id','retain'='8',
         |'dmlMode'='mor','branch'='fix')""".stripMargin)

    // the branch-pinned table READS the branch and its DML lands there:
    // an UPDATE (MOR dv + append) and a row-grain DELETE
    spark.sql("UPDATE gbrd.fix SET n_chars = 1 WHERE doc_id % 8 = 2")
    spark.sql("DELETE FROM gbrd.fix WHERE doc_id = 13")
    // plus a key-grain tombstone DELETE
    spark.sql("DELETE FROM gbrd.fix WHERE kb = 3")

    // main: byte-for-byte unaffected on every read surface
    val mainRows = readKeyed(dir).collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(mainRows.size == 32 && mainRows(13L) == (13L * 7L) % 101L &&
      mainRows(2L) == (2L * 7L) % 101L)
    // the branch (via the pinned table AND the read option) shows all
    // three commits
    val branchRows = spark.sql("SELECT doc_id, n_chars FROM gbrd.fix")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(branchRows.size == 32 - 1 - 8) // minus doc 13, minus kb=3
    assert(!branchRows.contains(13L) && !branchRows.contains(3L))
    assert(branchRows(2L) == 1L && branchRows(10L) == 1L)
    assert(readKeyed(dir, branch = Some("fix")).count() == 23L)

    // a conflicting branch commit between scan and DML fails loudly
    // (the serializable check now compares the BRANCH head)
    KeyedSource.raceHook.set(() =>
      appendTo(dir, df(2L, off = 800L), branch = Some("fix")))
    val e = intercept[Exception] {
      spark.sql("DELETE FROM gbrd.fix WHERE doc_id = 21")
    }
    assert((e.getMessage + Option(e.getCause).fold("")(_.getMessage))
      .contains("branch 'fix'"), e.getMessage)

    // promote: main adopts the audited state in one metadata commit
    KeyedSource.fastForward(spark, dir, "fix")
    val after = readKeyed(dir).collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(after.size == 25) // 23 + the racing append's 2 rows
    assert(after(2L) == 1L && !after.contains(13L) && !after.contains(3L))
  }

  test("disjoint-key rebase: promote replays branch edits onto an advanced main head; CDC nets the replay") {
    val dir = graft.io.TempDirs.scratch("graft_branch_rb_") + "/t"
    KeyedSource.stageKeyed(spark, df(8L), dir, "kb",
      sortBy = Seq("doc_id"), retain = 8) // kb 0..3
    KeyedSource.createBranch(spark, dir, "backfill")
    // the branch lands rows on NEW key 5; main advances on NEW key 6
    Seq((5L, 100L, "s0", 11L), (5L, 101L, "s1", 12L))
      .toDF("kb", "doc_id", "source", "n_chars")
      .write.format("graft-keyed").option("schema", ddl)
      .option("key", "kb").option("sortBy", "doc_id")
      .option("branch", "backfill").mode("append").save(dir)
    Seq((6L, 200L, "s2", 13L)).toDF("kb", "doc_id", "source", "n_chars")
      .write.format("graft-keyed").option("schema", ddl)
      .option("key", "kb").option("sortBy", "doc_id")
      .mode("append").save(dir)
    val preMain = KeyedSource.readCommitLog(dir, hconf).get.head.seq

    // DISJOINT touched sets → promote REBASES: one metadata commit,
    // both lineages' rows live, files referenced never copied
    val promoted = KeyedSource.fastForward(spark, dir, "backfill")
    val rows = readKeyed(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.size == 11 &&
      rows.contains((5L, 100L)) && rows.contains((5L, 101L)) &&
      rows.contains((6L, 200L)), rows)
    val after = KeyedSource.readCommitLog(dir, hconf).get
    assert(after.head.seq == promoted && after.branches.isEmpty)

    // CDC prices the promote at the branch DELTA: the interval from
    // main's pre-promote head shows exactly the replayed kb=5 inserts
    val changes = spark.read.format("graft-keyed").option("path", dir)
      .option("schema", ddl).option("key", "kb")
      .option("metadata", "changes")
      .option("changesFrom", preMain.toString).load()
    val delta = changes.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(4))).toSet
    assert(delta == Set((5L, 100L, "insert"), (5L, 101L, "insert")), delta)

    // … and time travel to the pre-promote main still excludes them
    assert(readKeyed(dir, asOf = Some(preMain)).count() == 9L)
  }

  test("snapshots metadata table labels branch states; ALTER on a branch-pinned table keeps the pin") {
    val dir = graft.io.TempDirs.scratch("graft_branch_meta_") + "/t"
    KeyedSource.stageKeyed(spark, df(16L), dir, "kb",
      sortBy = Seq("doc_id"), retain = 4)
    KeyedSource.createBranch(spark, dir, "wip")
    appendTo(dir, df(4L, off = 100L), branch = Some("wip"))

    // the `branch` column separates unpublished branch states from main
    // lineage — an auditor of main history filters `branch IS NULL`
    val meta = spark.read.format("graft-keyed").option("path", dir)
      .option("schema", ddl).option("key", "kb")
      .option("metadata", "snapshots").load().orderBy("seq")
      .collect().map(r => (r.getLong(0), Option(r.getString(4))))
    // seq 2 is createBranch's main head-dup burn (branch = NULL); seq 3
    // the branch append, now visibly labeled
    assert(meta.toSeq == Seq((1L, None), (2L, None), (3L, Some("wip"))),
      meta.toSeq)

    // ALTER TABLE through the catalog returns a handle that still
    // targets the branch (the pre-r18 handle silently dropped the pin)
    spark.conf.set("spark.sql.catalog.gbrm",
      classOf[graft.sources.GraftCatalog].getName)
    spark.sql("DROP TABLE IF EXISTS gbrm.wip")
    spark.sql(
      s"""CREATE TABLE gbrm.wip (kb BIGINT, doc_id BIGINT, source STRING,
         |n_chars BIGINT) USING `graft-keyed` LOCATION '$dir'
         |TBLPROPERTIES('key'='kb','sortBy'='doc_id','retain'='4','branch'='wip')""".stripMargin)
    val cat = spark.sessionState.catalogManager.catalog("gbrm")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val altered = cat.alterTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "wip"),
      org.apache.spark.sql.connector.catalog.TableChange.renameColumn(
        Array("source"), "src"))
    assert(altered.name().contains("@branch:wip"), altered.name())
    // and the post-ALTER catalog read still serves the branch lineage
    assert(spark.sql("SELECT count(*) FROM gbrm.wip").head().getLong(0) == 20L)
  }

  test("branch name hygiene: numeric, duplicate, unknown, and overwrite-through-branch refuse") {
    val dir = graft.io.TempDirs.scratch("graft_branch_nm_") + "/t"
    KeyedSource.stageKeyed(spark, df(4L), dir, "kb", retain = 2)
    intercept[IllegalArgumentException] {
      KeyedSource.createBranch(spark, dir, "2024")
    }
    KeyedSource.createBranch(spark, dir, "b1")
    intercept[IllegalArgumentException] {
      KeyedSource.createBranch(spark, dir, "b1")
    }
    intercept[IllegalArgumentException] {
      KeyedSource.dropBranch(spark, dir, "nope")
    }
    intercept[IllegalArgumentException] {
      readKeyed(dir, branch = Some("nope")).collect()
    }
    val e = intercept[Exception] {
      df(2L).write.format("graft-keyed").option("schema", ddl)
        .option("key", "kb").option("branch", "b1")
        .mode("overwrite").save(dir)
    }
    assert((e.getMessage + Option(e.getCause).fold("")(_.getMessage))
      .contains("APPEND-only"), e.getMessage)
  }
}
