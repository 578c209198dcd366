package graft

import graft.sources.{GraftCatalog, KeyedChanges, KeyedChangesPartition, KeyedSource}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** The `changes` metadata table (r16 — incremental/CDC reads between
  * committed snapshots, Iceberg-incremental/Delta-CDF shape). Pins:
  * (1) net diff across an UPDATE + tombstone DELETE equals the
  * batch-computed truth, and unchanged rows of a rewritten key CANCEL
  * (an upsert touching 2 rows of a 16-row bucket emits 4 change rows,
  * not 32); (2) unchanged keys are skipped without planning a
  * partition; (3) row-level APPEND commits plan ONLY the appended
  * directories — the base generation is never re-read; (4) interval
  * edge cases: from==to is empty, changesFrom=0 is the full snapshot
  * as inserts, an expired/never seq and an inverted interval fail
  * loudly; (5) the apply-contract: snapshot(from) minus deletes plus
  * inserts IS snapshot(to); (6) the STREAMING leg delivers each
  * commit's delta exactly once across restarts (checkpointed seq
  * offsets). */
class KeyedChangesSpec extends SparkSpec {
  import spark.implicits._

  private val ddl = "kb BIGINT, doc_id BIGINT, source STRING, n_chars BIGINT"
  private val cat = "gchg"
  spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)

  private def df(n: Long) =
    (0L until n).map(i => (i % 4L, i, s"s${i % 3L}", (i * 7L) % 101L))
      .toDF("kb", "doc_id", "source", "n_chars")

  private def registerTable(name: String, dir: String, retain: Int): String = {
    spark.sql(s"DROP TABLE IF EXISTS $cat.$name")
    spark.sql(
      s"""CREATE TABLE $cat.$name (kb BIGINT, doc_id BIGINT, source STRING,
         |n_chars BIGINT) USING `graft-keyed` LOCATION '$dir'
         |TBLPROPERTIES('key'='kb', 'sortBy'='doc_id', 'retain'='$retain')"""
        .stripMargin)
    s"$cat.$name"
  }

  private def readChanges(dir: String, from: Long, to: Option[Long] = None): DataFrame = {
    val r = spark.read.format("graft-keyed").option("path", dir)
      .option("schema", ddl).option("key", "kb")
      .option("metadata", "changes").option("changesFrom", from.toString)
    to.fold(r)(v => r.option("changesTo", v.toString)).load()
  }

  private def readKeyed(dir: String, asOf: Option[Long] = None): DataFrame = {
    val r = spark.read.format("graft-keyed").option("path", dir)
      .option("schema", ddl).option("key", "kb")
    asOf.fold(r)(v => r.option("asOf", v.toString)).load()
  }

  private def rows(d: DataFrame): Set[(Long, Long, String, Long, String)] =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      r.getLong(3), r.getString(4))).toSet

  /** Staged lifecycle shared by the batch legs: seq1 full 64 rows,
    * seq2 UPDATE doc_id∈{5,21} (both kb=1) to n_chars=999, seq3
    * tombstone DELETE of kb=2. */
  private lazy val lifecycle: String = {
    val dir = graft.io.TempDirs.scratch("graft_chg_") + "/t"
    KeyedSource.stageKeyed(spark, df(64L), dir, "kb",
      sortBy = Seq("doc_id"), retain = 6)
    val t = registerTable("chg", dir, retain = 6)
    spark.sql(s"UPDATE $t SET n_chars = 999 WHERE doc_id IN (5, 21)")
    spark.sql(s"DELETE FROM $t WHERE kb = 2")
    dir
  }

  test("net diff across UPDATE + tombstone DELETE matches batch truth; unchanged rows cancel") {
    val base = df(64L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected: Set[(Long, Long, String, Long, String)] =
      (base.filter(r => r._2 == 5L || r._2 == 21L)
        .map(r => (r._1, r._2, r._3, r._4, "delete")) ++
       base.filter(r => r._2 == 5L || r._2 == 21L)
        .map(r => (r._1, r._2, r._3, 999L, "insert")) ++
       base.filter(_._1 == 2L).map(r => (r._1, r._2, r._3, r._4, "delete"))).toSet
    val got = readChanges(lifecycle, from = 1L)
    assert(rows(got) == expected)
    // 20 change rows for a 64-row table: the 14 unchanged kb=1 rows
    // cancelled inside the rewritten key's partition
    assert(got.count() == 20)
    // only the two CHANGED keys plan partitions (kb=1 rewrite, kb=2 drop)
    assert(got.rdd.getNumPartitions == 2)
  }

  test("apply-contract: from-snapshot minus deletes plus inserts equals to-snapshot") {
    val chg = readChanges(lifecycle, from = 1L).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)),
        r.getString(4)))
    val v1 = readKeyed(lifecycle, asOf = Some(1L)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    val head = readKeyed(lifecycle).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    val applied = v1 -- chg.filter(_._2 == "delete").map(_._1) ++
      chg.filter(_._2 == "insert").map(_._1)
    assert(applied == head)
  }

  test("sub-interval (2,3] sees only the DELETE; (0,1] is the full snapshot as inserts") {
    val d23 = readChanges(lifecycle, from = 2L, to = Some(3L))
    assert(d23.rdd.getNumPartitions == 1) // only kb=2 changed
    val got = rows(d23)
    assert(got.forall(_._5 == "delete") && got.size == 16 && got.forall(_._1 == 2L))

    val d01 = readChanges(lifecycle, from = 0L, to = Some(1L))
    assert(d01.count() == 64)
    assert(d01.where($"_change_type" =!= "insert").count() == 0)
  }

  test("from==to is empty; expired seq and inverted interval fail loudly") {
    assert(readChanges(lifecycle, from = 3L, to = Some(3L)).count() == 0)
    val e1 = intercept[IllegalArgumentException] {
      readChanges(lifecycle, from = 99L).count()
    }
    assert(e1.getMessage.contains("not retained"))
    val e2 = intercept[IllegalArgumentException] {
      readChanges(lifecycle, from = 3L, to = Some(1L)).count()
    }
    assert(e2.getMessage.contains("changesFrom"))
  }

  test("row-level APPEND plans only the appended directories, base never re-read") {
    val dir = lifecycle
    val t = s"$cat.chg"
    // insert-only MERGE: new doc_ids land as per-key appended files
    // (kb=2 was tombstoned — its insert REVIVES the key from the new
    // generation alone)
    (100L to 107L).map(i => (i % 4L, i, s"s${i % 3L}", 7L))
      .toDF("kb", "doc_id", "source", "n_chars")
      .createOrReplaceTempView("chg_append_src")
    spark.sql(
      s"""MERGE INTO $t AS t USING chg_append_src AS s ON t.doc_id = s.doc_id
         |WHEN NOT MATCHED THEN INSERT (kb, doc_id, source, n_chars)
         |  VALUES (s.kb, s.doc_id, s.source, s.n_chars)""".stripMargin)
    val hconf = spark.sessionState.newHadoopConf()
    val log = KeyedSource.readCommitLog(dir, hconf).get
    assert(log.head.seq == 4L)
    val got = rows(readChanges(dir, from = 3L, to = Some(4L)))
    assert(got.forall(_._5 == "insert") && got.size == 8)
    // the planner's own partitions: every planned directory belongs to
    // the appending generation — the base generation is not re-read
    val conf = new org.apache.spark.util.SerializableConfiguration(hconf)
    val parts = KeyedChanges.planDiff(dir, log, hconf, conf,
      org.apache.spark.sql.types.StructType.fromDDL(ddl), "kb", 3L, 4L)
      .map(_.asInstanceOf[KeyedChangesPartition])
    assert(parts.length == 4) // kb 0..3 each gained rows
    // append edit lists legitimately carry the BASE generation name
    // (priorLive :+ appendGen) — exclude it and seq-3's edit gens to
    // isolate the appending generation
    val appendGen = log.head.edits.valuesIterator.flatten.toSet
      .diff(log.snapshots.find(_.seq == 3L).get.edits.valuesIterator.flatten.toSet)
      .diff(Set(log.head.gen))
    assert(appendGen.size == 1)
    parts.foreach { p =>
      assert(p.deleteDirs.isEmpty)
      assert(p.insertDirs.nonEmpty &&
        p.insertDirs.forall(_.contains(appendGen.head)),
        s"append partition must read only the delta dirs, got ${p.insertDirs}")
    }
  }

  test("key filters prune the diff at the planner; column pruning reaches the tagged decode") {
    val dir = lifecycle
    // kb=1 was rewritten (UPDATE), kb=2 tombstoned: a consumer
    // subscribed to kb=2 plans ONE partition
    val only2 = readChanges(dir, from = 1L, to = Some(3L))
      .where($"kb" === 2L)
    assert(only2.rdd.getNumPartitions == 1,
      "a pushed key filter must restrict the diff before planning")
    assert(only2.count() == 16)
    val scanDesc = only2.queryExecution.executedPlan.toString
    assert(scanDesc.contains("keys=[2]"), scanDesc)
    // a key filter matching an UNCHANGED key plans zero partitions
    assert(readChanges(dir, from = 1L, to = Some(3L))
      .where($"kb" === 0L).count() == 0)
    // column pruning: the scan's read schema drops unselected columns
    val pruned = readChanges(dir, from = 2L, to = Some(3L))
      .select("doc_id", "_change_type")
    assert(pruned.queryExecution.executedPlan.toString
      .contains("pruned=doc_id,_change_type"))
    assert(pruned.count() == 16)
    // net-diff partitions project AFTER diffing full rows: selecting a
    // column the UPDATE did not touch still reports the change pair
    val netPruned = readChanges(dir, from = 1L, to = Some(2L))
      .select("doc_id", "_change_type")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(netPruned == Set((5L, "delete"), (5L, "insert"),
      (21L, "delete"), (21L, "insert")))
  }

  test("CDC-apply SPJ: the changes scan reports key grouping — a co-keyed join plans zero Exchange") {
    val dir = lifecycle
    val kB = "spark.sql.sources.v2.bucketing.enabled"
    val kC = "spark.sql.requireAllClusterKeysForCoPartition"
    val oB = spark.conf.getOption(kB); val oC = spark.conf.getOption(kC)
    spark.conf.set(kB, "true"); spark.conf.set(kC, "false")
    try {
      // (0,1]: every key changed (full snapshot as inserts) — partition
      // values match the row table's 4 key directories exactly, so the
      // apply-join aligns by storage partitioning on both sides
      val chg = readChanges(dir, from = 0L, to = Some(1L)).hint("merge")
      val j = chg.join(readKeyed(dir, asOf = Some(1L)).hint("merge"),
        Seq("kb", "doc_id"))
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"a CDC-apply join must not shuffle either side:\n${p.take(2000)}")
      assert(j.count() == 64)
    } finally {
      oB.fold(spark.conf.unset(kB))(spark.conf.set(kB, _))
      oC.fold(spark.conf.unset(kC))(spark.conf.set(kC, _))
    }
  }

  test("streaming leg: commit-seq offsets deliver each delta exactly once across restarts") {
    val scratch = graft.io.TempDirs.scratch("graft_chgstream_")
    val dir = scratch + "/t"
    val out = scratch + "/out"
    val ckpt = scratch + "/ckpt"
    KeyedSource.stageKeyed(spark, df(32L), dir, "kb",
      sortBy = Seq("doc_id"), retain = 8)
    val t = registerTable("chgstream", dir, retain = 8)

    def drain(): Unit = {
      val q = spark.readStream.format("graft-keyed").option("path", dir)
        .option("schema", ddl).option("key", "kb")
        .option("metadata", "changes")
        .load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    drain() // (0, 1]: the staged table arrives whole, as inserts
    val first = spark.read.parquet(out)
    assert(first.count() == 32)
    assert(first.where($"_change_type" =!= "insert").count() == 0)

    spark.sql(s"UPDATE $t SET n_chars = 555 WHERE doc_id IN (6, 10)") // kb=2, seq 2
    drain() // (1, 2]: only that key's net delta
    val second = spark.read.parquet(out)
    assert(second.count() == 32 + 4)
    // accumulated rows for the touched doc_ids: their batch-1 inserts
    // plus the update's delete/insert pairs
    val delta = second.where($"doc_id".isin(6L, 10L))
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getString(4))).toSet
    assert(delta == Set(
      (6L, 42L, "insert"), (10L, 70L, "insert"), // initial load
      (6L, 42L, "delete"), (6L, 555L, "insert"),
      (10L, 70L, "delete"), (10L, 555L, "insert")))

    drain() // no new commits: nothing re-delivered (exactly-once)
    assert(spark.read.parquet(out).count() == 36)
  }
}
