package graft

import graft.operators.Ivm
import graft.sources.{GraftCatalog, KeyedCompact, KeyedSource}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** CDC-driven incremental view maintenance ([[Ivm]], r17). Pins:
  * (1) STEPWISE equivalence — after every commit class the connector
  *     can emit (append, COW update, MOR row delete via deletion
  *     vectors, tombstone delete, compaction), applying the interval's
  *     delta to the maintained rollup equals the full recompute; a
  *     compaction interval nets to zero and maintains a no-op;
  * (2) groups drain and appear: an all-delete delta drops its group
  *     from the view, an all-insert delta creates one;
  * (3) STREAMING leg — the same operator applied per micro-batch over
  *     the changes stream converges to the recompute across restarts
  *     (commit-seq offsets give exactly-once deltas). */
class IvmSpec extends SparkSpec {
  import spark.implicits._

  private val ddl = "kb BIGINT, doc_id BIGINT, n_chars BIGINT"
  private val schema = StructType.fromDDL(ddl)
  private val cat = "givm"
  spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)

  private def df(n: Long) =
    (0L until n).map(i => (i % 4L, i, (i * 7L) % 101L))
      .toDF("kb", "doc_id", "n_chars")

  private def readKeyed(dir: String): DataFrame =
    spark.read.format("graft-keyed").option("path", dir)
      .option("schema", ddl).option("key", "kb").load()

  private def changes(dir: String, from: Long, to: Long): DataFrame =
    spark.read.format("graft-keyed").option("path", dir)
      .option("schema", ddl).option("key", "kb")
      .option("metadata", "changes")
      .option("changesFrom", from.toString).option("changesTo", to.toString)
      .load()

  private def headSeq(dir: String): Long =
    KeyedSource.readCommitLog(dir, spark.sessionState.newHadoopConf()).get.head.seq

  private def asMap(d: DataFrame): Map[Long, (Long, Long)] =
    d.collect().map(r => r.getAs[Long]("kb") ->
      (r.getAs[Long]("n_rows"), r.getAs[Long]("sum_n_chars"))).toMap

  test("stepwise: every commit class maintains to the recompute; compaction nets to a no-op") {
    val dir = graft.io.TempDirs.scratch("graft_ivm_step_") + "/t"
    KeyedSource.stageKeyed(spark, df(64L), dir, "kb",
      sortBy = Seq("doc_id"), retain = 16)
    spark.sql(s"DROP TABLE IF EXISTS $cat.step")
    spark.sql(
      s"""CREATE TABLE $cat.step (kb BIGINT, doc_id BIGINT, n_chars BIGINT)
         |USING `graft-keyed` LOCATION '$dir'
         |TBLPROPERTIES('key'='kb','sortBy'='doc_id','retain'='16',
         |'dmlMode'='mor')""".stripMargin)

    var roll = Ivm.rollup(readKeyed(dir), Seq("kb"), Seq("n_chars"))
      .localCheckpoint()
    var seq = headSeq(dir)
    def step(mutate: => Unit): Unit = {
      mutate
      val now = headSeq(dir)
      roll = Ivm.maintainRollup(roll, changes(dir, seq, now),
        Seq("kb"), Seq("n_chars")).localCheckpoint()
      seq = now
      assert(asMap(roll) ==
        asMap(Ivm.rollup(readKeyed(dir), Seq("kb"), Seq("n_chars"))),
        s"incremental != recompute after commit seq $now")
    }

    // append (new group 9 appears through the %16-shifted twin rows)
    step {
      df(8L).selectExpr("(doc_id + 9) % 16 AS kb", "doc_id + 1000 AS doc_id",
        "n_chars").write.format("graft-keyed").option("schema", ddl)
        .option("key", "kb").option("sortBy", "doc_id")
        .mode("append").save(dir)
    }
    // MOR row delete (deletion vectors; update pairs net inside keys)
    step { spark.sql(s"DELETE FROM $cat.step WHERE doc_id IN (5, 21, 1002)") }
    // MOR UPDATE (delete+insert pairs through the changes table)
    step { spark.sql(s"UPDATE $cat.step SET n_chars = 777 WHERE doc_id % 8 = 2") }
    // tombstone delete drains group 3 entirely
    step { spark.sql(s"DELETE FROM $cat.step WHERE kb = 3") }
    assert(!asMap(roll).contains(3L), "a drained group must drop from the view")
    // compaction: a maintenance commit nets to zero — rollup unchanged
    val beforeCompact = asMap(roll)
    step { assert(KeyedCompact.compact(spark, dir, schema, "kb") > 0) }
    assert(asMap(roll) == beforeCompact,
      "a compaction interval must maintain as a no-op")
  }

  test("min/max maintenance: extreme-witness deletes repair from affected groups only; monotone inserts stay delta-priced") {
    val dir = graft.io.TempDirs.scratch("graft_ivm_mm_") + "/t"
    KeyedSource.stageKeyed(spark, df(64L), dir, "kb",
      sortBy = Seq("doc_id"), retain = 16)
    spark.sql(s"DROP TABLE IF EXISTS $cat.mm")
    spark.sql(
      s"""CREATE TABLE $cat.mm (kb BIGINT, doc_id BIGINT, n_chars BIGINT)
         |USING `graft-keyed` LOCATION '$dir'
         |TBLPROPERTIES('key'='kb','sortBy'='doc_id','retain'='16',
         |'dmlMode'='mor')""".stripMargin)

    def fullMap(d: DataFrame): Map[Long, (Long, Long, Long, Long)] =
      d.collect().map(r => r.getAs[Long]("kb") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("sum_n_chars"),
          r.getAs[Long]("min_n_chars"), r.getAs[Long]("max_n_chars"))).toMap

    var roll = Ivm.rollupFull(readKeyed(dir), Seq("kb"), Seq("n_chars"),
      Seq("n_chars")).localCheckpoint()
    var seq = headSeq(dir)
    def asOfRead(s: Long): DataFrame =
      spark.read.format("graft-keyed").option("path", dir)
        .option("schema", ddl).option("key", "kb")
        .option("asOf", s.toString).load()
    def step(mutate: => Unit): Unit = {
      mutate
      val now = headSeq(dir)
      roll = Ivm.maintainRollupFull(roll, changes(dir, seq, now),
        asOfRead(now), Seq("kb"), Seq("n_chars"), Seq("n_chars"))
        .localCheckpoint()
      seq = now
      assert(fullMap(roll) == fullMap(Ivm.rollupFull(readKeyed(dir),
        Seq("kb"), Seq("n_chars"), Seq("n_chars"))),
        s"incremental != recompute after commit seq $now")
    }

    // monotone inserts: new maxima via UPDATE (+500 rides the insert
    // half of the delete+insert pair; the delete half hits OLD values
    // that were not extremes)
    step { spark.sql(s"UPDATE $cat.mm SET n_chars = n_chars + 500 " +
      "WHERE doc_id % 16 = 6") }
    // extreme-witness deletes: rows AT the current per-group maxima
    // (n_chars >= 500 is exactly the updated set) force the bounded
    // repair re-aggregation
    step { spark.sql(s"DELETE FROM $cat.mm WHERE n_chars >= 500") }
    // min-witness deletes: drop each group's smallest values
    step { spark.sql(s"DELETE FROM $cat.mm WHERE n_chars <= 5") }
    // append new minima + a brand-new group
    step {
      Seq((0L, 2000L, 1L), (1L, 2001L, 1L), (9L, 2002L, 42L))
        .toDF("kb", "doc_id", "n_chars")
        .write.format("graft-keyed").option("schema", ddl)
        .option("key", "kb").option("sortBy", "doc_id")
        .mode("append").save(dir)
    }
    assert(fullMap(roll)(0L)._3 == 1L, "appended minimum must surface")
    assert(fullMap(roll).contains(9L), "a brand-new group must appear")
    // compaction nets to a no-op for extremes too
    val before = fullMap(roll)
    step { assert(KeyedCompact.compact(spark, dir, schema, "kb") > 0) }
    assert(fullMap(roll) == before)
    // drain a group: it must drop entirely
    step { spark.sql(s"DELETE FROM $cat.mm WHERE kb = 2") }
    assert(!fullMap(roll).contains(2L))
  }

  test("join view: signed delta-join maintains rollup(fact JOIN dim) across changes on BOTH sides") {
    val base = graft.io.TempDirs.scratch("graft_ivm_join_")
    val fDir = s"$base/fact"
    val dDir = s"$base/dim"
    KeyedSource.stageKeyed(spark, df(64L), fDir, "kb",
      sortBy = Seq("doc_id"), retain = 16)
    KeyedSource.stageKeyed(spark,
      (0L until 4L).map(k => (k, if (k % 2 == 0) "even" else "odd"))
        .toDF("kb", "label"),
      dDir, "kb", retain = 16)
    val dimDdl = "kb BIGINT, label STRING"
    spark.sql(s"DROP TABLE IF EXISTS $cat.jf")
    spark.sql(s"CREATE TABLE $cat.jf (kb BIGINT, doc_id BIGINT, n_chars BIGINT) " +
      s"USING `graft-keyed` LOCATION '$fDir' " +
      "TBLPROPERTIES('key'='kb','sortBy'='doc_id','retain'='16','dmlMode'='mor')")
    spark.sql(s"DROP TABLE IF EXISTS $cat.jd")
    spark.sql(s"CREATE TABLE $cat.jd (kb BIGINT, label STRING) " +
      s"USING `graft-keyed` LOCATION '$dDir' " +
      "TBLPROPERTIES('key'='kb','retain'='16')")

    def readF(asOf: Option[Long] = None): DataFrame = {
      val r = spark.read.format("graft-keyed").option("path", fDir)
        .option("schema", ddl).option("key", "kb")
      asOf.fold(r)(v => r.option("asOf", v.toString)).load()
    }
    def readD(asOf: Option[Long] = None): DataFrame = {
      val r = spark.read.format("graft-keyed").option("path", dDir)
        .option("schema", dimDdl).option("key", "kb")
      asOf.fold(r)(v => r.option("asOf", v.toString)).load()
    }
    def dimChanges(from: Long, to: Long): DataFrame =
      spark.read.format("graft-keyed").option("path", dDir)
        .option("schema", dimDdl).option("key", "kb")
        .option("metadata", "changes")
        .option("changesFrom", from.toString).option("changesTo", to.toString)
        .load()
    def dimHead: Long =
      KeyedSource.readCommitLog(dDir, spark.sessionState.newHadoopConf()).get.head.seq

    val group = Seq("label")
    def viewMap(d: DataFrame): Map[String, (Long, Long)] =
      d.collect().map(r => r.getAs[String]("label") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("sum_n_chars"))).toMap

    var view = Ivm.rollup(readF().join(readD(), "kb"), group, Seq("n_chars"))
      .localCheckpoint()
    val (f0, d0) = (headSeq(fDir), dimHead)

    // BOTH sides move: fact takes an update + a delete + an append on a
    // key the dim doesn't know (dropped by the inner join on both
    // paths); dim relabels one key (COW delete+insert pair)
    spark.sql(s"UPDATE $cat.jf SET n_chars = 900 WHERE doc_id % 8 = 4")
    spark.sql(s"DELETE FROM $cat.jf WHERE doc_id IN (7, 15)")
    Seq((11L, 3000L, 50L)).toDF("kb", "doc_id", "n_chars")
      .write.format("graft-keyed").option("schema", ddl)
      .option("key", "kb").option("sortBy", "doc_id")
      .mode("append").save(fDir)
    spark.sql(s"UPDATE $cat.jd SET label = 'prime' WHERE kb = 3")
    val (f1, d1) = (headSeq(fDir), dimHead)

    // ONE delta-join application over the whole interval
    val delta = Ivm.joinDelta(
      changes(fDir, f0, f1), readD(asOf = Some(d0)),
      readF(asOf = Some(f1)), dimChanges(d0, d1), Seq("kb"))
    view = Ivm.maintainRollup(view, delta, group, Seq("n_chars"))
    val expect = Ivm.rollup(readF().join(readD(), "kb"), group, Seq("n_chars"))
    assert(viewMap(view) == viewMap(expect),
      s"delta-join view ${viewMap(view)} != recompute ${viewMap(expect)}")
    assert(viewMap(view).contains("prime"), "the relabeled group must appear")
  }

  test("delta-join composes with extremes: rollupFull(fact JOIN dim) maintained incl. min/max") {
    val base = graft.io.TempDirs.scratch("graft_ivm_jmm_")
    val fDir = s"$base/fact"
    val dDir = s"$base/dim"
    KeyedSource.stageKeyed(spark, df(64L), fDir, "kb",
      sortBy = Seq("doc_id"), retain = 16)
    KeyedSource.stageKeyed(spark,
      (0L until 4L).map(k => (k, if (k < 2) "lo" else "hi")).toDF("kb", "label"),
      dDir, "kb", retain = 16)
    val dimDdl = "kb BIGINT, label STRING"
    spark.sql(s"DROP TABLE IF EXISTS $cat.jmf")
    spark.sql(s"CREATE TABLE $cat.jmf (kb BIGINT, doc_id BIGINT, n_chars BIGINT) " +
      s"USING `graft-keyed` LOCATION '$fDir' " +
      "TBLPROPERTIES('key'='kb','sortBy'='doc_id','retain'='16','dmlMode'='mor')")

    def readF(asOf: Option[Long] = None): DataFrame = {
      val r = spark.read.format("graft-keyed").option("path", fDir)
        .option("schema", ddl).option("key", "kb")
      asOf.fold(r)(v => r.option("asOf", v.toString)).load()
    }
    def readD: DataFrame = spark.read.format("graft-keyed").option("path", dDir)
      .option("schema", dimDdl).option("key", "kb").load()
    val group = Seq("label")
    def joined(f: DataFrame) = f.join(readD, "kb")
    def fullMap(d: DataFrame): Map[String, (Long, Long, Long, Long)] =
      d.collect().map(r => r.getAs[String]("label") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("sum_n_chars"),
          r.getAs[Long]("min_n_chars"), r.getAs[Long]("max_n_chars"))).toMap

    var view = Ivm.rollupFull(joined(readF()), group, Seq("n_chars"),
      Seq("n_chars")).localCheckpoint()
    val f0 = headSeq(fDir)

    // push new maxima up, then DELETE exactly those extreme witnesses —
    // the repair leg must re-aggregate through the JOINED current state
    spark.sql(s"UPDATE $cat.jmf SET n_chars = n_chars + 900 WHERE doc_id % 16 = 3")
    spark.sql(s"DELETE FROM $cat.jmf WHERE n_chars >= 900")
    val f1 = headSeq(fDir)

    val delta = Ivm.joinDelta(changes(fDir, f0, f1), readD,
      readF(asOf = Some(f1)), readD.limit(0).withColumn("_change_type",
        org.apache.spark.sql.functions.lit("insert")), Seq("kb"))
    view = Ivm.maintainRollupFull(view, delta, joined(readF(asOf = Some(f1))),
      group, Seq("n_chars"), Seq("n_chars"))
    val expect = Ivm.rollupFull(joined(readF()), group, Seq("n_chars"),
      Seq("n_chars"))
    assert(fullMap(view) == fullMap(expect),
      s"${fullMap(view)} != ${fullMap(expect)}")
  }

  test("streaming leg: per-micro-batch maintenance converges to the recompute across restarts") {
    val scratch = graft.io.TempDirs.scratch("graft_ivm_stream_")
    val dir = s"$scratch/t"; val ckpt = s"$scratch/ckpt"
    KeyedSource.stageKeyed(spark, df(32L), dir, "kb",
      sortBy = Seq("doc_id"), retain = 16)
    spark.sql(s"DROP TABLE IF EXISTS $cat.stream")
    spark.sql(
      s"""CREATE TABLE $cat.stream (kb BIGINT, doc_id BIGINT, n_chars BIGINT)
         |USING `graft-keyed` LOCATION '$dir'
         |TBLPROPERTIES('key'='kb','sortBy'='doc_id','retain'='16')""".stripMargin)

    // the maintained view starts EMPTY: the first drained interval
    // (0, 1] delivers the staged table as inserts and bootstraps it
    var roll = Ivm.rollup(readKeyed(dir).where($"kb" < 0L),
      Seq("kb"), Seq("n_chars")).localCheckpoint()
    def drain(): Unit = {
      val q = spark.readStream.format("graft-keyed").option("path", dir)
        .option("schema", ddl).option("key", "kb")
        .option("metadata", "changes").load()
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          roll = Ivm.maintainRollup(roll, batch, Seq("kb"), Seq("n_chars"))
            .localCheckpoint()
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def recomputed = asMap(Ivm.rollup(readKeyed(dir), Seq("kb"), Seq("n_chars")))

    drain()
    assert(asMap(roll) == recomputed)

    spark.sql(s"UPDATE $cat.stream SET n_chars = 555 WHERE doc_id IN (6, 10)")
    df(4L).selectExpr("kb", "doc_id + 500 AS doc_id", "n_chars")
      .write.format("graft-keyed").option("schema", ddl).option("key", "kb")
      .option("sortBy", "doc_id").mode("append").save(dir)
    drain() // restart from the checkpoint: only the two new intervals
    assert(asMap(roll) == recomputed)

    drain() // nothing new: exactly-once offsets leave the view untouched
    assert(asMap(roll) == recomputed)
  }
}
