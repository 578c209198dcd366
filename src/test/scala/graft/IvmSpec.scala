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
