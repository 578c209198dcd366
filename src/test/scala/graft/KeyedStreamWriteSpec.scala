package graft

import graft.sources.KeyedSource
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.lit

/** Streaming write INTO `graft-keyed` (r17 — the reference's Snowpipe
  * auto-ingest landing in the TRANSACTIONAL table,
  * `/root/reference/README.md:43-44`). Pins:
  * (1) a streaming append bootstraps the snapshot log on an empty
  *     path and commits ONE snapshot per epoch through the CAS, with
  *     the per-query epoch marker (`CommitLog.streams`) advancing;
  * (2) EXACTLY-ONCE across the replay window: killing the checkpoint
  *     confirm after the sink committed makes Spark re-run the epoch
  *     on restart — the replayed commit is a visible no-op (same
  *     rows, same head seq, own staging cleaned);
  * (3) epochs into a batch-staged table are EDIT APPENDS — base bytes
  *     untouched, batch and stream commits interleave through one log;
  * (4) each epoch is a CDC interval: the changes table prices it at
  *     exactly the appended rows, tagged insert. */
class KeyedStreamWriteSpec extends SparkSpec {
  import spark.implicits._

  private val ddl = "kb BIGINT, doc_id BIGINT, source STRING, n_chars BIGINT"

  private def tmp(name: String): String = graft.io.TempDirs.scratch(s"graft-$name")
  private def hconf = spark.sessionState.newHadoopConf()

  private def readKeyed(dir: String, asOf: Option[Long] = None): DataFrame = {
    val r = spark.read.format("graft-keyed").option("path", dir)
      .option("schema", ddl).option("key", "kb")
    asOf.fold(r)(v => r.option("asOf", v.toString)).load()
  }

  private def startStream(mem: MemoryStream[(Long, Long, String, Long)],
      dir: String, ckpt: String) =
    mem.toDF().toDF("kb", "doc_id", "source", "n_chars")
      .writeStream.format("graft-keyed")
      .option("path", dir).option("schema", ddl)
      .option("key", "kb").option("sortBy", "doc_id").option("retain", "8")
      .option("checkpointLocation", ckpt)
      .start()

  test("epoch-committed streaming append: bootstrap, per-epoch snapshots, exactly-once replay") {
    val base = tmp("kstream"); val dir = s"$base/t"; val ckpt = s"$base/ckpt"
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Long)]

    val q = startStream(mem, dir, ckpt)
    mem.addData((0L, 1L, "a", 10L), (1L, 2L, "b", 20L))
    q.processAllAvailable()
    val log1 = KeyedSource.readCommitLog(dir, hconf).get
    assert(log1.head.seq == 1L, "first epoch bootstraps the snapshot log")
    assert(log1.streams.size == 1 && log1.streams.values.head == 0L,
      s"epoch marker must record epoch 0, got ${log1.streams}")
    assert(readKeyed(dir).count() == 2L)

    mem.addData((0L, 3L, "c", 30L))
    q.processAllAvailable()
    val log2 = KeyedSource.readCommitLog(dir, hconf).get
    assert(log2.head.seq == 2L, "one snapshot per epoch")
    assert(log2.streams.values.head == 1L)
    assert(readKeyed(dir).count() == 3L)
    q.stop()

    // REPLAY WINDOW: the sink committed epoch 1, but the checkpoint
    // confirm is lost (crash between sink commit and commit-log write)
    // — on restart Spark re-runs epoch 1 against the sink
    val commits = new java.io.File(s"$ckpt/commits")
    val last = commits.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    assert(last.delete(), s"test setup: could not delete ${last.getPath}")
    // the local FS keeps a CRC shadow; a stale one fails the restart's
    // own commit rename
    new java.io.File(commits, s".${last.getName}.crc").delete()

    val q2 = startStream(mem, dir, ckpt)
    q2.processAllAvailable() // replays epoch 1
    val log3 = KeyedSource.readCommitLog(dir, hconf).get
    assert(readKeyed(dir).count() == 3L,
      "a replayed epoch must commit exactly once — rows doubled")
    assert(log3.head.seq == 2L, "a replayed epoch must not burn a snapshot")
    // no orphaned staging from the dropped replay copy
    assert(!new java.io.File(dir).listFiles().map(_.getName)
      .exists(n => n.startsWith("_gen-") && n.endsWith("-e1") &&
        !log3.snapshots.flatMap(_.referencedGens).contains(n)))

    // the stream continues past the replay
    mem.addData((2L, 4L, "d", 40L))
    q2.processAllAvailable()
    assert(readKeyed(dir).count() == 4L)
    assert(KeyedSource.readCommitLog(dir, hconf).get.streams.values.head == 2L)
    q2.stop()

    assert(readKeyed(dir).collect().map(_.getLong(1)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
  }

  test("streaming MOR upsert loop: per-batch MERGE converges; a replayed batch is content-idempotent") {
    import graft.streaming.EventStream
    val base = tmp("kupsert"); val src = s"$base/src"; val ckpt = s"$base/ckpt"
    val tbl = s"$base/t"; val ddl3 = "kb BIGINT, doc_id BIGINT, n_chars BIGINT"
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    KeyedSource.stageKeyed(spark,
      docs.selectExpr("doc_id % 16 AS kb", "doc_id", "n_chars"),
      tbl, "kb", sortBy = Seq("doc_id"), retain = 8)
    spark.sql(s"DROP TABLE IF EXISTS gkup.t")
    spark.conf.set("spark.sql.catalog.gkup",
      classOf[graft.sources.GraftCatalog].getName)
    spark.sql(
      s"""CREATE TABLE gkup.t (kb BIGINT, doc_id BIGINT, n_chars BIGINT)
         |USING `graft-keyed` LOCATION '$tbl'
         |TBLPROPERTIES('key'='kb','sortBy'='doc_id','retain'='8',
         |'dmlMode'='mor')""".stripMargin)
    def readTable = spark.read.format("graft-keyed").option("path", tbl)
      .option("schema", ddl3).option("key", "kb").load()
    def asMap = readTable.collect()
      .map(r => r.getLong(1) -> (r.getLong(0), r.getLong(2))).toMap

    // batch A: updated versions of every 7th doc + brand-new docs
    docs.where($"doc_id" % 7 === 0)
      .withColumn("n_chars", $"n_chars" + 1000L)
      .unionByName(docs.where($"doc_id" % 50 === 0)
        .withColumn("doc_id", $"doc_id" + 7000000L)
        .withColumn("n_chars", lit(44L)))
      .write.mode("overwrite").parquet(s"$src/a")
    // the file source watches src/a (new files land as new batches)
    EventStream.keyedUpsertIngest(spark, s"$src/a", ckpt, "gkup.t")
      .awaitTermination()
    val expectA = docs.selectExpr("doc_id % 16 AS kb", "doc_id",
      "CASE WHEN doc_id % 7 = 0 THEN n_chars + 1000 ELSE n_chars END AS n_chars")
      .unionByName(docs.where($"doc_id" % 50 === 0)
        .selectExpr("(doc_id + 7000000) % 16 AS kb",
          "doc_id + 7000000 AS doc_id", "CAST(44 AS BIGINT) AS n_chars"))
      .collect().map(r => r.getLong(1) -> (r.getLong(0), r.getLong(2))).toMap
    assert(asMap == expectA)

    // batch B: a second wave touching some of batch A's inserts
    docs.where($"doc_id" % 50 === 0)
      .withColumn("doc_id", $"doc_id" + 7000000L)
      .withColumn("n_chars", lit(99L))
      .coalesce(1).write.mode("overwrite").parquet(s"$base/stage_b")
    val part = Files.list(Paths.get(s"$base/stage_b"))
    val f = try part.toArray.map(_.toString).find(_.endsWith(".parquet")).get
    finally part.close()
    Files.copy(Paths.get(f), Paths.get(s"$src/a/wave_b.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    EventStream.keyedUpsertIngest(spark, s"$src/a", ckpt, "gkup.t")
      .awaitTermination()
    val expectB = expectA.map { case (id, (kb, n)) =>
      id -> (kb, if (id >= 7000000L) 99L else n) }
    assert(asMap == expectB)

    // REPLAY: lose the checkpoint confirm of the last batch — the
    // re-run MERGEs the same wave again; content must not change
    // (idempotent upsert), only a snapshot is burned
    val commits = new java.io.File(s"$ckpt/commits")
    val last = commits.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    assert(last.delete())
    new java.io.File(commits, s".${last.getName}.crc").delete()
    EventStream.keyedUpsertIngest(spark, s"$src/a", ckpt, "gkup.t")
      .awaitTermination()
    assert(asMap == expectB, "a replayed upsert batch must be content-idempotent")
  }

  test("streaming write enforces the clustered distribution: scattered source partitions, one file per key") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Long)]
    val base = tmp("kstream-dist")
    val q = mem.toDF().toDF("kb", "doc_id", "source", "n_chars")
      .repartition(8) // scatter same-key rows across source partitions
      .writeStream.format("graft-keyed")
      .option("path", s"$base/t").option("schema", ddl)
      .option("key", "kb").option("sortBy", "doc_id").option("retain", "2")
      .option("checkpointLocation", s"$base/ckpt").start()
    mem.addData((0L until 64L).map(i => (i % 2L, i, "s", i)): _*)
    q.processAllAvailable()
    q.stop()
    // Spark applied RequiresDistributionAndOrdering to the micro-batch
    // (otherwise the audited writer fails the one-task-per-key
    // contract loudly): all rows landed, ONE file per key, sorted
    assert(readKeyed(s"$base/t").count() == 64L)
    val gen = KeyedSource.committedRoot(spark, s"$base/t")
    val files = new java.io.File(new java.net.URI(
      if (gen.startsWith("file:")) gen else "file://" + gen).getPath)
      .listFiles().filter(_.getName.startsWith("k="))
      .map(d => d.getName -> d.listFiles().count(f =>
        f.isFile && !f.getName.startsWith("."))).toMap
    assert(files == Map("k=0" -> 1, "k=1" -> 1), files.toString)
  }

  test("two independent streaming queries share one table: per-query epoch markers, no cross-dedup") {
    val base = tmp("kstream4"); val dir = s"$base/t"
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val memA = MemoryStream[(Long, Long, String, Long)]
    val memB = MemoryStream[(Long, Long, String, Long)]
    val qA = startStream(memA, dir, s"$base/ckptA")
    memA.addData((0L, 1L, "a", 1L))
    qA.processAllAvailable()
    val qB = startStream(memB, dir, s"$base/ckptB")
    memB.addData((1L, 2L, "b", 2L))
    qB.processAllAvailable()
    // B's epoch 0 committed AFTER A's epoch 0 — the markers are
    // per-query, so B must not be deduplicated against A's epoch id
    assert(readKeyed(dir).count() == 2L)
    val log = KeyedSource.readCommitLog(dir, hconf).get
    assert(log.streams.size == 2, s"one marker per query, got ${log.streams}")
    assert(log.streams.values.forall(_ == 0L))
    // interleave two more epochs
    memA.addData((2L, 3L, "c", 3L)); qA.processAllAvailable()
    memB.addData((3L, 4L, "d", 4L)); qB.processAllAvailable()
    qA.stop(); qB.stop()
    assert(readKeyed(dir).count() == 4L)
    assert(KeyedSource.readCommitLog(dir, hconf).get
      .streams.values.forall(_ == 1L))
  }

  test("streaming into a BRANCH: epochs invisible to main until fastForward publishes the stream") {
    val base = tmp("kstream3"); val dir = s"$base/t"; val ckpt = s"$base/ckpt"
    KeyedSource.stageKeyed(spark,
      (0L until 8L).map(i => (i % 4L, i, s"s$i", i)).toDF(
        "kb", "doc_id", "source", "n_chars"),
      dir, "kb", sortBy = Seq("doc_id"), retain = 8)
    KeyedSource.createBranch(spark, dir, "ingest")

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Long)]
    val q = mem.toDF().toDF("kb", "doc_id", "source", "n_chars")
      .writeStream.format("graft-keyed")
      .option("path", dir).option("schema", ddl)
      .option("key", "kb").option("sortBy", "doc_id").option("retain", "8")
      .option("branch", "ingest")
      .option("checkpointLocation", ckpt)
      .start()
    mem.addData((0L, 100L, "a", 1L), (1L, 101L, "b", 2L))
    q.processAllAvailable()
    mem.addData((2L, 102L, "c", 3L))
    q.processAllAvailable()
    q.stop()

    // main never saw a byte of the stream; the branch has it all
    assert(readKeyed(dir).count() == 8L)
    assert(spark.read.format("graft-keyed").option("path", dir)
      .option("schema", ddl).option("key", "kb").option("branch", "ingest")
      .load().count() == 11L)
    // publish: one metadata commit makes the streamed state main's
    KeyedSource.fastForward(spark, dir, "ingest")
    assert(readKeyed(dir).count() == 11L)
    assert(readKeyed(dir).where($"doc_id" >= 100L).count() == 3L)
  }

  test("streaming epochs into a batch-staged table: edit appends, base bytes untouched, CDC prices each epoch") {
    val base = tmp("kstream2"); val dir = s"$base/t"; val ckpt = s"$base/ckpt"
    val df = (0L until 16L).map(i => (i % 4L, i, s"s${i % 3L}", i * 7L))
      .toDF("kb", "doc_id", "source", "n_chars")
    KeyedSource.stageKeyed(spark, df, dir, "kb", sortBy = Seq("doc_id"), retain = 8)
    val baseFiles = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("_gen-"))
      .flatMap(_.listFiles().filter(_.isDirectory))
      .flatMap(_.listFiles().filter(f => f.isFile && !f.getName.startsWith(".")))
      .map(f => f.getPath -> f.length).toMap

    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Long)]
    val q = startStream(mem, dir, ckpt)
    mem.addData((1L, 100L, "sX", 1L), (2L, 101L, "sY", 2L))
    q.processAllAvailable()
    val preSeq = KeyedSource.readCommitLog(dir, hconf).get.head.seq
    mem.addData((1L, 102L, "sZ", 3L))
    q.processAllAvailable()
    q.stop()

    val log = KeyedSource.readCommitLog(dir, hconf).get
    assert(log.head.seq == 3L) // stage + 2 epochs
    // appends, not rewrites: every pre-existing byte untouched
    baseFiles.foreach { case (p, len) =>
      val f = new java.io.File(p)
      assert(f.exists() && f.length == len, s"base file $p changed")
    }
    assert(log.head.edits.keySet == Set("1", "2"))
    assert(readKeyed(dir).count() == 19L)

    // CDC: the second epoch's interval is exactly its one appended row
    val delta = spark.read.format("graft-keyed")
      .option("path", dir).option("schema", ddl).option("key", "kb")
      .option("metadata", "changes")
      .option("changesFrom", preSeq.toString)
      .option("changesTo", log.head.seq.toString)
      .load()
    val rows = delta.collect()
    assert(rows.length == 1 && rows.head.getAs[String]("_change_type") == "insert")
    assert(rows.head.getAs[Long]("doc_id") == 102L)
  }
}
