package graft

import graft.sources.{GraftCatalog, KeyedSource}
import org.apache.spark.sql.DataFrame

/** Named snapshot tags (r16 — Iceberg tag semantics). Pins: (1) a
  * tagged snapshot SURVIVES the retention trim of later commits on
  * every commit path and stays readable via the tag, an explicit seq,
  * and catalog `VERSION AS OF '<tag>'`; (2) tag reads are byte-equal
  * to seq reads; (3) duplicate tags refuse (never silently move),
  * unknown tags refuse loudly with the tag list, tagging an
  * unretained seq refuses; (4) dropTag releases protection — the NEXT
  * commit's trim expires the snapshot, dropTag itself deletes
  * nothing; (5) writes/DML refuse through a tag pin. */
class KeyedTagsSpec extends SparkSpec {
  import spark.implicits._

  private val ddl = "kb BIGINT, doc_id BIGINT, n_chars BIGINT"
  private val cat = "gtags"
  spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)

  private def df(n: Long, chars: Long) =
    (0L until n).map(i => (i % 4L, i, chars)).toDF("kb", "doc_id", "n_chars")

  private def readKeyed(dir: String, asOf: Option[Long] = None,
      tag: Option[String] = None): DataFrame = {
    val r = spark.read.format("graft-keyed").option("path", dir)
      .option("schema", ddl).option("key", "kb")
    val r2 = asOf.fold(r)(v => r.option("asOf", v.toString))
    tag.fold(r2)(t => r2.option("tag", t)).load()
  }

  test("a tagged snapshot survives retention trims and reads identically via tag, seq, and catalog") {
    val dir = graft.io.TempDirs.scratch("graft_tags_") + "/t"
    KeyedSource.stageKeyed(spark, df(32L, 10L), dir, "kb", retain = 1)
    val pinned = KeyedSource.tagSnapshot(spark, dir, "run-a")
    assert(pinned == 1L)
    val v1 = readKeyed(dir).collect().map(_.toSeq).toSet
    // retain=1 would expire seq 1 on the next commit — the tag protects it
    KeyedSource.stageKeyed(spark, df(16L, 20L), dir, "kb", retain = 1)
    KeyedSource.stageKeyed(spark, df(8L, 30L), dir, "kb", retain = 1)
    val hconf = spark.sessionState.newHadoopConf()
    val log = KeyedSource.readCommitLog(dir, hconf).get
    // the tag commit burned a head-dup seq 2; overwrites are 3 and 4 —
    // retain=1 keeps only the head plus the TAGGED seq 1
    assert(log.snapshots.map(_.seq) == Seq(1L, 4L),
      s"tagged seq 1 must survive, untagged dups/overwrites must expire: ${log.snapshots.map(_.seq)}")
    assert(log.tags == Map("run-a" -> 1L))
    // all three read doors agree with the pre-overwrite collect
    assert(readKeyed(dir, tag = Some("run-a")).collect().map(_.toSeq).toSet == v1)
    assert(readKeyed(dir, asOf = Some(1L)).collect().map(_.toSeq).toSet == v1)
    spark.sql(s"DROP TABLE IF EXISTS $cat.tagt")
    spark.sql(s"CREATE TABLE $cat.tagt (kb BIGINT, doc_id BIGINT, n_chars BIGINT) " +
      s"USING `graft-keyed` LOCATION '$dir' TBLPROPERTIES('key'='kb')")
    assert(spark.sql(s"SELECT * FROM $cat.tagt VERSION AS OF 'run-a'")
      .collect().map(_.toSeq).toSet == v1)
    assert(spark.sql(s"SELECT count(*) FROM $cat.tagt").collect().head.getLong(0) == 8L)
  }

  test("duplicate/unknown/unretained tags refuse; dropTag releases protection at the NEXT commit") {
    val dir = graft.io.TempDirs.scratch("graft_tags2_") + "/t"
    KeyedSource.stageKeyed(spark, df(16L, 10L), dir, "kb", retain = 1)
    KeyedSource.tagSnapshot(spark, dir, "pin")
    val dup = intercept[IllegalArgumentException] {
      KeyedSource.tagSnapshot(spark, dir, "pin")
    }
    assert(dup.getMessage.contains("already names snapshot 1"), dup.getMessage)
    // all-digit names refuse: numeric-first bound resolution would
    // silently read them as a snapshot seq, never as the tag
    val num = intercept[IllegalArgumentException] {
      KeyedSource.tagSnapshot(spark, dir, "2024")
    }
    assert(num.getMessage.contains("non-digit"), num.getMessage)
    val unret = intercept[IllegalArgumentException] {
      KeyedSource.tagSnapshot(spark, dir, "ghost", seq = Some(99L))
    }
    assert(unret.getMessage.contains("not retained"), unret.getMessage)
    val unk = intercept[IllegalArgumentException] {
      readKeyed(dir, tag = Some("nope")).collect()
    }
    assert(unk.getMessage.contains("'nope'") && unk.getMessage.contains("pin"),
      unk.getMessage)
    intercept[IllegalArgumentException] {
      KeyedSource.dropTag(spark, dir, "nope")
    }

    KeyedSource.stageKeyed(spark, df(8L, 20L), dir, "kb", retain = 1) // seq 3 (tag burned 2); 1 stays (tag)
    val hconf = spark.sessionState.newHadoopConf()
    assert(KeyedSource.readCommitLog(dir, hconf).get.snapshots.map(_.seq) == Seq(1L, 3L))
    // dropTag alone deletes nothing — seq 1 remains readable…
    KeyedSource.dropTag(spark, dir, "pin")
    assert(readKeyed(dir, asOf = Some(1L)).count() == 16L)
    // …until the NEXT commit's trim expires it
    KeyedSource.stageKeyed(spark, df(4L, 30L), dir, "kb", retain = 1) // seq 5 (drop burned 4)
    val after = KeyedSource.readCommitLog(dir, hconf).get
    assert(after.snapshots.map(_.seq) == Seq(5L))
    intercept[IllegalArgumentException] {
      readKeyed(dir, asOf = Some(1L)).collect()
    }
  }

  test("writes and DML refuse through a tag pin; tag protection holds across DML/compaction commits") {
    val dir = graft.io.TempDirs.scratch("graft_tags3_") + "/t"
    KeyedSource.stageKeyed(spark, df(32L, 10L), dir, "kb",
      sortBy = Seq("doc_id"), retain = 1)
    KeyedSource.tagSnapshot(spark, dir, "base")
    val e = intercept[Exception] {
      df(8L, 1L).write.format("graft-keyed")
        .option("schema", ddl).option("key", "kb").option("tag", "base")
        .mode("overwrite").save(dir)
    }
    assert(e.getMessage.contains("snapshot pin"), e.getMessage)
    // an append + a compaction later, the tagged snapshot still reads
    df(4L, 50L).selectExpr("kb", "doc_id + 100 AS doc_id", "n_chars")
      .write.format("graft-keyed").option("schema", ddl).option("key", "kb")
      .option("sortBy", "doc_id").mode("append").save(dir) // seq 3 (tag burned 2)
    graft.sources.KeyedCompact.compact(spark, dir,
      org.apache.spark.sql.types.StructType.fromDDL(ddl), "kb") // seq 4
    val hconf = spark.sessionState.newHadoopConf()
    val log = KeyedSource.readCommitLog(dir, hconf).get
    assert(log.snapshots.map(_.seq).contains(1L))
    assert(readKeyed(dir, tag = Some("base")).count() == 32L)
    assert(readKeyed(dir).count() == 36L)
    // CDC anchors at the named state: changesFrom='base' ≡ changesFrom=1
    val chg = spark.read.format("graft-keyed").option("path", dir)
      .option("schema", ddl).option("key", "kb")
      .option("metadata", "changes").option("changesFrom", "base").load()
    assert(chg.count() == 4L)
    assert(chg.where($"_change_type" =!= "insert").count() == 0L)
    val unk = intercept[IllegalArgumentException] {
      spark.read.format("graft-keyed").option("path", dir)
        .option("schema", ddl).option("key", "kb")
        .option("metadata", "changes").option("changesFrom", "ghost")
        .load().count()
    }
    assert(unk.getMessage.contains("'ghost'"), unk.getMessage)
  }
}
