package graft

import graft.sources.{GraftCatalog, KeyedSource}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema evolution on `graft-keyed` layouts (r16 — the r15 verdict's
  * #4): add-column-with-default and column rename recorded as
  * append-only lineage ops in the commit log (one CAS commit each),
  * resolved at read time against each generation's WRITTEN schema
  * (sidecar tag) — old generations stay readable under the evolved
  * declared schema without restaging a byte. Pins: (1) stage → evolve
  * → read head AND asOf the pre-evolution snapshot, both correct (the
  * acid test); (2) post-evolution writes mix with pre-evolution
  * generations (copy-on-write across the change); (3) type
  * drift/narrowing refuses loudly; (4) the SQL door (ALTER TABLE ADD
  * COLUMN DEFAULT / RENAME COLUMN through GraftCatalog); (5) lineage
  * hygiene — a new name may not shadow a historical alias. */
class KeyedEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private val cat = "gevolve"
  spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)

  private def df(n: Long) =
    (0L until n).map(i => (i % 4L, i, (i * 7L) % 101L))
      .toDF("kb", "doc_id", "n_chars")

  private def read(dir: String, ddl: String, asOf: Option[Long] = None) = {
    val r = spark.read.format("graft-keyed").option("path", dir)
      .option("schema", ddl).option("key", "kb")
    asOf.fold(r)(v => r.option("asOf", v.toString)).load()
  }

  test("add + rename: old generations read under the evolved schema; time travel crosses the change") {
    val dir = graft.io.TempDirs.scratch("graft_evo_") + "/t"
    KeyedSource.stageKeyed(spark, df(32L), dir, "kb",
      sortBy = Seq("doc_id"), retain = 3)
    val evolved = KeyedSource.evolveKeyed(spark, dir,
      StructType.fromDDL("kb BIGINT, doc_id BIGINT, n_chars BIGINT"),
      Seq(KeyedSource.AddCol("grade", isLong = false, "u"),
        KeyedSource.RenCol("n_chars", "chars")))
    assert(evolved.fields.map(f => (f.name, f.dataType.sql)).toSeq == Seq(
      ("kb", "BIGINT"), ("doc_id", "BIGINT"), ("chars", "BIGINT"),
      ("grade", "STRING")))
    val ddl = "kb BIGINT, doc_id BIGINT, chars BIGINT, grade STRING"
    // head: the PRE-EVOLUTION generation decodes through the lineage —
    // chars serves the stored n_chars field, grade fills the default
    val head = read(dir, ddl).orderBy("doc_id").collect()
    val expect = df(32L).withColumn("grade", lit("u"))
      .toDF("kb", "doc_id", "chars", "grade").orderBy("doc_id").collect()
    assert(head.sameElements(expect))
    // the acid test: time travel to the PRE-evolution snapshot (seq 1)
    // under the evolved declared schema
    assert(read(dir, ddl, asOf = Some(1L)).orderBy("doc_id").collect()
      .sameElements(expect))
    // column pruning across the mapping: a projection without the
    // renamed column, and one that is ONLY the added default
    assert(read(dir, ddl).select("doc_id", "grade").where("doc_id = 7")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((7L, "u")))
    assert(read(dir, ddl).agg(sum("chars")).head.getLong(0) ==
      df(32L).agg(sum("n_chars")).head.getLong(0))
  }

  test("post-evolution writes mix with pre-evolution generations (COW across the change)") {
    val dir = graft.io.TempDirs.scratch("graft_evo_mix_") + "/t"
    KeyedSource.stageKeyed(spark, df(32L), dir, "kb",
      sortBy = Seq("doc_id"), retain = 3)
    KeyedSource.evolveKeyed(spark, dir,
      StructType.fromDDL("kb BIGINT, doc_id BIGINT, n_chars BIGINT"),
      Seq(KeyedSource.AddCol("grade", isLong = false, "u")))
    val ddl = "kb BIGINT, doc_id BIGINT, n_chars BIGINT, grade STRING"
    spark.sql(s"DROP TABLE IF EXISTS $cat.mix")
    spark.sql(s"CREATE TABLE $cat.mix (kb BIGINT, doc_id BIGINT, " +
      s"n_chars BIGINT, grade STRING) USING `graft-keyed` LOCATION '$dir' " +
      "TBLPROPERTIES('key'='kb','sortBy'='doc_id','retain'='3')")
    // row-grain UPDATE: the rewrite SCANS the old generation through the
    // lineage and WRITES a new-schema generation; the head then mixes
    // pre- and post-evolution generations per key
    spark.sql(s"UPDATE $cat.mix SET grade = 'a', n_chars = 0 WHERE doc_id = 5")
    val got = read(dir, ddl).orderBy("doc_id").collect()
    val expect = df(32L).withColumn("grade", lit("u"))
      .withColumn("grade", when(col("doc_id") === 5L, "a").otherwise(col("grade")))
      .withColumn("n_chars", when(col("doc_id") === 5L, 0L).otherwise(col("n_chars")))
      .orderBy("doc_id").collect()
    assert(got.sameElements(expect))
    val log = KeyedSource.readCommitLog(dir, spark.sessionState.newHadoopConf()).get
    assert(log.head.edits.keySet == Set("1"),
      "only doc 5's key directory may be rewritten")
  }

  test("type drift refuses loudly; unresolvable declared columns refuse; alias shadowing refuses") {
    val dir = graft.io.TempDirs.scratch("graft_evo_ref_") + "/t"
    KeyedSource.stageKeyed(spark, df(16L), dir, "kb", retain = 2)
    KeyedSource.evolveKeyed(spark, dir,
      StructType.fromDDL("kb BIGINT, doc_id BIGINT, n_chars BIGINT"),
      Seq(KeyedSource.RenCol("n_chars", "chars")))
    // narrowing/type change: the stored BIGINT read as STRING must not
    // silently decode
    val e = intercept[Exception] {
      read(dir, "kb BIGINT, doc_id BIGINT, chars STRING").collect()
    }
    assert(e.getMessage.contains("type changes refuse"), e.getMessage)
    // a declared column with no lineage answer
    val u = intercept[Exception] {
      read(dir, "kb BIGINT, doc_id BIGINT, chars BIGINT, ghost BIGINT").collect()
    }
    assert(u.getMessage.contains("cannot resolve column 'ghost'"), u.getMessage)
    // lineage hygiene: re-adding a historical alias would make old
    // files ambiguous
    val a = intercept[IllegalArgumentException] {
      KeyedSource.evolveKeyed(spark, dir,
        StructType.fromDDL("kb BIGINT, doc_id BIGINT, chars BIGINT"),
        Seq(KeyedSource.AddCol("n_chars", isLong = true, "0")))
    }
    assert(a.getMessage.contains("historical alias"), a.getMessage)
    // frame-unsafe defaults refuse at evolve time, never reach the log
    val fdef = intercept[IllegalArgumentException] {
      KeyedSource.evolveKeyed(spark, dir,
        StructType.fromDDL("kb BIGINT, doc_id BIGINT, chars BIGINT"),
        Seq(KeyedSource.AddCol("note", isLong = false, "a,b")))
    }
    assert(fdef.getMessage.contains("delimiter"), fdef.getMessage)
  }

  test("the SQL door: ALTER TABLE ADD COLUMN DEFAULT and RENAME COLUMN") {
    val dir = graft.io.TempDirs.scratch("graft_evo_sql_") + "/t"
    KeyedSource.stageKeyed(spark, df(16L), dir, "kb",
      sortBy = Seq("doc_id"), retain = 2)
    spark.sql(s"DROP TABLE IF EXISTS $cat.sq")
    spark.sql(s"CREATE TABLE $cat.sq (kb BIGINT, doc_id BIGINT, n_chars BIGINT) " +
      s"USING `graft-keyed` LOCATION '$dir' " +
      "TBLPROPERTIES('key'='kb','sortBy'='doc_id','retain'='2')")
    spark.sql(s"ALTER TABLE $cat.sq ADD COLUMN grade STRING DEFAULT 'u'")
    spark.sql(s"ALTER TABLE $cat.sq RENAME COLUMN n_chars TO chars")
    val got = spark.sql(s"SELECT kb, doc_id, chars, grade FROM $cat.sq " +
      "ORDER BY doc_id").collect()
    val expect = df(16L).withColumn("grade", lit("u"))
      .toDF("kb", "doc_id", "chars", "grade").orderBy("doc_id").collect()
    assert(got.sameElements(expect))
    // an ADD COLUMN without a default refuses (frames store no NULLs)
    val nd = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.sq ADD COLUMN naked BIGINT")
    }
    assert(nd.getMessage.contains("DEFAULT"), nd.getMessage)
    // metadata fast paths SURVIVE evolution (r18): the pre-evolution
    // generation's sidecar parses ADAPTED through the lineage —
    // renamed columns remap, the added column synthesizes its
    // constant — so the pushed aggregate answers with zero data files
    // and exact values, no restage needed
    val agg = spark.sql(s"SELECT count(*) AS n, sum(chars) AS sc, " +
      s"min(grade) AS mg FROM $cat.sq")
    assert(agg.queryExecution.executedPlan.toString.contains("GraftKeyedStats"),
      agg.queryExecution.executedPlan.toString)
    val row = agg.head
    assert((row.getLong(0), row.getLong(1), row.getString(2)) ==
      ((16L, df(16L).agg(sum("n_chars")).head.getLong(0), "u")))
    // … and a restage under the evolved schema keeps them, directly
    spark.sql(s"INSERT OVERWRITE $cat.sq SELECT kb, doc_id, chars, grade FROM $cat.sq")
    val agg2 = spark.sql(s"SELECT count(*) AS n FROM $cat.sq")
    assert(agg2.queryExecution.executedPlan.toString.contains("GraftKeyedStats"))
    assert(agg2.head.getLong(0) == 16L)
  }

  test("a DV stats patch written BEFORE an evolution still answers exactly through the adapted parse") {
    val dir = graft.io.TempDirs.scratch("graft_evo_dvp_") + "/t"
    KeyedSource.stageKeyed(spark, df(32L), dir, "kb",
      sortBy = Seq("doc_id"), retain = 4)
    spark.sql(s"DROP TABLE IF EXISTS $cat.dvp")
    spark.sql(s"CREATE TABLE $cat.dvp (kb BIGINT, doc_id BIGINT, n_chars BIGINT) " +
      s"USING `graft-keyed` LOCATION '$dir' " +
      "TBLPROPERTIES('key'='kb','sortBy'='doc_id','retain'='4','dmlMode'='mor')")
    // the DV commit writes its patch under the PRE-evolution schema
    spark.sql(s"DELETE FROM $cat.dvp WHERE doc_id IN (5, 9, 21)")
    // … then the layout evolves: rename + added constant
    KeyedSource.evolveKeyed(spark, dir,
      StructType.fromDDL("kb BIGINT, doc_id BIGINT, n_chars BIGINT"),
      Seq(KeyedSource.RenCol("n_chars", "chars"),
        KeyedSource.AddCol("lang", isLong = false, "en")))
    val ddl = "kb BIGINT, doc_id BIGINT, chars BIGINT, lang STRING"
    val q = read(dir, ddl).groupBy("kb").agg(
      count(lit(1)).as("n"), min("chars").as("mn"),
      max("chars").as("mx"), max("lang").as("ml"))
    // the patch resolves through the lineage: min/max/count stay
    // metadata-answered and EXACT post-delete, the added column
    // answers its constant — zero data files opened
    assert(q.queryExecution.executedPlan.toString.contains("GraftKeyedStats"),
      q.queryExecution.executedPlan.toString)
    val expect = df(32L).where("doc_id NOT IN (5, 9, 21)")
      .groupBy("kb").agg(count(lit(1)), min("n_chars"), max("n_chars"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(q.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap ==
      expect.map { case (k, (n, mn, mx)) => k -> (n, mn, mx, "en") })
  }

  test("ordering claim survives a SORT-column rename through the lineage-resolved marker") {
    val dir = graft.io.TempDirs.scratch("graft_evo_ord_") + "/t"
    KeyedSource.stageKeyed(spark, df(32L), dir, "kb",
      sortBy = Seq("n_chars"), retain = 2)
    KeyedSource.evolveKeyed(spark, dir,
      StructType.fromDDL("kb BIGINT, doc_id BIGINT, n_chars BIGINT"),
      Seq(KeyedSource.RenCol("n_chars", "chars")))
    val q = read(dir, "kb BIGINT, doc_id BIGINT, chars BIGINT")
      .where(col("kb") === 1L)
    val scan = q.queryExecution.executedPlan.collectLeaves().collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportOrdering]
    // the marker records the OLD name (n_chars:BIGINT); the lineage
    // resolves it to the declared 'chars', so the stored-order claim
    // survives the rename — same rows, same bytes, new name
    val claimed = scan.outputOrdering().map(_.expression().toString)
    assert(claimed.exists(_.contains("chars")), claimed.toSeq)
    assert(q.orderBy("chars").collect().map(_.getLong(2)).toSeq ==
      df(32L).where(col("kb") === 1L).orderBy("n_chars")
        .collect().map(_.getLong(2)).toSeq)
  }

  test("INT→BIGINT widening: old generations promote at decode; sidecar, ordering, skipping, and time travel survive") {
    val dir = graft.io.TempDirs.scratch("graft_evo_widen_") + "/t"
    // range-keyed with an INT column, SORTED BY IT — the marker records
    // pop:INT and per-key pop intervals are disjoint (skipping bait)
    val dfi = (0L until 32L).map(i => (i / 8L, i, i.toInt))
      .toDF("kb", "doc_id", "pop")
    KeyedSource.stageKeyed(spark, dfi, dir, "kb",
      sortBy = Seq("pop"), retain = 4)
    val intDdl = "kb BIGINT, doc_id BIGINT, pop INT"
    val longDdl = "kb BIGINT, doc_id BIGINT, pop BIGINT"
    assert(read(dir, intDdl).where("pop >= 10").count() == 22L)

    // widen: ONE metadata commit, zero bytes rewritten
    val evolved = KeyedSource.evolveKeyed(spark, dir,
      StructType.fromDDL(intDdl), Seq(KeyedSource.WidenCol("pop")))
    assert(evolved("pop").dataType == org.apache.spark.sql.types.LongType)

    // the old generation decodes PROMOTED under the new declaration
    val head = read(dir, longDdl).orderBy("doc_id").collect()
    assert(head.map(_.getLong(2)).toSeq == (0L until 32L))
    // … and a post-widening append mixes generations (old INT + new
    // BIGINT files read together)
    (32L until 36L).map(i => (i / 8L, i, i))
      .toDF("kb", "doc_id", "pop")
      .write.format("graft-keyed").option("schema", longDdl)
      .option("key", "kb").option("sortBy", "pop")
      .mode("append").save(dir)
    assert(read(dir, longDdl).agg(sum("pop")).head.getLong(0) ==
      (0L until 36L).sum)

    // sidecar min/max RE-TYPE through the widening: the pushed
    // aggregate answers from metadata across both generations
    val agg = read(dir, longDdl).groupBy("kb").agg(max("pop").as("mx"))
    assert(agg.queryExecution.executedPlan.toString.contains("GraftKeyedStats"),
      agg.queryExecution.executedPlan.toString)
    assert(agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(0L -> 7L, 1L -> 15L, 2L -> 23L, 3L -> 31L, 4L -> 35L))

    // non-key skipping reads the widened sidecar: pop >= 24 proves
    // three of the pre-widening directories empty
    val skip = read(dir, longDdl).where($"pop" >= 24L)
    val scan = skip.queryExecution.executedPlan.collectLeaves().collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.scan
    assert(scan.description().contains("skipped=3"), scan.description())
    assert(skip.count() == 12L)

    // the order-marker claim (pop:INT) survives under the recorded
    // widening — numeric order is identical
    val ordered = read(dir, longDdl).where($"kb" === 1L)
    val oscan = ordered.queryExecution.executedPlan.collectLeaves().collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportOrdering]
    assert(oscan.outputOrdering().nonEmpty,
      "a widened sort column must keep the stored-order claim")

    // TIME TRAVEL UNDER THE OLD TYPE: the pre-widening snapshot still
    // reads with the INT declaration (and with the BIGINT one)
    assert(read(dir, intDdl, asOf = Some(1L)).orderBy("doc_id").collect()
      .map(_.getInt(2)).toSeq == (0 until 32))
    assert(read(dir, longDdl, asOf = Some(1L)).count() == 32L)

    // refusals stay refusals: widen of STRING/BIGINT, and narrowing
    val ws = intercept[IllegalArgumentException] {
      KeyedSource.evolveKeyed(spark, dir, evolved,
        Seq(KeyedSource.WidenCol("pop")))
    }
    assert(ws.getMessage.contains("widenings are representable"), ws.getMessage)
    val nar = intercept[Exception] {
      read(dir, intDdl).collect() // head now mixes a BIGINT generation
    }
    assert(nar.getMessage.contains("type changes refuse"), nar.getMessage)
  }

  test("FLOAT→DOUBLE widening: old generations promote per value; sidecar digits convert; ordering and skipping survive") {
    val dir = graft.io.TempDirs.scratch("graft_evo_fwiden_") + "/t"
    // range-keyed FLOAT column, sorted by it: per-key w intervals are
    // disjoint (skipping bait) and the marker records w:FLOAT
    val dff = (0 until 32).map(i => (i / 8L, i.toLong, i.toFloat / 4.0f))
      .toDF("kb", "doc_id", "w")
    KeyedSource.stageKeyed(spark, dff, dir, "kb",
      sortBy = Seq("w"), retain = 4)
    val fDdl = "kb BIGINT, doc_id BIGINT, w FLOAT"
    val dDdl = "kb BIGINT, doc_id BIGINT, w DOUBLE"
    assert(read(dir, fDdl).where($"w" >= 2.0f).count() == 24L)

    // widen: ONE metadata commit — unlike INT→BIGINT the stored
    // digits do NOT re-type (sortable-int vs sortable-long domains),
    // so this leg proves the per-value decode promotion and the
    // sidecar digit CONVERSION paths
    val evolved = KeyedSource.evolveKeyed(spark, dir,
      StructType.fromDDL(fDdl), Seq(KeyedSource.WidenCol("w")))
    assert(evolved("w").dataType == org.apache.spark.sql.types.DoubleType)

    // the old generation decodes PROMOTED, exactly (every float is a
    // double)
    val head = read(dir, dDdl).orderBy("doc_id").collect()
    assert(head.map(_.getDouble(2)).toSeq ==
      (0 until 32).map(i => (i.toFloat / 4.0f).toDouble))

    // a post-widening DOUBLE append mixes generations (key 4 is new —
    // single-dir keys keep the ordering claim testable below)
    (32 until 36).map(i => (i / 8L, i.toLong, i.toDouble / 4.0))
      .toDF("kb", "doc_id", "w")
      .write.format("graft-keyed").option("schema", dDdl)
      .option("key", "kb").option("sortBy", "w")
      .mode("append").save(dir)

    // pushed min/max across MIXED generations: the pre-widening
    // sidecar parses ADAPTED with float→double digit conversion, the
    // post-widening one directly — both metadata-answered
    val agg = read(dir, dDdl).groupBy("kb").agg(max("w").as("mx"))
    assert(agg.queryExecution.executedPlan.toString.contains("GraftKeyedStats"),
      agg.queryExecution.executedPlan.toString)
    assert(agg.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap ==
      Map(0L -> 1.75, 1L -> 3.75, 2L -> 5.75, 3L -> 7.75, 4L -> 8.75))

    // skipping through the CONVERTED sidecar: w >= 6.0 proves the
    // first three pre-widening directories empty
    val skip = read(dir, dDdl).where($"w" >= 6.0)
    val scan = skip.queryExecution.executedPlan.collectLeaves().collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.scan
    assert(scan.description().contains("skipped=3"), scan.description())
    assert(skip.count() == 12L)

    // the order-marker claim (w:FLOAT) survives under the recorded
    // widening — the promotion is monotone
    val ordered = read(dir, dDdl).where($"kb" === 1L)
    val oscan = ordered.queryExecution.executedPlan.collectLeaves().collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportOrdering]
    assert(oscan.outputOrdering().nonEmpty,
      "a widened FLOAT sort column must keep the stored-order claim")

    // TIME TRAVEL UNDER THE OLD TYPE: the pre-widening snapshot still
    // reads with the FLOAT declaration (and with the DOUBLE one)
    assert(read(dir, fDdl, asOf = Some(1L)).orderBy("doc_id").collect()
      .map(_.getFloat(2)).toSeq == (0 until 32).map(_.toFloat / 4.0f))
    assert(read(dir, dDdl, asOf = Some(1L)).count() == 32L)

    // a second widen of the now-DOUBLE column refuses
    val ws = intercept[IllegalArgumentException] {
      KeyedSource.evolveKeyed(spark, dir, evolved,
        Seq(KeyedSource.WidenCol("w")))
    }
    assert(ws.getMessage.contains("widenings are representable"), ws.getMessage)
    // reading the mixed layout under the OLD float declaration refuses
    // (a double generation cannot narrow)
    val nar = intercept[Exception] { read(dir, fDdl).collect() }
    assert(nar.getMessage.contains("type changes refuse"), nar.getMessage)
  }

  test("the SQL widening door: ALTER COLUMN TYPE BIGINT; other retypes refuse") {
    val dir = graft.io.TempDirs.scratch("graft_evo_wsql_") + "/t"
    KeyedSource.stageKeyed(spark,
      (0L until 16L).map(i => (i % 4L, i, i.toInt)).toDF("kb", "doc_id", "pop"),
      dir, "kb", sortBy = Seq("doc_id"), retain = 2)
    spark.sql(s"DROP TABLE IF EXISTS $cat.wd")
    spark.sql(s"CREATE TABLE $cat.wd (kb BIGINT, doc_id BIGINT, pop INT) " +
      s"USING `graft-keyed` LOCATION '$dir' " +
      "TBLPROPERTIES('key'='kb','sortBy'='doc_id','retain'='2')")
    spark.sql(s"ALTER TABLE $cat.wd ALTER COLUMN pop TYPE BIGINT")
    val got = spark.sql(s"SELECT sum(pop) AS s, max(pop) AS m FROM $cat.wd").head()
    assert((got.getLong(0), got.getLong(1)) == ((0L until 16L).sum, 15L))
    // narrowing refuses at DDL time — Spark's own analyzer blocks
    // non-up-casts before the catalog sees them (NOT_SUPPORTED_CHANGE_
    // COLUMN); the catalog's own WidenCol guard stays the second fence
    // for programmatic callers
    val nr = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.wd ALTER COLUMN doc_id TYPE INT")
    }
    assert(nr.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"), nr.getMessage)
    // the programmatic fence: a cross-kind retype through the catalog
    // API refuses with the widening remediation
    val cat2 = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val cr = intercept[UnsupportedOperationException] {
      cat2.alterTable(
        org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "wd"),
        org.apache.spark.sql.connector.catalog.TableChange.updateColumnType(
          Array("kb"), org.apache.spark.sql.types.StringType))
    }
    assert(cr.getMessage.contains("INT->BIGINT and FLOAT->DOUBLE"), cr.getMessage)
  }
}
