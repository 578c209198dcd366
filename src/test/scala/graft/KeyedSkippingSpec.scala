package graft

import graft.sources.{GraftCatalog, KeyedSource}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Non-key data skipping from the stats sidecar (r18 — the Iceberg/
  * Delta file-skipping shape at key-directory grain). A residual
  * range/equality predicate stays in the plan as a post-scan Filter
  * (honor-but-recheck), but directories whose sidecar min/max interval
  * PROVES the predicate empty are not planned at all. Pins:
  * (1) a selective non-key range over a range-keyed layout plans a
  *     fraction of the 16 directories with values identical to the
  *     unpruned twin; the scan description carries `skipped=`;
  * (2) the predicate algebra: equality, In, Or, Not, string equality /
  *     prefix, IsNull (no-null layout ⇒ zero partitions) — all proof-
  *     based, never trust (an unprovable shape plans everything);
  * (3) composition with consumed KEY pruning (intersection) and with
  *     tombstone deletes;
  * (4) composition with DELETION VECTORS: a patched DV commit shrinks
  *     the interval (skipping sees post-delete min/max); with the
  *     patch removed the key refuses skipping but values stay right;
  * (5) composition with SCHEMA EVOLUTION (old-generation sidecar no
  *     longer matches the declared schema ⇒ skipping disabled, values
  *     correct) and TIME TRAVEL (asOf reads its snapshot's sidecar);
  * (6) reported statistics shrink with the skip (the planner prices
  *     the surviving directories only);
  * (7) a layout with no sidecar (foreign/doctored) skips nothing. */
class KeyedSkippingSpec extends SparkSpec {
  import spark.implicits._

  private val ddl = "kb BIGINT, doc_id BIGINT, source STRING, n_chars BIGINT"
  private val schema = StructType.fromDDL(ddl)
  private def hconf = spark.sessionState.newHadoopConf()

  /** 256 rows across 16 range-keyed dirs: kb = doc_id DIV 16, so each
    * directory holds a disjoint doc_id interval [16k, 16k+15] and a
    * single source string `src<k>` — the clustered shape skipping
    * exists for. */
  private def rangeDf(n: Long = 256L) =
    (0L until n).map(i => (i / 16L, i, s"src${i / 16L}", (i * 7L) % 101L))
      .toDF("kb", "doc_id", "source", "n_chars")

  private def readKeyed(dir: String, asOf: Option[Long] = None): DataFrame = {
    val r = spark.read.format("graft-keyed").option("path", dir)
      .option("schema", ddl).option("key", "kb")
    asOf.fold(r)(v => r.option("asOf", v.toString)).load()
  }

  private def scanOf(df: DataFrame) =
    df.queryExecution.executedPlan.collectLeaves()
      .collect { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
      .head.scan

  private def planned(df: DataFrame): Int =
    scanOf(df).toBatch.planInputPartitions().length

  test("selective non-key range plans a fraction of the directories, values identical to the unpruned twin") {
    val dir = graft.io.TempDirs.scratch("graft_skip_range_") + "/t"
    KeyedSource.stageKeyed(spark, rangeDf(), dir, "kb", sortBy = Seq("doc_id"))

    val q = readKeyed(dir).where($"doc_id" >= 224L) // last 2 of 16 dirs
    assert(planned(q) == 2, scanOf(q).description())
    assert(scanOf(q).description().contains("skipped=14"), scanOf(q).description())
    // honor-but-recheck: the residual Filter stays in the plan
    assert(q.queryExecution.executedPlan.toString.contains("Filter"))
    assert(q.collect().map(_.getLong(1)).sorted.toSeq == (224L until 256L))

    // a BETWEEN interior slice (two conjuncts) intersects proofs
    val mid = readKeyed(dir).where($"doc_id" >= 40L && $"doc_id" <= 55L)
    assert(planned(mid) == 2, scanOf(mid).description())
    assert(mid.count() == 16L)

    // an unprovable predicate shape (arithmetic) skips nothing
    val noProof = readKeyed(dir).where(($"doc_id" % 16L) === 3L)
    assert(planned(noProof) == 16, scanOf(noProof).description())
    assert(noProof.count() == 16L)
  }

  test("predicate algebra: equality, In, Or, Not, string forms, IsNull") {
    val dir = graft.io.TempDirs.scratch("graft_skip_alg_") + "/t"
    KeyedSource.stageKeyed(spark, rangeDf(), dir, "kb", sortBy = Seq("doc_id"))

    val eq = readKeyed(dir).where($"doc_id" === 100L)
    assert(planned(eq) == 1, scanOf(eq).description())
    assert(eq.collect().map(_.getLong(1)).toSeq == Seq(100L))

    val in = readKeyed(dir).where($"doc_id".isin(3L, 100L, 250L))
    assert(planned(in) == 3, scanOf(in).description())
    assert(in.count() == 3L)

    val or = readKeyed(dir).where($"doc_id" < 10L || $"doc_id" > 250L)
    assert(planned(or) == 2, scanOf(or).description())
    assert(or.count() == 15L)

    // Not(doc_id <= 239): only the last dir can hold a violating row
    val not = readKeyed(dir).where(!($"doc_id" <= 239L))
    assert(planned(not) == 1, scanOf(not).description())
    assert(not.count() == 16L)

    // string equality and prefix ride UTF8 byte order
    val se = readKeyed(dir).where($"source" === "src7")
    assert(planned(se) == 1, scanOf(se).description())
    assert(se.count() == 16L)
    val sp = readKeyed(dir).where($"source".startsWith("src1"))
    // src1, src10..src15 — 7 directories share the prefix
    assert(planned(sp) == 7, scanOf(sp).description())
    assert(sp.count() == 112L)

    // the no-null layout makes IsNull provably empty EVERYWHERE
    val isNull = readKeyed(dir).where($"n_chars".isNull)
    assert(planned(isNull) == 0, scanOf(isNull).description())
    assert(isNull.count() == 0L)
    val isNotNull = readKeyed(dir).where($"n_chars".isNotNull)
    assert(planned(isNotNull) == 16)
  }

  test("composes with consumed key pruning, tombstones, and reported statistics") {
    val dir = graft.io.TempDirs.scratch("graft_skip_comp_") + "/t"
    KeyedSource.stageKeyed(spark, rangeDf(), dir, "kb",
      sortBy = Seq("doc_id"), retain = 2)

    // key pruning (consumed) ∩ skipping (residual): kb ∈ {2,3,14} but
    // only kb=14 survives the doc_id proof
    val both = readKeyed(dir)
      .where($"kb".isin(2L, 3L, 14L) && $"doc_id" >= 224L)
    assert(planned(both) == 1, scanOf(both).description())
    assert(both.count() == 16L)

    // tombstone the last directory: the range query loses it
    new graft.sources.KeyedTable(schema, dir, "kb")
      .deleteWhere(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.EqualTo("kb", 15L)))
    val after = readKeyed(dir).where($"doc_id" >= 224L)
    assert(planned(after) == 1, scanOf(after).description())
    assert(after.collect().map(_.getLong(1)).sorted.toSeq == (224L until 240L))

    // the planner prices only the surviving directory
    val stats = scanOf(after)
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(stats.numRows().getAsLong == 16L, stats.numRows())

    // time travel: the pre-tombstone snapshot skips against ITS sidecar
    val tt = readKeyed(dir, asOf = Some(1L)).where($"doc_id" >= 224L)
    assert(planned(tt) == 2, scanOf(tt).description())
    assert(tt.count() == 32L)
  }

  test("deletion vectors: a patched DV commit shrinks the skip interval; no patch refuses skipping, values stay right") {
    val dir = graft.io.TempDirs.scratch("graft_skip_dv_") + "/t"
    KeyedSource.stageKeyed(spark, rangeDf(64L), dir, "kb",
      sortBy = Seq("doc_id"), retain = 4) // 4 dirs of 16
    spark.conf.set("spark.sql.catalog.gskip", classOf[GraftCatalog].getName)
    spark.sql("DROP TABLE IF EXISTS gskip.dv")
    spark.sql(
      s"""CREATE TABLE gskip.dv (kb BIGINT, doc_id BIGINT, source STRING,
         |n_chars BIGINT) USING `graft-keyed` LOCATION '$dir'
         |TBLPROPERTIES('key'='kb','sortBy'='doc_id','retain'='4','dmlMode'='mor')""".stripMargin)
    // delete kb=1's upper half: its live interval shrinks to [16, 23]
    spark.sql("DELETE FROM gskip.dv WHERE doc_id >= 24 AND doc_id <= 31")

    // the deleted range is now PROVABLY empty in every directory —
    // zero partitions planned, zero rows, via the stats patch
    val q = readKeyed(dir).where($"doc_id" >= 24L && $"doc_id" <= 31L)
    assert(planned(q) == 0, scanOf(q).description())
    assert(q.count() == 0L)
    // the surviving half still plans its directory
    val half = readKeyed(dir).where($"doc_id" >= 16L && $"doc_id" <= 23L)
    assert(planned(half) == 1)
    assert(half.count() == 8L)

    // strip the patch (models a pre-r17 DV commit): kb=1's interval is
    // untrusted, so it refuses to skip — planned, then DV-filtered to
    // the same zero rows
    val log = KeyedSource.readCommitLog(dir, hconf).get
    val dvGen = log.head.dvs("1").head.takeWhile(_ != '/')
    val patch = new java.io.File(s"$dir/$dvGen", "_graft_keyed_stats_patch")
    assert(patch.exists() && patch.delete())
    new java.io.File(s"$dir/$dvGen", "._graft_keyed_stats_patch.crc").delete()
    val unpatched = readKeyed(dir).where($"doc_id" >= 24L && $"doc_id" <= 31L)
    assert(planned(unpatched) == 1, scanOf(unpatched).description())
    assert(unpatched.count() == 0L)
  }

  test("z-ordered layout: 2-D predicates prune through the sidecar where a linear sort prunes one axis") {
    val base = graft.io.TempDirs.scratch("graft_skip_z_")
    // uniform even-coordinate grid over [0,256)²: every 32×32 Morton
    // block holds 16×16 rows, so pruning counts are exact
    val grid = (0 until 16384).map { i =>
      val a = (i / 128) * 2L
      val b = (i % 128) * 2L
      (i.toLong, a, b)
    }.toDF("id", "da", "db")

    // z-order write option: zb = Morton block of (da, db)
    KeyedSource.stageZOrdered(spark, grid, s"$base/z", "da", "db")
    val zDdl = "id BIGINT, da BIGINT, db BIGINT, zq_da BIGINT, zq_db BIGINT, zb BIGINT"
    def readZ = spark.read.format("graft-keyed").option("path", s"$base/z")
      .option("schema", zDdl).option("key", "zb").load()
    // linear twin: keyed by the leading dimension alone
    KeyedSource.stageKeyed(spark,
      grid.selectExpr("id", "da", "db", "da div 4 AS kb"), s"$base/lin", "kb")
    def readLin = spark.read.format("graft-keyed").option("path", s"$base/lin")
      .option("schema", "id BIGINT, da BIGINT, db BIGINT, kb BIGINT")
      .option("key", "kb").load()

    // the q48 predicate shape: the middle eighth of BOTH axes
    val pred = ($"da" >= 112L && $"da" <= 143L &&
      $"db" >= 112L && $"db" <= 143L)
    val zq = readZ.where(pred)
    val lq = readLin.where(pred)
    // z-order: both range predicates bite — 4 of 64 blocks survive;
    // linear: only the leading axis prunes — 8 of 64 (each spans db)
    assert(planned(zq) == 4, scanOf(zq).description())
    assert(scanOf(zq).description().contains("skipped=60"))
    assert(planned(lq) == 8, scanOf(lq).description())
    // identical values either way: 16×16 matching grid points
    assert(zq.count() == 256L && lq.count() == 256L)
    assert(zq.agg(org.apache.spark.sql.functions.sum($"da" + $"db"))
      .head().getLong(0) ==
      lq.agg(org.apache.spark.sql.functions.sum($"da" + $"db"))
        .head().getLong(0))

    // HILBERT twin (r19 stretch): fully locality-preserving blocks —
    // on the 2-D band it must plan NO MORE directories than Morton
    // (whose diagonal seams can split a block across the plane), with
    // identical values
    KeyedSource.stageZOrdered(spark, grid, s"$base/h", "da", "db",
      curve = "hilbert")
    def readH = spark.read.format("graft-keyed").option("path", s"$base/h")
      .option("schema", zDdl).option("key", "zb").load()
    val hq = readH.where(pred)
    assert(planned(hq) <= planned(zq),
      s"hilbert ${planned(hq)} vs morton ${planned(zq)}: " +
        scanOf(hq).description())
    assert(hq.count() == 256L)
    assert(hq.agg(org.apache.spark.sql.functions.sum($"da" + $"db"))
      .head().getLong(0) ==
      zq.agg(org.apache.spark.sql.functions.sum($"da" + $"db"))
        .head().getLong(0))
    // every 1024-index Hilbert block is one CONNECTED region, so the
    // 64 directories partition the plane into contiguous tiles — the
    // whole-grid scan still answers everything (sanity: bucketing is
    // layout, never semantics)
    assert(readH.count() == 16384L)
  }

  test("schema evolution keeps skipping through the adapted sidecar; a missing sidecar skips nothing") {
    val dir = graft.io.TempDirs.scratch("graft_skip_evo_") + "/t"
    KeyedSource.stageKeyed(spark, rangeDf(), dir, "kb", sortBy = Seq("doc_id"))
    KeyedSource.evolveKeyed(spark, dir, schema,
      Seq(KeyedSource.AddCol("lang", isLong = false, "en"),
        KeyedSource.RenCol("n_chars", "chars")))
    val evolvedDdl = "kb BIGINT, doc_id BIGINT, source STRING, chars BIGINT, lang STRING"
    val q = spark.read.format("graft-keyed").option("path", dir)
      .option("schema", evolvedDdl).option("key", "kb").load()
      .where($"doc_id" >= 224L)
    // the base generation's sidecar records the OLD schema — the
    // lineage ADAPTS it (rename remaps, the added column synthesizes
    // its constant), so skipping still proves 14 directories empty
    assert(planned(q) == 2, scanOf(q).description())
    assert(scanOf(q).description().contains("skipped=14"))
    assert(q.count() == 32L)
    assert(q.collect().forall(_.getString(4) == "en"))
    // even the ADDED column's synthesized interval skips: a predicate
    // off the constant proves every directory empty
    val offConst = spark.read.format("graft-keyed").option("path", dir)
      .option("schema", evolvedDdl).option("key", "kb").load()
      .where($"lang" === "fr")
    assert(planned(offConst) == 0, scanOf(offConst).description())
    assert(offConst.count() == 0L)

    // a doctored layout (sidecar removed) also skips nothing
    val dir2 = graft.io.TempDirs.scratch("graft_skip_nosc_") + "/t"
    KeyedSource.stageKeyed(spark, rangeDf(64L), dir2, "kb")
    val root = KeyedSource.committedRoot(spark, dir2)
    assert(new java.io.File(root, "_graft_keyed_stats").delete())
    new java.io.File(root, "._graft_keyed_stats.crc").delete()
    val q2 = readKeyed(dir2).where($"doc_id" >= 48L)
    assert(planned(q2) == 4, scanOf(q2).description())
    assert(q2.count() == 16L)
  }

  test("file-grain skipping: a kept key plans a strict subset of its generation files, values identical to the unpruned twin") {
    val dir = graft.io.TempDirs.scratch("graft_skip_file_") + "/t"
    // base generation: doc_id 0..63 across 4 keys (kb = doc_id % 4);
    // two APPENDS shift doc_id by 100/200 — every key ends up served
    // by 3 generation files with DISJOINT per-generation doc_id
    // intervals (the time-partitioned append shape)
    def batch(off: Long) = (0L until 64L).map(i =>
      (i % 4L, i + off, s"src${(i + off) / 16L}", (i * 7L) % 101L))
      .toDF("kb", "doc_id", "source", "n_chars")
    KeyedSource.stageKeyed(spark, batch(0L), dir, "kb", retain = 4)
    Seq(100L, 200L).foreach(off =>
      batch(off).write.format("graft-keyed").option("schema", ddl)
        .option("key", "kb").mode("append").save(dir))

    // recency filter: only the LAST append can match — each kept key
    // plans 1 of its 3 files; the description says so
    val q = readKeyed(dir).where($"doc_id" >= 200L)
    val parts = scanOf(q).toBatch.planInputPartitions()
      .map(_.asInstanceOf[graft.sources.KeyedPartition])
    assert(parts.length == 4, s"all 4 keys kept, got ${parts.length}")
    assert(parts.forall(_.dirs.length == 1),
      parts.map(_.dirs.length).mkString(","))
    assert(scanOf(q).description().contains("skippedFiles=8"),
      scanOf(q).description())
    // values identical to the logical recompute over all three batches
    val expect = Seq(0L, 100L, 200L).map(batch).reduce(_ unionByName _)
      .where($"doc_id" >= 200L).orderBy("doc_id").collect().toSeq.map(_.toSeq)
    assert(q.orderBy("doc_id").collect().toSeq.map(_.toSeq) == expect)

    // a middle slice keeps only the middle file per key
    val mid = readKeyed(dir).where($"doc_id" >= 100L && $"doc_id" <= 163L)
    assert(scanOf(mid).toBatch.planInputPartitions()
      .map(_.asInstanceOf[graft.sources.KeyedPartition])
      .forall(_.dirs.length == 1))
    assert(mid.count() == 64L)

    // `_graft_pos` disables file pruning: ordinals index the FULL
    // concatenated stream, so the metadata scan plans every file
    val posQ = readKeyed(dir).where($"doc_id" >= 200L)
      .select($"doc_id", org.apache.spark.sql.functions.col("_graft_pos"))
    val posParts = scanOf(posQ).toBatch.planInputPartitions()
      .map(_.asInstanceOf[graft.sources.KeyedPartition])
    assert(posParts.forall(_.dirs.length == 3),
      posParts.map(_.dirs.length).mkString(","))

    // a DV'd key refuses file pruning (ordinal stability) but its
    // values stay right; the other keys keep pruning
    spark.conf.set("spark.sql.catalog.gskipf", classOf[GraftCatalog].getName)
    spark.sql("DROP TABLE IF EXISTS gskipf.fg")
    spark.sql(
      s"""CREATE TABLE gskipf.fg (kb BIGINT, doc_id BIGINT, source STRING,
         |n_chars BIGINT) USING `graft-keyed` LOCATION '$dir'
         |TBLPROPERTIES('key'='kb','retain'='4','dmlMode'='mor')""".stripMargin)
    spark.sql("DELETE FROM gskipf.fg WHERE doc_id = 201")
    val afterDv = readKeyed(dir).where($"doc_id" >= 200L)
    val dvParts = scanOf(afterDv).toBatch.planInputPartitions()
      .map(_.asInstanceOf[graft.sources.KeyedPartition])
    // key 1 (holds doc 201) carries a DV → all 3 files planned there;
    // the other three keys still plan 1
    assert(dvParts.count(_.dirs.length == 3) == 1 &&
      dvParts.count(_.dirs.length == 1) == 3,
      dvParts.map(_.dirs.length).mkString(","))
    assert(afterDv.count() == 63L)
  }

  test("proof soundness under randomized filters (property): !canMatch ⇒ no row matches; allMatch ⇒ every row matches") {
    // the skipping evaluators are PROOF engines: an unsound `false`
    // from canMatch silently drops live rows, an unsound `true` from
    // allMatch flips Not() the wrong way. Fuzz them against a
    // reference row evaluator over a SMALL value domain (collisions
    // guaranteed) — seeded, so failures replay.
    import org.apache.spark.sql.sources._
    val sch = StructType.fromDDL("a BIGINT, s STRING")
    val rnd = new scala.util.Random(181818L)
    val strDomain = Vector("", "a", "ab", "abc", "b", "ba", "bb", "c")
    def randLong(): Long = rnd.nextInt(8).toLong
    def randStr(): String = strDomain(rnd.nextInt(strDomain.length))
    def leaf(): Filter = rnd.nextInt(10) match {
      case 0 => EqualTo(if (rnd.nextBoolean()) "a" else "s",
        if (rnd.nextBoolean()) randLong() else randStr())
      case 1 => GreaterThan("a", randLong())
      case 2 => GreaterThanOrEqual("a", randLong())
      case 3 => LessThan("a", randLong())
      case 4 => LessThanOrEqual("a", randLong())
      case 5 => In("a", Array.fill(rnd.nextInt(3) + 1)(randLong(): Any))
      case 6 => IsNull(if (rnd.nextBoolean()) "a" else "s")
      case 7 => IsNotNull(if (rnd.nextBoolean()) "a" else "s")
      case 8 => StringStartsWith("s", randStr())
      case _ => EqualNullSafe("s", randStr())
    }
    def tree(depth: Int): Filter =
      if (depth == 0) leaf()
      else rnd.nextInt(4) match {
        case 0 => And(tree(depth - 1), tree(depth - 1))
        case 1 => Or(tree(depth - 1), tree(depth - 1))
        case 2 => Not(tree(depth - 1))
        case _ => leaf()
      }
    // reference row evaluator (rows are never null by the layout)
    def evalRow(f: Filter, a: Long, str: String): Boolean = {
      def v(attr: String): Any = if (attr == "a") a else str
      def cmp(attr: String, lit: Any): Option[Int] = (v(attr), lit) match {
        case (x: Long, l: Number) => Some(x.compareTo(l.longValue))
        case (x: String, l: String) =>
          Some(org.apache.spark.unsafe.types.UTF8String.fromString(x)
            .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(l)))
        case _ => None
      }
      f match {
        case EqualTo(at, l) => cmp(at, l).contains(0)
        case EqualNullSafe(at, l) => l != null && cmp(at, l).contains(0)
        case GreaterThan(at, l) => cmp(at, l).exists(_ > 0)
        case GreaterThanOrEqual(at, l) => cmp(at, l).exists(_ >= 0)
        case LessThan(at, l) => cmp(at, l).exists(_ < 0)
        case LessThanOrEqual(at, l) => cmp(at, l).exists(_ <= 0)
        case In(at, vs) => vs != null && vs.exists(l =>
          l != null && cmp(at, l).contains(0))
        case IsNull(_) => false
        case IsNotNull(_) => true
        case And(l, r) => evalRow(l, a, str) && evalRow(r, a, str)
        case Or(l, r) => evalRow(l, a, str) || evalRow(r, a, str)
        case Not(p) => !evalRow(p, a, str)
        case StringStartsWith(at, p) => p != null && str.startsWith(p)
        case _ => true
      }
    }
    var trials = 0
    while (trials < 2000) {
      val rows = Seq.fill(rnd.nextInt(7) + 1)((randLong(), randStr()))
      val as = rows.map(_._1)
      val ss = rows.map(_._2)
      def u(x: String) = org.apache.spark.unsafe.types.UTF8String.fromString(x)
      val entry = graft.sources.KeyedStats.Entry("k", rows.length,
        Array(as.min.toString, ss.minBy(u)),
        Array(as.max.toString, ss.maxBy(u)),
        Array(as.sum, 0L))
      val f = tree(rnd.nextInt(3) + 1)
      val can = graft.sources.KeyedStats.canMatch(f, entry, sch)
      val all = graft.sources.KeyedStats.allMatch(f, entry, sch)
      val truths = rows.map { case (a, str) => evalRow(f, a, str) }
      if (!can) assert(!truths.exists(identity),
        s"UNSOUND canMatch=false but a row matches: f=$f rows=$rows")
      if (all) assert(truths.forall(identity),
        s"UNSOUND allMatch=true but a row fails: f=$f rows=$rows")
      trials += 1
    }
  }
}
