package graft

import graft.sources.{KeyedSource, Tables}
import org.apache.spark.sql.functions._

/** The `graft-keyed` DSv2 source (sources/KeyedSource.scala) — the
  * storage-partitioned-join layer q54 rides. Pins the contracts the
  * registration leans on: byte-faithful round trip, the scan's
  * KeyGroupedPartitioning report (one HasPartitionKey partition per
  * stored key), shuffle-free alignment of two co-keyed scans, honest
  * degradation when the v2-bucketing conf is off, column pruning, and
  * the stage-time framing guard. */
class KeyedSourceSpec extends SparkSpec {

  private val DocsDDL = "kb BIGINT, doc_id BIGINT, source STRING, n_chars BIGINT"
  private val TokDDL = "kb BIGINT, doc_id BIGINT, n_tokens BIGINT"

  private lazy val base: String = {
    val out = graft.io.TempDirs.scratch("graft_keyed_spec_")
    val docs = Tables.load(spark, sf0001, "documents")
    KeyedSource.stageKeyed(spark,
      docs.selectExpr("doc_id % 16 AS kb", "doc_id", "source", "n_chars"),
      s"$out/docs", "kb")
    KeyedSource.stageKeyed(spark,
      docs.selectExpr("doc_id % 16 AS kb", "doc_id",
        "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens"),
      s"$out/tok", "kb")
    out
  }

  private def readKeyed(dir: String, ddl: String) =
    spark.read.format("graft-keyed")
      .option("path", dir).option("schema", ddl).option("key", "kb").load()

  private def withSpjConfs[T](bucketing: String)(body: => T): T = {
    val kB = "spark.sql.sources.v2.bucketing.enabled"
    val kC = "spark.sql.requireAllClusterKeysForCoPartition"
    val oB = spark.conf.getOption(kB)
    val oC = spark.conf.getOption(kC)
    spark.conf.set(kB, bucketing)
    spark.conf.set(kC, "false")
    try body finally {
      oB.fold(spark.conf.unset(kB))(spark.conf.set(kB, _))
      oC.fold(spark.conf.unset(kC))(spark.conf.set(kC, _))
    }
  }

  test("round trip: keyed read == parquet-derived source, full schema") {
    val viaKeyed = readKeyed(s"$base/docs", DocsDDL).orderBy("doc_id").collect()
    val direct = Tables.load(spark, sf0001, "documents")
      .selectExpr("doc_id % 16 AS kb", "doc_id", "source", "n_chars")
      .orderBy("doc_id").collect()
    assert(viaKeyed.length == direct.length && viaKeyed.length > 0)
    assert(viaKeyed.sameElements(direct))
  }

  test("scan reports KeyGroupedPartitioning with one HasPartitionKey partition per key") {
    import org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning
    val df = readKeyed(s"$base/docs", DocsDDL)
    val scans = df.queryExecution.sparkPlan.collectLeaves()
      .collect { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
    assert(scans.length == 1)
    val scan = scans.head.scan
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportPartitioning]
    val part = scan.outputPartitioning()
    assert(part.isInstanceOf[KeyGroupedPartitioning],
      s"expected KeyGroupedPartitioning, got $part")
    assert(part.asInstanceOf[KeyGroupedPartitioning].numPartitions() == 16,
      "kb = doc_id % 16 stages exactly 16 key directories")
    val keys = scan.asInstanceOf[org.apache.spark.sql.connector.read.Batch]
      .planInputPartitions()
      .map(_.asInstanceOf[org.apache.spark.sql.connector.read.HasPartitionKey]
        .partitionKey().getLong(0)).toSeq
    assert(keys.sorted == (0L until 16L), s"one partition per key value, got $keys")
  }

  test("co-keyed join + keyed agg plan ZERO Exchange and stay value-correct") {
    withSpjConfs(bucketing = "true") {
      val j = readKeyed(s"$base/docs", DocsDDL).hint("merge")
        .join(readKeyed(s"$base/tok", TokDDL).hint("merge"), Seq("kb", "doc_id"))
        .groupBy("kb").agg(count(lit(1)).as("n"), sum("n_tokens").as("st"))
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"storage alignment must delete join AND agg shuffles:\n${p.take(2000)}")
      val expect = Tables.load(spark, sf0001, "documents")
        .selectExpr("doc_id % 16 AS kb",
          "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens")
        .groupBy("kb").agg(count(lit(1)).as("n"), sum("n_tokens").as("st"))
      assert(j.orderBy("kb").collect().sameElements(expect.orderBy("kb").collect()))
    }
  }

  test("conf-off degradation: report ignored, plan shuffles, values identical") {
    withSpjConfs(bucketing = "false") {
      val j = readKeyed(s"$base/docs", DocsDDL).hint("merge")
        .join(readKeyed(s"$base/tok", TokDDL).hint("merge"), Seq("kb", "doc_id"))
        .groupBy("kb").agg(count(lit(1)).as("n"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("Exchange"),
        "with v2 bucketing off the ordinary shuffled plan must come back")
      assert(j.agg(sum("n")).collect().head.getLong(0) ==
        Tables.load(spark, sf0001, "documents").count())
    }
  }

  test("column pruning reaches the keyed reader") {
    val df = readKeyed(s"$base/docs", DocsDDL)
      .groupBy("source").agg(sum("n_chars").as("sc"))
    val scans = df.queryExecution.sparkPlan.collectLeaves()
      .collect { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
    assert(scans.head.scan.readSchema().fieldNames.toSet == Set("source", "n_chars"),
      s"pruned read must decode exactly the referenced fields, got ${scans.head.scan.readSchema()}")
  }

  // ── r14: key-directory filter pushdown (q55) ──────────────────────

  private def scanOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.sparkPlan.collectLeaves()
      .collect { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
      .head.scan

  private def plannedParts(df: org.apache.spark.sql.DataFrame): Int =
    scanOf(df).asInstanceOf[org.apache.spark.sql.connector.read.Batch]
      .planInputPartitions().length

  private def hasPostScanFilter(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.sparkPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.FilterExec])

  test("pushed key equality prunes to ONE directory, fully consumed (no residual Filter)") {
    val df = readKeyed(s"$base/docs", DocsDDL).filter(col("kb") === 3)
    assert(plannedParts(df) == 1, "kb=3 must plan exactly the k=3 directory")
    assert(scanOf(df).description().contains("keys=[3]"),
      s"pushed keys must be visible in the scan: ${scanOf(df).description()}")
    // EXACT at directory grain ⇒ fully consumed: no Filter node survives
    assert(!hasPostScanFilter(df),
      s"exact pushdown must leave no residual Filter:\n${df.queryExecution.executedPlan}")
    val expect = Tables.load(spark, sf0001, "documents")
      .filter(expr("doc_id % 16 = 3")).count()
    assert(df.count() == expect && expect > 0)
  }

  test("pushed IN prunes to the matching directories; contradictions prune to zero") {
    val in = readKeyed(s"$base/docs", DocsDDL).filter(col("kb").isin(3, 5))
    assert(plannedParts(in) == 2, "kb IN (3,5) must plan exactly two directories")
    assert(in.count() == Tables.load(spark, sf0001, "documents")
      .filter(expr("doc_id % 16 IN (3, 5)")).count())
    // conflicting equalities never reach the connector: Catalyst
    // constant-folds kb=3 AND kb=5 to an empty relation and the scan
    // leaf disappears from the plan entirely (the builder's
    // Some(empty-set) intersection is the belt under that suspender)
    val none = readKeyed(s"$base/docs", DocsDDL)
      .filter(col("kb") === 3 && col("kb") === 5)
    assert(none.queryExecution.sparkPlan.collectLeaves().collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.isEmpty, "contradiction should fold the scan away before planning")
    assert(none.count() == 0)
    // a key value with no stored directory plans nothing and returns
    // nothing (the point-lookup miss path)
    val miss = readKeyed(s"$base/docs", DocsDDL).filter(col("kb") === 99)
    assert(plannedParts(miss) == 0)
    assert(miss.count() == 0)
  }

  test("OR of key equalities pushes: union prune, fully consumed; mixed OR refuses whole") {
    // kb = 3 OR kb = 5 reaches DSv2 as Or, never In — the most natural
    // SQL spelling of a two-key slate must prune like the IN twin
    val or = readKeyed(s"$base/docs", DocsDDL)
      .filter(col("kb") === 3 || col("kb") === 5)
    assert(plannedParts(or) == 2, "kb=3 OR kb=5 must plan exactly two directories")
    assert(!hasPostScanFilter(or),
      s"exact pushdown must leave no residual Filter:\n${or.queryExecution.executedPlan}")
    assert(or.count() == Tables.load(spark, sf0001, "documents")
      .filter(expr("doc_id % 16 IN (3, 5)")).count())
    // an OR arm the directory grain cannot answer poisons the WHOLE
    // predicate (partial consumption would return rows the filter
    // rejects): refuse, post-scan Filter, all directories planned
    val mixed = readKeyed(s"$base/docs", DocsDDL)
      .filter(col("kb") === 3 || col("n_chars") > 50)
    assert(plannedParts(mixed) == 16, "a non-key OR arm must refuse the prune")
    assert(hasPostScanFilter(mixed), "the refused OR must stay post-scan")
    assert(mixed.count() == Tables.load(spark, sf0001, "documents")
      .filter(expr("doc_id % 16 = 3 OR n_chars > 50")).count())
  }

  test("refusal leg: non-key and range predicates stay post-scan, all directories planned") {
    // non-key column: the directory structure cannot answer it
    val nonKey = readKeyed(s"$base/docs", DocsDDL).filter(col("n_chars") > 50)
    assert(plannedParts(nonKey) == 16,
      "a non-key predicate must not prune directories")
    assert(!scanOf(nonKey).description().contains("keys="))
    assert(hasPostScanFilter(nonKey),
      "the refused predicate must survive as a post-scan Filter")
    // range on the KEY: refused by the exact directory grain (only
    // equality/IN are consumed) and evaluated post-scan — but since
    // r18 the residual still SKIPS directories whose sidecar interval
    // proves it empty (the key column's per-directory min=max=k makes
    // a key range maximally skippable: 2 of 16 planned)
    val range = readKeyed(s"$base/docs", DocsDDL).filter(col("kb") > 13)
    assert(plannedParts(range) == 2, scanOf(range).description())
    assert(scanOf(range).description().contains("skipped=14"))
    assert(hasPostScanFilter(range))
    assert(range.count() == Tables.load(spark, sf0001, "documents")
      .filter(expr("doc_id % 16 > 13")).count())
    // composition: pushed key equality + refused non-key residual
    val both = readKeyed(s"$base/docs", DocsDDL)
      .filter(col("kb") === 3 && col("n_chars") > 50)
    assert(plannedParts(both) == 1)
    assert(hasPostScanFilter(both))
    assert(both.count() == Tables.load(spark, sf0001, "documents")
      .filter(expr("doc_id % 16 = 3 AND n_chars > 50")).count())
  }

  test("pushdown composes with column pruning: 1 of 16 directories AND only referenced fields") {
    val df = readKeyed(s"$base/docs", DocsDDL).filter(col("kb") === 3)
      .groupBy("source").agg(sum("n_chars").as("sc"))
    assert(plannedParts(df) == 1)
    assert(scanOf(df).readSchema().fieldNames.toSet == Set("source", "n_chars"))
  }

  // ── r14: runtime key pruning (q57 — connector-side DPP) ───────────

  test("runtime filter() prunes directories at execution time; unknown filters are safely ignored") {
    import org.apache.spark.sql.sources.{EqualTo, GreaterThan, In}
    def freshScan() = {
      val df = readKeyed(s"$base/docs", DocsDDL)
      scanOf(df).asInstanceOf[graft.sources.KeyedScan]
    }
    // IN on the key: 16 → 2 planned partitions, post-filter
    val s1 = freshScan()
    assert(s1.planInputPartitions().length == 16)
    s1.filter(Array[org.apache.spark.sql.sources.Filter](In("kb", Array(2L, 7L))))
    assert(s1.planInputPartitions().length == 2,
      "runtime IN must re-prune the directory listing")
    // runtime ∩ runtime: a second filter intersects, never widens
    s1.filter(Array[org.apache.spark.sql.sources.Filter](EqualTo("kb", 7L)))
    assert(s1.planInputPartitions().length == 1)
    // an unrecognized runtime filter is IGNORED (pruning is an
    // optimization — the join drops unmatched rows), never a refusal
    // and never a wrong prune
    val s2 = freshScan()
    s2.filter(Array[org.apache.spark.sql.sources.Filter](GreaterThan("n_chars", 50L)))
    assert(s2.planInputPartitions().length == 16)
  }

  test("dim-data-only predicate prunes the keyed scan at runtime (q57 e2e): 3 of 16 read") {
    val dimDf = Tables.load(spark, sf0001, "documents")
      .selectExpr("doc_id % 16 AS kb").distinct()
      .selectExpr("kb", "CASE WHEN kb % 5 = 2 THEN 'focus' ELSE 'regular' END AS kind")
    val dimPath = graft.io.TempDirs.scratch("graft_keyed_dim_") + "/dim"
    dimDf.coalesce(1).write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.schema("kb BIGINT, kind STRING").parquet(dimPath)
    val q = readKeyed(s"$base/docs", DocsDDL)
      .join(broadcast(dim), "kb")
      .filter(col("kind") === "focus")
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    // the optimizer injected a dynamic-pruning subquery ON THE SCAN —
    // no kb literal exists anywhere in the query text
    val planStr = q.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"),
      s"expected a runtime filter on the keyed scan:\n${planStr.take(1500)}")
    val expect = Tables.load(spark, sf0001, "documents")
      .filter(expr("(doc_id % 16) % 5 = 2"))
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    // execute q ITSELF (an orderBy variant would build a fresh query
    // execution with its own scan instance, and the probe below would
    // read an un-executed scan — the first version of this test did
    // exactly that and saw 16)
    val got = q.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val want = expect.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(got.sameElements(want) && got.nonEmpty)
    // execution mutated the scan through filter(): the planned set is
    // now the 3 focus directories, not 16 — the I/O-volume lever.
    // (AQE's final plan nests scans inside QueryStageExec LEAVES;
    // descend into stage plans explicitly.)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def scans(p: SparkPlan): Seq[BatchScanExec] = p.collect {
      case b: BatchScanExec => Seq(b)
      case s: QueryStageExec => scans(s.plan)
    }.flatten
    val fp = q.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = scans(fp).head.scan.asInstanceOf[graft.sources.KeyedScan]
    assert(scan.planInputPartitions().length == 3,
      "runtime pruning must have narrowed the scan to the focus keys")
  }

  test("SPJ × runtime filtering interaction: values always correct; structure recorded") {
    // the two r13/r14 levers can meet in one plan: a zero-Exchange
    // co-keyed fact⋈fact join whose key set is then narrowed by a
    // dim-data-only predicate. Runtime pruning one side of an aligned
    // join is exactly the shape where a connector could corrupt
    // results (partition-value alignment against a pruned subset), so
    // this pins CORRECTNESS unconditionally and records the structure
    // the planner actually chose (SPJ kept or degraded, scans pruned
    // or not) — the contract is "never wrong, prune when the planner
    // lets us", not a specific plan shape across Spark versions.
    withSpjConfs(bucketing = "true") {
      val dimDf = Tables.load(spark, sf0001, "documents")
        .selectExpr("doc_id % 16 AS kb").distinct()
        .selectExpr("kb", "CASE WHEN kb % 5 = 2 THEN 'focus' ELSE 'regular' END AS kind")
      val dimPath = graft.io.TempDirs.scratch("graft_keyed_dim2_") + "/dim"
      dimDf.coalesce(1).write.mode("overwrite").parquet(dimPath)
      val dim = spark.read.schema("kb BIGINT, kind STRING").parquet(dimPath)
      val q = readKeyed(s"$base/docs", DocsDDL).hint("merge")
        .join(readKeyed(s"$base/tok", TokDDL).hint("merge"), Seq("kb", "doc_id"))
        .join(broadcast(dim), "kb")
        .filter(col("kind") === "focus")
        .groupBy("kb").agg(count(lit(1)).as("n"), sum("n_tokens").as("st"))
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val want = Tables.load(spark, sf0001, "documents")
        .selectExpr("doc_id % 16 AS kb",
          "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens")
        .filter(expr("kb % 5 = 2"))
        .groupBy("kb").agg(count(lit(1)).as("n"), sum("n_tokens").as("st"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(got.sameElements(want) && got.length == 3,
        s"SPJ + runtime pruning must never change values: got ${got.mkString(",")}")
      // record the structure for the round log: exchanges in the final
      // plan and the executed scans' post-filter partition counts
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
      def scans(p: SparkPlan): Seq[BatchScanExec] = p.collect {
        case b: BatchScanExec => Seq(b)
        case s: QueryStageExec => scans(s.plan)
      }.flatten
      val fp = q.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val counts = scans(fp).filter(_.scan.isInstanceOf[graft.sources.KeyedScan])
        .map(_.scan.asInstanceOf[graft.sources.KeyedScan].planInputPartitions().length)
      val nEx = fp.toString.split("Exchange").length - 1
      info(s"keyed scans post-execution partitions: ${counts.mkString(",")}; exchanges: $nEx")
    }
  }

  test("no streaming leg, by analysis: readStream refuses at plan time (r14 negative)") {
    // the overwrite-by-key layout cannot back incremental offsets (see
    // KeyedTable scaladoc); the table declares BATCH_READ only, so the
    // refusal is Spark's analysis-time unsupported-streaming error,
    // not an executor-deep surprise
    val e = intercept[Exception] {
      spark.readStream.format("graft-keyed")
        .option("path", s"$base/docs").option("schema", DocsDDL)
        .option("key", "kb").load()
    }
    assert(e.getMessage.toLowerCase.contains("stream"),
      s"expected the unsupported-streaming analysis error, got: ${e.getMessage}")
  }

  test("framing guard: NULL field fails the stage write loudly") {
    import spark.implicits._
    val bad = Seq((1L, Some("ok"), 2L), (2L, None: Option[String], 3L))
      .toDF("kb", "s", "v")
    val e = intercept[Exception] {
      KeyedSource.stageKeyed(spark, bad,
        graft.io.TempDirs.scratch("graft_keyed_bad_") + "/t", "kb")
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("framing violation")))
  }

  test("key contract: key must be declared, and a non-dirname STRING key is refused") {
    val e1 = intercept[Exception] {
      spark.read.format("graft-keyed").option("path", s"$base/docs")
        .option("schema", DocsDDL).load().collect()
    }
    assert(e1.getMessage.contains("key"))
    import spark.implicits._
    val e2 = intercept[Exception] {
      KeyedSource.stageKeyed(spark,
        Seq(("has space", 1L)).toDF("k", "v"),
        graft.io.TempDirs.scratch("graft_keyed_badkey_") + "/t", "k")
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e2).exists(m => m != null && m.contains("framing violation")))
  }
}
