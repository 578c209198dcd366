package graft

import graft.operators.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q56's statistics-driven planning lever (r13 verdict #2): ANALYZE'd
  * catalog tables + spark.sql.cbo.enabled/joinReorder.enabled must flip
  * a deliberately bad syntactic join order — the two-plan audit the
  * q51-DPP discipline asks for, pinned from the plans themselves.
  *
  * The shape: (orders ⋈ customer) ⋈ σ(n_name='NATION_7')(nation).
  * Stats-blind, Spark keeps syntactic order and the first join
  * materializes every (order, customer) pair before the 25×-selective
  * nation filter touches the pipeline. With row+column stats,
  * CostBasedJoinReorder's cardinality estimates put the filtered
  * dimension chain FIRST and the big fact table LAST — the decision a
  * 100 TB warehouse cannot hand-hint query by query.
  */
class CboSpec extends SparkSpec {

  /** Leaf catalog-table names of the optimized plan, left-to-right —
    * the join ORDER as the optimizer fixed it. */
  private def leafOrder(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().map { leaf =>
      val s = leaf.toString
      Seq("orders", "customer", "nation").find(t => s.contains(s"graft_cbo_${t}_"))
        .getOrElse("?")
    }

  /** The q56 join, built verbatim against the ANALYZE'd tables in
    * whatever session `c` is — same logical shape, different planner
    * state. */
  private def joined(c: SparkSession, tag: String): DataFrame = {
    val o = c.table(s"graft_cbo_orders_$tag")
    val cu = c.table(s"graft_cbo_customer_$tag")
    val n = c.table(s"graft_cbo_nation_$tag")
    o.join(cu, o("o_custkey") === cu("c_custkey"))
      .join(n, cu("c_nationkey") === n("n_nationkey"))
      .filter(n("n_name") === "NATION_7")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"))
  }

  test("stats + CBO flip the bad syntactic join order; stats-blind keeps it") {
    val cbo = Relational.cboSession(spark)
    val tag = Relational.cboTables(cbo, sf0001)

    // WITHOUT cbo (fresh child session, same ANALYZE'd catalog tables,
    // flags off): the optimizer keeps the syntactic order — the big
    // fact table leads
    val plain = spark.newSession()
    Seq("spark.sql.session.timeZone" -> "UTC",
        "spark.sql.legacy.parquet.nanosAsLong" -> "true")
      .foreach { case (k, v) => plain.conf.set(k, v) }
    val off = leafOrder(joined(plain, tag))
    assert(off.head == "orders",
      s"stats-blind plan should keep the written order, got $off")

    // WITH cbo + stats: the filtered dimension chain leads, the fact
    // table is joined LAST
    val on = leafOrder(joined(cbo, tag))
    assert(on.last == "orders",
      s"CBO should join the big fact table last, got $on")
    assert(on != off, s"join order must actually flip: $on vs $off")

    // same answer either way — the lever moves COST, never values
    val a = joined(plain, tag).orderBy("c_mktsegment").collect()
    val b = joined(cbo, tag).orderBy("c_mktsegment").collect()
    assert(a.sameElements(b) && a.nonEmpty)
  }

  test("ANALYZE recorded row counts and column stats the reorder fed on") {
    val cbo = Relational.cboSession(spark)
    val tag = Relational.cboTables(cbo, sf0001)
    for (t <- Seq("orders", "customer", "nation")) {
      val cat = cbo.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(s"graft_cbo_${t}_$tag"))
      val st = cat.stats
      assert(st.isDefined && st.get.rowCount.isDefined,
        s"$t must carry a row count after ANALYZE")
      assert(st.get.colStats.nonEmpty, s"$t must carry column stats")
    }
  }

  test("q61: connector statistics alone flip the join order on pure DSv2 leaves (r14 #4)") {
    val cbo = Relational.cboSession(spark)
    val root = Relational.cboKeyedLayouts(cbo, sf0001)
    def rd(c: SparkSession, sub: String, schema: String, key: String) =
      c.read.format("graft-keyed").option("path", s"$root/$sub")
        .option("schema", schema).option("key", key).load()
    def joined(c: SparkSession): DataFrame = {
      val docs = rd(c, "docs", "source STRING, doc_id BIGINT, n_chars BIGINT", "source")
      val tok = rd(c, "tok", "kb BIGINT, doc_id BIGINT, n_tokens BIGINT", "kb")
        .select("doc_id", "n_tokens")
      val dim = rd(c, "dim", "source STRING, kind STRING", "source")
      docs.join(tok, "doc_id").join(dim, "source")
        .filter(col("kind") === "focus")
        .groupBy("source").agg(count(lit(1)).as("n_docs"))
    }
    // leaf identity by path suffix — all three are connector scans, no
    // catalog tables anywhere in the plan
    def order(df: DataFrame): Seq[String] = {
      val leaves = df.queryExecution.optimizedPlan.collectLeaves()
      assert(leaves.forall(_.isInstanceOf[
        org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation]),
        s"q61 must plan pure connector leaves, got\n${leaves.mkString("\n")}")
      leaves.map { l =>
        val s = l.asInstanceOf[
          org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation]
          .scan.description()
        Seq("docs", "tok", "dim").find(t => s.contains(s"/$t ")
          || s.contains(s"/$t") && s.contains(s"path=$root/$t")).getOrElse("?")
      }
    }
    // stats-blind (fresh child session, flags off): syntactic order —
    // the fact⋈fact pair leads, the filtered dim joins last
    val plain = spark.newSession()
    plain.conf.set("spark.sql.session.timeZone", "UTC")
    val off = order(joined(plain))
    assert(off.take(2).toSet == Set("docs", "tok"),
      s"stats-blind plan should keep the written fact-first order, got $off")
    // CBO + connector stats: the selective dim chain joins BEFORE the
    // second fact — the big tok read is last
    val on = order(joined(cbo))
    assert(on.last == "tok",
      s"connector-stats CBO should join the second fact last, got $on")
    assert(on != off, s"join order must actually flip: $on vs $off")
    // values identical either way
    assert(joined(plain).orderBy("source").collect()
      .sameElements(joined(cbo).orderBy("source").collect()))
  }

  test("the connector reports the column statistics the q61 reorder fed on") {
    val cbo = Relational.cboSession(spark)
    val root = Relational.cboKeyedLayouts(cbo, sf0001)
    val dim = cbo.read.format("graft-keyed").option("path", s"$root/dim")
      .option("schema", "source STRING, kind STRING").option("key", "source").load()
    val scan = dim.queryExecution.sparkPlan.collectLeaves()
      .collect { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
      .head.scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
    val st = scan.estimateStatistics()
    assert(st.numRows.getAsLong == 20L)
    val cols = st.columnStats()
    assert(!cols.isEmpty, "v2 sidecar table line must surface as column statistics")
    import scala.jdk.CollectionConverters._
    val byName = cols.asScala.map { case (k, v) => k.fieldNames()(0) -> v }.toMap
    assert(byName("source").distinctCount.getAsLong == 20L, "key NDV is exact")
    assert(byName("kind").distinctCount.getAsLong == 2L,
      "kind NDV feeds the focus-filter selectivity")
    assert(byName("kind").nullCount.getAsLong == 0L)
  }

  test("cbo flags live on the child session only — the parent planner state is untouched") {
    val cbo = Relational.cboSession(spark)
    assert(cbo.conf.get("spark.sql.cbo.enabled") == "true")
    assert(spark.conf.get("spark.sql.cbo.enabled") == "false",
      "q56 must not leak CBO estimation into other registered plans")
    // and the child is ONE per parent session, not one per call — the
    // staging memo and catalog cache keep working across invocations
    assert(Relational.cboSession(spark) eq cbo)
  }
}
