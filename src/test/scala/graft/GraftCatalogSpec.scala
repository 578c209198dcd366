package graft

import graft.sources.{GraftCatalog, KeyedSource}

/** Catalog registration lifetime (r17 — the metastore-lite closure of
  * the "session-scoped registry" note). Pins:
  * (1) registrations are JVM-shared per catalog NAME: the sessions
  *     Structured Streaming clones for foreachBatch resolve the same
  *     tables (the streamed `MERGE INTO cat.t` path — exercised
  *     end-to-end by KeyedStreamWriteSpec's upsert loop — used to fail
  *     TABLE_NOT_FOUND in the clone);
  * (2) with the `warehouse` catalog option, DDL persists the Spec map
  *     to `_graft_catalog` — a fresh catalog (modeling a new JVM)
  *     pointed at the same warehouse recovers its tables;
  * (3) DROP persists too, and the layout bytes stay untouched
  *     (external-table semantics). */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  test("clone-visible registry and warehouse-backed recovery") {
    val base = graft.io.TempDirs.scratch("graft_cat_")
    val dir = s"$base/t"; val wh = s"$base/warehouse"
    KeyedSource.stageKeyed(spark,
      (0L until 8L).map(i => (i % 4L, i, i * 3L)).toDF("kb", "doc_id", "n_chars"),
      dir, "kb", sortBy = Seq("doc_id"), retain = 2)

    spark.conf.set("spark.sql.catalog.gcat1", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat1.warehouse", wh)
    spark.sql("DROP TABLE IF EXISTS gcat1.docs")
    spark.sql(
      s"""CREATE TABLE gcat1.docs (kb BIGINT, doc_id BIGINT, n_chars BIGINT)
         |USING `graft-keyed` LOCATION '$dir'
         |TBLPROPERTIES('key'='kb','sortBy'='doc_id','retain'='2')""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM gcat1.docs").head().getLong(0) == 8L)

    // a SECOND session instantiating the same catalog NAME gets a
    // fresh GraftCatalog instance — it must resolve the table through
    // the JVM-shared registry (the foreachBatch clone shape; the
    // streamed MERGE leg is end-to-end in KeyedStreamWriteSpec)
    val second = spark.newSession()
    second.conf.set("spark.sql.catalog.gcat1", classOf[GraftCatalog].getName)
    second.conf.set("spark.sql.catalog.gcat1.warehouse", wh)
    assert(second.sql("SELECT count(*) FROM gcat1.docs").head().getLong(0) == 8L)

    // a FRESH catalog name over the same warehouse (modeling a new JVM
    // whose in-memory registry is empty) recovers the registration
    assert(new java.io.File(wh, "_graft_catalog").exists(),
      "DDL must persist the spec store under the warehouse")
    spark.conf.set("spark.sql.catalog.gcat2", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcat2.warehouse", wh)
    assert(spark.sql("SELECT count(*) FROM gcat2.docs").head().getLong(0) == 8L)
    assert(spark.sql("SELECT sum(n_chars) FROM gcat2.docs").head().getLong(0) ==
      (0L until 8L).map(_ * 3L).sum)

    // DROP persists (the store no longer lists the table) and leaves
    // the layout bytes untouched
    spark.sql("DROP TABLE gcat1.docs")
    val store = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(wh, "_graft_catalog")))
    assert(!store.contains("docs"), s"dropped table still in store: $store")
    assert(KeyedSource.readCommitLog(dir,
      spark.sessionState.newHadoopConf()).isDefined,
      "DROP must leave the layout bytes")
  }

  test("materialized views: catalog-registered spec, derived refresh interval, warehouse persistence (r19)") {
    import org.apache.spark.sql.connector.catalog.Identifier
    val base = graft.io.TempDirs.scratch("graft_catmv_")
    val dir = s"$base/src"; val wh = s"$base/warehouse"
    KeyedSource.stageKeyed(spark,
      (0L until 64L).map(i => (i % 4L, i, (i * 3L) % 17L))
        .toDF("kb", "doc_id", "n_chars"),
      dir, "kb", retain = 4)
    spark.conf.set("spark.sql.catalog.gmv", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmv.warehouse", wh)
    spark.sql("DROP TABLE IF EXISTS gmv.src")
    spark.sql("DROP TABLE IF EXISTS gmv.v")
    spark.sql(
      s"""CREATE TABLE gmv.src (kb BIGINT, doc_id BIGINT, n_chars BIGINT)
         |USING `graft-keyed` LOCATION '$dir'
         |TBLPROPERTIES('key'='kb','retain'='4')""".stripMargin)
    val cat = spark.sessionState.catalogManager.catalog("gmv")
      .asInstanceOf[GraftCatalog]
    cat.createMaterializedView(Identifier.of(Array.empty, "v"),
      Identifier.of(Array.empty, "src"),
      group = "kb", sums = Seq("n_chars"), minMax = Seq("n_chars"),
      viewPath = s"$base/view")

    // bootstrap equals the recompute, readable as an ordinary table
    def recompute() = spark.sql(
      """SELECT kb, count(*) AS n_rows, sum(n_chars) AS sum_n_chars,
        |  min(n_chars) AS min_n_chars, max(n_chars) AS max_n_chars
        |FROM gmv.src GROUP BY kb ORDER BY kb""".stripMargin)
      .collect().toSeq.map(_.toSeq)
    def view() = spark.sql("SELECT * FROM gmv.v ORDER BY kb")
      .collect().toSeq.map(_.toSeq)
    assert(view() == recompute())

    // a no-op refresh advances nothing and rewrites nothing
    val seq0 = KeyedSource.readCommitLog(s"$base/view",
      spark.sessionState.newHadoopConf()).get.head.seq
    cat.refreshMaterializedView(Identifier.of(Array.empty, "v"))
    assert(KeyedSource.readCommitLog(s"$base/view",
      spark.sessionState.newHadoopConf()).get.head.seq == seq0,
      "a refresh with nothing to apply must not rewrite the view")

    // mixed DML, ONE refresh — no interval or apply wiring anywhere
    spark.sql("UPDATE gmv.src SET n_chars = n_chars + 100 WHERE doc_id % 5 = 0")
    spark.sql("DELETE FROM gmv.src WHERE n_chars >= 100")
    val applied = cat.refreshMaterializedView(Identifier.of(Array.empty, "v"))
    assert(view() == recompute())
    assert(cat.listMaterializedViews()(Identifier.of(Array.empty, "v")) == applied)

    // persistence: a fresh catalog name over the same warehouse (a new
    // JVM's empty registry) recovers the MV spec AND can refresh it
    assert(new java.io.File(wh, "_graft_catalog_mv").exists())
    spark.conf.set("spark.sql.catalog.gmv2", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmv2.warehouse", wh)
    spark.sql("UPDATE gmv2.src SET n_chars = n_chars + 1 WHERE doc_id = 1")
    val cat2 = spark.sessionState.catalogManager.catalog("gmv2")
      .asInstanceOf[GraftCatalog]
    cat2.refreshMaterializedView(Identifier.of(Array.empty, "v"))
    assert(spark.sql("SELECT * FROM gmv2.v ORDER BY kb").collect().toSeq.map(_.toSeq)
      == recompute())

    // DROP forgets spec + maintenance state, leaves the view bytes
    spark.sql("DROP TABLE gmv.v")
    assert(cat.listMaterializedViews().isEmpty)
    assert(KeyedSource.readCommitLog(s"$base/view",
      spark.sessionState.newHadoopConf()).isDefined)

    // refusals: FP sums and a non-keyable group refuse at create
    val fp = intercept[IllegalArgumentException] {
      cat.createMaterializedView(Identifier.of(Array.empty, "v2"),
        Identifier.of(Array.empty, "src"), "kb",
        sums = Seq("missing"), minMax = Seq.empty, viewPath = s"$base/v2")
    }
    assert(fp.getMessage.contains("not a source column"), fp.getMessage)
  }
}
