package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Session warmup: absorb the one-time init (executor threads,
    // parquet footer reads, OS page cache, codegen bootstrap, noop-sink
    // lookup) for EVERY table — otherwise each table's cold first read
    // lands on whichever query the Map ordering happens to put first,
    // making that query's number order-dependent rather than
    // plan-proportional (x33 measured 11.6 s cold vs 1.3 s warm purely
    // from drawing the first documents scan).
    // Guarded per table: a missing/corrupt table must degrade to a cold
    // first query, not abort before the JSON line the driver parses.
    sources.Tables.schemas.keys.foreach { name =>
      try {
        spark.read.schema(sources.Tables.schemas(name))
          .parquet(s"$sfDir/$name.parquet")
          .write.format("noop").mode("overwrite").save()
      } catch { case _: Throwable => () }
    }
    // Write to the built-in noop sink so every column is materialized:
    // a bare count() lets Catalyst prune unreferenced projections and
    // under-measures scalar-heavy queries.
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // -1 marks a failed query: a thrown query must not masquerade as a
      // fast one in BENCH_*.json
      val secs =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case _: Throwable => -1.0 }
      // drop per-query persisted signature tables so one query's cache
      // can't pressure the next query's measurement
      operators.LlmData.clearMemo(spark)
      name -> secs
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.filter(_ >= 0).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
