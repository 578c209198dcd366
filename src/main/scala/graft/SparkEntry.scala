package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every entry is a
  * Spark-first implementation of one capability from SURVEY.md §2; the
  * oracle map carries the DuckDB twin the driver hash-compares against.
  */
object SparkEntry {

  private def modules: Seq[Map[String, Q]] = Seq(
    operators.Relational.queries,
    operators.Analytics.queries,
    operators.LlmData.queries,
    operators.Curation.queries,
    operators.Shaping.queries,
    operators.EtlCapstone.queries
  )

  private lazy val all: Map[String, Q] = modules.reduce(_ ++ _)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q01_top10_star_join").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, q) if q.oracle.isDefined => k -> q.oracle.get }
}
