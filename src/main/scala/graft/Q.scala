package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: the Spark-native implementation plus (when the
  * semantics are ANSI-SQL-expressible) its DuckDB oracle twin run by the
  * driver against the same parquet tables (see Verify.scala).
  *
  * Oracle-parity rules (SURVEY.md §5/§7.5, FIXTURES.md §C):
  *   - no current_date()/current_timestamp(); literal pivots only
  *   - every ordered query carries a total deterministic tie-break
  *   - computed doubles are either exact (integer-valued sums, cents
  *     trick) or rounded; column names aliased identically on both sides
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")
