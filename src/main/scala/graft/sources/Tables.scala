package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Testdata catalog (TESTDATA.md / FIXTURES.md §A): explicit StructTypes
  * for every table — never `inferSchema`. At 100 TB an inferred read
  * costs a footer-sampling job over the whole listing before the real
  * scan; a declared schema plans immediately and lets Catalyst prune
  * columns/partitions against it.
  *
  * The reference pushes projection and filters to its source
  * (`/root/reference/lambda/extraction/lambda_function.py:146-161`);
  * here the same behaviors are Catalyst's ColumnPruning /
  * PushDownPredicates against these parquet scans.
  */
object Tables {

  val region = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitem = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS) which Spark's
    * parquet reader rejects natively; with the legacy conf it surfaces
    * as nanos-since-epoch Long and we truncate to micros — exactly what
    * DuckDB's micro-precision TIMESTAMP does on the same file, keeping
    * oracle parity. Division must be integral (`div`): a Long→Double
    * round-trip at 1.7e18 ns loses precision.
    */
  val eventsRaw = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings = StructType(Seq(
    StructField("vec_id", LongType),
    // file scans force containsNull = true on read regardless of what
    // is declared here — FuseDotProductRule stays sound under that by
    // being null-element-exact, not by relying on this type
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  val schemas: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> eventsRaw,
    "documents" -> documents, "embeddings" -> embeddings)

  /** Load one testdata table with its declared schema. `events` comes
    * back with `ts` already converted to micro-precision TimestampType.
    *
    * Reading `events` requires `spark.sql.legacy.parquet.nanosAsLong=
    * true` in the session (set once by the Verify/Bench/test session
    * builders — a loader must not mutate shared session state as a
    * side effect of a table name).
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Events at or after `isoUtc`, with the predicate applied to the RAW
    * nanos column *before* the timestamp conversion. A filter on the
    * derived `ts` cannot reach the scan (no pushdown through
    * `timestamp_micros(x div 1000)`), so at 100 TB it reads every
    * row-group; comparing the stored long directly pushes down and
    * prunes row-groups on parquet min/max stats. The literal is
    * converted once on the driver.
    */
  def eventsSince(spark: SparkSession, sfDir: String, isoUtc: String): DataFrame = {
    val instant = java.time.Instant.parse(isoUtc)
    // exact nanos: epochMilli * 1e6 would silently drop sub-millisecond
    // fractions of the pivot, off-by-up-to-1ms on the filter boundary
    val nanos = instant.getEpochSecond * 1000000000L + instant.getNano
    spark.read.schema(eventsRaw).parquet(s"$sfDir/events.parquet")
      .filter(col("ts") >= nanos)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
