package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session: Spark
  * re-use beats per-suite startup). Mirrors the Verify/Bench builder
  * configs — UTC, nanos-as-long for the events table, small shuffle
  * fan-out for tiny test data. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  lazy val sf0001 = "/root/testdata/sf0.001"
  /** Bench-scale corpus: present on the driver box, optional elsewhere —
    * suites touching it must assume() on [[sf01Exists]] (cancel, not fail). */
  lazy val sf01 = "/root/testdata/sf0.1"
  lazy val sf01Exists: Boolean = new java.io.File(sf01).exists()
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.warehouse.dir", graft.io.TempDirs.scratch("graft-warehouse"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
