package graft

import org.apache.spark.sql.functions._

/** x33's HLL++ sketches have no DuckDB twin (different HLL
  * construction), so the correctness story lives here: the approximate
  * distinct counts must sit within the configured relative standard
  * deviation of the exact counts. */
class SketchSpec extends SparkSpec {

  test("approx distinct counts stay within ~3x rsd of exact") {
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
    val approx = SparkEntry.queries("x33_hll_distinct")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = docs.groupBy("lang")
      .agg(countDistinct("text").as("t"), countDistinct("source").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    for ((lang, (at, as)) <- approx) {
      val (et, es) = exact(lang)
      assert(math.abs(at - et) <= math.max(3, 0.06 * et),
        s"$lang texts: approx=$at exact=$et")
      assert(math.abs(as - es) <= math.max(3, 0.06 * es),
        s"$lang sources: approx=$as exact=$es")
    }
  }
}
