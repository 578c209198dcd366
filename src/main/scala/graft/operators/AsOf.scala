package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for every left row, the single right
  * row with the greatest right-time <= left-time within the same key.
  * The training-data staple Spark has no native operator for
  * (builder-brief ladder step (a): compose existing ops when the
  * semantics allow).
  *
  * Formulation: union both sides, one window pass per key ordered by
  * time with a last-non-null carry-forward, keep the left rows. ONE
  * shuffle on the key and a linear scan per partition — versus the
  * naive range-join (quadratic per key) or per-row subqueries. This is
  * the shape that survives 100 TB: state per key is a single carried
  * value, and skewed keys salt like any other window.
  *
  * Right rows must be unique per (key, time) — pre-aggregate to pick a
  * deterministic winner (e.g. max id) or the match would be
  * plan-dependent. Ties left-time == right-time match (inclusive, the
  * standard ASOF >= semantics; right rows sort before left rows at
  * equal time).
  */
object AsOf {

  /** @param left       probe side
    * @param right      reference side, unique per (key, time)
    * @param key        equi-join key column name (same name both sides)
    * @param leftTime   left event-time column name
    * @param rightTime  right event-time column name
    * @param payload    right columns carried to the output (as-of match)
    * @param leftId     unique left column for a total window order
    */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String],
      leftId: String): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    val r = right.withColumnRenamed(key, "__rk")
      .withColumn("__t", col(rightTime)).withColumn("__side", lit(0))
      .withColumnRenamed("__rk", key)
    // align schemas: each side gets the other's columns as typed nulls
    val lAligned = payload.foldLeft(l)((df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    val rAligned = leftCols.filterNot(_ == key).foldLeft(r)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val cols = (Seq(key, "__t", "__side") ++ leftCols.filterNot(_ == key) ++ payload)
      .distinct.map(col)
    val unioned = lAligned.select(cols: _*).unionByName(rAligned.select(cols: _*))
    val w = Window.partitionBy(key)
      .orderBy(col("__t").asc, col("__side").asc, col(leftId).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned)((df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    carried.filter(col("__side") === 1).drop("__t", "__side")
  }
}
