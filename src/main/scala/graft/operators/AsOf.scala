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
  * Semantics match SQL ASOF (DuckDB-verified by q22's oracle):
  *   - right rows with NULL time can never satisfy `left >= right` and
  *     are dropped up front (left in the window they would sort first
  *     and fabricate matches);
  *   - left rows with NULL time get a NULL match (they sort before all
  *     timed rows, where nothing has carried yet);
  *   - the payload carries as ONE struct, so a legitimately-NULL field
  *     in the matched right row stays NULL instead of resurrecting a
  *     stale value from an older row (per-column carry would also mix
  *     fields from different right rows);
  *   - ties left-time == right-time match (inclusive; right rows sort
  *     before left rows at equal time).
  *
  * Right rows must be unique per (key, time) — pre-aggregate to pick a
  * deterministic winner (e.g. max id) or the match is plan-dependent.
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
    val collisions = payload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"payload columns collide with left columns: ${collisions.mkString(", ")}")
    require(rightTime != key, "rightTime must be a distinct column from the key")

    val leftCols = left.columns
    val r = right.filter(col(rightTime).isNotNull)
      .select(col(key), col(rightTime).as("__t"),
        struct(payload.map(col): _*).as("__match"))
      .withColumn("__side", lit(0))
    val matchType = r.schema("__match").dataType
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__match", lit(null).cast(matchType))
    val rAligned = leftCols.filterNot(_ == key).foldLeft(r)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val cols = (Seq(key, "__t", "__side", "__match") ++ leftCols.filterNot(_ == key)).map(col)
    val unioned = l.select(cols: _*).unionByName(rAligned.select(cols: _*))
    val w = Window.partitionBy(key)
      .orderBy(col("__t").asc_nulls_first, col("__side").asc, col(leftId).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__match", last(col("__match"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    payload.foldLeft(carried)((df, c) => df.withColumn(c, col("__match").getField(c)))
      .drop("__t", "__side", "__match")
  }
}
