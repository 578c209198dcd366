package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Skew mitigation by key salting (SURVEY.md §2 scale notes: "skewed
  * keys → salting or AQE skew-join").
  *
  * AQE's skew-join split covers sort-merge joins at runtime; salting is
  * the explicit tool for the cases AQE can't re-plan — a hot key inside
  * a shuffle that must exist (e.g. a billion-row key joined against a
  * replicable right side). The salt spreads one hot key over `salts`
  * reducers at the cost of replicating the (small) other side `salts`
  * times — the classic space-for-balance trade.
  */
object Skew {

  /** Columns usable as xxhash64 input: map types (at any nesting) are
    * unhashable without a legacy flag, so they are excluded from the
    * salt. Falls back to a constant (no spreading, still correct) in
    * the degenerate all-map schema. */
  private def hashableCols(df: DataFrame): Seq[Column] = {
    def ok(dt: DataType): Boolean = dt match {
      case _: MapType => false
      case ArrayType(et, _) => ok(et)
      case st: StructType => st.fields.forall(f => ok(f.dataType))
      case _ => true
    }
    val cs = df.schema.fields.toSeq.filter(f => ok(f.dataType)).map(f => col(f.name))
    if (cs.isEmpty) Seq(lit(0L)) else cs
  }

  /** Equi-join `fact ⋈ dim` on `key`, with the fact side salted and the
    * dim side replicated per salt. Result is row-identical to the
    * unsalted join; the shuffle key becomes (key, salt) so a hot fact
    * key lands on `salts` reducers instead of one.
    *
    * The salt is a hash of the full row content — DETERMINISTIC under
    * task retry. A nondeterministic salt (random / row id) re-salts
    * differently when a lost map task recomputes after a fetch
    * failure, double-counting or dropping rows downstream. Content
    * hashing spreads a hot key as long as its rows differ in other
    * columns; fully identical duplicate rows co-bucket (documented
    * trade — dedup them first if that matters).
    */
  /** The salt derivation, exposed so measurements (SkewSpec's spread
    * audit) exercise the SHIPPED formula instead of re-deriving it —
    * a re-derivation keeps passing after the implementation drifts. */
  private[graft] def saltColumn(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(hashableCols(df): _*), lit(salts.toLong))

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedFact = fact.withColumn("__salt", saltColumn(fact, salts))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation for decomposable aggregates where a
    * single reducer would drown in one key's partials (extreme
    * cardinality skew in high-fan-in shuffles). Phase 1 aggregates on
    * (key, salt); phase 2 combines per key. For plain sum/count Spark's
    * map-side partial aggregation usually suffices — this is the
    * explicit form for when it doesn't (e.g. partial state too wide to
    * combine map-side).
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    df.withColumn("__salt", saltColumn(df, salts))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum("__psum").as(s"sum_$valueCol"), sum("__pcnt").as("n"))
  }
}
