package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable rounding for oracle-checked double outputs.
  *
  * `round(double, n)` is a parity trap: Spark rounds the shortest
  * decimal representation HALF_UP while DuckDB rounds the binary
  * value, so a true decimal expansion sitting on a half boundary at
  * the target precision diverges (observed: 69.195 -> Spark 69.2,
  * DuckDB 69.19 at sf0.001). `floor(x * 10^n + 0.5) / 10^n` is pure
  * IEEE double arithmetic — both engines evaluate the identical
  * operations on the identical bits, so the result is equal by
  * construction (negative values round toward +inf; consistently on
  * both sides, which is all the oracle needs).
  */
object Rounding {

  /** Portable fixed-point rounding; the DuckDB twin is
    * [[duckRound]] over the same expression text. */
  def pround(c: Column, digits: Int): Column = {
    val f = math.pow(10, digits)
    floor(c * f + 0.5) / f
  }

  /** DuckDB SQL fragment computing exactly [[pround]]. */
  def duckRound(sqlExpr: String, digits: Int): String = {
    val f = ("1" + "0" * digits) + ".0"
    s"floor(($sqlExpr) * $f + 0.5) / $f"
  }

  /** Exact order-independent sum for 2-decimal monetary doubles:
    * sum(round(x*100) as long) / 100.0. ONE definition shared by every
    * batch query and its streaming twin — the batch/stream equality
    * tests rely on the expressions being literally the same. */
  def sumCents(c: Column): Column =
    sum(round(c * 100, 0).cast("long")) / 100.0
}
