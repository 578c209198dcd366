package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, Decimal, DecimalType, LongType}

/** Native exact integer dot product over two `array<bigint>` columns,
  * returning DECIMAL(38,0) — the array-local replacement for the
  * exploded decimal-aggregate shape the embedding-audit family used:
  *
  *   posexplode → join on dim → sum(CAST(a AS DECIMAL(38,0)) * b)
  *
  * That formulation fans every vector out to one row per dimension and
  * shuffles the fanout into a per-vector DECIMAL aggregate — measured
  * as x116's entire multi-second sf1 residual, purely row movement for
  * a value that never leaves one row. This kernel computes the same
  * DECIMAL(38,0) sum-of-products ARRAY-LOCALLY: one fused loop per
  * row, zero fanout, zero shuffle (the IntraDupStarts / ShingleArray
  * static-compute pattern).
  *
  * Exactness contract (what makes it swappable under an oracle-checked
  * query): integer sum-of-products is associative and overflow is the
  * ONLY hazard, so the fast path accumulates in one long with explicit
  * product/sum overflow detection and falls back to an exact
  * BigInteger accumulation of the whole row when anything would wrap —
  * never a wrapped long, never a float. Results past DECIMAL(38,0)'s
  * 38 digits return NULL, matching what the decimal-aggregate
  * formulation yields under the session's non-ANSI decimal-overflow
  * contract.
  *
  * Null contract matches [[FusedDotProduct]] (and the HOF chain): null
  * arrays propagate null, a null ELEMENT poisons the row to null, and
  * a length mismatch is null rather than a truncated plausible value.
  *
  * One divergence from the exploded aggregate: two EMPTY arrays yield
  * Decimal(0) here, where posexplode+sum produces no row at all (a
  * grouped NULL sum). No registered caller can reach it (x116's
  * embeddings are fixed 64-dim) and DotDecimalSpec pins the 0, but a
  * caller relying on "same as the agg" over possibly-empty vectors
  * must handle that edge itself.
  */
case class DotDecimal(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot_dec expects (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_dec"

  override def nullSafeEval(a: Any, b: Any): Any =
    DotDecimal.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = DotDecimal.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val r = ctx.freshName("r")
      s"""
         |org.apache.spark.sql.types.Decimal $r =
         |  (org.apache.spark.sql.types.Decimal) $cls.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotDecimal =
    copy(left = newLeft, right = newRight)
}

object DotDecimal {

  /** Exact Σ xᵢ·yᵢ as Decimal(38,0); null on length mismatch, null
    * element, or a true value past 38 digits. */
  def compute(x: ArrayData, y: ArrayData): Decimal = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val a = x.getLong(i)
      val b = y.getLong(i)
      val lo = a * b
      // product fits a long iff the high 64 product bits are pure sign
      // extension of the low half
      if (Math.multiplyHigh(a, b) != (lo >> 63)) return slow(x, y, n)
      val s = acc + lo
      // two's-complement add overflow: operands share a sign the sum lost
      if (((acc ^ s) & (lo ^ s)) < 0L) return slow(x, y, n)
      acc = s
      i += 1
    }
    Decimal(acc)
  }

  /** Exact BigInteger accumulation — the overflow escape hatch. The
    * null-element scan restarts from 0: the fast path may bail before
    * reaching a later null, and null must win over overflow for the
    * contract to be deterministic. */
  private def slow(x: ArrayData, y: ArrayData, n: Int): Decimal = {
    var acc = java.math.BigInteger.ZERO
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc = acc.add(java.math.BigInteger.valueOf(x.getLong(i))
        .multiply(java.math.BigInteger.valueOf(y.getLong(i))))
      i += 1
    }
    val d = Decimal(new java.math.BigDecimal(acc))
    if (d.changePrecision(38, 0)) d else null
  }
}
