package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native per-row centroid argmax for the distributed Lloyd's path
  * (`graft_best_cid(v, carr)`): given an `array<float>` vector and the
  * packed centroid array `array<struct<cid:long, ce:array<float>,
  * cn:double>>` (cn = sqrt(dot(ce,ce)), precomputed once per centroid
  * at packing time), returns the cid of the lexicographic-max
  * `(ccos, cid)` pair — highest rounded cosine, ties to the largest
  * cid — the exact ordering of the literal path's
  * `array_max(ivfScored(...))` and of the declarative
  * `array_max(transform(carr, c -> struct(pround(cosine6), cid)))`
  * this kernel replaces.
  *
  * Why a kernel and not the HOF: the argmax is the inner loop of every
  * training assignment pass — N×K lambda evaluations. The interpreted
  * HOF lambda walks an expression tree (div, two sqrts, floor, struct
  * alloc) per element; at sf3 (60k×480) that measured ~35 s per pass
  * even with the dots fused. Here the K-loop is one compiled method
  * with the vector's self-norm hoisted out of the loop and centroid
  * norms precomputed into the broadcast payload, so each element costs
  * one fused dot (dim mul-adds) plus a compare. CodegenFallback is
  * deliberate: the expression is evaluated once per ROW (the K-loop is
  * inside), so the per-row boxed-call overhead is noise against the
  * K×dim loop body, and the surrounding projection is trivial.
  *
  * Exact-arithmetic contract (bit-equal to the declarative form, which
  * is what DistributedTrainSpec's literal-parity pins transitively):
  *   - dot products accumulate (double)a_i * (double)b_i sequentially
  *     ([[FusedDotProduct]]'s order, = the HOF fold, = the oracle);
  *   - ccos = ((double)(long)floor(raw * 1e6 + 0.5)) / 1e6, the
  *     [[graft.functions.Rounding.pround]] operation sequence (Spark's
  *     FLOOR(double) is floor-then-toLong); a zero denominator raises
  *     DIVIDE_BY_ZERO under ANSI exactly as the Divide it replaces
  *     (non-ANSI sessions get the IEEE NaN, whose floor-toLong is 0L,
  *     again matching the builtin chain);
  *   - the denominator is sqrt(da) * sqrt(db) — two square roots, not
  *     sqrt(da*db) — matching cosineDecl's normDecl(a) * normDecl(b).
  *
  * Null contract replicates the HOF chain ELEMENT-WISE, not via
  * null-propagation shortcuts: a null vector (or a null/poisoned
  * element, or a dimension mismatch against centroid i) nulls that
  * element's ccos, and a null-ccos element still competes in the
  * argmax with null ORDERED FIRST (Spark's struct ordering) — so a
  * fully-poisoned row is assigned the LARGEST cid, exactly what
  * array_max over (null, cid) structs yields, and only a null or
  * empty carr returns null. A null carr ELEMENT contributes
  * (null ccos, null cid), the struct the HOF lambda builds from a
  * null input element. */
case class BestCentroidCid(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  /** Captured at construction on the driver, like Spark's own
    * arithmetic expressions capture their EvalMode: under ANSI (the
    * Spark 4 default, and what every session here runs) a zero
    * denominator must raise DIVIDE_BY_ZERO exactly as the declarative
    * form's Divide would — silently yielding a number where the
    * drop-in-replaced expression throws would change semantics. */
  private val failOnError: Boolean =
    org.apache.spark.sql.internal.SQLConf.get.ansiEnabled

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _),
            ArrayType(StructType(Array(f0, f1, f2)), _))
          if f0.dataType == LongType &&
            f1.dataType.isInstanceOf[ArrayType] &&
            f1.dataType.asInstanceOf[ArrayType].elementType == FloatType &&
            f2.dataType == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_best_cid expects (array<float>, " +
          s"array<struct<cid:long, ce:array<float>, cn:double>>), got ($l, $r)")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_best_cid"

  /** dot(v, v), or null when any element is null (the poison
    * contract of [[FusedDotProduct]] / the HOF fold). */
  private def selfDot(v: ArrayData): java.lang.Double = {
    val n = v.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val f = v.getFloat(i).toDouble
      acc += f * f
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override def eval(input: InternalRow): Any = {
    val carrAny = right.eval(input)
    if (carrAny == null) return null
    val carr = carrAny.asInstanceOf[ArrayData]
    val k = carr.numElements()
    if (k == 0) return null

    val vAny = left.eval(input)
    val v = if (vAny == null) null else vAny.asInstanceOf[ArrayData]
    // vnorm: Double.NaN is impossible here (self-dot >= 0), so encode
    // "poisoned" as a separate flag
    var vnPoisoned = v == null
    var vnorm = 0.0
    if (!vnPoisoned) {
      val sd = selfDot(v)
      if (sd == null) vnPoisoned = true else vnorm = Math.sqrt(sd.doubleValue())
    }

    // running lexicographic max over (ccos, cid), null-first on both
    var bestCosNull = true
    var bestCos = 0.0
    var bestCidNull = true
    var bestCid = 0L
    var have = false

    var i = 0
    while (i < k) {
      var cosNull = false
      var cos = 0.0
      var cidNull = false
      var cid = 0L
      if (carr.isNullAt(i)) {
        // the HOF lambda maps a null element to struct(null, null)
        cosNull = true; cidNull = true
      } else {
        val s = carr.getStruct(i, 3)
        if (s.isNullAt(0)) cidNull = true else cid = s.getLong(0)
        if (vnPoisoned || s.isNullAt(1) || s.isNullAt(2)) cosNull = true
        else {
          val ce = s.getArray(1)
          val cn = s.getDouble(2)
          val n = if (v == null) -1 else v.numElements()
          if (n != ce.numElements()) cosNull = true
          else {
            var dot = 0.0
            var j = 0
            while (j < n && !cosNull) {
              if (v.isNullAt(j) || ce.isNullAt(j)) cosNull = true
              else {
                dot += v.getFloat(j).toDouble * ce.getFloat(j).toDouble
                j += 1
              }
            }
            if (!cosNull) {
              val den = vnorm * cn
              if (den == 0.0 && failOnError)
                throw BestCentroidCid.divideByZeroError()
              val raw = dot / den
              cos = ((Math.floor(raw * 1000000.0 + 0.5)).toLong).toDouble / 1000000.0
            }
          }
        }
      }
      // is (cosNull, cos, cidNull, cid) > (bestCosNull, bestCos, ...)?
      val take =
        if (!have) true
        else if (cosNull != bestCosNull) bestCosNull // non-null beats null
        else if (!cosNull && cos != bestCos) cos > bestCos
        else if (cidNull != bestCidNull) bestCidNull
        else if (!cidNull) cid > bestCid
        else false
      if (take) {
        bestCosNull = cosNull; bestCos = cos
        bestCidNull = cidNull; bestCid = cid
        have = true
      }
      i += 1
    }
    if (bestCidNull) null else bestCid
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BestCentroidCid =
    copy(left = newLeft, right = newRight)
}

object BestCentroidCid {
  /** The SAME exception Spark's own Divide raises (type
    * SparkArithmeticException, error class DIVIDE_BY_ZERO, message
    * template owned by Spark) — callers matching on
    * SparkThrowable.getCondition, or a future Spark rewording the
    * message, see no divergence from the declarative form this kernel
    * replaces. QueryExecutionErrors and the exception class are
    * private[sql]/private[spark] at the SCALA level only (public
    * bytecode), hence the cached reflective call; null context is the
    * factory's own context-free path (empty QueryContext array, empty
    * summary — this expression is constructed programmatically, there
    * is no SQL fragment to point at). */
  private lazy val divideByZeroMethod: java.lang.reflect.Method = {
    val cls = Class.forName("org.apache.spark.sql.errors.QueryExecutionErrors$")
    cls.getMethod("divideByZeroError", Class.forName("org.apache.spark.QueryContext"))
  }
  private[plans] def divideByZeroError(): ArithmeticException =
    divideByZeroMethod.invoke(
      divideByZeroMethod.getDeclaringClass.getField("MODULE$").get(null),
      null).asInstanceOf[ArithmeticException]
}
