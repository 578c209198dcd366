package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native product-quantization assignment kernel.
  *
  * The declarative formulation (Curation.pqCode: an `array_min` over 8
  * per-code structs, each wrapping a `pround(aggregate(zip_with(...)))`
  * squared-distance fold over a staged 16-dim subvector) is
  * semantically right but interpreted — 4 subspaces × 8 codes = 32 HOF
  * folds per row, each paying lambda dispatch + boxing per element.
  * That per-row assignment cost was the measured bottleneck of the ADC
  * search (x67: ~2.8 s warm for ~15K vectors, dominated by assignment,
  * not the 4 indexed lookups). Same justified-custom-Expression case as
  * [[MinHashSlots]]: one tight generated loop per row.
  *
  * Bit-parity contract with the HOF path (asserted by CurationSpec):
  *   - subvector s of the embedding = elements [s*subDim, (s+1)*subDim)
  *     widened float→double (exact);
  *   - d2(sub, code) = LEFT-ASSOCIATIVE sequential fold of
  *     (x_i − c_i)² seeded at +0.0 — identical operation order to
  *     `aggregate(zip_with(...), 0.0, _+_)`;
  *   - d2 is rounded `floor(d2·10⁶ + 0.5)/10⁶` (Rounding.pround) BEFORE
  *     the argmin, exactly like the HOF path and the DuckDB oracle;
  *   - argmin ties break to the SMALLEST code (strict `<` scan in
  *     ascending code order = `array_min` struct ordering).
  *
  * Codes are returned 1-based (code of entry i = i+1) because every
  * graft codebook is keyed by the seed vec_ids 1..codes in ascending
  * order (Curation.trainPqCodebook preserves that keying across
  * Lloyd's rounds — empty clusters keep their entry).
  *
  * NULL contract: null input array → null; an embedding shorter than
  * subspaces×subDim or carrying a null element → null (fail-safe,
  * mirroring graft_dot's malformed-vector poisoning — the HOF path's
  * behavior on such rows is an engine-internal struct-null ordering
  * nobody should rely on; the corpus has neither case).
  */
case class PqAssign(child: Expression, codebook: IndexedSeq[Double],
    codes: Int, subDim: Int, dists: Boolean) extends UnaryExpression {

  // IndexedSeq, not Array: an Array field degrades case-class
  // equals/hashCode to reference identity, so two semantically
  // identical kernel calls built from separate codebook copies (x70
  // builds assign + dists independently) could never canonicalize or
  // share subexpressions. The tight loop still runs on a primitive
  // array — converted once per (de)serialized instance.
  @transient private lazy val cbArr: Array[Double] = codebook.toArray

  private def subspaces: Int = codebook.length / (codes * subDim)

  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if codebook.length % (codes * subDim) == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName codebook length ${codebook.length} is not a multiple of " +
        s"codes×subDim = ${codes * subDim}")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got $t")
  }

  override def dataType: DataType =
    if (dists) ArrayType(DoubleType, containsNull = false)
    else ArrayType(LongType, containsNull = false)

  override def prettyName: String =
    if (dists) "graft_pq_dists" else "graft_pq_assign"

  override def nullSafeEval(input: Any): Any =
    PqAssign.compute(input.asInstanceOf[ArrayData], cbArr,
      subspaces, codes, subDim, dists)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cbArr, "double[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val cls = PqAssign.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val out = ctx.freshName("out")
      s"""
         |Object $out = $cls.compute($arr, $cbRef, $subspaces, $codes, $subDim, $dists);
         |if ($out == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $out;
         |}
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqAssign =
    copy(child = newChild)
}

object PqAssign {

  /** Shared interpreted/codegen body. Returns null for malformed
    * vectors (see class doc); otherwise an ArrayData of `subspaces`
    * 1-based codes (dists=false) or rounded assigned-code distances
    * (dists=true). */
  def compute(v: ArrayData, cb: Array[Double], subspaces: Int,
      codes: Int, subDim: Int, dists: Boolean): Any = {
    if (v.numElements() < subspaces * subDim) return null
    val outCodes = new Array[Long](subspaces)
    val outDists = new Array[Double](subspaces)
    var s = 0
    while (s < subspaces) {
      var bestD = 0.0
      var bestI = 0
      var c = 0
      while (c < codes) {
        var acc = 0.0
        val base = (s * codes + c) * subDim
        var i = 0
        while (i < subDim) {
          val pos = s * subDim + i
          if (v.isNullAt(pos)) return null
          val diff = v.getFloat(pos).toDouble - cb(base + i)
          acc += diff * diff
          i += 1
        }
        // .toLong replicates Rounding.pround EXACTLY: Spark's floor()
        // returns LONG, so a NaN fold rounds to 0L/10⁶ = 0.0 (JVM
        // NaN.toLong == 0) — a double-only floor here would keep NaN
        // and diverge from the HOF path on malformed vectors
        // (CurationSpec pins the NaN case)
        val r = math.floor(acc * 1000000.0 + 0.5).toLong / 1000000.0
        // entry 0 seeds the min; strict < keeps ties on the earlier
        // (= smaller) code, matching array_min's struct order
        if (c == 0 || r < bestD) { bestD = r; bestI = c }
        c += 1
      }
      outCodes(s) = bestI + 1L
      outDists(s) = bestD
      s += 1
    }
    if (dists) new GenericArrayData(outDists) else new GenericArrayData(outCodes)
  }
}
