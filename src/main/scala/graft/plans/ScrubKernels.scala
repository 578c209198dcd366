package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for the intra-document repeated-gram scan (x115).
  *
  * The declarative formulation pays the token-explode floor the
  * tokStaged staging cannot absorb: positionalGrams fans every
  * document out to one ROW per gram position (~n rows per n-token
  * doc), shuffles (doc_id, g, off) triples into a (doc_id, g) window,
  * and keeps the offsets past each gram's first occurrence — r10/r11
  * measured that explode+window at ~4 s warm at sf1 as x115's whole
  * residual cost, ~10× its sf0.1 reading, PURELY from the row fanout:
  * the answer never leaves the document. This kernel computes the
  * same set ARRAY-LOCALLY — one hash-set pass over the token array
  * per row, O(n) per document, zero fanout, zero shuffle — the
  * builder-brief "justified custom Expression" case, same as the
  * minhash/simhash kernels.
  *
  * Contract: returns the 0-based gram-start offsets (the
  * positionalGrams `off` convention — 1-based token start = off + 1)
  * whose w-gram already occurred at a SMALLER offset in the same
  * array; ascending; empty array when nothing repeats or the doc is
  * shorter than w. Gram identity is the space-joined token string
  * (UTF8String.concatWs), the exact identity positionalGrams'
  * concat_ws builds — bit-parity with the window formulation is
  * pinned by ScrubKernelSpec, and the registered x115 oracle is
  * unchanged (same semantics, different engine path).
  */
case class IntraDupStarts(child: Expression, w: Int) extends UnaryExpression {

  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_intradup_starts"

  override def nullSafeEval(input: Any): Any =
    IntraDupStarts.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cls = IntraDupStarts.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $cls.compute($arr, $w);"
    })

  override protected def withNewChildInternal(newChild: Expression): IntraDupStarts =
    copy(child = newChild)
}

object IntraDupStarts {
  private val SPACE = UTF8String.fromString(" ")

  def compute(toks: ArrayData, w: Int): ArrayData = {
    val len = toks.numElements()
    if (len < w) return new GenericArrayData(Array.empty[Any])
    val nGrams = len - w + 1
    val seen = new java.util.HashSet[UTF8String](nGrams * 2)
    val window = new Array[UTF8String](w)
    // worst case every gram past the first repeats; size once, trim at end
    val dups = new Array[Int](nGrams)
    var nDups = 0
    var i = 0
    while (i < nGrams) {
      var j = 0
      while (j < w) { window(j) = toks.getUTF8String(i + j); j += 1 }
      if (!seen.add(UTF8String.concatWs(SPACE, window: _*))) {
        dups(nDups) = i
        nDups += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(dups, nDups))
  }
}
