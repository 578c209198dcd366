package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd kernels for the MinHash / SimHash signature math.
  *
  * The higher-order-function formulations (Text.minhashFromHashes /
  * Text.simhashOf) are semantically identical but evaluate their
  * lambdas interpreted — Spark's `transform`/`aggregate`/`zip_with` do
  * not participate in whole-stage codegen, so every slot × element
  * step pays boxing plus expression-tree dispatch. At 16 slots (or 60
  * vote bits) × ~200 shingles × row count, that interpreted inner loop
  * dominates the dedup queries' runtime. These expressions are the
  * builder-brief "justified custom Expression" case: one tight
  * generated loop per row, zero per-row allocation beyond the output.
  *
  * Both kernels consume PRE-HASHED features (`array<long>` — the
  * md5-derived portable hashes, see Text.tokenHashesPortable), so the
  * values they produce are bit-identical to the HOF path and to the
  * DuckDB oracle SQL (asserted by NativeKernelSpec).
  *
  * Contract (both): NULL input array → NULL; elements are assumed
  * non-null (hashes of non-null strings); EMPTY input → NULL — callers
  * filter empty shingle sets out first (a doc with no features has no
  * signature), unlike the HOF fold whose empty-input value is a
  * degenerate constant that would band all short docs together.
  */
trait HashKernel extends UnaryExpression {
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got $t")
  }
}

/** One-hash-k-permutations MinHash: slot i = min over input hashes h of
  * `(h * A_i + B_i) mod M` with M = 2^31-1 (Text.MinhashMod) and the
  * affine family of Text.affineA/affineB. Inputs must already be
  * reduced mod M (products then stay < 2^62: overflow-free). */
case class MinHashSlots(child: Expression, numHashes: Int) extends HashKernel {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  private val as: Array[Long] = Array.tabulate(numHashes)(graft.functions.Text.affineA)
  private val bs: Array[Long] = Array.tabulate(numHashes)(graft.functions.Text.affineB)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    // Contract check (one O(n) pre-pass, not per-slot): inputs must be
    // pre-reduced mod M or the raw long multiply silently wraps into
    // wrong-but-plausible signatures — the HOF/ANSI path this kernel
    // claims bit-parity with would raise on the same misuse, so fail
    // loudly here too.
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      if (h < 0L || h >= graft.functions.Text.MinhashMod)
        throw new IllegalArgumentException(
          s"graft_minhash input hash $h outside [0, ${graft.functions.Text.MinhashMod}): " +
            "inputs must be pre-reduced mod 2^31-1 (see Text.MinhashMod)")
      j += 1
    }
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val a = as(i); val b = bs(i)
      var best = Long.MaxValue
      j = 0
      while (j < n) {
        val v = (hs.getLong(j) * a + b) % graft.functions.Text.MinhashMod
        if (v < best) best = v
        j += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val best = ctx.freshName("best")
      s"""
         |int $n = $hs.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $v = $hs.getLong($j);
         |    if ($v < 0L || $v >= ${graft.functions.Text.MinhashMod}L) {
         |      throw new IllegalArgumentException("graft_minhash input hash " + $v
         |        + " outside [0, ${graft.functions.Text.MinhashMod}): inputs must be"
         |        + " pre-reduced mod 2^31-1 (see Text.MinhashMod)");
         |    }
         |  }
         |  long[] $out = new long[$numHashes];
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $best = Long.MAX_VALUE;
         |    for (int $j = 0; $j < $n; $j++) {
         |      long $v = ($hs.getLong($j) * $aRef[$i] + $bRef[$i])
         |        % ${graft.functions.Text.MinhashMod}L;
         |      if ($v < $best) $best = $v;
         |    }
         |    $out[$i] = $best;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSlots =
    copy(child = newChild)
}

/** SimHash over pre-hashed features: bit j of the result is set iff
  * `sum over h of (h>>j & 1 == 1 ? +1 : -1) >= 0`. Matches
  * Text.simhashOf's vote/pack folds and the DuckDB oracle bit-for-bit
  * on non-empty input. */
case class SimHashBits(child: Expression, bits: Int) extends HashKernel {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val votes = new Array[Int](bits)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var b = 0
      while (b < bits) {
        votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) >= 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one vote buffer per operator instance, reused across rows
    val votes = ctx.addMutableState("int[]", "simhashVotes",
      v => s"$v = new int[$bits];")
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |int $n = $hs.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  java.util.Arrays.fill($votes, 0);
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $h = $hs.getLong($j);
         |    for (int $b = 0; $b < $bits; $b++) {
         |      $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |  long $fp = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    if ($votes[$b] >= 0) $fp |= (1L << $b);
         |  }
         |  ${ev.value} = $fp;
         |}
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

/** Portable per-string hash array: element i = first 15 hex chars of
  * md5(s_i) parsed as a long (DuckDB twin:
  * `CAST('0x'||substr(md5(s),1,15) AS BIGINT)`), optionally reduced
  * `mod M`. Fuses the per-shingle hashing loop that the HOF
  * formulation (`transform(sh, s => conv(substring(md5(s),1,15),...))`)
  * evaluates interpreted, one expression-tree dispatch per element. */
case class Md5Longs(child: Expression, mod: Long) extends UnaryExpression {

  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_md5_longs"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = Md5Longs.hash(
        arr.getUTF8String(i).getBytes, mod)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val cls = Md5Longs.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int $n = $arr.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $cls.hash($arr.getUTF8String($i).getBytes(), ${mod}L);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Md5Longs =
    copy(child = newChild)
}

/** Distinct n-token shingles, natively: one loop per row over the
  * token array, joining n consecutive tokens with a single space and
  * keeping first-occurrence order (LinkedHashSet) — exactly
  * `array_distinct(transform(positions, concat_ws(" ", ...)))`
  * (Text.shingles), whose interpreted per-position lambda dispatch is
  * the single largest cost of every shingle-based dedup query. Fewer
  * than n tokens yields an EMPTY array (matching the HOF's
  * `otherwise(array())`), so short docs drop out of banding via the
  * callers' `size(sh) > 0` filter. */
case class ShingleArray(child: Expression, n: Int) extends UnaryExpression {

  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got $t")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleArray.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cls = ShingleArray.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $cls.compute($arr, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

object ShingleArray {
  private val SPACE = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  def compute(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]
    val window = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) { window(j) = toks.getUTF8String(i + j); j += 1 }
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(SPACE, window: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray[AnyRef](new Array[AnyRef](seen.size)))
  }
}

/** md5-hex fingerprints of every sliding n-token window, natively: one
  * loop per row producing exactly
  * `transform(sequence(1, size(tk)-n+1), i -> md5(concat_ws(' ', slice(tk, i, n))))`
  * for inputs with size(tk) >= n (byte-equal hex strings — Spark's md5()
  * is lowercase hex over the UTF-8 bytes, and so is this; pinned by
  * ScrubKernelSpec). The HOF form allocated a positions array, one
  * slice-copy array and one interpreted lambda dispatch PER POSITION per
  * row — the dominant staging cost of the x49 positional-gram audit
  * (r19 optimization). Fewer than n tokens yields an EMPTY array;
  * callers filter size(tk) >= n first (the HOF's sequence(1, len-n+1)
  * DESCENDS for len < n — a shape no caller may feed either form). */
case class GramMd5Hex(child: Expression, n: Int) extends UnaryExpression {

  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got $t")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_gram_md5"

  override def nullSafeEval(input: Any): Any =
    GramMd5Hex.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cls = GramMd5Hex.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $cls.compute($arr, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): GramMd5Hex =
    copy(child = newChild)
}

object GramMd5Hex {
  private val SPACE = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
  private val HEX = "0123456789abcdef".getBytes

  def compute(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](len - n + 1)
    val window = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    val d = Md5Longs.digestFor()
    val hex = new Array[Byte](32)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) { window(j) = toks.getUTF8String(i + j); j += 1 }
      d.reset()
      val dig = d.digest(
        org.apache.spark.unsafe.types.UTF8String.concatWs(SPACE, window: _*)
          .getBytes)
      var b = 0
      while (b < 16) {
        hex(2 * b) = HEX((dig(b) >> 4) & 0xf)
        hex(2 * b + 1) = HEX(dig(b) & 0xf)
        b += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromBytes(
        java.util.Arrays.copyOf(hex, 32))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** ALL sliding n-token windows joined by a single space, in position
  * order (no dedup — [[ShingleArray]]'s LinkedHashSet twin without the
  * distinct): exactly
  * `transform(sequence(1, size(tk)-n+1), i -> concat_ws(' ', <n element_at terms>))`
  * for inputs with size(tk) >= n, whose interpreted per-position lambda
  * dispatch + n element_at tree walks per window are the staging cost
  * of the positional-gram family (x50/x57/x61 bigram counts, x91/x92
  * scrub starts — the r19 x49 kernel lesson applied to the two named
  * leftovers). Element i of the output is the window starting at
  * 0-based token i, so `posexplode` yields the same (off, gram) rows
  * as the HOF form. Fewer than n tokens yields an EMPTY array; callers
  * filter size(tk) >= n first (the HOF's sequence DESCENDS below n —
  * a shape no caller may feed either form). */
case class GramArray(child: Expression, n: Int) extends UnaryExpression {

  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got $t")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "graft_grams"

  override def nullSafeEval(input: Any): Any =
    GramArray.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val cls = GramArray.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $cls.compute($arr, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): GramArray =
    copy(child = newChild)
}

object GramArray {
  private val SPACE = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  def compute(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](len - n + 1)
    val window = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) { window(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(SPACE, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object Md5Longs {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Thread-local digest shared with [[GramMd5Hex]]. */
  private[plans] def digestFor(): java.security.MessageDigest = md5.get()

  /** First 15 hex chars of md5 as a long — i.e. the top 60 bits of the
    * digest, which is exactly `CAST('0x' || substr(md5(s),1,15) AS
    * BIGINT)`. `mod <= 0` means no reduction. */
  def hash(utf8: Array[Byte], mod: Long): Long = {
    val d = md5.get()
    d.reset()
    val dig = d.digest(utf8)
    // top 8 bytes big-endian, shifted right 4 bits = 15 hex chars
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    val h = v >>> 4
    if (mod > 0) h % mod else h
  }
}
