package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native fused dot product over two `array<float>` columns.
  *
  * The builtin HOF formulation — `aggregate(zip_with(a, b, _*_), 0.0,
  * _+_)` (Vectors.dot) — is semantically right but materializes an
  * intermediate products array per row before folding it. This
  * expression is the justified custom-Catalyst case (builder-brief
  * preference ladder: builtins first, native Expression only where the
  * builtin genuinely can't express it efficiently): one codegen'd
  * multiply-add loop, zero per-row allocation, identical sequential
  * accumulation order (so results are bit-equal to the HOF path and to
  * the DuckDB oracle's fold).
  *
  * Null contract matches the HOF chain EXACTLY: null input arrays
  * propagate null (BinaryExpression contract), and a null ELEMENT
  * anywhere poisons the result to null — the same way zip_with's
  * null products turn the aggregate fold null. That exactness is what
  * lets FuseDotProductRule rewrite the declarative form soundly (file
  * scans force containsNull=true regardless of the declared schema, so
  * the rule cannot rely on the type to exclude null elements).
  */
case class FusedDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects (array<float>, array<float>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  // mismatched dimensions return null even when both inputs are
  // non-null, so nullability can't derive from the children alone
  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  /** Dimension mismatch yields NULL — matching the HOF formulation
    * (`zip_with` pads the shorter side with nulls, poisoning the sum).
    * Truncating to the shorter array would return a plausible-looking
    * but wrong similarity for a malformed vector. */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FusedDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering the native function — the public,
  * Connect-era-safe route to a custom Expression (Spark 4 `Column` no
  * longer exposes Catalyst trees; `call_function("graft_dot", ...)`
  * resolves through the registry instead). Wired into the Verify/
  * Bench/test session builders via `spark.sql.extensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def requireArity(name: String, children: Seq[Expression], n: Int): Unit =
    if (children.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name,
          "expectedNum" -> n.toString,
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  /** The width/mod arguments parameterize generated code, so they must
    * be literals, not data-dependent columns. */
  private def litLong(name: String, e: Expression): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case other => throw new org.apache.spark.sql.AnalysisException(
      errorClass = "NON_FOLDABLE_ARGUMENT",
      messageParameters = Map(
        "funcName" -> s"`$name`",
        "paramName" -> "`width`",
        "paramType" -> "\"INT\""))
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // declarative HOF dot products fuse to the native kernel — query
    // modules write aggregate(zip_with(...)) and the session supplies
    // the performance (see FuseDotProductRule)
    ext.injectOptimizerRule(_ => FuseDotProductRule)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot_dec"),
      new ExpressionInfo(classOf[DotDecimal].getName, "graft_dot_dec"),
      (children: Seq[Expression]) => {
        requireArity("graft_dot_dec", children, 2)
        DotDecimal(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FusedDotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        requireArity("graft_dot", children, 2)
        FusedDotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_best_cid"),
      new ExpressionInfo(classOf[BestCentroidCid].getName, "graft_best_cid"),
      (children: Seq[Expression]) => {
        requireArity("graft_best_cid", children, 2)
        BestCentroidCid(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSlots].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        requireArity("graft_minhash", children, 2)
        MinHashSlots(children.head, litLong("graft_minhash", children(1)).toInt)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashBits].getName, "graft_simhash"),
      (children: Seq[Expression]) => {
        requireArity("graft_simhash", children, 2)
        SimHashBits(children.head, litLong("graft_simhash", children(1)).toInt)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShingleArray].getName, "graft_shingles"),
      (children: Seq[Expression]) => {
        requireArity("graft_shingles", children, 2)
        ShingleArray(children.head, litLong("graft_shingles", children(1)).toInt)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_intradup_starts"),
      new ExpressionInfo(classOf[IntraDupStarts].getName, "graft_intradup_starts"),
      (children: Seq[Expression]) => {
        requireArity("graft_intradup_starts", children, 2)
        IntraDupStarts(children.head,
          litLong("graft_intradup_starts", children(1)).toInt)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_md5_longs"),
      new ExpressionInfo(classOf[Md5Longs].getName, "graft_md5_longs"),
      (children: Seq[Expression]) => {
        requireArity("graft_md5_longs", children, 2)
        Md5Longs(children.head, litLong("graft_md5_longs", children(1)))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_gram_md5"),
      new ExpressionInfo(classOf[GramMd5Hex].getName, "graft_gram_md5"),
      (children: Seq[Expression]) => {
        requireArity("graft_gram_md5", children, 2)
        GramMd5Hex(children.head, litLong("graft_gram_md5", children(1)).toInt)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_grams"),
      new ExpressionInfo(classOf[GramArray].getName, "graft_grams"),
      (children: Seq[Expression]) => {
        requireArity("graft_grams", children, 2)
        GramArray(children.head, litLong("graft_grams", children(1)).toInt)
      }))
    // graft_pq_assign(emb, cbFlat, codes, subDim) / graft_pq_dists(...):
    // the trained codebook is a query-time constant (index metadata),
    // so it arrives as an array<double> literal the builder unwraps
    // into the kernel's reference object
    def pqBuilder(name: String, dists: Boolean)(children: Seq[Expression]): Expression = {
      requireArity(name, children, 4)
      val cb = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(
            a: org.apache.spark.sql.catalyst.util.ArrayData,
            ArrayType(org.apache.spark.sql.types.DoubleType, _)) =>
          a.toDoubleArray().toIndexedSeq
        case _ => throw new org.apache.spark.sql.AnalysisException(
          errorClass = "NON_FOLDABLE_ARGUMENT",
          messageParameters = Map(
            "funcName" -> s"`$name`",
            "paramName" -> "`codebook`",
            "paramType" -> "\"ARRAY<DOUBLE>\""))
      }
      PqAssign(children.head, cb, litLong(name, children(2)).toInt,
        litLong(name, children(3)).toInt, dists)
    }
    ext.injectFunction((
      new FunctionIdentifier("graft_token_stats"),
      new ExpressionInfo(classOf[TokenStats].getName, "graft_token_stats"),
      (children: Seq[Expression]) => {
        requireArity("graft_token_stats", children, 1)
        TokenStats(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_pq_assign"),
      new ExpressionInfo(classOf[PqAssign].getName, "graft_pq_assign"),
      pqBuilder("graft_pq_assign", dists = false) _))
    ext.injectFunction((
      new FunctionIdentifier("graft_pq_dists"),
      new ExpressionInfo(classOf[PqAssign].getName, "graft_pq_dists"),
      pqBuilder("graft_pq_dists", dists = true) _))
    // graft_bloom_agg(xxhash64(v), items, bits) / graft_might_contain(bf, xxhash64(v)):
    // Spark's OWN bloom pair (the expressions InjectRuntimeFilter
    // plants for shuffle-join row prefilters), surfaced here because
    // they are not in the public FunctionRegistry. No custom kernel —
    // the engine's battle-tested BloomFilterImpl does the work; the
    // membership test is codegen'd. Used by x79's decontamination
    // prefilter, where the benchmark set is too large to broadcast as
    // a hash relation at corpus scale but its bloom is just bytes.
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) => {
        requireArity("graft_bloom_agg", children, 3)
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children.head, children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (children: Seq[Expression]) => {
        requireArity("graft_might_contain", children, 2)
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))
      }))
  }
}
