package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule fusing the DECLARATIVE dot-product pattern
  *
  *   aggregate(zip_with(transform(a, x -> double(x)),
  *                      transform(b, y -> double(y)), _ * _), 0.0, _ + _)
  *
  * (Vectors.dot over widened float vectors — the form a Spark-first
  * user writes) into the native [[FusedDotProduct]] kernel: one
  * codegen'd multiply-add loop instead of two materialized widened
  * arrays, a products array, and an interpreted fold per row (~9× at
  * 200k rows, see FusedDotSpec). The rewrite is bit-exact: the kernel
  * accumulates (double)a_i * (double)b_i sequentially — the identical
  * operations the HOF chain performs — and returns NULL on dimension
  * mismatch exactly as zip_with's null padding poisons the fold.
  *
  * Soundness guards (no match ⇒ no change, the query stays on the
  * correct interpreted path):
  *   - both inputs must be array<float>; null ELEMENTS are safe to
  *     rewrite because the kernel poisons the result to null exactly
  *     like zip_with's null products poison the fold (file scans force
  *     containsNull = true regardless of the declared schema, so the
  *     rule must be exact under nulls rather than excluded by type);
  *   - the fold must be exactly (0.0, _ + _) with an identity finish;
  *   - the zip lambda must be exactly left * right on the two lambda
  *     variables.
  *
  * Registered through `SparkSessionExtensions.injectOptimizerRule` —
  * sessions without the extension still run the declarative form
  * correctly (interpreted), which is why the query modules write the
  * declarative form and let the session pick the kernel.
  */
object FuseDotProductRule extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case u: NamedLambdaVariable => u.exprId == v.exprId
    case _ => false
  }

  /** transform(arr, x -> cast(x as double)) over array<float> → Some(arr). */
  private def widened(e: Expression): Option[Expression] = e match {
    case ArrayTransform(arr, LambdaFunction(c: Cast, Seq(v: NamedLambdaVariable), _))
        if c.dataType == DoubleType && sameVar(c.child, v) =>
      arr.dataType match {
        case ArrayType(FloatType, _) => Some(arr)
        case _ => None
      }
    case _ => None
  }

  private def isVarProduct(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(l, r, _),
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      sameVar(l, x) && sameVar(r, y)
    case _ => false
  }

  private def isAccPlusElem(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l, r, _),
        Seq(acc: NamedLambdaVariable, e: NamedLambdaVariable), _) =>
      sameVar(l, acc) && sameVar(r, e)
    case _ => false
  }

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(v: NamedLambdaVariable), _) => sameVar(body, v)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(ZipWith(la, ra, mul), Literal(zero: Double, DoubleType),
          merge, finish)
          // raw-bits compare: Scala's -0.0 == 0.0, but the kernel seeds
          // +0.0 — a Literal(-0.0) fold yields -0.0 on empty arrays, so
          // only the exactly-+0.0 seed is bit-equal to rewrite
          if java.lang.Double.doubleToRawLongBits(zero) == 0L &&
            isVarProduct(mul) && isAccPlusElem(merge) &&
            isIdentity(finish) =>
        (widened(la), widened(ra)) match {
          case (Some(a), Some(b)) => FusedDotProduct(a, b)
          case _ => agg
        }
    }
}
