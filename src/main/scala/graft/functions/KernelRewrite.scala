package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, Subtract, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the interpreted higher-order vector folds
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) }}}
  * {{{ aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0.0D, (acc, v) -> acc + v) }}}
  *
  * to the codegen'd [[DotProduct]] / [[SqDiffSum]] kernels. SQL users (and ported
  * PySpark code) naturally write the HOF formulation; Spark evaluates
  * HOF lambdas through interpreted plumbing that blocks whole-stage
  * codegen for the entire stage and allocates an intermediate zipped
  * array per row — the repo measured ~1000× I/O cost on hot paths.
  * With this rule the declarative form stays, the physical plan gets
  * the fused loop.
  *
  * VECTOR-COLUMN CONTRACT (why the rule is opt-in rather than always
  * on): [[DotProduct]] dots the common prefix of mismatched-length
  * arrays and reads NULL elements as 0, while the HOF formulation
  * NULL-poisons those rows. For embedding columns — fixed dimension,
  * no NULL elements, the only place this pattern appears — the two are
  * identical, summation order included (both fold left-to-right from
  * 0.0). Because of that contract the rewrite only fires when
  * `spark.graft.kernelRewrite.enabled=true` (default FALSE): installing
  * [[GraftExtensions]] alone must not silently change the NULL/length
  * semantics of arbitrary user SQL that happens to match the shape.
  * Enable by setting the flag in a session that has the rule installed
  * — via `spark.experimental.extraOptimizations :+= KernelRewrite` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  *
  * The match is deliberately strict — exact lambda shapes, double
  * arrays, literal 0.0 seed — so anything else is left untouched
  * (a no-match is always safe).
  */
object KernelRewrite extends Rule[LogicalPlan] {

  private def isVec(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType | FloatType, _) => true
    case _ => false
  }

  private def sameVars(bodyA: NamedLambdaVariable, bodyB: NamedLambdaVariable,
      args: Seq[NamedLambdaVariable]): Boolean =
    args.length == 2 &&
      Set(bodyA.exprId, bodyB.exprId) == Set(args(0).exprId, args(1).exprId) &&
      bodyA.exprId != bodyB.exprId

  /** (x, y) -> x * y (either operand order) over exactly the lambda's
    * own two arguments.
    */
  private def isPairwiseProduct(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(x: NamedLambdaVariable,
        y: NamedLambdaVariable, _), args, _) =>
      sameVars(x, y, args.collect { case v: NamedLambdaVariable => v })
    case _ => false
  }

  /** (x, y) -> (x − y)·(x − y): the same subtraction squared (the
    * square makes the operand order immaterial for the rewrite).
    */
  private def isPairwiseSqDiff(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(
        Subtract(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
        Subtract(x2: NamedLambdaVariable, y2: NamedLambdaVariable, _), _),
        args, _) =>
      x1.exprId == x2.exprId && y1.exprId == y2.exprId &&
        sameVars(x1, y1, args.collect { case v: NamedLambdaVariable => v })
    case _ => false
  }

  /** (acc, v) -> acc + v (either operand order). */
  private def isSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(Add(a: NamedLambdaVariable,
        b: NamedLambdaVariable, _), args, _) =>
      sameVars(a, b, args.collect { case v: NamedLambdaVariable => v })
    case _ => false
  }

  /** finish lambda is the identity on its single argument. */
  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      v.exprId == arg.exprId
    case _ => false
  }

  /** The opt-in flag — see the vector-column contract above. */
  val EnabledKey = "spark.graft.kernelRewrite.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "false").toBoolean) plan
    else plan.transformAllExpressionsWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern
        .HIGH_ORDER_FUNCTION)) {
      case ArrayAggregate(ZipWith(a, b, mul), Literal(0.0, DoubleType),
          merge, finish)
          if isVec(a) && isVec(b) && isPairwiseProduct(mul) &&
            isSumMerge(merge) && isIdentityFinish(finish) =>
        DotProduct(a, b)
      case ArrayAggregate(ZipWith(a, b, sq), Literal(0.0, DoubleType),
          merge, finish)
          if isVec(a) && isVec(b) && isPairwiseSqDiff(sq) &&
            isSumMerge(merge) && isIdentityFinish(finish) =>
        SqDiffSum(a, b)
    }
}
