package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Σ (aᵢ−bᵢ)² over two numeric arrays — squared Euclidean
  * distance, the k-means/IVF workhorse.
  *
  * Drop-in for `aggregate(zip_with(a, b, (x,y) => (x−y)*(x−y)), 0.0,
  * (acc,x) => acc+x)`, whose interpreted lambda plumbing dominated the
  * IVF Lloyd assignment (N×nlist evaluations per iteration). Summation
  * is left-to-right from 0.0 — bit-identical to the fold it replaces
  * and to the DuckDB oracle's `list_sum(list_transform(...))`, so cell
  * argmins (which compare these sums) cannot move. Mismatched lengths
  * use the common prefix; callers guarantee equal dims.
  */
case class SqDiffSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType | FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sq_diff_sum needs array<float|double> inputs, " +
        s"got ${left.dataType.sql} / ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_diff_sum"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xf, yf) = (elemIsFloat(left), elemIsFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      def get(arr: String, e: Expression) =
        if (elemIsFloat(e)) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${get(a, left)} - ${get(b, right)};
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SqDiffSum =
    copy(left = newLeft, right = newRight)
}

object SqDiffSum {
  /** Column-API entry point. */
  def apply(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftSqlShims.column(SqDiffSum(
      org.apache.spark.sql.GraftSqlShims.expression(a),
      org.apache.spark.sql.GraftSqlShims.expression(b)))
}
