package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Σ aᵢ·bᵢ over two numeric arrays.
  *
  * Spark's higher-order functions (`zip_with`, `aggregate`) are
  * evaluated through interpreted lambda plumbing and BLOCK whole-stage
  * codegen for the enclosing stage, and the zip allocates an
  * intermediate array per row — both ruinous inside O(N²) similarity
  * pair loops. This expression generates a plain fused Java loop over
  * the two `ArrayData` buffers (no allocation, stage stays codegen'd),
  * the (b)-tier of the custom-operator ladder: native Catalyst
  * `Expression` with `doGenCode` > UDF.
  *
  * Summation is left-to-right from 0.0 — bit-identical to the
  * `aggregate(zip_with(...))` fold it replaces and to DuckDB's
  * `list_dot_product` in the oracles, so swapping it in cannot move
  * any rounded compare. Mismatched lengths dot the common prefix
  * (zip_with would NULL-pad; callers guarantee equal dims). Array
  * ELEMENTS are assumed non-null (embedding vectors) — a null element
  * reads as 0 rather than poisoning the row.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // AbstractDataType/TypeCollection are private[sql] in Spark 4, so the
  // ExpectsInputTypes route is closed to third-party expressions —
  // validate explicitly instead (no implicit casts; callers pass arrays)
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType | FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product needs array<float|double> inputs, " +
        s"got ${left.dataType.sql} / ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

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
      s += xv * yv
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
      def get(arr: String, e: Expression) =
        if (elemIsFloat(e)) s"(double) $arr.getFloat($i)"
        else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${get(a, left)} * ${get(b, right)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftSqlShims.column(DotProduct(
      GraftSqlShims.expression(a), GraftSqlShims.expression(b)))
}
