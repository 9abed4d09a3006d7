package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Symmetric per-vector int8 quantization of an embedding: scale
  * `s = max|vᵢ| / 127`, code `qᵢ = ⌊vᵢ/s + 0.5⌋` (round-half-up,
  * reproducible as `floor(x/s + 0.5)` in ANSI SQL for the oracle),
  * packed into a BinaryType blob — 8× smaller than the double array
  * and 4× smaller than the float source.
  *
  * This is the memory layout that keeps billion-vector ANN shuffles
  * and broadcast indexes feasible: for COSINE ranking the per-vector
  * scales cancel (cos ≈ Σqₐq_b / √(Σqₐ²)·√(Σq_b²)), so the quantized
  * index never needs the original floats at query time. All-zero
  * vectors quantize to all-zero codes (callers filter their zero
  * norms, same as the exact paths guard theirs).
  *
  * Codegen'd tight loop (two passes over the elements: max, then
  * quantize) — no interpreted lambda, no intermediate array allocation
  * beyond the output blob.
  */
case class QuantizeI8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"quantize_i8 needs array<float|double>, got ${dt.sql}")
  }

  override def dataType: DataType = BinaryType

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def compute(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var m = 0.0
    var i = 0
    while (i < n) {
      val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val a = math.abs(x)
      if (a > m) m = a
      i += 1
    }
    if (m > 0.0) {
      val s = m / 127.0
      i = 0
      while (i < n) {
        val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        out(i) = math.floor(x / s + 0.5).toByte
        i += 1
      }
    }
    out
  }

  override def nullSafeEval(v: Any): Any = compute(v)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val out = ctx.freshName("out")
      val x = ctx.freshName("x")
      val get =
        if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = java.lang.Math.abs($get);
         |  if ($x > $m) $m = $x;
         |}
         |if ($m > 0.0) {
         |  double $s = $m / 127.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = (byte) java.lang.Math.floor($get / $s + 0.5);
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): QuantizeI8 =
    copy(child = c)
}

object QuantizeI8 {
  def apply(a: Column): Column =
    GraftSqlShims.column(QuantizeI8(GraftSqlShims.expression(a)))
}

/** Σ aᵢ·bᵢ over two int8 code blobs ([[QuantizeI8]] output) as a
  * 32-bit integer — exact (|q| ≤ 127, so 64·127² ≪ 2³¹), which is
  * what makes the quantized cosine bit-reproducible across engines:
  * the only floating-point steps left are one division and two
  * square roots of integers. Mismatched lengths dot the common
  * prefix (callers guarantee equal dims).
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantized_dot needs binary inputs, " +
        s"got ${left.dataType.sql} / ${right.dataType.sql}")

  override def dataType: DataType = IntegerType

  def compute(a: Any, b: Any): Int = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var s = 0
    var i = 0
    while (i < n) {
      s += x(i) * y(i)
      i += 1
    }
    s
  }

  override def nullSafeEval(a: Any, b: Any): Any = compute(a, b)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |int $s = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a[$i] * $b[$i];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QuantizedDot {
  def apply(a: Column, b: Column): Column =
    GraftSqlShims.column(QuantizedDot(
      GraftSqlShims.expression(a), GraftSqlShims.expression(b)))
}
