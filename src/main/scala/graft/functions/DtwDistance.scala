package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Banded dynamic-time-warping distance between two integer series —
  * the classic elastic similarity measure for time series (Sakoe &
  * Chiba 1978): the minimum total |aᵢ−bⱼ| cost over monotone
  * alignments, with the standard band constraint |i−j| ≤ w where
  * w = `wBase` + |len(a)−len(b)| (the length-difference widening
  * keeps every pair feasible).
  *
  * A native expression (the [[JaroWinkler]] pattern): the DP is a
  * sequential per-pair kernel — O(len·(2w+1)) with two rolling rows —
  * that no relational operator expresses; series are bounded
  * (bars/symbol), so one pair's DP is a bounded scalar computation
  * inside codegen. All arithmetic is exact 64-bit integer (quantized
  * inputs), so the result replays bit-identically in the oracle's
  * anti-diagonal recursive CTE.
  */
case class DtwDistance(left: Expression, right: Expression, wBase: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case _ if wBase < 0 => TypeCheckResult.TypeCheckFailure(
        s"dtw band must be >= 0, got $wBase")
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"dtw_distance needs (array<bigint>, array<bigint>), " +
          s"got (${a.sql}, ${b.sql})")
    }

  override def dataType: DataType = LongType
  // an EMPTY series yields null even for non-null inputs
  override def nullable: Boolean = true
  override def prettyName: String = s"dtw_distance$wBase"

  private val Inf = Long.MaxValue / 4

  def compute(av: Any, bv: Any): Any = {
    val a = av.asInstanceOf[ArrayData].toLongArray()
    val b = bv.asInstanceOf[ArrayData].toLongArray()
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return null
    val w = wBase + math.abs(la - lb)
    var prev = Array.fill(lb + 1)(Inf)
    var cur = Array.fill(lb + 1)(Inf)
    var i = 1
    while (i <= la) {
      java.util.Arrays.fill(cur, Inf)
      var j = math.max(1, i - w)
      val jMax = math.min(lb, i + w)
      while (j <= jMax) {
        val c = math.abs(a(i - 1) - b(j - 1))
        cur(j) =
          if (i == 1 && j == 1) c
          else {
            val m = math.min(math.min(prev(j), cur(j - 1)), prev(j - 1))
            c + m
          }
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(lb)
  }

  override def nullSafeEval(av: Any, bv: Any): Any = compute(av, bv)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dtwDistance", this)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("dtwRes")
      s"""Object $res = $ref.compute($a, $b);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((Long) $res).longValue();
         |}""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DtwDistance =
    copy(left = newLeft, right = newRight)
}
