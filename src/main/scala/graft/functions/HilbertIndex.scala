package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 2-D Hilbert-curve index of two bucket ranks in [0, 2^bits) — the
  * better-locality sibling of the Morton interleave
  * ([[graft.load.Layout]]'s Z-order): consecutive Hilbert keys are
  * ALWAYS grid neighbors (Manhattan distance 1), where the Z curve
  * jumps across the space at every quadrant seam — so range-
  * partitioned files cover tighter rectangles and footer-stats
  * pruning discards more of them (the Delta/Iceberg OPTIMIZE
  * alternative layout).
  *
  * The classic xy2d walk (level-by-level quadrant fold + rotation) is
  * pure 64-bit integer arithmetic — bit-reproducible cross-engine,
  * re-derivable in SQL as an unrolled per-level CASE chain. A native
  * expression (the [[SimHashFp]] pattern) rather than unrolled
  * Columns: the rotation makes each level reference BOTH prior
  * coordinates twice, so an expression-tree unroll grows 3^bits nodes
  * where this loop is O(bits).
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case _ if bits < 1 || bits > 31 => TypeCheckResult.TypeCheckFailure(
        s"hilbert bits must be in [1, 31], got $bits")
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_index needs (bigint, bigint), got (${a.sql}, ${b.sql})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = s"hilbert_index$bits"

  def compute(xv: Any, yv: Any): Any = {
    var x = xv.asInstanceOf[Long]
    var y = yv.asInstanceOf[Long]
    val n = 1L << bits
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) { // rotate the quadrant
        // flip within the FULL grid (n−1−x): only bits < s matter
        // downstream, and the full-width complement keeps coordinates
        // non-negative where an s−1−x flip would go negative when
        // higher (already-consumed) bits are set
        if (rx == 1) {
          x = n - 1 - x
          y = n - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override def nullSafeEval(xv: Any, yv: Any): Any = compute(xv, yv)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hilbertIndex", this)
    defineCodeGen(ctx, ev, (x, y) =>
      s"(Long) $ref.compute($x, $y)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}
