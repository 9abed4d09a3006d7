package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** |a ∩ b| for two SORTED DISTINCT long arrays, as a merge walk.
  *
  * Drop-in for `size(array_intersect(a, b))` in the dedup verify
  * phase, where both sides are [[SortedHashes]] outputs (sorted,
  * distinct by construction): `array_intersect` builds a hash set and
  * materializes the intersection array per pair just to take its size —
  * this walks the two buffers once with no allocation. Equality with
  * the `array_intersect` formulation on the fixture corpus is pinned in
  * MinHashSigSpec. Duplicate values in a sorted input are tolerated and
  * counted ONCE (the walk skips equal runs after a match, matching
  * `array_intersect`'s distinct semantics even under intra-doc digest
  * collisions); UNSORTED inputs are out of contract.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count needs array<bigint> inputs, " +
          s"got ${l.sql} / ${r.sql}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  def compute(a: Any, b: Any): Int = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) {
        // count the VALUE once, then advance past repeats on both
        // sides — matches size(array_intersect)'s distinct semantics
        // even if an input carries duplicates (e.g. intra-doc digest
        // collisions), rather than counting pairwise multiplicity
        c += 1
        while (i < nx && x.getLong(i) == xv) i += 1
        while (j < ny && y.getLong(j) == yv) j += 1
      }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override def nullSafeEval(a: Any, b: Any): Any = compute(a, b)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedIntersectCount", this)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.compute($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
