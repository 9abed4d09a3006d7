package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Sorted `xxhash64` digests of a string array — a drop-in for
  * `array_sort(transform(arr, s => xxhash64(s)))` (seed-42, same as the
  * builtin; MinHashSigSpec pins the equivalence) without the
  * interpreted-lambda pass per row. The 8-byte sorted digest arrays are
  * what the dedup verify phase intersects instead of ~20-byte shingle
  * strings.
  */
case class SortedHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"sorted_hashes needs array<string> input, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_hashes"

  def compute(v: Any): Any = {
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = arr.getUTF8String(i)
      // builtin xxhash64 skips NULL inputs (result = the 42 seed)
      out(i) = if (s == null) 42L else XXH64.hashUTF8String(s, 42L)
      i += 1
    }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedHashes", this)
    defineCodeGen(ctx, ev, c =>
      s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SortedHashes =
    copy(child = newChild)
}
