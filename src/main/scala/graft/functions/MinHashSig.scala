package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `k`-hash MinHash signature of a (distinct) string array in one pass.
  *
  * Hash family j (j = 0..k−1) is bit-identical to the builtin
  * `xxhash64(s, lit(j))` (seed-42 chain: string block, then the int
  * literal mixed on top — MinHashSigSpec pins the equivalence), so this
  * is a drop-in for `array_min(transform(arr, s => xxhash64(s,
  * lit(j))))` × k. That formulation pays k interpreted lambda passes
  * over the array per row — ~16 M interpreted evals on the 5 000-doc
  * fixture — and blocks whole-stage codegen; this one hashes each
  * string ONCE and runs k cheap int-mix rounds on the digest, inside
  * the compiled stage.
  *
  * NULL or empty input → NULL (exactly `array_min` over an empty
  * transform); callers band only non-empty shingle sets.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"signature length must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<string> input, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  def compute(v: Any): Any = {
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val s = arr.getUTF8String(i)
      // xxhash64(s, lit(j)) = hashInt(j, hashUTF8String(s, 42)); for a
      // NULL element the builtin skips the NULL child, leaving the
      // seed chain at 42 — model that (like SortedHashes) instead of
      // skipping the element, which could miss a lower min.
      val base = if (s != null) XXH64.hashUTF8String(s, 42L) else 42L
      var j = 0
      while (j < k) {
        val h = XXH64.hashInt(j, base)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(v: Any): Any = compute(v)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this)
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("sig")
      s"""
         |Object $tmp = $ref.compute($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  (org.apache.spark.sql.catalyst.util.ArrayData) $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
