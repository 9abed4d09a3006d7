package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Multiset statistics of a SORTED long array in one walk:
  * `struct(n, n_distinct, max_run)` — total elements, distinct values,
  * and the longest equal-value run (= the max multiplicity).
  *
  * This is the per-document half of a `groupBy(doc, gram).count` →
  * `groupBy(doc).agg(sum, count, max)` repetition profile, collapsed
  * into a map-side expression: feed it [[SortedHashes]] of the
  * document's n-gram multiset and the whole corpus-wide double shuffle
  * disappears. Distinctness is decided on 64-bit `xxhash64` digests,
  * not the grams themselves — within-document collisions
  * (~m²/2⁶⁵ for m grams) are accepted; the equality with the exact
  * string-keyed aggregation formulation is pinned on the fixture corpus
  * in GraftFunctionsProps/LlmSpec. Inputs that are not sorted are out
  * of contract.
  */
case class SortedRunStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"sorted_run_stats needs array<bigint> input, got ${dt.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("max_run", IntegerType, nullable = false)))

  override def prettyName: String = "sorted_run_stats"

  def compute(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return new GenericInternalRow(Array[Any](0, 0, 0))
    var i = 1
    var distinct = 1
    var run = 1
    var maxRun = 1
    var prev = a.getLong(0)
    while (i < n) {
      val x = a.getLong(i)
      if (x == prev) {
        run += 1
        if (run > maxRun) maxRun = run
      } else {
        distinct += 1
        run = 1
        prev = x
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n, distinct, maxRun))
  }

  override def nullSafeEval(v: Any): Any = compute(v)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedRunStats", this)
    defineCodeGen(ctx, ev, c =>
      s"(org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SortedRunStats =
    copy(child = newChild)
}
