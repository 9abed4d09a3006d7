package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-word shingle set of a token array, as one compiled pass.
  *
  * Replaces `array_distinct(transform(sequence(1, size-n+1),
  * i => concat_ws(" ", slice(toks, i, n))))`: Spark evaluates
  * higher-order functions through interpreted lambda plumbing (and the
  * `slice` inside the lambda re-copies n elements per position), which
  * measured ~5 s for 5 000 fixture docs — ~1000× the I/O cost — and is
  * paid per *consumer subtree* in the self-join dedup plans. This
  * expression builds the distinct shingle set in one tight JVM loop
  * (first-occurrence order, like `array_distinct`), invoked from
  * generated code via a reference object, so the enclosing stage stays
  * inside whole-stage codegen.
  *
  * Semantics are bit-identical to the formulation it replaces
  * (LlmSpec pins this): fewer than `n` tokens — including the
  * `split("") == [""]` empty-text case — yields an empty array, a NULL
  * token array (NULL text upstream) yields an empty array (the old
  * `when(...).otherwise(array())` fell through to `otherwise` on NULL),
  * and shingles join tokens with a single space.
  */
case class WordShingles(child: Expression, n: Int,
    distinct: Boolean = true)
    extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"word_shingles needs array<string> input, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "word_shingles"

  def compute(toks: ArrayData): ArrayData = {
    val sz = toks.numElements()
    if (sz < n) return WordShingles.empty
    // LinkedHashSet: dedup with first-occurrence order, exactly
    // array_distinct's contract; plain list when `distinct = false`
    // (the multiset feeds repetition counting)
    val out: java.util.Collection[UTF8String] =
      if (distinct) new java.util.LinkedHashSet[UTF8String]()
      else new java.util.ArrayList[UTF8String](sz - n + 1)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= sz - n) {
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      // concatWs skips NULL inputs — same as the concat_ws it replaces
      out.add(UTF8String.concatWs(WordShingles.space, parts: _*))
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  def computeOrEmpty(v: Any): ArrayData =
    if (v == null) WordShingles.empty
    else compute(v.asInstanceOf[ArrayData])

  override def eval(input: InternalRow): Any =
    computeOrEmpty(child.eval(input))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this)
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        $ref.computeOrEmpty(${c.isNull} ? null : ${c.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  private val space = UTF8String.fromString(" ")
  private val empty = new GenericArrayData(Array.empty[Any])
}
