package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) as a native
  * expression — Spark ships no normalizer builtin, and a Scala UDF
  * would break whole-stage codegen on the text-canonicalization hot
  * path ([[graft.llm.TextOps.canonicalize]]).
  *
  * NFC is the cross-engine-stable choice for dedup canonicalization:
  * visually-identical decomposed/composed sequences (`e` + U+0301 vs
  * `é`) hash to different fingerprints un-normalized, splitting what a
  * user sees as one document into two dedup identities. The q110
  * oracle pairs this with DuckDB's `nfc_normalize` — both implement
  * the same Unicode canonical composition, so the derivation is
  * engine-portable (compatibility-only foldings like ﬁ → fi are NFKC
  * and deliberately NOT applied).
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * true for virtually all real corpus text (ASCII is NFC-invariant),
  * so the composed-copy cost is paid only by rows that need it.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs string input, got ${dt.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  def compute(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) v
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  override def nullSafeEval(v: Any): Any = compute(v)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfcNormalize", this)
    defineCodeGen(ctx, ev, c =>
      s"(org.apache.spark.unsafe.types.UTF8String) $ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
