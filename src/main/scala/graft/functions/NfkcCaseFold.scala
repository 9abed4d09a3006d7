package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFKC compatibility normalization + ROOT-locale case fold as
  * a native expression — the tokenizer-input canonicalization pass
  * ([[NfcNormalize]]'s COMPATIBILITY sibling): where NFC only composes
  * canonically-equivalent sequences, NFKC also folds compatibility
  * variants — ligatures (ﬁ → fi), fullwidth forms (Ａ → A),
  * superscripts (² → 2), roman numerals (Ⅻ → XII), no-break spaces —
  * and the case fold collapses the remaining case distinction, so
  * "ＴＥＳＴ", "test" and "ﬁle"/"file" land on the same vocabulary
  * entries. This is the normalization real tokenizer pipelines run
  * FIRST (HF `normalizers.NFKC` + lowercase; SentencePiece's default
  * is the closely-related NFKC rules), and skipping it silently splits
  * token statistics across compatibility variants.
  *
  * Pinned sequence: NFKC (java.text.Normalizer) → per-string
  * `toLowerCase(Locale.ROOT)` (locale-independent — no Turkish-i
  * surprises) → NFKC again (lowercasing can re-expose compatibility
  * compositions; the second pass makes the result a fixed point, so
  * the operator is IDEMPOTENT — property-tested in
  * GraftFunctionsProps).
  *
  * Fast path: pure-ASCII no-uppercase text (virtually all real corpus
  * bytes) is NFKC-invariant and lowercase-invariant — one allocation-
  * free scan skips all three copies for it.
  *
  * Scale shape: a scalar map kernel inside whole-stage codegen via a
  * reference-object call (the [[JaroWinkler]] pattern) — zero
  * shuffles, runs where the text already sits.
  */
case class NfkcCaseFold(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"nfkc_casefold needs string input, got ${dt.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "nfkc_casefold"

  def compute(v: Any): Any = {
    val u = v.asInstanceOf[UTF8String]
    val s = u.toString
    if (NfkcCaseFold.isAsciiNoUpper(s)) v
    else UTF8String.fromString(NfkcCaseFold.fold(s))
  }

  override def nullSafeEval(v: Any): Any = compute(v)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nfkcCaseFold", this)
    defineCodeGen(ctx, ev, c =>
      s"(org.apache.spark.unsafe.types.UTF8String) $ref.compute($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NfkcCaseFold = copy(child = newChild)
}

object NfkcCaseFold {

  /** Pure ASCII with no uppercase — such text is NFKC-invariant AND
    * lowercase-invariant, so all three copies can be skipped. The
    * check must reject ALL non-ASCII (not merely non-normalized):
    * pre-composed uppercase like É is NFKC-normalized yet still folds. */
  private[functions] def isAsciiNoUpper(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c > 0x7f || (c >= 'A' && c <= 'Z')) return false
      i += 1
    }
    true
  }

  /** The pinned kernel: NFKC → lowercase(ROOT) → NFKC (fixed point). */
  def fold(s: String): String =
    Normalizer.normalize(
      Normalizer.normalize(s, Normalizer.Form.NFKC)
        .toLowerCase(java.util.Locale.ROOT),
      Normalizer.Form.NFKC)
}
