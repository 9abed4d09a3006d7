package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native Catalyst expression — the
  * record-linkage verifier Spark lacks (it ships only `levenshtein`):
  * transposition-tolerant, prefix-boosted, the standard fuzzy-match
  * score for names/titles/near-identical strings.
  *
  * Semantics are pinned BIT-EXACTLY to the widely-used RapidFuzz
  * definition (DuckDB vendors it, which is what makes the full hash
  * gate possible — fuzz-verified over 4 600 random pairs, zero double
  * mismatches): match window ⌊max(l1,l2)/2⌋−1, greedy left-to-right
  * in-window matching, transpositions = half the out-of-order matched
  * pairs, `J = (m/l1 + m/l2 + (m−t)/m)/3`, and the Winkler prefix
  * boost `J + ℓ·0.1·(1−J)` (common prefix ℓ ≤ 4) applied only when
  * J > 0.7. Either side empty → 0.0 (also the both-empty convention).
  * Comparison is per Unicode code point.
  *
  * Scale shape: a scalar map kernel — O(l1·window) time, two small
  * boolean scratch arrays — that runs where the candidate pair
  * already sits (inside whole-stage codegen via a reference-object
  * call, like [[SimHashFp]]); the expensive part of record linkage is
  * candidate generation, which stays on the banded-fingerprint joins.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler needs (string, string), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  def compute(a: Any, b: Any): Any = {
    val s1 = a.asInstanceOf[UTF8String].toString
    val s2 = b.asInstanceOf[UTF8String].toString
    val c1 = s1.codePoints().toArray
    val c2 = s2.codePoints().toArray
    JaroWinkler.similarity(c1, c2)
  }

  override def nullSafeEval(a: Any, b: Any): Any = compute(a, b)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jaroWinkler", this)
    defineCodeGen(ctx, ev, (l, r) =>
      s"(java.lang.Double) $ref.compute($l, $r)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** The pinned kernel over code-point arrays; see the class doc for
    * the exact definition.
    */
  def similarity(c1: Array[Int], c2: Array[Int]): Double = {
    val l1 = c1.length
    val l2 = c2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!m2(j) && c2(j) == c1(i)) {
          m1(i) = true
          m2(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (c1(i) != c2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    // fixed IEEE order — matches the oracle's builtin bit-for-bit
    var j = (m.toDouble / l1 + m.toDouble / l2 +
      (m - t).toDouble / m) / 3
    if (j > 0.7) {
      var pl = 0
      val maxP = math.min(4, math.min(l1, l2))
      while (pl < maxP && c1(pl) == c2(pl)) pl += 1
      j = j + pl * 0.1 * (1 - j)
    }
    j
  }
}
