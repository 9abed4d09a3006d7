package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-position Rabin–Karp k-gram fingerprints of a token array in ONE
  * O(tokens) pass: element `i` (0-based) is the polynomial hash of
  * tokens `i .. i+k−1`,
  *
  *   `H(i) = Σ_{j<k} code(t_{i+j}) · B^{k−1−j}  mod  P`
  *
  * with `code(t)` = the first 32 bits of md5(t) (the [[RollingFp]]
  * token code), `B = 10⁹+7`, and `P = 2⁶¹−1` (Mersenne — the 64-bit
  * mulmod reduces with two shift-folds, no BigInteger). Successive
  * windows roll: `H(i+1) = (H(i) − code(t_i)·B^{k−1})·B + code(t_{i+k})`,
  * so the per-document cost is O(m) hashes + O(m) long ops — versus
  * the O(m·k) bytes hashed by materializing and md5-ing every k-token
  * slice, the difference between a scan-bound and a CPU-bound
  * ExactSubstr pass at the production k = 50
  * ([[graft.llm.Dedup.exactSubstrSpansRolling]] is the consumer).
  *
  * Two DIFFERENT grams collide with probability ≈ 2⁻⁶¹ per pair
  * (m²/2⁶² corpus-wide) — the reason the rolling form's span output is
  * required (and spec-asserted) identical to the md5 form's at fixture
  * scale, and safely identical in expectation far beyond it.
  *
  * A NULL element poisons the whole result to NULL (the [[RollingFp]]
  * contract); an array shorter than k yields an empty array.
  */
case class RollingGramFp(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, "gram length must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"rolling_gram_fp needs array<string> input, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_gram_fp"

  import RollingGramFp.{M61, P, B, addmod, mulmod}

  /** B^(k−1) mod P, the outgoing-token weight. */
  @transient private lazy val powB: Long = {
    var r = 1L
    var i = 1
    while (i < k) { r = mulmod(r, B); i += 1 }
    r
  }

  def compute(v: Any): Any = {
    if (v == null) return null
    val toks = v.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val n = m - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    val md = RollingFp.digest.get()
    val codes = new Array[Long](m)
    var i = 0
    while (i < m) {
      val t = toks.getUTF8String(i)
      if (t == null) return null // NULL element poisons the result
      md.reset()
      val d = md.digest(t.getBytes)
      codes(i) = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      i += 1
    }
    val out = new Array[Long](n)
    var h = 0L
    i = 0
    while (i < k) { h = addmod(mulmod(h, B), codes(i)); i += 1 }
    out(0) = h
    var j = 1
    while (j < n) {
      h = addmod(mulmod(addmod(h, P - mulmod(codes(j - 1), powB)), B),
        codes(j + k - 1))
      out(j) = h
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = compute(v)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rollingGramFp", this)
    val obj = ctx.freshName("gfp")
    nullSafeCodeGen(ctx, ev, c =>
      s"""Object $obj = $ref.compute($c);
         |if ($obj == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  (org.apache.spark.sql.catalyst.util.ArrayData) $obj; }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): RollingGramFp = copy(child = newChild)
}

object RollingGramFp {
  /** Mersenne modulus 2⁶¹−1 and its low-61-bit mask. */
  val P: Long = (1L << 61) - 1
  private val M61: Long = P
  /** Polynomial base (any value < P works; 10⁹+7 matches the repo's
    * rolling-hash convention in [[RollingFp]]). */
  val B: Long = 1000000007L

  /** (a + b) mod P for a, b ∈ [0, P) — no overflow: a + b < 2⁶². */
  def addmod(a: Long, b: Long): Long = {
    val r = a + b
    if (r >= P) r - P else r
  }

  /** (a · b) mod P for a, b ∈ [0, P): full 128-bit product via
    * multiplyHigh, then two shift-folds by 2⁶¹ ≡ 1 (mod P). After the
    * second fold r ≤ 2⁶¹ = P + 1, so one conditional subtract lands
    * in [0, P).
    */
  def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = (lo & M61) + ((hi << 3) | (lo >>> 61))
    r = (r & M61) + (r >>> 61)
    if (r >= P) r - P else r
  }
}
