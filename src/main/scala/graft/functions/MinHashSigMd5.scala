package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `k`-hash MinHash signature over a (distinct) string array whose hash
  * family is fully RE-DERIVABLE IN ANSI SQL — the cross-engine twin of
  * [[MinHashSig]].
  *
  * Each element is md5-digested ONCE; the first two big-endian 32-bit
  * words of the digest (hex nibbles 1–8 and 9–16) seed k affine mixing
  * rounds
  *
  * {{{ h_j = ((a_j · x1) mod M + (b_j · x2) mod M + j) mod M,  M = 2^61 − 1 }}}
  *
  * with fixed odd multipliers `a_j`, `b_j` < 2^30 ([[MinHashSigMd5.a]]/
  * [[MinHashSigMd5.b]] — the oracle SQL interpolates THE SAME values, so
  * there is a single source of truth). Every product stays below 2^62,
  * so the arithmetic is exact in any signed-64 engine (DuckDB BIGINT
  * included) with no unsigned/overflow semantics to reconcile. That is
  * the point: the q65 oracle re-derives the full signature, band keys,
  * candidate set, and verification in SQL, making the correctness gate
  * independent of LSH recall on any particular fixture.
  *
  * Performance shape is [[MinHashSig]]'s: one digest per element plus k
  * cheap integer rounds, inside whole-stage codegen via [[compute]].
  * (md5 costs ~2× xxhash64 per string; prefer [[MinHashSig]] when
  * cross-engine reproducibility is not needed.)
  *
  * NULL or empty input → NULL; NULL elements are skipped (shingle
  * arrays never carry them).
  */
case class MinHashSigMd5(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1 && k <= MinHashSigMd5.maxK,
    s"signature length must be in [1, ${MinHashSigMd5.maxK}], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig_md5 needs array<string> input, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig_md5"

  def compute(v: Any): Any = {
    import MinHashSigMd5.{M, aConst, bConst}
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    val d = MinHashSigMd5.digests.get()
    var i = 0
    while (i < m) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        any = true
        d.reset()
        // UTF8String.getBytes IS the UTF-8 encoding — no String
        // round-trip in the per-shingle hot loop
        val bytes = d.digest(s.getBytes)
        // big-endian 32-bit words = hex nibbles 1-8 / 9-16, matching the
        // oracle's strpos-arithmetic derivation over the md5 hex string
        val x1 = ((bytes(0) & 0xffL) << 24) | ((bytes(1) & 0xffL) << 16) |
          ((bytes(2) & 0xffL) << 8) | (bytes(3) & 0xffL)
        val x2 = ((bytes(4) & 0xffL) << 24) | ((bytes(5) & 0xffL) << 16) |
          ((bytes(6) & 0xffL) << 8) | (bytes(7) & 0xffL)
        var j = 0
        while (j < k) {
          val h = ((aConst(j) * x1) % M + (bConst(j) * x2) % M + j) % M
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }

  override def nullSafeEval(v: Any): Any = compute(v)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSigMd5", this)
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

  override protected def withNewChildInternal(newChild: Expression): MinHashSigMd5 =
    copy(child = newChild)
}

object MinHashSigMd5 {
  /** Mersenne modulus 2^61 − 1: with 30-bit multipliers and 32-bit
    * inputs every intermediate fits signed 64-bit exactly.
    */
  val M: Long = (1L << 61) - 1

  /** Fixed odd 30-bit multipliers for hash family j — Knuth/Fibonacci
    * constants folded mod 2^30. The oracle SQL interpolates these same
    * values, so engine and oracle share one definition.
    */
  def a(j: Int): Long = (((2L * j + 1) * 2654435761L) % (1L << 30)) | 1L
  def b(j: Int): Long = (((2L * j + 7919) * 1779033703L) % (1L << 30)) | 1L

  // precomputed per-instance-agnostic tables (k ≤ 1024 is plenty)
  private[functions] val maxK = 1024
  private[functions] val aConst: Array[Long] = Array.tabulate(maxK)(a(_))
  private[functions] val bConst: Array[Long] = Array.tabulate(maxK)(b(_))

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
}
