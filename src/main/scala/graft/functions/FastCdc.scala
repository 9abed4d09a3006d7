package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Content-defined chunk CUT POINTS over a BINARY payload (the
  * FastCDC/LBFS storage-dedup rule, byte-granular — the multimodal
  * counterpart of the token-level [[graft.llm.Dedup.cdcChunks]]): one
  * sequential pass over the bytes emits the chunk END offsets
  * (1-based, ascending, final offset = payload length).
  *
  * Cut rule, engine-portable by construction:
  *  - a byte position p is a CANDIDATE cut iff p ≥ `k` and the first
  *    48 bits of md5(bytes[p−k+1..p]) ≡ 0 mod 2^`maskBits` — the
  *    windowed-hash boundary test (boundaries depend only on the k
  *    local bytes, so an insertion shifts offsets but leaves every
  *    downstream boundary and chunk digest intact);
  *  - FastCDC normalization: a candidate only fires ≥ `minLen` bytes
  *    after the previous cut, and a cut is FORCED at `maxLen` bytes
  *    regardless — bounding every chunk in [minLen, maxLen] (the
  *    final remainder may be shorter).
  *
  * Expected chunk length ≈ 2^maskBits bytes between the clamps. The
  * md5-windowed hash (not a gear table) keeps the house determinism
  * contract: the DuckDB oracle re-derives the identical candidates
  * set-wise and replays the min/max walk as a recursive CTE.
  *
  * Scale shape: a pure per-row map (one md5 per byte position) —
  * payloads never leave their partition; the downstream dedup is a
  * 16-byte-digest groupBy.
  */
case class FastCdc(child: Expression, k: Int, maskBits: Int,
    minLen: Int, maxLen: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if k < 1 || maskBits < 1 || maskBits > 48 =>
      TypeCheckResult.TypeCheckFailure(
        s"fastcdc needs k >= 1 and maskBits in [1, 48], got ($k, $maskBits)")
    case _ if minLen < 1 || maxLen < minLen =>
      TypeCheckResult.TypeCheckFailure(
        s"fastcdc needs 1 <= minLen <= maxLen, got ($minLen, $maxLen)")
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"fastcdc needs binary input, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "fastcdc_cuts"

  def compute(v: Any): Any = {
    if (v == null) return null
    val bytes = v.asInstanceOf[Array[Byte]]
    val n = bytes.length
    val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
    val md = FastCdc.digest.get()
    val mask = (1L << maskBits) - 1
    var last = 0
    var p = 1
    while (p <= n) {
      var cut = p - last == maxLen
      if (!cut && p >= k && p - last >= minLen) {
        md.reset()
        md.update(bytes, p - k, k)
        val d = md.digest()
        var h = 0L
        var i = 0
        while (i < 6) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
        cut = (h & mask) == 0L
      }
      if (cut) { ends += p; last = p }
      p += 1
    }
    if (last < n) ends += n
    new GenericArrayData(ends.toArray)
  }

  override def nullSafeEval(v: Any): Any = compute(v)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fastCdc", this)
    defineCodeGen(ctx, ev, c =>
      s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): FastCdc =
    copy(child = newChild)
}

object FastCdc {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  import org.apache.spark.sql.Column

  /** Column form: chunk end offsets of a binary payload column. */
  def cuts(payload: Column, k: Int = 16, maskBits: Int = 6,
      minLen: Int = 24, maxLen: Int = 128): Column =
    org.apache.spark.sql.GraftSqlShims.column(
      FastCdc(org.apache.spark.sql.GraftSqlShims.expression(payload),
        k, maskBits, minLen, maxLen))
}
