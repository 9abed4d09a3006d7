package graft

import graft.functions.FastCdc
import graft.llm.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level FastCDC cut points ([[graft.functions.FastCdc]]) and
  * the chunk-dedup operator over them (q240): the expression is
  * checked against an INDEPENDENT Scala reimplementation of the cut
  * rule, plus the properties that make CDC worth having — length
  * clamps and shift-robustness of downstream boundaries.
  */
class FastCdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val K = 16
  private val MASK = 63L
  private val MIN = 24
  private val MAX = 128

  /** Reference walk, written independently of the expression. */
  private def refCuts(bytes: Array[Byte]): Seq[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def cand(p: Int): Boolean = {
      md.reset(); md.update(bytes, p - K, K)
      val d = md.digest()
      val h = (0 until 6).foldLeft(0L)((a, i) => (a << 8) | (d(i) & 0xFFL))
      (h & MASK) == 0L
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var last = 0
    (1 to bytes.length).foreach { p =>
      if (p - last == MAX || (p >= K && p - last >= MIN && cand(p))) {
        out += p; last = p
      }
    }
    if (last < bytes.length) out += bytes.length
    out.toSeq
  }

  private def exprCuts(bytes: Array[Byte]): Seq[Int] = {
    import spark.implicits._
    Seq(Tuple1(bytes)).toDF("payload")
      .select(FastCdc.cuts(col("payload")).as("c"))
      .collect()(0).getSeq[Int](0)
  }

  test("cut points match the independent reference walk, incl. non-ASCII") {
    val rnd = new scala.util.Random(11)
    (0 until 30).foreach { i =>
      val n = rnd.nextInt(600)
      val bytes = new Array[Byte](n)
      rnd.nextBytes(bytes) // full byte range — BYTE semantics, not chars
      val got = exprCuts(bytes)
      assert(got == refCuts(bytes), s"mismatch on case $i (n=$n)")
      // clamps: every chunk ≤ MAX; every non-final chunk ≥ MIN
      val lens = got.zip(0 +: got.init).map { case (e, s) => e - s }
      assert(lens.forall(_ <= MAX))
      assert(lens.init.forall(_ >= MIN))
      if (n > 0) assert(got.last == n) else assert(got.isEmpty)
    }
  }

  test("shift-robustness: a head insertion leaves downstream chunks intact") {
    val rnd = new scala.util.Random(7)
    val base = new Array[Byte](500)
    rnd.nextBytes(base)
    val shifted = Array.fill[Byte](37)(42.toByte) ++ base
    def digests(b: Array[Byte]): Seq[String] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val cuts = refCuts(b)
      cuts.zip(0 +: cuts.init).map { case (e, s) =>
        md.reset(); md.update(b, s, e - s)
        md.digest().map("%02x".format(_)).mkString
      }
    }
    val d1 = digests(base)
    val d2 = digests(shifted).toSet
    // every base chunk after the first post-insertion boundary
    // re-appears in the shifted payload despite all offsets moving
    assert(d1.drop(2).forall(d2.contains),
      "downstream chunk digests did not survive the head insertion")
  }

  test("fastCdcDedup: identical docs share every chunk (df = 2)") {
    import spark.implicits._
    val txt = scala.util.Random.javaRandomToRandom(
      new java.util.Random(3)).alphanumeric.take(400).mkString
    val docs = Seq((1L, txt), (2L, txt), (3L, txt.reverse))
      .toDF("doc_id", "text")
    val out = Dedup.fastCdcDedup(docs).collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc(1L).forall(_.getAs[Long]("df") >= 2),
      "identical docs must share every chunk digest")
    // offsets partition the payload
    byDoc.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("chunk_idx"))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val expStart = if (i == 0) 1
          else sorted(i - 1).getAs[Int]("start") +
            sorted(i - 1).getAs[Int]("n_bytes")
        assert(r.getAs[Int]("start") == expStart)
      }
      assert(sorted.map(_.getAs[Int]("n_bytes")).sum == 400)
    }
  }
}
