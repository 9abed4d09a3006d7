package graft

import graft.ts.AsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics of the composed as-of and bucketized range joins
  * (bulk agreement with DuckDB's native ASOF JOIN is covered by the
  * q75/q76 oracles).
  */
class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("as-of: <= tie matches, pre-history is NULL, latest wins") {
    import spark.implicits._
    val left = Seq(("BTC", 5L, "early"), ("BTC", 10L, "tie"),
      ("BTC", 25L, "late"), ("ETH", 99L, "nohist"))
      .toDF("k", "t", "tag")
    val right = Seq(("BTC", 10L, 1.0), ("BTC", 20L, 2.0))
      .toDF("k", "rt", "px")
    val got = AsOf.asOfJoin(left, right, "k",
        leftTime = col("t"), rightTime = col("rt"), payload = Seq("px"))
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[Any]("asof_px"))).toMap
    assert(got("early").isEmpty)          // before any right row
    assert(got("tie").contains(1.0))      // rt == t matches (<= contract)
    assert(got("late").contains(2.0))     // latest, not first
    assert(got("nohist").isEmpty)         // key with no right rows at all
  }

  test("range join: bucket-spanning intervals and multi-matches") {
    import spark.implicits._
    val points = Seq(("A", 15L, "p1"), ("A", 95L, "p2"), ("A", 250L, "p3"))
      .toDF("k", "t", "p")
    // i1 spans buckets 0..1 (width 100); i2 overlaps i1 at t=95
    val iv = Seq(("A", 10L, 120L, "i1"), ("A", 90L, 99L, "i2"))
      .toDF("k", "s", "e", "iv")
    val got = AsOf.rangeJoin(points, iv, "k",
        pointTime = col("t"), startCol = col("s"), endCol = col("e"),
        bucketWidth = 100L)
      .select("p", "iv").collect().map(r => (r.getString(0), r.getString(1)))
    // exactly these pairs, each exactly once: a point lives in ONE
    // bucket, so a bucket-spanning interval can never double-match it
    assert(got.length == 3)
    assert(got.toSet == Set(("p1", "i1"), ("p2", "i1"), ("p2", "i2")))
  }

  test("interval overlap: closed bounds, single attribution, key isolation") {
    import spark.implicits._
    val left = Seq(
      ("A", 0L, 250L, "l1"),    // spans buckets 0..2 (W=100)
      ("A", 300L, 310L, "l2"),
      ("B", 0L, 50L, "l3"))
      .toDF("k", "ls", "le", "lv")
    val right = Seq(
      ("A", 50L, 450L, "r1"),   // overlaps l1 across 3 shared buckets AND l2
      ("A", 250L, 260L, "r2"),  // touches l1 at exactly one point (closed)
      ("A", 251L, 260L, "r3"),  // misses l1 by one
      ("B", 60L, 70L, "r4"))    // same bucket as l3, no overlap
      .toDF("k", "rs", "re", "rv")
    val got = graft.ts.IntervalJoin.overlaps(left, right, "k", 100L)
      .select("lv", "rv").collect().map(r => (r.getString(0), r.getString(1)))
    // each overlapping pair EXACTLY once despite multi-bucket spans
    assert(got.length == got.toSet.size)
    assert(got.toSet == Set(("l1", "r1"), ("l2", "r1"), ("l1", "r2")))
  }
}
