package graft

import graft.functions.DtwDistance
import org.apache.spark.sql.GraftSqlShims
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-walked DP checks for the banded DTW kernel + the codegen'd
  * DataFrame path. */
class DtwSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def dtw(a: Seq[Long], b: Seq[Long], w: Int = 6): Any =
    DtwDistance(null, null, w).compute(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a.toArray),
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b.toArray))

  test("hand-computed alignments") {
    // [0,3,6] vs [0,6]: (1,1)=0, (2,1)=3, (2,2)=3+min(6,3,0)=3,
    // (3,2)=0+min(3,9,3)=3
    assert(dtw(Seq(0L, 3L, 6L), Seq(0L, 6L)) == 3L)
    // identical series align along the diagonal at zero cost
    assert(dtw(Seq(5L, 9L, 2L, 7L), Seq(5L, 9L, 2L, 7L)) == 0L)
    // time-shifted copy: DTW absorbs the shift where L1 cannot —
    // [1,1,5,1] vs [1,5,1,1] aligns at 0 (each 5 matches the 5)
    assert(dtw(Seq(1L, 1L, 5L, 1L), Seq(1L, 5L, 1L, 1L)) == 0L)
    // single-element series: plain |a-b|
    assert(dtw(Seq(4L), Seq(9L)) == 5L)
    // empty series -> null
    assert(dtw(Seq.empty, Seq(1L)) == null)
  }

  test("band widening keeps length-skewed pairs feasible") {
    // len 1 vs len 9 with wBase 0: w = 0 + 8 covers the full row
    val r = DtwDistance(null, null, 0).compute(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(0L)),
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        (1L to 9L).toArray))
    assert(r == 45L) // sum 1..9: the single point matches everything
  }

  test("codegen'd DataFrame path matches the kernel") {
    import spark.implicits._
    val df = Seq(
      (Seq(0L, 3L, 6L), Seq(0L, 6L)),
      (Seq(1L, 1L, 5L, 1L), Seq(1L, 5L, 1L, 1L)),
      (Seq(10L, 20L), Seq(12L, 17L, 25L))
    ).toDF("a", "b")
    val got = df.select(GraftSqlShims.column(DtwDistance(
      GraftSqlShims.expression(col("a")),
      GraftSqlShims.expression(col("b")), 6)).as("d"))
      .collect().map(_.getLong(0)).toSeq
    val exp = Seq(
      dtw(Seq(0L, 3L, 6L), Seq(0L, 6L)),
      dtw(Seq(1L, 1L, 5L, 1L), Seq(1L, 5L, 1L, 1L)),
      dtw(Seq(10L, 20L), Seq(12L, 17L, 25L)))
    assert(got == exp)
  }

  test("fixture pairs: dtw <= banded L1 on equal-length prefixes") {
    // DTW over any band is never worse than the rigid diagonal
    // alignment when lengths are equal (diagonal is one admissible
    // warp path)
    val bars = graft.ts.Bars.hourly(
      Tables.load(spark, "/root/testdata/sf0.001", "events"))
    val ser = graft.ts.Dtw.series(bars).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Long](1).toArray).toMap
    val ids = ser.keys.toSeq.sorted.take(4)
    for (a <- ids; b <- ids if a < b) {
      val n = math.min(ser(a).length, ser(b).length)
      val qa = ser(a).take(n).toSeq
      val qb = ser(b).take(n).toSeq
      val d = dtw(qa, qb).asInstanceOf[Long]
      val diag = qa.zip(qb).map { case (x, y) => math.abs(x - y) }.sum
      assert(d <= diag, s"pair ($a,$b): dtw $d > diagonal $diag")
    }
  }
}
