package graft

import graft.ops.Scan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed global prefix scan + the KS test riding it. */
class ScanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("globalRunningSum == single-partition window, any partitioning") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, ((i * 37) % 100).toLong))
      .toDF("k", "v")
    def got(d: org.apache.spark.sql.DataFrame) =
      Scan.globalRunningSum(d, Seq("k"), col("v")).orderBy("k")
        .select("k", "run").collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = (1 to 500).scanLeft((0L, 0L)) { case ((_, acc), i) =>
      (i.toLong, acc + (i * 37) % 100) }.tail
    assert(got(df).toSeq == expected)
    // the scan is partitioning-INVARIANT: same answer from any layout
    assert(got(df.repartition(7, col("v"))).toSeq == expected)
    assert(got(df.coalesce(1)).toSeq == expected)
  }

  test("globalRunningSums: both columns ride one scan, independently") {
    import spark.implicits._
    val df = Seq((1L, 10L, 1L), (2L, 0L, 2L), (3L, 5L, 4L))
      .toDF("k", "a", "b")
    val r = Scan.globalRunningSums(df, Seq("k"),
        Seq(col("a") -> "ra", col("b") -> "rb"))
      .orderBy("k").select("ra", "rb").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(r.toSeq == Seq((10L, 1L), (10L, 3L), (15L, 7L)))
  }

  test("gini: uniform reads 0; hand-checked concentration and top shares") {
    import spark.implicits._
    def g(xs: Seq[Long]) = graft.ops.Concentration.gini(
      xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("uid", "cents"),
      "cents", "uid").collect()(0)
    val eq = g(Seq.fill(4)(25L))
    assert(eq.getLong(0) == 4L && eq.getLong(1) == 100L)
    assert(eq.getFloat(2) == 0.0f)
    // 9 units of 1 + one whale of 91: S = 45 + 10·91 = 955 →
    // gini = (1910 − 11·100)/(10·100) = 0.81; top-10% = the whale
    val wh = g(Seq.fill(9)(1L) :+ 91L)
    assert(wh.getFloat(2) == 0.81f)
    assert(wh.getFloat(3) == 0.0f)   // n DIV 100 = 0 → empty top-1%
    assert(wh.getFloat(4) == 0.91f)
  }

  test("ksTest: hand-checked D and attaining point; identical samples read 0") {
    import spark.implicits._
    // g1 = {1,2,3}, g2 = {3,4}: |F1-F2| peaks at v=2 with 2/3
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 3.0), ("b", 4.0))
      .toDF("g", "value")
    val r = Scan.ksTest(df, "value", "g", "a", "b").collect()(0)
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(r.getFloat(2) == 0.6667f)
    assert(r.getDouble(3) == 2.0)
    // the same sample against itself: D = 0
    val same = Seq(("a", 1.0), ("a", 5.0), ("b", 1.0), ("b", 5.0))
      .toDF("g", "value")
    assert(Scan.ksTest(same, "value", "g", "a", "b")
      .collect()(0).getFloat(2) == 0.0f)
  }
}
