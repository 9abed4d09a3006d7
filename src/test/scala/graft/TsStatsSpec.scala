package graft

import graft.ops.Stats
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 time-series statistics: Ljung–Box, Dickey–Fuller,
  * variance ratio, Hurst R/S, periodogram — hand-solved fixtures.
  */
class TsStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def series(xs: Seq[Double]) =
    xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("k", "v")

  test("ljungBox: alternating series pins Q = n(n+2)(1/(n-1)+1/(n-2))") {
    // ACF of a ±-alternating series: r1 = -1, r2 = +1 exactly
    val df = series(Seq(1.0, 3.0, 1.0, 3.0, 1.0, 3.0))
    val r = Stats.ljungBox(df, "k", "v", 2).collect().head
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Int]("df") == 2)
    // 6*8*(1/5 + 1/4) = 21.6
    assert(math.abs(r.getAs[Float]("q_stat") - 21.6f) < 1e-4)
    assert(r.getAs[Boolean]("reject_95"))
  }

  test("dickeyFuller: geometric AR(1) decay is a perfect fit -> se=0, t NULL") {
    val df = series(Seq(16.0, 8.0, 4.0, 2.0, 1.0))
    val r = Stats.dickeyFuller(df, "k", "v").collect().head
    assert(math.abs(r.getAs[Float]("slope") - (-0.5f)) < 1e-9)
    assert(r.isNullAt(r.fieldIndex("t_stat"))) // zero residuals
    // phi = 0.5 -> half-life exactly 1 bar
    assert(math.abs(r.getAs[Float]("half_life") - 1.0f) < 1e-6)
  }

  test("dickeyFuller: noisy reverting fixture matches the moment algebra") {
    val xs = Seq(16.0, 9.0, 5.0, 2.0, 1.5, 0.5)
    val r = Stats.dickeyFuller(series(xs), "k", "v").collect().head
    // mirror: cents, pairs (yl, dy), exact moments
    val c = xs.map(v => math.round(v * 100))
    val pairs = c.sliding(2).map(p => (p(0), p(1) - p(0))).toSeq
    val n = pairs.size.toDouble
    val sx = pairs.map(_._1).sum.toDouble
    val sy = pairs.map(_._2).sum.toDouble
    val sxx = pairs.map(p => p._1.toDouble * p._1).sum
    val sxy = pairs.map(p => p._1.toDouble * p._2).sum
    val syy = pairs.map(p => p._2.toDouble * p._2).sum
    val sxxC = n * sxx - sx * sx; val sxyC = n * sxy - sx * sy
    val syyC = n * syy - sy * sy
    val b = sxyC / sxxC
    val se = math.sqrt((syyC - b * sxyC) / ((n - 2) * sxxC))
    assert(math.abs(r.getAs[Float]("t_stat") - (b / se)) < 1e-3)
    assert(math.abs(r.getAs[Float]("half_life") -
      (-math.log(2) / math.log(1 + b))) < 1e-3)
  }

  test("varianceRatio: 2-period changes of an alternating series vanish") {
    val df = series(Seq(0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0))
    val r = Stats.varianceRatio(df, "k", "v", 2).collect().head
    assert(r.getAs[Long]("n_1") == 7L && r.getAs[Long]("n_q") == 6L)
    assert(r.getAs[Float]("var_q") == 0.0f)
    assert(r.getAs[Float]("vr") == 0.0f)
  }

  test("varianceRatio: linear trend has var_1 = 0 -> vr NULL") {
    val df = series((1 to 10).map(_.toDouble))
    val r = Stats.varianceRatio(df, "k", "v", 2).collect().head
    assert(r.getAs[Float]("var_1") == 0.0f)
    assert(r.isNullAt(r.fieldIndex("vr")))
  }

  test("hurstRs: strictly alternating series pins R/S = 1 at every size, H = 0") {
    val df = series(Seq.tabulate(32)(i => if (i % 2 == 0) 0.0 else 1.0))
    val rows = Stats.hurstRs(df, "k", "v", Seq(2, 4, 8))
      .orderBy("size").collect()
    assert(rows.map(_.getAs[Int]("size")).toSeq == Seq(2, 4, 8))
    assert(rows.map(_.getAs[Long]("n_blocks")).toSeq == Seq(16L, 8L, 4L))
    rows.foreach(r => assert(r.getAs[Float]("rs_mean") == 1.0f))
    rows.foreach(r => assert(r.getAs[Float]("hurst") == 0.0f))
  }

  test("hurstRs: trending series scores H > 0.5 (persistent)") {
    val df = series(Seq.tabulate(32)(i => i.toDouble))
    val rows = Stats.hurstRs(df, "k", "v", Seq(2, 4, 8)).collect()
    val h = rows.head.getAs[Float]("hurst")
    assert(h > 0.5f, s"hurst $h")
  }

  test("periodogram: pure period-4 signal dominates at p=4 with frac 0.5") {
    // large magnitudes so the per-row integer flooring (O(1) per term)
    // is invisible next to the harmonic sums, as at warehouse scale
    val df = series(Seq.tabulate(32)(i =>
      Seq(2e6, 1e6, 0.0, 1e6)(i % 4)))
    val rows = Stats.periodogram(df, "k", "v", 8).collect()
    val byP = rows.map(r => r.getAs[Int]("period") -> r).toMap
    assert(byP(4).getAs[Boolean]("dominant"))
    assert(math.abs(byP(4).getAs[Float]("power_frac") - 0.5f) < 1e-3)
    (Seq(2, 3, 5, 6, 7, 8)).foreach { p =>
      assert(!byP(p).getAs[Boolean]("dominant"), s"period $p")
      assert(byP(p).getAs[Float]("power_frac") < 0.1f, s"period $p")
    }
  }

  test("groupMoments: symmetric fixture pins skew 0, uniform kurtosis") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)).toDF("g", "v")
    val r = graft.ops.Stats.groupMoments(df, "v", "g").collect().head
    assert(r.getAs[Float]("mean") == 2.0f)
    assert(r.getAs[Float]("skewness") == 0.0f)
    // 3-point uniform: m4/m2^2 = 1.5 -> excess -1.5
    assert(r.getAs[Float]("kurtosis_excess") == -1.5f)
  }

  test("groupMoments: constant group drives the NULL variance guards") {
    val df = Seq(("c", 5.0), ("c", 5.0)).toDF("g", "v")
    val r = graft.ops.Stats.groupMoments(df, "v", "g").collect().head
    assert(r.isNullAt(r.fieldIndex("skewness")))
    assert(r.isNullAt(r.fieldIndex("sd")))
  }

  test("medianAbsDeviation: hand-solved {1,2,4,8,100}") {
    val df = Seq(1.0, 2.0, 4.0, 8.0, 100.0).toDF("v")
    val r = graft.ops.Stats.medianAbsDeviation(df, "v").collect().head
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Float]("median") == 4.0f)
    // |x-4| = {3,2,0,4,96} -> median 3
    assert(r.getAs[Float]("mad") == 3.0f)
    assert(math.abs(r.getAs[Float]("robust_sd") - 3 * 1.4826) < 1e-4)
  }
}
