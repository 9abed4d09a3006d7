package graft

import graft.ops.Stats
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 classic statistical tests: Levene, Cochran–Armitage,
  * McNemar, Durbin–Watson, Breusch–Pagan, Grubbs.
  */
class ClassicTestsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("levene: hand-solved two-group fixture pins W = 4.05") {
    // A = {1,3}: z = {1,1}; B = {0,2,10}: z = {4,2,6}
    // SSw = 8, SSb = 10.8, W = 3 * 10.8/8 = 4.05
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 0.0), ("b", 2.0),
      ("b", 10.0)).toDF("g", "v")
    val r = Stats.levene(df, "v", "g").collect().head
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 5L)
    assert(math.abs(r.getAs[Float]("ss_between") - 10.8f) < 1e-3)
    assert(math.abs(r.getAs[Float]("ss_within") - 8.0f) < 1e-3)
    assert(math.abs(r.getAs[Float]("w_stat") - 4.05f) < 1e-3)
  }

  test("levene: zero within-group variance drives the NULL guard") {
    // A = {1,3}, B = {2,6}: every |x - mean| is constant per group
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 6.0))
      .toDF("g", "v")
    val r = Stats.levene(df, "v", "g").collect().head
    assert(r.getAs[Float]("ss_within") == 0.0f)
    assert(r.isNullAt(r.fieldIndex("w_stat")))
  }

  test("cochranArmitage: monotone 0/.5/1 rates pin z = 2 exactly") {
    val rows = Seq((1, false), (1, false), (2, true), (2, false),
      (3, true), (3, true))
    val df = rows.toDF("s", "ok")
    val r = Stats.cochranArmitage(df, "s", "ok").collect().head
    assert(r.getAs[Long]("n") == 6L && r.getAs[Long]("r") == 3L)
    assert(r.getAs[Float]("z_trend") == 2.0f)
    assert(r.getAs[Boolean]("increasing"))
    assert(r.getAs[Boolean]("reject_95"))
  }

  test("mcnemar: b=3 c=1 pins chi2 = 0.25; b=c=0 drives the NULL guard") {
    val p1 = Seq((true, false), (true, false), (true, false),
      (false, true), (true, true), (false, false)).toDF("y1", "y2")
    val r1 = Stats.mcnemar(p1).collect().head
    assert(r1.getAs[Long]("b") == 3L && r1.getAs[Long]("c") == 1L)
    assert(r1.getAs[Float]("chi2") == 0.25f)
    assert(!r1.getAs[Boolean]("reject_95"))

    val p2 = Seq((true, true), (false, false)).toDF("y1", "y2")
    val r2 = Stats.mcnemar(p2).collect().head
    assert(r2.isNullAt(r2.fieldIndex("chi2")))
  }

  test("durbinWatson: exact linear trend -> zero residuals -> NULL dw") {
    val df = (1 to 10).map(i => (i.toLong, 2.0 * i + 5.0)).toDF("k", "v")
    val r = Stats.durbinWatson(df, "k", "v").collect().head
    assert(r.isNullAt(r.fieldIndex("dw")))
  }

  test("durbinWatson: alternating residuals score dw near 4") {
    // flat trend + perfectly alternating noise: rho1 ~ -1, dw ~ 4
    val df = (1 to 20).map(i =>
      (i.toLong, 100.0 + (if (i % 2 == 0) 1.0 else -1.0))).toDF("k", "v")
    val r = Stats.durbinWatson(df, "k", "v").collect().head
    assert(r.getAs[Float]("dw") > 3.5f, s"dw ${r.getAs[Float]("dw")}")
    assert(r.getAs[Float]("rho1") < -0.75f)
  }

  test("breuschPagan: exact linear fit -> zero residual variance -> NULL lm") {
    val df = (1 to 10).map(i => (i.toDouble, 3.0 * i)).toDF("x", "y")
    val r = Stats.breuschPagan(df, "x", "y").collect().head
    assert(r.isNullAt(r.fieldIndex("lm")))
  }

  test("breuschPagan: variance growing with x flags heteroskedasticity") {
    // symmetric residuals around a zero-slope fit, spread ~ x
    val pts = (1 to 50).flatMap(i =>
      Seq((i.toDouble, 100.0 + i), (i.toDouble, 100.0 - i)))
    val r = Stats.breuschPagan(pts.toDF("x", "y"), "x", "y")
      .collect().head
    assert(r.getAs[Boolean]("reject_95"),
      s"lm ${r.getAs[Float]("lm")}")
  }

  test("grubbs: {1,2,3,10} pins G = 2400/sqrt(8000000/3) and the outlier") {
    val df = Seq(1.0, 2.0, 3.0, 10.0).toDF("v")
    val r = Stats.grubbs(df, "v").collect().head
    assert(r.getAs[Float]("outlier") == 10.0f)
    val want = 2400.0 / math.sqrt(4.0 * (4.0 * 1140000.0 - 1600.0 * 1600.0) / 3.0)
    assert(math.abs(r.getAs[Float]("g_stat") - want) < 1e-4)
  }
}
