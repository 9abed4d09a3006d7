package graft

import java.sql.Date

import graft.ts.{Drawdown, Seasonal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Maximum drawdown ([[Drawdown]]) and the STL-lite weekly
  * decomposition ([[Seasonal]]) — extension time-series surfaces
  * (q190/q191).
  */
class TsDecompSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def bars(rows: Seq[(Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("id", "ds", "close")
      .select(col("id"), to_date(col("ds")).as("dt"), col("close"))
  }

  test("maxDrawdown: deepest trough vs running peak, hand-checked") {
    val df = bars(Seq(
      (1L, "2024-01-01", 10.0), (1L, "2024-01-02", 8.0),
      (1L, "2024-01-03", 12.0), (1L, "2024-01-04", 6.0),
      (1L, "2024-01-05", 9.0)))
    val r = Drawdown.maxDrawdown(df).collect()(0)
    assert(r.getAs[Int]("n_days") == 5)
    // trough 6 against peak 12 → -0.5, on Jan 4
    assert(r.getAs[Float]("max_dd") == -0.5f)
    assert(r.getAs[Date]("trough_dt").toString == "2024-01-04")
  }

  test("maxDrawdown: equal-depth troughs break to the EARLIEST date") {
    val df = bars(Seq(
      (1L, "2024-01-01", 10.0), (1L, "2024-01-02", 5.0),
      (1L, "2024-01-03", 10.0), (1L, "2024-01-04", 5.0)))
    val r = Drawdown.maxDrawdown(df).collect()(0)
    assert(r.getAs[Float]("max_dd") == -0.5f)
    assert(r.getAs[Date]("trough_dt").toString == "2024-01-02")
  }

  test("maxDrawdown: zero opening close → NULL-dd bars skipped by argmin") {
    // running max is 0 on Jan 1–2, so both bars' dd is NULL (ANSI
    // division guard); the argmin struct must skip them — trough_dt
    // must agree with max_dd (the -0.5 on Jan 4 vs the peak 10),
    // never report a NULL-dd bar
    val df = bars(Seq(
      (1L, "2024-01-01", 0.0), (1L, "2024-01-02", 0.0),
      (1L, "2024-01-03", 10.0), (1L, "2024-01-04", 5.0),
      (1L, "2024-01-05", 8.0)))
    val r = Drawdown.maxDrawdown(df).collect()(0)
    assert(r.getAs[Int]("n_days") == 5)
    assert(r.getAs[Float]("max_dd") == -0.5f)
    assert(r.getAs[Date]("trough_dt").toString == "2024-01-04")
  }

  test("maxDrawdown: all-zero symbol → NULL trough and NULL max_dd") {
    val df = bars(Seq((1L, "2024-01-01", 0.0), (1L, "2024-01-02", 0.0)))
    val r = Drawdown.maxDrawdown(df).collect()(0)
    assert(r.getAs[Int]("n_days") == 2)
    assert(r.isNullAt(r.fieldIndex("trough_dt")))
    assert(r.isNullAt(r.fieldIndex("max_dd")))
  }

  test("decompose: pure weekly signal → seasonal recovers it, resid 0") {
    // close = 100 + dow over three weeks: every full 7-day window
    // averages all seven dow effects → trend = 104 everywhere,
    // detrended = dow − 4, residual identically 0
    val rows = (0 until 21).map { i =>
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(i) // Jan 1 = Monday
      val dow = (d.getDayOfWeek.getValue % 7) + 1            // Spark: 1=Sunday
      (1L, d.toString, 100.0 + dow)
    }
    val out = Seasonal.decompose(bars(rows)).orderBy("dt").collect()
    assert(out.length == 21)
    val edge = out.take(3) ++ out.takeRight(3)
    assert(edge.forall(r => r.isNullAt(r.fieldIndex("trend")) &&
      r.isNullAt(r.fieldIndex("seasonal")) && r.isNullAt(r.fieldIndex("resid"))))
    out.drop(3).dropRight(3).foreach { r =>
      assert(r.getAs[Float]("trend") == 104.0f)
      assert(r.getAs[Float]("seasonal") == r.getAs[Int]("dow") - 4.0f)
      assert(r.getAs[Float]("resid") == 0.0f)
    }
  }

  test("decompose: seasonal-mean round-half ties go AWAY FROM ZERO by integer div") {
    // constant 100 except two Mondays at +1e-4/+2e-4 and two Tuesdays
    // at −1e-4/−2e-4: window sums shift trend by < 0.5e-4 (rounds back
    // to 100.0000), so detrended means are exactly ±0.00015 — a
    // round-half tie that double `round` resolves engine-dependently
    val deltas = Map("2024-01-08" -> 1e-4, "2024-01-15" -> 2e-4,
      "2024-01-09" -> -1e-4, "2024-01-16" -> -2e-4)
    val rows = (0 until 21).map { i =>
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(i).toString
      (1L, d, 100.0 + deltas.getOrElse(d, 0.0))
    }
    val got = Seasonal.decompose(bars(rows)).orderBy("dt").collect()
      .map(r => r.getAs[Date]("dt").toString ->
        Option(r.getAs[Any]("seasonal")).map(_.asInstanceOf[Float]))
      .toMap
    assert(got("2024-01-08") == Some(2e-4f)) // half-up: 0.00015 → 0.0002
    assert(got("2024-01-09") == Some(-2e-4f)) // away from zero
    assert(got("2024-01-10") == Some(0.0f))   // untouched weekday
  }
}
