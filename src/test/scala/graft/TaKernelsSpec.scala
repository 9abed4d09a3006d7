package graft

import graft.ts.TaKernels
import org.scalatest.funsuite.AnyFunSuite

/** Pure-kernel properties for the recursive indicators (SURVEY.md §5).
  * These guard the semantics that silently drift: seeding, warm-up
  * NULLs, Wilder smoothing bounds. Property-style over deterministic
  * seeded random series (the offline cache has no scalatest-scalacheck
  * bridge, so generation is hand-rolled).
  */
class TaKernelsSpec extends AnyFunSuite {

  /** 50 deterministic pseudo-random price series, varying lengths. */
  private val samples: Seq[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(50) {
      val len = 40 + rnd.nextInt(80)
      Array.fill(len)(1.0 + rnd.nextDouble() * 999.0)
    }
  }

  test("EMA warm-up: NaN strictly before index n-1, defined after") {
    samples.foreach { c =>
      val e = TaKernels.ema(c, 10)
      assert(e.take(9).forall(_.isNaN))
      assert(e.drop(9).forall(!_.isNaN))
    }
  }

  test("EMA seed equals SMA of the first n closes") {
    samples.foreach { c =>
      val e = TaKernels.ema(c, 10)
      assert(math.abs(e(9) - c.take(10).sum / 10) < 1e-9)
    }
  }

  test("EMA of a constant series is that constant") {
    val c = Array.fill(60)(42.5)
    val e = TaKernels.ema(c, 5)
    assert(e.drop(4).forall(v => math.abs(v - 42.5) < 1e-9))
  }

  test("EMA is a convex combination: stays within series min/max") {
    samples.foreach { c =>
      val e = TaKernels.ema(c, 5)
      val lo = c.min
      val hi = c.max
      assert(e.filterNot(_.isNaN).forall(v => v >= lo - 1e-9 && v <= hi + 1e-9))
    }
  }

  test("RSI bounds [0, 100]; warm-up NaN before index n") {
    samples.foreach { c =>
      val r = TaKernels.rsi(c, 14)
      assert(r.take(14).forall(_.isNaN))
      assert(r.drop(14).forall(v => v >= 0 && v <= 100))
    }
  }

  test("RSI of a strictly increasing series is 100") {
    val c = Array.tabulate(40)(i => 10.0 + i)
    val r = TaKernels.rsi(c, 14)
    assert(r.drop(14).forall(v => math.abs(v - 100.0) < 1e-9))
  }

  test("RSI of a strictly decreasing series is 0") {
    val c = Array.tabulate(40)(i => 100.0 - i)
    val r = TaKernels.rsi(c, 14)
    assert(r.drop(14).forall(v => math.abs(v) < 1e-9))
  }

  test("MACD of a constant series is 0; signal defined from index 33") {
    val c = Array.fill(60)(7.0)
    val (m, s, h) = TaKernels.macd(c)
    assert(m.take(25).forall(_.isNaN))
    assert(m.drop(25).forall(v => math.abs(v) < 1e-9))
    assert(s.take(33).forall(_.isNaN))
    assert(s.drop(33).forall(v => math.abs(v) < 1e-9))
    assert(h.drop(33).forall(v => math.abs(v) < 1e-9))
  }

  test("MACD line = EMA12 - EMA26 where both defined") {
    samples.foreach { c =>
      val (m, _, _) = TaKernels.macd(c)
      val f = TaKernels.ema(c, 12)
      val s = TaKernels.ema(c, 26)
      m.indices.foreach { i =>
        if (!m(i).isNaN) assert(math.abs(m(i) - (f(i) - s(i))) < 1e-9)
      }
    }
  }

  test("short series: all NaN when below lookback") {
    val c = Array(1.0, 2.0, 3.0)
    assert(TaKernels.ema(c, 5).forall(_.isNaN))
    assert(TaKernels.rsi(c, 14).forall(_.isNaN))
    val (m, s, _) = TaKernels.macd(c)
    assert(m.forall(_.isNaN) && s.forall(_.isNaN))
  }

  test("holt: textbook init, hand-replayed recurrence, trend tracking") {
    val c = Array(10.0, 12.0, 14.0, 16.0, 18.0)
    val Array(l, b, f) = TaKernels.holt(c, alpha = 0.2, beta = 0.1)
    assert(l(0) == 10.0 && b(0) == 2.0 && f(0) == 12.0)
    // replay the recurrence by hand
    var (pl, pb) = (10.0, 2.0)
    (1 until c.length).foreach { i =>
      val nl = 0.2 * c(i) + (1 - 0.2) * (pl + pb)
      val nb = 0.1 * (nl - pl) + (1 - 0.1) * pb
      assert(l(i) == nl && b(i) == nb && f(i) == nl + nb)
      pl = nl; pb = nb
    }
    // a perfectly linear series keeps a positive trend throughout
    assert(b.forall(_ > 0))
    // 1-point series: all NaN (no trend anchor)
    val Array(l1, b1, f1) = TaKernels.holt(Array(5.0))
    assert(l1.forall(_.isNaN) && b1.forall(_.isNaN) && f1.forall(_.isNaN))
  }

  test("holtWinters: init from two seasons, hand-replayed recurrence, " +
      "pure seasonal signal recovered") {
    // linear trend (+1/step) + period-3 seasonal {+1, 0, -1}
    val season = Array(1.0, 0.0, -1.0)
    val c = (0 until 12).map(i => 10.0 + i + season(i % 3)).toArray
    val Array(l, b, s, f) = TaKernels.holtWinters(c, m = 3,
      alpha = 0.2, beta = 0.1, gamma = 0.3)
    // init block: level = mean of season 1, trend = (mean2-mean1)/3,
    // seasonals = first-season deviations
    val m1 = (c(0) + c(1) + c(2)) / 3
    val m2 = (c(3) + c(4) + c(5)) / 3
    assert(l(2) == m1 && b(2) == (m2 - m1) / 3)
    assert(s(0) == c(0) - m1 && s(1) == c(1) - m1 && s(2) == c(2) - m1)
    assert(f(2) == l(2) + b(2) + s(0))
    assert(l(0).isNaN && b(1).isNaN && f(1).isNaN)
    // replay the recurrence by hand
    (3 until c.length).foreach { t =>
      val nl = 0.2 * (c(t) - s(t - 3)) + (1 - 0.2) * (l(t - 1) + b(t - 1))
      val nb = 0.1 * (nl - l(t - 1)) + (1 - 0.1) * b(t - 1)
      val ns = 0.3 * (c(t) - nl) + (1 - 0.3) * s(t - 3)
      assert(l(t) == nl && b(t) == nb && s(t) == ns)
      assert(f(t) == nl + nb + s(t + 1 - 3))
    }
    // a trend+seasonal input is tracked: the one-step forecast error
    // is far below the seasonal amplitude (2.0) by the end — full
    // convergence takes more than 4 periods at alpha = 0.2
    assert(math.abs(f(10) - c(11)) < 1.0)
    // below 2 periods of data: all NaN
    val Array(l2, b2, s2, f2) = TaKernels.holtWinters(c.take(5), m = 3)
    assert(l2.forall(_.isNaN) && b2.forall(_.isNaN) &&
      s2.forall(_.isNaN) && f2.forall(_.isNaN))
  }
}
