package graft

import graft.mart.{BandChannels, Trix}
import org.scalatest.funsuite.AnyFunSuite

/** Donchian/Keltner channels ([[BandChannels]]) and the TRIX triple-EMA
  * chain ([[Trix]]) against independent per-definition folds.
  */
class BandChannelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val bars = Seq(
    (10.0, 8.0, 9.0, 2.0),
    (11.0, 9.0, 10.5, 1.0),
    (12.0, 10.0, 11.0, 3.0),
    (11.0, 9.0, 9.5, 2.0),
    (12.0, 10.0, 11.5, 1.0),
    (12.5, 11.5, 12.0, 2.0),
    (13.0, 11.0, 12.5, 1.0))

  private def df = bars.zipWithIndex.map { case ((h, l, c, v), i) =>
    (1L, i.toLong, 0.0, h, l, c, v)
  }.toDF("id", "tkey", "open", "high", "low", "close", "volume")

  private def approx(a: Double, b: Double) = math.abs(a - b) < 1e-12

  /** The [[graft.functions.Ema]] fold: SMA-seeded, α = 2/(n+1). */
  private def emaFold(xs: Seq[Double], n: Int): Seq[Option[Double]] = {
    val alpha = 2.0 / (n + 1)
    var acc = 0.0; var count = 0
    xs.map { v =>
      count += 1
      if (count < n) { acc += v; None }
      else if (count == n) { acc += v; acc /= n; Some(acc) }
      else { acc = alpha * v + (1 - alpha) * acc; Some(acc) }
    }
  }

  test("Donchian(3): frame max/min + mid, warm-up NULL") {
    val got = BandChannels.indicators(df, donN = 3, emaN = 2, atrN = 2)
      .orderBy("tkey").collect()
    assert(got.take(2).forall(_.isNullAt(got.head.fieldIndex("don_upper"))))
    (2 until bars.size).foreach { i =>
      val hh = (i - 2 to i).map(bars(_)._1).max
      val ll = (i - 2 to i).map(bars(_)._2).min
      assert(approx(got(i).getAs[Double]("don_upper"), hh))
      assert(approx(got(i).getAs[Double]("don_lower"), ll))
      assert(approx(got(i).getAs[Double]("don_mid"), (hh + ll) / 2))
    }
  }

  test("Keltner(ema 2, 2x ATR(2)): EMA center, Wilder band") {
    val got = BandChannels.indicators(df, donN = 3, emaN = 2, atrN = 2)
      .orderBy("tkey").collect()
    val tp = bars.map { case (h, l, c, _) => (h + l + c) / 3.0 }
    val center = emaFold(tp, 2)
    // Wilder ATR(2) over the delta-row TR series (bar-1 TR excluded)
    val h = bars.map(_._1); val l = bars.map(_._2); val c = bars.map(_._3)
    val tr = (1 until bars.size).map(i => math.max(h(i) - l(i),
      math.max(math.abs(h(i) - c(i - 1)), math.abs(l(i) - c(i - 1)))))
    var acc = 0.0
    val atr = tr.zipWithIndex.map { case (v, k) =>
      if (k == 0) { acc = v; None }
      else if (k == 1) { acc = (acc + v) / 2; Some(acc) }
      else { acc = 0.5 * v + 0.5 * acc; Some(acc) }
    }
    // ATR defined from bar index 2 (= delta index 1)
    assert(got(1).isNullAt(got.head.fieldIndex("kel_upper")))
    (2 until bars.size).foreach { i =>
      val want = center(i).get + 2.0 * atr(i - 1).get
      assert(approx(got(i).getAs[Double]("kel_upper"), want), s"bar $i")
      assert(approx(got(i).getAs[Double]("kel_lower"),
        center(i).get - 2.0 * atr(i - 1).get), s"bar $i")
    }
  }

  test("TRIX(2): triple EMA chain then 1-bar ROC, staged warm-ups") {
    val got = Trix.indicators(df, n = 2).orderBy("tkey").collect()
    val c = bars.map(_._3)
    val e1 = emaFold(c, 2)
    val e2 = emaFold(e1.flatten, 2) // NULL-skip: stage 2 sees only defined e1
    val e3 = emaFold(e2.flatten, 2)
    // e1 from bar 2, e2 from bar 3, e3 from bar 4, trix from bar 5;
    // e3's fold entries start at bar index 2 (first defined e2 row)
    val e3ByBar = Seq(None, None) ++ e3
    (0 to 2).foreach(i => assert(got(i).isNullAt(got.head.fieldIndex("e3"))))
    (3 until bars.size).foreach { i =>
      assert(approx(got(i).getAs[Double]("e3"), e3ByBar(i).get), s"e3 $i") }
    assert(got(3).isNullAt(got.head.fieldIndex("trix")))
    (4 until bars.size).foreach { i =>
      val want = 100.0 * (e3ByBar(i).get - e3ByBar(i - 1).get) / e3ByBar(i - 1).get
      assert(approx(got(i).getAs[Double]("trix"), want), s"trix $i")
    }
  }
}
