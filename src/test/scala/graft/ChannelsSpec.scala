package graft

import graft.mart.Channels
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** VWAP / Williams %R / CCI ([[Channels]]) on handcrafted bars. */
class ChannelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Two UTC days of hourly bars for one symbol: day 0 has 3 bars,
  // day 1 has 2 — tkey is epoch seconds.
  private val rows = Seq(
    (1L, 0L, 10.0, 8.0, 9.0, 2.0),
    (1L, 3600L, 11.0, 9.0, 10.0, 3.0),
    (1L, 7200L, 12.0, 10.0, 11.0, 1.0),
    (1L, 86400L, 13.0, 11.0, 12.0, 4.0),
    (1L, 90000L, 14.0, 12.0, 13.0, 2.0))

  private def df = rows.map { case (id, t, h, l, c, v) =>
    (id, t, l + 0.5, h, l, c, v)
  }.toDF("id", "tkey", "open", "high", "low", "close", "volume")

  test("vwap resets at the UTC day boundary; cumulative within a day") {
    val got = Channels.indicators(df, n = 2, cciN = 2)
      .orderBy("tkey").select("vwap").as[Double].collect()
    def tp(i: Int) = (rows(i)._3 + rows(i)._4 + rows(i)._5) / 3.0
    val d0 = Seq(
      tp(0) * 2.0 / 2.0,
      (tp(0) * 2.0 + tp(1) * 3.0) / 5.0,
      (tp(0) * 2.0 + tp(1) * 3.0 + tp(2) * 1.0) / 6.0)
    val d1 = Seq(tp(3) * 4.0 / 4.0, (tp(3) * 4.0 + tp(4) * 2.0) / 6.0)
    assert(got.toSeq == d0 ++ d1)
  }

  test("williams %R over the n-bar channel, flat-channel guard = 0") {
    val got = Channels.indicators(df, n = 2, cciN = 2)
      .orderBy("tkey").select("willr").collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
    // bar 2 (0-based 1): hh = 11, ll = 8, c = 10 → -100*(11-10)/(11-8)
    assert(got(0).isEmpty)
    assert(got(1).contains(-100.0 * (11.0 - 10.0) / (11.0 - 8.0)))
    // flat channel: all bars equal
    val flat = Seq((2L, 0L, 5.0, 5.0, 5.0, 5.0, 1.0),
      (2L, 3600L, 5.0, 5.0, 5.0, 5.0, 1.0))
      .toDF("id", "tkey", "open", "high", "low", "close", "volume")
    val fg = Channels.indicators(flat, n = 2, cciN = 2)
      .orderBy("tkey").select("willr").collect()
    assert(Option(fg(1).get(0)).map(_.asInstanceOf[Double]).contains(0.0))
  }

  test("cci matches the hand fold (mean deviation about the window sma)") {
    val got = Channels.indicators(df, n = 2, cciN = 3)
      .orderBy("tkey").select("cci").collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
    def tp(i: Int) = (rows(i)._3 + rows(i)._4 + rows(i)._5) / 3.0
    // first defined at 0-based index 2 (cciN = 3)
    assert(got(0).isEmpty && got(1).isEmpty && got(2).isDefined)
    val window = Seq(tp(0), tp(1), tp(2))
    val sma = window.sum / 3
    val md = window.map(x => math.abs(x - sma)).foldLeft(0.0)(_ + _) / 3.0
    val expect = (tp(2) - sma) / (0.015 * md)
    assert(math.abs(got(2).get - expect) < 1e-12)
  }

  test("channels frame is partition-layout invariant") {
    val bars = graft.ts.Bars.hourly(
        Tables.load(spark, "/root/testdata/sf0.001", "events"))
      .withColumn("tkey", col("t"))
    val a = Channels.indicators(bars).collect().toSet
    val b = Channels.indicators(bars.repartition(7)).collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
