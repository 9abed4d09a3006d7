package graft

import graft.mart.Flow
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Volume-flow indicator family ([[Flow]]): MFI, Chaikin A/D + CMF,
  * Vortex — checked against an independent per-definition fold over a
  * handcrafted bar series.
  */
class FlowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (high, low, close, volume); id 1 (no N_multiple scaling)
  private val bars = Seq(
    (10.0, 8.0, 9.0, 2.0),
    (11.0, 9.0, 10.5, 1.0),
    (12.0, 10.0, 11.0, 3.0),
    (11.0, 9.0, 9.5, 2.0),
    (12.0, 10.0, 11.5, 1.0),
    (12.5, 11.5, 12.0, 2.0))

  private def df = bars.zipWithIndex.map { case ((h, l, c, v), i) =>
    (1L, i.toLong, 0.0, h, l, c, v)
  }.toDF("id", "tkey", "open", "high", "low", "close", "volume")

  private lazy val got = Flow.indicators(df, n = 2, cmfN = 3)
    .orderBy("tkey").collect()

  private val tp = bars.map { case (h, l, c, _) => (h + l + c) / 3.0 }
  private val vol = bars.map(_._4)

  private def approx(a: Double, b: Double) = math.abs(a - b) < 1e-12

  test("MFI(2): sign-split money-flow ratio over the last 2 deltas") {
    // delta i (vs i-1): pos/neg raw money flow tp_i * vol_i
    val pos = tp.indices.map(i => if (i == 0) 0.0
      else if (tp(i) > tp(i - 1)) tp(i) * vol(i) else 0.0)
    val neg = tp.indices.map(i => if (i == 0) 0.0
      else if (tp(i) < tp(i - 1)) tp(i) * vol(i) else 0.0)
    // defined from rn >= 3 (two full deltas in the 2-row frame)
    assert(got.take(2).forall(_.isNullAt(got.head.fieldIndex("mfi"))))
    (2 until bars.size).foreach { i =>
      val ps = pos(i - 1) + pos(i); val ns = neg(i - 1) + neg(i)
      val want = if (ps + ns == 0) 0.0 else 100.0 * ps / (ps + ns)
      assert(approx(got(i).getAs[Double]("mfi"), want), s"bar $i")
    }
  }

  test("Chaikin A/D runs from bar 1; CMF(3) from bar 3") {
    val mfv = bars.map { case (h, l, c, v) =>
      (if (h == l) 0.0 else ((c - l) - (h - c)) / (h - l)) * v }
    val ad = mfv.scanLeft(0.0)(_ + _).tail
    bars.indices.foreach { i =>
      assert(approx(got(i).getAs[Double]("ad"), ad(i)), s"ad bar $i") }
    assert(got.take(2).forall(_.isNullAt(got.head.fieldIndex("cmf"))))
    (2 until bars.size).foreach { i =>
      val num = mfv(i - 2) + mfv(i - 1) + mfv(i)
      val den = vol(i - 2) + vol(i - 1) + vol(i)
      assert(approx(got(i).getAs[Double]("cmf"), num / den), s"cmf bar $i")
    }
  }

  test("Vortex VI±(2): movement sums over the true-range sum") {
    val h = bars.map(_._1); val l = bars.map(_._2); val c = bars.map(_._3)
    def tr(i: Int) = math.max(h(i) - l(i),
      math.max(math.abs(h(i) - c(i - 1)), math.abs(l(i) - c(i - 1))))
    assert(got.take(2).forall(_.isNullAt(got.head.fieldIndex("vi_plus"))))
    (2 until bars.size).foreach { i =>
      val trS = tr(i - 1) + tr(i)
      val vp = math.abs(h(i - 1) - l(i - 2)) + math.abs(h(i) - l(i - 1))
      val vm = math.abs(l(i - 1) - h(i - 2)) + math.abs(l(i) - h(i - 1))
      assert(approx(got(i).getAs[Double]("vi_plus"),
        if (trS == 0) 0.0 else vp / trS), s"vi+ bar $i")
      assert(approx(got(i).getAs[Double]("vi_minus"),
        if (trS == 0) 0.0 else vm / trS), s"vi- bar $i")
    }
  }

  test("single sort: one exchange, no joins in the flow plan") {
    val plan = Flow.hourly(df.select(col("id").as("user_id"),
        to_timestamp(from_unixtime(col("tkey") * 3600)).as("ts"),
        col("close").as("value")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }
}
