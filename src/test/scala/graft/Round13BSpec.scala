package graft

import graft.graph.Centrality
import graft.ops.Stats
import graft.ts.TaKernels
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 batch B: edge betweenness, Granger-lite, Kalman kernel. */
class Round13BSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sym(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("a", "b")

  test("edgeBetweenness: path graph accumulates toward the source") {
    // 1-2-3 from seed 1: edge (2,3) carries 1 path, edge (1,2) two
    val eb = Centrality.edgeBetweennessSeeded(
        sym(1L -> 2L, 2L -> 3L), Seq(1L).toDF("id"), rounds = 2)
      .orderBy("u", "v").collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
        r.getAs[Float]("eb"))).toSeq
    assert(eb == Seq((1L, 2L, 2.0f), (2L, 3L, 1.0f)))
  }

  test("edgeBetweenness: diamond splits the source edges evenly") {
    // 1-{2,3}-4: each source edge carries 1 + 0.5, each far edge 0.5
    val eb = Centrality.edgeBetweennessSeeded(
        sym(1L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 4L),
        Seq(1L).toDF("id"), rounds = 2)
      .orderBy("u", "v").collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
        r.getAs[Float]("eb"))).toSeq
    assert(eb == Seq((1L, 2L, 1.5f), (1L, 3L, 1.5f),
      (2L, 4L, 0.5f), (3L, 4L, 0.5f)))
  }

  test("kalman kernel: gain decays toward steady state, filter tracks") {
    val y = Array(10.0, 12.0, 11.0, 13.0, 12.0, 14.0)
    val Array(lvl, gain, innov) = TaKernels.kalman(y, q = 1.0, r = 4.0)
    assert(lvl(0) == 10.0 && gain(0).isNaN && innov(0).isNaN)
    // reference fold
    var x = y(0); var p = 4.0
    (1 until y.length).foreach { t =>
      val pp = p + 1.0; val k = pp / (pp + 4.0); val e = y(t) - x
      x += k * e; p = (1 - k) * pp
      assert(lvl(t) == x && gain(t) == k && innov(t) == e, s"t=$t")
    }
    // steady-state gain for q/r = 0.25 is (sqrt(q^2+4qr)-q)/(2r)+q/(2r)-ish;
    // just check monotone-ish settling below the first gain
    assert(gain(5) < gain(1))
  }

  test("grangerLite matches the mirrored closed form on a causal fixture") {
    // y_t = 2*x_{t-1} + t-varying drift so the unrestricted fit is
    // imperfect (sseU > 0) but x clearly helps
    val xs = Seq(1.0, 3.0, 2.0, 5.0, 4.0, 6.0, 3.0, 7.0, 5.0, 8.0)
    val ys = xs.indices.map(i =>
      if (i == 0) 1.0 else 2.0 * xs(i - 1) + (i % 3))
    val df = xs.indices.map(i => (i.toLong, ys(i), xs(i)))
      .toDF("k", "y", "x")
    val r = Stats.grangerLite(df, "k", "y", "x").collect().head
    assert(r.getAs[Long]("n") == 9L)
    // mirror the moment algebra
    val rows = (1 until xs.size).map(i =>
      (math.round(ys(i) * 100).toDouble, math.round(ys(i - 1) * 100).toDouble,
        math.round(xs(i - 1) * 100).toDouble))
    val n = rows.size.toDouble
    def s(f: ((Double, Double, Double)) => Double) = rows.map(f).sum
    val (sy, su, sv) = (s(_._1), s(_._2), s(_._3))
    val cyy = n * s(t => t._1 * t._1) - sy * sy
    val cyu = n * s(t => t._1 * t._2) - sy * su
    val cyv = n * s(t => t._1 * t._3) - sy * sv
    val cuu = n * s(t => t._2 * t._2) - su * su
    val cuv = n * s(t => t._2 * t._3) - su * sv
    val cvv = n * s(t => t._3 * t._3) - sv * sv
    val det = cuu * cvv - cuv * cuv
    val b = (cyu * cvv - cyv * cuv) / det
    val c = (cyv * cuu - cyu * cuv) / det
    val sseU = cyy - b * cyu - c * cyv
    val sseR = cyy - cyu * cyu / cuu
    val want = (sseR - sseU) / (sseU / (n - 3))
    assert(math.abs(r.getAs[Float]("f_stat") - want) < want.abs * 1e-4)
    assert(r.getAs[Boolean]("x_helps_95") == (want > 3.841459))
  }
}
