package graft

import graft.ops.{Segmentation, Stats}
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 batch: spectral entropy, X-bar chart, RFM quintiles,
  * time-to-convert quantiles.
  */
class SegmentationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("spectralEntropy: a pure period-2 signal pins entropy 0") {
    val df = (0 until 32).map(i =>
      (i.toLong, if (i % 2 == 0) 1e6 else 2e6)).toDF("k", "v")
    val r = Stats.spectralEntropy(df, "k", "v", 10).collect().head
    assert(r.getAs[Int]("n_periods") == 9)
    // near 0, not exactly: candidate periods that don't divide n=32
    // (3,5,6,7,9,10) carry partial-cycle leakage
    assert(r.getAs[Float]("entropy") < 0.05f,
      s"entropy ${r.getAs[Float]("entropy")}")
  }

  test("xbarChart: the shifted subgroup flags, the stable ones do not") {
    val rows = (1 to 5).flatMap(d => Seq((d, 100.0), (d, 100.0))) ++
      Seq((6, 200.0), (6, 200.0))
    val got = Stats.xbarChart(rows.toDF("okey", "v"), "okey", "v")
      .orderBy("okey").collect()
    assert(!got.take(5).exists(_.getAs[Boolean]("out_of_control")))
    assert(got(5).getAs[Boolean]("out_of_control"))
    assert(got(5).getAs[Float]("xbar") == 200.0f)
  }

  test("rfm: five distinct customers land in five distinct bins") {
    val orders = (1 to 5).flatMap { k =>
      (1 to k).map(j => (k.toLong, s"2024-01-0$k 00:00:00",
        100.0 * k))
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
      .selectExpr("o_custkey", "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate",
        "o_totalprice")
    val got = Segmentation.rfmQuintiles(orders)
      .orderBy("cust").collect()
    // cust k: frequency k -> f_bin k; monetary 100k^2 asc -> m_bin k;
    // last order day k -> recency 5-k desc -> r_bin 5-k+1... cust 5
    // is the most recent (r_bin 1), cust 1 the stalest (r_bin 5)
    assert(got.map(_.getAs[Int]("f_bin")).toSeq == Seq(1, 2, 3, 4, 5))
    assert(got.map(_.getAs[Int]("m_bin")).toSeq == Seq(1, 2, 3, 4, 5))
    assert(got.map(_.getAs[Int]("r_bin")).toSeq == Seq(5, 4, 3, 2, 1))
    assert(got.head.getAs[String]("rfm") == "r5f1m1")
  }

  test("rfm: tied metric values share a bin") {
    val orders = Seq(
      (1L, "2024-01-01 00:00:00", 100.0),
      (2L, "2024-01-01 00:00:00", 100.0),
      (3L, "2024-01-02 00:00:00", 300.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
      .selectExpr("o_custkey", "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate",
        "o_totalprice")
    val got = Segmentation.rfmQuintiles(orders)
      .orderBy("cust").collect()
    assert(got(0).getAs[Int]("m_bin") == got(1).getAs[Int]("m_bin"))
    assert(got(0).getAs[Int]("r_bin") == got(1).getAs[Int]("r_bin"))
  }

  test("timeToConvert: exact order statistics over deltas 10/20/30/40") {
    val rows = (1 to 4).flatMap { u =>
      Seq((u.toLong, "view", 1000L), (u.toLong, "purchase",
        1000L + 10L * u))
    }.map { case (u, t, s) => (u, t,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s)))
    }.toDF("user_id", "event_type", "ts")
    val r = Segmentation.timeToConvert(rows, "view", "purchase")
      .collect().head
    assert(r.getAs[Long]("n_converted") == 4L)
    assert(r.getAs[Long]("p25_s") == 10L)
    assert(r.getAs[Long]("p50_s") == 20L)
    assert(r.getAs[Long]("p75_s") == 30L)
    assert(r.getAs[Long]("p90_s") == 40L)
  }
}
