package graft

import graft.ops.{Segmentation, Stats}
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 batch C: binary segmentation, bounce rate, Pareto. */
class Round13CSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binarySegmentation: step series splits at the step, halves are flat") {
    val df = Seq(1.0, 1.0, 1.0, 9.0, 9.0, 9.0).zipWithIndex
      .map { case (v, i) => (i.toLong + 1, v) }.toDF("k", "v")
    val rows = Stats.binarySegmentation(df, "k", "v")
      .collect().map(r => r.getAs[String]("segment") -> r).toMap
    val full = rows("full")
    assert(full.getAs[Long]("n_points") == 6L)
    assert(full.getAs[Long]("cp_key") == 3L)
    assert(full.getAs[Float]("s_at_cp") == -12.0f)
    assert(full.getAs[Float]("frac_through") == 0.5f)
    // both halves are constant: every local S is 0, tie-break -> first key
    assert(rows("left").getAs[Long]("cp_key") == 1L)
    assert(rows("left").getAs[Float]("s_at_cp") == 0.0f)
    assert(rows("right").getAs[Long]("cp_key") == 4L)
    assert(rows("right").getAs[Float]("s_at_cp") == 0.0f)
    assert(rows("right").getAs[Long]("n_points") == 3L)
  }

  test("bounceRate: hand-built sessions pin the trio") {
    val rows = Seq(
      (1L, 0L, 1L),                 // user 1: one lone event -> bounce
      (2L, 0L, 2L), (2L, 10L, 3L), (2L, 20L, 4L), // session of 3
      (2L, 200L, 5L))               // past the gap -> second bounce
      .map { case (u, t, id) => (u,
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(t)), id)
      }.toDF("user_id", "ts", "event_id")
    val r = Segmentation.bounceRate(rows, gapS = 100L).collect().head
    assert(r.getAs[Long]("n_sessions") == 3L)
    assert(r.getAs[Long]("n_bounce") == 2L)
    assert(math.abs(r.getAs[Float]("bounce_rate") - 0.6667f) < 1e-6)
    assert(math.abs(r.getAs[Float]("avg_events") - 5.0f / 3.0f) < 1e-3)
    assert(math.abs(r.getAs[Float]("avg_duration_s") - 6.67f) < 1e-3)
  }

  test("paretoDeciles: ten distinct customers, one per decile") {
    val orders = (1 to 10).map(k =>
      (k.toLong, "2024-01-01 00:00:00", k * 10.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
      .selectExpr("o_custkey",
        "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate", "o_totalprice")
    val rows = Segmentation.paretoDeciles(orders).orderBy("decile")
      .collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getAs[Long]("n_customers") == 1L))
    // decile 0 = top customer (100 of 550)
    assert(rows.head.getAs[Float]("revenue") == 100.0f)
    assert(math.abs(rows.head.getAs[Float]("rev_share") - 100.0 / 550) < 1e-4)
    assert(rows.last.getAs[Float]("cum_share") == 1.0f)
    // cumulative share is monotone
    val cums = rows.map(_.getAs[Float]("cum_share")).toSeq
    assert(cums == cums.sorted)
  }
}
