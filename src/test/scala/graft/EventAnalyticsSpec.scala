package graft

import graft.ops.EventAnalytics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for triangle counting and the event-flow trio
  * (funnel / retention / transitions); DuckDB parity is the oracle
  * gate's job.
  */
class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("triangles: K4 plus a pendant, degree-oriented == known counts") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles, each node in 3) + pendant 5–1
    val k4 = for (a <- 1 to 4; b <- 1 to 4 if a < b) yield (a.toLong, b.toLong)
    val edges = (k4 :+ (1L, 5L)).toDF("a", "b")
    val r = graft.graph.Triangles.perNode(edges).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L))
  }

  test("triangles: direction/duplicate/self-loop noise is ignored") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L),
      (2L, 3L)).toDF("a", "b")
    val r = graft.graph.Triangles.perNode(edges).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("funnel: completion, partial drop-off, and window cutoff") {
    import spark.implicits._
    // u1 completes inside the window; u2 stops at click; u3's purchase
    // lands outside the window; u4 purchases BEFORE clicking (order
    // violation -> not counted)
    val ev = Seq(
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase"),
      (2L, 100L, "view"), (2L, 200L, "click"),
      (3L, 100L, "view"), (3L, 200L, "click"), (3L, 2000L, "purchase"),
      (4L, 100L, "view"), (4L, 150L, "purchase"), (4L, 200L, "click"))
      .toDF("user_id", "t", "event_type")
      .select(col("user_id"), col("t").cast("timestamp").as("ts"),
        col("event_type"))
    val r = EventAnalytics.funnel(ev, Seq("view", "click", "purchase"), 900L)
      .collect().map(x => x.getLong(0) ->
        ((x.getInt(4), x.getBoolean(5)))).toMap
    assert(r(1L) == ((3, true)))
    assert(r(2L) == ((2, false)))
    assert(r(3L) == ((2, false))) // purchase at t=2000 > 100+900
    assert(r(4L) == ((2, false))) // purchase precedes click
  }

  test("retention: cohorts by first day, offsets count distinct users") {
    import spark.implicits._
    val day = 86400L
    val ev = Seq(
      (1L, 0L), (1L, 2 * day), (1L, 2 * day + 5),  // day0 cohort, back d2
      (2L, 0L),                                    // day0 cohort only
      (3L, day), (3L, 2 * day))                    // day1 cohort, back d1
      .toDF("user_id", "t")
      .select(col("user_id"), col("t").cast("timestamp").as("ts"))
    val r = EventAnalytics.retention(ev).collect()
      .map(x => (x.getDate(0).toString, x.getInt(1)) -> x.getLong(2)).toMap
    assert(r(("1970-01-01", 0)) == 2)
    assert(r(("1970-01-01", 2)) == 1)
    assert(r(("1970-01-02", 0)) == 1)
    assert(r(("1970-01-02", 1)) == 1)
    assert(r.size == 4)
  }

  test("rolling actives: trailing-window distinct, clipped at last day") {
    import spark.implicits._
    val day = 86400L
    // u1 active d0 and d1; u2 active d0 only; last observed day = d1
    val ev = Seq((1L, 0L), (1L, day), (2L, 10L))
      .toDF("user_id", "t")
      .select(col("user_id"), col("t").cast("timestamp").as("ts"))
    val r = EventAnalytics.rollingActives(ev, windowDays = 7).collect()
      .map(x => x.getDate(0).toString -> x.getLong(1)).toMap
    // d0 window [d-6, d0] sees both; d1 window sees both (u2 via d0);
    // days beyond the last activity are clipped
    assert(r == Map("1970-01-01" -> 2L, "1970-01-02" -> 2L))
    // a 1-day window is plain DAU
    val dau = EventAnalytics.rollingActives(ev, windowDays = 1).collect()
      .map(x => x.getDate(0).toString -> x.getLong(1)).toMap
    assert(dau == Map("1970-01-01" -> 2L, "1970-01-02" -> 1L))
  }

  test("transitions: bigram counts and row-normalized probabilities") {
    import spark.implicits._
    // u1: A B A B ; u2: A B  →  A→B ×3, B→A ×1
    val ev = Seq((1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"), (1L, 4L, "B"),
      (2L, 1L, "A"), (2L, 2L, "B"))
      .toDF("user_id", "t", "event_type")
      .withColumn("event_id", col("t"))
      .select(col("user_id"), col("t").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    val r = EventAnalytics.transitions(ev).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getFloat(3)))).toMap
    assert(r(("A", "B")) == ((3L, 1.0f)))
    assert(r(("B", "A")) == ((1L, 1.0f)))
    assert(r.size == 2)
  }
}
