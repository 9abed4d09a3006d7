package graft

import graft.mart.CloseStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Close-stats mart checks, including a hand-computed tiny fixture that
  * validates the reference formula independently of any oracle SQL
  * (ADVICE.md round 1: the q30 oracle shares CTE constants with the
  * implementation, so a tiny known-answer case closes that loop).
  */
class CloseStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("uniqueness: one row per (symbol_id, stat_range, dt_end) with symbol") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val dup = CloseStats(events)
      .where(col("symbol_id").isNotNull)
      .groupBy("symbol_id", "stat_range", "dt_end").count()
      .where(col("count") > 1).count()
    assert(dup == 0)
  }

  test("stat_range values match the reference literal contract") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val ranges = CloseStats(events).select("stat_range").distinct()
      .collect().map(_.getString(0)).toSet
    assert(ranges == Set("1", "3", "5", "7", "10", "30"))
  }

  test("hand-computed fixture: avg_close and roc for the 3-day range") {
    import spark.implicits._
    // One symbol, five consecutive days, one trade per day at close c.
    val closes = Seq(100.0, 110.0, 120.0, 130.0, 150.0)
    val events = closes.zipWithIndex.map { case (c, i) =>
      (1L, java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"), c)
    }.toDF("user_id", "ts", "value")
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("event_type", lit("t"))
      .withColumn("props", lit("{}"))

    val out = CloseStats(events).where(col("stat_range") === "3")
      .orderBy("dt_end").collect()
    assert(out.length == 5)
    // Day 4 (2024-01-04): avg over rows [-3, 0] = (100+110+120+130)/4
    val d4 = out(3)
    assert(math.abs(d4.getAs[Float]("avg_close") - 115.0f) < 1e-4)
    // roc(3) on day 4 = (130 - 100)/100 * 100 = 30%
    assert(math.abs(d4.getAs[Float]("roc") - 30.0f) < 1e-4)
    // Day 3 has no lag(3) -> roc NULL; avg of first three = 110
    val d3 = out(2)
    assert(d3.getAs[Float]("roc") == null ||
      d3.isNullAt(d3.fieldIndex("roc")))
    assert(math.abs(d3.getAs[Float]("avg_close") - 110.0f) < 1e-4)
    // dt_start = dt_end - 3 days
    assert(d4.getAs[java.sql.Date]("dt_start").toString == "2024-01-01")
    assert(d4.getAs[java.sql.Date]("dt_end").toString == "2024-01-04")
  }
}
