package graft

import graft.quality.DataQuality
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The freshness decision table (reference check_latest_dt,
  * airflow/common_functions/cassandra_operation.py:54-69) — the four
  * calendar routes are oracle-verified in q52_freshness; this covers
  * the remaining no-calendar path and the calendar dim itself.
  */
class DataQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df = {
    import spark.implicits._
    Seq((2L, "2024-01-15"), (2L, "2024-01-16"))
      .toDF("id", "dts").withColumn("dt", to_date(col("dts")))
  }

  test("no-calendar path: missing data is ERROR even on a weekday") {
    val r = DataQuality.freshness(df, "dt", "id", 2L, "2024-02-15", None)
      .collect()(0)
    assert(r.getAs[Long]("row_count") == 0L)
    assert(!r.getAs[Boolean]("is_market_open"))
    assert(r.getAs[String]("status") == "ERROR")
  }

  test("no-calendar path: present data is OK") {
    val r = DataQuality.freshness(df, "dt", "id", 2L, "2024-01-15", None)
      .collect()(0)
    assert(r.getAs[Long]("row_count") == 1L)
    assert(r.getAs[String]("status") == "OK")
  }

  test("marketCalendar flags weekends and listed holidays closed") {
    import spark.implicits._
    val spine = Seq("2024-02-15", "2024-02-17", "2024-02-18", "2024-02-19")
      .toDF("ds").select(to_date(col("ds")).as("date_day"))
    val got = DataQuality.marketCalendar(spine, Seq("2024-02-19"))
      .orderBy("date_day").collect()
      .map(r => r.getDate(0).toString -> r.getBoolean(1)).toMap
    assert(got == Map(
      "2024-02-15" -> true,   // Thursday
      "2024-02-17" -> false,  // Saturday
      "2024-02-18" -> false,  // Sunday
      "2024-02-19" -> false)) // listed holiday (a Monday)
  }

  test("profileSketch: exact below k, matches profile counts, partition-invariant") {
    import spark.implicits._
    // 300 rows, 40 distinct ids (< k=64 → exact branch), one NULL tag
    val df = (0 until 300).map(i =>
        ((i % 40).toLong, if (i == 7) null else s"t${i % 3}"))
      .toDF("id", "tag")
    def prof(d: org.apache.spark.sql.DataFrame) =
      DataQuality.profileSketch(d, Seq("id", "tag"), k = 64).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(4), r.getString(5),
            r.getString(6)))).toMap
    val p = prof(df)
    assert(p("id") == ((300L, 0L, 40.0, "0", "39")))
    assert(p("tag") == ((300L, 1L, 3.0, "t0", "t2")))
    // estimation branch (k=8 < 40 distinct): deterministic under
    // repartitioning, and in the right ballpark
    def est(d: org.apache.spark.sql.DataFrame): Double =
      DataQuality.profileSketch(d, Seq("id"), k = 8).collect()(0).getDouble(4)
    val e = est(df)
    assert(e != 40.0 && math.abs(e - 40.0) / 40.0 < 1.0, s"ndv est $e")
    assert(est(df.repartition(11, col("id"))) == e)
  }

  test("benford: leading digit exact across magnitudes; fractions sum to 1") {
    import spark.implicits._
    // values chosen to hit every magnitude branch incl. the 10^k
    // boundaries where log10-of-double flips: 1-digit, boundary 10,
    // 999999999999 (12 nines), sub-1 excluded, fractional part ignored
    val df = Seq(1.0, 9.99, 10.0, 19.5, 94.2, 100.0, 999.0, 1234.5,
        999999999999.0, 0.7, 0.01).toDF("v")
    val got = DataQuality.benford(df, "v").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // leading digits of the 9 kept (≥1) values
    assert(got == Map(1 -> 5, 9 -> 4))
    val fr = DataQuality.benford(df, "v").agg(sum("obs_frac")).head.getDouble(0)
    assert(math.abs(fr - 1.0) < 1e-6)
    // benford_frac column is the closed form, independent of data
    val bf = DataQuality.benford(df, "v").collect()
      .map(r => r.getInt(0) -> r.getFloat(3)).toMap
    assert(bf(1) == math.round(math.log10(2.0) * 10000) / 10000f)
  }
}
