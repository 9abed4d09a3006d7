package graft.queries

import graft.mart.CloseStats
import graft.ts.Bars

/** Mart-layer queries — the reference's dbt analytical model and its
  * building blocks (SURVEY.md §2.5, §3.3).
  */
object Mart extends QueryPack {

  val queries: Map[String, Q] = Map(
    // Flagship: crypto_daily_close_stats — spine ⟕ bars, six ROWS-frame
    // moving averages + lag-based rate-of-change, long-form output.
    "q30_close_stats" -> ((s, d) => CloseStats(t("events")(s, d))),

    // The bar-building pass on its own (OHLCV from raw events).
    "q31_daily_bars" -> ((s, d) => Bars.daily(t("events")(s, d))),

    // 30-day slice of the mart checked against a fully hand-written
    // oracle (below) that shares NO string constants with the
    // implementation — guards against a wrong shared CTE propagating
    // identically to both sides of the q30 check.
    "q29_close_stats_30d" -> ((s, d) =>
      CloseStats(t("events")(s, d))
        .where(org.apache.spark.sql.functions.col("stat_range") === "30")))

  val oracleSql: Map[String, String] = Map(
    "q30_close_stats" -> CloseStats.oracleSql,
    "q31_daily_bars" ->
      s"WITH ${Bars.oracleCte} SELECT * FROM daily",
    // Hand-written, independent of Bars.oracleCte / Calendar.oracleCte /
    // CloseStats.oracleSql — every clause re-derived from the reference
    // model (crypto_daily_close_stats.sql, close_stats_30 CTE).
    "q29_close_stats_30d" ->
      """WITH bars AS (
        |  SELECT user_id AS id, CAST(ts AS DATE) AS dt,
        |         arg_max(value, ts) AS close
        |  FROM events GROUP BY 1, 2),
        |cal AS (
        |  SELECT CAST(unnest(generate_series(
        |           (SELECT min(CAST(ts AS DATE)) FROM events),
        |           (SELECT max(CAST(ts AS DATE)) FROM events),
        |           INTERVAL 1 DAY)) AS DATE) AS date_day),
        |j AS (
        |  SELECT bars.id, cal.date_day, bars.close
        |  FROM cal LEFT OUTER JOIN bars ON cal.date_day = bars.dt),
        |w AS (
        |  SELECT id, date_day, close,
        |         avg(close) OVER (PARTITION BY id ORDER BY date_day
        |           ROWS BETWEEN 30 PRECEDING AND CURRENT ROW) AS a30,
        |         lag(close, 30) OVER (PARTITION BY id ORDER BY date_day) AS l30
        |  FROM j)
        |SELECT id AS symbol_id, '30' AS stat_range,
        |       CAST(close AS REAL) AS close_today,
        |       CAST(a30 AS REAL) AS avg_close,
        |       CAST(CASE WHEN l30 IS NOT NULL AND l30 <> 0
        |                 THEN (close - l30) / l30 * 100 END AS REAL) AS roc,
        |       date_day - 30 AS dt_start, date_day AS dt_end
        |FROM w""".stripMargin)
}
