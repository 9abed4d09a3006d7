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
    "q31_daily_bars" -> ((s, d) => Bars.daily(t("events")(s, d))))

  val oracleSql: Map[String, String] = Map(
    "q30_close_stats" -> CloseStats.oracleSql,
    "q31_daily_bars" ->
      s"WITH ${Bars.oracleCte} SELECT * FROM daily")
}
