package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Daily OHLCV bar derivation from an event stream.
  *
  * The reference's candles arrive pre-barred from the exchange
  * (/root/reference/modules/spark_operations/streaming/candles.py:55-103);
  * our oracle corpus has raw `events(user_id, ts, value)` instead, so the
  * engine owns the bar-building step: one row per (symbol, day) with
  * open/high/low/close/volume. `user_id` plays the symbol role and
  * `value` the price role (FIXTURES.md §B role mapping).
  *
  * Determinism: (user_id, ts) is unique in the fixtures, so
  * `min_by`/`max_by` on `ts` pin open/close without a tiebreaker.
  * `volume` is the row count (exact integer in double) — keeps every bar
  * field bit-reproducible across engines regardless of aggregation order.
  *
  * Scale: a single hash aggregation keyed (symbol, day) — map-side
  * partial agg then one shuffle on the group key; no windows, no skew
  * (day bounds the group size).
  */
object Bars {

  /** events(user_id, ts, value, …) → bars(id, dt, open, high, low, close, volume) */
  def daily(events: DataFrame): DataFrame =
    events.groupBy(
        col("user_id").as("id"),
        to_date(col("ts")).as("dt"))
      .agg(
        min_by(col("value"), col("ts")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ts")).as("close"),
        count(lit(1)).cast("double").as("volume"))

  /** Hourly OHLCV bars — same derivation at hour grain, keyed by the
    * bar's epoch-second start (`t`). The fixture events span ~30 days,
    * so daily bars (~30/symbol) cannot fill the long indicator
    * lookbacks (EMA30 seed, MACD signal, Ichimoku senkou B); hourly
    * bars (~50-90/symbol at sf0.01) play the reference's "daily
    * candles" role for the indicator-verification queries. Epoch long,
    * not TimestampType, per the oracle-parity rules (QueryPack).
    */
  def hourly(events: DataFrame): DataFrame =
    events.groupBy(
        col("user_id").as("id"),
        expr("unix_timestamp(ts) div 3600 * 3600").as("t"))
      .agg(
        min_by(col("value"), col("ts")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ts")).as("close"),
        count(lit(1)).cast("double").as("volume"))

  /** DuckDB CTE for [[hourly]] (`hourly` table in scope). */
  val oracleCteHourly: String =
    """hourly AS (
      |  SELECT user_id AS id,
      |         (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS t,
      |         arg_min(value, ts) AS open, max(value) AS high,
      |         min(value) AS low,  arg_max(value, ts) AS close,
      |         CAST(count(*) AS DOUBLE) AS volume
      |  FROM events GROUP BY 1, 2)""".stripMargin

  /** Shared DuckDB CTE computing the same bars — prefix for oracle SQL. */
  val oracleCte: String =
    """daily AS (
      |  SELECT user_id AS id, CAST(ts AS DATE) AS dt,
      |         arg_min(value, ts) AS open, max(value) AS high,
      |         min(value) AS low,  arg_max(value, ts) AS close,
      |         CAST(count(*) AS DOUBLE) AS volume
      |  FROM events GROUP BY 1, 2)""".stripMargin
}
