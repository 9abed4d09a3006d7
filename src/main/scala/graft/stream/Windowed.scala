package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time windowed aggregation and custom keyed state — the two
  * Structured Streaming shapes the reference's stream layer implies but
  * implements OUTSIDE Spark:
  *
  *  - The exchange aggregates trades into per-interval candles before
  *    the reference ever sees them
  *    (/root/reference/modules/kafka_producers/candles_minute_producer.py:27-44
  *    just relabels the websocket's pre-barred low/high/open/close/
  *    tradeCount for the interval). [[streamingBars]] owns that step:
  *    a watermarked event-time tumbling window building OHLCV bars
  *    from raw ticks — state is bounded by the watermark, partial
  *    aggregation is map-side, parallelism follows the (id, window)
  *    key space.
  *  - The reference's consumers carry per-key state across batches in
  *    files (offsets, previous values —
  *    modules/spark_operations/utils/check_offset_diff.py:50-55);
  *    [[runningTicker]] is the Spark-native form: keyed state in the
  *    state store via `flatMapGroupsWithState`, checkpointed and
  *    recoverable with the query.
  */
object Windowed {

  /** Streaming OHLCV bars: watermark + event-time tumbling window over
    * raw ticks (id, ts, price). In append mode a bar emits exactly once,
    * when the watermark passes its window end — the late-data contract
    * the reference delegates to the exchange. `min_by`/`max_by` pin
    * open/close to the earliest/latest tick in the window.
    */
  def streamingBars(ticks: DataFrame, windowLen: String = "1 hour",
      lateness: String = "30 minutes"): DataFrame =
    ticks.withWatermark("ts", lateness)
      .groupBy(col("id"), window(col("ts"), windowLen).as("w"))
      .agg(
        min_by(col("price"), col("ts")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("ts")).as("close"),
        count(lit(1)).cast("double").as("volume"))
      .select(col("id"), col("w.start").as("bar_start"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))

  /** Stream-stream interval join: each trade picks up every quote for
    * the same symbol from the `lookbackS`-second window ending at the
    * trade (the enrichment shape the reference resolves by re-reading
    * its quote table per batch). Both sides are watermarked, and the
    * interval condition bounds the join state: a buffered quote can be
    * dropped once the watermark passes `qts + lookbackS`, so state is
    * O(rate × (lateness + lookback)) — never unbounded — and the join
    * itself is the regular symbol-hash exchange.
    *
    * Column contract: trades(id, ts, …), quotes(qid, qts, …) — the
    * disjoint names keep the equi+range condition unambiguous.
    */
  def enrichInterval(trades: DataFrame, quotes: DataFrame,
      lookbackS: Int = 10, lateness: String = "30 seconds"): DataFrame =
    trades.withWatermark("ts", lateness)
      .join(quotes.withWatermark("qts", lateness),
        expr(s"id = qid AND qts >= ts - INTERVAL $lookbackS SECONDS" +
          " AND qts <= ts"))
      .drop("qid")

  /** LEFT OUTER [[enrichInterval]]: every trade is emitted — enriched
    * when a lookback quote exists, and with NULL quote columns once
    * the quote-side WATERMARK has passed the trade's window (the
    * null-emission point is watermark-determined, not arrival-
    * determined: a trade cannot be declared quoteless until no
    * on-time quote could still join it). Same bounded-state contract
    * as the inner form; the outer buffer additionally holds each
    * unmatched trade exactly until its eviction point. The "audit
    * every trade, flag the unquoted ones" shape — an inner join
    * silently drops exactly the rows a quality check is looking for.
    */
  def enrichIntervalLeftOuter(trades: DataFrame, quotes: DataFrame,
      lookbackS: Int = 10, lateness: String = "30 seconds"): DataFrame =
    trades.withWatermark("ts", lateness)
      .join(quotes.withWatermark("qts", lateness),
        expr(s"id = qid AND qts >= ts - INTERVAL $lookbackS SECONDS" +
          " AND qts <= ts"),
        "left_outer")
      .drop("qid")

  final case class Tick(id: String, ts: java.sql.Timestamp, price: Double)
  final case class TickerState(n: Long, high: Double, last: Double)
  final case class TickerUpdate(id: String, n: Long, high: Double,
      last: Double)

  /** Per-symbol running state across micro-batches (tick count, running
    * high, last price) via `flatMapGroupsWithState` — the custom-state
    * primitive: state lives in the checkpointed state store, survives
    * restarts, and is updated once per key per micro-batch. Ticks are
    * folded in event-time order within the batch so `last` is
    * deterministic.
    */
  def runningTicker(ticks: Dataset[Tick]): Dataset[TickerUpdate] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.id)
      .flatMapGroupsWithState[TickerState, TickerUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (id: String, rows: Iterator[Tick], state: GroupState[TickerState]) =>
          var st = state.getOption.getOrElse(
            TickerState(0L, Double.NegativeInfinity, Double.NaN))
          rows.toSeq.sortBy(_.ts.getTime).foreach { t =>
            st = TickerState(st.n + 1, math.max(st.high, t.price), t.price)
          }
          state.update(st)
          Iterator(TickerUpdate(id, st.n, st.high, st.last))
      }
  }
}
