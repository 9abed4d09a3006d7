package graft.queries

import graft.ingest.Transforms
import graft.ts.Bars
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch verification of the streaming-plane transforms (SURVEY.md
  * §2.10, S2, P1–P6, W3, U2). The exact `DataFrame => DataFrame`
  * functions the streaming pipelines run ([[Transforms]]) are applied
  * here to deterministic envelopes built from the fixtures, and checked
  * against DuckDB oracles that recompute the expected rows directly —
  * the JSON encode→decode round trip is the unit under test.
  *
  * Numeric columns go through double→string→double round trips (wire
  * discipline: everything is a string on the wire); the final outputs
  * are re-promoted to numeric types so the oracle never has to match
  * Java's float-to-string rendering.
  */
object Streaming extends QueryPack {

  /** Deterministic candles envelope per hourly bar: value JSON matches
    * modules/kafka_producers/candles_minute_producer.py:27-49.
    */
  private def candleEnvelope(events: DataFrame): DataFrame =
    Bars.hourly(events).select(
      col("id").cast("string").as("key"),
      to_json(struct(array(struct(
        col("id").cast("string").as("id"),
        col("low").cast("string").as("low"),
        col("high").cast("string").as("high"),
        col("open").cast("string").as("open"),
        col("close").cast("string").as("close"),
        col("volume").cast("string").as("amount"),
        col("volume").cast("string").as("quantity"),
        col("volume").cast("int").cast("string").as("tradeCount"),
        (col("t") + 3599).cast("string").as("ts_send"),
        col("t").cast("string").as("startTime"),
        (col("t") + 3599).cast("string").as("closeTime"))).as("data")))
        .as("value"))

  /** Deterministic order-book envelope per hourly bar: 3 ask levels,
    * 2 bid levels — except symbols with id % 10 == 0, whose bid side is
    * EMPTY to exercise `posexplode_outer`'s NULL-level row.
    */
  private def bookEnvelope(events: DataFrame): DataFrame = {
    def level(price: Column): Column =
      array(price.cast("string"), col("volume").cast("string"))
    val asks = array((1 to 3).map(i =>
      level(col("close") * (1 + 0.001 * i))): _*)
    val bids = when(col("id") % 10 === 0,
        array().cast("array<array<string>>"))
      .otherwise(array((1 to 2).map(i =>
        level(col("close") * (1 - 0.001 * i))): _*))
    Bars.hourly(events).select(
      col("id").cast("string").as("key"),
      to_json(struct(array(struct(
        col("id").cast("string").as("id"),
        col("t").cast("string").as("seqid"),
        asks.as("asks"),
        bids.as("bids"),
        col("t").cast("string").as("createTime"),
        col("t").cast("string").as("ts_send"))).as("data"))).as("value"))
  }

  /** Deterministic market-trade envelope per raw event. */
  private def tradeEnvelope(events: DataFrame): DataFrame =
    events.select(
      col("user_id").cast("string").as("key"),
      to_json(struct(array(struct(
        col("user_id").cast("string").as("id"),
        col("event_id").cast("string").as("trade_id"),
        when(col("event_id") % 2 === 0, "buy").otherwise("sell")
          .as("takerSide"),
        col("value").cast("string").as("amount"),
        lit("1").as("quantity"),
        col("value").cast("string").as("price"),
        unix_timestamp(col("ts")).cast("string").as("createTime"),
        unix_timestamp(col("ts")).cast("string").as("ts_send"))).as("data")))
        .as("value"))

  val queries: Map[String, Q] = Map(
    // S2+P1+P2+P3+P4: candles envelope parse + string→typed promotion.
    "q20_candles_envelope" -> ((s, d) =>
      Transforms.parseCandles(candleEnvelope(t("events")(s, d)),
          withInsertTs = false)
        .select(col("id"),
          col("low").cast("double"), col("high").cast("double"),
          col("open").cast("double"), col("close").cast("double"),
          col("amount").cast("double"), col("quantity").cast("double"),
          col("tradecount").cast("int").as("tradecount"),
          col("ts_send").cast("long").as("ts_send"),
          col("starttime").cast("long").as("starttime"),
          col("closetime").cast("long").as("closetime"),
          col("ts_create_utc"), col("dt_create_utc"))),

    // W3+P5+P6+U2: order-book posexplode_outer + rank + ask/bid side
    // dimension. Registers the single-parse fused form (one from_json
    // per message); the union formulation (U2's shape, used by the
    // streaming pipeline) is pinned row-identical in StreamingSpec.
    "q21_orderbook_explode" -> ((s, d) =>
      Transforms.explodeOrderBookFused(bookEnvelope(t("events")(s, d)),
          withInsertTs = false)
        .select(col("id"),
          col("seqid").cast("long").as("seqid"),
          col("createtime").cast("long").as("createtime"),
          col("ts_send").cast("long").as("ts_send"),
          col("order_rank").cast("int").as("order_rank"),
          col("quote_price").cast("double").as("quote_price"),
          col("base_amount").cast("double").as("base_amount"),
          col("order_type"), col("ts_create_utc"), col("dt_create_utc"))),

    // Market-trade envelope parse (market_trade.py:79-99).
    "q22_trade_envelope" -> ((s, d) =>
      Transforms.parseTrades(tradeEnvelope(t("events")(s, d)),
          withInsertTs = false)
        .select(col("id"),
          col("trade_id").cast("long").as("trade_id"),
          col("takerside"),
          col("amount").cast("double").as("amount"),
          col("quantity").cast("double").as("quantity"),
          col("price").cast("double").as("price"),
          col("createtime").cast("long").as("createtime"),
          col("ts_create_utc"), col("dt_create_utc"))),

    // P1 on a real fixture JSON column: events.props.
    "q23_json_props" -> ((s, d) =>
      t("events")(s, d)
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
            .getField("k").as("k"))),

    // §2.9 date/time scalar surface: add_months (indicator lookback,
    // D_Create_crypto_ind_day_001.py:35), trunc-to-month
    // (first-day-of-N-months-ago, modules/common/utils.py:62-71),
    // date_add/date_sub (trailing windows), year/month/day extraction
    // (partition derivation), datediff.
    "q24_date_scalars" -> ((s, d) =>
      t("events")(s, d)
        .select(col("event_id"), to_date(col("ts")).as("dt"))
        .select(col("event_id"), col("dt"),
          add_months(col("dt"), -3).as("lookback_start"),
          trunc(add_months(col("dt"), -1), "MM").as("prev_month_first"),
          date_add(col("dt"), 7).as("plus7"),
          date_sub(col("dt"), 10).as("minus10"),
          year(col("dt")).cast("int").as("y"),
          month(col("dt")).cast("int").as("m"),
          dayofmonth(col("dt")).cast("int").as("dom"),
          datediff(col("dt"), lit("2024-01-01").cast("date")).cast("int")
            .as("days_since_jan1"))),

    // Windowed heavy hitters, exact scalable form: per event-time day,
    // the event types crossing an absolute frequency threshold — one
    // (window, key) hash aggregate; window totals re-aggregated from
    // the count frame and attached by broadcast (never a second fact
    // scan). The batch member of the streaming frequency alarm
    // (graft.stream.HeavyHitters.windowed).
    "q383_heavy_hitters" -> ((s, d) =>
      graft.stream.HeavyHitters.exactBatch(
        t("events")(s, d), "event_type", minCount = 60L,
        windowLenS = 86400L)),
    // The REAL SpaceSaving kernel (insert/fold/emit — the streaming
    // form's state transition) folded per window as a batch query.
    // m = 32 ≥ the key cardinality puts it in the summary's exact
    // regime, so the output is required IDENTICAL to q383 and shares
    // its oracle verbatim (the q133 identical-answer contract);
    // above-capacity eviction behavior is pinned by HeavyHittersSpec.
    // requireExact ENFORCES the precondition: if the fixture ever
    // grows past 32 distinct keys in a window, the query fails loudly
    // instead of silently diverging from the shared oracle.
    "q384_space_saving" -> ((s, d) =>
      graft.stream.HeavyHitters.spaceSavingBatch(
        t("events")(s, d), "event_type", m = 32, minCount = 60L,
        windowLenS = 86400L, requireExact = true).toDF()),

    // Streaming windowed CARDINALITY counter (r15): per event-time
    // day, the approximate distinct user count from the engine's
    // deterministic HLL (md5 registers, exact-integer denominator) —
    // state O(256 registers) per open window regardless of user
    // cardinality. The register fold is max — commutative — so unlike
    // q384 there is NO exact-regime caveat: this batch form runs the
    // real streaming kernel and is fully hash-gated with no
    // precondition. Completes the bounded-state streaming trio
    // (frequency q383/q384, distribution DriftMonitor, cardinality).
    "q402_stream_hll" -> ((s, d) =>
      graft.stream.DistinctCounter.exactBatch(
        t("events")(s, d), col("user_id"), windowLenS = 86400L)),

    // Streaming windowed QUANTILES (r16): per event-time day, the
    // (p50, p90, p99) latency/size profile from the deterministic
    // bottom-k-by-hash sample (the q103 kernel keyed by window) —
    // state O(k = 200 rows) per open window regardless of
    // cardinality. Bottom-k under the md5 total order is a
    // commutative merge (the KMV law), so like q402 — and unlike
    // q384 — the batch form runs the real streaming kernel with NO
    // exact-regime precondition and is fully hash-gated. Completes
    // the bounded-state streaming quartet (frequency q383/q384,
    // cardinality q402, distribution DriftMonitor, quantiles).
    "q408_stream_quantiles" -> ((s, d) =>
      graft.stream.QuantileSketch.exactBatch(
        t("events")(s, d), col("value"), col("event_id"),
        k = 200, windowLenS = 86400L)))

  private val tsFmt =
    "strftime(make_timestamp(CAST(%s AS BIGINT)*1000000), '%%Y-%%m-%%d %%H:%%M:%%S')"
  private val dtFmt =
    "strftime(make_timestamp(CAST(%s AS BIGINT)*1000000), '%%Y-%%m-%%d')"

  val oracleSql: Map[String, String] = Map(
    "q20_candles_envelope" ->
      s"""WITH ${Bars.oracleCteHourly}
         |SELECT CAST(id AS VARCHAR) AS id, low, high, open, close,
         |       volume AS amount, volume AS quantity,
         |       CAST(volume AS INTEGER) AS tradecount,
         |       t + 3599 AS ts_send, t AS starttime, t + 3599 AS closetime,
         |       ${tsFmt.format("t + 3599")} AS ts_create_utc,
         |       ${dtFmt.format("t + 3599")} AS dt_create_utc
         |FROM hourly""".stripMargin,
    "q21_orderbook_explode" ->
      s"""WITH ${Bars.oracleCteHourly},
         |ask AS (
         |  SELECT CAST(id AS VARCHAR) AS id, t AS seqid, t AS createtime,
         |         t AS ts_send, CAST(i + 1 AS INTEGER) AS order_rank,
         |         close * (1 + CAST(0.001 AS DOUBLE) * (i + 1)) AS quote_price,
         |         volume AS base_amount, 'ask' AS order_type
         |  FROM hourly, range(3) r(i)),
         |bid AS (
         |  SELECT CAST(id AS VARCHAR) AS id, t AS seqid, t AS createtime,
         |         t AS ts_send, CAST(i + 1 AS INTEGER) AS order_rank,
         |         close * (1 - CAST(0.001 AS DOUBLE) * (i + 1)) AS quote_price,
         |         volume AS base_amount, 'bid' AS order_type
         |  FROM hourly, range(2) r(i) WHERE id % 10 <> 0
         |  UNION ALL
         |  SELECT CAST(id AS VARCHAR), t, t, t, NULL, NULL, NULL, 'bid'
         |  FROM hourly WHERE id % 10 = 0),
         |u AS (SELECT * FROM ask UNION ALL SELECT * FROM bid)
         |SELECT id, seqid, createtime, ts_send, order_rank, quote_price,
         |       base_amount, order_type,
         |       ${tsFmt.format("createtime")} AS ts_create_utc,
         |       ${dtFmt.format("createtime")} AS dt_create_utc
         |FROM u""".stripMargin,
    "q22_trade_envelope" ->
      s"""SELECT CAST(user_id AS VARCHAR) AS id, event_id AS trade_id,
         |       CASE WHEN event_id % 2 = 0 THEN 'buy' ELSE 'sell' END
         |         AS takerside,
         |       value AS amount, CAST(1 AS DOUBLE) AS quantity,
         |       value AS price,
         |       CAST(floor(epoch(ts)) AS BIGINT) AS createtime,
         |       ${tsFmt.format("floor(epoch(ts))")} AS ts_create_utc,
         |       ${dtFmt.format("floor(epoch(ts))")} AS dt_create_utc
         |FROM events""".stripMargin,
    "q23_json_props" ->
      """SELECT event_id, CAST(props::JSON->>'k' AS BIGINT) AS k
        |FROM events""".stripMargin,
    "q24_date_scalars" ->
      """WITH d AS (SELECT event_id, CAST(ts AS DATE) AS dt FROM events)
        |SELECT event_id, dt,
        |       CAST(dt - INTERVAL 3 MONTH AS DATE) AS lookback_start,
        |       CAST(date_trunc('month', dt - INTERVAL 1 MONTH) AS DATE)
        |         AS prev_month_first,
        |       dt + 7 AS plus7, dt - 10 AS minus10,
        |       CAST(year(dt) AS INTEGER) AS y,
        |       CAST(month(dt) AS INTEGER) AS m,
        |       CAST(day(dt) AS INTEGER) AS dom,
        |       CAST(dt - DATE '2024-01-01' AS INTEGER) AS days_since_jan1
        |FROM d""".stripMargin,

    // Exact per-(day, key) counts with an absolute threshold; window
    // totals summed from the count frame. q384 runs the SpaceSaving
    // fold in its exact regime and must match this verbatim.
    "q383_heavy_hitters" -> heavyHittersOracle,
    "q384_space_saving" -> heavyHittersOracle,

    // The windowed HLL re-derived: same md5 register/rank slices as
    // the q208 audit oracle, keyed by the day window; absent
    // registers carry 2^49 each; one double division + round(_, 2)
    // at the edge.
    "q402_stream_hll" -> {
      val reg = OracleSql.md5IntN("h", 1, 2)
      val w = OracleSql.md5IntN("h", 3, 12)
      s"""WITH ep AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) AS es,
         |             CAST(user_id AS VARCHAR) AS ud
         |           FROM events
         |           WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |f AS (SELECT DISTINCT
         |             es - ((es % 86400 + 86400) % 86400) AS ws, ud
         |           FROM ep),
         |hh AS (SELECT ws, md5(ud) AS h FROM f),
         |r AS (SELECT ws, $reg AS reg, $w AS wd FROM hh),
         |rk AS (SELECT ws, reg,
         |         max(CASE WHEN wd = 0 THEN 49
         |             ELSE 49 - length(bin(wd)) END) AS mr
         |       FROM r GROUP BY 1, 2),
         |g AS (SELECT ws, CAST(count(*) AS INTEGER) AS n_registers,
         |        CAST(sum(1::BIGINT << (49 - mr)) AS BIGINT) AS sp
         |      FROM rk GROUP BY 1)
         |SELECT ws AS window_start, n_registers,
         |       CAST(round(0.7213 / (1.0 + 1.079 / 256) * 256 * 256
         |           * 562949953421312.0
         |           / CAST(sp + CAST(256 - n_registers AS BIGINT)
         |                  * 562949953421312 AS DOUBLE), 2)
         |         AS REAL) AS est
         |FROM g""".stripMargin
    },

    // The q103 sketch re-derived per day window: same md5 row-hash
    // ranking, same k = 200, same floor(p·(n−1)) + 1 selection over
    // the value-sorted sample; n_rows counts the filtered window
    // rows (the kernel's own count).
    "q408_stream_quantiles" ->
      """WITH ep AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS es, value,
        |         md5(CAST(event_id AS VARCHAR)) AS h
        |  FROM events
        |  WHERE value IS NOT NULL AND event_id IS NOT NULL
        |    AND ts IS NOT NULL),
        |f AS (SELECT es - ((es % 86400 + 86400) % 86400) AS ws,
        |        value, h
        |      FROM ep),
        |r AS (SELECT *, row_number() OVER (PARTITION BY ws
        |        ORDER BY h) AS rk FROM f),
        |s AS (SELECT ws, value FROM r WHERE rk <= 200),
        |g AS (SELECT ws, list(value ORDER BY value) AS vs
        |      FROM s GROUP BY 1),
        |c AS (SELECT ws, CAST(count(*) AS BIGINT) AS n_rows
        |      FROM f GROUP BY 1)
        |SELECT g.ws AS window_start, c.n_rows,
        |       CAST(len(vs) AS INTEGER) AS n_sample,
        |       vs[CAST(floor(0.5 * (len(vs)-1)) AS INT) + 1] AS p50,
        |       vs[CAST(floor(0.9 * (len(vs)-1)) AS INT) + 1] AS p90,
        |       vs[CAST(floor(0.99 * (len(vs)-1)) AS INT) + 1] AS p99
        |FROM g JOIN c USING (ws)""".stripMargin)

  private lazy val heavyHittersOracle: String =
    """WITH ep AS (
      |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS es, event_type AS key
      |  FROM events WHERE event_type IS NOT NULL),
      |f AS (
      |  SELECT es - ((es % 86400 + 86400) % 86400) AS ws, key FROM ep),
      |c AS (SELECT ws, key, CAST(count(*) AS BIGINT) AS est
      |      FROM f GROUP BY 1, 2),
      |tot AS (SELECT ws, CAST(sum(est) AS BIGINT) AS n_window
      |        FROM c GROUP BY 1)
      |SELECT c.ws AS window_start, c.key, c.est,
      |       CAST(0 AS BIGINT) AS err, TRUE AS guaranteed, t.n_window
      |FROM c JOIN tot t ON t.ws = c.ws
      |WHERE c.est >= 60""".stripMargin
}
