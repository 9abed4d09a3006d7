package graft.queries

import graft.ts.{AsOf, Bars}
import org.apache.spark.sql.functions._

/** As-of and range joins over the event stream × daily bars — the two
  * time-series join shapes the brief calls out as missing from Spark's
  * built-ins, composed per the preference ladder (no custom plan
  * nodes) and verified against DuckDB's NATIVE `ASOF JOIN` / interval
  * join, i.e. a fully independent implementation of the semantics.
  *
  * q75: each event matched to the latest daily bar that had CLOSED by
  * the event's time (bar availability = end of its day) — so first-day
  * events have no match and exercise the left-join NULL contract.
  * q76: each event matched to every ±1-day bar interval containing it
  * (~3 matches/event) through the bucketized equi-join path.
  */
object TimeJoins extends QueryPack {

  private val day = 86400L

  val queries: Map[String, Q] = Map(
    "q75_asof_join" -> ((s, d) => {
      val ev = t("events")(s, d).select(col("user_id"), col("ts"), col("value"))
      val bars = Bars.daily(t("events")(s, d))
        .withColumnRenamed("id", "user_id")
        .withColumn("avail", col("dt").cast("timestamp").cast("long") + day)
      AsOf.asOfJoin(ev, bars, "user_id",
          leftTime = col("ts"), rightTime = col("avail"),
          payload = Seq("dt", "close"))
        .select(col("user_id"),
          col("ts").cast("long").as("ts_s"),
          col("value"),
          col("asof_dt"),
          col("asof_close").cast("float").as("asof_close"))
    }),

    "q76_range_join" -> ((s, d) => {
      val ev = t("events")(s, d).select(col("user_id"), col("ts"), col("value"))
      val iv = Bars.daily(t("events")(s, d))
        .withColumnRenamed("id", "user_id")
        .withColumn("s0", col("dt").cast("timestamp").cast("long") - day)
        .withColumn("e0", col("dt").cast("timestamp").cast("long") + 2 * day - 1)
        .select(col("user_id"), col("dt"), col("close"), col("s0"), col("e0"))
      AsOf.rangeJoin(ev, iv, "user_id",
          pointTime = col("ts"), startCol = col("s0"), endCol = col("e0"),
          bucketWidth = day)
        .select(col("user_id"),
          col("ts").cast("long").as("ts_s"),
          col("value"),
          col("dt"),
          col("close").cast("float").as("close"))
    }),

    // Per-symbol calendar densification + linear gap interpolation:
    // the model-facing fill of the NULL days q06's spine join only
    // SURFACES (the fixture really has holes — symbol 0 trades 22 of
    // its 30 spanned days). One exchange on the symbol key feeds the
    // spine join and both directional anchor windows; the fill
    // arithmetic is the same IEEE sequence in both engines, so the
    // float gate is exact.
    "q167_interpolate" -> ((s, d) =>
      graft.ts.Interpolate.fillDaily(Bars.daily(t("events")(s, d)))),

    // The SCD2 × as-of COMPOSITION — the point of both operators:
    // revenue attributed to each customer's order-priority band AS OF
    // the line item's ship date. The dimension side is q163's type-2
    // history (run starts double as change points); the as-of key
    // encodes (epoch day, orderkey) so equal-day changes order
    // deterministically; the oracle is DuckDB's NATIVE ASOF JOIN over
    // the RAW event stream — an independent formulation whose
    // equivalence (latest run start ≤ t carries the same value as the
    // latest event ≤ t) is the collapse invariant itself.
    // Pairwise lead-lag return cross-correlation: textbook Pearson
    // from the five raw sums (not the engines' builtin corr), lag
    // pre-exploded on one side of a date-keyed pair join; variance
    // guard separates real signal from summation ulps.
    // The registered screen runs on a BOUNDED WATCHLIST — top 200
    // symbols by total volume (deterministic (vol desc, id) cut via
    // TakeOrdered + broadcast semi-join) — because pairwise
    // cross-correlation is quadratic in the symbol universe BY
    // CONTRACT; the realistic quant screen bounds the universe first.
    // At sf0.01 (150 symbols) the cut admits everything, so the
    // oracle's answer is the unbounded one there; at sf0.1 it keeps
    // the pair fan-out at watchlist², not market² (52 s → ~2 s).
    "q189_lead_lag" -> ((s, d) => {
      val bars = Bars.daily(t("events")(s, d))
        .localCheckpoint(true) // feeds the watchlist cut AND the pairs
      val watch = bars.groupBy(col("id"))
        .agg(sum(col("volume")).as("vol"))
        .orderBy(col("vol").desc, col("id")).limit(200)
        .select(col("id"))
      graft.ts.CrossCorr.leadLag(bars.join(broadcast(watch), "id"))
    }),

    // BATCH-PARITY oracle for the left-outer watermarked stream-stream
    // interval join (stream/Windowed.enrichIntervalLeftOuter, r8's one
    // spec-only component): the SAME function runs here on batch
    // frames — the analyzer's EliminateEventTimeWatermark strips the
    // watermarks, leaving exactly the equi+interval left-outer join
    // whose streaming lifecycle StreamJoinSpec gates. Purchases are
    // the trade side, views the quote side, 1 h lookback; quoteless
    // purchases surface with NULL quote columns (the audit rows an
    // inner join silently drops).
    "q237_interval_left_outer" -> ((s, d) => {
      val ev = t("events")(s, d)
      val trades = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("id"), col("ts"),
          col("event_id").as("trade_eid"), col("value").as("trade_value"))
      val quotes = ev.where(col("event_type") === "view")
        .select(col("user_id").as("qid"), col("ts").as("qts"),
          col("event_id").as("quote_eid"), col("value").as("quote_value"))
      graft.stream.Windowed.enrichIntervalLeftOuter(
          trades, quotes, lookbackS = 3600)
        .select(col("id"), col("ts").cast("long").as("ts_s"),
          col("trade_eid"), col("trade_value"),
          col("qts").cast("long").as("qts_s"),
          col("quote_eid"), col("quote_value"))
    }),

    "q184_asof_scd2" -> ((s, d) => {
      val enc = 10000000L
      val ords = t("orders")(s, d).select(
        col("o_custkey"), col("o_orderpriority"),
        to_date(col("o_orderdate")).as("odate"), col("o_orderkey"))
      val hist = graft.ops.Scd.type2(ords, Seq("o_custkey"),
        Seq("o_orderpriority"), Seq("odate", "o_orderkey"))
      val rights = hist.select(col("o_custkey"),
        (datediff(col("odate_from"), lit("1970-01-01").cast("date"))
          .cast("long") * enc + col("o_orderkey_from")).as("rt"),
        col("o_orderpriority"))
      val facts = t("lineitem")(s, d)
        .join(t("orders")(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"),
          (datediff(to_date(col("l_shipdate")), lit("1970-01-01").cast("date"))
            .cast("long") * enc + (enc - 1)).as("lt"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      AsOf.asOfJoin(facts, rights, "o_custkey",
          leftTime = col("lt"), rightTime = col("rt"),
          payload = Seq("o_orderpriority"))
        .groupBy(col("asof_o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("rev")), 2).cast("float").as("revenue"))
    }))

  val oracleSql: Map[String, String] = Map(
    "q75_asof_join" ->
      s"""WITH ${Bars.oracleCte},
         |r AS (
         |  SELECT id, epoch(CAST(dt AS TIMESTAMP)) + $day AS avail,
         |         dt, close
         |  FROM daily)
         |SELECT e.user_id,
         |       CAST(floor(epoch(e.ts)) AS BIGINT) AS ts_s,
         |       e.value,
         |       r.dt AS asof_dt,
         |       CAST(r.close AS REAL) AS asof_close
         |FROM events e
         |ASOF LEFT JOIN r
         |  ON e.user_id = r.id AND epoch(e.ts) >= r.avail""".stripMargin,
    // Independent interval-join derivation: quote predicate in the ON
    // clause (left-outer), exact timestamp INTERVAL arithmetic.
    "q237_interval_left_outer" ->
      """SELECT e.user_id AS id,
        |       CAST(floor(epoch(e.ts)) AS BIGINT) AS ts_s,
        |       e.event_id AS trade_eid, e.value AS trade_value,
        |       CAST(floor(epoch(q.ts)) AS BIGINT) AS qts_s,
        |       q.event_id AS quote_eid, q.value AS quote_value
        |FROM events e LEFT JOIN events q
        |  ON e.user_id = q.user_id AND q.event_type = 'view'
        | AND q.ts >= e.ts - INTERVAL 3600 SECONDS AND q.ts <= e.ts
        |WHERE e.event_type = 'purchase'""".stripMargin,
    "q76_range_join" ->
      s"""WITH ${Bars.oracleCte},
         |iv AS (
         |  SELECT id, dt, close,
         |         epoch(CAST(dt AS TIMESTAMP)) - $day AS s0,
         |         epoch(CAST(dt AS TIMESTAMP)) + 2 * $day - 1 AS e0
         |  FROM daily)
         |SELECT e.user_id,
         |       CAST(floor(epoch(e.ts)) AS BIGINT) AS ts_s,
         |       e.value,
         |       iv.dt, CAST(iv.close AS REAL) AS close
         |FROM events e JOIN iv
         |  ON e.user_id = iv.id
         | AND epoch(e.ts) >= iv.s0 AND epoch(e.ts) <= iv.e0""".stripMargin,
    "q167_interpolate" ->
      s"""WITH ${Bars.oracleCte},
         |sp AS (SELECT id, min(dt) AS d0, max(dt) AS d1 FROM daily GROUP BY 1),
         |spine AS (
         |  SELECT id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
         |         AS DATE) AS date_day
         |  FROM sp),
         |j AS (
         |  SELECT s.id, s.date_day, d.close
         |  FROM spine s LEFT JOIN daily d
         |    ON s.id = d.id AND s.date_day = d.dt),
         |a AS (
         |  SELECT *,
         |    last_value(close IGNORE NULLS) OVER wb AS prev_c,
         |    last_value(CASE WHEN close IS NOT NULL THEN date_day END
         |      IGNORE NULLS) OVER wb AS prev_d,
         |    first_value(close IGNORE NULLS) OVER wf AS next_c,
         |    first_value(CASE WHEN close IS NOT NULL THEN date_day END
         |      IGNORE NULLS) OVER wf AS next_d
         |  FROM j
         |  WINDOW wb AS (PARTITION BY id ORDER BY date_day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |  wf AS (PARTITION BY id ORDER BY date_day
         |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT id, date_day, close,
         |  CAST(CASE WHEN close IS NOT NULL THEN close
         |            WHEN prev_c IS NULL THEN next_c
         |            WHEN next_c IS NULL THEN prev_c
         |            ELSE prev_c + (next_c - prev_c)
         |                 * datediff('day', prev_d, date_day)
         |                 / datediff('day', prev_d, next_d)
         |       END AS REAL) AS close_fill,
         |  close IS NULL AS is_interp
         |FROM a""".stripMargin,
    "q189_lead_lag" ->
      s"""WITH ${Bars.oracleCte},
         |watch AS (SELECT id FROM (
         |    SELECT id, sum(volume) AS vol FROM daily GROUP BY 1)
         |  ORDER BY vol DESC, id LIMIT 200),
         |dailyw AS (SELECT d.* FROM daily d JOIN watch USING (id)),
         |r0 AS (
         |  SELECT id, dt,
         |         CASE WHEN lag(close) OVER (PARTITION BY id ORDER BY dt)
         |                   <> 0
         |              THEN close / lag(close)
         |                     OVER (PARTITION BY id ORDER BY dt) - 1
         |         END AS r
         |  FROM dailyw),
         |r AS (SELECT id, dt,
         |        CAST(round(LEAST(GREATEST(r, -10), 10) * 1e6, 0)
         |          AS BIGINT) AS rs
         |      FROM r0 WHERE r IS NOT NULL),
         |bs AS (
         |  SELECT id AS id_b, t.k, dt - CAST(t.k AS INTEGER) AS mdt,
         |         rs AS rb
         |  FROM r, (VALUES (-2), (-1), (0), (1), (2)) t(k)),
         |j AS (
         |  SELECT a.id AS id_a, bs.id_b, bs.k, a.rs AS ra, bs.rb
         |  FROM r a JOIN bs ON a.dt = bs.mdt AND a.id < bs.id_b),
         |g AS (
         |  SELECT id_a, id_b, k, count(*) AS n,
         |         CAST(sum(ra) AS BIGINT) AS sx,
         |         CAST(sum(rb) AS BIGINT) AS sy,
         |         CAST(sum(ra * rb) AS BIGINT) AS sxy,
         |         CAST(sum(ra * ra) AS BIGINT) AS sxx,
         |         CAST(sum(rb * rb) AS BIGINT) AS syy
         |  FROM j GROUP BY 1, 2, 3 HAVING count(*) >= 10),
         |v AS (
         |  SELECT id_a, id_b, k, n,
         |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
         |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
         |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy,
         |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
         |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num
         |  FROM g)
         |SELECT id_a, id_b, CAST(k AS INTEGER) AS k,
         |       CAST(n AS INTEGER) AS n,
         |       CAST(CASE WHEN vx > 0 AND vy > 0
         |            THEN floor(num / sqrt(vx * vy) * 1e4 + 0.5) / 1e4
         |       END AS REAL) AS corr
         |FROM v""".stripMargin,

    "q184_asof_scd2" ->
      """WITH ev AS (
        |  SELECT o_custkey AS k,
        |         datediff('day', DATE '1970-01-01',
        |           CAST(o_orderdate AS DATE)) * 10000000 + o_orderkey AS rt,
        |         o_orderpriority
        |  FROM orders),
        |f AS (
        |  SELECT o.o_custkey AS k,
        |         datediff('day', DATE '1970-01-01',
        |           CAST(l.l_shipdate AS DATE)) * 10000000 + 9999999 AS lt,
        |         l.l_extendedprice * (1 - l.l_discount) AS rev
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |SELECT e.o_orderpriority AS priority, count(*) AS n_items,
        |       CAST(round(sum(f.rev), 2) AS REAL) AS revenue
        |FROM f ASOF LEFT JOIN ev e ON f.k = e.k AND f.lt >= e.rt
        |GROUP BY 1""".stripMargin)
}
