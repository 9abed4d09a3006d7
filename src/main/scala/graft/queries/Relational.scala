package graft.queries

import graft.ts.{Bars, Calendar}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator corpus — SURVEY.md §2.2–2.5, 2.7–2.8.
  *
  * Each query re-expresses one operator class the reference exercises
  * (citations on each entry) over the shared TPC-H-ish fixtures, with a
  * DuckDB oracle. Plans are declared so Catalyst gets the cheap wins:
  * filters sit adjacent to scans (pushdown), projections are narrow
  * (column pruning), small dimensions are broadcast, and aggregations
  * run as one hash-agg pass with map-side partials.
  */
object Relational extends QueryPack {

  val queries: Map[String, Q] = Map(
    // A-class aggregation over the fact table (pricing-summary shape).
    // Reference: groupBy aggregates live in Trino/dbt (SURVEY §2.4).
    "q01_pricing_agg" -> ((s, d) =>
      t("lineitem")(s, d)
        .where(col("l_shipdate") <= lit("2000-01-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice")).cast("float").as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("float").as("sum_disc_price"),
          avg(col("l_quantity")).cast("float").as("avg_qty"),
          avg(col("l_extendedprice")).cast("float").as("avg_price"),
          count(lit(1)).as("count_order"))),

    // P7/P8: conjunctive filter + narrow projection (pushdown showcase).
    // Reference: D_Create_crypto_ind_day_001.py:29-36.
    "q02_filter_project" -> ((s, d) =>
      t("lineitem")(s, d)
        .where(col("l_shipdate") >= lit("1996-01-01")
          && col("l_shipdate") < lit("1997-01-01")
          && col("l_discount") >= 0.05 && col("l_quantity") < 10)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_discount"))),

    // Broadcast-hash join fact ⋈ small dim + aggregate.
    // Reference J1's small-side discipline (SURVEY §4).
    "q03_join_broadcast" -> ((s, d) =>
      t("orders")(s, d)
        .join(broadcast(t("customer")(s, d)),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(sum(col("o_totalprice")).cast("float").as("revenue"),
          count(lit(1)).as("n_orders"))),

    // Multiway star join (fact ⋈ orders ⋈ customer ⋈ nation ⋈ region).
    "q04_multiway_join" -> ((s, d) =>
      t("lineitem")(s, d)
        .join(t("orders")(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(t("customer")(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t("nation")(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t("region")(s, d)), col("n_regionkey") === col("r_regionkey"))
        .where(col("o_orderdate") >= lit("1996-01-01")
          && col("o_orderdate") < lit("1998-01-01"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("float").as("revenue"))),

    // J1: FULL OUTER join history ⟗ derived indicators on date.
    // Reference: D_Create_crypto_ind_day_001.py:189-191 ("outer").
    "q05_full_outer_join" -> ((s, d) => {
      val daily = Bars.daily(t("events")(s, d)).where(col("id") === 7)
      val w = Window.partitionBy(col("id")).orderBy(col("dt")).rowsBetween(-4, 0)
      val ind = daily
        .withColumn("sma5", avg(col("close")).over(w).cast("float"))
        .where(col("dt") >= lit("2024-01-10"))
        .select(col("dt").as("dt_"), col("sma5"))
      val hist = daily.where(col("dt") <= lit("2024-01-20"))
        .select(col("dt"), col("close"))
      hist.join(ind, col("dt") === col("dt_"), "full_outer")
    }),

    // J2+J3: calendar spine ⟕ daily bars, spine clamped by scalar
    // min/max bounds. Reference: crypto_daily_close_stats.sql CTEs.
    "q06_left_join_spine" -> ((s, d) => {
      val daily = Bars.daily(t("events")(s, d)).where(col("id") === 3)
      Calendar.spineOver(daily, "dt")
        .join(daily, col("date_day") === col("dt"), "left_outer")
        .select(col("date_day"), col("id"), col("close"))
    }),

    // J3 variant: uncorrelated scalar-subquery threshold (exact via max).
    "q07_scalar_subquery" -> ((s, d) => {
      val o = t("orders")(s, d)
      val bound = o.agg(max(col("o_totalprice")).as("mx"))
      o.crossJoin(broadcast(bound))
        .where(col("o_totalprice") > col("mx") * 0.9)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // A4: DISTINCT symbol enumeration
    // (D_Create_crypto_ind_day_001.py:39-41).
    "q08_distinct_symbols" -> ((s, d) =>
      t("events")(s, d).select(col("user_id").as("id")).distinct()),

    // A1: COUNT(*) with predicate (deletion/load check,
    // D_Load_crypto_candles_day_002.sql:1-6).
    "q09_count_filtered" -> ((s, d) =>
      t("lineitem")(s, d)
        .where(col("l_shipdate") >= lit("1997-01-01")
          && col("l_shipdate") < lit("1997-02-01")
          && col("l_returnflag") === "R")
        .agg(count(lit(1)).as("cnt"))),

    // A2/U4: per-table labeled counts unioned (cross_use_test.sql:1-16).
    "q10_union_counts" -> ((s, d) =>
      Seq("customer", "orders", "lineitem", "supplier", "part")
        .map(n => t(n)(s, d)
          .agg(count(lit(1)).as("n_rows"))
          .select(lit(n).as("table_name"), col("n_rows")))
        .reduce(_ unionByName _)),

    // A6: last-write-wins dedup by PK — Cassandra upsert semantics
    // (ddl/cassandra/crypto/candles_day.ddl:22) as row_number()=1.
    "q11_dedup_last_write" -> ((s, d) => {
      val e = t("events")(s, d)
      val w = Window.partitionBy(col("user_id"), to_date(col("ts")))
        .orderBy(col("ts").desc)
      e.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("event_id"), col("user_id"),
          to_date(col("ts")).as("dt"), col("value"))
    }),

    // A7: uniqueness audit = group-by-having (dbt
    // unique_combination_of_columns, models.yml:3-11).
    "q12_unique_violations" -> ((s, d) =>
      t("events")(s, d)
        .groupBy(col("user_id"), to_date(col("ts")).as("dt"))
        .agg(count(lit(1)).as("n"))
        .where(col("n") > 1)),

    // O1: global top-N (orderBy + limit; crypto_create_mart.py:189-191).
    "q13_top_n" -> ((s, d) =>
      t("orders")(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(50)),

    // SKYLINE (Pareto frontier) over parts: cheapest price for the
    // biggest size — keep p iff no q has (size ≥, price ≤) with one
    // strict. Scale shape: the frontier lives entirely in the
    // size-grouped min-price table (≤ |size domain| rows — metadata-
    // sized, so its ordering window is the Scan-offset exception),
    // computed as a running min over strictly larger sizes; parts then
    // join the broadcast frontier. Never a part×part self-join — the
    // naive NOT EXISTS the oracle runs IS the quadratic plan this
    // replaces.
    "q211_skyline" -> ((s, d) => {
      val p = t("part")(s, d)
        .where(col("p_size").isNotNull && col("p_retailprice").isNotNull)
      val bySize = p.groupBy(col("p_size"))
        .agg(min(col("p_retailprice")).as("pmin"))
      val w = Window.orderBy(col("p_size").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val frontier = bySize
        .withColumn("rmin", min(col("pmin")).over(w))
        .where(col("rmin").isNull || col("pmin") < col("rmin"))
        .select(col("p_size"), col("pmin"))
      p.join(broadcast(frontier), Seq("p_size"))
        .where(col("p_retailprice") === col("pmin"))
        .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
    }),

    // O3: top-k per group via ranked window (order-book depth shape).
    "q14_topk_per_group" -> ((s, d) => {
      val c = t("customer")(s, d)
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      c.withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 3)
        .select(col("c_mktsegment"), col("rk"), col("c_custkey"), col("c_acctbal"))
    }),

    // §2.8 set intersection (INTERSECT DISTINCT): (user, event_type)
    // activity pairs present in BOTH the early and the late window —
    // the retention-style question. Catalyst plans intersect as a
    // left-semi join over distinct rows — one hash shuffle per side on
    // the compared columns, no data wider than the key moves. (At
    // sf0.01 the intersect really filters: 729 of 735/744 side pairs.)
    "q104_intersect" -> ((s, d) => {
      val ev = t("events")(s, d)
      def pairs(pred: org.apache.spark.sql.Column) = ev.where(pred)
        .select(col("user_id"), col("event_type")).distinct()
      pairs(col("ts") < lit("2024-01-10").cast("timestamp"))
        .intersect(pairs(col("ts") >= lit("2024-01-20").cast("timestamp")))
    }),

    // §2.8 set difference as LEFT ANTI join: customers with no order
    // in 1995, summarized per nation (TPC-H Q22 shape; the year scope
    // keeps the difference non-empty on the fixture, where every
    // customer has SOME order). The anti join hash-partitions both
    // sides on the key — the orders side carries only its key column
    // into the shuffle after the pushed year filter — and the nation
    // lookup broadcasts.
    "q100_anti_join" -> ((s, d) => {
      val cust = t("customer")(s, d)
      val ord = t("orders")(s, d)
        .where(year(col("o_orderdate")) === 1995)
        .select(col("o_custkey"))
      val nat = t("nation")(s, d)
        .select(col("n_nationkey").as("c_nationkey"), col("n_name"))
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_custs"),
          round(sum(col("c_acctbal")), 2).cast("float").as("acctbal_sum"))
        .join(broadcast(nat), "c_nationkey")
        .select(col("n_name"), col("n_custs"), col("acctbal_sum"))
    }))

  val oracleSql: Map[String, String] = Map(
    "q01_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       CAST(sum(l_extendedprice) AS REAL) AS sum_base_price,
        |       CAST(sum(l_extendedprice*(1-l_discount)) AS REAL) AS sum_disc_price,
        |       CAST(avg(l_quantity) AS REAL) AS avg_qty,
        |       CAST(avg(l_extendedprice) AS REAL) AS avg_price,
        |       count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-01-01'
        |GROUP BY 1, 2""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_quantity < 10""".stripMargin,
    "q03_join_broadcast" ->
      """SELECT c_mktsegment, CAST(sum(o_totalprice) AS REAL) AS revenue,
        |       count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,
    "q04_multiway_join" ->
      """SELECT r_name, n_name,
        |       CAST(sum(l_extendedprice*(1-l_discount)) AS REAL) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2""".stripMargin,
    "q05_full_outer_join" ->
      s"""WITH ${Bars.oracleCte},
         |d7 AS (SELECT * FROM daily WHERE id = 7),
         |ind AS (
         |  SELECT dt_, sma5 FROM (
         |    SELECT dt AS dt_, CAST(avg(close) OVER (PARTITION BY id ORDER BY dt
         |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS REAL) AS sma5
         |    FROM d7) WHERE dt_ >= DATE '2024-01-10'),
         |hist AS (SELECT dt, close FROM d7 WHERE dt <= DATE '2024-01-20')
         |SELECT hist.dt, hist.close, ind.dt_, ind.sma5
         |FROM hist FULL OUTER JOIN ind ON hist.dt = ind.dt_""".stripMargin,
    "q06_left_join_spine" ->
      s"""WITH ${Bars.oracleCte},
         |d3 AS (SELECT * FROM daily WHERE id = 3),
         |spine AS (
         |  SELECT CAST(unnest(generate_series(
         |           (SELECT min(dt) FROM d3), (SELECT max(dt) FROM d3),
         |           INTERVAL 1 DAY)) AS DATE) AS date_day)
         |SELECT spine.date_day, d3.id, d3.close
         |FROM spine LEFT JOIN d3 ON spine.date_day = d3.dt""".stripMargin,
    "q07_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders) * 0.9""".stripMargin,
    "q08_distinct_symbols" ->
      "SELECT DISTINCT user_id AS id FROM events",
    "q09_count_filtered" ->
      """SELECT count(*) AS cnt FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-02-01'
        |  AND l_returnflag = 'R'""".stripMargin,
    "q10_union_counts" ->
      Seq("customer", "orders", "lineitem", "supplier", "part")
        .map(n => s"SELECT '$n' AS table_name, count(*) AS n_rows FROM $n")
        .mkString("\nUNION ALL\n"),
    "q11_dedup_last_write" ->
      """SELECT event_id, user_id, CAST(ts AS DATE) AS dt, value FROM events
        |QUALIFY row_number() OVER (
        |  PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts DESC) = 1""".stripMargin,
    "q12_unique_violations" ->
      """SELECT user_id, CAST(ts AS DATE) AS dt, count(*) AS n
        |FROM events GROUP BY 1, 2 HAVING count(*) > 1""".stripMargin,
    "q13_top_n" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin,
    // Independent quadratic formulation: dominance spelled out as
    // NOT EXISTS — must coincide with the engine's frontier plan.
    "q211_skyline" ->
      """SELECT p.p_partkey, p.p_size, p.p_retailprice
        |FROM part p
        |WHERE p.p_size IS NOT NULL AND p.p_retailprice IS NOT NULL
        |  AND NOT EXISTS (
        |    SELECT 1 FROM part q
        |    WHERE q.p_size IS NOT NULL AND q.p_retailprice IS NOT NULL
        |      AND q.p_size >= p.p_size
        |      AND q.p_retailprice <= p.p_retailprice
        |      AND (q.p_size > p.p_size
        |           OR q.p_retailprice < p.p_retailprice))""".stripMargin,
    "q14_topk_per_group" ->
      """SELECT c_mktsegment, rk, c_custkey, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |         row_number() OVER (PARTITION BY c_mktsegment
        |           ORDER BY c_acctbal DESC, c_custkey) AS rk
        |  FROM customer) WHERE rk <= 3""".stripMargin,
    "q104_intersect" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |WHERE ts < TIMESTAMP '2024-01-10'
        |INTERSECT
        |SELECT DISTINCT user_id, event_type FROM events
        |WHERE ts >= TIMESTAMP '2024-01-20'""".stripMargin,
    "q100_anti_join" ->
      """SELECT n_name, count(*) AS n_custs,
        |       CAST(round(sum(c_acctbal), 2) AS REAL) AS acctbal_sum
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND year(o.o_orderdate) = 1995)
        |GROUP BY 1""".stripMargin)
}
