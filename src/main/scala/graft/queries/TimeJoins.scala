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
         | AND epoch(e.ts) >= iv.s0 AND epoch(e.ts) <= iv.e0""".stripMargin)
}
