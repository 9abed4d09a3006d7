package graft.mart

import graft.ts.{Bars, Calendar}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `crypto_daily_close_stats` mart — the reference's analytical flagship.
  *
  * Reference: /root/reference/modules/dbt/crypto_etl_pjr/models/crypto/marts/
  * crypto_daily_close_stats.sql — six copy-pasted CTEs, one per window size
  * N ∈ {1,3,5,7,10,30}, each doing:
  *   calendar spine (clamped to observed min/max date, `min_max_dt` CTE)
  *   LEFT OUTER JOIN daily candles ON date_day = dt_create_utc
  *   AVG(close) OVER (PARTITION BY id ORDER BY dt ROWS BETWEEN N PRECEDING
  *                    AND CURRENT ROW)
  *   roc = (close - LAG(close, N)) / LAG(close, N) * 100, NULL under warm-up
  *   dt_start = date_add('day', -N, date_day), dt_end = date_day
  * then UNION ALL of the six.
  *
  * Spark-native rewrite: ONE window sort computes all six frames (Spark
  * evaluates multiple frames over the same (partition, order) with a
  * single shuffle+sort), then an `explode` of a struct array unpivots to
  * the per-`stat_range` long form. Versus the reference's 6× re-read +
  * re-sort + UNION ALL, this is 1 scan, 1 shuffle — the shape that
  * survives 100 TB.
  *
  * NULL semantics preserved exactly: spine days with no trades keep
  * symbol_id NULL (the reference joins the spine without a per-symbol
  * cross join — SURVEY.md §7.4.2), and every windowed stat is NULL until
  * its lookback fills.
  *
  * Intentional divergence: the reference appends wall-clock
  * `ts_created`/`ts_updated` audit columns (`localtimestamp(3)`); they
  * are omitted here because the verification contract requires
  * deterministic output — the audit-column pattern itself is covered by
  * `ingest/Normalize.promoteCandles(withAuditTs = true)`.
  */
object CloseStats {

  val ranges: Seq[Int] = Seq(1, 3, 5, 7, 10, 30)

  def apply(events: DataFrame): DataFrame = {
    val daily = Bars.daily(events)
    val spine = Calendar.spineOver(daily, "dt")
    val joined = spine.join(daily, spine("date_day") === daily("dt"), "left_outer")

    // One shuffle+sort evaluates every frame: window expressions must be
    // materialized in their own projection before they can feed explode.
    val w = Window.partitionBy(col("id")).orderBy(col("date_day"))
    val winCols = ranges.flatMap { n =>
      Seq(avg(col("close")).over(w.rowsBetween(-n, 0)).as(s"avg_$n"),
        lag(col("close"), n).over(w).as(s"lag_$n"))
    }
    val withWins = joined.select(
      col("id") +: col("date_day") +: col("close") +: winCols: _*)

    val perRange = ranges.map { n =>
      val lagN = col(s"lag_$n")
      struct(
        // Reference emits the bare range number ('1', '3', …) —
        // crypto_daily_close_stats.sql close_stats_N CTEs.
        lit(n.toString).as("stat_range"),
        col("close").cast("float").as("close_today"),
        col(s"avg_$n").cast("float").as("avg_close"),
        // lag = 0 would divide by zero (ANSI fault): emit NULL, same as
        // the missing-lag case.
        when(lagN.isNotNull && lagN =!= 0, (col("close") - lagN) / lagN * 100)
          .cast("float").as("roc"),
        date_sub(col("date_day"), n).as("dt_start"))
    }

    withWins
      .select(col("id").as("symbol_id"), col("date_day").as("dt_end"),
        explode(array(perRange: _*)).as("s"))
      .select(col("symbol_id"), col("s.stat_range"), col("s.close_today"),
        col("s.avg_close"), col("s.roc"), col("s.dt_start"), col("dt_end"))
  }

  /** DuckDB oracle: same semantics, expressed as the reference wrote it
    * (per-N windows + UNION ALL) — independent formulation, same answer.
    */
  def oracleSql: String = {
    val wins = ranges.map { n =>
      s"""avg(close) OVER (PARTITION BY id ORDER BY date_day
         |           ROWS BETWEEN $n PRECEDING AND CURRENT ROW) AS a$n,
         |         lag(close, $n) OVER (PARTITION BY id ORDER BY date_day) AS l$n"""
        .stripMargin
    }.mkString(",\n         ")
    val unions = ranges.map { n =>
      s"""SELECT id AS symbol_id, '$n' AS stat_range,
         |       CAST(close AS REAL) AS close_today,
         |       CAST(a$n AS REAL) AS avg_close,
         |       CAST(CASE WHEN l$n IS NOT NULL AND l$n <> 0
         |                 THEN (close - l$n) / l$n * 100 END AS REAL) AS roc,
         |       date_day - $n AS dt_start, date_day AS dt_end
         |FROM wins""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${Bars.oracleCte},
       |${Calendar.oracleCte},
       |j AS (SELECT daily.id, spine.date_day, daily.close
       |      FROM spine LEFT JOIN daily ON spine.date_day = daily.dt),
       |wins AS (
       |  SELECT id, date_day, close,
       |         $wins
       |  FROM j)
       |$unions""".stripMargin
  }
}
