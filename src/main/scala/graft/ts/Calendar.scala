package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Calendar (date-spine) dimension.
  *
  * Reference: dbt_utils.date_spine 1900→2200
  * (/root/reference/modules/dbt/crypto_etl_pjr/models/utilities/calendar.sql:1-11),
  * clamped per-query to the observed [min(dt), max(dt)] via uncorrelated
  * scalar subqueries (the `min_max_dt` CTE in
  * models/crypto/marts/crypto_daily_close_stats.sql).
  *
  * Spark-native form: `sequence(min_dt, max_dt, interval 1 day)` exploded
  * from a 1-row global aggregate — no 110k-row static dimension needed,
  * and the single-row agg broadcasts for free into any join against it.
  */
object Calendar {

  /** Contiguous daily spine spanning [min, max] of `dateCol` in `df`. */
  def spineOver(df: DataFrame, dateCol: String): DataFrame =
    df.agg(min(col(dateCol)).as("min_dt"), max(col(dateCol)).as("max_dt"))
      .select(explode(sequence(col("min_dt"), col("max_dt"),
        expr("interval 1 day"))).as("date_day"))

  /** DuckDB equivalent over the bars CTE (expects `daily` in scope). */
  val oracleCte: String =
    """spine AS (
      |  SELECT CAST(unnest(generate_series(
      |           (SELECT min(dt) FROM daily),
      |           (SELECT max(dt) FROM daily),
      |           INTERVAL 1 DAY)) AS DATE) AS date_day)""".stripMargin
}
