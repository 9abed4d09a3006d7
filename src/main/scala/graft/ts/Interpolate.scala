package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-symbol calendar densification + linear gap interpolation.
  *
  * The reference's close-stats mart left-joins a calendar spine so
  * missing days surface as NULL rows (crypto_daily_close_stats.sql —
  * our q06/q29 surface) but leaves the holes; model-facing time series
  * (returns, vol targets, indicator warm-ups) need them FILLED. This
  * operator densifies each symbol to its own [min(dt), max(dt)] day
  * spine and linearly interpolates the close across each gap:
  * filled(d) = prev + (next − prev) · (d − prev_dt)/(next_dt − prev_dt).
  *
  * Scale shape: the spine is generated per symbol from a 2-column
  * min/max aggregate and exploded WHERE THE SYMBOL'S ROWS LIVE (no
  * global calendar cross-join, no driver-side date loop); the fill
  * needs exactly one hash shuffle on the symbol key — the left join
  * back to bars and both directional windows (backward last-non-null,
  * forward first-non-null over the same (id, day) sort) reuse that one
  * exchange. Gap width is bounded by a symbol's own history, so the
  * window state is the per-task sort Spark already does.
  */
object Interpolate {

  /** bars(id, dt, close) → (id, date_day, close, prev/next anchors,
    * close_fill, is_interp). Leading/trailing edges (no anchor on one
    * side) carry the one-sided anchor (forward/backward fill).
    */
  def fillDaily(bars: DataFrame): DataFrame = {
    val spine = bars.groupBy(col("id"))
      .agg(min(col("dt")).as("d0"), max(col("dt")).as("d1"))
      .select(col("id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
          .as("date_day"))
    val joined = spine.join(
      bars.select(col("id"), col("dt"), col("close")),
      spine("id") === bars("id") && col("date_day") === col("dt"),
      "left_outer")
      .select(spine("id"), col("date_day"), col("close"))
    val back = Window.partitionBy(col("id")).orderBy(col("date_day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val fwd = Window.partitionBy(col("id")).orderBy(col("date_day"))
      .rowsBetween(0, Window.unboundedFollowing)
    val anchored = joined
      .withColumn("prev_c", last(col("close"), ignoreNulls = true).over(back))
      .withColumn("prev_d", last(when(col("close").isNotNull,
        col("date_day")), ignoreNulls = true).over(back))
      .withColumn("next_c", first(col("close"), ignoreNulls = true).over(fwd))
      .withColumn("next_d", first(when(col("close").isNotNull,
        col("date_day")), ignoreNulls = true).over(fwd))
    val span = datediff(col("next_d"), col("prev_d"))
    val pos = datediff(col("date_day"), col("prev_d"))
    val interp = col("prev_c") +
      (col("next_c") - col("prev_c")) * pos / span
    anchored.select(col("id"), col("date_day"), col("close"),
      when(col("close").isNotNull, col("close"))
        .when(col("prev_c").isNull, col("next_c"))
        .when(col("next_c").isNull, col("prev_c"))
        .otherwise(interp).cast("float").as("close_fill"),
      col("close").isNull.as("is_interp"))
  }
}
