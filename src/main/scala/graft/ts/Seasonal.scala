package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** STL-lite additive decomposition of daily closes:
  * close = trend + seasonal + residual, with trend a centered 7-day
  * moving average (full windows only), seasonal the per-(symbol,
  * weekday) mean of the detrended series, and residual the rest —
  * the day-of-week effect extractor ahead of any anomaly/forecast
  * pass.
  *
  * DETERMINISM: trend is rounded to 4 decimals at the point it enters
  * downstream arithmetic; the detrended series is then carried as a
  * SCALED LONG (units of 1e-4) and the seasonal mean is rounded
  * half-up with pure integer arithmetic — `(2|S| + n) div (2n)` —
  * because a mean of 4-decimal values over a small count lands
  * EXACTLY on round-half boundaries, where double `round` is
  * engine-dependent (Spark rounds the binary value's exact decimal
  * expansion via BigDecimal; DuckDB rounds `x*10⁴` whose own FP error
  * can sit on either side). Integer div agrees everywhere; residuals
  * are then exact integer differences rescaled once.
  *
  * Scale shape: one symbol-keyed exchange for the centered window;
  * the seasonal means group on (symbol, weekday) — 7 groups per
  * symbol, partial-aggregated map-side, joined back on the same key
  * prefix (AQE broadcasts the tiny mean table).
  */
object Seasonal {

  /** bars(id, dt, close) → (id, dt, dow, close, trend, seasonal,
    * resid); trend NULL at the edges (no full 7-day window), seasonal
    * and resid NULL with it. */
  def decompose(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("dt"))
      .rowsBetween(-3, 3)
    val trended = bars
      .withColumn("trend",
        when(count(lit(1)).over(w) === 7,
          round(avg(col("close")).over(w), 4)))
      .withColumn("dow", dayofweek(col("dt")))
      .withColumn("detr_s",
        round((col("close") - col("trend")) * 10000).cast("long"))
    val seasonal = trended.where(col("detr_s").isNotNull)
      .groupBy(col("id"), col("dow"))
      .agg(sum(col("detr_s")).as("S"), count(lit(1)).as("n"))
      .select(col("id"), col("dow"),
        (signum(col("S")).cast("long") *
          expr("(2 * abs(S) + n) DIV (2 * n)")).as("seasonal_s"))
    trended.join(seasonal, Seq("id", "dow"), "left_outer")
      .select(col("id"), col("dt"), col("dow"), col("close"),
        col("trend").cast("float").as("trend"),
        when(col("trend").isNotNull,
          col("seasonal_s").cast("double") / 10000d).cast("float")
          .as("seasonal"),
        when(col("trend").isNotNull,
          (col("detr_s") - col("seasonal_s")).cast("double") / 10000d)
          .cast("float").as("resid"))
  }
}
