package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling z-score anomaly flags over per-symbol daily closes.
  *
  * The monitoring pass a price mart runs after load: each close
  * scored against its own trailing `window`-bar mean/stddev, flagged
  * past `zThresh`. Warm-up rows (fewer than `window` bars of history)
  * emit NULL scores rather than unstable small-sample verdicts — the
  * q41 warm-up convention.
  *
  * DETERMINISM: mean and stddev are rounded to 4 decimals BEFORE the
  * z division and the threshold compare (the [[graft.quality
  * .DataQuality.robustOutliers]] contract) — engines differ in
  * final-ulp variance accumulation, rounded stats don't. Zero/NULL
  * stddev (constant window) guards to NULL score.
  *
  * Scale shape: one symbol-keyed exchange; both rolling stats ride a
  * single (id, dt) sort; the flag is a codegen'd scalar compare.
  */
object Anomaly {

  /** bars(id, dt, close) → (id, dt, close, mean_w, std_w, z, is_anomaly) */
  def rollingZ(bars: DataFrame, window: Int = 20,
      zThresh: Double = 3.0): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("dt"))
      .rowsBetween(-(window - 1), 0)
    val warm = count(lit(1)).over(w) >= window
    val mean = round(avg(col("close")).over(w), 4)
    val std = round(stddev_samp(col("close")).over(w), 4)
    val z = when(warm && std.isNotNull && std > 0,
      round((col("close") - mean) / std, 4))
    bars.select(col("id"), col("dt"), col("close"),
      when(warm, mean).cast("float").as("mean_w"),
      when(warm, std).cast("float").as("std_w"),
      z.cast("float").as("z"),
      when(z.isNotNull, abs(z) > zThresh).as("is_anomaly"))
  }
}
