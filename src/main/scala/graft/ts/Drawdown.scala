package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maximum drawdown per symbol — the risk statistic every price mart
  * reports: drawdown(t) = close(t)/runmax(t) − 1 against the running
  * peak, summarized to the deepest trough. FLOAT-EXACT cross-engine:
  * every number is a ratio of two raw fixture closes (a running max
  * picks, never sums) — no accumulation anywhere, so even unrounded
  * doubles agree bit-for-bit; ties on the minimum break by earliest
  * date via a lexicographic struct min.
  *
  * Scale shape: one symbol-keyed exchange carries the running max,
  * the per-symbol summary is a groupBy on the same key (subset
  * partitioning, no second exchange).
  */
object Drawdown {

  /** bars(id, dt, close) → (id, n_days, trough_dt, max_dd). */
  def maxDrawdown(bars: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("dt"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // a zero running max (symbol opening on a zero close) makes the
    // ratio undefined and faults ANSI division — guarded to NULL.
    // min(dd) skips NULLs, but min over a STRUCT does NOT skip a
    // struct whose dd FIELD is NULL (NULL fields sort first), so the
    // argmin must wrap the whole struct in the NULL guard — a
    // NULL struct is genuinely skipped, keeping trough_dt consistent
    // with max_dd (and with DuckDB, where nested NULLs sort last)
    val runmax = max(col("close")).over(w)
    bars
      .withColumn("dd",
        when(runmax =!= 0, round(col("close") / runmax - 1, 4)))
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("int").as("n_days"),
        min(when(col("dd").isNotNull, struct(col("dd"), col("dt"))))
          .getField("dt").as("trough_dt"),
        min(col("dd")).cast("float").as("max_dd"))
  }
}
