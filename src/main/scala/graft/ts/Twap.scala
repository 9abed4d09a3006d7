package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-weighted average price (TWAP) per (symbol, day).
  *
  * The benchmark-execution twin of session VWAP
  * ([[graft.mart.Channels]]): each observed price is weighted by how
  * long it REMAINED the last trade — `next event ts − ts`, the final
  * event holding until day end (midnight). Irregularly-spaced events
  * make this differ from the plain close/mean statistics, and from
  * VWAP's volume weighting.
  *
  * Scale shape: one hash exchange on (symbol, day) feeds the
  * single-lead window and the aggregate that follows on the same key
  * (partitioning on a grouping-key subset satisfies the clustered
  * distribution — no second exchange). Weighted sums are
  * double·long products rounded at the output edge per the QueryPack
  * float rules.
  */
object Twap {

  /** events(user_id, ts, value, event_id) → (id, dt, n_events,
    * dur_total_s, twap). */
  def daily(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("id"), col("dt"))
      .orderBy(col("t"), col("event_id"))
    val dayEnd = (unix_timestamp(col("dt").cast("timestamp")) + 86400L)
    events
      .select(col("user_id").as("id"), to_date(col("ts")).as("dt"),
        unix_timestamp(col("ts")).as("t"), col("event_id"), col("value"))
      .withColumn("dur",
        coalesce(lead(col("t"), 1).over(w), dayEnd) - col("t"))
      .groupBy(col("id"), col("dt"))
      .agg(count(lit(1)).cast("int").as("n_events"),
        sum(col("dur")).as("dur_total_s"),
        round(sum(col("value") * col("dur")) / sum(col("dur")), 4)
          .cast("float").as("twap"))
  }
}
