package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** String-wire → typed promotion (SURVEY.md §1.3, §2.1 S11/S12, §2.2
  * P10/P11, §2.9).
  *
  * Everything off the reference's wire arrives as strings — the Kafka
  * envelopes declare every field StringType and the CSV backfill reads
  * raw text — and is promoted downstream with bad-row and null guards:
  *   - `where open != ''` bad-row filter
  *     (modules/hive_operations/query_script/init_insert_crypto_candles_past_from_csv.sql:50);
  *   - skip rows with missing required values
  *     (airflow/common_functions/yahoofinancials_operation.py:57-75);
  *   - epoch milliseconds → seconds (producers divide by 1000,
  *     modules/kafka_producers/candles_minute_producer.py:22-23,
  *     modules/common/utils.py:50-59);
  *   - `TO_DATE` / year-month-day partition derivation
  *     (init_insert_crypto_candles_past_from_csv.sql:45-47);
  *   - `CURRENT_TIMESTAMP` audit column (same file:44).
  */
object Normalize {

  /** Epoch in milliseconds (string or long) → epoch seconds.
    * `try_cast`: malformed wire values become NULL (the reference's
    * permissive Hive CAST), not an ANSI cast error.
    */
  def msToS(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (c.try_cast("long") / 1000).cast("long")

  /** Promote a string-typed candles frame (id, dt, open, high, low,
    * close, volume all strings; ts_ms epoch-millis string) to the typed
    * layout of the raw warehouse table, applying the reference's
    * guards. `withAuditTs` adds the wall-clock audit column (excluded
    * from deterministic verification outputs).
    */
  def promoteCandles(raw: DataFrame, withAuditTs: Boolean = true): DataFrame = {
    val guarded = raw
      .filter(col("open") =!= "")                       // P10
      .na.drop("any", Seq("id", "dt", "close"))          // P11
    // try_cast / try_to_date, not cast: these sessions run Spark 4 ANSI
    // defaults, where a plain cast on one malformed wire value aborts
    // the whole ingest job. The reference's Hive CAST NULLs bad cells
    // and keeps loading dirty CSV — try_* restores that contract.
    val d = try_to_date(col("dt"))
    val typed = guarded.select(
      col("id"),
      d.as("dt"),
      col("open").try_cast("float").as("open"),
      col("high").try_cast("float").as("high"),
      col("low").try_cast("float").as("low"),
      col("close").try_cast("float").as("close"),
      col("volume").try_cast("float").as("volume"),
      msToS(col("ts_ms")).as("ts"),
      year(d).cast("int").as("year"),
      month(d).cast("int").as("month"),
      dayofmonth(d).cast("int").as("day"))
    if (withAuditTs) typed.withColumn("ts_insert_utc", current_timestamp())
    else typed
  }
}
