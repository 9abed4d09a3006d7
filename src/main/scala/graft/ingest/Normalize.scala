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

  /** Epoch in milliseconds (string or long) → epoch seconds. */
  def msToS(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (c.cast("long") / 1000).cast("long")

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
    val typed = guarded.select(
      col("id"),
      to_date(col("dt")).as("dt"),
      col("open").cast("float").as("open"),
      col("high").cast("float").as("high"),
      col("low").cast("float").as("low"),
      col("close").cast("float").as("close"),
      col("volume").cast("float").as("volume"),
      msToS(col("ts_ms")).as("ts"),
      year(to_date(col("dt"))).cast("int").as("year"),
      month(to_date(col("dt"))).cast("int").as("month"),
      dayofmonth(to_date(col("dt"))).cast("int").as("day"))
    if (withAuditTs) typed.withColumn("ts_insert_utc", current_timestamp())
    else typed
  }
}
