package graft.queries

import graft.ingest.Normalize
import graft.load.PartitionIO
import graft.ts.Bars
import org.apache.spark.sql.functions._

/** Write-path verification: idempotent partition IO (S6–S10) and the
  * CSV backfill ingest (S11/S12 with P10/P11 guards). Each query runs
  * the real write path into a scratch dir under target/, then reads the
  * result back for the oracle compare — so a broken overwrite (row
  * duplication under retry, clobbered untouched partitions) or a broken
  * promotion shows up as a hash mismatch.
  */
object LoadIngest extends QueryPack {

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rmrf))
    f.delete(): Unit
  }

  private def scratch(d: String, name: String): String = {
    val dir = new java.io.File(
      s"target/scratch/${name}_${new java.io.File(d).getName}")
    rmrf(dir)
    dir.mkdirs()
    dir.toString
  }

  val queries: Map[String, Q] = Map(
    // S6–S10: full load, then the trailing-10-day window reloaded TWICE
    // (simulating the Airflow retry) — output must equal a single clean
    // load of the bars: no duplicated rows, no lost partitions.
    "q50_partition_roundtrip" -> ((s, d) => {
      val path = scratch(d, "q50")
      val bars = Bars.daily(t("events")(s, d))
      PartitionIO.overwritePartitions(
        PartitionIO.withDayPartitions(bars, "dt"), path,
        Seq("year", "month", "day"))
      PartitionIO.reloadTrailingWindow(bars, path, "dt", 10, "2024-01-30")
      PartitionIO.reloadTrailingWindow(bars, path, "dt", 10, "2024-01-30")
      s.read.parquet(path).select(
        col("id"), col("dt"), col("open"), col("high"), col("low"),
        col("close"), col("volume"),
        col("year").cast("int").as("year"),
        col("month").cast("int").as("month"),
        col("day").cast("int").as("day"))
    }),

    // S11/S12: typed bars → string CSV (with injected bad rows) →
    // header CSV read → promotion with bad-row/null guards + epoch
    // ms→s + partition derivation.
    "q51_csv_ingest" -> ((s, d) => {
      val path = scratch(d, "q51")
      val bars = Bars.daily(t("events")(s, d))
      bars.select(
          col("id").cast("string").as("id"),
          col("dt").cast("string").as("dt"),
          // Symbols id % 17 == 0 get the reference's bad-row shape
          // (open = '') and must be filtered by the promotion.
          when(col("id") % 17 === 0, lit(""))
            .otherwise(col("open").cast("string")).as("open"),
          col("high").cast("string").as("high"),
          col("low").cast("string").as("low"),
          col("close").cast("string").as("close"),
          col("volume").cast("string").as("volume"),
          (col("dt").cast("timestamp").cast("long") * 1000)
            .cast("string").as("ts_ms"))
        .write.option("header", "true").mode("overwrite").csv(path)
      val raw = s.read.option("header", "true").csv(path)
      Normalize.promoteCandles(raw, withAuditTs = false)
    }))

  val oracleSql: Map[String, String] = Map(
    "q50_partition_roundtrip" ->
      s"""WITH ${Bars.oracleCte}
         |SELECT id, dt, open, high, low, close, volume,
         |       CAST(year(dt) AS INTEGER) AS year,
         |       CAST(month(dt) AS INTEGER) AS month,
         |       CAST(day(dt) AS INTEGER) AS day
         |FROM daily""".stripMargin,
    "q51_csv_ingest" ->
      s"""WITH ${Bars.oracleCte}
         |SELECT CAST(id AS VARCHAR) AS id, dt,
         |       CAST(open AS REAL) AS open, CAST(high AS REAL) AS high,
         |       CAST(low AS REAL) AS low, CAST(close AS REAL) AS close,
         |       CAST(volume AS REAL) AS volume,
         |       CAST(epoch(CAST(dt AS TIMESTAMP)) AS BIGINT) AS ts,
         |       CAST(year(dt) AS INTEGER) AS year,
         |       CAST(month(dt) AS INTEGER) AS month,
         |       CAST(day(dt) AS INTEGER) AS day
         |FROM daily WHERE id % 17 <> 0""".stripMargin)
}
