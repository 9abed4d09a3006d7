package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Catalog over the shared parquet fixtures (`TESTDATA.md`).
  *
  * Mirrors the reference's fixed-schema warehouse discipline (explicit
  * DDL everywhere — /root/reference/ddl/hive/crypto_raw/candles_day.ddl:3-31):
  * tables are loaded by name with their on-disk schema, never inferred
  * from samples, and registered as temp views so the SQL surface matches
  * the DataFrame surface.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) on disk, which Spark has no native
    // type for. Sessions set spark.sql.legacy.parquet.nanosAsLong, so it
    // arrives as a nanos epoch long; normalize to a microsecond timestamp
    // here (truncation — no sub-microsecond ties exist in the fixtures,
    // so orderings are unaffected). This is the engine's string/wire →
    // typed promotion stage in miniature (SURVEY.md §1.3).
    if (name == "events")
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every fixture table as a temp view named after itself. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
