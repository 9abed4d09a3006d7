package graft

import graft.ingest.Normalize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Malformed-input behavior of the string→typed promotion (P10/P11,
  * ms→s epochs, partition derivation).
  */
class NormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def raw(rows: Seq[(String, String, String, String)]) = {
    import spark.implicits._
    rows.toDF("id", "dt", "open", "close")
      .withColumn("high", coalesce(col("open"), lit("0")))
      .withColumn("low", coalesce(col("open"), lit("0")))
      .withColumn("volume", lit("2.5"))
      .withColumn("ts_ms", lit("1704067200000"))
  }

  test("bad-row filter drops open = '' rows; null guard drops null keys") {
    val df = raw(Seq(
      ("BTC", "2024-01-01", "100.5", "101.0"),   // good
      ("ETH", "2024-01-01", "", "50.0"),          // bad: open ''
      (null,  "2024-01-01", "1.0", "1.0"),        // bad: null id
      ("ADA", null,         "1.0", "1.0"),        // bad: null dt
      ("SOL", "2024-01-02", "20.0", null)))       // bad: null close
    val out = Normalize.promoteCandles(df, withAuditTs = false)
    assert(out.count() == 1)
    val r = out.collect()(0)
    assert(r.getAs[String]("id") == "BTC")
    assert(r.getAs[Float]("open") == 100.5f)
    assert(r.getAs[Long]("ts") == 1704067200L)   // ms -> s
    assert(r.getAs[Int]("year") == 2024 && r.getAs[Int]("month") == 1
      && r.getAs[Int]("day") == 1)
  }

  test("malformed numerics/dates NULL out instead of aborting (ANSI)") {
    // The reference's Hive CAST is permissive: dirty cells become NULL
    // and the load keeps going. Under Spark 4 ANSI defaults a plain
    // cast would THROW here and kill the job — promoteCandles must
    // try_cast its way through garbage.
    val df = raw(Seq(
      ("BTC", "2024-01-01", "100.5", "101.0"),      // good
      ("ETH", "2024-01-01", "garbage", "abc"),      // junk numerics
      ("ADA", "not-a-date", "1.0", "1.0")))         // junk date
      .withColumn("ts_ms",
        when(col("id") === "ETH", lit("NaN-ish")).otherwise(col("ts_ms")))
    val out = Normalize.promoteCandles(df, withAuditTs = false)
    assert(out.count() == 3) // nothing crashed, nothing silently dropped
    val eth = out.where(col("id") === "ETH").collect()(0)
    assert(eth.getAs[Any]("open") == null)
    assert(eth.getAs[Any]("close") == null)
    assert(eth.getAs[Any]("ts") == null)
    val ada = out.where(col("id") === "ADA").collect()(0)
    assert(ada.getAs[Any]("dt") == null)
    assert(ada.getAs[Any]("year") == null)
    assert(out.where(col("id") === "BTC")
      .collect()(0).getAs[Float]("open") == 100.5f)
  }

  test("empty document gets NULL punct_ratio, not a divide-by-zero") {
    import spark.implicits._
    val docs = Seq((1L, "some, real. text!"), (2L, ""))
      .toDF("doc_id", "text")
    val out = graft.llm.TextOps.qualityScore(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Any]("punct_ratio")).toMap
    assert(out(1L) != null)
    assert(out(2L) == null)
  }

  test("audit column present when requested") {
    val df = raw(Seq(("BTC", "2024-01-01", "1.0", "2.0")))
    val out = Normalize.promoteCandles(df)
    assert(out.columns.contains("ts_insert_utc"))
    assert(out.where(col("ts_insert_utc").isNull).count() == 0)
  }
}
