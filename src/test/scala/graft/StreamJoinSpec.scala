package graft

import graft.stream.Windowed
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join semantics: a trade matches exactly the
  * same-symbol quotes in its 10 s lookback window, across micro-batch
  * boundaries (the joined quote arrives in a later batch than the
  * trade).
  */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("interval join matches lookback quotes across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val trades = MemoryStream[(String, java.sql.Timestamp, Double)]
    val quotes = MemoryStream[(String, java.sql.Timestamp, Double)]
    val joined = Windowed.enrichInterval(
      trades.toDF().toDF("id", "ts", "price"),
      quotes.toDF().toDF("qid", "qts", "bid"),
      lookbackS = 10)
    val q = joined.writeStream.format("memory")
      .queryName("sj_out").outputMode("append").start()
    try {
      // batch 0: one quote before, one in-window, one same-symbol but
      // too old, one other-symbol in-window
      quotes.addData(("BTC", ts(95), 99.5), ("BTC", ts(80), 98.0),
        ("ETH", ts(96), 10.0))
      q.processAllAvailable()
      // batch 1: the trade at t=100 — matches only BTC@95
      trades.addData(("BTC", ts(100), 100.0))
      q.processAllAvailable()
      // batch 2: a LATE quote still inside the lookback window joins a
      // buffered trade from the earlier batch
      quotes.addData(("BTC", ts(98), 99.8))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT price, bid FROM sj_out ORDER BY bid").collect()
      assert(rows.map(r => (r.getDouble(0), r.getDouble(1))).toSeq ==
        Seq((100.0, 99.5), (100.0, 99.8)))
    } finally q.stop()
  }
}
