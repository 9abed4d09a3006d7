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

  test("left-outer interval join emits unmatched trades with NULLs " +
      "only after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val trades = MemoryStream[(String, java.sql.Timestamp, Double)]
    val quotes = MemoryStream[(String, java.sql.Timestamp, Double)]
    val joined = Windowed.enrichIntervalLeftOuter(
      trades.toDF().toDF("id", "ts", "price"),
      quotes.toDF().toDF("qid", "qts", "bid"),
      lookbackS = 10, lateness = "30 seconds")
    val q = joined.writeStream.format("memory")
      .queryName("sjo_out").outputMode("append").start()
    try {
      // a quoted trade and an UNquoted one in the same batch
      quotes.addData(("BTC", ts(95), 99.5))
      trades.addData(("BTC", ts(100), 100.0), ("ETH", ts(100), 20.0))
      q.processAllAvailable()
      // the matched row may emit immediately; the unmatched ETH trade
      // must NOT have a verdict yet — no on-time quote is impossible
      // until the quote watermark passes its window
      val early = spark.sql(
        "SELECT count(*) FROM sjo_out WHERE bid IS NULL").collect()
      assert(early.head.getLong(0) == 0)
      // advance BOTH watermarks well past t=100 (+30 s lateness)
      quotes.addData(("BTC", ts(300), 101.0))
      trades.addData(("BTC", ts(300), 102.0))
      q.processAllAvailable()
      // one more cycle: outer results land the batch AFTER eviction
      quotes.addData(("BTC", ts(400), 101.5))
      trades.addData(("BTC", ts(400), 103.0))
      q.processAllAvailable()
      val nulls = spark.sql(
        "SELECT id, price FROM sjo_out WHERE bid IS NULL").collect()
      assert(nulls.map(r => (r.getString(0), r.getDouble(1))).toSet
        .contains(("ETH", 20.0)))
      // and the matched trade kept its quote
      val matched = spark.sql(
        "SELECT bid FROM sjo_out WHERE id = 'BTC' AND price = 100.0")
        .collect()
      assert(matched.map(_.getDouble(0)).toSeq == Seq(99.5))
    } finally q.stop()
  }
}
