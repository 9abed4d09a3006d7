package graft.ingest

import org.apache.spark.sql.types._

/** Kafka JSON envelope schemas — `{"data":[{…}]}` with every value a
  * string on the wire (the reference's wire discipline, SURVEY.md §1.3).
  *
  * Sources: candles consumed StructType
  * modules/spark_operations/streaming/candles.py:55-79; market trade
  * market_trade.py:55-76; order book order_book.py:55-74 (asks/bids as
  * `array<array<string>>` price/amount pairs, depth 20 per
  * modules/kafka_producers/conf/order_book_producer.cf).
  */
object Envelopes {

  private def env(fields: StructField*): StructType =
    StructType(Seq(StructField("data", ArrayType(StructType(fields)), true)))

  private def s(name: String, nullable: Boolean = true): StructField =
    StructField(name, StringType, nullable)

  val candles: StructType = env(
    s("id", nullable = false), s("low"), s("high"), s("open"), s("close"),
    s("amount"), s("quantity"), s("tradeCount"), s("ts_send"),
    s("startTime", nullable = false), s("closeTime", nullable = false))

  val marketTrade: StructType = env(
    s("id", nullable = false), s("trade_id", nullable = false),
    s("takerSide"), s("amount"), s("quantity"), s("price"),
    s("createTime"), s("ts_send"))

  val orderBook: StructType = env(
    s("id", nullable = false), s("seqid", nullable = false),
    StructField("asks", ArrayType(ArrayType(StringType)), false),
    StructField("bids", ArrayType(ArrayType(StringType)), false),
    s("createTime"), s("ts_send"))
}
