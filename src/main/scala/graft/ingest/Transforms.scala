package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Envelope → row transforms, shared verbatim between the batch
  * verification queries and the Structured Streaming pipelines (the
  * same `DataFrame => DataFrame` is applied to a Kafka stream or to a
  * static frame — Catalyst treats both identically).
  *
  * Shapes mirror the reference exactly:
  *   - candles projection: streaming/candles.py:82-105 (S2 CAST, P1
  *     `from_json`, P2 `element_at`, P3 aliases, P4 `from_unixtime` /
  *     `current_timestamp` audit columns);
  *   - order-book explode: streaming/order_book.py:76-123 (W3
  *     `posexplode_outer` + rank, P5 `lit` side tag, P6 `drop`, U2
  *     ask∪bid union);
  *   - market-trade projection: streaming/market_trade.py:79-99.
  */
object Transforms {

  /** Kafka binary (key, value) → string projection (S2). */
  def castRaw(df: DataFrame): DataFrame =
    df.selectExpr("CAST(key AS STRING)", "CAST(value AS STRING)")

  /** Candles envelope → one string-typed row per message + audit cols.
    * `withInsertTs=false` omits the wall-clock `ts_insert_utc` column
    * (non-deterministic; the verification queries exclude it, the
    * streaming pipelines keep it).
    */
  def parseCandles(raw: DataFrame, withInsertTs: Boolean = true): DataFrame = {
    val base = castRaw(raw)
      .select(from_json(col("value"), Envelopes.candles).alias("value"))
      .select(
        element_at(col("value.data.id"), 1).alias("id"),
        element_at(col("value.data.low"), 1).alias("low"),
        element_at(col("value.data.high"), 1).alias("high"),
        element_at(col("value.data.open"), 1).alias("open"),
        element_at(col("value.data.close"), 1).alias("close"),
        element_at(col("value.data.amount"), 1).alias("amount"),
        element_at(col("value.data.quantity"), 1).alias("quantity"),
        element_at(col("value.data.tradeCount"), 1).alias("tradecount"),
        element_at(col("value.data.ts_send"), 1).alias("ts_send"),
        element_at(col("value.data.startTime"), 1).alias("starttime"),
        element_at(col("value.data.closeTime"), 1).alias("closetime"),
        from_unixtime(element_at(col("value.data.ts_send"), 1),
          "yyyy-MM-dd HH:mm:ss").alias("ts_create_utc"),
        from_unixtime(element_at(col("value.data.ts_send"), 1),
          "yyyy-MM-dd").alias("dt_create_utc"))
    if (withInsertTs)
      base.withColumn("ts_insert_utc",
        to_timestamp(current_timestamp(), "yyyy-MM-dd HH:mm:ss"))
    else base
  }

  /** Market-trade envelope → one string-typed row per message. */
  def parseTrades(raw: DataFrame, withInsertTs: Boolean = true): DataFrame = {
    val base = castRaw(raw)
      .select(from_json(col("value"), Envelopes.marketTrade).alias("value"))
      .select(
        element_at(col("value.data.id"), 1).alias("id"),
        element_at(col("value.data.trade_id"), 1).alias("trade_id"),
        element_at(col("value.data.takerSide"), 1).alias("takerside"),
        element_at(col("value.data.amount"), 1).alias("amount"),
        element_at(col("value.data.quantity"), 1).alias("quantity"),
        element_at(col("value.data.price"), 1).alias("price"),
        element_at(col("value.data.createTime"), 1).alias("createtime"),
        element_at(col("value.data.ts_send"), 1).alias("ts_send"),
        from_unixtime(element_at(col("value.data.createTime"), 1),
          "yyyy-MM-dd HH:mm:ss").alias("ts_create_utc"),
        from_unixtime(element_at(col("value.data.createTime"), 1),
          "yyyy-MM-dd").alias("dt_create_utc"))
    if (withInsertTs)
      base.withColumn("ts_insert_utc",
        to_timestamp(current_timestamp(), "yyyy-MM-dd HH:mm:ss"))
    else base
  }

  /** One side (ask/bid) of the order book: envelope → one row per depth
    * level with `order_rank = pos + 1`. `posexplode_outer` keeps a NULL
    * level row for empty/NULL arrays, as the reference relies on.
    */
  private def explodeSide(raw: DataFrame, side: String): DataFrame = {
    val arrayCol = if (side == "ask") "asks" else "bids"
    castRaw(raw)
      .select(from_json(col("value"), Envelopes.orderBook).alias("value"))
      .select(
        element_at(col("value.data.id"), 1).alias("id"),
        element_at(col("value.data.seqid"), 1).alias("seqid"),
        element_at(col(s"value.data.$arrayCol"), 1).alias(arrayCol),
        element_at(col("value.data.createTime"), 1).alias("createtime"),
        element_at(col("value.data.ts_send"), 1).alias("ts_send"))
      .select(col("*"), posexplode_outer(col(arrayCol)))
      .withColumn("order_rank", col("pos") + 1)
      .withColumn("quote_price", element_at(col("col"), 1))
      .withColumn("base_amount", element_at(col("col"), 2))
      .withColumn("order_type", lit(side))
      .drop("value", arrayCol, "pos", "col")
  }

  /** [[explodeOrderBook]] with ONE envelope parse: the union
    * formulation runs `from_json` once per side (the reference's
    * two-stream shape); this one parses each message once and explodes
    * the side dimension from the already-parsed struct — same rows,
    * same columns, half the JSON work, which dominates the ingest
    * cost. Equality with the union form is pinned in StreamingSpec;
    * the batch verification query (q21) registers this variant.
    */
  def explodeOrderBookFused(raw: DataFrame,
      withInsertTs: Boolean = true): DataFrame = {
    val parsed = castRaw(raw)
      .select(from_json(col("value"), Envelopes.orderBook).alias("value"))
      .select(
        element_at(col("value.data.id"), 1).alias("id"),
        element_at(col("value.data.seqid"), 1).alias("seqid"),
        element_at(col("value.data.asks"), 1).alias("asks"),
        element_at(col("value.data.bids"), 1).alias("bids"),
        element_at(col("value.data.createTime"), 1).alias("createtime"),
        element_at(col("value.data.ts_send"), 1).alias("ts_send"))
    val base = parsed
      .select(col("id"), col("seqid"), col("createtime"), col("ts_send"),
        explode(array(
          struct(lit("ask").as("order_type"), col("asks").as("levels")),
          struct(lit("bid").as("order_type"), col("bids").as("levels"))))
          .as("s"))
      .select(col("id"), col("seqid"), col("createtime"), col("ts_send"),
        col("s.order_type").as("order_type"), col("s.levels").as("levels"))
      .select(col("*"), posexplode_outer(col("levels")))
      .withColumn("order_rank", col("pos") + 1)
      .withColumn("quote_price", element_at(col("col"), 1))
      .withColumn("base_amount", element_at(col("col"), 2))
      .drop("levels", "pos", "col")
      // match the union form's column order exactly
      .select(col("id"), col("seqid"), col("createtime"), col("ts_send"),
        col("order_rank"), col("quote_price"), col("base_amount"),
        col("order_type"))
      .withColumn("ts_create_utc",
        from_unixtime(col("createtime"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("dt_create_utc",
        from_unixtime(col("createtime"), "yyyy-MM-dd"))
    if (withInsertTs)
      base.withColumn("ts_insert_utc",
        to_timestamp(current_timestamp(), "yyyy-MM-dd HH:mm:ss"))
    else base
  }

  /** Full order-book pipeline: ask ∪ bid + audit columns (U2 — the
    * reference's two-stream union shape, also the streaming-pipeline
    * form). [[explodeOrderBookFused]] is the single-parse equivalent.
    */
  def explodeOrderBook(raw: DataFrame, withInsertTs: Boolean = true): DataFrame = {
    val base = explodeSide(raw, "ask").union(explodeSide(raw, "bid"))
      .withColumn("ts_create_utc",
        from_unixtime(col("createtime"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("dt_create_utc",
        from_unixtime(col("createtime"), "yyyy-MM-dd"))
    if (withInsertTs)
      base.withColumn("ts_insert_utc",
        to_timestamp(current_timestamp(), "yyyy-MM-dd HH:mm:ss"))
    else base
  }
}
