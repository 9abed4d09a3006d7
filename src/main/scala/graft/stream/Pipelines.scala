package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured Streaming wiring — the reference's three topologies
  * (SURVEY.md §2.10, §3.1) re-expressed Spark-native:
  *
  *   Kafka source → [[graft.ingest.Transforms]] → `foreachBatch`
  *   append sink with checkpointed Spark-managed offsets.
  *
  * The reference's sink is Cassandra whose primary key provides
  * upsert-dedup (A6); our lakehouse sink gets the same idempotence from
  * an explicit `dropDuplicates(pk)` inside each micro-batch plus
  * append-mode parquet — at-least-once delivery with PK-stable rows.
  * Scale: each micro-batch is a normal distributed batch write; no
  * driver bottleneck, partition count follows the Kafka partitioning.
  */
object Pipelines {

  /** S1 — Kafka stream source with the reference's exact options
    * (read_stream.py:6-19, candles.py:19-23).
    */
  def kafkaSource(spark: SparkSession, servers: String, topic: String,
      maxOffsetsPerTrigger: Long = 10000L): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .option("startingOffsets", "earliest")
      .option("failOnDataLoss", "false")
      .load()

  /** S3 — checkpointed `foreachBatch` append sink (write_stream.py:4-16)
    * with per-batch PK dedup (A6). Pass `pk = Nil` for the reference's
    * raw passthrough behavior.
    */
  def parquetSink(df: DataFrame, path: String, checkpoint: String,
      pk: Seq[String] = Nil): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val deduped = if (pk.isEmpty) batch else batch.dropDuplicates(pk)
        deduped.write.mode("append").parquet(path)
      }
      .start()

  /** S4 — console debug sink (candles.py:107-108). */
  def consoleSink(df: DataFrame): StreamingQuery =
    df.writeStream.format("console").start()

  /** CROSS-micro-batch PK dedup with BOUNDED state — the native
    * `dropDuplicatesWithinWatermark` operator: a key is dropped as a
    * duplicate while it stays inside the watermark delay of its first
    * sighting, and its dedup state is EVICTED once the watermark
    * passes — the state bound that lets a dedup stream run for months
    * (plain `dropDuplicates` on a stream retains every key forever).
    * Complements [[parquetSink]]'s per-batch dedup: that one is
    * within-batch only; this one spans batches inside the lateness
    * horizon. Semantics pinned in StreamingSpec, including the
    * eviction (a key re-arriving after the watermark passed is
    * admitted again — by design: it is a NEW event at that point).
    */
  def dedupWithinWatermark(df: DataFrame, keys: Seq[String],
      lateness: String = "30 minutes"): DataFrame =
    df.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
}
