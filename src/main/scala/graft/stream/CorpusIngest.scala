package graft.stream

import graft.llm.TextOps
import org.apache.spark.sql.{DataFrame, GraftSqlShims}
import org.apache.spark.sql.functions._

/** Streaming corpus ingest: the training-data quality/fingerprint gate
  * applied ONLINE, at document arrival time, instead of as a batch
  * sweep — the shape a live crawl/firehose pipeline needs.
  *
  * Every operator here is a pure per-row map built from the native
  * codegen kernels ([[graft.functions.SortedRunStats]] via the Gopher
  * gate, [[graft.functions.SimHash32]], [[graft.functions.RollingFp]]):
  * no window, no aggregation, no state — so the gate is legal in any
  * streaming output mode, adds zero streaming state, and a micro-batch
  * costs exactly its own rows. Content dedup across batches reuses the
  * Cassandra-upsert shape of [[Pipelines.parquetSink]]: the content
  * fingerprint is the PK, so at-least-once redelivery and in-batch
  * duplicates collapse in the sink.
  *
  * Downstream, the emitted `simhash` feeds the BATCH near-dup
  * clustering ([[graft.llm.Dedup.dupClusters]]) — computing the
  * fingerprint online is the expensive half; the band join over a
  * day's arrivals is the cheap periodic compaction.
  */
object CorpusIngest {

  /** Gate + fingerprint a (streaming or batch) docs frame: appends the
    * Gopher rule metrics and `keep`, the exact-dedup content
    * fingerprint `fp`, the order-sensitive `rolling_fp`, and the
    * near-dup `simhash`.
    */
  def gateAndFingerprint(docs: DataFrame): DataFrame =
    TextOps.gopherGate(docs)
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .withColumn("rolling_fp", TextOps.rollingFingerprint(col("text")))
      .withColumn("simhash", GraftSqlShims.column(
        graft.functions.SimHash32(GraftSqlShims.expression(
          TextOps.tokens(col("text"))))))

  /** The full online pipeline: gate, keep survivors, sink with the
    * content fingerprint as the dedup PK.
    */
  def run(docs: DataFrame, path: String, checkpoint: String) =
    Pipelines.parquetSink(
      gateAndFingerprint(docs).where(col("keep")),
      path, checkpoint, pk = Seq("fp"))
}
