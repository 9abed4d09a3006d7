package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted per partition.
  *
  * The Spark-side plumbing is real — schema, partition-preserving
  * batch iteration, output encoding; the media decode itself is a
  * DETERMINISTIC STUB (this environment ships no image/audio codecs):
  * [[decodeStub]] derives fake width/height/format from the bytes. A
  * real deployment swaps `decodeStub` for a codec call; nothing else
  * changes.
  *
  * Scale: `mapPartitions` keeps the decode streaming per partition (no
  * per-row task overhead, no driver involvement); binary payloads ride
  * parquet byte arrays, so partition sizing follows
  * `spark.sql.files.maxPartitionBytes` like any other column.
  */
object Multimodal {

  /** documents ⋈ embeddings joined into one multimodal frame: text +
    * metadata + opaque binary payload + vector.
    */
  def multimodalFrame(docs: DataFrame, embeddings: DataFrame): DataFrame =
    docs.join(embeddings, col("doc_id") === col("vec_id"))
      .select(
        col("doc_id"),
        col("text"),
        struct(col("lang"), col("source"), col("n_chars")).as("meta"),
        col("text").cast("binary").as("payload"),
        col("embedding"), col("label"))

  /** Decoded-media schema appended by [[decodePayloads]]. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType)))

  /** The stubbed codec: deterministic pseudo-decode of a byte payload.
    * Replace with a real image/audio decoder in production.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, String) = {
    val w = 64 + (payload.length % 577)
    // floorMod: math.abs(Int.MinValue) is still negative
    val h = 64 + java.lang.Math.floorMod(java.util.Arrays.hashCode(payload), 481)
    val fmt = if (payload.nonEmpty && payload(0) % 2 == 0) "rgb" else "gray"
    (w, h, fmt)
  }

  /** Video-style frame sampling over a binary payload, composed from
    * NATIVE operators (no mapPartitions needed): the payload is cut
    * into fixed `frameBytes` windows and every `everyN`-th frame is
    * emitted as its own row via explode + binary substring — fully
    * codegen'd, so the sampler keeps whole-stage codegen even though
    * it fans out rows. The final frame keeps its natural (shorter)
    * length.
    */
  def sampleFrames(frame: DataFrame, frameBytes: Int = 256,
      everyN: Int = 2): DataFrame =
    frame
      .select(col("doc_id"), col("payload"),
        expr(s"cast((octet_length(payload) + ${frameBytes - 1}) " +
          s"div $frameBytes as int)").as("n_frames"))
      .where(col("n_frames") > 0)
      .select(col("doc_id"), col("payload"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN)))
          .as("frame_id"))
      .select(col("doc_id"), col("n_frames"), col("frame_id"),
        expr(s"substring(payload, frame_id * $frameBytes + 1, $frameBytes)")
          .as("frame"))
      .withColumn("frame_bytes", octet_length(col("frame")))

  /** The stubbed resizer: deterministic down-sampling of a byte payload
    * to at most `maxBytes` by keeping every stride-th byte (stride =
    * ceil(len / maxBytes)). Replace with a real image scaler in
    * production; the partition-streaming shape around it stays.
    */
  def resizeStub(payload: Array[Byte], maxBytes: Int): Array[Byte] =
    if (payload.length <= maxBytes) payload
    else {
      val stride = (payload.length + maxBytes - 1) / maxBytes
      val out = new Array[Byte]((payload.length + stride - 1) / stride)
      var i = 0
      var j = 0
      while (i < payload.length) {
        out(j) = payload(i)
        j += 1
        i += stride
      }
      out
    }

  /** Partition-streaming resize: appends (resized, resized_bytes) to
    * every row carrying a `payload` binary column — same mapPartitions
    * shape as [[decodePayloads]], stub in place of a codec.
    */
  def resizePayloads(frame: DataFrame, maxBytes: Int = 128): DataFrame = {
    val outSchema = StructType(frame.schema.fields ++ Seq(
      StructField("resized", BinaryType),
      StructField("resized_bytes", IntegerType)))
    val payloadIdx = frame.schema.fieldIndex("payload")
    frame.mapPartitions { rows =>
      rows.map { r =>
        val rp = resizeStub(r.getAs[Array[Byte]](payloadIdx), maxBytes)
        Row.fromSeq(r.toSeq ++ Seq(rp, rp.length))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Partition-streaming decode: appends (width, height, format) to
    * every row carrying a `payload` binary column.
    */
  def decodePayloads(frame: DataFrame): DataFrame = {
    val outSchema = StructType(frame.schema.fields ++ decodedSchema.fields)
    val payloadIdx = frame.schema.fieldIndex("payload")
    frame.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, fmt) = decodeStub(r.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(r.toSeq ++ Seq(w, h, fmt))
      }
    }(RowEncoder.encoderFor(outSchema))
  }
}
