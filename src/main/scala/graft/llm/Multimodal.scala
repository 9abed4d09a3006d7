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
