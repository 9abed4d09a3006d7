package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted per partition.
  *
  * The codec is REAL and dependency-free: binary PPM (P6 — the
  * `netpbm` format: ASCII header `P6 <w> <h> <maxval>` + raw RGB
  * bytes) is parsed, resampled (2-D nearest-neighbor stride), and
  * re-encoded in place; payloads that don't parse as PPM are treated
  * as a 1×N byte stream and take the same stride resample in one
  * dimension. A production deployment extends [[decodeImage]] /
  * [[resample]] with further formats (JPEG/PNG need an external
  * codec); the partition-streaming plumbing around them is already the
  * real thing.
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

  /** A decoded P6 image: dimensions, max sample value, packed RGB
    * pixel bytes (row-major, 3 bytes per pixel).
    */
  final case class PpmImage(width: Int, height: Int, maxVal: Int,
      pixels: Array[Byte])

  /** Binary-PPM (P6) parser: `P6`, then whitespace-separated width /
    * height / maxval (with `#`-to-end-of-line comments, per the netpbm
    * spec), one whitespace byte, then exactly 3·w·h sample bytes.
    * Returns None on anything that isn't a complete, well-formed P6
    * payload — the caller falls back to the raw-bytes path.
    */
  def decodePpm(payload: Array[Byte]): Option[PpmImage] = {
    if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6')
      return None
    var i = 2
    def skipWs(): Unit = {
      var more = true
      while (more && i < payload.length) {
        val b = payload(i)
        if (b == ' ' || b == '\n' || b == '\r' || b == '\t') i += 1
        else if (b == '#') {
          while (i < payload.length && payload(i) != '\n') i += 1
        } else more = false
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = 0
      var any = false
      while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
        v = v * 10 + (payload(i) - '0')
        i += 1
        any = true
        if (v > (1 << 24)) return -1 // reject absurd dims before overflow
      }
      if (any) v else -1
    }
    val w = readInt(); val h = readInt(); val mv = readInt()
    if (w <= 0 || h <= 0 || mv <= 0 || mv > 255) return None
    i += 1 // the single whitespace byte terminating the header
    val need = 3L * w * h
    if (i + need > payload.length) return None
    Some(PpmImage(w, h, mv,
      java.util.Arrays.copyOfRange(payload, i, i + need.toInt)))
  }

  /** The canonical header this codec emits: `P6\n<w> <h>\n<maxval>\n`. */
  def encodePpm(img: PpmImage): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n${img.maxVal}\n"
      .getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  private def ppmEncodedSize(w: Int, h: Int, maxVal: Int): Int =
    s"P6\n$w $h\n$maxVal\n".length + 3 * w * h

  /** 2-D nearest-neighbor stride resample to the smallest integer
    * stride whose re-encoded image fits `maxBytes`: output pixel
    * (i, j) = input pixel (i·stride, j·stride), top-left anchored —
    * the 2-D form of the raw path's every-stride-th-byte rule. Bottoms
    * out at 1×1 (a header + one pixel may still exceed a tiny
    * `maxBytes`; an image cannot shrink further).
    */
  def resamplePpm(img: PpmImage, maxBytes: Int): PpmImage = {
    def outDims(s: Int): (Int, Int) =
      ((img.width + s - 1) / s, (img.height + s - 1) / s)
    var stride = 1
    var (ow, oh) = outDims(stride)
    while (ppmEncodedSize(ow, oh, img.maxVal) > maxBytes
        && (ow > 1 || oh > 1)) {
      stride += 1
      val d = outDims(stride); ow = d._1; oh = d._2
    }
    val out = new Array[Byte](3 * ow * oh)
    var j = 0
    while (j < oh) {
      var i = 0
      while (i < ow) {
        val src = ((j * stride) * img.width + i * stride) * 3
        val dst = (j * ow + i) * 3
        out(dst) = img.pixels(src)
        out(dst + 1) = img.pixels(src + 1)
        out(dst + 2) = img.pixels(src + 2)
        i += 1
      }
      j += 1
    }
    PpmImage(ow, oh, img.maxVal, out)
  }

  /** Decode metadata: PPM payloads get their REAL parsed dimensions
    * and format "ppm"; anything else is honestly a 1×N byte stream,
    * format "raw". `pix_sum` is the unsigned sum of the decoded
    * content bytes (pixels for ppm, the whole payload for raw) — the
    * integrity checksum the oracle re-derives.
    */
  def decodeImage(payload: Array[Byte]): (Int, Int, String, Long) =
    decodePpm(payload) match {
      case Some(img) =>
        (img.width, img.height, "ppm", unsignedSum(img.pixels))
      case None => (payload.length, 1, "raw", unsignedSum(payload))
    }

  private def unsignedSum(bytes: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += bytes(i) & 0xFF; i += 1 }
    s
  }

  /** Format-dispatching resample: PPM → [[resamplePpm]] + re-encode;
    * raw byte streams keep every stride-th byte (stride =
    * ceil(len / maxBytes)) — the 1-D form of the same rule.
    */
  def resample(payload: Array[Byte], maxBytes: Int): Array[Byte] =
    decodePpm(payload) match {
      case Some(img) => encodePpm(resamplePpm(img, maxBytes))
      case None => resampleRaw(payload, maxBytes)
    }

  /** The raw-bytes path: deterministic down-sampling of a byte payload
    * to at most `maxBytes` by keeping every stride-th byte (stride =
    * ceil(len / maxBytes)).
    */
  def resampleRaw(payload: Array[Byte], maxBytes: Int): Array[Byte] =
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

  /** Decoded-media schema appended by [[decodePayloads]]. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType),
    StructField("pix_sum", LongType)))

  /** Partition-streaming resize: appends (resized, resized_bytes) to
    * every row carrying a `payload` binary column — PPM payloads take
    * the real 2-D pixel resample, raw ones the 1-D byte stride.
    */
  def resizePayloads(frame: DataFrame, maxBytes: Int = 128): DataFrame = {
    val outSchema = StructType(frame.schema.fields ++ Seq(
      StructField("resized", BinaryType),
      StructField("resized_bytes", IntegerType)))
    val payloadIdx = frame.schema.fieldIndex("payload")
    frame.mapPartitions { rows =>
      rows.map { r =>
        val rp = resample(r.getAs[Array[Byte]](payloadIdx), maxBytes)
        Row.fromSeq(r.toSeq ++ Seq(rp, rp.length))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Partition-streaming decode: appends (width, height, format,
    * pix_sum) to every row carrying a `payload` binary column.
    */
  def decodePayloads(frame: DataFrame): DataFrame = {
    val outSchema = StructType(frame.schema.fields ++ decodedSchema.fields)
    val payloadIdx = frame.schema.fieldIndex("payload")
    frame.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, fmt, ps) = decodeImage(r.getAs[Array[Byte]](payloadIdx))
        Row.fromSeq(r.toSeq ++ Seq(w, h, fmt, ps))
      }
    }(RowEncoder.encoderFor(outSchema))
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

  /** Deterministic synthetic P6 payload: dims from the id, pixel byte
    * (x, y, c) = (id·7 + x·3 + y·5 + c·11) mod 256 — the generator the
    * q123 oracle re-derives arithmetically, so the whole
    * generate → encode → decode → resample → decode chain sits under
    * the hash gate.
    */
  def syntheticPpm(docId: Long, w: Int, h: Int): Array[Byte] = {
    val pixels = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          pixels((y * w + x) * 3 + c) =
            ((docId * 7 + x * 3 + y * 5 + c * 11) % 256).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    encodePpm(PpmImage(w, h, 255, pixels))
  }

  /** (doc_id) → (doc_id, payload) with [[syntheticPpm]] images of
    * id-derived dimensions (w = 4 + id mod 5, h = 3 + id mod 4) —
    * the injection frame for the q123 codec gate.
    */
  def syntheticPpmFrame(ids: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    ids.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, syntheticPpm(id, 4 + (id % 5).toInt, 3 + (id % 4).toInt))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  // ---------------------------------------------------------------
  // Image perceptual hashing: average-hash near-dup detection
  // ---------------------------------------------------------------

  /** 64-bit average hash (aHash) of a decoded image — the standard
    * perceptual fingerprint of LAION-class image dedup pipelines:
    * integer grayscale (r+g+b)/3, nearest-neighbor 8×8 grid (cell
    * (i, j) reads source pixel (i·w/8, j·h/8) — the [[resamplePpm]]
    * top-left-anchor convention), then bit k = j·8+i set iff the cell
    * is at-or-above the grid mean. The mean compare is the EXACT
    * integer inequality 64·g ≥ Σg — no division, no float — so the
    * hash is bit-identical in any engine. Returns (packed long with
    * bit k at position 63−k, '0'/'1' string with bit k at index k) —
    * the [[graft.functions.SimHashFp]] fingerprint contract, so the
    * banded Hamming pair machinery applies unchanged.
    */
  def aHash(img: PpmImage): (Long, String) = {
    val g8 = new Array[Long](64)
    var sum = 0L
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        val src = ((j * img.height / 8) * img.width + i * img.width / 8) * 3
        val g = ((img.pixels(src) & 0xff) + (img.pixels(src + 1) & 0xff) +
          (img.pixels(src + 2) & 0xff)) / 3
        g8(j * 8 + i) = g
        sum += g
        i += 1
      }
      j += 1
    }
    var fp = 0L
    val sb = new StringBuilder(64)
    var k = 0
    while (k < 64) {
      val bit = 64L * g8(k) >= sum
      if (bit) fp |= 1L << (63 - k)
      sb.append(if (bit) '1' else '0')
      k += 1
    }
    (fp, sb.toString)
  }

  /** Partition-streaming aHash: (doc_id, payload) → (doc_id, simhash
    * bit string, fpl packed long) for every payload that parses as
    * PPM — the fingerprint frame [[graft.llm.Dedup.fpPairs]] consumes.
    * Codec-only `mapPartitions` (the documented exception); payloads
    * never leave their partition, only the 10-byte fingerprint rows
    * shuffle downstream.
    */
  def aHashPayloads(frame: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("simhash", StringType),
      StructField("fpl", LongType)))
    val idIdx = frame.schema.fieldIndex("doc_id")
    val payloadIdx = frame.schema.fieldIndex("payload")
    frame.mapPartitions { rows =>
      rows.flatMap { r =>
        decodePpm(r.getAs[Array[Byte]](payloadIdx)).map { img =>
          val (fp, bits) = aHash(img)
          Row(r.getLong(idIdx), bits, fp)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** 64-bit DIFFERENCE hash (dHash, gradient hash — Krawetz 2013's
    * "kind of like a hash" family member beside [[aHash]]'s mean and
    * [[pHash]]'s DCT): on the SAME 8×8 grayscale grid as [[aHash]],
    * bit (j, i) = g(j, i) < g(j, (i+1) mod 8) — the sign of the
    * horizontal brightness GRADIENT, with the row closed by the
    * wrap-around compare so all 64 bits are defined. A uniform
    * brightness shift (no wrap) leaves every difference — hence the
    * hash — EXACTLY unchanged (strictly stronger than aHash's
    * mean-tracking near-invariance, spec-pinned); a spatial-gradient
    * flip reverses the comparisons. Pure integer arithmetic, so the
    * oracle re-derives every bit from the shared grayscale CTEs with
    * one grid self-join.
    */
  def dHash(img: PpmImage): (Long, String) = {
    val g8 = new Array[Long](64)
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        val src = ((j * img.height / 8) * img.width + i * img.width / 8) * 3
        g8(j * 8 + i) = ((img.pixels(src) & 0xff) +
          (img.pixels(src + 1) & 0xff) +
          (img.pixels(src + 2) & 0xff)) / 3
        i += 1
      }
      j += 1
    }
    var fp = 0L
    val sb = new StringBuilder(64)
    var k = 0
    while (k < 64) {
      val nb = (k / 8) * 8 + (k % 8 + 1) % 8
      val bit = g8(k) < g8(nb)
      if (bit) fp |= 1L << (63 - k)
      sb.append(if (bit) '1' else '0')
      k += 1
    }
    (fp, sb.toString)
  }

  /** Partition-streaming [[dHash]]: the [[aHashPayloads]] contract
    * (codec-only `mapPartitions`, zero exchanges, 10-byte hash rows
    * the only shuffle payload) with the gradient kernel. */
  def dHashPayloads(frame: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("simhash", StringType),
      StructField("fpl", LongType)))
    val idIdx = frame.schema.fieldIndex("doc_id")
    val payloadIdx = frame.schema.fieldIndex("payload")
    frame.mapPartitions { rows =>
      rows.flatMap { r =>
        decodePpm(r.getAs[Array[Byte]](payloadIdx)).map { img =>
          val (fp, bits) = dHash(img)
          Row(r.getLong(idIdx), bits, fp)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  // ---------------------------------------------------------------
  // Image perceptual hashing: DCT hash (pHash)
  // ---------------------------------------------------------------

  /** Fixed-point integer DCT-II basis tables for the 16×12 synthetic
    * family: `dctCosX(u)(x) = round(cos(π(2x+1)u/32) · 2¹⁴)` and
    * `dctCosY(v)(y) = round(cos(π(2y+1)v/24) · 2¹⁴)`. Generated ONCE
    * here (libm cos at table-build time only) and inlined as literal
    * VALUES into the DuckDB oracle — so neither engine's QUERY path
    * touches libm and the transform is exact 64-bit integer
    * arithmetic on both sides.
    */
  val dctCosX: Array[Array[Long]] = Array.tabulate(8, 16) { (u, x) =>
    Math.round(Math.cos(Math.PI * (2 * x + 1) * u / 32.0) * 16384.0)
  }
  val dctCosY: Array[Array[Long]] = Array.tabulate(8, 12) { (v, y) =>
    Math.round(Math.cos(Math.PI * (2 * y + 1) * v / 24.0) * 16384.0)
  }

  /** 64-bit DCT hash (pHash) of a decoded 16×12 image — the
    * frequency-domain perceptual fingerprint next to [[aHash]]'s
    * spatial mean compare: integer grayscale (r+g+b)/3, the 8×8
    * low-frequency block of the 2-D DCT-II via the fixed-point
    * [[dctCosX]]/[[dctCosY]] tables (coef(u, v) =
    * Σ g·cx·cy, exact longs — |coef| ≤ 255·192·2²⁸ ≪ 2⁶³), then
    * bit k = v·8+u set iff the AC coefficient EXCEEDS the median AC
    * coefficient (the 32nd smallest of the 63, a well-defined
    * multiset rank — tie order irrelevant); the DC bit is 0 by
    * convention. pHash survives brightness shifts aHash flips on
    * (DC absorbs them), the reason pipelines run both.
    *
    * Returns the [[graft.functions.SimHashFp]] (packed long, bit
    * string) contract, so the banded Hamming pair machinery applies
    * unchanged. None for dimensions ≠ 16×12 (the tables are
    * family-fixed).
    */
  def pHash(img: PpmImage): Option[(Long, String)] = {
    if (img.width != 16 || img.height != 12) return None
    val g = new Array[Long](192)
    var p = 0
    while (p < 192) {
      g(p) = ((img.pixels(p * 3) & 0xff) + (img.pixels(p * 3 + 1) & 0xff) +
        (img.pixels(p * 3 + 2) & 0xff)) / 3
      p += 1
    }
    val coef = new Array[Long](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0L
        var y = 0
        while (y < 12) {
          var x = 0
          while (x < 16) {
            s += g(y * 16 + x) * dctCosX(u)(x) * dctCosY(v)(y)
            x += 1
          }
          y += 1
        }
        coef(v * 8 + u) = s
        u += 1
      }
      v += 1
    }
    val med = coef.drop(1).sorted.apply(31)
    var fp = 0L
    val sb = new StringBuilder(64)
    var k = 0
    while (k < 64) {
      val bit = k > 0 && coef(k) > med
      if (bit) fp |= 1L << (63 - k)
      sb.append(if (bit) '1' else '0')
      k += 1
    }
    Some((fp, sb.toString))
  }

  /** Partition-streaming [[pHash]]: the [[aHashPayloads]] shape —
    * codec-only `mapPartitions`, 10-byte fingerprint rows out. */
  def pHashPayloads(frame: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("simhash", StringType),
      StructField("fpl", LongType)))
    val idIdx = frame.schema.fieldIndex("doc_id")
    val payloadIdx = frame.schema.fieldIndex("payload")
    frame.mapPartitions { rows =>
      rows.flatMap { r =>
        decodePpm(r.getAs[Array[Byte]](payloadIdx)).flatMap(pHash)
          .map { case (fp, bits) => Row(r.getLong(idIdx), bits, fp) }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Deterministic NOISY synthetic image family for the perceptual-
    * hash gate: groups of four consecutive doc_ids share one md5-
    * derived 16×12 base image (channel c of pixel (x, y) = the
    * (2c+1, 2c+2) md5 nibbles of `base:x:y` — content-diverse, unlike
    * [[syntheticPpm]]'s gradient, whose relative-to-mean bit pattern
    * is id-independent and would pair everything with everything);
    * replicas k = id mod 4 > 0 brighten the sparse pixel set
    * (x + 3y) mod 13 = 0 by k, clamped at 255 — small perceptual
    * noise, so in-group Hamming stays tiny while cross-group hashes
    * are independent 64-bit draws.
    */
  def syntheticNoisyPpm(docId: Long): Array[Byte] = {
    val base = docId - (docId % 4)
    val k = (docId % 4).toInt
    val md = java.security.MessageDigest.getInstance("MD5")
    val pixels = new Array[Byte](3 * 16 * 12)
    var y = 0
    while (y < 12) {
      var x = 0
      while (x < 16) {
        val hex = md.digest(s"$base:$x:$y".getBytes("UTF-8"))
        var c = 0
        while (c < 3) {
          var v = hex(c) & 0xff
          if (k > 0 && (x + 3 * y) % 13 == 0) v = math.min(255, v + k)
          pixels((y * 16 + x) * 3 + c) = v.toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    encodePpm(PpmImage(16, 12, 255, pixels))
  }

  /** (doc_id) → (doc_id, payload) with [[syntheticNoisyPpm]] images —
    * the injection frame for the aHash near-dup gate.
    */
  def syntheticNoisyPpmFrame(ids: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    ids.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, syntheticNoisyPpm(id))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** 16-bin grayscale histogram per image — the raw material of the
    * entropy/contrast low-information filter beside [[sobelFeatures]]'
    * gradient energy: a near-blank scrape concentrates in one bin, a
    * busy photograph spreads. Counts are EXACT integers (bin =
    * gray div 16 with the shared (r+g+b)/3 integer grayscale), emitted
    * as 16 named columns so the downstream entropy is a FIXED
    * expression over them — never a float sum across grouped bin rows.
    * Codec-only mapPartitions: payload bytes never leave their
    * partition; 18 small columns shuffle out.
    */
  def grayHistogram(frame: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_pixels", IntegerType)) ++
      (0 until 16).map(i => StructField(s"b$i", IntegerType)))
    val payloadIdx = frame.schema.fieldIndex("payload")
    frame.mapPartitions { rows =>
      rows.flatMap { r =>
        decodePpm(r.getAs[Array[Byte]](payloadIdx)).map { img =>
          val counts = new Array[Int](16)
          var i = 0
          val n = img.width * img.height
          while (i < n) {
            val p = i * 3
            val g = ((img.pixels(p) & 0xff) + (img.pixels(p + 1) & 0xff) +
              (img.pixels(p + 2) & 0xff)) / 3
            counts(g / 16) += 1
            i += 1
          }
          Row.fromSeq(r.getLong(0) +: n +: counts.toSeq)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Sobel edge-energy features per image — the classic gradient
    * FEATURE-EXTRACTION pass of a multimodal training pipeline
    * (blur/blank-image filtering, complexity stratification) beside
    * the perceptual-hash DEDUP family: integer grayscale (r+g+b)/3,
    * the 3×3 Sobel kernels at every interior pixel, magnitude
    * |gx| + |gy| (L1 — exact integers, no sqrt), reduced to per-image
    * totals. A near-blank scrape scores ~0 edge energy; a dense
    * texture maxes n_edges — the two tails a curation pass cuts.
    *
    * Everything is EXACT integer arithmetic on the decoded bytes, so
    * the synthetic-image oracle re-derives every feature; the kernel
    * is the codec-only `mapPartitions` exception (payload bytes never
    * leave their partition, 7 small columns shuffle out).
    *
    * @return (doc_id, w, h, n_interior, edge_energy, n_edges
    *         — |gx|+|gy| ≥ 128 — and max_grad)
    */
  def sobelFeatures(frame: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("w", IntegerType),
      StructField("h", IntegerType),
      StructField("n_interior", IntegerType),
      StructField("edge_energy", LongType),
      StructField("n_edges", IntegerType),
      StructField("max_grad", IntegerType)))
    val idIdx = frame.schema.fieldIndex("doc_id")
    val payloadIdx = frame.schema.fieldIndex("payload")
    frame.mapPartitions { rows =>
      rows.flatMap { r =>
        decodePpm(r.getAs[Array[Byte]](payloadIdx)).map { img =>
          val w = img.width
          val h = img.height
          def g(x: Int, y: Int): Int = {
            val p = (y * w + x) * 3
            ((img.pixels(p) & 0xff) + (img.pixels(p + 1) & 0xff) +
              (img.pixels(p + 2) & 0xff)) / 3
          }
          var energy = 0L
          var nEdges = 0
          var mx = 0
          var n = 0
          var y = 1
          while (y < h - 1) {
            var x = 1
            while (x < w - 1) {
              val gx = (g(x + 1, y - 1) + 2 * g(x + 1, y) +
                g(x + 1, y + 1)) -
                (g(x - 1, y - 1) + 2 * g(x - 1, y) + g(x - 1, y + 1))
              val gy = (g(x - 1, y + 1) + 2 * g(x, y + 1) +
                g(x + 1, y + 1)) -
                (g(x - 1, y - 1) + 2 * g(x, y - 1) + g(x + 1, y - 1))
              val m = math.abs(gx) + math.abs(gy)
              energy += m
              if (m >= 128) nEdges += 1
              if (m > mx) mx = m
              n += 1
              x += 1
            }
            y += 1
          }
          Row(r.getLong(idIdx), w, h, n, energy, nEdges, mx)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  // ---------------------------------------------------------------
  // Audio: dependency-free RIFF/WAV PCM16 mono codec + frame features
  // ---------------------------------------------------------------

  /** Decoded PCM16 mono audio. */
  final case class WavAudio(sampleRate: Int, samples: Array[Short])

  /** Canonical 44-byte RIFF/WAVE header (PCM, mono, 16-bit LE) + data. */
  def encodeWav(audio: WavAudio): Array[Byte] = {
    val dataSize = audio.samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(audio.sampleRate).putInt(audio.sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    audio.samples.foreach(buf.putShort)
    buf.array()
  }

  /** RIFF chunk walker: accepts any chunk order/extra chunks, requires
    * a PCM (format 1) mono 16-bit `fmt ` chunk before `data`. Returns
    * None on anything malformed — callers route non-audio payloads
    * elsewhere, exactly like [[decodePpm]]'s fallback contract.
    */
  def decodeWav(payload: Array[Byte]): Option[WavAudio] = {
    if (payload.length < 12) return None
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    if (tag() != "RIFF") return None
    buf.getInt // declared riff size — trust actual buffer instead
    if (tag() != "WAVE") return None
    var rate = -1
    while (buf.remaining() >= 8) {
      val id = tag()
      val size = buf.getInt
      if (size < 0 || size > buf.remaining()) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val p = buf.position()
          val fmt = buf.getShort; val ch = buf.getShort
          val sr = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          val bits = buf.getShort
          if (fmt != 1 || ch != 1 || bits != 16) return None
          rate = sr
          buf.position(p + size + (size & 1)) // chunks pad to even
        case "data" =>
          if (rate <= 0) return None
          val n = size / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = buf.getShort; i += 1 }
          return Some(WavAudio(rate, out))
        case _ =>
          buf.position(buf.position() + size + (size & 1))
      }
    }
    None
  }

  /** (doc_id, payload) → (doc_id, sample_rate, n_samples, samples) —
    * the codec boundary, streamed per partition like the PPM path;
    * undecodable payloads are dropped (they belong to the raw route).
    */
  def decodeWavFrame(frame: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("samples", ArrayType(IntegerType, containsNull = false))))
    frame.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        decodeWav(r.getAs[Array[Byte]](1)).map { a =>
          Row(r.getLong(0), a.sampleRate, a.samples.length,
            a.samples.map(_.toInt).toSeq)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Frame-level audio features over fixed windows of `windowSamples`
    * samples: per (doc, window) the sample count, energy Σx² (exact
    * long), peak |x|, and zero-crossing count — the standard
    * cheap-feature trio (VAD gating, silence trimming, clipping
    * detection) ahead of any model featurizer.
    *
    * Everything is EXACT integer arithmetic — the whole feature frame
    * sits under the hash gate with no float edge. Windows explode from
    * the samples array and reduce via array HOFs — a pure MAP per doc,
    * zero shuffles at any corpus size (HOF lambdas evaluate
    * interpreted, which is fine at ≤ O(100) samples·window⁻¹ density;
    * a native kernel is the [[graft.functions.DotProduct]] escalation
    * path if profiles ever say otherwise).
    */
  def audioFeatures(decoded: DataFrame,
      windowSamples: Int = 32): DataFrame = {
    val w = lit(windowSamples)
    val nWin = (col("n_samples") + (windowSamples - 1)) / w
    val win = decoded
      .select(col("doc_id"), col("sample_rate"), col("samples"),
        explode(sequence(lit(0), nWin.cast("int") - 1)).as("win"))
      .withColumn("wnd", slice(col("samples"), col("win") * w + 1, w))
    val pairsCross = zip_with(
      slice(col("wnd"), lit(1), size(col("wnd")) - 1),
      slice(col("wnd"), lit(2), size(col("wnd")) - 1),
      (a, b) => (a >= 0) =!= (b >= 0))
    win.select(col("doc_id"), col("win"),
      size(col("wnd")).as("n"),
      aggregate(col("wnd"), lit(0L),
        (acc, x) => acc + x.cast("long") * x).as("energy"),
      array_max(transform(col("wnd"), x => abs(x))).as("peak"),
      when(size(col("wnd")) <= 1, 0)
        .otherwise(size(filter(pairsCross, c => c))).cast("int")
        .as("zero_cross"),
      col("sample_rate"))
  }

  /** Deterministic PCM16 injection: sample i of doc d is
    * ((d·13 + i·17) mod 2048) − 1024 — SQL-re-derivable, so the whole
    * decode → window → feature chain sits under a full oracle.
    */
  def syntheticWav(docId: Long, nSamples: Int, rate: Int): Array[Byte] =
    encodeWav(WavAudio(rate, Array.tabulate(nSamples)(i =>
      ((docId * 13 + i * 17) % 2048 - 1024).toShort)))

  // ---------------------------------------------------------------
  // Audio fingerprinting: energy-difference near-dup detection
  // ---------------------------------------------------------------

  /** 64-bit audio fingerprint — the single-band time-derivative form
    * of the Haitsma–Kalker energy-difference fingerprint ("A Highly
    * Robust Audio Fingerprinting System", 2002): frame the PCM into
    * `frameSamples`-sample windows, E(t) = Σx² per frame (exact
    * long), bit t = 1 iff E(t+1) > E(t). Sign-of-derivative bits
    * survive small additive noise (only frames with near-equal
    * energies can flip) while unrelated signals draw independent
    * bits — the audio member of the perceptual-hash family next to
    * [[aHash]]/[[pHash]], all integer arithmetic end to end.
    *
    * Input is the [[decodeWavFrame]] shape; docs shorter than 65
    * frames are dropped (the fingerprint needs its full 64 diffs).
    * A pure partition-streamed map per doc — zero shuffles at any
    * corpus size — emitting the [[graft.functions.SimHashFp]] (bit
    * string, packed long) contract so the banded Hamming pair
    * machinery applies unchanged.
    */
  def audioFingerprint(decoded: DataFrame,
      frameSamples: Int = 16): DataFrame = {
    // JVM kernel, not array HOFs: the interpreted aggregate/slice
    // chain costs ~ms per row AND Catalyst re-evaluates it per band
    // explode and join side — the one-pass mapPartitions form is the
    // aHashPayloads discipline (opaque 10-byte fingerprint rows out).
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("simhash", StringType),
      StructField("fpl", LongType)))
    val idIdx = decoded.schema.fieldIndex("doc_id")
    val smIdx = decoded.schema.fieldIndex("samples")
    decoded.mapPartitions { rows =>
      rows.flatMap { r =>
        val xs = r.getSeq[Int](smIdx)
        if (xs.length < 65 * frameSamples) None
        else {
          val en = new Array[Long](65)
          var f = 0
          while (f < 65) {
            var s = 0L
            var j = 0
            while (j < frameSamples) {
              val v = xs(f * frameSamples + j).toLong
              s += v * v
              j += 1
            }
            en(f) = s
            f += 1
          }
          var fp = 0L
          val sb = new StringBuilder(64)
          var t = 0
          while (t < 64) {
            val bit = en(t + 1) > en(t)
            if (bit) fp |= 1L << (63 - t)
            sb.append(if (bit) '1' else '0')
            t += 1
          }
          Some(Row(r.getLong(idIdx), sb.toString, fp))
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Noisy synthetic WAV family for the fingerprint gate (the
    * [[syntheticNoisyPpm]] pattern in audio): groups of four
    * consecutive doc_ids share one 1040-sample (65-frame) base
    * signal whose sample i is md5-derived (the first 3 nibbles of
    * `base:i`, mod 2048, centered) — content-diverse, unlike
    * [[syntheticWav]]'s sawtooth, whose phase-shifted copies keep
    * near-identical energy-derivative patterns and would pair
    * everything with everything; replicas k = id mod 4 > 0 add +k to
    * the sparse sample set i mod 11 = 0 — tiny additive noise, so
    * in-group Hamming stays small while cross-group fingerprints are
    * independent 64-bit draws.
    */
  def syntheticNoisyWav(docId: Long): Array[Byte] = {
    val base = docId - (docId % 4)
    val k = (docId % 4).toInt
    val md = java.security.MessageDigest.getInstance("MD5")
    encodeWav(WavAudio(8000, Array.tabulate(1040) { i =>
      val hex = md.digest(s"$base:$i".getBytes("UTF-8"))
      val h3 = ((hex(0) & 0xff) << 4) | ((hex(1) & 0xf0) >> 4)
      val v = h3 % 2048 - 1024
      (if (k > 0 && i % 11 == 0) v + k else v).toShort
    }))
  }

  /** (doc_id) → (doc_id, payload) with [[syntheticNoisyWav]] audio —
    * the injection frame for the fingerprint near-dup gate. */
  def syntheticNoisyWavFrame(ids: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    ids.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, syntheticNoisyWav(id))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** (doc_id) → (doc_id, payload) WAV frames with id-derived lengths
    * (64 + id mod 64 samples @ 8 kHz) — the q176 injection frame. */
  def syntheticWavFrame(ids: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    ids.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, syntheticWav(id, 64 + (id % 64).toInt, 8000))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  // ---------------------------------------------------------------
  // Frame sequences: scene-cut (shot-boundary) detection
  // ---------------------------------------------------------------

  /** Byte length of one [[syntheticVideo]] frame: the 8×8 P6 encoding
    * ("P6\n8 8\n255\n" header = 11 bytes + 192 RGB bytes). Constant
    * across frames, so [[sampleFrames]] recovers frame boundaries
    * exactly. */
  val videoFrameBytes = 203

  /** Deterministic synthetic VIDEO payload: `nf = 6 + id mod 4`
    * concatenated 8×8 P6 frames ([[videoFrameBytes]] each) with a
    * SCENE CUT at frame `c = 2 + id mod 3` — channel (x, y, ch) of
    * frame f is `(id·7 + sx·3 + sy·5 + ch·11 + f) mod 256` where
    * (sx, sy) = (x, y) before the cut and (7−x, 7−y) after it.
    * Consecutive same-scene frames drift by +1, which aHash is
    * invariant to except at mod-256 wraps (a uniform shift moves
    * every cell and the mean together — Hamming ≈ 0); the cut FLIPS
    * the spatial gradient, complementing the hash's half-plane
    * (Hamming ≈ 62 on wrap-free ids). A uniform brightness shift
    * would NOT register — the detector sees structure, not exposure,
    * exactly the perceptual-hash contract. Pure arithmetic, so the
    * oracle re-derives every frame's hash without a decoder.
    */
  def syntheticVideo(docId: Long): Array[Byte] = {
    val nf = 6 + (docId % 4).toInt
    val cut = 2 + (docId % 3).toInt
    val out = new java.io.ByteArrayOutputStream(nf * videoFrameBytes)
    var f = 0
    while (f < nf) {
      val flip = f >= cut
      val pixels = new Array[Byte](192)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val sx = if (flip) 7 - x else x
          val sy = if (flip) 7 - y else y
          var ch = 0
          while (ch < 3) {
            pixels((y * 8 + x) * 3 + ch) =
              ((docId * 7 + sx * 3 + sy * 5 + ch * 11 + f) % 256).toByte
            ch += 1
          }
          x += 1
        }
        y += 1
      }
      out.write(encodePpm(PpmImage(8, 8, 255, pixels)))
      f += 1
    }
    out.toByteArray
  }

  /** (doc_id) → (doc_id, payload) with [[syntheticVideo]] payloads —
    * the injection frame for the scene-cut gate. */
  def syntheticVideoFrame(ids: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType)))
    ids.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, syntheticVideo(id))
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Per-FRAME [[aHash]]: (doc_id, frame_id, frame) → (doc_id,
    * frame_id, simhash, fpl) for every frame that parses as PPM —
    * [[aHashPayloads]] keyed by (doc, frame) so a sampled frame
    * sequence can be hashed in place. Codec-only `mapPartitions`;
    * frame bytes never shuffle, only 12-byte hash rows do. */
  def aHashFrames(frames: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_id", IntegerType, nullable = false),
      StructField("simhash", StringType),
      StructField("fpl", LongType)))
    val idIdx = frames.schema.fieldIndex("doc_id")
    val fidIdx = frames.schema.fieldIndex("frame_id")
    val frIdx = frames.schema.fieldIndex("frame")
    frames.mapPartitions { rows =>
      rows.flatMap { r =>
        decodePpm(r.getAs[Array[Byte]](frIdx)).map { img =>
          val (fp, bits) = aHash(img)
          Row(r.getLong(idIdx), r.getInt(fidIdx), bits, fp)
        }
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Scene-cut (shot-boundary) detection over a frame sequence: cut
    * the payload into frames ([[sampleFrames]], every frame), aHash
    * each, and flag consecutive-frame Hamming jumps ≥ `threshold` —
    * the standard perceptual-hash shot detector (adjacent frames
    * within a shot hash near-identically; a cut scrambles the bits).
    *
    * Scale shape: the codec stage is zero-exchange `mapPartitions`
    * (frame bytes never leave their partition); the lag window
    * shuffles only (doc_id, frame_id, fpl) rows once on doc_id, and
    * the Hamming compare is codegen'd `bit_count(xor)` on packed
    * longs — no string ops in the hot path.
    *
    * @return (doc_id, frame_id, hamming, is_cut) — one row per frame
    *         with a predecessor; is_cut ⟺ hamming ≥ threshold
    */
  def sceneCuts(video: DataFrame, frameBytes: Int,
      threshold: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = sampleFrames(video, frameBytes, everyN = 1)
      .select(col("doc_id"), col("frame_id"), col("frame"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_id"))
    val ham = bit_count(col("fpl").bitwiseXOR(col("prev_fpl")))
    aHashFrames(frames)
      .withColumn("prev_fpl", lag(col("fpl"), 1).over(w))
      .where(col("prev_fpl").isNotNull)
      .select(col("doc_id"), col("frame_id"),
        ham.cast("int").as("hamming"),
        (ham >= threshold).as("is_cut"))
  }
}
