package graft

import graft.llm.{Dedup, Multimodal}
import graft.llm.Multimodal.PpmImage
import org.scalatest.funsuite.AnyFunSuite

/** Hand-checked cases for the image average-hash (aHash) family:
  * kernel bit patterns, the noisy synthetic family's in-group /
  * cross-group Hamming contract, and the banded pair join vs a naive
  * scan.
  */
class ImageHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def img(w: Int, h: Int)(g: (Int, Int) => Int): PpmImage = {
    val px = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      px((y * w + x) * 3 + c) = g(x, y).toByte
    PpmImage(w, h, 255, px)
  }

  private def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("aHash: uniform image is all ones (64·g ≥ Σg at equality)") {
    val (fp, bits) = Multimodal.aHash(img(8, 8)((_, _) => 100))
    assert(fp == -1L && bits == "1" * 64)
  }

  test("aHash: left-bright half sets exactly the left 4 columns") {
    val (fp, bits) = Multimodal.aHash(img(8, 8)((x, _) =>
      if (x < 4) 200 else 10))
    assert(bits == "1111000011110000111100001111000011110000111100001111000011110000")
    assert(java.lang.Long.bitCount(fp) == 32)
  }

  test("aHash: 16×12 image strides the (2i, 3j/2) grid") {
    // bright only at source pixels the 8×8 grid reads from row 0
    // (sy = 0 for j = 0 only): top row bright → 8 set bits
    val (_, bits) = Multimodal.aHash(img(16, 12)((_, y) =>
      if (y == 0) 255 else 0))
    assert(bits == "1" * 8 + "0" * 56)
  }

  test("noisy synthetic family: in-group Hamming ≤ 3, cross-group far") {
    def fp(id: Long): Long = {
      val im = Multimodal.decodePpm(Multimodal.syntheticNoisyPpm(id)).get
      Multimodal.aHash(im)._1
    }
    for (k <- 1L to 3L)
      assert(hamming(fp(0), fp(k)) <= 3, s"replica $k drifted")
    // different md5-derived bases: independent 64-bit draws
    assert(hamming(fp(0), fp(4)) > 10)
    assert(hamming(fp(8), fp(12)) > 10)
  }

  test("fpPairs over aHash frame == naive all-pairs scan at ≤ 3") {
    import spark.implicits._
    val ids = (0L until 40L).toDF("doc_id")
    val fps = Multimodal.aHashPayloads(
      Multimodal.syntheticNoisyPpmFrame(ids)).cache()
    val got = Dedup.fpPairs(fps, maxHamming = 3, bits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val raw = fps.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val want = (for {
      a <- raw.keys; b <- raw.keys if a < b
      h = hamming(raw(a), raw(b)) if h <= 3
    } yield (a, b, h)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("pHash: DC bit 0, ≤ 31 ones, brightness-shift invariant") {
    def fp(id: Long) = Multimodal.pHash(
      Multimodal.decodePpm(Multimodal.syntheticNoisyPpm(id)).get).get
    val (l0, b0) = fp(0)
    assert(b0.length == 64 && b0.head == '0', "DC bit must be 0")
    // bits are strictly-above-median AC coefs: at most 31 of 63
    assert(java.lang.Long.bitCount(l0) <= 31)
    // a GLOBAL brightness shift lands entirely in the DC coefficient:
    // pHash unchanged (the property aHash does not have)
    val im = Multimodal.decodePpm(Multimodal.syntheticNoisyPpm(0)).get
    val brighter = im.copy(pixels = im.pixels.map(p =>
      math.min(255, (p & 0xff) + 40).toByte))
    assert(Multimodal.pHash(brighter).get._2 == b0,
      "uniform brightness shift must not move pHash")
    // replicas stay near, cross-group hashes are independent draws
    for (k <- 1L to 3L) assert(hamming(l0, fp(k)._1) <= 3)
    assert(hamming(l0, fp(4)._1) > 10)
  }

  test("pHash: rejects non-16×12 dimensions") {
    assert(Multimodal.pHash(img(8, 8)((_, _) => 7)).isEmpty)
  }

  test("dHash: gradient bits, exact brightness-shift invariance") {
    // strictly increasing row gradient: g(x) < g(x+1) for x < 7,
    // wrap compare g(7) > g(0) → every row "11111110"
    val inc = img(8, 8)((x, _) => 10 + 20 * x)
    val (fpInc, bitsInc) = Multimodal.dHash(inc)
    assert(bitsInc == "11111110" * 8)
    // a uniform brightness shift leaves every difference — hence the
    // hash — EXACTLY unchanged (stronger than aHash's mean tracking)
    val brighter = img(8, 8)((x, _) => 10 + 20 * x + 40)
    assert(Multimodal.dHash(brighter) == ((fpInc, bitsInc)))
    // the spatial flip reverses every strict comparison
    val dec = img(8, 8)((x, _) => 10 + 20 * (7 - x))
    assert(Multimodal.dHash(dec)._2 == "00000001" * 8)
    // constant image: no strict inequality anywhere → all zeros
    assert(Multimodal.dHash(img(8, 8)((_, _) => 99))._2 == "0" * 64)
  }

  test("fpPairsDelta == fpPairs filtered to new-touching pairs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ids = (0L until 32L).toDF("doc_id")
    val fps = Multimodal.pHashPayloads(
      Multimodal.syntheticNoisyPpmFrame(ids)).cache()
    val isNew = col("doc_id") % 3 === 0
    val got = Dedup.fpPairsDelta(fps, isNew, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Dedup.fpPairs(fps, maxHamming = 3)
      .where(col("da") % 3 === 0 || col("db") % 3 === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
    assert(got.forall(p => p._1 % 3 == 0 || p._2 % 3 == 0))
  }

  test("audio fingerprint: derivative bits, noise contract, length gate") {
    import spark.implicits._
    val ids = (0L until 24L).toDF("doc_id")
    val fps = Multimodal.audioFingerprint(Multimodal.decodeWavFrame(
      Multimodal.syntheticNoisyWavFrame(ids))).cache()
    val m = fps.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getLong(2))).toMap
    assert(m.size == 24 && m.values.forall(_._1.length == 64))
    // in-group replicas: tiny additive noise, Hamming ≤ 3
    for (k <- 1L to 3L)
      assert(hamming(m(0L)._2, m(k)._2) <= 3, s"replica $k drifted")
    // md5-derived bases: independent 64-bit draws
    assert(hamming(m(0L)._2, m(4L)._2) > 10)
    // hand-check bit 0 against the raw energies of doc 0
    val audio = Multimodal.decodeWav(Multimodal.syntheticNoisyWav(0L)).get
    def energy(f: Int) = (0 until 16).map { j =>
      val v = audio.samples(f * 16 + j).toLong; v * v
    }.sum
    assert(m(0L)._1.head == (if (energy(1) > energy(0)) '1' else '0'))
    // a doc shorter than 65 frames is dropped, not mis-hashed
    val short = Multimodal.audioFingerprint(Multimodal.decodeWavFrame(
      Seq((99L, Multimodal.syntheticWav(99L, 1000, 8000)))
        .toDF("doc_id", "payload")))
    assert(short.count() == 0)
  }

  test("sceneCuts: two-scene synthetic fires exactly at the cut frame") {
    import spark.implicits._
    // doc 0: nf = 6 frames, cut at frame 2 (scene 0 = frames 0-1,
    // scene 1 = frames 2-5); doc 1: nf = 7, cut at frame 3
    val ids = Seq(0L, 1L).toDF("doc_id")
    val got = Multimodal.sceneCuts(Multimodal.syntheticVideoFrame(ids),
        frameBytes = Multimodal.videoFrameBytes)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getBoolean(3))).toMap
    // every frame with a predecessor is present
    assert(got.keySet == Set((0L, 1), (0L, 2), (0L, 3), (0L, 4), (0L, 5),
      (1L, 1), (1L, 2), (1L, 3), (1L, 4), (1L, 5), (1L, 6)))
    // the cut frame is flagged, all same-scene transitions are not
    assert(got((0L, 2))._2 && got((1L, 3))._2)
    for (((doc, f), (ham, cut)) <- got if !(doc == 0L && f == 2)
        if !(doc == 1L && f == 3)) {
      assert(!cut, s"false cut at ($doc, $f) hamming $ham")
      assert(ham < 16)
    }
    // the flagged jumps are far above threshold headroom
    assert(got((0L, 2))._1 >= 16 && got((1L, 3))._1 >= 16)
    // cross-check one frame's hash against a directly-built image:
    // frame 0 of doc 0 is scene 0, f = 0 → channel = x·3 + y·5 + ch·11
    val direct = Multimodal.aHash(img(8, 8)((x, y) => 0) // placeholder
      .copy(pixels = {
        val px = new Array[Byte](192)
        for (y <- 0 until 8; x <- 0 until 8; c <- 0 until 3)
          px((y * 8 + x) * 3 + c) = ((x * 3 + y * 5 + c * 11) % 256).toByte
        px
      }))
    val frames = Multimodal.aHashFrames(Multimodal.sampleFrames(
        Multimodal.syntheticVideoFrame(ids),
        Multimodal.videoFrameBytes, everyN = 1)
      .select($"doc_id", $"frame_id", $"frame"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(3))
      .toMap
    assert(frames((0L, 0)) == direct._1)
  }
}
