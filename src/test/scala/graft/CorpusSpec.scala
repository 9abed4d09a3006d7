package graft

import graft.llm.Corpus
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Library-level properties of the corpus-prep operators (the oracle
  * gate covers value parity; these pin the semantic invariants).
  */
class CorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs =
    Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("chunk covers every token exactly once net of overlap") {
    import spark.implicits._
    val sample = Seq(
      (0L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 toks → 4 chunks
      (1L, "a b c"),                                   // short → 1 chunk
      (2L, (1 to 32).map(i => s"u$i").mkString(" ")),  // exactly one window
      (3L, (1 to 33).map(i => s"v$i").mkString(" ")))  // one over → 2 chunks
      .toDF("doc_id", "text")
    val out = Corpus.chunk(sample, chunkTokens = 32, overlap = 8)
      .orderBy("doc_id", "chunk_id").collect()
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc(0L).length == 4 && byDoc(1L).length == 1 &&
      byDoc(2L).length == 1 && byDoc(3L).length == 2)
    // stitching chunks back (dropping each chunk's 8-token overlap head
    // after the first) reproduces the document
    val stitched = byDoc(0L).sortBy(_.getInt(1)).zipWithIndex.map {
      case (r, 0) => r.getString(2)
      case (r, _) => r.getString(2).split(" ").drop(8).mkString(" ")
    }.mkString(" ")
    assert(stitched == (1 to 100).map(i => s"t$i").mkString(" "))
    // last chunk of doc 0 is the 24..100 tail → 28 tokens at offset 72+1
    assert(byDoc(0L).map(_.getInt(3)).sum == 32 * 3 + 28)
  }

  test("decontaminate external-benchmark overload: disjoint id spaces, content-only match") {
    import spark.implicits._
    // benchmark ids COLLIDE with corpus ids on purpose — only shingle
    // content may link the frames, never the id
    val mkRun = (p: String, n: Int) => (1 to n).map(i => s"$p$i").mkString(" ")
    val leak = mkRun("lk", 8) // the 8-shingle shared with the bench doc
    val corpus = Seq(
      (1L, leak + " " + mkRun("ca", 8)),  // contaminated (1 shared shingle)
      (2L, mkRun("cb", 16)),              // clean
      (3L, leak + " " + leak))            // contaminated, repeats don't double-count...
      .toDF("doc_id", "text")
    val bench = Seq((1L, leak + " " + mkRun("bz", 4)))
      .toDF("doc_id", "text")
    val out = Corpus.decontaminate(corpus, bench, 8).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSet == Set(1L, 3L), s"got ${out.mkString(",")}")
    out.foreach { case (_, _, firstBench) => assert(firstBench == 1L) }
    // the delegate (benchEvery) form equals the overload called on the
    // modulus carve-out — same frame, same answer
    val viaEvery = Corpus.decontaminate(docs, 50, 8)
    val viaOverload = Corpus.decontaminate(
      docs.where(col("doc_id") % 50 =!= 0),
      docs.where(col("doc_id") % 50 === 0), 8)
    assert(viaEvery.exceptAll(viaOverload).count() == 0)
    assert(viaOverload.exceptAll(viaEvery).count() == 0)
    assert(viaEvery.count() > 0)
  }

  test("jaccard split leaks == independently-derived straddling pair set") {
    import graft.llm.Dedup
    // independent derivation: FULL prefix-filtered pair set, then the
    // straddle filter — the delta prune (majority×majority discarded
    // inside the candidate join) must lose nothing
    val splits = Corpus.assignSplits(docs)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val want = Dedup.jaccardPairsPrefix(docs, 3, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => splits(a) != splits(b) }.toSet
    val got = Corpus.crossSplitLeaksJaccard(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
  }

  test("stratified sample is deterministic and respects per-lang rates") {
    val once = Corpus.stratifiedSample(docs, Map("en" -> 0.25, "zh" -> 0.75))
    val again = Corpus.stratifiedSample(docs, Map("en" -> 0.25, "zh" -> 0.75))
    assert(once.exceptAll(again).isEmpty && again.exceptAll(once).isEmpty)
    val kept = once.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // md5-uniform: observed keep rate within ±0.2 of the target
    def rate(l: String) = kept.getOrElse(l, 0L).toDouble / total(l)
    assert(math.abs(rate("en") - 0.25) < 0.2, s"en rate ${rate("en")}")
    assert(rate("de") == 1.0 && rate("fr") == 1.0 && rate("es") == 1.0)
  }

  test("pack stream assigns contiguous windows with in-budget offsets") {
    val out = Corpus.packStream(docs, budget = 256)
    val bad = out.filter(col("pack_offset") < 0 || col("pack_offset") >= 256 ||
      col("n_windows") < 1).count()
    assert(bad == 0)
    // per (lang, shard) stream: total windows spanned == ceil(stream
    // tokens / budget) — pack_id is local to its composite stream
    val perStream = out.groupBy("lang", "shard")
      .agg(sum("n_tok").as("toks"), max(col("pack_id") + col("n_windows"))
        .as("maxw")).collect()
    assert(perStream.length > out.select("lang").distinct().count(),
      "composite key must split languages into multiple streams")
    perStream.foreach { r =>
      val toks = r.getLong(2); val maxw = r.getLong(3)
      assert(maxw == (toks + 255) / 256,
        s"${r.getString(0)}/${r.getInt(1)}: $toks vs $maxw")
    }
  }

  test("composite-key packing == single-stream packing of each shard subset") {
    // window-boundary equivalence per shard: filtering the composite
    // output to one shard is bit-equal to running the legacy
    // single-stream form over just that shard's documents — i.e. the
    // (lang, shard) key only partitions the work, never changes any
    // stream's packing
    val composite = Corpus.packStream(docs, budget = 256, nStreams = 8)
    val withShard = docs.withColumn("shard",
      (Corpus.hash16(col("doc_id"), "ep0") % 8).cast("int"))
    for (sh <- Seq(0, 5)) {
      val single = Corpus.packStream(
        withShard.filter(col("shard") === sh).drop("shard"),
        budget = 256, nStreams = 1)
      val comp = composite.filter(col("shard") === sh).drop("shard")
      assert(comp.exceptAll(single).isEmpty && single.exceptAll(comp).isEmpty,
        s"shard $sh packing mismatch")
    }
  }

  test("pack manifest: full windows sum to budget; docs reassemble exactly") {
    val m = Corpus.packManifest(docs, budget = 256)
    // every window's contributions sum to exactly the budget, except
    // each stream's final (short) window
    val sums = m.groupBy("lang", "shard", "pack_id")
      .agg(sum("len_in_window").as("tot"))
    val lastW = m.groupBy("lang", "shard").agg(max("pack_id").as("last"))
    val bad = sums.join(lastW, Seq("lang", "shard"))
      .where(col("pack_id") =!= col("last") && col("tot") =!= 256).count()
    assert(bad == 0, "a non-final window is not exactly budget tokens")
    // per doc, its window spans reassemble to exactly its token count
    val perDoc = m.groupBy("doc_id").agg(sum("len_in_window").as("tot"))
    val ps = Corpus.packStream(docs, budget = 256).select("doc_id", "n_tok")
    assert(perDoc.join(ps, "doc_id")
      .where(col("tot") =!= col("n_tok")).count() == 0)
    // offsets and lengths inside the window bounds
    assert(m.where(col("start_in_window") < 0 ||
      col("start_in_window") >= 256 || col("len_in_window") < 1 ||
      col("len_in_window") > 256).count() == 0)
    // the legacy single-stream form (no shard column in packStream)
    // still yields a manifest, with the lone stream as shard 0
    val single = Corpus.packManifest(docs, budget = 256, nStreams = 1)
    assert(single.select("shard").distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(0))
  }

  test("source cap keeps exactly min(cap, n) per source, partition-invariant") {
    val a = Corpus.sourceCap(docs, cap = 5)
    val perSource = a.groupBy("source").count().collect()
    val totals = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perSource.foreach { r =>
      assert(r.getLong(1) == math.min(5L, totals(r.getString(0))))
    }
    // the kept SET is a property of the data, not the partitioning —
    // exercises the sketch's merge path across a different layout
    val b = Corpus.sourceCap(docs.repartition(13), cap = 5)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // NULL source is its own capped group (the oracle's PARTITION BY
    // semantics) — a null-unsafe keep-join would silently drop it
    import spark.implicits._
    val withNull = Seq(
      (1L, "s1", "en"), (2L, "s1", "en"), (3L, "s1", "en"),
      (4L, null.asInstanceOf[String], "en"),
      (5L, null.asInstanceOf[String], "en"),
      (6L, null.asInstanceOf[String], "en"))
      .toDF("doc_id", "source", "lang")
    val capped = Corpus.sourceCap(withNull, cap = 2).collect()
    assert(capped.length == 4) // 2 from s1 + 2 from the NULL group
    assert(capped.count(_.isNullAt(1)) == 2)
    // a doc_id beyond ±2^53 can't round-trip through the sketch's
    // double value slot — the guard must fail LOUDLY, not under-cap
    val big = Seq(((1L << 53) + 1L, "s1", "en"), (2L, "s1", "en"))
      .toDF("doc_id", "source", "lang")
    val e = intercept[Exception] {
      Corpus.sourceCap(big, cap = 1).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("2^53")), s"wrong failure: $e")
    // the boundary itself is exact and keeps working
    val edge = Seq((1L << 53, "s1", "en"), (2L, "s1", "en"))
      .toDF("doc_id", "source", "lang")
    assert(Corpus.sourceCap(edge, cap = 2).count() == 2)
  }

  test("mix weights: shares sum to ~1 and weights invert the shares") {
    val rows = Corpus.mixWeights(docs).collect()
    val shareSum = rows.map(_.getFloat(3).toDouble).sum
    assert(math.abs(shareSum - 1.0) < 1e-3)
    rows.foreach { r =>
      val share = r.getFloat(3); val weight = r.getFloat(4)
      assert(math.abs(weight - 0.2 / share) < 0.01f * weight)
    }
  }

  test("decontaminate flags a planted benchmark copy and only that") {
    import spark.implicits._
    val bench = (1 to 20).map(i => s"b$i").mkString(" ")
    val sample = Seq(
      (0L, bench),                                    // benchmark doc (0 % 50 == 0)
      (1L, bench),                                    // full copy → contaminated
      (2L, (1 to 20).map(i => s"c$i").mkString(" ")), // disjoint → clean
      (3L, (9 to 16).map(i => s"b$i").mkString(" "))) // one shared 8-gram window
      .toDF("doc_id", "text")
    val out = Corpus.decontaminate(sample, benchEvery = 50, n = 8)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(out(0).getLong(1) == 13) // 20 tokens → 13 distinct 8-grams
    assert(out(1).getLong(1) == 1 && out(1).getLong(2) == 0L)
  }

  test("decontaminateFrac scores overlap and flags only past the threshold") {
    import spark.implicits._
    val benchText = (1 to 15).map(i => s"b$i").mkString(" ") // 8 8-grams
    val bench = Seq((100L, benchText), (101L, benchText)) // dup bench doc
      .toDF("doc_id", "text")
    val corpus = Seq(
      // verbatim benchmark copy → frac 1.0
      (1L, benchText),
      // 8 shared grams (the benchmark's 15 tokens) + 56 clean tokens
      // appended → 64 grams total, frac = 8/64 = 0.125
      (2L, benchText + " " + (1 to 56).map(i => s"c$i").mkString(" ")),
      // disjoint → frac 0.0, present with a verdict of false
      (3L, (1 to 20).map(i => s"z$i").mkString(" ")),
      // shorter than 8 tokens → no shingle surface, absent from output
      (4L, "x1 x2 x3"))
      .toDF("doc_id", "text")
    val out = Corpus.decontaminateFrac(corpus, bench, 8, minFrac = 0.125)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(byId(1L) == ((8L, 8L, 1.0, true)))
    // duplicate bench doc must not double-count the shared grams
    assert(byId(2L) == ((64L, 8L, 0.125, true))) // >= threshold boundary
    assert(byId(3L) == ((13L, 0L, 0.0, false)))
  }

  test("dsirWeights: target-like docs outrank off-target; exact recompute") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "en", "alpha alpha alpha alpha"),
      (1L, "en", "zebra zebra zebra zebra"),
      (2L, "en", "alpha alpha zebra zebra"),
      (3L, "en", ""), (4L, "en", null))
      .toDF("doc_id", "lang", "text")
    val target = Seq((100L, "xx", "alpha alpha alpha"))
      .toDF("doc_id", "lang", "text")
    val buckets = 64
    val out = Corpus.dsirWeights(corpus, target, buckets).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getFloat(3)))).toMap
    // empty/NULL text rows don't score
    assert(out.keySet == Set(0L, 1L, 2L))
    assert(out.values.forall(_._1 == 4)) // 4 tokens each
    // target is all-alpha: pure-alpha > mixed > pure-zebra
    assert(out(0L)._2 > out(2L)._2 && out(2L)._2 > out(1L)._2)
    // exact recompute with the same md5 bucketing + Laplace smoothing
    def bucket(w: String): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dsir:$w".getBytes("UTF-8"))
      (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % buckets
    }
    val rawCnt = Map(bucket("alpha") -> 0L, bucket("zebra") -> 0L)
      .map { case (b, _) =>
        b -> (Seq.fill(6)(bucket("alpha")) ++ Seq.fill(6)(bucket("zebra")))
          .count(_ == b).toLong }
    def lr(b: Int): Double = {
      val ct = if (b == bucket("alpha")) 3L else 0L
      math.log((ct + 1.0) / (3 + buckets)) -
        math.log((rawCnt.getOrElse(b, 0L) + 1.0) / (12 + buckets))
    }
    val expect0 = BigDecimal(4 * lr(bucket("alpha")))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toFloat
    assert(math.abs(out(0L)._2 - expect0) < 2e-4f,
      s"got ${out(0L)._2}, want $expect0")
  }

  test("tempered materialization: emitted mass tracks weight × n_docs") {
    val wts = Corpus.mixWeightsTemperature(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getFloat(5)))).toMap
    val copies = Corpus
      .materializeMix(docs, Corpus.mixWeightsTemperature(docs), "mix")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // each doc emits floor(w) + Bernoulli(residual) copies → per-lang
    // expectation is weight × n_docs; the md5-uniform draw stays
    // within a loose concentration band on the fixture
    wts.foreach { case (lang, (n, w)) =>
      val expect = w.toDouble * n
      val got = copies.getOrElse(lang, 0L).toDouble
      assert(math.abs(got - expect) <= 0.15 * expect + 5,
        s"$lang: emitted $got vs expected $expect")
    }
  }

  test("snapshotManifest: drift localizes to one shard; order-invariant") {
    import spark.implicits._
    def manifest(f: org.apache.spark.sql.DataFrame) =
      Corpus.snapshotManifest(f).collect()
        .map(r => (r.getString(0), r.getInt(1)) ->
          ((r.getInt(2), r.getLong(3), r.getLong(4)))).toMap
    val base = manifest(docs)
    // row order / partitioning cannot move any hash
    assert(manifest(docs.orderBy(col("text"))) == base)
    assert(manifest(docs.repartition(7)) == base)
    // editing ONE doc's text changes exactly its shard's hash, token
    // count tracked, doc counts untouched
    val someId = docs.select("doc_id").head().getLong(0)
    val edited = docs.withColumn("text",
      when(col("doc_id") === someId,
        concat(col("text"), lit(" tampered"))).otherwise(col("text")))
    val after = manifest(edited)
    val moved = base.keySet.filter(k => base(k) != after(k))
    assert(moved.size == 1)
    val k = moved.head
    assert(base(k)._1 == after(k)._1)           // n_docs unchanged
    assert(after(k)._2 == base(k)._2 + 1)       // one token added
    assert(base(k)._3 != after(k)._3)           // hash moved
  }

  test("manifestDiff: empty on equal snapshots; edit → one changed " +
    "cell; lang removal → removed rows") {
    val m = Corpus.snapshotManifest(docs)
    // identical snapshots certify equality: empty diff
    assert(Corpus.manifestDiff(m, Corpus.snapshotManifest(docs))
      .collect().isEmpty)
    // one edited doc → exactly one 'changed' cell, counts carried
    val someId = docs.select("doc_id").head().getLong(0)
    val edited = docs.withColumn("text",
      when(col("doc_id") === someId,
        concat(col("text"), lit(" tampered"))).otherwise(col("text")))
    val d = Corpus.manifestDiff(m, Corpus.snapshotManifest(edited))
      .collect()
    assert(d.length == 1 && d.head.getString(2) == "changed")
    assert(d.head.getLong(5) + 1 == d.head.getLong(6)) // one token added
    // dropping a whole language → its cells read 'removed'
    val lang = docs.select("lang").head().getString(0)
    val dropped = docs.where(col("lang") =!= lang)
    val d2 = Corpus.manifestDiff(m, Corpus.snapshotManifest(dropped))
      .collect()
    assert(d2.nonEmpty && d2.forall(r =>
      r.getString(0) == lang && r.getString(2) == "removed"))
  }

  test("packStats: exact window count, tail-only padding, no pack run") {
    import spark.implicits._
    // one lang, nStreams=1 → one stream; 10+20+250 = 280 tokens at
    // budget 256 → 2 windows, 232 pad tokens, util 280/512
    val in = Seq(
      (0L, "en", (1 to 10).map(i => s"a$i").mkString(" ")),
      (1L, "en", (1 to 20).map(i => s"b$i").mkString(" ")),
      (2L, "en", (1 to 250).map(i => s"c$i").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val r = Corpus.packStats(in, budget = 256, nStreams = 1).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "en" && row.getInt(1) == 0)
    assert(row.getInt(2) == 3 && row.getLong(3) == 280L)
    assert(row.getLong(4) == 2L && row.getLong(5) == 2L * 256 - 280)
    assert(row.getFloat(6) == BigDecimal(280.0 / 512)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toFloat)
    // agreement with an actual packStream run: windows per stream =
    // max pack window index + 1
    val packed = Corpus.packStream(in, budget = 256, nStreams = 1)
      .select(col("pack_id") + col("n_windows")).collect()
      .map(_.getLong(0)).max
    assert(packed == 2L)
  }

  test("curriculumOrder: tercile phases ordered by quality, stable keys") {
    import spark.implicits._
    // stopword-free docs of lengths 1..30 → quality = len/100, all
    // distinct; k=200 > 30 so the sample is the population and the
    // terciles are exact: thr_1 = sorted[11] = 0.11? no — floor rule:
    // idx1 = floor(29/3)+1 = 10 → 0.10, idx2 = floor(58/3)+1 = 20 → 0.20
    val in = (1 to 30).map(i =>
      (i.toLong, "en", (1 to i).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val out = Corpus.curriculumOrder(in).collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getInt(3), r.getInt(4)))).toMap
    assert(out.size == 30)
    val byPhase = out.values.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(byPhase.keySet == Set(0, 1, 2))
    assert(byPhase(0).size == 9 && byPhase(1).size == 10 &&
      byPhase(2).size == 11)
    // phases are quality-monotone: every phase-p doc outranks every
    // phase-(p-1) doc
    assert(byPhase(0).max < byPhase(1).min)
    assert(byPhase(1).max < byPhase(2).min)
    // order keys are 16-bit and deterministic across runs
    assert(out.values.forall { case (_, _, k) => k >= 0 && k < 65536 })
    val again = Corpus.curriculumOrder(in).collect()
      .map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(out.forall { case (id, (_, _, k)) => again(id) == k })
  }
}
