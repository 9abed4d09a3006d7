package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** STREAMING ANN ADMISSION — the day-2 dedup family's online twin
  * (r14 verdict #6): batch day-2 admission (q108/q131/q138) dedups a
  * new batch against the standing corpus once a day; real ingest
  * admits documents the moment they arrive. Here the standing corpus
  * lives as LSH-bucketed keyed state: each document fingerprints to a
  * 64-bit SimHash ([[graft.llm.Dedup.simhash]] — the q118 kernel),
  * keys by its leading 16-bit band (the q119 band-0 bucket), and is
  * ADMITTED iff no previously-admitted fingerprint in its bucket sits
  * within Hamming `maxHamming`; admitted fingerprints join the
  * bucket's standing state, rejected ones vanish — so state grows
  * with the DEDUPLICATED corpus, not the stream.
  *
  * Semantics are GREEDY over admitted-only state (the throttle
  * family's shape, not q120's all-earlier pair shape): a doc within
  * range of a REJECTED doc but not of any admitted one is admitted.
  * Folding is deterministic: within a micro-batch (or batch group)
  * docs fold in doc_id order; across micro-batches arrival order
  * governs, exactly like every keyed-state operator here.
  *
  * Bucketing is the LSH approximation, stated honestly: only
  * SAME-BUCKET near-dups are rejected (a pair within Hamming 3 that
  * differs inside the leading band escapes — the MULTI-BAND family
  * below closes that by pigeonhole with 4 bands and a doc-keyed
  * arbiter; this single-band form keeps ONE bucket so each doc has
  * exactly one admission authority and the plain greedy rule applies
  * unmodified).
  *
  * The streaming form is the engine's second `transformWithState`
  * user: per-bucket `ListState[Long]` of admitted fingerprints,
  * RocksDB-backed, with optional TTL (`ttlMs`) for retention-policy
  * eviction — an expired fingerprint silently re-opens its slot, the
  * standing-corpus-ages-out contract. The batch form runs the SAME
  * greedy kernel per bucket via `flatMapGroups` and is the
  * oracle-gated member (the HeavyHitters/Sessions/Throttle pattern) —
  * its oracle unrolls the greedy recursion per bucket as a recursive
  * CTE carrying the admitted list, Hamming via bit_count(xor) on BIT
  * strings.
  *
  * Scale shape: fingerprinting is a zero-shuffle map; the only
  * exchange is the bucket key (2¹⁶ buckets per band — salt the band
  * choice per corpus if a bucket ever hotspots); state is one long
  * per ADMITTED doc, bounded by the deduplicated corpus and TTL;
  * per micro-batch work is O(batch × bucket-occupancy).
  */
object AnnAdmission {

  final case class Cand(bucket: String, docId: Long, fpl: Long)
  final case class Admit(doc_id: Long, bucket: String, admitted: Boolean)

  /** Greedy fold of a bucket's docs (sorted by doc_id) against the
    * standing admitted fingerprints; returns the decisions and the
    * fingerprints newly admitted by this batch.
    */
  def foldAdmit(evs: Seq[Cand], standing: Seq[Long],
      maxHamming: Int): (Seq[Admit], Seq[Long]) = {
    var adm = standing.toList
    val newly = Seq.newBuilder[Long]
    val out = Seq.newBuilder[Admit]
    evs.foreach { e =>
      val dup = adm.exists(s =>
        java.lang.Long.bitCount(s ^ e.fpl) <= maxHamming)
      out += Admit(e.docId, e.bucket, !dup)
      if (!dup) { adm = e.fpl :: adm; newly += e.fpl }
    }
    (out.result(), newly.result())
  }

  /** (bucket, doc_id, fpl) candidates from a (doc_id, text) frame:
    * 64-bit SimHash (map-only native kernel), leading 16-bit band as
    * the bucket, fingerprint packed to a signed long for the
    * bit_count(xor) verify.
    */
  def candidates(docs: DataFrame): DataFrame =
    graft.llm.Dedup.simhash(docs, graft.llm.Dedup.simhashBits64)
      .select(substring(col("simhash"), 1, 16).as("bucket"),
        col("doc_id").cast("long").as("docId"),
        conv(col("simhash"), 2, -10).cast("long").as("fpl"))

  /** The TWS stateful processor: ListState = admitted fingerprints. */
  final class AdmitProcessor(maxHamming: Int, ttlMs: Long)
      extends StatefulProcessor[String, Cand, Admit] {
    @transient private var standing: ListState[Long] = _

    override def init(outputMode: OutputMode,
        timeMode: TimeMode): Unit =
      standing = getHandle.getListState[Long]("standing",
        Encoders.scalaLong,
        if (ttlMs > 0) new TTLConfig(java.time.Duration.ofMillis(ttlMs))
        else TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Cand],
        timerValues: TimerValues): Iterator[Admit] = {
      val evs = rows.toSeq.sortBy(_.docId)
      val prior = standing.get().toSeq
      val (decisions, newly) = foldAdmit(evs, prior, maxHamming)
      newly.foreach(standing.appendValue)
      decisions.iterator
    }
  }

  /** Streaming form over (doc_id, text). Needs a RocksDB state store
    * (the only provider `transformWithState` supports). `ttlMs > 0`
    * ages admitted fingerprints out of the standing state
    * (processing-time TTL — the retention-policy eviction knob).
    *
    * NB: with TTL on, the query runs under TimeMode.ProcessingTime,
    * where Spark schedules micro-batches CONTINUOUSLY under the
    * default trigger — deploy it with a processing-time trigger
    * (`.trigger(Trigger.ProcessingTime(...))`) sized to the ingest
    * cadence; `processAllAvailable()` never returns in this mode.
    */
  def admitted(docs: DataFrame, maxHamming: Int = 3,
      ttlMs: Long = 0L): Dataset[Admit] = {
    val s = docs.sparkSession
    import s.implicits._
    candidates(docs).as[Cand]
      .groupByKey(_.bucket)
      .transformWithState(new AdmitProcessor(maxHamming, ttlMs),
        if (ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  /** Batch-parity form: the same greedy kernel per bucket from empty
    * state — the oracle-gated member (greedy recursion unrolled per
    * bucket by the oracle's recursive CTE over the admitted list).
    */
  def admittedBatch(docs: DataFrame, maxHamming: Int = 3): Dataset[Admit] = {
    val s = docs.sparkSession
    import s.implicits._
    candidates(docs).as[Cand]
      .groupByKey(_.bucket)
      .flatMapGroups { (_: String, rows: Iterator[Cand]) =>
        foldAdmit(rows.toSeq.sortBy(_.docId), Nil, maxHamming)._1.iterator
      }
  }

  // ---- MULTI-BAND admission (r15 verdict #4) ---------------------
  //
  // The single-band form above honestly documents its miss: a pair
  // within Hamming `maxHamming` that differs inside the leading band
  // lands in different buckets and escapes. The q119 4-band contract
  // closes it by PIGEONHOLE: with maxHamming < bandCount, any pair
  // within range agrees on at least one full band — so candidate
  // coverage is COMPLETE. Two stages keep the greedy rule
  // well-defined with one admission authority per doc:
  //
  //  stage 1 — each (band, 16-bit value) bucket folds its docs in
  //    doc_id order against BUCKET-LOCAL admitted state (the exact
  //    [[foldAdmit]] kernel; a doc joins the bucket's state iff the
  //    bucket's own greedy admits it);
  //  stage 2 — a doc-keyed arbiter admits iff NO band found an
  //    admitted neighbor (AND over the 4 flags).
  //
  // Invariant (why this is safe): two arbiter-admitted docs can never
  // sit within Hamming maxHamming. If they did, they'd share a band
  // value; the earlier doc carried every band flag true, hence
  // entered THAT bucket's state, hence the later doc's fold saw it
  // and flagged false — contradiction. The trade, stated honestly:
  // bucket-local state is a SUPERSET of the arbiter-admitted set, so
  // a doc can be rejected for proximity to a band-admitted-but-
  // arbiter-rejected doc — the admitted set is independent and
  // deterministic but not maximal (the greedy-LSH family's standard
  // trade).
  //
  // Scale shape: one exchange keyed by (band, value) — 4× the rows of
  // the single-band form, 2¹⁸ buckets — plus one doc-keyed 4-row
  // aggregation (map-side combinable); state unchanged per bucket.

  /** (docId, fpl) fingerprint frame — the 64-bit SimHash map shared
    * by both admission families. */
  def fingerprints(docs: DataFrame): DataFrame =
    graft.llm.Dedup.simhash(docs, graft.llm.Dedup.simhashBits64)
      .select(col("doc_id").cast("long").as("docId"),
        conv(col("simhash"), 2, -10).cast("long").as("fpl"))

  /** Per-band candidates from a (docId, fpl) frame: `bandCount` rows
    * per doc keyed "band:sliceValue" (the numeric 16-bit slice — the
    * key never leaves the engine, so its rendering is free; only the
    * GROUPING must match the oracle's substring buckets, which it
    * does bit for bit).
    */
  def bandCandidates(fp: DataFrame, bandCount: Int = 4): DataFrame = {
    require(64 % bandCount == 0, s"bandCount $bandCount must divide 64")
    val width = 64 / bandCount
    val mask = (1L << width) - 1
    fp.select(explode(array((0 until bandCount).map { b =>
        struct(
          concat(lit(s"$b:"),
            shiftright(col("fpl"), (bandCount - 1 - b) * width)
              .bitwiseAND(lit(mask)).cast("string")).as("bucket"),
          col("docId"), col("fpl"))
      }: _*)).as("e"))
      .select(col("e.bucket").as("bucket"), col("e.docId").as("docId"),
        col("e.fpl").as("fpl"))
  }

  /** Stage-1 flags, batch form: the [[foldAdmit]] kernel per
    * (band, value) bucket from empty state. */
  def bandFlagsBatch(fp: DataFrame, maxHamming: Int = 3,
      bandCount: Int = 4): Dataset[Admit] = {
    require(maxHamming < bandCount,
      s"pigeonhole completeness needs maxHamming < $bandCount")
    val s = fp.sparkSession
    import s.implicits._
    bandCandidates(fp, bandCount).as[Cand]
      .groupByKey(_.bucket)
      .flatMapGroups { (_: String, rows: Iterator[Cand]) =>
        foldAdmit(rows.toSeq.sortBy(_.docId), Nil, maxHamming)._1.iterator
      }
  }

  /** Stage-2 arbiter: one admission authority per doc — admitted iff
    * every band's greedy found no admitted neighbor. */
  def arbiter(flags: DataFrame): DataFrame =
    flags.groupBy(col("doc_id"))
      .agg(sum(when(col("admitted"), 1).otherwise(0)).cast("int")
          .as("n_bands_ok"),
        min(col("admitted")).as("admitted"))

  /** Batch multi-band admission over (doc_id, text) — the oracle-gated
    * member: (doc_id, n_bands_ok, admitted). */
  def admittedBatchBands(docs: DataFrame, maxHamming: Int = 3,
      bandCount: Int = 4): DataFrame =
    arbiter(bandFlagsBatch(fingerprints(docs), maxHamming, bandCount)
      .toDF())

  /** Streaming stage-1 flags: the [[AdmitProcessor]] per (band, value)
    * bucket — RocksDB ListState per bucket, optional TTL, exactly the
    * single-band form's state machine over 4× the keys. The stage-2
    * arbiter composes downstream per micro-batch (all 4 flags of a doc
    * are emitted in the doc's own micro-batch, so a per-batch
    * [[arbiter]] over the flag frame — e.g. inside foreachBatch — is
    * complete; the spec exercises exactly that composition).
    */
  def bandFlags(docs: DataFrame, maxHamming: Int = 3,
      bandCount: Int = 4, ttlMs: Long = 0L): Dataset[Admit] = {
    require(maxHamming < bandCount,
      s"pigeonhole completeness needs maxHamming < $bandCount")
    val s = docs.sparkSession
    import s.implicits._
    bandCandidates(fingerprints(docs), bandCount).as[Cand]
      .groupByKey(_.bucket)
      .transformWithState(new AdmitProcessor(maxHamming, ttlMs),
        if (ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }
}
