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
  * differs inside the leading band escapes — the q119 family closes
  * that with 4 bands; an admission gate keeps ONE bucket so each doc
  * has exactly one admission authority and the greedy rule stays
  * well-defined).
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
}
