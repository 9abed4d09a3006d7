package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters: per event-time window, the keys whose
  * frequency crosses an absolute threshold — the FREQUENCY alarm
  * beside [[DriftMonitor]]'s distribution alarm, completing the
  * streaming sketch pair real ingest pipelines run (frequency +
  * membership) whose batch members are q132's count-min frame and the
  * bloom join-pruning family.
  *
  * Two implementations share one output contract
  * (window_start, key, est, err, guaranteed, n_window):
  *
  *  - [[exactBatch]] — the scalable exact form: one (window, key)
  *    hash aggregate (partially aggregated map-side), window totals
  *    re-aggregated from the COUNT frame (never a second fact scan)
  *    and attached by broadcast. This is the form the DuckDB oracle
  *    gates; `err` is 0 and `guaranteed` true by construction.
  *  - [[windowed]] — the streaming form: a SpaceSaving summary
  *    (Metwally, Agrawal & El Abbadi 2005) of AT MOST `m` counters
  *    per open window in the checkpointed state store
  *    (`flatMapGroupsWithState` keyed by window start), emitted ONCE
  *    per window when the event-time timeout fires — the first
  *    event-time-timeout one-shot emission in this engine; the
  *    windowed-aggregate family ([[DriftMonitor]], [[Windowed]])
  *    gets the same once-per-window contract from append-mode
  *    watermark semantics instead.
  *
  * SpaceSaving contract (spec-pinned, order-INDEPENDENT statements):
  * for every key, `est` ≥ true count and `est − err` ≤ true count;
  * any key with true count > n/m is retained. When a window's
  * distinct-key count stays ≤ m the summary degenerates to an exact
  * count map — insertion becomes a commutative increment — so the
  * output is run-order independent and IDENTICAL to [[exactBatch]]
  * (the regime the oracle-gated queries run in; above m the summary
  * keeps the ε-guarantee but its boundary counters are fold-order
  * dependent, which no cross-engine hash gate can pin).
  *
  * The 100 TB story: exact per-(window, key) counting shuffles every
  * distinct key — correct and scalable while key cardinality is
  * bounded (event types, symbols), the wrong state shape for
  * unbounded keys (URLs, user ids). The SpaceSaving state is O(m)
  * per open window REGARDLESS of cardinality, and the emission is
  * proportional to hitters, not keys — the standing-memory bound a
  * long-running stream needs.
  */
object HeavyHitters {

  /** A windowed keyed observation (ws = window start, epoch s). */
  final case class KeyedRow(ws: Long, key: String)

  /** SpaceSaving summary: per retained key the over-estimate count
    * and its error bound, plus the EXACT total row count `n` of the
    * window (a plain increment, unaffected by eviction).
    */
  final case class SSState(counts: Map[String, Long],
      errs: Map[String, Long], n: Long)

  final case class HH(window_start: Long, key: String, est: Long,
      err: Long, guaranteed: Boolean, n_window: Long)

  val emptyState: SSState = SSState(Map.empty, Map.empty, 0L)

  /** One SpaceSaving insert: known keys increment; new keys take a
    * free slot below capacity, else REPLACE the (count, key)-minimal
    * counter inheriting its count as the error bound (the classic
    * replace-min rule; the key tiebreak makes eviction a total
    * order, so a single-threaded fold is reproducible).
    */
  def insert(st: SSState, key: String, m: Int): SSState = {
    val n = st.n + 1
    st.counts.get(key) match {
      case Some(c) =>
        st.copy(counts = st.counts.updated(key, c + 1), n = n)
      case None if st.counts.size < m =>
        SSState(st.counts.updated(key, 1L),
          st.errs.updated(key, 0L), n)
      case None =>
        val (mk, mc) = st.counts.minBy { case (k, c) => (c, k) }
        SSState(st.counts - mk + (key -> (mc + 1L)),
          st.errs - mk + (key -> mc), n)
    }
  }

  def fold(st: SSState, keys: Iterator[String], m: Int): SSState =
    keys.foldLeft(st)((s, k) => insert(s, k, m))

  /** Emit the summary's rows at or above `minCount` (SpaceSaving
    * estimates never under-count, so no qualifying key is missed);
    * `guaranteed` = the LOWER bound also clears the threshold.
    */
  def emit(ws: Long, st: SSState, minCount: Long): Iterator[HH] =
    st.counts.iterator.collect { case (k, c) if c >= minCount =>
      val e = st.errs.getOrElse(k, 0L)
      HH(ws, k, c, e, c - e >= minCount, st.n)
    }

  /** Window start as EXACT integer arithmetic (epoch − epoch mod
    * len) — no double division anywhere near the bucketing rule. */
  private def wsOf(ts: org.apache.spark.sql.Column,
      windowLenS: Long): org.apache.spark.sql.Column = {
    val tsL = ts.cast("long")
    tsL - pmod(tsL, lit(windowLenS))
  }

  private def windowedKeys(events: DataFrame, keyCol: String,
      windowLenS: Long): DataFrame =
    events.where(col(keyCol).isNotNull)
      .select(wsOf(col("ts"), windowLenS).as("ws"),
        col(keyCol).cast("string").as("key"))

  /** Exact scalable batch form — the oracle-gated member. One
    * (ws, key) hash aggregate over the fact rows; window totals come
    * from re-aggregating the count frame (≤ distinct keys rows, never
    * a second fact scan) and attach by broadcast.
    */
  def exactBatch(events: DataFrame, keyCol: String, minCount: Long,
      windowLenS: Long = 3600L): DataFrame = {
    val c = windowedKeys(events, keyCol, windowLenS)
      .groupBy(col("ws"), col("key"))
      .agg(count(lit(1)).as("est"))
    val tot = c.groupBy(col("ws")).agg(sum(col("est")).as("n_window"))
    c.where(col("est") >= minCount)
      .join(broadcast(tot), "ws")
      .select(col("ws").as("window_start"), col("key"), col("est"),
        lit(0L).as("err"), lit(true).as("guaranteed"), col("n_window"))
  }

  /** The SpaceSaving fold as a BATCH query — q133's identical-answer
    * contract against [[exactBatch]]: with `m` at or above the
    * window's distinct-key count the summary is an exact count map,
    * so this shares the exact form's oracle verbatim while running
    * the real streaming kernel ([[insert]]/[[fold]]/[[emit]]) under
    * the hash gate. Each window folds in one task — the streaming
    * state shape, not the batch scale shape; use [[exactBatch]] for
    * batch jobs.
    */
  def spaceSavingBatch(events: DataFrame, keyCol: String, m: Int,
      minCount: Long, windowLenS: Long = 3600L,
      requireExact: Boolean = false): Dataset[HH] = {
    val s = events.sparkSession
    import s.implicits._
    windowedKeys(events, keyCol, windowLenS).as[KeyedRow]
      .groupByKey(_.ws)
      .flatMapGroups { (ws: Long, rows: Iterator[KeyedRow]) =>
        val st = fold(emptyState, rows.map(_.key), m)
        // exact regime ⟺ no eviction ever fired ⟺ every error bound
        // is 0. The identical-answer contract vs [[exactBatch]] (the
        // shared-oracle queries) holds ONLY here; `requireExact`
        // enforces the precondition loudly instead of letting a
        // grown fixture silently diverge at the gate (r14 advice).
        if (requireExact && st.errs.valuesIterator.exists(_ != 0L))
          throw new IllegalStateException(
            s"SpaceSaving window $ws exceeded m=$m distinct keys — " +
              "exact-regime (shared-oracle) contract violated")
        emit(ws, st, minCount)
      }
  }

  /** Streaming form: per open window one SpaceSaving summary in the
    * state store, emitted exactly once when the event-time timeout
    * fires (the watermark passes the window end — late rows inside
    * `lateness` still fold in; later ones hit a removed group and
    * restart a state that can never emit, because its timeout is
    * already in the watermark's past).
    *
    * @param events streaming frame with (ts: timestamp, `keyCol`)
    */
  def windowed(events: DataFrame, keyCol: String, m: Int,
      minCount: Long, windowLenS: Long = 3600L,
      lateness: String = "30 minutes"): Dataset[HH] = {
    val s = events.sparkSession
    import s.implicits._
    events.where(col(keyCol).isNotNull)
      .withWatermark("ts", lateness)
      .select(col("ts"), wsOf(col("ts"), windowLenS).as("ws"),
        col(keyCol).cast("string").as("key"))
      .as[(java.sql.Timestamp, Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[SSState, HH](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (ws: Long, rows: Iterator[(java.sql.Timestamp, Long, String)],
            state: GroupState[SSState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            emit(ws, st, minCount)
          } else {
            val st = fold(state.getOption.getOrElse(emptyState),
              rows.map(_._3), m)
            state.update(st)
            // fires when the WATERMARK (event time − lateness)
            // passes the window end — i.e. at window end + lateness
            // in event time, matching windowed-aggregate semantics
            state.setTimeoutTimestamp((ws + windowLenS) * 1000L)
            Iterator.empty
          }
      }
  }
}
