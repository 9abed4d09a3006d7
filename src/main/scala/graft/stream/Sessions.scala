package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-rule sessionization — the ONLINE form of the q18
  * session family (same rule: a gap > `gapSeconds` between a user's
  * consecutive events starts a new session): per-user state in the
  * checkpointed state store via `flatMapGroupsWithState`, sessions
  * emitted the moment they CLOSE — either a same-user event arrives
  * past the gap (emit the finished session, open the next) or the
  * event-time timeout fires (the watermark passed last_event + gap,
  * so no in-order event can extend the session again).
  *
  * The SAME function run on a batch frame emits exactly the
  * GAP-CLOSED sessions (every session followed by another from the
  * same user): in batch execution the group function runs once per
  * user with no timeouts, so each user's trailing session stays
  * un-emitted — precisely the open session a live stream would still
  * be holding in state. That batch form is oracle-gated (gap-rule
  * sessions minus each user's last); the timeout path that closes
  * trailing sessions is pinned by SessionsSpec's MemoryStream
  * lifecycle.
  *
  * Within a micro-batch (or batch group) events fold in
  * (ts, event_id) order, so boundaries are deterministic; ACROSS
  * micro-batches the watermark bounds disorder exactly as in the
  * windowed-aggregate family.
  *
  * Scale shape: one exchange on user_id; state is one (start, last,
  * n) triple per user with an open session — bounded by active users,
  * evicted by the timeout; per micro-batch work is O(new events).
  */
object Sessions {

  final case class Ev(uid: Long, tsS: Long, eid: Long)
  final case class SessState(start: Long, last: Long, n: Long)
  final case class SessionOut(user_id: Long, session_start: Long,
      session_end: Long, n_events: Long)

  /** Fold a user's in-batch events (sorted by (ts, event_id)) through
    * the gap rule from an optional open session; returns the sessions
    * CLOSED by this batch and the still-open tail.
    */
  def foldEvents(uid: Long, open: Option[SessState],
      evs: Seq[Ev], gapSeconds: Long):
      (Seq[SessionOut], Option[SessState]) = {
    var cur = open
    val closed = Seq.newBuilder[SessionOut]
    evs.foreach { e =>
      cur match {
        case Some(s) if e.tsS - s.last > gapSeconds =>
          closed += SessionOut(uid, s.start, s.last, s.n)
          cur = Some(SessState(e.tsS, e.tsS, 1L))
        case Some(s) =>
          // min on start too: an in-watermark but out-of-order event
          // that predates the open session's first event must fold in
          // order-independently, or the emitted session_start would
          // depend on micro-batch boundaries (r14 advice).
          cur = Some(SessState(math.min(s.start, e.tsS),
            math.max(s.last, e.tsS), s.n + 1))
        case None =>
          cur = Some(SessState(e.tsS, e.tsS, 1L))
      }
    }
    (closed.result(), cur)
  }

  /** Streaming (and batch-parity) sessionization over a frame with
    * (ts: timestamp, user_id, event_id).
    */
  def gapSessions(events: DataFrame, gapSeconds: Long = 21600L,
      lateness: String = "30 minutes"): Dataset[SessionOut] = {
    val s = events.sparkSession
    import s.implicits._
    // captured as a primitive: the closure must not drag the frame in
    val streaming = events.isStreaming
    val withWm =
      if (streaming) events.withWatermark("ts", lateness)
      else events
    // the watermarked `ts` column must SURVIVE into the stateful
    // operator's input (the event-time-timeout checker resolves the
    // watermark off the child's output attributes)
    withWm.where(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("ts"), col("user_id").cast("long").as("uid"),
        col("ts").cast("long").as("tsS"),
        col("event_id").cast("long").as("eid"))
      .as[(java.sql.Timestamp, Long, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long,
            rows: Iterator[(java.sql.Timestamp, Long, Long, Long)],
            state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator(SessionOut(uid, st.start, st.last, st.n))
          } else {
            val evs = rows.map(r => Ev(r._2, r._3, r._4)).toSeq
              .sortBy(e => (e.tsS, e.eid))
            val (closed, open) =
              foldEvents(uid, state.getOption, evs, gapSeconds)
            open match {
              case Some(st) =>
                state.update(st)
                // close when the watermark passes last + gap: no
                // in-order event can extend this session anymore.
                // Batch execution has no timeouts, so the trailing
                // session stays open — the oracle-gated contract.
                if (streaming)
                  state.setTimeoutTimestamp((st.last + gapSeconds) * 1000L)
              case None => state.remove()
            }
            closed.iterator
          }
      }
  }
}
