package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-key alert throttling (cooldown suppression) — the ops-plane
  * "don't page me 400 times for one incident" operator: a keyed
  * event passes only when at least `cooldownS` seconds of event time
  * separate it from the key's last EMITTED event (greedy rule: the
  * first event always passes, suppressed events do NOT reset the
  * clock).
  *
  * The streaming form is this engine's first
  * `transformWithState` user — Spark 4's arbitrary-state API
  * superseding `flatMapGroupsWithState`: per-key `ValueState[Long]`
  * (last emitted event time) in the state store, RocksDB-backed (the
  * only provider TWS supports), updated once per key per
  * micro-batch. The batch form runs the SAME greedy kernel per key
  * via `flatMapGroups` and is the oracle-gated member (the
  * HeavyHitters/Sessions pattern); streaming == batch on in-order
  * data is pinned by ThrottleSpec across micro-batches.
  *
  * Scale shape: one exchange on the key; state is ONE long per key
  * that has ever alerted (TTL-able via TTLConfig where retention
  * policy wants it); per micro-batch work is O(new events); output
  * pressure is O(passed alerts), which is the operator's point.
  */
object Throttle {

  final case class Alert(uid: Long, tsS: Long, eid: Long)
  final case class Passed(user_id: Long, ts_s: Long, event_id: Long)

  /** Greedy cooldown fold over a key's in-batch events (sorted by
    * (ts, event_id)) from an optional prior last-emit; returns the
    * passed alerts and the new last-emit.
    */
  def foldCooldown(evs: Seq[Alert], prior: Option[Long],
      cooldownS: Long): (Seq[Passed], Option[Long]) = {
    var last = prior
    val out = Seq.newBuilder[Passed]
    evs.foreach { e =>
      if (last.forall(l => e.tsS >= l + cooldownS)) {
        out += Passed(e.uid, e.tsS, e.eid)
        last = Some(e.tsS)
      }
    }
    (out.result(), last)
  }

  /** The TWS stateful processor: ValueState = last emitted ts. */
  final class CooldownProcessor(cooldownS: Long)
      extends StatefulProcessor[Long, Alert, Passed] {
    @transient private var lastEmit: ValueState[Long] = _

    override def init(outputMode: OutputMode,
        timeMode: TimeMode): Unit =
      lastEmit = getHandle.getValueState[Long]("lastEmit",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Alert],
        timerValues: TimerValues): Iterator[Passed] = {
      val evs = rows.toSeq.sortBy(e => (e.tsS, e.eid))
      val prior = if (lastEmit.exists()) Some(lastEmit.get()) else None
      val (passed, last) = foldCooldown(evs, prior, cooldownS)
      last.foreach(lastEmit.update)
      passed.iterator
    }
  }

  /** Streaming form over (ts: timestamp, user_id, event_id). The
    * session must run a RocksDB state store
    * (`spark.sql.streaming.stateStore.providerClass`) — the only
    * provider `transformWithState` supports.
    */
  def throttled(events: DataFrame,
      cooldownS: Long = 3600L): Dataset[Passed] = {
    val s = events.sparkSession
    import s.implicits._
    events.where(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id").cast("long").as("uid"),
        col("ts").cast("long").as("tsS"),
        col("event_id").cast("long").as("eid"))
      .as[Alert]
      .groupByKey(_.uid)
      .transformWithState(new CooldownProcessor(cooldownS),
        TimeMode.None(), OutputMode.Append())
  }

  /** Batch-parity form: the same greedy kernel per key — the
    * oracle-gated member (greedy recursion unrolled per user by the
    * oracle's recursive CTE).
    */
  def throttledBatch(events: DataFrame,
      cooldownS: Long = 3600L): Dataset[Passed] = {
    val s = events.sparkSession
    import s.implicits._
    events.where(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id").cast("long").as("uid"),
        col("ts").cast("long").as("tsS"),
        col("event_id").cast("long").as("eid"))
      .as[Alert]
      .groupByKey(_.uid)
      .flatMapGroups { (_: Long, rows: Iterator[Alert]) =>
        val evs = rows.toSeq.sortBy(e => (e.tsS, e.eid))
        foldCooldown(evs, None, cooldownS)._1.iterator
      }
  }
}
