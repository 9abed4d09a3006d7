package graft.stream

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming windowed CARDINALITY counter — the DAU/WAU operator: per
  * event-time window, the approximate distinct count of a key, with
  * state bounded at O(m = 256 registers) per open window REGARDLESS
  * of cardinality (exact streaming distinct retains every key ever
  * seen — the state shape that cannot run for months). Completes the
  * bounded-state streaming trio beside [[HeavyHitters]] (frequency)
  * and [[DriftMonitor]] (distribution).
  *
  * The sketch is the engine's deterministic HLL
  * ([[graft.functions.HllFrame]] — md5 registers, exact-integer
  * harmonic denominator, no libm ln): per-row (register, rank) are
  * the SAME expressions the batch frame op uses, the state fold is
  * register-wise MAX — commutative and associative, so unlike
  * SpaceSaving there is NO exact-regime caveat: any fold order, any
  * partitioning, any micro-batch boundaries produce the identical
  * register map, and the full hash gate applies to the batch-parity
  * form with no precondition.
  *
  * Two forms, one output contract (window_start, n_registers, est):
  *  - [[exactBatch]] — the kernel fold per window via
  *    `flatMapGroups`, the oracle-gated member; its output equals
  *    HllFrame.registers + estimate over the same windows by the max
  *    merge property.
  *  - [[windowed]] — the streaming form: one register map per open
  *    window in the state store (`flatMapGroupsWithState` keyed by
  *    window start), emitted ONCE when the event-time timeout fires
  *    (the [[HeavyHitters.windowed]] one-shot pattern; late rows
  *    inside the watermark still fold in).
  *
  * The estimate itself is computed DOWNSTREAM of the state fold by
  * the shared fixed-IEEE projection ([[graft.functions.HllFrame.estCol]])
  * — the kernel emits only exact integers (n_registers, s_present),
  * so no float arithmetic ever runs inside state code.
  */
object DistinctCounter {

  /** A windowed register observation. */
  final case class Reg(ws: Long, reg: Int, rank: Int)

  /** Kernel output: exact-integer sketch summary of one window. */
  final case class WindowCard(window_start: Long, n_registers: Int,
      s_present: Long)

  /** Register-wise max fold — commutative/associative, so fold order
    * can never move a register. */
  def fold(st: Map[Int, Int], rows: Iterator[(Int, Int)]): Map[Int, Int] =
    rows.foldLeft(st) { case (m, (reg, rank)) =>
      val cur = m.getOrElse(reg, 0)
      if (rank > cur) m.updated(reg, rank) else m
    }

  /** Exact-integer summary: register count + Σ 2^(49−rank) (≤ m·2^48,
    * exact long). */
  def emitCard(ws: Long, st: Map[Int, Int]): WindowCard =
    WindowCard(ws, st.size,
      st.valuesIterator.map(mr =>
        1L << (graft.functions.HllFrame.wBits + 1 - mr)).sum)

  private def wsOf(ts: Column, windowLenS: Long): Column = {
    val tsL = ts.cast("long")
    tsL - pmod(tsL, lit(windowLenS))
  }

  private def windowedRegs(events: DataFrame, value: Column,
      windowLenS: Long): DataFrame =
    events.where(value.isNotNull && col("ts").isNotNull)
      .select(wsOf(col("ts"), windowLenS).as("ws"),
        graft.functions.HllFrame.regCol(value).as("reg"),
        graft.functions.HllFrame.rankCol(value).cast("int").as("rank"))

  /** The estimate projection over the kernel's integer summaries —
    * HllFrame.estimate's arithmetic verbatim. */
  def withEstimate(cards: DataFrame): DataFrame =
    cards.select(col("window_start"), col("n_registers"),
      graft.functions.HllFrame.estCol.as("est"))

  /** Batch form: the kernel fold per window — the oracle-gated
    * member. Each window folds in one task (the streaming state
    * shape); the SCALE batch path is HllFrame.registers' map-side
    * combined groupBy, which this equals by max-merge.
    */
  def exactBatch(events: DataFrame, value: Column,
      windowLenS: Long = 86400L): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val cards = windowedRegs(events, value, windowLenS).as[Reg]
      .groupByKey(_.ws)
      .flatMapGroups { (ws: Long, rows: Iterator[Reg]) =>
        Iterator(emitCard(ws,
          fold(Map.empty, rows.map(r => r.reg -> r.rank))))
      }
    withEstimate(cards.toDF())
  }

  /** Streaming form: one register map per open window, one-shot
    * emission when the watermark passes window end + lateness.
    *
    * @param events streaming frame with (ts: timestamp, the value col)
    */
  def windowed(events: DataFrame, value: Column,
      windowLenS: Long = 86400L,
      lateness: String = "30 minutes"): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val cards = events.where(value.isNotNull && col("ts").isNotNull)
      .withWatermark("ts", lateness)
      .select(col("ts"), wsOf(col("ts"), windowLenS).as("ws"),
        graft.functions.HllFrame.regCol(value).as("reg"),
        graft.functions.HllFrame.rankCol(value).cast("int").as("rank"))
      .as[(java.sql.Timestamp, Long, Int, Int)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Map[Int, Int], WindowCard](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (ws: Long, rows: Iterator[(java.sql.Timestamp, Long, Int, Int)],
            state: GroupState[Map[Int, Int]]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator(emitCard(ws, st))
          } else {
            state.update(fold(state.getOption.getOrElse(Map.empty),
              rows.map(r => r._3 -> r._4)))
            // emit once the watermark passes the window end (+ the
            // lateness horizon, implied by watermark semantics)
            state.setTimeoutTimestamp((ws + windowLenS) * 1000L)
            Iterator.empty
          }
      }
    withEstimate(cards.toDF())
  }
}
