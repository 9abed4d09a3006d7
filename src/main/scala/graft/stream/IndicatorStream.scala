package graft.stream

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online per-symbol indicator computation over a bar stream — the
  * recursive family (EMA 5/10/30, MACD line + signal, Wilder RSI, OBV)
  * computed as each bar arrives, with per-symbol state in the
  * checkpointed state store (`flatMapGroupsWithState`).
  *
  * The reference computes these only in nightly batch
  * (D_Create_crypto_ind_day_001.py); the streaming engine brings them
  * online with the SAME recurrences in the SAME operation order as the
  * batch kernels ([[graft.functions.Ema]]/[[graft.functions.WilderRsi]]
  * and [[graft.ts.TaKernels]]), so the online values are bit-identical
  * to a batch recompute over the bars seen so far — pinned in
  * StreamingSpec across multiple micro-batches. The state carried per
  * symbol is exactly the [[graft.mart.IndicatorDay.stateSnapshot]]
  * recursion state (seven small structs + OBV), so a stream can hand
  * off to the batch incremental refresh and vice versa.
  *
  * Scale shape: state is O(symbols) × ~200 bytes, the stream shuffles
  * once on the symbol key, and each micro-batch does O(new bars) work —
  * the streaming twin of the incremental mart refresh. Bars must
  * arrive in event-time order per symbol ACROSS batches (within a
  * batch they are sorted here); out-of-order history belongs to the
  * watermarked bar builder upstream ([[Windowed.streamingBars]]).
  */
object IndicatorStream {

  case class BarIn(id: Long, t: Long, close: Double, volume: Double)

  case class EmaS(count: Long, acc: Double)
  case class RsiS(count: Long, prev: Double, sumGain: Double,
    sumLoss: Double, avgGain: Double, avgLoss: Double)
  case class IndState(e5: EmaS, e10: EmaS, e30: EmaS, e12: EmaS,
    e26: EmaS, s9: EmaS, rsi: RsiS, obv: Double, n: Long,
    prevClose: Double)

  case class IndOut(id: Long, t: Long, ema5: Option[Double],
    ema10: Option[Double], ema30: Option[Double], macd: Option[Double],
    macd_single: Option[Double], rsi: Option[Double], obv: Double)

  private val zeroEma = EmaS(0L, 0.0)
  private val zeroState = IndState(zeroEma, zeroEma, zeroEma, zeroEma,
    zeroEma, zeroEma, RsiS(0L, 0.0, 0.0, 0.0, 0.0, 0.0), 0.0, 0L, 0.0)

  /** SMA-seeded EMA step — the exact operation order of
    * [[graft.functions.Ema]].updateValue, so online == batch holds
    * bit-for-bit, not just approximately.
    */
  private def emaUp(s: EmaS, v: Double, n: Int): EmaS = {
    val c = s.count + 1
    if (c < n) EmaS(c, s.acc + v)
    else if (c == n) EmaS(c, (s.acc + v) / n)
    else {
      val a = 2.0 / (n + 1)
      EmaS(c, a * v + (1 - a) * s.acc)
    }
  }
  private def emaVal(s: EmaS, n: Int): Option[Double] =
    if (s.count >= n) Some(s.acc) else None

  /** Wilder-RSI step — exact port of
    * [[graft.functions.WilderRsi]].updateValue.
    */
  private def rsiUp(s: RsiS, v: Double, n: Int): RsiS = {
    if (s.count >= 1) {
      val d = v - s.prev
      val g = if (d > 0) d else 0.0
      val l = if (d < 0) -d else 0.0
      val deltaIdx = s.count
      if (deltaIdx <= n) {
        val sg = s.sumGain + g
        val sl = s.sumLoss + l
        if (deltaIdx == n)
          RsiS(s.count + 1, v, sg, sl, sg / n, sl / n)
        else RsiS(s.count + 1, v, sg, sl, s.avgGain, s.avgLoss)
      } else RsiS(s.count + 1, v, s.sumGain, s.sumLoss,
        (s.avgGain * (n - 1) + g) / n, (s.avgLoss * (n - 1) + l) / n)
    } else RsiS(s.count + 1, v, s.sumGain, s.sumLoss, s.avgGain, s.avgLoss)
  }
  private def rsiVal(s: RsiS, n: Int): Option[Double] =
    if (s.count > n) Some(
      if (s.avgLoss == 0.0) 100.0
      else 100.0 - 100.0 / (1 + s.avgGain / s.avgLoss))
    else None

  private def step(st: IndState, b: BarIn): (IndState, IndOut) = {
    val v = b.close
    val e5 = emaUp(st.e5, v, 5)
    val e10 = emaUp(st.e10, v, 10)
    val e30 = emaUp(st.e30, v, 30)
    val e12 = emaUp(st.e12, v, 12)
    val e26 = emaUp(st.e26, v, 26)
    val macd = for {
      f <- emaVal(e12, 12)
      s <- emaVal(e26, 26)
    } yield f - s
    val s9 = macd.map(m => emaUp(st.s9, m, 9)).getOrElse(st.s9)
    val rsi = rsiUp(st.rsi, v, 14)
    val obv =
      if (st.n == 0L) 0.0
      else if (v > st.prevClose) st.obv + b.volume
      else if (v < st.prevClose) st.obv - b.volume
      else st.obv
    val next = IndState(e5, e10, e30, e12, e26, s9, rsi, obv,
      st.n + 1, v)
    (next, IndOut(b.id, b.t, emaVal(e5, 5), emaVal(e10, 10),
      emaVal(e30, 30), macd, emaVal(s9, 9), rsiVal(rsi, 14), obv))
  }

  /** One indicator row per incoming bar, keyed state per symbol. */
  def onlineIndicators(bars: Dataset[BarIn]): Dataset[IndOut] = {
    import bars.sparkSession.implicits._
    bars.groupByKey(_.id)
      .flatMapGroupsWithState[IndState, IndOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[BarIn], state: GroupState[IndState]) =>
          var st = state.getOption.getOrElse(zeroState)
          val out = rows.toSeq.sortBy(_.t).map { b =>
            val (next, o) = step(st, b)
            st = next
            o
          }
          state.update(st)
          out.iterator
      }
  }
}
