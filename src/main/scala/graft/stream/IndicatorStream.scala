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

  // ——— full online mart: the frame family joins the recursive one ———

  case class FullBarIn(id: Long, t: Long, high: Double, low: Double,
    close: Double, volume: Double)
  /** One scaled bar kept in the positional ring. */
  case class RingBar(h: Double, l: Double, c: Double)
  /** ringBars caps at 78 (senkou-B's 26-bar displacement over a 52-bar
    * midpoint frame + the current row — the same bound as the batch
    * incremental refresh's tail); rawRing/kRing keep the last defined
    * stochastic stages (≤ 3 each).
    */
  case class FullState(core: IndState, ring: Seq[RingBar],
    rawRing: Seq[Double], kRing: Seq[Double])

  case class FullOut(id: Long, t: Long,
    sma5: Option[Double], sma10: Option[Double], sma30: Option[Double],
    ema5: Option[Double], ema10: Option[Double], ema30: Option[Double],
    macd: Option[Double], macd_single: Option[Double], rsi: Option[Double],
    bollinger_bands_sma: Option[Double],
    bollinger_bands_lower_band: Option[Double],
    bollinger_bands_upper_band: Option[Double],
    obv: Double,
    ichimoku_kijun_sen: Option[Double], ichimoku_tenkan_sen: Option[Double],
    ichimoku_senkou_span_a: Option[Double],
    ichimoku_senkou_span_b: Option[Double],
    stoch_oscillator: Option[Double], stoch_signal: Option[Double],
    stoch_percent_j: Option[Double],
    aroon_up: Option[Double], aroon_down: Option[Double],
    aroon_oscillator: Option[Double])

  private val maxRing = 78

  /** Left-to-right mean over the last n ring closes — the exact
    * accumulation order of Spark's Average over a sliding frame (the
    * frame rebuilds its buffer per row, summing rows in frame order
    * from 0.0), so online == batch bit-for-bit.
    */
  private def frameAvg(xs: Seq[Double]): Double = {
    var s = 0.0
    xs.foreach(s += _)
    s / xs.length
  }

  /** Population stddev replicating CentralMomentAgg's Welford update
    * order (delta/deltaN/m2) — Spark's stddev_pop over a frame is this
    * exact recurrence over the frame rows, so the result matches
    * bit-for-bit, which a naive two-pass formula would not.
    */
  private def frameStdPop(xs: Seq[Double]): Double = {
    var n = 0.0
    var avg = 0.0
    var m2 = 0.0
    xs.foreach { v =>
      n += 1
      val delta = v - avg
      val deltaN = delta / n
      avg += deltaN
      m2 += delta * (delta - deltaN)
    }
    math.sqrt(m2 / n)
  }

  private def mid(bars: Seq[RingBar]): Double =
    (bars.map(_.h).max + bars.map(_.l).min) / 2

  private def fullStep(st: FullState, b: FullBarIn): (FullState, FullOut) = {
    val (core, rec) = step(st.core,
      BarIn(b.id, b.t, b.close, b.volume))
    val ring = (st.ring :+ RingBar(b.high, b.low, b.close)).takeRight(maxRing)
    val rn = core.n // absolute bar count AFTER this bar
    def last(n: Int): Seq[RingBar] = ring.takeRight(n)
    def when(cond: Boolean)(v: => Double): Option[Double] =
      if (cond) Some(v) else None

    val closes = ring.map(_.c)
    val sma5 = when(rn >= 5)(frameAvg(closes.takeRight(5)))
    val sma10 = when(rn >= 10)(frameAvg(closes.takeRight(10)))
    val sma30 = when(rn >= 30)(frameAvg(closes.takeRight(30)))
    val bbSma = when(rn >= 20)(frameAvg(closes.takeRight(20)))
    val bbSd = when(rn >= 20)(frameStdPop(closes.takeRight(20)))

    // stochastic chain: raw needs 14 bars; k = mean of last 3 raws
    // (defined from rn 16); d = mean of last 3 ks (defined from rn 18)
    val raw = when(rn >= 14) {
      val w = last(14)
      val hh = w.map(_.h).max
      val ll = w.map(_.l).min
      if (hh != ll) (b.close - ll) / (hh - ll) * 100 else 0.0
    }
    val rawRing = (st.rawRing ++ raw.toSeq).takeRight(3)
    val k = when(rn >= 16)(frameAvg(rawRing))
    val kRing = (st.kRing ++ k.toSeq).takeRight(3)
    val d = when(rn >= 18)(frameAvg(kRing))
    val j = for { kk <- k; dd <- d } yield 3 * kk - 2 * dd

    val tenkan = when(rn >= 9)(mid(last(9)))
    val kijun = when(rn >= 26)(mid(last(26)))
    // senkou spans: lag-26 of the midpoints — recomputed positionally
    // from the ring (bars [len-26-n+1, len-26] are the lagged frame)
    def lagged(n: Int): Option[Seq[RingBar]] =
      if (rn - 26 >= n) Some(ring.dropRight(26).takeRight(n)) else None
    val senkouA = for {
      tk <- lagged(9).map(mid)
      kj <- lagged(26).map(mid)
    } yield (tk + kj) / 2
    val senkouB = lagged(52).map(mid)

    // aroon(25): periods since extremum in the 26-bar window, ties to
    // the EARLIEST bar (the batch struct-ordering tiebreak; indexOf
    // finds the first = earliest occurrence)
    val aroonWin = last(26)
    def aroon(xs: Seq[Double], extremum: Seq[Double] => Double) =
      when(rn >= 26) {
        val since = xs.length - 1 - xs.indexOf(extremum(xs))
        (25 - since) * 100.0 / 25
      }
    val aroonUp = aroon(aroonWin.map(_.h), _.max)
    val aroonDown = aroon(aroonWin.map(_.l), _.min)

    val next = FullState(core, ring, rawRing, kRing)
    (next, FullOut(b.id, b.t,
      sma5, sma10, sma30, rec.ema5, rec.ema10, rec.ema30,
      rec.macd, rec.macd_single, rec.rsi,
      bbSma,
      for { s <- bbSma; sd <- bbSd } yield s - 2 * sd,
      for { s <- bbSma; sd <- bbSd } yield s + 2 * sd,
      rec.obv,
      kijun, tenkan, senkouA, senkouB,
      d, k, j, aroonUp, aroonDown,
      for { u <- aroonUp; dn <- aroonDown } yield u - dn))
  }

  /** The FULL indicator surface per incoming bar (recursive + frame
    * families), bit-equal to the batch PRE-EDGE indicator frame
    * ([[graft.mart.IndicatorDay.indicators]]) for every column except
    * the future-looking chikou span (lead(26) — unknowable at bar
    * time; the batch trailing-window reload back-fills it, see
    * [[graft.mart.IndicatorDay.incrementalFrom]]). The PUBLISHED mart
    * additionally applies the reference output edge (exact 0 → NULL,
    * float cast — `IndicatorDay.applyEdge`); consumers wanting mart
    * parity apply that same projection to this stream's output.
    * State per symbol is the recursion snapshot ([[IndState]] nested
    * as `core`, stream→batch handoff included) plus a 78-bar
    * positional ring — the same bound the batch incremental tail
    * uses — so state stays O(symbols) × ~2 KB however long the stream
    * runs. Bars must carry the SCALED high/low/close (the mart's
    * n_multiple convention, applied upstream like the close-only
    * variant).
    */
  def onlineMart(bars: Dataset[FullBarIn]): Dataset[FullOut] = {
    import bars.sparkSession.implicits._
    bars.groupByKey(_.id)
      .flatMapGroupsWithState[FullState, FullOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[FullBarIn], state: GroupState[FullState]) =>
          var st = state.getOption.getOrElse(
            FullState(zeroState, Nil, Nil, Nil))
          val out = rows.toSeq.sortBy(_.t).map { b =>
            val (next, o) = fullStep(st, b)
            st = next
            o
          }
          state.update(st)
          out.iterator
      }
  }
}
