package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}

/** Native Catalyst aggregate functions for the recursive indicators —
  * the (b)-tier of the custom-operator ladder: a `TypedImperativeAggregate`
  * evaluated incrementally by the window engine, replacing the
  * `groupByKey.flatMapGroups` hop for EMA/MACD/RSI entirely.
  *
  * Used over a running frame —
  * `PARTITION BY id ORDER BY t ROWS UNBOUNDED PRECEDING` — Spark's
  * `UnboundedPrecedingWindowFunctionFrame` feeds each row to `update`
  * exactly once in order and reads `eval` after each row: O(rows) per
  * partition, no per-row frame rescan, state is a 32-byte buffer. That
  * makes ALL indicators (frame-expressible and recursive alike) run in
  * ONE window pass over one shuffle+sort — strictly better than the
  * flatMapGroups + join plan, which is kept (and separately verified)
  * as the [[graft.ts.Recursive]] reference implementation.
  *
  * Semantics are identical to [[graft.ts.TaKernels]] (same operation
  * order, so results are bit-identical): SMA-seeded EMA with NULL
  * until the seed fills, NULL inputs skipped (which makes
  * `ema(macd, 9)` the reference's EMA-over-defined signal line), and
  * Wilder-smoothed RSI.
  *
  * These are order-sensitive running aggregates: they are window-only
  * and reject `merge` (no partial aggregation path), like other
  * order-dependent aggregates.
  */
abstract class RunningAggBase[S]
  extends TypedImperativeAggregate[S] with BinaryLike[Expression]
    with Serializable {
  // Callers wrap the child in Cast(_, DoubleType) (see TaFunctions):
  // the classic ImplicitCastInputTypes mixin needs the private[sql]
  // AbstractDataType, so coercion is explicit instead. Serializable is
  // explicit (not a ctor-param class) so executor-side Java
  // deserialization never needs a no-arg constructor from this class.
  //
  // `seed` (second child) supports EXACT RESUMPTION for incremental
  // mart refreshes: a per-group struct (joined onto every input row,
  // so it is constant within a window partition) holding the
  // aggregate's internal state as previously captured with the
  // `emitState` variant. On the first input row of a partition the
  // state initializes from the seed (NULL seed = fresh start), after
  // which the recursion continues bit-for-bit as if it had consumed
  // the full history the seed summarizes.
  def child: Expression
  def seed: Expression
  final override def left: Expression = child
  final override def right: Expression = seed
  override def nullable: Boolean = true
  override def merge(state: S, other: S): S =
    throw new UnsupportedOperationException(
      s"$prettyName is an ordered running aggregate: window-use only, " +
        "no partial aggregation")
  final override def update(state: S, input: InternalRow): S = {
    val st = seedOnce(state, input)
    val v = child.eval(input)
    if (v == null) st else updateValue(st, v.asInstanceOf[Double])
  }
  protected def seedOnce(state: S, input: InternalRow): S
  protected def updateValue(state: S, v: Double): S
}

/** Mutable EMA state: warm-up count, seed accumulator / running EMA. */
final class EmaState(var count: Long, var acc: Double,
  var seeded: Boolean = false)

object Ema {
  /** Serialized-state shape for seeding/emitState. */
  val stateType: StructType = StructType(Seq(
    StructField("count", LongType), StructField("acc", DoubleType)))
  def nullSeed: Expression = Literal.create(null, stateType)
}

/** `ema(value, n)` — SMA-seeded exponential moving average,
  * α = 2/(n+1). NULL until n non-NULL values have arrived.
  * With `emitState` the aggregate evaluates to its internal
  * (count, acc) struct instead of the EMA value — the snapshot a
  * later run passes back as `seed` to continue exactly.
  */
case class Ema(child: Expression, n: Int,
    seed: Expression = Ema.nullSeed, emitState: Boolean = false,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends RunningAggBase[EmaState] {

  override def prettyName: String = "ema"
  override def dataType: DataType =
    if (emitState) Ema.stateType else DoubleType
  private val alpha = 2.0 / (n + 1)

  override def createAggregationBuffer(): EmaState = new EmaState(0L, 0.0)

  override protected def seedOnce(s: EmaState, input: InternalRow): EmaState = {
    if (!s.seeded) {
      s.seeded = true
      seed.eval(input) match {
        case null => ()
        case r: InternalRow => s.count = r.getLong(0); s.acc = r.getDouble(1)
      }
    }
    s
  }

  override protected def updateValue(s: EmaState, v: Double): EmaState = {
    s.count += 1
    if (s.count < n) s.acc += v
    else if (s.count == n) { s.acc += v; s.acc = s.acc / n }
    else s.acc = alpha * v + (1 - alpha) * s.acc
    s
  }

  override def eval(s: EmaState): Any =
    if (emitState) new GenericInternalRow(Array[Any](s.count, s.acc))
    else if (s.count >= n) s.acc else null

  override def serialize(s: EmaState): Array[Byte] = {
    val b = ByteBuffer.allocate(17)
    b.put(if (s.seeded) 1.toByte else 0.toByte)
      .putLong(s.count).putDouble(s.acc)
    b.array()
  }
  override def deserialize(bytes: Array[Byte]): EmaState = {
    val b = ByteBuffer.wrap(bytes)
    val seeded = b.get() == 1.toByte
    new EmaState(b.getLong(), b.getDouble(), seeded)
  }

  override def withNewMutableAggBufferOffset(o: Int): Ema =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): Ema =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Ema = copy(child = l, seed = r)
}

object WilderMa {
  /** Serialized-state shape for seeding/emitState (same as Ema's). */
  val stateType: StructType = Ema.stateType
  def nullSeed: Expression = Literal.create(null, stateType)
}

/** `wilder_ma(value, n)` — Wilder's smoothed moving average: the first
  * n non-NULL values seed a simple average, then
  * `a = (1/n)·v + (1 − 1/n)·a` (an SMA-seeded EMA with α = 1/n).
  * NULL until the seed fills; NULL inputs are skipped, so smoothing a
  * derived series that only becomes defined mid-stream (e.g. the DX
  * line of ADX) seeds on its first n defined values. Backs ATR and the
  * ADX chain ([[graft.mart.Trend]]); state plumbing mirrors [[Ema]].
  */
case class WilderMa(child: Expression, n: Int,
    seed: Expression = WilderMa.nullSeed, emitState: Boolean = false,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends RunningAggBase[EmaState] {

  override def prettyName: String = "wilder_ma"
  override def dataType: DataType =
    if (emitState) WilderMa.stateType else DoubleType
  private val alpha = 1.0 / n

  override def createAggregationBuffer(): EmaState = new EmaState(0L, 0.0)

  override protected def seedOnce(s: EmaState, input: InternalRow): EmaState = {
    if (!s.seeded) {
      s.seeded = true
      seed.eval(input) match {
        case null => ()
        case r: InternalRow => s.count = r.getLong(0); s.acc = r.getDouble(1)
      }
    }
    s
  }

  override protected def updateValue(s: EmaState, v: Double): EmaState = {
    s.count += 1
    if (s.count < n) s.acc += v
    else if (s.count == n) { s.acc += v; s.acc = s.acc / n }
    else s.acc = alpha * v + (1 - alpha) * s.acc
    s
  }

  override def eval(s: EmaState): Any =
    if (emitState) new GenericInternalRow(Array[Any](s.count, s.acc))
    else if (s.count >= n) s.acc else null

  override def serialize(s: EmaState): Array[Byte] = {
    val b = ByteBuffer.allocate(17)
    b.put(if (s.seeded) 1.toByte else 0.toByte)
      .putLong(s.count).putDouble(s.acc)
    b.array()
  }
  override def deserialize(bytes: Array[Byte]): EmaState = {
    val b = ByteBuffer.wrap(bytes)
    val seeded = b.get() == 1.toByte
    new EmaState(b.getLong(), b.getDouble(), seeded)
  }

  override def withNewMutableAggBufferOffset(o: Int): WilderMa =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): WilderMa =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): WilderMa = copy(child = l, seed = r)
}

/** Mutable RSI state: rows seen, previous close, Wilder averages. */
final class RsiState(var count: Long, var prev: Double,
    var sumGain: Double, var sumLoss: Double,
    var avgGain: Double, var avgLoss: Double,
    var seeded: Boolean = false)

object WilderRsi {
  /** Serialized-state shape for seeding/emitState. */
  val stateType: StructType = StructType(Seq(
    StructField("count", LongType), StructField("prev", DoubleType),
    StructField("sum_gain", DoubleType), StructField("sum_loss", DoubleType),
    StructField("avg_gain", DoubleType), StructField("avg_loss", DoubleType)))
  def nullSeed: Expression = Literal.create(null, stateType)
}

/** `wilder_rsi(close, n)` — RSI with Wilder smoothing: the first n
  * deltas seed simple averages, then avg = (prev·(n−1) + cur)/n;
  * avgLoss = 0 → 100. NULL until n deltas have arrived. `seed` /
  * `emitState` resume/capture the full six-field internal state (see
  * [[RunningAggBase]]).
  */
case class WilderRsi(child: Expression, n: Int,
    seed: Expression = WilderRsi.nullSeed, emitState: Boolean = false,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends RunningAggBase[RsiState] {

  override def prettyName: String = "wilder_rsi"
  override def dataType: DataType =
    if (emitState) WilderRsi.stateType else DoubleType

  override def createAggregationBuffer(): RsiState =
    new RsiState(0L, 0.0, 0.0, 0.0, 0.0, 0.0)

  override protected def seedOnce(s: RsiState, input: InternalRow): RsiState = {
    if (!s.seeded) {
      s.seeded = true
      seed.eval(input) match {
        case null => ()
        case r: InternalRow =>
          s.count = r.getLong(0); s.prev = r.getDouble(1)
          s.sumGain = r.getDouble(2); s.sumLoss = r.getDouble(3)
          s.avgGain = r.getDouble(4); s.avgLoss = r.getDouble(5)
      }
    }
    s
  }

  override protected def updateValue(s: RsiState, v: Double): RsiState = {
    if (s.count >= 1) {
      val d = v - s.prev
      val g = if (d > 0) d else 0.0
      val l = if (d < 0) -d else 0.0
      val deltaIdx = s.count // 1-based index of THIS delta
      if (deltaIdx <= n) {
        s.sumGain += g; s.sumLoss += l
        if (deltaIdx == n) { s.avgGain = s.sumGain / n; s.avgLoss = s.sumLoss / n }
      } else {
        s.avgGain = (s.avgGain * (n - 1) + g) / n
        s.avgLoss = (s.avgLoss * (n - 1) + l) / n
      }
    }
    s.prev = v
    s.count += 1
    s
  }

  override def eval(s: RsiState): Any =
    if (emitState)
      new GenericInternalRow(Array[Any](s.count, s.prev, s.sumGain,
        s.sumLoss, s.avgGain, s.avgLoss))
    else if (s.count > n) {
      if (s.avgLoss == 0.0) 100.0
      else 100.0 - 100.0 / (1 + s.avgGain / s.avgLoss)
    } else null

  override def serialize(s: RsiState): Array[Byte] = {
    val b = ByteBuffer.allocate(49)
    b.put(if (s.seeded) 1.toByte else 0.toByte)
      .putLong(s.count).putDouble(s.prev).putDouble(s.sumGain)
      .putDouble(s.sumLoss).putDouble(s.avgGain).putDouble(s.avgLoss)
    b.array()
  }
  override def deserialize(bytes: Array[Byte]): RsiState = {
    val b = ByteBuffer.wrap(bytes)
    val seeded = b.get() == 1.toByte
    new RsiState(b.getLong(), b.getDouble(), b.getDouble(), b.getDouble(),
      b.getDouble(), b.getDouble(), seeded)
  }

  override def withNewMutableAggBufferOffset(o: Int): WilderRsi =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): WilderRsi =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): WilderRsi = copy(child = l, seed = r)
}

/** Column-API and SQL surface for the native indicator aggregates. */
object TaFunctions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn period must be an integer literal, got $other")
  }

  // Unconditional: the child may still be unresolved here, and
  // Cast(double → double) folds away during optimization anyway.
  private def asDouble(e: Expression): Expression = Cast(e, DoubleType)

  /** `ema(c, n)` as a Column; apply `.over(running frame)`. */
  def ema(c: Column, n: Int): Column =
    GraftSqlShims.column(
      Ema(asDouble(GraftSqlShims.expression(c)), n).toAggregateExpression())

  /** Seed-resumed EMA: continues from a per-group (count, acc) state
    * struct captured by [[emaState]] (NULL seed = fresh start).
    */
  def ema(c: Column, n: Int, seed: Column): Column =
    GraftSqlShims.column(
      Ema(asDouble(GraftSqlShims.expression(c)), n,
        seed = GraftSqlShims.expression(seed)).toAggregateExpression())

  /** Running EMA internal state (count, acc) — the resumption
    * snapshot, optionally itself seed-resumed.
    */
  def emaState(c: Column, n: Int,
      seed: Option[Column] = None): Column =
    GraftSqlShims.column(
      Ema(asDouble(GraftSqlShims.expression(c)), n,
        seed = seed.map(GraftSqlShims.expression).getOrElse(Ema.nullSeed),
        emitState = true).toAggregateExpression())

  /** `wilder_ma(c, n)` — Wilder smoothing (α = 1/n, SMA-seeded) as a
    * Column; apply `.over(running frame)`. NULL inputs skipped.
    */
  def wilderMa(c: Column, n: Int): Column =
    GraftSqlShims.column(
      WilderMa(asDouble(GraftSqlShims.expression(c)), n)
        .toAggregateExpression())

  /** `wilder_rsi(c, n)` as a Column; apply `.over(running frame)`. */
  def wilderRsi(c: Column, n: Int): Column =
    GraftSqlShims.column(
      WilderRsi(asDouble(GraftSqlShims.expression(c)), n)
        .toAggregateExpression())

  /** Seed-resumed Wilder RSI (state from [[wilderRsiState]]). */
  def wilderRsi(c: Column, n: Int, seed: Column): Column =
    GraftSqlShims.column(
      WilderRsi(asDouble(GraftSqlShims.expression(c)), n,
        seed = GraftSqlShims.expression(seed)).toAggregateExpression())

  /** Running Wilder-RSI internal state — the resumption snapshot. */
  def wilderRsiState(c: Column, n: Int,
      seed: Option[Column] = None): Column =
    GraftSqlShims.column(
      WilderRsi(asDouble(GraftSqlShims.expression(c)), n,
        seed = seed.map(GraftSqlShims.expression)
          .getOrElse(WilderRsi.nullSeed),
        emitState = true).toAggregateExpression())

  /** Register `ema` / `wilder_rsi` in a session's function registry so
    * `spark.sql("... ema(close, 5) OVER (...)")` resolves.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("ema",
      es => Ema(Cast(es.head, DoubleType), intArg(es(1), "ema")),
      "scala_udf")
    r.createOrReplaceTempFunction("wilder_ma",
      es => WilderMa(Cast(es.head, DoubleType), intArg(es(1), "wilder_ma")),
      "scala_udf")
    r.createOrReplaceTempFunction("wilder_rsi",
      es => WilderRsi(Cast(es.head, DoubleType), intArg(es(1), "wilder_rsi")),
      "scala_udf")
    r.createOrReplaceTempFunction("dot_product",
      es => DotProduct(es.head, es(1)), "scala_udf")
    r.createOrReplaceTempFunction("word_shingles",
      es => WordShingles(es.head, intArg(es(1), "word_shingles")),
      "scala_udf")
    r.createOrReplaceTempFunction("minhash_sig",
      es => MinHashSig(es.head, intArg(es(1), "minhash_sig")),
      "scala_udf")
    r.createOrReplaceTempFunction("minhash_sig_md5",
      es => MinHashSigMd5(es.head, intArg(es(1), "minhash_sig_md5")),
      "scala_udf")
    r.createOrReplaceTempFunction("sorted_hashes",
      es => SortedHashes(es.head), "scala_udf")
    r.createOrReplaceTempFunction("sorted_intersect_count",
      es => SortedIntersectCount(es.head, es(1)), "scala_udf")
    r.createOrReplaceTempFunction("sq_diff_sum",
      es => SqDiffSum(es.head, es(1)), "scala_udf")
    r.createOrReplaceTempFunction("simhash32",
      es => SimHash32(es.head), "scala_udf")
    r.createOrReplaceTempFunction("simhash64",
      es => SimHashFp(es.head, 64), "scala_udf")
    r.createOrReplaceTempFunction("sorted_run_stats",
      es => SortedRunStats(es.head), "scala_udf")
    r.createOrReplaceTempFunction("rolling_fp",
      es => RollingFp(es.head), "scala_udf")
    r.createOrReplaceTempFunction("nfc_normalize",
      es => NfcNormalize(es.head), "scala_udf")
    r.createOrReplaceTempFunction("quantize_i8",
      es => QuantizeI8(es.head), "scala_udf")
    r.createOrReplaceTempFunction("quantized_dot",
      es => QuantizedDot(es.head, es(1)), "scala_udf")
    r.createOrReplaceTempFunction("bottom_k_sketch",
      es => BottomKByHash(Cast(es.head, DoubleType), es(1),
        intArg(es(2), "bottom_k_sketch")).toAggregateExpression(),
      "scala_udf")
  }
}

/** `SparkSessionExtensions` hook: start Spark with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` to get
  * the indicator functions in every session's SQL surface.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    // HOF-to-kernel rewrite (see KernelRewrite's vector-column contract)
    ext.injectOptimizerRule(_ => KernelRewrite)
    def info(name: String) =
      new ExpressionInfo(classOf[Ema].getName, name)
    ext.injectFunction((FunctionIdentifier("ema"), info("ema"),
      (es: Seq[Expression]) => Ema(Cast(es.head, DoubleType), es(1) match {
        case Literal(v: Int, _) => v
        case o => throw new IllegalArgumentException(s"bad period: $o")
      })))
    ext.injectFunction((FunctionIdentifier("wilder_rsi"), info("wilder_rsi"),
      (es: Seq[Expression]) => WilderRsi(Cast(es.head, DoubleType), es(1) match {
        case Literal(v: Int, _) => v
        case o => throw new IllegalArgumentException(s"bad period: $o")
      })))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (es: Seq[Expression]) => DotProduct(es.head, es(1))))
    def litInt(e: Expression, fn: String): Int = e match {
      case Literal(v: Int, _) => v
      case o => throw new IllegalArgumentException(s"$fn needs int literal, got $o")
    }
    ext.injectFunction((FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (es: Seq[Expression]) => WordShingles(es.head, litInt(es(1), "word_shingles"))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (es: Seq[Expression]) => MinHashSig(es.head, litInt(es(1), "minhash_sig"))))
    ext.injectFunction((FunctionIdentifier("minhash_sig_md5"),
      new ExpressionInfo(classOf[MinHashSigMd5].getName, "minhash_sig_md5"),
      (es: Seq[Expression]) =>
        MinHashSigMd5(es.head, litInt(es(1), "minhash_sig_md5"))))
    ext.injectFunction((FunctionIdentifier("sorted_hashes"),
      new ExpressionInfo(classOf[SortedHashes].getName, "sorted_hashes"),
      (es: Seq[Expression]) => SortedHashes(es.head)))
    ext.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "sorted_intersect_count"),
      (es: Seq[Expression]) => SortedIntersectCount(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("sq_diff_sum"),
      new ExpressionInfo(classOf[SqDiffSum].getName, "sq_diff_sum"),
      (es: Seq[Expression]) => SqDiffSum(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHashFp].getName, "simhash32"),
      (es: Seq[Expression]) => SimHash32(es.head)))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHashFp].getName, "simhash64"),
      (es: Seq[Expression]) => SimHashFp(es.head, 64)))
    ext.injectFunction((FunctionIdentifier("sorted_run_stats"),
      new ExpressionInfo(classOf[SortedRunStats].getName, "sorted_run_stats"),
      (es: Seq[Expression]) => SortedRunStats(es.head)))
    ext.injectFunction((FunctionIdentifier("rolling_fp"),
      new ExpressionInfo(classOf[RollingFp].getName, "rolling_fp"),
      (es: Seq[Expression]) => RollingFp(es.head)))
    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (es: Seq[Expression]) => NfcNormalize(es.head)))
    ext.injectFunction((FunctionIdentifier("quantize_i8"),
      new ExpressionInfo(classOf[QuantizeI8].getName, "quantize_i8"),
      (es: Seq[Expression]) => QuantizeI8(es.head)))
    ext.injectFunction((FunctionIdentifier("quantized_dot"),
      new ExpressionInfo(classOf[QuantizedDot].getName, "quantized_dot"),
      (es: Seq[Expression]) => QuantizedDot(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("bottom_k_sketch"),
      new ExpressionInfo(classOf[BottomKByHash].getName, null,
        "bottom_k_sketch",
        "bottom_k_sketch(value, key, k) - deterministic k-row uniform " +
          "sample of value, selected by md5(key) order (mergeable; " +
          "map-side partials). The row key MUST be unique per row: " +
          "duplicate keys collapse to one sample slot (min value), " +
          "biasing the sample relative to a rank-based formulation.",
        // "" not null: the 5-arg ctor forwards extended into an
        // assert-guarded arguments slot (AssertionError under -ea)
        ""),
      (es: Seq[Expression]) => BottomKByHash(Cast(es.head, DoubleType),
        es(1), litInt(es(2), "bottom_k_sketch")).toAggregateExpression()))
  }
}
