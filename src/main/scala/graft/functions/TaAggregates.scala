package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

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
  extends TypedImperativeAggregate[S] with UnaryLike[Expression]
    with Serializable {
  // Callers wrap the child in Cast(_, DoubleType) (see TaFunctions):
  // the classic ImplicitCastInputTypes mixin needs the private[sql]
  // AbstractDataType, so coercion is explicit instead. Serializable is
  // explicit (not a ctor-param class) so executor-side Java
  // deserialization never needs a no-arg constructor from this class.
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def merge(state: S, other: S): S =
    throw new UnsupportedOperationException(
      s"$prettyName is an ordered running aggregate: window-use only, " +
        "no partial aggregation")
  final override def update(state: S, input: InternalRow): S = {
    val v = child.eval(input)
    if (v == null) state else updateValue(state, v.asInstanceOf[Double])
  }
  protected def updateValue(state: S, v: Double): S
}

/** Mutable EMA state: warm-up count, seed accumulator / running EMA. */
final class EmaState(var count: Long, var acc: Double)

/** `ema(value, n)` — SMA-seeded exponential moving average,
  * α = 2/(n+1). NULL until n non-NULL values have arrived.
  */
case class Ema(child: Expression, n: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends RunningAggBase[EmaState] {

  override def prettyName: String = "ema"
  private val alpha = 2.0 / (n + 1)

  override def createAggregationBuffer(): EmaState = new EmaState(0L, 0.0)

  override protected def updateValue(s: EmaState, v: Double): EmaState = {
    s.count += 1
    if (s.count < n) s.acc += v
    else if (s.count == n) { s.acc += v; s.acc = s.acc / n }
    else s.acc = alpha * v + (1 - alpha) * s.acc
    s
  }

  override def eval(s: EmaState): Any =
    if (s.count >= n) s.acc else null

  override def serialize(s: EmaState): Array[Byte] = {
    val b = ByteBuffer.allocate(16)
    b.putLong(s.count).putDouble(s.acc)
    b.array()
  }
  override def deserialize(bytes: Array[Byte]): EmaState = {
    val b = ByteBuffer.wrap(bytes)
    new EmaState(b.getLong(), b.getDouble())
  }

  override def withNewMutableAggBufferOffset(o: Int): Ema =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): Ema =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): Ema =
    copy(child = c)
}

/** Mutable RSI state: rows seen, previous close, Wilder averages. */
final class RsiState(var count: Long, var prev: Double,
    var sumGain: Double, var sumLoss: Double,
    var avgGain: Double, var avgLoss: Double)

/** `wilder_rsi(close, n)` — RSI with Wilder smoothing: the first n
  * deltas seed simple averages, then avg = (prev·(n−1) + cur)/n;
  * avgLoss = 0 → 100. NULL until n deltas have arrived.
  */
case class WilderRsi(child: Expression, n: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends RunningAggBase[RsiState] {

  override def prettyName: String = "wilder_rsi"

  override def createAggregationBuffer(): RsiState =
    new RsiState(0L, 0.0, 0.0, 0.0, 0.0, 0.0)

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
    if (s.count > n) {
      if (s.avgLoss == 0.0) 100.0
      else 100.0 - 100.0 / (1 + s.avgGain / s.avgLoss)
    } else null

  override def serialize(s: RsiState): Array[Byte] = {
    val b = ByteBuffer.allocate(48)
    b.putLong(s.count).putDouble(s.prev).putDouble(s.sumGain)
      .putDouble(s.sumLoss).putDouble(s.avgGain).putDouble(s.avgLoss)
    b.array()
  }
  override def deserialize(bytes: Array[Byte]): RsiState = {
    val b = ByteBuffer.wrap(bytes)
    new RsiState(b.getLong(), b.getDouble(), b.getDouble(), b.getDouble(),
      b.getDouble(), b.getDouble())
  }

  override def withNewMutableAggBufferOffset(o: Int): WilderRsi =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): WilderRsi =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): WilderRsi =
    copy(child = c)
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

  /** `wilder_rsi(c, n)` as a Column; apply `.over(running frame)`. */
  def wilderRsi(c: Column, n: Int): Column =
    GraftSqlShims.column(
      WilderRsi(asDouble(GraftSqlShims.expression(c)), n)
        .toAggregateExpression())

  /** Register `ema` / `wilder_rsi` in a session's function registry so
    * `spark.sql("... ema(close, 5) OVER (...)")` resolves.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("ema",
      es => Ema(Cast(es.head, DoubleType), intArg(es(1), "ema")),
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
    r.createOrReplaceTempFunction("sorted_hashes",
      es => SortedHashes(es.head), "scala_udf")
    r.createOrReplaceTempFunction("sorted_intersect_count",
      es => SortedIntersectCount(es.head, es(1)), "scala_udf")
    r.createOrReplaceTempFunction("sq_diff_sum",
      es => SqDiffSum(es.head, es(1)), "scala_udf")
    r.createOrReplaceTempFunction("simhash32",
      es => SimHash32(es.head), "scala_udf")
    r.createOrReplaceTempFunction("sorted_run_stats",
      es => SortedRunStats(es.head), "scala_udf")
    r.createOrReplaceTempFunction("rolling_fp",
      es => RollingFp(es.head), "scala_udf")
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
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (es: Seq[Expression]) => SimHash32(es.head)))
    ext.injectFunction((FunctionIdentifier("sorted_run_stats"),
      new ExpressionInfo(classOf[SortedRunStats].getName, "sorted_run_stats"),
      (es: Seq[Expression]) => SortedRunStats(es.head)))
    ext.injectFunction((FunctionIdentifier("rolling_fp"),
      new ExpressionInfo(classOf[RollingFp].getName, "rolling_fp"),
      (es: Seq[Expression]) => RollingFp(es.head)))
  }
}
