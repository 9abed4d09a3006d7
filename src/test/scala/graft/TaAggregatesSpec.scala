package graft

import graft.functions.TaFunctions
import graft.ts.{Bars, Recursive, TaKernels}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native Catalyst window aggregates must agree BIT-FOR-BIT with
  * the pure kernels ([[TaKernels]]) — both implement the same
  * recurrence in the same operation order, so exact equality is the
  * contract, not tolerance.
  */
class TaAggregatesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val bars = Bars.hourly(
    Tables.load(spark, "/root/testdata/sf0.001", "events"))
    .withColumn("tkey", col("t"))

  private val run = Window.partitionBy("id").orderBy("tkey")
    .rowsBetween(Window.unboundedPreceding, 0)

  test("native ema == kernel ema, exactly") {
    val native = bars.select(col("id"), col("tkey"),
      TaFunctions.ema(col("close"), 10).over(run).as("e"))
    val kernel = Recursive.applyKernel(
      bars.select(col("id"), col("tkey"), col("close")), Seq("e")) { c =>
      Array(TaKernels.ema(c, 10))
    }
    val diff = native.as("n").join(kernel.as("k"), Seq("id", "tkey"))
      .where(
        (col("n.e").isNull && col("k.e").isNotNull) ||
        (col("n.e").isNotNull && col("k.e").isNull) ||
        col("n.e") =!= col("k.e"))
      .count()
    assert(diff == 0)
  }

  test("native wilder_rsi == kernel rsi, exactly") {
    val native = bars.select(col("id"), col("tkey"),
      TaFunctions.wilderRsi(col("close"), 14).over(run).as("r"))
    val kernel = Recursive.applyKernel(
      bars.select(col("id"), col("tkey"), col("close")), Seq("r")) { c =>
      Array(TaKernels.rsi(c, 14))
    }
    val diff = native.as("n").join(kernel.as("k"), Seq("id", "tkey"))
      .where(
        (col("n.r").isNull && col("k.r").isNotNull) ||
        (col("n.r").isNotNull && col("k.r").isNull) ||
        col("n.r") =!= col("k.r"))
      .count()
    assert(diff == 0)
  }

  test("ema of nullable input skips nulls (EMA-over-defined semantics)") {
    import spark.implicits._
    // Nulls at the head: seed starts at the first defined value, like
    // the MACD signal line over a partially-defined macd series.
    val df = (1 to 10).map {
      case i if i <= 3 => (1L, i.toLong, None: Option[Double])
      case i => (1L, i.toLong, Some(i.toDouble))
    }.toDF("id", "tkey", "v")
    val out = df.select(col("tkey"),
      TaFunctions.ema(col("v"), 3).over(run).as("e"))
      .orderBy("tkey").collect()
    // values 4,5,6 seed at tkey=6 with avg=5; then recurrence
    assert(out.take(5).forall(_.isNullAt(1)))
    assert(out(5).getDouble(1) == 5.0)
    val alpha = 2.0 / 4
    assert(out(6).getDouble(1) == alpha * 7 + (1 - alpha) * 5.0)
  }

  test("SQL surface: ema()/wilder_rsi() resolve after registration") {
    TaFunctions.register(spark)
    bars.createOrReplaceTempView("bars_tmp")
    val out = spark.sql(
      """SELECT id, tkey,
        |       ema(close, 5) OVER w AS ema5,
        |       wilder_rsi(close, 14) OVER w AS rsi
        |FROM bars_tmp
        |WINDOW w AS (PARTITION BY id ORDER BY tkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |""".stripMargin)
    assert(out.where(col("ema5").isNotNull).count() > 0)
    assert(out.where(col("rsi") < 0 || col("rsi") > 100).count() == 0)
  }
}
