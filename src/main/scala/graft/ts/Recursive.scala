package graft.ts

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed application of the recursive kernels ([[TaKernels]]).
  *
  * The reference's shape for these is a per-symbol driver loop with
  * `toPandas()` round-trips (D_Create_crypto_ind_day_001.py:52-59) — a
  * driver bottleneck. The Spark-native shape is
  * `groupByKey(symbol).flatMapGroups` with an in-memory sort of that
  * symbol's series: each group is one symbol's *daily* history, which is
  * bounded (years × 365 rows) regardless of total data volume, so the
  * pass scales horizontally with the number of symbols — the right axis
  * for 100 TB. One shuffle on the symbol key, no driver involvement.
  *
  * NaN is the in-kernel warm-up marker; it is converted back to SQL NULL
  * at the DataFrame edge so downstream semantics match the reference's
  * NULL-until-lookback convention.
  */
object Recursive {

  /** Apply a closes→columns kernel per symbol. Input df must have
    * columns (id: Long, dt: Date, close: Double); output has
    * (id, dt, close) ++ outNames columns, kernel NaNs as NULLs.
    */
  def applyKernel(df: DataFrame, outNames: Seq[String])(
      kernel: Array[Double] => Array[Array[Double]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, java.sql.Date, Double)] =
      df.select(col("id").cast("long"), col("dt"), col("close"))
        .as[(Long, java.sql.Date, Double)]
    val computed = ds.groupByKey(_._1).flatMapGroups { (id, it) =>
      val rows = it.toArray.sortBy(_._2.getTime)
      val outs = kernel(rows.map(_._3))
      rows.indices.iterator.map { i =>
        (id, rows(i)._2, rows(i)._3, outs.map(_(i)).toSeq)
      }
    }.toDF("id", "dt", "close", "outs")
    val named = outNames.zipWithIndex.map { case (nm, i) =>
      val c = element_at(col("outs"), i + 1)
      when(!isnan(c), c).as(nm)
    }
    computed.select(col("id") +: col("dt") +: col("close") +: named: _*)
  }

  /** EMA columns ema_<n> for each n. */
  def withEma(bars: DataFrame, ns: Seq[Int]): DataFrame =
    applyKernel(bars, ns.map(n => s"ema_$n")) { closes =>
      ns.map(n => TaKernels.ema(closes, n)).toArray
    }

  /** MACD(12,26,9): macd, macd_signal, macd_hist. */
  def withMacd(bars: DataFrame): DataFrame =
    applyKernel(bars, Seq("macd", "macd_signal", "macd_hist")) { closes =>
      val (m, s, h) = TaKernels.macd(closes)
      Array(m, s, h)
    }

  /** RSI(14): rsi_14. */
  def withRsi(bars: DataFrame): DataFrame =
    applyKernel(bars, Seq("rsi_14"))(c => Array(TaKernels.rsi(c)))
}
