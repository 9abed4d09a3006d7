package graft.ts

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed application of the recursive kernels ([[TaKernels]]).
  *
  * The reference's shape for these is a per-symbol driver loop with
  * `toPandas()` round-trips (D_Create_crypto_ind_day_001.py:52-59) — a
  * driver bottleneck. The Spark-native shape is
  * `groupByKey(symbol).flatMapGroups` with an in-memory sort of that
  * symbol's series: each group is one symbol's bar history, which is
  * bounded (years × bars/day) regardless of total data volume, so the
  * pass scales horizontally with the number of symbols — the right axis
  * for 100 TB. One shuffle on the symbol key, no driver involvement.
  *
  * NaN is the in-kernel warm-up marker; it is converted back to SQL NULL
  * at the DataFrame edge so downstream semantics match the reference's
  * NULL-until-lookback convention.
  */
object Recursive {

  /** Apply a closes→columns kernel per symbol. Input df must have
    * columns (id: castable to long, tkey: castable to long — any
    * monotone time encoding, e.g. epoch seconds or epoch days —
    * close: double). Output has (id, tkey) ++ outNames, kernel NaNs as
    * NULLs.
    */
  def applyKernel(df: DataFrame, outNames: Seq[String])(
      kernel: Array[Double] => Array[Array[Double]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Long, Double)] =
      df.select(col("id").cast("long"), col("tkey").cast("long"),
          col("close").cast("double"))
        .as[(Long, Long, Double)]
    val computed = ds.groupByKey(_._1).flatMapGroups { (id, it) =>
      val rows = it.toArray.sortBy(_._2)
      val outs = kernel(rows.map(_._3))
      rows.indices.iterator.map { i =>
        (id, rows(i)._2, outs.map(_(i)).toSeq)
      }
    }.toDF("id", "tkey", "outs")
    val named = outNames.zipWithIndex.map { case (nm, i) =>
      val c = element_at(col("outs"), i + 1)
      when(!isnan(c), c).as(nm)
    }
    computed.select(col("id") +: col("tkey") +: named: _*)
  }

  /** All recursive indicators in ONE per-symbol pass: EMA 5/10/30,
    * MACD(12,26,9) line + signal, RSI(14). Output columns named after
    * the reference mart DDL (ddl/hive/crypto_mart/crypto_indicator_day
    * .ddl:12-14,30-35 — including its `macd_single` spelling).
    */
  def withTa(bars: DataFrame): DataFrame =
    applyKernel(bars,
      Seq("ema5", "ema10", "ema30", "macd", "macd_single", "rsi")) { c =>
      val (m, s, _) = TaKernels.macd(c)
      Array(
        TaKernels.ema(c, 5), TaKernels.ema(c, 10), TaKernels.ema(c, 30),
        m, s, TaKernels.rsi(c))
    }
}
