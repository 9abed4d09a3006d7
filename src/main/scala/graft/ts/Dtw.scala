package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftSqlShims
import org.apache.spark.sql.functions._

/** Dynamic-time-warping similarity between symbols' bar series — the
  * elastic distance that matches price *shapes* even when moves are
  * time-shifted or stretched (lead–lag pairs the fixed-offset
  * cross-correlation of q189 cannot align). Classic Sakoe–Chiba
  * banded DTW over closes quantized to an exact 1e-4 integer grid,
  * computed by the native [[graft.functions.DtwDistance]] kernel so
  * every cell of the DP is exact 64-bit arithmetic and the whole
  * matrix replays bit-identically in the oracle's anti-diagonal
  * recursive CTE.
  *
  * Scale shape: the quadratic is confined three ways — (1) per-pair
  * cost is banded O(len·(2w+1)), not len²; (2) the pair space is a
  * watchlist×cohort cut (the q189 bounded-contract discipline), with
  * the small watchlist side BROADCAST under a nested-loop join so the
  * cohort side never shuffles; (3) series are per-symbol bounded
  * (bars/symbol is years×grain regardless of corpus size), built by
  * one hash aggregation with map-side partials. No global sort, no
  * all-pairs surface.
  *
  * Determinism: (id, t) is unique so `array_sort` on (t, close)
  * structs pins series order; quantization is the shared
  * floor(x·1e4+0.5) grid; the DP is integer min/sum arithmetic.
  */
object Dtw {

  /** Per-symbol quantized close series: (id, q, len). */
  def series(bars: DataFrame): DataFrame =
    bars.groupBy(col("id")).agg(
      transform(
        array_sort(collect_list(struct(col("t"), col("close")))),
        s => floor(s("close") * 1e4 + 0.5).cast("long")).as("q"),
      count(lit(1)).cast("int").as("len"))

  /** Banded DTW distance for every (watchlist × cohort) symbol pair.
    *
    * @param bars  (id, t, close) bar frame (e.g. [[Bars.hourly]])
    * @param predA watchlist predicate over `id` (small side, broadcast)
    * @param predB cohort predicate over `id`
    * @param wBase band half-width before the |Δlen| widening
    * @return (id_a, id_b, len_a, len_b, dtw) — dtw exact BIGINT in
    *         1e-4 price units
    */
  def pairDistances(bars: DataFrame, predA: Column, predB: Column,
      wBase: Int = 6): DataFrame = {
    val ser = series(bars)
    val a = ser.where(predA).select(col("id").as("id_a"),
      col("q").as("qa"), col("len").as("len_a"))
    val b = ser.where(predB).select(col("id").as("id_b"),
      col("q").as("qb"), col("len").as("len_b"))
    b.crossJoin(broadcast(a))
      .select(col("id_a"), col("id_b"), col("len_a"), col("len_b"),
        GraftSqlShims.column(graft.functions.DtwDistance(
          GraftSqlShims.expression(col("qa")),
          GraftSqlShims.expression(col("qb")), wBase)).as("dtw"))
  }
}
