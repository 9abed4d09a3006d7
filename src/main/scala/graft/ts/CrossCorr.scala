package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pairwise LEAD-LAG cross-correlation of daily returns — the quant
  * screen for "does symbol A's move today predict symbol B's move in
  * k days": Pearson correlation of r_A(t) against r_B(t+k) for each
  * symbol pair and each lag in `lags`.
  *
  * Returns (close/prev − 1), not raw closes — the stationary series
  * correlation is meaningful on. The correlation is computed from the
  * five raw sums with the textbook formula (NOT the engines' builtin
  * corr(), whose accumulation algorithms differ) so both engines
  * evaluate the same IEEE expression over the same inputs; variance
  * terms are guarded above 1e-12, which cleanly separates real
  * variance from summation ulp noise on a degenerate constant-return
  * series.
  *
  * Scale shape: returns are one symbol-keyed window pass; the pair
  * frame joins on the DATE key with the lag pre-exploded on one side
  * — per-date fan-out is |symbols|²·|lags|, so cost scales with the
  * symbol universe squared (the correct axis: cross-correlation IS a
  * pairwise statistic) and linearly in history; the correlation
  * itself is one hash aggregate keyed (pair, lag) with map-side
  * partials.
  */
object CrossCorr {

  /** bars(id, dt, close) → (id_a, id_b, k, n, corr) for id_a < id_b,
    * r_B shifted k days forward; pairs/lags with fewer than `minObs`
    * matched days (or degenerate variance) are dropped/NULL.
    */
  def leadLag(bars: DataFrame, lags: Seq[Int] = Seq(-2, -1, 0, 1, 2),
      minObs: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("dt"))
    // a zero prior close makes the return undefined (and faults ANSI
    // division) — such bars are degenerate data, guarded to NULL and
    // dropped exactly like the series head (sf0.1 has one such bar)
    val prev = lag(col("close"), 1).over(w)
    val rets = bars
      .withColumn("r", when(prev =!= 0, col("close") / prev - 1))
      .where(col("r").isNotNull)
      .select(col("id"), col("dt"), col("r"))
      .localCheckpoint(true) // both sides of the pair join
    // pair r_A(t) with r_B(t + k): B's row at dt matches A's date
    // dt − k, so positive k asks "does A's move predict B's k days on"
    val bSide = rets
      .withColumn("k", explode(array(lags.map(lit): _*)))
      .select(col("id").as("id_b"), col("k"),
        date_add(col("dt"), -col("k")).as("mdt"), col("r").as("rb"))
    val joined = rets.as("a").join(bSide,
        col("a.dt") === col("mdt") && col("a.id") < col("id_b"))
      .select(col("a.id").as("id_a"), col("id_b"), col("k"),
        col("a.r").as("ra"), col("rb"))
    val agg = joined.groupBy(col("id_a"), col("id_b"), col("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("ra")).as("sx"), sum(col("rb")).as("sy"),
        sum(col("ra") * col("rb")).as("sxy"),
        sum(col("ra") * col("ra")).as("sxx"),
        sum(col("rb") * col("rb")).as("syy"))
      .where(col("n") >= minObs)
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    agg.select(col("id_a"), col("id_b"), col("k"),
      col("n").cast("int").as("n"),
      when(vx > 1e-12 && vy > 1e-12,
        round(num / sqrt(vx * vy), 4)).cast("float").as("corr"))
  }
}
