package graft.stream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming distribution-drift monitor: per event-time window, the
  * Population Stability Index of the value distribution against a
  * FIXED reference — the production "did the input distribution move"
  * alarm that batch PSI (q231) answers retrospectively; here it fires
  * while the stream runs.
  *
  * Shape constraints that make this a clean append-mode stream:
  *  - bin edges are PLAN-TIME literals, so binning is a CASE column;
  *  - the per-window histogram is ONE watermarked groupBy(window)
  *    with k conditional counts — never a two-level (window, bin)
  *    aggregation (stacked streaming aggs don't compose in append
  *    mode) — so each window emits exactly once, when the watermark
  *    passes its end;
  *  - the reference distribution is a Seq of plan-time probabilities,
  *    so the PSI is a fixed codegen'd expression over the count
  *    columns — no joins, no state beyond the windowed agg's own.
  *
  * PSI = Σ_bins (p_w − p_ref)·ln(p_w/p_ref), both sides floored at
  * ε = 1e-4 (the standard zero-bin smoothing); > 0.2 is the
  * conventional "significant shift" alarm.
  *
  * Works identically over a batch frame (the spec drives both).
  */
object DriftMonitor {

  private val eps = 1e-4

  /** @param values   stream/frame with (ts: timestamp, value: double)
    * @param refProbs reference bin probabilities, size = edges + 1
    * @param binEdges ascending bin edges (k edges → k+1 bins)
    * @return (window_start, n, psi, alert)
    */
  def windowedPsi(values: DataFrame, refProbs: Seq[Double],
      binEdges: Seq[Double], windowLen: String = "1 hour",
      lateness: String = "30 minutes",
      alertAt: Double = 0.2): DataFrame = {
    require(refProbs.size == binEdges.size + 1,
      s"need ${binEdges.size + 1} reference probs, got ${refProbs.size}")
    def binOf(v: Column): Column =
      binEdges.zipWithIndex.foldRight(lit(binEdges.size)) {
        case ((edge, i), elseC) => when(v < edge, lit(i)).otherwise(elseC)
      }
    val binned = values.where(col("value").isNotNull)
      .withColumn("bin", binOf(col("value")))
    val counts = refProbs.indices.map(i =>
      sum(when(col("bin") === i, 1L).otherwise(0L)).as(s"c$i"))
    val agg = binned.withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen).as("w"))
      .agg(counts.head, counts.tail: _*)
    val total = refProbs.indices.map(i => col(s"c$i")).reduce(_ + _)
    val psi = refProbs.zipWithIndex.map { case (pr, i) =>
      val p = greatest(col(s"c$i").cast("double") /
        total.cast("double"), lit(eps))
      val pc = lit(math.max(pr, eps))
      (p - pc) * log(p / pc)
    }.reduce(_ + _)
    agg.select(col("w.start").as("window_start"),
      total.as("n"), psi.as("psi"),
      (psi > lit(alertAt)).as("alert"))
  }
}
