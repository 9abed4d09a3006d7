package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch expressed AS A DATAFRAME — the Spark-first
  * formulation of the classic frequency sketch: instead of a custom
  * aggregation buffer, each input key explodes to `d` (row, bucket)
  * coordinates (bucket_j = md5("j:" + key) high 16 bits mod `w`) and
  * one hash aggregate sums weights per coordinate. The result is a
  * table of AT MOST d·w rows — bounded regardless of input
  * cardinality, partially aggregated map-side, and mergeable across
  * days/streams by unioning sketch frames and re-summing (the
  * coordinate grid is fixed by construction).
  *
  * Point estimates are the standard CM upper bound: for a key,
  * `min_j cell(j, bucket_j(key))` — always ≥ the true count, equal
  * when any of the key's d cells is collision-free. Everything is
  * md5-deterministic, so even the ESTIMATES sit under a full DuckDB
  * hash-gate oracle (the same grid and minima re-derived in SQL).
  *
  * The 100 TB story: exact per-key counting of an unbounded key space
  * (URLs, shingles, user ids) shuffles every distinct key;
  * the sketch shuffles ≤ d·w coordinate rows per partition, and the
  * estimate join broadcasts the d·w-row sketch — one scan, O(d·w)
  * state, error ≤ N·e/w with probability 1−e^−d.
  */
object CountMinFrame {

  /** bucket_j for a key column under row salt `j` (md5 high 16 bits
    * mod `w` — the same re-derivable hash family every deterministic
    * operator here uses).
    */
  private def bucket(key: Column, j: Int, w: Int): Column =
    (conv(substring(md5(concat(lit(s"$j:"), key)), 1, 4), 16, 10)
      .cast("int") % w).cast("int")

  /** Build the sketch: one row per touched (row, bucket) coordinate
    * with the summed weight. `weighted` rows may repeat keys; pass a
    * weight of 1 for plain counting.
    *
    * @return (cm_row, cm_bucket, cm_count) — ≤ d·w rows
    */
  def sketch(keyed: DataFrame, key: Column, weight: Column,
      d: Int = 4, w: Int = 64): DataFrame = {
    require(d > 0 && w > 0, "count-min needs d > 0 and w > 0")
    val rows = (0 until d).map(j =>
      struct(lit(j).as("cm_row"), bucket(key, j, w).as("cm_bucket")))
    keyed.where(key.isNotNull)
      .select(explode(array(rows: _*)).as("c"), weight.as("wt"))
      .groupBy(col("c.cm_row"), col("c.cm_bucket"))
      .agg(sum(col("wt")).as("cm_count"))
  }

  /** Point-estimate the counts of `probes`' `key` column against a
    * built sketch: the minimum of the key's d cells (absent cells are
    * 0 — the key was never touched). The sketch side is ≤ d·w rows, so
    * the join broadcasts; the probe side streams at any size.
    *
    * @return probes + (cm_est) — the CM upper bound per probe row
    */
  def estimate(probes: DataFrame, key: Column, cm: DataFrame,
      d: Int = 4, w: Int = 64): DataFrame = {
    val rows = (0 until d).map(j =>
      struct(lit(j).as("cm_row"), bucket(key, j, w).as("cm_bucket")))
    probes.where(key.isNotNull)
      .select(probes.columns.map(col) :+
        explode(array(rows: _*)).as("c"): _*)
      .join(broadcast(cm),
        col("c.cm_row") === cm("cm_row") &&
          col("c.cm_bucket") === cm("cm_bucket"), "left")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("cm_count"), lit(0L))).as("cm_est"))
  }
}
