package graft.load

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planner — the table-maintenance pass every
  * partitioned warehouse runs: given a file manifest (partition,
  * file, size), group files into target-sized rewrite bins so one
  * compaction job per bin turns thousands of small files into a few
  * right-sized ones.
  *
  * Packing rule: within each partition, files ordered (size DESC,
  * file_id) — big files first, so a bin never mixes one huge file
  * with a tail of crumbs it didn't need — are assigned
  * `bin = exclusive-prefix-sum(size) div target`. The streaming
  * next-fit discipline guarantees what compaction actually needs:
  * the bin COUNT is ≤ ⌊partition_total / target⌋ + 1 (so output file
  * count tracks data volume), and no bin exceeds target + max_file
  * (so no rewrite job blows its memory budget). Individual bins may
  * undershoot when their predecessor overshot — that slack is the
  * price of a one-window plan with no driver-side loop. All
  * arithmetic is exact 64-bit integer, so the plan is bit-stable
  * across engines and re-runs.
  *
  * Scale shape: the manifest is METADATA — ~10⁶ rows for a 100 TB
  * table — so the one window (partition-keyed exchange + sort) is
  * trivially cheap; the plan never touches data files. Per-bin stats
  * ride the same partitioning (hash on part_key satisfies the
  * (part_key, bin) clustering — no second exchange).
  */
object Compaction {

  /** manifest(part_key, file_id, sz) → one row per file:
    * (part_key, file_id, sz, bin, bin_files, bin_sz).
    */
  def plan(manifest: DataFrame, target: Long): DataFrame = {
    require(target > 0, s"compaction target must be positive: $target")
    val order = Window.partitionBy(col("part_key"))
      .orderBy(col("sz").desc, col("file_id"))
    val prev = order.rowsBetween(Window.unboundedPreceding, -1)
    val binned = manifest
      .withColumn("cum_prev", coalesce(sum(col("sz")).over(prev), lit(0L)))
      .withColumn("bin", expr(s"cum_prev DIV ${target}L")) // exact 64-bit div
      .drop("cum_prev")
    val binW = Window.partitionBy(col("part_key"), col("bin"))
    binned.select(col("part_key"), col("file_id"), col("sz"), col("bin"),
      count(lit(1)).over(binW).cast("int").as("bin_files"),
      sum(col("sz")).over(binW).as("bin_sz"))
  }
}
