package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval × interval OVERLAP join — the third member of the
  * time-join family beside [[AsOf.asOfJoin]] (latest-at-or-before)
  * and [[AsOf.rangeJoin]] (point-in-interval): all pairs of closed
  * intervals on the same key with `max(ls, rs) ≤ min(le, re)`.
  * Session-vs-session, outage-vs-deploy, position-vs-position — any
  * "were these two things active at the same time" question.
  *
  * Spark has no interval-overlap physical operator; the naive theta
  * join degenerates to a per-key cross product. The standard fix
  * (DB2/Postgres range-join literature, the same discipline as
  * [[AsOf.rangeJoin]]): explode each interval to the fixed-width
  * BUCKETS it touches, equi-join on (key, bucket) — only same-bucket
  * candidates pay the exact predicate — and attribute each matched
  * pair at exactly ONE bucket, the one holding the overlap's start
  * (`greatest(ls, rs) div W`), so no distinct/dedup shuffle is ever
  * needed: a pair appears in that bucket iff it overlaps, and in no
  * other attributed bucket.
  *
  * Scale shape: replication factor = interval span / W + 1 (pick W
  * near the typical span; sessions ≈ their gap parameter), then one
  * (key, bucket)-keyed hash equi-join. No window, no cross product,
  * skew bounded by per-bucket live-interval counts.
  */
object IntervalJoin {

  /** left(key, ls, le, …payload) × right(key, rs, re, …payload) →
    * overlapping pairs with all columns from both sides. Bounds are
    * epoch-second (or any integer) closed intervals with ls ≤ le,
    * rs ≤ re; payload column names must not collide across sides.
    */
  def overlaps(left: DataFrame, right: DataFrame, key: String,
      bucketW: Long): DataFrame = {
    require(bucketW > 0, s"bucket width must be positive: $bucketW")
    val l = left.withColumn("bk", explode(sequence(
      expr(s"ls DIV ${bucketW}L"), expr(s"le DIV ${bucketW}L"))))
    val r = right.withColumn("bk", explode(sequence(
      expr(s"rs DIV ${bucketW}L"), expr(s"re DIV ${bucketW}L"))))
    l.join(r, Seq(key, "bk"))
      .where(greatest(col("ls"), col("rs")) <= least(col("le"), col("re")) &&
        col("bk") === expr(s"greatest(ls, rs) DIV ${bucketW}L"))
      .drop("bk")
  }

  /** Union-length of a per-key interval set — "how much time does this
    * key actually cover once overlaps merge": the SLA-uptime /
    * engagement-time statistic naive `sum(end − start)` double-counts.
    * Classic sweep as ONE window pass: intervals sort by (start, end)
    * within the key, a new island opens where `start` exceeds the
    * running max `end` of all PRIOR intervals (closed-interval
    * semantics: touching intervals merge), islands collapse to
    * [min start, max end], and covered = Σ island spans. Exact integer
    * arithmetic end-to-end.
    *
    * Scale shape: one shuffle on the key, one within-key sort shared
    * by both window functions, two bounded aggregates — parallelism =
    * |keys|, no global sort, no self-join (the quadratic formulation
    * this replaces).
    *
    * @param intervals (key, s, e) integer bounds, s ≤ e
    * @return (key, n_intervals, n_islands, covered)
    */
  def unionLength(intervals: DataFrame, key: String = "id",
      startCol: String = "s", endCol: String = "e"): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val isNew = when(prevMax.isNull || col(startCol) > prevMax, 1)
      .otherwise(0)
    intervals
      .withColumn("island",
        sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(key), col("island"))
      .agg(count(lit(1)).as("n"), min(col(startCol)).as("is"),
        max(col(endCol)).as("ie"))
      .groupBy(col(key))
      .agg(sum(col("n")).cast("int").as("n_intervals"),
        count(lit(1)).cast("int").as("n_islands"),
        sum(col("ie") - col("is")).as("covered"))
  }
}
