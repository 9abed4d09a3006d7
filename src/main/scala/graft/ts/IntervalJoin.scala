package graft.ts

import org.apache.spark.sql.DataFrame
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
}
