package graft.load

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned, co-located) table writes — the shuffle
  * elimination lever for repeated large⋈large joins.
  *
  * The reference joins its raw and derived candle tables on (id, dt)
  * in every mart build (e.g.
  * /root/reference/modules/dbt/crypto_etl_pjr/models/crypto/marts/
  * crypto_indicator_day_001.sql joins hist×ind on id+dt); at 100 TB
  * each such join is a full shuffle of both sides UNLESS the tables
  * were written bucketed on the join key: then Spark's scan reports
  * the hash-partitioning and the SortMergeJoin runs with ZERO
  * Exchange on either side (BucketingSpec proves it on the plan).
  *
  * Bucket count is fixed at write time — size it so one bucket of the
  * LARGEST table fits an executor core's working set (buckets ≈
  * table_bytes / 128 MB, rounded to a power of two), and keep it
  * identical across co-joined tables: equal bucketing on both sides is
  * what lets the join skip both exchanges.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table in the session
    * catalog. Sorting by the bucket key inside each bucket additionally
    * lets SortMergeJoin skip its per-task sort.
    */
  def writeBucketed(df: DataFrame, table: String, key: Seq[String],
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key.head, key.tail: _*)
      .sortBy(key.head, key.tail: _*)
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata rides the catalog). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
