package graft

import graft.load.Bucketing
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed tables must co-locate their join: equal bucketing on both
  * sides removes BOTH exchanges from the SortMergeJoin plan — the
  * difference between shuffling 100 TB twice per mart build and
  * shuffling it never.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The in-memory catalog dies with the JVM but spark-warehouse/
    * survives; clear both so reruns don't trip LOCATION_ALREADY_EXISTS.
    */
  private def resetTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(s"spark-warehouse/$name"))
  }

  test("equal-bucketed tables join with zero shuffle exchanges") {
    import spark.implicits._
    val left = (1L to 1000L).map(i => (i, s"sym${i % 7}", i * 1.5))
      .toDF("id", "sym", "px")
    val right = (1L to 1000L).map(i => (i, i % 3 == 0))
      .toDF("id", "flag")
    resetTable("b_left")
    resetTable("b_right")
    Bucketing.writeBucketed(left, "b_left", Seq("id"), 4)
    Bucketing.writeBucketed(right, "b_right", Seq("id"), 4)
    val joined = Bucketing.readBucketed(spark, "b_left")
      .join(Bucketing.readBucketed(spark, "b_right"), "id")
      .where(col("flag"))
    // disable broadcast so the join would otherwise be a shuffle SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      assert(joined.count() == 333)
      val executed = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = executed.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty,
        s"expected a shuffle-free bucketed join, got:\n$executed")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("unbucketed baseline DOES shuffle (the thing bucketing removes)") {
    import spark.implicits._
    val left = (1L to 1000L).map(i => (i, i * 1.5)).toDF("id", "px")
    val right = (1L to 1000L).map(i => (i, i % 3 == 0)).toDF("id", "flag")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = left.join(right, "id").where(col("flag"))
      assert(joined.count() == 333)
      val executed = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      assert(executed.collect { case s: ShuffleExchangeExec => s }.nonEmpty)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
