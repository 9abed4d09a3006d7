package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the analytics extension pack (value parity
  * with DuckDB is the oracle gate's job).
  */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sessionize splits on the gap and only on the gap") {
    import spark.implicits._
    // user 1: 3 events in one session, then a 7h gap → second session;
    // user 2: single event
    val ev = Seq(
      (1L, 1000L, 10L, 1.0), (1L, 2000L, 11L, 2.0), (1L, 3000L, 12L, 3.0),
      (1L, 3000L + 25201L, 13L, 4.0),
      (2L, 500L, 14L, 5.0))
      .toDF("user_id", "ts_s", "event_id", "value")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"),
        col("event_id"), col("value"))
    // replicate the registered pipeline on the in-memory frame (the
    // registered query is fixture-dir-bound; the oracle gate covers it)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_s", "event_id")
    val e2 = ev.select(col("user_id"), col("ts").cast("long").as("ts_s"),
      col("event_id"), col("value"))
    val prev = lag(col("ts_s"), 1).over(w)
    val isNew = when(prev.isNull ||
      col("ts_s") - prev > graft.queries.Analytics.sessionGapS, 1L).otherwise(0L)
    val sess = e2.withColumn("sid", sum(isNew).over(w))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n"), min("ts_s").as("start_s"))
      .orderBy("user_id", "sid").collect()
    assert(sess.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 1L, 3L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("rollup emits detail, subtotal and grand-total levels") {
    val out = graft.queries.Analytics
      .queries("q16_rollup")(spark, "/root/testdata/sf0.001")
    val gids = out.select("gid").distinct().collect().map(_.getInt(0)).toSet
    assert(gids == Set(0, 1, 3))
    val grand = out.filter(col("gid") === 3).collect()
    assert(grand.length == 1)
    val detailN = out.filter(col("gid") === 0)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(grand(0).getLong(3) == detailN) // grand total n == sum of details
  }

  test("pivot columns carry per-type averages") {
    val out = graft.queries.Analytics
      .queries("q17_pivot")(spark, "/root/testdata/sf0.001")
    assert(out.columns.toSeq ==
      Seq("user_bucket", "click", "view", "purchase", "signup", "error"))
    assert(out.count() <= 10)
  }

  test("percentiles are ordered p50 <= p90 <= p99") {
    val rows = graft.queries.Analytics
      .queries("q15_percentiles")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getFloat(2) <= r.getFloat(3) && r.getFloat(3) <= r.getFloat(4))
    }
  }

  test("quantile sketch: partition-invariant merge; estimates near exact") {
    import graft.functions.BottomKByHash
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    def sketch(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("event_type")
        .agg(BottomKByHash(col("value"), col("event_id"), 200).as("vs"))
        .collect()
        .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    // merge is associative+commutative: any partitioning (and thus any
    // partial-aggregation split) yields the identical sample
    val a = sketch(ev)
    val b = sketch(ev.repartition(7, col("event_id")))
    val c = sketch(ev.coalesce(1))
    assert(a == b && b == c && a.nonEmpty)
    // accuracy: sampled median within 15% of the exact p50 per group
    val exact = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.5D)").as("p50")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    a.foreach { case (g, vs) =>
      val s = vs.sorted
      val est = s((0.5 * (s.length - 1)).floor.toInt)
      assert(math.abs(est - exact(g)) <= 0.15 * math.abs(exact(g)),
        s"group $g: est $est vs exact ${exact(g)}")
    }
  }

  test("quantile sketch: duplicate row keys collapse to one min-value slot") {
    import spark.implicits._
    import graft.functions.BottomKByHash
    // key 1 appears three times with different values; with k = 2 the
    // buffer must neither shrink below its capacity nor depend on
    // which duplicate arrives first: one slot for key 1 holding the
    // MIN value, one slot for the next-smallest hash
    val rows = Seq((1L, 9.0), (1L, 3.0), (1L, 5.0),
      (2L, 7.0), (3L, 8.0), (4L, 6.0))
    def sketch(df: org.apache.spark.sql.DataFrame): Seq[Double] =
      df.agg(BottomKByHash(col("v"), col("id"), 2).as("vs"))
        .collect()(0).getSeq[Double](0)
    val base = sketch(rows.toDF("id", "v"))
    assert(base.length == 2)
    assert(base.contains(3.0)) // key 1's min survives, not 9.0 or 5.0
    // arrival order and partitioning don't change the sample
    assert(sketch(rows.reverse.toDF("id", "v")) == base)
    assert(sketch(rows.toDF("id", "v").repartition(3, col("id"))) == base)
  }

  test("kmv distinct: exact below k, bounded error above, partition-invariant") {
    import spark.implicits._
    import graft.functions.BottomKByHash
    // 2000 rows over 700 distinct keys (duplicates must not bias the
    // estimate — the sketch collapses them before the k-th hash is read)
    val df = (0 until 2000).map(i => (i.toLong, s"v${i % 700}"))
      .toDF("id", "v")
    def est(d: org.apache.spark.sql.DataFrame, k: Int): Double =
      d.agg(BottomKByHash.kmvDistinct(col("v"), k)).collect()(0).getDouble(0)
    // k above the true cardinality → the sample IS the distinct set
    assert(est(df, 1024) == 700.0)
    // k = 256 → estimator path; stderr ≈ 1/√k ≈ 6.3%, assert 4σ
    val e = est(df, 256)
    assert(math.abs(e - 700.0) / 700.0 < 0.25, s"kmv estimate $e")
    // deterministic under re-partitioning (merge-order invariance)
    assert(est(df.repartition(13, col("id")), 256) == e)
    assert(est(df.coalesce(1), 256) == e)
    // NULL keys are skipped, not counted
    val withNulls = df.union(Seq((9999L, null.asInstanceOf[String]))
      .toDF("id", "v"))
    assert(est(withNulls, 1024) == 700.0)
  }

  test("count-min frame: bounded grid, exact without collisions, mergeable") {
    import spark.implicits._
    import graft.functions.CountMinFrame
    val keys = (0 until 1000).map(i => s"k${i % 10}").toDF("k")
    val cm = CountMinFrame.sketch(keys, col("k"), lit(1L), d = 4, w = 256)
    assert(cm.count() <= 4L * 256)
    val probes = (0 until 10).map(i => s"k$i").toDF("k")
    val est = CountMinFrame.estimate(probes, col("k"), cm, d = 4, w = 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 10 keys in 256 buckets × 4 rows: every key has a collision-free
    // cell, so the CM upper bound is exactly the true count (md5 is
    // fixed — this is a deterministic property of the fixture, not luck)
    (0 until 10).foreach(i => assert(est(s"k$i") == 100L, s"k$i: $est"))
    // mergeable: two half-sketches unioned and re-summed == one pass
    val a = CountMinFrame.sketch((0 until 500).map(i => s"k${i % 10}")
      .toDF("k"), col("k"), lit(1L), d = 4, w = 256)
    val b = CountMinFrame.sketch((500 until 1000).map(i => s"k${i % 10}")
      .toDF("k"), col("k"), lit(1L), d = 4, w = 256)
    val merged = a.unionByName(b).groupBy("cm_row", "cm_bucket")
      .agg(sum("cm_count").as("cm_count"))
    assert(merged.collect().toSet == cm.collect().toSet)
    // partition invariance of the one-pass build
    val cm2 = CountMinFrame.sketch(keys.repartition(13, col("k")),
      col("k"), lit(1L), d = 4, w = 256)
    assert(cm2.collect().toSet == cm.collect().toSet)
  }
}
