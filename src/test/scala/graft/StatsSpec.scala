package graft

import graft.ops.{EventAnalytics, Scan, Stats}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-checked cases for the statistical-testing / profiling family
  * (Welch t, Mann–Whitney U, OLS, ACF, CUSUM, equi-depth histogram,
  * HLL sketch, BFS, skyline building block, top paths).
  */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("welchT: equal samples give t = 0; known two-sample case") {
    import spark.implicits._
    val same = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val r0 = Stats.welchT(same, "v", "g", "a", "b").collect()(0)
    assert(r0.getAs[Float]("t_stat") == 0.0f)
    assert(r0.getAs[Float]("mean1") == 2.0f)
    // a = {1,2,3,4}, b = {3,4,5}: m1 = 2.5, m2 = 4, v1 = 5/3, v2 = 1,
    // se2 = 5/12 + 1/3 = 0.75 → t = −1.5/√0.75 = −1.7321
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 3.0), ("b", 4.0), ("b", 5.0)).toDF("g", "v")
    val r = Stats.welchT(df, "v", "g", "a", "b").collect()(0)
    assert(r.getAs[Long]("n1") == 4L && r.getAs[Long]("n2") == 3L)
    assert(r.getAs[Float]("t_stat") == -1.7321f)
  }

  test("mannWhitneyU: hand-ranked case with a tie") {
    import spark.implicits._
    // a = {1, 3}, b = {3, 5}: midranks 1, 2.5, 2.5, 4 →
    // R1 = 3.5, U1 = 3.5 − 3 = 0.5
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 3.0), ("b", 5.0))
      .toDF("g", "v")
    val r = Stats.mannWhitneyU(df, "v", "g", "a", "b").collect()(0)
    assert(r.getAs[Double]("u1") == 0.5)
    assert(r.getAs[Float]("z") < 0.0f) // group a sits lower
  }

  test("auc: perfect separation 1.0, inverted 0.0, ties count half") {
    import spark.implicits._
    val sep = Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))
      .toDF("v", "pos")
    assert(Stats.auc(sep, "v", "pos").collect()(0)
      .getAs[Float]("auc") == 1.0f)
    val inv = Seq((1.0, true), (2.0, false)).toDF("v", "pos")
    assert(Stats.auc(inv, "v", "pos").collect()(0)
      .getAs[Float]("auc") == 0.0f)
    // positives {1, 2}, negatives {1, 0}: pairs (1,1)=0.5 (1,0)=1
    // (2,1)=1 (2,0)=1 → AUC = 3.5/4 = 0.875
    val tie = Seq((1.0, true), (1.0, false), (2.0, true), (0.0, false))
      .toDF("v", "pos")
    val r = Stats.auc(tie, "v", "pos").collect()(0)
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 2L)
    assert(r.getAs[Float]("auc") == 0.875f)
  }

  test("olsFit: exact line recovers slope/intercept with r2 = 1") {
    import spark.implicits._
    // y = 2x + 1 exactly
    val df = Seq(("g", 1.0, 3.0), ("g", 2.0, 5.0), ("g", 3.0, 7.0),
      ("g", 4.0, 9.0)).toDF("grp", "x", "y")
    val r = Stats.olsFit(df, "x", "y", "grp").collect()(0)
    assert(r.getAs[Float]("slope") == 2.0f)
    assert(r.getAs[Float]("intercept") == 1.0f)
    assert(r.getAs[Float]("r2") == 1.0f)
  }

  test("acf: a strictly alternating series reads r = -1 at lag 1") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i, if (i % 2 == 0) 1.0 else 3.0))
      .toDF("k", "v")
    val r = Stats.acf(df, "k", "v", 2).collect()
    assert(r(0).getAs[Float]("r") == -1.0f) // lag 1: perfect flip
    assert(r(1).getAs[Float]("r") == 1.0f)  // lag 2: perfect repeat
    assert(r(0).getAs[Long]("n_pairs") == 9L)
  }

  test("cusumChangepoint: locates a planted level shift exactly") {
    import spark.implicits._
    // 5 days at 10, then 5 days at 20: |S_k| peaks at k = 5
    val df = (1 to 10).map(i => (i, if (i <= 5) 10.0 else 20.0))
      .toDF("day", "v")
    val r = Stats.cusumChangepoint(df, "day", "v").collect()(0)
    assert(r.getAs[Long]("n_points") == 10L)
    assert(r.getAs[Int]("cp_key") == 5)
    // S_5 = 5·10 − 5·15 = −25
    assert(r.getAs[Float]("s_at_cp") == -25.0f)
  }

  test("equiDepthHist: ~n/B rows per bucket, ties never straddle") {
    import spark.implicits._
    val df = ((1 to 40).map(_.toDouble) ++ Seq.fill(40)(99.0)).toDF("v")
    val h = Scan.equiDepthHist(df, "v", 4).orderBy("bucket").collect()
    assert(h.length == 3) // the 40-row tie at 99 collapses buckets 2+3
    assert(h.map(_.getAs[Long]("n_rows")).sum == 80L)
    // the tied value lands WHOLE in bucket ⌊40·4/80⌋ = 2
    assert(h(2).getAs[Int]("bucket") == 2 &&
      h(2).getAs[Long]("n_rows") == 40L)
  }

  test("hll: register frame merges under max; estimate within ~5%") {
    import spark.implicits._
    val df = (1 to 2000).map(i => ("k", i.toLong)).toDF("g", "u")
    val est = graft.functions.HllFrame
      .distinctEstimate(df, Seq("g"), col("u")).collect()(0)
    val e = est.getAs[Float]("est")
    assert(e > 1800 && e < 2300, s"estimate $e far from 2000")
    // sketch property: registers of (A ∪ B) = register-wise max —
    // estimating from unioned register frames equals the direct run
    val a = df.where(col("u") <= 1200)
    val b = df.where(col("u") > 800)
    val merged = graft.functions.HllFrame
      .registers(a, Seq("g"), col("u"))
      .unionByName(graft.functions.HllFrame.registers(b, Seq("g"), col("u")))
      .groupBy("g", "reg").agg(max("mr").as("mr"))
    val viaMerge = graft.functions.HllFrame.estimate(merged, Seq("g"))
      .collect()(0).getAs[Float]("est")
    assert(viaMerge == e)
  }

  test("bfs: hop distances on a path graph, unreached = -1") {
    import spark.implicits._
    val nodes = (1L to 6L).toDF("id")
    // path 1-2-3-4-5, isolated 6; symmetrize
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (e0 ++ e0.map(_.swap)).toDF("a", "b")
    val r = graft.graph.Bfs.hops(nodes, edges, Seq(1L).toDF("id"), 3)
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> -1, 6L -> -1))
  }

  test("sssp: cheap long path beats short heavy edge; round bound; unreached") {
    import spark.implicits._
    val nodes = (1L to 6L).toDF("id")
    // 1→2 direct costs 10; 1→3→4→2 costs 1+1+1 = 3 but needs 3 rounds;
    // 5 hangs off 2; 6 isolated. Symmetrize.
    val e0 = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 4L, 1L),
      (4L, 2L, 1L), (2L, 5L, 2L))
    val edges = (e0 ++ e0.map(t => (t._2, t._1, t._3)))
      .toDF("a", "b", "len")
    def run(r: Int) = graft.graph.Sssp
      .distances(nodes, edges, Seq(1L).toDF("id"), r)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // 2 rounds: the 3-edge detour is out of radius → 2 keeps cost 10
    assert(run(2) == Map(1L -> 0, 2L -> 10, 3L -> 1, 4L -> 2,
      5L -> 12, 6L -> -1))
    // 3 rounds: detour lands (3), and 5 improves through it next round
    val d3 = run(3)
    assert(d3(2L) == 3 && d3(4L) == 2 && d3(5L) == 12)
    assert(run(4)(5L) == 5)
  }

  test("weightedQuantiles: weight pulls the median; ties collapse first") {
    import spark.implicits._
    // values 1..4 with weight 1 except v=4 carrying weight 7:
    // total 10 → p50 lands on v=4 (cum 1,2,3,10)
    val df = Seq(("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 1.0),
      ("g", 4.0, 7.0)).toDF("grp", "v", "w")
    val r = Stats.weightedQuantiles(df, "v", "w", "grp", Seq(50, 90))
      .collect()(0)
    assert(r.getAs[Double]("total_w") == 10.0)
    assert(r.getAs[Double]("q50") == 4.0 && r.getAs[Double]("q90") == 4.0)
    // unweighted lower median of {1,2,3,4} for contrast: v=2
    val u = Stats.weightedQuantiles(df.withColumn("w", lit(1.0)),
      "v", "w", "grp", Seq(50)).collect()(0)
    assert(u.getAs[Double]("q50") == 2.0)
  }

  test("modeBy: most frequent wins; tie resolves to the smallest value") {
    import spark.implicits._
    val df = Seq(("a", 2.0), ("a", 2.0), ("a", 1.0),
      ("b", 5.0), ("b", 3.0)).toDF("g", "v")
    val r = Stats.modeBy(df, "v", "g").collect()
      .map(x => x.getString(0) -> (x.getAs[Double]("mode"),
        x.getAs[Long]("n"))).toMap
    assert(r("a") == (2.0, 2L))
    assert(r("b") == (3.0, 1L)) // 1-1 tie → smaller value
  }

  test("newVsReturning: first day is new, second is returning; curve sums") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    def ts(d: Int) = new java.sql.Timestamp(base.getTime + d * 86400000L)
    val df = Seq((1L, ts(0)), (1L, ts(1)), (2L, ts(1)), (2L, ts(1)))
      .toDF("user_id", "ts")
    val r = EventAnalytics.newVsReturning(df).orderBy("day").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Long]("n_new") == 1L &&
      r(0).getAs[Long]("n_returning") == 0L)
    assert(r(1).getAs[Long]("n_active") == 2L &&
      r(1).getAs[Long]("n_new") == 1L &&
      r(1).getAs[Long]("n_returning") == 1L &&
      r(1).getAs[Long]("cum_users") == 2L)
  }

  test("anovaF: identical groups read F = 0; separated groups explode F") {
    import spark.implicits._
    val same = Seq(("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0))
      .toDF("g", "v")
    val r0 = Stats.anovaF(same, "v", "g").collect()(0)
    assert(r0.getAs[Float]("ss_between") == 0.0f &&
      r0.getAs[Float]("f_stat") == 0.0f)
    // a = {1, 2}, b = {11, 12}: SSB = 100, SSW = 1, F = 100/(1/2) = 200
    val sep = Seq(("a", 1.0), ("a", 2.0), ("b", 11.0), ("b", 12.0))
      .toDF("g", "v")
    val r = Stats.anovaF(sep, "v", "g").collect()(0)
    assert(r.getAs[Int]("k") == 2 && r.getAs[Long]("n") == 4L)
    assert(r.getAs[Float]("ss_between") == 100.0f)
    assert(r.getAs[Float]("ss_within") == 1.0f)
    assert(r.getAs[Float]("f_stat") == 200.0f)
  }

  test("spearman: monotone nonlinear reads 1; reversed reads -1") {
    import spark.implicits._
    val mono = Seq((1.0, 1.0), (2.0, 4.0), (3.0, 9.0), (4.0, 16.0))
      .toDF("x", "y")
    assert(Stats.spearman(mono, "x", "y").collect()(0)
      .getAs[Float]("rho") == 1.0f)
    val rev = Seq((1.0, 16.0), (2.0, 9.0), (3.0, 4.0), (4.0, 1.0))
      .toDF("x", "y")
    assert(Stats.spearman(rev, "x", "y").collect()(0)
      .getAs[Float]("rho") == -1.0f)
  }

  test("globalPercentRank: min-rank ties, pct at the extremes") {
    import spark.implicits._
    val df = Seq((1L, 10.0), (2L, 20.0), (3L, 20.0), (4L, 30.0), (5L, 40.0))
      .toDF("id", "v")
    val r = Scan.globalPercentRank(df, "id", "v").orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getFloat(3)))
    assert(r.toSeq == Seq((1L, 1L, 0.0f), (2L, 2L, 0.25f), (3L, 2L, 0.25f),
      (4L, 4L, 0.75f), (5L, 5L, 1.0f)))
  }

  test("topPaths: orders within session and ranks deterministically") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(base.getTime + s * 1000)
    val df = Seq(
      (1L, ts(0), 1L, "view"), (1L, ts(10), 2L, "click"),
      (2L, ts(0), 3L, "view"), (2L, ts(5), 4L, "click"),
      (3L, ts(0), 5L, "view"),
      // user 1's second session (past the gap)
      (1L, ts(100000), 6L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = EventAnalytics.topPaths(df, 3600L, 10).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    // tie on n → lexicographic path ascending ("view" < "view>click")
    assert(r.toSeq == Seq(("view", 2L), ("view>click", 2L)))
  }
}
