package graft

import graft.ops.EventAnalytics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for triangle counting and the event-flow trio
  * (funnel / retention / transitions); DuckDB parity is the oracle
  * gate's job.
  */
class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("triangles: K4 plus a pendant, degree-oriented == known counts") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles, each node in 3) + pendant 5–1
    val k4 = for (a <- 1 to 4; b <- 1 to 4 if a < b) yield (a.toLong, b.toLong)
    val edges = (k4 :+ (1L, 5L)).toDF("a", "b")
    val r = graft.graph.Triangles.perNode(edges).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L))
  }

  test("modularity: two triangles + bridge, exact known Q") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6}, bridge 3–4; M (directed) = 14;
    // per community e_c = 6, d_c = 7 →
    // contrib = (14·6 − 49)/196 = 35/196, Q = 70/196 ≈ 0.357143
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("a", "b")
    val labels = Seq((1L, "A"), (2L, "A"), (3L, "A"),
      (4L, "B"), (5L, "B"), (6L, "B")).toDF("id", "community")
    val r = graft.graph.Modularity.byPartition(edges, labels).collect()
    assert(r.length == 2)
    r.foreach { row =>
      assert(row.getInt(1) == 3)          // n_nodes
      assert(row.getLong(2) == 7L)        // deg_sum
      assert(row.getLong(3) == 6L)        // intra (directed)
      assert(row.getFloat(4) == 0.178571f) // 35/196 floor-rounded
      assert(row.getFloat(5) == 0.357143f) // Q
    }
    // the all-one-community partition scores 1 − Σ(d/M)² = 0 exactly
    // only for a single community covering everything: Q = 1 − 1 = 0
    val one = labels.select($"id", lit("X").as("community"))
    val q1 = graft.graph.Modularity.byPartition(edges, one).collect()
    assert(q1.length == 1 && q1(0).getFloat(5) == 0.0f)
  }

  test("triangles: direction/duplicate/self-loop noise is ignored") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L),
      (2L, 3L)).toDF("a", "b")
    val r = graft.graph.Triangles.perNode(edges).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("clustering coefficient: triangle corner=1, pendant=0, K4=1") {
    import spark.implicits._
    // triangle {1,2,3} + pendant 4–1: nodes 2,3 have d=2 coef 1.0;
    // node 1 has d=3, 1 triangle → 2·1/(3·2) = 0.3333; node 4 d=1 → 0
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)).toDF("a", "b")
    val r = graft.graph.Triangles.clusteringCoef(edges).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getFloat(3)))).toMap
    assert(r(1L) == ((3L, 1L, 0.3333f)))
    assert(r(2L) == ((2L, 1L, 1.0f)))
    assert(r(3L) == ((2L, 1L, 1.0f)))
    assert(r(4L) == ((1L, 0L, 0.0f)))
  }

  test("cdc novelty: a revision re-admits only its edited chunks") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col => c}
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    // old corpus: doc 1 (base) + doc 2 (unrelated); new: doc 3 is a
    // head-edited revision of doc 1, doc 6 is entirely fresh
    val docs = Seq(
      (1L, base), (2L, (1 to 40).map(i => s"u$i").mkString(" ")),
      (3L, "EDIT " + base), (6L, (1 to 40).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r = graft.llm.Dedup.cdcNovelty(docs, id => id % 3 === 0)
      .collect().map(x => x.getLong(0) ->
        ((x.getInt(1), x.getInt(2), x.getFloat(3)))).toMap
    assert(r.keySet == Set(3L, 6L))
    val (n3, novel3, ratio3) = r(3L)
    assert(novel3 <= 1 && n3 >= 3, s"revision re-admitted $novel3/$n3")
    assert(ratio3 < 0.5f)
    val (n6, novel6, ratio6) = r(6L)
    assert(novel6 == n6 && ratio6 == 1.0f)
  }

  test("rolling z-score: spike flags, warm-up and flat windows NULL") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col => c}
    // symbol 1: 24 bars oscillating ±1 around 100, then a 200 spike;
    // symbol 2: constant (std 0 → NULL score)
    val bars = ((1 to 24).map(i =>
        (1L, s"2024-01-${"%02d".format(i)}", 100.0 + (i % 2))) :+
        (1L, "2024-01-25", 200.0)) ++
      (1 to 21).map(i => (2L, s"2024-01-${"%02d".format(i)}", 5.0))
    val df = bars.toDF("id", "dt", "close")
      .select(c("id"), c("dt").cast("date").as("dt"), c("close"))
    val r = graft.ts.Anomaly.rollingZ(df)
    val rows = r.where(c("id") === 1).orderBy(c("dt")).collect()
    assert(rows.take(19).forall(_.isNullAt(5))) // warm-up: z NULL
    assert(rows.last.getBoolean(6)) // the spike flags
    assert(rows.dropRight(1).drop(19).forall(!_.getBoolean(6)))
    val flat = r.where(c("id") === 2 && !c("z").isNull).count()
    assert(flat == 0) // zero variance never scores
  }

  test("funnel: completion, partial drop-off, and window cutoff") {
    import spark.implicits._
    // u1 completes inside the window; u2 stops at click; u3's purchase
    // lands outside the window; u4 purchases BEFORE clicking (order
    // violation -> not counted)
    val ev = Seq(
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase"),
      (2L, 100L, "view"), (2L, 200L, "click"),
      (3L, 100L, "view"), (3L, 200L, "click"), (3L, 2000L, "purchase"),
      (4L, 100L, "view"), (4L, 150L, "purchase"), (4L, 200L, "click"))
      .toDF("user_id", "t", "event_type")
      .select(col("user_id"), col("t").cast("timestamp").as("ts"),
        col("event_type"))
    val r = EventAnalytics.funnel(ev, Seq("view", "click", "purchase"), 900L)
      .collect().map(x => x.getLong(0) ->
        ((x.getInt(4), x.getBoolean(5)))).toMap
    assert(r(1L) == ((3, true)))
    assert(r(2L) == ((2, false)))
    assert(r(3L) == ((2, false))) // purchase at t=2000 > 100+900
    assert(r(4L) == ((2, false))) // purchase precedes click
  }

  test("retention: cohorts by first day, offsets count distinct users") {
    import spark.implicits._
    val day = 86400L
    val ev = Seq(
      (1L, 0L), (1L, 2 * day), (1L, 2 * day + 5),  // day0 cohort, back d2
      (2L, 0L),                                    // day0 cohort only
      (3L, day), (3L, 2 * day))                    // day1 cohort, back d1
      .toDF("user_id", "t")
      .select(col("user_id"), col("t").cast("timestamp").as("ts"))
    val r = EventAnalytics.retention(ev).collect()
      .map(x => (x.getDate(0).toString, x.getInt(1)) -> x.getLong(2)).toMap
    assert(r(("1970-01-01", 0)) == 2)
    assert(r(("1970-01-01", 2)) == 1)
    assert(r(("1970-01-02", 0)) == 1)
    assert(r(("1970-01-02", 1)) == 1)
    assert(r.size == 4)
  }

  test("rolling actives: trailing-window distinct, clipped at last day") {
    import spark.implicits._
    val day = 86400L
    // u1 active d0 and d1; u2 active d0 only; last observed day = d1
    val ev = Seq((1L, 0L), (1L, day), (2L, 10L))
      .toDF("user_id", "t")
      .select(col("user_id"), col("t").cast("timestamp").as("ts"))
    val r = EventAnalytics.rollingActives(ev, windowDays = 7).collect()
      .map(x => x.getDate(0).toString -> x.getLong(1)).toMap
    // d0 window [d-6, d0] sees both; d1 window sees both (u2 via d0);
    // days beyond the last activity are clipped
    assert(r == Map("1970-01-01" -> 2L, "1970-01-02" -> 2L))
    // a 1-day window is plain DAU
    val dau = EventAnalytics.rollingActives(ev, windowDays = 1).collect()
      .map(x => x.getDate(0).toString -> x.getLong(1)).toMap
    assert(dau == Map("1970-01-01" -> 2L, "1970-01-02" -> 1L))
  }

  test("funnel dropoff: conversion only counts within one session") {
    import spark.implicits._
    // u1 converts fully inside one session; u2's purchase opens a NEW
    // session (gap > 100s) and must not convert; u3 views only
    val ev = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 10L, "view"), (2L, 20L, "click"), (2L, 500L, "purchase"),
      (3L, 10L, "view"))
      .toDF("user_id", "t", "event_type")
      .withColumn("event_id", col("t"))
      .select(col("user_id"), col("t").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    val r = EventAnalytics.funnelDropoff(ev,
        Seq("view", "click", "purchase"), gapSeconds = 100L)
      .orderBy("step").collect()
    assert(r.map(_.getLong(2)).toSeq == Seq(3L, 2L, 1L))
    assert(r(0).isNullAt(3)) // first step has no previous
    assert(r(1).getFloat(3) == 0.6667f)
    assert(r(2).getFloat(3) == 0.5f)
  }

  test("funnelDropoff: an empty middle step yields NULL frac, no fault") {
    import spark.implicits._
    // views only — click step counts 0, purchase's frac divides by it
    val ev = Seq((1L, 10L, "view"), (2L, 20L, "view"))
      .toDF("user_id", "t", "event_type")
      .withColumn("event_id", col("t"))
      .select(col("user_id"), col("t").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    val r = EventAnalytics.funnelDropoff(ev,
        Seq("view", "click", "purchase"), gapSeconds = 100L)
      .orderBy("step").collect()
    assert(r.map(_.getLong(2)).toSeq == Seq(2L, 0L, 0L))
    assert(r(1).getFloat(3) == 0.0f) // 0/2
    assert(r(2).isNullAt(3))         // 0/0 guarded to NULL, not a fault
  }

  test("basket rules: asymmetric confidence, lift above independence") {
    import spark.implicits._
    // baskets: {A,B} ×3, {A} ×3, {C} ×2 → n=8. conf(A→B)=0.5,
    // conf(B→A)=1.0, lift = 8·3/(6·3) = 1.3333 both directions
    val facts = (Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "B"), (4L, "A"), (5L, "A"), (6L, "A"),
      (7L, "C"), (8L, "C"))).toDF("bk", "it")
    val r = EventAnalytics.basketRules(facts, "bk", "it", minCount = 3L)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getFloat(3), x.getFloat(4), x.getFloat(5))))
      .toMap
    assert(r(("A", "B")) == ((3L, 0.375f, 0.5f, 1.3333f)))
    assert(r(("B", "A")) == ((3L, 0.375f, 1.0f, 1.3333f)))
    assert(r.size == 2) // C pairs with nothing; sub-minCount absent
  }

  test("lead-lag: proportional series reads 1.0 at its true lag") {
    import spark.implicits._
    val days = (1 to 25).map(i => s"2024-01-${"%02d".format(i)}")
    // symbol 2 tracks symbol 1 same-day (proportional closes → equal
    // returns); symbol 3 tracks symbol 1 shifted one day later
    val closes = (1 to 25).map(i => 100.0 + 10.0 * math.sin(i * 0.7))
    val bars =
      days.zip(closes).map { case (d, c) => (1L, d, c) } ++
      days.zip(closes).map { case (d, c) => (2L, d, 2.0 * c) } ++
      days.zip(closes).drop(1).map { case (d, _) => (3L, d, 0.0) }
        .zip(closes).map { case ((id, d, _), c) => (id, d, c) }
    val df = bars.toDF("id", "dt", "close")
      .select(col("id"), col("dt").cast("date").as("dt"), col("close"))
    val r = graft.ts.CrossCorr.leadLag(df).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getInt(2)) ->
        Option(x.get(4)).map(_.asInstanceOf[Float])).toMap
    assert(r((1L, 2L, 0)) == Some(1.0f))   // proportional: same returns
    assert(r((1L, 3L, 1)) == Some(1.0f))   // r_3(t+1) == r_1(t)
    assert(r((1L, 2L, 1)) != Some(1.0f))   // wrong lag is not perfect
  }

  test("transitions: bigram counts and row-normalized probabilities") {
    import spark.implicits._
    // u1: A B A B ; u2: A B  →  A→B ×3, B→A ×1
    val ev = Seq((1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"), (1L, 4L, "B"),
      (2L, 1L, "A"), (2L, 2L, "B"))
      .toDF("user_id", "t", "event_type")
      .withColumn("event_id", col("t"))
      .select(col("user_id"), col("t").cast("timestamp").as("ts"),
        col("event_id"), col("event_type"))
    val r = EventAnalytics.transitions(ev).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getFloat(3)))).toMap
    assert(r(("A", "B")) == ((3L, 1.0f)))
    assert(r(("B", "A")) == ((1L, 1.0f)))
    assert(r.size == 2)
  }

  test("chi2: hand-checked 2x2 dependence; independent table reads ~0") {
    import spark.implicits._
    // (A,x)=10 (A,y)=20 (B,x)=20 (B,y)=10 → every e=15,
    // contrib=(±5)²/15 each → chi2 = 4·round(5²/15,4) = 6.6668, dof=1
    val dep = (Seq.fill(10)(("A", "x")) ++ Seq.fill(20)(("A", "y")) ++
      Seq.fill(20)(("B", "x")) ++ Seq.fill(10)(("B", "y")))
      .toDF("g", "h")
    val r = graft.ops.Stats.chiSquare(dep, "g", "h").collect()
    assert(r.length == 4)
    assert(r.forall(_.getFloat(3) == 15.0f))      // e
    assert(r.forall(_.getFloat(4) == 1.6667f))    // contrib
    assert(r.forall(_.getFloat(5) == 6.6668f))    // chi2
    assert(r.forall(_.getInt(6) == 1))            // dof
    // perfectly proportional rows → chi2 exactly 0
    val ind = (Seq.fill(10)(("A", "x")) ++ Seq.fill(20)(("A", "y")) ++
      Seq.fill(20)(("B", "x")) ++ Seq.fill(40)(("B", "y")))
      .toDF("g", "h")
    val r2 = graft.ops.Stats.chiSquare(ind, "g", "h").collect()
    assert(r2.forall(_.getFloat(5) == 0.0f))
  }

  test("kcore: pendant chain cascades away, the clique survives intact") {
    import spark.implicits._
    // K4 on {1,2,3,4} + a tail 4–5–6–7: for k=2 the tail peels one
    // vertex per round (7, then 6, then 5) — a genuine cascade — and
    // the clique survives with its internal degrees untouched
    val k4 = for (a <- 1 to 4; b <- 1 to 4 if a < b) yield (a.toLong, b.toLong)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L), (6L, 7L))).toDF("a", "b")
    val r = graft.graph.KCore.kCore(edges, k = 2, maxRounds = 8).collect()
      .map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r == Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3))
    // k above the max degree empties the graph
    assert(graft.graph.KCore.kCore(edges, k = 5, maxRounds = 8).isEmpty)
    // a round cap below the cascade depth returns the partial peel:
    // after 1 round only leaf 7 is gone, 6 survives at trimmed degree
    val capped = graft.graph.KCore.kCore(edges, k = 2, maxRounds = 1)
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(capped(6L) == 1 && !capped.contains(7L))
  }

  test("kcore: direction, duplicates and self-loops are noise") {
    import spark.implicits._
    val tri = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L),
      (2L, 3L)).toDF("a", "b")
    val r = graft.graph.KCore.kCore(tri, k = 2, maxRounds = 4).collect()
      .map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r == Map(1L -> 2, 2L -> 2, 3L -> 2))
  }
}
