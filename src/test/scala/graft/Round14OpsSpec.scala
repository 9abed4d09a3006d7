package graft

import graft.ops.Stats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 stats operators: Kruskal–Wallis against hand-computed
  * values, Benford digit ladder and conformity scores.
  */
class Round14OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("kruskalWallis: textbook no-tie case matches the closed form") {
    import spark.implicits._
    // groups a={1,2}, b={3,4}, c={5,6}: ranks 1..6 exactly,
    // R_a=3, R_b=7, R_c=11; H = 12/(6·7)·(9/2+49/2+121/2) − 3·7
    //   = (2/7)·89.5 − 21 = 4.571428571428573 (IEEE), no ties
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0),
        ("c", 5.0), ("c", 6.0)).toDF("g", "v")
    val r = Stats.kruskalWallis(df, "v", "g", Seq("a", "b", "c"))
      .collect().head
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Int]("n_groups") == 3)
    assert(math.abs(r.getAs[Float]("h") - 4.5714f) < 1e-4)
    assert(!r.getAs[Boolean]("reject_95")) // 4.57 < chi2(2)=5.99
  }

  test("kruskalWallis: ties get midranks and the correction divisor") {
    import spark.implicits._
    // a={1,1}, b={1,2}: value 1 has 3 ties → midrank 2 (2x units 4),
    // value 2 rank 4. R_a = 4, R_b = 6 (true units), ties Σ(t³−t)=24,
    // N=4 → H = 12/20·(8+18) − 15 = 0.6; Hc = 0.6/(1−24/60) = 1.0
    val df = Seq(("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 2.0))
      .toDF("g", "v")
    val r = Stats.kruskalWallis(df, "v", "g", Seq("a", "b"))
      .collect().head
    assert(math.abs(r.getAs[Float]("h") - 1.0f) < 1e-6)
  }

  test("rangeJoin: chunked equi-join routes every value into exactly " +
      "one band, ties at a boundary go right") {
    import spark.implicits._
    val facts = Seq(0L, 5L, 10L, 10L, 15L, 99L).toDF("v")
    val bands = Seq((0, 0L, 10L), (1, 10L, 50L), (2, 50L, 100L))
      .toDF("band_id", "lo", "hi")
    val got = graft.ops.RangeJoin.chunked(facts, bands, chunkWidth = 8L)
      .groupBy("band_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // 0,5 → band 0; 10,10,15 → band 1 (boundary 10 goes RIGHT); 99 → 2
    assert(got == Map(0 -> 2L, 1 -> 3L, 2 -> 1L))
    // an empty band (lo >= hi) neither explodes nor matches
    val bands2 = Seq((0, 0L, 10L), (1, 10L, 10L), (2, 10L, 100L))
      .toDF("band_id", "lo", "hi")
    val got2 = graft.ops.RangeJoin.chunked(facts, bands2, 8L)
      .groupBy("band_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got2 == Map(0 -> 2L, 2 -> 4L))
  }

  test("riskMetrics: constant returns give NULL sharpe; a single " +
      "symbol IS the market (beta 1, alpha 0, r2 1)") {
    import spark.implicits._
    // closes 100, 110, 121: two +10% returns — zero variance
    val bars = Seq((1L, "2024-01-01", 100.0), (1L, "2024-01-02", 110.0),
        (1L, "2024-01-03", 121.0))
      .toDF("id", "dts", "close")
      .select(col("id"), to_date(col("dts")).as("dt"), col("close"))
    val ss = graft.ts.RiskMetrics.sharpeSortino(bars, minObs = 2)
      .collect().head
    assert(ss.getAs[Int]("n") == 2)
    assert(ss.isNullAt(ss.fieldIndex("sharpe"))) // zero variance
    assert(ss.isNullAt(ss.fieldIndex("sortino"))) // no downside
    assert(math.abs(ss.getAs[Float]("ann_ret") - 36.5f) < 0.01f)
    // varied returns so vx > 0: the only symbol is the market
    val bars2 = Seq((1L, "2024-01-01", 100.0), (1L, "2024-01-02", 110.0),
        (1L, "2024-01-03", 99.0), (1L, "2024-01-04", 120.0))
      .toDF("id", "dts", "close")
      .select(col("id"), to_date(col("dts")).as("dt"), col("close"))
    val c = graft.ts.RiskMetrics.capm(bars2, minObs = 2).collect().head
    assert(c.getAs[Float]("beta") == 1.0f)
    assert(c.getAs[Float]("r2") == 1.0f)
    assert(math.abs(c.getAs[Float]("alpha_daily")) < 1e-6f)
  }

  test("logisticNewton: separable labels give a positive slope; " +
      "flipping labels flips it") {
    import spark.implicits._
    val df = Seq((1.0, "a"), (2.0, "a"), (3.0, "p"), (4.0, "p"),
        (1.5, "a"), (3.5, "p"))
      .toDF("value", "event_type")
    val r = graft.ops.MlLite.logisticNewton(df, "value",
      col("event_type") === "p", xScale = 1e-2).collect().head
    assert(r.getAs[Long]("n") == 6L && r.getAs[Long]("n_pos") == 3L)
    assert(r.getAs[Float]("slope") > 0f)
    val rf = graft.ops.MlLite.logisticNewton(df, "value",
      col("event_type") === "a", xScale = 1e-2).collect().head
    assert(rf.getAs[Float]("slope") < 0f)
    // symmetry of the logit: flipped labels negate the slope exactly
    // at every Newton step (p ↦ 1−p), up to the pico quantization
    assert(math.abs(r.getAs[Float]("slope") +
      rf.getAs[Float]("slope")) < 1e-4)
  }

  test("decisionStump: a perfectly separable split scores gini 0 at " +
      "the boundary value") {
    import spark.implicits._
    val df = Seq((1.0, "a"), (2.0, "a"), (3.0, "p"), (4.0, "p"))
      .toDF("value", "event_type")
    val r = graft.ops.MlLite.decisionStump(df, "value",
      col("event_type") === "p").collect().head
    assert(r.getAs[Long]("split_cents") == 200L)
    assert(r.getAs[Long]("n_left") == 2L &&
      r.getAs[Long]("pos_left") == 0L)
    assert(r.getAs[Long]("n_right") == 2L &&
      r.getAs[Long]("pos_right") == 2L)
    assert(r.getAs[Float]("gini") == 0f)
  }

  test("decisionStump: degenerate input (one distinct value / no " +
      "rows) yields ZERO rows, matching the oracle's rk=1 form") {
    import spark.implicits._
    val one = Seq((5.0, "a"), (5.0, "p"), (5.0, "p"))
      .toDF("value", "event_type")
    assert(graft.ops.MlLite.decisionStump(one, "value",
      col("event_type") === "p").count() == 0L)
    val empty = Seq.empty[(Double, String)].toDF("value", "event_type")
    assert(graft.ops.MlLite.decisionStump(empty, "value",
      col("event_type") === "p").count() == 0L)
  }

  test("naiveBayes: separable vocabularies classify; smoothing breaks " +
      "ties toward the prior") {
    import spark.implicits._
    val docs = Seq(
        (1L, "der hund läuft schnell", "de"),
        (2L, "der baum ist gross", "de"),
        (3L, "the dog runs fast", "en"),
        (4L, "the tree is tall", "en"),
        (5L, "the cat der", "en")) // mixed but majority-en tokens
      .toDF("doc_id", "text", "lang")
    val r = graft.llm.NaiveBayes.classifyLang(docs, Seq("de", "en"))
      .collect().map(x => x.getLong(0) ->
        (x.getString(2), x.getBoolean(3))).toMap
    assert(r(1L) == ("de", true))
    assert(r(2L) == ("de", true))
    assert(r(3L) == ("en", true))
    assert(r(4L) == ("en", true))
    assert(r(5L)._1 == "en") // 'the'+'cat' outweigh one 'der'
  }

  test("featureHash: vocabulary-free buckets are md5-stable and " +
      "counts are exact") {
    import spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, "a")).toDF("doc_id", "text")
    val rows = graft.llm.TextOps.featureHash(docs, d = 64).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // 'a' twice in doc 1, once in doc 2 — same bucket both docs
    val aBucket = rows.keys.filter(_._1 == 2L).head._2
    assert(rows((1L, aBucket)) == 2L)
    assert(rows((2L, aBucket)) == 1L)
    assert(rows.values.sum == 4L) // 3 tokens + 1 token
    assert(rows.keys.forall { case (_, b) => b >= 0 && b < 64 })
  }

  test("benford: digit ladder buckets exactly; perfect-fit is quiet") {
    import spark.implicits._
    // values chosen so cents first digits are 1..9 with counts
    // proportional-ish to Benford is hard to plant exactly; instead
    // pin the LADDER (digit extraction) through the chi2 of a
    // single-digit pile: all mass on digit 1 → chi2 has the known
    // closed form Σ over digits of (n·1{d=1} − n·p_d)²/(n·p_d)
    val n = 100
    val df = (1 to n).map(_ => 1.23).toDF("x") // cents 123 → digit 1
    val r = Stats.benford(df, "x").collect().head
    assert(r.getAs[Long]("n") == n.toLong)
    val p = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))
    val expChi2 = (1 to 9).map { d =>
      val e = n * p(d - 1)
      val o = if (d == 1) n.toDouble else 0.0
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(r.getAs[Float]("chi2") - expChi2) < 0.01,
      s"${r.getAs[Float]("chi2")} vs $expChi2")
    assert(r.getAs[Boolean]("reject_95"))
    // digit extraction across magnitudes: 9.87 → 987 → 9;
    // 0.05 → 5 → 5; 12345.67 → 1234567 → 1
    val df2 = Seq(9.87, 0.05, 12345.67).toDF("x")
    val r2 = Stats.benford(df2, "x").collect().head
    assert(r2.getAs[Long]("n") == 3L)
  }
}
