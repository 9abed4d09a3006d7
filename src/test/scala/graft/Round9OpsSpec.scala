package graft

import graft.graph.Hits
import graft.llm.Retrieval
import graft.quality.DataQuality
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-solved ground-truth checks for the round-9 compositions whose
  * registered queries are oracle-gated but whose kernels deserve a
  * worked example: HITS mutual recursion, the Samarati lattice climb,
  * the seeded Laplace release, and MMR's diversification behavior.
  */
class Round9OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hits: hand-walked two rounds on a 2x2 bipartite graph") {
    import spark.implicits._
    // hubs {0,1}, auths {10,11}; 0→10, 1→10, 1→11
    // r1: a = (2e6, 1e6) → pivot 2e6 → (1e6, 5e5)
    //     h = (1e6, 1.5e6) → pivot 1.5e6 → (666667, 1e6)
    // r2: a = (1666667, 1e6) → (1e6, 600000)
    //     h = (1e6, 1.6e6) → (625000, 1e6)
    val edges = Seq((0L, 10L), (1L, 10L), (1L, 11L)).toDF("src", "dst")
    val got = Hits.run(Seq(0L, 1L).toDF("id"),
        Seq(10L, 11L).toDF("id"), edges, iters = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got((0L, "hub")) == 625000L)
    assert(got((1L, "hub")) == 1000000L)
    assert(got((10L, "auth")) == 1000000L)
    assert(got((11L, "auth")) == 600000L)
  }

  test("kAnonymize climbs exactly to the first satisfying level") {
    import spark.implicits._
    // level-0 min class = 1 < k = 3; level-1 classes (g,x)=4, (g,y)=4
    val rows = (Seq.fill(2)(("a1", "x")) ++ Seq.fill(2)(("a2", "x")) ++
      Seq.fill(3)(("a1", "y")) ++ Seq.fill(1)(("a2", "y")))
      .zipWithIndex.map { case ((q1, q2), i) => (i.toLong, q1, q2, "g") }
      .toDF("id", "qi1", "qi2", "g1")
    val rel = DataQuality.kAnonymize(rows, "qi1", "qi2", "g1", "id", k = 3)
      .collect()
    assert(rel.length == 8)
    assert(rel.forall(_.getInt(1) == 1), "expected lattice level 1")
    assert(rel.forall(_.getString(2) == "g"))
    assert(rel.map(_.getString(3)).toSet == Set("x", "y"))
    // k actually holds at the released level
    val sizes = rel.groupBy(r => (r.getString(2), r.getString(3)))
      .map(_._2.length)
    assert(sizes.forall(_ >= 3))
    // and with k = 1 the exact level-0 values release untouched
    val l0 = DataQuality.kAnonymize(rows, "qi1", "qi2", "g1", "id", k = 1)
      .collect()
    assert(l0.forall(_.getInt(1) == 0))
    assert(l0.map(_.getString(2)).toSet == Set("a1", "a2"))
  }

  test("dp release: deterministic, perturbed, and magnitude-bounded") {
    import spark.implicits._
    val df = (1 to 100).map(i => (s"k${i % 7}", i)).toDF("k", "v")
    val a = DataQuality.dpNoisyCounts(df, Seq("k")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getFloat(2))).toMap
    val b = DataQuality.dpNoisyCounts(df, Seq("k")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getFloat(2))).toMap
    assert(a == b, "seeded noise must replay identically")
    assert(a.size == 7)
    // noise present (md5 landing exactly on 0 has ~0 probability)
    assert(a.exists { case (_, (n, noisy)) => noisy != n.toFloat })
    // Laplace(1) from a 48-bit uniform is bounded by ln(2^48) ≈ 33.3
    assert(a.forall { case (_, (n, noisy)) =>
      math.abs(noisy - n) <= 34.0 })
    // a different salt draws different noise for the same keys
    val c = DataQuality.dpNoisyCounts(df, Seq("k"), salt = "dp2")
      .collect().map(r => r.getString(0) -> r.getFloat(2)).toMap
    assert(a.exists { case (k, (_, noisy)) => c(k) != noisy })
  }

  test("mmr: a near-duplicate is demoted below a diverse candidate") {
    import spark.implicits._
    // doc 2 duplicates doc 1's text; rel(2) > rel(3) but the 3e4
    // similarity penalty pushes the duplicate below the diverse doc 3
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "epsilon zeta eta theta"),
      (4L, "iota kappa lambda mu")).toDF("doc_id", "text")
    val ranked = Seq(
      (100L, 1, 1L, 10.0), (100L, 2, 2L, 9.9),
      (100L, 3, 3L, 9.7), (100L, 4, 4L, 1.0))
      .toDF("query_id", "rank", "doc_id", "score")
    val picks = Retrieval.mmrRerank(ranked, docs, k = 4).collect()
      .map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(picks == Map(1 -> 1L, 2 -> 3L, 3 -> 2L, 4 -> 4L),
      s"got $picks")
  }
}
