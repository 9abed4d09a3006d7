package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 ground-truth fixtures: multi-level Louvain's ascent
  * guarantee and hand-solved cases for the round's new operators.
  */
class Round13OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sym(es: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    (es ++ es.map(_.swap)).toDF("a", "b")
  }

  private def qMod(edges: DataFrame, labels: DataFrame): Float =
    graft.graph.Modularity.byPartition(edges, labels)
      .select(col("q_mod")).head().getFloat(0)

  test("louvain twoLevel: Q(level 2) >= Q(level 1), contraction exact") {
    // a 4-clique chain: cliques {1..4}, {5..8}, {9..12}, bridged
    // 4-5 and 8-9 — level 1 finds the cliques; level 2 may merge
    // bridge-joined cliques but must never decrease Q
    def clique(ids: Seq[Long]) =
      for (i <- ids; j <- ids if i < j) yield (i, j)
    val edges = sym(clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(5L, 6L, 7L, 8L)) ++ clique(Seq(9L, 10L, 11L, 12L)) ++
      Seq((4L, 5L), (8L, 9L)))
    val l1 = graft.graph.Louvain.oneLevel(edges, rounds = 4)
      .select(col("id"), col("community"))
    val l2 = graft.graph.Louvain.twoLevel(edges, 4, 4)
    val q1 = qMod(edges, l1)
    val q2 = qMod(edges, l2.select(col("id"), col("community")))
    assert(q2 >= q1, s"q2 $q2 < q1 $q1")
    assert(q2 >= 0.5f, s"clique chain should score high, got $q2")
    // level-2 labels refine consistently: same c1 => same community
    val viol = l2.groupBy(col("c1"))
      .agg(countDistinct(col("community")).as("nc"))
      .where(col("nc") > 1).count()
    assert(viol == 0L, "a level-1 community split across level-2 labels")
    // csize counts ORIGINAL nodes per level-2 community
    assert(l2.select(sum(when(col("id").isNotNull, 1L))).head().getLong(0)
      == 12L)
  }

  test("obrien-fleming: hand-solved two-look fixture") {
    import spark.implicits._
    // day 1: weak effect — diff = 1, vp = 1, vn = 1, z = 1 < u1 =
    // 1.977·√2 ≈ 2.796 (no cross); day 2 adds a strong arm-1 batch —
    // cumulative diff = 6, vp = 13.5, vn = 6.75, z = 6/√6.75 ≈
    // 2.3094 > u2 = 1.977 (cross). All moments hand-computed.
    val obs = Seq(
      (1L, 0L, 0L), (1L, 0L, 2L), (1L, 1L, 1L), (1L, 1L, 3L),
      (2L, 0L, 0L), (2L, 0L, 2L), (2L, 1L, 11L), (2L, 1L, 13L))
      .toDF("day", "arm", "v4")
    val out = graft.ops.Stats.obrienFleming(obs, "day", "arm", "v4",
      unit = 1.0, looks = 2)
      .orderBy("look").collect()
    assert(out.length == 2)
    val l1 = out(0); val l2 = out(1)
    assert(l1.getFloat(l1.fieldIndex("z")) == 1.0f)
    assert(!l1.getBoolean(l1.fieldIndex("crossed")))
    assert(l2.getFloat(l2.fieldIndex("z")) == 2.309401f)
    assert(l2.getFloat(l2.fieldIndex("bound")) == 1.977f)
    assert(l2.getBoolean(l2.fieldIndex("crossed")))
    assert(l1.getInt(l1.fieldIndex("first_cross_look")) == 2)
    // boundary is conservative-early: u1 > u2
    assert(l1.getFloat(l1.fieldIndex("bound")) >
      l2.getFloat(l2.fieldIndex("bound")))
  }

  test("louvain oneLevelW: weighted graph with self-loops, exact ascent") {
    import spark.implicits._
    // two supernodes {1, 2} with self-loop mass and a HEAVY bridge:
    // ΔQ·M²/2 for 2 → {1} is 58·8 − 18·(19 − 18 + 18) = 122 > 0 (the
    // merge applies); 3 → {1, 2} afterwards is 58·1 − 21·(37 − 21 +
    // 21) < 0 (3's self-loop mass keeps it alone). Hand-solved with
    // M = 58, k₁ = 19, k₂ = 18, k₃ = 21.
    val e = Seq(
      (1L, 1L, 10L), (2L, 2L, 10L), (1L, 2L, 8L), (2L, 1L, 8L),
      (3L, 3L, 20L), (3L, 1L, 1L), (1L, 3L, 1L))
      .toDF("a", "b", "w")
    val out = graft.graph.Louvain.oneLevelW(e, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1 and 2 share a community; 3's self-loop mass keeps it alone
    assert(out(1L) == out(2L))
    assert(out(3L) != out(1L))
  }
}
