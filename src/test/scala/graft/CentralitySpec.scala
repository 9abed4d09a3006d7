package graft

import graft.graph.Centrality
import org.scalatest.funsuite.AnyFunSuite

/** Seeded Brandes betweenness + harmonic closeness ([[Centrality]])
  * on hand-solved path and diamond graphs.
  */
class CentralitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sym(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("a", "b")

  test("betweenness: path graph seeded from both ends") {
    // 1-2-3-4-5; from seed 1: delta = (3,2,1,0) on 2..5; from seed 5
    // symmetric -> bc = (0, 4, 4, 4, 0)
    val nodes = (1L to 5L).toDF("id")
    val edges = sym(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)
    val seeds = Seq(1L, 5L).toDF("id")
    val bc = Centrality.betweennessSeeded(nodes, edges, seeds, rounds = 4)
      .orderBy("id").collect().map(_.getAs[Float]("bc")).toSeq
    assert(bc == Seq(0.0f, 4.0f, 4.0f, 4.0f, 0.0f))
  }

  test("betweenness: diamond splits dependency across the two paths") {
    // 1-2-4, 1-3-4: sigma(4)=2, delta(2)=delta(3)=0.5
    val nodes = (1L to 4L).toDF("id")
    val edges = sym(1L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 4L)
    val seeds = Seq(1L).toDF("id")
    val bc = Centrality.betweennessSeeded(nodes, edges, seeds, rounds = 2)
      .orderBy("id").collect().map(_.getAs[Float]("bc")).toSeq
    assert(bc == Seq(0.0f, 0.5f, 0.5f, 0.0f))
  }

  test("harmonic closeness: diamond from one seed") {
    val nodes = (1L to 4L).toDF("id")
    val edges = sym(1L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 4L)
    val seeds = Seq(1L).toDF("id")
    val rows = Centrality.harmonicCloseness(nodes, edges, seeds, 2)
      .orderBy("id").collect()
    assert(rows.map(_.getAs[Float]("harmonic")).toSeq ==
      Seq(0.0f, 1.0f, 1.0f, 0.5f))
    assert(rows.map(_.getAs[Long]("n_reached")).toSeq ==
      Seq(0L, 1L, 1L, 1L))
  }

  test("sigma counts all shortest paths through multi-level fans") {
    // 1-{2,3}-4-5: sigma(5) = 2 via node 4; delta(4) = 1 exactly
    val nodes = (1L to 5L).toDF("id")
    val edges = sym(1L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 4L, 4L -> 5L)
    val ds = Centrality.distSigma(sym(1L -> 2L, 1L -> 3L, 2L -> 4L,
      3L -> 4L, 4L -> 5L), Seq(1L).toDF("id"), 3)
      .where($"src" === 1L).orderBy("id").collect()
    val sigmaByid = ds.map(r => r.getAs[Long]("id") ->
      r.getAs[Long]("sigma")).toMap
    assert(sigmaByid(4L) == 2L && sigmaByid(5L) == 2L)
    val bc = Centrality.betweennessSeeded(nodes, edges,
      Seq(1L).toDF("id"), rounds = 3)
      .orderBy("id").collect().map(_.getAs[Float]("bc")).toSeq
    // delta(4) = (2/2)*(1+0) = 1; delta(2) = delta(3) = (1/2)*(1+1) = 1
    assert(bc == Seq(0.0f, 1.0f, 1.0f, 1.0f, 0.0f))
  }
}
