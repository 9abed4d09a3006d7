package graft

import graft.ops.ImplicitMf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rank-1 implicit-feedback ALS ([[ImplicitMf]]): planted structure
  * recovery and exact-integer determinism.
  */
class ImplicitMfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def factors(rows: Seq[(Long, Long, Long)],
      parts: Int = 1): Map[(String, Long), Long] = {
    import spark.implicits._
    val ratings = rows.toDF("u", "i", "cnt").repartition(parts)
    ImplicitMf.run(ratings).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  // planted rank-1 blocks: users 1-2 buy items 10-11 heavily (cnt 5),
  // users 3-4 buy items 20-21 once — engagement separates the blocks
  private val planted = Seq(
    (1L, 10L, 5L), (1L, 11L, 5L), (2L, 10L, 5L), (2L, 11L, 5L),
    (3L, 20L, 1L), (3L, 21L, 1L), (4L, 20L, 1L), (4L, 21L, 1L))

  test("planted blocks: heavy-engagement entities get larger factors") {
    val f = factors(planted)
    // all factors nonneg, each side's max renormalized to exactly 1e6
    assert(f.values.forall(v => v >= 0L && v <= 1000000L))
    assert(Seq(1L, 2L).map(u => f(("user", u))).max == 1000000L)
    assert(Seq(10L, 11L).map(i => f(("item", i))).max == 1000000L)
    // block separation: every heavy user above every light user,
    // every heavy item above every light item
    for (h <- Seq(1L, 2L); l <- Seq(3L, 4L))
      assert(f(("user", h)) > f(("user", l)), s"user $h !> $l")
    for (h <- Seq(10L, 11L); l <- Seq(20L, 21L))
      assert(f(("item", h)) > f(("item", l)), s"item $h !> $l")
    // symmetry: the two halves of each planted block tie exactly
    assert(f(("user", 1L)) == f(("user", 2L)))
    assert(f(("item", 10L)) == f(("item", 11L)))
  }

  test("exact-integer determinism: partitioning cannot move a factor") {
    assert(factors(planted, parts = 1) == factors(planted, parts = 7))
  }

  private def factors2(rows: Seq[(Long, Long, Long)],
      parts: Int = 1): Map[(String, Long), (Long, Long)] = {
    import spark.implicits._
    val ratings = rows.toDF("u", "i", "cnt").repartition(parts)
    ImplicitMf.run2(ratings).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
  }

  // planted rank-2 block structure rank 1 provably CANNOT separate:
  // two disjoint user×item blocks with IDENTICAL counts — rank 1 sees
  // the same engagement everywhere and assigns every user the same
  // scalar, while rank 2's seeded second coordinate lets the blocks
  // pull apart in direction.
  private val planted2 = Seq(
    (1L, 11L, 5L), (1L, 12L, 5L), (2L, 11L, 5L), (2L, 12L, 5L),
    (3L, 13L, 5L), (3L, 14L, 5L), (4L, 13L, 5L), (4L, 14L, 5L))

  test("rank 2 separates equal-engagement blocks rank 1 cannot") {
    // rank 1: by symmetry every user gets the identical factor —
    // the blocks are provably inseparable at rank 1
    val f1 = factors(planted2)
    assert(Seq(1L, 2L, 3L, 4L).map(u => f1(("user", u))).distinct
      .size == 1)
    // rank 2: within-block users tie exactly, across blocks differ
    val f2 = factors2(planted2)
    assert(f2(("user", 1L)) == f2(("user", 2L)))
    assert(f2(("user", 3L)) == f2(("user", 4L)))
    assert(f2(("user", 1L)) != f2(("user", 3L)),
      s"blocks not separated: ${f2.toSeq.sortBy(_._1.toString)}")
    // renormalization contract: per column max |f| = 1e6 per kind
    val users = Seq(1L, 2L, 3L, 4L).map(u => f2(("user", u)))
    assert(users.map(x => math.abs(x._1)).max == 1000000L)
  }

  test("rank 2 determinism: partitioning cannot move a factor; " +
      "truncation toward zero on negatives matches DuckDB //") {
    assert(factors2(planted2, parts = 1) == factors2(planted2, parts = 7))
    // the signed-quantization precondition: Spark div truncates
    // toward zero exactly like DuckDB's // (-7 div 2 = -3, not -4)
    import spark.implicits._
    val d = Seq((-7L, 2L), (7L, -2L), (-7L, -2L)).toDF("a", "b")
      .selectExpr("a div b").as[Long].collect().toSeq
    assert(d == Seq(-3L, -3L, 3L))
  }

  test("single round is already the closed-form rank-1 solve") {
    import spark.implicits._
    // one user, one item, cnt=1: c=11, v0=1e6, G=1e12
    // num = 11e6·1e... num = c·v = 11·1e6; den = 1e12 + 1e12 + 10·1e12
    // u_raw = 11e6·1e12 // 12e12 = 916666; renorm → 1e6
    val one = Seq((1L, 10L, 1L)).toDF("u", "i", "cnt")
    val f = ImplicitMf.run(one, iters = 1).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(f(("user", 1L)) == 1000000L)
    assert(f(("item", 10L)) == 1000000L)
  }
}
