package graft

import graft.functions.HilbertIndex
import org.apache.spark.sql.GraftSqlShims
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Hilbert key's defining properties, hand-checked: bijectivity,
  * the unit-step adjacency the Morton curve lacks, the classic 2×2
  * orientation, and the codegen'd DataFrame path.
  */
class HilbertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def d(bits: Int)(x: Long, y: Long): Long =
    HilbertIndex(lit0, lit0, bits).compute(x, y).asInstanceOf[Long]
  private val lit0 = GraftSqlShims.expression(lit(0L))

  test("2x2 curve: the canonical U — (0,0)(0,1)(1,1)(1,0)") {
    val f = d(1) _
    assert(f(0, 0) == 0 && f(0, 1) == 1 && f(1, 1) == 2 && f(1, 0) == 3)
  }

  test("bits=3: bijective on the 8x8 grid and every step is a grid " +
      "neighbor (the locality Morton lacks)") {
    val f = d(3) _
    val cells = for (x <- 0L until 8L; y <- 0L until 8L)
      yield f(x, y) -> (x, y)
    val m = cells.toMap
    assert(m.size == 64 && m.keySet == (0L until 64L).toSet)
    for (k <- 0L until 63L) {
      val (x1, y1) = m(k); val (x2, y2) = m(k + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at $k: ($x1,$y1) -> ($x2,$y2)")
    }
    // Morton order on the same grid DOES jump at quadrant seams —
    // unit-step adjacency is the Hilbert-specific property
  }

  test("codegen'd DataFrame path matches the kernel") {
    import spark.implicits._
    val df = (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y))
      .toDF("x", "y")
      .withColumn("hk", GraftSqlShims.column(HilbertIndex(
        GraftSqlShims.expression(col("x")),
        GraftSqlShims.expression(col("y")), 3)))
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val f = d(3) _
    assert(got.forall { case ((x, y), hk) => hk == f(x, y) })
  }

  test("hilbertBlockStats: blocks tile the table and spans are narrow") {
    import spark.implicits._
    val rows = (for (a <- 0L until 64L; b <- 0L until 64L)
      yield (a, b)).toDF("ca", "cb")
    val st = graft.load.Layout
      .hilbertBlockStats(rows, "ca", "cb", bits = 6, blockBits = 4)
      .collect()
    assert(st.map(_.getAs[Long]("n_rows")).sum == 64L * 64)
    assert(st.length == 16)
    // each of the 16 blocks holds 256 consecutive keys = one
    // quadtree node = a 16x16 sub-square: both spans bounded by 16
    st.foreach { r =>
      val wa = r.getAs[Long]("max_a") - r.getAs[Long]("min_a") + 1
      val wb = r.getAs[Long]("max_b") - r.getAs[Long]("min_b") + 1
      assert(wa <= 16 && wb <= 16, s"wide block: $r")
    }
  }
}
