package graft

import graft.ops.Stats
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 experimentation additions: TOST, Cohen's d / Hedges' g,
  * fixed-effect meta-analysis, Wilcoxon signed-rank.
  */
class ExperimentStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def twoGroups = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
    ("b", 2.0), ("b", 3.0), ("b", 4.0)).toDF("g", "v")

  test("tost: wide margin proves equivalence, narrow does not") {
    val same = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val r1 = Stats.tost(same, "v", "g", "a", "b", margin = 5.0)
      .collect().head
    assert(r1.getAs[Float]("diff") == 0.0f)
    assert(r1.getAs[Boolean]("equivalent_95"))
    val r2 = Stats.tost(same, "v", "g", "a", "b", margin = 0.5)
      .collect().head
    assert(!r2.getAs[Boolean]("equivalent_95"))
  }

  test("cohensD: unit shift at unit pooled SD pins d = 1, g = 0.8") {
    val r = Stats.cohensD(twoGroups, "v", "g", "a", "b").collect().head
    assert(r.getAs[Float]("cohens_d") == 1.0f)
    // g = d * (1 - 3/(4*6-9)) = 0.8
    assert(math.abs(r.getAs[Float]("hedges_g") - 0.8f) < 1e-6)
  }

  test("metaFixed: identical segments pin theta with zero heterogeneity") {
    val df = Seq(
      (1, "a", 1.0), (1, "a", 3.0), (1, "b", 2.0), (1, "b", 4.0),
      (2, "a", 1.0), (2, "a", 3.0), (2, "b", 2.0), (2, "b", 4.0))
      .toDF("seg", "g", "v")
    val r = Stats.metaFixed(df, "seg", "v", "g", "a", "b")
      .collect().head
    assert(r.getAs[Long]("k") == 2L)
    assert(r.getAs[Float]("theta") == 1.0f)
    assert(r.getAs[Float]("q_stat") == 0.0f)
    assert(r.isNullAt(r.fieldIndex("i2"))) // q = 0 -> undefined
  }

  test("wilcoxonSignedRank: distinct ranks pin W+ = 6, z = 1/sqrt(7.5)") {
    val pairs = Seq((0.0, 1.0), (0.0, 2.0), (0.0, 3.0), (4.0, 0.0))
      .toDF("x1", "x2")
    val r = Stats.wilcoxonSignedRank(pairs).collect().head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Float]("w_plus") == 6.0f)
    assert(math.abs(r.getAs[Float]("z") - (1.0 / math.sqrt(7.5))) < 1e-4)
  }

  test("wilcoxonSignedRank: full ties take midranks with the correction") {
    // d = +1, +1, -1: midrank 2 each, W+ = 4, var = 3.5 - 0.5 = 3
    val pairs = Seq((0.0, 1.0), (0.0, 1.0), (1.0, 0.0)).toDF("x1", "x2")
    val r = Stats.wilcoxonSignedRank(pairs).collect().head
    assert(r.getAs[Float]("w_plus") == 4.0f)
    assert(math.abs(r.getAs[Float]("z") - (1.0 / math.sqrt(3.0))) < 1e-4)
  }

  test("wilcoxonSignedRank: zero differences are dropped") {
    val pairs = Seq((1.0, 1.0), (2.0, 2.0), (0.0, 1.0)).toDF("x1", "x2")
    val r = Stats.wilcoxonSignedRank(pairs).collect().head
    assert(r.getAs[Long]("n") == 1L)
  }
}
