package graft

import graft.llm.Pca
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth checks for the power-iteration PCA: a synthetic
  * dataset with a KNOWN dominant axis must recover it, the pivot
  * normalization contract must hold exactly, and the scores must
  * order the data along that axis.
  */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** 40 vectors in 8-dim: strong variance on axis 2 (±5 alternating),
    * weak noise (±0.01·k) elsewhere — PC1 must be axis 2. */
  private lazy val synth = {
    import spark.implicits._
    (0 until 40).map { n =>
      val v = Array.tabulate(8) { j =>
        if (j == 2) (if (n % 2 == 0) 5.0f else -5.0f)
        else ((n * 7 + j * 3) % 5 - 2) * 0.01f
      }
      (n.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("loadings recover the planted dominant axis with pivot = +1e6") {
    val l = Pca.loadings(synth, dim = 8, iters = 6).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(l.size == 8)
    // the planted axis is the pivot: exactly +10^6 by normalization
    assert(l(2) == Pca.vScale)
    // every other axis is noise-scale: |loading| far below the pivot
    (0 until 8).filter(_ != 2).foreach { j =>
      assert(math.abs(l(j)) < Pca.vScale / 100,
        s"axis $j loading ${l(j)} not negligible")
    }
  }

  test("scores separate the two planted clusters by sign") {
    val s = Pca.scores(synth, dim = 8, iters = 6).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s.size == 40)
    // even ids sit at +5 on the planted axis, odd at −5: one cluster
    // strictly positive, the other strictly negative (sign of the
    // eigenvector is fixed by the pivot, which the +5 group dominates)
    val even = (0 until 40 by 2).map(n => s(n.toLong))
    val odd = (1 until 40 by 2).map(n => s(n.toLong))
    assert(even.forall(_ > 0) && odd.forall(_ < 0))
    // and the separation dwarfs within-cluster noise spread
    val gap = even.min - odd.max
    val spread = (even.max - even.min).max(odd.max - odd.min)
    assert(gap > 10 * spread, s"gap $gap vs spread $spread")
  }

  test("fixture loadings are a unit-ish direction after the pivot scale") {
    val embs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val l = Pca.loadings(embs).collect().map(_.getLong(1))
    assert(l.length == 64)
    // pivot contract: max |loading| is exactly the scale
    assert(l.map(math.abs).max == Pca.vScale)
  }
}
