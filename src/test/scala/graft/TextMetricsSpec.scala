package graft

import graft.llm.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 text metrics: JS divergence, Flesch, ROUGE pairs. */
class TextMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("jsDivergence: identical slices pin 0; disjoint pin ln2 (norm 1)") {
    val same = docs(0L -> "x y", 1L -> "x y")
    val r1 = TextOps.jsDivergence(same, col("doc_id") % 2 === 1)
      .collect().head
    assert(r1.getAs[Float]("jsd") == 0.0f)

    val disjoint = docs(0L -> "x x", 1L -> "y y")
    val r2 = TextOps.jsDivergence(disjoint, col("doc_id") % 2 === 1)
      .collect().head
    assert(math.abs(r2.getAs[Float]("jsd") - 0.693147f) < 1e-5)
    assert(r2.getAs[Float]("jsd_norm") == 1.0f)
  }

  test("flesch: hand-solved doc pins 175.59") {
    // words 3, vowel runs 1 ("aa"), sentence runs 1 (".")
    val r = TextOps.flesch(docs(0L -> "aa bb. cc")).collect().head
    assert(r.getAs[Long]("n_words") == 3L)
    assert(r.getAs[Long]("n_syllables") == 1L)
    assert(r.getAs[Long]("n_sentences") == 1L)
    // 206.835 - 1.015*3 - 84.6/3 = 175.59
    assert(math.abs(r.getAs[Float]("flesch") - 175.59f) < 1e-3)
  }

  test("rougePairs: overlap 3/4 unigrams, 2/3 bigrams") {
    val d = docs(1L -> "a b c d", 2L -> "a b c e")
    val pairs = Seq((1L, 2L)).toDF("da", "db")
    val r = TextOps.rougePairs(d, pairs).collect().head
    assert(r.getAs[Long]("ov1") == 3L)
    assert(r.getAs[Float]("rouge1_f") == 0.75f)
    assert(r.getAs[Long]("ov2") == 2L)
    assert(math.abs(r.getAs[Float]("rouge2_f") - 0.6667f) < 1e-6)
  }

  test("rougePairs: multiset clipping caps repeated-token credit") {
    val d = docs(3L -> "a a a b", 4L -> "a b b b")
    val pairs = Seq((3L, 4L)).toDF("da", "db")
    val r = TextOps.rougePairs(d, pairs).collect().head
    // clipped overlap = min(3,1) + min(1,3) = 2 of 4 -> F = 0.5
    assert(r.getAs[Long]("ov1") == 2L)
    assert(r.getAs[Float]("rouge1_f") == 0.5f)
  }
}
