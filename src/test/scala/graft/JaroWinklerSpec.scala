package graft

import graft.functions.JaroWinkler
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native Jaro–Winkler kernel against the textbook values its
  * RapidFuzz pinning demands, plus the Column path end-to-end.
  */
class JaroWinklerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(a.codePoints().toArray, b.codePoints().toArray)

  test("kernel: textbook values, empties, boost threshold") {
    // the classic record-linkage triples (exact doubles, not approx:
    // the oracle builtin must agree bit-for-bit)
    assert(jw("MARTHA", "MARHTA") == 0.96111111111111114)
    assert(jw("DWAYNE", "DUANE") == 0.84000000000000008)
    assert(jw("DIXON", "DICKSONX") == 0.81333333333333324)
    // either side empty → 0 (including both-empty, the pinned
    // convention); identical → 1
    assert(jw("", "") == 0.0 && jw("a", "") == 0.0 && jw("", "a") == 0.0)
    assert(jw("same", "same") == 1.0)
    // window 0 on 2-char swaps: no matches at all
    assert(jw("ab", "ba") == 0.0)
    // below the 0.7 boost threshold the shared prefix earns nothing
    assert(jw("prefixmatch", "prefixxxxxx") == 0.69696969696969691)
    // transpositions cost half: abcd/badc has 4 matches, 2 transposed
    assert(jw("abcd", "badc") == 0.83333333333333337)
  }

  test("column path: scores through codegen, null-safe") {
    import spark.implicits._
    val df = Seq(
      ("MARTHA", "MARHTA"),
      ("DWAYNE", "DUANE"),
      (null.asInstanceOf[String], "x"))
      .toDF("a", "b")
      .select(org.apache.spark.sql.GraftSqlShims.column(JaroWinkler(
        org.apache.spark.sql.GraftSqlShims.expression(col("a")),
        org.apache.spark.sql.GraftSqlShims.expression(col("b")))).as("jw"))
    val r = df.collect().map(x => Option(x.get(0)).map(_.asInstanceOf[Double]))
    assert(r(0) == Some(0.96111111111111114))
    assert(r(1) == Some(0.84000000000000008))
    assert(r(2).isEmpty)
  }
}
