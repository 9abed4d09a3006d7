package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 operators: ExactSubstr dedup at the k-token grain
  * ([[graft.llm.Dedup.exactSubstrSpans]]/[[graft.llm.Dedup.exactSubstrCut]]).
  */
class Round15OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val shared = "S1 S2 S3 S4 S5 S6" // 6-token planted span

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exactSubstrSpans: planted cross-doc span localized in BOTH " +
      "docs at the right offsets; unique docs untouched") {
    val d = docs(
      1L -> s"a1 a2 $shared b1",
      2L -> s"c1 $shared",
      4L -> "z1 z2 z3 z4 z5 z6 z7") // unique — no spans
    val got = graft.llm.Dedup.exactSubstrSpans(d, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .toSet
    // doc 1: S1..S6 at token positions 3..8; doc 2: at 2..7
    assert(got == Set((1L, 3, 8, 6), (2L, 2, 7, 6)))
  }

  test("exactSubstrSpans: a WITHIN-doc repeat is localized (the " +
      "occurrence-count contract, not a cross-doc pair contract)") {
    val d = docs(3L -> "S1 S2 S3 S4 S5 x S1 S2 S3 S4 S5")
    val got = graft.llm.Dedup.exactSubstrSpans(d, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // marks at 1 and 7, gap 6 > 5 → TWO islands (both copies cut)
    assert(got == Set((3L, 1, 5), (3L, 7, 11)))
  }

  test("exactSubstrSpans: overlapping and touching windows merge " +
      "into one maximal span") {
    // two docs sharing a 12-token run: marks at every position
    // 1..8 (k=5) merge into ONE span covering 1..12
    val run = (1 to 12).map(i => s"T$i").mkString(" ")
    val d = docs(5L -> run, 6L -> run)
    val got = graft.llm.Dedup.exactSubstrSpans(d, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .toSet
    assert(got == Set((5L, 1, 12, 12), (6L, 1, 12, 12)))
  }

  test("exactSubstrCut: all occurrences cut, docs re-assembled, " +
      "unique docs pass through with n_cut = 0") {
    val d = docs(
      1L -> s"a1 a2 $shared b1",
      2L -> s"c1 $shared",
      4L -> "z1 z2 z3")
    val got = graft.llm.Dedup.exactSubstrCut(d, k = 5).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(got(1L) == ((9, 6, "a1 a2 b1")))
    assert(got(2L) == ((7, 6, "c1")))
    assert(got(4L) == ((3, 0, "z1 z2 z3")))
  }
}
