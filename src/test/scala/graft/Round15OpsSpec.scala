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

  test("ppsSystematic: hit counts exactly proportional up to " +
      "rounding, sum of hits = k, light docs still reachable") {
    import spark.implicits._
    val d = Seq((1L, 10L), (2L, 30L), (3L, 60L))
      .toDF("doc_id", "n_chars")
    // k = 10, W = 100, points at 10,20,...,100: hits 1/3/6 exactly
    val g10 = graft.llm.Corpus.ppsSystematic(d, "n_chars", k = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(g10 == Map(1L -> 1, 2L -> 3, 3L -> 6))
    // k = 3: ceil rounding still reaches the light doc, sum stays 3
    val g3 = graft.llm.Corpus.ppsSystematic(d, "n_chars", k = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(g3 == Map(1L -> 1, 2L -> 1, 3L -> 1))
    // partitioning independence (the global-scan contract)
    val g10b = graft.llm.Corpus.ppsSystematic(d.repartition(7),
      "n_chars", k = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(g10b == g10)
  }

  test("luby MIS: independence, domination of excluded vertices, " +
      "isolated vertices always win, partitioning-independent") {
    import spark.implicits._
    // path 1-2-3-4-5, triangle 6-7-8, isolated 9
    val vs = (1L to 9L).toDF("id")
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
        (6L, 7L), (7L, 8L), (6L, 8L))
      .toDF("src", "dst")
    val st = graft.graph.Mis.luby(vs, es, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(st(9L) == 1, "isolated vertex must join the MIS in round 1")
    val mis = st.filter(_._2 == 1).keySet
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (6L, 7L), (7L, 8L), (6L, 8L))
    // independence: no edge inside the MIS
    und.foreach { case (a, b) =>
      assert(!(mis(a) && mis(b)), s"adjacent MIS vertices $a-$b")
    }
    // domination: every excluded vertex has an MIS neighbor
    st.filter(_._2 == -1).keys.foreach { v =>
      val nbrs = und.collect { case (a, b) if a == v => b
        case (a, b) if b == v => a }
      assert(nbrs.exists(mis), s"excluded $v has no MIS neighbor")
    }
    // 3 rounds decide this small graph completely, deterministically
    assert(!st.values.exists(_ == 0), s"undecided remain: $st")
    val st2 = graft.graph.Mis.luby(vs.repartition(5),
      es.repartition(3), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(st2 == st)
  }

  test("isotonicBins: the classic PAV pooling case, hand-solved") {
    import spark.implicits._
    // three singleton bins with rates [1, 0, 1]: PAV pools the first
    // two to 1/2 and leaves the third — fits [0.5, 0.5, 1.0]
    val df = Seq((1.00, "purchase"), (2.00, "view"), (3.00, "purchase"))
      .toDF("value", "event_type")
    val got = graft.ops.Calibration.isotonicBins(df, "value",
        col("event_type") === "purchase", nBins = 3)
      .collect().map(r => r.getInt(0) -> r.getLong(4)).toMap
    assert(got == Map(0 -> 500000L, 1 -> 500000L, 2 -> 1000000L))
  }

  test("isotonicBins: the fit is non-decreasing in bin (the PAV " +
      "contract) on non-monotone raw rates") {
    import spark.implicits._
    val rows = (1 to 400).map { i =>
      // sawtooth positive rate over an increasing score
      (i.toDouble, if ((i / 7 + i) % 3 == 0) "purchase" else "view")
    }
    val df = rows.toDF("value", "event_type")
    val fit = graft.ops.Calibration.isotonicBins(df, "value",
        col("event_type") === "purchase", nBins = 20)
      .orderBy("bin").collect().map(_.getLong(4)).toSeq
    assert(fit == fit.sorted, s"fit not monotone: $fit")
    assert(fit.distinct.size > 1, "degenerate all-equal fit")
  }

  test("conformalThreshold: exact rank rule and coverage audit, " +
      "hand-solved at n_cal = 100") {
    import spark.implicits._
    // cal scores 1..100, test scores 1..100: k = ceil(101*0.9) = 91,
    // qhat = 91.00, covered = 91 of 100
    val df = ((1 to 100).map(i => (i.toDouble, true)) ++
        (1 to 100).map(i => (i.toDouble, false)))
      .toDF("value", "cal")
    val r = graft.ops.Calibration.conformalThreshold(df, "value",
      col("cal"), alphaPct = 10).collect().head
    assert(r.getAs[Long]("n_cal") == 100L)
    assert(r.getAs[Long]("k_rank") == 91L)
    assert(r.getAs[Long]("qhat_cents") == 9100L)
    assert(r.getAs[Long]("n_covered") == 91L)
    assert(r.getAs[Long]("coverage_micro") == 910000L)
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
