package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 operators: the rolling-kernel ExactSubstr form
  * ([[graft.llm.Dedup.exactSubstrSpansRolling]] on
  * [[graft.functions.RollingGramFp]]).
  */
class Round16OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ---- RollingGramFp kernel -------------------------------------

  test("mulmod: matches BigInt arithmetic across the operand range " +
      "(boundaries + pseudo-random 61-bit values)") {
    import graft.functions.RollingGramFp.{P, mulmod}
    val rnd = new scala.util.Random(42)
    val edge = Seq(0L, 1L, 2L, P - 1, P - 2, (1L << 32) - 1, 1L << 60)
    val rand = Seq.fill(200)(math.abs(rnd.nextLong()) % P)
    for (a <- edge ++ rand.take(20); b <- edge ++ rand.drop(180))
      assert(BigInt(mulmod(a, b)) == (BigInt(a) * BigInt(b)) % BigInt(P),
        s"mulmod($a, $b)")
  }

  test("RollingGramFp: every rolled hash equals the from-scratch " +
      "polynomial of its window (the rolling recurrence is exact)") {
    import graft.functions.RollingGramFp.{B, P}
    val k = 5
    val toks = Seq("a", "b", "a", "c", "b", "a", "d", "a", "b", "c")
    val md = java.security.MessageDigest.getInstance("MD5")
    def code(t: String): Long = {
      md.reset()
      val d = md.digest(t.getBytes("UTF-8"))
      ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    }
    def direct(ws: Seq[String]): Long =
      ws.foldLeft(BigInt(0))((acc, t) =>
        (acc * BigInt(B) + BigInt(code(t))) % BigInt(P)).toLong
    import spark.implicits._
    val got = Seq(toks.mkString(" ")).toDF("text")
      .select(org.apache.spark.sql.GraftSqlShims.column(
        graft.functions.RollingGramFp(
          org.apache.spark.sql.GraftSqlShims.expression(
            split(col("text"), "\\s+")), k)).as("hs"))
      .collect().head.getSeq[Long](0)
    assert(got.length == toks.length - k + 1)
    for (i <- got.indices)
      assert(got(i) == direct(toks.slice(i, i + k)), s"window $i")
  }

  test("RollingGramFp: shorter-than-k array yields empty, NULL " +
      "element poisons, NULL input stays NULL") {
    import spark.implicits._
    def hs(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftSqlShims.column(
        graft.functions.RollingGramFp(
          org.apache.spark.sql.GraftSqlShims.expression(c), 5))
    val r1 = Seq("a b c").toDF("text")
      .select(hs(split(col("text"), "\\s+")).as("hs")).collect().head
    assert(r1.getSeq[Long](0).isEmpty)
    val r2 = spark.sql("SELECT array('a', CAST(NULL AS STRING), 'b', 'c', 'd', 'e') v")
      .select(hs(col("v")).as("hs")).collect().head
    assert(r2.isNullAt(0))
    val r3 = spark.sql("SELECT CAST(NULL AS ARRAY<STRING>) v")
      .select(hs(col("v")).as("hs")).collect().head
    assert(r3.isNullAt(0))
  }

  // ---- exactSubstrSpansRolling ≡ exactSubstrSpans ----------------

  test("exactSubstrSpansRolling: identical spans to the md5 form on " +
      "planted cross-doc, within-doc, and merged-window fixtures") {
    val shared = "S1 S2 S3 S4 S5 S6"
    val run = (1 to 12).map(i => s"T$i").mkString(" ")
    val d = docs(
      1L -> s"a1 a2 $shared b1",
      2L -> s"c1 $shared",
      3L -> "S1 S2 S3 S4 S5 x S1 S2 S3 S4 S5",
      4L -> "z1 z2 z3 z4 z5 z6 z7",
      5L -> run, 6L -> run)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .toSet
    val md5Form = rows(graft.llm.Dedup.exactSubstrSpans(d, k = 5))
    val rolling = rows(graft.llm.Dedup.exactSubstrSpansRolling(d, k = 5))
    assert(rolling == md5Form)
    // and the planted shape itself is right, not just consistent
    assert(rolling.contains((1L, 3, 8, 6)) && rolling.contains((2L, 2, 7, 6)))
  }

  // ---- MIS anchors over the dup-cluster graph --------------------

  test("MIS anchors: every near-dup cluster contains >= 1 anchor " +
      "(round-1 win argument) and no two anchors are adjacent") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val edges = graft.llm.Dedup.simhashPairs(docs, maxHamming = 3)
      .select(col("da").as("src"), col("db").as("dst"))
    val mis = graft.graph.Mis.luby(
      docs.select(col("doc_id").as("id")), edges, rounds = 3)
    val labels = graft.llm.Dedup
      .dupClusters(docs, maxHamming = 3)
      .select(col("doc_id"), col("cluster"))
    val st = labels.join(mis.withColumnRenamed("id", "doc_id"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // coverage: every cluster holds at least one state-1 anchor
    val byCluster = st.groupBy(_._2)
    assert(byCluster.nonEmpty)
    for ((cl, ms) <- byCluster)
      assert(ms.exists(_._3 == 1),
        s"cluster $cl has no anchor (states ${ms.map(_._3).toSeq})")
    // independence: no near-dup edge joins two anchors
    val anchors = st.filter(_._3 == 1).map(_._1).toSet
    val adjacentAnchors = edges.collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .filter { case (a, b) => anchors(a) && anchors(b) }
    assert(adjacentAnchors.isEmpty,
      s"adjacent anchors: ${adjacentAnchors.toSeq}")
  }

  test("exactSubstrSpansRolling: identical spans to the md5 form on " +
      "the real documents fixture at the production grain") {
    val d = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val a = graft.llm.Dedup.exactSubstrSpans(d, k = 50).collect()
      .map(_.toSeq).toSet
    val b = graft.llm.Dedup.exactSubstrSpansRolling(d, k = 50).collect()
      .map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }
}
