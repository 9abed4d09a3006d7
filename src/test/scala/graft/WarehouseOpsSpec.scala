package graft

import graft.load.Layout
import graft.ops.Scd
import graft.quality.DataQuality
import graft.ts.Interpolate
import graft.llm.Retrieval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-7 warehouse/retrieval additions
  * (SCD2, referential audit, Z-order layout, gap interpolation, BM25);
  * value parity with DuckDB is the oracle gate's job.
  */
class WarehouseOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("scd2 collapses runs, versions them, and chains validity") {
    import spark.implicits._
    // key 1: A A B A (4 events, 3 runs); key 2: one event
    val ev = Seq(
      (1L, "A", 10L, 100L), (1L, "A", 20L, 101L), (1L, "B", 30L, 102L),
      (1L, "A", 40L, 103L),
      (2L, "X", 10L, 104L))
      .toDF("k", "attr", "d", "eid")
    val h = Scd.type2(ev, Seq("k"), Seq("attr"), Seq("d", "eid"))
      .orderBy("k", "version").collect()
    assert(h.length == 4)
    val k1 = h.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getString(1)).toSeq == Seq("A", "B", "A"))
    assert(k1.map(_.getLong(2)).toSeq == Seq(10L, 30L, 40L)) // d_from
    // valid_to = next run's start; NULL (current) on the last
    assert(k1.map(r => Option(r.get(4)).map(_.asInstanceOf[Long]))
      .toSeq == Seq(Some(30L), Some(40L), None))
    assert(k1.map(_.getInt(6)).toSeq == Seq(1, 2, 3))
    assert(k1.map(_.getBoolean(7)).toSeq == Seq(false, false, true))
    val k2 = h.filter(_.getLong(0) == 2L)
    assert(k2.length == 1 && k2.head.getBoolean(7))
  }

  test("scd2 run-start survives a NULL first attribute") {
    import spark.implicits._
    val ev = Seq((1L, Option.empty[String], 10L), (1L, Some("A"), 20L),
      (1L, Option.empty[String], 30L), (1L, Option.empty[String], 40L))
      .toDF("k", "attr", "d")
    val h = Scd.type2(ev, Seq("k"), Seq("attr"), Seq("d"))
      .orderBy("version").collect()
    // runs: NULL, A, NULL (consecutive NULLs collapse via <=>)
    assert(h.length == 3)
    assert(h.map(r => Option(r.getString(1))).toSeq ==
      Seq(None, Some("A"), None))
  }

  test("refIntegrity counts orphans and distinct missing keys") {
    import spark.implicits._
    val child = Seq((1L, "a"), (2L, "b"), (2L, "c"), (9L, "d"),
      (9L, "e"), (7L, "f")).toDF("fk_col", "x")
    val childN = child.withColumn("fk_col",
      when(col("x") === "f", lit(null)).otherwise(col("fk_col")))
    val parent = Seq(1L, 2L).toDF("pk_col")
    val r = DataQuality.refIntegrity(Seq(
        DataQuality.FkEdge("t", childN, "fk_col", parent, "pk_col")))
      .collect().head
    assert(r.getLong(1) == 5)  // NULL fk excluded from n_child
    assert(r.getLong(2) == 2)  // two rows with fk 9
    assert(r.getLong(3) == 1)  // one distinct missing key
  }

  test("refIntegrity bloom gate: identical answer at honest and " +
    "saturated grids") {
    import spark.implicits._
    val child = Seq(1L, 2L, 2L, 9L, 9L, 7L).toDF("fk_col")
    val parent = Seq(1L, 2L, 3L, 4L, 5L).toDF("pk_col")
    val edges = Seq(DataQuality.FkEdge("t", child, "fk_col",
      parent, "pk_col"))
    val plain = DataQuality.refIntegrity(edges).collect().toSeq
    val gated = DataQuality.refIntegrityBloom(edges).collect().toSeq
    // m=64 → one grid chunk, effectively all-bits-set: every parent
    // row survives the gate and the answer still matches
    val saturated = DataQuality.refIntegrityBloom(edges, m = 64, d = 1)
      .collect().toSeq
    assert(gated == plain && saturated == plain)
    assert(plain.head.getLong(2) == 3) // rows with fk 9,9,7
  }

  test("z-order key interleaves bucket bits exactly") {
    import spark.implicits._
    // values 0..3 with bits=2 → bucket rank == value
    val df = Seq((0L, 0L), (1L, 2L), (3L, 3L), (2L, 1L))
      .toDF("a", "b")
    val z = Layout.withZKey(df, "a", "b", bits = 2)
      .select(col("a"), col("b"), col("zkey")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    def morton(a: Long, b: Long): Long =
      (0 until 2).map(i => (((a >> i) & 1) << (2 * i + 1)) |
        (((b >> i) & 1) << (2 * i))).sum
    assert(z((0L, 0L)) == morton(0, 0))
    assert(z((1L, 2L)) == morton(1, 2))
    assert(z((3L, 3L)) == morton(3, 3) && morton(3, 3) == 15L)
    assert(z((2L, 1L)) == morton(2, 1))
  }

  test("z-order blocks have narrow spans on BOTH dimensions") {
    import spark.implicits._
    // 32×32 grid, bits=5 → bucket == coordinate; blockBits=4 → 16
    // blocks of 64 cells; each block's span must be ≤ half the range
    // on each axis (z-curve rectangles), vs 31 for a 1-D layout
    val grid = (0 until 32).flatMap(a => (0 until 32).map(b =>
      (a.toLong, b.toLong))).toDF("a", "b")
    val st = Layout.zBlockStats(grid, "a", "b", bits = 5, blockBits = 4)
      .collect()
    assert(st.length == 16)
    st.foreach { r =>
      assert(r.getLong(1) == 64)
      assert(r.getLong(3) - r.getLong(2) <= 15) // max_a - min_a
      assert(r.getLong(5) - r.getLong(4) <= 15)
    }
  }

  test("interpolation fills gaps linearly and edges one-sided") {
    import spark.implicits._
    val bars = Seq(
      (1L, "2024-01-03", 10.0), (1L, "2024-01-06", 16.0),
      (1L, "2024-01-07", 20.0))
      .toDF("id", "dt", "close")
      .select(col("id"), col("dt").cast("date").as("dt"), col("close"))
    val f = Interpolate.fillDaily(bars).orderBy("date_day").collect()
    assert(f.length == 5) // densified to the symbol's own span
    val fills = f.map(r => (r.getDate(1).toString,
      r.getFloat(3), r.getBoolean(4)))
    assert(fills(0) == ("2024-01-03", 10.0f, false))
    // 2024-01-04/05 interpolate 10→16 over 3 days: 12, 14
    assert(fills(1) == ("2024-01-04", 12.0f, true))
    assert(fills(2) == ("2024-01-05", 14.0f, true))
    assert(fills(3) == ("2024-01-06", 16.0f, false))
    assert(fills(4) == ("2024-01-07", 20.0f, false))
  }

  test("bm25 ranks the better-matching doc first, k caps output") {
    import spark.implicits._
    // doc 1 mentions 'x' 3 times in 4 tokens; doc 2 once in 4; doc 3
    // never. Query {x}: doc1 > doc2, doc3 absent.
    val docs = Seq((1L, "x x x y"), (2L, "x y y y"), (3L, "y y y y"))
      .toDF("doc_id", "text")
    val q = Seq((100L, "x")).toDF("query_id", "term")
    val r = Retrieval.bm25TopK(docs, q, k = 10).orderBy("rank").collect()
    assert(r.map(_.getLong(2)).toSeq == Seq(1L, 2L))
    assert(r.map(_.getInt(1)).toSeq == Seq(1, 2))
    assert(r.forall(_.getInt(3) == 1)) // one matched term each
    assert(r.head.getFloat(4) > r.last.getFloat(4))
    val r1 = Retrieval.bm25TopK(docs, q, k = 1).collect()
    assert(r1.length == 1 && r1.head.getLong(2) == 1L)
  }

  test("scd2 applyChanges equals a full recompute and chains versions") {
    import spark.implicits._
    // key 1: A A | B A  (split after d=20); key 2: X | (no batch);
    // key 3: | Z Z (first appears in the batch)
    val all = Seq(
      (1L, "A", 10L), (1L, "A", 20L), (1L, "B", 30L), (1L, "A", 40L),
      (2L, "X", 15L),
      (3L, "Z", 35L), (3L, "Z", 45L))
      .toDF("k", "attr", "d")
    val full = Scd.type2(all, Seq("k"), Seq("attr"), Seq("d"))
    val hist = Scd.type2(all.where(col("d") <= 20), Seq("k"), Seq("attr"),
      Seq("d"))
    val merged = Scd.applyChanges(hist, all.where(col("d") > 20),
      Seq("k"), Seq("attr"), Seq("d"))
    assert(merged.unionByName(full).distinct().count() == full.count())
    assert(merged.count() == full.count())
  }

  test("pagerank: center of a star outranks leaves, bit-stable") {
    import spark.implicits._
    // undirected star 0–{1,2,3} plus dangling node 9
    val edges = Seq((0L, 1L), (1L, 0L), (0L, 2L), (2L, 0L),
      (0L, 3L), (3L, 0L)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L, 3L, 9L).toDF("id")
    val r = graft.graph.PageRank.run(nodes, edges, iters = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(0L) > r(1L) && r(1L) == r(2L) && r(2L) == r(3L))
    assert(r(9L) < r(1L)) // unreferenced: teleport floor only
    // partition-invariance: integer arithmetic is order-free
    val r2 = graft.graph.PageRank.run(nodes.repartition(7),
      edges.repartition(5), iters = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == r2)
  }

  test("twap weights each price by its holding time") {
    import spark.implicits._
    // one symbol, one day: 10.0 held 6h (00:00→06:00), 20.0 held 18h
    val day = java.time.LocalDate.parse("2024-01-05")
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    val ev = Seq((1L, day, 10.0, 100L), (1L, day + 21600L, 20.0, 101L))
      .toDF("user_id", "t", "value", "event_id")
      .select(col("user_id"), col("t").cast("timestamp").as("ts"),
        col("value"), col("event_id"))
    val r = graft.ts.Twap.daily(ev).collect().head
    assert(r.getInt(2) == 2)
    assert(r.getLong(3) == 86400L)
    // (10*21600 + 20*64800) / 86400 = 17.5
    assert(r.getFloat(4) == 17.5f)
  }

  test("cdc chunking is shift-robust: a head insertion leaves " +
    "downstream chunk digests intact") {
    import spark.implicits._
    import graft.llm.Dedup
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, base), (2L, "INSERTED " + base)).toDF("doc_id", "text")
    val ch = Dedup.cdcChunks(docs).collect()
    val d1 = ch.filter(_.getLong(0) == 1L).map(_.getString(4)).toSet
    val d2 = ch.filter(_.getLong(0) == 2L).map(_.getString(4)).toSet
    // every chunk of doc 1 past the first boundary must reappear in
    // doc 2 verbatim — only the head chunk differs
    val shared = d1.intersect(d2)
    assert(d1.size >= 3, s"fixture too short: ${d1.size} chunks")
    assert(shared.size >= d1.size - 1,
      s"only ${shared.size}/${d1.size} chunks survived the insertion")
    // the shared chunks carry df = 2; doc-unique ones df = 1
    assert(ch.filter(r => shared.contains(r.getString(4)))
      .forall(_.getLong(5) == 2L))
    // chunks tile each doc exactly: token counts sum to doc length
    assert(ch.filter(_.getLong(0) == 1L).map(_.getInt(3)).sum == 60)
    assert(ch.filter(_.getLong(0) == 2L).map(_.getInt(3)).sum == 61)
  }

  test("robust outliers: median/MAD flags the fat finger the mean " +
    "would absorb") {
    import spark.implicits._
    // 9 values near 10 plus one 10^6 spike: med≈10, mad small, the
    // spike (and only the spike) flags
    val vals = Seq(9.0, 9.5, 10.0, 10.0, 10.0, 10.2, 10.5, 11.0, 9.8,
      1000000.0)
    val df = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, "x", v) }
      .toDF("event_id", "event_type", "value")
    val r = DataQuality.robustOutliers(df, "value", "event_type")
      .collect().head
    assert(r.getLong(1) == 10)
    assert(math.abs(r.getFloat(2) - 10.0f) < 0.2f)
    assert(r.getFloat(3) < 1.0f)
    assert(r.getLong(4) == 1L)
  }

  test("accepted values: clean check reads zero, violations counted") {
    import spark.implicits._
    val df = Seq("A", "A", "B", "C", "C", "C").toDF("v")
      .unionByName(Seq(Option.empty[String]).toDF("v"))
    val checks = Seq(
      DataQuality.ValueCheck("clean", df, "v", Seq("A", "B", "C")),
      DataQuality.ValueCheck("strict", df, "v", Seq("A")))
    val r = DataQuality.acceptedValues(checks).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r("clean") == ((7L, 0L, 0L)))  // NULL passes
    assert(r("strict") == ((7L, 4L, 2L))) // B, C, C, C → 2 distinct
  }

  test("bm25 idf discounts the term every doc contains") {
    import spark.implicits._
    // 'c' is in all docs (df=3), 'r' only in doc 1 (df=1) — equal tf,
    // equal dl, so the rare-term query must score doc 1 higher than
    // the common-term query scores doc 2
    val docs = Seq((1L, "r c a b"), (2L, "c a b d"), (3L, "c e f g"))
      .toDF("doc_id", "text")
    val q = Seq((1L, "r"), (2L, "c")).toDF("query_id", "term")
    val byQ = Retrieval.bm25TopK(docs, q, k = 1).collect()
      .map(r => r.getLong(0) -> r.getFloat(4)).toMap
    assert(byQ(1L) > byQ(2L))
  }

  test("compaction plan: size-desc next-fit bins, per-partition restart") {
    import spark.implicits._
    val manifest = Seq(
      // partition p1: sizes 90, 60, 30, 20 → ordered desc, target 100:
      // bins by exclusive cumsum div 100 = 0|90, 0|150?  90→bin0,
      // 60 (cum 90) → bin0, 30 (cum 150) → bin1, 20 (cum 180) → bin1
      ("p1", 1L, 60L), ("p1", 2L, 90L), ("p1", 3L, 30L), ("p1", 4L, 20L),
      // p2 restarts at bin 0 regardless of p1's sums
      ("p2", 1L, 10L)).toDF("part_key", "file_id", "sz")
    val r = graft.load.Compaction.plan(manifest, target = 100L).collect()
      .map(x => (x.getString(0), x.getLong(1)) ->
        ((x.getLong(3), x.getInt(4), x.getLong(5)))).toMap
    assert(r(("p1", 2L)) == ((0L, 2, 150L))) // 90 first (size desc)
    assert(r(("p1", 1L)) == ((0L, 2, 150L)))
    assert(r(("p1", 3L)) == ((1L, 2, 50L)))
    assert(r(("p1", 4L)) == ((1L, 2, 50L)))
    assert(r(("p2", 1L)) == ((0L, 1, 10L)))
  }

  test("compaction plan: bin count and max-bin-size bounds hold") {
    import spark.implicits._
    val sizes = (1 to 37).map(i => (i * 7 % 50) + 1L)
    val manifest = sizes.zipWithIndex.map { case (s, i) =>
      ("p", i.toLong, s) }.toDF("part_key", "file_id", "sz")
    val target = 64L
    val rows = graft.load.Compaction.plan(manifest, target)
      .select("bin", "bin_sz").distinct().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bin count ≤ ⌊total/target⌋ + 1 — output file count tracks volume
    assert(rows.size <= sizes.sum / target + 1)
    // no rewrite job exceeds target + the largest input file
    assert(rows.values.forall(_ <= target + sizes.max))
    // bins tile the partition exactly
    assert(rows.values.sum == sizes.sum)
  }

  test("table diff classifies adds/removes/changes and names the " +
      "changed columns; same rows dropped; NULLs null-safe") {
    import spark.implicits._
    val v1 = Seq(
      (1L, "en", Some(10L)),  // unchanged
      (2L, "en", Some(20L)),  // lang flips
      (3L, "de", None),       // NULL n survives null-safe compare
      (4L, "fr", Some(40L)))  // removed in v2
      .toDF("pk", "lang", "n")
    val v2 = Seq(
      (1L, "en", Some(10L)),
      (2L, "xx", Some(20L)),
      (3L, "de", Option.empty[Long]),
      (5L, "es", Some(50L)))  // added
      .toDF("pk", "lang", "n")
    val out = graft.ops.TableDiff.diff(v1, v2, "pk", Seq("lang", "n"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(out == Map(
      2L -> (("changed", "lang")),
      4L -> (("removed", "")),
      5L -> (("added", ""))))
    // a NULL -> value transition IS a change, named alphabetically
    val v2b = Seq((3L, "de", Some(7L))).toDF("pk", "lang", "n")
    val out2 = graft.ops.TableDiff.diff(
      v1.where($"pk" === 3L), v2b, "pk", Seq("lang", "n")).collect()
    assert(out2.map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq == Seq((3L, "changed", "n")))
  }
}
