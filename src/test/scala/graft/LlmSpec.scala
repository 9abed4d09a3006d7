package graft

import graft.llm.{Dedup, Multimodal, Similarity, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the probabilistic LLM-pipeline operators that have no
  * SQL oracle: LSH ANN recall, MinHash candidate completeness on the
  * fixture, SimHash locality, and the multimodal decode plumbing.
  */
class LlmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs =
    Tables.load(spark, "/root/testdata/sf0.001", "documents")
  private lazy val embs =
    Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  test("prefix-filtered jaccard equals naive all-pairs on synthetic docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 30).map(i => s"w$i")
    val texts = scala.collection.mutable.ArrayBuffer.empty[String]
    (0 until 80).foreach { i =>
      if (i % 5 == 0 || texts.isEmpty) {
        texts += Seq.fill(12 + rnd.nextInt(25))(
          vocab(rnd.nextInt(vocab.size))).mkString(" ")
      } else {
        // mutate a previous doc: drop/replace a few tokens → pairs
        // spread across the whole jaccard range incl. near-threshold
        val base = texts(rnd.nextInt(texts.size)).split(" ").toBuffer
        (0 until rnd.nextInt(6)).foreach { _ =>
          base(rnd.nextInt(base.size)) = vocab(rnd.nextInt(vocab.size))
        }
        texts += base.mkString(" ")
      }
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toSeq.toDF("doc_id", "text")
    val t = 0.3
    def shingleSet(s: String): Set[String] =
      s.split("\\s+").sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    val sets = texts.zipWithIndex
      .map { case (s, i) => i.toLong -> shingleSet(s) }.toMap
    val naive = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size
      j = inter.toDouble / (sets(a).size + sets(b).size - inter)
      if BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP) >= t
    } yield (a, b)).toSet
    val gotIndex = Dedup.jaccardPairs(docs, 3, t)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotPrefix = Dedup.jaccardPairsPrefix(docs, 3, t)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotIndex == naive)
    assert(gotPrefix == naive)
  }

  test("minhash-LSH pairs equal exact jaccard pairs at threshold 0.5") {
    val exact = Dedup.jaccardPairs(docs, 3, 0.5)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashPairs(docs, 3, 0.5)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact) // full recall on fixture + exact verify = equality
  }

  test("LSH ANN: results are a subset of correct cosines; recall >= 0.4") {
    val brute = Similarity.bruteForceTopK(embs, col("vec_id") < 10, 5)
      .select("qid", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(embs, col("vec_id") < 10, 5)
      .select("qid", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty)
    val recall = (lsh & brute).size.toDouble / brute.size
    info(f"LSH recall = $recall%.3f")
    // Deterministic planes → recall is a fixed property of the fixture:
    // measured 0.42 with 4 tables × 4 bits on 10 queries (md5-parity
    // planes). Pin ≥ 0.4 so a silent bucketing regression (degenerate
    // hash, broken OR-construction) fails the suite instead of sliding
    // through a recall > 0 bar.
    assert(recall >= 0.4 && lsh.size <= 50)
  }

  test("IVF ANN: valid output shape; recall >= 0.8 vs brute force") {
    val brute = Similarity.bruteForceTopK(embs, col("vec_id") < 10, 5)
      .select("qid", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(embs, col("vec_id") < 10, 5,
      nlist = 8, nprobe = 3)
      .select("qid", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty && ivf.size <= 50)
    val recall = (ivf & brute).size.toDouble / brute.size
    info(f"IVF recall = $recall%.3f")
    // Deterministic init + Lloyd → fixed recall on the fixture: measured
    // 0.90 at nlist=8/nprobe=3. Pin ≥ 0.8 (same rationale as LSH above).
    assert(recall >= 0.8)
  }

  test("LSH cosine near-dup pairs are a subset of exact; recall pinned") {
    val exact = Similarity.cosineDups(embs, 0.4)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.cosineDupsLsh(embs, 0.4)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)          // threshold chosen to be non-trivial
    assert(lsh.subsetOf(exact))     // precision 1 by construction
    val recall = (lsh & exact).size.toDouble / exact.size
    info(f"cosine-dup LSH recall = $recall%.3f (${exact.size} exact pairs)")
    // Deterministic md5-parity planes → fixed on the frozen fixture
    // (measured 0.485 at t=0.4 — modest by design: 0.4-cosine pairs sit
    // far from the 16-plane bucket-collision sweet spot, which targets
    // true near-dups). Pinned with slack like the ANN bounds.
    assert(recall >= 0.4)
  }

  test("rolling fingerprint is order-sensitive; fingerprint is not") {
    import spark.implicits._
    val df = Seq((0L, "alpha beta gamma"), (1L, "gamma beta alpha"),
      (2L, "alpha beta gamma")).toDF("doc_id", "text")
    val roll = df.select(col("doc_id"),
      TextOps.rollingFingerprint(col("text")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(roll(0L) == roll(2L))    // deterministic
    assert(roll(0L) != roll(1L))    // order matters
    val fp = df.select(col("doc_id"),
      TextOps.fingerprint(col("text")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(0L) == fp(2L))
  }

  test("simhash: identical docs agree; near-dup pairs closer than random") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 5
    val near = base.replace("lazy", "sleepy")
    val far = "completely different words about databases and spark " * 5
    val df = Seq((0L, base), (1L, base), (2L, near), (3L, far))
      .toDF("doc_id", "text")
    val fp = Dedup.simhash(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(fp(0L) == fp(1L))
    assert(ham(fp(0L), fp(2L)) < ham(fp(0L), fp(3L)))
  }

  test("multimodal decode: partition-streaming stub appends features") {
    val frame = Multimodal.multimodalFrame(docs, embs)
    val decoded = Multimodal.decodePayloads(frame)
    assert(decoded.columns.takeRight(3).toSeq ==
      Seq("width", "height", "format"))
    val row = decoded.orderBy("doc_id").limit(1).collect()(0)
    val payload = row.getAs[Array[Byte]]("payload")
    val (w, h, f) = Multimodal.decodeStub(payload)
    assert(row.getAs[Int]("width") == w)
    assert(row.getAs[Int]("height") == h)
    assert(row.getAs[String]("format") == f)
    assert(decoded.count() == frame.count())
  }
}
