package graft

import graft.llm.Bpe
import org.scalatest.funsuite.AnyFunSuite

/** BPE training pinned against an independent in-memory reference
  * implementation (the oracle gate covers SQL parity; this pins the
  * algorithm against the paper's procedure directly).
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Straight transcription of Sennrich et al.'s procedure: symbol
    * sequences per word, overlapping adjacent-pair counts, most
    * frequent pair first (lexicographic tiebreak), greedy
    * left-to-right fusion.
    */
  private def refBpe(words: Map[String, Long], n: Int)
      : (Seq[(Int, String, String, Long)], Map[String, Seq[String]]) = {
    var syms: Map[String, (Long, Vector[String])] = words.map {
      case (w, f) => w -> ((f, w.map(_.toString).toVector :+ "</w>"))
    }
    val merges = (1 to n).map { r =>
      val counts = collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      syms.values.foreach { case (f, s) =>
        s.sliding(2).foreach(p => counts((p(0), p(1))) += f)
      }
      val ((lhs, rhs), cnt) = counts.toSeq
        .minBy { case ((a, b), c) => (-c, a, b) }
      syms = syms.map { case (w, (f, s)) =>
        val out = collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == lhs && s(i + 1) == rhs) {
            out += lhs + rhs; i += 2
          } else { out += s(i); i += 1 }
        }
        w -> ((f, out.toVector))
      }
      (r, lhs, rhs, cnt)
    }
    (merges, syms.map { case (w, (_, s)) => w -> s })
  }

  test("bpe training equals the reference procedure on the classic corpus") {
    import spark.implicits._
    // the paper's toy distribution: low x5, lower x2, newest x6, widest x3
    val wordFreq = Map("low" -> 5L, "lower" -> 2L,
      "newest" -> 6L, "widest" -> 3L)
    val text = wordFreq.toSeq.flatMap { case (w, f) =>
      Seq.fill(f.toInt)(w) }.mkString(" ")
    val in = Seq((0L, text)).toDF("doc_id", "text")
    val (mergesDf, vocabDf) = Bpe.bpeState(in, 6)
    val got = mergesDf.collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val (want, wantVocab) = refBpe(wordFreq, 6)
    assert(got == want)
    // e s is the most frequent first pair (9 = newest 6 + widest 3)
    assert(got.head._2 == "e" && got.head._3 == "s" && got.head._4 == 9L)
    val vocab = vocabDf.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(vocab.keySet == wordFreq.keySet)
    wordFreq.foreach { case (w, f) =>
      assert(vocab(w) == ((f, wantVocab(w).mkString(" "))), s"word $w")
    }
  }

  test("applyMerges segments an UNSEEN word with the trained table") {
    import spark.implicits._
    val train = Seq((0L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
      .toDF("doc_id", "text")
    val merges = Bpe.bpeTrain(train, 2) // (e,s) then (es,t)
    val got = merges.collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(("e", "s"), ("es", "t")))
    // "best" never appears in training; the merge table still segments it
    val unseen = Seq(("best", " b e s t </w> ")).toDF("word", "sym")
    val out = Bpe.applyMerges(unseen, merges, 2).collect()(0)
    assert(out.getString(1).trim == "b est </w>")
  }

  test("bpe merge application is greedy left-to-right on repeats") {
    import spark.implicits._
    // "aaa" x2: round 1 merges (a,a) — overlapping pairs both count
    // (cnt 4 across two words of 2 each) but application fuses only
    // the leftmost, leaving [aa, a, </w>]
    val in = Seq((0L, "aaa aaa")).toDF("doc_id", "text")
    val (merges, vocab) = Bpe.bpeState(in, 1)
    val m = merges.collect()(0)
    assert((m.getString(1), m.getString(2), m.getLong(3)) == (("a", "a", 4L)))
    assert(vocab.collect()(0).getString(2) == "aa a </w>")
  }
}
