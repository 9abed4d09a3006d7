package graft

import graft.functions.{MinHashSig, RollingFp, SimHash32, SortedIntersectCount, SortedRunStats, WordShingles}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the native per-doc kernels, evaluated
  * directly against independent Scala references (no Spark session —
  * the fixture-level bit-equivalence with the builtin formulations is
  * pinned in MinHashSigSpec; these cover the input space).
  */
object GraftFunctionsProps extends Properties("GraftFunctions") {

  private def arr(tokens: Seq[String]): ArrayData =
    new GenericArrayData(
      tokens.map(UTF8String.fromString).toArray[Any])

  private def strs(a: Any): Seq[String] =
    a.asInstanceOf[GenericArrayData].array.toSeq
      .map(_.asInstanceOf[UTF8String].toString)

  private val nullStr = Literal.create(null, ArrayType(StringType))
  private val nullLong = Literal.create(null, ArrayType(LongType))

  private val toks: Gen[List[String]] = for {
    len <- Gen.choose(0, 40)
    xs <- Gen.listOfN(len,
      Gen.oneOf("a", "b", "cd", "efg", "q1", "zz", "a", "b"))
  } yield xs

  property("WordShingles(distinct) == sliding.mkString.distinct") =
    Prop.forAll(toks, Gen.choose(1, 5)) { (ts, n) =>
      val got = strs(WordShingles(nullStr, n).compute(arr(ts)))
      val want =
        if (ts.length < n) Seq.empty[String]
        else ts.sliding(n).map(_.mkString(" ")).toSeq.distinct
      got == want
    }

  property("WordShingles(multiset) == sliding.mkString") =
    Prop.forAll(toks, Gen.choose(1, 5)) { (ts, n) =>
      val got = strs(
        WordShingles(nullStr, n, distinct = false).compute(arr(ts)))
      val want =
        if (ts.length < n) Seq.empty[String]
        else ts.sliding(n).map(_.mkString(" ")).toSeq
      got == want
    }

  private val longSet: Gen[Array[Long]] = for {
    len <- Gen.choose(0, 50)
    xs <- Gen.listOfN(len, Gen.choose(-1000L, 1000L))
  } yield xs.distinct.sorted.toArray

  property("SortedIntersectCount == set-intersection size") =
    Prop.forAll(longSet, longSet) { (a, b) =>
      val got = SortedIntersectCount(nullLong, nullLong)
        .compute(new GenericArrayData(a), new GenericArrayData(b))
      got == a.toSet.intersect(b.toSet).size
    }

  private val longSorted: Gen[Array[Long]] = for {
    len <- Gen.choose(0, 50)
    xs <- Gen.listOfN(len, Gen.choose(-30L, 30L)) // narrow → duplicates
  } yield xs.sorted.toArray

  property("SortedIntersectCount counts duplicated values once") =
    Prop.forAll(longSorted, longSorted) { (a, b) =>
      val got = SortedIntersectCount(nullLong, nullLong)
        .compute(new GenericArrayData(a), new GenericArrayData(b))
      got == a.toSet.intersect(b.toSet).size
    }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  property("SimHash32 == hex-string nibble reference") =
    Prop.forAll(toks) { ts =>
      val got = SimHash32(nullStr).compute(arr(ts)).toString
      val counts = Array.fill(32)(0)
      ts.foreach { t =>
        val hex = md5Hex(t)
        for (j <- 0 until 32) {
          val nib = Integer.parseInt(hex(j / 4).toString, 16)
          val bit = (nib >> (3 - j % 4)) & 1
          counts(j) += bit * 2 - 1
        }
      }
      got == counts.map(c => if (c > 0) '1' else '0').mkString
    }

  property("MinHashSigMd5 == per-family md5-word affine reference") =
    Prop.forAll(toks, Gen.choose(1, 8)) { (ts, k) =>
      import graft.functions.MinHashSigMd5.{M, a, b}
      val got = graft.functions.MinHashSigMd5(nullStr, k).compute(arr(ts))
      if (ts.isEmpty) Prop(got == null)
      else {
        val gotSeq = got.asInstanceOf[GenericArrayData].toLongArray().toSeq
        val want = (0 until k).map { j =>
          ts.map { s =>
            val hex = md5Hex(s)
            val x1 = java.lang.Long.parseLong(hex.substring(0, 8), 16)
            val x2 = java.lang.Long.parseLong(hex.substring(8, 16), 16)
            ((a(j) * x1) % M + (b(j) * x2) % M + j) % M
          }.min
        }
        Prop(gotSeq == want)
      }
    }

  property("MinHashSigMd5: NULL elements are skipped; all-NULL -> NULL") =
    Prop.forAll(toks, Gen.choose(1, 4), Gen.choose(0, 40)) { (ts, k, pos) =>
      val expr = graft.functions.MinHashSigMd5(nullStr, k)
      val elems: Seq[Any] =
        ts.map(UTF8String.fromString).patch(pos min ts.length, Seq(null), 0)
      val withNull = expr.compute(new GenericArrayData(elems.toArray[Any]))
      val without = expr.compute(arr(ts))
      val allNull = expr.compute(
        new GenericArrayData(Array[Any](null, null)))
      Prop(allNull == null) && Prop(
        (withNull, without) match {
          case (null, null) => true
          case (g: GenericArrayData, w: GenericArrayData) =>
            g.toLongArray().toSeq == w.toLongArray().toSeq
          case _ => false
        })
    }

  property("MinHashSig: NULL element hashes as the bare seed-42 chain") =
    Prop.forAll(toks, Gen.choose(1, 8), Gen.choose(0, 40)) { (ts, k, pos) =>
      val elems: Seq[Any] =
        ts.map(UTF8String.fromString).patch(pos min ts.length, Seq(null), 0)
      val got = MinHashSig(nullStr, k).compute(new GenericArrayData(
        elems.toArray[Any])).asInstanceOf[GenericArrayData]
        .toLongArray().toSeq
      // reference: per hash family j, min over elements of
      // xxhash64(s, lit(j)) with a NULL element contributing
      // hashInt(j, 42) (the builtin skips NULL children)
      val want = (0 until k).map { j =>
        elems.map {
          case null => XXH64.hashInt(j, 42L)
          case s: UTF8String => XXH64.hashInt(j, XXH64.hashUTF8String(s, 42L))
        }.min
      }
      got == want
    }

  property("RollingFp == md5-first-32-bits Horner reference") =
    Prop.forAll(toks) { ts =>
      val got = RollingFp(nullStr).compute(arr(ts))
      val want = ts.foldLeft(0L) { (acc, t) =>
        val code = java.lang.Long.parseLong(md5Hex(t).take(8), 16)
        (acc * 31L + code) % 1000000007L
      }
      got == want
    }

  property("RollingFp NULL element poisons the fold (aggregate parity)") =
    Prop.forAll(toks) { ts =>
      val withNull = new GenericArrayData(
        (ts.map(UTF8String.fromString) :+ null).toArray[Any])
      RollingFp(nullStr).compute(withNull) == null
    }

  private val longMultiset: Gen[Array[Long]] = for {
    len <- Gen.choose(0, 60)
    xs <- Gen.listOfN(len, Gen.choose(-20L, 20L)) // narrow range → runs
  } yield xs.sorted.toArray

  property("SortedRunStats == groupBy multiplicity reference") =
    Prop.forAll(longMultiset) { a =>
      val row = SortedRunStats(nullLong)
        .compute(new GenericArrayData(a))
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      val mult = a.groupBy(identity).view.mapValues(_.length)
      row.getInt(0) == a.length &&
        row.getInt(1) == mult.size &&
        row.getInt(2) == (if (a.isEmpty) 0 else mult.values.max)
    }

  private val nullDbl = Literal.create(null,
    ArrayType(org.apache.spark.sql.types.DoubleType))
  private val vec: Gen[List[Double]] = for {
    len <- Gen.choose(0, 32)
    xs <- Gen.listOfN(len, Gen.choose(-1e6, 1e6))
  } yield xs

  property("QuantizeI8: codes bounded by 127, extremum hits ±127") =
    Prop.forAll(vec) { v =>
      val q = graft.functions.QuantizeI8(nullDbl)
        .compute(new GenericArrayData(v.toArray[Any]))
        .asInstanceOf[Array[Byte]]
      val bounded = q.forall(b => b >= -127 && b <= 127)
      val m = if (v.isEmpty) 0.0 else v.map(math.abs).max
      val extremum = m == 0.0 ||
        v.indices.exists(i => math.abs(v(i)) == m && math.abs(q(i)) == 127)
      bounded && extremum && q.length == v.length
    }

  property("QuantizeI8: invariant under positive scalar scaling") =
    Prop.forAll(vec, Gen.choose(0.001, 1000.0)) { (v, c) =>
      def codes(xs: List[Double]) = graft.functions.QuantizeI8(nullDbl)
        .compute(new GenericArrayData(xs.toArray[Any]))
        .asInstanceOf[Array[Byte]].toSeq
      // x/(m/127) is scale-free up to double rounding; require the
      // exactly-representable scalings where it is bit-stable
      val c2 = math.pow(2.0, (math.log(c) / math.log(2)).round.toDouble)
      codes(v.map(_ * c2)) == codes(v)
    }

  property("QuantizedDot == BigInt reference (no overflow in int)") =
    Prop.forAll(vec, vec) { (a, b) =>
      def codes(xs: List[Double]) = graft.functions.QuantizeI8(nullDbl)
        .compute(new GenericArrayData(xs.toArray[Any]))
        .asInstanceOf[Array[Byte]]
      val (qa, qb) = (codes(a), codes(b))
      val got = graft.functions.QuantizedDot(nullLong, nullLong)
        .compute(qa, qb)
      val want = qa.zip(qb)
        .map { case (x, y) => BigInt(x.toInt) * BigInt(y.toInt) }.sum
      BigInt(got) == want
    }

  // ligature, fullwidth, superscript, micro, angstrom, NBSP,
  // roman XII, pre-composed E-acute, combining acute, ASCII upper
  private val mixedText: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf(' ', '.', ','),
    Gen.oneOf('\uFB01', '\uFF34', '\u00B2', '\u00B5', '\u212B',
      '\u00A0', '\u216B', '\u00C9', '\u0301', 'A', 'Z')))
    .map(_.mkString)

  property("NfkcCaseFold is idempotent") =
    Prop.forAll(mixedText) { s =>
      val once = graft.functions.NfkcCaseFold.fold(s)
      graft.functions.NfkcCaseFold.fold(once) == once
    }

  property("NfkcCaseFold: lowercase-ASCII passthrough (same object)") =
    Prop.forAll(Gen.listOf(Gen.oneOf(
      Gen.choose('a', 'z'), Gen.oneOf(' ', '.', '0', '9')))
      .map(_.mkString)) { s =>
      val u = UTF8String.fromString(s)
      val e = graft.functions.NfkcCaseFold(
        Literal.create(null, StringType))
      e.compute(u).asInstanceOf[AnyRef] eq u
    }

  property("NfkcCaseFold matches Normalizer reference") =
    Prop.forAll(mixedText) { s =>
      val e = graft.functions.NfkcCaseFold(
        Literal.create(null, StringType))
      val got = e.compute(UTF8String.fromString(s)).toString
      val want = java.text.Normalizer.normalize(
        java.text.Normalizer.normalize(s,
          java.text.Normalizer.Form.NFKC)
          .toLowerCase(java.util.Locale.ROOT),
        java.text.Normalizer.Form.NFKC)
      got == want
    }
}
