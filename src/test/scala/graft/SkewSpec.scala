package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew utilities: exact-equality with the unsalted plans (the whole
  * point — salting must never change an answer) plus the mechanical
  * property that a hot key actually spreads across salts.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val skewed = {
    import spark.implicits._
    // key 0 is hot (2000 rows), keys 1..49 have ~10 rows each
    val hot = (0 until 2000).map(i => (0L, i.toLong))
    val cold = (1 to 49).flatMap(k => (0 until 10).map(i => (k.toLong, i.toLong)))
    (hot ++ cold).toDF("k", "v")
  }

  private lazy val dim = {
    import spark.implicits._
    (0L to 49L).map(k => (k, s"name$k")).toDF("k", "name")
  }

  test("salted inner join equals the plain join") {
    val plain = skewed.join(dim, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8)
      .select("k", "v", "name")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted left join preserves unmatched lefts exactly once") {
    val dimHoles = dim.filter(col("k") =!= 0L) // hot key unmatched
    val plain = skewed.join(dimHoles, Seq("k"), "left").select("k", "v", "name")
    val salted = Skew.saltedJoin(skewed, dimHoles, "k", salts = 8, "left")
      .select("k", "v", "name")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("hot key spreads across all salts") {
    val spread = skewed
      .withColumn("salt", pmod(xxhash64(struct(col("k"), col("v"))), lit(8)))
      .filter(col("k") === 0L).select("salt").distinct().count()
    assert(spread == 8)
  }

  test("salted distinct count equals COUNT(DISTINCT)") {
    val plain = skewed.groupBy("k")
      .agg(countDistinct("v").as("n_distinct"))
    val salted = Skew.saltedDistinctCount(skewed, "k", "v", salts = 16)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("skewedKeys flags exactly the hot key at 10x mean") {
    val flagged = Skew.skewedKeys(skewed, "k", factor = 10.0).collect()
    assert(flagged.map(_.getLong(0)).toSeq == Seq(0L))
    assert(flagged(0).getLong(1) == 2000L)
  }
}
