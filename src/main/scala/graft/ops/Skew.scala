package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for hot-key joins and aggregations.
  *
  * AQE's skew-join splitting (on by default in every session here)
  * handles sort-merge spills at runtime; these helpers cover the two
  * shapes AQE does NOT fix: a broadcast-ineligible join whose hot key
  * overwhelms one task even after splitting (salted join replicates
  * the dimension side instead), and COUNT(DISTINCT) on a skewed group
  * key, where the distinct-dedup shuffle sends every hot-key row to
  * one reducer (two-phase salted distinct spreads the dedup across
  * `salts` disjoint value buckets first).
  */
object Skew {

  /** Keys whose row count exceeds `factor` × the mean per-key count —
    * the candidates worth salting (or hinting broadcast) downstream.
    * One aggregate + a broadcast 1-row threshold; scale-safe as a
    * diagnostic at any corpus size.
    */
  def skewedKeys(df: DataFrame, key: String, factor: Double = 10.0): DataFrame = {
    val counts = df.groupBy(key).agg(count(lit(1)).as("n"))
    val mean = counts.agg(avg(col("n").cast("double")).as("mean_n"))
    counts.crossJoin(broadcast(mean))
      .where(col("n") >= col("mean_n") * factor)
      .select(col(key), col("n"),
        round(col("n") / col("mean_n"), 2).as("x_mean"))
  }

  /** Salted equi-join: each fact row gets a deterministic content-hash
    * salt in [0, salts); every dimension row is replicated across all
    * salts; the join runs on (key, salt), splitting a hot key's rows
    * over `salts` tasks at the cost of a `salts`× dimension blowup —
    * the standard trade when the dimension side is small-ish but past
    * the broadcast threshold. Inner and left_outer preserve exact join
    * semantics (each left row carries exactly one salt, so unmatched
    * lefts surface exactly once).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salted join supports inner/left joins, got $joinType")
    val factCols = fact.columns.map(col)
    val l = fact.withColumn("__salt",
      pmod(xxhash64(struct(factCols.toIndexedSeq: _*)), lit(salts)).cast("int"))
    val r = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase COUNT(DISTINCT v) per skewed key: phase 1 dedups inside
    * (key, hash(v) % salts) buckets — the hot key's distinct work runs
    * on `salts` reducers, not one — and phase 2 sums the disjoint
    * bucket counts (disjointness by the hash partition of v makes the
    * sum exact, not approximate).
    */
  def saltedDistinctCount(df: DataFrame, key: String, value: String,
                          salts: Int = 32): DataFrame = {
    require(salts > 0, "salts must be positive")
    df.withColumn("__salt", pmod(xxhash64(col(value)), lit(salts)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(value)).as("__c"))
      .groupBy(col(key))
      .agg(sum("__c").as("n_distinct"))
  }
}
