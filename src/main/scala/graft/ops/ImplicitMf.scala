package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ALS-style implicit-feedback matrix factorization (Hu, Koren &
  * Volinsky 2008) at rank 1, in EXACT fixed-point integer arithmetic —
  * the model-based recommendation member beside q265's neighborhood
  * item-CF: each user and item gets a latent affinity factor fit by
  * alternating least squares over purchase counts, with the paper's
  * implicit-feedback weighting (confidence c = 1 + α·r toward
  * preference 1 on observed cells, confidence 1 toward 0 everywhere
  * else).
  *
  * At rank 1 the per-entity normal equation is scalar, so the ALS
  * solve is plain grouped arithmetic:
  *
  *   u = Σ_obs(c·v) / (λ + G + Σ_obs((c−1)·v²)),  G = Σ_ALL items v²
  *
  * — the Σ_ALL term is the paper's dense-part trick (every unobserved
  * cell contributes confidence-1 toward 0), carried as ONE global
  * scalar instead of a dense cross join. The item step is symmetric.
  *
  * Determinism (the q170/q254 fixed-point discipline): confidences
  * and factors are integers; every sum is an exact decimal(38,0)
  * (order-independent — the HUGEINT twin on the oracle side); the
  * solve is integer floor-division; each half-step renormalizes to
  * max = 10⁶ by another exact integer division, which keeps
  * magnitudes data-independent across rounds. Both engines run the
  * identical integer recursion, so all `iters` rounds sit bit-exact
  * under the hash gate with no float hedge — the oracle unrolls the
  * rounds as MATERIALIZED CTEs ([[oracleSql]]).
  *
  * Nonnegativity: counts, confidences and the uniform seed are
  * positive, so every numerator/denominator stays positive and the
  * factorization is NMF-like — factors order entities by co-purchase
  * engagement (spec-pinned on a planted block structure).
  *
  * Scale shape: the ratings frame is built once and checkpointed;
  * each half-step is one equi-join of ratings against the ≤|entities|
  * factor frame plus one grouped sum — the standard distributed-ALS
  * shuffle (ratings partitioned by the solve side's key), with the
  * two global scalars (G, max) attached by broadcast. No driver-side
  * math, no collect, iterations bounded by `iters`.
  */
object ImplicitMf {

  /** Factor fixed-point scale (f ∈ [0, 10⁶] after renormalization). */
  private val scaleFp = "1000000"

  /** λ = 1 in factor² units (factors carry 10⁶, so λ·SCALE² = 10¹²). */
  private val lambdaFp = "1000000000000"

  /** @param ratings (u, i, cnt) implicit-feedback counts, cnt ≥ 1
    * @return (kind 'user'|'item', id, f) — integer factors in
    *         [0, 10⁶], max per kind exactly 10⁶
    */
  def run(ratings: DataFrame, alpha: Long = 10L,
      iters: Int = 2): DataFrame = {
    require(iters >= 1, "implicit MF needs at least one round")
    val r = ratings.select(col("u"), col("i"),
        (lit(1L) + lit(alpha) * col("cnt")).cast("decimal(38,0)").as("c"))
      .localCheckpoint(true)
    var v = r.select(col("i").as("id")).distinct()
      .select(col("id"), expr(s"cast($scaleFp as decimal(38,0))").as("f"))
    var u: DataFrame = null
    for (_ <- 1 to iters) {
      u = halfStep(r, v, solveUsers = true)
      v = halfStep(r, u, solveUsers = false)
    }
    u.select(lit("user").as("kind"), col("id"),
        col("f").cast("long").as("f"))
      .unionByName(v.select(lit("item").as("kind"), col("id"),
        col("f").cast("long").as("f")))
  }

  /** One ALS half-step: solve every entity on `solve`'s side against
    * the other side's fixed factors. Exact decimal sums, integer
    * floor-div solve, integer renormalization to max = 10⁶.
    */
  private def halfStep(r: DataFrame, other: DataFrame,
      solveUsers: Boolean): DataFrame = {
    val (kc, oc) = if (solveUsers) ("u", "i") else ("i", "u")
    val g = other.agg(
      sum(expr("f * f")).cast("decimal(38,0)").as("g"))
    val agg = r.join(other.select(col("id").as(oc), col("f")), oc)
      .groupBy(col(kc).as("id"))
      .agg(sum(expr("c * f")).cast("decimal(38,0)").as("num"),
        sum(expr("(c - 1) * f * f")).cast("decimal(38,0)").as("den2"))
    val raw = agg.crossJoin(broadcast(g))
      .select(col("id"),
        expr(s"num * $lambdaFp div " +
          s"(cast($lambdaFp as decimal(38,0)) + g + den2)").as("fr"))
    val mx = raw.agg(max(col("fr")).as("mx"))
    raw.crossJoin(broadcast(mx))
      .select(col("id"),
        expr(s"cast(fr as decimal(38,0)) * $scaleFp div mx")
          .cast("decimal(38,0)").as("f"))
      .localCheckpoint(true)
  }

  /** The rounds unrolled as DuckDB MATERIALIZED CTEs over the same
    * integer recursion (HUGEINT where Spark carries decimal(38,0)).
    * Emits `r`, `v0` and per-round `u{k}`/`v{k}`; the caller selects
    * from `u{iters}` and `v{iters}`.
    */
  def oracleCte(alpha: Long = 10L, iters: Int = 2): String = {
    def half(out: String, in: String, key: String, ok: String): String =
      s"""g_$out AS (SELECT CAST(sum(f * f) AS HUGEINT) AS g FROM $in),
         |a_$out AS (SELECT r.$key AS id,
         |        CAST(sum(r.c * x.f) AS HUGEINT) AS num,
         |        CAST(sum((r.c - 1) * x.f * x.f) AS HUGEINT) AS den2
         |      FROM r JOIN $in x ON x.id = r.$ok GROUP BY 1),
         |x_$out AS (SELECT id,
         |        num * CAST($lambdaFp AS HUGEINT)
         |          // (CAST($lambdaFp AS HUGEINT) + g + den2) AS fr
         |      FROM a_$out, g_$out),
         |m_$out AS (SELECT max(fr) AS mx FROM x_$out),
         |$out AS MATERIALIZED (SELECT id, fr * $scaleFp // mx AS f
         |      FROM x_$out, m_$out)""".stripMargin
    val rounds = (1 to iters).map { k =>
      half(s"u$k", s"v${k - 1}", "u", "i") + ",\n" +
        half(s"v$k", s"u$k", "i", "u")
    }.mkString(",\n")
    s"""r AS MATERIALIZED (
       |  SELECT o_custkey AS u, l_partkey AS i,
       |         CAST(1 + $alpha * count(*) AS HUGEINT) AS c
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2),
       |v0 AS (SELECT DISTINCT i AS id,
       |       CAST($scaleFp AS HUGEINT) AS f FROM r),
       |$rounds""".stripMargin
  }
}
