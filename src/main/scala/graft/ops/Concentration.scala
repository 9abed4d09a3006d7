package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Concentration analytics: the Gini coefficient and top-share table
  * of a value distribution (revenue per customer, tokens per source,
  * traffic per key) — the whale-detector behind skew planning and
  * marketplace health metrics, and a composition showcase for
  * [[Scan.globalRunningSum]]: global ranks WITHOUT a single-partition
  * window.
  *
  * Arithmetic contract: values arrive as exact integers (cents,
  * tokens); ranks come off the scan; Σ rank·x and Σ x are DECIMAL
  * sums of integer products (order-independent, overflow-safe to
  * 10³⁸); the closed-form Gini
  * `(2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx)` (xᵢ ascending) and the shares
  * then divide identical doubles. No float enters before the edge.
  */
object Concentration {

  /** units(idCol, centsCol) → one row:
    * (n_units, total, gini, top1_share, top10_share). `centsCol`
    * must be integral ≥ 0; ties rank deterministically by `idCol`.
    */
  def gini(units: DataFrame, centsCol: String, idCol: String): DataFrame = {
    val ranked = Scan.globalRunningSum(
        units.select(col(idCol).as("uid"), col(centsCol).as("x")),
        Seq("x", "uid"), lit(1L), run = "rk")
      .localCheckpoint(true) // consumed by moments + both share sums
    val moments = ranked.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("t"),
      sum(col("rk").cast("decimal(19,0)") * col("x").cast("decimal(19,0)"))
        .as("s"))
    val shares = ranked.crossJoin(broadcast(moments.select("n")))
      .agg(
        sum(when(col("rk") > col("n") - expr("n DIV 100"),
          col("x").cast("decimal(38,0)"))).as("x1"),
        sum(when(col("rk") > col("n") - expr("n DIV 10"),
          col("x").cast("decimal(38,0)"))).as("x10"))
    moments.crossJoin(broadcast(shares))
      .select(col("n").as("n_units"), col("t").cast("long").as("total"),
        round((lit(2.0) * col("s").cast("double") -
          (col("n") + 1).cast("double") * col("t").cast("double")) /
          (col("n").cast("double") * col("t").cast("double")), 4)
          .cast("float").as("gini"),
        round(coalesce(col("x1").cast("double"), lit(0.0)) /
          col("t").cast("double"), 4).cast("float").as("top1_share"),
        round(coalesce(col("x10").cast("double"), lit(0.0)) /
          col("t").cast("double"), 4).cast("float").as("top10_share"))
  }
}
