package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical-testing surface: the χ² independence audit — "is
  * categorical column A independent of categorical column B?" — the
  * screening test behind segmentation sanity checks (does event mix
  * drift by weekday?), A/B assignment health, and label-leak hunts in
  * training data.
  *
  * Determinism contract: observed counts are exact integers; each
  * expected count is `rt·ct/n` computed with one IEEE multiply +
  * divide of exactly-represented longs (same doubles everywhere);
  * per-cell contributions `(o−e)²/e` round to 4 decimals at the cell
  * (squaring via explicit multiply — `pow` is libm-dependent), and
  * the headline χ² is a DECIMAL sum of those rounded cells — exact
  * and order-independent, the [[graft.ts.Seasonal]] discipline.
  *
  * Scale shape: ONE map-side-combined groupBy over the fact table →
  * ≤ |A|·|B| cells; everything after is metadata-sized (checkpointed
  * once), with marginals as bounded aggregates and the 1-row total
  * broadcast back. No window over a global partition, no second scan.
  */
object Stats {

  /** Contingency table + χ² per cell and total: one row per observed
    * (a, b) cell — (a, b, o, e, contrib, chi2, dof); `chi2`/`dof`
    * repeated on every row (the broadcast-total pattern).
    */
  def chiSquare(df: DataFrame, a: String, b: String): DataFrame = {
    val cells = df.groupBy(col(a), col(b))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(true) // feeds marginals, total and the cell join
    val rt = cells.groupBy(col(a)).agg(sum("o").as("rt"))
    val ct = cells.groupBy(col(b)).agg(sum("o").as("ct"))
    val n = cells.agg(sum("o").as("n"))
    val withE = cells.join(rt, a).join(ct, b).crossJoin(broadcast(n))
      .withColumn("e", col("rt").cast("double") * col("ct") / col("n"))
      .withColumn("contrib",
        round((col("o") - col("e")) * (col("o") - col("e")) / col("e"), 4))
    val total = withE.agg(
      sum(col("contrib").cast("decimal(18,4)")).cast("double").as("chi2"),
      ((countDistinct(col(a)) - 1) * (countDistinct(col(b)) - 1))
        .cast("int").as("dof"))
    withE.crossJoin(broadcast(total))
      .select(col(a), col(b), col("o"),
        round(col("e"), 2).cast("float").as("e"),
        col("contrib").cast("float").as("contrib"),
        col("chi2").cast("float").as("chi2"), col("dof"))
  }
}
