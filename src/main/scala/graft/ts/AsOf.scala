package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins Spark lacks as built-ins, composed from existing
  * operators (the preference ladder's first rung — no custom plan
  * nodes needed, Catalyst optimizes the whole thing).
  *
  * [[asOfJoin]]: match each left row to the LATEST right row with
  * rightTime ≤ leftTime per key — the "price as of this event" join the
  * reference approximates with exact-key joins on pre-bucketed candles
  * (J1/J2 join hist to same-day indicators;
  * /root/reference/modules/dbt/crypto_etl_pjr/models/crypto/marts/...).
  *
  * Shape: union both sides tagged, ONE shuffle on the key, one
  * per-key time sort, and a running `last(_, ignoreNulls)` window that
  * carries the latest right payload forward into left rows. No range
  * explosion, no per-row probing: cost is sort-shuffle of |L|+|R| —
  * the canonical distributed as-of formulation, and exactly how a
  * 1000-executor cluster wants it partitioned (parallelism = |keys|).
  *
  * [[rangeJoin]]: inner join of points to enclosing [start, end]
  * intervals per key. Naively a theta join (cross per key); here each
  * interval is exploded to the fixed-width BUCKETS it overlaps and the
  * join runs on (key, bucket) equality — a banded equi-join Catalyst
  * can hash — with the exact containment predicate applied after.
  * Bucket width trades replication (wide intervals → more buckets) for
  * candidate fan-in; intervals spanning b buckets appear b times,
  * points exactly once.
  */
object AsOf {

  /** Left as-of join: every left row, matched to the latest right row
    * with `rightTime` ≤ `leftTime` for the same `key` (NULL payload when
    * none exists). `payload` columns must exist in `right`.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: Column, rightTime: Column,
      payload: Seq[String]): DataFrame = {
    val lt = leftTime.cast("double").as("t")
    val rt = rightTime.cast("double").as("t")
    val rv = struct(payload.map(col): _*)
    val leftCols = left.columns.toSeq
    // unionByName(allowMissingColumns): the right side has no l_* and
    // the left side no rv — both become correctly-typed NULLs
    val tagged =
      right.select(col(key).as("k"), rt, lit(1).as("is_r"), rv.as("rv"))
        .unionByName(
          left.select(Seq(col(key).as("k"), lt, lit(0).as("is_r")) ++
            leftCols.map(c => col(c).as(s"l_$c")): _*),
          allowMissingColumns = true)
    // right rows sort BEFORE left rows at equal times, so a left row at
    // t sees a right row at exactly t (the ≤ contract)
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("is_r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = tagged
      .withColumn("asof", last(col("rv"), ignoreNulls = true).over(w))
      .where(col("is_r") === 0)
    carried.select(
      leftCols.map(c => col(s"l_$c").as(c)) ++
        payload.map(p => col("asof").getField(p).as(s"asof_$p")): _*)
  }

  /** Inner range join: points (key, `pointTime`) × intervals
    * (key, `startCol`, `endCol`), inclusive bounds, bucketized on
    * `bucketWidth` so the candidate join is an equi-join.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
      pointTime: Column, startCol: Column, endCol: Column,
      bucketWidth: Long): DataFrame = {
    val p = points.withColumn("__pt", pointTime.cast("double"))
      .withColumn("__bucket", floor(col("__pt") / bucketWidth))
    val iv = intervals.withColumn("__s", startCol.cast("double"))
      .withColumn("__e", endCol.cast("double"))
      .withColumn("__bucket", explode(sequence(
        floor(col("__s") / bucketWidth), floor(col("__e") / bucketWidth))))
    p.join(iv, Seq(key, "__bucket"))
      .where(col("__pt") >= col("__s") && col("__pt") <= col("__e"))
      .drop("__bucket", "__pt", "__s", "__e")
  }
}
