package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level diff of two versions of a table — the snapshot-compare
  * audit behind every migration sign-off and dbt-style data review:
  * which primary keys were added, which removed, which rows changed
  * and in WHICH columns. The reference's warehouse reloads entire
  * partitions (D_Load_* delete+insert); this is the verification
  * surface that proves a reload/backfill changed exactly what it was
  * supposed to.
  *
  * Scale shape: ONE pk-keyed full outer join (the two versions
  * co-shuffle on the key; at 100 TB both sides bucket/partition by pk
  * and the join is co-located), a null-safe compare per audited
  * column (codegen'd `<=>`, no UDF), and the changed-column list
  * built with `array_compact` — no second pass, no collect. Emitting
  * only non-`same` rows keeps output proportional to the CHANGE SET,
  * not the table.
  */
object TableDiff {

  /** Classify every pk across two versions. Output: (pk, verdict ∈
    * added|removed|changed, changed_cols — comma-joined alphabetical
    * column names, empty unless changed). `same` rows are dropped
    * (the audit reads the delta).
    */
  def diff(v1: DataFrame, v2: DataFrame, pk: String,
      cols: Seq[String]): DataFrame = {
    val a = v1.select((col(pk) +: cols.map(c => col(c).as(s"a_$c"))) :+
      lit(true).as("in_a"): _*)
    val b = v2.select((col(pk) +: cols.map(c => col(c).as(s"b_$c"))) :+
      lit(true).as("in_b"): _*)
    val diffCol: Column = array_compact(array(cols.sorted.map(c =>
      when(!(col(s"a_$c") <=> col(s"b_$c")), lit(c))): _*))
    a.join(b, Seq(pk), "full_outer")
      .withColumn("verdict",
        when(col("in_b").isNull, lit("removed"))
          .when(col("in_a").isNull, lit("added"))
          .when(size(diffCol) > 0, lit("changed")))
      .where(col("verdict").isNotNull)
      .withColumn("changed_cols",
        when(col("verdict") === "changed", array_join(diffCol, ","))
          .otherwise(lit("")))
      .select(col(pk), col("verdict"), col("changed_cols"))
  }
}
