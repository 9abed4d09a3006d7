package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-contract queries with their DuckDB oracles.
  *
  * Every operator the engine claims (SURVEY.md §2) surfaces here as a
  * `queries` entry; when the semantics are ANSI-SQL-expressible the same
  * key appears in `oracleSql` and the driver cross-checks the two on the
  * shared parquet fixtures. Oracle-parity ground rules used throughout:
  *
  *  - computed doubles (sums/avgs/stddevs of floats) are cast to FLOAT /
  *    REAL at the output edge, mirroring the reference's FloatType
  *    storage (ddl/hive/crypto_mart/crypto_indicator_day.ddl:6-36) and
  *    absorbing aggregation-order drift between engines;
  *  - exact values (raw column passthrough, counts, min/max, sums of
  *    integral doubles) stay in their natural type;
  *  - no TIMESTAMP-typed output columns (parquet tz-annotation differs
  *    between writers) — dates stay DATE, instants become epoch longs or
  *    explicitly formatted strings;
  *  - every ORDER/row_number has a total order (unique tiebreak column).
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracleSql: Map[String, String]

  /** Family label for per-pack bench subtotals (BENCH `families` map). */
  def packName: String = getClass.getSimpleName.stripSuffix("$")

  /** Load a fixture table for a query body. */
  protected def t(name: String)(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, name)
}
