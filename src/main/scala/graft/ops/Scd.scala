package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history derivation.
  *
  * The reference's warehouse keeps only current-state rows
  * (last-write-wins upsert, ddl/cassandra/crypto/candles_day.ddl:22 —
  * our q11 surface); this is the companion every dimension load needs
  * at warehouse scale: replay an attribute-change event stream into
  * versioned validity intervals, so a fact row can join the attribute
  * AS OF its own timestamp (the [[graft.ts.AsOf]] join's natural
  * partner).
  *
  * Semantics (gaps-and-islands): per key, order change events by a
  * TOTAL order (caller supplies a unique tiebreak — reproducibility
  * rule, QueryPack scaladoc); collapse consecutive runs of identical
  * attribute values; each run becomes one history row with
  * `valid_from` = the run's first order key, `valid_to` = the next
  * run's first order key (NULL while current), `version` = run index
  * per key, `is_current` on the last run.
  *
  * Scale shape: one hash shuffle on the dimension key feeds BOTH
  * window passes (run-start detection and the lead() for valid_to run
  * on the same (key, order) sort, so Catalyst plans a single exchange
  * + sort and reuses it); runs are detected by lag-inequality and only
  * RUN-START rows survive to the second pass — no groupBy on a
  * (key, run) composite ever re-shuffles, and nothing wider than the
  * key + attribute columns moves. Group size is bounded by one key's
  * change count, so there is no skew beyond the dimension's own
  * hottest key; a dimension whose hot key genuinely overwhelms a task
  * is the [[Skew.skewedKeys]] diagnostic's territory.
  */
object Scd {

  /** Collapse a change-event frame into type-2 history rows.
    *
    * @param events one row per observed (key, attribute) state
    * @param key    dimension key column names
    * @param attrs  tracked attribute column names (a run breaks when
    *               ANY of them changes)
    * @param order  total-order columns within a key (must be unique
    *               per key — e.g. event date + event id)
    * @return key ++ attrs ++ (valid_from..., valid_to..., version,
    *         is_current); valid_from/valid_to carry the order columns
    *         (suffixed _from/_to), valid_to NULL on the current run
    */
  def type2(events: DataFrame, key: Seq[String], attrs: Seq[String],
      order: Seq[String]): DataFrame = {
    val keyCols = key.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(order.map(col): _*)
    // run start = first row per key (lag of a non-null ORDER column is
    // NULL exactly there — a NULL-safe attr compare alone would miss a
    // first row whose attribute is NULL), or any tracked attribute
    // differs from the previous event's value (<=> keeps NULL = NULL
    // from fragmenting runs)
    val isFirst = lag(col(order.head), 1).over(w).isNull
    val changed = attrs.map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val starts = events
      .withColumn("chg", isFirst || changed)
      .where(col("chg"))
    val fromCols = order.map(o => col(o).as(s"${o}_from"))
    val toCols = order.map(o => lead(col(o), 1).over(w).as(s"${o}_to"))
    starts.select(keyCols ++ attrs.map(col) ++ fromCols ++ toCols ++ Seq(
      (row_number().over(w)).cast("int").as("version"),
      lead(order.map(col).head, 1).over(w).isNull.as("is_current")): _*)
  }

  /** DAY-2 incremental merge — [[type2]]'s warehouse form: fold a new
    * change batch into an EXISTING history table without replaying the
    * closed past. Output is IDENTICAL to `type2(allEvents)` whenever
    * every batch event of a key orders strictly after that key's
    * current `valid_from` (the daily-load contract: the batch is a
    * later time window), because every closed row is already final —
    * only each key's single current run can extend, close, or chain
    * into new runs, and re-running the island logic over (current-run
    * start ∪ batch) reproduces exactly those rows. Versions continue
    * from the stored current version.
    *
    * Scale shape: closed history — the accumulated bulk — is a
    * pass-through union (never shuffled, never windowed); the
    * re-islanded frame is (|keys touched or current| + |batch|) rows,
    * so per-run cost tracks the dimension's breadth and the day's
    * changes, not accumulated history depth. One key-hash exchange
    * feeds the island windows (as in [[type2]]) plus one narrow join
    * against the per-key stored version.
    */
  def applyChanges(history: DataFrame, batch: DataFrame, key: Seq[String],
      attrs: Seq[String], order: Seq[String]): DataFrame = {
    val closed = history.where(!col("is_current"))
    val current = history.where(col("is_current"))
    // the current run re-enters as one synthetic event at its start
    val curEvents = current.select(
      key.map(col) ++ attrs.map(col) ++
        order.map(o => col(s"${o}_from").as(o)): _*)
    val rerun = type2(
      curEvents.unionByName(batch.select(
        key.map(col) ++ attrs.map(col) ++ order.map(col): _*)),
      key, attrs, order)
    // rerun's first run per stored key IS the stored current run, so
    // its versions shift by (stored current version − 1); unseen keys
    // (first appearance in the batch) keep rerun's own numbering
    val prior = current.select(key.map(col) :+ col("version").as("v0"): _*)
    val adjusted = rerun.join(prior, key, "left_outer")
      .withColumn("version",
        (col("version") + coalesce(col("v0") - 1, lit(0))).cast("int"))
      .drop("v0")
    closed.unionByName(adjusted.select(history.columns.map(col): _*))
  }
}
