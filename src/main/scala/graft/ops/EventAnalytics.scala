package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-flow analytics over a (user_id, ts, event_type) stream:
  * funnel completion, cohort retention, and the event-type transition
  * matrix — the product-analytics trio every event warehouse serves,
  * composed from the same hash-aggregate/window primitives as the
  * finance marts.
  */
object EventAnalytics {

  /** First-touch funnel: per user, the EARLIEST chain of `steps`
    * completed in order within `windowS` seconds of step 1 (classic
    * first-touch semantics: step 1 anchors at the user's first
    * occurrence; each later step at its first occurrence strictly
    * after the previous step and inside the window — greedy, not
    * maximal, exactly like the standard funnel tools).
    *
    * Scale shape: one user-keyed min-aggregate per step (k is small
    * and fixed), each joining the previous step frame — k narrow
    * hash joins on the user key over per-step FILTERED event subsets
    * (the type predicate pushes to the scan); no windows, no
    * per-user sort.
    *
    * @return (user_id, t_1..t_k epoch seconds nullable,
    *         n_steps int, completed bool)
    */
  def funnel(events: DataFrame, steps: Seq[String],
      windowS: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = events.select(col("user_id"),
      unix_timestamp(col("ts")).as("t"), col("event_type"))
    val s1 = ev.where(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("t")).as("t_1"))
    val chain = steps.zipWithIndex.tail.foldLeft(s1) {
      case (prev, (step, i)) =>
        val nxt = ev.where(col("event_type") === step)
          .join(prev, "user_id")
          .where(col("t") > col(s"t_$i") &&
            col("t") <= col("t_1") + windowS)
          .groupBy(col("user_id")).agg(min(col("t")).as(s"t_${i + 1}"))
          .select(col("user_id"), col(s"t_${i + 1}"))
        prev.join(nxt, Seq("user_id"), "left_outer")
    }
    val ts = steps.indices.map(i => col(s"t_${i + 1}"))
    chain.select(col("user_id") +: ts :+
      ts.map(c => when(c.isNotNull, 1).otherwise(0))
        .reduce(_ + _).cast("int").as("n_steps") :+
      ts.last.isNotNull.as("completed"): _*)
  }

  /** Cohort retention matrix: users cohorted by FIRST-ACTIVITY day;
    * each (cohort_day, offset) cell counts distinct users active
    * `offset` days after their cohort day (offset 0 = cohort size).
    * Two bounded aggregates — (user, day) activity, then the matrix —
    * output is days² cells however large the stream.
    */
  def retention(events: DataFrame): DataFrame = {
    val activity = events
      .select(col("user_id"), to_date(col("ts")).as("dt"))
      .distinct()
    val cohort = activity.groupBy(col("user_id"))
      .agg(min(col("dt")).as("cohort_day"))
    activity.join(cohort, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("dt"), col("cohort_day")).as("offset_day"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Rolling `windowDays`-day distinct active users per day (the
    * DAU/WAU/MAU curve at windowDays = 1/7/30): each (user, day)
    * activity fact contributes to the `windowDays` report days whose
    * trailing window contains it — a bounded windowDays× explode of
    * the already-distinct activity frame, then one distinct-count per
    * day. Exact; at extreme scale swap the per-day distinct for the
    * mergeable KMV sketch ([[graft.functions.BottomKByHash]], the
    * q127/q150 path) and union day sketches instead of exploding.
    * Report days past the last observed activity are clipped.
    */
  def rollingActives(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val act = events
      .select(col("user_id"), to_date(col("ts")).as("dt"))
      .distinct()
    val spread = act.select(col("user_id"),
      explode(sequence(col("dt"), date_add(col("dt"), windowDays - 1)))
        .as("day"))
    val bounds = act.agg(max(col("dt")).as("mx"))
    spread.crossJoin(broadcast(bounds)).where(col("day") <= col("mx"))
      .groupBy(col("day"))
      .agg(count_distinct(col("user_id")).as("active_users"))
  }

  /** First-order Markov transition matrix of event types per user:
    * consecutive-event bigrams (user-local, ts-then-event_id ordered)
    * counted and row-normalized. Output is |types|² rows at any
    * stream size; the probability is an exact-integer ratio rounded
    * at the edge.
    * @return (from_type, to_type, n, p)
    */
  def transitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val bi = events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .where(col("to_type").isNotNull)
    val counts = bi.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type"))
      .agg(sum(col("n")).as("row_n"))
    counts.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("row_n"), 4)
          .cast("float").as("p"))
  }
}
