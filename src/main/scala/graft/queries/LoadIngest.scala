package graft.queries

import graft.ingest.Normalize
import graft.load.PartitionIO
import graft.quality.DataQuality
import graft.ts.Bars
import org.apache.spark.sql.functions._

/** Write-path verification: idempotent partition IO (S6–S10) and the
  * CSV backfill ingest (S11/S12 with P10/P11 guards). Each query runs
  * the real write path into a scratch dir under target/, then reads the
  * result back for the oracle compare — so a broken overwrite (row
  * duplication under retry, clobbered untouched partitions) or a broken
  * promotion shows up as a hash mismatch.
  */
object LoadIngest extends QueryPack {

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rmrf))
    f.delete(): Unit
  }

  private def scratch(d: String, name: String): String = {
    val dir = new java.io.File(
      s"target/scratch/${name}_${new java.io.File(d).getName}")
    rmrf(dir)
    dir.mkdirs()
    dir.toString
  }

  val queries: Map[String, Q] = Map(
    // S6–S10: full load, then the trailing-10-day window reloaded TWICE
    // (simulating the Airflow retry) — output must equal a single clean
    // load of the bars: no duplicated rows, no lost partitions.
    "q50_partition_roundtrip" -> ((s, d) => {
      val path = scratch(d, "q50")
      val bars = Bars.daily(t("events")(s, d))
      PartitionIO.overwritePartitions(
        PartitionIO.withDayPartitions(bars, "dt"), path,
        Seq("year", "month", "day"))
      PartitionIO.reloadTrailingWindow(bars, path, "dt", 10, "2024-01-30")
      PartitionIO.reloadTrailingWindow(bars, path, "dt", 10, "2024-01-30")
      s.read.parquet(path).select(
        col("id"), col("dt"), col("open"), col("high"), col("low"),
        col("close"), col("volume"),
        col("year").cast("int").as("year"),
        col("month").cast("int").as("month"),
        col("day").cast("int").as("day"))
    }),

    // ORC+Snappy warehouse parity (the reference's storage format) at
    // the minute-table grain: full hour-partitioned ORC load, then the
    // trailing-12-hour window reloaded TWICE (retry) — the read-back
    // must equal one clean derivation, proving both the ORC I/O path
    // and hour-grain overwrite idempotency under the hash gate.
    "q94_orc_roundtrip" -> ((s, d) => {
      val path = scratch(d, "q94")
      // A trailing week of hour-grain data: enough to exercise ~170
      // hour-partitions without turning the query into a small-file
      // filesystem benchmark (each fixture "hour" is ~100 rows; real
      // minute tables have fat partitions at this grain).
      val bars = Bars.hourly(t("events")(s, d))
        .withColumn("ts", col("t").cast("timestamp"))
        .where(col("ts") >= lit("2024-01-24").cast("timestamp"))
      PartitionIO.overwritePartitions(
        PartitionIO.withHourPartitions(bars, "ts"), path,
        Seq("year", "month", "day", "hour"), format = "orc")
      PartitionIO.reloadTrailingHours(bars, path, "ts", 12,
        "2024-01-30 23:00:00", format = "orc")
      PartitionIO.reloadTrailingHours(bars, path, "ts", 12,
        "2024-01-30 23:00:00", format = "orc")
      s.read.orc(path).select(
        col("id"), col("t"), col("open"), col("high"), col("low"),
        col("close"), col("volume"),
        col("year").cast("int").as("year"),
        col("month").cast("int").as("month"),
        col("day").cast("int").as("day"),
        col("hour").cast("int").as("hour"))
    }),

    // dbt on_schema_change='append_new_columns' parity: the mart is
    // loaded under its v1 schema, then the v2 era both ADDS a column
    // (integer-cents hi-lo spread) and LOSES one (volume vanishes
    // from the upstream extract). The evolved write must widen the
    // table without rewriting v1 files (new column NULL for the v1
    // era), never drop volume (typed NULL for the v2 era), and stay
    // idempotent under the Airflow retry (v2 written TWICE).
    "q222_schema_evolution" -> ((s, d) => {
      val path = scratch(d, "q222")
      val bars = Bars.daily(t("events")(s, d))
      val pivot = lit("2024-01-20").cast("date")
      PartitionIO.appendNewColumns(
        PartitionIO.withDayPartitions(bars.where(col("dt") < pivot), "dt"),
        path, Seq("year", "month", "day"))
      val v2 = PartitionIO.withDayPartitions(
        bars.where(col("dt") >= pivot)
          .withColumn("spread_c",
            ((col("high").cast("decimal(18,2)") -
              col("low").cast("decimal(18,2)")) * 100).cast("long"))
          .drop("volume"), "dt")
      PartitionIO.appendNewColumns(v2, path, Seq("year", "month", "day"))
      PartitionIO.appendNewColumns(v2, path, Seq("year", "month", "day"))
      PartitionIO.readEvolved(s, path).select(
        col("id"), col("dt"), col("open"), col("high"), col("low"),
        col("close"), col("volume"), col("spread_c"),
        col("year").cast("int").as("year"),
        col("month").cast("int").as("month"),
        col("day").cast("int").as("day"))
    }),

    // Row-level snapshot diff (the dbt audit_helper shape): v2 plants
    // deterministic removals (%97), content edits (%31 — fp AND
    // n_chars move), single-column flips (%89 lang), and additions
    // (%101 re-keyed) over the documents frame; the diff must
    // classify every pk and name exactly the changed columns.
    "q227_table_diff" -> ((s, d) => {
      val docs = t("documents")(s, d)
      val v1 = docs.select(col("doc_id"), col("lang"), col("source"),
        md5(col("text")).as("fp"), col("n_chars"))
      val v2 = docs.where(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 89 === 0, lit("xx"))
            .otherwise(col("lang")).as("lang"),
          col("source"),
          md5(when(col("doc_id") % 31 === 0,
            concat(col("text"), lit(" rev2")))
            .otherwise(col("text"))).as("fp"),
          (col("n_chars") +
            when(col("doc_id") % 31 === 0, 5).otherwise(0)).as("n_chars"))
        .unionByName(docs.where(col("doc_id") % 101 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("lang"),
            col("source"), md5(col("text")).as("fp"), col("n_chars")))
      graft.ops.TableDiff.diff(v1, v2, "doc_id",
        Seq("lang", "source", "fp", "n_chars"))
    }),

    // JSON-lines external ingest: completes the file-format matrix
    // (parquet/ORC/CSV/JSON). Typed bars round-trip through JSON text
    // (schema-on-read with an explicit schema — no sampling pass) and
    // re-derive the warehouse partition columns; the oracle recomputes
    // the same frame from events, so a lossy double or date encoding
    // on either side of the round-trip breaks the hash gate.
    "q105_json_ingest" -> ((s, d) => {
      val path = scratch(d, "q105")
      val bars = Bars.daily(t("events")(s, d))
      bars.write.mode("overwrite").json(path)
      s.read.schema("id LONG, dt DATE, open DOUBLE, high DOUBLE, " +
          "low DOUBLE, close DOUBLE, volume DOUBLE")
        .json(path)
        .select(col("id"), col("dt"), col("open"), col("high"),
          col("low"), col("close"), col("volume"),
          year(col("dt")).cast("int").as("year"),
          month(col("dt")).cast("int").as("month"),
          dayofmonth(col("dt")).cast("int").as("day"))
    }),

    // S11/S12: typed bars → string CSV (with injected bad rows) →
    // header CSV read → promotion with bad-row/null guards + epoch
    // ms→s + partition derivation.
    "q51_csv_ingest" -> ((s, d) => {
      val path = scratch(d, "q51")
      val bars = Bars.daily(t("events")(s, d))
      bars.select(
          col("id").cast("string").as("id"),
          col("dt").cast("string").as("dt"),
          // Symbols id % 17 == 0 get the reference's bad-row shape
          // (open = '') and must be filtered by the promotion.
          when(col("id") % 17 === 0, lit(""))
            .otherwise(col("open").cast("string")).as("open"),
          col("high").cast("string").as("high"),
          col("low").cast("string").as("low"),
          col("close").cast("string").as("close"),
          col("volume").cast("string").as("volume"),
          (col("dt").cast("timestamp").cast("long") * 1000)
            .cast("string").as("ts_ms"))
        .write.option("header", "true").mode("overwrite").csv(path)
      val raw = s.read.option("header", "true").csv(path)
      Normalize.promoteCandles(raw, withAuditTs = false)
    }),

    // §2.9/§5: market-calendar + freshness probes — the reference's
    // check_latest_dt decision table exercised end-to-end on all four
    // routes: data present (OK), missing on an open day (WARNING),
    // missing on a weekend (ERROR), missing on a holiday (ERROR).
    "q52_freshness" -> ((s, d) => {
      val ev = t("events")(s, d).withColumn("dt", to_date(col("ts")))
      val holidays = Seq("2024-02-19")
      Seq("2024-01-15", "2024-02-15", "2024-02-17", "2024-02-19")
        .map(day => DataQuality.freshness(
          ev, "dt", "user_id", 2L, day, Some(holidays)))
        .reduce(_ unionByName _)
    }),

    // §5 data-quality: one-pass multi-column profile (null/distinct/
    // min/max) — the standing warehouse audit next to the per-PK
    // uniqueness check (q12) and the freshness probe (q52)
    "q84_profile" -> ((s, d) => DataQuality.profile(
      t("documents")(s, d), Seq("doc_id", "lang", "source", "n_chars"))),

    // q84's 100 TB twin on the big fact table: ndv from the KMV
    // sketch (no Expand, no distinct-value shuffle — one
    // map-side-combined pass). k=256 puts the high-cardinality keys
    // on the estimation branch and the flag columns on the exact one.
    "q129_profile_sketch" -> ((s, d) => DataQuality.profileSketch(
      t("lineitem")(s, d),
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_returnflag", "l_linestatus"))),

    // SCD type-2 dimension history: each customer's order-priority
    // change stream replayed into versioned validity intervals
    // (gaps-and-islands; one exchange on the key feeds both window
    // passes). The companion of q11's type-1 last-write-wins — the
    // warehouse shape an as-of join (q75) consumes.
    "q163_scd2" -> ((s, d) => {
      val ev = t("orders")(s, d).select(
        col("o_custkey"), col("o_orderpriority"),
        to_date(col("o_orderdate")).as("odate"), col("o_orderkey"))
      graft.ops.Scd.type2(ev, Seq("o_custkey"), Seq("o_orderpriority"),
        Seq("odate", "o_orderkey"))
    }),

    // SCD2 DAY-2 MERGE: history built from the pre-1997-07 past, the
    // later orders folded in via applyChanges — closed rows pass
    // through unshuffled, only current runs + the batch re-island, and
    // the output must equal q163's FULL recompute (the oracle is
    // q163's SQL verbatim — the identical-answer contract).
    "q169_scd2_apply" -> ((s, d) => {
      val ev = t("orders")(s, d).select(
        col("o_custkey"), col("o_orderpriority"),
        to_date(col("o_orderdate")).as("odate"), col("o_orderkey"))
      val cut = lit("1997-07-01").cast("date")
      val cols = (Seq("o_custkey"), Seq("o_orderpriority"),
        Seq("odate", "o_orderkey"))
      val hist = graft.ops.Scd.type2(ev.where(col("odate") < cut),
        cols._1, cols._2, cols._3)
      graft.ops.Scd.applyChanges(hist, ev.where(col("odate") >= cut),
        cols._1, cols._2, cols._3)
    }),

    // Referential-integrity audit over the whole star schema (dbt
    // `relationships` test, distributed): seven structural FK edges
    // (clean on the fixture — the audit proving a zero) plus a
    // deliberate drift edge (orders truncated to pre-1997) whose
    // orphan counts are non-trivially non-zero, exercising the anti
    // join + orphan-sized distinct-key aggregate for real.
    "q166_fk_orphans" -> ((s, d) =>
      DataQuality.refIntegrity(starEdges(s, d))),

    // The same audit through the bloom JOIN-PRUNING gate (parent side
    // shed by a bloom of the child's keys before the anti-join) —
    // shares q166's oracle VERBATIM: the identical-answer contract at
    // any (m, d), as in the delta-dedup bloom family.
    "q177_fk_orphans_bloom" -> ((s, d) =>
      DataQuality.refIntegrityBloom(starEdges(s, d))),

    // dbt's accepted_values test — completes the warehouse test
    // quartet beside unique (q12), relationships (q166/q177) and
    // freshness (q52). Three clean checks plus a deliberately
    // restricted commerce-only list whose violations exercise the
    // counting for real.
    "q185_accepted_values" -> ((s, d) => {
      import graft.quality.DataQuality.ValueCheck
      DataQuality.acceptedValues(Seq(
        ValueCheck("events.event_type@full", t("events")(s, d),
          "event_type", Seq("view", "click", "purchase", "signup", "error")),
        ValueCheck("events.event_type@commerce", t("events")(s, d),
          "event_type", Seq("view", "click", "purchase")),
        ValueCheck("lineitem.l_returnflag", t("lineitem")(s, d),
          "l_returnflag", Seq("A", "N", "R")),
        ValueCheck("orders.o_orderstatus", t("orders")(s, d),
          "o_orderstatus", Seq("F", "O", "P"))))
    }),

    // Benford first-digit forensic audit on order totals: leading
    // digit by exact integer division (no log10/formatting edges);
    // observed vs log10(1+1/d) expectation per digit.
    "q192_benford" -> ((s, d) =>
      DataQuality.benford(t("orders")(s, d), "o_totalprice")),

    // PSI drift audit: event values in the back half of the month
    // bucketed by the FRONT half's equi-depth deciles — the
    // monitoring gate that catches a silent upstream distribution
    // shift before it poisons a model refresh.
    "q231_psi" -> ((s, d) => {
      val ev = t("events")(s, d)
      val cut = lit("2024-01-16").cast("date")
      DataQuality.psi(
        ev.where(to_date(col("ts")) < cut),
        ev.where(to_date(col("ts")) >= cut), "value")
    }),

    // k-anonymity + l-diversity audit over the customer demographic
    // quasi-identifiers (nation × market segment), sensitive attribute
    // = account balance: every equivalence class with its size, its
    // sensitive diversity, and both privacy verdicts — the release
    // gate for demographic training data. Exact integers only.
    "q258_kanon_audit" -> ((s, d) =>
      DataQuality.kAnonymityAudit(t("customer")(s, d),
        Seq("c_nationkey", "c_mktsegment"), "c_acctbal", k = 10, l = 8)),

    // t-closeness audit over the same classes as q258: exact-rational
    // EMD between each class's account-balance distribution and the
    // global one over the ordered value domain — the skew leak k and
    // l cannot see, completing the privacy ladder.
    "q297_tcloseness" -> ((s, d) =>
      DataQuality.tCloseness(t("customer")(s, d),
        Seq("c_nationkey", "c_mktsegment"), "c_acctbal", t = 0.2)),

    // Minimal full-domain generalization to k-anonymity (Samarati):
    // climb (nation, segment) → (region, segment) → (region, *) →
    // (*, *), release at the first level whose SMALLEST class ≥ k.
    // Level choice = three bounded aggregates reduced to one
    // broadcast scalar; the release is a map-only CASE projection.
    "q259_kanon_release" -> ((s, d) => {
      val c = t("customer")(s, d).join(
        broadcast(t("nation")(s, d)
          .select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      DataQuality.kAnonymize(c, "c_nationkey", "c_mktsegment",
        "n_regionkey", "c_custkey", k = 8)
    }),

    // Laplace-mechanism DP count release over (event_type, day) cells,
    // ε = 1: md5-seeded exact dyadic uniforms through the inverse CDF
    // — deterministic ("sticky") noise that replays, floor-rounded at
    // the shared 1e-4 edge. Audit form ships the exact count beside
    // the noisy release so the oracle pins both.
    "q261_dp_release" -> ((s, d) =>
      DataQuality.dpNoisyCounts(
        t("events")(s, d)
          .select(col("event_type"), to_date(col("ts")).as("day")),
        Seq("event_type", "day"))),

    // Small-file compaction planner over a (month, supplier) pseudo
    // file manifest: size-DESC next-fit binning by exact integer
    // prefix sums — the metadata-only maintenance pass that turns
    // thousands of small files into target-sized rewrite jobs.
    "q193_compaction" -> ((s, d) => {
      val manifest = t("lineitem")(s, d)
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("part_key"),
          col("l_suppkey").as("file_id"))
        .agg(count(lit(1)).as("sz"))
      graft.load.Compaction.plan(manifest, target = 24L)
    }),

    // Z-order layout audit: lineitem keyed on the (l_partkey,
    // l_suppkey) Morton curve, reported as per-block row counts +
    // min/max spans of BOTH dimensions — the footer-stats rectangle a
    // written file would expose for two-dimensional pruning. Exact
    // integer bucketization, no rank pass, no float edge.
    "q168_zorder" -> ((s, d) => graft.load.Layout.zBlockStats(
      t("lineitem")(s, d), "l_partkey", "l_suppkey",
      bits = 10, blockBits = 6)),

    // Hilbert-curve layout audit — q168's Morton sibling with strictly
    // better locality (consecutive keys are always grid neighbors, no
    // quadrant seams): same exact-integer bucket ranks, the xy2d walk
    // as a native codegen'd expression, same per-block rectangle
    // report so the two curves are comparable on the same table.
    "q251_hilbert" -> ((s, d) => graft.load.Layout.hilbertBlockStats(
      t("lineitem")(s, d), "l_partkey", "l_suppkey",
      bits = 10, blockBits = 6)))

  /** The star schema's seven structural FK edges plus the deliberate
    * drift edge (orders truncated to pre-1997, so the orphan counts
    * exercise for real) — shared by q166 (plain anti-join audit) and
    * q177 (bloom-gated parent side). */
  private def starEdges(s: org.apache.spark.sql.SparkSession,
      d: String): Seq[graft.quality.DataQuality.FkEdge] = {
    import graft.quality.DataQuality.FkEdge
    val li = t("lineitem")(s, d)
    val ord = t("orders")(s, d)
    Seq(
      FkEdge("lineitem->orders", li, "l_orderkey", ord, "o_orderkey"),
      FkEdge("lineitem->part", li, "l_partkey", t("part")(s, d), "p_partkey"),
      FkEdge("lineitem->supplier", li, "l_suppkey",
        t("supplier")(s, d), "s_suppkey"),
      FkEdge("orders->customer", ord, "o_custkey",
        t("customer")(s, d), "c_custkey"),
      FkEdge("customer->nation", t("customer")(s, d), "c_nationkey",
        t("nation")(s, d), "n_nationkey"),
      FkEdge("supplier->nation", t("supplier")(s, d), "s_nationkey",
        t("nation")(s, d), "n_nationkey"),
      FkEdge("nation->region", t("nation")(s, d), "n_regionkey",
        t("region")(s, d), "r_regionkey"),
      FkEdge("lineitem->orders@pre1997", li, "l_orderkey",
        ord.where(col("o_orderdate") < lit("1997-01-01")), "o_orderkey"))
  }

  /** Full-history SCD2 derivation — shared verbatim by q163 (direct
    * type2) and q169 (incremental applyChanges: identical-answer
    * contract). */
  private val scd2Oracle =
    """WITH e AS (
      |  SELECT o_custkey, o_orderpriority,
      |         CAST(o_orderdate AS DATE) AS odate, o_orderkey
      |  FROM orders),
      |m AS (
      |  SELECT *,
      |         lag(odate) OVER w IS NULL
      |           OR o_orderpriority IS DISTINCT FROM
      |              lag(o_orderpriority) OVER w AS chg
      |  FROM e WINDOW w AS (PARTITION BY o_custkey ORDER BY odate, o_orderkey)),
      |s AS (SELECT o_custkey, o_orderpriority, odate, o_orderkey
      |      FROM m WHERE chg)
      |SELECT o_custkey, o_orderpriority,
      |       odate AS odate_from, o_orderkey AS o_orderkey_from,
      |       lead(odate) OVER w AS odate_to,
      |       lead(o_orderkey) OVER w AS o_orderkey_to,
      |       CAST(row_number() OVER w AS INTEGER) AS version,
      |       lead(odate) OVER w IS NULL AS is_current
      |FROM s WINDOW w AS (PARTITION BY o_custkey ORDER BY odate, o_orderkey)"""
      .stripMargin

  /** Per-edge NOT EXISTS orphan derivation — shared by q166 and its
    * bloom-gated twin q177 (identical-answer contract). */
  private val fkOracle: String = Seq(
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey", ""),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey", ""),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey", ""),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey", ""),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey", ""),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey", ""),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey", ""),
    ("lineitem->orders@pre1997", "lineitem", "l_orderkey", "orders",
      "o_orderkey", " AND o_orderdate < TIMESTAMP '1997-01-01'"))
    .map { case (name, child, ck, parent, pk, pf) =>
      s"""SELECT '$name' AS fk_edge,
         |  (SELECT count(*) FROM $child WHERE $ck IS NOT NULL) AS n_child,
         |  count(*) AS n_orphan_rows,
         |  count(DISTINCT fk) AS n_missing_keys
         |FROM (SELECT $ck AS fk FROM $child
         |      WHERE $ck IS NOT NULL AND NOT EXISTS (
         |        SELECT 1 FROM $parent WHERE $pk = $ck$pf)) o"""
        .stripMargin
    }.mkString("\nUNION ALL\n")

  val oracleSql: Map[String, String] = Map(
    "q163_scd2" -> scd2Oracle,
    "q169_scd2_apply" -> scd2Oracle,
    "q166_fk_orphans" -> fkOracle,
    "q177_fk_orphans_bloom" -> fkOracle,
    "q50_partition_roundtrip" ->
      s"""WITH ${Bars.oracleCte}
         |SELECT id, dt, open, high, low, close, volume,
         |       CAST(year(dt) AS INTEGER) AS year,
         |       CAST(month(dt) AS INTEGER) AS month,
         |       CAST(day(dt) AS INTEGER) AS day
         |FROM daily""".stripMargin,
    // The evolved mart equals ONE clean recompute with the era rule
    // applied column-wise: volume only in the v1 era, spread only in
    // the v2 era — any rewrite of v1 files, dropped column, or
    // retry-duplicated row breaks the hash.
    "q222_schema_evolution" ->
      s"""WITH ${Bars.oracleCte}
         |SELECT id, dt, open, high, low, close,
         |       CASE WHEN dt < DATE '2024-01-20' THEN volume END AS volume,
         |       CASE WHEN dt >= DATE '2024-01-20' THEN
         |         CAST((CAST(high AS DECIMAL(18,2))
         |               - CAST(low AS DECIMAL(18,2))) * 100 AS BIGINT)
         |       END AS spread_c,
         |       CAST(year(dt) AS INTEGER) AS year,
         |       CAST(month(dt) AS INTEGER) AS month,
         |       CAST(day(dt) AS INTEGER) AS day
         |FROM daily""".stripMargin,
    // The seeded Laplace draw replayed: same exact dyadic uniform
    // (KMV nibble sum), same inverse-CDF operation order, shared
    // floor edge.
    "q261_dp_release" -> {
      val hv = graft.queries.OracleSql.md5Int48(
        "md5('dp:' || event_type || ':' || CAST(day AS VARCHAR))")
      s"""WITH c AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
         |  FROM events GROUP BY 1, 2),
         |h AS (SELECT event_type, day, n, $hv AS hv FROM c),
         |u AS (SELECT event_type, day, n,
         |        (CAST(hv AS DOUBLE) + 0.5) / 281474976710656.0 AS u
         |      FROM h),
         |x AS (SELECT event_type, day, n, u - 0.5 AS d,
         |             1 - 2 * abs(u - 0.5) AS t
         |      FROM u)
         |SELECT event_type, day, CAST(n AS BIGINT) AS n,
         |       CAST(floor((CAST(n AS DOUBLE) +
         |              (CASE WHEN d >= 0 THEN -ln(t) ELSE ln(t) END)
         |                * 1.0) * 1e4 + 0.5) / 1e4 AS REAL) AS noisy
         |FROM x""".stripMargin
    },

    // Class counts + two-level distinct re-derived; verdicts as
    // boolean comparisons of exact integers.
    "q258_kanon_audit" ->
      """SELECT c_nationkey, c_mktsegment,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(DISTINCT c_acctbal) AS BIGINT) AS n_sens,
        |       count(*) >= 10 AS k_ok,
        |       count(DISTINCT c_acctbal) >= 8 AS l_ok
        |FROM customer GROUP BY 1, 2""".stripMargin,

    // The dense class × domain grid, the same HUGEINT running
    // rational numerators, one division per class at the edge.
    "q297_tcloseness" ->
      """WITH b AS (SELECT c_nationkey, c_mktsegment, c_acctbal AS sv
        |           FROM customer WHERE c_acctbal IS NOT NULL),
        |gv AS (SELECT sv, CAST(count(*) AS BIGINT) AS gcnt
        |       FROM b GROUP BY 1),
        |gt AS (SELECT CAST(count(*) AS BIGINT) AS nn,
        |              CAST(count(DISTINCT sv) AS BIGINT) AS m FROM b),
        |cl AS (SELECT c_nationkey, c_mktsegment,
        |              CAST(count(*) AS BIGINT) AS nc
        |       FROM b GROUP BY 1, 2),
        |cc AS (SELECT c_nationkey, c_mktsegment, sv,
        |              CAST(count(*) AS BIGINT) AS ccnt
        |       FROM b GROUP BY 1, 2, 3),
        |grid AS (
        |  SELECT cl.c_nationkey, cl.c_mktsegment, cl.nc, gv.sv,
        |         gv.gcnt, coalesce(cc.ccnt, 0) AS ccnt
        |  FROM cl CROSS JOIN gv
        |  LEFT JOIN cc ON cc.c_nationkey = cl.c_nationkey
        |   AND cc.c_mktsegment = cl.c_mktsegment AND cc.sv = gv.sv),
        |cum AS (
        |  SELECT c_nationkey, c_mktsegment, nc, nn, m,
        |    sum(CAST(ccnt AS HUGEINT) * nn - CAST(gcnt AS HUGEINT) * nc)
        |      OVER (PARTITION BY c_nationkey, c_mktsegment ORDER BY sv
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cd
        |  FROM grid, gt),
        |ag AS (SELECT c_nationkey, c_mktsegment, nc, nn, m,
        |              sum(abs(cd)) AS sad
        |       FROM cum GROUP BY 1, 2, 3, 4, 5)
        |SELECT c_nationkey, c_mktsegment, nc AS n,
        |  CAST(floor(CASE WHEN m > 1 THEN
        |      CAST(sad AS DOUBLE) / nc / nn / (m - 1) ELSE 0.0 END
        |    * 1e6 + 0.5) / 1e6 AS REAL) AS emd,
        |  (CASE WHEN m > 1 THEN CAST(sad AS DOUBLE) / nc / nn / (m - 1)
        |        ELSE 0.0 END) <= 0.2 AS t_ok
        |FROM ag""".stripMargin,

    // The three lattice minima as scalar CTEs, the same first-level-
    // reaching-k choice, the same CASE-projected release.
    "q259_kanon_release" ->
      """WITH j AS (
        |  SELECT c.c_custkey, c.c_nationkey, c.c_mktsegment,
        |         n.n_regionkey
        |  FROM customer c JOIN nation n
        |    ON c.c_nationkey = n.n_nationkey),
        |m0 AS (SELECT min(n) AS m0 FROM (
        |  SELECT count(*) AS n FROM j GROUP BY c_nationkey, c_mktsegment)),
        |m1 AS (SELECT min(n) AS m1 FROM (
        |  SELECT count(*) AS n FROM j GROUP BY n_regionkey, c_mktsegment)),
        |m2 AS (SELECT min(n) AS m2 FROM (
        |  SELECT count(*) AS n FROM j GROUP BY n_regionkey)),
        |lv AS (SELECT CASE WHEN m0 >= 8 THEN 0 WHEN m1 >= 8 THEN 1
        |                   WHEN m2 >= 8 THEN 2 ELSE 3 END AS level
        |       FROM m0, m1, m2)
        |SELECT j.c_custkey, CAST(lv.level AS INTEGER) AS level,
        |       CASE WHEN lv.level = 0 THEN CAST(j.c_nationkey AS VARCHAR)
        |            WHEN lv.level <= 2 THEN CAST(j.n_regionkey AS VARCHAR)
        |            ELSE '*' END AS rel_qi1,
        |       CASE WHEN lv.level <= 1 THEN c_mktsegment
        |            ELSE '*' END AS rel_qi2
        |FROM j, lv""".stripMargin,

    // Equi-depth reference deciles off the window scan, current side
    // range-joined to the highest reachable bucket, 0.5 continuity
    // counts, floor-rounded cells, DECIMAL headline sum.
    "q231_psi" ->
      """WITH rc AS (
        |  SELECT value AS v, count(*) AS c FROM events
        |  WHERE value IS NOT NULL AND CAST(ts AS DATE) < DATE '2024-01-16'
        |  GROUP BY 1),
        |n AS (SELECT sum(c) AS n FROM rc),
        |scn AS (
        |  SELECT v, c, sum(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |  FROM rc),
        |bt AS (
        |  SELECT CAST(((run - c) * 10) // n.n AS INTEGER) AS bucket,
        |         min(v) AS v_min
        |  FROM scn, n GROUP BY 1),
        |cc AS (
        |  SELECT value AS v, count(*) AS c FROM events
        |  WHERE value IS NOT NULL AND CAST(ts AS DATE) >= DATE '2024-01-16'
        |  GROUP BY 1),
        |refb AS (
        |  SELECT v, c, coalesce(max(bucket), 0) AS bucket
        |  FROM rc LEFT JOIN bt ON v >= v_min GROUP BY 1, 2),
        |refcnt AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS c_ref
        |           FROM refb GROUP BY 1),
        |curb AS (
        |  SELECT v, c, coalesce(max(bucket), 0) AS bucket
        |  FROM cc LEFT JOIN bt ON v >= v_min GROUP BY 1, 2),
        |curcnt AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS c_cur
        |           FROM curb GROUP BY 1),
        |cells AS (
        |  SELECT coalesce(r.bucket, u.bucket) AS bucket,
        |         coalesce(r.c_ref, 0) AS c_ref,
        |         coalesce(u.c_cur, 0) AS c_cur
        |  FROM refcnt r FULL OUTER JOIN curcnt u ON r.bucket = u.bucket),
        |tot AS (SELECT CAST(sum(c_ref) AS BIGINT) AS nr,
        |               CAST(sum(c_cur) AS BIGINT) AS nc FROM cells),
        |x AS (
        |  SELECT bucket, c_ref, c_cur,
        |    (CASE WHEN c_ref = 0 THEN CAST(0.5 AS DOUBLE)
        |          ELSE CAST(c_ref AS DOUBLE) END) / nr AS p,
        |    (CASE WHEN c_cur = 0 THEN CAST(0.5 AS DOUBLE)
        |          ELSE CAST(c_cur AS DOUBLE) END) / nc AS q
        |  FROM cells, tot),
        |y AS (
        |  SELECT bucket, c_ref, c_cur,
        |    CAST(floor(p * 1e6 + 0.5) / 1e6 AS REAL) AS p_ref,
        |    CAST(floor(q * 1e6 + 0.5) / 1e6 AS REAL) AS p_cur,
        |    floor((p - q) * ln(p / q) * 1e6 + 0.5) / 1e6 AS contrib
        |  FROM x),
        |t2 AS (SELECT sum(CAST(contrib AS DECIMAL(18,6))) AS psi FROM y)
        |SELECT bucket, c_ref, c_cur, p_ref, p_cur,
        |       CAST(contrib AS REAL) AS contrib, CAST(psi AS REAL) AS psi
        |FROM y, t2""".stripMargin,

    // Same planted-edit rules re-derived; null-safe compares via
    // IS DISTINCT FROM; changed column list alphabetical.
    "q227_table_diff" ->
      """WITH v1 AS (
        |  SELECT doc_id, lang, source, md5(text) AS fp, n_chars
        |  FROM documents),
        |v2 AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 89 = 0 THEN 'xx' ELSE lang END AS lang,
        |         source,
        |         md5(CASE WHEN doc_id % 31 = 0 THEN text || ' rev2'
        |                  ELSE text END) AS fp,
        |         n_chars + CASE WHEN doc_id % 31 = 0 THEN 5 ELSE 0 END
        |           AS n_chars
        |  FROM documents WHERE doc_id % 97 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, lang, source, md5(text), n_chars
        |  FROM documents WHERE doc_id % 101 = 0),
        |j AS (
        |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
        |         a.doc_id IS NOT NULL AS in_a,
        |         b.doc_id IS NOT NULL AS in_b,
        |         list_filter([
        |           CASE WHEN a.fp IS DISTINCT FROM b.fp THEN 'fp' END,
        |           CASE WHEN a.lang IS DISTINCT FROM b.lang
        |                THEN 'lang' END,
        |           CASE WHEN a.n_chars IS DISTINCT FROM b.n_chars
        |                THEN 'n_chars' END,
        |           CASE WHEN a.source IS DISTINCT FROM b.source
        |                THEN 'source' END],
        |           x -> x IS NOT NULL) AS cc
        |  FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
        |SELECT doc_id,
        |       CASE WHEN NOT in_b THEN 'removed'
        |            WHEN NOT in_a THEN 'added'
        |            ELSE 'changed' END AS verdict,
        |       CASE WHEN in_a AND in_b THEN array_to_string(cc, ',')
        |            ELSE '' END AS changed_cols
        |FROM j
        |WHERE (NOT in_a) OR (NOT in_b) OR len(cc) > 0""".stripMargin,
    "q94_orc_roundtrip" ->
      s"""WITH ${Bars.oracleCteHourly}
         |SELECT id, t, open, high, low, close, volume,
         |       CAST(year(make_timestamp(t * 1000000)) AS INTEGER) AS year,
         |       CAST(month(make_timestamp(t * 1000000)) AS INTEGER) AS month,
         |       CAST(day(make_timestamp(t * 1000000)) AS INTEGER) AS day,
         |       CAST(hour(make_timestamp(t * 1000000)) AS INTEGER) AS hour
         |FROM hourly
         |WHERE make_timestamp(t * 1000000) >= TIMESTAMP '2024-01-24'"""
        .stripMargin,
    "q105_json_ingest" ->
      s"""WITH ${Bars.oracleCte}
         |SELECT id, dt, open, high, low, close, volume,
         |       CAST(year(dt) AS INTEGER) AS year,
         |       CAST(month(dt) AS INTEGER) AS month,
         |       CAST(day(dt) AS INTEGER) AS day
         |FROM daily""".stripMargin,
    "q51_csv_ingest" ->
      s"""WITH ${Bars.oracleCte}
         |SELECT CAST(id AS VARCHAR) AS id, dt,
         |       CAST(open AS REAL) AS open, CAST(high AS REAL) AS high,
         |       CAST(low AS REAL) AS low, CAST(close AS REAL) AS close,
         |       CAST(volume AS REAL) AS volume,
         |       CAST(epoch(CAST(dt AS TIMESTAMP)) AS BIGINT) AS ts,
         |       CAST(year(dt) AS INTEGER) AS year,
         |       CAST(month(dt) AS INTEGER) AS month,
         |       CAST(day(dt) AS INTEGER) AS day
         |FROM daily WHERE id % 17 <> 0""".stripMargin,
    "q52_freshness" ->
      """WITH checks AS (
        |  SELECT CAST(d AS DATE) AS check_date, CAST(sid AS BIGINT) AS sentinel_id
        |  FROM (VALUES ('2024-01-15', 2), ('2024-02-15', 2),
        |               ('2024-02-17', 2), ('2024-02-19', 2)) x(d, sid)),
        |counts AS (
        |  SELECT c.check_date, c.sentinel_id,
        |         (SELECT count(*) FROM events e
        |          WHERE CAST(e.ts AS DATE) = c.check_date
        |            AND e.user_id = c.sentinel_id) AS row_count,
        |         isodow(c.check_date) < 6
        |           AND c.check_date <> DATE '2024-02-19' AS is_market_open
        |  FROM checks c)
        |SELECT check_date, sentinel_id, row_count, is_market_open,
        |       CASE WHEN row_count > 0 THEN 'OK'
        |            WHEN is_market_open THEN 'WARNING'
        |            ELSE 'ERROR' END AS status
        |FROM counts""".stripMargin,

    "q84_profile" -> Seq("doc_id", "lang", "source", "n_chars").map(c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |       count(*) - count($c) AS n_nulls,
         |       count($c) AS n_non_null,
         |       count(DISTINCT $c) AS n_distinct,
         |       CAST(min($c) AS VARCHAR) AS min_s,
         |       CAST(max($c) AS VARCHAR) AS max_s
         |FROM documents""".stripMargin).mkString("\nUNION ALL\n"),

    // The KMV estimator per column, re-derived exactly as in q127:
    // distinct keys ranked by md5, the 256th 48-bit hash fraction
    // inverted; exact count below k. Counts and min/max are plain.
    "q129_profile_sketch" -> Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_returnflag", "l_linestatus").map { c =>
      val frac = OracleSql.md5Frac48("m")
      s"""SELECT '$c' AS col_name,
         |       (SELECT count(*) FROM lineitem) AS n_rows,
         |       (SELECT count(*) - count($c) FROM lineitem) AS n_nulls,
         |       (SELECT count($c) FROM lineitem) AS n_non_null,
         |       (SELECT CASE WHEN count(*) < 256
         |                    THEN round(CAST(count(*) AS DOUBLE), 4)
         |                    ELSE round(255.0 /
         |                      max(CASE WHEN rk = 256 THEN $frac END), 4)
         |               END
         |        FROM (SELECT m, row_number() OVER (ORDER BY m) AS rk
         |              FROM (SELECT DISTINCT md5(CAST($c AS VARCHAR)) AS m
         |                    FROM lineitem WHERE $c IS NOT NULL) d) r)
         |         AS ndv_est,
         |       (SELECT CAST(min($c) AS VARCHAR) FROM lineitem) AS min_s,
         |       (SELECT CAST(max($c) AS VARCHAR) FROM lineitem) AS max_s"""
        .stripMargin
    }.mkString("\nUNION ALL\n"),

    "q185_accepted_values" -> Seq(
      ("events.event_type@full", "events", "event_type",
        Seq("view", "click", "purchase", "signup", "error")),
      ("events.event_type@commerce", "events", "event_type",
        Seq("view", "click", "purchase")),
      ("lineitem.l_returnflag", "lineitem", "l_returnflag",
        Seq("A", "N", "R")),
      ("orders.o_orderstatus", "orders", "o_orderstatus",
        Seq("F", "O", "P")))
      .map { case (name, table, c, allowed) =>
        val inList = allowed.map(v => s"'$v'").mkString(", ")
        val bad = s"$c IS NOT NULL AND $c NOT IN ($inList)"
        s"""SELECT '$name' AS check_name, count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $bad THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_violations,
           |  count(DISTINCT CASE WHEN $bad THEN $c END) AS n_distinct_bad
           |FROM $table""".stripMargin
      }.mkString("\nUNION ALL\n"),

    "q193_compaction" ->
      """WITH m AS (
        |  SELECT strftime(l_shipdate, '%Y-%m') AS part_key,
        |         l_suppkey AS file_id, count(*) AS sz
        |  FROM lineitem GROUP BY 1, 2),
        |b AS (
        |  SELECT part_key, file_id, sz,
        |         coalesce(CAST(sum(sz) OVER (PARTITION BY part_key
        |             ORDER BY sz DESC, file_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS BIGINT), 0) // 24 AS bin
        |  FROM m)
        |SELECT part_key, file_id, sz, bin,
        |       CAST(count(*) OVER (PARTITION BY part_key, bin) AS INTEGER)
        |         AS bin_files,
        |       CAST(sum(sz) OVER (PARTITION BY part_key, bin) AS BIGINT)
        |         AS bin_sz
        |FROM b""".stripMargin,

    "q192_benford" -> {
      val digitCase = (12 to 1 by -1).map(k =>
        s"WHEN i >= ${math.pow(10, k).toLong} THEN i // ${math.pow(10, k).toLong}")
        .mkString(" ")
      s"""WITH f AS (
         |  SELECT CAST(floor(o_totalprice) AS BIGINT) AS i
         |  FROM orders WHERE o_totalprice >= 1),
         |d AS (SELECT CASE $digitCase ELSE i END AS digit FROM f),
         |c AS (SELECT CAST(digit AS INTEGER) AS digit, count(*) AS n
         |      FROM d GROUP BY 1),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c)
         |SELECT digit, n,
         |  CAST(round(CAST(n AS DOUBLE) / n_total, 4) AS REAL) AS obs_frac,
         |  CAST(round(ln(1 + CAST(1 AS DOUBLE) / digit) / ln(10), 4) AS REAL)
         |    AS benford_frac,
         |  CAST(round(CAST(n AS DOUBLE) / n_total
         |         - ln(1 + CAST(1 AS DOUBLE) / digit) / ln(10), 4) AS REAL) AS dev
         |FROM c, t""".stripMargin
    },

    // The xy2d walk unrolled 10 levels: per level, the quadrant digit
    // folds into hd (s²·((3·rx) xor ry)) and the frame rotates — the
    // FULL-GRID flip (n−1−coord), matching the engine kernel, because
    // an s−1 flip goes negative once higher consumed bits are set.
    // Every stage MATERIALIZED: each references both coords twice, so
    // inlining would grow 3^10 scans (the q194 discipline).
    "q251_hilbert" -> {
      val bits = 10
      val n1 = (1L << bits) - 1
      val stages = (0 until bits).map { i =>
        val s = 1L << (bits - 1 - i)
        s"""r$i AS MATERIALIZED (
           |  SELECT a, sb, hd, hx, hy,
           |         (hx // $s) % 2 AS rx, (hy // $s) % 2 AS ry
           |  FROM h$i),
           |h${i + 1} AS MATERIALIZED (
           |  SELECT a, sb,
           |         hd + $s * $s * xor(3 * rx, ry) AS hd,
           |         CASE WHEN ry = 0
           |              THEN (CASE WHEN rx = 1 THEN $n1 - hy ELSE hy END)
           |              ELSE hx END AS hx,
           |         CASE WHEN ry = 0
           |              THEN (CASE WHEN rx = 1 THEN $n1 - hx ELSE hx END)
           |              ELSE hy END AS hy
           |  FROM r$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH b AS (
         |  SELECT min(l_partkey) AS mna, max(l_partkey) AS mxa,
         |         min(l_suppkey) AS mnb, max(l_suppkey) AS mxb
         |  FROM lineitem),
         |h0 AS (
         |  SELECT l_partkey AS a, l_suppkey AS sb, CAST(0 AS BIGINT) AS hd,
         |         ((l_partkey - mna) * 1024) // (mxa - mna + 1) AS hx,
         |         ((l_suppkey - mnb) * 1024) // (mxb - mnb + 1) AS hy
         |  FROM lineitem, b),
         |$stages
         |SELECT CAST(hd // ${1L << 14} AS INTEGER) AS block,
         |       count(*) AS n_rows,
         |       min(a) AS min_a, max(a) AS max_a,
         |       min(sb) AS min_b, max(sb) AS max_b
         |FROM h$bits GROUP BY 1""".stripMargin
    },
    "q168_zorder" -> {
      // the 2x10-bit Morton interleave as exact integer arithmetic
      val z = (0 until 10).map(i =>
        s"((ra // ${1L << i}) % 2) * ${1L << (2 * i + 1)} + " +
          s"((rb // ${1L << i}) % 2) * ${1L << (2 * i)}").mkString(" + ")
      s"""WITH b AS (
         |  SELECT min(l_partkey) AS mna, max(l_partkey) AS mxa,
         |         min(l_suppkey) AS mnb, max(l_suppkey) AS mxb
         |  FROM lineitem),
         |r AS (
         |  SELECT l_partkey AS a, l_suppkey AS sb,
         |         ((l_partkey - mna) * 1024) // (mxa - mna + 1) AS ra,
         |         ((l_suppkey - mnb) * 1024) // (mxb - mnb + 1) AS rb
         |  FROM lineitem, b),
         |z AS (SELECT a, sb, ($z) AS zkey FROM r)
         |SELECT CAST(zkey // ${1L << 14} AS INTEGER) AS block,
         |       count(*) AS n_rows,
         |       min(a) AS min_a, max(a) AS max_a,
         |       min(sb) AS min_b, max(sb) AS max_b
         |FROM z GROUP BY 1""".stripMargin
    })
}
