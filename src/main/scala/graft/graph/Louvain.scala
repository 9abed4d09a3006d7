package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-level Louvain modularity ascent (Blondel et al. 2008, phase 1)
  * — the OPTIMIZATION half of community detection beside the scorer in
  * [[Modularity]] and the propagation heuristic in [[LabelProp]]:
  * nodes start as singleton communities and greedily move to the
  * neighboring community with the largest modularity gain.
  *
  * The classic sweep is serial (visit nodes in order, apply each move
  * immediately); a naive synchronous parallelization loses the ascent
  * guarantee (two adjacent nodes can swap into each other's old
  * communities and DECREASE Q). This variant keeps both parallelism
  * and exact ascent with a deterministic COMMUNITY HANDSHAKE: each
  * round every node computes its single best positive-ΔQ move (ties to
  * the smallest target community), and a move applies only if it is
  * the best move touching BOTH its source and its target community
  * (rank = (ΔQ desc, id, target)). Applied moves therefore touch
  * pairwise-disjoint community pairs; ΔQ depends only on the mover's
  * degree, its edge counts into the two communities, and the two
  * community degree sums, so disjoint moves are exactly independent
  * and the round's total gain is the exact SUM of the applied ΔQs —
  * every round is a strict ascent while any positive move exists, and
  * the globally best move always survives the handshake.
  *
  * ΔQ is the exact integer numerator of [[Modularity]]'s
  * common-denominator form (directed convention, M = directed edges):
  * {{{
  *   ΔQ · M² / 2 = M·(k_{i,b} − k_{i,a\i}) − k_i·(d_b − d_a + k_i)
  * }}}
  * where a/b are the source/target communities, d the community
  * degree sums (d_a including i), and k_{i,c} the mover's edge count
  * into c. All longs, no division until [[Modularity]] scores the
  * result — rounds are bit-identical cross-engine (the [[LabelProp]]
  * determinism contract) and the oracle unrolls them exactly.
  *
  * Scale shape per round: one src-keyed equi-join for the
  * node→community edge counts, two bounded (|communities|-row) degree
  * aggregates, the candidate assembly as hash equi-joins on id/
  * community, and two argmin hash aggregates (per node, then per
  * community) — no window sorts, shuffle volume O(|E|) on the join
  * keys. Labels eagerly localCheckpointed per round (Pregel
  * discipline).
  */
object Louvain {

  /** @param pairs symmetric directed pair set (`a`, `b`): both
    *              orientations present, no loops ([[LabelProp]]'s
    *              contract)
    * @param rounds fixed handshake-move round count
    * @return (id, community, csize) — final community + its size
    */
  def oneLevel(pairs: DataFrame, rounds: Int = 4,
      checkpoint: Boolean = true): DataFrame = {
    def cp(df: DataFrame): DataFrame =
      if (checkpoint) df.localCheckpoint(true) else df
    val e = cp(pairs.select(col("a").as("src"), col("b").as("dst")))
    val deg = cp(e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("k")))
    val m = e.agg(count(lit(1)).as("m"))
    var lbl = cp(deg.select(col("id"), col("id").as("c")))
    for (_ <- 1 to rounds) {
      // community degree sums under the current labels
      val dc = lbl.join(deg, "id")
        .groupBy(col("c")).agg(sum(col("k")).as("dc"))
      // k_{i,c}: the node's edge count into each neighboring community
      // feeds candidates AND the ka lookup — checkpoint the fan-out
      val kc = cp(e.join(lbl.withColumnRenamed("id", "dst")
          .withColumnRenamed("c", "cn"), "dst")
        .groupBy(col("src").as("id"), col("cn"))
        .agg(count(lit(1)).as("kc")))
      val ka = kc.join(lbl, "id").where(col("cn") === col("c"))
        .select(col("id"), col("kc").as("ka"))
      val cand = kc.join(lbl, "id").where(col("cn") =!= col("c"))
        .select(col("id"), col("c").as("a"), col("cn").as("b"),
          col("kc").as("kb"))
        .join(deg, "id")
        .join(dc.select(col("c").as("a"), col("dc").as("da")), "a")
        .join(dc.select(col("c").as("b"), col("dc").as("db")), "b")
        .join(ka, Seq("id"), "left").na.fill(0L, Seq("ka"))
        .crossJoin(broadcast(m))
        .select(col("id"), col("a"), col("b"),
          (lit(2) * (col("m") * (col("kb") - col("ka")) -
            col("k") * (col("db") - col("da") + col("k")))).as("dq"))
        .where(col("dq") > 0)
      // each node's best move: argmax ΔQ, ties to the smallest target
      val nb = cand
        .groupBy(col("id"), col("a"))
        .agg(min(struct((-col("dq")).as("nd"), col("b"))).as("mv"))
        .select(col("id"), col("a"), col("mv.b").as("b"),
          (-col("mv.nd")).as("dq"))
      // community handshake: a move applies iff it ranks first among
      // all moves touching its source AND its target community
      val touches = nb.select(col("a").as("comm"), col("id"), col("b"),
          col("dq"))
        .unionByName(nb.select(col("b").as("comm"), col("id"),
          col("b"), col("dq")))
      val best = touches.groupBy(col("comm"))
        .agg(min(struct((-col("dq")).as("nd"), col("id"), col("b")))
          .as("w"))
        .select(col("comm"), col("w.id").as("wid"), col("w.b").as("wb"))
      val movers = nb
        .join(best, col("a") === col("comm") &&
          col("id") === col("wid") && col("b") === col("wb"))
        .drop("comm", "wid", "wb")
        .join(best, col("b") === col("comm") &&
          col("id") === col("wid") && col("b") === col("wb"))
        .select(col("id"), col("b").as("newc"))
      lbl = cp(lbl.join(movers, Seq("id"), "left")
        .select(col("id"), coalesce(col("newc"), col("c")).as("c")))
    }
    val sizes = lbl.groupBy(col("c")).agg(count(lit(1)).as("csize"))
    lbl.join(sizes, "c")
      .select(col("id"), col("c").as("community"), col("csize"))
  }

  /** Unrolled DuckDB CTE chain re-deriving [[oneLevel]] exactly:
    * expects a symmetric `e(src, dst)` in scope, emits `deg`, `mm`,
    * `l0..l$rounds` and `csz`; select `id, c, csize` from
    * `l$rounds JOIN csz`. */
  def oracleCte(rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""dc$i AS (SELECT c, CAST(sum(k) AS BIGINT) AS dc
         |  FROM l${i - 1} JOIN deg USING (id) GROUP BY 1),
         |kc$i AS MATERIALIZED (
         |  SELECT e.src AS id, l.c AS cn, CAST(count(*) AS BIGINT) AS kc
         |  FROM e JOIN l${i - 1} l ON l.id = e.dst GROUP BY 1, 2),
         |cand$i AS (
         |  SELECT k0.id, l.c AS a, k0.cn AS b,
         |         2 * (mm.m * (k0.kc - coalesce(ka.kc, 0))
         |              - d.k * (dcb.dc - dca.dc + d.k)) AS dq
         |  FROM kc$i k0
         |  JOIN l${i - 1} l USING (id)
         |  JOIN deg d USING (id)
         |  JOIN dc$i dca ON dca.c = l.c
         |  JOIN dc$i dcb ON dcb.c = k0.cn
         |  LEFT JOIN kc$i ka ON ka.id = k0.id AND ka.cn = l.c
         |  CROSS JOIN mm
         |  WHERE k0.cn <> l.c),
         |nb$i AS (SELECT id, a, b, dq FROM (
         |    SELECT *, row_number() OVER (PARTITION BY id
         |      ORDER BY dq DESC, b) AS rn
         |    FROM cand$i WHERE dq > 0) WHERE rn = 1),
         |tch$i AS (SELECT a AS comm, id, b, dq FROM nb$i
         |          UNION ALL SELECT b AS comm, id, b, dq FROM nb$i),
         |bst$i AS (SELECT comm, id, b FROM (
         |    SELECT *, row_number() OVER (PARTITION BY comm
         |      ORDER BY dq DESC, id, b) AS rn
         |    FROM tch$i) WHERE rn = 1),
         |mv$i AS (SELECT n.id, n.b FROM nb$i n
         |  JOIN bst$i p ON p.comm = n.a AND p.id = n.id AND p.b = n.b
         |  JOIN bst$i q ON q.comm = n.b AND q.id = n.id AND q.b = n.b),
         |l$i AS MATERIALIZED (
         |  SELECT l.id, coalesce(m.b, l.c) AS c
         |  FROM l${i - 1} l LEFT JOIN mv$i m USING (id))""".stripMargin
    }
    (s"""deg AS MATERIALIZED (
        |  SELECT src AS id, CAST(count(*) AS BIGINT) AS k
        |  FROM e GROUP BY 1),
        |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
        |l0 AS MATERIALIZED (SELECT id, id AS c FROM deg)""".stripMargin
      +: steps :+
      s"""csz AS (SELECT c, CAST(count(*) AS BIGINT) AS csize
         |        FROM l$rounds GROUP BY 1)""".stripMargin)
      .mkString(",\n")
  }
}
