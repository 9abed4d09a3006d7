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
      checkpoint: Boolean = true): DataFrame =
    oneLevelW(pairs.select(col("a"), col("b"), lit(1L).as("w")),
      rounds, checkpoint)

  /** WEIGHTED one-level ascent — the form the CONTRACTED graph of
    * [[twoLevel]] needs: `edges(a, b, w)` symmetric directed with
    * self-loops allowed (a = b). A supernode's strength k_i = Σw over
    * its out-edges INCLUDING the self-loop (the intra-community mass
    * travels with the node), while k_{i,c} — the mover's weight into a
    * candidate community — EXCLUDES it (a self-loop contributes the
    * same intra mass wherever i sits, so it cancels out of ΔQ). With
    * those two conventions the exact-integer gain formula is unchanged:
    * ΔQ·M²/2 = M·(k_{i,b} − k_{i,a\i}) − k_i·(d_b − d_a + k_i), all
    * long sums of long weights ([[oneLevel]] is the w = 1 no-loop
    * special case).
    */
  def oneLevelW(edges: DataFrame, rounds: Int = 4,
      checkpoint: Boolean = true): DataFrame = {
    val lbl = oneLevelLabelsW(edges, rounds, checkpoint)
    val sizes = lbl.groupBy(col("c")).agg(count(lit(1)).as("csize"))
    lbl.join(sizes, "c")
      .select(col("id"), col("c").as("community"), col("csize"))
  }

  /** Bare final labels of [[oneLevelW]] — (id, c, k), checkpointed
    * when `checkpoint` — for composed callers ([[twoLevel]]) that do
    * not need the size decoration: the terminal groupBy + join (and
    * one more checkpoint of their output) is skipped (r17, guide
    * §1.2).
    */
  private[graft] def oneLevelLabelsW(edges: DataFrame, rounds: Int = 4,
      checkpoint: Boolean = true): DataFrame = {
    def cp(df: DataFrame): DataFrame =
      if (checkpoint)
        org.apache.spark.sql.GraftSqlShims.localCheckpointFreshStats(df)
      else df
    val e = cp(edges.select(col("a").as("src"), col("b").as("dst"),
      col("w")))
    // labels CARRY the node strength k (guide §2.4 — two operations
    // keyed the same way share one pass): dc and the candidate
    // assembly used to re-join the separate degree table every round
    val m = cp(e.agg(sum(col("w")).as("m"))) // 1 row, aggregated ONCE
    var lbl = cp(e.groupBy(col("src").as("id"))
      .agg(sum(col("w")).as("k"))
      .select(col("id"), col("id").as("c"), col("k")))
    var round = 1
    var converged = false
    while (round <= rounds && !converged) {
      // community degree sums under the current labels — off lbl's own
      // k, no join
      val dc = lbl.groupBy(col("c")).agg(sum(col("k")).as("dc"))
      // k_{i,c}: the node's edge weight into each neighboring community
      // (self-loops excluded — they move with the node), annotated with
      // the mover's own (c, k) in ONE join; feeds candidates AND the
      // ka lookup — checkpoint the fan-out
      val kcl = cp(e.where(col("src") =!= col("dst"))
        .join(lbl.select(col("id").as("dst"), col("c").as("cn")), "dst")
        .groupBy(col("src").as("id"), col("cn"))
        .agg(sum(col("w")).as("kc"))
        .join(lbl, "id"))
      val ka = kcl.where(col("cn") === col("c"))
        .select(col("id"), col("kc").as("ka"))
      val cand = kcl.where(col("cn") =!= col("c"))
        .select(col("id"), col("c").as("a"), col("cn").as("b"),
          col("kc").as("kb"), col("k"))
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
      // ONE checkpoint per round (r17, guide §1.2): the applied-move
      // update rides the label checkpoint as a `moved` flag instead of
      // movers getting its own eager materialization first — the
      // fixpoint test then reads the already-materialized frame. The
      // flag is internal only (projected away at every exit).
      val nextLbl = cp(lbl.join(movers, Seq("id"), "left")
        .select(col("id"), coalesce(col("newc"), col("c")).as("c"),
          col("k"), col("newc").isNotNull.as("moved")))
      // FIXPOINT EARLY EXIT (pure savings, identical output): no
      // applied moves ⇒ labels unchanged ⇒ dc/kc/cand identical next
      // round ⇒ every remaining round is a no-op — exactly the rounds
      // the oracle unrolls as label-preserving steps. On the no-move
      // round the PREVIOUS label frame stays current (nextLbl is a
      // row-identical copy), so lbl is deliberately not replaced.
      if (checkpoint && nextLbl.where(col("moved")).isEmpty)
        converged = true
      else lbl = nextLbl.drop("moved")
      round += 1
    }
    lbl
  }

  /** MULTI-LEVEL Louvain (Blondel et al. 2008, the full algorithm):
    * after the level-1 ascent converges its rounds, the graph is
    * CONTRACTED — every community becomes a supernode, parallel edges
    * sum into weights, intra-community edges become self-loops — and a
    * second weighted ascent runs on the contracted graph. One level
    * alone leaves mega-communities unsplit on large graphs; the
    * contraction step is what lets later levels merge whole
    * communities at once. Because the contraction preserves M, the
    * degree sums, and the intra masses, modularity of the level-2
    * labeling ON THE ORIGINAL GRAPH is exactly the contracted graph's
    * modularity — so Q(level 2) ≥ Q(level 1) by the same per-round
    * ascent guarantee (pinned in Round13OpsSpec via [[Modularity]]).
    *
    * Scale shape: level 1 is [[oneLevel]] (O(|E|)-shuffle rounds); the
    * contraction is ONE groupBy on the label-annotated edge list
    * (|communities|² worst-case but ≤ |E| rows real); level 2 runs on
    * the contracted graph — orders of magnitude smaller, the whole
    * point of the method.
    *
    * @return (id, c1, community, csize) — the node's level-1 and final
    *         level-2 communities + the level-2 community's ORIGINAL
    *         node count
    */
  def twoLevel(pairs: DataFrame, rounds1: Int = 4, rounds2: Int = 4,
      checkpoint: Boolean = true): DataFrame = {
    def cp(df: DataFrame): DataFrame =
      if (checkpoint)
        org.apache.spark.sql.GraftSqlShims.localCheckpointFreshStats(df)
      else df
    // the level-1 label frame is already checkpointed by the ascent
    // loop — read it bare instead of decorating it with sizes and
    // re-checkpointing the projection (r17, guide §1.2: the old form
    // paid a groupBy + join + one more full-frame materialization for
    // columns twoLevel never reads)
    val lbl1 = oneLevelLabelsW(
        pairs.select(col("a"), col("b"), lit(1L).as("w")),
        rounds1, checkpoint)
      .select(col("id"), col("c").as("c1"))
    val e2 = pairs
      .join(lbl1.select(col("id").as("a"), col("c1").as("ca")), "a")
      .join(lbl1.select(col("id").as("b"), col("c1").as("cb")), "b")
      .groupBy(col("ca").as("a"), col("cb").as("b"))
      .agg(count(lit(1)).as("w"))
    // level 2 likewise needs only the labels — its csize is recomputed
    // over ORIGINAL nodes below, never read from the contracted ascent
    val l2 = oneLevelLabelsW(e2, rounds2, checkpoint)
      .select(col("id").as("c1"), col("c").as("c2"))
    val fin = cp(lbl1.join(l2, "c1"))
    val sizes = fin.groupBy(col("c2")).agg(count(lit(1)).as("csize"))
    fin.join(sizes, "c2")
      .select(col("id"), col("c1"), col("c2").as("community"),
        col("csize"))
  }

  /** Unrolled DuckDB CTE chain re-deriving [[oneLevel]] exactly:
    * expects a symmetric `e(src, dst)` in scope, emits `deg`, `mm`,
    * `l0..l$rounds` and `csz`; select `id, c, csize` from
    * `l$rounds JOIN csz`. */
  def oracleCte(rounds: Int): String = oracleCteW(rounds, "", "e",
    weighted = false)

  /** The weighted/suffixed generalization ([[oneLevelW]]'s oracle):
    * reads `$edges(src, dst, w)` (self-loops allowed), emits
    * `deg$sfx`, `mm$sfx`, `l$sfx0..l$sfx$rounds`, `csz$sfx` — the
    * suffix keeps a level-2 unroll from colliding with level-1's CTE
    * names in the same WITH chain. `weighted = false` reproduces
    * [[oracleCte]]'s count-based text exactly (no `w` column read). */
  def oracleCteW(rounds: Int, sfx: String, edges: String,
      weighted: Boolean = true): String = {
    val wSum = if (weighted) "sum(w)" else "count(*)"
    // self-loop guard only matters when loops can exist (weighted /
    // contracted graphs) — the unweighted pair-set contract has none
    val noLoop = if (weighted) "WHERE e.src <> e.dst " else ""
    val steps = (1 to rounds).map { i =>
      s"""dc$sfx$i AS (SELECT c, CAST(sum(k) AS BIGINT) AS dc
         |  FROM l$sfx${i - 1} JOIN deg$sfx USING (id) GROUP BY 1),
         |kc$sfx$i AS MATERIALIZED (
         |  SELECT e.src AS id, l.c AS cn, CAST($wSum AS BIGINT) AS kc
         |  FROM $edges e JOIN l$sfx${i - 1} l ON l.id = e.dst
         |  ${noLoop}GROUP BY 1, 2),
         |cand$sfx$i AS (
         |  SELECT k0.id, l.c AS a, k0.cn AS b,
         |         2 * (mm$sfx.m * (k0.kc - coalesce(ka.kc, 0))
         |              - d.k * (dcb.dc - dca.dc + d.k)) AS dq
         |  FROM kc$sfx$i k0
         |  JOIN l$sfx${i - 1} l USING (id)
         |  JOIN deg$sfx d USING (id)
         |  JOIN dc$sfx$i dca ON dca.c = l.c
         |  JOIN dc$sfx$i dcb ON dcb.c = k0.cn
         |  LEFT JOIN kc$sfx$i ka ON ka.id = k0.id AND ka.cn = l.c
         |  CROSS JOIN mm$sfx
         |  WHERE k0.cn <> l.c),
         |nb$sfx$i AS (SELECT id, a, b, dq FROM (
         |    SELECT *, row_number() OVER (PARTITION BY id
         |      ORDER BY dq DESC, b) AS rn
         |    FROM cand$sfx$i WHERE dq > 0) WHERE rn = 1),
         |tch$sfx$i AS (SELECT a AS comm, id, b, dq FROM nb$sfx$i
         |          UNION ALL SELECT b AS comm, id, b, dq FROM nb$sfx$i),
         |bst$sfx$i AS (SELECT comm, id, b FROM (
         |    SELECT *, row_number() OVER (PARTITION BY comm
         |      ORDER BY dq DESC, id, b) AS rn
         |    FROM tch$sfx$i) WHERE rn = 1),
         |mv$sfx$i AS (SELECT n.id, n.b FROM nb$sfx$i n
         |  JOIN bst$sfx$i p ON p.comm = n.a AND p.id = n.id AND p.b = n.b
         |  JOIN bst$sfx$i q ON q.comm = n.b AND q.id = n.id AND q.b = n.b),
         |l$sfx$i AS MATERIALIZED (
         |  SELECT l.id, coalesce(m.b, l.c) AS c
         |  FROM l$sfx${i - 1} l LEFT JOIN mv$sfx$i m USING (id))""".stripMargin
    }
    (s"""deg$sfx AS MATERIALIZED (
        |  SELECT src AS id, CAST($wSum AS BIGINT) AS k
        |  FROM $edges GROUP BY 1),
        |mm$sfx AS (SELECT CAST($wSum AS BIGINT) AS m FROM $edges),
        |l${sfx}0 AS MATERIALIZED (SELECT id, id AS c FROM deg$sfx)""".stripMargin
      +: steps :+
      s"""csz$sfx AS (SELECT c, CAST(count(*) AS BIGINT) AS csize
         |        FROM l$sfx$rounds GROUP BY 1)""".stripMargin)
      .mkString(",\n")
  }
}
