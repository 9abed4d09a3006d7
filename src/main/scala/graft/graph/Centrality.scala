package graft.graph

import org.apache.spark.sql.{DataFrame, GraftSqlShims}
import org.apache.spark.sql.functions._

/** Seeded path-based centralities: Brandes betweenness and harmonic
  * closeness — the "who do shortest paths FLOW THROUGH" and "who is
  * CLOSE to everyone" readouts beside [[PageRank]] (authority),
  * [[KCore]] (density) and [[Bfs]] (reach).
  *
  * Both run from a SEED SAMPLE of sources (Brandes & Pich 2007's
  * pivot estimation): exact all-sources betweenness is O(|V|·|E|) —
  * at warehouse scale nobody runs it; the k-pivot form IS the
  * production algorithm, and sampling error decays as 1/√k.
  *
  * Determinism — the reason this formulation ships:
  *   - Forward (σ): path counts are EXACT longs accumulated by
  *     (src, node)-keyed equi-joins round by round — σ(v) =
  *     Σ_{u∈pred} σ(u), order-independent integer sums.
  *   - Backward (δ): Brandes' dependency δ(v) = Σ_{w∈succ}
  *     (σ_v/σ_w)·(1+δ_w) is carried in MICRO-UNITS with the division
  *     as INTEGER floor-div: δᵤ(v) = Σ_w (σ_v·(10⁶+δᵤ(w))) div σ_w —
  *     every intermediate is an exact long, sums order-independent,
  *     each level truncating ≤ 1 micro-unit per successor (the
  *     documented quantization contract, mirrored exactly by the
  *     oracle's unrolled levels).
  *
  * Scale shape: per-round shuffle is frontier×degree on (src, id)
  * hash keys (the [[Bfs]] frontier contract, with the source
  * dimension multiplying width by k — choose k accordingly); per
  * level one groupBy; per-round eager checkpoint with fresh stats
  * (the repo's Pregel discipline). No window sorts, no driver loops
  * over nodes.
  */
object Centrality {

  /** Per-source hop distances AND shortest-path counts:
    * (src, id, dist, sigma) for every node within `rounds` of a seed.
    */
  def distSigma(edges: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    val e = edges.select(col("a"), col("b"))
    var labeled = seeds.select(col("id")).distinct()
      .select(col("id").as("src"), col("id"), lit(0).as("dist"),
        lit(1L).as("sigma"))
      .localCheckpoint(true)
    var frontier = labeled
    for (r <- 1 to rounds) {
      val next = e.join(frontier.select(col("id").as("a"), col("src"),
          col("sigma")), "a")
        .groupBy(col("src"), col("b").as("id"))
        .agg(sum(col("sigma")).as("sigma"))
        .join(labeled.select(col("src"), col("id")), Seq("src", "id"),
          "left_anti")
        .select(col("src"), col("id"), lit(r).as("dist"), col("sigma"))
        .transform(GraftSqlShims.localCheckpointFreshStats)
      labeled = GraftSqlShims.localCheckpointFreshStats(
        labeled.unionByName(next))
      frontier = next
    }
    labeled
  }

  /** k-pivot Brandes betweenness (Brandes 2001; Brandes & Pich 2007)
    * over the seeded forward pass, backward dependency levels in
    * exact micro-unit integer arithmetic. Returns every node's
    * accumulated dependency bc = Σ_src δ_src(v) (v ≠ src), raw seeded
    * sum (scale by |V|/k externally for the estimator form).
    *
    * @return (id, bc) — bc at micro precision as REAL
    */
  def betweennessSeeded(nodes: DataFrame, edges: DataFrame,
      seeds: DataFrame, rounds: Int): DataFrame = {
    val e = edges.select(col("a"), col("b"))
    val ds = distSigma(edges, seeds, rounds)
      .localCheckpoint(true) // feeds every backward level
    // delta in micro-units per (src, id), built from the deepest
    // level down; nodes of dist r with no dist-(r+1) successors keep
    // delta = 0 via the left join + coalesce.
    var delta = ds.where(col("dist") === rounds)
      .select(col("src"), col("id"), lit(0L).as("delta_u"))
      .localCheckpoint(true)
    for (r <- (rounds - 1) to 0 by -1) {
      val lvl = ds.where(col("dist") === r)
      val succ = ds.where(col("dist") === r + 1)
        .select(col("src"), col("id").as("w"), col("sigma").as("sw"))
        .join(delta.select(col("src"), col("id").as("w"),
          col("delta_u")), Seq("src", "w"), "left")
        .select(col("src"), col("w"),
          col("sw"), coalesce(col("delta_u"), lit(0L)).as("dw"))
      val contrib = lvl.select(col("src"), col("id"), col("sigma"))
        .join(e.select(col("a").as("id"), col("b").as("w")), Seq("id"))
        .join(succ, Seq("src", "w"))
        .groupBy(col("src"), col("id"))
        .agg(sum(expr("sigma * (1000000 + dw) div sw")).as("delta_u"))
      val lvlDelta = lvl.select(col("src"), col("id"))
        .join(contrib, Seq("src", "id"), "left")
        .select(col("src"), col("id"),
          coalesce(col("delta_u"), lit(0L)).as("delta_u"))
        .transform(GraftSqlShims.localCheckpointFreshStats)
      delta = GraftSqlShims.localCheckpointFreshStats(
        delta.unionByName(lvlDelta))
    }
    val bc = ds.where(col("dist") > 0)
      .select(col("src"), col("id"))
      .join(delta, Seq("src", "id"))
      .groupBy(col("id")).agg(sum(col("delta_u")).as("bc_u"))
    // micro totals land on exact half-points where double round(_,4)
    // diverges between engines — round as integers instead (half-up)
    nodes.select(col("id"))
      .join(bc, Seq("id"), "left")
      .select(col("id"),
        (expr("(coalesce(bc_u, 0) + 50) div 100").cast("double") /
          lit(1e4)).cast("float").as("bc"))
  }

  /** Seeded EDGE betweenness (Girvan & Newman 2002's community-
    * splitting signal; Brandes 2001's edge form): the dependency each
    * shortest-path-DAG edge (v, w) carries is exactly the backward
    * term σ_v·(10⁶+δᵤ(w)) div σ_w — the same exact micro-unit integer
    * the node accumulation sums — here emitted per UNDIRECTED edge
    * key (least, greatest) and summed across levels and sources.
    * Unlike node betweenness, edges OUT OF the sources count (they
    * carry every path that starts there).
    *
    * @return (u, v, eb) for every edge on some seeded shortest path
    */
  def edgeBetweennessSeeded(edges: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    val e = edges.select(col("a"), col("b"))
    val ds = distSigma(edges, seeds, rounds).localCheckpoint(true)
    var delta = ds.where(col("dist") === rounds)
      .select(col("src"), col("id"), lit(0L).as("delta_u"))
      .localCheckpoint(true)
    var acc: Option[DataFrame] = None
    for (r <- (rounds - 1) to 0 by -1) {
      val lvl = ds.where(col("dist") === r)
      val succ = ds.where(col("dist") === r + 1)
        .select(col("src"), col("id").as("w"), col("sigma").as("sw"))
        .join(delta.select(col("src"), col("id").as("w"),
          col("delta_u")), Seq("src", "w"), "left")
        .select(col("src"), col("w"),
          col("sw"), coalesce(col("delta_u"), lit(0L)).as("dw"))
      val terms = lvl.select(col("src"), col("id"), col("sigma"))
        .join(e.select(col("a").as("id"), col("b").as("w")), Seq("id"))
        .join(succ, Seq("src", "w"))
        .select(col("src"), col("id"), col("w"),
          expr("sigma * (1000000 + dw) div sw").as("t"))
        .transform(GraftSqlShims.localCheckpointFreshStats)
      val contrib = terms.groupBy(col("src"), col("id"))
        .agg(sum(col("t")).as("delta_u"))
      val lvlDelta = lvl.select(col("src"), col("id"))
        .join(contrib, Seq("src", "id"), "left")
        .select(col("src"), col("id"),
          coalesce(col("delta_u"), lit(0L)).as("delta_u"))
        .transform(GraftSqlShims.localCheckpointFreshStats)
      delta = GraftSqlShims.localCheckpointFreshStats(
        delta.unionByName(lvlDelta))
      val et = terms.select(least(col("id"), col("w")).as("u"),
        greatest(col("id"), col("w")).as("v"), col("t"))
      acc = Some(acc.map(_.unionByName(et)).getOrElse(et))
    }
    acc.get.groupBy(col("u"), col("v")).agg(sum(col("t")).as("eb_u"))
      .select(col("u"), col("v"),
        (expr("(eb_u + 50) div 100").cast("double") /
          lit(1e4)).cast("float").as("eb"))
  }

  /** Seeded harmonic closeness (Marchiori & Latora 2000; Boldi &
    * Vigna 2014's preferred form — defined even on disconnected
    * graphs): harm(v) = Σ_seeds 1/d(seed, v), carried as the exact
    * integer Σ 10⁶ div dist — order-independent, one division
    * quantization per term.
    *
    * @return (id, n_reached, harmonic)
    */
  def harmonicCloseness(nodes: DataFrame, edges: DataFrame,
      seeds: DataFrame, rounds: Int): DataFrame = {
    val ds = distSigma(edges, seeds, rounds)
    val h = ds.where(col("dist") > 0)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_reached"),
        sum(expr("1000000 div dist")).as("h_u"))
    nodes.select(col("id"))
      .join(h, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_reached"), lit(0L)).as("n_reached"),
        (expr("(coalesce(h_u, 0) + 50) div 100").cast("double") /
          lit(1e4)).cast("float").as("harmonic"))
  }
}
