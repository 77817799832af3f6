package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms as DataFrame jobs. Companion to the
  * dedup-cluster operators ([[Dedup.connectedComponents]] /
  * [[Dedup.connectedComponentsStar]]) — PageRank here is the canonical
  * "loop over joins" shape: each iteration is one join + one keyed
  * aggregate, the per-iteration result is localCheckpoint'd to truncate
  * lineage (the loop would otherwise compound the plan), and rank values
  * are QUANTIZED to the binary grid floor(x·2⁴⁰)/2⁴⁰ per iteration —
  * power-of-two scaling is exact in IEEE doubles, so restarts and the
  * DuckDB oracle land on identical ranks (same trick as
  * [[Similarity.kmeansAssign]]'s centroids).
  *
  * RESIDUAL RISK (by design, not a bug): the grid is applied AFTER an
  * order-dependent float reduction (`sum(r/deg)`), so the guarantee is
  * "quantization absorbs reduction-order noise UNLESS the true value
  * sits within an ulp of a grid boundary" — probabilistic (≈2⁻¹² per
  * value for ~2⁻⁵² relative noise on a 2⁻⁴⁰ grid), not strict. Strict
  * bit-stability would require fixed-point integer summands (exact
  * associative addition); the double-grid form is kept because it
  * composes with plain `sum`/`avg` and the oracle replays the identical
  * reduction at the checked scale factors, where equality is a verified
  * fact rather than an assumption.
  */
object Graph {

  private val GridScale = 1099511627776.0 // 2^40

  private def quant(c: org.apache.spark.sql.Column) =
    floor(c * GridScale) / GridScale

  /** Exact triangle counting over an undirected edge list — the classic
    * distributed formulation (Suri/Vassilvitskii "node-iterator" in join
    * form): canonicalize every edge to (lo, hi), then count paths
    * lo→mid→hi that close with a (lo, hi) edge. Orienting by node id
    * means each triangle is counted EXACTLY once and the join fan-out is
    * bounded by high-id-degree, the standard skew cap. Per-node counts
    * follow by exploding each triangle's three corners.
    *
    * Output: (node, n_triangles) for nodes on ≥1 triangle.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e = edges
      .select(
        least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
    val wedges = e
      .select(col("lo").as("a"), col("hi").as("b"))
      .join(e.select(col("lo").as("b"), col("hi").as("c")), "b")
    val triangles = wedges
      .join(e.select(col("lo").as("a"), col("hi").as("c")), Seq("a", "c"))
    triangles
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** PageRank with damping `d` over `edges(src, dst)` (deduplicated
    * internally), nodes from `nodes(id)`. No dangling-mass
    * redistribution: a sink node's rank leaks, the standard simplified
    * formulation — documented so the oracle can replay it. Output:
    * (id, r) after `iters` synchronous iterations from the uniform
    * distribution.
    *
    * Scale shape: per iteration, one shuffle keyed on src (contribution
    * join) and one on dst (incoming sum); the rank/degree relations ride
    * along their key, so a 10⁹-edge graph runs iters × 2 exchanges with
    * no driver-side data beyond the node count.
    */
  def pageRank(
      nodes: DataFrame,
      edges: DataFrame,
      iters: Int = 3,
      damping: Double = 0.85
  ): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg")).localCheckpoint()
    val n = nodes.count().toDouble
    require(n > 0, "pageRank needs a non-empty node set")
    val base = (1.0 - damping) / n
    var ranks = nodes
      .select(col("id"), quant(lit(1.0) / n).as("r"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val incoming = e
        .join(ranks, e("src") === ranks("id"))
        .join(outdeg, "src")
        .select(col("dst"), (col("r") / col("deg")).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(incoming, nodes("id") === incoming("dst"), "left")
        .select(
          col("id"),
          quant(lit(base) + lit(damping) * coalesce(col("s"), lit(0.0))).as("r"))
        .localCheckpoint()
    }
    ranks
  }

  /** Synchronous label-propagation community detection (Raghavan et al.
    * '07), made DETERMINISTIC: every node starts labeled with itself;
    * each round every node adopts the most frequent label among its
    * neighbors, ties broken by smallest label — an argmax the engine
    * expresses as `row_number` over (count DESC, label ASC), so replays
    * are exact and the oracle can unroll the rounds. Per round: one join
    * keyed on the neighbor and one grouped argmax — 2 exchanges per
    * iteration regardless of graph size, same scale shape as
    * [[pageRank]].
    *
    * Output: (label, size, min_node) per surviving community.
    */
  def labelPropagation(edges: DataFrame, iters: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(iters >= 1, "iters must be >= 1")
    val adj = edges
      .select(col("src").as("node"), col("dst").as("nbr"))
      .union(edges.select(col("dst").as("node"), col("src").as("nbr")))
      .filter(col("node") =!= col("nbr"))
      .distinct()
      .localCheckpoint()
    var labels = adj.select(col("node")).distinct().withColumn("label", col("node"))
    val argmax = Window
      .partitionBy(col("node"))
      .orderBy(col("c").desc, col("label").asc)
    for (_ <- 1 to iters) {
      labels = adj
        .join(labels.select(col("node").as("nbr"), col("label")), "nbr")
        .groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(argmax))
        .filter(col("rn") === 1)
        .select(col("node"), col("label"))
        .localCheckpoint()
    }
    labels
      .groupBy(col("label"))
      .agg(count(lit(1)).as("size"), min(col("node")).as("min_node"))
  }

  /** Neighborhood Jaccard similarity — the classic link-prediction /
    * entity-consolidation signal: for node pairs sharing ≥1 neighbor,
    * |N(a)∩N(b)| / |N(a)∪N(b)|. Common neighbors come from the wedge
    * self-join (pairs oriented a<b so each pair scores once); union size
    * is deg(a)+deg(b)−common — never materialized. At 100 TB the wedge
    * join's fan-out is the square of the max degree: cap or sample
    * super-node adjacency first (same posture as [[triangleCounts]]'s
    * orientation bound).
    *
    * Output: top-k (node_a, node_b, common, jaccard) by jaccard desc.
    */
  /** HITS hubs & authorities (Kleinberg '99) over a directed edge list —
    * the mutually-recursive counterpart to [[pageRank]]: an authority is
    * good because good hubs point at it, a hub is good because it points
    * at good authorities. Each iteration is two join+agg passes
    * (a ← Σ h over in-edges, h ← Σ a over out-edges); scores are
    * MAX-normalized — max is order-insensitive and exact where a
    * sum-normalizer would re-introduce reduction-order noise — and
    * grid-quantized per aggregate like pageRank (same residual-risk
    * posture). Fixed iteration count for oracle parity.
    *
    * Output: top-`topK` (role='auth'|'hub', id, score) per role.
    */
  def hits(edges: DataFrame, iters: Int = 2, topK: Int = 20): DataFrame = {
    require(iters >= 1 && topK >= 1, "need iters >= 1, topK >= 1")
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    var hub = e.select(col("src").as("id")).distinct().withColumn("h", lit(1.0))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      val a0 = e
        .join(hub.select(col("id").as("src"), col("h")), Seq("src"))
        .groupBy(col("dst"))
        .agg(quant(sum(col("h"))).as("a0"))
      val am = a0.agg(max(col("a0")).as("am"))
      auth = a0.crossJoin(broadcast(am))
        .select(col("dst").as("id"), quant(col("a0") / col("am")).as("a"))
        .localCheckpoint()
      val h0 = e
        .join(auth.select(col("id").as("dst"), col("a")), Seq("dst"))
        .groupBy(col("src"))
        .agg(quant(sum(col("a"))).as("h0"))
      val hm = h0.agg(max(col("h0")).as("hm"))
      hub = h0.crossJoin(broadcast(hm))
        .select(col("src").as("id"), quant(col("h0") / col("hm")).as("h"))
        .localCheckpoint()
    }
    val topA = auth
      .orderBy(col("a").desc, col("id").asc).limit(topK)
      .select(lit("auth").as("role"), col("id"), round(col("a"), 6).as("score"))
    val topH = hub
      .orderBy(col("h").desc, col("id").asc).limit(topK)
      .select(lit("hub").as("role"), col("id"), round(col("h"), 6).as("score"))
    topA.unionAll(topH)
  }

  /** k-CORE decomposition by synchronous peeling: each round drops
    * every node of degree < k and the edges touching it, `rounds`
    * times. A graph whose k-core peeling converges within `rounds`
    * (every spec/oracle graph here) ends at the true k-core: the
    * maximal subgraph where every node keeps ≥ k neighbors — the
    * standard "dense kernel" extraction for community seeds and
    * spam/bot rings. A production run replaces the fixed count with a
    * convergence check (`while (dropped > 0)`); the count is fixed
    * here so the SQL oracle can unroll the identical rounds.
    *
    * Scale shape per round: one degree aggregate + two semi-joins, all
    * keyed on node — 2 exchanges, same as [[pageRank]]; per-round
    * localCheckpoint truncates the compounding plan.
    *
    * Output: (node, core_deg) for nodes surviving all rounds, with
    * their degree in the surviving subgraph.
    */
  def kCore(edges: DataFrame, k: Int = 3, rounds: Int = 4): DataFrame = {
    require(k >= 1 && rounds >= 1, "need k >= 1, rounds >= 1")
    var e = edges
      .select(least(col("src"), col("dst")).as("lo"), greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
      .localCheckpoint()
    def degrees(ed: DataFrame): DataFrame = ed
      .select(col("lo").as("n")).unionAll(ed.select(col("hi").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    for (_ <- 1 to rounds) {
      val keep = degrees(e).filter(col("d") >= k).select(col("n"))
      e = e
        .join(keep.select(col("n").as("lo")), Seq("lo"), "left_semi")
        .join(keep.select(col("n").as("hi")), Seq("hi"), "left_semi")
        .localCheckpoint()
    }
    degrees(e).select(col("n").as("node"), col("d").as("core_deg"))
  }

  def nodeJaccard(edges: DataFrame, topK: Int = 20): DataFrame = {
    val adj = edges
      .select(col("src").as("node"), col("dst").as("nbr"))
      .union(edges.select(col("dst").as("node"), col("src").as("nbr")))
      .filter(col("node") =!= col("nbr"))
      .distinct()
      .localCheckpoint()
    val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val common = adj
      .select(col("node").as("node_a"), col("nbr"))
      .join(adj.select(col("node").as("node_b"), col("nbr")), "nbr")
      .filter(col("node_a") < col("node_b"))
      .groupBy(col("node_a"), col("node_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(deg.select(col("node").as("node_a"), col("deg").as("deg_a")), "node_a")
      .join(deg.select(col("node").as("node_b"), col("deg").as("deg_b")), "node_b")
      .select(
        col("node_a"),
        col("node_b"),
        col("common"),
        round(col("common") / (col("deg_a") + col("deg_b") - col("common")), 6)
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("node_a").asc, col("node_b").asc)
      .limit(topK)
  }

  /** Unrolled BFS ball growth from the lexicographically smallest node:
    * how many nodes first become reachable at each hop ≤ `hops` — the
    * reachability profile (small-world check, component probe) of the
    * graph. Each level is ONE neighbor equi-join + one anti-join
    * against the visited set — the frontier/visited relations never
    * leave the engine, and a fixed hop count keeps the loop
    * oracle-unrollable (the kCore posture).
    *
    * Output: (hop, n_nodes) for hop = 0..`hops`, hops with an empty
    * frontier omitted.
    */
  def bfsLevels(edges: DataFrame, hops: Int = 3): DataFrame = {
    require(hops >= 1, "hops must be >= 1")
    val stubs = edges
      .select(col("src").as("u"), col("dst").as("v"))
      .union(edges.select(col("dst").as("u"), col("src").as("v")))
      .localCheckpoint()
    val seed = stubs.agg(min(col("u")).as("node"))
    var frontier = seed.select(col("node")).localCheckpoint()
    var visited = frontier
    var out = frontier.select(lit(0).as("hop"), col("node"))
    for (h <- 1 to hops) {
      val next = stubs
        .join(frontier.select(col("node").as("u")), "u")
        .select(col("v").as("node"))
        .distinct()
        .join(visited, Seq("node"), "left_anti")
        .localCheckpoint()
      out = out.union(next.select(lit(h).as("hop"), col("node")))
      visited = visited.union(next).localCheckpoint()
      frontier = next
    }
    out.groupBy(col("hop")).agg(count(lit(1)).as("n_nodes"))
  }

  /** Degree assortativity (Newman '02): the Pearson correlation of
    * endpoint degrees over the undirected edge list — "do hubs attach to
    * hubs?" in one number. Each undirected edge contributes both
    * orientations (the standard symmetrization), so with n = 2m stubs:
    *
    *   r = (n·Σd_a·d_b − Σd_a·Σd_b) / √((n·Σd_a² − (Σd_a)²)·(n·Σd_b² − (Σd_b)²))
    *
    * Degrees are exact longs and every Σ is an integer sum, so the three
    * difference terms are exact; one √ and one divide in double, rounded
    * to 6 — order-insensitive at any partitioning (the [[Timeseries.linregHourlyTrend]]
    * posture). Shape: degree agg + two broadcast-sized joins back onto
    * the edge list; no windows, no driver loops.
    *
    * Output: one row (n_edges, assortativity); NULL for a
    * degree-regular graph (zero variance).
    */
  def assortativity(edges: DataFrame): DataFrame = {
    val stubs = edges
      .select(col("src").as("a"), col("dst").as("b"))
      .union(edges.select(col("dst").as("a"), col("src").as("b")))
      .localCheckpoint()
    val deg = stubs.groupBy(col("a")).agg(count(lit(1)).as("deg"))
    stubs
      .join(deg.select(col("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("a").as("b"), col("deg").as("db")), Seq("b"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("da")).as("sa"),
        sum(col("db")).as("sb"),
        sum(col("da") * col("da")).as("saa"),
        sum(col("db") * col("db")).as("sbb"),
        sum(col("da") * col("db")).as("sab"))
      .select(
        (col("n") / 2).cast("long").as("n_edges"),
        when(
          (col("n") * col("saa") - col("sa") * col("sa")) =!= 0 &&
            (col("n") * col("sbb") - col("sb") * col("sb")) =!= 0,
          round(
            (col("n") * col("sab") - col("sa") * col("sb")).cast("double") /
              sqrt(
                (col("n") * col("saa") - col("sa") * col("sa")).cast("double") *
                  (col("n") * col("sbb") - col("sb") * col("sb")).cast("double")),
            6)).as("assortativity"))
  }

  /** Single-source shortest paths by BOUNDED Bellman–Ford relaxation:
    * `rounds` synchronous rounds, so the result is EXACTLY "shortest
    * distance using at most `rounds` edges" — a well-defined operator
    * contract on its own (set `rounds` ≥ graph diameter for the full
    * fixpoint; negative cycles cannot loop because the horizon is
    * bounded). Weights are LONGS, so every relaxation is exact integer
    * arithmetic — no quantization grid needed, unlike [[pageRank]] — and
    * the oracle unrolls the identical rounds as chained CTEs.
    *
    * Shape per round: one hash join frontier→edges plus one keyed min —
    * 2 exchanges per round regardless of graph size, lineage truncated
    * per round with localCheckpoint. Unreached nodes carry NULL (min
    * ignores NULLs on both engines), so no ∞ sentinel enters arithmetic.
    *
    * Output: (id, dist) for every node, dist NULL when unreached within
    * the horizon.
    */
  def ssspBellmanFord(
      nodes: DataFrame,
      edges: DataFrame,
      source: Long,
      rounds: Int
  ): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .localCheckpoint()
    var dist = nodes
      .select(
        col("id"),
        when(col("id") === source, lit(0L)).as("d"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val relaxed = dist
        .filter(col("d").isNotNull)
        .join(e, dist("id") === e("src"))
        .select(e("dst").as("id"), (col("d") + col("w")).as("d"))
      dist = dist
        .select(col("id"), col("d"))
        .union(relaxed)
        .groupBy(col("id"))
        .agg(min(col("d")).as("d"))
        .localCheckpoint()
    }
    dist.select(col("id"), col("d").as("dist"))
  }

  /** PERSONALIZED PageRank: teleportation lands only on the seed set
    * (uniformly), so ranks measure proximity TO the seeds rather than
    * global centrality — the "related items from this starting set"
    * primitive. Same iteration shape, quantization grid, and
    * per-round lineage truncation as [[pageRank]]; the only change is
    * the teleport vector: (1−d)·1/|S| on seeds, 0 elsewhere.
    *
    * Output: (id, r) for every node.
    */
  def personalizedPageRank(
      nodes: DataFrame,
      edges: DataFrame,
      seeds: DataFrame,
      iters: Int = 3,
      damping: Double = 0.85
  ): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg")).localCheckpoint()
    val nSeeds = seeds.count().toDouble
    require(nSeeds > 0, "personalizedPageRank needs a non-empty seed set")
    val seedMark = seeds.select(col("id"), lit(1).as("__seed"))
    val base = nodes
      .join(seedMark, Seq("id"), "left")
      .select(
        col("id"),
        when(col("__seed").isNotNull, lit(1.0) / nSeeds).otherwise(lit(0.0)).as("tp"))
      .localCheckpoint()
    var ranks = base.select(col("id"), quant(col("tp")).as("r")).localCheckpoint()
    for (_ <- 1 to iters) {
      val incoming = e
        .join(ranks, e("src") === ranks("id"))
        .join(outdeg, "src")
        .select(col("dst"), (col("r") / col("deg")).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
      ranks = base
        .join(incoming, base("id") === incoming("dst"), "left")
        .select(
          col("id"),
          quant(
            (lit(1.0) - damping) * col("tp") +
              lit(damping) * coalesce(col("s"), lit(0.0))).as("r"))
        .localCheckpoint()
    }
    ranks
  }

  /** INCREMENTAL connected-components maintenance over lake deltas: given
    * a valid components assignment `baseAssign(doc_id, cluster_rep)` for a
    * base edge set (reps = per-component minimum ids, the invariant both
    * [[Dedup.connectedComponents]] and [[Dedup.connectedComponentsStar]]
    * establish) and a batch of NEW edges `deltaEdges(doc_a, doc_b)`,
    * produce the assignment for base ∪ delta WITHOUT re-contracting the
    * base graph. Delta edges are mapped into ROOT space (each endpoint
    * replaced by its base root; an endpoint the base never saw roots to
    * itself); the root graph — bounded by |delta|, not |E| — is contracted
    * with the O(log n) star algorithm; base assignments are then remapped
    * through the delta-bounded root relabeling (a join AQE broadcasts when
    * the delta is small, the common nightly-ingest case).
    *
    * Correctness: new edges can only MERGE whole base components
    * (connectivity is closed under union), and two components merge iff
    * their roots connect in the quotient graph — exactly what the star
    * contraction over root-space edges computes. Because base reps are
    * component minima, the contracted rep of a merged class is the global
    * minimum over all merged members, so the output is bit-identical to a
    * full recompute over base ∪ delta (the q608 oracle checks this).
    *
    * Scale: a 100 TB corpus's nightly dedup re-clusters only what the
    * day's documents touched — O(|delta| log |delta|) shuffled rows plus
    * one keyed remap join over the assignment table, instead of
    * O(|E| log |V|) over the whole corpus graph.
    */
  def incrementalConnectedComponents(
      baseAssign: DataFrame,
      deltaEdges: DataFrame
  ): DataFrame = {
    // the assignment feeds three consumers (two root lookups + the final
    // remap); output-sized relation → localCheckpoint per SURVEY §7.4
    val assign = baseAssign.select(col("doc_id"), col("cluster_rep")).localCheckpoint()
    val delta = deltaEdges.select(col("doc_a"), col("doc_b")).localCheckpoint()
    val rootA = assign.select(col("doc_id").as("doc_a"), col("cluster_rep").as("root_a"))
    val rootB = assign.select(col("doc_id").as("doc_b"), col("cluster_rep").as("root_b"))
    val rootEdges = delta
      .join(rootA, Seq("doc_a"), "left")
      .join(rootB, Seq("doc_b"), "left")
      .select(
        coalesce(col("root_a"), col("doc_a")).as("doc_a"),
        coalesce(col("root_b"), col("doc_b")).as("doc_b"))
      .filter(col("doc_a") =!= col("doc_b"))
      .distinct()
    val remap = Dedup
      .connectedComponentsStar(rootEdges)
      .select(col("doc_id").as("old_rep"), col("cluster_rep").as("new_rep"))
    // vertices the delta introduces (absent from base) root to themselves
    // before remapping, so an all-new component gets its own minimum
    val newVertices = delta
      .select(col("doc_a").as("doc_id"))
      .union(delta.select(col("doc_b").as("doc_id")))
      .distinct()
      .join(assign.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster_rep"))
    assign
      .union(newVertices)
      .join(remap, col("cluster_rep") === col("old_rep"), "left")
      .select(
        col("doc_id"),
        coalesce(col("new_rep"), col("cluster_rep")).as("cluster_rep"))
  }
}
