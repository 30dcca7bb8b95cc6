package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Materialize.{MaterializeOps, MaterializeFreshOps}

/** Iterative graph analytics. Connected components (pointer-jumping) lives
  * with the dedup pipeline in [[Dedup.connectedComponents]]; this object
  * holds the rank-propagation family. */
object Graph {

  /** PageRank with a FIXED iteration count — deterministic by construction
    * (no convergence test, so every engine that replays the same iterations
    * gets the same ranks; the DuckDB oracle unrolls them as CTEs).
    *
    * Semantics: `pr_{t+1}(v) = (1-d)/N + d · Σ_{u→v} pr_t(u)/outdeg(u)`,
    * dangling mass NOT redistributed (documented leak — keeps each
    * iteration one join + one aggregate, and the oracle exact).
    *
    * Scale shape: `edges` is shuffled on `src` ONCE into `bySrc` and every
    * iteration's contribution join reuses that partitioning (outdeg rides
    * the edge rows, so the join is rank-table-sized, not edge-table-sized
    * on the build side). Each iteration is one shuffle join + one dst-keyed
    * aggregate — the minimum for rank propagation without a vertex-cut
    * abstraction. Rank and vertex tables stay vertex-cardinality
    * throughout; nothing is collected to the driver. The loop-invariant
    * vertex/edge tables are localCheckpoint'ed once so the plan does not
    * re-derive them per iteration; the rank chain itself still grows one
    * join+agg per iteration — for iteration counts beyond ~20, checkpoint
    * `pr` every k iterations too. */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 5,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(damping > 0.0 && damping < 1.0, s"damping in (0,1): $damping")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    // the loop-invariant tables are materialized ONCE (executor-local
    // checkpoint, distributed): without this each iteration re-derives the
    // whole edge subtree and the final plan grows ~iters-fold (measured
    // 2.7k plan lines / ~57 exchanges for 5 iterations un-checkpointed —
    // the edge scan+distinct ran 11×)
    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .materialize
    val nRow = verts.agg(count(lit(1)).cast("double").as("n")).materialize
    // outdeg rides each edge row so the per-iteration join needs only the
    // current rank table on the other side
    val bySrc = e
      .withColumn("odeg",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("src")))
          .cast("double"))
      .materialize
    var pr = verts.crossJoin(broadcast(nRow))
      .select(col("id"), (lit(1.0) / col("n")).as("pr"))
    (1 to iters).foreach { _ =>
      val mass = bySrc.join(pr.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("pr") / col("odeg")).as("mass"))
      pr = verts.crossJoin(broadcast(nRow))
        .join(mass, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) / col("n") +
            lit(damping) * coalesce(col("mass"), lit(0.0))).as("pr"))
    }
    pr.select(col("id"), round(col("pr"), 8).as("pagerank"))
  }

  /** Katz centrality — the damped path-count sibling of [[pageRank]]
    * (no out-degree normalization, so prestige flows along raw edges):
    * x_{t+1}(v) = 1 + α·Σ_{u→v} x_t(u), fixed iterations from x₀ = 1.
    * Ranks live as MICRO-LONGS: the per-target sum of incoming micro
    * scores is an exact integer, the single α·sum multiply-and-round
    * per vertex per round is IEEE-deterministic — so every iteration
    * is bit-identical across engines and the oracle unrolls rounds as
    * CTEs exactly like pageRank's. α must satisfy α < 1/λ_max for
    * convergence; with fixed small iters the truncated sum is
    * well-defined for any α, which is the contract here (document the
    * α choice at the call site).
    *
    * Overflow bound: micro ranks grow roughly as (α·d_max)^iters·10⁶,
    * so the per-round INCOMING SUM accumulates in decimal(38,0) on
    * both engines (a bigint sum is the first overflow point on a
    * high-degree graph — Spark non-ANSI would wrap where DuckDB
    * raises, breaking the bit-identical contract). The per-vertex
    * micro rank itself must still fit int64: callers need
    * (α·d_max)^iters·10⁶ < 2⁶³ (e.g. α·d_max ≤ 100 is safe for ≤ 6
    * rounds); beyond that, lower α or iters.
    *
    * Plan per round: one edge-keyed join + one hash aggregate; edges
    * and vertices materialized once. */
  def katzCentrality(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 4, alpha: Double = 0.05): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(alpha > 0.0 && alpha < 1.0, s"alpha in (0,1): $alpha")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().materialize
    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .materialize
    var x = verts.withColumn("xm", lit(1000000L))
    (1 to iters).foreach { _ =>
      val in = e.join(x.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("xm").cast("decimal(38,0)")).as("s"))
      x = verts.join(in, Seq("id"), "left")
        .select(col("id"), expr(katzStepSql(alpha)).as("xm"))
        .materialize
    }
    x.select(col("id"),
      expr("round(CAST(xm AS DOUBLE) / 1e6, 6)").as("katz"))
  }

  /** Next micro-rank over the nullable incoming sum `s` — the α
    * multiply runs in DOUBLE explicitly (a bare 0.05 literal types as
    * DECIMAL in both engines, with engine-specific arithmetic — the
    * dtype-canary lesson). Shared with the oracle. */
  def katzStepSql(alpha: Double): String =
    s"1000000 + CAST(round(CAST($alpha AS DOUBLE) * " +
      "CAST(coalesce(s, 0) AS DOUBLE), 0) AS BIGINT)"

  /** Personalized PageRank — random walk WITH RESTART from a seed set:
    * x_{t+1}(v) = (1−α)·r(v) + α·Σ_{u→v} x_t(u)/outdeg(u), where r is
    * uniform over the seeds and x₀ = r. The "how relevant is every
    * vertex TO THESE seeds" primitive behind related-item recs and
    * local community scoring; [[pageRank]] is the seed-free global
    * sibling, [[katzCentrality]] the un-normalized one.
    *
    * Determinism discipline (the katz recipe): mass lives as
    * MICRO-LONGS; the per-edge contribution is the truncating integer
    * division xm div odeg (both operands non-negative, so Spark `div`
    * and DuckDB `//` agree), the per-target sum accumulates in
    * decimal(38,0), and the single α multiply-and-round per vertex per
    * round is IEEE-deterministic — every iteration is bit-identical
    * across engines and the oracle unrolls rounds as MATERIALIZED
    * CTEs. The div truncation leaks ≤ odeg−1 micro per vertex per
    * round (documented quantization, not drift). Dangling vertices
    * absorb their mass (standard simplified PPR).
    *
    * Plan per round: one src-keyed join against the once-materialized
    * odeg-carrying edges + one dst-keyed aggregate + the vertex-sized
    * base join — rank tables stay vertex-cardinality throughout. */
  def personalizedPageRank(
      edges: DataFrame, seeds: DataFrame,
      srcCol: String = "src", dstCol: String = "dst",
      idCol: String = "id",
      iters: Int = 4, alpha: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(alpha > 0.0 && alpha < 1.0, s"alpha in (0,1): $alpha")
    import org.apache.spark.sql.expressions.Window
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().materialize
    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .materialize
    val sd = seeds.select(col(idCol).as("id")).distinct()
      .join(verts, Seq("id"), "left_semi")
      .materialize
    // Fail-fast guards on the seed count (one count over the already-
    // materialized seed set — no extra scan of edges or seeds):
    //  - zero surviving seeds (typo'd ids, empty frame) would make
    //    every restart term 0 and the walk would silently return
    //    all-zero scores — a plausible-looking, meaningless result;
    //  - more than 10^6 seeds quantizes the per-seed micro restart
    //    (1000000 div ns) to 0 with the same silent-zero outcome (the
    //    textRank caveat, now loud). Shard the graph upstream (by
    //    language/source/partition key), run the walk per shard, and
    //    union — restart mass is per-shard, so sharding is exact for
    //    disjoint vertex sets.
    val nsCount = sd.count()
    require(nsCount > 0,
      "personalizedPageRank: no seed id intersects the edge vertex " +
        "set — every restart term would be 0 and all scores would be " +
        "silently 0. Check the seed ids (and idCol) against src/dst.")
    require(nsCount <= 1000000L,
      s"personalizedPageRank: $nsCount seeds quantize the per-seed " +
        "micro restart (1000000 div ns) to 0 — all scores would be " +
        "silently 0. Shard the graph (by language/source) and run the " +
        "walk per shard; restart mass is per-shard, so the union of " +
        "per-shard walks is exact for disjoint vertex sets.")
    val ns = broadcast(sd.agg(count(lit(1)).cast("long").as("__ns")))
    // per-seed restart micro-mass: full for x0, (1-α)-scaled per round
    val base = verts
      .join(sd.withColumn("__seed", lit(1L)), Seq("id"), "left")
      .crossJoin(ns)
      .select(col("id"),
        expr("CASE WHEN __seed = 1 THEN 1000000 div __ns " +
          "ELSE CAST(0 AS BIGINT) END").as("r0"),
        expr(s"CASE WHEN __seed = 1 THEN CAST(round(" +
          s"CAST(1 - CAST($alpha AS DOUBLE) AS DOUBLE) * " +
          "(1000000 div __ns), 0) AS BIGINT) " +
          "ELSE CAST(0 AS BIGINT) END").as("base"))
      .materialize
    val bySrc = e.withColumn("odeg",
      count(lit(1)).over(Window.partitionBy(col("src"))).cast("long"))
      .materialize
    var x = base.select(col("id"), col("r0").as("xm"))
    (1 to iters).foreach { _ =>
      val in = bySrc
        .join(x.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"), expr("xm div odeg").as("c"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("c").cast("decimal(38,0)")).as("s"))
      x = base.join(in, Seq("id"), "left")
        .select(col("id"), expr(pprStepSql(alpha)).as("xm"))
        .materialize
    }
    x.select(col("id"),
      expr("round(CAST(xm AS DOUBLE) / 1e6, 6)").as("ppr"))
  }

  /** Next PPR micro-mass over (base, nullable incoming sum s) — the α
    * multiply runs in explicit DOUBLE (the dtype-canary lesson).
    * Shared with the oracle. */
  def pprStepSql(alpha: Double): String =
    s"base + CAST(round(CAST($alpha AS DOUBLE) * " +
      "CAST(coalesce(s, 0) AS DOUBLE), 0) AS BIGINT)"

  /** Bounded-depth BFS: minimum hop count from any `sources` row to every
    * vertex reachable within `maxHops` (unreached vertices are absent).
    * Each level is one frontier-edge join plus one min-aggregate, both
    * keyed on the vertex id — the standard distributed BFS; the frontier
    * filter (`hops = level-1`) keeps settled vertices out of the
    * expansion, so per-level work is proportional to the frontier's edge
    * fan-out, not the visited set. Edges are materialized once
    * (localCheckpoint) since every level joins them. Fixed small depth →
    * the oracle unrolls levels as CTEs, like [[pageRank]]'s. */
  def bfsHops(
      edges: DataFrame,
      sources: DataFrame,
      maxHops: Int,
      srcCol: String = "src",
      dstCol: String = "dst",
      idCol: String = "id"): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1: $maxHops")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
      .materialize
    bfsHopsOn(e, sources, maxHops, idCol)
  }

  /** [[bfsHops]] over an ALREADY canonical+materialized bidirectional
    * edge frame (columns src/dst) — callers running several sweeps on
    * one graph ([[diameterSweep]]) skip re-distincting and
    * re-checkpointing the edge set per sweep. */
  private def bfsHopsOn(
      e: DataFrame, sources: DataFrame, maxHops: Int,
      idCol: String = "id"): DataFrame = {
    var dist = sources.select(col(idCol).as("id")).distinct()
      .withColumn("hops", lit(0L))
    (1 to maxHops).foreach { h =>
      val next = dist.filter(col("hops") === (h - 1).toLong)
        .join(e, col("id") === col("src"))
        .select(col("dst").as("id"), lit(h.toLong).as("hops"))
      dist = dist.unionByName(next)
        .groupBy(col("id")).agg(min(col("hops")).as("hops"))
        // each level references the previous dist TWICE (frontier filter
        // + union); without a per-level cut the final single plan
        // re-evaluates level 1 2^maxHops times (fine at 3 hops, fatal at
        // 8 — the diameter sweep's cost was this recompute, not BFS)
        .materializeFresh
    }
    dist
  }

  /** Fixed-round weighted single-source shortest paths (Bellman-Ford
    * relaxation): per round, every frontier distance relaxes across every
    * outgoing edge and vertices keep their minimum. `rounds` bounds path
    * LENGTH (hops), so the result is deterministic whether or not the
    * graph has converged — the same fixed-iteration contract as
    * [[pagerank]], and like it the oracle unrolls the rounds as CTEs.
    * Weights must be non-negative BIGINTs (exact min arithmetic; no float
    * accumulation).
    *
    * Scale shape: per round one (id = src) shuffle join frontier×edges +
    * one min aggregate — linear in edges per round, no driver state; the
    * edge set is localCheckpointed once so the loop doesn't re-derive its
    * lineage each round (the pagerank lesson, `Graph.scala:40-67`). Unlike
    * [[bfsHops]] the full dist table relaxes each round (a shorter-hop
    * path can still lower a longer-hop distance), so per-round cost is
    * dist⋈edges, not frontier-only. */
  def shortestPaths(
      edges: DataFrame,
      sources: DataFrame,
      rounds: Int,
      srcCol: String = "src",
      dstCol: String = "dst",
      weightCol: String = "w",
      idCol: String = "id"): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    // checkpoint the edge set ALREADY HASH-PARTITIONED ON src: the
    // per-round join then shuffles only the vertex-cardinality dist side,
    // not the edge table — without this the 100× smoke re-shuffled the
    // full edge set every round and the op went superlinear (7.6× at 5×
    // data; the join had also silently flipped from broadcast to SMJ as
    // dist outgrew the broadcast threshold)
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("long").as("w"))
      .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w"))
      .repartition(col("src"))
      .materialize
    var dist = sources.select(col(idCol).as("id")).distinct()
      .withColumn("d", lit(0L))
    (1 to rounds).foreach { _ =>
      val relaxed = dist
        .join(e, col("id") === col("src"))
        .select(col("dst").as("id"), (col("d") + col("w")).as("d"))
      dist = dist.unionByName(relaxed)
        .groupBy(col("id")).agg(min(col("d")).as("d"))
        .materialize
    }
    dist
  }

  /** Per-vertex triangle participation counts over an UNDIRECTED graph.
    *
    * Input rows are treated as undirected edges; self-loops and duplicate /
    * reversed duplicates are dropped. Output: `(id, n_tri)` for every
    * vertex on at least one triangle — each triangle contributes 1 to each
    * of its three corners.
    *
    * Scale shape — the degree-ordered "compact-forward" algorithm: every
    * edge is oriented from its lower-(degree, id) endpoint to the higher,
    * which turns the undirected graph into a DAG whose max out-degree is
    * O(√m). Triangles are then listed by adjacency INTERSECTION per
    * oriented edge ([[triangleEnum]] — out(a) ∩ out(b), arrays bounded
    * by the DAG out-degree), so total work is O(m^1.5) with no
    * wedge-candidate shuffle, instead of the Σ deg(u)² blow-up a naive
    * wedge join suffers on skewed (power-law) graphs — a hub's full
    * neighborhood never rides a join. All steps are plain shuffle
    * joins/aggregates plus map-side intersections; nothing touches the
    * driver. The triangle COUNT is orientation-invariant, so any engine
    * that enumerates id-ordered triangles (the DuckDB oracle does) gets
    * identical results.
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String,
      maxDeg: Long = Long.MaxValue): DataFrame =
    triangleCountsCanonical(canonicalUndirected(edges, srcCol, dstCol),
      maxDeg)

  /** Canonical undirected edge set: (lo, hi), lo < hi, self-loops and
    * duplicate/reversed-duplicate edges dropped. NOT materialized —
    * callers that consume it from several kernels localCheckpoint it
    * once themselves ([[nodeFeatures]]). */
  private[graft] def canonicalUndirected(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges
      .select(least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()

  /** [[triangleCounts]] over a pre-canonicalized `(lo, hi)` edge frame —
    * the shared kernel entry for callers that already derived the
    * canonical set ([[nodeFeatures]]), so one query never symmetrizes
    * the same edge list twice.
    *
    * `maxDeg` is the 100×-scale valve for power-law graphs: total wedge
    * work is O(m^1.5) via the degree orientation, but m itself explodes
    * when hubs are present. With a cap, every edge INCIDENT to a vertex
    * of degree > maxDeg is excluded first, and the result is the EXACT
    * triangle count of the hub-removed subgraph — a documented,
    * well-defined degradation (triangles through a hub are not counted),
    * not a sampled approximation. Default = no cap = exact kernel. */
  private[graft] def triangleCountsCanonical(
      cand: DataFrame, maxDeg: Long = Long.MaxValue): DataFrame =
    triangleEnum(cand, maxDeg)
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))

  /** Degree-oriented triangle ENUMERATION over a canonical `(lo, hi)`
    * frame: one row per distinct triangle `(a, b, c)`, DAG-ordered
    * (a ≺ b ≺ c under the (degree, id) orientation — consumers
    * canonicalize pairs themselves, so the within-triangle order is
    * contract-free). Shared by the corner-count kernel
    * ([[triangleCountsCanonical]]) and the edge-support peel
    * ([[kTruss]]).
    *
    * Adjacency-intersection kernel (not a wedge self-join): per
    * oriented edge a → b, every c ∈ out(a) ∩ out(b) closes a triangle.
    * The old wedge self-join shuffled Σ C(outdeg, 2) candidate rows
    * (~30× the edge count on the co-purchase graph) and re-shuffled
    * them through a closing join; here two edge-keyed joins attach the
    * out-adjacency arrays (each bounded by the DAG out-degree, O(√m))
    * and the intersection runs map-side — measured 7.7 s → ~2 s at
    * sf0.1 on the full co-purchase graph. */
  private[graft] def triangleEnum(
      cand: DataFrame, maxDeg: Long = Long.MaxValue): DataFrame = {
    // hub cap: drop edges touching any vertex above maxDeg (exact
    // triangles of the induced subgraph); orientation reuses the
    // ORIGINAL degrees already aggregated for the cap — any consistent
    // total order keeps the kernel correct, and the reuse saves one
    // full edge pass
    val (und, degOpt) =
      if (maxDeg == Long.MaxValue) (cand, None)
      else {
        val degAll = cand.select(col("lo").as("id"))
          .unionByName(cand.select(col("hi").as("id")))
          .groupBy(col("id")).agg(count(lit(1)).as("deg"))
          .materialize
        val keep = degAll.filter(col("deg") <= maxDeg).select(col("id"))
        (cand
          .join(keep.select(col("id").as("lo")), Seq("lo"), "left_semi")
          .join(keep.select(col("id").as("hi")), Seq("hi"), "left_semi"),
          Some(degAll))
      }
    val o = orientedDag(und, degOpt)
    val adj = o.groupBy(col("u").as("id"))
      .agg(sort_array(collect_list(col("v"))).as("out"))
    o.join(adj.select(col("id").as("u"), col("out").as("oa")), Seq("u"))
      .join(adj.select(col("id").as("v"), col("out").as("ob")), Seq("v"))
      .select(col("u").as("a"), col("v").as("b"),
        explode(array_intersect(col("oa"), col("ob"))).as("c"))
  }

  /** K-truss decomposition — the EDGE-grade dense-subgraph extractor one
    * notch stricter than [[kCore]]: repeatedly delete every edge on
    * fewer than k−2 triangles until none remains. Survives: the maximal
    * subgraph where every edge is reinforced by k−2 common neighbors —
    * the standard community-core / spam-ring signature (a k-truss is
    * always inside the (k−1)-core, but cuts bridge edges k-core keeps).
    * Returns surviving canonical edges with their in-truss support.
    *
    * Scale shape: each round re-runs the degree-ordered triangle
    * ENUMERATION ([[triangleEnum]], O(m^1.5) on the CURRENT edge set —
    * which only shrinks) + one edge-keyed support aggregate + one
    * semi-join, materialized once per round. Simultaneous deletion is
    * confluent, so the fixpoint is order-independent and an unrolled
    * SQL replay matches exactly. Fails loudly when `maxRounds` is
    * exhausted before the fixpoint ([[kCore]] discipline). */
  def kTruss(
      edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 30): DataFrame = {
    require(k >= 3, s"k must be >= 3 (k=2 keeps every edge): $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1: $maxRounds")
    var e = canonicalUndirected(edges, srcCol, dstCol).materialize
    var nEdges = e.count()
    var support = e.limit(0)
      .select(col("lo"), col("hi"), lit(0L).as("support")) // k never < 3
    var converged = nEdges == 0
    var round = 0
    while (!converged && round < maxRounds) {
      val tris = triangleEnum(e)
      val sup = tris.select(col("a").as("p"), col("b").as("q"))
        .unionByName(tris.select(col("a").as("p"), col("c").as("q")))
        .unionByName(tris.select(col("b").as("p"), col("c").as("q")))
        .select(least(col("p"), col("q")).as("lo"),
          greatest(col("p"), col("q")).as("hi"))
        .groupBy(col("lo"), col("hi"))
        .agg(count(lit(1)).cast("long").as("support"))
        .filter(col("support") >= k - 2)
        .materialize
      val kept = e.join(sup, Seq("lo", "hi"), "left_semi")
        .materializeFresh // carried state: reset the squared stats
      val n = kept.count()
      converged = n == nEdges
      nEdges = n
      e = kept
      support = sup
      round += 1
    }
    require(converged || nEdges == 0,
      s"kTruss(k=$k) did not reach its fixpoint within $maxRounds rounds " +
        s"($nEdges edges still shrinking) — raise maxRounds")
    e.join(support, Seq("lo", "hi"))
  }

  /** K-core decomposition by simultaneous peeling: repeatedly delete every
    * vertex whose CURRENT degree is < k until none remains, leaving the
    * maximal subgraph of minimum degree ≥ k — the standard dense-community
    * / spam-cluster extractor. Input edges are undirected (src < dst,
    * deduped); symmetrization happens inside. Returns each surviving
    * vertex with its degree inside the core.
    *
    * Scale shape: each round is one degree aggregate + two semijoins, all
    * keyed on the vertex id; the edge set only shrinks, and the round's
    * result is materialized ONCE (localCheckpoint) before it both feeds
    * the next round and answers the convergence count — same loop
    * discipline as [[pageRank]]'s invariants (a growing unmaterialized
    * plan would re-derive every prior round each iteration). Convergence
    * is an edge-count fixpoint: simultaneous deletion is confluent, so the
    * result is order-independent and a fixed-round SQL unroll replays it
    * exactly once the unroll depth reaches the fixpoint. */
  def kCore(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      maxRounds: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1: $maxRounds")
    var e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .materialize
    var nEdges = e.count()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val keep = e.groupBy(col("src").as("v"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("v"))
      val pruned = e
        .join(keep.withColumnRenamed("v", "src"), Seq("src"))
        .join(keep.withColumnRenamed("v", "dst"), Seq("dst"))
        .select(col("src"), col("dst"))
        .materializeFresh // carried state: reset the cubed stats
      val n = pruned.count()
      converged = n == nEdges
      nEdges = n
      e = pruned
      round += 1
    }
    // a truncated peel is NOT a k-core (vertices with degree < k may
    // survive) — long chains need O(n) rounds, so fail loudly instead of
    // returning a silently-wrong subgraph; callers raise maxRounds
    require(converged || nEdges == 0,
      s"kCore(k=$k) did not reach its fixpoint within $maxRounds rounds " +
        s"($nEdges edges still shrinking) — raise maxRounds")
    e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).cast("long").as("core_deg"))
  }

  /** One-row graph summary: vertex/edge counts, degree extremes, and
    * DEGREE ASSORTATIVITY — the Pearson correlation of endpoint degrees
    * over the symmetrized edge list, the standard "do hubs link to hubs"
    * diagnostic (positive: social-style; negative: hub-and-spoke). Exact
    * integer moment sums over the degree-joined edges, one double finish
    * via the shared SQL expression text (the [[Eval.ols2]] discipline).
    * Two shuffles total: the degree aggregate and the edges⋈degrees join
    * (both keyed on vertex id); moments combine map-side. */
  def graphStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .distinct()
      .materialize // feeds degrees AND the assortativity join
    val deg = und.groupBy(col("u").as("id"))
      .agg(count(lit(1)).cast("long").as("deg"))
    val degStats = deg.agg(
      count(lit(1)).cast("long").as("n_vertices"),
      max(col("deg")).as("max_deg"),
      round(sum(col("deg")).cast("double") / count(lit(1)), 6).as("avg_deg"))
    val moments = und
      .join(deg.select(col("id").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), Seq("v"))
      .agg(
        count(lit(1)).cast("long").as("m"),
        sum(col("du")).cast("long").as("sx"),
        sum(col("dv")).cast("long").as("sy"),
        sum(col("du") * col("du")).cast("long").as("sxx"),
        sum(col("dv") * col("dv")).cast("long").as("syy"),
        sum(col("du") * col("dv")).cast("long").as("sxy"))
    broadcast(degStats).crossJoin(moments)
      .withColumn("assortativity", expr(assortativitySql))
      .select(col("n_vertices"), expr("m DIV 2").as("n_edges"), col("max_deg"),
        col("avg_deg"), col("assortativity"))
  }

  /** Link prediction by Adamic–Adar: score every NON-adjacent vertex pair
    * that shares neighbors with Σ_w 1/ln(deg(w)) over the common neighbors
    * w (rare shared neighbors weigh more than hubs), return the top
    * `topK`. Contributions are quantized to micro-units
    * (round(10⁶/ln(deg)) — one ln per DISTINCT degree value) so the
    * per-pair sum is an exact long: float summation order can never
    * change a score, which keeps the top-K cut deterministic and
    * SQL-replayable. A wedge center has degree ≥ 2 by construction, so
    * ln is never 0.
    *
    * Scale shape: the wedge self-join is Σ_w deg(w)² pairs — the standard
    * common-neighbor cost, bounded by the degree distribution (run it on
    * thresholded/sparsified edges, as the co-purchase callers do; cap
    * hubs first on a power-law graph). Top-K via TakeOrdered under a
    * total order (score desc, a, b), never a global sort. */
  def adamicAdar(
      edges: DataFrame, srcCol: String, dstCol: String, topK: Int,
      maxCenterDeg: Long = Long.MaxValue): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val und = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .distinct()
      .materialize // wedges join it twice; adjacency reads it once
    val degW = und.groupBy(col("u").as("w"))
      .agg(count(lit(1)).cast("long").as("deg"))
      .filter(col("deg") >= 2) // only wedge centers matter; ln(1)=0 guard
      .filter(col("deg") <= maxCenterDeg) // hub-cap valve, see below
    val contrib = degW
      .withColumn("contrib",
        round(lit(1000000.0) / log(col("deg").cast("double")), 0).cast("long"))
      .select(col("w"), col("contrib"))
    // maxCenterDeg bounds the Σ deg(w)² wedge blow-up at power-law scale:
    // the semi-join removes hub PIVOTS before the self-join runs (not
    // after), so the capped cost is Σ_{deg(w)≤cap} deg(w)² ≤ cap·m.
    // Scores become exact Adamic–Adar of the hub-center-excluded wedge
    // set — a principled cut, since a hub contributes only 1/ln(deg)→0
    // per pair anyway. Default = no cap = exact kernel.
    val undPivot =
      if (maxCenterDeg == Long.MaxValue) und
      else und.join(degW.select(col("w").as("u")), Seq("u"), "left_semi")
    val wedges = undPivot.as("x").join(undPivot.as("y"),
        col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .select(col("x.u").as("w"), col("x.v").as("a"), col("y.v").as("b"))
    val scored = wedges.join(contrib, Seq("w"))
      .groupBy(col("a"), col("b"))
      .agg(sum(col("contrib")).cast("long").as("aa_micro"),
        count(lit(1)).cast("long").as("n_common"))
    val adjacent = und.filter(col("u") < col("v"))
      .select(col("u").as("a"), col("v").as("b"))
    scored.join(adjacent, Seq("a", "b"), "left_anti")
      .orderBy(col("aa_micro").desc, col("a"), col("b"))
      .limit(topK)
  }

  /** Multi-score link prediction — the classical neighborhood predictors
    * next to [[adamicAdar]], all from ONE wedge enumeration: common
    * neighbors, Jaccard |Γa∩Γb|/|Γa∪Γb| (micro), preferential
    * attachment deg_a·deg_b, and resource allocation Σ 1/deg(w) (micro —
    * the RA index, Adamic–Adar without the ln softening). Top-K
    * non-adjacent pairs by RA with the (a, b) tie-break. Same hub-cap
    * valve as adamicAdar: `maxCenterDeg` removes hub PIVOTS before the
    * self-join, bounding the wedge blow-up to cap·m at power-law scale;
    * endpoint degrees stay exact (the cap only affects which wedges are
    * enumerated). */
  def linkPredictors(
      edges: DataFrame, srcCol: String, dstCol: String, topK: Int,
      maxCenterDeg: Long = Long.MaxValue): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val und = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .distinct()
      .materialize // wedges join it twice; degrees read it once
    val degAll = und.groupBy(col("u").as("w"))
      .agg(count(lit(1)).cast("long").as("deg"))
      .materialize // feeds centers + both endpoint joins
    val centers = degAll
      .filter(col("deg") >= 2).filter(col("deg") <= maxCenterDeg)
      .withColumn("ra_contrib",
        round(lit(1000000.0) / col("deg").cast("double"), 0).cast("long"))
      .select(col("w"), col("ra_contrib"))
    val undPivot =
      if (maxCenterDeg == Long.MaxValue) und
      else und.join(centers.select(col("w").as("u")), Seq("u"), "left_semi")
    val wedges = undPivot.as("x").join(undPivot.as("y"),
        col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .select(col("x.u").as("w"), col("x.v").as("a"), col("y.v").as("b"))
    val scored = wedges.join(centers, Seq("w"))
      .groupBy(col("a"), col("b"))
      .agg(sum(col("ra_contrib")).cast("long").as("ra_micro"),
        count(lit(1)).cast("long").as("n_common"))
    val adjacent = und.filter(col("u") < col("v"))
      .select(col("u").as("a"), col("v").as("b"))
    scored
      .join(degAll.select(col("w").as("a"), col("deg").as("deg_a")), Seq("a"))
      .join(degAll.select(col("w").as("b"), col("deg").as("deg_b")), Seq("b"))
      .join(adjacent, Seq("a", "b"), "left_anti")
      .select(col("a"), col("b"), col("n_common"), col("deg_a"),
        col("deg_b"), expr(jaccardMicroSql).as("jaccard_micro"),
        (col("deg_a") * col("deg_b")).cast("long").as("pref_attach"),
        col("ra_micro"))
      .orderBy(col("ra_micro").desc, col("a"), col("b"))
      .limit(topK)
  }

  /** Jaccard coefficient in micro units over (n_common, deg_a, deg_b);
    * the union size is deg_a + deg_b − common, never zero for a pair
    * that shares a neighbor. Shared with the oracle. */
  val jaccardMicroSql: String =
    "CAST(ROUND(1000000.0 * n_common / (deg_a + deg_b - n_common), 0) " +
      "AS BIGINT)"

  /** Landmark harmonic centrality — the tractable closeness stand-in at
    * scale: exact all-pairs closeness is O(V·E); instead run `maxHops`
    * BFS levels from the `nLandmarks` LOWEST-ID vertices (deterministic
    * landmark choice — no sampling seed) and score each vertex by
    * Σ_landmarks 1/dist in micro units (unreached or beyond-horizon
    * landmarks contribute 0, the harmonic convention that needs no ∞
    * handling). A documented ESTIMATOR: ranks are relative to the
    * landmark set, the standard landmark/pivot trade (Eppstein–Wang).
    * Each level is one frontier-edges join + anti-join dedup, frontier
    * materialized per level (the Graph loop-invariant discipline);
    * state is (landmark, vertex) pairs — ≤ nLandmarks·V rows. Top-K by
    * (score, v) via TakeOrdered. */
  def harmonicCentrality(
      edges: DataFrame, srcCol: String, dstCol: String,
      nLandmarks: Int = 8, maxHops: Int = 3, topK: Int = 20): DataFrame = {
    require(nLandmarks >= 1 && maxHops >= 1 && topK >= 1,
      s"bad params: $nLandmarks/$maxHops/$topK")
    val und = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .distinct()
      .materialize
    val ed = und.select(col("u").as("eu"), col("v").as("ev"))
    val landmarks = und.select(col("u")).distinct()
      .orderBy(col("u")).limit(nLandmarks)
    var dist = landmarks
      .select(col("u").as("lm"), col("u").as("v"), lit(0L).as("d"))
      .materialize
    var frontier = dist
    for (i <- 1 to maxHops) {
      val next = frontier.select(col("lm"), col("v"))
        .join(ed, col("v") === col("eu"))
        .select(col("lm"), col("ev").as("v"))
        .distinct()
        .join(dist.select(col("lm"), col("v")), Seq("lm", "v"), "left_anti")
        .withColumn("d", lit(i.toLong))
        .materialize
      dist = dist.unionByName(next).materialize
      frontier = next
    }
    dist.filter(col("d") > 0L)
      .withColumn("c_micro",
        expr("CAST(ROUND(1000000.0 / d, 0) AS BIGINT)"))
      .groupBy(col("v"))
      .agg(sum(col("c_micro")).cast("long").as("harmonic_micro"),
        count(lit(1)).cast("long").as("n_reached"))
      .orderBy(col("harmonic_micro").desc, col("v"))
      .limit(topK)
  }

  /** Landmark betweenness centrality — quantized Brandes from a
    * deterministic pivot set (the [[harmonicCentrality]] convention:
    * lowest-id landmarks, bounded horizon, a documented ESTIMATOR —
    * scores are relative to the landmark set, the Eppstein–Wang
    * trade). Forward phase: level-synchronous BFS carrying exact
    * integer shortest-path counts σ (a vertex first reached at level i
    * sums σ over its level-(i−1) parents). Backward phase: dependency
    * accumulation δ(v) = Σ_{w succ} (σ_v/σ_w)(1 + δ_w) in MICRO-LONGS —
    * each per-successor term is the half-up integer division
    * (2·σ_v·(10⁶+δ_w) + σ_w) div (2·σ_w), so every level is exact
    * integer arithmetic and the oracle unrolls both phases as CTEs.
    * Betweenness(v) = Σ_landmarks δ(v), v ∉ landmarks' own source row.
    *
    * Plan: one symmetrized edge table materialized once; maxHops
    * frontier joins forward, maxHops successor joins backward, all
    * keyed on (landmark, vertex); state ≤ nLandmarks·V rows. Top-K via
    * TakeOrdered. */
  def betweennessLandmarks(
      edges: DataFrame, srcCol: String, dstCol: String,
      nLandmarks: Int = 4, maxHops: Int = 3, topK: Int = 20): DataFrame = {
    require(nLandmarks >= 1 && maxHops >= 1 && topK >= 1,
      s"bad params: $nLandmarks/$maxHops/$topK")
    val und = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .distinct()
      .materialize
    val ed = und.select(col("u").as("eu"), col("v").as("ev"))
    val landmarks = und.select(col("u")).distinct()
      .orderBy(col("u")).limit(nLandmarks)
    var ds = landmarks
      .select(col("u").as("lm"), col("u").as("v"),
        lit(0L).as("d"), lit(1L).as("sigma"))
      .materialize
    var frontier = ds
    for (i <- 1 to maxHops) {
      val next = frontier.select(col("lm"), col("v"), col("sigma"))
        .join(ed, col("v") === col("eu"))
        .select(col("lm"), col("ev").as("v"), col("sigma"))
        .join(ds.select(col("lm"), col("v")), Seq("lm", "v"), "left_anti")
        .groupBy(col("lm"), col("v"))
        .agg(sum(col("sigma")).cast("long").as("sigma"))
        .withColumn("d", lit(i.toLong))
        .select(col("lm"), col("v"), col("d"), col("sigma"))
        .materialize
      ds = ds.unionByName(next).materialize
      frontier = next
    }
    // backward: deepest level has no in-horizon successors -> delta 0
    var deltaAll = ds.filter(col("d") === maxHops.toLong)
      .select(col("lm"), col("v"), col("d"), lit(0L).as("delta_micro"))
      .materialize
    for (l <- (maxHops - 1) to 0 by -1) {
      val lvlV = ds.filter(col("d") === l.toLong)
        .select(col("lm"), col("v"), col("sigma").as("sigma_v"))
      val succ = ds.filter(col("d") === (l + 1).toLong)
        .select(col("lm"), col("v").as("w"), col("sigma").as("sigma_w"))
        .join(deltaAll.filter(col("d") === (l + 1).toLong)
          .select(col("lm"), col("v").as("w"),
            col("delta_micro").as("delta_w")), Seq("lm", "w"))
      val contrib = lvlV
        .join(ed, col("v") === col("eu"))
        .select(col("lm"), col("v"), col("sigma_v"), col("ev").as("w"))
        .join(succ, Seq("lm", "w"))
        .withColumn("term", expr(betwTermSql))
        .groupBy(col("lm"), col("v"))
        .agg(sum(col("term")).cast("long").as("delta_micro"))
      val lvl = lvlV.select(col("lm"), col("v"))
        .join(contrib, Seq("lm", "v"), "left")
        .select(col("lm"), col("v"), lit(l.toLong).as("d"),
          coalesce(col("delta_micro"), lit(0L)).as("delta_micro"))
      deltaAll = deltaAll.unionByName(lvl).materialize
    }
    deltaAll.filter(col("v") =!= col("lm"))
      .groupBy(col("v"))
      .agg(sum(col("delta_micro")).cast("long").as("btw_micro"),
        count(lit(1)).cast("long").as("n_landmarks"))
      .withColumn("betweenness",
        expr("round(CAST(btw_micro AS DOUBLE) / 1e6, 6)"))
      .orderBy(col("btw_micro").desc, col("v"))
      .limit(topK)
  }

  /** Per-successor Brandes dependency term in micro units over
    * (sigma_v, sigma_w, delta_w): half-up integer division keeps both
    * engines bit-identical. Shared with the oracle (`//` vs `div`
    * spelled by the caller — operands are non-negative). */
  val betwTermSql: String =
    "(2 * sigma_v * (1000000 + delta_w) + sigma_w) div (2 * sigma_w)"

  /** The same term with DuckDB's `//` spelling. */
  val betwTermSqlDuck: String =
    "(2 * sigma_v * (1000000 + delta_w) + sigma_w) // (2 * sigma_w)"

  /** Per-node structural features — the graph-feature-engineering pass a
    * fraud/recommendation model consumes: degree, triangle participation
    * ([[triangleCounts]] reused), and the local clustering coefficient
    * 2·tri/(deg·(deg−1)) in exact micro units (how close the node's
    * neighborhood is to a clique). One degree aggregate + the triangle
    * kernel + one vertex-keyed join; nodes off any triangle get tri=0,
    * degree-1 nodes get lcc=0 by convention. */
  def nodeFeatures(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // ONE canonical derivation, materialized once, feeds BOTH the degree
    // aggregate and the triangle kernel — the plan has a single
    // symmetrize+distinct subtree, not one per kernel
    val cand = canonicalUndirected(edges, srcCol, dstCol)
      .materialize
    val deg = cand.select(col("lo").as("id"))
      .unionByName(cand.select(col("hi").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).cast("long").as("deg"))
    val tri = triangleCountsCanonical(cand)
      .select(col("id"), col("n_tri").cast("long").as("n_tri"))
    deg.join(tri, Seq("id"), "left")
      .withColumn("n_tri", coalesce(col("n_tri"), lit(0L)))
      .withColumn("lcc_micro", expr(lccSql))
  }

  /** Local clustering coefficient in micro units, shared with the oracle. */
  val lccSql: String =
    "CASE WHEN deg >= 2 THEN CAST(ROUND(2.0 * n_tri * 1000000 / " +
      "(CAST(deg AS DOUBLE) * (deg - 1)), 0) AS BIGINT) ELSE 0 END"

  /** Newman modularity of a vertex partition — the standard "is this
    * clustering better than chance" score for community structure:
    * Q = Σ_c [e_c/2m − (a_c/2m)²] where e_c counts intra-community
    * directed edges and a_c sums community degree. Labels default to the
    * connected components (any (node, label) table works — k-core shells,
    * grid clusters). Per-community contributions are micro-quantized
    * before the final sum (order-independent), and the per-community
    * breakdown is the output — the scalar Q is its exact sum/10⁶.
    * Two label joins + two aggregates, all vertex-keyed. */
  def modularity(
      edges: DataFrame, srcCol: String, dstCol: String,
      labels: Option[DataFrame] = None): DataFrame = {
    val und = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .distinct()
      .materialize
    // default labels run CC on the MATERIALIZED symmetric frame, not the
    // raw edges — otherwise the caller's (possibly expensive) edge
    // construction is evaluated a second time inside CC's own symmetrize
    // (CC re-symmetrizing an already-symmetric frame is an idempotent
    // distinct over checkpointed rows — cheap)
    val lab = labels.getOrElse(
      Dedup.connectedComponents(und, "u", "v")
        .select(col("node"), col("component").as("label")))
      .materialize
    val m2Df = broadcast(und.agg(count(lit(1)).cast("long").as("m2")))
    val tagged = und
      .join(lab.select(col("node").as("u"), col("label").as("cu")), Seq("u"))
      .join(lab.select(col("node").as("v"), col("label").as("cv")), Seq("v"))
    val perC = tagged.groupBy(col("cu").as("label"))
      .agg(count(lit(1)).cast("long").as("a_c"), // Σ out-deg = degree sum
        sum(when(col("cu") === col("cv"), 1L).otherwise(0L)).cast("long")
          .as("e_in"))
    perC.crossJoin(m2Df)
      .withColumn("contrib_micro", expr(modularityCellSql))
  }

  /** Per-community Q contribution in exact micro units, shared SQL. */
  val modularityCellSql: String =
    "CAST(ROUND((CAST(e_in AS DOUBLE)/m2 - " +
      "(CAST(a_c AS DOUBLE)/m2)*(CAST(a_c AS DOUBLE)/m2)) * 1000000, 0) " +
      "AS BIGINT)"

  /** Pearson r over the moment-sum row, shared verbatim with the oracle. */
  val assortativitySql: String = {
    val (m, sx, sy, sxx, syy, sxy) = ("CAST(m AS DOUBLE)", "CAST(sx AS DOUBLE)",
      "CAST(sy AS DOUBLE)", "CAST(sxx AS DOUBLE)", "CAST(syy AS DOUBLE)",
      "CAST(sxy AS DOUBLE)")
    s"round(($m*$sxy - $sx*$sy) / (sqrt($m*$sxx - $sx*$sx) * sqrt($m*$syy - $sy*$sy)), 6)"
  }

  /** DuckDB-SQL unrolled peel for [[kCore]]: `rounds` fixed iterations
    * over a symmetrized-edge CTE named `es(src, dst)` that the caller
    * prepends. Matches the engine whenever the engine's fixpoint lands at
    * or before `rounds`. Every CTE is MATERIALIZED — each round references
    * its predecessor 4×, so default CTE inlining would expand the plan
    * 4^rounds-fold (observed as parquet open-file exhaustion). */
  /** DuckDB-SQL unrolled peel for [[kTruss]]: `rounds` fixed iterations
    * over a canonical-edge CTE named `ec(lo, hi)` (lo < hi, distinct)
    * that the caller provides. Triangles enumerate id-ordered (a<b<c) —
    * a different orientation than the engine's degree order, but the
    * triangle SET (and so every support count) is identical. Extra
    * rounds past the fixpoint are idempotent, so `rounds` only needs to
    * reach it. Every CTE is MATERIALIZED (each round references its
    * predecessor three times — default inlining goes exponential). */
  def kTrussSql(k: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      val prev = if (i == 1) "ec" else s"e${i - 1}"
      s"""tr$i AS MATERIALIZED (SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
         |  FROM $prev e1 JOIN $prev e2 ON e1.lo = e2.lo AND e1.hi < e2.hi
         |  JOIN $prev e3 ON e3.lo = e1.hi AND e3.hi = e2.hi),
         |sup$i AS MATERIALIZED (SELECT lo, hi,
         |    CAST(COUNT(*) AS BIGINT) AS support
         |  FROM (SELECT a AS lo, b AS hi FROM tr$i
         |    UNION ALL SELECT a, c FROM tr$i
         |    UNION ALL SELECT b, c FROM tr$i) z
         |  GROUP BY 1, 2 HAVING COUNT(*) >= ${k - 2}),
         |e$i AS MATERIALIZED (SELECT $prev.lo, $prev.hi FROM $prev
         |  JOIN sup$i USING (lo, hi))""".stripMargin
    }.mkString(",\n")
    s"""$steps
       |SELECT e$rounds.lo, e$rounds.hi, sup$rounds.support
       |FROM e$rounds JOIN sup$rounds USING (lo, hi)""".stripMargin
  }

  /** Rich-club coefficient at degree thresholds k — "do the hubs stick
    * together?": φ(k) = 2·E_k / (N_k·(N_k−1)) over the subgraph of
    * vertices with degree > k. φ rising toward 1 with k means the
    * high-degree core is densely interconnected (supplier oligopolies,
    * spam farms); flat/falling means hubs are independent stars. All
    * exact integers: one canonical-edge distinct, one degree aggregate,
    * one degree-annotated edge join, and the k thresholds ride a tiny
    * broadcast cross join — single pass per table, no per-k rescans. */
  def richClub(
      edges: DataFrame, srcCol: String, dstCol: String,
      ks: Seq[Long] = Seq(2L, 4L, 8L)): DataFrame = {
    require(ks.nonEmpty, "ks must be non-empty")
    val e0 = edges.select(
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("lo"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct().materialize
    val deg = e0.select(explode(array(col("lo"), col("hi"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).cast("long").as("deg"))
      .materialize
    val kTable = broadcast(e0.sparkSession
      .createDataFrame(ks.map(Tuple1(_))).toDF("k"))
    val nk = deg.crossJoin(kTable).filter(col("deg") > col("k"))
      .groupBy(col("k")).agg(count(lit(1)).cast("long").as("n_k"))
    val ek = e0
      .join(deg.select(col("id").as("lo"), col("deg").as("dlo")), Seq("lo"))
      .join(deg.select(col("id").as("hi"), col("deg").as("dhi")), Seq("hi"))
      .crossJoin(kTable)
      .filter(col("dlo") > col("k") && col("dhi") > col("k"))
      .groupBy(col("k")).agg(count(lit(1)).cast("long").as("e_k"))
    kTable.join(nk, Seq("k"), "left").join(ek, Seq("k"), "left")
      .select(col("k"), coalesce(col("n_k"), lit(0L)).as("n_k"),
        coalesce(col("e_k"), lit(0L)).as("e_k"))
      .withColumn("phi", expr(richClubSql))
  }

  /** φ over (n_k, e_k); NULL below two club members. Shared with the
    * oracle. */
  val richClubSql: String =
    "CASE WHEN n_k > 1 THEN " +
      "round(2.0 * e_k / (CAST(n_k AS DOUBLE) * (n_k - 1)), 6) END"

  /** HITS hubs & authorities with a FIXED iteration count — the
    * [[pageRank]] determinism recipe: no convergence test, the oracle
    * unrolls the same iterations as CTEs. Per round: auth(v) = Σ hub
    * over in-edges, hub(u) = Σ auth over out-edges, each normalized by
    * its MAX (max of doubles is order-independent, unlike an L2-norm
    * sum — the normalization choice is free up to scaling and this one
    * keeps the chain engine-exact to the ulp class round(·,8) absorbs).
    *
    * Scale shape: each iteration is two vertex-keyed shuffle joins +
    * two aggregates + two 1-row broadcast maxes; edge and vertex
    * tables are materialized once. Scores stay vertex-cardinality;
    * nothing collects to the driver. */
  def hits(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 4): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().materialize
    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().materialize
    var hub = verts.select(col("id"), lit(1.0).as("hub"))
    var auth = verts.select(col("id"), lit(1.0).as("auth"))
    (1 to iters).foreach { _ =>
      // materialize each half-step BEFORE the broadcast max: the max is
      // an ACTION per iteration, and without the checkpoint every action
      // re-evaluates the whole growing lineage (measured 44 s for 4
      // iterations at sf0.1 vs ~2 s materialized — the pageRank plan
      // note, compounded by the mid-loop aggregates)
      val a0 = verts.join(
        e.join(hub.withColumnRenamed("id", "src"), Seq("src"))
          .groupBy(col("dst").as("id")).agg(sum(col("hub")).as("s")),
        Seq("id"), "left")
        .select(col("id"), coalesce(col("s"), lit(0.0)).as("auth"))
        .materialize
      val am = broadcast(a0.agg(max(col("auth")).as("am")))
      auth = a0.crossJoin(am)
        .select(col("id"), (col("auth") / col("am")).as("auth"))
      val h0 = verts.join(
        e.join(auth.withColumnRenamed("id", "dst"), Seq("dst"))
          .groupBy(col("src").as("id")).agg(sum(col("auth")).as("s")),
        Seq("id"), "left")
        .select(col("id"), coalesce(col("s"), lit(0.0)).as("hub"))
        .materialize
      val hm = broadcast(h0.agg(max(col("hub")).as("hm")))
      hub = h0.crossJoin(hm)
        .select(col("id"), (col("hub") / col("hm")).as("hub"))
    }
    auth.join(hub, Seq("id"))
      .select(col("id"), round(col("auth"), 8).as("auth"),
        round(col("hub"), 8).as("hub"))
  }

  /** Unrolled HITS oracle body (CTEs after an `e(src,dst)` + `v(id)`
    * pair the caller provides). Every round CTE is MATERIALIZED — the
    * self-referencing inline expansion is exponential otherwise. */
  def hitsSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      val prevHub = if (i == 1) "h0" else s"h${i - 1}"
      s"""a${i}0 AS MATERIALIZED (SELECT v.id,
         |    COALESCE(SUM(h.hub), CAST(0 AS DOUBLE)) AS auth
         |  FROM v LEFT JOIN e ON e.dst = v.id
         |  LEFT JOIN $prevHub h ON h.id = e.src GROUP BY v.id),
         |am$i AS (SELECT MAX(auth) AS m FROM a${i}0),
         |a$i AS MATERIALIZED (SELECT id, auth/m AS auth FROM a${i}0, am$i),
         |h${i}0 AS MATERIALIZED (SELECT v.id,
         |    COALESCE(SUM(a.auth), CAST(0 AS DOUBLE)) AS hub
         |  FROM v LEFT JOIN e ON e.src = v.id
         |  LEFT JOIN a$i a ON a.id = e.dst GROUP BY v.id),
         |hm$i AS (SELECT MAX(hub) AS m FROM h${i}0),
         |h$i AS MATERIALIZED (SELECT id, hub/m AS hub FROM h${i}0, hm$i)"""
        .stripMargin
    }.mkString(",\n")
    s"""h0 AS (SELECT id, CAST(1 AS DOUBLE) AS hub FROM v),
       |$rounds
       |SELECT a.id, round(a.auth, 8) AS auth, round(h.hub, 8) AS hub
       |FROM a$iters a JOIN h$iters h USING (id)""".stripMargin
  }

  /** Synchronous label propagation with a FIXED round count —
    * community detection by majority vote: each round every vertex
    * adopts the most frequent label among its neighbors, ties broken
    * by the SMALLEST label (fully deterministic: exact integer counts
    * + integer tie-break, so the result is engine- and partitioning-
    * exact, no quantization needed). Labels start as vertex ids over
    * the symmetrized edge set.
    *
    * Scale shape: one label join + one (vertex, label) count + one
    * vertex-keyed argmax per round — the count table is bounded by the
    * edge count, never materializing neighbor lists. Synchronous
    * updates can oscillate on bipartite structures; the fixed round
    * count makes that a documented property, not nondeterminism. */
  /** Louvain-style SYNCHRONOUS community detection (the parallel-Louvain
    * variant, Staudt/Meyerhenke 2016 family): per round, the ACTIVE
    * vertices simultaneously move to the neighbor community with the
    * highest modularity gain (or stay), computed from the ROUND-START
    * state. Plain all-at-once synchronous updates ping-pong on
    * symmetric structures (two singletons that each want the other's
    * community swap forever), so rounds alternate the move set by id
    * PARITY — round r moves only vertices with id % 2 == r % 2, the
    * deterministic coloring used by parallel Louvain implementations
    * to restore Louvain's sequential-progress guarantee. The gain
    * comparison is EXACT — candidates C₁, C₂ compare as
    * 2m·e_{v,C} − k_v·Σtot_{C∖v}, the cross-multiplied Newman gain with
    * no division anywhere — and ties break toward the smaller community
    * id, so the whole trajectory is engine-exact and the oracle unrolls
    * the rounds (the [[labelPropagation]] discipline, upgraded from
    * plurality labels to modularity gain). `rounds` counts half-sweeps
    * (4 = two full parity sweeps); an all-one-parity id space makes the
    * off-parity rounds no-ops, never wrong.
    *
    * Scale shape per round: one edge-keyed neighbor-community count
    * (bounded by the edge count), one community degree-sum aggregate,
    * one vertex-keyed argmax window — all key-hashed shuffles; the
    * 1-row 2m total rides a broadcast. Nothing touches the driver. */
  def louvainSync(
      edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 4): DataFrame = {
    require(rounds >= 1 && rounds <= 16,
      s"rounds must be in [1, 16]: $rounds")
    import org.apache.spark.sql.expressions.Window
    val cu = canonicalUndirected(edges, srcCol, dstCol)
    val e = cu.select(col("lo").as("u"), col("hi").as("v"))
      .union(cu.select(col("hi").as("u"), col("lo").as("v")))
      .materialize
    val deg = e.groupBy(col("u").as("id"))
      .agg(count(lit(1)).cast("long").as("k")).materialize
    val m2 = broadcast(e.agg(count(lit(1)).cast("long").as("m2")))
    var comm = deg.select(col("id"), col("id").as("c"))
    (1 to rounds).foreach { r =>
      val nbr = e
        .join(comm.select(col("id").as("v"), col("c").as("cand")), Seq("v"))
        .groupBy(col("u").as("id"), col("cand"))
        .agg(count(lit(1)).cast("long").as("e_vc"))
      val tot = comm.join(deg, Seq("id"))
        .groupBy(col("c").as("cand"))
        .agg(sum(col("k")).cast("long").as("tot"))
      val scored = nbr
        .join(comm, Seq("id"))
        .join(deg, Seq("id"))
        .join(tot, Seq("cand"))
        .crossJoin(m2)
        .withColumn("score", expr(louvainScoreSql))
      // best NEIGHBOR community by (score desc, cand asc) — a hash
      // aggregate, not a window sort; negating cand makes the struct
      // max the (score, smallest-cand) argmax
      val best = scored.groupBy(col("id"))
        .agg(max(struct(col("score"), (-col("cand")).as("nc"))).as("__b"))
        .select(col("id"), col("__b.score").as("bs"),
          (-col("__b.nc")).as("bc"))
      // the STAY option competes separately with its e_vc = 0 floor
      // score (when v's own community IS a neighbor community, its
      // true-e_vc row already sits inside `best` and dominates this
      // floor — the comparison below is tie-exact either way)
      val cur = comm
        .join(deg, Seq("id"))
        .join(tot.withColumnRenamed("cand", "c"), Seq("c"))
        .crossJoin(m2)
        .withColumn("stay0", expr("0 - k * (tot - k)"))
        .select(col("id"), col("c"), col("stay0"))
      comm = cur.join(best, Seq("id"))
        .select(col("id"),
          when(pmod(col("id"), lit(2L)) === lit((r % 2).toLong) &&
              (col("bs") > col("stay0") ||
                (col("bs") === col("stay0") && col("bc") < col("c"))),
            col("bc")).otherwise(col("c")).as("c"))
        .materialize
    }
    comm.select(col("id"), col("c").as("community"))
  }

  /** Cross-multiplied modularity gain of vertex (k) joining community
    * `cand` (degree sum `tot`, e_vc edges from the vertex): exact
    * BIGINT, v's own degree removed when cand is its current community.
    * Pure integer arithmetic, so the oracle mirrors the formula with
    * qualified column names (no float chain to share verbatim). */
  val louvainScoreSql: String =
    "m2 * e_vc - k * (tot - CASE WHEN cand = c THEN k " +
      "ELSE CAST(0 AS BIGINT) END)"

  def labelPropagation(
      edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 5): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val und = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().materialize
    var lbl = und.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
    (1 to rounds).foreach { _ =>
      lbl = und.join(lbl.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"), col("lbl"))
        .agg(count(lit(1)).cast("long").as("cnt"))
        .groupBy(col("id"))
        .agg(max(struct(col("cnt"), (-col("lbl")).as("neg"))).as("m"))
        .select(col("id"), (-col("m.neg")).as("lbl"))
    }
    lbl.select(col("id"), col("lbl").as("community"))
  }

  /** Unrolled label-propagation oracle body (after `und(src,dst)`):
    * per-round majority vote via ROW_NUMBER over (count DESC, label
    * ASC) — the same deterministic tie-break as the operator. */
  def labelPropSql(rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      val prev = if (i == 1) "l0" else s"l${i - 1}"
      s"""l$i AS MATERIALIZED (SELECT dst AS id, lbl FROM (
         |  SELECT e.dst, l.lbl,
         |    ROW_NUMBER() OVER (PARTITION BY e.dst
         |      ORDER BY COUNT(*) DESC, l.lbl ASC) AS rn
         |  FROM und e JOIN $prev l ON l.id = e.src
         |  GROUP BY e.dst, l.lbl) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM und),
       |$steps
       |SELECT id, lbl AS community FROM l$rounds""".stripMargin
  }

  def kCoreSql(k: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      val prev = if (i == 1) "es" else s"e${i - 1}"
      s"""k$i AS MATERIALIZED (SELECT src AS v FROM $prev GROUP BY src HAVING count(*) >= $k),
         |e$i AS MATERIALIZED (SELECT $prev.src, $prev.dst FROM $prev
         |  JOIN k$i a ON $prev.src = a.v JOIN k$i b ON $prev.dst = b.v)""".stripMargin
    }.mkString(",\n")
    s"""$steps
       |SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS core_deg
       |FROM e$rounds GROUP BY src""".stripMargin
  }

  /** Per-vertex local clustering coefficient — how close each vertex's
    * neighborhood is to a clique: cc(v) = 2·tri(v)/(deg(v)·(deg(v)−1)).
    * The node-level refinement of [[graphStats]]' global transitivity:
    * high-cc low-deg vertices sit inside tight communities, low-cc
    * high-deg vertices are bridges/hubs — the standard split for
    * community seeding and hub detection. Degree-1 vertices (cc
    * undefined) are excluded by contract. Top-K under the total order
    * (cc desc, n_tri desc, id) via TakeOrdered, never a global sort.
    *
    * Plan: canonical edges localCheckpointed ONCE feed both the degree
    * aggregate and the [[triangleCountsCanonical]] kernel (the
    * graphStats reuse discipline); `maxDeg` passes through as the
    * power-law hub valve with the same exact-subgraph semantics. */
  def localClustering(
      edges: DataFrame, srcCol: String, dstCol: String,
      topK: Int = 20, maxDeg: Long = Long.MaxValue): DataFrame = {
    val cand = canonicalUndirected(edges, srcCol, dstCol)
      .materialize // feeds degrees AND the triangle kernel
    val deg = cand.select(col("lo").as("id"))
      .unionByName(cand.select(col("hi").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).cast("long").as("deg"))
    val tri = triangleCountsCanonical(cand, maxDeg)
      .select(col("id"), col("n_tri").cast("long").as("n_tri"))
    deg.join(tri, Seq("id"), "left")
      .withColumn("n_tri", coalesce(col("n_tri"), lit(0L)))
      .filter(col("deg") > 1)
      .withColumn("cc", expr(localCcSql))
      .orderBy(col("cc").desc, col("n_tri").desc, col("id"))
      .limit(topK)
  }

  /** cc over (n_tri, deg); callers exclude deg ≤ 1 first. Shared with
    * the oracle. */
  val localCcSql: String =
    "round(CAST(2 * n_tri AS DOUBLE) / " +
      "(CAST(deg AS DOUBLE) * (deg - 1)), 6)"

  /** Eigenvector centrality on the UNDIRECTED graph with a FIXED
    * iteration count — the [[hits]] determinism recipe specialized to a
    * symmetric adjacency (distinct from [[hits]]' bipartite hub/auth
    * split and from [[pageRank]]'s out-degree-normalized walk):
    * x_{t+1}(v) = Σ_{u~v} x_t(u), max-normalized each round from
    * x₀ = 1 — truncated power iteration toward the Perron vector.
    * Normalization happens ONCE, by the final max — in exact
    * arithmetic that is identical to normalizing every round (scaling
    * commutes with the linear map), and deferring it removes every
    * mid-loop action: no per-round broadcast max, no per-round
    * materialize, one linear 4-join plan evaluated once.
    * Max-of-doubles is order-independent (an L2 norm's sum is not) and
    * round(·,8) absorbs the ulp class of the neighbor sums; the
    * unnormalized scores grow as deg_max^iters — within double range
    * (and integer-exact below 2^53) for any realistic graph at small
    * iteration counts. Isolated vertices never appear (symmetrized
    * edge rows are the vertex source); a disconnected component
    * converges toward its own Perron vector scaled by the global max —
    * the standard truncated-iteration semantics, which the fixed round
    * count pins.
    *
    * Scale shape: edges are canonicalized + symmetrized ONCE
    * (materialized); each round is one vertex-keyed shuffle join + one
    * aggregate; the final table is materialized once so the 1-row max
    * does not replay the chain. Scores stay vertex-cardinality;
    * nothing collects to the driver. */
  def eigenvectorCentrality(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 4): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val cu = canonicalUndirected(edges, srcCol, dstCol)
    val e = cu.select(col("lo").as("src"), col("hi").as("dst"))
      .union(cu.select(col("hi").as("src"), col("lo").as("dst")))
      .materialize
    var x = e.select(col("src").as("id")).distinct()
      .select(col("id"), lit(1.0).as("x"))
    (1 to iters).foreach { _ =>
      x = e.join(x.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id")).agg(sum(col("x")).as("x"))
    }
    val xt = x.materialize
    val xm = broadcast(xt.agg(max(col("x")).as("xm")))
    xt.crossJoin(xm)
      .select(col("id"), round(col("x") / col("xm"), 8).as("eigen"))
  }

  /** Degree-oriented edge DAG over a canonical `(lo, hi)` frame: each
    * edge emitted once as u → v where (deg_u, u) < (deg_v, v) under the
    * total (degree, id) order. The out-degree of every vertex in this
    * DAG is O(√m) (≤ 2·arboricity — the Chiba–Nishizeki invariant),
    * which is what bounds clique-listing adjacency arrays and
    * extension fan-out independent of hub degrees.
    * Materialized: every caller probes it several times.
    *
    * `degOpt` lets a caller that already aggregated degrees (the hub
    * valve) reuse them for the orientation key — ANY consistent total
    * order keeps clique enumeration exact, so orienting a capped
    * subgraph by the ORIGINAL degrees saves one full edge pass. */
  private[graft] def orientedDag(
      cand: DataFrame, degOpt: Option[DataFrame] = None): DataFrame = {
    val deg = degOpt.getOrElse(cand.select(col("lo").as("id"))
      .unionByName(cand.select(col("hi").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg")))
    val loFirst = col("dlo") < col("dhi") ||
      (col("dlo") === col("dhi") && col("lo") < col("hi"))
    cand
      .join(deg.select(col("id").as("lo"), col("deg").as("dlo")), Seq("lo"))
      .join(deg.select(col("id").as("hi"), col("deg").as("dhi")), Seq("hi"))
      .select(
        when(loFirst, col("lo")).otherwise(col("hi")).as("u"),
        when(loFirst, col("hi")).otherwise(col("lo")).as("v"))
      .materialize
  }

  /** Per-vertex 4-clique participation — one density level past
    * [[triangleCounts]] (K4s mark near-clique communities that triangles
    * alone overcount). Enumeration is adjacency-intersection on the
    * degree-oriented DAG ([[orientedDag]], the Chiba–Nishizeki
    * k-clique-listing discipline): per oriented edge a → b, every
    * c ∈ out(a) ∩ out(b) closes a triangle (b → c holds by membership,
    * so a ≺ b ≺ c), and every d ∈ (out(a) ∩ out(b)) ∩ out(c) completes
    * a K4 — each clique enumerated exactly once as its DAG-sorted
    * quadruple. Output: top-`topK` vertices by K4 count,
    * (n_k4 desc, id) order.
    *
    * Scale shape: NO wedge self-join and NO row-per-extension-candidate
    * blowup (the join-per-probe variant shuffled Σ_tri outdeg(c) ≈ 50×
    * the triangle count in narrow rows) — instead two edge-keyed joins
    * attach the endpoints' out-adjacency arrays, one join attaches
    * out(c) per triangle, and the intersections run map-side. Every
    * array is bounded by the DAG OUT-degree (O(√m) under degree
    * orientation, never a hub's full degree), so per-row payload stays
    * bounded at any graph size; `maxDeg` remains the up-front hub
    * valve on the EDGE SET (exact counts of the hub-removed subgraph)
    * for graphs where even m explodes. */
  def fourCliqueCounts(
      edges: DataFrame, srcCol: String, dstCol: String,
      topK: Int = 20, maxDeg: Long = Long.MaxValue): DataFrame = {
    val base = canonicalUndirected(edges, srcCol, dstCol)
    val cand = if (maxDeg == Long.MaxValue) base
      else {
        val keep = base.select(col("lo").as("id"))
          .unionByName(base.select(col("hi").as("id")))
          .groupBy(col("id")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") <= maxDeg).select(col("id"))
        base
          .join(keep.select(col("id").as("lo")), Seq("lo"), "left_semi")
          .join(keep.select(col("id").as("hi")), Seq("hi"), "left_semi")
      }
    val o = orientedDag(cand)
    val adj = o.groupBy(col("u").as("id"))
      .agg(sort_array(collect_list(col("v"))).as("out"))
    val tri = o
      .join(adj.select(col("id").as("u"), col("out").as("oa")), Seq("u"))
      .join(adj.select(col("id").as("v"), col("out").as("ob")), Seq("v"))
      .select(col("u").as("a"), col("v").as("b"),
        array_intersect(col("oa"), col("ob")).as("cab"))
      .filter(size(col("cab")) > 0)
      .select(col("a"), col("b"), col("cab"),
        explode(col("cab")).as("c"))
    val k4 = tri
      .join(adj.select(col("id").as("c"), col("out").as("oc")), Seq("c"))
      .select(col("a"), col("b"), col("c"),
        explode(array_intersect(col("cab"), col("oc"))).as("d"))
    k4.select(explode(array(col("a"), col("b"), col("c"), col("d")))
        .as("id"))
      .groupBy(col("id")).agg(count(lit(1)).cast("long").as("n_k4"))
      .orderBy(col("n_k4").desc, col("id")).limit(topK)
  }

  /** Maximal independent set by Luby's algorithm with HASH priorities —
    * the deterministic-parallel classic (Luby 1986): each round, every
    * active vertex whose md5-prefix priority strictly beats every
    * ACTIVE neighbor's joins the set; winners and their neighborhoods
    * deactivate. Hash priorities replace the RNG (the md5-not-an-RNG
    * discipline), so the whole set evolution — and therefore the
    * output — is engine-exact and the oracle unrolls the rounds. The
    * result is maximAL (no vertex addable), not maximum (NP-hard);
    * emitted as (id, round) so the convergence trajectory is pinned.
    *
    * Converges in O(log n) rounds w.h.p.; a graph that exhausts
    * `maxRounds` fails LOUDLY (the [[kCore]] truncation contract —
    * never a silently-non-maximal set). Per DISTRIBUTED round: one
    * tagged-state job (active-edge join + max aggregate + winner and
    * neighbor flags in a single DAG) + the loop counter's count.
    * Luby's frontier collapses geometrically, so once it fits under
    * `finishBelow` the REMAINING rounds replay on the driver over the
    * collected induced subgraph — identical priorities, identical
    * winner rule, identical round numbering (spec-pinned equal to the
    * all-distributed run), because tail rounds over a few hundred
    * vertices are pure cluster-latency waste at any scale. The
    * finisher collect is bounded by `finishBelow` vertices plus their
    * induced edges; set `finishBelow = 0` to stay fully distributed
    * (e.g. under extreme hub degrees). */
  def maximalIndependentSet(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxRounds: Int = 16, finishBelow: Long = 2048L): DataFrame = {
    require(maxRounds >= 1 && maxRounds <= 64,
      s"maxRounds must be in [1, 64]: $maxRounds")
    require(finishBelow >= 0L, s"finishBelow must be >= 0: $finishBelow")
    val cu = canonicalUndirected(edges, srcCol, dstCol)
    val e = cu.select(col("lo").as("src"), col("hi").as("dst"))
      .union(cu.select(col("hi").as("src"), col("lo").as("dst")))
      .materialize
    var active = e.select(col("src").as("id")).distinct()
      .withColumn("pri", expr(misPriSql("id")))
      .materialize
    var mis: DataFrame = null
    var round = 0
    var n = active.count()
    while (n > finishBelow && round < maxRounds) {
      round += 1
      // ONE materialized state frame per round (each extra action is a
      // whole-job round-trip, and Luby runs ~log n rounds): tag every
      // active vertex winner / neighbor-of-winner in a single DAG —
      // both-endpoints-active restriction rides the STATIC edge table
      // (the oracle's shape)
      val nbrMax = e
        .join(active.select(col("id").as("dst"), col("pri").as("npri")),
          Seq("dst"))
        .join(active.select(col("id").as("src")), Seq("src"))
        .groupBy(col("src").as("id")).agg(max(col("npri")).as("mx"))
      val tagged = active.join(nbrMax, Seq("id"), "left")
        .withColumn("is_w", col("mx").isNull || col("pri") > col("mx"))
      val nbrOfW = e
        .join(tagged.filter(col("is_w")).select(col("id").as("src")),
          Seq("src"))
        .select(col("dst").as("id")).distinct()
        .withColumn("is_nbr", lit(true))
      val state = tagged.join(nbrOfW, Seq("id"), "left")
        .select(col("id"), col("pri"), col("is_w"),
          coalesce(col("is_nbr"), lit(false)).as("is_nbr"))
        .materialize
      val w = state.filter(col("is_w"))
        .select(col("id"), lit(round.toLong).as("round"))
      mis = if (mis == null) w else mis.unionByName(w)
      active = state.filter(!col("is_w") && !col("is_nbr"))
        .select(col("id"), col("pri"))
      n = active.count()
    }
    if (n > 0) {
      // Non-convergence guard BEFORE any collect: if the distributed
      // loop exhausted maxRounds while the frontier is still above
      // finishBelow, fail loudly here — collecting an arbitrarily
      // large remaining subgraph into the driver (only to fail the
      // convergence require later) could OOM on an adversarial graph.
      require(n <= finishBelow,
        s"MIS did not converge within $maxRounds distributed rounds " +
          s"($n vertices still active > finishBelow=$finishBelow) — " +
          "raise maxRounds")
      // driver finisher: the collapsed frontier replays the SAME Luby
      // rounds sequentially — identical priorities and winner rule, so
      // the output is bit-equal to the all-distributed run
      var pri = active.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val actIds = active.select(col("id"))
      var sub = e
        .join(actIds.withColumnRenamed("id", "src"), Seq("src"))
        .join(actIds.withColumnRenamed("id", "dst"), Seq("dst"))
        .select(col("src"), col("dst")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val rows = Seq.newBuilder[(Long, Long)]
      while (pri.nonEmpty && round < maxRounds) {
        round += 1
        val nbr = sub.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
        val winners = pri.keySet.filter { v =>
          nbr.get(v).forall(_.forall(u => pri(v) > pri(u)))
        }
        winners.toSeq.sorted.foreach(v => rows += ((v, round.toLong)))
        val removed = winners ++
          winners.toSeq.flatMap(w => nbr.get(w).toSeq.flatten)
        pri = pri.filterNot { case (v, _) => removed(v) }
        sub = sub.filter { case (a, b) =>
          pri.contains(a) && pri.contains(b) }
      }
      require(pri.isEmpty,
        s"MIS did not converge within $maxRounds rounds " +
          s"(${pri.size} vertices still active) — raise maxRounds")
      val tail = edges.sparkSession
        .createDataFrame(rows.result()).toDF("id", "round")
      mis = if (mis == null) tail else mis.unionByName(tail)
    }
    if (mis == null) // edgeless input: the empty set is the MIS
      edges.sparkSession.createDataFrame(Seq.empty[(Long, Long)])
        .toDF("id", "round")
    else mis
  }

  /** 60-bit md5-prefix priority of a vertex id (Spark side; the oracle
    * uses DuckDB's hex-literal cast of the same prefix). */
  def misPriSql(idCol: String): String =
    s"CAST(conv(substring(md5(CONCAT('mis:', CAST($idCol AS STRING))), " +
      "1, 15), 16, 10) AS BIGINT)"

  /** Unrolled [[maximalIndependentSet]] oracle (rounds fixed at the
    * engine's maxRounds; post-convergence rounds are empty, so any
    * unroll ≥ the live round count matches). Caller provides the
    * SYMMETRIZED `e(src, dst)`. */
  def misSql(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""nm$r AS MATERIALIZED (SELECT e.src AS id, MAX(a.pri) AS mx
         |  FROM e JOIN a${r - 1} a ON a.id = e.dst
         |  JOIN a${r - 1} s ON s.id = e.src
         |  GROUP BY 1),
         |w$r AS MATERIALIZED (SELECT a.id FROM a${r - 1} a
         |  LEFT JOIN nm$r n ON n.id = a.id
         |  WHERE n.mx IS NULL OR a.pri > n.mx),
         |rm$r AS MATERIALIZED (SELECT id FROM w$r
         |  UNION SELECT e.dst AS id FROM e JOIN w$r w ON w.id = e.src),
         |a$r AS MATERIALIZED (SELECT a.id, a.pri FROM a${r - 1} a
         |  ANTI JOIN rm$r USING (id))""".stripMargin
    }.mkString(",\n")
    val out = (1 to rounds).map(r =>
      s"SELECT id, CAST($r AS BIGINT) AS round FROM w$r")
      .mkString("\nUNION ALL ")
    s"""a0 AS MATERIALIZED (SELECT id,
       |    CAST('0x' || substr(md5('mis:' || CAST(id AS VARCHAR)), 1, 15)
       |      AS BIGINT) AS pri
       |  FROM (SELECT DISTINCT src AS id FROM e)),
       |$roundCtes
       |$out""".stripMargin
  }

  /** Unrolled [[eigenvectorCentrality]] oracle body — CTEs after an
    * `e(src, dst)` SYMMETRIZED edge set the caller provides; the same
    * defer-normalization shape (one max division at the end). Each
    * round CTE is MATERIALIZED (the [[hitsSql]] expansion note). */
  def eigenCentralitySql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""x$i AS MATERIALIZED (SELECT e.dst AS id, SUM(x.x) AS x
         |  FROM e JOIN x${i - 1} x ON x.id = e.src GROUP BY e.dst)"""
        .stripMargin
    }.mkString(",\n")
    s"""x0 AS (SELECT DISTINCT src AS id, CAST(1 AS DOUBLE) AS x FROM e),
       |$rounds,
       |xm AS (SELECT MAX(x) AS m FROM x$iters)
       |SELECT id, round(x / m, 8) AS eigen FROM x$iters, xm""".stripMargin
  }

  /** Distributed greedy MAXIMAL MATCHING — the edge-side sibling of
    * [[maximalIndependentSet]]: a deterministic Luby-style handshake.
    * Each round, every unmatched vertex points at its min-priority
    * unmatched neighbor (md5 priorities replace the RNG, ties broken by
    * id); vertices that point at EACH OTHER match and retire with their
    * round number. The matched set is a valid matching by construction
    * (a vertex points at exactly one neighbor per round) and maximal
    * once no active edge remains; the CONTRACT is the fixed `rounds`
    * trajectory itself — both engines replay identical rounds, and
    * post-quiescence rounds emit nothing on both. Matching seeds
    * maximal-weight greedy dedup-pair selection, b-matching caps, and
    * contention-free pairing jobs.
    *
    * Scale shape per round: one both-endpoints-active edge restriction
    * (two hash joins on the STATIC edge table), one per-vertex
    * min(struct) aggregate, one mutual-handshake self-join on the
    * vertex-keyed target table — everything key-partitioned, state
    * materialized once per round ([[maximalIndependentSet]]'s lineage
    * discipline). */
  def greedyMatching(
      edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 8): DataFrame = {
    require(rounds >= 1 && rounds <= 32, s"rounds must be in [1, 32]: $rounds")
    val cu = canonicalUndirected(edges, srcCol, dstCol)
    val e = cu.select(col("lo").as("src"), col("hi").as("dst"))
      .union(cu.select(col("hi").as("src"), col("lo").as("dst")))
      .materialize
    val pri = e.select(col("src").as("id")).distinct()
      .withColumn("pri", expr(matchPriSql("id")))
      .materialize
    var active = pri
    var matched: DataFrame = null
    var round = 0
    var done = false
    var eAct = e // shrinks to the surviving subgraph round over round
    while (round < rounds && !done) {
      round += 1
      val ea = eAct
        .join(active.select(col("id").as("src"), col("pri").as("__sp")),
          Seq("src"))
        .join(active.select(col("id").as("dst"), col("pri").as("__dp")),
          Seq("dst"))
      val tgt = ea
        .groupBy(col("src").as("id"))
        .agg(min(struct(col("__dp").as("p"), col("dst").as("t")))
          .as("__m"))
        .select(col("id"), col("__m.t").as("t"))
      val m = tgt.as("a")
        .join(tgt.as("b"),
          col("a.t") === col("b.id") && col("b.t") === col("a.id") &&
            col("a.id") < col("a.t"))
        .select(col("a.id").as("src"), col("a.t").as("dst"),
          lit(round.toLong).as("round"))
        .materialize
      matched = if (matched == null) m else matched.unionByName(m)
      if (m.isEmpty) done = true // quiescent: later rounds stay empty
      else {
        val gone = m.select(col("src").as("id"))
          .unionByName(m.select(col("dst").as("id")))
        active = active.join(gone, Seq("id"), "left_anti")
          .materializeFresh // carried state: reset the squared stats
        // carry only the surviving subgraph into later rounds — the
        // full edge set would otherwise be re-scanned every round even
        // when most vertices have retired (ea is exactly that subgraph)
        eAct = ea.select(col("src"), col("dst")).materializeFresh
        // driver finisher (the maximalIndependentSet recipe): once the
        // surviving frontier collapses below the bound, replay the
        // IDENTICAL handshake rounds in memory — same priorities, same
        // min-(pri, id) target, same mutual rule, so the rows are
        // bit-equal to the all-distributed run at a fraction of the
        // per-round job floor
        if (active.count() <= 2048L) {
          var pri = active.collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          val actIds = active.select(col("id"))
          var sub = eAct
            .join(actIds.withColumnRenamed("id", "src"), Seq("src"))
            .join(actIds.withColumnRenamed("id", "dst"), Seq("dst"))
            .select(col("src"), col("dst")).collect()
            .map(r => (r.getLong(0), r.getLong(1)))
          val rows = Seq.newBuilder[(Long, Long, Long)]
          var quiet = false
          while (round < rounds && !quiet && pri.nonEmpty) {
            round += 1
            val nbr = sub.groupBy(_._1)
              .map { case (v, es) => v -> es.map(_._2) }
            val t = pri.keys.flatMap { v =>
              nbr.get(v).filter(_.nonEmpty).map(us =>
                v -> us.minBy(u => (pri(u), u)))
            }.toMap
            val pairs = t.collect {
              case (v, u) if v < u && t.get(u).contains(v) => (v, u)
            }.toSeq.sorted
            if (pairs.isEmpty) quiet = true
            else {
              pairs.foreach { case (v, u) =>
                rows += ((v, u, round.toLong)) }
              val gone2 = pairs.flatMap(p => Seq(p._1, p._2)).toSet
              pri = pri.filterNot { case (v, _) => gone2(v) }
              sub = sub.filter { case (a, b) =>
                pri.contains(a) && pri.contains(b) }
            }
          }
          val tail = edges.sparkSession.createDataFrame(rows.result())
            .toDF("src", "dst", "round")
          matched = matched.unionByName(tail)
          done = true
        }
      }
    }
    matched
  }

  /** Two-sweep BFS diameter estimate — the standard cheap lower bound:
    * BFS from the minimum-id vertex, take the farthest reached vertex
    * (max hops, ties to the lowest id), BFS again from there; the
    * second sweep's eccentricity lower-bounds the component's diameter
    * (exact on trees, near-exact on small-world graphs). `maxHops`
    * bounds BOTH sweeps, so the output is a deterministic fixed-round
    * trajectory whether or not the frontier drained — the
    * [[pagerank]]/[[bfsHops]] contract, and the oracle unrolls the same
    * levels. One row: sweep-2 start, the peripheral vertex, the hop
    * eccentricity, and the reached-vertex count.
    *
    * Scale shape: two [[bfsHops]] runs (frontier-only joins per level)
    * plus two global argmax picks (orderBy + limit 1 — a top-1
    * TakeOrdered, never a full sort at the driver). */
  def diameterSweep(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxHops: Int = 8): DataFrame = {
    val cu = canonicalUndirected(edges, srcCol, dstCol)
    val e = cu.select(col("lo").as("src"), col("hi").as("dst"))
      .union(cu.select(col("hi").as("src"), col("lo").as("dst")))
      .materialize
    val s1 = e.agg(min(col("src")).as("id"))
    val d1 = bfsHopsOn(e, s1, maxHops)
    val far1 = d1.orderBy(col("hops").desc, col("id")).limit(1)
      .select(col("id"))
      .materialize // feeds sweep 2 AND the output row; sweep 1 runs once
    val d2 = bfsHopsOn(e, far1, maxHops).materialize
    val far2 = d2.orderBy(col("hops").desc, col("id")).limit(1)
      .select(col("id").as("far_id"), col("hops").as("eccentricity"))
    far1.select(col("id").as("start_id"))
      .crossJoin(far2)
      .crossJoin(d2.agg(count(lit(1)).cast("long").as("n_reached")))
  }

  /** Unrolled [[diameterSweep]] for the DuckDB oracle (expects the `e`
    * bidirectional-edge CTE in scope). */
  def diameterSweepSql(maxHops: Int): String = {
    def sweep(tag: String, base: String): String = {
      val levels = (1 to maxHops).map { h =>
        s"""$tag$h AS MATERIALIZED (
           |  SELECT id, CAST(MIN(hops) AS BIGINT) AS hops FROM (
           |    SELECT id, hops FROM $tag${h - 1}
           |    UNION ALL
           |    SELECT e.dst AS id, $h AS hops
           |    FROM $tag${h - 1} f JOIN e ON e.src = f.id
           |    WHERE f.hops = ${h - 1})
           |  GROUP BY id)""".stripMargin
      }.mkString(",\n")
      s"$base,\n$levels"
    }
    val s1 = sweep("u",
      s"""u0 AS MATERIALIZED (SELECT MIN(src) AS id, CAST(0 AS BIGINT)
         |  AS hops FROM e)""".stripMargin)
    val s2 = sweep("t",
      s"""far1 AS MATERIALIZED (SELECT id FROM u$maxHops
         |  ORDER BY hops DESC, id LIMIT 1),
         |t0 AS MATERIALIZED (SELECT id, CAST(0 AS BIGINT) AS hops
         |  FROM far1)""".stripMargin)
    s"""$s1,
       |$s2,
       |far2 AS MATERIALIZED (SELECT id, hops FROM t$maxHops
       |  ORDER BY hops DESC, id LIMIT 1)
       |SELECT (SELECT id FROM far1) AS start_id, far2.id AS far_id,
       |  far2.hops AS eccentricity,
       |  (SELECT CAST(COUNT(*) AS BIGINT) FROM t$maxHops) AS n_reached
       |FROM far2""".stripMargin
  }

  /** Borůvka minimum spanning FOREST — the bulk-parallel MST: every
    * round, each component claims its cheapest outgoing edge (ties
    * cannot matter: the md5 weight plus the (w, lo, hi) total order
    * make the forest unique), claimed edges join the forest, and
    * components merge; component count at least halves per round, so
    * `rounds` ≥ ⌈log₂ n⌉ converges and post-convergence rounds are
    * no-ops on both engines. The MST is single-linkage clustering's
    * backbone (cut it at a weight threshold for the dendrogram level)
    * and the cheapest-interconnect summary of a similarity graph.
    *
    * Weights: `weightCol` if given, else the deterministic
    * [[mstWeightSql]] md5 weight (distinct w.h.p., replayable in SQL).
    * Labels each round come from [[Dedup.connectedComponents]] over the
    * forest-so-far (min-label + pointer jumping — the oracle computes
    * the same fixpoint as a per-round reachability closure).
    *
    * Scale shape per round: one components run over ≤ n−1 forest edges,
    * one edge↔label join, one per-component min(struct) aggregate —
    * all key-hashed; the candidate edge table is re-labeled, never
    * re-shuffled wholesale (it stays checkpointed). */
  def boruvkaForest(
      edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 12): DataFrame = {
    require(rounds >= 1 && rounds <= 32, s"rounds must be in [1, 32]: $rounds")
    val spark = edges.sparkSession
    val w = canonicalUndirected(edges, srcCol, dstCol)
      .withColumn("w", expr(mstWeightSql("lo", "hi")))
      .materialize
    val verts = w.select(col("lo").as("id"))
      .unionByName(w.select(col("hi").as("id"))).distinct().materialize
    var forest: DataFrame = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      new org.apache.spark.sql.types.StructType()
        .add("lo", "long").add("hi", "long").add("w", "long")
        .add("round", "long"))
    // labels maintained INCREMENTALLY: each round runs components over
    // the CONTRACTED graph only (nodes = current component labels,
    // edges = this round's selections — at most halving in size every
    // round, so total components work is a geometric series), then
    // composes into the vertex labels. Recomputing full-graph
    // components from the forest each round both re-paid the whole
    // graph every round AND handed connectedComponents ever-deeper
    // spanning trees (the sf0.1 forest blew past its iteration cap —
    // the loud-converge require caught it).
    var lab = verts.withColumn("l", col("id")).materialize
    var round = 0
    var done = false
    while (round < rounds && !done) {
      round += 1
      val cand = w
        .join(lab.select(col("id").as("lo"), col("l").as("cl")), Seq("lo"))
        .join(lab.select(col("id").as("hi"), col("l").as("ch")), Seq("hi"))
        .filter(col("cl") =!= col("ch"))
      val sel = cand.select(col("cl").as("c"), col("w"), col("lo"),
          col("hi"), col("cl"), col("ch"))
        .unionByName(cand.select(col("ch").as("c"), col("w"), col("lo"),
          col("hi"), col("cl"), col("ch")))
        .groupBy(col("c"))
        .agg(min(struct(col("w"), col("lo"), col("hi"), col("cl"),
          col("ch"))).as("__m"))
        .select(col("__m.lo").as("lo"), col("__m.hi").as("hi"),
          col("__m.w").as("w"), col("__m.cl").as("cl"),
          col("__m.ch").as("ch"))
        .distinct()
        .materialize
      val nSel = sel.count()
      if (nSel == 0L) done = true
      else {
        forest = forest.unionByName(
          sel.select(col("lo"), col("hi"), col("w"),
            lit(round.toLong).as("round"))).materializeFresh
        // merge labels through the contracted component graph — its
        // node count is the CURRENT component count (at-most-halving
        // per round) and rows are already driver-safe below the valve,
        // so the merge is an in-memory min-union-find (root always the
        // smaller label → root = min of the set, exactly the
        // distributed components' min-label fixpoint) instead of ~15
        // whole-cluster jobs of a distributed fixpoint per round; past
        // the valve it falls back to the distributed run
        val merged =
          if (nSel <= 1000000L) {
            val pairs = sel.select(col("cl"), col("ch")).collect()
              .map(r => (r.getLong(0), r.getLong(1)))
            val parent = scala.collection.mutable.Map[Long, Long]()
            def find(x: Long): Long = {
              var r = x
              while (parent.getOrElse(r, r) != r) r = parent(r)
              var c = x
              while (parent.getOrElse(c, c) != c) {
                val nx = parent(c); parent(c) = r; c = nx
              }
              r
            }
            pairs.foreach { case (a, b) =>
              val ra = find(a); val rb = find(b)
              if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
            }
            val rows = pairs.flatMap(p => Seq(p._1, p._2)).distinct
              .map(x => (x, find(x))).toSeq
            import spark.implicits._
            rows.toDF("l", "__nl")
          } else Dedup.connectedComponents(
            sel.select(col("cl"), col("ch")), "cl", "ch")
            .select(col("node").as("l"), col("component").as("__nl"))
        lab = lab.join(merged, Seq("l"), "left")
          .select(col("id"), coalesce(col("__nl"), col("l")).as("l"))
          .materializeFresh
      }
    }
    forest
  }

  /** Deterministic md5 edge weight in [0, 10⁹) over the canonical
    * (lo, hi) pair; Spark-side text (the oracle uses the DuckDB hex
    * form of the same md5). */
  def mstWeightSql(lo: String, hi: String): String =
    s"CAST(conv(substring(md5(CONCAT('mst:', CAST($lo AS STRING), '~', " +
      s"CAST($hi AS STRING))), 1, 15), 16, 10) AS BIGINT) % 1000000000"

  /** Unrolled [[boruvkaForest]] rounds for the DuckDB oracle (expects
    * `cu` canonical (lo, hi) in scope): labels per round come from a
    * reachability closure over the forest-so-far (the
    * q_dedup_components pattern — same min-label fixpoint the engine's
    * pointer-jumping components converge to), then the identical
    * per-component (w, lo, hi) min pick. Closure volume is
    * Σ component² — fine at oracle scale (sf0.01), which is the only
    * scale the driver replays. */
  def mstSql(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      val p = r - 1
      s"""bi$r AS (SELECT lo AS u, hi AS v FROM f$p
         |  UNION ALL SELECT hi, lo FROM f$p),
         |reach$r(u, v) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT x.u, b.v FROM reach$r x JOIN bi$r b ON x.v = b.u),
         |lab$r AS MATERIALIZED (SELECT u AS id, CAST(MIN(v) AS BIGINT) AS l
         |  FROM reach$r GROUP BY 1),
         |cand$r AS (SELECT w.lo, w.hi, w.w, a.l AS cl, b.l AS ch
         |  FROM w JOIN lab$r a ON a.id = w.lo JOIN lab$r b ON b.id = w.hi
         |  WHERE a.l != b.l),
         |sel$r AS MATERIALIZED (SELECT DISTINCT lo, hi, w FROM (
         |  SELECT lo, hi, w, row_number() OVER (PARTITION BY c
         |      ORDER BY w, lo, hi) AS rn
         |  FROM (SELECT cl AS c, lo, hi, w FROM cand$r
         |    UNION ALL SELECT ch, lo, hi, w FROM cand$r))
         |  WHERE rn = 1),
         |f$r AS MATERIALIZED (SELECT lo, hi, w, round FROM f$p
         |  UNION ALL SELECT lo, hi, w, CAST($r AS BIGINT) AS round
         |  FROM sel$r)""".stripMargin
    }.mkString(",\n")
    s"""w AS MATERIALIZED (SELECT lo, hi,
       |    CAST('0x' || substr(md5('mst:' || CAST(lo AS VARCHAR) ||
       |      '~' || CAST(hi AS VARCHAR)), 1, 15) AS BIGINT)
       |      % 1000000000 AS w
       |  FROM cu),
       |verts AS MATERIALIZED (SELECT DISTINCT lo AS id FROM cu
       |  UNION SELECT hi FROM cu),
       |f0 AS (SELECT lo, hi, w, CAST(0 AS BIGINT) AS round FROM w
       |  WHERE FALSE),
       |$roundCtes
       |SELECT lo, hi, w, round FROM f$rounds""".stripMargin
  }

  /** Matching priority — md5 of the id under a matching-specific salt
    * (decorrelated from [[misPriSql]]); Spark-side text. */
  def matchPriSql(idCol: String): String =
    s"CAST(conv(substring(md5(CONCAT('match:', CAST($idCol AS STRING))), " +
      "1, 15), 16, 10) AS BIGINT)"

  /** Unrolled [[greedyMatching]] rounds for the DuckDB oracle (expects
    * the `e` bidirectional-edge CTE in scope; every round MATERIALIZED
    * or the chain re-inlines exponentially). Post-quiescence rounds
    * emit zero rows on both engines, so a fixed unroll is exact. */
  def matchingSql(rounds: Int): String = {
    val roundCtes = (1 to rounds).map { r =>
      s"""ea$r AS MATERIALIZED (SELECT e.src, e.dst, p.pri AS dp
         |  FROM e JOIN act${r - 1} a ON a.id = e.src
         |  JOIN act${r - 1} b ON b.id = e.dst
         |  JOIN pri p ON p.id = e.dst),
         |tg$r AS MATERIALIZED (SELECT src AS id, dst AS t FROM (
         |  SELECT src, dst,
         |    row_number() OVER (PARTITION BY src ORDER BY dp, dst) AS rn
         |  FROM ea$r) WHERE rn = 1),
         |m$r AS MATERIALIZED (SELECT a.id AS src, a.t AS dst
         |  FROM tg$r a JOIN tg$r b
         |  ON a.t = b.id AND b.t = a.id AND a.id < a.t),
         |act$r AS MATERIALIZED (SELECT id FROM act${r - 1}
         |  ANTI JOIN (SELECT src AS id FROM m$r
         |    UNION ALL SELECT dst FROM m$r) USING (id))""".stripMargin
    }.mkString(",\n")
    val out = (1 to rounds).map(r =>
      s"SELECT src, dst, CAST($r AS BIGINT) AS round FROM m$r")
      .mkString("\nUNION ALL ")
    s"""pri AS MATERIALIZED (SELECT id,
       |    CAST('0x' || substr(md5('match:' || CAST(id AS VARCHAR)), 1, 15)
       |      AS BIGINT) AS pri
       |  FROM (SELECT DISTINCT src AS id FROM e)),
       |act0 AS MATERIALIZED (SELECT id FROM pri),
       |$roundCtes
       |$out""".stripMargin
  }
}
