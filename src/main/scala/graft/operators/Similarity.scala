package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize
import graft.Materialize.MaterializeOps

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    O(|Q|·|C|) pairs; fine when |Q| is small or as a ground-truth oracle.
  *  - [[ivfTopK]]: IVF-style approximate search — the 100 TB path. Corpus is
  *    partitioned into cells around seed centroids; a query probes only its
  *    `nprobe` nearest cells, scanning ~nprobe/nCentroids of the data.
  *    Everything is DataFrame joins — no driver collect, no UDF loops.
  *
  * Perf notes (measured): higher-order functions run interpreted
  * (CodegenFallback), so (a) norms are precomputed once per row behind an
  * Exchange instead of re-deriving 3 dot products per pair, and (b) the
  * corpus is repartitioned before pair generation — small parquet inputs
  * otherwise arrive as ONE partition and serialize the whole scan on one
  * core. The rounded cosine keeps the exact dot/(sqrt·sqrt) shape the DuckDB
  * oracle mirrors.
  */
object Similarity {

  /** Dot product of two float-array columns in double math (fixed left-to-
    * right fold — matches the oracle's list_sum order). Backed by the
    * codegen'd [[graft.functions.expressions.DotProductFloat]] expression;
    * the HOF formulation (`aggregate(zip_with(...))`) computes the identical
    * value but runs interpreted — measured 10× slower on 2M pairs. */
  def dot(x: Column, y: Column): Column =
    graft.functions.expressions.VectorExpressions.dotFloat(x, y)

  /** The HOF formulation, kept for cross-checking the custom expression. */
  def dotHof(x: Column, y: Column): Column =
    aggregate(
      zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Cosine similarity from precomputed norms, rounded for oracle parity. */
  private def cosineFromNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    round(dot(a, b) / (na * nb), 6)

  /** Cosine similarity between two float-array columns (self-contained). */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))), 6)

  /** Tag (id, vec) rows with their L2 norm, materialized behind an Exchange
    * so every downstream pair reads a column instead of re-folding the
    * array; also restores parallelism lost to single-file parquet scans. */
  private def withNorm(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.repartition(col(idCol))
      .select(col(idCol), col(vecCol), sqrt(dot(col(vecCol), col(vecCol))).as("__nrm"))
      .repartition(col(idCol))

  /** Fail fast when an EXACT tier is pointed at more rows than its O(n²)
    * (or broadcast) shape can survive. The probe is a `limit(cap+1).count()`
    * — it early-exits after cap+1 rows, never a full scan — so the guard
    * costs one cheap job and turns a silent cluster-killer into an
    * actionable error naming the scale path to use instead. */
  private def requireBounded(df: DataFrame, cap: Long, what: String, alt: String): Unit = {
    val n = df.limit(math.min(cap + 1, Int.MaxValue).toInt).count()
    require(n <= cap,
      s"$what is an exact tier capped at $cap rows (got >$cap): at scale use $alt")
  }

  /** Exact top-k: every query row against every corpus row, ranked by
    * (cosine desc, corpus id) per query. The (small) query side is broadcast
    * into a nested-loop join over the repartitioned corpus — so the QUERY
    * side is the guarded one; the corpus streams partition-parallel and can
    * be arbitrarily large (cost O(|Q|·|C|), memory O(|Q|)). */
  def bruteForceTopK(
      queries: DataFrame,   // (qid, qvec)
      corpus: DataFrame,    // (vec_id, embedding)
      k: Int,
      maxQueries: Long = 10000L): DataFrame = {
    requireBounded(queries, maxQueries, "bruteForceTopK's broadcast query side",
      "ivfTopK (IVF cells, nprobe recall knob)")
    val c = withNorm(corpus, "vec_id", "embedding")
    val q = withNorm(queries, "qid", "qvec").withColumnRenamed("__nrm", "__qnrm")
    val pairs = broadcast(q)
      .crossJoin(c)
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("sim", cosineFromNorms(col("qvec"), col("embedding"), col("__qnrm"), col("__nrm")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    pairs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("sim"), col("rank"))
  }

  /** All near-duplicate pairs with cosine ≥ threshold (exact, symmetric,
    * a < b). O(n²) compare — this is the VERIFICATION tier (ground truth
    * for the blocked/SRP scale paths), guarded so it cannot be pointed at
    * a real corpus by accident: `maxRows` fails fast with a pointer to
    * [[nearDupCosineBlocked]]/[[nearDupCosineSrp]]. No broadcast hint —
    * under the cap the planner broadcasts the (small) side on its own, and
    * a partition-paired cartesian is the fallback, so no full-corpus
    * broadcast exists on any path. */
  def nearDupCosine(
      embeddings: DataFrame,
      threshold: Double,
      maxRows: Long = 100000L): DataFrame = {
    requireBounded(embeddings, maxRows, "nearDupCosine (O(n²) all-pairs)",
      "nearDupCosineBlocked (IVF cells) or nearDupCosineSrp (cosine LSH)")
    val n = withNorm(embeddings, "vec_id", "embedding")
    val a = n.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"), col("__nrm").as("nrm_a"))
    val b = n.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"), col("__nrm").as("nrm_b"))
    a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("sim", cosineFromNorms(col("emb_a"), col("emb_b"), col("nrm_a"), col("nrm_b")))
      .filter(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("sim"))
  }

  /** The 100 TB near-dup path: block candidate pairs by IVF cell, verify
    * exact cosine within each cell. O(n²/nCentroids)-ish instead of O(n²);
    * recall < 1 (pairs straddling every shared cell are missed). Recall
    * knob: `cellsPerVec` assigns each vector to its top-N cells (the
    * standard multi-assignment trick) — 2 catches most boundary-straddling
    * pairs for ~2× candidate volume; the `distinct()` dedups pairs that
    * share several cells. Measured against the exact op in ExtensionSpec. */
  def nearDupCosineBlocked(
      embeddings: DataFrame,
      threshold: Double,
      nCentroids: Int = 16,
      cellsPerVec: Int = 2): DataFrame = {
    val cells = assignCells(embeddings, nCentroids, cellsPerVec)
    val a = cells.select(col("cell"), col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"), col("__nrm").as("nrm_a"))
    val b = cells.select(col("cell"), col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"), col("__nrm").as("nrm_b"))
    a.join(b, Seq("cell"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("sim", cosineFromNorms(col("emb_a"), col("emb_b"), col("nrm_a"), col("nrm_b")))
      .filter(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("sim"))
      .distinct()
  }

  /** The `nCentroids` lowest-id vectors as a broadcastable centroid table. */
  private def centroidsOf(c: DataFrame, nCentroids: Int): DataFrame =
    broadcast(
      c.orderBy(col("vec_id")).limit(nCentroids)
        .select(col("vec_id").as("cell"), col("embedding").as("cvec"), col("__nrm").as("cnrm")))

  private def assignCellsWith(
      c: DataFrame, centroids: DataFrame, topCells: Int = 1): DataFrame = {
    require(topCells >= 1, s"topCells must be >= 1: $topCells")
    val w = Window.partitionBy(col("vec_id")).orderBy(col("__d").desc, col("cell"))
    c.crossJoin(centroids)
      .withColumn("__d", cosineFromNorms(col("embedding"), col("cvec"), col("__nrm"), col("cnrm")))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= topCells)
      .select(col("vec_id"), col("embedding"), col("__nrm"), col("cell"))
  }

  /** IVF cell assignment: centroids = the `nCentroids` lowest-id corpus
    * vectors (deterministic, training-free; swap in k-means centroids for
    * production recall). Returns corpus rows tagged with `cell`; with
    * `topCells` > 1 each vector appears once per assigned cell (rank by
    * rounded cosine desc, cell-id tie-break — deterministic, so oracles
    * can replay multi-assignment as `r <= topCells`). */
  def assignCells(corpus: DataFrame, nCentroids: Int, topCells: Int = 1): DataFrame = {
    val c = withNorm(corpus, "vec_id", "embedding")
    assignCellsWith(c, centroidsOf(c, nCentroids), topCells)
  }

  /** Cell assignment against an EXPLICIT centroid table (cell, cvec, cnrm)
    * — e.g. one trained by [[kmeansCentroids]] — for callers that manage
    * their own centroids or want to inspect a trained partition. */
  def assignCellsTo(corpus: DataFrame, centroids: DataFrame, topCells: Int = 1): DataFrame =
    assignCellsWith(withNorm(corpus, "vec_id", "embedding"), broadcast(centroids), topCells)

  /** Diversity sampling — the embedding-space curation step of a training
    * pipeline: a subset that covers the space instead of oversampling dense
    * regions. Cell-stratified: assign IVF cells (deterministic seed
    * centroids), keep `perCell` vectors per cell chosen by md5 order — a
    * deterministic pseudo-random draw WITHIN each region, so dense cells
    * are capped and sparse cells survive whole. Greedy k-center would
    * serialize the cluster; this is its shuffle-partitionable stand-in
    * (cells ≈ coverage regions). Fully replayable by the SQL oracle. */
  /** Greedy k-center / farthest-point traversal (Gonzalez 1985) over
    * embeddings — the COVERAGE-maximizing seed selection for curation:
    * start at the minimum vec_id, then each round add the point whose
    * cosine distance to its NEAREST already-selected center is largest
    * (ties: dist desc, vec_id asc). A 2-approximation of the optimal
    * k-center cover, and the complement of [[semDedup]]/
    * [[diversitySample]]: those REMOVE redundancy cell-locally, this
    * SELECTS a globally spread skeleton (eval probes, annotation
    * batches, cluster seeds).
    *
    * Determinism: distances are round-6 cosines off precomputed norms
    * (the [[dot]] fold order the oracle replays), so every argmax is a
    * total-order decision. Plan per round: ONE 1-row broadcast (the
    * new center) refreshes each point's running min-distance —
    * O(n·k) distance evals total, k materialized rounds (lineage cut
    * per round, the iterative-kernel discipline), the per-round argmax
    * is TakeOrdered. Nothing is ever all-pairs; rows partition freely.
    *
    * Returns one row per selected center: (rank 1..k, vec_id, dist =
    * the point's min-distance at selection — the k-center radius
    * sequence; null for rank 1). A monotonically non-increasing dist
    * column IS the coverage curve: stop where it elbows. */
  def kCenterGreedy(embeddings: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64]: $k")
    val pts = withNorm(embeddings.select(col("vec_id"), col("embedding")),
      "vec_id", "embedding")
    val first = broadcast(pts.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id").as("__cid"), col("embedding").as("__cemb"),
        col("__nrm").as("__cnrm")))
    var state = pts.crossJoin(first)
      .select(col("vec_id"), col("embedding"), col("__nrm"),
        (lit(1.0) - cosineFromNorms(col("embedding"), col("__cemb"),
          col("__nrm"), col("__cnrm"))).as("dmin"),
        when(col("vec_id") === col("__cid"), lit(1L)).as("sel_rank"),
        lit(null).cast("double").as("d_at_sel"))
      .materialize
    (2 to k).foreach { r =>
      val c = broadcast(state.filter(col("sel_rank").isNull)
        .orderBy(col("dmin").desc, col("vec_id")).limit(1)
        .select(col("vec_id").as("__cid"), col("embedding").as("__cemb"),
          col("__nrm").as("__cnrm")))
      state = state.crossJoin(c)
        .select(col("vec_id"), col("embedding"), col("__nrm"),
          when(col("sel_rank").isNotNull, col("dmin"))
            .otherwise(least(col("dmin"),
              lit(1.0) - cosineFromNorms(col("embedding"), col("__cemb"),
                col("__nrm"), col("__cnrm")))).as("dmin"),
          when(col("vec_id") === col("__cid"), lit(r.toLong))
            .otherwise(col("sel_rank")).as("sel_rank"),
          when(col("vec_id") === col("__cid"), col("dmin"))
            .otherwise(col("d_at_sel")).as("d_at_sel"))
        .materialize
    }
    state.filter(col("sel_rank").isNotNull)
      .select(col("sel_rank").as("rank"), col("vec_id"),
        round(col("d_at_sel"), 6).as("dist"))
  }

  def diversitySample(embeddings: DataFrame, perCell: Int = 3, nCentroids: Int = 16): DataFrame = {
    require(perCell > 0, s"perCell must be positive: $perCell")
    val w = Window.partitionBy(col("cell"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
    assignCells(embeddings, nCentroids)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= perCell)
      .select(col("vec_id"), col("cell"), col("rk"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space, then within each
    * cluster drop every vector that has a LOWER-id neighbor with cosine ≥
    * `threshold` — one survivor per near-duplicate group, chosen by the
    * deterministic min-id rule so the kept set is partition-invariant and
    * SQL-replayable. Clustering reuses [[assignCells]]'s training-free seed
    * centroids (lowest-id vectors), the same assignment the IVF oracle
    * already replays bit-for-bit. Scale: the pairwise compare is confined
    * to within-cell pairs — O(Σ cell²) not O(n²) — and cell size is
    * controlled by `nCentroids`; at 100 TB raise `nCentroids` ∝ corpus so
    * cells stay bounded (SemDeDup's own recipe). The anti-join back is
    * shuffle-aligned on `vec_id`. */
  def semDedup(embeddings: DataFrame, threshold: Double, nCentroids: Int = 16): DataFrame = {
    val cells = assignCells(embeddings, nCentroids)
    val a = cells.select(col("cell"), col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"), col("__nrm").as("nrm_a"))
    val b = cells.select(col("cell"), col("vec_id"),
      col("embedding").as("emb_b"), col("__nrm").as("nrm_b"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("vec_a") < col("vec_id"))
      .filter(cosineFromNorms(col("emb_a"), col("emb_b"), col("nrm_a"), col("nrm_b")) >= threshold)
      .select(col("vec_id"))
      .distinct()
    cells.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cell"))
  }

  /** Lloyd-refined centroids: seed with the lowest-id vectors, then
    * `iters` rounds of assign → per-cell element-wise mean. All columnar
    * (posexplode to (cell, dim) → avg → regroup into an array); one
    * assignment cross-join + one aggregate per round, lineage truncated per
    * iteration. Cells that end up empty drop out (their probes fall to the
    * surviving cells). Float means are aggregation-order-dependent, so
    * trained centroids are NOT bit-reproducible across partitionings —
    * use the training-free seeds where hash-stable output matters.
    *
    * Measured caveat (r11 adversarial smoke): on a cloud where most
    * vectors share ONE tight direction, Lloyd under cosine COLLAPSES the
    * blob's seed centroids into near-duplicates — their means converge
    * to the blob mean, the (sim, cell) tie-break lumps the whole blob
    * into the lowest surviving cell, and trained cells end up MORE
    * skewed than the untrained seeds (max occupancy 7224/8000 vs
    * 1388/8000 at 16 cells). Training buys recall on naturally
    * multi-modal data, not balance on adversarial data — the skew valve
    * is ivfTopK's salt-splitting `cellCap`, which rebalances a hot cell
    * without touching the candidate set. */
  def kmeansCentroids(corpus: DataFrame, nCentroids: Int, iters: Int): DataFrame =
    kmeansCentroidsFrom(
      withNorm(corpus, "vec_id", "embedding").materialize, nCentroids, iters)

  /** Training loop over an ALREADY-normalized (and ideally materialized)
    * corpus — lets ivfTopK reuse its own norm table instead of re-running
    * the two-Exchange norm pipeline once per Lloyd iteration. */
  private def kmeansCentroidsFrom(c: DataFrame, nCentroids: Int, iters: Int): DataFrame = {
    var cent = centroidsOf(c, nCentroids)
    for (_ <- 0 until iters) {
      val refined = assignCellsWith(c, cent)
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("dims"))
        .select(
          col("cell"),
          transform(col("dims"), d => d.getField("m").cast("float")).as("cvec"))
        .withColumn("cnrm", sqrt(dot(col("cvec"), col("cvec"))))
        .materialize
      cent = broadcast(refined)
    }
    cent
  }

  /** md5 hex digest (lowercase), matching DuckDB's `md5(varchar)`. */
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Deterministic ±1 hyperplane signs for signed-random-projection LSH:
    * sign(p, d) = parity of the 60-bit md5 prefix of "srp:p:d". Derived from
    * md5 (not an RNG) so the DuckDB oracle reproduces the exact same
    * hyperplanes — which makes SRP the one approximate-similarity tier that
    * is fully hash-oracle-able, unlike the IVF/cell paths whose centroids
    * depend on float aggregation order. */
  def srpSigns(planes: Int, dims: Int): Seq[Array[Float]] =
    Seq.tabulate(planes) { p =>
      Array.tabulate(dims) { d =>
        val v = java.lang.Long.parseLong(md5Hex(s"srp:$p:$d").substring(0, 15), 16)
        if (v % 2 == 0) 1f else -1f
      }
    }

  /** Pack the `planes` SRP bits into one long: bit p = (vec · signs(p) ≥ 0).
    * Each plane is a codegen'd [[DotProductFloat]] against a literal sign
    * array — `planes × dims` fused multiply-adds per row, no shuffle, no UDF.
    * Two vectors at cosine angle θ agree on each bit with prob 1 − θ/π
    * (Charikar 2002), so signature hamming distance estimates the angle. */
  def srpSignatureCol(vec: Column, signs: Seq[Array[Float]]): Column = {
    require(signs.nonEmpty && signs.size <= 62, s"planes must be in [1, 62]: ${signs.size}")
    signs.zipWithIndex.map { case (s, p) =>
      when(dot(vec, typedlit(s.toSeq)) >= 0d, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** The embedding dimensionality, read from one row (a schema-discovery
    * scalar lookup at plan-build time, not a data materialization).
    * Explicit errors for the two states `head().getInt` would obscure:
    * an empty input (legitimate after aggressive upstream filtering) and a
    * NULL/empty first vector. */
  private def dimsOf(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).limit(1).collect().headOption match {
      case Some(r) if !r.isNullAt(0) && r.getInt(0) > 0 => r.getInt(0)
      case Some(_) =>
        sys.error(s"first '$vecCol' row is NULL or empty — cannot derive vector dimensionality")
      case None =>
        sys.error(s"empty input — cannot derive vector dimensionality from '$vecCol'")
    }

  /** (vec_id, srp_sig) signature table — deterministic, so hash-matchable
    * against the DuckDB oracle bit-for-bit. Probes [[dimsOf]] once; a
    * caller composing several SRP stages over the same frame threads
    * its own probe through [[srpSignaturesWithDims]] instead (the PQ
    * `…WithDims` discipline from the round-11 ADVICE, extended to the
    * SRP family in round 13). */
  def srpSignatures(embeddings: DataFrame, planes: Int = 32): DataFrame =
    srpSignaturesWithDims(embeddings, planes, dimsOf(embeddings, "embedding"))

  /** [[srpSignatures]] with the embedding dimensionality supplied by
    * the caller — zero data jobs at plan-build time. */
  def srpSignaturesWithDims(embeddings: DataFrame, planes: Int, dims: Int): DataFrame = {
    val signs = srpSigns(planes, dims)
    embeddings.select(col("vec_id"), srpSignatureCol(col("embedding"), signs).as("srp_sig"))
  }

  /** SRP-LSH near-dup: band the `planes`-bit signature into `bands` keys,
    * candidate pairs share any band, verify exact cosine ≥ threshold.
    *
    * The cosine-LSH sibling of [[nearDupCosineBlocked]]: same band-join shape
    * as MinHash-LSH (equi-join on (band, key) — shuffle-partitionable, no
    * all-pairs), but with deterministic hyperplanes end-to-end, so candidates
    * AND verdicts are reproducible by the SQL oracle. Recall tuning: more
    * bands of fewer bits → higher recall, bigger buckets; production at
    * 100 TB would raise planes toward the packed-long cap of 62 and band
    * bits (8–16) together so bucket sizes stay ~n/2^bits (beyond 62 planes
    * the signature would need array-of-long packing). */
  def nearDupCosineSrp(
      embeddings: DataFrame,
      threshold: Double,
      planes: Int = 32,
      bands: Int = 8): DataFrame =
    nearDupCosineSrpWithDims(embeddings, threshold, planes, bands,
      dimsOf(embeddings, "embedding"))

  /** [[nearDupCosineSrp]] with the embedding dimensionality supplied
    * by the caller — zero data jobs at plan-build time. */
  def nearDupCosineSrpWithDims(
      embeddings: DataFrame,
      threshold: Double,
      planes: Int,
      bands: Int,
      dims: Int): DataFrame = {
    require(planes % bands == 0, s"bands ($bands) must divide planes ($planes)")
    val bandBits = planes / bands
    val mask = (1L << bandBits) - 1
    val signs = srpSigns(planes, dims)
    val sigs = withNorm(embeddings, "vec_id", "embedding")
      .withColumn("__sig", srpSignatureCol(col("embedding"), signs))
    val banded = sigs.select(
      col("vec_id"), col("embedding"), col("__nrm"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("__sig"), b * bandBits).bitwiseAND(lit(mask))): _*)).as(Seq("__band", "__bk")))
    val a = banded.select(col("__band"), col("__bk"), col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"), col("__nrm").as("nrm_a"))
    val b = banded.select(col("__band"), col("__bk"), col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"), col("__nrm").as("nrm_b"))
    a.join(b, Seq("__band", "__bk"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("sim", cosineFromNorms(col("emb_a"), col("emb_b"), col("nrm_a"), col("nrm_b")))
      .filter(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("sim"))
      .distinct()
  }

  /** Multi-probe SRP-LSH near-dup — [[nearDupCosineSrp]] plus the standard
    * recall booster (Lv et al. 2007): candidates also include pairs whose
    * band keys differ in ONE bit, because a near-threshold pair that
    * narrowly misses every exact bucket is usually one flipped hyperplane
    * away. ONE join side explodes each band key into 1 + bandBits probe
    * keys (the exact key and each 1-bit flip); the other side keeps exact
    * keys, so a Hamming-1 pair meets on the flipped probe — still an
    * equi-join on (band, key), shuffle-partitionable, no all-pairs. The
    * price is ×(bandBits+1) candidate-side rows pre-verify; verification
    * (exact cosine) is unchanged. Deterministic end-to-end: the oracle
    * states the candidate rule closed-form as
    * `bit_count(xor(bk_a, bk_b)) <= 1` per band. */
  def nearDupCosineSrpMultiProbe(
      embeddings: DataFrame,
      threshold: Double,
      planes: Int = 32,
      bands: Int = 8): DataFrame =
    nearDupCosineSrpMultiProbeWithDims(embeddings, threshold, planes,
      bands, dimsOf(embeddings, "embedding"))

  /** [[nearDupCosineSrpMultiProbe]] with the embedding dimensionality
    * supplied by the caller — zero data jobs at plan-build time. */
  def nearDupCosineSrpMultiProbeWithDims(
      embeddings: DataFrame,
      threshold: Double,
      planes: Int,
      bands: Int,
      dims: Int): DataFrame = {
    require(planes % bands == 0, s"bands ($bands) must divide planes ($planes)")
    val bandBits = planes / bands
    val mask = (1L << bandBits) - 1
    val signs = srpSigns(planes, dims)
    val sigs = withNorm(embeddings, "vec_id", "embedding")
      .withColumn("__sig", srpSignatureCol(col("embedding"), signs))
    val banded = sigs.select(
      col("vec_id"), col("embedding"), col("__nrm"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("__sig"), b * bandBits).bitwiseAND(lit(mask))): _*)).as(Seq("__band", "__bk")))
    val probeKeys: Seq[Column] =
      col("__bk") +: (0 until bandBits).map(i => col("__bk").bitwiseXOR(lit(1L << i)))
    val a = banded.select(
      col("vec_id").as("vec_a"), col("embedding").as("emb_a"), col("__nrm").as("nrm_a"),
      col("__band"), explode(array(probeKeys: _*)).as("__bk"))
    val b = banded.select(col("__band"), col("__bk"), col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"), col("__nrm").as("nrm_b"))
    // cosine inline per candidate ROW (codegen'd fused multiply-adds, no
    // shuffle), distinct only on the small verified set — same shape as
    // [[nearDupCosineSrp]]. A pre-verify pair-dedupe looks cheaper on paper
    // but shuffles the embedding payload for EVERY candidate (measured:
    // 127 s vs 12 s at 20× smoke); redundant per-row cosines are the
    // cheaper redundancy. Multi-probe amplifies bucket volume ×(bandBits+1),
    // so production pairs it with MORE band bits (the documented knob), not
    // fewer.
    a.join(b, Seq("__band", "__bk"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("sim", cosineFromNorms(col("emb_a"), col("emb_b"), col("nrm_a"), col("nrm_b")))
      .filter(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("sim"))
      .distinct()
  }

  /** Symmetric int8 quantization, the storage/serving compression step of an
    * embedding pipeline: per-vector scale = max|v| / 127, q_i = round(v_i /
    * scale) ∈ [−127, 127]. A narrow map (no shuffle); 4× smaller than float32
    * with bounded dequantization error |v − q·scale| ≤ scale/2. Zero vectors
    * quantize to zeros with scale 0. The scale is emitted rounded to 6 dp
    * (oracle parity); `qvec` stays exact integers. */
  def quantizeInt8(embeddings: DataFrame, vecCol: String = "embedding"): DataFrame =
    // __ma is materialized behind an Exchange: referenced inside the
    // transform lambda from the same Project it would re-evaluate the whole
    // array_max per ELEMENT (HOFs are interpreted and CollapseProject has no
    // CSE — the measured cliff documented in Dedup/TextAnalysis).
    embeddings
      .repartition(col("vec_id"))
      .select(col("vec_id"), col(vecCol),
        array_max(transform(col(vecCol), v => abs(v.cast("double")))).as("__ma"))
      .repartition(col("vec_id"))
      .select(
        col("vec_id"),
        round(col("__ma") / 127d, 6).as("scale"),
        when(col("__ma") === 0d, transform(col(vecCol), _ => lit(0)))
          .otherwise(transform(col(vecCol), v =>
            round(v.cast("double") * 127d / col("__ma")).cast("int")))
          .as("qvec"))

  /** Per-label embedding centroids — the class-summary / semantic-drift
    * probe of an embedding pipeline (compare a shard's centroid against
    * the corpus's to spot distribution shift). One posexplode + one hash
    * aggregate with map-side partial combine: shuffle ∝ labels × dims,
    * never vectors.
    *
    * Determinism: a distributed float mean is partial-sum-order-dependent
    * (IEEE addition is non-associative), which would break the hash oracle
    * — so each float is first scaled to an EXACT 2^24 fixed-point long
    * (float mantissas are 24 bits; the products are exact for |x| < 2^15)
    * and the mean is integer-summed, then rescaled. Same cents-style
    * exactness trick as Cdc.snapshotDiff. */
  def labelCentroids(
      embeddings: DataFrame,
      labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame =
    embeddings
      .select(col(labelCol), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col(labelCol), col("dim"))
      .agg(
        count(lit(1)).cast("long").as("n"),
        round(
          sum(round(col("x").cast("double") * 16777216d).cast("long")).cast("double")
            / count(lit(1)) / 16777216d,
          6).as("centroid"))
      .withColumn("dim", col("dim").cast("long"))

  /** Per-dimension Fisher separability of the labels — "how much of
    * this embedding dimension's variance is BETWEEN classes?": the
    * classic between/within scatter ratio B/W per dim, the
    * embedding-quality diagnostic that tells a training pipeline which
    * dimensions carry label signal (and whether the space separates at
    * all) before any classifier runs. Exactness: values quantize to
    * 2²⁴ fixed-point on entry (the [[labelCentroids]] trick), per-label
    * means round to INTEGER fixed-point, and both scatters assemble in
    * DECIMAL from integer moments — W = Σ_l (Σq² − 2μ_l·Σq + n_l·μ_l²),
    * B = Σ_l n_l·(μ_l − μ̄)² — so the cross-label sums are
    * order-independent and the oracle replays them exactly (the integer
    * rounding of μ is a documented ~2⁻²⁴ quantization, identical in
    * both engines). One (dim, label) aggregate + a k·d-row finish;
    * scatter tables never exceed labels × dims. */
  def fisherRatio(
      embeddings: DataFrame,
      labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame = {
    val q = round(col("x").cast("double") * 16777216d).cast("long")
    val per = embeddings
      .select(col(labelCol).as("lbl"), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("lbl"), (col("dim") + 1).cast("long").as("dim"), col("x"))
      .groupBy(col("dim"), col("lbl"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(q).cast("long").as("s"),
        sum(q.cast("decimal(38,0)") * q).cast("decimal(38,0)").as("sq"))
      .withColumn("mu",
        expr("CAST(ROUND(CAST(s AS DOUBLE) / n, 0) AS BIGINT)"))
      .materialize // k·d rows; feeds the global means + finish
    val glob = per.groupBy(col("dim"))
      .agg(sum(col("n")).cast("long").as("nn"),
        sum(col("s")).cast("long").as("ss"))
      .withColumn("mug",
        expr("CAST(ROUND(CAST(ss AS DOUBLE) / nn, 0) AS BIGINT)"))
      .select(col("dim"), col("mug"))
    per.join(glob, Seq("dim"))
      .withColumn("w_l",
        col("sq") - col("mu").cast("decimal(38,0)") * col("s") * 2
          + col("n").cast("decimal(38,0)") * col("mu") * col("mu"))
      .withColumn("b_l",
        col("n").cast("decimal(38,0)") * (col("mu") - col("mug"))
          * (col("mu") - col("mug")))
      .groupBy(col("dim"))
      .agg(count(lit(1)).cast("long").as("k_labels"),
        sum(col("w_l")).cast("decimal(38,0)").as("w"),
        sum(col("b_l")).cast("decimal(38,0)").as("b"))
      .withColumn("fisher", expr(fisherSql))
      .withColumn("w", col("w").cast("string"))
      .withColumn("b", col("b").cast("string"))
  }

  /** B/W over the exact decimal scatters; NULL when within-scatter is
    * zero (constant dimension per label). Shared with the oracle. */
  val fisherSql: String =
    "CASE WHEN CAST(w AS DOUBLE) > 0 THEN " +
      "round(CAST(b AS DOUBLE) / CAST(w AS DOUBLE), 6) END"

  /** One hash-stable Lloyd iteration, exposed as a first-class operator:
    * seed centroids = lowest-id vectors (deterministic), assign every
    * vector to its nearest centroid by rounded cosine (cell-id tie-break),
    * and emit the refined centroids in exact 2^24 fixed-point — the
    * [[labelCentroids]] trick, so the distributed mean is
    * aggregation-order-independent and the DuckDB oracle replays the whole
    * step bit-for-bit (unlike [[kmeansCentroids]]' float means, which are
    * documented as not hash-reproducible).
    *
    * Scale shape: the centroid table is broadcast (nCentroids rows); the
    * assignment is a narrow map over the corpus scan (codegen'd dot
    * product, no shuffle); the refinement is ONE (cell, dim)-keyed hash
    * aggregate with map-side combine. Per-iteration cost is linear in
    * corpus size — the canonical distributed k-means step. */
  def kmeansStep(embeddings: DataFrame, nCentroids: Int = 8): DataFrame = {
    val c = withNorm(embeddings, "vec_id", "embedding")
    assignCellsWith(c, centroidsOf(c, nCentroids))
      .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("cell"), col("dim"))
      .agg(
        count(lit(1)).cast("long").as("n"),
        round(
          sum(round(col("x").cast("double") * 16777216d).cast("long")).cast("double")
            / count(lit(1)) / 16777216d,
          6).as("centroid"))
      .withColumn("dim", col("dim").cast("long"))
  }

  /** Multi-round Lloyd that stays HASH-REPRODUCIBLE — the [[kmeansStep]]
    * exact 2^24 fixed-point mean CHAINED: each refinement's per-dim means
    * are exact integers divided once and rounded(6), the centroid vector
    * is that rounded list cast to FLOAT (both engines round-to-nearest
    * identically), and the next assignment's rounded cosine therefore
    * starts from bit-identical centroids — so unlike [[kmeansCentroids]]'
    * float means (documented non-reproducible), the WHOLE multi-round
    * trajectory replays in the DuckDB oracle. `rounds = 1` degenerates to
    * [[kmeansStep]] exactly (spec-pinned). Cells emptied by a refinement
    * drop out on both engines (standard Lloyd semantics under fixed
    * seeds). Output = the final assignment aggregated as
    * (cell, dim, n, centroid).
    *
    * Scale shape per round: one broadcast of the nCentroids-row table,
    * one narrow codegen'd assignment map over the corpus, one
    * (cell, dim)-keyed aggregate with map-side combine — linear in corpus
    * size, the canonical distributed k-means; the corpus norm table is
    * materialized ONCE for all rounds. */
  def kmeansLloydExact(
      embeddings: DataFrame, nCentroids: Int = 8,
      rounds: Int = 3): DataFrame = {
    require(nCentroids >= 2 && nCentroids <= 4096,
      s"nCentroids must be in [2, 4096]: $nCentroids")
    require(rounds >= 1 && rounds <= 6,
      s"rounds must be in [1, 6] (each is one corpus pass + an unrolled " +
        s"oracle round): $rounds")
    val c = withNorm(embeddings, "vec_id", "embedding").materialize
    var cent = centroidsOf(c, nCentroids)
    (1 until rounds).foreach { _ =>
      val refined = assignCellsWith(c, cent)
        .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg(round(
          sum(round(col("x").cast("double") * 16777216d).cast("long"))
            .cast("double") / count(lit(1)) / 16777216d, 6).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dims"))
        .select(col("cell"),
          transform(col("dims"), d => d.getField("m").cast("float")).as("cvec"))
        .withColumn("cnrm", sqrt(dot(col("cvec"), col("cvec"))))
        .materialize
      cent = broadcast(refined)
    }
    assignCellsWith(c, cent)
      .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("cell"), col("dim"))
      .agg(
        count(lit(1)).cast("long").as("n"),
        round(
          sum(round(col("x").cast("double") * 16777216d).cast("long")).cast("double")
            / count(lit(1)) / 16777216d,
          6).as("centroid"))
      .withColumn("dim", col("dim").cast("long"))
  }

  /** Unrolled [[kmeansLloydExact]] oracle (full statement): the
    * q_kmeans_step assignment/fixed-point-mean CTE pair repeated per
    * round, centroids rebuilt as FLOAT-cast lists between rounds (the
    * same cast the engine applies), final round emitted step-style. */
  def kmeansLloydOracleSql(nCentroids: Int, rounds: Int): String = {
    def assign(r: Int) =
      s"""a$r AS MATERIALIZED (SELECT vec_id, embedding, cell FROM (
         |    SELECT q.vec_id, q.embedding, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY round(list_sum([CAST(q.embedding[i] AS DOUBLE)*CAST(c.cvec[i] AS DOUBLE)
         |  FOR i IN range(1, len(q.embedding)+1)]) / (q.nrm * c.cnrm), 6) DESC, c.cell) AS r
         |    FROM n q CROSS JOIN cent${r - 1} c)
         |  WHERE r = 1)""".stripMargin
    val refines = (1 until rounds).map { r =>
      s"""${assign(r)},
         |m$r AS MATERIALIZED (SELECT cell, CAST(i - 1 AS BIGINT) AS dim,
         |    round(CAST(SUM(CAST(round(CAST(e[i] AS DOUBLE) * 16777216) AS BIGINT)) AS DOUBLE)
         |      / COUNT(*) / 16777216, 6) AS m
         |  FROM (SELECT cell, embedding AS e,
         |          unnest(range(1, len(embedding)+1)) AS i
         |        FROM a$r)
         |  GROUP BY cell, dim),
         |cent$r AS MATERIALIZED (SELECT cell, cvec,
         |    sqrt(list_sum(list_transform(cvec,
         |      x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS cnrm
         |  FROM (SELECT cell,
         |      list_transform(list(m ORDER BY dim), x -> CAST(x AS FLOAT))
         |        AS cvec
         |    FROM m$r GROUP BY cell))""".stripMargin
    }.mkString(",\n")
    val chain = if (rounds > 1) s"$refines,\n${assign(rounds)}"
      else assign(rounds)
    s"""WITH n AS MATERIALIZED (SELECT vec_id, embedding,
       |  sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
       |FROM embeddings),
       |cent0 AS (SELECT vec_id AS cell, embedding AS cvec, nrm AS cnrm
       |  FROM n ORDER BY vec_id LIMIT $nCentroids),
       |$chain,
       |ex AS (SELECT cell, CAST(i - 1 AS BIGINT) AS dim,
       |    CAST(round(CAST(e[i] AS DOUBLE) * 16777216) AS BIGINT) AS fx
       |  FROM (SELECT cell, embedding AS e,
       |          unnest(range(1, len(embedding)+1)) AS i
       |        FROM a$rounds))
       |SELECT cell, dim, CAST(COUNT(*) AS BIGINT) AS n,
       |  round(CAST(SUM(fx) AS DOUBLE) / COUNT(*) / 16777216, 6) AS centroid
       |FROM ex GROUP BY cell, dim""".stripMargin
  }

  /** IVF approximate top-k: probe the `nprobe` cells nearest to each query,
    * exact-rank within the probed subset. Recall rises with nprobe (query
    * side) and `cellsPerVec` (corpus side: each vector indexed under its
    * top-N cells, so boundary vectors stay findable from either adjacent
    * cell — the `distinct()` dedups (query, vector) pairs reached through
    * several shared cells). Cost ~ cellsPerVec·nprobe/nCentroids of brute
    * force.
    *
    * `cellCap` is the HOT-CELL valve (the IVF analogue of the LSH bucket
    * caps, measured in the r11 adversarial smoke — a clustered cloud can
    * land most of the corpus in one cell): cells holding more than
    * `cellCap` vectors are SALT-SPLIT into ceil(n/cellCap) sub-cells by
    * vec_id, and probes of a split cell fan out to every salt. Unlike a
    * candidate cap this is output-INVARIANT — the same (query, vector)
    * pairs are scored, just across many tasks instead of one straggler —
    * so a search index never silently loses recall (a dedup bucket can
    * degrade; a top-k index cannot). 0 disables. */
  def ivfTopK(
      queries: DataFrame,   // (qid, qvec)
      corpus: DataFrame,    // (vec_id, embedding)
      k: Int,
      nCentroids: Int = 16,
      nprobe: Int = 4,
      trainIters: Int = 0,
      cellsPerVec: Int = 2,
      cellCap: Int = 0): DataFrame = {
    // ONE withNorm + ONE centroid table feed the training loop, the cell
    // assignment, and the query probes. The trained path materializes the
    // norm table first (localCheckpoint) so Lloyd iterations and the final
    // assignment read it instead of re-running the norm pipeline per pass.
    val c0 = withNorm(corpus, "vec_id", "embedding")
    val c = if (trainIters > 0) c0.materialize else c0
    val centroids =
      if (trainIters > 0) kmeansCentroidsFrom(c, nCentroids, trainIters)
      else centroidsOf(c, nCentroids)
    val cells0 = assignCellsWith(c, centroids, cellsPerVec)
    val q = withNorm(queries, "qid", "qvec").withColumnRenamed("__nrm", "__qnrm")
    val wq = Window.partitionBy(col("qid")).orderBy(col("__d").desc, col("cell"))
    val probes0 = q
      .crossJoin(centroids)
      .withColumn("__d", cosineFromNorms(col("qvec"), col("cvec"), col("__qnrm"), col("cnrm")))
      .withColumn("__r", row_number().over(wq))
      .filter(col("__r") <= nprobe)
      .select(col("qid"), col("qvec"), col("__qnrm"), col("cell"))
    val (probes, cells) =
      if (cellCap <= 0)
        (probes0.withColumn("salt", lit(0L)),
          cells0.withColumn("salt", lit(0L)))
      else {
        // nCentroids-row salt table, always broadcastable
        val salts = cells0.groupBy(col("cell"))
          .agg(count(lit(1)).cast("long").as("__n"))
          .select(col("cell"),
            ceil(col("__n").cast("double") / cellCap)
              .cast("long").as("n_salts"))
        (probes0.join(broadcast(salts), "cell")
          .withColumn("salt",
            explode(expr("sequence(0L, n_salts - 1)")))
          .drop("n_salts"),
          cells0.join(broadcast(salts), "cell")
            .withColumn("salt", pmod(col("vec_id"), col("n_salts")))
            .drop("n_salts"))
      }
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    probes
      // shuffle join on (cell, salt) — each query scans only probed
      // cells, and a hot cell's scan spreads across its salts
      .join(cells, Seq("cell", "salt"))
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("sim", cosineFromNorms(col("qvec"), col("embedding"), col("__qnrm"), col("__nrm")))
      .select(col("qid"), col("vec_id"), col("sim"))
      .distinct() // a vector reachable via 2 shared cells must rank once
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("sim"), col("rank"))
  }

  /** Simplified (centroid) silhouette per cell — the cluster-quality
    * measurement for the IVF partition the search tier rides on: for
    * each vector, a = cosine distance (1 − sim) to its OWN centroid,
    * b = distance to the nearest OTHER centroid, s = (b − a)/max(a, b)
    * ∈ [−1, 1]. Full silhouette is O(n²); the centroid form is the
    * standard at-scale substitute and reuses exactly the deterministic
    * cell ranking the IVF oracle replays (rounded cosines, cell-id tie
    * break, lowest-id centroids). Per-point s values micro-quantize
    * before the per-cell mean (order-free sums). A cell mean near 0 or
    * below says its members sit as close to a neighboring centroid as
    * their own — expect IVF multi-assignment (cellsPerVec) to matter
    * there.
    *
    * Plan: one broadcast centroid cross → two window picks on the same
    * (vec, sim) sort → one hash aggregate. */
  def silhouetteCells(
      corpus: DataFrame, nCentroids: Int = 16): DataFrame = {
    val c = withNorm(corpus, "vec_id", "embedding")
    val centroids = centroidsOf(c, nCentroids)
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("cell"))
    c.crossJoin(centroids)
      .withColumn("sim", cosineFromNorms(
        col("embedding"), col("cvec"), col("__nrm"), col("cnrm")))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= 2)
      .groupBy(col("vec_id"))
      .agg(
        max(when(col("__r") === 1, col("cell"))).as("cell"),
        max(when(col("__r") === 1, col("sim"))).as("sim_own"),
        max(when(col("__r") === 2, col("sim"))).as("sim_next"))
      .withColumn("s_micro", expr(silhouetteMicroSql))
      .groupBy(col("cell"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("s_micro")).cast("long").as("s_sum"),
        count(col("s_micro")).cast("long").as("s_n"))
      .withColumn("s_mean", expr(
        "CASE WHEN s_n > 0 THEN " +
          "round(CAST(s_sum AS DOUBLE) / s_n / 1e6, 6) END"))
  }

  /** Micro-quantized silhouette over (sim_own, sim_next): distances
    * a = 1 − sim_own, b = 1 − sim_next; NULL when both distances are 0
    * (the vector IS both centroids — undefined by convention). Shared
    * with the oracle. */
  val silhouetteMicroSql: String = {
    val a = "(1 - sim_own)"
    val b = "(1 - sim_next)"
    s"CASE WHEN greatest($a, $b) > 0 THEN " +
      s"CAST(round(1000000 * ($b - $a) / greatest($a, $b), 0) " +
      "AS BIGINT) END"
  }

  /** Leave-one-out kNN classification eval — the standard label-quality /
    * embedding-quality probe before trusting either at scale: each query
    * vector's k nearest neighbors (self excluded) vote with their labels;
    * majority (count desc, then smallest label — deterministic) is the
    * prediction, compared to the query's own label in the output. Built
    * entirely from [[bruteForceTopK]] + two bounded aggregations; swap in
    * [[ivfTopK]] for the approximate tier at corpus scale. */
  def knnEval(
      labeled: DataFrame, // (vec_id, embedding, label)
      nQueries: Long,
      k: Int): DataFrame = {
    val corpus = labeled.select(col("vec_id"), col("embedding"))
    val queries = labeled.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val labels = labeled.select(col("vec_id"), col("label").cast("long").as("label"))
    val votes = bruteForceTopK(queries, corpus, k)
      .join(labels, Seq("vec_id"))
      .groupBy(col("qid"), col("label"))
      .agg(count(lit(1)).cast("long").as("n_votes"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("n_votes").desc, col("label"))
    votes
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("qid"), col("label").as("pred_label"), col("n_votes"))
      .join(labels.select(col("vec_id").as("qid"),
        col("label").as("true_label")), Seq("qid"))
      .withColumn("correct", col("pred_label") === col("true_label"))
  }

  /** Maximal-marginal-relevance reranking — the diversity pass between
    * retrieval and the final context window: greedily pick `selectK` of
    * each query's `poolK`-candidate pool, scoring every remaining
    * candidate `0.7·relevance − 0.3·max-similarity-to-already-picked`
    * (the standard λ=0.7 MMR), so near-duplicate hits can't crowd the
    * result. Deterministic end to end: cosines are 6-rounded, the score
    * arithmetic is one shared SQL expression, ties break on vec_id — the
    * greedy trace replays exactly in the unrolled oracle ([[mmrSql]]).
    *
    * Scale shape: the sequential part is over `selectK` STEPS, not data —
    * each step is a bounded per-query argmax (pool ≤ poolK rows/query)
    * over the once-materialized pool and pairwise-sim tables. The pair
    * table is poolK² rows per query, built with one self-join of the
    * norm-tagged pool. */
  def mmrRerank(
      queries: DataFrame, corpus: DataFrame,
      poolK: Int, selectK: Int): DataFrame = {
    require(selectK >= 1 && selectK <= poolK,
      s"need 1 <= selectK <= poolK: $selectK/$poolK")
    val pool = bruteForceTopK(queries, corpus, poolK)
      .select(col("qid"), col("vec_id"), col("sim").as("rel"))
      .materialize
    val c = withNorm(corpus, "vec_id", "embedding")
    val pl = pool.select(col("qid"), col("vec_id")).join(c, Seq("vec_id"))
    val pairs = pl.as("x").join(pl.as("y"),
        col("x.qid") === col("y.qid") && col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.qid").as("qid"), col("x.vec_id").as("a"),
        col("y.vec_id").as("b"),
        cosineFromNorms(col("x.embedding"), col("y.embedding"),
          col("x.__nrm"), col("y.__nrm")).as("psim"))
      .materialize
    val w1 = Window.partitionBy(col("qid")).orderBy(col("rel").desc, col("vec_id"))
    var selected = pool
      .withColumn("rn", row_number().over(w1)).filter(col("rn") === 1)
      .select(col("qid"), col("vec_id"), lit(1L).as("pick_order"),
        col("rel").as("score"))
      .materialize
    (2 to selectK).foreach { i =>
      val ms = pairs
        .join(selected.select(col("qid"), col("vec_id").as("b")), Seq("qid", "b"))
        .groupBy(col("qid"), col("a").as("vec_id"))
        .agg(max(col("psim")).as("maxsim"))
      val cand = pool
        .join(selected.select(col("qid"), col("vec_id")), Seq("qid", "vec_id"),
          "left_anti")
        .join(ms, Seq("qid", "vec_id"))
        .withColumn("score", expr(mmrScoreSql))
      val wi = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
      val pick = cand.withColumn("rn", row_number().over(wi))
        .filter(col("rn") === 1)
        .select(col("qid"), col("vec_id"), lit(i.toLong).as("pick_order"),
          col("score"))
      selected = selected.unionByName(pick).materialize
    }
    selected
  }

  /** The MMR score over (rel, maxsim), shared verbatim with the oracle. */
  val mmrScoreSql: String = "round(0.7 * rel - 0.3 * maxsim, 6)"

  /** DuckDB unroll of the greedy MMR trace: CTEs over caller-provided
    * `pool(qid, vec_id, rel)` and `pairs(qid, a, b, psim)`. Every CTE is
    * MATERIALIZED — selall_i is referenced 3× by step i+1, so default
    * inlining would expand 3^selectK. */
  def mmrSql(selectK: Int): String = {
    val score = mmrScoreSql.replace("rel", "pool.rel")
      .replace("maxsim", s"ms.maxsim")
    val steps = (2 to selectK).map { i =>
      s"""ms$i AS MATERIALIZED (SELECT p.qid, p.a AS vec_id,
         |    MAX(p.psim) AS maxsim
         |  FROM pairs p JOIN selall${i - 1} s ON p.qid = s.qid AND p.b = s.vec_id
         |  GROUP BY 1, 2),
         |cand$i AS MATERIALIZED (SELECT pool.qid, pool.vec_id,
         |    $score AS score
         |  FROM pool JOIN ms$i ms ON pool.qid = ms.qid AND pool.vec_id = ms.vec_id
         |  WHERE NOT EXISTS (SELECT 1 FROM selall${i - 1} s
         |    WHERE s.qid = pool.qid AND s.vec_id = pool.vec_id)),
         |sel$i AS MATERIALIZED (SELECT qid, vec_id, $i AS pick_order, score
         |  FROM (SELECT qid, vec_id, score, ROW_NUMBER() OVER (
         |      PARTITION BY qid ORDER BY score DESC, vec_id) AS rn FROM cand$i)
         |  WHERE rn = 1),
         |selall$i AS MATERIALIZED (SELECT * FROM selall${i - 1}
         |  UNION ALL SELECT * FROM sel$i)""".stripMargin
    }.mkString(",\n")
    s"""sel1 AS MATERIALIZED (SELECT qid, vec_id, 1 AS pick_order, rel AS score
       |  FROM (SELECT qid, vec_id, rel, ROW_NUMBER() OVER (
       |      PARTITION BY qid ORDER BY rel DESC, vec_id) AS rn FROM pool)
       |  WHERE rn = 1),
       |selall1 AS MATERIALIZED (SELECT * FROM sel1),
       |$steps
       |SELECT qid, vec_id, CAST(pick_order AS BIGINT) AS pick_order, score
       |FROM selall$selectK""".stripMargin
  }

  /** Top principal component by POWER ITERATION on the
    * [[gramCovariance]] matrix — the PCA/whitening entry point that
    * never materializes more than the d×d matrix: the corpus is touched
    * exactly once (the Gramian pass); every iteration is a join+aggregate
    * over d² tiny rows. The iteration state is micro-quantized: v lives
    * on the 10⁻⁶ grid, each product cov·v rounds to an exact long BEFORE
    * the d-term sum, and renormalization is one double divide per entry —
    * so the float work is order-independent and the whole 12-step
    * trajectory (including the eigenvector's sign, fixed by the e₀ start)
    * replays bit-for-bit in the unrolled SQL oracle ([[pcaPowerSql]]).
    * Output: one row per dimension (i, v_micro) with the Rayleigh
    * eigenvalue repeated alongside. */
  def pcaPower(
      embeddings: DataFrame,
      vecCol: String = "embedding",
      iters: Int = 12): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val covUpper = gramCovariance(embeddings, vecCol)
      .select(col("i"), col("j"), col("cov"))
    val cov = covUpper.unionByName(covUpper.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("cov")))
      .materialize
    var v = cov.select(col("i")).distinct()
      .withColumn("v_micro",
        when(col("i") === 0L, 1000000L).otherwise(0L))
      .materialize
    def multiply(vec: DataFrame): DataFrame = cov
      .join(vec.select(col("i").as("j"), col("v_micro")), Seq("j"))
      .groupBy(col("i"))
      .agg(sum(expr("CAST(ROUND(cov * v_micro, 0) AS BIGINT)"))
        .cast("long").as("w"))
    (1 to iters).foreach { _ =>
      val w = multiply(v)
      val nrm = broadcast(w.agg(sum(col("w") * col("w")).cast("long").as("ss")))
      v = w.crossJoin(nrm)
        .select(col("i"), expr(
          "CAST(ROUND(CAST(w AS DOUBLE) * 1000000.0 / sqrt(CAST(ss AS DOUBLE)), 0) AS BIGINT)")
          .as("v_micro"))
        .materialize
    }
    val wf = multiply(v).materialize
    val num = wf.join(v, Seq("i"))
      .agg(sum(col("w") * col("v_micro")).cast("long").as("num"))
    val den = v.agg(sum(col("v_micro") * col("v_micro")).cast("long").as("den"))
    v.crossJoin(broadcast(num.crossJoin(den)))
      .select(col("i"), col("v_micro"),
        expr("round(CAST(num AS DOUBLE) / den, 6)").as("eigenvalue"))
  }

  /** DuckDB unroll of [[pcaPower]] over a caller-provided
    * `cov(i, j, cov)` CTE (symmetrized). MATERIALIZED throughout — each
    * v_t feeds w_{t+1}, the norm, and the final projection. */
  def pcaPowerSql(iters: Int): String = {
    val steps = (1 to iters).map { t =>
      s"""w$t AS MATERIALIZED (SELECT cov.i,
         |    CAST(SUM(CAST(ROUND(cov.cov * v${t - 1}.v, 0) AS BIGINT)) AS BIGINT) AS w
         |  FROM cov JOIN v${t - 1} ON cov.j = v${t - 1}.i GROUP BY 1),
         |s$t AS (SELECT CAST(SUM(w*w) AS BIGINT) AS ss FROM w$t),
         |v$t AS MATERIALIZED (SELECT i, CAST(ROUND(CAST(w AS DOUBLE) * 1000000.0
         |    / sqrt(CAST(ss AS DOUBLE)), 0) AS BIGINT) AS v FROM w$t, s$t)""".stripMargin
    }.mkString(",\n")
    s"""v0 AS MATERIALIZED (SELECT DISTINCT i,
       |    CAST(CASE WHEN i = 0 THEN 1000000 ELSE 0 END AS BIGINT) AS v
       |  FROM cov),
       |$steps,
       |wf AS MATERIALIZED (SELECT cov.i,
       |    CAST(SUM(CAST(ROUND(cov.cov * v$iters.v, 0) AS BIGINT)) AS BIGINT) AS w
       |  FROM cov JOIN v$iters ON cov.j = v$iters.i GROUP BY 1),
       |num AS (SELECT CAST(SUM(wf.w * v.v) AS BIGINT) AS num
       |  FROM wf JOIN v$iters v USING (i)),
       |den AS (SELECT CAST(SUM(v*v) AS BIGINT) AS den FROM v$iters)
       |SELECT v.i, v.v AS v_micro,
       |  round(CAST(num AS DOUBLE) / den, 6) AS eigenvalue
       |FROM v$iters v, num, den""".stripMargin
  }

  /** Grid-density clustering (DBSCAN's grid approximation) over the first
    * two embedding dimensions: bucket points into 1/`scale`-sized cells,
    * keep cells with ≥ `minPts` points (the dense cells), and connect
    * 8-adjacent dense cells into clusters — cluster id = min cell id
    * reachable, via the shared [[Dedup.connectedComponents]] label
    * propagation. Returns one row per dense cell: (cx, cy, n, cluster).
    *
    * Scale shape: the corpus collapses to cell counts in ONE
    * map-side-combined aggregate; everything after (adjacency, CC) runs on
    * the dense-CELL table, which is bounded by the grid, not the corpus.
    * Adjacency is an EQUI-join: each dense cell broadcasts against the 8
    * neighbor offsets and joins on the shifted key — never a range/cross
    * join. Isolated dense cells keep their own id as cluster. */
  def gridClusters(
      embeddings: DataFrame,
      vecCol: String = "embedding",
      scale: Int = 32,
      minPts: Long = 3L): DataFrame = {
    require(scale >= 1, s"scale must be >= 1: $scale")
    val cellId = (col("cx") + 1000L) * 1000000L + (col("cy") + 1000L)
    val dense = embeddings
      .select(
        floor(element_at(col(vecCol), 1).cast("double") * scale).cast("long").as("cx"),
        floor(element_at(col(vecCol), 2).cast("double") * scale).cast("long").as("cy"))
      .groupBy(col("cx"), col("cy"))
      .agg(count(lit(1)).cast("long").as("n"))
      .filter(col("n") >= minPts)
      .withColumn("id", cellId)
      .materialize // feeds probes, join target, and final output
    val offsets = embeddings.sparkSession.createDataFrame(
      Seq((-1L, -1L), (-1L, 0L), (-1L, 1L), (0L, -1L),
        (0L, 1L), (1L, -1L), (1L, 0L), (1L, 1L))).toDF("dx", "dy")
    val edges = dense.select(col("id").as("ida"), col("cx"), col("cy"))
      .crossJoin(broadcast(offsets))
      .select(col("ida"), (col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"))
      .join(dense.select(col("id").as("idb"), col("cx"), col("cy")), Seq("cx", "cy"))
      .filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb"))
    val comps = Dedup.connectedComponents(edges, "ida", "idb")
      .withColumnRenamed("node", "id")
    dense.join(comps, Seq("id"), "left")
      .select(col("cx"), col("cy"), col("n"),
        coalesce(col("component"), col("id")).as("cluster"))
  }

  /** Distributed Gram/covariance matrix of an embedding column — the
    * kernel under PCA, whitening, and Mahalanobis outlier scoring.
    * Emits the upper triangle: (i, j, n, s_ij = Σ xqᵢ·xqⱼ, m_i, m_j,
    * cov = S/n − mᵢmⱼ/n²) with the sums in EXACT 2^`scaleBits` fixed
    * point (Spark's own `round` quantizes, so the SQL oracle replays the
    * identical integers — the labelCentroids determinism trick).
    *
    * Scale shape: the classic n·d² explode (posexplode twice / pair join)
    * generates n·d² rows before the combiner — 4·10¹¹ rows at 10⁸ vectors,
    * d=64. This instead accumulates each partition's d×d outer-product sum
    * in a local array (mapPartitions — the documented last-resort tier,
    * justified here exactly like MLlib's RowMatrix Gramian) and emits
    * d(d+1)/2+d+1 triples PER PARTITION: shuffle is P·d², independent of
    * n. Quantization stays in DataFrame land (codegen'd transform) so the
    * imperative part is pure integer multiply-adds.
    *
    * Overflow headroom: |xq| ≤ 2^scaleBits for unit-scale embeddings, so a
    * partial s_ij grows ≤ rows·2^(2·scaleBits) — at the default 12 bits,
    * 2^24 per row ≈ 5·10¹¹ rows per EXECUTOR before a long overflows. */
  def gramCovariance(
      embeddings: DataFrame,
      vecCol: String = "embedding",
      scaleBits: Int = 12): DataFrame = {
    require(scaleBits >= 1 && scaleBits <= 24, s"scaleBits in [1,24]: $scaleBits")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val q = (1L << scaleBits).toDouble
    val quantized = embeddings.select(expr(
      s"transform($vecCol, x -> CAST(round(CAST(x AS DOUBLE) * ${q}D, 0) AS BIGINT))")
      .as("xq")).as[Seq[Long]]
    val dims = quantized.limit(1).collect().headOption.map(_.length).getOrElse(0)
    val triples = quantized.mapPartitions { it =>
      val d = dims
      val s = new Array[Long](d * d)
      val m = new Array[Long](d)
      var n = 0L
      it.foreach { v =>
        val xq = v.toArray
        var i = 0
        while (i < d) { m(i) += xq(i); i += 1 }
        i = 0
        while (i < d) {
          val xa = xq(i); val row = i * d
          var j = i
          while (j < d) { s(row + j) += xa * xq(j); j += 1 }
          i += 1
        }
        n += 1
      }
      if (n == 0) Iterator.empty
      else {
        val out = Seq.newBuilder[(Int, Int, Long)]
        out += ((-1, -1, n))
        var i = 0
        while (i < d) {
          out += ((-1, i, m(i)))
          var j = i
          while (j < d) { out += ((i, j, s(i * d + j))); j += 1 }
          i += 1
        }
        out.result().iterator
      }
    }.toDF("i", "j", "v")
    val agg = triples.groupBy(col("i"), col("j"))
      .agg(sum(col("v")).as("v"))
      .materialize // three branches below — materialize once
    val nDf = agg.filter(col("i") === -1 && col("j") === -1)
      .select(col("v").as("n"))
    val mDf = agg.filter(col("i") === -1 && col("j") >= 0)
      .select(col("j").as("dim"), col("v").as("m"))
    val q2 = q * q
    agg.filter(col("i") >= 0)
      .join(broadcast(mDf).select(col("dim").as("i"), col("m").as("m_i")), Seq("i"))
      .join(broadcast(mDf).select(col("dim").as("j"), col("m").as("m_j")), Seq("j"))
      .crossJoin(broadcast(nDf))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        col("n"), col("v").as("s_ij"), col("m_i"), col("m_j"),
        round((col("v").cast("double") / col("n") -
          (col("m_i").cast("double") / col("n")) *
            (col("m_j").cast("double") / col("n"))) / lit(q2), 8).as("cov"))
  }

  /** Linear-kernel maximum mean discrepancy between two embedding
    * populations — the cheapest distribution-shift alarm in embedding
    * space: MMD²_linear = ‖μ_A − μ_B‖², zero iff the mean embeddings
    * coincide (higher-order moments need a nonlinear kernel; this is
    * the screening tier). The train/serve drift check for any
    * embedding pipeline, and the embedding twin of the histogram
    * panel's total-variation distance.
    *
    * Exactness: coordinates quantize to 1/4096 longs (the gram/pca
    * convention — float→double widening is exact binary in both
    * engines), per-dim mean-difference squares are NANO-quantized
    * before the cross-dim sum. One posexplode + one dim-keyed
    * aggregate + one scalar row: embedding count scales freely, the
    * shuffle carries d·(two sums) only. */
  def mmdLinear(
      emb: DataFrame, inACol: String,
      embCol: String = "embedding"): DataFrame = {
    val x = emb
      .select(col(inACol).as("__a"), posexplode(col(embCol)).as(Seq("i", "x")))
      .withColumn("xq",
        expr("CAST(round(CAST(x AS DOUBLE) * 4096, 0) AS BIGINT)"))
    x.groupBy(col("i").cast("long").as("dim"))
      .agg(
        sum(when(col("__a"), col("xq")).otherwise(0L)).cast("long").as("sa"),
        sum(when(col("__a"), 1L).otherwise(0L)).cast("long").as("na_d"),
        sum(when(!col("__a"), col("xq")).otherwise(0L)).cast("long").as("sb"),
        sum(when(!col("__a"), 1L).otherwise(0L)).cast("long").as("nb_d"))
      .withColumn("term", expr(mmdTermNanoSql))
      .agg(count(lit(1)).cast("long").as("d"),
        max(col("na_d")).cast("long").as("n_a"),
        max(col("nb_d")).cast("long").as("n_b"),
        sum(col("term")).cast("long").as("s_nano"))
      .withColumn("mmd2", expr(mmdSql))
  }

  /** Per-dim nano-quantized squared mean difference over
    * (sa, na_d, sb, nb_d), back in original embedding units; NULL
    * (poisoning the total) when either population is empty. Shared
    * with the oracle. */
  val mmdTermNanoSql: String = {
    val du = "((CAST(sa AS DOUBLE) / na_d - CAST(sb AS DOUBLE) / nb_d)" +
      " / 4096)"
    "CASE WHEN na_d > 0 AND nb_d > 0 THEN " +
      s"CAST(round(1000000000 * $du * $du, 0) AS BIGINT) END"
  }

  /** MMD² over (s_nano); NULL when a side was empty. Shared with the
    * oracle. */
  val mmdSql: String =
    "CASE WHEN s_nano IS NOT NULL THEN " +
      "round(CAST(s_nano AS DOUBLE) / 1e9, 6) END"

  /** Deterministic Rademacher random projection of embeddings to k
    * dimensions — the classical Achlioptas/JL reduction with the
    * ±1 matrix derived from a multiplicative hash of (i, j) instead of
    * stored randomness, so both engines (and any re-run) materialize
    * the SAME matrix with no side table: y_j = Σᵢ xᵢ·sign(i,j). The
    * pre-step that makes brute-force candidate generation k/d cheaper
    * before exact re-scoring, and a seed-free alternative to storing a
    * projection matrix alongside the pipeline.
    *
    * Exact integer path: quantized coordinates times ±1 sum to exact
    * longs; one double division at the end. sign balance is 50/101
    * (|bias| < 0.01 — documented, irrelevant at JL error scale).
    * Plan: posexplode → k-fold sequence explode (narrow) → one
    * (vec, j) aggregate; shuffle carries n·k rows. */
  def randomProjection(
      emb: DataFrame, k: Int = 4, embCol: String = "embedding"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    emb.select(col("vec_id"), posexplode(col(embCol)).as(Seq("i", "x")))
      .withColumn("xq",
        expr("CAST(round(CAST(x AS DOUBLE) * 4096, 0) AS BIGINT)"))
      .withColumn("j", explode(sequence(lit(0), lit(k - 1))))
      .select(col("vec_id"), col("j").cast("long").as("j"),
        col("i").cast("long").as("i"), col("xq"))
      .withColumn("sgn", expr(rpSignSql))
      .groupBy(col("vec_id"), col("j"))
      .agg(sum(col("xq") * col("sgn")).cast("long").as("y_q"))
      .withColumn("y", expr("round(CAST(y_q AS DOUBLE) / 4096, 6)"))
  }

  /** Product-quantization encode (PQ — Jégou et al., the workhorse
    * ANN compression): split each embedding into `m` contiguous
    * subvectors and replace each with the id of its nearest codeword,
    * compressing d floats to m small codes. Codebooks follow the
    * ivfTopK trainIters = 0 convention — codeword c of every subspace
    * is the subvector of the (c+1)-th LOWEST vec_id — so the whole
    * pipeline is deterministic and the oracle replays codebook choice,
    * assignment, and distances bit-for-bit (k-means refinement is a
    * quality upgrade on the same plan shape). Distances are EXACT
    * integer L2 over 1/4096-quantized coordinates; ties break on the
    * lowest code. Emits one row per (vector, subspace) with the code
    * and its exact squared distance — the reconstruction-error rollup
    * is one groupBy away.
    *
    * Plan: posexplode → broadcast the k·d-value codebook → per
    * (vec, subspace, code) aggregate → TakeOrdered-style row_number
    * pick on the same hash. Corpus size scales freely; work is
    * n·d·k narrow rows.
    *
    * `trainIters > 0` swaps in the [[pqCodebookTrained]] Lloyd-refined
    * codebook on the identical plan shape. */
  def pqEncode(emb: DataFrame, m: Int = 4, k: Int = 16,
      trainIters: Int = 0): DataFrame = {
    require(m > 0 && k > 0, s"m and k must be positive: $m, $k")
    val dims = dimsOf(emb, "embedding")
    val cb =
      if (trainIters > 0) pqCodebookTrainedWithDims(emb, m, k, trainIters, dims)
      else pqCodebookWithDims(emb, m, k, dims)
    pqEncodeWith(pqQuantizedWithDims(emb, "vec_id", "embedding", m, dims), cb)
  }

  /** Nearest-codeword assignment of pre-quantized coords against a
    * given codebook — the kernel [[pqEncode]] and [[pqAdcTopK]] share
    * so a trained codebook never gets re-derived per caller. */
  private def pqEncodeWith(x: DataFrame, cb: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pick = Window.partitionBy(col("vec_id"), col("subspace"))
      .orderBy(col("dist2"), col("code"))
    x.join(broadcast(cb), Seq("subspace", "i"))
      .groupBy(col("vec_id"), col("subspace"), col("code"))
      .agg(sum((col("xq") - col("cq")) * (col("xq") - col("cq")))
        .cast("long").as("dist2"))
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("subspace"), col("code"), col("dist2"))
  }

  /** (id, subspace, i, xq): the 1/4096-quantized coordinate explode
    * shared by the PQ kernels. Fails fast (one-row probe, same as
    * [[dimsOf]]) when the embedding dimensionality is < m (sub = 0
    * would divide by zero → NULL subspace → silently dropped rows) or
    * not divisible by m (a ragged (m+1)-th subspace would appear). */
  private[operators] def pqQuantized(
      df: DataFrame, idCol: String, embCol: String, m: Int): DataFrame =
    pqQuantizedWithDims(df, idCol, embCol, m, dimsOf(df, embCol))

  /** [[pqQuantized]] with the dimensionality already known — public PQ
    * entry points probe [[dimsOf]] ONCE and thread the result through
    * every internal quantize, so a composite like [[pqAdcRerankTopK]]
    * costs two probe jobs (corpus + queries), not one per kernel
    * (each probe re-executes the un-materialized upstream plan). */
  private def pqQuantizedWithDims(
      df: DataFrame, idCol: String, embCol: String, m: Int,
      dims: Int): DataFrame = {
    require(dims >= m && dims % m == 0,
      s"PQ needs embedding dims divisible by m: dims=$dims, m=$m")
    df.select(col(idCol), col(embCol).as("__emb"),
        expr(s"size($embCol) div $m").cast("long").as("sub"))
      .select(col(idCol), col("sub"),
        posexplode(col("__emb")).as(Seq("i", "e")))
      .select(col(idCol), col("i").cast("long").as("i"),
        expr("i div sub").cast("long").as("subspace"),
        expr("CAST(round(CAST(e AS DOUBLE) * 4096, 0) AS BIGINT)").as("xq"))
  }

  /** m = 1 quantize (the exact-L2 rerank paths): the divisibility
    * guard is vacuous (`dims % 1 == 0` always), so no dims probe job
    * runs at all — the literal 1 passed as dims only satisfies the
    * guard, the body never reads it. */
  private def pqQuantized1(
      df: DataFrame, idCol: String, embCol: String): DataFrame =
    pqQuantizedWithDims(df, idCol, embCol, 1, 1)

  /** (code, subspace, i, cq): codebooks per subspace — codeword c is
    * the subvector of the (c+1)-th lowest id (the ivf trainIters = 0
    * determinism convention). k·d values, always broadcastable. */
  private[operators] def pqCodebook(
      emb: DataFrame, m: Int, k: Int): DataFrame =
    pqCodebookWithDims(emb, m, k, dimsOf(emb, "embedding"))

  private def pqCodebookWithDims(
      emb: DataFrame, m: Int, k: Int, dims: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ids = emb.select(col("vec_id")).orderBy(col("vec_id")).limit(k)
      .withColumn("code",
        row_number().over(Window.orderBy(col("vec_id"))).cast("long") - 1)
    pqQuantizedWithDims(emb, "vec_id", "embedding", m, dims)
      .join(broadcast(ids), Seq("vec_id"))
      .select(col("code"), col("subspace"), col("i"), col("xq").as("cq"))
  }

  /** Lloyd-trained PQ codebooks — the quality upgrade the measured
    * recall demanded (lowest-id codewords scored recall@10 ≈ 0.15 at
    * sf0.1; see BASELINE.md): fixed-iteration k-means per subspace,
    * SEEDED from the lowest-id picks so iters = 0 degrades to the
    * [[pqCodebook]] convention. Fully deterministic and
    * oracle-replayable: assignment is argmin exact integer L2 with
    * (d2, code) tie-break; the centroid update rounds the coordinate
    * mean half-away-from-zero in INTEGER arithmetic
    * ([[pqMeanRoundSql]] — a double round() could differ by 1 across
    * engines at .5); an emptied cluster keeps its previous codeword.
    *
    * Plan per iteration: quantized coords (materialized ONCE) join the
    * broadcast k·d codebook → n·m·k-row hash aggregate → argmin pick →
    * one k·d-row update aggregate. Corpus size scales freely; the
    * codebook never leaves broadcast range. */
  def pqCodebookTrained(
      emb: DataFrame, m: Int = 4, k: Int = 16,
      iters: Int = 2): DataFrame =
    pqCodebookTrainedWithDims(emb, m, k, iters, dimsOf(emb, "embedding"))

  private def pqCodebookTrainedWithDims(
      emb: DataFrame, m: Int, k: Int, iters: Int, dims: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0: $iters")
    import org.apache.spark.sql.expressions.Window
    val xq = Materialize(pqQuantizedWithDims(emb, "vec_id", "embedding", m, dims))
    var cb = pqCodebookWithDims(emb, m, k, dims)
    for (_ <- 1 to iters) {
      val assign = xq.join(broadcast(cb), Seq("subspace", "i"))
        .groupBy(col("vec_id"), col("subspace"), col("code"))
        .agg(sum((col("xq") - col("cq")) * (col("xq") - col("cq")))
          .cast("long").as("d2"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("vec_id"), col("subspace"))
            .orderBy(col("d2"), col("code"))))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("subspace"), col("code"))
      val sums = assign.join(xq, Seq("vec_id", "subspace"))
        .groupBy(col("subspace"), col("code"), col("i"))
        .agg(sum(col("xq")).cast("long").as("sm"),
          count(lit(1)).cast("long").as("cnt"))
      cb = Materialize(cb.join(sums, Seq("subspace", "code", "i"), "left")
        .select(col("code"), col("subspace"), col("i"),
          expr(pqMeanRoundSql("div")).cast("long").as("cq")))
    }
    cb
  }

  /** Half-away-from-zero integer mean over (sm, cnt), keeping the
    * previous codeword cq on an empty cluster. `d` is the truncating
    * integer-division operator spelling (Spark `div`, DuckDB `//`) —
    * the CASE keeps both operands non-negative, where truncation and
    * floor agree, so the two spellings are identical. */
  def pqMeanRoundSql(d: String): String =
    s"COALESCE(CASE WHEN sm >= 0 THEN (2*sm + cnt) $d (2*cnt) " +
      s"ELSE -((2*(-sm) + cnt) $d (2*cnt)) END, cq)"

  /** PQ search by asymmetric distance computation (ADC) — the payoff
    * of [[pqEncode]]: each query precomputes its exact integer L2 to
    * every codeword per subspace (an m·k lookup table), and a corpus
    * vector's approximate distance is the SUM of table entries at its
    * codes — the corpus embeddings are never touched at query time.
    * Top-K under (adc_dist2, vec_id); queries exclude themselves. The
    * compressed-domain counterpart of [[bruteForceTopK]] (exact) and
    * [[ivfTopK]] (partition-pruned): at 100 TB the codes table is
    * ~m bytes/vector and the per-query work is a broadcast-joined
    * aggregate over it.
    *
    * All-integer arithmetic end to end — the oracle replays the
    * lookup tables and sums exactly. */
  def pqAdcTopK(
      queries: DataFrame, corpus: DataFrame,
      m: Int = 4, k: Int = 16, topK: Int = 10,
      trainIters: Int = 0): DataFrame =
    pqAdcTopKWithDims(queries, corpus, m, k, topK, trainIters,
      dimsOf(queries, "qvec"), dimsOf(corpus, "embedding"))

  private def pqAdcTopKWithDims(
      queries: DataFrame, corpus: DataFrame,
      m: Int, k: Int, topK: Int, trainIters: Int,
      qDims: Int, cDims: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cb =
      if (trainIters > 0)
        Materialize(pqCodebookTrainedWithDims(corpus, m, k, trainIters, cDims))
      else pqCodebookWithDims(corpus, m, k, cDims)
    val codes = pqEncodeWith(
        pqQuantizedWithDims(corpus, "vec_id", "embedding", m, cDims), cb)
      .select(col("vec_id"), col("subspace"), col("code"))
    val adc = pqQuantizedWithDims(queries, "qid", "qvec", m, qDims)
      .join(broadcast(cb), Seq("subspace", "i"))
      .groupBy(col("qid"), col("subspace"), col("code"))
      .agg(sum((col("xq") - col("cq")) * (col("xq") - col("cq")))
        .cast("long").as("d2"))
    val pick = Window.partitionBy(col("qid"))
      .orderBy(col("adc_dist2"), col("vec_id"))
    codes.join(broadcast(adc), Seq("subspace", "code"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("d2")).cast("long").as("adc_dist2"))
      .withColumn("rank", row_number().over(pick).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** ADC search with exact re-ranking — the FAISS-style refine tier
    * that turns PQ's coarse distances into high recall: the ADC pass
    * retrieves a candidate list of `rerank` ids per query (cheap —
    * codes only), then ONLY those candidates are re-scored with exact
    * integer L2 and the top-K re-picked. Per-query exact work is
    * rerank·d coordinates regardless of corpus size, so the scan
    * economics stay compressed-domain at 100 TB while recall climbs
    * from the measured ADC-only ~0.28 to ≥ 0.96 on the hardest
    * (i.i.d. unit-norm) embedding distribution — see BASELINE.md's
    * r11 sweep. All-integer end to end; oracle replays training,
    * encoding, candidates, and the re-rank bit-for-bit. */
  def pqAdcRerankTopK(
      queries: DataFrame, corpus: DataFrame,
      m: Int = 16, k: Int = 16, topK: Int = 10, rerank: Int = 400,
      trainIters: Int = 1): DataFrame = {
    require(rerank >= topK, s"rerank must be >= topK: $rerank, $topK")
    import org.apache.spark.sql.expressions.Window
    val cand = pqAdcTopKWithDims(queries, corpus, m, k, rerank, trainIters,
        dimsOf(queries, "qvec"), dimsOf(corpus, "embedding"))
      .select(col("qid"), col("vec_id"))
    val qx = pqQuantized1(queries, "qid", "qvec")
      .select(col("qid"), col("i"), col("xq").as("qq"))
    val cx = pqQuantized1(corpus, "vec_id", "embedding")
      .select(col("vec_id"), col("i"), col("xq").as("cq2"))
    val pick = Window.partitionBy(col("qid"))
      .orderBy(col("dist2"), col("vec_id"))
    cand.join(cx, "vec_id")
      .join(broadcast(qx), Seq("qid", "i"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum((col("qq") - col("cq2")) * (col("qq") - col("cq2")))
        .cast("long").as("dist2"))
      .withColumn("rank", row_number().over(pick).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** Exact L2 top-K over 1/4096-quantized coordinates — the EUCLIDEAN
    * ground truth next to [[bruteForceTopK]]'s cosine ranking, and the
    * reference [[pqAdcTopK]]'s recall is measured against: all-integer
    * squared distances, (dist2, vec_id) total order, self excluded.
    * Same scale contract as the cosine brute force: queries are the
    * small side; candidate work is |Q|·n·d narrow rows. */
  def l2TopK(
      queries: DataFrame, corpus: DataFrame, topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qx = pqQuantized1(queries, "qid", "qvec")
      .select(col("qid"), col("i"), col("xq").as("qq"))
    val cx = pqQuantized1(corpus, "vec_id", "embedding")
      .select(col("vec_id"), col("i"), col("xq").as("cq"))
    val pick = Window.partitionBy(col("qid"))
      .orderBy(col("dist2"), col("vec_id"))
    cx.join(broadcast(qx), Seq("i"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum((col("qq") - col("cq")) * (col("qq") - col("cq")))
        .cast("long").as("dist2"))
      .withColumn("rank", row_number().over(pick).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** PQ recall@K — "measure, don't guess" for the compressed search
    * path: per query, the fraction of the exact-L2 top-K ([[l2TopK]])
    * that [[pqAdcTopK]] recovers. The one number that says whether
    * m/k are adequate before anyone ships the code table. */
  def pqRecall(
      queries: DataFrame, corpus: DataFrame,
      m: Int = 4, k: Int = 16, topK: Int = 10,
      trainIters: Int = 0): DataFrame =
    recallAtK(l2TopK(queries, corpus, topK),
      pqAdcTopK(queries, corpus, m, k, topK, trainIters))

  /** Per-query recall of an approximate (qid, vec_id) result set
    * against a ground-truth one — the shared scorer behind
    * [[pqRecall]] and the IVF recall query; any (truth, approx) pair
    * of top-K frames composes. */
  def recallAtK(truth: DataFrame, approx: DataFrame): DataFrame =
    truth.select(col("qid"), col("vec_id"))
      .join(approx.select(col("qid").as("__q2"), col("vec_id").as("__v2")),
        col("qid") === col("__q2") && col("vec_id") === col("__v2"),
        "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).cast("long").as("n_truth"),
        sum(when(col("__q2").isNotNull, 1L).otherwise(0L))
          .cast("long").as("n_match"))
      .withColumn("recall", expr(
        "round(CAST(n_match AS DOUBLE) / n_truth, 6)"))

  /** ±1 from a multiplicative hash of (i, j). The additive form
    * a·i + b·j (and bare i+j parity) is structurally DEGENERATE:
    * mod a small prime it makes adjacent output dims exact negations
    * (a+b collapses mod p) — measured cross-column sign dots over 64
    * dims: additive ±64, this multiplicative form ≤ 12. Fits long for
    * any realistic (i, j); modulo of positives agrees across engines.
    * Shared with the oracle. */
  val rpSignSql: String =
    "CASE WHEN ((i + 1) * (j + 7) * 2654435761) % 101 < 50 " +
      "THEN 1 ELSE -1 END"

  /** Exact ε-neighbor pairs over 2²⁴ fixed-point embeddings — the
    * BRUTE-FORCE edge builder for density clustering ([[dbscanFromEdges]]):
    * every a<b pair with squared L2 distance ≤ epsFpSq, computed in exact
    * integer arithmetic (floats scale to 2²⁴ fixed point — exact for
    * |x| < 2⁷ since float mantissas are 24 bits; diffs² over 64 dims stay
    * under 2⁶³). O(n²) by DEFINITION — the oracled baseline tier, like
    * [[topKCosine]]: at 100 TB the edge list comes from the blocked
    * families instead (IVF cell-local or SRP-banded candidates, exactly
    * the [[nearDupCosineBlocked]] recipe) and feeds the SAME cluster
    * step unchanged. */
  def epsNeighborPairs(
      embeddings: DataFrame, epsFpSq: Long,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(epsFpSq > 0, s"epsFpSq must be positive: $epsFpSq")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val fp = fpVectors(embeddings, idCol, vecCol)
    val all = broadcastFp(fp)
    fp.mapPartitions { it =>
      val ref = all.value
      it.flatMap { case (a, fa) =>
        ref.iterator.flatMap { case (b, fb) =>
          if (a < b) {
            val d2 = sqDistFp(fa, fb)
            if (d2 <= epsFpSq) Iterator.single((a, b, d2))
            else Iterator.empty
          } else Iterator.empty
        }
      }
    }.toDF("a", "b", "d2")
  }

  /** 2²⁴ fixed-point quantization of a float-array column — exact for
    * |x| < 2⁷ (float mantissas are 24 bits); the typed form feeds the
    * compiled pairwise kernels (the columnar zip_with/aggregate HOFs
    * are INTERPRETED — the measured cliff: the same 4M-pair scan cost
    * 48 s through the lambda path, ~2 s compiled). */
  private def fpVectors(
      embeddings: DataFrame, idCol: String, vecCol: String)
      : org.apache.spark.sql.Dataset[(Long, Array[Long])] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    embeddings
      .select(col(idCol).cast("long"),
        transform(col(vecCol),
          x => round(x.cast("double") * 16777216d).cast("long")))
      .as[(Long, Array[Long])]
  }

  /** Broadcast the full quantized table for the brute-force tiers —
    * LOUDLY bounded (the documented baseline class: at 100 TB the
    * blocked candidate builders replace the broadcast, not the
    * kernel). 1 M × 64-dim longs ≈ 512 MB: refuse beyond that. */
  private def broadcastFp(
      fp: org.apache.spark.sql.Dataset[(Long, Array[Long])])
      : org.apache.spark.broadcast.Broadcast[Array[(Long, Array[Long])]] = {
    val arr = fp.collect().sortBy(_._1)
    require(arr.length <= 1000000,
      s"brute-force tier bounded at 1e6 vectors (got ${arr.length}) — " +
        "use the blocked candidate builders at this scale")
    fp.sparkSession.sparkContext.broadcast(arr)
  }

  /** Exact integer squared L2 over fixed-point vectors. */
  private def sqDistFp(a: Array[Long], b: Array[Long]): Long = {
    var i = 0; var acc = 0L
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }

  /** Local Outlier Factor (k = `k`) — the density-ratio anomaly score
    * for embedding curation: LOF ≈ 1 for inliers, ≫ 1 for points whose
    * local density is far below their neighbors' (mislabeled samples,
    * modality leaks, encoding glitches). Deterministic variant: the
    * neighborhood is EXACTLY the k nearest by (squared fixed-point L2,
    * neighbor id) — the textbook ties-included neighborhood is
    * engine-order-dependent, this one is replayable.
    *
    * Exactness ladder (every cross-engine sum is over exact BIGINTs):
    * d² exact fixed-point ints → k-distance = k-th smallest d² (exact)
    * → reachability distance micro-quantized per PAIR
    * (ROUND(10⁶·√(max(d², kdist(b)))/2²⁴)) and integer-summed per point
    * → lrd nano-quantized from that exact denominator → LOF = one
    * double division of two exact aggregates, round 6.
    *
    * O(n²) candidate tier like [[epsNeighborPairs]] (swap in blocked
    * candidates at scale — kNN only needs enough candidates to cover
    * the true top-k, the IVF-probe recipe); everything after the pair
    * table is key-hashed joins/aggregates. */
  def lofScores(
      embeddings: DataFrame, k: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val fp = fpVectors(embeddings, idCol, vecCol)
    val all = broadcastFp(fp)
    // compiled brute-force kNN: per point, a bounded insertion sort of
    // the k best (d2, id) pairs over the broadcast table — the same
    // exact integers and tie order the window-rank form produced, at
    // JVM speed instead of interpreted-lambda speed
    val knn = fp.mapPartitions { it =>
      val ref = all.value
      it.flatMap { case (a, fa) =>
        val bd = new Array[Long](k); val bi = new Array[Long](k)
        var filled = 0
        ref.foreach { case (b, fb) =>
          if (b != a) {
            val d2 = sqDistFp(fa, fb)
            if (filled < k || d2 < bd(filled - 1) ||
                (d2 == bd(filled - 1) && b < bi(filled - 1))) {
              var pos = math.min(filled, k - 1)
              while (pos > 0 && (bd(pos - 1) > d2 ||
                  (bd(pos - 1) == d2 && bi(pos - 1) > b))) {
                bd(pos) = bd(pos - 1); bi(pos) = bi(pos - 1); pos -= 1
              }
              bd(pos) = d2; bi(pos) = b
              if (filled < k) filled += 1
            }
          }
        }
        (0 until filled).iterator.map(j => (a, bi(j), bd(j)))
      }
    }.toDF("a", "b", "d2")
      .materialize // feeds kdist, reach, and the final neighbor join
    val kdist = knn.groupBy(col("a").as("b"))
      .agg(max(col("d2")).as("kd2")) // k-th smallest = max of the top-k
    val dsum = knn.join(kdist, Seq("b"))
      .withColumn("reach_micro", expr(lofReachMicroSql))
      .groupBy(col("a"))
      .agg(sum(col("reach_micro")).cast("long").as("rsum"))
    val lrd = dsum
      .withColumn("lrd_nano", expr(lofLrdNanoSql(k)))
      .materialize // self AND neighbor sides below
    knn.select(col("a"), col("b"))
      .join(lrd.select(col("a").as("b"), col("lrd_nano").as("nb_lrd")),
        Seq("b"))
      .groupBy(col("a"))
      .agg(sum(col("nb_lrd")).cast("long").as("nb_lrd_sum"))
      .join(lrd.select(col("a"), col("rsum"), col("lrd_nano")), Seq("a"))
      .select(col("a").as(idCol), col("rsum").as("reach_sum_micro"),
        col("lrd_nano"),
        expr(s"round(CAST(nb_lrd_sum AS DOUBLE) / " +
          s"(CAST($k AS DOUBLE) * CAST(lrd_nano AS DOUBLE)), 6)")
          .as("lof"))
  }

  /** Micro-quantized reachability distance
    * ROUND(10⁶·√(max(d², kd2))/2²⁴) — exact BIGINT per pair (√ of an
    * exact int is one deterministic libm call), floored at 1 micro so
    * exact-duplicate neighborhoods keep lrd finite (textbook LOF sends
    * it to ∞; the floor caps lrd at 10⁹·k instead — documented
    * variant); shared with the oracle. */
  val lofReachMicroSql: String =
    "GREATEST(CAST(ROUND(1000000.0 * " +
      "sqrt(CAST(GREATEST(d2, kd2) AS DOUBLE)) / 16777216.0, 0) " +
      "AS BIGINT), CAST(1 AS BIGINT))"

  /** Nano-quantized local reachability density k·10⁶·10⁹/Σreach_micro —
    * exact BIGINT per point; shared with the oracle. */
  def lofLrdNanoSql(k: Int): String =
    s"CAST(ROUND(CAST($k AS DOUBLE) * 1000000.0 * 1000000000.0 " +
      "/ CAST(rsum AS DOUBLE), 0) AS BIGINT)"

  /** DBSCAN's CLUSTER step over a precomputed ε-neighbor edge list —
    * decoupled from neighbor search exactly because that is the scale
    * dial (brute-force [[epsNeighborPairs]] at test scale, IVF/SRP
    * blocked candidates at 100 TB; the clustering is identical):
    *
    *  - core points: |N_ε(p)| ≥ minPts (self included — the textbook
    *    count);
    *  - clusters: connected components of the core-core subgraph
    *    ([[Dedup.connectedComponents]] — min-label + pointer jumping,
    *    O(log diameter) rounds), isolated cores label themselves;
    *  - border points: non-core with ≥ 1 core neighbor, assigned the
    *    MINIMUM core-neighbor cluster (the textbook leaves border
    *    assignment order-dependent; min makes it deterministic);
    *  - noise: everything else, cluster −1.
    *
    * All decisions are integer compares on exact counts/labels — the
    * oracle replays core flags, a reachability closure, and the min
    * border pick. Every stage is a key-hashed join/aggregate. */
  def dbscanFromEdges(
      points: DataFrame, edges: DataFrame, minPts: Int,
      idCol: String = "vec_id",
      srcCol: String = "a", dstCol: String = "b"): DataFrame = {
    require(minPts >= 2, s"minPts must be >= 2: $minPts")
    import graft.Materialize.MaterializeOps
    val e = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .unionByName(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .materialize
    val deg = e.groupBy(col("u").as("id"))
      .agg(count(lit(1)).cast("long").as("__deg"))
    val flagged = points.select(col(idCol).as("id")).distinct()
      .join(deg, Seq("id"), "left")
      .select(col("id"),
        (coalesce(col("__deg"), lit(0L)) + 1L).as("n_neighbors"))
      .withColumn("is_core", col("n_neighbors") >= minPts.toLong)
      .materialize
    val coreIds = flagged.filter(col("is_core")).select(col("id"))
    val coreEdges = e
      .join(coreIds.withColumnRenamed("id", "u"), Seq("u"))
      .join(coreIds.withColumnRenamed("id", "v"), Seq("v"))
      .filter(col("u") < col("v"))
    val comp = Dedup.connectedComponents(coreEdges, "u", "v")
      .select(col("node").as("id"), col("component"))
    // isolated cores (no core neighbor) label themselves
    val coreLabel = coreIds.join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("cluster"))
      .materialize // feeds border assignment AND the core output rows
    val borderLabel = e
      .join(coreLabel.select(col("id").as("v"), col("cluster")), Seq("v"))
      .groupBy(col("u").as("id"))
      .agg(min(col("cluster")).as("__bc"))
    flagged
      .join(coreLabel.withColumnRenamed("cluster", "__cc"), Seq("id"), "left")
      .join(borderLabel, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_neighbors"),
        when(col("is_core"), "core")
          .when(col("__bc").isNotNull, "border")
          .otherwise("noise").as("role"),
        coalesce(col("__cc"),
          when(col("__bc").isNotNull, col("__bc")), lit(-1L))
          .cast("long").as("cluster"))
  }
}
