package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.{MaterializeOps, MaterializeFreshOps}

/** Deduplication operators for a training-data pipeline, all shuffle-based
  * and driver-memory-free (designed for 100 TB — see scaladoc per op).
  */
object Dedup {

  /** Exact dedup: keep the lowest id per identical text. One hash aggregate
    * + one shuffle join (Spark picks broadcast/SMJ by stats). At scale,
    * group on md5(text) instead of raw text to shrink shuffle payload —
    * we group on the hash and verify via min id join back. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val keep = docs
      .groupBy(md5(col(textCol)).as("__h"))
      .agg(min(col(idCol)).as(idCol))
      .drop("__h")
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** Canonical text form for [[normalizedExact]]: lowercase, strip every
    * char outside [a-z0-9 ], collapse space runs, trim. Stays inside the
    * regex subset Java and RE2 (the DuckDB oracle) interpret identically —
    * plain character classes, no \s/\w shorthands (whose Unicode semantics
    * differ across engines). */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Normalized exact dedup — the casing/punctuation-insensitive tier
    * between [[exact]] and MinHash: documents identical after
    * [[normalizeText]] keep only the lowest id. Same scale shape as
    * [[exact]] (group on md5 of the normalized form so the shuffle carries
    * 32-byte digests, not text; one hash aggregate + one semi join), plus
    * the normalization itself is a pure narrow map. Returns the kept rows
    * with their normalized-form digest and the duplicate-group size. */
  def normalizedExact(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val keep = docs
      .groupBy(md5(normalizeText(col(textCol))).as("norm_md5"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).cast("long").as("n_group"))
    docs.join(keep, Seq(idCol)).select(
      col(idCol), col("norm_md5"), col("n_group"))
  }

  /** MinHash-LSH candidate pairs over word n-gram shingles.
    *
    * Pipeline (each step one narrow map or one shuffle):
    *   shingle → k-minhash signature → b band keys → explode bands →
    *   shuffle on (band_idx, band_key) → self-join within band buckets →
    *   distinct (a < b) pairs.
    *
    * Scale: the only quadratic step is within a single band bucket; with
    * r rows per band P(bucket-collide) = J^r, so buckets stay tiny for
    * non-duplicate mass. Pathological buckets (giant duplicate clusters)
    * are an inherent property of the data — they are hard-capped at
    * `maxBucketSize`, above which a bucket degrades to O(n) star pairs
    * (see [[boundedBucketPairs]]) instead of OOM-ing. No driver
    * materialization anywhere. */
  def minhashCandidates(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      numHashes: Int = 16,
      bands: Int = 4,
      shingleN: Int = 3,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sig = shingleSigTable(docs, idCol, textCol, shingleN, numHashes)
    val exploded = sig
      // Shingle-less docs have NULL signatures; banding them would give
      // every such doc the SAME band key — one giant bucket of unrelated
      // short docs. Drop them: no shingles means no near-dup evidence (the
      // DuckDB oracle's NULL band keys never join, so this keeps parity).
      // Filtered via the cheap __has twin, NOT `__sig IS NOT NULL` — see
      // shingleSigTable's scaladoc for the pushdown reason.
      .filter(col("__has"))
      .select(
        col(idCol),
        posexplode(bandKeys(col("__sig"), bands, r)).as(Seq("band_idx", "band_key")))
    // Pair generation via group-then-combine, NOT a self-join: Spark plans
    // both sides of a self-join as independent subtrees (no ReusedExchange
    // materialized here), recomputing the md5 signature pipeline per side.
    // Grouping computes it ONCE: one shuffle on (band_idx, band_key), sorted
    // id list per bucket, columnar i<j pair expansion. Bucket lists are
    // bounded by duplicate-cluster size (P(collide) = J^r for non-dups) AND
    // hard-capped at maxBucketSize (see boundedBucketPairs) so a giant
    // duplicate cluster degrades to O(n) star pairs instead of OOM-ing an
    // aggregation buffer.
    boundedBucketPairs(exploded, idCol, maxBucketSize, payload = None)
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Band buckets larger than this emit O(n) star pairs instead of O(n²)
    * all-pairs (see [[boundedBucketPairs]]). 1024 keeps every aggregation
    * buffer ≤ 1024 structs while leaving ordinary duplicate clusters (tens
    * to hundreds of members) on the exact all-pairs path. */
  val DefaultMaxBucketSize: Int = 1024

  /** Expand LSH band buckets into candidate pairs with a bounded-memory
    * guarantee.
    *
    * Input must have columns (band_idx, band_key, idCol[, payload]). One
    * shuffle on the band keys; per-bucket size `n` and anchor (min id, plus
    * its payload) are computed with WINDOW functions — window buffers spill
    * to disk, unlike aggregation buffers, so no bucket can OOM this stage.
    * Then:
    *  - n ≤ maxBucketSize: the classic all-pairs expansion (collect_list is
    *    now provably bounded by maxBucketSize elements per buffer);
    *  - n > maxBucketSize: star pairs (anchor, member) for EVERY member —
    *    O(n) output, without materializing the bucket anywhere.
    * A bucket that large is, with overwhelming probability, one giant
    * duplicate cluster: r-row band collisions for non-dups occur at J^r.
    * Connectivity caveat (be honest about the approximation): when the
    * oversized bucket holds IDENTICAL payloads — the overwhelmingly common
    * case — every star pair passes downstream verification and a
    * connected-components/keep-min-id pass groups the cluster exactly as
    * the clique would. When it holds near-but-not-identical members, a
    * member whose similarity to the ANCHOR falls below the caller's verify
    * threshold loses its star edge even if it passes against some other
    * member — a bounded recall trade of the same kind as LSH banding
    * itself (pairs colliding on no band are lost too). Callers needing
    * clique recall on such data must raise maxBucketSize.
    * Both branches share the shuffled band table via ReusedExchange (same
    * plan subtree — asserted in Round3OperatorsSpec).
    *
    * @param payload optional (payloadCol in input) → emitted as (sh_a, sh_b)
    */
  private def boundedBucketPairs(
      exploded: DataFrame,
      idCol: String,
      maxBucketSize: Int,
      payload: Option[String]): DataFrame = {
    require(maxBucketSize > 1, s"maxBucketSize must be > 1: $maxBucketSize")
    val keys = Seq(col("band_idx"), col("band_key"))
    val wBucket = Window.partitionBy(keys: _*)
    val wOrdered = wBucket.orderBy(col(idCol))
    val marked0 = exploded
      .withColumn("__n", count(lit(1)).over(wBucket))
      .withColumn("__anchor", first(col(idCol)).over(wOrdered))
    val marked = payload match {
      case Some(p) => marked0.withColumn("__anchor_pl", first(col(p)).over(wOrdered))
      case None => marked0
    }
    val small = {
      val collected = payload match {
        case Some(p) => struct(col(idCol).as("id"), col(p).as("pl"))
        case None => struct(col(idCol).as("id"))
      }
      // groupBy on the window's partition keys: the child is already hash-
      // partitioned on them, so no second Exchange is planned here.
      marked.filter(col("__n") <= maxBucketSize)
        .groupBy(keys: _*)
        .agg(array_sort(collect_list(collected)).as("rows"))
        .filter(size(col("rows")) > 1)
        .select(explode(pairCombinationsStruct(col("rows"), payload.isDefined)).as("p"))
        .select(col("p.*"))
    }
    val big = {
      val base = marked.filter(col("__n") > maxBucketSize && col(idCol) > col("__anchor"))
      payload match {
        case Some(p) =>
          base.select(
            col("__anchor").as("doc_a"), col(idCol).as("doc_b"),
            col("__anchor_pl").as("sh_a"), col(p).as("sh_b"))
        case None =>
          base.select(col("__anchor").as("doc_a"), col(idCol).as("doc_b"))
      }
    }
    small.unionByName(big)
  }

  /** All i<j pairs from a sorted array of (id[, pl]) structs. */
  private def pairCombinationsStruct(rows: Column, withPayload: Boolean): Column =
    flatten(transform(rows, (x, i) =>
      transform(slice(rows, i + lit(2), size(rows)), y =>
        if (withPayload)
          struct(
            x.getField("id").as("doc_a"), y.getField("id").as("doc_b"),
            x.getField("pl").as("sh_a"), y.getField("pl").as("sh_b"))
        else
          struct(x.getField("id").as("doc_a"), y.getField("id").as("doc_b")))))

  /** Materialized per-doc shingle arrays, spread across cores.
    *
    * Two deliberate Exchanges: interpreted HOF lambdas re-evaluate child
    * expressions per element, so a collapsed split→shingle→minhash projection
    * recomputes split(text) for EVERY lambda element (measured via jstack:
    * 300+ s for 5000 docs pinned on one core, `StringSplit.nullSafeEval`
    * under `ArrayTransform`). The first repartition spreads the raw rows
    * (small parquet = 1 input partition otherwise); the second materializes
    * the computed shingle array so downstream minhash lambdas read a bound
    * column instead of re-running the shingle kernel 16×. Both shuffles are
    * tiny relative to the saved CPU, and the pattern is exactly what a
    * 1000-executor cluster needs anyway. */
  def shingleTable(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int): DataFrame =
    docs
      .repartition(col(idCol))
      .select(col(idCol), shingles(tokens(col(textCol)), shingleN).as("__sh"))
      .repartition(col(idCol))

  /** Fused shingle + MinHash-signature kernel as a codegen'd Catalyst
    * expression ([[graft.functions.expressions.ShingleSig]]) — the round-7
    * promotion of the round-1 `mapPartitions` escape hatch one step up the
    * preference order (compose → Expression → custom plan → mapPartitions).
    * Identical math (one md5 per distinct shingle → 30-bit base + k affine
    * mixes — the DuckDB oracle still hash-matches) at the same ~0.06 ms/row
    * kernel speed, but with no DeserializeToObject/SerializeFromObject
    * object boundary in the plan and with a canonicalizable expression, so
    * self-join shapes over this table can plan ReusedExchange. The first
    * repartition spreads the single-file parquet scan; the second
    * materializes the computed struct behind an Exchange so downstream
    * interpreted HOF lambdas (banding) read bound columns instead of
    * collapsing the kernel into their per-element evaluation — same
    * two-Exchange contract as [[shingleTable]]. Docs with no shingles get
    * a NULL signature (no near-dup evidence).
    *
    * `__has` is a CHEAP twin of `__sig IS NOT NULL` (token count ≥
    * shingleN, i.e. shingles exist — when numHashes > 0 the two are
    * equivalent by construction): callers must filter on `__has`, not the
    * sig. A predicate on the sig gets pushed below the Exchange as
    * `shingle_sig(text).sig IS NOT NULL` — re-running the md5 kernel per
    * pre-shuffle row, doubling the dominant CPU — while the pushed `__has`
    * costs one split+size and still drops shingle-less rows BEFORE the
    * shuffle. */
  private[graft] def shingleSigTable(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      numHashes: Int): DataFrame =
    docs
      .select(col(idCol).cast("long").as(idCol), col(textCol),
        (size(split(col(textCol), " ", -1)) >= shingleN).as("__has"))
      .repartition(col(idCol))
      .select(col(idCol), col("__has"),
        graft.functions.expressions.ShingleSig
          .shingleSig(col(textCol), shingleN, numHashes).as("__ss"))
      .repartition(col(idCol))
      .select(col(idCol), col("__has"),
        col("__ss.sh").as("__sh"), col("__ss.sig").as("__sig"))

  /** MinHash near-dup pairs verified with exact shingle jaccard ≥ threshold.
    *
    * Single-pass plan: the fused shingle+signature kernel runs ONCE and the
    * shingle arrays ride the band shuffle inside the bucket structs, so
    * verification needs no join back to the corpus. The join-back variant
    * recomputed the kernel on each join side — closures never canonicalize
    * equal, so Spark cannot plan a ReusedExchange across `mapPartitions`
    * subtrees; carrying `bands`× the shingle payload through one shuffle is
    * strictly cheaper than 3× the kernel CPU plus two join shuffles, at any
    * scale where the kernel dominates (it does: ~0.05 ms/row vs md5-array
    * bytes). */
  def nearDupMinhash(
      docs: DataFrame,
      threshold: Double,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val st = shingleSigTable(docs, idCol, textCol, shingleN, numHashes)
    val exploded = st
      .filter(col("__has")) // shingle-less docs: see minhashCandidates
      .select(
        col(idCol), col("__sh"),
        posexplode(bandKeys(col("__sig"), bands, r)).as(Seq("band_idx", "band_key")))
    boundedBucketPairs(exploded, idCol, maxBucketSize, payload = Some("__sh"))
      // a pair can surface from several bands: dedupe BEFORE the jaccard so
      // the set math runs once per pair (sh_* is functionally determined by
      // the id, so first() is deterministic here)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(first(col("sh_a")).as("sh_a"), first(col("sh_b")).as("sh_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Connected components over an undirected edge list — the step that
    * turns near-dup candidate PAIRS into duplicate CLUSTERS (keep one doc
    * per component, drop the rest). Output: (node, component) where
    * component = the minimum node id reachable from `node`.
    *
    * Algorithm: min-label propagation with pointer jumping. Each iteration
    * (a) joins current labels across edges (both directions) and takes the
    * per-node min, then (b) shortcuts by adopting the label's own label —
    * step (b) halves the distance-to-root, so convergence is
    * O(log diameter) iterations, not O(diameter) (a 40-link chain
    * converges in ~6 rounds — spec-verified). Per iteration: two shuffle
    * joins + one hash aggregate, all columnar; the only driver-side value
    * is the single convergence count. `maxIters` bounds adversarial
    * inputs; `localCheckpoint` truncates the growing lineage each
    * iteration (iterative self-joins otherwise re-plan the full history).
    *
    * At 100 TB this is the standard alternating-propagation shape (cf. the
    * large-star/small-star formulation): edge-partitioned, no component
    * materialized in one place, skew-safe because labels aggregate by node.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String = "doc_a",
      dstCol: String = "doc_b",
      maxIters: Int = 48): DataFrame = {
    val und = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .unionByName(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .distinct()
      .materialize
    var labels = und.select(col("u").as("node")).distinct()
      .withColumn("component", col("node"))
      .materialize
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      // (a) neighbor labels: for edge (u,v), u can adopt v's current label
      val viaNeighbors = und
        .join(labels.withColumnRenamed("node", "v"), "v")
        .select(col("u").as("node"), col("component"))
      val propagated = labels.unionByName(viaNeighbors)
        .groupBy(col("node"))
        .agg(min(col("component")).as("component"))
      // (b) pointer jumping: component values are themselves node ids, so
      // every label resolves — adopt label(label(node)), halving depth
      val jumped = propagated
        .join(
          propagated.select(col("node").as("component"), col("component").as("__jump")),
          "component")
        .select(col("node"), col("__jump").as("component"))
      // ONE materialization carries both the next labels and the per-node
      // change flag: the convergence scalar then reads checkpointed rows
      // instead of re-running the labels join as its own shuffle job —
      // at fixpoint-iteration counts the per-round job floor, not data
      // volume, dominates wall-clock on small-to-mid graphs
      // materializeFresh, not materialize: the propagate+jump plan
      // self-joins `propagated`, which SQUARES the preserved
      // sizeInBytes statistic every iteration — without the stats
      // reset a long fixpoint run (or a caller looping over this, like
      // Graph.boruvkaForest) spends its wall-clock in BigInteger stats
      // math, not in Spark jobs (see Materialize.freshStats)
      val next = jumped
        .join(labels.select(col("node"), col("component").as("__prev")), "node")
        .select(col("node"), col("component"),
          (col("component") =!= col("__prev")).as("__changed"))
        .materializeFresh
      val changed = next.filter(col("__changed")).limit(1).count()
      labels = next.select(col("node"), col("component"))
      converged = changed == 0L
      iter += 1
    }
    // LOUD non-convergence: a silent exit at maxIters returns STALE
    // labels that split true components — downstream math (dedup
    // cluster picks, Borůvka round selections) would be quietly wrong.
    // Found the hard way: the round-4 Borůvka forest (a ~2000-node
    // spanning tree of chained star merges) needed > 20 iterations,
    // and the old silent cap made the MST re-select the same bridge
    // edges forever. Converged runs exit early, so a generous default
    // cap costs nothing.
    require(converged,
      s"connectedComponents did not converge within $maxIters " +
        "iterations — raise maxIters (labels would be silently stale)")
    labels
  }

  /** End-to-end near-dup dedup: detect near-duplicate clusters (MinHash
    * LSH → verified pairs → connected components) and keep ONE document per
    * cluster — the component's minimum id — plus every unclustered doc.
    * This is the operator a training-data pipeline actually runs; the
    * pieces are exposed separately for inspection/tuning.
    * One extra shuffle beyond pair-finding: the anti-join of `docs` against
    * the (tiny relative to corpus) non-canonical member list. */
  def dedupNearMinhash(
      docs: DataFrame,
      threshold: Double,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val pairs = nearDupMinhash(docs, threshold, idCol, textCol,
      maxBucketSize = maxBucketSize).select(col("doc_a"), col("doc_b"))
    val losers = connectedComponents(pairs)
      .filter(col("node") =!= col("component"))
      .select(col("node").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** [[dedupNearMinhash]] with a caller-chosen representative: keep the
    * cluster member MAXIMIZING `scoreCol` (tie-break minimum id) instead of
    * the minimum id — the real curation policy (keep the longest / highest-
    * quality copy, not the accidentally-lowest id). Unclustered docs keep
    * themselves (component defaults to own id via the left join). Same
    * plan as the min-id variant plus one per-component window whose
    * partitions are cluster-sized — never corpus-sized. */
  def dedupNearMinhashKeepBest(
      docs: DataFrame,
      threshold: Double,
      scoreCol: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val pairs = nearDupMinhash(docs, threshold, idCol, textCol,
      maxBucketSize = maxBucketSize).select(col("doc_a"), col("doc_b"))
    val comps = connectedComponents(pairs).withColumnRenamed("node", idCol)
    val w = Window.partitionBy(col("__comp"))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    docs
      .join(comps, Seq(idCol), "left")
      .withColumn("__comp", coalesce(col("component"), col(idCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__comp", "component")
  }

  /** SimHash per document (32-bit, portable math). Near-dups = pairs with
    * small hamming distance; block by 16-bit halves so candidates at
    * hamming ≤ 1 per half collide — O(n) + bucket-local joins, same scale
    * properties as MinHash banding.
    * Token hashes are materialized behind an Exchange first — inlined they
    * would be recomputed once per simhash bit (32× md5+conv per token). */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .repartition(col(idCol))
      .select(col(idCol), tokenHashes(tokens(col(textCol))).as("__th"))
      .repartition(col(idCol))
      .select(col(idCol), simhashFromHashes(col("__th")).as("simhash"))

  /** SimHash near-dup pairs: block on 16-bit halves (a pair at hamming ≤ h
    * over 32 bits matches exactly on at least one half when h ≤ 1; for
    * h ≤ 3 this is a recall/cost trade documented here), verify exact
    * hamming ≤ maxHamming via bit_count(xor).
    *
    * Pair expansion goes through [[boundedBucketPairs]] (same machinery as
    * MinHash banding): a block bucket holding a giant identical-doc cluster
    * degrades to O(n) star pairs instead of a quadratic join output. For
    * oversized buckets of near-but-not-identical members this is a recall
    * trade — pairs are verified against the anchor only (see the
    * connectivity caveat on boundedBucketPairs). */
  def nearDupSimhash(
      docs: DataFrame,
      maxHamming: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val sh = simhash(docs, idCol, textCol)
    val exploded = sh.select(
      col(idCol), col("simhash"),
      posexplode(array(
        concat(lit("lo:"), col("simhash") % 65536L),
        concat(lit("hi:"), floor(col("simhash") / 65536L))))
        .as(Seq("band_idx", "band_key")))
    boundedBucketPairs(exploded, idCol, maxBucketSize, payload = Some("simhash"))
      // a pair can collide on both halves: dedupe once, then verify
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(first(col("sh_a")).as("sh_a"), first(col("sh_b")).as("sh_b"))
      .select(
        col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Generic Hamming-LSH near-dup pairs over ANY packed integer
    * fingerprint table (image dHash, audio chromaprint-style bits, a
    * 64-bit simhash) — the [[nearDupSimhash]] recipe generalized: band the
    * hash into `bands` runs of `bandBits` bits, bucket-join per band, then
    * verify exact `bit_count(xor) <= maxHamming`.
    *
    * EXHAUSTIVE by construction when `maxHamming < bands` (enforced):
    * fewer differing bits than bands pigeonholes at least one band clean,
    * so banding finds every qualifying pair and an independent all-pairs
    * oracle can check equality, not just recall. `groupCol` (e.g. the
    * fingerprint's bit-width for variable-geometry images) scopes buckets
    * so only comparable fingerprints pair. Pair expansion rides
    * [[boundedBucketPairs]]: a giant identical-fingerprint cluster
    * degrades to O(n) star pairs, not a quadratic bucket join. */
  def nearDupHamming(
      hashes: DataFrame,
      idCol: String = "doc_id",
      hashCol: String = "dhash",
      groupCol: Option[String] = None,
      bands: Int = 6,
      bandBits: Int = 7,
      maxHamming: Int = 3,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    require(bands > 0 && bandBits > 0, s"need positive bands/bandBits: $bands/$bandBits")
    require(bands * bandBits <= 63, s"bands*bandBits must fit a BIGINT: ${bands * bandBits}")
    require(maxHamming < bands,
      s"maxHamming ($maxHamming) must be < bands ($bands) for the exhaustive guarantee")
    val mask = (1L << bandBits) - 1
    val grp = groupCol
      .map(g => concat(col(g).cast("string"), lit("|")))
      .getOrElse(lit(""))
    val bandKeys = array((0 until bands).map { b =>
      concat(grp,
        expr(s"CAST(shiftright($hashCol, ${b * bandBits}) & ${mask}L AS STRING)"))
    }: _*)
    val exploded = hashes
      .select(col(idCol), col(hashCol),
        posexplode(bandKeys).as(Seq("band_idx", "band_key")))
    boundedBucketPairs(exploded, idCol, maxBucketSize, payload = Some(hashCol))
      // a pair can collide on several bands: dedupe once, then verify
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(first(col("sh_a")).as("sh_a"), first(col("sh_b")).as("sh_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Cross-document repeated-span detection — exact substring dedup at
    * token-window granularity (the Lee et al. 2022 "Deduplicating Training
    * Data" tier between full-text exact dedup and MinHash near-dup): every
    * `window`-token sliding window is hashed; a window whose hash also
    * occurs in ANOTHER document marks its span; per document, overlapping
    * marked spans merge into maximal repeated regions
    * [start_tok, end_tok).
    *
    * Plan (scale-sane at 100 TB): token arrays materialize behind one
    * Exchange (the interpreted-HOF CSE barrier), window hashes are a
    * Generate; "appears in another doc" is MIN≠MAX over a window
    * partitioned by hash — a spill-safe shuffle ∝ window instances, no
    * vocabulary-sized join or broadcast, no countDistinct expand; span
    * merging is lag/sum windows keyed by doc. Strict-overlap merge: two
    * marked windows join one span iff they share tokens (gap-0 adjacency
    * stays separate — the combined region need not repeat as a unit). */
  def repeatedSpans(
      docs: DataFrame,
      window: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(window > 0, s"window must be positive: $window")
    val np = docs.sparkSession.sparkContext.defaultParallelism
    val wh = docs
      .select(col(idCol), tokens(col(textCol)).as("__tl"))
      .repartition(np, col(idCol))
      .filter(size(col("__tl")) >= window)
      .select(
        col(idCol),
        posexplode(transform(
          sequence(lit(0), size(col("__tl")) - window),
          i => md5(array_join(slice(col("__tl"), i + lit(1), lit(window)), " "))))
          .as(Seq("pos", "whash")))
    val byHash = Window.partitionBy(col("whash"))
    val dup = wh
      .withColumn("__mn", min(col(idCol)).over(byHash))
      .withColumn("__mx", max(col(idCol)).over(byHash))
      .filter(col("__mn") =!= col("__mx"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    dup
      .withColumn(
        "__new",
        when(coalesce(col("pos") - lag(col("pos"), 1).over(byDoc), lit(window)) >= window, 1L)
          .otherwise(0L))
      .withColumn(
        "span_idx",
        sum(col("__new")).over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("span_idx"))
      .agg(
        min(col("pos")).cast("long").as("start_tok"),
        (max(col("pos")) + window).cast("long").as("end_tok"),
        count(lit(1)).cast("long").as("n_windows"))
  }

  /** The apply step of [[repeatedSpans]]: scrub every repeated span and
    * rebuild the cleaned document. Coverage is an INTERVAL OVERLAY, not a
    * range join: span starts (+1) and ends (−1) union with the token rows
    * and a running SUM over (pos, kind) marks covered tokens — one window
    * pass, shuffle ∝ tokens + 2·spans, versus a pos∈[start,end) range join
    * that would explode at 100 TB. Kind ordering puts both deltas before
    * the token at the same position, so end-exclusive semantics hold and
    * gap-0 adjacent spans hand over coverage exactly. Reassembly buffers
    * are bounded by document size. */
  def removeRepeatedSpans(
      docs: DataFrame,
      window: Int = 8,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spans = repeatedSpans(docs, window, idCol, textCol)
    val starts = spans.select(col(idCol), col("start_tok").as("pos"),
      lit(1L).as("delta"), lit(0).as("kind"), lit(null).cast("string").as("token"))
    val ends = spans.select(col(idCol), col("end_tok").as("pos"),
      lit(-1L).as("delta"), lit(0).as("kind"), lit(null).cast("string").as("token"))
    val toks = docs
      .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("pos", "token")))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        lit(0L).as("delta"), lit(1).as("kind"), col("token"))
    val cov = starts.unionByName(ends).unionByName(toks)
      .withColumn(
        "__cov",
        sum(col("delta")).over(
          Window.partitionBy(col(idCol)).orderBy(col("pos"), col("kind"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("kind") === 1)
    cov
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("long").as("n_tokens"),
        count(when(col("__cov") === 0L, 1)).cast("long").as("n_kept"),
        count(when(col("__cov") > 0L, 1)).cast("long").as("n_removed"),
        // a fully-covered doc keeps zero tokens: empty string, not null
        coalesce(
          array_join(
            transform(
              array_sort(collect_list(when(col("__cov") === 0L,
                struct(col("pos"), col("token"))))),
              s => s.getField("token")),
            " "),
          lit("")).as("clean_text"))
  }

  /** Benchmark decontamination: flag training documents sharing any word
    * n-gram with a held-out test set. The test side (benchmark suites —
    * small by construction, even when the train corpus is 100 TB) collapses
    * to a distinct shingle set and BROADCASTS; the train side is one narrow
    * explode + broadcast hash join + hash agg — no all-pairs work, shuffle
    * proportional to contaminated shingle instances only. Returns one row
    * per contaminated train doc with its overlapping-shingle count
    * (the shingle set is per-doc distinct, so the count is distinct
    * n-grams). Long-id inputs shingle through the fused [[shingleSigTable]]
    * kernel (one tokenization pass per doc) — the columnar `shingles` HOF
    * re-splits the text once per n-gram (the interpreted-lambda cliff
    * documented on [[shingleTable]]). Other id types (the kernel's typed
    * encoder casts ids to long, which would null UUIDs) take the
    * Exchange-materialized columnar path: same output, id type preserved. */
  def decontaminate(
      train: DataFrame,
      test: DataFrame,
      n: Int = 5,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    def grams(df: DataFrame) =
      if (df.schema(idCol).dataType == org.apache.spark.sql.types.LongType)
        shingleSigTable(df, idCol, textCol, n, numHashes = 0)
          .select(col(idCol), explode(col("__sh")).as("__g"))
      else
        df.select(col(idCol), tokens(col(textCol)).as("__tl"))
          .repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
          .select(col(idCol), explode(shingles(col("__tl"), n)).as("__g"))
    val testGrams = grams(test).select(col("__g")).distinct()
    grams(train)
      .join(broadcast(testGrams), Seq("__g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_overlap_grams"))
  }

  /** EXACT set-similarity self-join via prefix filtering (the
    * AllPairs/PPJoin family): every document pair whose distinct-shingle
    * Jaccard is >= `threshold`, with no approximation — the deterministic
    * counterpart of [[nearDupMinhash]] (which trades recall for fewer
    * candidates). Pigeonhole bound: J(A,B) >= t implies |A∩B| >= t·|A|, so
    * any qualifying partner must share one of A's `|A| - ceil(t·|A|) + 1`
    * rarest shingles ("rarest" by a global (doc-frequency, shingle) order —
    * rare shingles have few owners, so the candidate equi-join on prefix
    * shingles stays small; frequency is a COUNT window over the shingle
    * column, vocabulary-sized and never broadcast). PPJoin's length filter
    * (t <= |B|/|A| <= 1/t) and positional filter (suffix-bound on the
    * achievable overlap from each shared prefix token) prune candidates
    * before the pair dedup. Survivors are verified exactly per pair via
    * `array_intersect` on the per-doc shingle arrays — verify moves
    * |candidates| rows, not |candidates|·|set| exploded rows (measured ~5×
    * end-to-end on the dense sf0.1 corpus: 39.5 s → 8.2 s). All pruning arithmetic backs ceil/floor
    * off by 1e-9 so float wobble can only ADD candidates, never drop a
    * true pair — exactness rests on the verify step alone. Every stage is
    * a shuffle join or window: no all-pairs compare, no broadcast ceiling,
    * no driver state. */
  def prefixJaccardJoin(
      docs: DataFrame,
      threshold: Double,
      shingleN: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxPostingLen: Long = 10000L): DataFrame = {
    require(threshold > 0.0 && threshold < 1.0, s"threshold in (0,1): $threshold")
    import org.apache.spark.sql.expressions.Window
    // long ids take the fused mapPartitions shingle kernel (the columnar
    // HOF is interpreted — the CodegenFallback cliff documented on
    // [[shingleTable]]); other id types keep the columnar path
    val shArr = (
      if (docs.schema(idCol).dataType == org.apache.spark.sql.types.LongType)
        shingleSigTable(docs, idCol, textCol, shingleN, numHashes = 0)
          .select(col(idCol), col("__sh"))
      else
        docs.select(col(idCol), shingles(tokens(col(textCol)), shingleN).as("__sh"))
    ).filter(size(col("__sh")) > 0)
    val ts = shArr.select(col(idCol), explode(col("__sh")).as("tok"))
    val wDoc = Window.partitionBy(col(idCol))
    val ranked = ts
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("tok"))))
      .withColumn("s", count(lit(1)).over(wDoc))
      .withColumn("rn", row_number().over(wDoc.orderBy(col("df"), col("tok"))))
    // every ceil/floor below backs off by 1e-9 so a float landing an ulp
    // above an exact integer can only lengthen a prefix or keep a
    // candidate — wobble may ADD work, never drop a qualifying pair
    val eps = 1e-9
    val prefix = ranked
      .filter(col("rn") <= col("s") - ceil(lit(threshold) * col("s") - eps) + 1)
      .select(col(idCol), col("tok"), col("s"), col("rn"))
      .materialize // feeds the valve + both sides of the candidate join
    assertPostingBound(prefix, "tok", maxPostingLen, "prefixJaccardJoin")
    // candidate generation with the two PPJoin prunes applied per shared
    // prefix token, BEFORE the pair dedup:
    //  - length filter: t <= |B|/|A| <= 1/t is necessary for J >= t
    //  - positional filter: this shared token plus everything after it in
    //    both prefixes bounds the overlap; if even that bound misses the
    //    required overlap ceil(t/(1+t)·(|A|+|B|)), the pair cannot qualify
    //    from this token (a pair survives iff SOME shared token passes)
    val requiredOverlap =
      ceil(lit(threshold / (1.0 + threshold)) * (col("sa") + col("sb")) - eps)
    val cands = prefix.select(col(idCol).as("doc_a"), col("tok"),
        col("s").as("sa"), col("rn").as("ra"))
      .join(prefix.select(col(idCol).as("doc_b"), col("tok"),
        col("s").as("sb"), col("rn").as("rb")), Seq("tok"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(col("sb") >= ceil(lit(threshold) * col("sa") - eps) &&
        col("sb") <= floor(col("sa") / lit(threshold) + eps))
      .filter(lit(1) + least(col("sa") - col("ra"), col("sb") - col("rb")) >= requiredOverlap)
      .select("doc_a", "doc_b")
      .dropDuplicates("doc_a", "doc_b")
    // exact verify against the per-doc shingle ARRAYS (one row per doc, a
    // corpus-sized table — shuffle joins, never broadcast): the overlap is
    // a codegen'd array_intersect per surviving pair, so verify moves
    // |candidates| rows, not |candidates|·|set| exploded rows, and needs
    // no re-aggregation
    cands
      .join(shArr.select(col(idCol).as("doc_a"), col("__sh").as("sh_a")), Seq("doc_a"))
      .join(shArr.select(col(idCol).as("doc_b"), col("__sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("overlap"),
        size(col("sh_a")).cast("long").as("size_a"),
        size(col("sh_b")).cast("long").as("size_b"))
      .withColumn("jaccard",
        col("overlap").cast("double") /
          (col("size_a") + col("size_b") - col("overlap")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("overlap"),
        col("size_a"), col("size_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Cross-corpus shingle overlap — which snapshot/source overlaps which,
    * the decision input for cross-dump dedup ordering (dedup the pair with
    * the highest containment first; skip pairs with ~zero overlap).
    *
    * One row per unordered corpus pair (`corpus_a < corpus_b`): distinct-
    * shingle intersection size, per-corpus vocabulary sizes, directional
    * containment `|A∩B|/|A|` and `|A∩B|/|B|`, and vocabulary Jaccard.
    *
    * Plan (corpus count k is small — dozens of dumps — while shingle
    * cardinality is data-scale):
    *  1. shingle kernel per doc (spread by `idCol`, same two-Exchange
    *     contract as [[shingleTable]]), explode to (corpus, shingle) rows;
    *  2. ONE shuffle on `shingle`: `collect_set(corpus)` both dedups
    *     (corpus, shingle) pairs map-side and yields the ≤ k-element corpus
    *     set per shingle — no (corpus, shingle) `distinct` pre-pass and no
    *     shingle self-join (which would shuffle twice and explode hot
    *     shingles k² ways before aggregation);
    *  3. vocabulary sizes AND pair intersections both derive from that one
    *     aggregate (the shingle-keyed Exchange is reused across the two
    *     branches); pair expansion is ≤ k(k−1)/2 rows per shingle;
    *  4. the k-row size table joins back via broadcast.
    * NEVER keys a shuffle by corpus (k partitions = guaranteed skew).
    *
    * `sampleMod > 1` is the deterministic scale path: only shingles whose
    * 60-bit md5 hash ≡ 0 (mod sampleMod) participate. This is universe
    * sampling (every corpus keeps the SAME 1/sampleMod shingle subset), so
    * containment/Jaccard computed on the sample are unbiased estimates of
    * the full-vocabulary ratios while counts scale down ~sampleMod× — and
    * because the sample is a pure function of the shingle bytes, the result
    * is exactly replayable (md5 in DuckDB), not merely statistically close.
    *
    * NULL corpus labels are ignored end-to-end (`collect_set` drops nulls,
    * and the size table derives from the collected sets) — unlabeled docs
    * contribute to no pair and no vocabulary. */
  def corpusOverlap(
      docs: DataFrame,
      corpusCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3,
      sampleMod: Int = 1,
      strategy: String = "auto"): DataFrame = {
    require(sampleMod >= 1, s"sampleMod must be >= 1, got $sampleMod")
    require(Set("auto", "bitmask", "pairwise")(strategy), s"unknown strategy $strategy")
    val srcs = docs
      .select(col(corpusCol).cast("string").as("corpus"))
      .where(col("corpus").isNotNull)
      .distinct()
    // k = corpus count: bounded by construction (dumps/snapshots, not
    // data). The count is the operator's one driver-side scalar — a k-row
    // aggregate, same bounds argument as Similarity.dimsOf / Layout's
    // min-max head().
    val k = srcs.count()
    // per-doc key attach happens BEFORE the explode (doc rows, not shingle
    // rows), and the shuffle carries the key, not the corpus string
    def sampledBy(d: DataFrame, keyCol: String): DataFrame = {
      val ex = d
        .repartition(col(idCol))
        .select(col(keyCol),
          explode(shingles(tokens(col(textCol)), shingleN)).as("shingle"))
      if (sampleMod == 1) ex
      else ex.filter(tokenHash60(col("shingle")) % sampleMod === 0)
    }
    val base = docs.select(col(idCol), col(textCol),
      col(corpusCol).cast("string").as("corpus"))
    val useBitmask = strategy match {
      case "bitmask" =>
        require(k <= 62, s"bitmask strategy packs corpus sets into one long: k=$k > 62")
        true
      case "pairwise" => false
      // auto = pairwise: the C(k,2) per-shingle pair fan-out never hits the
      // wire (map-side combine collapses to <= C(k,2) keys per partition)
      // and warm within-JVM A/B at the 100× smoke measured pairwise faster
      // at BOTH k=20 (5.1 vs 6.6 s) and k=60 (5.5 vs 6.3 s) — the mask
      // path's extra stages cost more than the row generation it saves at
      // any vocabulary this host can hold. The bitmask strategy remains
      // the opt-in shape for the regime the fixture cannot reach:
      // billions of DISTINCT shingles × large k, where per-shingle CPU
      // (× C(k,2) row-gens vs × 1 bit_or) dominates fixed stage costs.
      case "auto" => false
    }
    if (useBitmask) {
      val srcIdx = srcs.withColumn("__idx",
        (row_number().over(Window.orderBy(col("corpus"))) - 1).cast("int"))
      bitmaskOverlap(sampledBy(base.join(broadcast(srcIdx), Seq("corpus")), "__idx"), srcIdx)
    } else pairwiseOverlap(sampledBy(base.where(col("corpus").isNotNull), "corpus"))
  }

  /** Bitmask-rollup overlap (k ≤ 62 corpora — the common case): sources
    * map to bit indices IN NAME ORDER (so index order ≡ name order and
    * `ia < ib` reproduces `corpus_a < corpus_b`), one `bit_or` per shingle
    * packs its corpus set into a long, identical masks AGGREGATE before
    * any pair math. Pair fan-out becomes distinct_masks × C(popcount, 2)
    * instead of shingles × C(k, 2) — the boilerplate shingle shared by all
    * k corpora, which the naive explode turns into C(k,2) rows PER
    * SHINGLE, collapses into one mask row. Worst case (every shingle a
    * unique mask) degrades to the pairwise shape, never below it. */
  private def bitmaskOverlap(sampled: DataFrame, srcIdx: DataFrame): DataFrame = {
    val maskCounts = sampled
      .groupBy(col("shingle"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), __idx))").as("mask"))
      .groupBy(col("mask"))
      .agg(count(lit(1)).as("cnt"))
    val bits = maskCounts.select(col("mask"), col("cnt"),
      explode(expr("filter(sequence(0, 61), i -> ((mask >> i) & 1) = 1)")).as("__idx"))
    val sizes = bits.groupBy(col("__idx"))
      .agg(sum(col("cnt")).cast("long").as("vocab"))
      .join(broadcast(srcIdx), Seq("__idx"))
    val pairs = bits.select(col("mask"), col("cnt"), col("__idx").as("__ia"))
      .join(bits.select(col("mask"), col("__idx").as("__ib")), Seq("mask"))
      .filter(col("__ia") < col("__ib"))
      .groupBy(col("__ia"), col("__ib"))
      .agg(sum(col("cnt")).cast("long").as("inter"))
    pairs
      .join(broadcast(sizes.select(col("__idx").as("__ia"),
        col("corpus").as("corpus_a"), col("vocab").as("vocab_a"))), Seq("__ia"))
      .join(broadcast(sizes.select(col("__idx").as("__ib"),
        col("corpus").as("corpus_b"), col("vocab").as("vocab_b"))), Seq("__ib"))
      .select(overlapOutput: _*)
  }

  /** Array-explode overlap fallback for k > 62 corpora (mask exceeds one
    * long): the round-7 original — collect_set per shingle, pair explode
    * capped at C(k,2) rows per shingle. */
  private def pairwiseOverlap(sampled: DataFrame): DataFrame = {
    val bySh = sampled
      .groupBy(col("shingle"))
      .agg(sort_array(collect_set(col("corpus"))).as("srcs"))
    val sizes = bySh
      .select(explode(col("srcs")).as("corpus"))
      .groupBy(col("corpus"))
      .agg(count(lit(1)).as("vocab"))
    val pairs = bySh
      .filter(size(col("srcs")) >= 2)
      .select(explode(col("srcs")).as("corpus_a"), col("srcs"))
      .select(col("corpus_a"), explode(col("srcs")).as("corpus_b"))
      .filter(col("corpus_a") < col("corpus_b"))
      .groupBy(col("corpus_a"), col("corpus_b"))
      .agg(count(lit(1)).cast("long").as("inter"))
    pairs
      .join(broadcast(sizes.select(col("corpus").as("corpus_a"), col("vocab").as("vocab_a"))),
        Seq("corpus_a"))
      .join(broadcast(sizes.select(col("corpus").as("corpus_b"), col("vocab").as("vocab_b"))),
        Seq("corpus_b"))
      .select(overlapOutput: _*)
  }

  /** Blocking-based fuzzy matching over a string attribute's VALUE DOMAIN
    * — the entity-resolution/record-linkage candidate step ("red bolt" ≈
    * "hot bolt"): pairs of DISTINCT values that share a blocking key and
    * sit within `maxDist` Levenshtein edits, each carrying its row count.
    *
    * Scale design: the rows collapse to the value histogram first (hash
    * aggregate with map-side combine — the only row-sized pass), so the
    * quadratic work runs over distinct values per block, not rows; the
    * length-band filter (|len a − len b| ≤ maxDist, a sound necessary
    * condition for the edit bound) prunes candidates before the O(len²)
    * DP runs. Block-key choice is the cost dial exactly as in the LSH
    * family: pair count per block is C(distinct-in-block, 2). Pairs are
    * generated a < b once (no mirror duplicates). */
  def fuzzyNameJoin(
      df: DataFrame,
      nameCol: String,
      blockOf: Column => Column,
      maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    val names = df.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).cast("long").as("n"))
      .withColumn("__blk", blockOf(col("name")))
    val a = names.select(col("name").as("name_a"), col("n").as("n_a"),
      col("__blk"))
    val b = names.select(col("name").as("name_b"), col("n").as("n_b"),
      col("__blk"))
    a.join(b, Seq("__blk"))
      .filter(col("name_a") < col("name_b"))
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .filter(levenshtein(col("name_a"), col("name_b")) <= maxDist)
      .select(col("name_a"), col("name_b"), col("n_a"), col("n_b"),
        levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
  }

  /** Loud fan-out valve shared by the exact prefix-filter joins
    * ([[prefixJaccardJoin]], [[exactJaccardJoin]],
    * [[exactContainmentJoin]]). The candidate stage of each is an
    * equi-join on inverted-index tokens, so one token owned by `d`
    * documents contributes O(d²) candidate pairs — superlinear the
    * moment a posting list outgrows the rare-first prefix bound (mass
    * exact duplication, a degenerate tokenizer, a threshold far below
    * the corpus's similarity floor). These joins are EXACT tiers:
    * silently capping a posting list (the [[nearDupMinhash]]
    * `maxBucketSize` star-pair degrade) would break the exactness
    * contract, so the valve FAILS LOUDLY instead — one vocabulary-sized
    * aggregate over the (already checkpointed) index, then a clear
    * exception naming the hot-token count, worst posting length, and
    * the estimated pair mass, before the quadratic join is attempted.
    * `maxPostingLen <= 0` disables the valve for callers who mean it. */
  private def assertPostingBound(
      index: DataFrame, tokCol: String, maxPostingLen: Long,
      op: String): Unit =
    if (maxPostingLen > 0)
      assertPostingCounts(
        index.groupBy(col(tokCol))
          .agg(count(lit(1)).cast("long").as("__d")),
        maxPostingLen, op)

  /** [[assertPostingBound]] over an already-counted posting table
    * (one row per token, length in `__d`). */
  private def assertPostingCounts(
      counts: DataFrame, maxPostingLen: Long, op: String): Unit = {
      val stats = counts
        .agg(
          coalesce(max(col("__d")), lit(0L)).as("max_d"),
          coalesce(sum(when(col("__d") > maxPostingLen, 1L)), lit(0L))
            .as("n_hot"),
          coalesce(sum(expr("__d * (__d - 1) div 2")), lit(0L))
            .as("est_pairs"))
        .head()
      if (stats.getLong(0) > maxPostingLen)
        throw new IllegalStateException(
          s"$op: posting-list fan-out valve tripped — ${stats.getLong(1)} " +
          s"token(s) exceed maxPostingLen=$maxPostingLen (worst posting " +
          s"length ${stats.getLong(0)}; estimated candidate pairs across " +
          s"the index ~${stats.getLong(2)}). Candidate pairs per token " +
          "grow as C(d,2): raise the threshold, increase shingleN, " +
          "pre-dedup exact duplicates first, or switch to the " +
          "nearDupMinhash LSH tier. Pass maxPostingLen=0 only if this " +
          "quadratic cost is intended.")
    }

  /** Shared output projection of both overlap paths. */
  private def overlapOutput: Seq[Column] = Seq(
    col("corpus_a"), col("corpus_b"), col("inter"),
    col("vocab_a"), col("vocab_b"),
    round(col("inter").cast("double") / col("vocab_a").cast("double"), 6)
      .as("containment_a"),
    round(col("inter").cast("double") / col("vocab_b").cast("double"), 6)
      .as("containment_b"),
    round(col("inter").cast("double") /
      (col("vocab_a") + col("vocab_b") - col("inter")).cast("double"), 6)
      .as("jaccard"))

  /** EXACT Jaccard-threshold self-join with prefix filtering (the
    * PPJoin-family baseline [[nearDupMinhash]]'s LSH approximates):
    * order each document's distinct shingles by global rarity
    * (df asc, shingle asc); if J(A,B) ≥ t the two PREFIXES of length
    * |d| − ⌈t·|d|⌉ + 1 must share a shingle, so the inverted index is
    * built over prefixes only — rare-first ordering keeps candidate
    * buckets small where a naive shingle join explodes. Candidates
    * verify with exact integer set math (common via a count join,
    * union = |A|+|B|−common) and the threshold DECISION is the integer
    * compare common·10⁶ ≥ t_ppm·union — no float can flip a pair.
    *
    * This is the exact ground-truth generator for the LSH recall
    * measurement (q_minhash_recall): complete where banding may miss,
    * at the documented O(Σ prefix-df²) candidate cost — the price of
    * exactness the LSH tier exists to avoid at 100 TB.
    *
    * Plan: one tokenize+explode, df aggregate + per-doc rank windows,
    * prefix-keyed candidate join (checkpointed prefix frame feeds both
    * sides), verify joins on the exploded table. */
  def exactJaccardJoin(
      docs: DataFrame, thresholdPpm: Long = 500000L,
      idCol: String = "doc_id", textCol: String = "text",
      shingleN: Int = 3, maxPostingLen: Long = 10000L): DataFrame = {
    require(thresholdPpm > 0 && thresholdPpm < 1000000L,
      s"thresholdPpm must be in (0, 1e6): $thresholdPpm")
    val ex = docs
      .select(col(idCol).cast("long").as("id"),
        explode(shingles(tokens(col(textCol)), shingleN)).as("s"))
      .materialize // feeds df, ranks, and both verify joins
    val dfTab = ex.groupBy(col("s")).agg(count(lit(1)).cast("long").as("df"))
    val ranked = ex.join(dfTab, Seq("s"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("s")))
        .cast("long"))
      .withColumn("sz", count(lit(1)).over(
        Window.partitionBy(col("id"))).cast("long"))
    val prefix = ranked
      .filter(col("rk") <= col("sz") -
        expr(s"(($thresholdPpm * sz) + 999999) div 1000000") + 1)
      .select(col("id"), col("s"))
      .materialize // both sides of the candidate self-join + the valve
    assertPostingBound(prefix, "s", maxPostingLen, "exactJaccardJoin")
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
    val sizes = ex.groupBy(col("id")).agg(count(lit(1)).cast("long").as("sz"))
    cand
      .join(ex.select(col("id").as("doc_a"), col("s")), Seq("doc_a"))
      .join(ex.select(col("id").as("doc_b"), col("s")), Seq("doc_b", "s"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).cast("long").as("common"))
      .join(sizes.select(col("id").as("doc_a"), col("sz").as("sz_a")),
        Seq("doc_a"))
      .join(sizes.select(col("id").as("doc_b"), col("sz").as("sz_b")),
        Seq("doc_b"))
      .filter(col("common") * lit(1000000L) >=
        lit(thresholdPpm) * (col("sz_a") + col("sz_b") - col("common")))
      .select(col("doc_a"), col("doc_b"), col("common"),
        col("sz_a"), col("sz_b"),
        round(col("common").cast("double") /
          (col("sz_a") + col("sz_b") - col("common")), 6).as("jaccard"))
  }

  /** EXACT containment join — the ASYMMETRIC sibling of
    * [[exactJaccardJoin]]: pairs where |A∩B|/|A| ≥ τ, i.e. document A
    * is (near-)CONTAINED in B — quotes, snippets, partial copies, the
    * duplication Jaccard misses when B is much longer than A. Prefix
    * filtering still applies, but one-sided: the required overlap
    * t = ceil(τ·|A|) depends only on the PROBE side, so A contributes
    * its |A| − t + 1 globally-rarest shingles and B indexes ALL of its
    * shingles (a contained A can sit anywhere inside B). Candidates =
    * prefix(A) ⋈ index(B), a ≠ b both directions; verification counts
    * the exact intersection; the decision is the integer compare
    * common·10⁶ ≥ τppm·|A|.
    *
    * Scale: candidate volume is Σ_A prefix(A)·df — the same rare-first
    * bound as the Jaccard join, minus the symmetric pruning (the
    * honest price of asymmetry). */
  def exactContainmentJoin(
      docs: DataFrame, thresholdPpm: Long = 800000L,
      idCol: String = "doc_id", textCol: String = "text",
      shingleN: Int = 3, maxPostingLen: Long = 10000L): DataFrame = {
    require(thresholdPpm > 0 && thresholdPpm <= 1000000L,
      s"thresholdPpm must be in (0, 1e6]: $thresholdPpm")
    val ex = docs
      .select(col(idCol).cast("long").as("id"),
        explode(shingles(tokens(col(textCol)), shingleN)).as("s"))
      .materialize // feeds df, ranks, index, and both verify joins
    val dfTab = ex.groupBy(col("s")).agg(count(lit(1)).cast("long").as("df"))
    val ranked = ex.join(dfTab, Seq("s"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("s")))
        .cast("long"))
      .withColumn("sz", count(lit(1)).over(
        Window.partitionBy(col("id"))).cast("long"))
    val prefix = ranked
      .filter(col("rk") <= col("sz") -
        expr(s"(($thresholdPpm * sz) + 999999) div 1000000") + 1)
      .select(col("id"), col("s"))
    // the candidate fan-out per token is prefixDf·indexDf, and every
    // prefix posting list is a subset of the matching index list, so
    // valving the PREFIX-RESTRICTED index (index tokens that occur in
    // some prefix — the only ones the join ever touches) bounds both
    // factors. Cost shape: two vocabulary-sized COUNT aggregates
    // (map-side combined) joined to each other — never a row-level
    // semi-join of the full exploded index.
    if (maxPostingLen > 0)
      assertPostingCounts(
        ex.groupBy(col("s")).agg(count(lit(1)).cast("long").as("__d"))
          .join(prefix.select(col("s")).distinct(), Seq("s"), "leftsemi"),
        maxPostingLen, "exactContainmentJoin")
    val cand = prefix.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
    val sizes = ex.groupBy(col("id")).agg(count(lit(1)).cast("long").as("sz"))
    cand
      .join(ex.select(col("id").as("doc_a"), col("s")), Seq("doc_a"))
      .join(ex.select(col("id").as("doc_b"), col("s")), Seq("doc_b", "s"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).cast("long").as("common"))
      .join(sizes.select(col("id").as("doc_a"), col("sz").as("sz_a")),
        Seq("doc_a"))
      .join(sizes.select(col("id").as("doc_b"), col("sz").as("sz_b")),
        Seq("doc_b"))
      .filter(col("common") * lit(1000000L) >=
        lit(thresholdPpm) * col("sz_a"))
      .select(col("doc_a"), col("doc_b"), col("common"),
        col("sz_a"), col("sz_b"),
        round(col("common").cast("double") / col("sz_a"), 6)
          .as("containment"))
  }
}
