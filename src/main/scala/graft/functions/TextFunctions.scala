package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reusable columnar text/hash building blocks.
  *
  * Everything here is built from `org.apache.spark.sql.functions` higher-order
  * functions (codegen'd, no UDFs) and is deliberately *portable to ANSI SQL /
  * DuckDB* so the driver's oracle can mirror each computation exactly:
  *  - token hash = first 15 hex digits of md5 → 60-bit non-negative long
  *    (DuckDB: `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`)
  *  - MinHash   = ONE md5 per element → 30-bit base m = (60-bit prefix)
  *    mod 2^30, then k affine mixes h_i(m) = (A_i·m + B_i) mod (2^31 − 1)
  *    (see [[minhashA]]/[[minhashB]]); min over elements per i
  *  - shingles  = n-gram word windows joined with '_'
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokens: word runs or single punctuation marks. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0))

  /** Word n-gram shingles (distinct), joined with '_'.
    * A 31-word vocabulary makes unigram sets near-identical across documents
    * (measured jaccard ≈ 0.62 at sf0.01), so near-dup detection MUST shingle. */
  def shingles(toks: Column, n: Int): Column =
    // size < n must yield EMPTY: sequence(0, -1) is the DESCENDING array
    // [0, -1] in Spark, which would index slice(toks, 0, n) and throw.
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(
        array_distinct(
          transform(
            sequence(lit(0), size(toks) - lit(n)),
            i => array_join(slice(toks, i + lit(1), lit(n)), "_"))))

  /** MinHash affine-permutation constants: h_i(m) = (A_i·m + B_i) mod P over
    * the 30-bit base hash m. One md5 per element + k cheap mixes, instead of
    * k salted md5s — measured 6× faster on the dedup kernel, same LSH
    * guarantees (affine over Z_P is the standard pairwise-independent-ish
    * family). All constants/products stay inside exact signed-64 range
    * (A < 2^31, m < 2^30 → A·m < 2^61), so DuckDB BIGINT math mirrors this
    * bit-for-bit. */
  val MinhashP: Long = 2147483647L // 2^31 - 1 (Mersenne prime)
  def minhashA(i: Int): Long = (1103515245L * (i + 1) + 12345L) % MinhashP
  def minhashB(i: Int): Long = (1103515245L * (i + 17) + 12345L) % MinhashP

  /** 30-bit base hash of one element: 60-bit md5 prefix folded mod 2^30. */
  def minhashBase(t: Column): Column = tokenHash60(t) % 1073741824L

  /** MinHash signature: k affine-mix minima over per-element base hashes.
    * Empty input yields NULL (no evidence), matching the fused kernel.
    * NOTE: this columnar tier re-runs `minhashBase` (an md5) per (i, token)
    * because interpreted HOF lambdas don't CSE — it exists as the
    * cross-check/reference implementation; the production path is the fused
    * kernel in `Dedup.shingleSigTable`, which hashes each element once. */
  def minhashSignature(toks: Column, k: Int): Column =
    when(size(toks) === 0, lit(null).cast("array<bigint>"))
      .otherwise(
        // k == 0 must yield []: sequence(0, -1) is the DESCENDING array
        // [0, -1] in Spark (same trap shingles() guards against)
        if (k == 0) array().cast("array<bigint>")
        else transform(
          sequence(lit(0L), lit(k - 1L)),
          i => {
            val a = (lit(1103515245L) * (i + lit(1L)) + lit(12345L)) % MinhashP
            val b = (lit(1103515245L) * (i + lit(17L)) + lit(12345L)) % MinhashP
            array_min(transform(toks, t => (a * minhashBase(t) + b) % MinhashP))
          }))

  /** LSH band keys over a MinHash signature: b bands of r rows, each band's
    * signature slice joined to one string key. Two docs collide on a band
    * iff their slices match exactly — P(collide) = J^r per band. */
  def bandKeys(sig: Column, b: Int, r: Int): Column =
    transform(
      sequence(lit(0), lit(b - 1)),
      j => array_join(
        transform(slice(sig, j * lit(r) + lit(1), lit(r)), x => x.cast("string")),
        "_"))

  /** Portable 60-bit token hash (non-negative long). */
  def tokenHash60(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** Array of 60-bit token hashes. Callers that feed [[simhashFromHashes]]
    * should MATERIALIZE this column behind an Exchange first — inlined, the
    * md5+conv work is re-evaluated once per simhash bit (32×). */
  def tokenHashes(toks: Column): Column = transform(toks, t => tokenHash60(t))

  /** 32-bit SimHash packed into a long: bit i is 1 iff the sum over tokens of
    * ±1 (sign of token-hash bit i) is positive. Columnar: the token-hash
    * array is computed once, then one `aggregate` per bit (Scala-level loop —
    * shift amounts must be literals) — O(32·|tokens|) per row, no shuffle.
    * 32 bits (not 64) keeps every intermediate exact in portable BIGINT math. */
  def simhash32(toks: Column): Column = simhashFromHashes(tokenHashes(toks))

  /** Rabin-Karp-style polynomial rolling hash over an (ideally
    * pre-materialized) token-hash array: h = Σ th_i · B^(n-1-i) mod P,
    * order-SENSITIVE (unlike min-hash/simhash fingerprints, token
    * reordering changes it). Portability trick: with P = 2^31 − 1
    * (Mersenne) and B = 2^16, B^k mod P = 2^((16k) mod 31) — every term is
    * pure shifts/mods in BIGINT, so DuckDB mirrors it exactly with a list
    * comprehension. Per-term mod keeps products < 2^61 and the final sum
    * < n·2^31 — no overflow either side. */
  def rollingHash(hashes: Column): Column = {
    val P = 2147483647L // 2^31 - 1
    val n = size(hashes)
    // the Scala shiftleft() wrapper takes a literal Int shift; the SQL
    // function accepts a column — call it directly for the variable shift
    val terms = transform(hashes, (h, i) =>
      (h % P) * call_function("shiftleft", lit(1L), (lit(16) * (n - 1 - i)) % 31) % P)
    // empty array -> NULL, matching the DuckDB mirror (list_sum([]) is
    // NULL) and the null-signature convention for no-evidence inputs
    when(n === 0, lit(null).cast("long"))
      .otherwise(aggregate(terms, lit(0L), (acc, t) => acc + t) % P)
  }

  /** SimHash packing over an (ideally pre-materialized) token-hash array. */
  def simhashFromHashes(hashes: Column): Column = {
    (0 until 32)
      .map { b =>
        val bitSum = aggregate(
          hashes,
          lit(0L),
          (acc, h) => acc + when(shiftright(h, b) % 2L === 1L, 1L).otherwise(-1L))
        when(bitSum > 0L, lit(1L << b)).otherwise(lit(0L))
      }
      .reduce(_ + _)
  }

  /** Exact jaccard between two distinct-element arrays, rounded for oracle
    * stability. */
  def jaccard(a: Column, b: Column): Column =
    round(
      size(array_intersect(a, b)).cast("double") /
        size(array_union(a, b)).cast("double"),
      6)

  /** Directional containment |a ∩ b| / |a| — the asymmetric companion to
    * [[jaccard]]: a short document quoted inside a long one scores near 1
    * here while its Jaccard stays low (the union is dominated by the long
    * doc), so subset/quotation duplicates need this score, not Jaccard. */
  def containment(a: Column, b: Column): Column =
    round(
      size(array_intersect(a, b)).cast("double") / size(a).cast("double"),
      6)

  /** Rolling-hash document fingerprint: min-md5 over tokens (1-hash MinHash)
    * plus a full-text md5 — both portable. */
  def fingerprint(text: Column): Column = md5(text)
}
