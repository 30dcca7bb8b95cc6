package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators: per-document stats, language-ID heuristic,
  * token frequencies, fingerprints. All narrow maps + one aggregate at most;
  * nothing driver-bound. */
object TextAnalysis {

  /** Tiny per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Deliberately SQL-expressible (the oracle mirrors them). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "fr" -> Seq("le", "la", "de", "et", "un"),
    "es" -> Seq("el", "la", "de", "y", "un"),
    "de" -> Seq("der", "die", "das", "und", "ein"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Per-document stats: token counts (whitespace + regex-BPE-ish),
    * char counts, average token length, stopword ratio. */
  def textStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val en = stopwords("en")
    docs.select(
      col("doc_id"),
      col("lang"),
      length(col(textCol)).cast("long").as("n_chars"),
      size(toks).cast("long").as("n_tokens"),
      size(regexTokens(col(textCol))).cast("long").as("n_regex_tokens"),
      size(array_distinct(toks)).cast("long").as("n_uniq_tokens"),
      round(
        length(regexp_replace(col(textCol), lit(" "), lit(""))).cast("double") /
          size(toks).cast("double"),
        6).as("avg_token_len"),
      round(
        size(filter(toks, t => t.isin(en: _*))).cast("double") /
          size(toks).cast("double"),
        6).as("stopword_ratio"))
  }

  /** Stopword-profile language ID: score per lang = #tokens in its stopword
    * set; prediction = argmax, ties broken alphabetically. (The testdata's
    * text is synthetic English-ish word soup, so predictions won't match the
    * `lang` column — the operator contract is determinism + the mechanics.) */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    def score(lang: String): Column =
      size(filter(toks, t => t.isin(stopwords(lang): _*))).cast("long")
    val langs = Seq("de", "en", "es", "fr", "zh") // alphabetical = tie-break order
    val scored = docs.select(
      col("doc_id") +: col("lang").as("labeled_lang") +:
        langs.map(l => score(l).as(s"s_$l")): _*)
    val best = langs.map(l => col(s"s_$l")).reduce(greatest(_, _))
    // first lang (alphabetically) attaining the max; zero stopword hits in
    // EVERY language means no evidence at all -> 'und', not the tie-break
    val pred = langs.foldRight(lit("und"): Column) { (l, acc) =>
      when(col(s"s_$l") === best, lit(l)).otherwise(acc)
    }
    // foldRight builds when(de)...otherwise(when(en)...) — evaluation order
    // IS alphabetical-first, which is the tie-break we want.
    scored.withColumn("pred_lang", when(best === 0L, lit("und")).otherwise(pred))
  }

  /** Gopher-style document quality gate: cheap, fully-columnar heuristics
    * (token count, mean token length, stopword ratio, symbol ratio) and a
    * first-failing-rule verdict. Pure narrow map — filters at 100 TB cost
    * one scan. Ratio thresholds compare the round(x,6) values so the
    * boundary is identical in the DuckDB oracle. */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val en = stopwords("en")
    val scored = docs.select(
      col("doc_id"),
      col("lang"),
      size(toks).cast("long").as("n_tokens"),
      round(
        length(regexp_replace(col(textCol), lit(" "), lit(""))).cast("double") /
          size(toks).cast("double"),
        6).as("avg_token_len"),
      round(
        size(filter(toks, t => t.isin(en: _*))).cast("double") /
          size(toks).cast("double"),
        6).as("stopword_ratio"),
      round(
        size(regexp_extract_all(col(textCol), lit("[^\\w\\s]"), lit(0))).cast("double") /
          greatest(length(col(textCol)), lit(1)).cast("double"),
        6).as("symbol_ratio"))
    scored.withColumn(
      "verdict",
      when(col("n_tokens") < 10L, "too_short")
        .when(col("n_tokens") > 100000L, "too_long")
        .when(col("avg_token_len") < 2.0 || col("avg_token_len") > 12.0, "token_len")
        .when(col("symbol_ratio") > 0.1, "symbols")
        .when(col("lang") === "en" && col("stopword_ratio") < 0.01, "stopwords")
        .otherwise("ok"))
  }

  /** Token frequency per (lang, token) — explode + hash aggregate; partial
    * aggregation (map-side combine) keeps the shuffle proportional to
    * distinct (lang, token), not row count. */
  def tokenFrequencies(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(col("lang"), explode(tokens(col(textCol))).as("token"))
      .groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("freq"))

  /** Fixed-size token chunking — the context-window packing step of an LLM
    * training pipeline: each document becomes ⌈n_tokens/chunkSize⌉ chunks of
    * `chunkSize` whitespace tokens (last chunk ragged). One Generate + narrow
    * maps, no shuffle; chunk rows inherit the document's partitioning, so a
    * downstream repartition-by-size is the only scale knob. `sequence` steps
    * by chunkSize over token offsets; `slice`/`concat_ws` are codegen'd
    * builtins (no interpreted HOF in the hot path). */
  def chunkDocuments(
      docs: DataFrame,
      chunkSize: Int = 50,
      textCol: String = "text"): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive: $chunkSize")
    docs
      .select(col("doc_id"), tokens(col(textCol)).as("__tl"))
      // split() never yields an empty array ("" -> [""]), but guard anyway:
      // sequence(0, -1) would DESCEND (the shingles() trap)
      .filter(size(col("__tl")) > 0)
      .select(col("doc_id"), col("__tl"),
        explode(sequence(lit(0), size(col("__tl")) - 1, lit(chunkSize))).as("__i"))
      .select(
        col("doc_id"),
        (col("__i") / chunkSize).cast("long").as("chunk_idx"),
        concat_ws(" ", slice(col("__tl"), col("__i") + 1, lit(chunkSize))).as("chunk_text"),
        least(lit(chunkSize), size(col("__tl")) - col("__i")).cast("long").as("n_tokens"))
  }

  /** Document fingerprints: full-text md5 + min-token-md5 (1-hash MinHash)
    * + a 32-bit SimHash + an order-sensitive Rabin-Karp rolling hash —
    * four independent signals, all portable.
    * Per-token md5/hash arrays are materialized behind an Exchange so the
    * simhash bit loop reads columns instead of re-hashing (see Dedup). */
  def fingerprints(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .repartition(col("doc_id"))
      .select(
        col("doc_id"),
        fingerprint(col(textCol)).as("text_md5"),
        array_min(transform(tokens(col(textCol)), t => md5(t))).as("min_token_md5"),
        tokenHashes(tokens(col(textCol))).as("__th"))
      .repartition(col("doc_id"))
      .select(
        col("doc_id"),
        col("text_md5"),
        col("min_token_md5"),
        simhashFromHashes(col("__th")).as("simhash"),
        rollingHash(col("__th")).as("rolling_hash"))
}
