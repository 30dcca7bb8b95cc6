package graft

import graft.operators.{Dedup, Eval, Multimodal, Normalize, Profiling, Retrieval, RuntimeFilter, Sampling, Sessionize, Similarity, Survival, TextAnalysis, Urls}
import graft.sources.ElbLogParser
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps
import graft.SparkEntry._

/** Text-family driver registrations — one slice of [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] (the round-14 monolith split: same entries,
  * same names, merged with a duplicate-key guard in SparkEntry). */
private[graft] object TextEntries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_stats" -> ((s, dir) =>
      TextAnalysis.textStats(table(s, dir, "documents"))),
    "q_lang_id" -> ((s, dir) =>
      TextAnalysis.langId(table(s, dir, "documents"))),
    "q_token_freq" -> ((s, dir) =>
      TextAnalysis.tokenFrequencies(table(s, dir, "documents"))),
    "q_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprints(table(s, dir, "documents"))),
    "q_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionStats(table(s, dir, "documents"))),
    "q_vocab_growth" -> ((s, dir) =>
      // Vocabulary-saturation curve: new trigrams per 50-doc crawl bucket.
      TextAnalysis.vocabGrowth(table(s, dir, "documents"))),
    "q_boilerplate" -> ((s, dir) =>
      // Corpus-wide shingle-df boilerplate/novelty profile per document —
      // the inter-document repetition signal q_repetition (within-doc)
      // cannot see. df >= 10 marks a trigram as boilerplate.
      TextAnalysis.boilerplateProfile(table(s, dir, "documents"), dfThreshold = 10L)),
    "q_entropy" -> ((s, dir) =>
      TextAnalysis.charEntropy(table(s, dir, "documents"))),
    "q_pii_redact" -> ((s, dir) => {
      // The synthetic corpus has no PII; splice deterministic doc_id-derived
      // email/IP/phone fragments into some documents (same parse-your-own-
      // synthesis pattern as q_parse_elb), then scrub. The oracle rebuilds
      // the identical text and mirrors the regexes in RE2.
      val d = col("doc_id")
      val withPii = table(s, dir, "documents").select(
        d,
        concat(
          col("text"),
          when(d % 3 === 0,
            concat(lit(" contact u"), d, lit("@example.com"))).otherwise(lit("")),
          when(d % 4 === 0,
            concat(lit(" host 10."), d % 256L, lit(".0."), d % 100L)).otherwise(lit("")),
          when(d % 5 === 0,
            concat(lit(" call 555-867-"), lpad((d % 10000L).cast("string"), 4, "0")))
            .otherwise(lit(""))).as("text"))
      TextAnalysis.redactPii(withPii)
    }),
    "q_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfTopK(table(s, dir, "documents"), k = 3)),
    "q_bm25" -> ((s, dir) =>
      // BM25 retrieval for a fixed 3-term query — the search-scoring
      // counterpart of q_tfidf; corpus side is one doc-keyed agg pass.
      TextAnalysis.bm25TopK(table(s, dir, "documents"),
        queryTerms = Seq("join", "vector", "spark"), k = 10)),
    "q_kneser_ney" -> ((s, dir) =>
      // Interpolated Kneser-Ney bigram LM (D=0.75): top-25 model rows
      // among bigrams with count >= 5 — continuation-count backoff from
      // exact BIGINT counts, one shared-text double chain.
      TextAnalysis.kneserNeyBigrams(table(s, dir, "documents"),
        k = 25, minCount = 5L)),
    "q_unigram_logprob" -> ((s, dir) =>
      // KenLM-shaped unigram quality score; corpus frequency is a window,
      // never a broadcast (vocabulary-sized — same discipline as q_tfidf).
      TextAnalysis.unigramLogProb(table(s, dir, "documents"))),
    "q_chunk_dedup" -> ((s, dir) => {
      // Within-doc boilerplate dedup. The synthetic corpus has no repeated
      // boilerplate, so splice a 5-token header/footer onto every doc (the
      // parse-your-own-synthesis pattern of q_pii_redact/q_multimodal_*):
      // the trailing copy dedups exactly when it lands window-aligned
      // ((5 + n_tokens) % 5 == 0) — the documented fixed-window trade-off.
      val boiler = "subscribe to our newsletter today"
      val withBoiler = table(s, dir, "documents").select(
        col("doc_id"),
        concat_ws(" ", lit(boiler), col("text"), lit(boiler)).as("text"))
      TextAnalysis.dedupChunksWithinDoc(withBoiler, chunkSize = 5)
    }),
    "q_keyword_spot" -> ((s, dir) =>
      // Blocklist content filter: per-(doc, needle) whole-token hit counts
      // — needles broadcast into a narrow map, only hit rows shuffle.
      TextAnalysis.keywordSpot(table(s, dir, "documents"),
        Seq("join", "vector", "spark", "data"))),
    "q_pmi_collocations" -> ((s, dir) =>
      // Church–Hanks PMI collocations: top adjacent-pair associations
      // above a count floor — one tokenization, vocabulary joins by key
      // (never broadcast), 1-row total broadcasts.
      TextAnalysis.pmiCollocations(table(s, dir, "documents"), minCount = 5L, k = 20)),
    "q_chunk_docs" -> ((s, dir) =>
      // Fixed-size token chunking (context-window packing) — one Generate,
      // no shuffle; ragged last chunk keeps every token exactly once.
      TextAnalysis.chunkDocuments(table(s, dir, "documents"), chunkSize = 50)),
    "q_quality_score" -> ((s, dir) =>
      TextAnalysis.qualityScore(table(s, dir, "documents"))),
    "q_curation_pipeline" -> ((s, dir) => {
      // Round-7 pipeline composition over the NEW curation tiers: Gopher
      // quality gate → corpus-wide boilerplate gate (integer-exact 0.6
      // threshold: 5·n_common ≤ 3·n_shingles) → token-budget mix (8k
      // budget, source-name weights) → per-source corpus accounting.
      // Fully oracled because every stage is.
      val d = table(s, dir, "documents")
      val ok = TextAnalysis.qualityScore(d)
        .filter(col("verdict") === "ok").select(col("doc_id"))
      val lowBp = TextAnalysis.boilerplateProfile(d, dfThreshold = 10L)
        .filter(col("n_shingles") === 0L || col("n_common") * 5 <= col("n_shingles") * 3)
        .select(col("doc_id"))
      // materialize the gated corpus ONCE: both the weight derivation and
      // the mix's prefix-sum checkpoint consume `gated`, and those run as
      // SEPARATE jobs (the mix materializes eagerly) — without this, the
      // quality + boilerplate pipeline is evaluated twice, since exchange
      // reuse cannot cross job boundaries. Only the three columns the
      // downstream stages read are kept.
      val gated = d.join(ok, Seq("doc_id"), "left_semi")
        .join(lowBp, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("source"), col("text"))
        .materialize
      val w = gated.select(col("source")).distinct()
        .withColumn("weight", (ascii(substring(col("source"), -1, 1)) % 3 + 1).cast("long"))
      Sampling.tokenBudgetMix(gated, w, totalBudget = 8000L)
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"))
    }),
    "q_bigram_logprob" -> ((s, dir) =>
      // Bigram LM quality score: corpus-conditional P(w2|w1) via windows
      // over the (doc, w1, w2) counts — vocabulary-sized tables, never
      // broadcast (the q_tfidf discipline).
      TextAnalysis.bigramLogProb(table(s, dir, "documents"))),
    "q_zipf" -> ((s, dir) =>
      // Rank-frequency slope per language — corpus-health diagnostic;
      // closed-form least-squares via regr_slope (Spark >= 3.4 builtin).
      TextAnalysis.zipfSlope(table(s, dir, "documents"))),
    "q_perplexity_sample" -> ((s, dir) => {
      // CCNet-style perplexity-bucket curation: score every doc with the
      // unigram LM, split the corpus at the exact 1/3 and 2/3 score
      // percentiles (a 2-row aggregate broadcast — NOT a global-order
      // ntile, which would serialize the corpus through one partition),
      // then keep head=100% / middle=50% / tail=10% by deterministic hash.
      // Scores are 1e6 fixed-point longs so the cutoff comparisons are
      // integer-exact against interpolated cutpoints in both engines.
      val scored = TextAnalysis.unigramLogProb(table(s, dir, "documents"))
        .select(col("doc_id"), round(col("avg_neg_logprob") * 1e6).cast("long").as("lp"))
      val cuts = scored
        .agg(expr("percentile(lp, array(0.33333333D, 0.66666667D))").as("c"))
        .select(element_at(col("c"), 1).as("c1"), element_at(col("c"), 2).as("c2"))
      val bucketed = scored.crossJoin(broadcast(cuts))
        .withColumn("bucket",
          when(col("lp") <= col("c1"), "head")
            .when(col("lp") <= col("c2"), "middle")
            .otherwise("tail"))
      val pct = when(col("bucket") === "head", 100)
        .when(col("bucket") === "middle", 50).otherwise(10)
      bucketed
        .filter(Sampling.hashBucket(
          concat(col("bucket"), lit(":"), col("doc_id")), 100) < pct)
        .select(col("doc_id"), col("lp"), col("bucket"))
    }),
    "q_cdc_chunk" -> ((s, dir) =>
      // Content-defined chunking: rolling-window hash boundaries (expected
      // chunk ~16 tokens), so insertions only shift chunks up to the next
      // content boundary — the storage-dedup property fixed windows lack.
      TextAnalysis.cdcChunk(table(s, dir, "documents"), window = 4, divisor = 16)),
    "q_linear_classifier" -> ((s, dir) =>
      // Hashed-feature linear quality classifier (fastText-shaped): bucket
      // tokens with the portable 60-bit md5 hash, score = mean deterministic
      // per-bucket weight. No vocabulary table, no broadcast — the feature-
      // hashing trick IS the 100 TB design.
      TextAnalysis.hashedLinearScore(table(s, dir, "documents"), nBuckets = 1024)),
    "q_nb_classifier" -> ((s, dir) =>
      // Multinomial Naive Bayes trained in-query on a weak label
      // (lang = 'en') and scored on the same corpus: fit + transform is
      // three shuffles of closed-form aggregates — no optimizer loop, no
      // vocabulary broadcast (class counts are a token-keyed window).
      TextAnalysis.naiveBayesScore(table(s, dir, "documents"), col("lang") === "en")),
    "q_quality_composite" -> ((s, dir) => {
      // Calibrated composite quality gate — what production curation ships:
      // heterogeneous signals (stopword density, symbol noise, unigram-LM
      // surprise) fused into one score with fixed weights (swap in trained
      // calibration weights; the plan — two aggregates joined on doc_id —
      // is identical). All inputs are round(,6) values, so the arithmetic
      // replays exactly.
      val docs = table(s, dir, "documents")
      val q = TextAnalysis.qualityScore(docs)
        .select(col("doc_id"), col("stopword_ratio"), col("symbol_ratio"))
      val u = TextAnalysis.unigramLogProb(docs)
        .select(col("doc_id"), col("avg_neg_logprob"))
      q.join(u, Seq("doc_id"))
        .withColumn("composite", round(
          least(col("stopword_ratio") * 5.0, lit(1.0)) * 0.4 +
            (lit(1.0) - least(col("symbol_ratio") * 10.0, lit(1.0))) * 0.3 +
            least(col("avg_neg_logprob") / 12.0, lit(1.0)) * 0.3, 6))
        .select(col("doc_id"), col("composite"),
          (col("composite") >= 0.55).as("keep"))
    }),
    "q_compress_ratio" -> ((s, dir) =>
      // Deflate quality tier, driver-checkable form: the DEFLATE bit-stream
      // is engine-internal, so the query emits exact assertions instead —
      // per-doc inflate(deflate(text)) == text and the zlib size bound —
      // which the oracle pins to 1 alongside the exact byte length. The
      // ratio ordering (repetitive << prose << noise) and determinism stay
      // pinned in CompressionRatioSpec over TextAnalysis.compressionRatio.
      TextAnalysis.deflateRoundtrip(table(s, dir, "documents"))),
    "q_classifier_eval" -> ((s, dir) =>
      // Per-class precision/recall/F1 of the language-ID heuristic against
      // the labeled lang — the eval gate before trusting a filter on the
      // full corpus. Confusion cells aggregate once; per-class rows are
      // tiny re-aggregations of the cells.
      Eval.confusionStats(
        TextAnalysis.langId(table(s, dir, "documents")),
        "pred_lang", "labeled_lang")),
    "q_cohens_kappa" -> ((s, dir) =>
      // Chance-corrected annotator agreement between the language-ID
      // heuristic and the labels — exact rational κ from one cells
      // aggregate + broadcast marginal products.
      Eval.cohensKappa(
        TextAnalysis.langId(table(s, dir, "documents")),
        "pred_lang", "labeled_lang")),
    "q_log_templates" -> ((s, dir) => {
      // Drain-style template mining over the synthesized ELB lines (same
      // fixture as q_parse_elb): variable fields (timestamp, client
      // ip:port) fall below the frequency floor and wildcard to <*>; the
      // whole corpus collapses to ONE template shape.
      val lines = table(s, dir, "events").select(col("event_id"),
        format_string(
          "%s elb u%d:%d 10.0.0.1:80 0.0 0.0 0.0 200 200 0 699 GET http://x/y HTTP/1.1",
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
          col("user_id"),
          col("event_id")).as("line"))
      TextAnalysis.logTemplates(lines, "event_id", "line", minDf = 1000L)
    }),
    "q_countmin" -> ((s, dir) =>
      // Deterministic count-min sketch (d=4, w=1024, md5 hash family):
      // probe estimates vs exact counts with the one-sided error flag in
      // the output; the sketch is d·w cells at any corpus size.
      TextAnalysis.countMinEstimate(table(s, dir, "documents"),
        probes = Seq("the", "spark", "data", "window", "zzz_absent"))),
    "q_good_turing" -> ((s, dir) =>
      // Good–Turing frequency-of-frequencies smoothing: N_r + smoothed
      // r* via an EXACT r+1 self-join (lead() would skip absent r).
      TextAnalysis.goodTuring(table(s, dir, "documents"))),
    "q_readability" -> ((s, dir) =>
      // Flesch–Kincaid grade per doc (vowel-run syllables, punctuation
      // sentences with ⌈words/15⌉ fallback) — narrow map, one scan.
      TextAnalysis.readability(table(s, dir, "documents"))),
    "q_bpe_pairs" -> ((s, dir) =>
      // BPE-training pair counts: corpus → word histogram (the only
      // corpus-sized pass) → pairs over DISTINCT words → top-20.
      TextAnalysis.bpePairs(table(s, dir, "documents"))),
    "q_bpe_train" -> ((s, dir) =>
      // Iterated BPE training: the 5-round merge sequence (argmax pair
      // per round, greedy left-to-right merge over the word histogram)
      // — the trained merge table a tokenizer ships; the oracle unrolls
      // rounds as MATERIALIZED CTEs and replays replace() bit-for-bit.
      TextAnalysis.bpeTrain(table(s, dir, "documents"), rounds = 5)),
    "q_bpe_apply" -> ((s, dir) =>
      // The trained tokenizer APPLIED: top-30 token histogram of the
      // corpus after the 5 merges (the post-merge segmentation IS the
      // tokenization — one explode + aggregate over the vocab table).
      TextAnalysis.bpeApply(table(s, dir, "documents"), rounds = 5,
        k = 30)),
    "q_bpe_train_batched" -> ((s, dir) =>
      // Batched BPE training (the 100 TB trainer shape): per round the
      // top-4 candidate pairs walked rank-first, every pair whose
      // symbol triple {l,r,lr} is disjoint from the already-SELECTED
      // triples merges in ONE replace job — up to 12 merges in 3
      // rounds vs 3 for sequential. The oracle replays the ranking,
      // the chained greedy selection (recursive CTE over the ≤4
      // candidates), and the slot-unrolled replace chain.
      TextAnalysis.bpeTrainBatched(table(s, dir, "documents"),
        rounds = 3, batchTopN = 4)),
    "q_bpe_heldout" -> ((s, dir) => {
      // Held-out tokenizer eval: train the 5-merge table on EVEN
      // doc_ids, tokenize the ODD half with the frozen merges (applied
      // in training order) — the honest train/test fertility read.
      val docs = table(s, dir, "documents")
      TextAnalysis.bpeHeldOutApply(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), rounds = 5, k = 30)
    }),
    "q_textrank" -> ((s, dir) =>
      // TextRank keywords: PageRank (= all-vertex-restart PPR, exact
      // micro-long walk) over the adjacent-word co-occurrence graph,
      // top-20 by (score, word).
      TextAnalysis.textRank(table(s, dir, "documents"), k = 20)),
    "q_bpe_fertility" -> ((s, dir) =>
      // Tokenizer fertility per source after the 5 trained merges:
      // tokens/word + chars/token — which domain the merge table
      // under-serves (near-character fertility = poor compression).
      TextAnalysis.bpeFertility(table(s, dir, "documents"), "source",
        rounds = 5)),
    "q_minimizer_sketch" -> ((s, dir) =>
      // (8,3)-minimizer sketch per doc: min 60-bit shingle hash per
      // 8-position window, distinct — the sampling sketch; window-min is
      // partitioned by doc, never global.
      TextAnalysis.minimizerSketch(table(s, dir, "documents"))),
    "q_neg_sampling_table" -> ((s, dir) =>
      // Word2vec negative-sampling prep: count^0.75 unigram distribution
      // with exact ppm cumulative ranges — vocabulary-sized, sampler
      // binary-searches the range column.
      TextAnalysis.negativeSamplingTable(table(s, dir, "documents"))),
    "q_jsd" -> ((s, dir) =>
      // Pairwise Jensen-Shannon divergence between document sources'
      // token distributions — symmetric, finite on disjoint vocabulary;
      // H(M) - (H(P)+H(Q))/2 with nano-quantized entropy terms.
      TextAnalysis.jsDivergence(table(s, dir, "documents"))),
    "q_hapax" -> ((s, dir) =>
      // Zipf-tail authenticity fingerprint per source: hapax/dis
      // legomena counts and the hapax share of vocabulary.
      TextAnalysis.hapaxProfile(table(s, dir, "documents"))),
    "q_rake" -> ((s, dir) =>
      // What is each source ABOUT? RAKE keyphrases: stopword-delimited
      // candidate runs, degree/frequency word scores micro-quantized so
      // phrase sums stay exact; deterministic top-10 per source.
      TextAnalysis.rakeKeyphrases(table(s, dir, "documents"))),
    "q_diversity_index" -> ((s, dir) =>
      // Template-farm screen per source: Shannon/Simpson/evenness of
      // the token distribution — exact pair counts + nano entropy.
      TextAnalysis.diversityIndex(table(s, dir, "documents"))),
    "q_hill_tail" -> ((s, dir) =>
      // How heavy is each language's token-frequency tail? Hill MLE on
      // counts >= 2 — the tail-only companion to q_zipf's OLS slope.
      TextAnalysis.hillTail(table(s, dir, "documents"))),
    "q_yules_k" -> ((s, dir) =>
      // Scale-invariant repeat rate per source — the TTR replacement
      // that survives corpus-size changes; exact decimal Σc².
      TextAnalysis.yulesK(table(s, dir, "documents"))),
    "q_dsir_weights" -> ((s, dir) =>
      // Which documents look like the English reference slice? DSIR
      // unigram importance weights: avg log p_target/p_source with
      // add-1 smoothing, micro-quantized per token — the cheap
      // resampling score before classifier-based filtering.
      graft.operators.TextAnalysis.dsirWeights(
        table(s, dir, "documents")
          .withColumn("is_en", col("lang") === "en"),
        "is_en")),
    "q_chi2_features" -> ((s, dir) => {
      // chi2 feature selection over the hashed bag-of-words vs the
      // is-English label: exact 2x2 cell counts per dimension, one
      // IEEE chain for the statistic.
      val docs = table(s, dir, "documents")
      val items = graft.operators.TextAnalysis.featureHash(
          docs, "doc_id", "text", numFeatures = 64)
        .select(col("doc_id"), col("dim"))
        .join(docs.select(col("doc_id"),
          (col("lang") === "en").as("is_en")), "doc_id")
      Eval.chi2FeatureScores(items, "doc_id", "dim", "is_en")
    }),
    "q_feature_hash" -> ((s, dir) => {
      // Hashing-trick featurizer: 64-dim signed bag-of-words, emitted
      // as non-zero (doc, dim, value) scalar rows — no vocabulary
      // table, both hashes the portable md5 family.
      graft.operators.TextAnalysis.featureHash(
        table(s, dir, "documents"), "doc_id", "text", numFeatures = 64)
    }),
    "q_vocab_stats" -> ((s, dir) => {
      // Vocabulary pruning table: per token tf/df/rank/coverage share
      // plus the is_rare (df < 2) and is_head (top-50% coverage) flags
      // a tokenizer filter pass consumes.
      graft.operators.TextAnalysis.vocabStats(
        table(s, dir, "documents"), "doc_id", "text",
        minDf = 2L, coveragePpm = 500000L)
    }),
    "q_ngram_novelty" -> ((s, dir) => {
      // Per-doc fraction of distinct 3-gram shingles unseen in any
      // earlier (lower-id) document — the arrival-order diversity
      // signal; a low-novelty batch is content the corpus already has.
      graft.operators.TextAnalysis.ngramNovelty(
        table(s, dir, "documents"), "doc_id", "text", n = 3)
    }),
    "q_extractive_chunks" -> ((s, dir) =>
      // Centroid-style extractive selection over 10-token pseudo-
      // sentences: per doc, the most TYPICAL chunk (highest mean corpus
      // log-prob — the summarizer's pick) and the most NOVEL one
      // (lowest — the curation-inspection pick). Vocabulary counts stay
      // a token-keyed shuffle join, never a broadcast.
      graft.operators.TextAnalysis.extractiveChunks(
        table(s, dir, "documents"), chunkTokens = 10)),
    "q_burrows_delta" -> ((s, dir) =>
      // Burrows' Delta stylometry between the document sources: z-score
      // the top-30 words' micro relative frequencies across sources,
      // mean |dz| per source pair — "which corpora write alike".
      graft.operators.TextAnalysis.burrowsDelta(
        table(s, dir, "documents"), k = 30)),
    "q_unigram_segment" -> ((s, dir) => {
      // Unigram-LM tokenizer segmentation (SentencePiece-style greedy
      // Viterbi) over the documents token stream: singles + top-64
      // substring pieces scored by micro log-prob, each of the top-30
      // words segmented by an exact integer DP fold (fewest pieces on
      // ties) - the segmentation-based complement of q_bpe_train.
      graft.operators.TextAnalysis.unigramSegment(
        table(s, dir, "documents"), "text",
        vocabMulti = 64, topWords = 30)
    }),
    "q_sw_align" -> ((s, dir) => {
      // Smith-Waterman LOCAL token alignment between consecutive
      // document pairs (match +2 / mismatch -1 / gap -1 / floor 0):
      // the plagiarized-SPAN detector complementing q_lcs_pairs'
      // global subsequence - a verbatim quote inside two otherwise
      // unrelated docs scores high here, low there.
      val d = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val pairs = d
        .select(col("doc_id").as("doc_a"), col("text").as("ta"))
        .join(d.select((col("doc_id") - 1).as("doc_a"),
          col("doc_id").as("doc_b"), col("text").as("tb")), Seq("doc_a"))
      graft.operators.TextAnalysis.swAlignPairs(pairs, "ta", "tb")
        .select(col("doc_a"), col("doc_b"), col("sw"), col("na"),
          col("nb"), col("sw_norm"))
    }),
    "q_lcs_pairs" -> ((s, dir) => {
      // Token-level LCS similarity between consecutive document pairs
      // (ROUGE-L's core statistic): the subsequence complement of
      // q_edit_distance (char-level) and q_ngram_jaccard (set-level) -
      // insertions on both sides tolerated. First 24 tokens per side;
      // exact integer DP via one map-side aggregate() fold per pair.
      val d = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val pairs = d
        .select(col("doc_id").as("doc_a"), col("text").as("ta"))
        .join(d.select((col("doc_id") - 1).as("doc_a"),
          col("doc_id").as("doc_b"), col("text").as("tb")), Seq("doc_a"))
      graft.operators.TextAnalysis.lcsTokenPairs(pairs, "ta", "tb")
        .select(col("doc_a"), col("doc_b"), col("lcs"), col("na"),
          col("nb"), col("lcs_ratio"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_unigram_segment" ->
      // identical vocab + the Viterbi window DP replayed as a
      // recursive CTE (4 LEFT JOINs against the score table per level;
      // NULL dp slots / out-of-vocab pieces kill a candidate in both
      // engines because greatest ignores NULLs)
      """WITH RECURSIVE toks AS (SELECT substr(w0, 1, 16) AS w FROM (
        |    SELECT unnest(list_filter(string_split(text, ' '),
        |      x -> length(x) > 0)) AS w0 FROM documents)),
        |wc AS MATERIALIZED (SELECT w, CAST(COUNT(*) AS BIGINT) AS cw
        |  FROM toks GROUP BY 1),
        |pi AS (SELECT w, cw,
        |    CAST(unnest(range(1, length(w) + 1)) AS BIGINT) AS i
        |  FROM wc),
        |pl AS (SELECT w, cw, i, CAST(unnest(range(1,
        |    least(4, length(w) - i + 1) + 1)) AS BIGINT) AS l FROM pi),
        |pieces AS (SELECT substr(w, CAST(i AS INT), CAST(l AS INT))
        |    AS piece, CAST(SUM(cw) AS BIGINT) AS cnt
        |  FROM pl GROUP BY 1),
        |multis AS (SELECT piece, cnt FROM (SELECT piece, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, piece) AS rk
        |  FROM pieces WHERE length(piece) > 1) WHERE rk <= 64),
        |vocab AS MATERIALIZED (
        |  SELECT piece, cnt FROM pieces WHERE length(piece) = 1
        |  UNION ALL SELECT piece, cnt FROM multis),
        |tott AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM vocab),
        |scores AS MATERIALIZED (SELECT piece,
        |    CAST(ROUND(ln(CAST(cnt AS DOUBLE) / tot) * 1000000, 0)
        |      AS BIGINT) AS sc
        |  FROM vocab CROSS JOIN tott),
        |words AS MATERIALIZED (SELECT w AS word, cw AS n_occurrences
        |  FROM (SELECT w, cw, row_number() OVER (ORDER BY cw DESC, w)
        |    AS rk FROM wc) WHERE rk <= 30),
        |r AS (
        |  SELECT word, n_occurrences, CAST(0 AS BIGINT) AS i,
        |      [CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |       CAST(NULL AS BIGINT), CAST(0 AS BIGINT)] AS win
        |    FROM words
        |  UNION ALL
        |  SELECT r.word, r.n_occurrences, r.i + 1,
        |      list_concat(r.win[2:], [greatest(
        |        r.win[4] + 64 * s1.sc - 1,
        |        r.win[3] + 64 * s2.sc - 1,
        |        r.win[2] + 64 * s3.sc - 1,
        |        r.win[1] + 64 * s4.sc - 1)])
        |    FROM r
        |    LEFT JOIN scores s1
        |      ON s1.piece = substr(r.word, CAST(r.i + 1 AS INT), 1)
        |    LEFT JOIN scores s2 ON r.i >= 1
        |      AND s2.piece = substr(r.word, CAST(r.i AS INT), 2)
        |    LEFT JOIN scores s3 ON r.i >= 2
        |      AND s3.piece = substr(r.word, CAST(r.i - 1 AS INT), 3)
        |    LEFT JOIN scores s4 ON r.i >= 3
        |      AND s4.piece = substr(r.word, CAST(r.i - 2 AS INT), 4)
        |    WHERE r.i < length(r.word)),
        |fin AS (SELECT word, n_occurrences, win[4] AS dp FROM r
        |  WHERE i = length(word))
        |SELECT word, n_occurrences, CAST(length(word) AS BIGINT)
        |    AS n_chars,
        |  64 - ((dp % 64) + 64) % 64 AS n_pieces,
        |  round(CAST((dp + (64 - ((dp % 64) + 64) % 64)) // 64
        |    AS DOUBLE) / 1000000, 6) AS score
        |FROM fin""".stripMargin,
    "q_sw_align" ->
      // the LCS recursive-CTE replay with the window extended by one
      // running-max slot (SW's answer is max over ALL cells)
      """WITH RECURSIVE docs AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '),
        |      x -> length(x) > 0)[1:24] AS tl
        |  FROM documents),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.tl AS ta, b.tl AS tb, CAST(len(a.tl) AS BIGINT) AS na,
        |    CAST(len(b.tl) AS BIGINT) AS nb
        |  FROM docs a JOIN docs b ON b.doc_id = a.doc_id + 1),
        |r AS (
        |  SELECT doc_a, doc_b, ta, tb, na, nb, CAST(0 AS BIGINT) AS t,
        |      [CAST(0 AS BIGINT) FOR i IN range(0, CAST(nb AS INT) + 2)]
        |        AS win
        |    FROM pairs WHERE na > 0 AND nb > 0
        |  UNION ALL
        |  SELECT doc_a, doc_b, ta, tb, na, nb, t + 1,
        |      list_concat(win[2:CAST(nb AS INT) + 1], [
        |        greatest(CAST(0 AS BIGINT),
        |          (CASE WHEN t % nb = 0 THEN CAST(0 AS BIGINT)
        |           ELSE win[1] END)
        |          + (CASE WHEN ta[CAST(t // nb AS INT) + 1]
        |                  = tb[CAST(t % nb AS INT) + 1]
        |             THEN 2 ELSE -1 END),
        |          win[2] - 1,
        |          (CASE WHEN t % nb = 0 THEN CAST(0 AS BIGINT)
        |           ELSE win[CAST(nb AS INT) + 1] END) - 1),
        |        greatest(win[CAST(nb AS INT) + 2],
        |          greatest(CAST(0 AS BIGINT),
        |            (CASE WHEN t % nb = 0 THEN CAST(0 AS BIGINT)
        |             ELSE win[1] END)
        |            + (CASE WHEN ta[CAST(t // nb AS INT) + 1]
        |                    = tb[CAST(t % nb AS INT) + 1]
        |               THEN 2 ELSE -1 END),
        |            win[2] - 1,
        |            (CASE WHEN t % nb = 0 THEN CAST(0 AS BIGINT)
        |             ELSE win[CAST(nb AS INT) + 1] END) - 1))])
        |    FROM r WHERE t < na * nb),
        |fin AS (SELECT doc_a, doc_b, na, nb,
        |    win[CAST(nb AS INT) + 2] AS sw
        |  FROM r WHERE t = na * nb
        |  UNION ALL SELECT doc_a, doc_b, na, nb, CAST(0 AS BIGINT)
        |  FROM pairs WHERE na = 0 OR nb = 0)
        |SELECT doc_a, doc_b, sw, na, nb,
        |  CASE WHEN least(na, nb) > 0
        |    THEN round(CAST(sw AS DOUBLE) / (2 * least(na, nb)), 6)
        |  ELSE NULL END AS sw_norm
        |FROM fin""".stripMargin,
    "q_lcs_pairs" ->
      // same rolling-window DP, replayed as a recursive CTE: the
      // working row carries the (nb+1)-cell window as a LIST and steps
      // one grid cell per recursion level (t = i*nb + j, row-major)
      """WITH RECURSIVE docs AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '),
        |      x -> length(x) > 0)[1:24] AS tl
        |  FROM documents),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.tl AS ta, b.tl AS tb, CAST(len(a.tl) AS BIGINT) AS na,
        |    CAST(len(b.tl) AS BIGINT) AS nb
        |  FROM docs a JOIN docs b ON b.doc_id = a.doc_id + 1),
        |r AS (
        |  SELECT doc_a, doc_b, ta, tb, na, nb, CAST(0 AS BIGINT) AS t,
        |      [CAST(0 AS BIGINT) FOR i IN range(0, CAST(nb AS INT) + 1)]
        |        AS win
        |    FROM pairs WHERE na > 0 AND nb > 0
        |  UNION ALL
        |  SELECT doc_a, doc_b, ta, tb, na, nb, t + 1,
        |      list_concat(win[2:], [CASE
        |        WHEN ta[CAST(t // nb AS INT) + 1]
        |             = tb[CAST(t % nb AS INT) + 1]
        |        THEN (CASE WHEN t % nb = 0 THEN CAST(0 AS BIGINT)
        |              ELSE win[1] END) + 1
        |        ELSE greatest(
        |          CASE WHEN t % nb = 0 THEN CAST(0 AS BIGINT)
        |          ELSE win[CAST(nb AS INT) + 1] END,
        |          win[2]) END])
        |    FROM r WHERE t < na * nb),
        |fin AS (SELECT doc_a, doc_b, na, nb,
        |    win[CAST(nb AS INT) + 1] AS lcs
        |  FROM r WHERE t = na * nb
        |  UNION ALL SELECT doc_a, doc_b, na, nb, CAST(0 AS BIGINT)
        |  FROM pairs WHERE na = 0 OR nb = 0)
        |SELECT doc_a, doc_b, lcs, na, nb,
        |  CASE WHEN greatest(na, nb) > 0
        |    THEN round(CAST(lcs AS DOUBLE) / greatest(na, nb), 6)
        |  ELSE NULL END AS lcs_ratio
        |FROM fin""".stripMargin,
    "q_quality_composite" ->
      s"""WITH $qualityCte, $unigramCte
         |SELECT q.doc_id,
         |  round(least(q.stopword_ratio * 5.0, 1.0) * 0.4 +
         |    (1.0 - least(q.symbol_ratio * 10.0, 1.0)) * 0.3 +
         |    least(u.avg_neg_logprob / 12.0, 1.0) * 0.3, 6) AS composite,
         |  round(least(q.stopword_ratio * 5.0, 1.0) * 0.4 +
         |    (1.0 - least(q.symbol_ratio * 10.0, 1.0)) * 0.3 +
         |    least(u.avg_neg_logprob / 12.0, 1.0) * 0.3, 6) >= 0.55 AS keep
         |FROM quality q JOIN u USING (doc_id)""".stripMargin,
    "q_textrank" -> textrankOracle,
    "q_jsd" ->
      s"""WITH tk AS (SELECT source AS g,
         |    unnest(string_split(text, ' ')) AS tok FROM documents),
         |counts AS (SELECT g, tok, CAST(COUNT(*) AS BIGINT) AS c FROM tk
         |  WHERE tok <> '' GROUP BY 1, 2),
         |tots AS (SELECT g, CAST(SUM(c) AS BIGINT) AS t
         |  FROM counts GROUP BY 1),
         |hp AS (SELECT g,
         |    CAST(SUM(${graft.operators.TextAnalysis
                  .entropyTermNanoSql("c", "t")}) AS BIGINT) AS h_nano
         |  FROM counts JOIN tots USING (g) GROUP BY g),
         |ex AS (SELECT LEAST(a.g, o.g2) AS ga, GREATEST(a.g, o.g2) AS gb,
         |    a.tok,
         |    CASE WHEN a.g < o.g2 THEN a.c ELSE 0 END AS c_a,
         |    CASE WHEN a.g < o.g2 THEN 0 ELSE a.c END AS c_b,
         |    CASE WHEN a.g < o.g2 THEN t.t ELSE o.t2 END AS t_a,
         |    CASE WHEN a.g < o.g2 THEN o.t2 ELSE t.t END AS t_b
         |  FROM counts a JOIN tots t ON a.g = t.g
         |  JOIN (SELECT g AS g2, t AS t2 FROM tots) o ON a.g <> o.g2),
         |pt AS (SELECT ga, gb, tok, CAST(SUM(c_a) AS BIGINT) AS ca,
         |    CAST(SUM(c_b) AS BIGINT) AS cb, CAST(MAX(t_a) AS BIGINT) AS ta,
         |    CAST(MAX(t_b) AS BIGINT) AS tb FROM ex GROUP BY 1, 2, 3),
         |hm AS (SELECT ga, gb, ta, tb,
         |    CAST(SUM(${graft.operators.TextAnalysis.jsMixtureTermNanoSql})
         |      AS BIGINT) AS hm_nano
         |  FROM pt GROUP BY 1, 2, 3, 4),
         |j AS (SELECT hm.ga, hm.gb, hm.ta, hm.tb, hm.hm_nano,
         |    pa.h_nano AS ha_nano, pb.h_nano AS hb_nano
         |  FROM hm JOIN hp pa ON pa.g = hm.ga JOIN hp pb ON pb.g = hm.gb)
         |SELECT ga AS corpus_a, gb AS corpus_b, ta, tb, hm_nano, ha_nano,
         |  hb_nano, ${graft.operators.TextAnalysis.jsdSql} AS jsd
         |FROM j""".stripMargin,
    "q_hapax" ->
      """WITH tk AS (SELECT source AS g,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |cnt AS (SELECT g, tok, CAST(COUNT(*) AS BIGINT) AS c FROM tk
        |  WHERE tok <> '' GROUP BY 1, 2),
        |a AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS vocab,
        |    CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_hapax,
        |    CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_dis
        |  FROM cnt GROUP BY 1)
        |SELECT g AS source, n_tokens, vocab, n_hapax, n_dis,
        |  CASE WHEN vocab > 0 THEN
        |    round(CAST(n_hapax AS DOUBLE) / vocab, 6) END AS hapax_ratio
        |FROM a""".stripMargin,
    "q_rake" -> {
      val stops = graft.operators.TextAnalysis.stopwords("en")
        .map(s => s"'$s'").mkString(", ")
      s"""WITH tl AS (SELECT source AS g, doc_id,
         |    string_split(text, ' ') AS tl FROM documents),
         |tk AS (SELECT g, doc_id, unnest(tl) AS tok,
         |    unnest(range(1, len(tl) + 1)) AS pos FROM tl),
         |tk2 AS (SELECT g, doc_id, tok, pos,
         |    tok IN ($stops) AS is_stop
         |  FROM tk WHERE tok <> ''),
         |runs AS (SELECT g, doc_id, tok, pos, is_stop,
         |    SUM(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER (
         |      PARTITION BY g, doc_id ORDER BY pos) AS grp
         |  FROM tk2),
         |ns AS (SELECT g, doc_id, tok, pos, grp,
         |    COUNT(*) OVER (PARTITION BY g, doc_id, grp) AS plen
         |  FROM runs WHERE NOT is_stop),
         |ws AS (SELECT g, tok, CAST(COUNT(*) AS BIGINT) AS freq,
         |    CAST(SUM(plen) AS BIGINT) AS deg FROM ns GROUP BY 1, 2),
         |ws2 AS (SELECT g, tok,
         |    ${graft.operators.TextAnalysis.rakeWordMicroSql} AS w_micro
         |  FROM ws),
         |ph AS (SELECT ns.g, ns.doc_id, ns.grp,
         |    string_agg(ns.tok, ' ' ORDER BY ns.pos) AS phrase,
         |    CAST(COUNT(*) AS BIGINT) AS n_words,
         |    CAST(SUM(w_micro) AS BIGINT) AS score_micro
         |  FROM ns JOIN ws2 ON ws2.g = ns.g AND ws2.tok = ns.tok
         |  GROUP BY 1, 2, 3),
         |agg AS (SELECT g, phrase, CAST(MAX(n_words) AS BIGINT) AS n_words,
         |    CAST(COUNT(*) AS BIGINT) AS n_occ,
         |    CAST(MAX(score_micro) AS BIGINT) AS score_micro
         |  FROM ph GROUP BY 1, 2),
         |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY g
         |    ORDER BY score_micro DESC, phrase) AS rn FROM agg)
         |SELECT g AS source, CAST(rn AS BIGINT) AS rnk, phrase, n_words,
         |  n_occ, round(CAST(score_micro AS DOUBLE) / 1000000, 6) AS score
         |FROM rk WHERE rn <= 10""".stripMargin
    },
    "q_diversity_index" ->
      s"""WITH tk AS (SELECT source AS g,
         |    unnest(string_split(text, ' ')) AS tok FROM documents),
         |cnt AS (SELECT g, tok, CAST(COUNT(*) AS BIGINT) AS c FROM tk
         |  WHERE tok <> '' GROUP BY 1, 2),
         |wt AS (SELECT g, c,
         |    CAST(SUM(c) OVER (PARTITION BY g) AS BIGINT) AS t FROM cnt),
         |wterm AS (SELECT g, c, t,
         |    ${graft.operators.TextAnalysis.entropyTermNanoSql("c", "t")}
         |      AS term FROM wt),
         |a AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS vocab,
         |    CAST(SUM(c) AS BIGINT) AS n_tokens,
         |    CAST(SUM(CAST(c AS DECIMAL(38,0)) * (c - 1))
         |      AS DECIMAL(38,0)) AS s_pairs,
         |    CAST(SUM(term) AS BIGINT) AS h_nano FROM wterm GROUP BY 1)
         |SELECT g AS source, n_tokens, vocab,
         |  CAST(s_pairs AS VARCHAR) AS s_pairs, h_nano,
         |  round(CAST(h_nano AS DOUBLE) / 1000000000, 6) AS shannon_nats,
         |  ${graft.operators.TextAnalysis.simpsonSql} AS simpson,
         |  CASE WHEN ${graft.operators.TextAnalysis.simpsonSql} > 0 THEN
         |    round(1.0 / ${graft.operators.TextAnalysis.simpsonSql}, 6)
         |    END AS inv_simpson,
         |  ${graft.operators.TextAnalysis.evennessSql} AS evenness
         |FROM a""".stripMargin,
    "q_text_stats" ->
      """SELECT doc_id, lang,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_regex_tokens,
        |  CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_uniq_tokens,
        |  round(CAST(length(replace(text,' ','')) AS DOUBLE)/len(string_split(text,' ')), 6) AS avg_token_len,
        |  round(CAST(len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
        |    /len(string_split(text,' ')), 6) AS stopword_ratio
        |FROM documents""".stripMargin,
    "q_lang_id" ->
      """WITH t AS (SELECT doc_id, lang AS labeled_lang, string_split(text,' ') AS tl FROM documents),
        |s AS (SELECT doc_id, labeled_lang,
        |  CAST(len(list_filter(tl, t -> t IN ('der','die','das','und','ein'))) AS BIGINT) AS s_de,
        |  CAST(len(list_filter(tl, t -> t IN ('the','a','of','and','to'))) AS BIGINT) AS s_en,
        |  CAST(len(list_filter(tl, t -> t IN ('el','la','de','y','un'))) AS BIGINT) AS s_es,
        |  CAST(len(list_filter(tl, t -> t IN ('le','la','de','et','un'))) AS BIGINT) AS s_fr,
        |  CAST(len(list_filter(tl, t -> t IN ('的','是','了','在','我'))) AS BIGINT) AS s_zh
        |FROM t)
        |SELECT doc_id, labeled_lang, s_de, s_en, s_es, s_fr, s_zh,
        |  CASE WHEN g = 0 THEN 'und'
        |       WHEN s_de = g THEN 'de' WHEN s_en = g THEN 'en' WHEN s_es = g THEN 'es'
        |       WHEN s_fr = g THEN 'fr' WHEN s_zh = g THEN 'zh' ELSE 'und' END AS pred_lang
        |FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS g FROM s)""".stripMargin,
    "q_token_freq" ->
      """SELECT lang, token, COUNT(*) AS freq FROM (
        |  SELECT lang, unnest(string_split(text,' ')) AS token FROM documents)
        |GROUP BY lang, token""".stripMargin,
    "q_fingerprint" ->
      // rolling_hash mirrors TextFunctions.rollingHash: P = 2^31-1, B = 2^16,
      // B^k mod P = 2^((16k) mod 31) (Mersenne), per-term mod, sum mod P
      s"""WITH toks AS (SELECT doc_id, text, string_split(text,' ') AS tl FROM documents)
         |SELECT doc_id, md5(text) AS text_md5,
         |  list_min(list_transform(tl, t -> md5(t))) AS min_token_md5,
         |  $simhashSqlExpr AS simhash,
         |  CAST(list_sum([
         |    ((CAST('0x'||substr(md5(tl[i]),1,15) AS BIGINT) % 2147483647)
         |      * (CAST(1 AS BIGINT) << ((16*(len(tl)-i)) % 31))) % 2147483647
         |    FOR i IN range(1, len(tl)+1)]) % 2147483647 AS BIGINT) AS rolling_hash
         |FROM toks""".stripMargin,
    "q_vocab_growth" ->
      s"""WITH $shingleCte,
         |ex AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
         |fs AS (SELECT shingle, min(doc_id) AS first_seen FROM ex GROUP BY 1)
         |SELECT first_seen // 50 AS bucket, CAST(count(*) AS BIGINT) AS new_shingles
         |FROM fs GROUP BY 1""".stripMargin,
    "q_boilerplate" ->
      s"""WITH $shingleCte,
         |ex AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
         |st AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df,
         |    min(doc_id) AS first_seen FROM ex GROUP BY 1),
         |p AS (SELECT e.doc_id,
         |    CAST(count(*) AS BIGINT) AS n_shingles,
         |    CAST(sum(CASE WHEN st.first_seen = e.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |    CAST(sum(CASE WHEN st.df >= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_common
         |  FROM ex e JOIN st ON st.shingle = e.shingle GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(p.n_shingles, 0) AS n_shingles,
         |  coalesce(p.n_novel, 0) AS n_novel,
         |  coalesce(p.n_common, 0) AS n_common,
         |  CASE WHEN p.n_shingles > 0
         |    THEN round(p.n_novel*1.0/p.n_shingles, 6) END AS novelty_ratio,
         |  CASE WHEN p.n_shingles > 0
         |    THEN round(p.n_common*1.0/p.n_shingles, 6) END AS boilerplate_ratio
         |FROM documents d LEFT JOIN p ON p.doc_id = d.doc_id""".stripMargin,
    "q_repetition" ->
      // bigrams: tl[i]||'_'||tl[i+1] for i in 1..len-1 (DuckDB lists are
      // 1-based; range() excludes its end) — mirrors shingles(toks, 2)
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS tl FROM documents),
        |b AS (SELECT doc_id, CAST(len(tl) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct([tl[i]||'_'||tl[i+1] FOR i IN range(1, len(tl))])) AS BIGINT)
        |    AS n_uniq_bigrams, tl FROM t),
        |top AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_token_freq FROM (
        |  SELECT doc_id, token, COUNT(*) AS c FROM (
        |    SELECT doc_id, unnest(tl) AS token FROM t) GROUP BY doc_id, token)
        |  GROUP BY doc_id),
        |r AS (SELECT b.doc_id, n_tokens, n_uniq_bigrams, top_token_freq,
        |  round(CAST(top_token_freq AS DOUBLE)/n_tokens, 6) AS top_token_ratio,
        |  CASE WHEN n_tokens < 2 THEN 0.0
        |       ELSE round(1.0 - CAST(n_uniq_bigrams AS DOUBLE)/(n_tokens-1), 6)
        |  END AS dup_bigram_ratio
        |FROM b JOIN top ON b.doc_id = top.doc_id)
        |SELECT *, CASE WHEN top_token_ratio > 0.2 THEN 'top_token'
        |               WHEN dup_bigram_ratio > 0.5 THEN 'dup_bigrams'
        |               ELSE 'ok' END AS verdict
        |FROM r""".stripMargin,
    "q_entropy" ->
      """WITH c AS (SELECT doc_id, length(text) AS n, unnest(string_split(text,'')) AS ch
        |  FROM documents),
        |g AS (SELECT doc_id, n, ch, COUNT(*) AS cnt FROM c GROUP BY doc_id, n, ch)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
        |  round(-SUM(cnt/CAST(n AS DOUBLE) * log2(cnt/CAST(n AS DOUBLE))), 6) AS entropy
        |FROM g GROUP BY doc_id, n""".stripMargin,
    "q_pii_redact" ->
      // same synthesized text, same patterns; RE2 needs the 'g' flag for
      // replace-all (Java regexp_replace is global by default)
      """WITH p AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' contact u'||doc_id||'@example.com' ELSE '' END ||
        |    CASE WHEN doc_id % 4 = 0 THEN ' host 10.'||(doc_id % 256)||'.0.'||(doc_id % 100) ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN ' call 555-867-'||lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
        |    AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9._]+@[a-z0-9.]+\.[a-z]+')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ip,
        |  CAST(len(regexp_extract_all(text, '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) AS BIGINT) AS n_phone,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[a-z0-9._]+@[a-z0-9.]+\.[a-z]+', '<EMAIL>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g') AS redacted
        |FROM p""".stripMargin,
    "q_tfidf" ->
      """WITH tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents)
        |  GROUP BY doc_id, term),
        |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
        |scored AS (SELECT doc_id, tf.term, tf, df,
        |    round(CAST(tf AS DOUBLE) * ln(n_docs/df), 6) AS tfidf
        |  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n)
        |SELECT doc_id, term, tf, df, tfidf, rn FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, term ASC) AS rn
        |  FROM scored)
        |WHERE rn <= 3""".stripMargin,
    "q_unigram_logprob" ->
      s"""WITH $unigramCte
         |SELECT doc_id, n_tokens, avg_neg_logprob FROM u""".stripMargin,
    "q_bm25" ->
      // Lucene-form idf ln(1 + (N-df+0.5)/(df+0.5)); k1=1.2, b=0.75;
      // round-6 before ranking, doc_id tie-break — mirrors bm25TopK exactly
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |perdoc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
        |       WHERE term IN ('join', 'vector', 'spark') GROUP BY doc_id, term),
        |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
        |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
        |    AVG(CAST(dl AS DOUBLE)) AS avgdl FROM perdoc),
        |scored AS (
        |  SELECT tf.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matched,
        |    round(SUM(
        |      ln((n_docs - df + 0.5) / (df + 0.5) + 1) *
        |      (CAST(tf AS DOUBLE) * 2.2) /
        |      (CAST(tf AS DOUBLE) + 1.2 * (1 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))), 6)
        |      AS score
        |  FROM tf JOIN perdoc USING (doc_id) JOIN dfreq USING (term) CROSS JOIN stats
        |  GROUP BY tf.doc_id)
        |SELECT doc_id, n_matched, score, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn FROM scored)
        |WHERE rn <= 10""".stripMargin,
    "q_kneser_ney" ->
      // Exact BIGINT bigram/continuation counts off one bigram table;
      // the probability is TextAnalysis.knProbSql verbatim
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tl
         |  FROM documents),
         |b AS (SELECT tl[i] AS w1, tl[i + 1] AS w2
         |  FROM (SELECT doc_id, tl, unnest(range(1, len(tl))) AS i
         |    FROM toks)),
         |big AS MATERIALIZED (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM b GROUP BY 1, 2),
         |lft AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS c1,
         |    CAST(COUNT(*) AS BIGINT) AS nfw FROM big GROUP BY 1),
         |rgt AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS nbw
         |  FROM big GROUP BY 1),
         |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nbig FROM big)
         |SELECT w1, w2, c, c1, nfw, nbw,
         |  ${graft.operators.TextAnalysis.knProbSql(0.75)} AS p_kn
         |FROM big JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN nb
         |WHERE c >= 5
         |ORDER BY p_kn DESC, w1, w2 LIMIT 25""".stripMargin,
    "q_perplexity_sample" ->
      // exact percentile cutpoints over 1e6 fixed-point scores; bucket
      // comparisons are integer-vs-interpolated (never ulp-ambiguous);
      // keep rates replayed with the md5 hash-bucket formula
      s"""WITH $unigramCte,
         |lp AS (SELECT doc_id, CAST(round(avg_neg_logprob * 1e6) AS BIGINT) AS lp FROM u),
         |cuts AS (SELECT quantile_cont(lp, 0.33333333) AS c1,
         |    quantile_cont(lp, 0.66666667) AS c2 FROM lp),
         |b AS (SELECT doc_id, lp,
         |    CASE WHEN lp <= c1 THEN 'head' WHEN lp <= c2 THEN 'middle' ELSE 'tail' END AS bucket
         |  FROM lp CROSS JOIN cuts)
         |SELECT doc_id, lp, bucket FROM b
         |WHERE CAST('0x' || substr(md5(bucket || ':' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
         |  % 100 < CASE bucket WHEN 'head' THEN 100 WHEN 'middle' THEN 50 ELSE 10 END""".stripMargin,
    "q_chunk_dedup" ->
      // same 5-token chunking as the q_chunk_docs oracle over the
      // boiler-spliced text; first occurrence per (doc, chunk_text) kept,
      // reassembly via ORDER BY on the kept chunk indexes
      """WITH p AS (SELECT doc_id,
        |    'subscribe to our newsletter today ' || text || ' subscribe to our newsletter today' AS text
        |  FROM documents),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS tl FROM p),
        |i AS (SELECT doc_id, tl, unnest(range(0, len(tl), 5)) AS i FROM toks),
        |ch AS (SELECT doc_id, CAST(i // 5 AS BIGINT) AS chunk_idx,
        |    array_to_string(tl[i+1:i+5], ' ') AS chunk_text FROM i),
        |n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks FROM ch GROUP BY doc_id),
        |first AS (SELECT doc_id, chunk_text, MIN(chunk_idx) AS chunk_idx
        |  FROM ch GROUP BY doc_id, chunk_text)
        |SELECT first.doc_id, n.n_chunks, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS clean_text,
        |  CAST(n.n_chunks - COUNT(*) AS BIGINT) AS n_dropped
        |FROM first JOIN n ON first.doc_id = n.doc_id
        |GROUP BY first.doc_id, n.n_chunks""".stripMargin,
    "q_compress_ratio" ->
      // the deflate bit-stream is engine-internal; the oracle pins the
      // exact byte length and the two Spark-side assertions to 1 — a
      // failed round-trip or size bound breaks the hash
      """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  1 AS roundtrip_ok, 1 AS size_ok
        |FROM documents""".stripMargin,
    "q_keyword_spot" ->
      // whole-token semantics: list_filter over the split tokens, never a
      // substring scan
      """SELECT doc_id, needle, CAST(n_hits AS BIGINT) AS n_hits FROM (
        |  SELECT doc_id, needle,
        |    len(list_filter(string_split(text, ' '), t -> t = needle)) AS n_hits
        |  FROM documents,
        |    (SELECT unnest(['join', 'vector', 'spark', 'data']) AS needle))
        |WHERE n_hits > 0""".stripMargin,
    "q_pmi_collocations" ->
      // identical PMI expression tree; bigrams via 1-based comprehension
      """WITH tl AS (SELECT string_split(text, ' ') AS tl FROM documents),
        |uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cw
        |  FROM (SELECT unnest(tl) AS w FROM tl) GROUP BY 1),
        |bi0 AS (SELECT unnest([struct_pack(a := tl[i], b := tl[i + 1])
        |    FOR i IN range(1, len(tl))]) AS p FROM tl),
        |bi AS (SELECT p.a AS a, p.b AS b, CAST(COUNT(*) AS BIGINT) AS cab
        |  FROM bi0 GROUP BY 1, 2),
        |nu AS (SELECT CAST(SUM(cw) AS BIGINT) AS nu FROM uni),
        |nb AS (SELECT CAST(SUM(cab) AS BIGINT) AS nb FROM bi),
        |sc AS (SELECT a, b, cab,
        |    round(ln((CAST(cab AS DOUBLE) / nb) /
        |      ((CAST(ca.cw AS DOUBLE) / nu) * (CAST(cb.cw AS DOUBLE) / nu))), 6) AS pmi
        |  FROM bi JOIN uni ca ON ca.w = bi.a JOIN uni cb ON cb.w = bi.b, nu, nb
        |  WHERE cab >= 5)
        |SELECT a, b, cab, pmi, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, a, b) AS rn FROM sc)
        |WHERE rn <= 20""".stripMargin,
    "q_chunk_docs" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tl FROM documents),
        |i AS (SELECT doc_id, tl, unnest(range(0, len(tl), 50)) AS i FROM toks)
        |SELECT doc_id, CAST(i // 50 AS BIGINT) AS chunk_idx,
        |  array_to_string(tl[i+1:i+50], ' ') AS chunk_text,
        |  CAST(least(50, len(tl) - i) AS BIGINT) AS n_tokens
        |FROM i""".stripMargin,
    "q_quality_score" ->
      s"""WITH $qualityCte
         |SELECT doc_id, lang, n_tokens, avg_token_len, stopword_ratio, symbol_ratio, verdict
         |FROM quality""".stripMargin,
    "q_curation_pipeline" ->
      s"""WITH $qualityCte,
         |$shingleCte,
         |ex AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
         |st AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df FROM ex GROUP BY 1),
         |bp AS (SELECT e.doc_id,
         |    CAST(count(*) AS BIGINT) AS n_shingles,
         |    CAST(sum(CASE WHEN st.df >= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_common
         |  FROM ex e JOIN st ON st.shingle = e.shingle GROUP BY 1),
         |gated AS (SELECT d.doc_id, d.source, d.text FROM documents d
         |  JOIN quality q ON q.doc_id = d.doc_id AND q.verdict = 'ok'
         |  LEFT JOIN bp ON bp.doc_id = d.doc_id
         |  WHERE bp.doc_id IS NULL OR 5 * bp.n_common <= 3 * bp.n_shingles),
         |w AS (SELECT source, CAST(ascii(substr(source, -1)) % 3 + 1 AS BIGINT) AS wt
         |  FROM (SELECT DISTINCT source FROM gated)),
         |tot AS (SELECT CAST(sum(wt) AS BIGINT) AS denom FROM w),
         |bb AS (SELECT source, CAST(8000 * wt // denom AS BIGINT) AS budget FROM w, tot),
         |dd AS (SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
         |  FROM gated),
         |cc AS (SELECT doc_id, source, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS cum_before
         |  FROM dd)
         |SELECT cc.source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(cc.n_tokens) AS BIGINT) AS n_tokens
         |FROM cc JOIN bb ON bb.source = cc.source
         |WHERE cc.cum_before < bb.budget
         |GROUP BY cc.source""".stripMargin,
    "q_bigram_logprob" ->
      // bigram (w1,w2) = adjacent 1-based list slots; corpus counts as
      // windows over the per-doc counts — same shape as the Spark plan
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS tl FROM documents),
        |b AS (SELECT doc_id, tl[i] AS w1, tl[i+1] AS w2
        |  FROM (SELECT doc_id, tl, unnest(range(1, len(tl))) AS i FROM toks)),
        |c AS (SELECT doc_id, w1, w2, COUNT(*) AS c FROM b GROUP BY doc_id, w1, w2),
        |f AS (SELECT doc_id, c,
        |    SUM(c) OVER (PARTITION BY w1, w2) AS c12,
        |    SUM(c) OVER (PARTITION BY w1) AS c1
        |  FROM c)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
        |  round(-SUM(c * log2(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))) / SUM(c), 6)
        |    AS avg_neg_logprob
        |FROM f GROUP BY doc_id""".stripMargin,
    "q_zipf" ->
      // 2^20 fixed-point least squares (integer-exact sums, HUGEINT in
      // DuckDB ≡ decimal(38) in Spark); only the final division floats
      """WITH f AS (SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        |    SELECT lang, unnest(string_split(text,' ')) AS token FROM documents)
        |  GROUP BY lang, token),
        |r AS (SELECT lang, freq,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY freq DESC, token ASC) AS rank
        |  FROM f),
        |q AS (SELECT lang,
        |    CAST(round(log2(CAST(rank AS DOUBLE)) * 1048576) AS BIGINT) AS x,
        |    CAST(round(log2(CAST(freq AS DOUBLE)) * 1048576) AS BIGINT) AS y
        |  FROM r),
        |s AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_terms,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy, SUM(x*x) AS sxx
        |  FROM q GROUP BY lang)
        |SELECT lang, n_terms,
        |  round(CAST(n_terms*sxy - sx*sy AS DOUBLE)
        |    / NULLIF(CAST(n_terms*sxx - sx*sx AS DOUBLE), 0), 6) AS zipf_slope
        |FROM s""".stripMargin,
    "q_cdc_chunk" ->
      // window hash = md5-prefix-60 of the 4-token window ending at pos
      // (1-based slice tl[pos-2:pos+1]); boundary lagged 1 then running-sum
      // -> chunk index, exactly the Spark plan's window chain
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS tl FROM documents),
        |p AS (SELECT doc_id, tl, unnest(range(0, len(tl))) AS pos FROM toks),
        |b AS (SELECT doc_id, pos, tl[pos+1] AS token,
        |    CASE WHEN pos >= 3 AND pos < len(tl) - 1 AND
        |      CAST('0x' || substr(md5(array_to_string(tl[pos-2:pos+1], ' ')), 1, 15) AS BIGINT)
        |        % 16 = 0
        |    THEN 1 ELSE 0 END AS boundary
        |  FROM p),
        |l AS (SELECT doc_id, pos, token,
        |    COALESCE(LAG(boundary) OVER (PARTITION BY doc_id ORDER BY pos), 0) AS lb
        |  FROM b),
        |c AS (SELECT doc_id, pos, token,
        |    SUM(lb) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS chunk_idx
        |  FROM l)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(MIN(pos) AS BIGINT) AS start_tok, CAST(MAX(pos) + 1 AS BIGINT) AS end_tok,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  string_agg(token, ' ' ORDER BY pos) AS chunk_text,
        |  md5(string_agg(token, ' ' ORDER BY pos)) AS chunk_md5
        |FROM c GROUP BY doc_id, chunk_idx""".stripMargin,
    "q_linear_classifier" ->
      // portable 60-bit md5 token hash -> 1024 feature buckets -> exact
      // int64 Knuth-multiplicative per-bucket weight in [-1, 1)
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |w AS (SELECT doc_id,
        |    (CAST('0x' || substr(md5(token), 1, 15) AS BIGINT) % 1024)
        |      * 2654435761 % 1000003 / 1000003.0 * 2.0 - 1.0 AS w
        |  FROM t)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  round(AVG(w), 6) AS score,
        |  CASE WHEN round(AVG(w), 6) >= 0 THEN 'keep' ELSE 'drop' END AS label
        |FROM w GROUP BY doc_id""".stripMargin,
    "q_nb_classifier" ->
      // independent replay of the closed-form fit: Laplace-smoothed class
      // log-likelihood ratios from (doc,token) counts + log prior odds;
      // prediction thresholds on the ROUNDED log-odds (tie-stable)
      """WITH base AS (
        |  SELECT doc_id, CAST(lang = 'en' AS INT) AS y, text FROM documents),
        |tok AS (SELECT doc_id, y, unnest(string_split(text, ' ')) AS token FROM base),
        |c AS (SELECT doc_id, y, token, CAST(COUNT(*) AS BIGINT) AS c
        |      FROM tok GROUP BY doc_id, y, token),
        |f AS (SELECT *,
        |    CAST(SUM(CASE WHEN y = 1 THEN c ELSE 0 END) OVER (PARTITION BY token) AS DOUBLE) AS f1,
        |    CAST(SUM(CASE WHEN y = 0 THEN c ELSE 0 END) OVER (PARTITION BY token) AS DOUBLE) AS f0
        |  FROM c),
        |s AS (SELECT
        |    CAST(SUM(CASE WHEN y = 1 THEN c ELSE 0 END) AS DOUBLE) AS t1,
        |    CAST(SUM(CASE WHEN y = 0 THEN c ELSE 0 END) AS DOUBLE) AS t0,
        |    CAST(COUNT(DISTINCT token) AS DOUBLE) AS v FROM c),
        |p AS (SELECT CAST(SUM(y) AS DOUBLE) AS n1, CAST(COUNT(*) AS DOUBLE) AS n FROM base),
        |sc AS (SELECT doc_id, MAX(y) AS label, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    round(SUM(CAST(c AS DOUBLE) *
        |        (ln((f1 + 1) / (t1 + v)) - ln((f0 + 1) / (t0 + v)))) +
        |      MAX(ln(n1 / (n - n1))), 6) AS log_odds
        |  FROM f CROSS JOIN s CROSS JOIN p GROUP BY doc_id)
        |SELECT doc_id, label, n_tokens, log_odds,
        |  CAST(log_odds > 0 AS INT) AS pred,
        |  CAST((log_odds > 0) = (label = 1) AS INT) AS correct
        |FROM sc""".stripMargin,
    "q_classifier_eval" ->
      s"""$langPredCte,
        |cells AS (SELECT pred_lang AS p, labeled_lang AS a,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM pred GROUP BY 1, 2),
        |cls AS (SELECT DISTINCT p AS clazz FROM cells
        |  UNION SELECT DISTINCT a FROM cells),
        |st AS (SELECT clazz,
        |  CAST(COALESCE((SELECT SUM(n) FROM cells WHERE p = clazz AND a = clazz), 0) AS BIGINT) AS tp,
        |  CAST(COALESCE((SELECT SUM(n) FROM cells WHERE p = clazz AND a <> clazz), 0) AS BIGINT) AS fp,
        |  CAST(COALESCE((SELECT SUM(n) FROM cells WHERE a = clazz AND p <> clazz), 0) AS BIGINT) AS fn
        |  FROM cls)
        |SELECT clazz, tp, fp, fn,
        |  CASE WHEN tp + fp = 0 THEN 0.0
        |       ELSE round(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS "precision",
        |  CASE WHEN tp + fn = 0 THEN 0.0
        |       ELSE round(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS recall,
        |  CASE WHEN 2*tp + fp + fn = 0 THEN 0.0
        |       ELSE round(CAST(2*tp AS DOUBLE) / (2*tp + fp + fn), 6) END AS f1
        |FROM st""".stripMargin,
    "q_cohens_kappa" ->
      s"""$langPredCte,
        |cells AS (SELECT pred_lang AS p, labeled_lang AS a,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM pred GROUP BY 1, 2),
        |m AS (SELECT CAST(SUM(n) AS BIGINT) AS n_items,
        |    CAST(COALESCE(SUM(CASE WHEN p = a THEN n END), 0) AS BIGINT) AS n_agree
        |  FROM cells),
        |rc AS (SELECT CAST(SUM(np * na) AS BIGINT) AS sum_rc FROM
        |  (SELECT p AS c, CAST(SUM(n) AS BIGINT) AS np FROM cells GROUP BY 1) x
        |  JOIN (SELECT a AS c, CAST(SUM(n) AS BIGINT) AS na FROM cells GROUP BY 1) y
        |  USING (c))
        |SELECT n_items, n_agree, sum_rc,
        |  CAST(n_items * n_agree - sum_rc AS BIGINT) AS num,
        |  CAST(n_items * n_items - sum_rc AS BIGINT) AS den,
        |  round(CAST(n_items * n_agree - sum_rc AS DOUBLE)
        |    / (n_items * n_items - sum_rc), 6) AS kappa
        |FROM m, rc""".stripMargin,
    "q_log_templates" ->
      """WITH lines AS (SELECT event_id,
        |    strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ') || ' elb u' ||
        |    CAST(user_id AS VARCHAR) || ':' || CAST(event_id AS VARCHAR) ||
        |    ' 10.0.0.1:80 0.0 0.0 0.0 200 200 0 699 GET http://x/y HTTP/1.1' AS line
        |  FROM events),
        |tl AS (SELECT event_id, string_split(line, ' ') AS tl FROM lines),
        |toks0 AS (SELECT event_id, unnest([struct_pack(pos := i, tok := tl[i])
        |    FOR i IN range(1, len(tl) + 1)]) AS p FROM tl),
        |toks AS (SELECT event_id, p.pos AS pos, p.tok AS tok FROM toks0),
        |freq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY tok),
        |t2 AS (SELECT event_id, pos,
        |    CASE WHEN tf >= 1000 THEN tok ELSE '<*>' END AS t2
        |  FROM toks JOIN freq USING (tok)),
        |tmpl AS (SELECT event_id, string_agg(t2, ' ' ORDER BY pos) AS template
        |  FROM t2 GROUP BY event_id)
        |SELECT template, CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM tmpl GROUP BY template""".stripMargin,
    "q_countmin" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |cells AS (SELECT r, h % 1024 AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM (SELECT r, CAST('0x' || substr(md5(
        |      'cm' || CAST(r AS VARCHAR) || ':' || token), 1, 15) AS BIGINT) AS h
        |    FROM toks, (SELECT unnest(range(0, 4)) AS r))
        |  GROUP BY 1, 2),
        |probes AS (SELECT unnest(['the','spark','data','window','zzz_absent']) AS token),
        |pb AS (SELECT token, r, CAST('0x' || substr(md5(
        |      'cm' || CAST(r AS VARCHAR) || ':' || token), 1, 15) AS BIGINT) % 1024 AS bucket
        |  FROM probes, (SELECT unnest(range(0, 4)) AS r)),
        |est AS (SELECT token, CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS cm_est
        |  FROM pb LEFT JOIN cells USING (r, bucket) GROUP BY token),
        |ex AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_freq
        |  FROM toks GROUP BY token)
        |SELECT token, CAST(COALESCE(exact_freq, 0) AS BIGINT) AS exact_freq,
        |  cm_est, cm_est >= COALESCE(exact_freq, 0) AS is_over
        |FROM est LEFT JOIN ex USING (token)""".stripMargin,
    "q_good_turing" ->
      """WITH tf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS r FROM (
        |    SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |  GROUP BY token),
        |nr AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM tf GROUP BY r)
        |SELECT a.r, a.n_r,
        |  round((a.r + 1) * CAST(COALESCE(b.n_r, 0) AS DOUBLE) / a.n_r, 6) AS r_star
        |FROM nr a LEFT JOIN nr b ON b.r = a.r + 1""".stripMargin,
    "q_readability" ->
      """WITH st AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT) AS n_syllables,
        |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS np
        |  FROM documents),
        |s2 AS (SELECT doc_id, n_words, n_syllables,
        |    CASE WHEN np > 0 THEN np ELSE (n_words + 14) // 15 END AS n_sentences
        |  FROM st)
        |SELECT doc_id, n_words, CAST(n_sentences AS BIGINT) AS n_sentences,
        |  n_syllables,
        |  round(0.39 * CAST(n_words AS DOUBLE) / n_sentences
        |    + 11.8 * CAST(n_syllables AS DOUBLE) / n_words - 15.59, 6) AS fk_grade
        |FROM s2""".stripMargin,
    "q_bpe_pairs" ->
      """WITH vocab AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS wf FROM
        |    (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w
        |  HAVING length(w) >= 2 AND NOT regexp_matches(w, '[_''\\]')),
        |pairs AS (SELECT pair, CAST(SUM(wf) AS BIGINT) AS freq FROM
        |    (SELECT wf, unnest([substring(w, i, 2)
        |        FOR i IN range(1, CAST(length(w) AS INT))]) AS pair FROM vocab)
        |  GROUP BY pair)
        |SELECT pair, freq,
        |  CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, pair) AS BIGINT) AS rn
        |FROM pairs ORDER BY freq DESC, pair LIMIT 20""".stripMargin,
    "q_bpe_train" -> bpeTrainOracle,
    "q_bpe_train_batched" -> bpeTrainBatchedOracle,
    "q_bpe_apply" -> bpeApplyOracle,
    "q_bpe_heldout" -> bpeHeldOutOracle,
    "q_bpe_fertility" ->
      s"""WITH $bpeCtes,
         |sym AS (SELECT w,
         |    CAST(len(string_split(trim(seg, '_'), '__')) AS BIGINT)
         |      AS nt,
         |    CAST(length(w) AS BIGINT) AS nc FROM g5),
         |ps AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS cnt FROM
         |    (SELECT source, unnest(string_split(text, ' ')) AS w
         |      FROM documents)
         |  WHERE length(w) >= 2 GROUP BY 1, 2)
         |SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_words,
         |  CAST(SUM(cnt * nt) AS BIGINT) AS n_tokens,
         |  CAST(SUM(cnt * nc) AS BIGINT) AS n_chars,
         |  round(CAST(SUM(cnt * nt) AS DOUBLE) /
         |    CAST(SUM(cnt) AS DOUBLE), 6) AS tokens_per_word,
         |  round(CAST(SUM(cnt * nc) AS DOUBLE) /
         |    CAST(SUM(cnt * nt) AS DOUBLE), 6) AS chars_per_token
         |FROM ps JOIN sym USING (w) GROUP BY 1""".stripMargin,
    "q_minimizer_sketch" ->
      """WITH tl AS (SELECT doc_id, string_split(text, ' ') AS tl FROM documents),
        |sh0 AS (SELECT doc_id, unnest([struct_pack(pos := i,
        |      h := CAST('0x' || substr(md5(array_to_string(tl[i:i+2], '_')), 1, 15) AS BIGINT))
        |    FOR i IN range(1, len(tl) - 1)]) AS p FROM tl),
        |sh AS (SELECT doc_id, p.pos AS pos, p.h AS h FROM sh0)
        |SELECT DISTINCT doc_id, MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
        |  ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS minimizer
        |FROM sh""".stripMargin,
    "q_neg_sampling_table" ->
      s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token
         |  FROM documents),
         |cc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM toks GROUP BY 1),
         |w AS (SELECT token, cnt,
         |    ${graft.operators.TextAnalysis.ns075Sql} AS w_micro FROM cc),
         |c AS (SELECT token, cnt, w_micro,
         |    CAST(SUM(w_micro) OVER (ORDER BY token) AS BIGINT) AS cum
         |  FROM w),
         |tot AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS w_total FROM w)
         |SELECT token, cnt, w_micro, cum - w_micro AS range_start,
         |  cum AS range_end, w_total
         |FROM c, tot""".stripMargin,
    "q_hill_tail" ->
      s"""WITH tk AS (SELECT lang AS g,
         |    unnest(string_split(text, ' ')) AS tok FROM documents),
         |cnt AS (SELECT g, tok, CAST(COUNT(*) AS BIGINT) AS c FROM tk
         |  WHERE tok <> '' GROUP BY 1, 2),
         |tail AS (SELECT g, ${graft.operators.TextAnalysis.hillLnNanoSql(2L)}
         |    AS ln_nano FROM cnt WHERE c >= 2),
         |a AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS m_tail,
         |    CAST(SUM(ln_nano) AS BIGINT) AS sln_nano
         |  FROM tail GROUP BY 1)
         |SELECT g AS lang, m_tail, sln_nano,
         |  ${graft.operators.TextAnalysis.hillAlphaSql} AS alpha
         |FROM a""".stripMargin,
    "q_yules_k" ->
      s"""WITH tk AS (SELECT source AS g,
         |    unnest(string_split(text, ' ')) AS tok FROM documents),
         |cnt AS (SELECT g, tok, CAST(COUNT(*) AS BIGINT) AS c FROM tk
         |  WHERE tok <> '' GROUP BY 1, 2),
         |a AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS vocab,
         |    CAST(SUM(c) AS BIGINT) AS n_tokens,
         |    CAST(SUM(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0))
         |      AS s2
         |  FROM cnt GROUP BY 1)
         |SELECT g AS source, n_tokens, vocab, CAST(s2 AS VARCHAR) AS s2,
         |  ${graft.operators.TextAnalysis.yulesKSql} AS yules_k
         |FROM a""".stripMargin,
    "q_dsir_weights" ->
      s"""WITH ex AS (SELECT doc_id, lang = 'en' AS tgt,
         |    unnest(string_split(text,' ')) AS token FROM documents),
         |uc AS (SELECT doc_id, tgt, token, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM ex GROUP BY 1, 2, 3),
         |uf AS (SELECT doc_id, c,
         |    CAST(SUM(c) OVER (PARTITION BY token) AS BIGINT) AS fs,
         |    CAST(SUM(CASE WHEN tgt THEN c ELSE 0 END)
         |      OVER (PARTITION BY token) AS BIGINT) AS ft
         |  FROM uc),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS ns,
         |    CAST(SUM(CASE WHEN tgt THEN c ELSE 0 END) AS BIGINT) AS nt,
         |    CAST(COUNT(DISTINCT token) AS BIGINT) AS v FROM uc),
         |t AS (SELECT doc_id, c,
         |    ${graft.operators.TextAnalysis.dsirRatioMicroSql} AS rm
         |  FROM uf CROSS JOIN tot),
         |g AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |    CAST(SUM(c * rm) AS BIGINT) AS s_micro
         |  FROM t GROUP BY 1)
         |SELECT doc_id, n_tokens, s_micro,
         |  ${graft.operators.TextAnalysis.dsirAvgSql} AS avg_log_ratio
         |FROM g""".stripMargin,
    "q_chi2_features" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' '))
         |    AS tok FROM documents),
         |h0 AS (SELECT doc_id,
         |    CAST('0x'||substr(md5(tok),1,15) AS BIGINT) % 64 AS dim,
         |    CASE WHEN CAST('0x'||substr(md5('sgn:'||tok),1,15)
         |      AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS s
         |  FROM t),
         |h AS (SELECT doc_id, dim FROM h0
         |  GROUP BY 1, 2 HAVING SUM(s) <> 0),
         |lb0 AS (SELECT doc_id, lang = 'en' AS is_en FROM documents),
         |it AS (SELECT h.doc_id, h.dim, lb0.is_en
         |  FROM h JOIN lb0 USING (doc_id)),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_pos
         |  FROM (SELECT DISTINCT doc_id, is_en FROM it)),
         |gg AS (SELECT dim,
         |    CAST(SUM(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS a,
         |    CAST(SUM(CASE WHEN is_en THEN 0 ELSE 1 END) AS BIGINT) AS b
         |  FROM it GROUP BY 1),
         |cc AS (SELECT dim, a, b, CAST(n_pos - a AS BIGINT) AS c,
         |    CAST(n_docs - n_pos - b AS BIGINT) AS d FROM gg, tot)
         |SELECT dim, a, b, c, d,
         |  ${graft.operators.Eval.chi2x2Sql} AS chi2,
         |  coalesce(${graft.operators.Eval.chi2x2Sql} > 3.841459, false)
         |    AS significant
         |FROM cc""".stripMargin,
    "q_feature_hash" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' '))
         |    AS tok FROM documents),
         |h AS (SELECT doc_id,
         |    CAST('0x'||substr(md5(tok),1,15) AS BIGINT) % 64 AS dim,
         |    CASE WHEN CAST('0x'||substr(md5('sgn:'||tok),1,15)
         |      AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS s
         |  FROM t)
         |SELECT doc_id, dim, CAST(SUM(s) AS BIGINT) AS value
         |FROM h GROUP BY 1, 2 HAVING SUM(s) <> 0""".stripMargin,
    "q_vocab_stats" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' '))
         |    AS token FROM documents),
         |per AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS tf,
         |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
         |  FROM t GROUP BY 1),
         |c AS (SELECT *,
         |    CAST(row_number() OVER (ORDER BY tf DESC, token) AS BIGINT)
         |      AS rank,
         |    CAST(SUM(tf) OVER (ORDER BY tf DESC, token) AS BIGINT)
         |      AS cum_tf,
         |    CAST(SUM(tf) OVER () AS BIGINT) AS tot
         |  FROM per)
         |SELECT token, tf, df, rank,
         |  round(CAST(cum_tf AS DOUBLE) / tot, 6) AS cum_share,
         |  df < 2 AS is_rare,
         |  cum_tf * 1000000 <= 500000 * tot AS is_head
         |FROM c""".stripMargin,
    "q_ngram_novelty" ->
      s"""WITH $shingleCte,
         |ex AS (SELECT doc_id, unnest(sh.sh) AS g FROM sh),
         |fs AS (SELECT g, CAST(MIN(doc_id) AS BIGINT) AS first_id
         |  FROM ex GROUP BY 1)
         |SELECT ex.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         |  CAST(SUM(CASE WHEN fs.first_id = ex.doc_id THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_novel,
         |  round(CAST(SUM(CASE WHEN fs.first_id = ex.doc_id THEN 1
         |    ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS novelty
         |FROM ex JOIN fs USING (g)
         |GROUP BY 1""".stripMargin,
    "q_burrows_delta" ->
      s"""WITH tkf AS (SELECT src, w FROM (SELECT source AS src,
         |    unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE length(w) > 0),
         |counts AS (SELECT src, w, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM tkf GROUP BY 1, 2),
         |ct AS (SELECT src, w, c,
         |    CAST(SUM(c) OVER (PARTITION BY src) AS BIGINT) AS tot
         |  FROM counts),
         |nsrc AS (SELECT CAST(COUNT(DISTINCT src) AS BIGINT) AS ns
         |  FROM counts),
         |gw AS (SELECT w, CAST(SUM(c) AS BIGINT) AS cg
         |  FROM counts GROUP BY 1),
         |topw AS (SELECT w FROM (SELECT w,
         |    row_number() OVER (ORDER BY cg DESC, w) AS rk FROM gw)
         |  WHERE rk <= 30),
         |srcs AS (SELECT DISTINCT src, tot FROM ct),
         |grid AS (SELECT srcs.src, topw.w,
         |    CAST(ROUND(CAST(COALESCE(ct.c, 0) AS DOUBLE) / srcs.tot
         |      * 1000000, 0) AS BIGINT) AS fm
         |  FROM srcs CROSS JOIN topw
         |  LEFT JOIN ct ON ct.src = srcs.src AND ct.w = topw.w),
         |zt AS (SELECT src, w, fm,
         |    CAST(SUM(fm) OVER (PARTITION BY w) AS BIGINT) AS sf,
         |    CAST(SUM(fm * fm) OVER (PARTITION BY w) AS BIGINT) AS sff
         |  FROM grid),
         |z AS (SELECT src, w,
         |    ${graft.operators.TextAnalysis.burrowsZSql} AS z
         |  FROM zt, nsrc),
         |zz AS (SELECT src, w, z FROM z WHERE z IS NOT NULL),
         |p AS (SELECT a.src AS src_a, b.src AS src_b,
         |    CAST(ROUND(abs(a.z - b.z) * 1000000, 0) AS BIGINT) AS dm
         |  FROM zz a JOIN zz b ON b.w = a.w AND a.src < b.src)
         |SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  round(CAST(SUM(dm) AS DOUBLE) / COUNT(*) / 1000000, 6) AS delta
         |FROM p GROUP BY 1, 2""".stripMargin,
    "q_extractive_chunks" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tl
        |  FROM documents),
        |tk AS (SELECT doc_id, unnest(range(0, len(tl))) AS pos, tl
        |  FROM toks),
        |tko AS (SELECT doc_id, pos, tl[pos + 1] AS w FROM tk
        |  WHERE length(tl[pos + 1]) > 0),
        |wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cw
        |  FROM tko GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cw) AS BIGINT) AS tw FROM wc),
        |ch AS (SELECT doc_id, CAST(pos // 10 AS BIGINT) AS chunk_idx,
        |    CAST(SUM(CAST(ROUND(ln(CAST(cw AS DOUBLE) / tw) * 1000000, 0)
        |      AS BIGINT)) AS BIGINT) AS slp,
        |    CAST(COUNT(*) AS BIGINT) AS nw
        |  FROM tko JOIN wc USING (w) CROSS JOIN tot GROUP BY 1, 2),
        |cs0 AS (SELECT doc_id, chunk_idx,
        |    round(CAST(slp AS DOUBLE) / nw / 1000000, 6) AS avg_lp
        |  FROM ch),
        |cs AS (SELECT doc_id, chunk_idx, avg_lp,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY avg_lp DESC, chunk_idx) AS rt,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY avg_lp, chunk_idx) AS rv,
        |    CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_chunks
        |  FROM cs0)
        |SELECT t.doc_id, t.n_chunks,
        |  t.chunk_idx AS typical_idx, t.avg_lp AS typical_score,
        |  v.chunk_idx AS novel_idx, v.avg_lp AS novel_score
        |FROM cs t JOIN cs v ON v.doc_id = t.doc_id
        |WHERE t.rt = 1 AND v.rv = 1""".stripMargin,
  )
}
