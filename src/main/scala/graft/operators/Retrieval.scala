package graft.operators

import graft.Materialize.MaterializeOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-retrieval composition: fuse independently-produced rank lists
  * (lexical BM25, embedding cosine, any other ranker) into one ranking.
  * Reciprocal-rank fusion needs only the RANKS — no score calibration
  * across heterogeneous scorers — which is why it is the standard hybrid
  * baseline; it is also exactly replayable by a SQL oracle (1/(k0+rank)
  * is the same double everywhere, and a ≤2-element double sum is
  * order-independent because IEEE addition is commutative).
  */
object Retrieval {

  /** Fuse rank lists: each input is (df, idCol, rankCol) with rank 1-based.
    * rrf = Σ_lists 1/(k0 + rank); ids missing from a list simply
    * contribute nothing (the standard RRF convention). Output: id,
    * n_lists, rrf (round 6), rank (by rrf desc, id) limited to `topK`.
    *
    * Plan shape: the inputs are already tiny (top-k lists), so this is a
    * union + one hash agg + one ranking window over ≤ Σk rows — the
    * expensive part of hybrid retrieval stays in the upstream rankers. */
  def rrfFuse(
      lists: Seq[(DataFrame, String, String)],
      k0: Int = 60,
      topK: Int = 20): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val contribs = lists.map { case (df, idCol, rankCol) =>
      df.select(col(idCol).cast("long").as("id"),
        (lit(1.0) / (lit(k0.toDouble) + col(rankCol).cast("double"))).as("__c"))
    }.reduce(_ unionByName _)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rrf").desc, col("id"))
    contribs
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("long").as("n_lists"),
        round(sum(col("__c")), 6).as("rrf"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** BM25 hard-negative mining — the training-data op behind every
    * dense-retriever / reranker dataset (DPR, sentence-transformers):
    * for each (query, known-positive) pair, the top-k HIGHEST-scoring
    * non-positive documents are the "hard" negatives a contrastive
    * loss actually learns from (random negatives are trivially
    * separable). Queries and positives arrive as a driver-side list —
    * the realistic shape: labeled pairs are tiny next to the corpus.
    *
    * Same Lucene-form BM25 as [[graft.operators.TextAnalysis.bm25TopK]]
    * but MULTI-QUERY in one pass: the corpus is tokenized once, tf is
    * kept only for the union of all query terms (broadcast semi-join —
    * query-width, never vocabulary-width), df/avgdl come off the same
    * pass, and per-query ranking is one window partitioned by query.
    * Per-query candidate sets are docs matching ≥1 term; a stop-word
    * query term makes its query's candidate set corpus-sized — keep
    * query terms contentful (the caller owns term selection, exactly
    * as in search).
    *
    * Output: (query_id, doc_id, n_matched, score, neg_rank ≤ k) with
    * positives EXCLUDED; scores round-6, ties break on doc_id. */
  def hardNegativesBm25(
      docs: DataFrame,
      queries: Seq[(Long, Seq[String], Long)],
      k: Int = 5,
      k1: Double = 1.2,
      b: Double = 0.75,
      textCol: String = "text"): DataFrame = {
    require(queries.nonEmpty, "queries must be non-empty")
    queries.foreach { case (qid, terms, _) =>
      require(terms.nonEmpty && terms.distinct.size == terms.size,
        s"query $qid terms must be non-empty and distinct") }
    require(queries.map(_._1).distinct.size == queries.size,
      "query ids must be distinct")
    // the corpus agg pivots one conditional-count column per DISTINCT
    // term — keep it query-width by contract, not accident: past a few
    // hundred columns the single wide agg row stops being the cheap
    // plan and the mining should batch by query group instead
    require(queries.flatMap(_._2).distinct.size <= 256,
      "more than 256 distinct query terms — batch the mining into " +
        "query groups (the tf pivot is one column per distinct term)")
    val spark = docs.sparkSession
    import spark.implicits._
    val qTerms = broadcast(
      queries.flatMap { case (qid, ts, _) => ts.map(qid -> _) }
        .toDF("query_id", "term"))
    val pos = broadcast(
      queries.map { case (qid, _, p) => (qid, p) }
        .toDF("query_id", "pos_doc_id"))
    // ONE corpus tokenization pass: document length and every query
    // term's tf come out of the same doc-keyed hash-agg as conditional
    // counts (the bm25TopK fusion — the pivot is the UNION of all
    // query terms, still query-width, never vocabulary-width), then a
    // narrow unpivot back to (doc, term, tf) rows
    val allTerms = queries.flatMap(_._2).distinct
    val tfCols = allTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"__tf_$i")
    }
    val perDoc = docs
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col(textCol)))
          .as("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("dl"), tfCols: _*)
      .materialize
    val tf = perDoc
      .select(col("doc_id"), col("dl"),
        explode(map(allTerms.zipWithIndex.flatMap { case (t, i) =>
          Seq(lit(t), col(s"__tf_$i"))
        }: _*)).as(Seq("term", "tf")))
      .filter(col("tf") > 0)
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("long").as("df"))
    val stats = perDoc.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"))
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val tfNorm = col("tf").cast("double") * (k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    val scored = tf // already carries dl from the fused agg
      .join(qTerms, Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_matched"),
        round(sum(idf * tfNorm), 6).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scored
      .join(pos, Seq("query_id"))
      .filter(col("doc_id") =!= col("pos_doc_id"))
      .withColumn("neg_rank", row_number().over(w).cast("long"))
      .filter(col("neg_rank") <= k)
      .select(col("query_id"), col("doc_id"), col("n_matched"),
        col("score"), col("neg_rank"))
  }
}
