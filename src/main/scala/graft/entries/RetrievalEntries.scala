package graft

import graft.operators.{Dedup, Eval, Multimodal, Normalize, Profiling, Retrieval, RuntimeFilter, Sampling, Sessionize, Similarity, Survival, TextAnalysis, Urls}
import graft.sources.ElbLogParser
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps
import graft.SparkEntry._

/** Retrieval-family driver registrations — one slice of [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] (the round-14 monolith split: same entries,
  * same names, merged with a duplicate-key guard in SparkEntry). */
private[graft] object RetrievalEntries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hard_negatives" -> ((s, dir) =>
      // BM25 hard-negative mining for retriever training data: three
      // labeled (query, positive) pairs, top-5 highest-scoring
      // NON-positive docs each — one corpus tokenization, multi-query
      // scoring, per-query ranking window.
      graft.operators.Retrieval.hardNegativesBm25(
        table(s, dir, "documents"),
        queries = Seq(
          (1L, Seq("join", "vector", "spark"), 0L),
          (2L, Seq("window", "stream", "merge"), 1L),
          (3L, Seq("filter", "scan", "column"), 2L)),
        k = 5)),
  )

  val oracleSql: Map[String, String] = Map(
    "q_hard_negatives" ->
      // Multi-query BM25 (same formula text as q_bm25), positives
      // excluded, per-query rank window — mirrors
      // Retrieval.hardNegativesBm25 on the same 3 labeled pairs
      """WITH qt(query_id, term) AS (VALUES
        |    (1, 'join'), (1, 'vector'), (1, 'spark'),
        |    (2, 'window'), (2, 'stream'), (2, 'merge'),
        |    (3, 'filter'), (3, 'scan'), (3, 'column')),
        |pos(query_id, pos_doc_id) AS (VALUES (1, 0), (2, 1), (3, 2)),
        |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |perdoc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
        |  FROM tok GROUP BY 1),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
        |  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2),
        |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
        |  FROM tf GROUP BY 1),
        |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
        |    AVG(CAST(dl AS DOUBLE)) AS avgdl FROM perdoc),
        |scored AS (
        |  SELECT qt.query_id, tf.doc_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_matched,
        |    round(SUM(
        |      ln((n_docs - df + 0.5) / (df + 0.5) + 1) *
        |      (CAST(tf AS DOUBLE) * 2.2) /
        |      (CAST(tf AS DOUBLE) + 1.2 * (1 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))), 6)
        |      AS score
        |  FROM tf JOIN qt USING (term) JOIN perdoc USING (doc_id)
        |    JOIN dfreq USING (term) CROSS JOIN stats
        |  GROUP BY 1, 2),
        |ranked AS (SELECT s.query_id, s.doc_id, n_matched, score,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY s.query_id
        |      ORDER BY score DESC, s.doc_id) AS BIGINT) AS neg_rank
        |  FROM scored s JOIN pos p
        |    ON p.query_id = s.query_id AND s.doc_id <> p.pos_doc_id)
        |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, n_matched,
        |  score, neg_rank
        |FROM ranked WHERE neg_rank <= 5""".stripMargin,
  )
}
