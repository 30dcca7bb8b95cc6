package graft.operators

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
}
