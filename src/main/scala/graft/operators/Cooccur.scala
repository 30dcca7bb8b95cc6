package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Item co-occurrence / market-basket analytics over (basket, item)
  * tables — the association-rule layer downstream of the engine's
  * clickstream queries (which items/pages co-occur within one order or
  * session).
  */
object Cooccur {

  /** Pairwise co-occurrence with support and lift.
    *
    * For every unordered item pair {a, b} (emitted once as a < b):
    * `n_ab` = baskets containing both, `lift` = N·n_ab / (n_a·n_b) where
    * N is the total basket count — lift > 1 means the pair co-occurs more
    * than independence predicts. Pairs below `minCount` baskets are cut
    * (noise floor AND the output-size control).
    *
    * Scale shape: distinct (basket, item) → self-equi-join on basket with
    * `a.item < b.item`. Both join inputs are the SAME distinct subtree, so
    * the basket-hashed exchange is planned once and reused (ReusedExchange)
    * — one shuffle, not two. Per-basket work is C(k,2) on basket size k:
    * bounded for order/session baskets (TPC-H orders ≤ 7 lines); for
    * heavy-tailed baskets cap k upstream (sample or truncate) BEFORE this
    * operator — the quadratic term is per-basket, never corpus-global.
    * The item-frequency table is item-cardinality-sized; AQE broadcasts
    * it into the final joins.
    */
  def marketBasket(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minCount: Long = 2L): DataFrame = {
    // explicit not-null filter so EVERY branch over `bi` (pairs, freq,
    // total) carries identical pushed filters — otherwise the join
    // branches gain isnotnull predicates the aggregate branches lack and
    // the distinct subtrees stop canonicalizing equal (no ReusedExchange)
    val bi = df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("b"), col(itemCol).as("i")).distinct()
    // total basket count as a 1-row broadcast side, not a driver .first():
    // the whole operator stays one lazy plan, nothing materializes early
    val total = bi.select(countDistinct(col("b")).as("n_total"))
    val freq = bi.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
    val pairs = bi.as("l")
      .join(bi.as("r"), col("l.b") === col("r.b") && col("l.i") < col("r.i"))
      .groupBy(col("l.i").as("item_a"), col("r.i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    pairs
      .join(freq.withColumnRenamed("i", "item_a").withColumnRenamed("n_i", "n_a"), "item_a")
      .join(freq.withColumnRenamed("i", "item_b").withColumnRenamed("n_i", "n_b"), "item_b")
      .crossJoin(broadcast(total))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        round(col("n_ab") * col("n_total") / (col("n_a") * col("n_b")), 6).as("lift"))
  }
}
