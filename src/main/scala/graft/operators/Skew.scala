package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * AQE's skew-join handles most cases at runtime (splits oversized
  * partitions), but only for sort-merge joins after stats exist. Salting is
  * the plan-level tool when a known hot key would overwhelm one task: the
  * fact side gets a random-but-deterministic salt in [0, saltFactor), the
  * dim side is replicated saltFactor times, and the join key becomes
  * (key, salt) — fan-out is explicit and bounded.
  *
  * Salt derivation uses a hash of a tie-break column, NOT rand(): results
  * stay deterministic under retries/replans (a rand() salt changes the
  * partition a row lands in between task attempts — correctness hazard for
  * speculative execution, and it breaks the hash-compare oracle). */
object Skew {

  /** Equi-join `facts ⋈ dims` on `key`, salted `saltFactor` ways.
    * `tieBreak` must be a deterministic per-row column (e.g. an id). */
  def saltedJoin(
      facts: DataFrame,
      dims: DataFrame,
      key: String,
      tieBreak: String,
      saltFactor: Int): DataFrame = {
    val salted = facts.withColumn("__salt", pmod(xxhash64(col(tieBreak)), lit(saltFactor.toLong)))
    val replicated = dims
      .withColumn("__salt", explode(sequence(lit(0L), lit(saltFactor.toLong - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
