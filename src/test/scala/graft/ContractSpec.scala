package graft

/** Driver-contract tripwires: the shape invariants the correctness gate
  * assumes, asserted here so a drift fails a unit test instead of the
  * driver's oracle run. */
class ContractSpec extends SparkFunSuite {

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("rows-only queries are exactly the declared no-oracle set") {
    // each entry here is rows-only BY DESIGN (approximate / sequential-state
    // / stub semantics not expressible in ANSI SQL) and is covered by a
    // ScalaTest spec instead; adding a query without an oracle fails this
    // test until it is either oracled or consciously added here
    val declared = Set(
      "q_approx_distinct",      // HLL sketch value
      "q_approx_percentile",    // KLL-ish sketch values
      "q_freq_items",           // heavy-hitters sketch
      "q_multimodal_decode",    // stub codec output
      "q_multimodal_wav",       // synth WAV bytes (sine math not SQL-expressible)
      "q_compress_ratio",       // DEFLATE bit-stream length (CompressionRatioSpec
                                // pins ordering + determinism)
      "q_hll_merge")            // DataSketches HLL binary merge
                                // (ProfilingSamplingSpec pins vs exact distinct)
    // round-6 departures: q_similarity_ivf + q_embedding_neardup_lsh
    // (trainIters = 0 seed centroids are deterministic — the oracle replays
    // cell assignment and probe ranking) and the three sessionize state-
    // machine tiers (replayed as a recursive CTE, one state advance per
    // recursion step). Only sketches and codec-stub output remain
    // inherently non-SQL-expressible.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == declared,
      s"undeclared rows-only: ${rowsOnly -- declared}; stale declarations: ${declared -- rowsOnly}")
  }

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1L)
  }

  test("observe() piggybacks pipeline metrics on the query, no second scan") {
    import org.apache.spark.sql.functions._
    // the production monitoring hook: row counts / checksums collected AS
    // the job runs — at 100 TB a separate count() would be a second scan
    val obs = org.apache.spark.sql.Observation("graft_stats")
    val df = SparkEntry.table(spark, sf0001, "orders")
      .observe(obs, count(lit(1)).as("rows"),
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
    val n = df.collect().length
    assert(obs.get("rows") == n.toLong)
    assert(obs.get("cents").asInstanceOf[Long] > 0L)
  }
}
