package graft

/** Driver-contract tripwires: the shape invariants the correctness gate
  * assumes, asserted here so a drift fails a unit test instead of the
  * driver's oracle run. */
class ContractSpec extends SparkFunSuite {

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("every query has an oracle (no rows-only queries remain)") {
    // round-7 closure of the last honesty gap: the former rows-only set
    // (sketches, codec output) is now driver-checkable — estimates ship
    // next to their exact twin with a bounded-error assertion the oracle
    // pins to 1 (q_approx_distinct, q_approx_percentile, q_hll_merge),
    // the WAV tier synthesizes an integer sawtooth whose amplitude stats
    // replay in SQL (q_multimodal_wav), the stub codec hashes via md5 so
    // its feature replays in SQL (q_multimodal_decode), the deflate tier
    // emits round-trip/size assertions (q_compress_ratio), and the
    // heavy-hitters sketch is provably exact at this cardinality
    // (q_freq_items). Adding a query without an oracle fails here until
    // it is oracled — there is no declared exception list anymore.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"queries without oracle: $rowsOnly")
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
