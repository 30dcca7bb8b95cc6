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

  test("no query output schema exposes DecimalType") {
    // r9 driver lesson: a DECIMAL column in an OUTPUT schema renders as
    // decimal.Decimal("123") under the driver's pyarrow read but as
    // float64 "123.0" under a DuckDB .df() oracle — 11 queries failed
    // hash_match on exactly this. DECIMAL stays legal (and necessary)
    // for internal exact sums; it must be cast to DOUBLE/BIGINT before
    // the final projection. No whitelist: there is no deliberate
    // decimal-exposing query.
    import org.apache.spark.sql.types.{DecimalType, StructType, ArrayType, DataType, MapType}
    def hasDecimal(dt: DataType): Boolean = dt match {
      case _: DecimalType => true
      case s: StructType => s.fields.exists(f => hasDecimal(f.dataType))
      case a: ArrayType => hasDecimal(a.elementType)
      case m: MapType => hasDecimal(m.keyType) || hasDecimal(m.valueType)
      case _ => false
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val bad = q(spark, sf0001).schema.fields
          .filter(f => hasDecimal(f.dataType)).map(_.name)
        if (bad.isEmpty) None else Some(s"$name(${bad.mkString(",")})")
    }
    assert(offenders.isEmpty,
      s"DECIMAL-exposed query outputs: ${offenders.mkString("; ")}")
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
