package graft

import graft.sources.ElbLogParser

/** Fixture lines from FIXTURES.md §A — covers the two divergences from the
  * reference parser (6-digit fractions crash it; quoted request fields break
  * its exactly-15-token rule). */
class ElbParserSpec extends SparkFunSuite {
  import spark.implicits._

  private val msLine =
    "2015-07-22T09:00:28.019Z marketpalce-shop 123.242.248.130:54635 10.0.6.158:80 0.000022 0.026109 0.00002 200 200 0 699 GET https://paytm.com:443/shop/authresponse HTTP/1.1"
  private val microLine =
    "2015-07-22T09:00:28.019143Z marketpalce-shop 123.242.248.130:54635 10.0.6.158:80 0.000022 0.026109 0.00002 200 200 0 699 GET https://paytm.com:443/shop/authresponse HTTP/1.1"
  private val quotedLine =
    "2015-07-22T09:00:28.019Z elb 1.2.3.4:555 10.0.0.1:80 0.0 0.0 0.0 200 200 0 699 \"GET https://x/y HTTP/1.1\" extra tokens here beyond fifteen total count"
  private val badTs = "not-a-timestamp elb 1.2.3.4:555"
  private val short = "too short"

  test("pure parser: 3-digit fraction parses; ip keeps client:port whole") {
    val p = ElbLogParser.parseLine(msLine).get
    assert(p.ip == "123.242.248.130:54635")
    assert(p.ts == 1437555628019L)
    assert(p.timestamp == "2015-07-22T09:00:28.019Z")
  }

  test("pure parser: 6-digit microsecond fraction parses (reference crashes here)") {
    val p = ElbLogParser.parseLine(microLine).get
    assert(p.ts == 1437555628019L) // millis floor of .019143
  }

  test("pure parser: quoted-request line with >15 tokens still parses (reference drops it)") {
    assert(ElbLogParser.parseLine(quotedLine).isDefined)
  }

  test("pure parser: garbage rows are dropped, not thrown") {
    assert(ElbLogParser.parseLine(badTs).isEmpty)
    assert(ElbLogParser.parseLine(short).isEmpty)
    assert(ElbLogParser.parseLine("").isEmpty)
  }

  test("columnar parser rejects exactly what the pure parser rejects at the fraction boundary") {
    // regression for the single-parse rewrite: digits glued to the seconds
    // field, bare trailing dot, and >9-digit fractions must all stay
    // rejected (the normalize step must not "repair" them), while 1-9
    // digit fractions and fractionless timestamps parse.
    val tail = " elb 1.2.3.4:555 10.0.0.1:80 0 0 0 200 200 0 1 GET http://x HTTP/1.1"
    val cases = Seq(
      "2024-01-01T00:00:0099Z",            // glued digits -> reject
      "2024-01-01T00:00:00.1234567890Z",   // 10-digit fraction -> reject
      "2024-01-01T00:00:00",               // no offset -> reject
      "2024-01-01T00:00:00Z",              // fractionless -> ok
      "2024-01-01T00:00:00.Z",             // bare dot: java.time zero-width fraction -> ok
      "2024-01-01T00:00:00.5Z",            // 1 digit -> ok
      "2024-01-01T00:00:00.123456789Z",    // 9 digits -> ok (floors to micros)
      "2024-01-01T00:00:00.123+09:00")     // offset form -> ok
    val lines0 = cases.map(_ + tail)
    val got = ElbLogParser.parse(lines0.toDF("value"))
      .select("timestamp").as[String].collect().toSet
    val want = lines0.flatMap(ElbLogParser.parseLine).map(_.timestamp).toSet
    assert(got === want)
    assert(want === cases.drop(3).toSet) // the five ok cases, by construction
  }

  test("columnar parser agrees with the pure parser on all fixtures") {
    val lines = Seq(msLine, microLine, quotedLine, badTs, short)
    val df = ElbLogParser.parse(lines.toDF("value"))
    val got = df.select("timestamp", "ip").as[(String, String)].collect().toSet
    val want = lines.flatMap(ElbLogParser.parseLine).map(p => (p.timestamp, p.ip)).toSet
    assert(got == want)
    // and timestamps agree to the millisecond
    val ms = df.selectExpr("unix_millis(ts)").as[Long].collect().toSet
    assert(ms == lines.flatMap(ElbLogParser.parseLine).map(_.ts).toSet)
  }

  test("typed parser (streaming shape) matches pure parser") {
    val ds = ElbLogParser.parseTyped(spark.createDataset(Seq(msLine, badTs)))
    assert(ds.collect().toSeq == Seq(ElbLogParser.parseLine(msLine).get))
  }
}
