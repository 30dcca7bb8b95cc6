package graft

import graft.functions.expressions.{JaroWinklerKernel, JaroWinklerSim}
import graft.operators.Cooccur
import org.apache.spark.unsafe.types.UTF8String

/** Market-basket co-occurrence + the native jaro_winkler Expression. */
class CooccurJaroSpec extends SparkFunSuite {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerKernel.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaroWinkler kernel: published reference values and edge cases") {
    // classic textbook pairs (also DuckDB's jaro_winkler_similarity values)
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("duane", "dwayne") - 0.84) < 1e-12)
    assert(math.abs(jw("aaapppp", "ap") - 0.7857142857142857) < 1e-12)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("", "") === 1.0)
    assert(jw("", "abc") === 0.0)
    assert(jw("ab", "ba") === 0.0) // window 0: no cross-position matches
    // boost threshold: jaro 0.5333 with common prefix stays UNboosted
    assert(math.abs(jw("aX", "aYZWVUTSRQ") - 0.5333333333333333) < 1e-12)
    // prefix cap at 4: identical 6-char prefix boosts as 4
    val jaro = { val m = 9.0; (m / 10 + m / 10 + (m - 0) / m) / 3.0 }
    assert(math.abs(jw("abcdefghij", "abcdefghiX") - (jaro + 4 * 0.1 * (1 - jaro))) < 1e-12)
  }

  test("jaroWinkler kernel is symmetric and in [0,1] on random strings") {
    import org.scalacheck.{Gen, rng}
    val gen = Gen.listOfN(200, Gen.zip(
      Gen.stringOfN(Gen.choose(0, 12).sample.getOrElse(5), Gen.alphaChar),
      Gen.stringOfN(Gen.choose(0, 12).sample.getOrElse(5), Gen.alphaChar)))
    val pairs = gen(Gen.Parameters.default, rng.Seed(42L)).get
    pairs.foreach { case (a, b) =>
      val ab = jw(a, b); val ba = jw(b, a)
      assert(math.abs(ab - ba) < 1e-12, s"asymmetric: '$a' '$b'")
      assert(ab >= 0.0 && ab <= 1.0, s"out of range: '$a' '$b' -> $ab")
    }
  }

  test("jaroWinkler expression: null-safe, codegen path equals kernel") {
    import graft.functions.expressions.JaroWinklerSim.jaroWinkler
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Option("martha"), Option("marhta")),
      (Option.empty[String], Option("x")),
      (Option("x"), Option.empty[String]))
      .toDF("a", "b")
      .select(jaroWinkler(col("a"), col("b")).as("sim"))
    val got = df.as[Option[Double]].collect().toSeq
    assert(got.count(_.isEmpty) == 2)
    assert(math.abs(got.flatten.head - 0.9611111111111111) < 1e-12)
  }

  test("marketBasket property: equals brute-force pair counting and lift") {
    import org.scalacheck.{Gen, rng}
    (1 to 6).foreach { sample =>
      val gen = for {
        n <- Gen.choose(5, 80)
        rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 12L), Gen.choose(1L, 8L)))
      } yield rows
      val raw = gen(Gen.Parameters.default, rng.Seed(sample.toLong + 900L)).get
      val bi = raw.distinct
      val nBaskets = bi.map(_._1).distinct.size.toLong
      val freq = bi.groupBy(_._2).map { case (i, xs) => i -> xs.size.toLong }
      val expected = bi.groupBy(_._1).values.flatMap { items =>
        val is = items.map(_._2).sorted
        for { a <- is; b <- is if a < b } yield (a, b)
      }.groupBy(identity).collect { case ((a, b), xs) if xs.size >= 2 =>
        val nab = xs.size.toLong
        (a, b, nab, freq(a), freq(b),
          BigDecimal(nab.toDouble * nBaskets / (freq(a) * freq(b)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSet
      val got = Cooccur.marketBasket(
          raw.toDF("o", "p").repartition(5), "o", "p", minCount = 2L)
        .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
      assert(got === expected, s"sample $sample")
    }
  }

  test("marketBasket plans ONE exchange for the self-join (ReusedExchange)") {
    val df = (1L to 200L).flatMap(o => Seq((o, o % 7), (o, o % 5 + 10)))
      .toDF("o", "p")
    val out = Cooccur.marketBasket(df, "o", "p")
    out.collect() // finalize the adaptive plan
    val s = out.queryExecution.executedPlan.toString
    assert(s.contains("ReusedExchange"), s"expected ReusedExchange in:\n$s")
  }
}
