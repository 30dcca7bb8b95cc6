package graft

import graft.operators.{Similarity, TextAnalysis, Urls}
import org.apache.spark.sql.functions._

/** Round-6 continuation: SemDeDup embedding pruning, hashed-feature linear
  * classifier, URL canonicalization, CSV/ORC source round-trips. */
class SemDedupUrlsSpec extends SparkFunSuite {
  import spark.implicits._

  private def md5hexRef(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hash60Ref(s: String): Long =
    java.lang.Long.parseLong(md5hexRef(s).substring(0, 15), 16)

  // ---- Similarity.semDedup

  /** Unit vectors at controlled angles: cluster structure is explicit. */
  private def vecsOf(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("semDedup: drops every vector with a lower-id near-duplicate, keeps the rest") {
    // nCentroids=2 -> cells seeded by vecs 0,1 (orthogonal). 2 is nearly
    // parallel to 0 (same cell, dropped); 3 nearly parallel to 1 (same
    // cell, dropped).
    val df = vecsOf(
      0L -> Seq(1f, 0f, 0f),
      1L -> Seq(0f, 0f, 1f),
      2L -> Seq(0.999f, 0.04f, 0f),
      3L -> Seq(0f, 0.04f, 0.999f))
    val kept = Similarity.semDedup(df, threshold = 0.9, nCentroids = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(0L, 1L))
  }

  test("semDedup: invariant — kept set has no lower-id in-cell neighbor over threshold") {
    val rng = new scala.util.Random(17)
    val df = vecsOf((0L until 60L).map { id =>
      id -> Seq.fill(8)(rng.nextFloat() * 2 - 1)
    }: _*)
    val t = 0.8
    val kept = Similarity.semDedup(df, threshold = t, nCentroids = 4)
    // no kept pair within a cell is over-threshold
    val a = kept.select(col("cell"), col("vec_id").as("ka"))
      .join(df.select(col("vec_id").as("ka"), col("embedding").as("ea")), "ka")
    val b = kept.select(col("cell"), col("vec_id").as("kb"))
      .join(df.select(col("vec_id").as("kb"), col("embedding").as("eb")), "kb")
    val bad = a.join(b, "cell")
      .filter(col("ka") < col("kb"))
      .filter(Similarity.cosine(col("ea"), col("eb")) >= t)
      .count()
    assert(bad == 0L)
    // every input vector is either kept or has SOME lower-id in-cell
    // neighbor over threshold (the deterministic drop rule)
    assert(kept.count() > 0)
  }

  test("semDedup equals an in-memory reference on 15 random corpora") {
    // full independent replay: seed centroids = lowest-id vectors, assign
    // by rounded cosine (tie-break cell asc), drop on lower-id in-cell
    // neighbor with rounded cosine >= t
    def cosRef(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      BigDecimal(dot / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val rng = new scala.util.Random(31)
    (1 to 15).foreach { trial =>
      val n = 8 + rng.nextInt(25)
      val nc = 2 + rng.nextInt(4)
      val t = 0.3 + rng.nextDouble() * 0.5
      val vecs = (0L until n.toLong).map { id =>
        id -> Seq.fill(6)(rng.nextFloat() * 2 - 1)
      }
      val byId = vecs.toMap
      val cents = vecs.take(nc)
      def cellOf(v: Seq[Float]): Long =
        cents.map { case (cid, cv) => (cid, cosRef(v, cv)) }
          .sortBy { case (cid, d) => (-d, cid) }.head._1
      val cells = vecs.map { case (id, v) => id -> cellOf(v) }.toMap
      val expKept = vecs.collect {
        case (id, v) if !vecs.exists { case (o, ov) =>
          o < id && cells(o) == cells(id) && cosRef(ov, v) >= t
        } => id
      }.toSet
      val got = Similarity.semDedup(vecsOf(vecs: _*), t, nc)
        .select("vec_id").as[Long].collect().toSet
      assert(got == expKept, s"trial $trial (n=$n nc=$nc t=$t)")
    }
  }

  test("semDedup: threshold above all similarities is the identity") {
    val rng = new scala.util.Random(19)
    val df = vecsOf((0L until 30L).map { id =>
      id -> Seq.fill(8)(rng.nextFloat() * 2 - 1)
    }: _*)
    assert(Similarity.semDedup(df, threshold = 1.1, nCentroids = 4).count() == 30L)
  }

  // ---- TextAnalysis.hashedLinearScore

  test("hashedLinearScore matches an in-memory reference") {
    def weightRef(token: String, nBuckets: Long): Double = {
      val bucket = hash60Ref(token) % nBuckets
      (bucket * 2654435761L % 1000003L).toDouble / 1000003.0 * 2.0 - 1.0
    }
    val docs = Seq(
      (0L, "the quick brown fox"),
      (1L, "the the the"),
      (2L, "lone"),
      (3L, "a b c d e f g")).toDF("doc_id", "text")
    val got = TextAnalysis.hashedLinearScore(docs, nBuckets = 1024)
      .select("doc_id", "n_tokens", "score", "label")
      .as[(Long, Long, Double, String)].collect().sortBy(_._1)
    val exp = Seq(
      (0L, "the quick brown fox"),
      (1L, "the the the"),
      (2L, "lone"),
      (3L, "a b c d e f g")).map { case (id, text) =>
      val toks = text.split(" ", -1).toSeq
      val score = BigDecimal(toks.map(weightRef(_, 1024L)).sum / toks.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, toks.size.toLong, score, if (score >= 0) "keep" else "drop")
    }
    assert(got.toSeq == exp)
  }

  test("hashedLinearScore equals the reference on 10 random corpora") {
    def weightRef(token: String, nBuckets: Long): Double = {
      val bucket = hash60Ref(token) % nBuckets
      (bucket * 2654435761L % 1000003L).toDouble / 1000003.0 * 2.0 - 1.0
    }
    val rng = new scala.util.Random(37)
    val vocab = Vector("a", "bb", "ccc", "", "dd dd".split(" ")(0), "xyz", "42w", "Zq")
    (1 to 10).foreach { trial =>
      val nb = Seq(64, 256, 1024)(rng.nextInt(3))
      val docs = (0L until (3 + rng.nextInt(10)).toLong).map { id =>
        id -> Seq.fill(1 + rng.nextInt(30))(vocab(rng.nextInt(vocab.length))).mkString(" ")
      }
      val exp = docs.map { case (id, text) =>
        val toks = text.split(" ", -1).toSeq
        val score = BigDecimal(toks.map(weightRef(_, nb.toLong)).sum / toks.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, toks.size.toLong, score, if (score >= 0) "keep" else "drop")
      }.toSet
      val got = TextAnalysis.hashedLinearScore(docs.toDF("doc_id", "text"), nBuckets = nb)
        .as[(Long, Long, Double, String)].collect().toSet
      assert(got == exp, s"trial $trial (nBuckets=$nb)")
    }
  }

  test("hashedLinearScore: score is partition-invariant") {
    val docs = (0L until 40L).map(i => (i, s"tok$i alpha beta tok${i % 7}"))
      .toDF("doc_id", "text")
    val one = TextAnalysis.hashedLinearScore(docs.coalesce(1))
      .as[(Long, Long, Double, String)].collect().toSet
    val many = TextAnalysis.hashedLinearScore(docs.repartition(13))
      .as[(Long, Long, Double, String)].collect().toSet
    assert(one == many)
  }

  // ---- Urls

  test("canonical: strips scheme case, www, port, trackers, fragment, trailing slash; sorts params") {
    val cases = Seq(
      "HTTP://WWW.Ex.COM:8080/a/b/?utm_source=x&b=2&a=1&gclid=g#frag" -> "ex.com/a/b?a=1&b=2",
      "https://ex.com/a" -> "ex.com/a",
      "https://www.ex.com/" -> "ex.com",
      "http://ex.com/p?utm_campaign=c" -> "ex.com/p",
      "http://ex.com/p?z=1&y=2" -> "ex.com/p?y=2&z=1",
      "http://EX.com:443/p" -> "ex.com/p")
    val got = cases.map(_._1).toDF("url")
      .select(Urls.canonical(col("url"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("dedupByUrl keeps the lowest id per canonical form") {
    val df = Seq(
      (0L, "http://www.ex.com/a?utm_source=x"),
      (1L, "https://EX.com/a"),
      (2L, "https://ex.com/b")).toDF("id", "url")
    val kept = Urls.dedupByUrl(df, "url", "id").select("id").as[Long].collect().toSet
    assert(kept == Set(0L, 2L))
  }

  test("canonical matches a java.net.URI reference on 200 generated URLs") {
    // independent reference implementation: java.net.URI parsing + the same
    // normalization rules, exercised over the URL-shape cross product
    // (scheme case × www × port × path depth/slash × params × fragment)
    def ref(url: String): String = {
      val u = java.net.URI.create(url)
      val host = u.getHost.toLowerCase.replaceFirst("^www\\.", "")
      val path = u.getPath.replaceFirst("/$", "")
      val kept = Option(u.getQuery).toSeq
        .flatMap(_.split("&").toSeq)
        .filterNot(p => p.matches("^(utm_[a-z]+|gclid|fbclid|ref)=.*"))
        .sorted
      host + path + (if (kept.isEmpty) "" else kept.mkString("?", "&", ""))
    }
    val rng = new scala.util.Random(23)
    val urls = (1 to 200).map { i =>
      val scheme = if (rng.nextBoolean()) "https" else "HTTP"
      val www = if (rng.nextBoolean()) "www." else ""
      val host = s"Site$i.Example.com"
      val port = rng.nextInt(3) match { case 0 => ""; case 1 => ":80"; case _ => ":8443" }
      val path = (0 until rng.nextInt(3)).map(d => s"p$d").mkString("/", "/", "") match {
        case "/" => if (rng.nextBoolean()) "/" else ""
        case p => if (rng.nextBoolean()) p + "/" else p
      }
      val params = Seq(s"z=$i", "utm_source=x", "a=1", "gclid=g", s"m=${i % 3}")
        .take(rng.nextInt(6))
      val query = if (params.isEmpty) "" else params.mkString("?", "&", "")
      val frag = if (rng.nextBoolean()) "#sec" else ""
      s"$scheme://$www$host$port$path$query$frag"
    }
    val got = urls.toDF("url").select(Urls.canonical(col("url"))).as[String].collect().toSeq
    val exp = urls.map(ref)
    got.zip(exp).zip(urls).foreach { case ((g, e), u) =>
      assert(g == e, s"mismatch on $u: spark=$g ref=$e")
    }
  }

  // ---- CSV / ORC round-trips (schema + value fidelity incl. quoting)

  test("csv round-trip preserves quoted strings and numerics") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv_spec_").toString
    val df = Seq(
      (1L, "plain", 3.5),
      (2L, "with, comma", -0.25),
      (3L, "with \"quotes\"", 0.0)).toDF("id", "s", "v")
    df.write.mode("overwrite").option("header", "true").csv(tmp)
    val back = spark.read.option("header", "true").schema(df.schema).csv(tmp)
    assert(back.as[(Long, String, Double)].collect().toSet ==
      df.as[(Long, String, Double)].collect().toSet)
  }

  test("orc round-trip preserves timestamps to the microsecond") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_orc_spec_").toString
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-03-01 12:34:56.123456")),
      (2L, java.sql.Timestamp.valueOf("1999-12-31 23:59:59.999999")))
      .toDF("id", "ts")
    df.write.mode("overwrite").orc(tmp)
    val back = spark.read.orc(tmp)
    assert(back.as[(Long, java.sql.Timestamp)].collect().toSet ==
      df.as[(Long, java.sql.Timestamp)].collect().toSet)
  }
}
