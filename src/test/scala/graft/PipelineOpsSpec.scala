package graft

import graft.operators.{Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-3 pipeline-operator additions: SRP cosine-LSH, int8 quantization,
  * token chunking, stratified sampling. */
class PipelineOpsSpec extends SparkFunSuite {
  import spark.implicits._

  private def embeddings = SparkEntry.table(spark, sf0001, "embeddings")
    .select(col("vec_id"), col("embedding"))
  private def documents = SparkEntry.table(spark, sf0001, "documents")

  test("srpSigns are ±1, deterministic, and roughly balanced") {
    val a = Similarity.srpSigns(32, 64)
    val b = Similarity.srpSigns(32, 64)
    assert(a.map(_.toSeq) == b.map(_.toSeq))
    assert(a.flatten.forall(s => s == 1f || s == -1f))
    val pos = a.flatten.count(_ == 1f)
    // md5 parity over 2048 draws: expect ~1024, allow a wide band
    assert(pos > 800 && pos < 1250, s"sign balance off: $pos of 2048 positive")
  }

  test("srpSignatures: deterministic, partition-invariant, identical vectors collide") {
    val base = Similarity.srpSignatures(embeddings).as[(Long, Long)].collect().toMap
    val reparted = Similarity.srpSignatures(embeddings.repartition(13))
      .as[(Long, Long)].collect().toMap
    assert(base == reparted)
    // duplicate a vector under a new id: signature must match its source
    val dup = embeddings.filter(col("vec_id") === 0L)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val withDup = Similarity.srpSignatures(embeddings.unionByName(dup))
      .as[(Long, Long)].collect().toMap
    assert(withDup(100000L) == withDup(0L))
  }

  test("srp signature hamming distance tracks cosine similarity") {
    // Charikar: P(bit agree) = 1 - angle/pi, so high-cosine pairs must have
    // closer signatures than random pairs on average.
    val sigs = Similarity.srpSignatures(embeddings).as[(Long, Long)].collect().toMap
    val sims = Similarity.nearDupCosine(embeddings, 0.4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    val simHam = sims.map { case (a, b) => java.lang.Long.bitCount(sigs(a) ^ sigs(b)) }
    val rng = new scala.util.Random(7)
    val ids = sigs.keys.toArray
    val randHam = Array.fill(500) {
      val a = ids(rng.nextInt(ids.length)); val b = ids(rng.nextInt(ids.length))
      java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    }
    assert(sims.nonEmpty)
    val simMean = simHam.sum.toDouble / simHam.length
    val randMean = randHam.sum.toDouble / randHam.length
    assert(simMean < randMean - 2,
      s"near-dup pairs mean hamming $simMean not clearly below random $randMean")
  }

  test("nearDupCosineSrp: no false positives (subset of exact) with useful recall") {
    val exact = Similarity.nearDupCosine(embeddings, 0.4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val srp = Similarity.nearDupCosineSrp(embeddings, 0.4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(srp.subsetOf(exact)) // exact-verify step admits no false positives
    assert(exact.isEmpty || srp.size.toDouble / exact.size >= 0.2,
      s"recall ${srp.size}/${exact.size}")
  }

  test("nearDupCosineSrp at shuffle-join scale runs the signature kernel ONCE (ReusedExchange)") {
    // locally the small band table broadcasts and the kernel evaluates per
    // side; above the broadcast threshold — the 100 TB regime — both join
    // sides shuffle on (band, key) and AQE must reuse one Exchange, or the
    // dominant kernel cost doubles
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = Similarity.nearDupCosineSrp(embeddings, 0.4)
      df.collect() // AQE finalizes exchange reuse only at execution
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange"), s"expected ReusedExchange in:\n$plan")
    }
  }

  test("quantizeInt8: codes in [-127,127], dequant error <= scale/2, zero vector safe") {
    val tiny = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0f, 0f, 0f)),
      (3L, Array(2f, 4f, -8f))).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(tiny)
      .as[(Long, Double, Seq[Int])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(q(2L)._1 == 0.0 && q(2L)._2 == Seq(0, 0, 0))
    assert(q(3L)._2 == Seq(32, 64, -127))
    val real = Similarity.quantizeInt8(embeddings)
    val checked = real
      .join(embeddings, "vec_id")
      .select(col("vec_id"),
        zip_with(col("embedding"), col("qvec"),
          (v, c) => abs(v.cast("double") - c * col("scale"))).as("err"),
        col("scale"))
      .select(max(array_max(col("err"))).as("worst"), max(col("scale")).as("smax"))
      .as[(Double, Double)].head()
    assert(real.select(array_min(col("qvec"))).as[Int].collect().forall(_ >= -127))
    assert(real.select(array_max(col("qvec"))).as[Int].collect().forall(_ <= 127))
    // scale is rounded to 6dp for the oracle: |q|·5e-7 ≤ 127·5e-7 ≈ 6.4e-5
    // of extra reconstruction slack on top of the quantization half-step
    assert(checked._1 <= checked._2 / 2 + 1e-4, s"dequant error $checked")
  }

  test("chunkDocuments: chunks reassemble to the original text, counts are exact") {
    val chunks = TextAnalysis.chunkDocuments(documents, chunkSize = 50)
    val rebuilt = chunks
      .groupBy(col("doc_id"))
      .agg(
        concat_ws(" ", array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text"))))
          .getField("chunk_text")).as("text2"),
        sum(col("n_tokens")).as("tok_sum"),
        count(lit(1)).as("n_chunks"))
      .join(documents.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), (col("text2") === col("text")).as("same"),
        col("tok_sum"), col("n_chunks"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .as[(Long, Boolean, Long, Long, Long)].collect()
    assert(rebuilt.nonEmpty)
    rebuilt.foreach { case (id, same, tokSum, nChunks, nToks) =>
      assert(same, s"doc $id reassembly")
      assert(tokSum == nToks, s"doc $id token conservation")
      assert(nChunks == (nToks + 49) / 50, s"doc $id chunk count")
    }
  }

  test("chunkDocuments: ragged tail and single-chunk docs") {
    val tiny = Seq((1L, "a b c d e"), (2L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(tiny, chunkSize = 2)
      .as[(Long, Long, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, 0L, "a b", 2L), (1L, 1L, "c d", 2L), (1L, 2L, "e", 1L),
      (2L, 0L, "x", 1L)))
  }

  test("snapshotDiff: insert/delete/update with presence markers and null-safe value compare") {
    import graft.operators.Cdc
    val oldDf = Seq(
      (1L, Option(10L)), (2L, Option.empty[Long]), (3L, Option(30L)),
      (4L, Option(40L)), (6L, Option(60L))).toDF("k", "v")
    val newDf = Seq(
      (2L, Option.empty[Long]), (3L, Option(31L)), (4L, Option(40L)),
      (5L, Option.empty[Long]), (6L, Option.empty[Long])).toDF("k", "v")
    val got = Cdc.snapshotDiff(oldDf, newDf, Seq("k"), Seq("v"))
      .select("k", "op").as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "delete",  // key gone
      3L -> "update",  // value changed
      5L -> "insert",  // new key whose value is NULL (markers, not value-null)
      6L -> "update")) // value became NULL: update, NOT delete
    // 2: null <=> null -> same; 4: unchanged -> same; neither emitted
  }

  test("scdType2: collapses unchanged runs, stamps validity intervals, null-safe attrs") {
    import graft.operators.Cdc
    val changes = Seq(
      // key 1: A,A,B,B,A -> versions A[0,2) B[2,4) A[4,open)
      (1L, 0L, Option("A"), 10L), (1L, 1L, Option("A"), 11L),
      (1L, 2L, Option("B"), 12L), (1L, 3L, Option("B"), 13L),
      (1L, 4L, Option("A"), 14L),
      // key 2: starts NULL (must survive as first version), then X
      (2L, 0L, Option.empty[String], 20L), (2L, 5L, Option("X"), 21L),
      // key 3: equal-ts changes ordered by tie
      (3L, 7L, Option("P"), 31L), (3L, 7L, Option("Q"), 32L))
      .toDF("k", "ts", "a", "tie")
    val got = Cdc.scdType2(changes, Seq("k"), "ts", Seq("a"), "tie")
      .as[(Long, Option[String], Long, Option[Long], Boolean)].collect().toSet
    assert(got === Set(
      (1L, Some("A"), 0L, Some(2L), false),
      (1L, Some("B"), 2L, Some(4L), false),
      (1L, Some("A"), 4L, None, true),
      (2L, None, 0L, Some(5L), false),
      (2L, Some("X"), 5L, None, true),
      (3L, Some("P"), 7L, Some(7L), false),
      (3L, Some("Q"), 7L, None, true)))
  }

  test("scdType2 property: version count equals run count; intervals chain per key") {
    import graft.operators.Cdc
    import org.scalacheck.{Gen, rng}
    (1 to 8).foreach { sample =>
      val gen = for {
        n <- Gen.choose(2, 60)
        rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 4L), Gen.oneOf("A", "B", "C")))
      } yield rows
      val raw = gen(Gen.Parameters.default, rng.Seed(sample.toLong + 7L)).get
        .zipWithIndex.map { case ((k, a), i) => (k, i.toLong, a, i.toLong) }
      val got = Cdc.scdType2(raw.toDF("k", "ts", "a", "tie"), Seq("k"), "ts", Seq("a"), "tie")
        .as[(Long, String, Long, Option[Long], Boolean)].collect()
      raw.groupBy(_._1).foreach { case (k, rs) =>
        val sorted = rs.sortBy(_._2)
        val runs = sorted.foldLeft(List.empty[(String, Long)]) { case (acc, (_, ts, a, _)) =>
          if (acc.headOption.exists(_._1 == a)) acc else (a, ts) :: acc
        }.reverse
        val vs = got.filter(_._1 == k).sortBy(_._3)
        assert(vs.map(v => (v._2, v._3)).toList === runs, s"sample $sample key $k versions")
        // intervals chain: each valid_to is the next valid_from; last open
        vs.sliding(2).foreach {
          case Array(a, b) => assert(a._4.contains(b._3), s"sample $sample key $k chain")
          case _ =>
        }
        assert(vs.last._4.isEmpty && vs.last._5, s"sample $sample key $k open version")
      }
    }
  }

  test("asOfSnapshot: covering version per key, pre-existence keys absent, open version covers") {
    import graft.operators.Cdc
    val changes = Seq(
      (1L, 0L, "A", 1L), (1L, 5L, "B", 2L),   // at t=3: A; at t=5: B
      (2L, 9L, "X", 3L))                      // born at 9: absent at t=3
      .toDF("k", "ts", "a", "tie")
    val scd = Cdc.scdType2(changes, Seq("k"), "ts", Seq("a"), "tie")
    val at3 = Cdc.asOfSnapshot(scd, 3L)
      .select("k", "a").as[(Long, String)].collect().toSet
    assert(at3 === Set((1L, "A")))
    val at9 = Cdc.asOfSnapshot(scd, 9L)
      .select("k", "a").as[(Long, String)].collect().toSet
    assert(at9 === Set((1L, "B"), (2L, "X"))) // open versions cover forever
  }

  test("benfordProfile: hand histogram, zero/null dropped, chi2 nonnegative") {
    import graft.operators.Profiling
    val df = Seq(
      ("g", Some(123L)), ("g", Some(19L)), ("g", Some(-25L)), // digits 1,1,2
      ("g", Some(0L)), ("g", Option.empty[Long]),             // dropped
      ("h", Some(900L)))                                      // digit 9
      .toDF("grp", "v")
    val got = Profiling.benfordProfile(df, "grp", "v")
      .as[(String, Int, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got === Map(
      ("g", 1) -> ((2L, 0.666667)), ("g", 2) -> ((1L, 0.333333)),
      ("h", 9) -> ((1L, 1.0))))
  }

  test("rfm: scores are 1..5, 5 is best on every axis, segment concatenates") {
    import graft.operators.Sessionize
    // 10 users with strictly increasing frequency/monetary/recency
    val ev = (1L to 10L).flatMap { u =>
      (0L until u).map(i => (u, (u * 86400000L) + i, u * 100.0))
    }.toDF("user_id", "ms", "value")
      .select(col("user_id"), expr("timestamp_millis(ms)").as("ts"), col("value"))
    val got = Sessionize.rfm(ev)
      .as[(Long, Long, Long, Long, Int, Int, Int, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == 10)
    got.values.foreach { r =>
      assert(r._5 >= 1 && r._5 <= 5 && r._6 >= 1 && r._6 <= 5 && r._7 >= 1 && r._7 <= 5)
      assert(r._8 === s"${r._5}${r._6}${r._7}")
    }
    // user 10: most events, highest spend, latest day -> best everywhere
    assert(got(10L)._5 == 5 && got(10L)._6 == 5 && got(10L)._7 == 5)
    // user 1: fewest, lowest, earliest -> worst everywhere
    assert(got(1L)._5 == 1 && got(1L)._6 == 1 && got(1L)._7 == 1)
    // ntile equal-count property: each score bucket has exactly 2 of 10 users
    Seq(got.values.map(_._6), got.values.map(_._7)).foreach { scores =>
      assert(scores.groupBy(identity).values.map(_.size).toSet === Set(2))
    }
  }

  test("largestRemainder: shares sum EXACTLY to total; remainder order breaks ties") {
    import graft.operators.Allocate
    // group 1: T=10 over weights 1,1,1 -> base 3,3,3, leftover 1 to the
    // largest remainder (all equal: tie -> lowest tie id)
    // group 2: T=7 over weights 3,1 -> base 5,1; rem 1,3 -> leftover 1 to line 2
    val df = Seq(
      (1L, 10L, 1L, 1L), (1L, 10L, 1L, 2L), (1L, 10L, 1L, 3L),
      (2L, 7L, 3L, 1L), (2L, 7L, 1L, 2L))
      .toDF("g", "t", "w", "line")
    val got = Allocate.largestRemainder(df, "g", "t", "w", "line")
      .select("g", "line", "alloc").as[(Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 1L, 4L), (1L, 2L, 3L), (1L, 3L, 3L),
      (2L, 1L, 5L), (2L, 2L, 2L)))
  }

  test("largestRemainder property: exact-sum invariant and proportionality bound") {
    import graft.operators.Allocate
    import org.scalacheck.{Gen, rng}
    (1 to 6).foreach { sample =>
      val gen = for {
        n <- Gen.choose(4, 60)
        rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 6L), Gen.choose(1L, 50L)))
      } yield rows
      val raw = gen(Gen.Parameters.default, rng.Seed(sample.toLong + 1100L)).get
        .zipWithIndex.map { case ((g, w), i) => (g, 1000L + 37L * g, w, i.toLong) }
      val got = Allocate.largestRemainder(
          raw.toDF("g", "t", "w", "line").repartition(5), "g", "t", "w", "line")
        .select("g", "t", "w", "alloc").as[(Long, Long, Long, Long)].collect()
      got.groupBy(_._1).foreach { case (g, rows) =>
        val t = rows.head._2
        assert(rows.map(_._4).sum === t, s"sample $sample group $g sum")
        val bigW = rows.map(_._3).sum
        rows.foreach { case (_, _, w, a) =>
          val exact = t.toDouble * w / bigW
          assert(a >= math.floor(exact) && a <= math.ceil(exact) + 1e-9,
            s"sample $sample group $g: alloc $a vs exact $exact")
        }
      }
    }
  }

  test("sessionEntryExit: entry/exit in stream order, bounce on single-event sessions") {
    import graft.operators.Sessionize
    val ev = Seq(
      // user 1, session 1: view(1) -> click(2) -> purchase(3); session 2: error alone
      (1L, 1L, "view", 0L), (2L, 1L, "click", 10L), (3L, 1L, "purchase", 20L),
      (4L, 1L, "error", 10_000_000L),
      // user 2: equal-ts entry tie broken by event_id (5 before 6)
      (5L, 2L, "signup", 0L), (6L, 2L, "view", 0L))
      .map { case (id, u, ty, ms) => (id, u, ty, new java.sql.Timestamp(ms)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val sess = Sessionize.gapSessionize(ev)
    val got = Sessionize.sessionEntryExit(sess)
      .select("user_id", "entry_type", "exit_type", "n_events", "duration", "bounce")
      .as[(Long, String, String, Long, Long, Int)].collect().toSet
    assert(got === Set(
      (1L, "view", "purchase", 3L, 0L, 0),
      (1L, "error", "error", 1L, 0L, 1),
      (2L, "signup", "view", 2L, 0L, 0)))
  }

  test("chunkDocuments property: count/order/conservation for random sizes") {
    import org.scalacheck.{Gen, rng}
    (1 to 8).foreach { sample =>
      val gen = for {
        n <- Gen.choose(1, 40)
        c <- Gen.choose(1, 12)
        nDocs <- Gen.choose(1, 6)
      } yield (n, c, nDocs)
      val (maxToks, chunkSize, nDocs) = gen(Gen.Parameters.default, rng.Seed(sample.toLong)).get
      val docs = (0 until nDocs).map { d =>
        val toks = (0 to (d * 7 + maxToks) % maxToks).map(i => s"w${d}_$i")
        (d.toLong, toks.mkString(" "))
      }
      val got = TextAnalysis.chunkDocuments(docs.toDF("doc_id", "text"), chunkSize)
        .as[(Long, Long, String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      docs.foreach { case (id, text) =>
        val toks = text.split(" ").toSeq
        val chunks = got(id)
        assert(chunks.length == (toks.size + chunkSize - 1) / chunkSize, s"sample $sample doc $id")
        assert(chunks.map(_._2).toSeq == chunks.indices.map(_.toLong), "dense chunk_idx")
        assert(chunks.flatMap(_._3.split(" ")).toSeq == toks, "token order preserved")
        assert(chunks.map(_._4).sum == toks.size, "token conservation")
      }
    }
  }

  test("snapshotDiff property: equals a brute-force map diff on random snapshots") {
    import graft.operators.Cdc
    import org.scalacheck.{Gen, rng}
    (1 to 8).foreach { sample =>
      val gen = for {
        o <- Gen.mapOf(Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 3L)))
        n <- Gen.mapOf(Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 3L)))
      } yield (o, n)
      val (oldM, newM) = gen(Gen.Parameters.default, rng.Seed(sample.toLong)).get
      val expected =
        (oldM.keySet ++ newM.keySet).flatMap { k =>
          (oldM.get(k), newM.get(k)) match {
            case (None, Some(_)) => Some(k -> "insert")
            case (Some(_), None) => Some(k -> "delete")
            case (Some(a), Some(b)) if a != b => Some(k -> "update")
            case _ => None
          }
        }.toMap
      val got = Cdc.snapshotDiff(
        oldM.toSeq.toDF("k", "v"), newM.toSeq.toDF("k", "v"), Seq("k"), Seq("v"))
        .select("k", "op").as[(Long, String)].collect().toMap
      assert(got == expected, s"sample $sample: old=$oldM new=$newM")
    }
  }

  test("stratifiedSample exactness: kept set equals the per-row md5 predicate, not a statistic") {
    val pcts = Map("en" -> 60, "fr" -> 30)
    val got = Sampling.stratifiedSample(documents, "doc_id", "lang", pcts, defaultPct = 10)
      .select("doc_id").as[Long].collect().toSet
    val expected = documents.select("doc_id", "lang").as[(Long, String)].collect().filter {
      case (id, lang) =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$lang:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
        val bucket = java.lang.Long.parseLong(md.substring(0, 15), 16) % 100
        bucket < pcts.getOrElse(lang, 10)
    }.map(_._1).toSet
    assert(got == expected)
  }

  test("stratifiedSample: deterministic, partition-invariant, respects per-stratum rates") {
    val pcts = Map("en" -> 60, "fr" -> 30, "es" -> 15)
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.stratifiedSample(df, "doc_id", "lang", pcts, defaultPct = 10)
        .select("doc_id").as[Long].collect().toSet
    val a = run(documents)
    val b = run(documents.repartition(11))
    assert(a == b)
    // observed rate per stratum within a loose band of the target
    val rates = Sampling.stratifiedSample(documents, "doc_id", "lang", pcts, 10)
      .groupBy("lang").count()
      .join(documents.groupBy("lang").agg(count(lit(1)).as("tot")), "lang")
      .select(col("lang"), (col("count") * 100.0 / col("tot")).as("pct"))
      .as[(String, Double)].collect().toMap
    rates.foreach { case (lang, pct) =>
      val target = pcts.getOrElse(lang, 10)
      assert(math.abs(pct - target) < 25, s"$lang sampled at $pct% vs target $target%")
    }
    // strata draw independent samples: en-kept ids and fr-kept ids come from
    // different hash streams, so the kept-id sets are not just a prefix rule
    val perLang = Sampling.stratifiedSample(documents, "doc_id", "lang", Map.empty, 50)
      .select("doc_id", "lang").as[(Long, String)].collect().groupBy(_._2)
    assert(perLang.size > 1)
  }
}
