package graft

import graft.operators.{Dedup, Eval, Multimodal, Normalize, Profiling, Retrieval, RuntimeFilter, Sampling, Sessionize, Similarity, Survival, TextAnalysis, Urls}
import graft.sources.ElbLogParser
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query here is DataFrame-native (no collect, no driver loops) and is
  * written to stay deterministic under any partitioning: stable tie-breaks,
  * integer or round(x, 6) numerics, no hash/time dependence (FIXTURES.md
  * "Oracle-determinism rules").
  */
object SparkEntry {

  /** Normalize an `events.ts` column to TimestampType whatever the driver
    * wrote it as across rounds: parquet `timestamp[ns]` arrives as
    * epoch-nanos Long under `nanosAsLong` (integer `div`, not `/` — epoch
    * nanos exceed 2^53, double math would round); parquet `timestamp[us]`
    * with isAdjustedToUTC=false arrives as TIMESTAMP_NTZ (Spark 4 inference)
    * and casts epoch-identically because every entry point pins
    * `spark.sql.session.timeZone=UTC` — the same naive-as-UTC reading the
    * DuckDB oracle uses. Works on batch and streaming frames (schema is
    * static either way). */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  /** Read one driver-generated parquet table (ts normalized: [[normalizeTs]]). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  /** Part co-purchase edges (src < dst per order) from a
    * (l_orderkey, l_partkey) projection — the edge derivation behind
    * every graph query on this dataset. Shape: ONE shuffle of the
    * projection (groupBy order) + map-side pair explode of the sorted
    * per-order part set; the previous lineitem self-join shuffled the
    * scan twice and joined for the same rows. Per-order fan-out is
    * bounded by the TPC-H contract of <= 7 lineitems/order
    * (C(7,2) = 21 pairs); collect_set dedups within-order repeats,
    * which is output-invariant because every graph operator dedups its
    * edge input (canonicalUndirected / distinct). */
  private[graft] def coPurchasePairs(li: DataFrame): DataFrame =
    li.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("__ps"))
      .select(col("__ps"), posexplode(col("__ps")).as(Seq("__i", "src")))
      .select(col("src").cast("long").as("src"),
        explode(expr("slice(__ps, __i + 2, size(__ps))")).as("__d"))
      .select(col("src"), col("__d").cast("long").as("dst"))

  /** REPEAT-co-purchase edges (>= 2 shared orders) — the sparse,
    * semantically-loaded sibling of [[coPurchasePairs]] shared by the
    * community/matching/diameter queries: one (pair)-keyed aggregate
    * over the pair explode, count distinct orders, filter. */
  private[graft] def repeatCoPurchase(
      s: SparkSession, dir: String): DataFrame = {
    val li = table(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").cast("long").as("src"),
        col("b.l_partkey").cast("long").as("dst"))
      .agg(count_distinct(col("a.l_orderkey")).as("__n"))
      .filter(col("__n") >= 2L)
      .select(col("src"), col("dst"))
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_sessionize_gap")(spark, "/root/testdata/sf0.001")

  /** 13-token license disclaimer spliced onto every 3rd doc — and TWICE
    * onto every 6th — the deterministic cross-doc-repeat fixture shared by
    * the q_repeated_spans* queries. SQL twin: [[disclaimerCte]]. */
  private[graft] val RepeatedDisclaimer =
    "this article is licensed under the creative commons attribution share alike license terms"

  private[graft] def spliceDisclaimer(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat_ws(" ",
        col("text"),
        when(col("doc_id") % 3 === 0, lit(RepeatedDisclaimer)),
        when(col("doc_id") % 6 === 0, lit(RepeatedDisclaimer))).as("text"))

  /** The events table as a file-source stream (ts normalized to
    * TimestampType), for the Structured-Streaming queries. */
  private[graft] def eventsStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = s.read.parquet(s"$dir/events.parquet").schema
    normalizeTs(s.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir))
  }

  /** Scope the streaming-runner confs around `body`, restoring (or
    * unsetting) the prior values afterwards — ONE definition shared by all
    * three drains so the settings can't diverge or leak into the session:
    *
    *  - `shuffle.partitions = 8`: stateful streaming allocates one state
    *    store per shuffle partition per stateful operator (a stream-stream
    *    join holds four) and checkpoints each per microbatch — at local
    *    bench scale that fixed I/O dominates, so partitions are sized to
    *    state volume, not CPU count (the right knob at any scale);
    *  - RocksDB state store (reference parity: the Flink job assumes a
    *    RocksDB backend, reference README.md:92-100) — off-heap,
    *    incremental-checkpoint-capable, the production provider;
    *  - changelog checkpointing: per-batch checkpoint = the delta log, not
    *    a full RocksDB snapshot — the production setting for frequent small
    *    microbatches (snapshots still happen asynchronously every
    *    minDeltasForSnapshot batches). */
  private[graft] def withStreamingConfs[A](s: SparkSession)(body: => A): A =
    Confs.withConfs(s)(
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")(body)

  /** Scratch root for streaming checkpoints / file-sink drains. Honors
    * `-Dgraft.stream.tmp=<dir>` so a RUNNER may point the per-query
    * RocksDB checkpoint + sink scratch at fast storage (Bench uses tmpfs
    * — the measured fsync floor is ~0.6 s/streaming query on /tmp disk);
    * default stays `java.io.tmpdir`, which the correctness path (Verify)
    * keeps — real-disk checkpoint durability remains exercised there. */
  private[graft] def streamTempRoot(prefix: String): java.nio.file.Path =
    sys.props.get("graft.stream.tmp")
      .map(java.nio.file.Paths.get(_))
      .filter(p => java.nio.file.Files.isDirectory(p)) match {
      case Some(base) => java.nio.file.Files.createTempDirectory(base, prefix)
      case None => java.nio.file.Files.createTempDirectory(prefix)
    }

  /** Drive a streaming DataFrame to completion into a memory sink; return
    * the drained result table. Conf scoping: [[withStreamingConfs]]. */
  private[graft] def runToMemory(s: SparkSession, df: DataFrame, mode: String): DataFrame = {
    val name = s"graft_ms_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    withStreamingConfs(s) {
      val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
      try q.processAllAvailable()
      finally q.stop()
    }
    // the memory sink holds the rows on the driver anyway; detach them from
    // the UUID-named sink table and drop it, or every invocation leaks its
    // full result for the session lifetime
    val sink = s.table(name)
    val result = s.createDataFrame(
      java.util.Arrays.asList(sink.collect(): _*), sink.schema)
    s.sql(s"DROP TABLE IF EXISTS $name")
    result
  }

  /** Drive an APPEND-mode streaming DataFrame to completion into a parquet
    * file sink and read the files back — the scale-correct drain: results
    * go executor→disk, never through the driver (`runToMemory`'s memory
    * sink + collect stays only for COMPLETE-mode aggregations, which the
    * file sink cannot express). Same partition/state-store scoping as
    * runToMemory. */
  private[graft] def runToFiles(s: SparkSession, df: DataFrame): DataFrame = {
    val root = streamTempRoot("graft_fs_")
    val data = root.resolve("data").toString
    val ckpt = root.resolve("_checkpoint").toString
    withStreamingConfs(s) {
      val q = df.writeStream.format("parquet")
        .option("path", data)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    // explicit schema: an all-filtered-out stream leaves no files to infer
    // from. localCheckpoint materializes the result into managed executor
    // storage so the temp tree (parquet + RocksDB checkpoint SSTs) can be
    // deleted NOW instead of leaking per invocation.
    val result = s.read.schema(df.schema).parquet(data).materialize
    deleteRecursively(root.toFile)
    result
  }

  /** Drive an UPDATE-mode aggregation through the [[graft.streaming.MergeSink]]
    * foreachBatch merge into a versioned parquet serving table; return the
    * final version. Same partition/state-store scoping as runToFiles; the
    * results go executor→disk (the merge is a distributed anti-join+union,
    * never a driver collect). */
  private[graft] def runMergeSink(s: SparkSession, df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val root = streamTempRoot("graft_merge_")
    val target = root.resolve("table").toString
    val ckpt = root.resolve("_checkpoint").toString
    withStreamingConfs(s) {
      val merge: (DataFrame, Long) => Unit =
        graft.streaming.MergeSink.mergeBatch(target, keyCols)
      val q = df.writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(merge)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    val latest = graft.streaming.MergeSink.latestVersion(target)
      .getOrElse(sys.error(s"MergeSink published no version under $target"))
    val result = s.read.parquet(latest).materialize
    deleteRecursively(root.toFile)
    result
  }

  private[graft] def deleteRecursively(f: java.io.File): Unit =
    graft.streaming.MergeSink.deleteRecursively(f)

  /** One entry per implemented operator from SURVEY.md §2. */
  /** One entry per implemented operator from SURVEY.md §2 — merged from
    * the per-family registration objects under `graft/entries/` (the
    * round-14 monolith split). The size check makes a duplicate key a
    * LOUD failure: a repeated name across (or within) families would
    * silently shadow an implementation, which is exactly how the
    * pre-split q_ks_test duplicate stayed invisible for rounds. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val families = Seq(
    DedupEntries.queries,
    EvalEntries.queries,
    GraphEntries.queries,
    MultimodalEntries.queries,
    NormalizeEntries.queries,
    ProfilingEntries.queries,
    RelationalEntries.queries,
    RetrievalEntries.queries,
    SamplingEntries.queries,
    SessionizeEntries.queries,
    SimilarityEntries.queries,
    StreamingEntries.queries,
    SurvivalEntries.queries,
    TextEntries.queries,
    TimeSeriesEntries.queries)
    val merged = families.reduce(_ ++ _)
    require(merged.size == families.map(_.size).sum,
      "duplicate query name across entry families")
    merged
  }

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] = {
    val families = Seq(
    DedupEntries.oracleSql,
    EvalEntries.oracleSql,
    GraphEntries.oracleSql,
    MultimodalEntries.oracleSql,
    NormalizeEntries.oracleSql,
    ProfilingEntries.oracleSql,
    RelationalEntries.oracleSql,
    RetrievalEntries.oracleSql,
    SamplingEntries.oracleSql,
    SessionizeEntries.oracleSql,
    SimilarityEntries.oracleSql,
    StreamingEntries.oracleSql,
    SurvivalEntries.oracleSql,
    TextEntries.oracleSql,
    TimeSeriesEntries.oracleSql)
    val merged = families.reduce(_ ++ _)
    require(merged.size == families.map(_.size).sum,
      "duplicate oracle name across entry families")
    merged
  }


  /** The q_ols2 moment CTE + a VALUES lambda grid + the shared ridge
    * Cramer text (Eval.ridge2Solve). */
  private[graft] lazy val ridgePathOracle: String = {
    val solve = graft.operators.Eval.ridge2Solve
      .map { case (name, sql) => s"$sql AS $name" }.mkString(",\n  ")
    val grid = Seq(0L, 1000000L, 10000000L, 100000000L, 1000000000L)
      .map(l => s"(CAST($l AS BIGINT))").mkString(", ")
    s"""WITH li AS (SELECT CAST(ROUND(l_extendedprice, 0) AS BIGINT) AS y,
       |    CAST(l_quantity AS BIGINT) AS x1,
       |    CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS x2 FROM lineitem),
       |sums AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
       |    CAST(SUM(x1*x1) AS BIGINT) AS s11,
       |    CAST(SUM(x1*x2) AS BIGINT) AS s12,
       |    CAST(SUM(x2*x2) AS BIGINT) AS s22,
       |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x1*y) AS BIGINT) AS s1y,
       |    CAST(SUM(x2*y) AS BIGINT) AS s2y FROM li),
       |g AS (SELECT sums.*, lam FROM sums, (VALUES $grid) AS t(lam))
       |SELECT lam AS lambda,
       |  $solve
       |FROM g""".stripMargin
  }

  /** Daily counts, day index rebased to 0, then the unrolled IRLS
    * chain: per iteration one micro-quantized moment aggregate (the
    * SAME five term texts the Spark fold quantizes) and the shared
    * b/a update texts (TimeSeries.poissonBSql/poissonASql) split
    * across two CTEs (the same-SELECT-alias rule). */
  private[graft] lazy val poissonTrendOracle: String = {
    def m(e: String) =
      s"CAST(SUM(CAST(ROUND(($e) * 1000000, 0) AS BIGINT)) AS BIGINT)"
    val iterCtes = (1 to 4).map { i =>
      s"""t$i AS (SELECT MAX(n) AS n,
         |    ${m("mu")} AS w,
         |    ${m("mu * x")} AS wx,
         |    ${m("mu * x * x")} AS wxx,
         |    ${m("mu * eta + y - mu")} AS wz,
         |    ${m("x * (mu * eta + y - mu)")} AS wxz
         |  FROM (SELECT n, x, y, a + b * x AS eta, exp(a + b * x) AS mu
         |    FROM s, i${i - 1})),
         |pb$i AS (SELECT n, w, wx, wxx, wz, wxz,
         |    ${graft.operators.TimeSeries.poissonBSql} AS b FROM t$i),
         |i$i AS (SELECT n, ${graft.operators.TimeSeries.poissonASql} AS a,
         |    b FROM pb$i)""".stripMargin
    }.mkString(",\n")
    val out = (1 to 4).map(i =>
      s"SELECT CAST($i AS BIGINT) AS iter, n, round(a, 6) AS a, " +
        s"round(b, 6) AS b FROM i$i").mkString("\nUNION ALL ")
    s"""WITH pd AS (SELECT epoch_ms(ts) // 86400000 AS day,
       |    CAST(COUNT(*) AS BIGINT) AS y FROM events GROUP BY 1),
       |s AS (SELECT day - MIN(day) OVER () AS x, y FROM pd),
       |i0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    ln(CAST(SUM(y) AS DOUBLE) / COUNT(*)) AS a,
       |    CAST(0 AS DOUBLE) AS b FROM s),
       |$iterCtes
       |$out""".stripMargin
  }

  /** Unrolled 3-round boosted-stump replay: per round, a distinct-value
    * prefix scan per feature (the SAME gain/leaf texts —
    * Eval.boostGainSql/boostLeaf*Sql), the (gain desc, feature, v)
    * argmax, and the exact milli residual update. */
  private[graft] lazy val boostedStumpsOracle: String = {
    val features = Seq("x1", "x2")
    val roundCtes = (1 to 3).map { r =>
      val scans = features.map { f =>
        s"""p${r}$f AS (SELECT $f AS v, CAST(COUNT(*) AS BIGINT) AS nu,
           |    CAST(SUM(res) AS BIGINT) AS sres
           |  FROM r${r - 1} GROUP BY 1),
           |c${r}$f AS (SELECT v,
           |    CAST(SUM(nu) OVER w AS BIGINT) AS cum_nu,
           |    CAST(SUM(sres) OVER w AS BIGINT) AS cum_sres,
           |    CAST(SUM(nu) OVER () AS BIGINT) AS n_tot,
           |    CAST(SUM(sres) OVER () AS BIGINT) AS s_tot
           |  FROM p${r}$f WINDOW w AS (ORDER BY v
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"""
          .stripMargin
      }.mkString(",\n")
      val gUnion = features.map { f =>
        s"""SELECT '$f' AS feature, v,
           |    ${graft.operators.Eval.boostGainSql} AS gain,
           |    ${graft.operators.Eval.boostLeafLSql} AS leaf_l,
           |    ${graft.operators.Eval.boostLeafRSql} AS leaf_r
           |  FROM c${r}$f WHERE cum_nu < n_tot""".stripMargin
      }.mkString("\nUNION ALL ")
      s"""$scans,
         |g$r AS (${gUnion}),
         |b$r AS MATERIALIZED (SELECT feature, v, leaf_l, leaf_r
         |  FROM (SELECT *, row_number() OVER (
         |      ORDER BY gain DESC, feature, v) AS rk FROM g$r)
         |  WHERE rk = 1),
         |r$r AS MATERIALIZED (SELECT x1, x2,
         |    CASE WHEN b.feature = 'x1'
         |      THEN (CASE WHEN x1 <= b.v THEN res - b.leaf_l
         |        ELSE res - b.leaf_r END)
         |      ELSE (CASE WHEN x2 <= b.v THEN res - b.leaf_l
         |        ELSE res - b.leaf_r END) END AS res
         |  FROM r${r - 1}, b$r b)""".stripMargin
    }.mkString(",\n")
    val out = (1 to 3).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, feature, v AS split_value, " +
        s"leaf_l, leaf_r FROM b$r").mkString("\nUNION ALL ")
    s"""WITH r0 AS MATERIALIZED (SELECT
       |    CAST(l_quantity AS BIGINT) AS x1,
       |    CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS x2,
       |    CAST(ROUND(l_extendedprice, 0) AS BIGINT) * 1000 AS res
       |  FROM lineitem),
       |$roundCtes
       |$out""".stripMargin
  }

  /** Exact-count transition matrix + the unrolled 8-round micro-long
    * truncated-hitting-time recursion (Sessionize.hittingTermSql —
    * the same term text the Spark loop rounds). */
  private[graft] lazy val hittingTimeOracle: String = {
    val rounds = (1 to 8).map { h =>
      s"""s$h AS (SELECT t.from_type AS state,
         |    CAST(SUM(${graft.operators.Sessionize.hittingTermSql})
         |      AS BIGINT) AS s
         |  FROM (SELECT from_type, to_type, n, rs,
         |      e.em AS em FROM trs t0 JOIN e${h - 1} e
         |      ON e.state = t0.to_type) t
         |  GROUP BY 1),
         |e$h AS (SELECT st.state,
         |    CAST(CASE WHEN st.state = 'purchase' THEN 0
         |      ELSE 1000000 + COALESCE(s.s, 0) END AS BIGINT) AS em
         |  FROM st LEFT JOIN s$h s USING (state))""".stripMargin
    }.mkString(",\n")
    s"""WITH seq AS (
       |  SELECT event_type AS from_type,
       |    lead(event_type) OVER (PARTITION BY user_id
       |      ORDER BY epoch_ms(ts), event_id) AS to_type
       |  FROM events),
       |tr AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
       |trs AS (SELECT from_type, to_type, n,
       |    CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS rs
       |  FROM tr),
       |st AS (SELECT DISTINCT from_type AS state FROM trs),
       |e0 AS (SELECT state, CAST(0 AS BIGINT) AS em FROM st),
       |$rounds
       |SELECT state,
       |  round(CAST(em AS DOUBLE) / 1e6, 6) AS exp_steps
       |FROM e8""".stripMargin
  }

  /** All removal scenarios in one unrolled 8-round absorption
    * recursion (Sessionize.absorbTermSql), plus the first-event start
    * mixture — the Spark kernel replayed CTE for CTE. */
  private[graft] lazy val removalEffectOracle: String = {
    val rounds = (1 to 8).map { h =>
      s"""s$h AS MATERIALIZED (SELECT removed, from_type AS state,
         |    CAST(SUM(${graft.operators.Sessionize.absorbTermSql})
         |      AS BIGINT) AS s
         |  FROM (SELECT t.removed, t.from_type, t.n, t.rs, t.hit,
         |      COALESCE(e.em, 0) AS em
         |    FROM trx t LEFT JOIN e${h - 1} e
         |      ON e.removed = t.removed AND e.state = t.to_type)
         |  GROUP BY 1, 2),
         |e$h AS MATERIALIZED (SELECT sv.removed, sv.state,
         |    CAST(CASE WHEN sv.state = 'purchase' THEN 0
         |      ELSE COALESCE(s.s, 0) END AS BIGINT) AS em
         |  FROM sv LEFT JOIN s$h s
         |    ON s.removed = sv.removed AND s.state = sv.state)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH seq AS (
       |  SELECT user_id, event_type AS from_type,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY epoch_ms(ts), event_id) AS rn,
       |    lead(event_type) OVER (PARTITION BY user_id
       |      ORDER BY epoch_ms(ts), event_id) AS to_type
       |  FROM events),
       |tr AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
       |trs AS (SELECT from_type, to_type, n,
       |    CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS rs
       |  FROM tr),
       |st AS (SELECT DISTINCT from_type AS state FROM trs),
       |sc AS (SELECT state AS removed FROM st WHERE state <> 'purchase'
       |  UNION ALL SELECT '__none__'),
       |trx AS MATERIALIZED (SELECT trs.*, sc.removed,
       |    CASE WHEN to_type = 'purchase' THEN 1 ELSE 0 END AS hit
       |  FROM trs CROSS JOIN sc
       |  WHERE to_type <> removed AND from_type <> removed),
       |sv AS MATERIALIZED (SELECT sc.removed, st.state
       |  FROM st CROSS JOIN sc WHERE st.state <> sc.removed),
       |e0 AS (SELECT removed, state, CAST(0 AS BIGINT) AS em FROM sv),
       |$rounds,
       |fe AS (SELECT from_type AS state, CAST(COUNT(*) AS BIGINT) AS fn
       |  FROM seq WHERE rn = 1 GROUP BY 1),
       |fet AS (SELECT state, fn, CAST(SUM(fn) OVER () AS BIGINT) AS ft
       |  FROM fe),
       |pc AS (SELECT removed,
       |    CAST(SUM(CAST(ROUND((CAST(fn AS DOUBLE) / ft) * em, 0)
       |      AS BIGINT)) AS BIGINT) AS pm
       |  FROM e8 JOIN fet ON fet.state = e8.state GROUP BY 1),
       |pb AS (SELECT pm AS pbm FROM pc WHERE removed = '__none__')
       |SELECT removed AS channel,
       |  round(CAST(pbm AS DOUBLE) / 1e6, 6) AS p_base,
       |  round(CAST(pm AS DOUBLE) / 1e6, 6) AS p_removed,
       |  round(CAST(pbm - pm AS DOUBLE) / greatest(pbm, 1), 6)
       |    AS removal_effect
       |FROM pc, pb WHERE removed <> '__none__'""".stripMargin
  }

  /** The q_kaplan_meier survival chain + the interior-point filter and
    * the shared Weibull plot-regression texts (Survival.wb*Sql). */
  private[graft] lazy val weibullFitOracle: String =
    s"""WITH u AS (SELECT user_id, epoch_ms(ts) AS ms,
       |    event_type = 'error' AS is_err FROM events),
       |agg AS (SELECT user_id, MIN(ms) AS first_ms, MAX(ms) AS last_ms,
       |    MIN(CASE WHEN is_err THEN ms END) AS err_ms
       |  FROM u GROUP BY 1),
       |subj AS (SELECT 'c' || CAST(user_id % 2 AS VARCHAR) AS grp,
       |    (COALESCE(err_ms, last_ms) - first_ms) // 3600000 AS t,
       |    CASE WHEN err_ms IS NOT NULL THEN 1 ELSE 0 END AS ev
       |  FROM agg),
       |per AS (SELECT grp, t, CAST(SUM(ev) AS BIGINT) AS d,
       |    CAST(COUNT(*) AS BIGINT) AS m FROM subj GROUP BY 1, 2),
       |r AS (SELECT grp, t, d, m,
       |    CAST(SUM(m) OVER (PARTITION BY grp ORDER BY t) AS BIGINT)
       |      AS cum_m,
       |    CAST(SUM(m) OVER (PARTITION BY grp) AS BIGINT) AS n_grp
       |  FROM per),
       |s AS (SELECT grp, t, d, n_grp - cum_m + m AS n_at_risk FROM r),
       |f AS (SELECT grp, t, d, n_at_risk,
       |    ${graft.operators.Survival.kmLnNanoSql} AS ln_nano,
       |    ${graft.operators.Survival.kmZeroFlagSql} AS zf FROM s),
       |c AS (SELECT grp, t, d, n_at_risk,
       |    CAST(SUM(ln_nano) OVER (PARTITION BY grp ORDER BY t) AS BIGINT)
       |      AS cum_ln_nano,
       |    CAST(SUM(zf) OVER (PARTITION BY grp ORDER BY t) AS BIGINT)
       |      AS cum_zf
       |  FROM f),
       |km AS (SELECT grp, t,
       |    ${graft.operators.Survival.kmSurvivalSql} AS survival
       |  FROM c WHERE d > 0),
       |pts AS (SELECT grp,
       |    ${graft.operators.Survival.wbXmSql} AS xm,
       |    ${graft.operators.Survival.wbYmSql} AS ym
       |  FROM km WHERE t > 0 AND survival > 0 AND survival < 1),
       |mo AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS np,
       |    CAST(SUM(xm) AS BIGINT) AS sx, CAST(SUM(ym) AS BIGINT) AS sy,
       |    CAST(SUM(xm * ym) AS BIGINT) AS sxy,
       |    CAST(SUM(xm * xm) AS BIGINT) AS sxx
       |  FROM pts GROUP BY 1),
       |sh AS (SELECT grp, np, sx, sy,
       |    ${graft.operators.Survival.wbShapeSql} AS shape FROM mo)
       |SELECT grp, np, round(shape, 6) AS shape,
       |  round(${graft.operators.Survival.wbScaleSql}, 6) AS scale
       |FROM sh""".stripMargin

  /** The q_ipw_ate base + per-arm ols2 moment/solve CTEs + the
    * milli-quantized AIPW influence aggregate (Eval.aipwAteSql). */
  private[graft] lazy val doublyRobustOracle: String = {
    val solve = graft.operators.Eval.ols2Solve.take(3)
    def armCtes(arm: Int, px: String) = {
      val sel = solve.map { case (name, sql) =>
        s"$sql AS ${px}${name.drop(1)}" }.mkString(",\n    ")
      s"""${px}m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
         |    CAST(SUM(x1*x1) AS BIGINT) AS s11,
         |    CAST(SUM(x1*x2) AS BIGINT) AS s12,
         |    CAST(SUM(x2*x2) AS BIGINT) AS s22,
         |    CAST(SUM(yo) AS BIGINT) AS sy,
         |    CAST(SUM(x1*yo) AS BIGINT) AS s1y,
         |    CAST(SUM(x2*yo) AS BIGINT) AS s2y
         |  FROM base WHERE t = $arm),
         |${px}c AS (SELECT
         |    $sel
         |  FROM ${px}m)""".stripMargin
    }
    def ml(e: String) =
      s"CAST(SUM(CAST(ROUND(($e) * 1000, 0) AS BIGINT)) AS BIGINT)"
    s"""WITH nli AS (SELECT l_orderkey AS o_orderkey,
       |    CAST(COUNT(*) AS BIGINT) AS x1 FROM lineitem GROUP BY 1),
       |base AS (SELECT o.o_orderkey,
       |    CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS BIGINT) <= 2
       |      THEN 1 ELSE 0 END AS t,
       |    CAST(ROUND(o_totalprice, 0) AS BIGINT) AS yo,
       |    o_custkey % 7 AS x2, x1
       |  FROM orders o JOIN nli USING (o_orderkey)),
       |s AS (SELECT t AS y, x1, x2 FROM base),
       |${logisticIrlsCtes(4)},
       |${armCtes(1, "m1_")},
       |${armCtes(0, "m0_")},
       |f AS (SELECT base.*,
       |    ${graft.operators.Eval.ipwEhSql(0.01)} AS eh,
       |    m1_0 + m1_1 * x1 + m1_2 * x2 AS m1,
       |    m0_0 + m0_1 * x1 + m0_2 * x2 AS m0
       |  FROM base, i4, m1_c, m0_c),
       |a AS (SELECT CAST(SUM(t) AS BIGINT) AS n_treated,
       |    CAST(SUM(1 - t) AS BIGINT) AS n_control,
       |    CAST(COUNT(*) AS BIGINT) AS nn,
       |    ${ml("m1 - m0 + t * (yo - m1) / eh - " +
              "(1 - t) * (yo - m0) / (1.0 - eh)")} AS sa,
       |    CAST(SUM(t * yo) AS BIGINT) AS sty,
       |    CAST(SUM((1 - t) * yo) AS BIGINT) AS scy
       |  FROM f)
       |SELECT n_treated, n_control,
       |  ${graft.operators.Eval.aipwAteSql} AS ate_aipw,
       |  ${graft.operators.Eval.naiveDiffSql} AS diff_naive
       |FROM a""".stripMargin
  }

  /** Unrolled logistic-IRLS CTE chain over a caller-provided
    * `s(y, x1, x2)`: log-odds init `i0`, per round the micro-quantized
    * weighted moments (NESTED subqueries so w/p/eta never reference a
    * same-SELECT alias — the DuckDB resolution rule) and the spliced
    * Eval.ols2Solve b0/b1/b2 — the SAME term texts the Spark fold
    * quantizes, so coefficient trajectories are engine-identical. */
  private[graft] def logisticIrlsCtes(iters: Int): String = {
    def m(e: String) =
      s"CAST(SUM(CAST(ROUND(($e) * 1000000, 0) AS BIGINT)) AS BIGINT)"
    val solve = graft.operators.Eval.ols2Solve.take(3)
      .map { case (name, sql) => s"$sql AS $name" }.mkString(",\n    ")
    val rounds = (1 to iters).map { i =>
      s"""t$i AS (SELECT
         |    ${m("w")} AS n, ${m("w * x1")} AS s1, ${m("w * x2")} AS s2,
         |    ${m("w * x1 * x1")} AS s11, ${m("w * x1 * x2")} AS s12,
         |    ${m("w * x2 * x2")} AS s22,
         |    ${m("w * eta + y - p")} AS sy,
         |    ${m("x1 * (w * eta + y - p)")} AS s1y,
         |    ${m("x2 * (w * eta + y - p)")} AS s2y
         |  FROM (SELECT x1, x2, y, eta, p, p * (1.0 - p) AS w
         |    FROM (SELECT x1, x2, y, b0 + b1 * x1 + b2 * x2 AS eta,
         |        1.0 / (1.0 + exp(-(b0 + b1 * x1 + b2 * x2))) AS p
         |      FROM s, i${i - 1}))),
         |i$i AS (SELECT
         |    $solve
         |  FROM t$i)""".stripMargin
    }.mkString(",\n")
    s"""i0 AS (SELECT
       |    ln((CAST(SUM(y) AS DOUBLE) / COUNT(*)) /
       |      (1.0 - CAST(SUM(y) AS DOUBLE) / COUNT(*))) AS b0,
       |    CAST(0 AS DOUBLE) AS b1, CAST(0 AS DOUBLE) AS b2 FROM s),
       |$rounds""".stripMargin
  }

  /** Gap-filled hourly counts → per-(offset, start) exact dot products
    * via one rolling window per offset partition → the shared distance
    * text (TimeSeries.mpDistSql) → start-keyed arg-min with the
    * (dist, neighbor) tie-break — the Spark kernel replayed CTE for
    * CTE. Full windows pin via COUNT(*) OVER the same frame. */
  private[graft] lazy val matrixProfileOracle: String =
    s"""WITH cnt AS (SELECT epoch_ms(ts) // 3600000 AS t,
       |    CAST(COUNT(*) AS BIGINT) AS x0 FROM events GROUP BY 1),
       |sp AS (SELECT unnest(generate_series(
       |    (SELECT MIN(t) FROM cnt), (SELECT MAX(t) FROM cnt))) AS t),
       |s AS (SELECT sp.t, COALESCE(cnt.x0, 0) AS x
       |  FROM sp LEFT JOIN cnt USING (t)),
       |w AS (SELECT t AS i,
       |    CAST(SUM(x) OVER win AS BIGINT) AS sx,
       |    CAST(SUM(x * x) OVER win AS BIGINT) AS sxx,
       |    CAST(COUNT(*) OVER win AS BIGINT) AS cw
       |  FROM s WINDOW win AS (ORDER BY t
       |    ROWS BETWEEN CURRENT ROW AND 23 FOLLOWING)),
       |wv AS MATERIALIZED (SELECT i, sx, sxx FROM w WHERE cw = 24),
       |z AS (SELECT b.t - a.t AS d, a.t,
       |    CAST(a.x * b.x AS BIGINT) AS z
       |  FROM s a JOIN s b ON b.t - a.t >= 12),
       |qr AS (SELECT d, t AS i, t + d AS j,
       |    CAST(SUM(z) OVER win AS BIGINT) AS q,
       |    CAST(COUNT(*) OVER win AS BIGINT) AS cq
       |  FROM z WINDOW win AS (PARTITION BY d ORDER BY t
       |    ROWS BETWEEN CURRENT ROW AND 23 FOLLOWING)),
       |pairs AS MATERIALIZED (SELECT i, j,
       |    ${graft.operators.TimeSeries.mpDistSql(24)} AS dist
       |  FROM (SELECT qr.i, qr.j, qr.q,
       |      wi.sx AS sxi, wi.sxx AS sxxi, wj.sx AS sxj, wj.sxx AS sxxj
       |    FROM qr JOIN wv wi ON wi.i = qr.i JOIN wv wj ON wj.i = qr.j
       |    WHERE qr.cq = 24)),
       |mirr AS (SELECT i, j, dist FROM pairs WHERE dist IS NOT NULL
       |  UNION ALL
       |  SELECT j AS i, i AS j, dist FROM pairs WHERE dist IS NOT NULL),
       |f AS (SELECT i, j, dist,
       |    row_number() OVER (PARTITION BY i ORDER BY dist, j) AS rn
       |  FROM mirr)
       |SELECT i AS window_start, j AS nn_start, dist AS nn_dist
       |FROM f WHERE rn = 1""".stripMargin

  /** Per-user gap-filled daily spend → lag-1/lag-2 Pearson rho (the
    * q_acf text, rounded 6 dp so both engines seed identical doubles)
    * → the shared Yule-Walker phi and forecast-step texts
    * (TimeSeries.ar2Phi*Sql / arStepSql) unrolled h=1..6. */
  private[graft] lazy val arForecastOracle: String = {
    def rhoCtes(k: Int) =
      s"""p$k AS (SELECT user_id, v AS y,
         |    lag(v, $k) OVER (PARTITION BY user_id ORDER BY day) AS x
         |  FROM pd),
         |m$k AS (SELECT user_id, COUNT(*) AS n,
         |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         |    SUM(x * x) AS sxx, SUM(y * y) AS syy
         |  FROM p$k WHERE x IS NOT NULL GROUP BY 1),
         |r$k AS (SELECT user_id,
         |  round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
         |    THEN (n * sxy - sx * sy) /
         |      sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
         |           CAST(n * syy - sy * sy AS DOUBLE))
         |    END, 6) AS rho$k FROM m$k)""".stripMargin
    val steps = (1 to 6).map { h =>
      val p1 = if (h == 1) "f0" else s"f${h - 1}"
      val p2 = if (h == 1) "fm1" else if (h == 2) "f0" else s"f${h - 2}"
      s"""g$h AS (SELECT *,
         |  ${graft.operators.TimeSeries.arStepSql(p1, p2)} AS f$h
         |  FROM g${h - 1})""".stripMargin
    }.mkString(",\n")
    val out = (1 to 6).map(h =>
      s"SELECT user_id, n_series, round(phi1, 6) AS phi1, " +
        s"round(phi2, 6) AS phi2, CAST($h AS BIGINT) AS h, " +
        s"round(f$h, 6) AS forecast FROM g6").mkString("\nUNION ALL ")
    s"""WITH pd0 AS (
       |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
       |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
       |  FROM events GROUP BY 1, 2),
       |sp AS (SELECT user_id, unnest(generate_series(b0, b1)) AS day
       |  FROM (SELECT user_id, MIN(day) AS b0, MAX(day) AS b1
       |    FROM pd0 GROUP BY 1)),
       |pd AS (SELECT sp.user_id, sp.day, COALESCE(pd0.v, 0) AS v
       |  FROM sp LEFT JOIN pd0 USING (user_id, day)),
       |${rhoCtes(1)},
       |${rhoCtes(2)},
       |base AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_series,
       |    CAST(SUM(v) AS BIGINT) AS sv FROM pd GROUP BY 1),
       |lt AS (SELECT user_id,
       |    MAX(CASE WHEN rn = 1 THEN v END) AS xn,
       |    MAX(CASE WHEN rn = 2 THEN v END) AS xn1
       |  FROM (SELECT user_id, v, row_number() OVER (
       |      PARTITION BY user_id ORDER BY day DESC) AS rn FROM pd)
       |  WHERE rn <= 2 GROUP BY 1),
       |g0 AS (SELECT base.user_id, n_series, rho1, rho2,
       |    CAST(sv AS DOUBLE) / n_series AS mu,
       |    ${graft.operators.TimeSeries.ar2Phi1Sql} AS phi1,
       |    ${graft.operators.TimeSeries.ar2Phi2Sql} AS phi2,
       |    CAST(xn AS DOUBLE) AS f0, CAST(xn1 AS DOUBLE) AS fm1
       |  FROM base JOIN r1 USING (user_id) JOIN r2 USING (user_id)
       |  JOIN lt USING (user_id)),
       |$steps
       |$out""".stripMargin
  }

  /** Symmetrized co-purchase edge CTE pair (`cu` canonical, `e`
    * bidirectional) — shared by the round-13 graph oracles. */
  private[graft] val symCoPurchaseCte: String =
    """cu AS (
      |  SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS lo,
      |                  CAST(b.l_partkey AS BIGINT) AS hi
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |e AS (SELECT lo AS src, hi AS dst FROM cu
      |  UNION ALL SELECT hi AS src, lo AS dst FROM cu)""".stripMargin

  /** Unrolled 4-round max-normalized power iteration over the
    * symmetrized co-purchase graph (Graph.eigenCentralitySql). */
  private[graft] lazy val eigenCentralityOracle: String =
    s"""WITH $symCoPurchaseCte,
       |${graft.operators.Graph.eigenCentralitySql(4)}""".stripMargin

  /** Unrolled Luby rounds over the same symmetrized edge set
    * (Graph.misSql — post-convergence rounds are empty on both
    * engines). */
  private[graft] lazy val misOracle: String =
    s"""WITH $symCoPurchaseCte,
       |${graft.operators.Graph.misSql(16)}""".stripMargin

  /** Symmetrized REPEAT-co-purchase edge CTE pair (>= 2 shared orders —
    * [[repeatCoPurchase]]'s SQL twin). */
  private[graft] val symRepeatCoPurchaseCte: String =
    """cu AS MATERIALIZED (
      |  SELECT CAST(a.l_partkey AS BIGINT) AS lo,
      |         CAST(b.l_partkey AS BIGINT) AS hi
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2),
      |e AS (SELECT lo AS src, hi AS dst FROM cu
      |  UNION ALL SELECT hi AS src, lo AS dst FROM cu)""".stripMargin

  /** Unrolled greedy-matching handshake rounds over the symmetrized
    * repeat-co-purchase edge set (Graph.matchingSql — post-quiescence
    * rounds are empty on both engines). */
  private[graft] lazy val matchingOracle: String =
    s"""WITH $symRepeatCoPurchaseCte,
       |${graft.operators.Graph.matchingSql(8)}""".stripMargin

  /** Two unrolled 12-level BFS sweeps + argmax picks over the same
    * repeat-co-purchase edge set (Graph.diameterSweepSql). */
  private[graft] lazy val diameterOracle: String =
    s"""WITH $symRepeatCoPurchaseCte,
       |${graft.operators.Graph.diameterSweepSql(12)}""".stripMargin

  /** Unrolled Borůvka rounds over the canonical co-purchase edge set
    * (Graph.mstSql — per-round reachability-closure labels; post-
    * convergence rounds select nothing on both engines). Needs only
    * the `cu` CTE, so the bidirectional half of symCoPurchaseCte is
    * harmlessly unused. */
  private[graft] lazy val mstOracle: String =
    s"""WITH RECURSIVE $symCoPurchaseCte,
       |${graft.operators.Graph.mstSql(12)}""".stripMargin

  /** First-8-events pivot per user (exactly-8 contract) + the unrolled
    * integer-score Viterbi chain (Sessionize.viterbiSqlCtes — the SAME
    * score maps the Spark DP interpolates, so path and score are
    * engine-exact integers). */
  private[graft] lazy val viterbiOracle: String =
    s"""WITH o AS (SELECT user_id AS k, event_type,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY epoch_ms(ts), event_id) AS rn
       |  FROM events),
       |p AS (SELECT k,
       |    ${(1 to 8).map(i =>
            s"MAX(CASE WHEN rn = $i THEN event_type END) AS o$i")
            .mkString(",\n    ")}
       |  FROM o WHERE rn <= 8 GROUP BY k
       |  HAVING MAX(CASE WHEN rn = 8 THEN event_type END) IS NOT NULL),
       |${graft.operators.Sessionize.viterbiSqlCtes(8, keyAlias = "user_id")}"""
      .stripMargin

  /** Shared by q_bh_fdr (batch) and q_stream_bh_fdr (complete-mode
    * streaming counts): identical test semantics, one oracle text. */
  private[graft] lazy val bhFdrOracleSql: String =
      s"""WITH pu AS (SELECT user_id,
         |    CAST(SUM(CASE WHEN day(ts) < 16 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n1,
         |    CAST(SUM(CASE WHEN day(ts) >= 16 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n2 FROM events GROUP BY 1),
         |zt AS (SELECT user_id, n1, n2,
         |    round(CAST(n2 - n1 AS DOUBLE) / sqrt(CAST(n1 + n2 AS DOUBLE)), 6)
         |      AS z FROM pu),
         |pt AS (SELECT *, round(${graft.operators.Profiling.normalPSql("z")}, 6)
         |    AS p FROM zt),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY p, user_id)
         |      AS BIGINT) AS p_rank,
         |    CAST(COUNT(*) OVER () AS BIGINT) AS m_tests FROM pt),
         |ks AS (SELECT CAST(COALESCE(MAX(CASE WHEN p * m_tests * 1000000.0
         |      <= p_rank * 100000 THEN p_rank END), 0) AS BIGINT) AS k_star
         |  FROM r)
         |SELECT user_id, n1, n2, z, p, p_rank, m_tests, k_star,
         |  (p_rank <= k_star) AS rejected
         |FROM r, ks""".stripMargin

  private[graft] lazy val changepointOracleSql: String =
      s"""WITH daily AS (SELECT event_type AS g,
         |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS x,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS y
         |  FROM events GROUP BY 1, 2),
         |r AS (SELECT g, x,
         |    CAST(SUM(y) OVER (PARTITION BY g ORDER BY x) AS BIGINT) AS sl,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY x) AS BIGINT)
         |      AS nl,
         |    CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n,
         |    CAST(SUM(y) OVER (PARTITION BY g) AS BIGINT) AS s FROM daily),
         |sc AS (SELECT *, ${graft.operators.TimeSeries.binsegScoreSql}
         |    AS score_micro FROM r WHERE nl < n),
         |top AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY g
         |    ORDER BY score_micro DESC, x) AS rn FROM sc)
         |SELECT g AS event_type, x AS split_after_x, n, score_micro,
         |  round(CAST(sl AS DOUBLE) / nl, 6) AS mean_left,
         |  round(CAST(s - sl AS DOUBLE) / (n - nl), 6) AS mean_right
         |FROM top WHERE rn = 1""".stripMargin

  /** Shared by q_sign_test (batch) and q_stream_sign_test (the
    * complete-mode streaming tier drains the identical per-user
    * paired table): one oracle text. */
  private[graft] lazy val signTestOracleSql: String =
    s"""WITH e AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day,
       |    CAST(ROUND(value*100, 0) AS BIGINT) AS cents FROM events),
       |u AS (SELECT user_id,
       |    CAST(SUM(CASE WHEN day % 2 = 0 THEN cents ELSE 0 END)
       |      AS BIGINT) AS x,
       |    CAST(SUM(CASE WHEN day % 2 = 1 THEN cents ELSE 0 END)
       |      AS BIGINT) AS y
       |  FROM e GROUP BY 1),
       |a AS (SELECT
       |    CAST(SUM(CASE WHEN x > y THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_pos,
       |    CAST(SUM(CASE WHEN x < y THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_neg,
       |    CAST(SUM(CASE WHEN x = y THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_tie
       |  FROM u),
       |f AS (SELECT n_pos, n_neg, n_tie,
       |    CAST(n_pos + n_neg AS BIGINT) AS m FROM a)
       |SELECT n_pos, n_neg, n_tie, m,
       |  ${graft.operators.Profiling.signZSql} AS z,
       |  abs(${graft.operators.Profiling.signZSql}) > 1.959964
       |    AS significant
       |FROM f""".stripMargin

  /** Shared by q_risk_ratio (batch) and q_stream_risk_ratio (the
    * complete-mode streaming tier drains the identical per-user
    * table): one oracle text. */
  private[graft] lazy val riskRatioOracleSql: String =
    s"""WITH users AS (SELECT user_id,
       |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
       |      AS BIGINT) >= 14 AS clicker,
       |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS BIGINT) >= 15 AS heavy
       |  FROM events GROUP BY 1),
       |x AS (SELECT
       |    CAST(SUM(CASE WHEN clicker AND heavy THEN 1 ELSE 0 END)
       |      AS BIGINT) AS a,
       |    CAST(SUM(CASE WHEN clicker AND NOT heavy THEN 1 ELSE 0 END)
       |      AS BIGINT) AS b,
       |    CAST(SUM(CASE WHEN NOT clicker AND heavy THEN 1 ELSE 0 END)
       |      AS BIGINT) AS c,
       |    CAST(SUM(CASE WHEN NOT clicker AND NOT heavy THEN 1 ELSE 0
       |      END) AS BIGINT) AS d
       |  FROM users)
       |SELECT a, b, c, d,
       |  ${graft.operators.Profiling.rrSql} AS risk_ratio,
       |  ${graft.operators.Profiling.rrCiSql("-")} AS rr_lo,
       |  ${graft.operators.Profiling.rrCiSql("+")} AS rr_hi,
       |  ${graft.operators.Profiling.orSql} AS odds_ratio,
       |  ${graft.operators.Profiling.orCiSql("-")} AS or_lo,
       |  ${graft.operators.Profiling.orCiSql("+")} AS or_hi
       |FROM x""".stripMargin

  /** Shared by q_wilson_ci (batch) and q_stream_wilson (complete-mode
    * streaming agg): identical (success, n) semantics, one oracle text. */
  private[graft] lazy val wilsonOracleSql: String =
    s"""WITH e AS (SELECT event_type, (value > 100) AS success FROM events),
       |c AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN success THEN 1 ELSE 0 END) AS BIGINT) AS s
       |  FROM e GROUP BY 1)
       |SELECT event_type, n, s, round(CAST(s AS DOUBLE) / n, 6) AS p_hat,
       |  ${graft.operators.Profiling.wilsonSql("-")} AS ci_lo,
       |  ${graft.operators.Profiling.wilsonSql("+")} AS ci_hi
       |FROM c""".stripMargin

  /** Shared by q_ohlc_bars (batch windows) and q_stream_ohlc (streaming
    * min_by/max_by): identical bar semantics, one oracle text. */
  /** Hourly spend-cents per event type, hour index relative to Jan 1
    * 2024 — the shared series the rolling-window oracles (drawdown /
    * bollinger / rsi / stochastic) replay. Mirrors the Spark-side
    * hourly groupBy exactly. */
  private[graft] lazy val hourlySpendCte: String =
    """hb AS (SELECT event_type,
      |    (epoch_ms(ts) - 1704067200000) // 3600000 AS h,
      |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2)""".stripMargin

  /** Shared by q_hhi (batch) and q_stream_hhi (complete-mode streaming
    * rollup + batch share² finish): identical concentration semantics,
    * one oracle text. */
  private[graft] lazy val hhiOracleSql: String =
      s"""WITH f AS (SELECT event_type, user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2),
         |w AS (SELECT event_type, c,
         |    CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS t
         |  FROM f),
         |tm AS (SELECT event_type, c, t,
         |    ${graft.operators.Eval.hhiTermNanoSql} AS term FROM w),
         |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_firms,
         |    CAST(MAX(t) AS BIGINT) AS total,
         |    CAST(SUM(term) AS BIGINT) AS s_nano,
         |    CAST(MAX(c) AS BIGINT) AS top_c
         |  FROM tm GROUP BY 1)
         |SELECT event_type, n_firms, total, s_nano, top_c,
         |  ${graft.operators.Eval.hhiSql} AS hhi,
         |  CASE WHEN total > 0 THEN
         |    round(CAST(top_c AS DOUBLE) / total, 6) END AS top_share
         |FROM g""".stripMargin

  /** PQ-encode replay (Similarity.pqEncode at m=4, k=16), ending in
    * `pq(vec_id, subspace, code, dist2)` — shared by q_pq_encode and
    * q_pq_error. Codebooks = subvectors of the 16 lowest vec_ids (the
    * ivf trainIters=0 convention); exact integer L2 assignment. */
  /** IVF replay shared by q_similarity_ivf and its cellCap twin —
    * mirrors Similarity.ivfTopK at trainIters = 0: cent = 16 lowest-id
    * vectors; assign = top-2 cells by rounded cosine (tie-break cell
    * asc) over ALL corpus rows (multi-assignment recall trick); probes
    * = each query's top-4 cells by the same ranking; final = exact rank
    * within probed cells, DISTINCT pairs first (a vector reachable via
    * both its cells must rank once). */
  private[graft] lazy val ivfOracleSql: String =
    s"""WITH $normCte,
       |cent AS (SELECT vec_id AS cell, embedding, nrm FROM n ORDER BY vec_id LIMIT 16),
       |assign AS (SELECT vec_id, embedding, nrm, cell FROM (
       |    SELECT q.vec_id, q.embedding, q.nrm, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY round($cosineSqlExpr, 6) DESC, c.cell) AS r
       |    FROM n q CROSS JOIN cent c)
       |  WHERE r <= 2),
       |probes AS (SELECT qid, embedding, nrm, cell FROM (
       |    SELECT q.vec_id AS qid, q.embedding, q.nrm, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |        ORDER BY round($cosineSqlExpr, 6) DESC, c.cell) AS r
       |    FROM n q CROSS JOIN cent c WHERE q.vec_id < 8)
       |  WHERE r <= 4)
       |SELECT qid, vec_id, sim, rank FROM (
       |  SELECT qid, vec_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY sim DESC, vec_id) AS rank
       |  FROM (SELECT DISTINCT p.qid, a.vec_id,
       |          round(${cosineSqlExprAs("p", "a")}, 6) AS sim
       |        FROM probes p JOIN assign a ON p.cell = a.cell AND a.vec_id != p.qid))
       |WHERE rank <= 10""".stripMargin

  private[graft] lazy val pqEncodeCtes: String =
    """x AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS i,
      |    CAST((i - 1) // (len(e) // 4) AS BIGINT) AS subspace,
      |    CAST(round(CAST(e[i] AS DOUBLE) * 4096, 0) AS BIGINT) AS xq
      |  FROM (SELECT vec_id, embedding AS e,
      |      unnest(range(1, len(embedding)+1)) AS i FROM embeddings)),
      |ids AS (SELECT vec_id,
      |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS code
      |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
      |cb AS (SELECT code, subspace, i, xq AS cq
      |  FROM x JOIN ids USING (vec_id)),
      |sc AS (SELECT x.vec_id, x.subspace, cb.code,
      |    CAST(SUM((x.xq - cb.cq) * (x.xq - cb.cq)) AS BIGINT) AS dist2
      |  FROM x JOIN cb ON cb.subspace = x.subspace AND cb.i = x.i
      |  GROUP BY 1, 2, 3),
      |pq AS (SELECT vec_id, subspace, code, dist2 FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
      |      ORDER BY dist2, code) AS rn FROM sc)
      |  WHERE rn = 1)""".stripMargin

  /** Unrolled Lloyd-training replay for the PQ codebook — mirrors
    * Similarity.pqCodebookTrained(m, k, iters) exactly: quantized
    * coords `x`, lowest-id seed `cb_0`, then per iteration the argmin
    * assignment (d_t/a_t), per-coordinate sums (s_t), and the
    * half-away-from-zero integer mean update (cb_t, empty clusters
    * keep the previous codeword via the shared pqMeanRoundSql). Every
    * round is AS MATERIALIZED — default inlining expands k^rounds when
    * a round references its predecessor k times (the pageRank lesson).
    * Ends in `cb_$iters`; callers append their own assignment /
    * ADC / rerank CTEs against it. */
  private[graft] def pqTrainedCtes(m: Int, k: Int, iters: Int): String = {
    val head =
      s"""x AS MATERIALIZED (SELECT vec_id, CAST(i - 1 AS BIGINT) AS i,
         |    CAST((i - 1) // (len(e) // $m) AS BIGINT) AS subspace,
         |    CAST(round(CAST(e[i] AS DOUBLE) * 4096, 0) AS BIGINT) AS xq
         |  FROM (SELECT vec_id, embedding AS e,
         |      unnest(range(1, len(embedding)+1)) AS i FROM embeddings)),
         |ids AS (SELECT vec_id,
         |    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
         |      AS code
         |  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id
         |    LIMIT $k)),
         |cb_0 AS (SELECT code, subspace, i, xq AS cq
         |  FROM x JOIN ids USING (vec_id))""".stripMargin
    val its = (1 to iters).map { t =>
      s"""d_$t AS MATERIALIZED (SELECT x.vec_id, x.subspace, p.code,
         |    CAST(SUM((x.xq - p.cq) * (x.xq - p.cq)) AS BIGINT) AS d2
         |  FROM x JOIN cb_${t - 1} p ON p.subspace = x.subspace
         |    AND p.i = x.i
         |  GROUP BY 1, 2, 3),
         |a_$t AS MATERIALIZED (SELECT vec_id, subspace, code FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
         |      ORDER BY d2, code) AS rn FROM d_$t) WHERE rn = 1),
         |s_$t AS MATERIALIZED (SELECT a.subspace, a.code, x.i,
         |    CAST(SUM(x.xq) AS BIGINT) AS sm,
         |    CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM a_$t a JOIN x ON x.vec_id = a.vec_id
         |    AND x.subspace = a.subspace
         |  GROUP BY 1, 2, 3),
         |cb_$t AS MATERIALIZED (SELECT p.code, p.subspace, p.i,
         |    CAST(${graft.operators.Similarity.pqMeanRoundSql("//")}
         |      AS BIGINT) AS cq
         |  FROM cb_${t - 1} p LEFT JOIN s_$t s ON s.code = p.code
         |    AND s.subspace = p.subspace AND s.i = p.i)""".stripMargin
    }
    (head +: its).mkString(",\n")
  }

  /** Corpus codes + per-query ADC tables + top-`rerank` candidates +
    * exact re-rank against the trained codebook `cb` — the shared tail
    * of q_pq_rerank and q_pq_recall_rerank. Ends in `rer(qid, vec_id,
    * dist2)`. */
  private[graft] def pqRerankCtes(cb: String, rerank: Int): String =
    s"""pqd AS MATERIALIZED (SELECT x.vec_id, x.subspace, p.code,
       |    CAST(SUM((x.xq - p.cq) * (x.xq - p.cq)) AS BIGINT) AS d2
       |  FROM x JOIN $cb p ON p.subspace = x.subspace AND p.i = x.i
       |  GROUP BY 1, 2, 3),
       |pqc AS MATERIALIZED (SELECT vec_id, subspace, code FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, subspace
       |      ORDER BY d2, code) AS rn FROM pqd) WHERE rn = 1),
       |qx AS MATERIALIZED (SELECT vec_id AS qid, subspace, i, xq
       |  FROM x WHERE vec_id < 8),
       |adc AS (SELECT qid, qx.subspace, p.code,
       |    CAST(SUM((qx.xq - p.cq) * (qx.xq - p.cq)) AS BIGINT) AS d2
       |  FROM qx JOIN $cb p ON p.subspace = qx.subspace AND p.i = qx.i
       |  GROUP BY 1, 2, 3),
       |ap AS (SELECT adc.qid, pqc.vec_id,
       |    CAST(SUM(adc.d2) AS BIGINT) AS adc_dist2
       |  FROM pqc JOIN adc ON adc.subspace = pqc.subspace
       |    AND adc.code = pqc.code
       |  WHERE pqc.vec_id <> adc.qid GROUP BY 1, 2),
       |cand AS (SELECT qid, vec_id FROM (SELECT *,
       |    row_number() OVER (PARTITION BY qid
       |      ORDER BY adc_dist2, vec_id) AS rn FROM ap)
       |  WHERE rn <= $rerank),
       |rer AS (SELECT c.qid, c.vec_id,
       |    CAST(SUM((q.xq - x.xq) * (q.xq - x.xq)) AS BIGINT) AS dist2
       |  FROM cand c JOIN x ON x.vec_id = c.vec_id
       |    JOIN qx q ON q.qid = c.qid AND q.i = x.i
       |  GROUP BY 1, 2)""".stripMargin

  /** Classical-decomposition replay over the hourly-dollars series,
    * ending in `dc(event_type, h, v, phase, trend, seasonal,
    * remainder)` — shared by q_seasonal_decompose and
    * q_seasonal_strength. Mirrors TimeSeries.classicalDecompose at
    * period = 24 exactly (2×24 MA, micro-rounded centered phase
    * means). */
  private[graft] lazy val decomposeCtes: String = {
    import graft.operators.TimeSeries
    s"""$hourlyDollarsCte,
       |b AS (SELECT event_type, h, v,
       |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY h)
       |      AS BIGINT) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nk,
       |    CAST(SUM(v) OVER (PARTITION BY event_type ORDER BY h
       |      ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS BIGINT)
       |      AS s_wide,
       |    CAST(SUM(v) OVER (PARTITION BY event_type ORDER BY h
       |      ROWS BETWEEN 11 PRECEDING AND 11 FOLLOWING) AS BIGINT)
       |      AS s_narrow
       |  FROM hd),
       |f2 AS (SELECT event_type, h, v, s_wide + s_narrow AS t2p,
       |    h % 24 AS phase, 48 * v - (s_wide + s_narrow) AS detr
       |  FROM b WHERE rn > 12 AND rn + 12 <= nk),
       |pm0 AS (SELECT event_type, phase,
       |    CAST(SUM(detr) AS BIGINT) AS se_num,
       |    CAST(COUNT(*) AS BIGINT) AS se_cnt
       |  FROM f2 GROUP BY 1, 2),
       |pm1 AS (SELECT event_type, phase,
       |    ${TimeSeries.decompSeasMicroSql(24)} AS seas_micro FROM pm0),
       |pm AS (SELECT event_type, phase, seas_micro -
       |    CAST(round(avg(seas_micro) OVER (PARTITION BY event_type), 0)
       |      AS BIGINT) AS s_eff
       |  FROM pm1),
       |dc AS (SELECT f2.event_type, h, v, CAST(phase AS BIGINT) AS phase,
       |    ${TimeSeries.decompTrendSql(24)} AS trend,
       |    round(CAST(s_eff AS DOUBLE) / 1e6, 6) AS seasonal,
       |    ${TimeSeries.decompRemainderSql(24)} AS remainder
       |  FROM f2 JOIN pm USING (event_type, phase))""".stripMargin
  }

  /** Hourly spend in whole DOLLARS per event type — the stationarity /
    * normality oracles (kpss / dickey_fuller / anderson_darling) use
    * dollars so squared sums stay exactly double-representable at any
    * bench scale. Mirrors the Spark-side hourly groupBy exactly. */
  private[graft] lazy val hourlyDollarsCte: String =
    """hd AS (SELECT event_type,
      |    (epoch_ms(ts) - 1704067200000) // 3600000 AS h,
      |    CAST(SUM(CAST(ROUND(value, 0) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2)""".stripMargin

  private[graft] lazy val ohlcOracleSql: String =
    """WITH e AS (SELECT event_type, epoch_ms(ts) AS ms, event_id,
      |    CAST(ROUND(value*100, 0) AS BIGINT) AS cents FROM events),
      |b AS (SELECT event_type, (ms // 21600000) * 21600000 AS bar_start_ms,
      |    (ms - 1700000000000) * 100000000 + event_id AS tkey, cents FROM e)
      |SELECT event_type, bar_start_ms, arg_min(cents, tkey) AS open,
      |  MAX(cents) AS high, MIN(cents) AS low, arg_max(cents, tkey) AS close,
      |  CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS volume
      |FROM b GROUP BY 1, 2""".stripMargin

  private[graft] lazy val pcaPowerOracleSql: String =
    s"""WITH x AS MATERIALIZED (SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
       |    CAST(round(CAST(e[i] AS DOUBLE) * 4096, 0) AS BIGINT) AS xq
       |  FROM (SELECT vec_id, embedding AS e,
       |          unnest(range(1, len(embedding)+1)) AS i FROM embeddings)),
       |p AS (SELECT a.dim AS i, b.dim AS j,
       |    CAST(SUM(a.xq * b.xq) AS BIGINT) AS s_ij
       |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.dim <= b.dim
       |  GROUP BY 1, 2),
       |m AS (SELECT dim, CAST(SUM(xq) AS BIGINT) AS m FROM x GROUP BY dim),
       |cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
       |covu AS MATERIALIZED (SELECT p.i, p.j,
       |    round((CAST(s_ij AS DOUBLE) / n -
       |      (CAST(ma.m AS DOUBLE) / n) * (CAST(mb.m AS DOUBLE) / n))
       |      / 16777216.0, 8) AS cov
       |  FROM p JOIN m ma ON p.i = ma.dim JOIN m mb ON p.j = mb.dim, cnt),
       |cov AS MATERIALIZED (SELECT i, j, cov FROM covu
       |  UNION ALL SELECT j, i, cov FROM covu WHERE i <> j),
       |${graft.operators.Similarity.pcaPowerSql(iters = 12)}""".stripMargin

  /** Shared DuckDB fragments mirroring TextFunctions/Similarity exactly. */

  /** MinHash-LSH verified near-dup pairs as CTEs ending in `verified`
    * (doc_a, doc_b, jaccard). Family: base = (60-bit md5 prefix) mod 2^30,
    * then affine mixes (A_i·m + B_i) mod (2^31-1) — mirrors
    * TextFunctions.minhashA/B. Shared by q_dedup_minhash and
    * q_dedup_components.
    *
    * The oracle models the UNCAPPED all-pairs band expansion: it matches
    * the Spark side only while no band bucket in the verify/bench corpus
    * exceeds Dedup.DefaultMaxBucketSize (above which Spark degrades to
    * star pairs). Round3OperatorsSpec asserts that margin against the
    * testdata explicitly, so a corpus change fails loudly there instead of
    * as an unexplained hash mismatch here. */
  private[graft] lazy val minhashVerifiedCtes: String =
    s"""$shingleCte,
       |sig AS (SELECT doc_id, sh,
       |  [list_min(list_transform(sh, t ->
       |     (((1103515245*(i+1)+12345) % 2147483647)
       |        * (CAST('0x'||substr(md5(t),1,15) AS BIGINT) % 1073741824)
       |      + ((1103515245*(i+17)+12345) % 2147483647)) % 2147483647))
       |   FOR i IN range(0,16)] AS sg
       |FROM sh),
       |bands AS (SELECT doc_id, sh,
       |  [CAST(sg[j*4+1] AS VARCHAR)||'_'||CAST(sg[j*4+2] AS VARCHAR)||'_'||
       |   CAST(sg[j*4+3] AS VARCHAR)||'_'||CAST(sg[j*4+4] AS VARCHAR) FOR j IN range(0,4)] AS bk
       |FROM sig),
       |cpairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sh AS sh_a, b.sh AS sh_b
       |  FROM bands a JOIN bands b ON a.doc_id < b.doc_id
       |  WHERE a.bk[1]=b.bk[1] OR a.bk[2]=b.bk[2] OR a.bk[3]=b.bk[3] OR a.bk[4]=b.bk[4]),
       |verified AS (
       |  SELECT doc_a, doc_b, jaccard FROM (
       |    SELECT doc_a, doc_b,
       |      round(len(list_intersect(sh_a, sh_b))*1.0/len(list_distinct(list_concat(sh_a, sh_b))), 6) AS jaccard
       |    FROM cpairs)
       |  WHERE jaccard >= 0.5)""".stripMargin

  /** Unigram-LM scores as CTEs ending in `u(doc_id, n_tokens,
    * avg_neg_logprob)` — mirrors TextAnalysis.unigramLogProb. Shared by
    * q_unigram_logprob and the q_perplexity_sample composition. */
  /** Shared by q_psi_drift (batch) and q_stream_psi_drift (the streamed
    * current sample feeds the same assembly): smoothed probabilities
    * mirror Profiling.psiFromCounts term-for-term —
    * (n+0.5)/(total+buckets/2); bucket = count of edges strictly below x. */
  private[graft] val psiDriftOracle: String =
    """WITH bse AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS c
      |  FROM events WHERE user_id % 2 = 0),
      |cur AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS c
      |  FROM events WHERE user_id % 2 != 0),
      |e AS (SELECT quantile_cont(c,
      |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS edges FROM bse),
      |nb AS (SELECT len(list_filter(edges, v -> CAST(c AS DOUBLE) > v)) AS bucket,
      |    CAST(COUNT(*) AS BIGINT) AS n_base FROM bse, e GROUP BY 1),
      |nc AS (SELECT len(list_filter(edges, v -> CAST(c AS DOUBLE) > v)) AS bucket,
      |    CAST(COUNT(*) AS BIGINT) AS n_cur FROM cur, e GROUP BY 1),
      |sp AS (SELECT unnest(range(0, 10)) AS bucket),
      |j AS (SELECT sp.bucket,
      |    CAST(COALESCE(n_base, 0) AS BIGINT) AS n_base,
      |    CAST(COALESCE(n_cur, 0) AS BIGINT) AS n_cur
      |  FROM sp LEFT JOIN nb ON nb.bucket = sp.bucket
      |    LEFT JOIN nc ON nc.bucket = sp.bucket),
      |t AS (SELECT CAST(SUM(n_base) AS BIGINT) AS tb,
      |    CAST(SUM(n_cur) AS BIGINT) AS tc FROM j)
      |SELECT bucket, n_base, n_cur,
      |  round((CAST(n_base AS DOUBLE) + 0.5) / (CAST(tb AS DOUBLE) + 5.0), 6) AS p_base,
      |  round((CAST(n_cur AS DOUBLE) + 0.5) / (CAST(tc AS DOUBLE) + 5.0), 6) AS p_cur,
      |  round(((CAST(n_cur AS DOUBLE) + 0.5) / (CAST(tc AS DOUBLE) + 5.0) -
      |         (CAST(n_base AS DOUBLE) + 0.5) / (CAST(tb AS DOUBLE) + 5.0)) *
      |    ln(((CAST(n_cur AS DOUBLE) + 0.5) / (CAST(tc AS DOUBLE) + 5.0)) /
      |       ((CAST(n_base AS DOUBLE) + 0.5) / (CAST(tb AS DOUBLE) + 5.0))), 6)
      |    AS psi_contrib
      |FROM j, t""".stripMargin

  private[graft] val unigramCte: String =
    """ex AS (SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents),
      |uc AS (SELECT doc_id, token, COUNT(*) AS c FROM ex GROUP BY doc_id, token),
      |uf AS (SELECT doc_id, c, SUM(c) OVER (PARTITION BY token) AS f FROM uc),
      |ut AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM ex),
      |u AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    round(-SUM(c * log2(f/total)) / SUM(c), 6) AS avg_neg_logprob
      |  FROM uf CROSS JOIN ut GROUP BY doc_id)""".stripMargin

  /** Exact heavy hitters (tokens above 0.2% support) — shared by the
    * batch (q_heavy_hitters) and streaming (q_stream_heavy_hitters)
    * tiers, which compute the identical rollup. */
  private[graft] val heavyHittersSql: String =
    """WITH tf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS freq FROM (
      |    SELECT unnest(string_split(text,' ')) AS token FROM documents)
      |  GROUP BY token),
      |t AS (SELECT CAST(SUM(freq) AS DOUBLE) AS total FROM tf)
      |SELECT token, freq FROM tf CROSS JOIN t
      |WHERE CAST(freq AS DOUBLE) > total * 0.002""".stripMargin

  /** Language-ID prediction as a WITH-prefix ending in CTE `pred`
    * (doc_id, labeled_lang, pred_lang) — the SQL twin of
    * [[graft.operators.TextAnalysis.langId]], shared by the q_lang_id
    * evaluation oracles (q_classifier_eval, q_cohens_kappa). */
  private[graft] val langPredCte: String =
    """WITH t AS (SELECT doc_id, lang AS labeled_lang,
      |    string_split(text, ' ') AS tl FROM documents),
      |sc AS (SELECT doc_id, labeled_lang,
      |  CAST(len(list_filter(tl, t -> t IN ('der','die','das','und','ein'))) AS BIGINT) AS s_de,
      |  CAST(len(list_filter(tl, t -> t IN ('the','a','of','and','to'))) AS BIGINT) AS s_en,
      |  CAST(len(list_filter(tl, t -> t IN ('el','la','de','y','un'))) AS BIGINT) AS s_es,
      |  CAST(len(list_filter(tl, t -> t IN ('le','la','de','et','un'))) AS BIGINT) AS s_fr,
      |  CAST(len(list_filter(tl, t -> t IN ('的','是','了','在','我'))) AS BIGINT) AS s_zh
      |FROM t),
      |pred AS (SELECT doc_id, labeled_lang,
      |  CASE WHEN g = 0 THEN 'und'
      |       WHEN s_de = g THEN 'de' WHEN s_en = g THEN 'en' WHEN s_es = g THEN 'es'
      |       WHEN s_fr = g THEN 'fr' WHEN s_zh = g THEN 'zh' ELSE 'und' END AS pred_lang
      |FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS g FROM sc))""".stripMargin

  /** Disclaimer-splice fixture as a CTE named `p` — the SQL twin of
    * [[spliceDisclaimer]]; edit BOTH or the repeated-span hash gates break. */
  private[graft] val disclaimerCte: String =
    s"""p AS (SELECT doc_id, text ||
       |    CASE WHEN doc_id % 3 = 0 THEN ' $RepeatedDisclaimer' ELSE '' END ||
       |    CASE WHEN doc_id % 6 = 0 THEN ' $RepeatedDisclaimer' ELSE '' END
       |    AS text
       |  FROM documents)""".stripMargin

  /** 3-gram word shingles, distinct, joined with '_' (1-based list math). */
  /** Backward as-of (latest click at-or-before each purchase), shared by
    * the union+window query and the custom-plan merge query — identical
    * semantics, different physical strategy. */
  private[graft] val asofBackwardOracle: String =
    """WITH u AS (
      |  SELECT event_id, user_id, epoch_ms(ts) AS ms,
      |    CASE WHEN event_type = 'click' THEN event_id END AS c_id,
      |    CASE WHEN event_type = 'click' THEN epoch_ms(ts) END AS c_ms,
      |    CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |j AS (
      |  SELECT *,
      |    LAST_VALUE(c_id IGNORE NULLS) OVER w AS cid,
      |    LAST_VALUE(c_ms IGNORE NULLS) OVER w AS cms
      |  FROM u
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ms, side, event_id
      |               ROWS UNBOUNDED PRECEDING))
      |SELECT event_id, user_id, ms AS ts_ms,
      |  CAST(COALESCE(cid, -1) AS BIGINT) AS click_event_id,
      |  CAST(COALESCE(ms // 1000 - cms // 1000, -1) AS BIGINT) AS gap_s
      |FROM j WHERE side = 1""".stripMargin

  /** Forward as-of (next click at-or-after each purchase): FIRST_VALUE
    * over the FOLLOWING frame; purchases sort before equal-time clicks
    * (side 0 < 1) so at-or-after is inclusive. Shared by the union+window
    * query and the forward custom-merge query. */
  private[graft] val asofForwardOracle: String =
    """WITH u AS (
      |  SELECT event_id, user_id, epoch_ms(ts) AS ms,
      |    CASE WHEN event_type = 'click' THEN event_id END AS c_id,
      |    CASE WHEN event_type = 'click' THEN epoch_ms(ts) END AS c_ms,
      |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS side
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |j AS (
      |  SELECT *,
      |    FIRST_VALUE(c_id IGNORE NULLS) OVER w AS cid,
      |    FIRST_VALUE(c_ms IGNORE NULLS) OVER w AS cms
      |  FROM u
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ms, side, event_id
      |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT event_id, user_id, ms AS ts_ms,
      |  CAST(COALESCE(cid, -1) AS BIGINT) AS click_event_id,
      |  CAST(COALESCE(cms - ms, -1) AS BIGINT) AS lead_ms
      |FROM j WHERE side = 0""".stripMargin

  /** First-touch ordered funnel (view→click→purchase), shared by the batch
    * query and its single-batch-deterministic streaming twin. */
  private[graft] val funnelOracle: String =
    """WITH s1 AS (
      |  SELECT user_id, MIN(epoch_ms(ts)) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, MIN(epoch_ms(ts)) AS t2
      |  FROM events e JOIN s1 USING (user_id)
      |  WHERE event_type = 'click' AND epoch_ms(ts) >= s1.t1
      |  GROUP BY e.user_id),
      |s3 AS (
      |  SELECT e.user_id, MIN(epoch_ms(ts)) AS t3
      |  FROM events e JOIN s2 USING (user_id)
      |  WHERE event_type = 'purchase' AND epoch_ms(ts) >= s2.t2
      |  GROUP BY e.user_id)
      |SELECT s1.user_id, t1,
      |  COALESCE(t2, -1) AS t2, COALESCE(t3, -1) AS t3,
      |  CAST(1 + (t2 IS NOT NULL)::INT + (t3 IS NOT NULL)::INT AS BIGINT) AS stage
      |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
      |        LEFT JOIN s3 ON s1.user_id = s3.user_id""".stripMargin

  /** Unrolled 3-level BFS replay (same unrolling discipline as the
    * PageRank oracle). */
  private[graft] val bfsOracle: String = {
    val base =
      """WITH e0 AS (
        |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
        |    CAST(l_suppkey AS BIGINT) + 10000000 AS dst
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |d0 AS (SELECT DISTINCT CAST(c_custkey AS BIGINT) AS id, CAST(0 AS BIGINT) AS hops
        |       FROM customer WHERE c_custkey < 5)""".stripMargin
    val levels = (1 to 3).map { h =>
      s"""d$h AS (
         |  SELECT id, CAST(MIN(hops) AS BIGINT) AS hops FROM (
         |    SELECT id, hops FROM d${h - 1}
         |    UNION ALL
         |    SELECT e.dst AS id, ${h} AS hops
         |    FROM d${h - 1} f JOIN e ON e.src = f.id WHERE f.hops = ${h - 1})
         |  GROUP BY id)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$levels\nSELECT id, hops FROM d3"
  }

  /** Unrolled fixed-iteration PageRank replay — the iteration count is a
    * compile-time constant, so the oracle is 5 mechanical CTE blocks.
    * `(1 - 0.85)` is spelled as the same IEEE subtraction Spark performs
    * (`lit(1.0 - damping)`) so both engines use the identical constant. */
  private[graft] val hitsOracle: String =
    s"""WITH e AS (
       |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
       |    CAST(l_suppkey AS BIGINT) + 10000000 AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
       |${graft.operators.Graph.hitsSql(4)}""".stripMargin

  private[graft] val labelPropOracle: String =
    s"""WITH pairs AS (
       |  SELECT CAST(a.l_partkey AS BIGINT) AS src,
       |    CAST(b.l_partkey AS BIGINT) AS dst
       |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
       |    AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING COUNT(DISTINCT a.l_orderkey) >= 2),
       |und AS (SELECT src, dst FROM pairs
       |  UNION SELECT dst, src FROM pairs),
       |${graft.operators.Graph.labelPropSql(4)}""".stripMargin

  /** Unrolled landmark-Brandes replay — mirrors
    * Graph.betweennessLandmarks(nLandmarks = 4, maxHops = 3, topK = 20)
    * on the purchase graph: forward BFS levels carry exact σ path
    * counts, backward levels accumulate the half-up micro dependency
    * term, both phases fully unrolled as MATERIALIZED CTEs. */
  private[graft] lazy val betweennessOracle: String = {
    val maxHops = 3
    val fwd = (1 to maxHops).map { i =>
      s"""c$i AS (SELECT f.lm, und.v AS v, f.sigma
         |  FROM f${i - 1} f JOIN und ON und.u = f.v),
         |f$i AS MATERIALIZED (SELECT lm, v,
         |    CAST($i AS BIGINT) AS d, CAST(SUM(sigma) AS BIGINT) AS sigma
         |  FROM c$i ANTI JOIN ds${i - 1} USING (lm, v) GROUP BY 1, 2),
         |ds$i AS MATERIALIZED (SELECT * FROM ds${i - 1}
         |  UNION ALL SELECT * FROM f$i)""".stripMargin
    }.mkString(",\n")
    val bwd = ((maxHops - 1) to 0 by -1).map { l =>
      s"""t$l AS (SELECT lm, v,
         |    ${graft.operators.Graph.betwTermSqlDuck} AS term
         |  FROM (SELECT f.lm, f.v, f.sigma AS sigma_v,
         |      sx.sigma_w, sx.delta_w
         |    FROM f$l f JOIN und ON und.u = f.v
         |    JOIN (SELECT s.lm, s.v AS w, s.sigma AS sigma_w,
         |        b.delta_micro AS delta_w
         |      FROM f${l + 1} s JOIN b${l + 1} b
         |        ON b.lm = s.lm AND b.v = s.v) sx
         |      ON sx.lm = f.lm AND sx.w = und.v)),
         |b$l AS MATERIALIZED (SELECT f.lm, f.v,
         |    CAST(COALESCE(SUM(t.term), 0) AS BIGINT) AS delta_micro
         |  FROM f$l f LEFT JOIN t$l t ON t.lm = f.lm AND t.v = f.v
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val allB = (0 to maxHops)
      .map(l => s"SELECT lm, v, delta_micro FROM b$l")
      .mkString("\n  UNION ALL ")
    s"""WITH e0 AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
       |    CAST(l_suppkey AS BIGINT) + 10000000 AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |und AS MATERIALIZED (SELECT src AS u, dst AS v FROM e0
       |  UNION SELECT dst, src FROM e0),
       |lms AS (SELECT u FROM (SELECT DISTINCT u FROM und)
       |  ORDER BY u LIMIT 4),
       |f0 AS (SELECT u AS lm, u AS v, CAST(0 AS BIGINT) AS d,
       |    CAST(1 AS BIGINT) AS sigma FROM lms),
       |ds0 AS (SELECT * FROM f0),
       |$fwd,
       |b$maxHops AS (SELECT lm, v, CAST(0 AS BIGINT) AS delta_micro
       |  FROM f$maxHops),
       |$bwd,
       |ab AS ($allB)
       |SELECT v, btw_micro, n_landmarks,
       |  round(CAST(btw_micro AS DOUBLE) / 1e6, 6) AS betweenness
       |FROM (SELECT v, CAST(SUM(delta_micro) AS BIGINT) AS btw_micro,
       |    CAST(COUNT(*) AS BIGINT) AS n_landmarks
       |  FROM ab WHERE v <> lm GROUP BY 1)
       |ORDER BY btw_micro DESC, v LIMIT 20""".stripMargin
  }

  /** Unrolled Katz replay — mirrors Graph.katzCentrality(iters = 4,
    * alpha = 0.05) on the purchase graph: per round, one incoming
    * micro-sum and the shared IEEE step expression. */
  /** Unrolled 5-round BPE-training replay — mirrors
    * TextAnalysis.bpeTrain: per round, adjacent-pair counts over the
    * wrapped-symbol segmentations, the (freq desc, l, r) argmax, and
    * the greedy left-to-right merge as a literal replace() (identical
    * non-overlapping scan semantics in both engines). Every round's
    * CTE is MATERIALIZED — the k^rounds inlining lesson. */
  private[graft] lazy val bpeTrainOracle: String = {
    val out = (1 to 5).map { i =>
      s"SELECT CAST($i AS BIGINT) AS step, l AS l_sym, r AS r_sym, " +
        s"l || r AS merged, freq FROM m$i"
    }.mkString("\nUNION ALL ")
    s"WITH $bpeCtes\n$out"
  }

  /** Token histogram after the 5 trained merges — the apply half of
    * the tokenizer story, over the same unrolled CTE chain. */
  private[graft] lazy val bpeApplyOracle: String =
    s"""WITH $bpeCtes,
       |tok AS (SELECT token, CAST(SUM(wf) AS BIGINT) AS freq FROM
       |    (SELECT wf, unnest(string_split(trim(seg, '_'), '__'))
       |      AS token FROM g5)
       |  GROUP BY 1)
       |SELECT token, freq,
       |  CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS BIGINT)
       |    AS rank
       |FROM tok ORDER BY freq DESC, token LIMIT 30""".stripMargin

  /** The vocab filter mirrors the ENFORCED tokenizer-corpus contract
    * (TextAnalysis.bpeHostileTokenRe): tokens carrying the wrap
    * sentinel `_`, a quote, or a backslash are dropped before
    * training. Each g_i LEFT JOINs its (≤1-row) merge so an exhausted
    * round passes the segmentation through unchanged instead of
    * cascading to an empty corpus (the round-12 ADVICE latent
    * divergence on small corpora — Spark keeps the final seg table on
    * exhaustion; the inner-join replay used to drop it). */
  private[graft] lazy val bpeCtes: String = bpeCtesFor("TRUE", "")

  /** The sequential-BPE CTE chain over `documents` rows matching
    * `pred`, with every CTE name prefixed `px` — so the held-out
    * oracle can train on one corpus half under one namespace while
    * tokenizing the other. */
  private[graft] def bpeCtesFor(pred: String, px: String): String = {
    val base =
      s"""${px}vocab AS MATERIALIZED (
         |  SELECT w, CAST(COUNT(*) AS BIGINT) AS wf FROM
         |    (SELECT unnest(string_split(text, ' ')) AS w FROM documents
         |     WHERE $pred)
         |  GROUP BY w
         |  HAVING length(w) >= 2 AND NOT regexp_matches(w, '[_''\\\\]')),
         |${px}g0 AS MATERIALIZED (SELECT w, wf,
         |  regexp_replace(w, '(.)', '_\\1_', 'g') AS seg FROM ${px}vocab)""".stripMargin
    val rounds = (1 to 5).map { i =>
      s"""${px}p$i AS MATERIALIZED (SELECT l, r, CAST(SUM(wf) AS BIGINT) AS freq
         |  FROM (SELECT wf, pr.l AS l, pr.r AS r FROM
         |    (SELECT wf, string_split(trim(seg, '_'), '__') AS syms
         |      FROM ${px}g${i - 1}),
         |    LATERAL (SELECT unnest([struct_pack(l := syms[j],
         |        r := syms[j + 1]) FOR j IN range(1, len(syms))]) AS pr))
         |  GROUP BY 1, 2),
         |${px}m$i AS MATERIALIZED (SELECT l, r, freq FROM ${px}p$i
         |  ORDER BY freq DESC, l, r LIMIT 1),
         |${px}g$i AS MATERIALIZED (SELECT w, wf,
         |  COALESCE(replace(seg, '_' || l || '__' || r || '_',
         |    '_' || l || r || '_'), seg) AS seg
         |  FROM ${px}g${i - 1} LEFT JOIN ${px}m$i ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$rounds"
  }

  /** Held-out BPE application: train the 5-round merge chain on EVEN
    * doc_ids (namespace `t`), tokenize the ODD-doc_id vocabulary with
    * the frozen merges applied in training order (the same
    * LEFT-JOIN-passthrough shape handles early exhaustion), histogram
    * top-30. */
  private[graft] lazy val bpeHeldOutOracle: String = {
    val trainCtes = bpeCtesFor("doc_id % 2 = 0", "t")
    val heldBase =
      """hvocab AS MATERIALIZED (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS wf FROM
        |    (SELECT unnest(string_split(text, ' ')) AS w FROM documents
        |     WHERE doc_id % 2 = 1)
        |  GROUP BY w
        |  HAVING length(w) >= 2 AND NOT regexp_matches(w, '[_''\\]')),
        |hg0 AS MATERIALIZED (SELECT w, wf,
        |  regexp_replace(w, '(.)', '_\1_', 'g') AS seg FROM hvocab)""".stripMargin
    val applyRounds = (1 to 5).map { i =>
      s"""hg$i AS MATERIALIZED (SELECT w, wf,
         |  COALESCE(replace(seg, '_' || l || '__' || r || '_',
         |    '_' || l || r || '_'), seg) AS seg
         |  FROM hg${i - 1} LEFT JOIN tm$i ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"""WITH $trainCtes,
       |$heldBase,
       |$applyRounds,
       |htok AS (SELECT token, CAST(SUM(wf) AS BIGINT) AS freq FROM
       |    (SELECT wf, unnest(string_split(trim(seg, '_'), '__'))
       |      AS token FROM hg5)
       |  GROUP BY 1)
       |SELECT token, freq,
       |  CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS BIGINT)
       |    AS rank
       |FROM htok ORDER BY freq DESC, token LIMIT 30""".stripMargin
  }

  /** Unrolled batched-BPE replay (rounds=3, batchTopN=4) — mirrors
    * TextAnalysis.bpeTrainBatched: per round, pair counts, the top-4
    * candidate ranking (freq desc, l, r), the CHAINED greedy disjoint
    * selection (walk candidates rank-first, keep a pair iff its symbol
    * triple {l, r, l||r} is disjoint from every SELECTED pair's triple
    * — replayed as a recursive CTE carrying the used-symbol list),
    * then the batch applied slot-by-slot: four passthrough-replace
    * CTEs per round, each LEFT JOINing its (≤1-row) rank slot so an
    * empty slot is the identity (the same LEFT-JOIN-passthrough shape
    * as the sequential bpeCtes exhaustion fix). */
  private[graft] lazy val bpeTrainBatchedOracle: String = {
    val rounds = 3
    val n = 4
    val base =
      """bvocab AS MATERIALIZED (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS wf FROM
        |    (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w
        |  HAVING length(w) >= 2 AND NOT regexp_matches(w, '[_''\\]')),
        |bh0 AS MATERIALIZED (SELECT w, wf,
        |  regexp_replace(w, '(.)', '_\1_', 'g') AS seg FROM bvocab)""".stripMargin
    val roundCtes = (1 to rounds).map { i =>
      val slots = (1 to n).map { j =>
        val src = if (j == 1) s"bh${i - 1}" else s"bh${i}s${j - 1}"
        val out = if (j == n) s"bh$i" else s"bh${i}s$j"
        s"""$out AS MATERIALIZED (SELECT w, wf,
           |  COALESCE(replace(seg, '_' || m.l || '__' || m.r || '_',
           |    '_' || m.l || m.r || '_'), seg) AS seg
           |  FROM $src LEFT JOIN
           |    (SELECT l, r FROM bs$i WHERE k = $j) m ON TRUE)""".stripMargin
      }.mkString(",\n")
      s"""bp$i AS MATERIALIZED (SELECT l, r, CAST(SUM(wf) AS BIGINT) AS freq
         |  FROM (SELECT wf, pr.l AS l, pr.r AS r FROM
         |    (SELECT wf, string_split(trim(seg, '_'), '__') AS syms
         |      FROM bh${i - 1}),
         |    LATERAL (SELECT unnest([struct_pack(l := syms[j],
         |        r := syms[j + 1]) FOR j IN range(1, len(syms))]) AS pr))
         |  GROUP BY 1, 2),
         |bc$i AS MATERIALIZED (SELECT l, r, freq,
         |  CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, l, r) AS BIGINT)
         |    AS rn
         |  FROM bp$i ORDER BY freq DESC, l, r LIMIT $n),
         |bs$i AS MATERIALIZED (
         |  WITH RECURSIVE walk AS (
         |    SELECT rn, l, r, freq, TRUE AS picked,
         |      [l, r, l || r] AS used
         |    FROM bc$i WHERE rn = 1
         |    UNION ALL
         |    SELECT c.rn, c.l, c.r, c.freq,
         |      NOT (list_contains(w.used, c.l) OR
         |        list_contains(w.used, c.r) OR
         |        list_contains(w.used, c.l || c.r)) AS picked,
         |      CASE WHEN NOT (list_contains(w.used, c.l) OR
         |          list_contains(w.used, c.r) OR
         |          list_contains(w.used, c.l || c.r))
         |        THEN list_concat(w.used, [c.l, c.r, c.l || c.r])
         |        ELSE w.used END AS used
         |    FROM walk w JOIN bc$i c ON c.rn = w.rn + 1)
         |  SELECT l, r, freq,
         |    CAST(ROW_NUMBER() OVER (ORDER BY rn) AS BIGINT) AS k
         |  FROM walk WHERE picked),
         |$slots""".stripMargin
    }.mkString(",\n")
    val union = (1 to rounds).map(i =>
      s"SELECT CAST($i AS BIGINT) AS round, l, r, freq, k FROM bs$i")
      .mkString("\nUNION ALL ")
    s"""WITH $base,
       |$roundCtes
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY round, k) AS BIGINT)
       |    AS step,
       |  round, l AS l_sym, r AS r_sym, l || r AS merged, freq
       |FROM ($union)""".stripMargin
  }

  /** Id-ordered triangle enumeration over the co-purchase graph —
    * shared by the uncapped query and the maxDeg-valve variant (the
    * valve is a no-op while every degree is below the cap). */
  private[graft] lazy val triangleCountOracle: String =
    """WITH e AS (
      |  SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS u,
      |                  CAST(b.l_partkey AS BIGINT) AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |t AS (
      |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |  FROM e e1
      |  JOIN e e2 ON e2.u = e1.v
      |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
      |x AS (
      |  SELECT a AS id FROM t
      |  UNION ALL SELECT b FROM t
      |  UNION ALL SELECT c FROM t)
      |SELECT id, count(*) AS n_tri FROM x GROUP BY id
      |ORDER BY n_tri DESC, id LIMIT 20""".stripMargin

  private[graft] lazy val localClusteringOracle: String =
    s"""WITH e AS (
       |  SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS u,
       |                  CAST(b.l_partkey AS BIGINT) AS v
       |  FROM lineitem a JOIN lineitem b
       |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |  WHERE a.l_partkey % 2 = 0 AND b.l_partkey % 2 = 0),
       |d AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
       |    SELECT u AS id FROM e UNION ALL SELECT v FROM e)
       |  GROUP BY 1),
       |t AS (
       |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
       |  FROM e e1
       |  JOIN e e2 ON e2.u = e1.v
       |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
       |x AS (
       |  SELECT a AS id FROM t
       |  UNION ALL SELECT b FROM t
       |  UNION ALL SELECT c FROM t),
       |tc AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_tri
       |  FROM x GROUP BY id),
       |m AS (SELECT d.id, d.deg,
       |    CAST(COALESCE(tc.n_tri, 0) AS BIGINT) AS n_tri
       |  FROM d LEFT JOIN tc USING (id) WHERE d.deg > 1)
       |SELECT id, deg, n_tri,
       |  ${graft.operators.Graph.localCcSql} AS cc
       |FROM m
       |ORDER BY cc DESC, n_tri DESC, id LIMIT 20""".stripMargin

  private[graft] lazy val katzOracle: String = {
    val base =
      """WITH e AS (
        |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
        |    CAST(l_suppkey AS BIGINT) + 10000000 AS dst
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |x0 AS (SELECT id, CAST(1000000 AS BIGINT) AS xm FROM v)""".stripMargin
    val iterCtes = (1 to 4).map { i =>
      s"""s$i AS MATERIALIZED (SELECT e.dst AS id,
         |    CAST(SUM(p.xm) AS DECIMAL(38,0)) AS s
         |  FROM e JOIN x${i - 1} p ON p.id = e.src GROUP BY 1),
         |x$i AS MATERIALIZED (SELECT v.id,
         |    CAST(${graft.operators.Graph.katzStepSql(0.05)} AS BIGINT)
         |      AS xm
         |  FROM v LEFT JOIN s$i ON s$i.id = v.id)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$iterCtes\n" +
      "SELECT id, round(CAST(xm AS DOUBLE) / 1e6, 6) AS katz FROM x4"
  }

  /** Unrolled greedy max-coverage replay — mirrors
    * Sampling.greedyMaxCover(k = 5, n = 3): per step, an anti-join
    * against the covered set, an exact-count argmax with the
    * (gain desc, doc_id) tie-break, and a UNION-dedup'ed covered
    * update; covered_total is the prefix sum of the disjoint gains. */
  private[graft] lazy val maxCoverOracle: String = {
    val steps = (2 to 5).map { i =>
      s"""g$i AS MATERIALIZED (SELECT doc_id,
         |    CAST(COUNT(*) AS BIGINT) AS gain
         |  FROM ex ANTI JOIN c${i - 1} USING (g) GROUP BY 1),
         |p$i AS MATERIALIZED (SELECT doc_id, gain FROM (SELECT *,
         |    row_number() OVER (ORDER BY gain DESC, doc_id) AS rn
         |  FROM g$i) WHERE rn = 1),
         |c$i AS MATERIALIZED (SELECT g FROM c${i - 1}
         |  UNION SELECT ex.g FROM ex JOIN p$i USING (doc_id))""".stripMargin
    }.mkString(",\n")
    s"""WITH $shingleCte,
       |ex AS MATERIALIZED (SELECT doc_id, unnest(sh.sh) AS g FROM sh),
       |g1 AS MATERIALIZED (SELECT doc_id,
       |    CAST(COUNT(*) AS BIGINT) AS gain FROM ex GROUP BY 1),
       |p1 AS MATERIALIZED (SELECT doc_id, gain FROM (SELECT *,
       |    row_number() OVER (ORDER BY gain DESC, doc_id) AS rn
       |  FROM g1) WHERE rn = 1),
       |c1 AS MATERIALIZED (SELECT DISTINCT ex.g FROM ex
       |  JOIN p1 USING (doc_id)),
       |$steps,
       |sel AS (${(1 to 5).map(i =>
          s"SELECT CAST($i AS BIGINT) AS step, doc_id, gain FROM p$i")
          .mkString("\n  UNION ALL ")})
       |SELECT step, doc_id, gain,
       |  CAST(SUM(gain) OVER (ORDER BY step) AS BIGINT) AS covered_total
       |FROM sel""".stripMargin
  }

  private[graft] val pagerankOracle: String = {
    val base =
      """WITH e AS (
        |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
        |    CAST(l_suppkey AS BIGINT) + 10000000 AS dst
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
        |od AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS odeg FROM e GROUP BY src),
        |p0 AS (SELECT id, 1.0/n.n AS pr FROM v CROSS JOIN n)""".stripMargin
    val iterCtes = (1 to 5).map { i =>
      s"""p$i AS (
         |  SELECT v.id,
         |    (1 - 0.85)/n.n + 0.85*COALESCE(SUM(p.pr/od.odeg), 0) AS pr
         |  FROM v CROSS JOIN n
         |  LEFT JOIN e ON e.dst = v.id
         |  LEFT JOIN p${i - 1} p ON p.id = e.src
         |  LEFT JOIN od ON od.src = e.src
         |  GROUP BY v.id, n.n)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$iterCtes\nSELECT id, round(pr, 8) AS pagerank FROM p5"
  }

  /** Unrolled personalized-PageRank replay — mirrors
    * Graph.personalizedPageRank (exact micro-long mass, truncating
    * per-edge division, decimal incoming sums, shared pprStepSql);
    * every round MATERIALIZED (the k^rounds inlining lesson). */
  private[graft] lazy val pprOracle: String = {
    val base =
      """WITH d AS (
        |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
        |    CAST(l_suppkey AS BIGINT) + 10000000 AS dst
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |e AS MATERIALIZED (
        |  SELECT src, dst FROM d UNION SELECT dst, src FROM d),
        |v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |sd AS (SELECT DISTINCT id FROM v WHERE id <= 40),
        |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM sd),
        |b AS MATERIALIZED (SELECT v.id,
        |    CASE WHEN sd.id IS NOT NULL THEN 1000000 // ns.ns
        |      ELSE CAST(0 AS BIGINT) END AS r0,
        |    CASE WHEN sd.id IS NOT NULL THEN CAST(round(
        |        CAST(1 - CAST(0.85 AS DOUBLE) AS DOUBLE) *
        |        (1000000 // ns.ns), 0) AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS base
        |  FROM v CROSS JOIN ns LEFT JOIN sd ON sd.id = v.id),
        |od AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS odeg
        |  FROM e GROUP BY 1),
        |x0 AS MATERIALIZED (SELECT id, r0 AS xm FROM b)""".stripMargin
    s"$base,\n${pprIterCtes(4, 0.85)}\n" +
      "SELECT id, round(CAST(xm AS DOUBLE) / 1e6, 6) AS ppr FROM x4"
  }

  /** The shared unrolled-PPR round CTEs over (e, od, b, x0) — used by
    * the q_ppr and q_textrank replays. */
  private[graft] def pprIterCtes(rounds: Int, alpha: Double): String =
    (1 to rounds).map { i =>
      s"""s$i AS MATERIALIZED (SELECT e.dst AS id,
         |    CAST(SUM(p.xm // od.odeg) AS DECIMAL(38,0)) AS s
         |  FROM e JOIN x${i - 1} p ON p.id = e.src
         |  JOIN od ON od.src = e.src GROUP BY 1),
         |x$i AS MATERIALIZED (SELECT b.id,
         |    CAST(${graft.operators.Graph.pprStepSql(alpha)} AS BIGINT)
         |      AS xm
         |  FROM b LEFT JOIN s$i ON s$i.id = b.id)""".stripMargin
    }.mkString(",\n")

  /** TextRank replay: the word co-occurrence graph + the same unrolled
    * PPR rounds with EVERY vertex in the restart set (uniform restart
    * = plain PageRank). */
  private[graft] lazy val textrankOracle: String = {
    val base =
      """WITH tl AS (SELECT doc_id, string_split(text, ' ') AS tl
        |  FROM documents),
        |nb AS (SELECT doc_id, w, w2 FROM (SELECT doc_id,
        |    tl[i] AS w, tl[i + 1] AS w2
        |  FROM tl, LATERAL (SELECT unnest(range(1, len(tl))) AS i))
        |  WHERE w != w2),
        |e AS MATERIALIZED (SELECT w AS src, w2 AS dst FROM nb
        |  UNION SELECT w2, w FROM nb),
        |v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM v),
        |b AS MATERIALIZED (SELECT v.id, 1000000 // ns.ns AS r0,
        |    CAST(round(CAST(1 - CAST(0.85 AS DOUBLE) AS DOUBLE) *
        |      (1000000 // ns.ns), 0) AS BIGINT) AS base
        |  FROM v CROSS JOIN ns),
        |od AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS odeg
        |  FROM e GROUP BY 1),
        |x0 AS MATERIALIZED (SELECT id, r0 AS xm FROM b)""".stripMargin
    s"$base,\n${pprIterCtes(4, 0.85)}\n" +
      """SELECT id AS word, round(CAST(xm AS DOUBLE) / 1e6, 6) AS score
        |FROM x4 ORDER BY score DESC, word LIMIT 20""".stripMargin
  }

  /** Cross-corpus overlap oracle — mirrors Dedup.corpusOverlap: distinct
    * (source, shingle) pairs (optionally universe-sampled by the portable
    * 60-bit md5 hash), pairwise intersection via self-join, containment and
    * Jaccard from the per-corpus vocabulary sizes. */
  private[graft] def corpusOverlapOracle(sampleMod: Int): String = {
    val sample =
      if (sampleMod == 1) ""
      else s" WHERE CAST('0x'||substr(md5(sh),1,15) AS BIGINT) % $sampleMod = 0"
    s"""WITH toks AS (SELECT source, string_split(text,' ') AS tl FROM documents),
       |ds AS (SELECT source, unnest(list_distinct(
       |    [tl[i]||'_'||tl[i+1]||'_'||tl[i+2] FOR i IN range(1, len(tl)-1)])) AS sh
       |  FROM toks),
       |cs AS (SELECT DISTINCT source, sh FROM ds$sample),
       |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS vocab FROM cs GROUP BY 1),
       |pairs AS (SELECT a.source AS corpus_a, b.source AS corpus_b,
       |    CAST(count(*) AS BIGINT) AS inter
       |  FROM cs a JOIN cs b ON a.sh = b.sh AND a.source < b.source GROUP BY 1, 2)
       |SELECT corpus_a, corpus_b, inter, sa.vocab AS vocab_a, sb.vocab AS vocab_b,
       |  round(inter*1.0/sa.vocab, 6) AS containment_a,
       |  round(inter*1.0/sb.vocab, 6) AS containment_b,
       |  round(inter*1.0/(sa.vocab + sb.vocab - inter), 6) AS jaccard
       |FROM pairs JOIN sizes sa ON sa.source = corpus_a
       |JOIN sizes sb ON sb.source = corpus_b""".stripMargin
  }

  private[graft] val shingleCte: String =
    """toks AS (SELECT doc_id, string_split(text,' ') AS tl FROM documents),
      |sh AS (SELECT doc_id,
      |  list_distinct([tl[i]||'_'||tl[i+1]||'_'||tl[i+2] FOR i IN range(1, len(tl)-1)]) AS sh
      |FROM toks)""".stripMargin

  /** 32-bit SimHash over whitespace tokens `tl` (60-bit md5-hex token hash,
    * per-bit sign sums, packed) — mirrors TextFunctions.simhash32. */
  private[graft] val simhashSqlExpr: String =
    """CAST(list_sum([
      |  CASE WHEN list_sum(list_transform(
      |         list_transform(tl, t -> CAST('0x'||substr(md5(t),1,15) AS BIGINT)),
      |         h -> CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
      |       THEN (CAST(1 AS BIGINT) << b) ELSE 0 END
      |  FOR b IN range(0,32)]) AS BIGINT)""".stripMargin

  /** SRP signature over an embedding list `e` — mirrors
    * Similarity.srpSigns/srpSignatureCol exactly: sign(p, d) = parity of the
    * 60-bit md5 prefix of "srp:p:d"; bit p set iff the signed sum (left-to-
    * right fold, matching DotProductFloat) is >= 0. */
  private[graft] def srpSigSqlExpr(planes: Int): String =
    (0 until planes).map { p =>
      s"""(CASE WHEN list_sum([CASE WHEN (CAST('0x'||substr(md5('srp:$p:'||(i-1)),1,15) AS BIGINT) % 2) = 0
         |  THEN CAST(e[i] AS DOUBLE) ELSE -CAST(e[i] AS DOUBLE) END
         |  FOR i IN range(1, len(e)+1)]) >= 0 THEN (CAST(1 AS BIGINT) << $p) ELSE CAST(0 AS BIGINT) END)""".stripMargin
    }.mkString("\n  + ")

  /** Gopher-style quality verdicts as a CTE ending in
    * `quality(doc_id, lang, n_tokens, avg_token_len, stopword_ratio,
    * symbol_ratio, verdict)` — mirrors TextAnalysis.qualityScore exactly
    * (rounded-ratio comparisons so thresholds are boundary-identical).
    * Shared by q_quality_score and the q_train_pipeline composition. */
  private[graft] val qualityCte: String =
    """t AS (SELECT doc_id, lang, string_split(text, ' ') AS tl, text FROM documents),
      |m AS (SELECT doc_id, lang,
      |  CAST(len(tl) AS BIGINT) AS n_tokens,
      |  round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(tl), 6) AS avg_token_len,
      |  round(CAST(len(list_filter(tl, t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
      |    / len(tl), 6) AS stopword_ratio,
      |  round(CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE)
      |    / greatest(length(text), 1), 6) AS symbol_ratio
      |FROM t),
      |quality AS (
      |  SELECT doc_id, lang, n_tokens, avg_token_len, stopword_ratio, symbol_ratio,
      |    CASE WHEN n_tokens < 10 THEN 'too_short'
      |         WHEN n_tokens > 100000 THEN 'too_long'
      |         WHEN avg_token_len < 2 OR avg_token_len > 12 THEN 'token_len'
      |         WHEN symbol_ratio > 0.1 THEN 'symbols'
      |         WHEN lang = 'en' AND stopword_ratio < 0.01 THEN 'stopwords'
      |         ELSE 'ok' END AS verdict
      |  FROM m)""".stripMargin

  /** Unrolled greedy k-center replay (k=6) — mirrors
    * Similarity.kCenterGreedy: start at min vec_id, then per round the
    * (dmin desc, vec_id) argmax among unselected points becomes the
    * next center and every point's running min round-6 cosine distance
    * refreshes against it. Every d-CTE is MATERIALIZED (referenced by
    * both the next argmax and the next refresh — the k^rounds inlining
    * lesson). */
  private[graft] lazy val kCenterOracle: String = {
    val k = 6
    val cos = cosineSqlExprAs("p", "c")
    val rounds = (2 to k).map { r =>
      s"""ks$r AS MATERIALIZED (SELECT vec_id AS cid, embedding, nrm
         |  FROM kd${r - 1} WHERE sel_rank IS NULL
         |  ORDER BY dmin DESC, vec_id LIMIT 1),
         |kd$r AS MATERIALIZED (SELECT p.vec_id, p.embedding, p.nrm,
         |  CASE WHEN p.sel_rank IS NOT NULL THEN p.dmin
         |    ELSE least(p.dmin, 1.0 - round($cos, 6)) END AS dmin,
         |  CASE WHEN p.vec_id = c.cid THEN $r ELSE p.sel_rank END
         |    AS sel_rank,
         |  CASE WHEN p.vec_id = c.cid THEN p.dmin ELSE p.d_at_sel END
         |    AS d_at_sel
         |  FROM kd${r - 1} p, ks$r c)""".stripMargin
    }.mkString(",\n")
    s"""WITH $normCte,
       |ks1 AS MATERIALIZED (SELECT vec_id AS cid, embedding, nrm
       |  FROM n ORDER BY vec_id LIMIT 1),
       |kd1 AS MATERIALIZED (SELECT p.vec_id, p.embedding, p.nrm,
       |  1.0 - round($cos, 6) AS dmin,
       |  CASE WHEN p.vec_id = c.cid THEN 1 END AS sel_rank,
       |  CAST(NULL AS DOUBLE) AS d_at_sel
       |  FROM n p, ks1 c),
       |$rounds
       |SELECT CAST(sel_rank AS BIGINT) AS rank, vec_id,
       |  round(d_at_sel, 6) AS dist
       |FROM kd$k WHERE sel_rank IS NOT NULL""".stripMargin
  }

  /** Unrolled PAA-8 DTW replay — mirrors TimeSeries.dtwPaaDistances on
    * the per-nation monthly-quantity series: micro-quantized PAA means
    * (paaMicroSql verbatim), |Δ| BIGINT cell costs over nation pairs,
    * and the 15 anti-diagonal DP rounds as MATERIALIZED CTEs (each
    * cell = cost + least(up, left, diag); both engines' least ignores
    * the NULLs that encode grid edges). */
  private[graft] lazy val dtwOracle: String = {
    val m = 8
    val diags = (1 to 2 * m - 2).map { d =>
      val dg = if (d >= 2)
        s"""
           |  LEFT JOIN w${d - 2} g ON g.ka = c.ka AND g.kb = c.kb
           |    AND g.i = c.i - 1 AND g.j = c.j - 1""".stripMargin
      else ""
      val dgAcc = if (d >= 2) ", g.acc" else ""
      s"""w$d AS MATERIALIZED (SELECT c.ka, c.kb, c.i, c.j,
         |    c.cost + least(u.acc, l.acc$dgAcc) AS acc
         |  FROM (SELECT * FROM dcost WHERE i + j = $d) c
         |  LEFT JOIN w${d - 1} u ON u.ka = c.ka AND u.kb = c.kb
         |    AND u.i = c.i - 1 AND u.j = c.j
         |  LEFT JOIN w${d - 1} l ON l.ka = c.ka AND l.kb = c.kb
         |    AND l.i = c.i AND l.j = c.j - 1$dg)""".stripMargin
    }.mkString(",\n")
    s"""WITH series AS (SELECT CAST(s_nationkey AS BIGINT) AS nation,
       |    CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT) AS m,
       |    CAST(SUM(l_quantity) AS BIGINT) AS qty
       |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |  GROUP BY 1, 2),
       |rows_ AS (SELECT nation, qty,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY nation ORDER BY m)
       |      AS BIGINT) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY nation) AS BIGINT) AS nn
       |  FROM series),
       |segd AS (SELECT nation, qty AS __y, ((rn - 1) * $m) // nn AS seg
       |  FROM rows_ WHERE nn >= $m),
       |paa0 AS (SELECT nation, seg, CAST(SUM(__y) AS BIGINT) AS __ps,
       |    CAST(COUNT(*) AS BIGINT) AS __pc FROM segd GROUP BY 1, 2),
       |paa AS MATERIALIZED (SELECT nation, seg,
       |    ${graft.operators.TimeSeries.paaMicroSql} AS pm FROM paa0),
       |dcost AS MATERIALIZED (SELECT a.nation AS ka, b.nation AS kb,
       |    a.seg AS i, b.seg AS j, abs(a.pm - b.pm) AS cost
       |  FROM paa a JOIN paa b ON a.nation < b.nation),
       |w0 AS MATERIALIZED (SELECT ka, kb, i, j, cost AS acc
       |  FROM dcost WHERE i + j = 0),
       |$diags
       |SELECT ka, kb, acc AS dtw_micro, round(acc / 1e6, 6) AS dtw,
       |  round(acc / 1e6 / ${2 * m}, 6) AS dtw_norm
       |FROM w${2 * m - 2} WHERE i = ${m - 1} AND j = ${m - 1}
       |ORDER BY dtw_micro, ka, kb LIMIT 20""".stripMargin
  }

  /** Embeddings with precomputed L2 norms (double math). */
  private[graft] val normCte: String =
    """n AS (SELECT vec_id, embedding,
      |  sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
      |FROM embeddings)""".stripMargin

  /** Cosine between `qa`.embedding and `ca`.embedding using the norms above —
    * mirrors Similarity.cosine's dot/(sqrt*sqrt) shape and fold order. */
  private[graft] def cosineSqlExprAs(qa: String, ca: String): String =
    s"""list_sum([CAST($qa.embedding[i] AS DOUBLE)*CAST($ca.embedding[i] AS DOUBLE)
       |  FOR i IN range(1, len($qa.embedding)+1)]) / ($qa.nrm * $ca.nrm)""".stripMargin

  private[graft] val cosineSqlExpr: String = cosineSqlExprAs("q", "c")

  /** FULL-rule sessionize (gap + size + duration cuts) as a RECURSIVE CTE:
    * the per-key state machine ([[graft.operators.SessionEngine.advance]])
    * advances one event per recursion step — iteration i joins the working
    * table (each key's state after event i) with each key's event i+1 and
    * applies the cut rules; the three cuts OR together because they share
    * the fresh-session outcome. Gotcha pinned here: the cut flag must live
    * in a DERIVED TABLE — as a lateral alias in the recursive SELECT,
    * an unqualified `cut` resolves to the PREVIOUS iteration's column of
    * the same name (r.cut), silently lagging every cut by one event. */
  private[graft] val fullSessionizeSql: String =
    """WITH RECURSIVE
      |e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms, epoch_ms(ts) // 1000 AS sec,
      |        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS rn
      |      FROM events),
      |r AS (
      |  SELECT user_id, rn, event_id, ms,
      |    CAST(user_id AS VARCHAR)||'-'||CAST(ms AS VARCHAR) AS session_id,
      |    CAST(1 AS BIGINT) AS session_idx,
      |    sec AS first_sec, sec AS last_sec, 1 AS cnt,
      |    CAST(0 AS BIGINT) AS duration
      |  FROM e WHERE rn = 1
      |  UNION ALL
      |  SELECT user_id, rn, event_id, ms,
      |    CASE WHEN cut THEN CAST(user_id AS VARCHAR)||'-'||CAST(ms AS VARCHAR)
      |         ELSE prev_id END AS session_id,
      |    CASE WHEN cut THEN prev_idx + 1 ELSE prev_idx END AS session_idx,
      |    CASE WHEN cut THEN sec ELSE prev_first END AS first_sec,
      |    CASE WHEN cut THEN sec ELSE greatest(prev_last, sec) END AS last_sec,
      |    CASE WHEN cut THEN 1 ELSE prev_cnt + 1 END AS cnt,
      |    CASE WHEN cut THEN CAST(0 AS BIGINT)
      |         ELSE CAST(greatest(0, sec - prev_first) AS BIGINT) END AS duration
      |  FROM (
      |    SELECT e.user_id, e.rn, e.event_id, e.ms, e.sec,
      |      (e.sec - r.last_sec > 1800 OR r.cnt + 1 >= 1500 OR e.sec - r.first_sec > 43200) AS cut,
      |      r.session_id AS prev_id, r.session_idx AS prev_idx, r.first_sec AS prev_first,
      |      r.last_sec AS prev_last, r.cnt AS prev_cnt
      |    FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1)
      |)
      |SELECT event_id, user_id, ms AS ts_ms, session_id,
      |  CAST(session_idx AS BIGINT) AS session_idx, duration
      |FROM r""".stripMargin

  /** Gap-only sessionize as ANSI window SQL (DuckDB dialect-safe): identical
    * semantics to [[Sessionize.gapSessionize]] — integer-millis arithmetic,
    * floor-to-seconds duration, (ts, event_id) total order. */
  private[graft] val gapSessionizeSql: String =
    """SELECT event_id, user_id, ms AS ts_ms,
      |  CAST(user_id AS VARCHAR) || '-' || CAST(first_ms AS VARCHAR) AS session_id,
      |  CAST(session_idx AS BIGINT) AS session_idx,
      |  CAST(ms // 1000 - first_ms // 1000 AS BIGINT) AS duration
      |FROM (
      |  SELECT *, MIN(ms) OVER (PARTITION BY user_id, session_idx) AS first_ms
      |  FROM (
      |    SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |                                ROWS UNBOUNDED PRECEDING) AS session_idx
      |    FROM (
      |      SELECT event_id, user_id, epoch_ms(ts) AS ms,
      |        CASE WHEN lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) IS NULL
      |                  OR epoch_ms(ts) // 1000 - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) // 1000 > 1800
      |             THEN 1 ELSE 0 END AS is_new
      |      FROM events
      |    )
      |  )
      |)""".stripMargin
}
