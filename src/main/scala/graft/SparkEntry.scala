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
  private def normalizeTs(df: DataFrame): DataFrame =
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
  private def coPurchasePairs(li: DataFrame): DataFrame =
    li.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("__ps"))
      .select(col("__ps"), posexplode(col("__ps")).as(Seq("__i", "src")))
      .select(col("src").cast("long").as("src"),
        explode(expr("slice(__ps, __i + 2, size(__ps))")).as("__d"))
      .select(col("src"), col("__d").cast("long").as("dst"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_sessionize_gap")(spark, "/root/testdata/sf0.001")

  /** 13-token license disclaimer spliced onto every 3rd doc — and TWICE
    * onto every 6th — the deterministic cross-doc-repeat fixture shared by
    * the q_repeated_spans* queries. SQL twin: [[disclaimerCte]]. */
  private val RepeatedDisclaimer =
    "this article is licensed under the creative commons attribution share alike license terms"

  private def spliceDisclaimer(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat_ws(" ",
        col("text"),
        when(col("doc_id") % 3 === 0, lit(RepeatedDisclaimer)),
        when(col("doc_id") % 6 === 0, lit(RepeatedDisclaimer))).as("text"))

  /** The events table as a file-source stream (ts normalized to
    * TimestampType), for the Structured-Streaming queries. */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
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
  private def withStreamingConfs[A](s: SparkSession)(body: => A): A =
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
  private def streamTempRoot(prefix: String): java.nio.file.Path =
    sys.props.get("graft.stream.tmp")
      .map(java.nio.file.Paths.get(_))
      .filter(p => java.nio.file.Files.isDirectory(p)) match {
      case Some(base) => java.nio.file.Files.createTempDirectory(base, prefix)
      case None => java.nio.file.Files.createTempDirectory(prefix)
    }

  /** Drive a streaming DataFrame to completion into a memory sink; return
    * the drained result table. Conf scoping: [[withStreamingConfs]]. */
  private def runToMemory(s: SparkSession, df: DataFrame, mode: String): DataFrame = {
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
  private def runToFiles(s: SparkSession, df: DataFrame): DataFrame = {
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
  private def runMergeSink(s: SparkSession, df: DataFrame, keyCols: Seq[String]): DataFrame = {
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

  private def deleteRecursively(f: java.io.File): Unit =
    graft.streaming.MergeSink.deleteRecursively(f)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Reference parity: sessionization + downstream OLAP (SURVEY §2.5, §2.7)
    "q_sessionize_gap" -> ((s, dir) => {
      Sessionize
        .gapSessionize(table(s, dir, "events"))
        .select(
          col("event_id"),
          col("user_id"),
          unix_millis(col("ts")).as("ts_ms"),
          col("session_id"),
          col("session_idx"),
          col("duration"))
    }),
    "q_sessionize_full" -> ((s, dir) => {
      // Full reference rule set (gap + 1499-event + 12 h cuts); the
      // sequential per-key machine is replayed by the recursive-CTE oracle
      // (fullSessionizeSql) — one state advance per recursion step.
      Sessionize
        .fullSessionize(table(s, dir, "events"))
        .select(
          col("tieBreak").as("event_id"),
          col("key").cast("long").as("user_id"),
          col("tsMillis").as("ts_ms"),
          col("sessionId").as("session_id"),
          col("sessionIdx").as("session_idx"),
          col("duration"))
    }),
    "q_session_duration" -> ((s, dir) => {
      val sess = Sessionize.gapSessionize(table(s, dir, "events"))
      Sessionize.sessionDurationPerUser(sess)
    }),
    "q_loyal_visitors" -> ((s, dir) => {
      val sess = Sessionize.gapSessionize(table(s, dir, "events"))
      Sessionize.loyalUsers(sess)
    }),
    "q_uniq_visitors" -> ((s, dir) =>
      table(s, dir, "events").agg(countDistinct(col("user_id")).as("uniq_visitors"))),

    // ---- OLAP surface over the star schema (SURVEY §2.8)
    "q1_agg" -> ((s, dir) => {
      // TPC-H Q1-shaped pricing summary. Money sums go through integer cents
      // (round-per-term then integer sum) so the result is bit-deterministic
      // under any aggregation order — double sums are not.
      val li = table(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("sum_base_cents"),
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100, 0).cast("long"))
            .as("sum_disc_cents"),
          count(lit(1)).as("n_rows"))
    }),
    "q_join_star" -> ((s, dir) => {
      // Star join: fact orders against dims customer/nation/region. nation +
      // region are broadcast (tiny at any SF); orders⋈customer shuffles —
      // at 100 TB customer is a fact-sized table, so no broadcast there.
      val o = table(s, dir, "orders")
      val c = table(s, dir, "customer")
      val n = broadcast(table(s, dir, "nation"))
      val r = broadcast(table(s, dir, "region"))
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("revenue_cents"))
    }),
    "q_join_sortmerge" -> ((s, dir) => {
      // Fact-fact equi-join (lineitem⋈orders): sort-merge/shuffle-hash path,
      // the shape that dominates at 100 TB. Filter pushed below the join.
      val li = table(s, dir, "lineitem").filter(col("l_quantity") > 10.0)
      val o = table(s, dir, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("price_cents"))
    }),
    "q_semi_anti_join" -> ((s, dir) => {
      // left_semi (EXISTS) + left_anti (NOT EXISTS) over the same key.
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders")
      val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n")).withColumn("kind", lit("with_orders"))
      val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n")).withColumn("kind", lit("without_orders"))
      semi.unionByName(anti).select(col("kind"), col("n"))
    }),
    "q_outer_join" -> ((s, dir) => {
      // FULL OUTER join coverage: every customer x order linkage, null
      // buckets counted per side.
      val c = table(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
      val o = table(s, dir, "orders").select(col("o_custkey"), col("o_totalprice"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("o_custkey")).as("n_matched"),
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("n_unmatched"))
    }),
    "q_pivot" -> ((s, dir) =>
      // Pivot: event_type counts per user as columns. Oracle mirrors with
      // CASE-WHEN aggregation (deterministic column set, fixed order).
      table(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("user_id"), col("click"), col("view"), col("purchase"),
          col("signup"), col("error"))),
    "q_scalar_subquery" -> ((s, dir) => {
      // Orders above the global average price. All-integer comparison
      // (price_cents * n_orders > total_cents) keeps the boundary exact —
      // a double average would make knife-edge rows nondeterministic.
      val o = table(s, dir, "orders")
      val totals = o.agg(
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("total_cents"),
        count(lit(1)).as("n_orders"))
      o.crossJoin(broadcast(totals))
        .filter(round(col("o_totalprice") * 100, 0).cast("long") * col("n_orders") > col("total_cents"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_above_avg"))
    }),
    "q_maxby" -> ((s, dir) => {
      // max_by/min_by argmax aggregates: priciest/cheapest order per
      // priority. Ties are broken INSIDE the comparison value (cents ·
      // 10^9 + orderkey) so the argmax is deterministic under any
      // partitioning/engine — bare max_by on a tied column picks an
      // arbitrary row. Headroom: cents ≤ ~6e7 → cmb ≤ ~6e16 < 2^63, and
      // orderkey stays under 10^9 through sf ~170 (TPC-H keys ≈ 6M·SF).
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      table(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), cents.as("cents"))
        .withColumn("cmb", col("cents") * 1000000000L + col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          max_by(col("o_orderkey"), col("cmb")).as("max_order"),
          min_by(col("o_orderkey"), col("cmb")).as("min_order"),
          max(col("cents")).as("max_cents"))
    }),
    "q_snapshot_diff" -> ((s, dir) => {
      // CDC-style snapshot diff (Cdc.snapshotDiff): two deterministic
      // pseudo-snapshots of orders (mod-filters simulate deletes/inserts, a
      // mod-5 cents bump simulates updates) -> insert/delete/update rows via
      // ONE full-outer shuffle join with null-safe value compare.
      def snap(drop: Int, bump: Boolean) = {
        val cents = round(col("o_totalprice") * 100, 0).cast("long")
        table(s, dir, "orders")
          .filter(col("o_orderkey") % drop =!= 0L)
          .select(col("o_orderkey").as("k"),
            (if (bump) cents + when(col("o_orderkey") % 5 === 0L, 100L).otherwise(0L)
             else cents).as("cents"))
      }
      graft.operators.Cdc
        .snapshotDiff(snap(11, bump = false), snap(13, bump = true), Seq("k"), Seq("cents"))
        .select(col("k"), col("old_cents"), col("new_cents"), col("op"))
    }),
    "q_correlated_subquery" -> ((s, dir) => {
      // Correlated scalar subqueries (per-customer count + total): Catalyst
      // DECORRELATES both into aggregate+join — exercised through spark.sql
      // because the DataFrame API cannot express correlation directly.
      // Integer-exact boundary as in q_scalar_subquery: cents · n_cust >
      // total_cust_cents avoids a double average's knife-edge rows.
      table(s, dir, "orders").createOrReplaceTempView("graft_orders_corr")
      s.sql(
        """SELECT o_orderkey, o_custkey, CAST(ROUND(o_totalprice*100, 0) AS BIGINT) AS cents
          |FROM graft_orders_corr o1
          |WHERE CAST(ROUND(o_totalprice*100, 0) AS BIGINT)
          |        * (SELECT COUNT(*) FROM graft_orders_corr o2
          |           WHERE o2.o_custkey = o1.o_custkey)
          |      > (SELECT CAST(SUM(CAST(ROUND(o_totalprice*100, 0) AS BIGINT)) AS BIGINT)
          |         FROM graft_orders_corr o3
          |         WHERE o3.o_custkey = o1.o_custkey)""".stripMargin)
    }),
    "q_window_dist" -> ((s, dir) => {
      // percent_rank / cume_dist — the remaining rank-family window
      // functions (rank, dense_rank, ntile covered elsewhere). The unique
      // (cents, key) order makes both fractions ratios of the same small
      // ints on either engine -> bit-identical doubles, no rounding needed.
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(round(col("o_totalprice") * 100, 0).cast("long"), col("o_orderkey"))
      table(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderpriority"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
    }),
    "q_topk_orders" -> ((s, dir) =>
      // Global top-k: Spark plans TakeOrderedAndProject (per-partition heap +
      // driver merge of k rows — no full sort, no full shuffle).
      table(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))),
    "q_window_rank" -> ((s, dir) => {
      // Ranking window: top-3 orders per customer, full tie-break for
      // determinism. row_number cast to long (DuckDB emits BIGINT).
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      table(s, dir, "orders")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3L)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
    }),
    "q_cube" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("n_rows"))),
    "q_map_funcs" -> ((s, dir) =>
      // MapType surface: props JSON -> map<string,bigint>, element_at +
      // map_keys, aggregated. Oracle mirrors via json_extract/json_keys.
      table(s, dir, "events")
        .select(
          col("event_type"),
          from_json(col("props"), org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.LongType)).as("m"))
        .select(
          col("event_type"),
          element_at(col("m"), "k").as("k"),
          size(map_keys(col("m"))).cast("long").as("n_keys"))
        .groupBy(col("event_type"), col("n_keys"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))),
    "q_window_agg" -> ((s, dir) =>
      // Tumbling event-time window aggregation (UTC-aligned 1-day windows).
      table(s, dir, "events")
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
        .select(
          unix_millis(col("w.start")).as("day_start_ms"),
          col("event_type"), col("n"), col("value_cents"))),
    "q_session_summary" -> ((s, dir) => {
      // Custom typed Aggregator (UDAF surface): one-pass per-session stats
      // over the gap-sessionized events, then a per-user rollup.
      val sess = Sessionize.gapSessionize(table(s, dir, "events"))
      val stats = udaf(graft.functions.SessionStatsAggregator)
      sess
        .groupBy(col("user_id"), col("session_id"))
        .agg(stats(col("duration")).as("st"))
        .select(col("user_id"), col("session_id"),
          col("st.n_events").as("n_events"),
          col("st.max_duration").as("max_duration"),
          col("st.min_duration").as("min_duration"))
    }),
    "q_approx_distinct" -> ((s, dir) =>
      // HLL sketch (the 100 TB path for uniq visitors) next to the exact
      // count. Sketch internals differ across engines, so the ESTIMATE
      // can't hash-match DuckDB — instead the output carries the exact
      // count (fully oracled) plus a bounded-error assertion computed
      // Spark-side: |approx − exact| ≤ 3·rsd·exact (rsd = 0.05 default).
      // The oracle asserts the exact column and `est_ok = 1`, so an
      // out-of-bound sketch now FAILS the driver hash gate.
      table(s, dir, "events")
        .agg(
          approx_count_distinct(col("user_id")).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(
          col("exact_users"),
          (abs(col("approx_users") - col("exact_users"))
            <= col("exact_users") * lit(0.15)).cast("int").as("est_ok"))),
    "q_grouping_sets" -> ((s, dir) => {
      // GROUPING SETS — the general grouping form (rollup/cube are sugar).
      table(s, dir, "lineitem").createOrReplaceTempView("graft_lineitem_gs")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |  SUM(CAST(l_quantity AS BIGINT)) AS sum_qty, COUNT(*) AS n_rows
          |FROM graft_lineitem_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
          |""".stripMargin)
    }),
    "q_window_analytics" -> ((s, dir) => {
      // Analytic-window family: lag/lead/first_value + running frame sum,
      // all with total-order tie-breaks.
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      table(s, dir, "orders")
        .withColumn("prev_cents", lag(cents, 1).over(w))
        .withColumn("next_cents", lead(cents, 1).over(w))
        .withColumn("first_cents", first(cents).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("running_cents", sum(cents).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("o_custkey"), col("o_orderkey"),
          col("prev_cents"), col("next_cents"), col("first_cents"), col("running_cents"))
    }),
    "q_rollup" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("n_rows"))),
    "q_setops" -> ((s, dir) => {
      // UNION / INTERSECT / EXCEPT over customer keys, labeled per branch.
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders")
      val building = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
      val ordered = o.select(col("o_custkey").as("k")).distinct()
      val both = building.intersect(ordered).withColumn("kind", lit("building_with_orders"))
      val none = building.except(ordered).withColumn("kind", lit("building_without_orders"))
      both.unionByName(none).select(col("kind"), col("k"))
    }),
    "q_json_extract" -> ((s, dir) =>
      // JSON scalar extraction on events.props ({"k": N}) + aggregation.
      table(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"), (col("k") % 10L).as("k_bucket"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))),
    "q_xml_source" -> ((s, dir) => {
      // Native XML ingestion (from_xml, Spark 4): parse-your-own-synthesis
      // pattern (as q_pii_redact/q_multimodal_*) — serialize order fields
      // to XML, parse back with an explicit schema, aggregate. The oracle
      // reconstructs the expectation from the source columns directly, so
      // it checks the round-trip, not a replay of it.
      val xml = format_string("<o><k>%s</k><p>%s</p><c>%s</c></o>",
        col("o_orderkey"), col("o_orderpriority"),
        round(col("o_totalprice") * 100, 0).cast("long"))
      table(s, dir, "orders")
        .withColumn("x", from_xml(xml, org.apache.spark.sql.types.StructType.fromDDL(
          "k BIGINT, p STRING, c BIGINT")))
        .groupBy(col("x.p").as("priority"))
        .agg(count(lit(1)).as("n"),
          sum(col("x.k")).as("sum_keys"),
          sum(col("x.c")).as("sum_cents"))
    }),
    "q_lateral_join" -> ((s, dir) => {
      // LATERAL correlated subquery (per-outer-row aggregate) — the SQL
      // surface Catalyst decorrelates into a join; oracle runs the same
      // ANSI shape in DuckDB.
      table(s, dir, "customer").createOrReplaceTempView("v_customer")
      table(s, dir, "orders").createOrReplaceTempView("v_orders")
      s.sql("""
        SELECT c.c_custkey, x.n_orders, x.max_cents
        FROM v_customer c,
        LATERAL (
          SELECT COUNT(*) AS n_orders,
            CAST(COALESCE(MAX(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)), -1) AS BIGINT)
              AS max_cents
          FROM v_orders o WHERE o.o_custkey = c.c_custkey) x
        WHERE c.c_custkey % 20 = 0""")
    }),
    "q_variant" -> ((s, dir) =>
      // Spark-4 VARIANT ingestion: parse_json -> VariantType -> typed
      // variant_get extraction (the modern semi-structured path next to
      // q_json_extract's string-functions path). try_variant_get on a
      // missing field pins null-not-error semantics.
      table(s, dir, "events")
        .withColumn("v", parse_json(col("props")))
        .select(col("event_type"),
          expr("variant_get(v, '$.k', 'long')").as("k"),
          expr("try_variant_get(v, '$.absent', 'long')").as("miss"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          count(col("miss")).cast("long").as("n_absent"))),
    "q_string_date" -> ((s, dir) =>
      // String + date scalar functions over events, aggregated per day bucket.
      table(s, dir, "events")
        .select(
          year(col("ts")).cast("long").as("y"),
          month(col("ts")).cast("long").as("m"),
          dayofmonth(col("ts")).cast("long").as("d"),
          upper(substring(col("event_type"), 1, 2)).as("et2"),
          length(col("event_type")).cast("long").as("et_len"))
        .groupBy(col("y"), col("m"), col("d"), col("et2"), col("et_len"))
        .agg(count(lit(1)).as("n"))),
    "q_parse_elb" -> ((s, dir) => {
      // End-to-end reference-native path: synthesize ELB-style lines from the
      // events table (deterministic), push them through the tolerant parser,
      // emit (ip, ts_ms). The oracle recomputes the expectation from events
      // directly — if the parser mangles anything, hashes diverge.
      val lines = table(s, dir, "events").select(
        format_string(
          "%s elb u%d:%d 10.0.0.1:80 0.0 0.0 0.0 200 200 0 699 GET http://x/y HTTP/1.1",
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
          col("user_id"),
          col("event_id")).as("value"))
      ElbLogParser.parse(lines)
        .select(col("ip"), unix_millis(col("ts")).as("ts_ms"))
    }),

    // ---- Training-data pipeline extensions (SURVEY §2.8 / north star)
    "q_salted_join" -> ((s, dir) => {
      // Skew-resistant fact⋈dim join: deterministic salt on the fact side,
      // dim replicated saltFactor ways. Same result as the plain join —
      // the oracle IS the plain join.
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val o = table(s, dir, "orders").select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.operators.Skew.saltedJoin(li, o, "l_orderkey", "l_linenumber", saltFactor = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sum_qty"))
    }),
    "q_array_funcs" -> ((s, dir) =>
      // Array scalar-function surface: sort/slice/contains/distinct over
      // token arrays, aggregated.
      table(s, dir, "documents")
        .select(
          col("doc_id"),
          array_join(slice(array_sort(array_distinct(split(col("text"), " "))), 1, 3), ",")
            .as("first3"),
          array_contains(split(col("text"), " "), "spark").cast("boolean").as("has_spark"),
          size(array_distinct(split(col("text"), " "))).cast("long").as("n_uniq"))
        .groupBy(col("first3"), col("has_spark"))
        .agg(count(lit(1)).as("n"), sum(col("n_uniq")).as("sum_uniq"))),
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exact(table(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), col("source"))),
    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.nearDupMinhash(table(s, dir, "documents"), threshold = 0.5)),
    "q_dedup_report" -> ((s, dir) => {
      // The headline curation metric: how much of the corpus is duplicated
      // mass. Non-canonical members of near-dup components (the docs
      // keep-one dedup would drop) are counted in docs AND tokens — the
      // number that justifies running dedup at all.
      val d = table(s, dir, "documents")
      val comp = Dedup.connectedComponents(
        Dedup.nearDupMinhash(d, threshold = 0.5).select(col("doc_a"), col("doc_b")))
        .withColumnRenamed("node", "doc_id")
      d.select(col("doc_id"), size(split(col("text"), " ", -1)).cast("long").as("n_tokens"))
        .join(comp, Seq("doc_id"), "left")
        .withColumn("dup",
          (col("component").isNotNull && col("component") =!= col("doc_id")).cast("int"))
        .agg(
          count(lit(1)).cast("long").as("n_docs"),
          sum(col("dup")).cast("long").as("n_dup_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(when(col("dup") === 1, col("n_tokens")).otherwise(0L)).as("n_dup_tokens"),
          round(sum((col("dup") * col("n_tokens")).cast("double")) /
            sum(col("n_tokens")).cast("double"), 6).as("dup_token_frac"))
    }),
    "q_dedup_apply" -> ((s, dir) =>
      // The full dedup operator end-to-end: near-dup clusters collapsed to
      // their min-id representative, unclustered docs untouched.
      Dedup.dedupNearMinhash(table(s, dir, "documents"), threshold = 0.5)
        .select(col("doc_id"), col("lang"), col("source"))),
    "q_dedup_components" -> ((s, dir) =>
      // Near-dup pairs -> duplicate CLUSTERS: min-label propagation to a
      // fixpoint (component = min reachable doc id). The real dedup
      // pipeline's keep-one-per-cluster step.
      Dedup.connectedComponents(
        Dedup.nearDupMinhash(table(s, dir, "documents"), threshold = 0.5)
          .select(col("doc_a"), col("doc_b")))),
    "q_dedup_simhash" -> ((s, dir) =>
      Dedup.simhash(table(s, dir, "documents"))),
    "q_ngram_jaccard" -> ((s, dir) => {
      // n-gram Jaccard scoring over deterministic (id, id+1) pairs —
      // guaranteed rows, exercises the shingle+jaccard kernel with an oracle.
      val d = table(s, dir, "documents")
      val sh = Dedup.shingleSigTable(d, "doc_id", "text", 3, numHashes = 0)
      val a = sh.select(col("doc_id").as("doc_a"), col("__sh").as("sh_a"))
      val b = sh.select(col("doc_id").as("doc_b"), col("__sh").as("sh_b"))
      a.join(b, col("doc_b") === col("doc_a") + 1L)
        .select(col("doc_a"), col("doc_b"),
          graft.functions.TextFunctions.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
    }),
    "q_ngram_containment" -> ((s, dir) => {
      // Directional containment |A∩B|/|A| over the same deterministic
      // (id, id+1) pairs as q_ngram_jaccard — the asymmetric dedup score:
      // a short doc quoted inside a long one scores ~1 here while its
      // Jaccard stays low (union dominated by the long doc). Same plan
      // shape: one shingle kernel, one adjacent-id equi-join, no fan-out.
      val d = table(s, dir, "documents")
      val sh = Dedup.shingleSigTable(d, "doc_id", "text", 3, numHashes = 0)
      val a = sh.select(col("doc_id").as("doc_a"), col("__sh").as("sh_a"))
      val b = sh.select(col("doc_id").as("doc_b"), col("__sh").as("sh_b"))
      import graft.functions.TextFunctions.containment
      a.join(b, col("doc_b") === col("doc_a") + 1L)
        .select(col("doc_a"), col("doc_b"),
          containment(col("sh_a"), col("sh_b")).as("c_ab"),
          containment(col("sh_b"), col("sh_a")).as("c_ba"),
          greatest(
            containment(col("sh_a"), col("sh_b")),
            containment(col("sh_b"), col("sh_a"))).as("c_max"))
    }),
    "q_prefix_jaccard" -> ((s, dir) =>
      // EXACT 4-gram-Jaccard self-join via prefix filtering (AllPairs/
      // PPJoin) — deterministic counterpart of the MinHash tier; the
      // oracle is an independent naive all-pairs join, so it checks the
      // pruning logic, not a replay of it. Shingle width 4, not 3: on
      // this 31-word vocabulary trigram doc-frequencies are so dense the
      // prefix filter degenerates (695k candidate pairs at sf0.1 vs 6.3k
      // with 4-grams — 100× — for the identical 25-pair result; min
      // true-pair jaccard 0.889 vs threshold 0.5). Shingle width must
      // scale with vocabulary density, same doctrine as [[shingles]].
      Dedup.prefixJaccardJoin(table(s, dir, "documents"),
        threshold = 0.5, shingleN = 4)),
    "q_corpus_overlap" -> ((s, dir) =>
      // Cross-corpus 3-gram vocabulary overlap across the 10 document
      // sources: intersection, directional containment, Jaccard per pair —
      // the decision input for cross-dump dedup ordering.
      Dedup.corpusOverlap(table(s, dir, "documents"))),
    "q_corpus_overlap_sampled" -> ((s, dir) =>
      // The 1/4 universe-sampled scale path: the md5-mod shingle sample is
      // a pure function of the shingle bytes, so the estimates are exactly
      // replayable by the oracle (same hash predicate), not rows-only.
      Dedup.corpusOverlap(table(s, dir, "documents"), sampleMod = 4)),
    "q_bfs_hops" -> ((s, dir) => {
      // 3-hop BFS over the UNDIRECTED customer<->supplier purchase graph
      // from a fixed seed set (custkey < 5): min hop count per vertex.
      val e0 = table(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        .join(table(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey").cast("long") + 10000000L).as("dst"))
      val undirected = e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = table(s, dir, "customer")
        .filter(col("c_custkey") < 5L)
        .select(col("c_custkey").cast("long").as("id"))
      graft.operators.Graph.bfsHops(undirected, seeds, maxHops = 3)
    }),
    "q_pagerank" -> ((s, dir) => {
      // Fixed-iteration PageRank over the customer->supplier purchase
      // graph (supplier ids offset out of the customer key space).
      val edges = table(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        .join(table(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey").cast("long") + 10000000L).as("dst"))
      graft.operators.Graph.pageRank(edges, "src", "dst", iters = 5)
    }),
    "q_ppr" -> ((s, dir) => {
      // Personalized PageRank from the <=40-id customer seeds over the
      // SYMMETRIZED purchase graph (one-directional cust->supplier
      // edges would strand all walk mass on dangling suppliers after
      // one hop): "which customers and suppliers are closest to this
      // cohort's buying neighborhood" — exact micro-long arithmetic,
      // unrolled-CTE oracle.
      val d = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey").cast("long") + 10000000L).as("dst"))
      val e = d.unionByName(
        d.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = d.select(col("src").as("id")).filter(col("id") <= 40L)
      graft.operators.Graph.personalizedPageRank(
        e, seeds, iters = 4, alpha = 0.85)
    }),
    "q_triangle_count" -> ((s, dir) => {
      // Degree-ordered triangle counting over the part co-purchase graph
      // (parts sharing an order are adjacent): top-20 vertices by triangle
      // participation, stable (n_tri desc, id) order. Orders with >= 3
      // distinct parts seed the triangles; the count is orientation-
      // invariant so the id-ordered DuckDB enumeration matches exactly.
      val li = table(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val e = coPurchasePairs(li)
      graft.operators.Graph.triangleCounts(e, "src", "dst")
        .orderBy(col("n_tri").desc, col("id"))
        .limit(20)
    }),
    "q_triangle_count_capped" -> ((s, dir) => {
      // q_triangle_count with the power-law hub-cap valve ENGAGED:
      // maxDeg = 1000 bounds per-vertex wedge work on a skewed graph
      // (the O(m^1.5) guard a 100x-scale user copies), and is a NO-OP
      // here — the co-purchase max degree is ~220 at sf0.1 — so this
      // verifies against the same uncapped oracle; it passes iff the
      // cap filter changed nothing but the plan.
      val li = table(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      graft.operators.Graph.triangleCounts(
          coPurchasePairs(li), "src", "dst", maxDeg = 1000L)
        .orderBy(col("n_tri").desc, col("id"))
        .limit(20)
    }),
    "q_similarity_bruteforce" -> ((s, dir) => {
      val e = table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 8L)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.bruteForceTopK(q, e.select(col("vec_id"), col("embedding")), k = 10)
    }),
    "q_similarity_ivf" -> ((s, dir) => {
      // Approximate IVF search — scale path. With trainIters = 0 the whole
      // pipeline is deterministic (lowest-id seed centroids, rounded
      // cosines, total-order tie-breaks), so the DuckDB oracle replays
      // centroid choice, cell assignment, probe ranking, and final top-k
      // bit-for-bit; recall vs brute force is measured in the spec.
      val e = table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 8L)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.ivfTopK(q, e.select(col("vec_id"), col("embedding")), k = 10)
    }),
    "q_similarity_ivf_capped" -> ((s, dir) => {
      // q_similarity_ivf with the hot-cell salt-splitting valve ON
      // (cellCap = 40 forces multi-salt cells even at sf0.01): the
      // valve is output-INVARIANT by design, so this query runs
      // against the UNCAPPED oracle replay — it passes iff salting
      // changed the plan's balance and nothing else.
      val e = table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 8L)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.ivfTopK(q, e.select(col("vec_id"), col("embedding")),
        k = 10, cellCap = 40)
    }),
    "q_embedding_neardup" -> ((s, dir) =>
      Similarity.nearDupCosine(
        table(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        threshold = 0.4)),
    "q_embedding_neardup_lsh" -> ((s, dir) =>
      // Cell-blocked near-dup: the scale path for q_embedding_neardup.
      // Approximate (cell-boundary pairs missed — recall vs the exact op
      // asserted in ExtensionSpec) but DETERMINISTIC: seed centroids +
      // rounded cosines + total-order tie-breaks, so the oracle replays
      // the exact cell assignment and within-cell verification.
      Similarity.nearDupCosineBlocked(
        table(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        threshold = 0.4)),
    "q_embedding_srp" -> ((s, dir) =>
      // Signed-random-projection signatures: md5-derived hyperplanes, so the
      // 32 bits are reproduced exactly by the DuckDB oracle (hash check).
      Similarity.srpSignatures(
        table(s, dir, "embeddings").select(col("vec_id"), col("embedding")))),
    "q_embedding_neardup_srp" -> ((s, dir) =>
      // Cosine-LSH near-dup with deterministic hyperplanes: the ONE
      // approximate-similarity tier whose candidates and verdicts the SQL
      // oracle replays bit-for-bit (IVF/cell tiers are rows-only instead).
      Similarity.nearDupCosineSrp(
        table(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        threshold = 0.4)),
    "q_embedding_neardup_srp_mp" -> ((s, dir) =>
      // Multi-probe recall tier: band keys probed at Hamming distance <= 1
      // (each 1-bit flip), equi-join preserved; the oracle states the rule
      // closed-form via bit_count(xor(bk_a, bk_b)) <= 1. Superset of
      // q_embedding_neardup_srp's result by construction.
      Similarity.nearDupCosineSrpMultiProbe(
        table(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        threshold = 0.4)),
    "q_kcenter" -> ((s, dir) =>
      // Greedy k-center (farthest-point traversal): 6 coverage-
      // maximizing seeds from the embedding table; the dist column is
      // the k-center radius sequence (the coverage curve).
      Similarity.kCenterGreedy(
        table(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        k = 6)),
    "q_diversity_sample" -> ((s, dir) =>
      // Embedding-space curation: cell-stratified deterministic subset —
      // dense regions capped at perCell, sparse regions kept whole.
      Similarity.diversitySample(
        table(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        perCell = 3)),
    "q_pack_sequences" -> ((s, dir) =>
      // Context-window packing: per-shard exclusive-prefix-sum bins
      // (overflow bounded by one doc — the parallel packing contract).
      Sampling.packSequences(table(s, dir, "documents"), budgetTokens = 512L, shards = 16)),
    "q_quantize_int8" -> ((s, dir) =>
      // Symmetric int8 embedding quantization — the 4x storage-compression
      // step of an embedding pipeline. Exact-integer codes, exploded to
      // (vec_id, dim, q) scalars so the hash compare sees no array cells.
      Similarity.quantizeInt8(
        table(s, dir, "embeddings").select(col("vec_id"), col("embedding")))
        .select(col("vec_id"), col("scale"),
          posexplode(col("qvec")).as(Seq("dim", "q")))
        .withColumn("dim", col("dim").cast("long"))),
    "q_text_stats" -> ((s, dir) =>
      TextAnalysis.textStats(table(s, dir, "documents"))),
    "q_lang_id" -> ((s, dir) =>
      TextAnalysis.langId(table(s, dir, "documents"))),
    "q_token_freq" -> ((s, dir) =>
      TextAnalysis.tokenFrequencies(table(s, dir, "documents"))),
    "q_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprints(table(s, dir, "documents"))),
    "q_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionStats(table(s, dir, "documents"))),
    "q_vocab_growth" -> ((s, dir) =>
      // Vocabulary-saturation curve: new trigrams per 50-doc crawl bucket.
      TextAnalysis.vocabGrowth(table(s, dir, "documents"))),
    "q_boilerplate" -> ((s, dir) =>
      // Corpus-wide shingle-df boilerplate/novelty profile per document —
      // the inter-document repetition signal q_repetition (within-doc)
      // cannot see. df >= 10 marks a trigram as boilerplate.
      TextAnalysis.boilerplateProfile(table(s, dir, "documents"), dfThreshold = 10L)),
    "q_entropy" -> ((s, dir) =>
      TextAnalysis.charEntropy(table(s, dir, "documents"))),
    "q_pii_redact" -> ((s, dir) => {
      // The synthetic corpus has no PII; splice deterministic doc_id-derived
      // email/IP/phone fragments into some documents (same parse-your-own-
      // synthesis pattern as q_parse_elb), then scrub. The oracle rebuilds
      // the identical text and mirrors the regexes in RE2.
      val d = col("doc_id")
      val withPii = table(s, dir, "documents").select(
        d,
        concat(
          col("text"),
          when(d % 3 === 0,
            concat(lit(" contact u"), d, lit("@example.com"))).otherwise(lit("")),
          when(d % 4 === 0,
            concat(lit(" host 10."), d % 256L, lit(".0."), d % 100L)).otherwise(lit("")),
          when(d % 5 === 0,
            concat(lit(" call 555-867-"), lpad((d % 10000L).cast("string"), 4, "0")))
            .otherwise(lit(""))).as("text"))
      TextAnalysis.redactPii(withPii)
    }),
    "q_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfTopK(table(s, dir, "documents"), k = 3)),
    "q_bm25" -> ((s, dir) =>
      // BM25 retrieval for a fixed 3-term query — the search-scoring
      // counterpart of q_tfidf; corpus side is one doc-keyed agg pass.
      TextAnalysis.bm25TopK(table(s, dir, "documents"),
        queryTerms = Seq("join", "vector", "spark"), k = 10)),
    "q_hard_negatives" -> ((s, dir) =>
      // BM25 hard-negative mining for retriever training data: three
      // labeled (query, positive) pairs, top-5 highest-scoring
      // NON-positive docs each — one corpus tokenization, multi-query
      // scoring, per-query ranking window.
      graft.operators.Retrieval.hardNegativesBm25(
        table(s, dir, "documents"),
        queries = Seq(
          (1L, Seq("join", "vector", "spark"), 0L),
          (2L, Seq("window", "stream", "merge"), 1L),
          (3L, Seq("filter", "scan", "column"), 2L)),
        k = 5)),
    "q_kneser_ney" -> ((s, dir) =>
      // Interpolated Kneser-Ney bigram LM (D=0.75): top-25 model rows
      // among bigrams with count >= 5 — continuation-count backoff from
      // exact BIGINT counts, one shared-text double chain.
      TextAnalysis.kneserNeyBigrams(table(s, dir, "documents"),
        k = 25, minCount = 5L)),
    "q_sax" -> ((s, dir) => {
      // SAX shape fingerprint: each nation's monthly shipped-quantity
      // series -> 8-segment PAA -> z-normalized quartile letters -> one
      // word per nation (equal words = similar demand shapes).
      val li = table(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_shipdate"), col("l_quantity"))
      val sup = table(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val series = li
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").cast("long").as("nation"),
          expr("CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)")
            .as("m"))
        .agg(sum(col("l_quantity")).cast("long").as("qty"))
      graft.operators.TimeSeries.saxWords(
        series, "nation", "m", "qty", segments = 8)
    }),
    "q_dtw" -> ((s, dir) => {
      // Exact DTW on PAA-8 sketches of the per-nation monthly-quantity
      // series: 15 wavefront-parallel integer DP rounds over the 300
      // nation pairs; 20 closest alignments.
      val li = table(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_shipdate"), col("l_quantity"))
      val sup = table(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val series = li
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").cast("long").as("nation"),
          expr("CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)")
            .as("m"))
        .agg(sum(col("l_quantity")).cast("long").as("qty"))
      graft.operators.TimeSeries.dtwPaaDistances(
          series, "nation", "m", "qty", segments = 8)
        .orderBy(col("dtw_micro"), col("ka"), col("kb")).limit(20)
    }),
    "q_rrf_fusion" -> ((s, dir) => {
      // Hybrid retrieval: BM25 top-50 (lexical) fused with cosine top-50
      // around query vector 0 (doc_id and vec_id share the synthetic id
      // space) by reciprocal-rank fusion — rank-only, so no score
      // calibration across the two scorers, and exactly oracle-replayable.
      val emb = table(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val text = TextAnalysis.bm25TopK(table(s, dir, "documents"),
        queryTerms = Seq("join", "vector", "spark"), k = 50)
      val q0 = emb.filter(col("vec_id") === 0L)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val vec = Similarity.bruteForceTopK(q0, emb, k = 50)
      Retrieval.rrfFuse(
        Seq((text, "doc_id", "rn"), (vec, "vec_id", "rank")), k0 = 60, topK = 20)
    }),
    "q_unigram_logprob" -> ((s, dir) =>
      // KenLM-shaped unigram quality score; corpus frequency is a window,
      // never a broadcast (vocabulary-sized — same discipline as q_tfidf).
      TextAnalysis.unigramLogProb(table(s, dir, "documents"))),
    "q_chunk_dedup" -> ((s, dir) => {
      // Within-doc boilerplate dedup. The synthetic corpus has no repeated
      // boilerplate, so splice a 5-token header/footer onto every doc (the
      // parse-your-own-synthesis pattern of q_pii_redact/q_multimodal_*):
      // the trailing copy dedups exactly when it lands window-aligned
      // ((5 + n_tokens) % 5 == 0) — the documented fixed-window trade-off.
      val boiler = "subscribe to our newsletter today"
      val withBoiler = table(s, dir, "documents").select(
        col("doc_id"),
        concat_ws(" ", lit(boiler), col("text"), lit(boiler)).as("text"))
      TextAnalysis.dedupChunksWithinDoc(withBoiler, chunkSize = 5)
    }),
    "q_repeated_spans" -> ((s, dir) =>
      // Lee-et-al-style exact substring dedup. The synthetic corpus has no
      // verbatim cross-doc spans (31-word soup: P(shared 8-gram) ≈ 0), so
      // splice a 13-token license disclaimer onto every 3rd doc — and TWICE
      // onto every 6th, whose back-to-back copies must merge into ONE
      // maximal span (the overlap-merge path). The oracle rebuilds the
      // identical text and replays window hashes + span merging.
      Dedup.repeatedSpans(spliceDisclaimer(table(s, dir, "documents")), window = 8)),
    "q_repeated_spans_apply" -> ((s, dir) =>
      // The scrub step over the same spliced corpus: repeated spans removed,
      // document rebuilt. Interval-overlay coverage (see removeRepeatedSpans)
      // — the oracle replays spans AND the overlay with one running-sum
      // window. Standalone-query contract: recomputes the span pipeline.
      Dedup.removeRepeatedSpans(spliceDisclaimer(table(s, dir, "documents")), window = 8)),
    "q_decontaminate" -> ((s, dir) => {
      // Held-out "benchmark" = every 20th doc; flag train docs sharing any
      // 4-gram with it. Broadcast test shingle set, narrow train scan.
      // (4/20 chosen so ~10% of the corpus actually flags at sf0.01 — a
      // 5-gram over this vocab contaminates 1 doc, too thin to verify.)
      val docs = table(s, dir, "documents")
      Dedup.decontaminate(
        docs.filter(col("doc_id") % 20L =!= 0L),
        docs.filter(col("doc_id") % 20L === 0L),
        n = 4)
    }),
    "q_multimodal_meta" -> ((s, dir) => {
      val media = Multimodal.asMediaTable(table(s, dir, "documents"))
      val frames = Multimodal.sampleFrames(media, step = 16)
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_frames"))
      media
        .select(col("doc_id"), col("meta.mime").as("mime"), col("meta.n_bytes").as("n_bytes"))
        .join(frames, "doc_id")
    }),
    "q_wav_spectrum" -> ((s, dir) => {
      // Dominant frequency via direct DFT sweep over the DECODED
      // sawtooth payloads (8 docs, bins 1..64): per-sample trig terms
      // micro-quantized so re/im are exact longs; the peak bin should
      // track each doc's synth tone (pinned in the spec).
      import s.implicits._
      val media = table(s, dir, "documents")
        .filter(col("doc_id") < 8L)
        .select(col("doc_id"), col("n_chars"))
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .as[(Long, Long)]
        .mapPartitions(_.map { case (id, nc) =>
          (id, Multimodal.synthesizeWavSaw(
            (100 + id % 400).toInt, (500 + nc % 500).toInt))
        }).toDF("doc_id", "content")
      Multimodal.wavDominantFreq(media)
    }),
    "q_multimodal_wav" -> ((s, dir) => {
      // REAL binary decode, no codec library: synthesize deterministic PCM
      // WAV payloads (integer sawtooth tones parameterized per doc), then
      // parse them back with the RIFF/PCM byte decoder. Proves the
      // multimodal binary column carries an actual media format end-to-end
      // — the stub codec (q_multimodal_decode) stands in only for formats
      // that NEED external codecs. The sawtooth samples are pure int64
      // formulas, so the ORACLE replays synth + amplitude stats per sample
      // in SQL (generate_series) and the decode output hash-matches — like
      // the BMP tier. The sine tier stays spec-pinned in ExtensionSpec.
      import s.implicits._
      val media = table(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
        // single-file parquet = ONE partition; spread the synth+decode
        // kernel (explicit count: AQE would coalesce these few KB back)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .as[(Long, Long)]
        .mapPartitions(_.map { case (id, nc) =>
          (id, Multimodal.synthesizeWavSaw(
            freqHz = (100 + id % 400).toInt,
            nSamples = (500 + nc % 500).toInt))
        })
        .toDF("doc_id", "content")
      Multimodal.decodeWavPcm(media).toDF()
        .select(col("doc_id"), col("sample_rate"), col("n_channels"),
          col("bits_per_sample"), col("n_samples"), col("peak_abs"), col("sum_abs"))
    }),
    "q_wav_frame_energy" -> ((s, dir) => {
      // Frame-wise RMS energy over the decoded PCM stream (200-sample
      // frames) — the audio feature-extraction step past whole-file stats:
      // silence trimming / VAD gating consume exactly this envelope. Same
      // saw-tone synthesis as q_multimodal_wav (pure int64 formulas), so
      // the oracle replays frame Σx² sample-by-sample in SQL.
      import s.implicits._
      val media = table(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .as[(Long, Long)]
        .mapPartitions(_.map { case (id, nc) =>
          (id, Multimodal.synthesizeWavSaw(
            freqHz = (100 + id % 400).toInt,
            nSamples = (500 + nc % 500).toInt))
        })
        .toDF("doc_id", "content")
      Multimodal.wavFrameEnergy(media, frameLen = 200).toDF()
        .withColumn("rms",
          round(sqrt(col("sumsq").cast("double") / col("n_samples")), 6))
    }),
    "q_image_dhash" -> ((s, dir) => {
      // Perceptual dHash over the synthesized BMP corpus + the Hamming
      // distance to the previous image id (lag window) — the image-side
      // near-dup fingerprint, every bit from exact integer tile compares.
      val h = Multimodal.imageDHash(
        Multimodal.synthesizeBmpTable(table(s, dir, "documents")), tile = 8)
      val w = Window.orderBy(col("doc_id"))
      h.withColumn("hamming_prev",
        bit_count(col("dhash").bitwiseXOR(lag(col("dhash"), 1).over(w))).cast("long"))
    }),
    "q_image_ahash" -> ((s, dir) => {
      // Average-hash over the synthesized BMP corpus + Hamming to the
      // previous id — the global-brightness fingerprint next to
      // q_image_dhash's gradient one; every bit exact.
      val h = Multimodal.imageAHash(
        Multimodal.synthesizeBmpTable(table(s, dir, "documents")), tile = 8)
      val w = Window.orderBy(col("doc_id"))
      h.withColumn("hamming_prev",
        bit_count(col("ahash").bitwiseXOR(lag(col("ahash"), 1).over(w)))
          .cast("long"))
    }),
    "q_image_neardup_dhash" -> ((s, dir) => {
      // Image near-dup via Hamming LSH on the dHash fingerprints: 6 bands
      // × 7 bits, verify bit_count(xor) <= 3. maxHamming < bands makes the
      // banding EXHAUSTIVE (>=1 clean band by pigeonhole), so the oracle is
      // an independent all-pairs join within same-bit-width groups — it
      // checks equality, not recall. Grid geometry (n_bits) scopes buckets.
      val h = Multimodal.imageDHash(
        Multimodal.synthesizeBmpTable(table(s, dir, "documents")), tile = 8)
      Dedup.nearDupHamming(h, groupCol = Some("n_bits"),
        bands = 6, bandBits = 7, maxHamming = 3)
    }),
    "q_image_otsu" -> ((s, dir) =>
      // Otsu binarization threshold per decoded BMP: exact-integer
      // between-class numerator, two-IEEE-op objective, lowest-t
      // tie-break; emits threshold + foreground fraction.
      Multimodal.bmpOtsu(
        Multimodal.synthesizeBmpTable(table(s, dir, "documents")))),
    "q_image_tiles" -> ((s, dir) =>
      // Block-mean 8×8 tiling over the REAL BMP decode — the resize /
      // patch-extraction step of an image pipeline, as exact integer
      // per-tile sums (mean derived in the SQL layer). Same synthesized
      // gray-ramp corpus as q_multimodal_image, so the oracle replays the
      // pixel formula tile-by-tile.
      Multimodal.bmpTileMeans(
        Multimodal.synthesizeBmpTable(table(s, dir, "documents")), tile = 8).toDF()
        .withColumn("mean_px",
          round(col("sum_px").cast("double") / col("n_px"), 6))),
    "q_multimodal_image" -> ((s, dir) => {
      // REAL image decode, no codec library: synthesize deterministic
      // 24-bit BMPs (gray ramp parameterized by doc_id/n_chars), parse
      // them back with the fixed-offset BMP header/pixel decoder. Unlike
      // the WAV tier's transcendental sine, the pixel math is pure integer
      // formulas, so the ORACLE replays the synthesis in SQL and the
      // decode output hash-matches — a fully-oracled real binary format.
      Multimodal.decodeBmp24(Multimodal.synthesizeBmpTable(table(s, dir, "documents")))
        .toDF()
        .withColumn("mean_px", round(col("mean_px"), 6))
    }),
    "q_sessionize_stream" -> ((s, dir) => {
      // The REAL Structured-Streaming path (flatMapGroupsWithState +
      // watermark + EventTimeTimeout), driven to completion over the file
      // source and drained into a memory sink. One trigger sees all data, so
      // the result equals batch full-rule sessionize (proven per-trigger-
      // split-independent in StreamingSpec) — and therefore shares the
      // recursive-CTE oracle (fullSessionizeSql): a streaming-tier drift
      // from batch semantics now fails the HASH gate, not just a spec.
      // RocksDB state store for reference parity (set in runToFiles).
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val rawSchema = s.read.parquet(s"$dir/events.parquet").schema
      val src = normalizeTs(s.readStream
        .schema(rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
      val sessionized = graft.streaming.SessionizeStream.sessionizeEvents(src)
      runToFiles(s, sessionized.toDF())
        .select(
          col("tieBreak").as("event_id"),
          col("key").cast("long").as("user_id"),
          col("tsMillis").as("ts_ms"),
          col("sessionId").as("session_id"),
          col("sessionIdx").as("session_idx"),
          col("duration"))
    }),
    "q_sessionize_stream_tws" -> ((s, dir) => {
      // The transformWithState tier (Spark 4 stateful API, SPARK-40434) of
      // the same streaming sessionizer — typed ValueState handle +
      // declarative TTL instead of flatMapGroupsWithState's per-call
      // wrapper. REQUIRES the RocksDB provider (set in runToFiles).
      // TimeMode.None for replay: no timers, so processAllAvailable drains.
      // Shares the recursive-CTE oracle with the batch machine; cross-tier
      // equality is additionally asserted in CrossImplFuzzSpec/StreamingSpec.
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val rawSchema = s.read.parquet(s"$dir/events.parquet").schema
      val src = normalizeTs(s.readStream
        .schema(rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
        .select(
          col("user_id").cast("string").as("key"),
          col("ts"),
          col("event_id").as("tieBreak"))
      val sessionized = graft.streaming.SessionizeProcessor.sessionize(src)
      runToFiles(s, sessionized.toDF())
        .select(
          col("tieBreak").as("event_id"),
          col("key").cast("long").as("user_id"),
          col("tsMillis").as("ts_ms"),
          col("sessionId").as("session_id"),
          col("sessionIdx").as("session_idx"),
          col("duration"))
    }),
    "q_multimodal_decode" -> ((s, dir) =>
      // Batched stub-decode kernel (mapPartitions) — deterministic fake
      // codec; plumbing is real. The fake feature hash is md5-based
      // (Multimodal.fakeDecode) so even the payload-dependent feature
      // replays in SQL — fully hash-oracled.
      Multimodal.decodeFeatures(Multimodal.asMediaTable(table(s, dir, "documents")))
        .toDF()
        .select(col("doc_id"), col("mime"), col("n_bytes"), col("width"), col("height"),
          round(element_at(col("feature"), 3), 6).as("f3"))),

    // ---- Round 2: temporal joins, sampling/splits, quality, shape ops
    "q_asof_join" -> ((s, dir) => {
      // As-of join: each purchase attributed to the user's latest click
      // at-or-before it. Union+window algorithm (Temporal.asofJoin) — one
      // shuffle, no per-key loops. Unmatched -> -1 (null-free compare).
      val ev = table(s, dir, "events").withColumn("ts_ms", unix_millis(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_ms"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_ms"))
      graft.operators.Temporal
        .asofJoin(purchases, clicks, "user_id", "ts_ms", "event_id",
          payload = Seq("event_id", "ts_ms"))
        .select(
          col("event_id"), col("user_id"), col("ts_ms"),
          coalesce(col("asof_event_id"), lit(-1L)).as("click_event_id"),
          coalesce(expr("ts_ms div 1000 - asof_ts_ms div 1000"), lit(-1L)).as("gap_s"))
    }),
    "q_range_join" -> ((s, dir) => {
      // Range join: event values (cents) into half-open price tiers via the
      // binned equi-join path (no BroadcastNestedLoopJoin).
      import s.implicits._
      val tiers = Seq(
        ("t0", 0L, 10000L), ("t1", 10000L, 20000L), ("t2", 20000L, 30000L),
        ("t3", 30000L, 40000L), ("t4", 40000L, 50000L)).toDF("tier", "lo", "hi")
      val v = table(s, dir, "events")
        .select(col("event_id"), round(col("value") * 100, 0).cast("long").as("cents"))
      graft.operators.Temporal.rangeJoinBinned(v, "cents", tiers, binSize = 10000L)
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
    }),
    "q_gap_fill" -> ((s, dir) => {
      // Calendar-spine gap fill: per-user daily event counts with missing
      // days zero-filled between each user's first and last active day.
      val ev = table(s, dir, "events").withColumn("ts_ms", unix_millis(col("ts")))
      val perDay = ev
        .select(col("user_id"), expr("ts_ms div 86400000").as("day"))
        .groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("v"))
      graft.operators.TimeSeries.fillBucketGaps(perDay, "user_id", "day", "v")
    }),
    "q_interpolate" -> ((s, dir) => {
      // Linear interpolation of missing per-user daily value sums across
      // each user's active-day span — the sensor-series repair twin of
      // q_gap_fill's zero-fill.
      val perDay = table(s, dir, "events")
        .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("cents")).as("v"))
      graft.operators.TimeSeries.interpolateLinear(perDay, "user_id", "day", "v")
        .select(col("user_id"), col("day"), col("v"),
          col("observed").cast("int").as("observed"))
    }),
    "q_seasonal_dow" -> ((s, dir) => {
      // Weekly seasonal profile + residual over the daily per-type series:
      // (key, dow) means from exact BIGINT sums, broadcast back onto the
      // unshuffled series (TimeSeries.seasonalByPhase).
      val pd = table(s, dir, "events")
        .select(col("event_type"), expr("unix_millis(ts) div 86400000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("cents")).cast("long").as("v"))
      graft.operators.TimeSeries.seasonalByPhase(pd, "event_type", "day", "v", period = 7)
    }),
    "q_ewma" -> ((s, dir) => {
      // Exponentially-weighted moving average (α=0.3, 30-row lookback) of
      // per-user daily value sums — the smoothing twin of q_interpolate.
      val perDay = table(s, dir, "events")
        .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("cents")).as("v"))
      graft.operators.TimeSeries.ewma(perDay, "user_id", "day", "v",
        alpha = 0.3, lookback = 30)
    }),
    "q_rolling_median" -> ((s, dir) => {
      // Exact 7-row rolling median of per-user daily value sums — the
      // robust-trend counterpart of q_ewma (no percentile window function
      // in Spark; bounded frame sort inside codegen).
      val perDay = table(s, dir, "events")
        .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("cents")).as("v"))
      graft.operators.TimeSeries.rollingMedian(perDay, "user_id", "day", "v",
        windowRows = 7)
    }),
    "q_interval_union" -> ((s, dir) => {
      // Interval-union coverage per user: each event opens a 5-minute
      // activity interval; overlapping/touching intervals merge, then per
      // user the disjoint-island count and total covered millis — the
      // overlap-free "total active time" the reference's README analytics
      // need when sessions can overlap (README.md:42-50).
      val iv = table(s, dir, "events").select(
        col("user_id"),
        unix_millis(col("ts")).as("s"),
        (unix_millis(col("ts")) + lit(300000L)).as("e"))
      graft.operators.Intervals.coverage(iv, "user_id", "s", "e")
    }),
    "q_anomaly_mad" -> ((s, dir) => {
      // Robust volume-anomaly detection: per event_type, exact median and
      // MAD of per-minute event counts; the 20 most deviant minutes in
      // stable (dev desc, type, minute) order.
      val perMin = table(s, dir, "events")
        .select(col("event_type"), expr("unix_millis(ts) div 60000").as("minute"))
        .groupBy(col("event_type"), col("minute"))
        .agg(count(lit(1)).as("n"))
      graft.operators.TimeSeries.madOutliers(perMin, "event_type", "minute", "n")
        .orderBy(col("dev").desc, col("event_type"), col("minute"))
        .limit(20)
    }),
    "q_scd2" -> ((s, dir) => {
      // Type-2 SCD build over order-status changes per customer: collapse
      // runs of unchanged status, stamp validity intervals (-1 = open).
      val ch = table(s, dir, "orders").select(
        col("o_custkey").cast("long").as("k"),
        datediff(col("o_orderdate"), to_date(lit("1970-01-01"))).cast("long").as("ts"),
        col("o_orderstatus").as("status"),
        col("o_orderkey").cast("long").as("tie"))
      graft.operators.Cdc.scdType2(ch, Seq("k"), "ts", Seq("status"), "tie")
        .select(col("k").as("o_custkey"), col("status"), col("valid_from"),
          coalesce(col("valid_to"), lit(-1L)).as("valid_to"),
          col("is_current").cast("int").as("is_current"))
    }),
    "q_retention" -> ((s, dir) => {
      // Cohort retention triangle over the events table (first-active-day
      // cohorts, distinct actives per day offset 0..7).
      val ev = table(s, dir, "events").withColumn("ts_ms", unix_millis(col("ts")))
      graft.operators.Sessionize.cohortRetention(ev, maxOffsetDays = 7)
    }),
    "q_funnel" -> ((s, dir) => {
      // view -> click -> purchase funnel, first-touch ordered semantics;
      // -1 sentinels for unreached steps keep the schema oracle-stable.
      val ev = table(s, dir, "events").withColumn("ts_ms", unix_millis(col("ts")))
      graft.operators.Sessionize
        .funnel(ev, Seq("view", "click", "purchase"))
        .select(col("user_id"), col("t1"),
          coalesce(col("t2"), lit(-1L)).as("t2"),
          coalesce(col("t3"), lit(-1L)).as("t3"),
          col("stage"))
    }),
    "q_markov_transitions" -> ((s, dir) => {
      // First-order event-type transition matrix over per-user ordered
      // clickstreams — the post-sessionize navigation analytics the
      // reference's README motivates. (event_id tie-break pins equal-ts
      // neighbors; p row-normalizes per from_type.)
      val ev = table(s, dir, "events").withColumn("ts_ms", unix_millis(col("ts")))
      graft.operators.Sessionize.markovTransitions(ev)
    }),
    "q_cusum" -> ((s, dir) => {
      // Two-sided CUSUM alarms over per-user daily spend vs each user's
      // own median. Doubled-cents fixed point keeps the .5-capable median
      // integral, so the whole recurrence is BIGINT-exact on both engines.
      val perDay = table(s, dir, "events")
        .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("cents")).as("v"))
      val withTarget = perDay
        .withColumn("x2", col("v") * 2)
        .withColumn("t2", expr(
          "CAST(percentile(v, 0.5) OVER (PARTITION BY user_id) * 2 AS BIGINT)"))
      graft.operators.TimeSeries
        .cusum(withTarget, "user_id", "day", "x2", "t2",
          drift = 100L, threshold = 1000L)
        .select(col("user_id"), col("day"), (col("x2") / 2).cast("long").as("v"),
          col("cusum_pos"), col("cusum_neg"), col("alarm"))
    }),
    "q_prorate" -> ((s, dir) => {
      // Largest-remainder proration: spread each order's total cents over
      // its lineitems proportionally to extended price, shares integer and
      // summing EXACTLY to the total (spec pins the invariant).
      val li = table(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)").as("w"))
      val o = table(s, dir, "orders").select(
        col("o_orderkey"), expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").as("t"))
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
      graft.operators.Allocate
        .largestRemainder(joined, "l_orderkey", "t", "w", "l_linenumber")
        .select(col("l_orderkey"), col("l_linenumber"), col("alloc").as("alloc_cents"))
    }),
    "q_session_entry_exit" -> ((s, dir) => {
      // Landing/exit-page analytics per session (README.md:42-50 family):
      // entry/exit event type, size, duration, bounce flag.
      val sess = graft.operators.Sessionize.gapSessionize(table(s, dir, "events"))
      graft.operators.Sessionize.sessionEntryExit(sess)
    }),
    "q_ransac" -> ((s, dir) => {
      // RANSAC consensus line over (quantity, extended price cents):
      // 16 md5-seeded two-point candidates, exact integer inlier votes
      // at eps = $2000.00, OLS refit on the winner's inliers. On this
      // part-price-dispersed data the headline is the CONSENSUS
      // FRACTION (~4%): the robust "is there a dominant linear band,
      // and what is it" diagnostic plain OLS can't give — the spec
      // pins the planted-line case where RANSAC recovers slope exactly
      // while OLS is dragged by outliers.
      graft.operators.TimeSeries.ransacLine(
        table(s, dir, "lineitem").select(
          (col("l_orderkey").cast("long") * 10L +
            col("l_linenumber").cast("long")).as("lid"),
          col("l_quantity").cast("long").as("qty"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("cents")),
        "lid", "qty", "cents", nCand = 16, epsilon = 200000L)
    }),
    "q_trend_ols" -> ((s, dir) => {
      // Per-user spend trend line (slope cents/day, intercept, r2) from
      // exact BIGINT moment sums — the acf pattern applied to regression.
      val perDay = table(s, dir, "events")
        .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("cents")).as("v"))
        // re-origin x so moment products stay far from 2^63 (day ~ 20k)
        .withColumn("day0", col("day") - min(col("day")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))))
      graft.operators.TimeSeries.trendOls(perDay, "user_id", "day0", "v")
    }),
    "q_acf" -> ((s, dir) => {
      // Lag-1 autocorrelation of per-user daily spend — seasonality/trend
      // diagnostic. Exact BIGINT moment sums, one double step at the end
      // (engine-portable Pearson; see TimeSeries.autocorr contract).
      val perDay = table(s, dir, "events")
        .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("cents")).as("v"))
      graft.operators.TimeSeries.autocorr(perDay, "user_id", "day", "v", lag = 1)
    }),
    "q_rfm" -> ((s, dir) => {
      // RFM quintile segmentation of visitors (recency/frequency/monetary,
      // 5 = best on every axis; user_id tie-break pins ntile determinism).
      graft.operators.Sessionize.rfm(table(s, dir, "events"))
    }),
    "q_benford" -> ((s, dir) => {
      // Benford leading-digit audit of spend cents per event type: digit
      // histogram, observed vs log10(1+1/d) expectation, chi2 contribution.
      val v = table(s, dir, "events").select(col("event_type"),
        expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
      graft.operators.Profiling.benfordProfile(v, "event_type", "cents")
    }),
    "q_scd2_asof" -> ((s, dir) => {
      // Point-in-time snapshot over the q_scd2 dimension: each customer's
      // order-status version valid on epoch day 9500 (pure filter — the
      // partition-prunable time-travel read path).
      val ch = table(s, dir, "orders").select(
        col("o_custkey").cast("long").as("k"),
        datediff(col("o_orderdate"), to_date(lit("1970-01-01"))).cast("long").as("ts"),
        col("o_orderstatus").as("status"),
        col("o_orderkey").cast("long").as("tie"))
      val scd = graft.operators.Cdc.scdType2(ch, Seq("k"), "ts", Seq("status"), "tie")
      graft.operators.Cdc.asOfSnapshot(scd, 9500L)
        .select(col("k").as("o_custkey"), col("status"), col("valid_from"),
          coalesce(col("valid_to"), lit(-1L)).as("valid_to"))
    }),
    "q_holt" -> ((s, dir) => {
      // Holt level+trend smoothing of per-user daily spend. Fixed-point
      // rational arithmetic with floor division -> the recursive oracle
      // replays the fold bit for bit (see TimeSeries.holt contract).
      val perDay = table(s, dir, "events")
        .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("cents")).as("v"))
      graft.operators.TimeSeries.holt(perDay, "user_id", "day", "v")
    }),
    "q_sssp" -> ((s, dir) => {
      // 4-round weighted shortest paths over the undirected customer<->
      // supplier purchase graph (weight = order-to-ship day lag), from the
      // q_bfs_hops seed set. Exact BIGINT min-plus relaxation.
      val e0 = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          datediff(col("o_orderdate"), to_date(lit("1970-01-01")))
            .cast("long").as("od"))
        .join(table(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_suppkey"),
              datediff(col("l_shipdate"), to_date(lit("1970-01-01")))
                .cast("long").as("sd")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey").cast("long") + 10000000L).as("dst"),
          (col("sd") - col("od")).as("w"))
      val undirected = e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      val seeds = table(s, dir, "customer")
        .filter(col("c_custkey") < 5L)
        .select(col("c_custkey").cast("long").as("id"))
      graft.operators.Graph.shortestPaths(undirected, seeds, rounds = 4)
    }),
    "q_path_trigrams" -> ((s, dir) => {
      // Top navigation paths: the 20 most common ordered event-type
      // trigrams across per-user streams (two leads over the markov
      // window; deterministic n-desc/path tie-break).
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
      table(s, dir, "events")
        .withColumn("ts_ms", unix_millis(col("ts")))
        .select(col("user_id"), col("event_type").as("t0"),
          col("ts_ms"), col("event_id"))
        .withColumn("t1", lead(col("t0"), 1).over(w))
        .withColumn("t2", lead(col("t0"), 2).over(w))
        .filter(col("t2").isNotNull)
        .select(concat_ws(">", col("t0"), col("t1"), col("t2")).as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path")).limit(20)
    }),
    "q_market_basket" -> ((s, dir) => {
      // Association rules over orders: part pairs co-ordered >= 3 times,
      // with per-pair support counts and lift vs independence. The
      // self-join's two inputs are the same distinct subtree -> one
      // basket-hashed exchange, reused.
      val li = table(s, dir, "lineitem")
      graft.operators.Cooccur.marketBasket(li, "l_orderkey", "l_partkey",
          minCount = 3L)
        .select(col("item_a").as("part_a"), col("item_b").as("part_b"),
          col("n_ab"), col("n_a"), col("n_b"), col("lift"))
    }),
    "q_jaro_winkler" -> ((s, dir) => {
      // Fuzzy string match via the native jaro_winkler Expression
      // (codegen'd; Spark ships levenshtein only): within-brand part-name
      // pairs scoring >= 0.75 — brand blocking keeps the compare
      // quadratic-per-block, never corpus-global. Oracled against
      // DuckDB's jaro_winkler_similarity over every surviving pair.
      import graft.functions.expressions.JaroWinklerSim.jaroWinkler
      val p = table(s, dir, "part")
        .select(col("p_partkey"), col("p_name"), col("p_brand"))
      // the scan is tiny (1-2 file partitions) but the per-row fan-out is
      // ~|brand|/2 comparisons — round-robin the probe side so the O(n²/
      // brands) kernel work spreads over every core instead of 2 tasks
      val probe = p.repartition(s.sparkContext.defaultParallelism)
      probe.as("a").join(broadcast(p).as("b"),
          col("a.p_brand") === col("b.p_brand") &&
            col("a.p_partkey") < col("b.p_partkey"))
        .withColumn("sim",
          round(jaroWinkler(col("a.p_name"), col("b.p_name")), 6))
        .filter(col("sim") >= 0.75)
        .select(col("a.p_partkey").as("pk_a"), col("b.p_partkey").as("pk_b"),
          col("sim"))
    }),
    "q_seq_match" -> ((s, dir) => {
      // MATCH_RECOGNIZE-lite: per-user event stream as a char-coded string,
      // count non-overlapping 'view …(clicks/errors)… purchase' runs and
      // the first match position.
      val ev = table(s, dir, "events").withColumn("ts_ms", unix_millis(col("ts")))
      graft.operators.Sessionize.sequenceMatch(ev,
        codes = Map("view" -> "v", "click" -> "c", "purchase" -> "p",
          "signup" -> "s", "error" -> "e"),
        pattern = "v[ce]*p")
    }),
    "q_attribution" -> ((s, dir) => {
      // Last-touch attribution: each purchase credits the most recent
      // strictly-preceding view/click by the same user within 6 h, else
      // "(none)". Per-channel conversions and distinct converters.
      val ev = table(s, dir, "events").withColumn("ts_ms", unix_millis(col("ts")))
      graft.operators.Sessionize.attributeLastTouch(ev,
        touchTypes = Seq("view", "click"), convType = "purchase",
        lookbackMs = 21600000L)
    }),
    "q_listagg" -> ((s, dir) =>
      // Ordered string aggregation (LISTAGG/string_agg parity). Spark's
      // collect_list is partition-order-nondeterministic, so the total
      // order is imposed INSIDE the aggregate: sort the (key, value)
      // structs (orderkey unique -> deterministic), then project values.
      table(s, dir, "orders")
        .filter(col("o_custkey") % 50L === 0L)
        .groupBy(col("o_custkey"))
        .agg(
          count(lit(1)).as("n_orders"),
          array_join(
            transform(
              array_sort(collect_list(struct(col("o_orderkey"), col("o_orderpriority")))),
              x => x.getField("o_orderpriority")),
            ",").as("priorities"))),
    "q_ab_test" -> ((s, dir) => {
      // A/B experiment readout: deterministic even/odd user split, Welch t
      // per event_type from exact integer moments — ONE conditional-sum
      // aggregate over the scan, no join, no window.
      val ev = table(s, dir, "events")
        .select(col("event_type"),
          (pmod(col("user_id"), lit(2L)) === 0L).as("arm"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      Normalize.welchTTest(ev, "event_type", "arm", "cents")
    }),
    "q_psi_drift" -> ((s, dir) => {
      // Feature-drift monitor: PSI of the value distribution between the
      // even-user baseline and odd-user current sample over the baseline's
      // decile buckets — each side scanned once, counts joined on a
      // 10-row spine (Profiling.psiDrift).
      val ev = table(s, dir, "events")
        .select(col("user_id"), round(col("value") * 100, 0).cast("long").as("cents"))
      Profiling.psiDrift(
        ev.filter(pmod(col("user_id"), lit(2L)) === 0L).select(col("cents")),
        ev.filter(pmod(col("user_id"), lit(2L)) =!= 0L).select(col("cents")),
        "cents")
    }),
    "q_stream_psi_drift" -> ((s, dir) => {
      // IN-STREAM drift monitoring: the current sample arrives as a
      // stream, buckets against the BROADCAST baseline edges (stream-
      // static join — the stateful part is one per-bucket count in
      // complete mode), and the drained counts compose with the batch
      // baseline through the same PSI assembly as q_psi_drift — so the
      // two queries share one oracle formula.
      val evB = table(s, dir, "events")
        .select(col("user_id"), round(col("value") * 100, 0).cast("long").as("cents"))
      val base = evB.filter(pmod(col("user_id"), lit(2L)) === 0L).select(col("cents"))
      val edges = Profiling.psiEdges(base, "cents")
      val baseCounts = base.crossJoin(edges)
        .select(Profiling.psiBucket("cents").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).cast("long").as("n_base"))
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      val cur = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
        .select(col("user_id"), round(col("value") * 100, 0).cast("long").as("cents"))
        .filter(pmod(col("user_id"), lit(2L)) =!= 0L)
        .crossJoin(edges)
        .select(Profiling.psiBucket("cents").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).cast("long").as("n_cur"))
      val curCounts = runToMemory(s, cur, "complete")
      Profiling.psiFromCounts(
        Profiling.psiCountsSpine(baseCounts, curCounts, 10), 10)
    }),
    "q_keyword_spot" -> ((s, dir) =>
      // Blocklist content filter: per-(doc, needle) whole-token hit counts
      // — needles broadcast into a narrow map, only hit rows shuffle.
      TextAnalysis.keywordSpot(table(s, dir, "documents"),
        Seq("join", "vector", "spark", "data"))),
    "q_stream_keyword_alert" -> ((s, dir) => {
      // The same spotting over a document STREAM, rolled up per needle in
      // complete mode — the alerting tier of the content filter; shares
      // the batch formula's oracle rollup.
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
      val agg = TextAnalysis
        .keywordSpot(src, Seq("join", "vector", "spark", "data"))
        .groupBy(col("needle"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_hits")).cast("long").as("total_hits"))
      runToMemory(s, agg, "complete")
    }),
    "q_train_shuffle" -> ((s, dir) => {
      // Deterministic training-data shuffle order: every doc positioned by
      // md5 rank WITHOUT a single-partition global window —
      // Layout.globalRowNumber runs the distributed prefix-sum rank
      // (range exchange + per-partition offsets).
      val d = table(s, dir, "documents").select(col("doc_id"),
        md5(concat(lit("shuf:"), col("doc_id").cast("string"))).as("h"))
      graft.operators.Layout.globalRowNumber(d, Seq("h", "doc_id"), "pos")
        .select(col("doc_id"), col("h"), col("pos"))
    }),
    "q_pmi_collocations" -> ((s, dir) =>
      // Church–Hanks PMI collocations: top adjacent-pair associations
      // above a count floor — one tokenization, vocabulary joins by key
      // (never broadcast), 1-row total broadcasts.
      TextAnalysis.pmiCollocations(table(s, dir, "documents"), minCount = 5L, k = 20)),
    "q_chi2_independence" -> ((s, dir) => {
      // Is event-type mix independent of the user-parity cohort? One
      // contingency aggregate + tiny broadcast marginals (Profiling).
      val ev = table(s, dir, "events").select(col("event_type"),
        concat(lit("arm_"), pmod(col("user_id"), lit(2L))).as("arm"))
      Profiling.chi2Independence(ev, "event_type", "arm")
    }),
    "q_ks_users" -> ((s, dir) => {
      // Exact two-sample KS statistic between the even/odd-user value
      // samples — the global CDF cumsum runs as the distributed prefix sum
      // (range partition + offset broadcast), never one partition.
      // (Revived round-14: this entry was silently SHADOWED by a later
      // duplicate "q_ks_test" key — Map keeps the last binding — so it
      // had never reached the driver; it exercises Profiling.ksTest,
      // a different kernel than q_ks_test's ksTwoSample.)
      val ev = table(s, dir, "events")
        .select(col("user_id"), round(col("value") * 100, 0).cast("long").as("cents"))
      Profiling.ksTest(
        ev.filter(pmod(col("user_id"), lit(2L)) === 0L).select(col("cents")),
        ev.filter(pmod(col("user_id"), lit(2L)) =!= 0L).select(col("cents")),
        "cents")
    }),
    "q_recursive_cte" -> ((s, dir) => {
      // Spark 4's WITH RECURSIVE surface, end-to-end: an org-chart walk
      // over a deterministic binary-tree hierarchy (parent = key / 2) —
      // depth and root for every customer. The oracle runs the IDENTICAL
      // recursion shape in DuckDB; iteration count is log2(n), and each
      // step is a key-shuffled join of frontier × table (the same scale
      // class as q_bfs_hops' hand-rolled loop — this pins the SQL-native
      // spelling of it).
      table(s, dir, "customer").createOrReplaceTempView("graft_cust_rec")
      s.sql(
        """WITH RECURSIVE r(c_custkey, depth, root) AS (
          |  SELECT c_custkey, CAST(0 AS BIGINT) AS depth, c_custkey AS root
          |  FROM graft_cust_rec WHERE c_custkey = 1
          |  UNION ALL
          |  SELECT c.c_custkey, r.depth + CAST(1 AS BIGINT), r.root
          |  FROM graft_cust_rec c JOIN r ON (c.c_custkey div 2) = r.c_custkey
          |  WHERE c.c_custkey > 1)
          |SELECT c_custkey, depth, root FROM r""".stripMargin)
    }),
    "q_merge_upsert" -> ((s, dir) => {
      // Batch MERGE INTO: apply an upsert+tombstone change set to a base
      // snapshot in ONE key-shuffled full-outer join; every surviving row
      // tagged keep/insert/update/delete (absent-key tombstones vanish).
      val o = table(s, dir, "orders").select(col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
        col("o_orderstatus"))
      val base = o.filter(col("o_orderkey") % 11L =!= 0L)
      val changes = o.filter(col("o_orderkey") % 13L === 0L)
        .select(col("o_orderkey"), (col("cents") + 1L).as("cents"),
          lower(col("o_orderstatus")).as("o_orderstatus"),
          (col("o_orderkey") % 17L === 0L).as("is_delete"))
      graft.operators.Cdc.mergeUpsert(base, changes,
        Seq("o_orderkey"), Seq("cents", "o_orderstatus"))
    }),
    "q_skyline" -> ((s, dir) => {
      // 2-D Pareto frontier (min price, max recency) via local-prune +
      // tiny-global window — the full table never crosses one partition.
      // Oracle is an independent NOT EXISTS all-pairs formulation.
      val o = table(s, dir, "orders").select(
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
        datediff(col("o_orderdate"), to_date(lit("1970-01-01")))
          .cast("long").as("d"))
      graft.operators.Skyline.skyline2D(o, "cents", "d")
    }),
    "q_winsorize" -> ((s, dir) => {
      // Per-type outlier clipping at the exact interpolated [p10, p90] —
      // the normalization step before a metric can gate or weight rows.
      // One tiny per-group quantile agg broadcast back onto the unshuffled
      // scan (Normalize.winsorize): narrow map + broadcast join at 100 TB.
      val ev = table(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      Normalize.winsorize(ev, "event_type", "cents", 0.1, 0.9)
        .select(col("event_id"), col("event_type"), col("cents"), col("v_wins"))
    }),
    "q_zscore_norm" -> ((s, dir) => {
      // Per-source z-score of doc token counts from EXACT integer moments
      // (n, Σx, Σx²) — aggregation-order-independent, unlike a distributed
      // float mean/stddev. Same broadcast-stats-back shape as q_winsorize.
      val d = table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
      Normalize.zscore(d, "source", "n_tokens")
        .select(col("doc_id"), col("source"), col("n_tokens"), col("z"))
    }),
    "q_percentile" -> ((s, dir) =>
      // Exact percentiles (linear interpolation) over integer cents — the
      // sort-based exact path; approx_percentile is the 100 TB variant.
      table(s, dir, "events")
        .select(col("event_type"), round(col("value") * 100, 0).cast("long").as("cents"))
        .groupBy(col("event_type"))
        .agg(expr("percentile(cents, array(0.5D, 0.9D, 0.99D))").as("p"))
        .select(
          col("event_type"),
          round(element_at(col("p"), 1), 6).as("p50"),
          round(element_at(col("p"), 2), 6).as("p90"),
          round(element_at(col("p"), 3), 6).as("p99"))),
    "q_histogram" -> ((s, dir) =>
      // Fixed-width histogram on integer cents (25 000-dollar buckets) —
      // deterministic bucket math, single hash aggregate.
      table(s, dir, "orders")
        .select(round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        .groupBy(expr("cents div 2500000").as("bucket"))
        .agg(
          count(lit(1)).as("n"),
          min(col("cents")).as("min_cents"),
          max(col("cents")).as("max_cents"))),
    "q_hash_sample" -> ((s, dir) =>
      // Deterministic ~5% sample by portable md5 bucket — reproducible
      // across engines/partitionings, unlike df.sample().
      graft.operators.Sampling
        .sampleByHash(
          table(s, dir, "events").select(col("event_id"), col("user_id"), col("event_type")),
          "event_id", pct = 5)
        .withColumn("hb", graft.operators.Sampling.hashBucket(col("event_id"), 100))),
    "q_train_split" -> ((s, dir) =>
      // Stable 80/10/10 train/val/test assignment, counted per event_type.
      graft.operators.Sampling
        .trainValTestSplit(table(s, dir, "events"), "event_id")
        .groupBy(col("split"), col("event_type"))
        .agg(count(lit(1)).as("n"))),
    "q_split_leakage_safe" -> ((s, dir) => {
      // Near-dup-cluster-aware 80/10/10 split: hashing each doc's own id
      // (q_train_split) lets near-duplicate docs straddle train and test —
      // eval contamination. Hashing the cluster representative keeps every
      // near-dup component wholly in one split.
      val d = table(s, dir, "documents")
      val pairs = Dedup.nearDupMinhash(d, threshold = 0.5)
        .select(col("doc_a"), col("doc_b"))
      graft.operators.Sampling.leakageSafeSplit(d, pairs)
        .select(col("doc_id"), col("rep"), col("split"))
    }),
    "q_stratified_sample" -> ((s, dir) =>
      // Per-language keep rates (downsample dominant strata, keep rare ones)
      // with stratum-salted hash buckets — deterministic, filter pushes down.
      graft.operators.Sampling.stratifiedSample(
        table(s, dir, "documents").select(col("doc_id"), col("lang"), col("source")),
        "doc_id", "lang",
        pcts = Map("en" -> 60, "fr" -> 30, "es" -> 15), defaultPct = 10)),
    "q_chunk_docs" -> ((s, dir) =>
      // Fixed-size token chunking (context-window packing) — one Generate,
      // no shuffle; ragged last chunk keeps every token exactly once.
      TextAnalysis.chunkDocuments(table(s, dir, "documents"), chunkSize = 50)),
    "q_edit_distance" -> ((s, dir) => {
      // Levenshtein verify step over deterministic (id, id+1) pairs — the
      // exact edit-distance check an LSH candidate pipeline would run last.
      val d = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val a = d.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
      val b = d.select(col("doc_id").as("doc_b"), col("text").as("text_b"))
      a.join(b, col("doc_b") === col("doc_a") + 1L)
        // single-file parquet arrives as ONE partition and the broadcast
        // join preserves it — spread the O(len²) DP across cores first.
        // EXPLICIT partition count: AQE's byte-based coalescing would fold
        // these few KB of text back into one partition, but the cost here
        // is CPU per row, not bytes (measured: 3.8 s coalesced vs sub-second
        // spread)
        .repartition(s.sparkContext.defaultParallelism, col("doc_a"))
        .select(col("doc_a"), col("doc_b"),
          levenshtein(col("text_a"), col("text_b")).cast("long").as("edit_dist"),
          // lit(1) guards the two-empty-texts 0/0 (NaN vs oracle mismatch)
          round(
            levenshtein(col("text_a"), col("text_b")).cast("double") /
              greatest(length(col("text_a")), length(col("text_b")), lit(1)).cast("double"),
            6).as("edit_ratio"))
    }),
    "q_quality_score" -> ((s, dir) =>
      TextAnalysis.qualityScore(table(s, dir, "documents"))),
    "q_train_pipeline" -> ((s, dir) => {
      // END-TO-END training-data pipeline composed purely from the library
      // operators — quality gate → exact dedup → context-window chunking →
      // deterministic 80/10/10 split — and still fully oracled because
      // every stage is. (The testdata has no exact-duplicate texts, so the
      // dedup stage passes everything through here; its behavior under real
      // duplicates is covered by q_dedup_exact and ExtensionSpec.)
      // Output: per-split corpus accounting, the numbers a training run
      // starts from.
      val d = table(s, dir, "documents")
      val ok = TextAnalysis.qualityScore(d)
        .filter(col("verdict") === "ok").select(col("doc_id"))
      val gated = d.join(ok, Seq("doc_id"), "left_semi")
      val chunks = TextAnalysis
        .chunkDocuments(graft.operators.Dedup.exact(gated), chunkSize = 50)
        .withColumn("chunk_id", concat_ws("_", col("doc_id"), col("chunk_idx")))
      graft.operators.Sampling.trainValTestSplit(chunks, "chunk_id")
        .groupBy(col("split"))
        .agg(
          count(lit(1)).as("n_chunks"),
          countDistinct(col("doc_id")).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"))
    }),
    "q_curation_pipeline" -> ((s, dir) => {
      // Round-7 pipeline composition over the NEW curation tiers: Gopher
      // quality gate → corpus-wide boilerplate gate (integer-exact 0.6
      // threshold: 5·n_common ≤ 3·n_shingles) → token-budget mix (8k
      // budget, source-name weights) → per-source corpus accounting.
      // Fully oracled because every stage is.
      val d = table(s, dir, "documents")
      val ok = TextAnalysis.qualityScore(d)
        .filter(col("verdict") === "ok").select(col("doc_id"))
      val lowBp = TextAnalysis.boilerplateProfile(d, dfThreshold = 10L)
        .filter(col("n_shingles") === 0L || col("n_common") * 5 <= col("n_shingles") * 3)
        .select(col("doc_id"))
      // materialize the gated corpus ONCE: both the weight derivation and
      // the mix's prefix-sum checkpoint consume `gated`, and those run as
      // SEPARATE jobs (the mix materializes eagerly) — without this, the
      // quality + boilerplate pipeline is evaluated twice, since exchange
      // reuse cannot cross job boundaries. Only the three columns the
      // downstream stages read are kept.
      val gated = d.join(ok, Seq("doc_id"), "left_semi")
        .join(lowBp, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("source"), col("text"))
        .materialize
      val w = gated.select(col("source")).distinct()
        .withColumn("weight", (ascii(substring(col("source"), -1, 1)) % 3 + 1).cast("long"))
      Sampling.tokenBudgetMix(gated, w, totalBudget = 8000L)
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"))
    }),
    "q_unpivot" -> ((s, dir) => {
      // Wide->long unpivot (melt) of four lineitem measures, aggregated.
      val cents = table(s, dir, "lineitem").select(
        round(col("l_quantity") * 100, 0).cast("long").as("quantity"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("extendedprice"),
        round(col("l_discount") * 100, 0).cast("long").as("discount"),
        round(col("l_tax") * 100, 0).cast("long").as("tax"))
      cents
        .unpivot(
          Array.empty[org.apache.spark.sql.Column],
          Array(col("quantity"), col("extendedprice"), col("discount"), col("tax")),
          "metric", "cents")
        .groupBy(col("metric"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
    }),
    // ---- Round 3: RANGE-frame windows, global sort, approx percentiles
    "q_window_range" -> ((s, dir) => {
      // RANGE-frame window (the value-based frame type rowsBetween can't
      // express): trailing-30-day spend per customer. The frame is keyed on
      // integer days-since-epoch, so ties (same customer, same day) share
      // one frame and the result is deterministic under any row order.
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
        .rangeBetween(-29, Window.currentRow)
      // o_orderdate is parquet timestamp[ms] without tz -> TIMESTAMP_NTZ;
      // cast through TIMESTAMP (session tz is UTC, so the cast is identity)
      // for unix_millis.
      table(s, dir, "orders")
        .withColumn("day", expr("unix_millis(cast(o_orderdate as timestamp)) div 86400000"))
        .withColumn("cents", cents)
        .withColumn("trailing_cents", sum(col("cents")).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("day"), col("trailing_cents"))
    }),
    "q_global_sort" -> ((s, dir) =>
      // Full global sort (not top-k): plans a range-partitioned Exchange +
      // per-partition sort — the scalable total-order path (sampled range
      // boundaries, no single-reducer bottleneck). Plan shape + cross-
      // partition ordering asserted in Round3OperatorsSpec; the driver's
      // hash compare is order-insensitive by construction.
      table(s, dir, "orders")
        .select(
          col("o_orderkey"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("odate_ms"),
          col("o_totalprice"))
        .orderBy(col("odate_ms"), col("o_orderkey"))),
    "q_approx_percentile" -> ((s, dir) =>
      // Sketch-based percentile (approx_percentile) — the 100 TB variant of
      // q_percentile's exact sort-based path: fixed-size mergeable sketch
      // per group, no full sort. Sketch values differ across engines, so
      // the output carries the EXACT percentiles (oracled, same expression
      // as q_percentile) plus bounded-error assertions: accuracy = 10000
      // guarantees rank error ≤ n/10000, so each estimate must land within
      // the exact value envelope at p ± 0.001 (a 10× margin on the rank
      // guarantee at this sf). The oracle asserts the exact columns and
      // ok50/ok90/ok99 = 1 — an out-of-bound sketch fails the hash gate.
      table(s, dir, "events")
        .select(col("event_type"), round(col("value") * 100, 0).cast("long").as("cents"))
        .groupBy(col("event_type"))
        .agg(
          expr("percentile(cents, array(0.499D, 0.5D, 0.501D, 0.899D, 0.9D, 0.901D, 0.989D, 0.99D, 0.991D))").as("pe"),
          expr("approx_percentile(cents, array(0.5D, 0.9D, 0.99D), 10000)").as("pa"))
        .select(
          col("event_type"),
          round(element_at(col("pe"), 2), 6).as("p50"),
          round(element_at(col("pe"), 5), 6).as("p90"),
          round(element_at(col("pe"), 8), 6).as("p99"),
          (element_at(col("pa"), 1) >= floor(element_at(col("pe"), 1)) &&
            element_at(col("pa"), 1) <= ceil(element_at(col("pe"), 3))).cast("int").as("ok50"),
          (element_at(col("pa"), 2) >= floor(element_at(col("pe"), 4)) &&
            element_at(col("pa"), 2) <= ceil(element_at(col("pe"), 6))).cast("int").as("ok90"),
          (element_at(col("pa"), 3) >= floor(element_at(col("pe"), 7)) &&
            element_at(col("pa"), 3) <= ceil(element_at(col("pe"), 9))).cast("int").as("ok99"))),

    "q_stats_agg" -> ((s, dir) =>
      // Statistical aggregate family (stddev/variance/corr/covar) — both
      // engines use numerically-stable merge formulas; round(x, 6) absorbs
      // the sub-1e-10 float jitter (values are O(10-1e5), 60k rows).
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("covar_qty_disc"))),
    "q_window_ntile" -> ((s, dir) => {
      // Distribution-window family: ntile/percent_rank/cume_dist over a
      // total order (cents desc, key) so every rank is deterministic.
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(cents.desc, col("o_orderkey"))
      table(s, dir, "orders")
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("pct_rank", round(percent_rank().over(w), 6))
        .withColumn("cume", round(cume_dist().over(w), 6))
        .select(col("o_orderpriority"), col("o_orderkey"),
          col("quartile"), col("pct_rank"), col("cume"))
    }),

    "q_date_arith" -> ((s, dir) => {
      // Date-arithmetic surface: trunc-to-month, last_day, add_months
      // (end-of-month clamping — both engines clamp), dayofweek. All
      // emitted as integer day/ms numbers so the compare is exact.
      val od = to_date(col("o_orderdate"))
      table(s, dir, "orders")
        .groupBy(unix_millis(date_trunc("month", col("o_orderdate").cast("timestamp")))
          .as("month_ms"))
        .agg(
          count(lit(1)).as("n"),
          sum(datediff(last_day(od), od).cast("long")).as("sum_days_to_eom"),
          sum(datediff(add_months(od, 3), to_date(lit("1970-01-01"))).cast("long"))
            .as("sum_plus3m_day"),
          sum(dayofweek(od).cast("long")).as("sum_dow"))
    }),
    "q_multi_distinct" -> ((s, dir) =>
      // Several COUNT(DISTINCT) in ONE aggregate — Catalyst plans Expand
      // (row replicated per distinct column set) + two-phase agg, the OLAP
      // shape single-distinct queries never exercise.
      table(s, dir, "events")
        .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
        .agg(
          countDistinct(col("user_id")).as("uniq_users"),
          countDistinct(col("event_type")).as("uniq_types"),
          count(lit(1)).as("n"))),
    "q_session_window_dynamic" -> ((s, dir) =>
      // DYNAMIC per-event gap: a purchase holds the session open 60 min,
      // anything else 15 min — session_window(ts, gapExpr) with a per-row
      // gap expression. Oracled exactly: with events time-ordered, event i
      // starts a new session iff ts_i >= max_{j<i}(ts_j + gap_j) — earlier
      // sessions' ends are <= the break timestamps between them, so the
      // running max over ALL previous window-ends equals the current
      // session's end wherever the comparison matters. Millis truncation
      // as in q_session_window_builtin.
      table(s, dir, "events")
        .withColumn("ts_ms", timestamp_millis(unix_millis(col("ts"))))
        .groupBy(
          col("user_id"),
          session_window(
            col("ts_ms"),
            when(col("event_type") === "purchase", "60 minutes").otherwise("15 minutes")).as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), unix_millis(col("w.start")).as("start_ms"),
          unix_millis(col("w.end")).as("end_ms"), col("n_events"))),
    "q_session_window_builtin" -> ((s, dir) =>
      // Spark's BUILT-IN session_window beside the hand-rolled engine: a
      // user of the reference gets gap sessionization from a one-liner when
      // they don't need the full rule set (size/duration cuts, running
      // duration). Boundary semantics differ from the reference rule by
      // design: session_window merges half-open [t, t+gap) intervals at
      // full timestamp precision while the reference compares FLOORED
      // SECONDS. The event column is truncated to MILLIS first — the
      // testdata carries sub-millisecond micros, and a micros-precision
      // merge could disagree with the millis-arithmetic oracle on gaps
      // within 1 ms of the 30-min boundary.
      table(s, dir, "events")
        .withColumn("ts_ms", timestamp_millis(unix_millis(col("ts"))))
        .groupBy(col("user_id"), session_window(col("ts_ms"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(
          col("user_id"),
          unix_millis(col("w.start")).as("start_ms"),
          unix_millis(col("w.end")).as("end_ms"),
          col("n_events"))),

    "q_freq_items" -> ((s, dir) =>
      // Approximate frequent items (Karp-Papadimitriou-Shenker misses-count
      // sketch via DataFrameStatFunctions.freqItems) — the heavy-hitters
      // member of the sketch family beside HLL (q_approx_distinct) and the
      // quantile sketch (q_approx_percentile). Support 0.01 on event_type
      // (5 distinct values, all far above 1%) makes the ITEM SET exact and
      // deterministic: the KPS map holds 1/support = 100 slots, the column
      // has 5 distinct values, so no decrement ever fires and the sketch
      // returns exactly the distinct set regardless of partitioning. The
      // exploded + sorted set therefore oracles as DISTINCT event_type.
      table(s, dir, "events").stat.freqItems(Seq("event_type"), 0.01)
        .select(explode(col("event_type_freqItems")).as("event_type"))
        .orderBy(col("event_type"))),
    "q_streaming_update" -> ((s, dir) => {
      // UPDATE output mode — the third Structured-Streaming mode (complete
      // and append are covered above): emits only rows whose aggregate
      // changed in the trigger. The single events.parquet file arrives as
      // one microbatch, so every group changes exactly once and the update
      // stream equals the full aggregate — which is what the oracle checks;
      // multi-batch replays would interleave intermediate states (a
      // changelog, documented here, not claimed deterministic in general).
      val agg = eventsStream(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"))
      runToMemory(s, agg, "update")
    }),

    "q_stream_funnel" -> ((s, dir) => {
      // Streaming ordered funnel: flatMapGroupsWithState with three-long
      // per-user state (no event buffering). Single-file source = one
      // microbatch, so the update stream equals the batch funnel — the
      // oracle is literally q_funnel's.
      import s.implicits._
      val ev = eventsStream(s, dir)
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"),
          when(col("event_type") === "view", 1)
            .when(col("event_type") === "click", 2)
            .otherwise(3).as("step"),
          unix_millis(col("ts")).as("ts_ms"))
        .as[graft.streaming.StreamingFunnel.Ev]
      runToMemory(s, graft.streaming.StreamingFunnel.funnel3(ev).toDF(), "update")
    }),

    "q_stream_cusum" -> ((s, dir) => {
      // Streaming two-sided CUSUM over per-event spend: two-long per-user
      // state, update-mode changelog. Single-file source = one microbatch,
      // so the fold equals the batch recurrence — the oracle replays it
      // with a recursive CTE in event order.
      import s.implicits._
      val ev = eventsStream(s, dir)
        .select(col("user_id").as("key"),
          unix_millis(col("ts")).as("ts_ms"),
          col("event_id").as("tie"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("x"))
        .as[graft.streaming.StreamingCusum.Ev]
      runToMemory(s,
        graft.streaming.StreamingCusum.cusum(ev,
          target = 500L, drift = 50L, threshold = 2000L).toDF(), "update")
    }),
    "q_stream_cadence" -> ((s, dir) => {
      // Streaming bot screen: five-long per-user state (exact gap
      // moments + last position), update-mode one-row-per-key
      // changelog; cv/is_regular finish with the SAME shared SQL the
      // batch operator and oracle use. Single-file source = one
      // microbatch, so moments equal the batch fold.
      import s.implicits._
      val ev = eventsStream(s, dir)
        .select(col("user_id").as("key"),
          unix_millis(col("ts")).as("ts_ms"),
          col("event_id").as("tie"))
        .as[graft.streaming.StreamingCadence.Ev]
      runToMemory(s,
        graft.streaming.StreamingCadence.cadence(ev).toDF(), "update")
        .withColumn("cv", expr(Sessionize.cadenceCvSql))
        .withColumn("is_regular",
          expr(s"${Sessionize.cadenceCvSql} < 0.1 AND n_gaps >= 5"))
    }),
    "q_stream_foreach_merge" -> ((s, dir) => {
      // foreachBatch incremental-merge sink (MergeSink): update-mode per-user
      // counts merged into a versioned parquet serving table batch by batch —
      // the "streaming aggregate → queryable store without native upsert"
      // production pattern, effectively-once via per-batchId idempotent
      // republish. The single-file source is one batch here, so the final
      // version equals the batch aggregate (what the oracle checks);
      // multi-batch merging and crash-replay idempotency are pinned in
      // StreamingSpec.
      val agg = eventsStream(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      runMergeSink(s, agg, Seq("user_id"))
    }),
    "q_streaming_window" -> ((s, dir) => {
      // Streaming tumbling-window aggregation (complete mode, memory sink):
      // the windowed-agg surface of Structured Streaming with a full SQL
      // oracle — window(ts, 6h) is UTC-epoch-aligned, so the oracle is pure
      // integer bucket math.
      val agg = eventsStream(s, dir)
        .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_millis(col("w.start")).as("win_start_ms"), col("event_type"), col("n"))
      runToMemory(s, agg, "complete")
    }),
    "q_streaming_sliding" -> ((s, dir) => {
      // SLIDING (hopping) window aggregation — tumbling's overlapping
      // sibling: every event lands in windowLen/slide = 2 windows. The
      // oracle replays Spark's epoch-aligned window set exactly: starts =
      // {floor(ms/slide)·slide − slide, floor(ms/slide)·slide}.
      val agg = eventsStream(s, dir)
        .groupBy(window(col("ts"), "6 hours", "3 hours").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_millis(col("w.start")).as("win_start_ms"), col("event_type"), col("n"))
      runToMemory(s, agg, "complete")
    }),
    "q_dedup_stream" -> ((s, dir) => {
      // Streaming exact dedup (dropDuplicates state): emits each user_id the
      // first time it is seen. Projected to the key before dedup, so the
      // result set is deterministic and oracle-checkable. Drained through
      // the parquet FILE sink (append mode): executor→disk, no driver hop.
      val distinctUsers = eventsStream(s, dir).select(col("user_id")).dropDuplicates("user_id")
      runToFiles(s, distinctUsers)
    }),
    "q_stream_dedup_watermark" -> ((s, dir) => {
      // dropDuplicatesWithinWatermark: streaming dedup whose per-key state
      // is EVICTED once the watermark passes — the bounded-state variant of
      // q_dedup_stream (whose dropDuplicates state grows forever). At 100 TB
      // this is the only sustainable streaming-dedup shape: state holds one
      // watermark window of keys, not the full history. Key-only projection
      // keeps the kept-row choice deterministic for the oracle.
      val dedup = eventsStream(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .select(col("user_id"), col("event_type"))
      runToFiles(s, dedup)
    }),
    "q_stream_static_join" -> ((s, dir) => {
      // Stream-static enrichment join (the 100 TB streaming pattern: facts
      // stream, dimension broadcast per microbatch) + stateful agg.
      val cust = table(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
      val joined = eventsStream(s, dir)
        .join(cust, col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      runToMemory(s, joined, "complete")
    }),
    "q_stream_stream_join" -> ((s, dir) => {
      // Stream-stream interval self-join: purchases matched to the same
      // user's clicks within the preceding hour. Watermarks + the time-range
      // condition bound the join state on both sides (append mode) — the
      // real Structured Streaming two-stream path. Determinism caveat: the
      // 60 s watermark against a 1 h join interval is safe HERE because the
      // single events.parquet file arrives as one microbatch (and
      // StreamingJoinSpec's chunked replay feeds event-time-ordered chunks);
      // a source that splits time-unsorted data across microbatches could
      // late-drop rows >60 s behind the max seen event time. Size the
      // watermark to the data's maximum disorder in such deployments.
      val ev = eventsStream(s, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
        .withWatermark("p_ts", "60 seconds")
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
        .withWatermark("c_ts", "60 seconds")
      val j = p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"))
        .select(col("p_id"), col("c_id"),
          unix_millis(col("p_ts")).as("p_ts_ms"), unix_millis(col("c_ts")).as("c_ts_ms"))
      runToFiles(s, j)
    }),
    "q_stream_quality_gate" -> ((s, dir) => {
      // The batch text operators run UNCHANGED on a stream: qualityScore
      // (narrow maps) over a documents file-source stream, aggregated per
      // verdict in complete mode. Proves the ingest gate composes with
      // Structured Streaming; oracle = the shared qualityCte replay.
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
      val agg = TextAnalysis.qualityScore(src)
        .groupBy(col("verdict")).agg(count(lit(1)).as("n"))
      runToMemory(s, agg, "complete")
    }),
    "q_stream_dedup_docs" -> ((s, dir) => {
      // Streaming exact CONTENT dedup: first occurrence per md5(text),
      // projected to the digest so the emitted set is deterministic
      // (the q_dedup_stream pattern, on content instead of keys).
      // Executor→disk drain via the parquet file sink.
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
      runToFiles(s, src.select(md5(col("text")).as("text_md5"))
        .dropDuplicates("text_md5"))
    }),
    "q_dedup_normalized" -> ((s, dir) => {
      // Casing/punctuation-insensitive dedup tier. The synthetic corpus has
      // no case/punct variants (it is already lowercase soup, 0 exact dups),
      // so splice them: every 7th doc gains a shouted+decorated twin at
      // -(doc_id+1) — a namespace no real corpus id can collide with at ANY
      // scale (a fixed +offset would collide once ids reach it, fanning out
      // normalizedExact's join-back into duplicate rows). Twins normalize
      // back onto their base (n_group=2; min-id keeps the negative twin,
      // replayed identically by the oracle). The oracle rebuilds the union
      // and mirrors the normalization in RE2.
      val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val variants = docs.filter(col("doc_id") % 7 === 0)
        .select(
          (-(col("doc_id") + 1L)).as("doc_id"),
          concat(lit("  "), upper(col("text")), lit("  !!")).as("text"))
      Dedup.normalizedExact(docs.unionByName(variants))
    }),
    "q_bigram_logprob" -> ((s, dir) =>
      // Bigram LM quality score: corpus-conditional P(w2|w1) via windows
      // over the (doc, w1, w2) counts — vocabulary-sized tables, never
      // broadcast (the q_tfidf discipline).
      TextAnalysis.bigramLogProb(table(s, dir, "documents"))),
    "q_zipf" -> ((s, dir) =>
      // Rank-frequency slope per language — corpus-health diagnostic;
      // closed-form least-squares via regr_slope (Spark >= 3.4 builtin).
      TextAnalysis.zipfSlope(table(s, dir, "documents"))),
    "q_mixture_sample" -> ((s, dir) =>
      // Data-mixing: per-domain ppm-quantized keep rates toward target
      // corpus shares (src3 lands exactly at rate 1.0 — the cap boundary;
      // src4 over-caps; absent domains drop to 0).
      Sampling.mixtureSample(
        table(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id", "source",
        Map("src0" -> 0.002, "src1" -> 0.01, "src2" -> 0.02,
          "src3" -> 0.05, "src4" -> 0.08))
        .select(col("doc_id"), col("source"), col("keep_ppm"))),
    "q_histogram_equalize" -> ((s, dir) =>
      // Flatten the document-length histogram (100-char bins): every bin
      // downsampled to the smallest bin's volume, ppm rates derived from
      // the data's own counts — exact integer math, oracle-replayable.
      Sampling.histogramEqualize(
        table(s, dir, "documents")
          .select(col("doc_id"), expr("n_chars div 100").as("len_bin")),
        "doc_id", "len_bin")
        .select(col("doc_id"), col("len_bin"), col("keep_ppm"))),
    "q_budget_select" -> ((s, dir) => {
      // Quality-first selection: same per-source budgets as
      // q_token_budget_mix but filled LONGEST-DOC-FIRST (-n_chars as the
      // quality proxy) instead of hash order — the greedy
      // select-best-under-budget curation step.
      val d = table(s, dir, "documents")
      val w = d.select(col("source")).distinct()
        .withColumn("weight", (ascii(substring(col("source"), -1, 1)) % 3 + 1).cast("long"))
      Sampling.tokenBudgetSelect(d, w, totalBudget = 10000L, orderCol = -col("n_chars"))
    }),
    "q_token_budget_mix" -> ((s, dir) => {
      // Exact token-budget mixing: per-source integer weights derived from
      // the source NAME (ascii of last char % 3 + 1 — sf-independent), 10k
      // total token budget, admission in md5(doc_id) order via the
      // distributed prefix sum (range partition + per-partition offsets).
      val d = table(s, dir, "documents")
      val w = d.select(col("source")).distinct()
        .withColumn("weight", (ascii(substring(col("source"), -1, 1)) % 3 + 1).cast("long"))
      Sampling.tokenBudgetMix(d, w, totalBudget = 10000L)
    }),
    "q_dedup_keep_best" -> ((s, dir) =>
      // Curation-policy dedup: per near-dup cluster keep the LONGEST member
      // (tie-break lowest id), not the lowest id — the policy real
      // pipelines want. Shares the MinHash cluster machinery + oracle CTEs.
      Dedup.dedupNearMinhashKeepBest(
        table(s, dir, "documents"), threshold = 0.5, scoreCol = "n_chars")
        .select(col("doc_id"), col("lang"), col("source"))),
    "q_embedding_centroids" -> ((s, dir) =>
      // Per-label centroids in exact 2^24 fixed-point (distributed float
      // means are summation-order-dependent; integer sums are not).
      Similarity.labelCentroids(table(s, dir, "embeddings"))),
    "q_kmeans_step" -> ((s, dir) =>
      // One hash-stable Lloyd iteration: deterministic lowest-id seeds,
      // rounded-cosine nearest-centroid assignment (broadcast centroids,
      // narrow map over the scan), refined centroids via exact 2^24
      // fixed-point sums in ONE (cell, dim)-keyed map-side-combined agg.
      Similarity.kmeansStep(
        table(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        nCentroids = 8)),
    "q_perplexity_sample" -> ((s, dir) => {
      // CCNet-style perplexity-bucket curation: score every doc with the
      // unigram LM, split the corpus at the exact 1/3 and 2/3 score
      // percentiles (a 2-row aggregate broadcast — NOT a global-order
      // ntile, which would serialize the corpus through one partition),
      // then keep head=100% / middle=50% / tail=10% by deterministic hash.
      // Scores are 1e6 fixed-point longs so the cutoff comparisons are
      // integer-exact against interpolated cutpoints in both engines.
      val scored = TextAnalysis.unigramLogProb(table(s, dir, "documents"))
        .select(col("doc_id"), round(col("avg_neg_logprob") * 1e6).cast("long").as("lp"))
      val cuts = scored
        .agg(expr("percentile(lp, array(0.33333333D, 0.66666667D))").as("c"))
        .select(element_at(col("c"), 1).as("c1"), element_at(col("c"), 2).as("c2"))
      val bucketed = scored.crossJoin(broadcast(cuts))
        .withColumn("bucket",
          when(col("lp") <= col("c1"), "head")
            .when(col("lp") <= col("c2"), "middle")
            .otherwise("tail"))
      val pct = when(col("bucket") === "head", 100)
        .when(col("bucket") === "middle", 50).otherwise(10)
      bucketed
        .filter(Sampling.hashBucket(
          concat(col("bucket"), lit(":"), col("doc_id")), 100) < pct)
        .select(col("doc_id"), col("lp"), col("bucket"))
    }),
    "q_heavy_hitters" -> ((s, dir) => {
      // Exact heavy hitters — the oracled companion to the q_freq_items
      // sketch: tokens above a 0.2% support threshold. Hash agg with
      // map-side combine + a 1-row total broadcast; at 100 TB this is the
      // two-pass exact alternative when sketch error bounds don't suffice.
      val tf = table(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).cast("long").as("freq"))
      val total = tf.agg(sum(col("freq")).cast("double").as("total"))
      tf.crossJoin(broadcast(total))
        .filter(col("freq").cast("double") > col("total") * 0.002)
        .select(col("token"), col("freq"))
    }),
    "q_cdc_chunk" -> ((s, dir) =>
      // Content-defined chunking: rolling-window hash boundaries (expected
      // chunk ~16 tokens), so insertions only shift chunks up to the next
      // content boundary — the storage-dedup property fixed windows lack.
      TextAnalysis.cdcChunk(table(s, dir, "documents"), window = 4, divisor = 16)),
    "q_bloom_join" -> ((s, dir) => {
      // Explicit bloom-prefiltered semi join: dim side = high-price orders,
      // fact side = lineitem. The bloom pass only reduces shuffled fact
      // rows; the semi join behind it removes false positives, so the
      // result — and the oracle — is the plain IN-subquery semi join.
      val li = table(s, dir, "lineitem")
      val hot = table(s, dir, "orders").filter(col("o_totalprice") > 450000.0)
      RuntimeFilter.bloomSemiJoin(li, "l_orderkey", hot, "o_orderkey",
        expectedItems = 20000L)
        .select(col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity"))
    }),
    "q_semdedup" -> ((s, dir) =>
      // SemDeDup: embedding-space near-duplicate pruning — cluster with the
      // deterministic seed centroids, keep the lowest-id member of every
      // in-cell cosine-≥0.35 neighborhood. The oracle replays the cell
      // assignment (same CTE as q_similarity_ivf) and the min-id keep rule.
      Similarity.semDedup(table(s, dir, "embeddings"), threshold = 0.35, nCentroids = 16)),
    "q_linear_classifier" -> ((s, dir) =>
      // Hashed-feature linear quality classifier (fastText-shaped): bucket
      // tokens with the portable 60-bit md5 hash, score = mean deterministic
      // per-bucket weight. No vocabulary table, no broadcast — the feature-
      // hashing trick IS the 100 TB design.
      TextAnalysis.hashedLinearScore(table(s, dir, "documents"), nBuckets = 1024)),
    "q_nb_classifier" -> ((s, dir) =>
      // Multinomial Naive Bayes trained in-query on a weak label
      // (lang = 'en') and scored on the same corpus: fit + transform is
      // three shuffles of closed-form aggregates — no optimizer loop, no
      // vocabulary broadcast (class counts are a token-keyed window).
      TextAnalysis.naiveBayesScore(table(s, dir, "documents"), col("lang") === "en")),
    "q_url_normalize" -> ((s, dir) => {
      // URL canonicalization: synthesize messy-but-valid URLs from events
      // (uppercase scheme/host, www., explicit port, tracking params,
      // unsorted params, fragment, trailing slash), canonicalize with
      // parse_url + array functions. The oracle does NOT replay the string
      // surgery — it reconstructs the expected canonical form from the
      // event columns directly, so any parse_url misuse diverges.
      val urls = table(s, dir, "events").select(
        col("event_id"),
        format_string(
          "HTTP://WWW.Host%d.example.com:8080/%s/%d/?utm_source=feed&b=%d&a=1&gclid=XYZ#sec%d",
          pmod(col("user_id"), lit(20L)),
          col("event_type"),
          pmod(col("event_id"), lit(50L)),
          pmod(col("event_id"), lit(3L)),
          pmod(col("event_id"), lit(7L))).as("url"))
      Urls.normalize(urls, "url").select(col("event_id"), col("url_norm"))
    }),
    "q_elb_source" -> ((s, dir) => {
      // Native DSv2 source for the reference's ELB log format: synthesized
      // lines written to a temp dir, read back via format("elb") — a real
      // TableProvider/Scan/PartitionReader chain with column pruning — and
      // projected to (ip, ts_ms). Shares q_parse_elb's oracle: the source
      // must reproduce the parser exactly (one shared parseLine).
      val lines = table(s, dir, "events").select(
        format_string(
          "%s elb u%d:%d 10.0.0.1:80 0.0 0.0 0.0 200 200 0 699 GET http://x/y HTTP/1.1",
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
          col("user_id"),
          col("event_id")).as("value"))
      val root = streamTempRoot("graft_elb_")
      lines.write.mode("overwrite").text(root.toString)
      val result = s.read.format("elb").load(root.toString)
        .select(col("ip"), col("ts_ms"))
        .materialize
      deleteRecursively(root.toFile)
      result
    }),
    "q_stream_elb_source" -> ((s, dir) => {
      // The reference's streaming file-source path (EP1) on the NATIVE
      // DSv2 connector: readStream.format("elb") over synthesized log
      // files, drained executor→disk. Same oracle as q_parse_elb — the
      // MicroBatchStream tier must reproduce the batch parse exactly.
      val lines = table(s, dir, "events").select(
        format_string(
          "%s elb u%d:%d 10.0.0.1:80 0.0 0.0 0.0 200 200 0 699 GET http://x/y HTTP/1.1",
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
          col("user_id"),
          col("event_id")).as("value"))
      val root = streamTempRoot("graft_elbs_")
      lines.write.mode("overwrite").text(root.toString)
      val result = runToFiles(s,
        s.readStream.format("elb").load(root.toString)
          .select(col("ip"), col("ts_ms")))
      deleteRecursively(root.toFile)
      result
    }),
    "q_csv_source" -> ((s, dir) => {
      // CSV batch source: round-trip the customer table through a quoted
      // CSV directory and aggregate from the CSV read. The oracle computes
      // the same aggregate from parquet — any quoting/parsing defect in
      // either direction diverges the hash.
      val src = table(s, dir, "customer")
      val root = streamTempRoot("graft_csv_")
      src.write.mode("overwrite").option("header", "true").csv(root.toString)
      // localCheckpoint materializes the (tiny) aggregate so the round-trip
      // copy can be deleted NOW instead of leaking per invocation
      val result = s.read.option("header", "true").schema(src.schema).csv(root.toString)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), round(sum(col("c_acctbal")), 2).as("bal"))
        .materialize
      deleteRecursively(root.toFile)
      result
    }),
    "q_orc_source" -> ((s, dir) => {
      // ORC batch source: round-trip events (incl. timestamps) through ORC
      // and aggregate from the ORC read; oracle aggregates from parquet.
      val src = table(s, dir, "events")
      val root = streamTempRoot("graft_orc_")
      src.write.mode("overwrite").orc(root.toString)
      val result = s.read.orc(root.toString)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("sum_value"),
          max(unix_millis(col("ts"))).as("max_ts_ms"))
        .materialize
      deleteRecursively(root.toFile)
      result
    }),
    "q_stream_interval_left_join" -> ((s, dir) => {
      // Stream-stream LEFT OUTER interval join — the completion-semantics
      // tier above q_stream_stream_join: unmatched purchases emit with null
      // click columns only once the global watermark proves no matching
      // click can still arrive (p_ts < min(max p_ts, max c_ts) - 60 s; the
      // oracle applies that exact cutoff). Same bounded-state interval
      // condition as the inner variant.
      val ev = eventsStream(s, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
        .withWatermark("p_ts", "60 seconds")
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
        .withWatermark("c_ts", "60 seconds")
      val j = p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"),
        "leftOuter")
        .select(col("p_id"), col("c_id"),
          unix_millis(col("p_ts")).as("p_ts_ms"), unix_millis(col("c_ts")).as("c_ts_ms"))
      runToFiles(s, j)
    }),
    "q_minhash_estimate" -> ((s, dir) => {
      // Sketch-accuracy query: per adjacent-id doc pair, the MinHash
      // estimate (fraction of agreeing signature slots) NEXT TO the exact
      // shingle Jaccard it approximates — the verification a sketch
      // deployment needs. Both columns oracled: the affine signature family
      // is replayed bit-for-bit in SQL.
      val st = Dedup.shingleSigTable(table(s, dir, "documents"), "doc_id", "text", 3, 16)
      // filter on the cheap __has twin (pushdown-safe), not the sig —
      // see shingleSigTable's scaladoc
      val a = st.filter(col("__has")).select(col("doc_id").as("doc_a"),
        col("__sh").as("sh_a"), col("__sig").as("sig_a"))
      val b = st.filter(col("__has")).select((col("doc_id") - 1).as("doc_a"),
        col("doc_id").as("doc_b"),
        col("__sh").as("sh_b"), col("__sig").as("sig_b"))
      a.join(b, Seq("doc_a"))
        .select(
          col("doc_a"), col("doc_b"),
          graft.functions.TextFunctions.jaccard(col("sh_a"), col("sh_b")).as("jaccard_exact"),
          round(size(filter(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => x === y), p => p)).cast("double") / 16.0, 6).as("jaccard_est"))
    }),
    "q_skew_profile" -> ((s, dir) =>
      // Join-key skew diagnostics: per event_type, user_id key counts and
      // the max/mean skew ratio — the pre-join measurement that decides
      // broadcast vs salt vs AQE skew-split.
      Profiling.keySkew(table(s, dir, "events"), "event_type", "user_id")),
    "q_profile_table" -> ((s, dir) =>
      // Per-column quality audit of orders (nulls, exact distinct, min/max)
      // — long/string/timestamp columns only; double min/max stringification
      // differs across engines so doubles profile through typed queries.
      Profiling.profile(table(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))),
    "q_weighted_sample" -> ((s, dir) => {
      // Quality-weighted curation: keep probability = min(n_chars·1250,
      // 1e6) micro-units — exact integer weights end-to-end, so the
      // keep set is bit-stable across engines and partitionings.
      val docs = table(s, dir, "documents")
        .withColumn("w_micro", least(col("n_chars") * 1250L, lit(1000000L)))
      Sampling.weightedSample(docs, "doc_id", col("w_micro"))
        .select(col("doc_id"), col("n_chars"), col("w_micro"))
    }),
    "q_asof_merge" -> ((s, dir) => {
      // Same relation as q_asof_join, computed by the CUSTOM PLAN tier:
      // AsOfJoinPlan -> AsOfJoinStrategy -> AsOfJoinExec (co-partitioned
      // sorted merge; no union, no window buffer). The shared oracle is
      // the strongest cross-strategy equivalence check the driver runs.
      val ev = table(s, dir, "events").withColumn("ts_ms", unix_millis(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_ms"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_ms"))
      graft.operators.Temporal
        .asofJoinMerge(purchases, clicks, "user_id", "ts_ms", "event_id",
          payload = Seq("event_id", "ts_ms"))
        .select(
          col("event_id"), col("user_id"), col("ts_ms"),
          coalesce(col("asof_event_id"), lit(-1L)).as("click_event_id"),
          coalesce(expr("ts_ms div 1000 - asof_ts_ms div 1000"), lit(-1L)).as("gap_s"))
    }),
    "q_asof_merge_fwd" -> ((s, dir) => {
      // Forward direction of the custom merge exec — next click
      // at-or-after each purchase, no buffered row at all (the sorted
      // right lookahead IS the match). Shares q_asof_forward's oracle.
      val ev = table(s, dir, "events").withColumn("ts_ms", unix_millis(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_ms"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_ms"))
      graft.operators.Temporal
        .asofJoinMerge(purchases, clicks, "user_id", "ts_ms", "event_id",
          payload = Seq("event_id", "ts_ms"), forward = true)
        .select(
          col("event_id"), col("user_id"), col("ts_ms"),
          coalesce(col("asof_event_id"), lit(-1L)).as("click_event_id"),
          coalesce(col("asof_ts_ms") - col("ts_ms"), lit(-1L)).as("lead_ms"))
    }),
    "q_asof_forward" -> ((s, dir) => {
      // Forward as-of: each purchase matched to the user's NEXT click
      // at-or-after it (lead-time shape). Mirror of q_asof_join.
      val ev = table(s, dir, "events").withColumn("ts_ms", unix_millis(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_ms"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_ms"))
      graft.operators.Temporal
        .asofJoinForward(purchases, clicks, "user_id", "ts_ms", "event_id",
          payload = Seq("event_id", "ts_ms"))
        .select(
          col("event_id"), col("user_id"), col("ts_ms"),
          coalesce(col("asof_event_id"), lit(-1L)).as("click_event_id"),
          coalesce(col("asof_ts_ms") - col("ts_ms"), lit(-1L)).as("lead_ms"))
    }),
    "q_asof_nearest" -> ((s, dir) => {
      // Nearest as-of: the closer of the prior and next click (ties to
      // prior). Both directions in one shuffle via two window specs.
      val ev = table(s, dir, "events").withColumn("ts_ms", unix_millis(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_ms"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_ms"))
      graft.operators.Temporal
        .asofJoinNearest(purchases, clicks, "user_id", "ts_ms", "event_id",
          payload = Seq("event_id", "ts_ms"))
        .select(
          col("event_id"), col("user_id"), col("ts_ms"),
          coalesce(col("asof_event_id"), lit(-1L)).as("click_event_id"),
          coalesce(col("asof_ts_ms") - col("ts_ms"), lit(0L)).as("gap_ms"))
    }),
    "q_overlap_join" -> ((s, dir) => {
      // Interval-overlap join (order activity windows × synthesized
      // campaign windows) via double-sided binning — the no-BNLJ,
      // no-broadcast-ceiling shape.
      val day = 86400000L
      val od = col("o_orderdate").cast("timestamp") // NTZ -> UTC session ts
      val a = table(s, dir, "orders").select(
        col("o_orderkey"),
        unix_millis(od).as("lo_a"),
        (unix_millis(od) + (pmod(col("o_orderkey"), lit(20L)) + 1L) * day).as("hi_a"))
      val epoch92 = unix_millis(to_timestamp(lit("1992-01-01")))
      val b = table(s, dir, "nation").select(
        col("n_nationkey").cast("long").as("n_nationkey"),
        (epoch92 + col("n_nationkey").cast("long") * 60L * day).as("lo_b"),
        (epoch92 + col("n_nationkey").cast("long") * 60L * day + 90L * day).as("hi_b"))
      graft.operators.Temporal.overlapJoinBinned(a, b, binSize = 30L * day,
        "o_orderkey", "lo_a", "hi_a", "n_nationkey", "lo_b", "hi_b")
    }),
    "q_quality_composite" -> ((s, dir) => {
      // Calibrated composite quality gate — what production curation ships:
      // heterogeneous signals (stopword density, symbol noise, unigram-LM
      // surprise) fused into one score with fixed weights (swap in trained
      // calibration weights; the plan — two aggregates joined on doc_id —
      // is identical). All inputs are round(,6) values, so the arithmetic
      // replays exactly.
      val docs = table(s, dir, "documents")
      val q = TextAnalysis.qualityScore(docs)
        .select(col("doc_id"), col("stopword_ratio"), col("symbol_ratio"))
      val u = TextAnalysis.unigramLogProb(docs)
        .select(col("doc_id"), col("avg_neg_logprob"))
      q.join(u, Seq("doc_id"))
        .withColumn("composite", round(
          least(col("stopword_ratio") * 5.0, lit(1.0)) * 0.4 +
            (lit(1.0) - least(col("symbol_ratio") * 10.0, lit(1.0))) * 0.3 +
            least(col("avg_neg_logprob") / 12.0, lit(1.0)) * 0.3, 6))
        .select(col("doc_id"), col("composite"),
          (col("composite") >= 0.55).as("keep"))
    }),
    "q_join_shuffle_hash" -> ((s, dir) => {
      // The third join-strategy tier: SHUFFLE_HASH hint — no sort on either
      // side (vs SMJ), no size ceiling on the build side (vs broadcast).
      // The hint is strategy-only, so the oracle is the plain join; the
      // chosen-strategy assertion lives in PlanShapeSpec.
      val li = table(s, dir, "lineitem")
      val o = table(s, dir, "orders").filter(col("o_totalprice") > 200000.0).hint("SHUFFLE_HASH")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
    }),
    "q_union_evolution" -> ((s, dir) => {
      // Schema-evolution union — ingesting crawl shards whose schemas
      // drifted: a v1 shard (no `lang`) and a v2 shard (adds `quality`)
      // merge by name with missing columns null-filled
      // (unionByName allowMissingColumns), then aggregate per source.
      val docs = table(s, dir, "documents")
      val v1 = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val v2 = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("lang"), (col("n_chars") > 200L).as("quality"))
      v1.unionByName(v2, allowMissingColumns = true)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n"),
          count(col("lang")).as("n_with_lang"),
          // all-v1 groups sum NULL over the null-filled column -> 0
          coalesce(sum(col("quality").cast("long")), lit(0L)).as("n_quality"),
          sum(col("n_chars")).as("sum_chars"))
    }),
    "q_sessionize_incremental" -> ((s, dir) => {
      // Incremental batch sessionization (the daily-increment pattern):
      // history split into three event-time-contiguous increments at exact
      // ts terciles, each sessionized locally and stitched through the
      // per-key state table. Shares q_sessionize_gap's oracle — the
      // stitched union must be row-identical to one full recompute.
      val ev = table(s, dir, "events")
      val cuts = ev
        .agg(expr("percentile(unix_millis(ts), array(0.33D, 0.66D))").as("c"))
        .select(element_at(col("c"), 1).cast("long").as("c1"),
          element_at(col("c"), 2).cast("long").as("c2"))
      def part(cond: Column): DataFrame =
        ev.crossJoin(broadcast(cuts)).filter(cond).drop("c1", "c2")
      val ms = unix_millis(col("ts"))
      val b1 = part(ms <= col("c1"))
      val b2 = part(ms > col("c1") && ms <= col("c2"))
      val b3 = part(ms > col("c2"))
      // localCheckpoint = the persisted state table a real daily job reads
      val (r1, s1) = Sessionize.incrementalGapSessionize(None, b1)
      val (r2, s2) = Sessionize.incrementalGapSessionize(Some(s1.materialize), b2)
      val (r3, _) = Sessionize.incrementalGapSessionize(Some(s2.materialize), b3)
      r1.unionByName(r2).unionByName(r3).select(
        col("event_id"), col("user_id"), unix_millis(col("ts")).as("ts_ms"),
        col("session_id"), col("session_idx"), col("duration"))
    }),
    "q_sessionize_full_incremental" -> ((s, dir) => {
      // Incremental FULL-RULE sessionization: the engine's own SessionState
      // is the carried state, injected into each increment's secondary sort
      // as a tag-0 row. Row-identical to one full recompute — shares the
      // recursive-CTE oracle with q_sessionize_full.
      val ev = table(s, dir, "events")
      val cuts = ev
        .agg(expr("percentile(unix_millis(ts), array(0.33D, 0.66D))").as("c"))
        .select(element_at(col("c"), 1).cast("long").as("c1"),
          element_at(col("c"), 2).cast("long").as("c2"))
      def part(cond: Column): DataFrame =
        ev.crossJoin(broadcast(cuts)).filter(cond).drop("c1", "c2")
      val ms = unix_millis(col("ts"))
      val (r1, s1) = Sessionize.incrementalFullSessionize(None, part(ms <= col("c1")))
      val (r2, s2) = Sessionize.incrementalFullSessionize(Some(s1), part(ms > col("c1") && ms <= col("c2")))
      val (r3, _) = Sessionize.incrementalFullSessionize(Some(s2), part(ms > col("c2")))
      r1.unionByName(r2).unionByName(r3).select(
        col("tieBreak").as("event_id"),
        col("key").cast("long").as("user_id"),
        col("tsMillis").as("ts_ms"),
        col("sessionId").as("session_id"),
        col("sessionIdx").as("session_idx"),
        col("duration"))
    }),
    "q_stream_lsh_dedup" -> ((s, dir) => {
      // Online MinHash-LSH near-dup admission: foreachBatch keeps a
      // persistent band-key index; a doc is admitted iff no band key
      // collided with any earlier (lower-id / prior-batch) document. The
      // oracle states the batching-invariant rule closed-form over the
      // replayed band CTEs.
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
      val root = streamTempRoot("graft_lsh_")
      val idx = root.resolve("bands").toString
      val out = root.resolve("admitted").toString
      val ckpt = root.resolve("_checkpoint").toString
      withStreamingConfs(s) {
        val q = src.writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch(graft.streaming.LshDedupSink.admitBatch(idx, out) _)
          .start()
        try q.processAllAvailable()
        finally q.stop()
      }
      val result = s.read.parquet(out).select(col("doc_id")).materialize
      deleteRecursively(root.toFile)
      result
    }),
    "q_stream_budget_admit" -> ((s, dir) => {
      // Online token-budget admission: per-source budgets enforced on the
      // arriving stream in id order, per-source running totals handed off
      // across microbatches (k-row state, never per-doc). The rule is
      // batching-invariant, so the oracle states it closed-form: admitted
      // ⇔ same-source lower-id token sum < budget.
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
      val w = table(s, dir, "documents").select(col("source")).distinct()
        .withColumn("weight", (ascii(substring(col("source"), -1, 1)) % 3 + 1).cast("long"))
      val denom = w.agg(sum(col("weight")).cast("long").as("__denom"))
      val budgets = w.crossJoin(broadcast(denom))
        .select(col("source"),
          floor(lit(10000L).cast("double") * col("weight").cast("double") /
            col("__denom").cast("double")).as("budget"))
        .materialize
      val root = streamTempRoot("graft_budget_")
      val state = root.resolve("state").toString
      val out = root.resolve("admitted").toString
      val ckpt = root.resolve("_checkpoint").toString
      withStreamingConfs(s) {
        val q = src.writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch(graft.streaming.BudgetAdmitSink.admitBatch(state, out, budgets) _)
          .start()
        try q.processAllAvailable()
        finally q.stop()
      }
      val result = s.read.parquet(out)
        .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_before"))
        .materialize
      deleteRecursively(root.toFile)
      result
    }),
    "q_compress_ratio" -> ((s, dir) =>
      // Deflate quality tier, driver-checkable form: the DEFLATE bit-stream
      // is engine-internal, so the query emits exact assertions instead —
      // per-doc inflate(deflate(text)) == text and the zlib size bound —
      // which the oracle pins to 1 alongside the exact byte length. The
      // ratio ordering (repetitive << prose << noise) and determinism stay
      // pinned in CompressionRatioSpec over TextAnalysis.compressionRatio.
      TextAnalysis.deflateRoundtrip(table(s, dir, "documents"))),
    "q_hll_merge" -> ((s, dir) => {
      // Mergeable-sketch rollup — the 100 TB distinct-count architecture:
      // per (event_type, day) HLL sketches (Apache DataSketches), merged
      // upward with hll_union_agg. Sketch bytes aren't SQL-expressible, so
      // the output carries the exact merged distinct (oracled) plus a
      // bounded-error assertion on the merged estimate: lgConfigK = 12 →
      // rsd ≈ 1.04/√4096 ≈ 1.6%; bound 3·rsd ≈ 5% relative (min 1).
      // ProfilingSamplingSpec additionally pins estimate-vs-exact shape.
      val merged = table(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(expr("hll_sketch_agg(user_id)").as("sk"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).cast("long").as("n_days"),
          expr("hll_sketch_estimate(hll_union_agg(sk))").cast("long").as("approx_users"))
      val exact = table(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
      merged.join(exact, Seq("event_type"))
        .select(
          col("event_type"), col("n_days"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users"))
            <= greatest(lit(1L), col("exact_users") * lit(0.05))).cast("int").as("est_ok"))
    }),
    "q_auc" -> ((s, dir) => {
      // Exact ROC AUC of spend as a purchase ranker — Mann–Whitney with
      // midrank ties, integer-exact. The distinct-cents table takes the
      // ranged prefix sum (Eval.rangedCumsum); the events never sort
      // through one partition.
      val ev = table(s, dir, "events").select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      Eval.auc(ev, "cents", "is_pos")
    }),
    "q_calibration_bins" -> ((s, dir) => {
      // Calibration/reliability table: does spend-decile membership track
      // purchase rate? Equal-width integer bins over the observed span
      // (one min/max broadcast + one hash aggregate).
      val ev = table(s, dir, "events").select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      Eval.calibrationBins(ev, "cents", "is_pos")
    }),
    "q_classifier_eval" -> ((s, dir) =>
      // Per-class precision/recall/F1 of the language-ID heuristic against
      // the labeled lang — the eval gate before trusting a filter on the
      // full corpus. Confusion cells aggregate once; per-class rows are
      // tiny re-aggregations of the cells.
      Eval.confusionStats(
        TextAnalysis.langId(table(s, dir, "documents")),
        "pred_lang", "labeled_lang")),
    "q_cohens_kappa" -> ((s, dir) =>
      // Chance-corrected annotator agreement between the language-ID
      // heuristic and the labels — exact rational κ from one cells
      // aggregate + broadcast marginal products.
      Eval.cohensKappa(
        TextAnalysis.langId(table(s, dir, "documents")),
        "pred_lang", "labeled_lang")),
    "q_gini" -> ((s, dir) => {
      // Spend-concentration Gini per market segment (order totals in
      // cents) — a rank statistic with NO global sort: ties collapse into
      // the distinct-(segment, cents) table, which takes the ranged
      // prefix sum; numerator/denominator emitted as exact BIGINTs.
      val o = table(s, dir, "orders").join(
        table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      Eval.gini(o, "c_mktsegment", "cents")
    }),
    "q_quantile_norm" -> ((s, dir) => {
      // EXACT quantile normalization: each event type's spend
      // distribution mapped onto the pooled distribution — two prefix-sum
      // CDFs + a binned range join for the position lookup (no BNLJ).
      val ev = table(s, dir, "events").select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      Normalize.quantileNormalize(ev, "event_type", "cents")
    }),
    "q_rendezvous" -> ((s, dir) =>
      // Consistent shard assignment: highest-random-weight hashing over 8
      // shards — removing a shard relocates ONLY its ids (vs mod-n's
      // global reshuffle). Pure codegen'd narrow map.
      graft.operators.Layout.rendezvousAssign(
        table(s, dir, "documents").select(col("doc_id")), "doc_id",
        shards = 8)),
    "q_order_stats" -> ((s, dir) => {
      // EXACT p25/p50/p75/p99 of spend in ONE pass off the prefix table
      // (tiny broadcast of position marks) — vs q_percentile's exact
      // aggregate that sorts each group through one reducer.
      val ev = table(s, dir, "events")
        .select(round(col("value") * 100, 0).cast("long").as("cents"))
      Eval.orderStatistics(ev, "cents",
        Seq((1, 4), (1, 2), (3, 4), (99, 100)))
    }),
    "q_log_templates" -> ((s, dir) => {
      // Drain-style template mining over the synthesized ELB lines (same
      // fixture as q_parse_elb): variable fields (timestamp, client
      // ip:port) fall below the frequency floor and wildcard to <*>; the
      // whole corpus collapses to ONE template shape.
      val lines = table(s, dir, "events").select(col("event_id"),
        format_string(
          "%s elb u%d:%d 10.0.0.1:80 0.0 0.0 0.0 200 200 0 699 GET http://x/y HTTP/1.1",
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
          col("user_id"),
          col("event_id")).as("line"))
      TextAnalysis.logTemplates(lines, "event_id", "line", minDf = 1000L)
    }),
    "q_sprt" -> ((s, dir) => {
      // Wald sequential A/B monitor: per-arm LLR walk over the event
      // stream in (ts, event_id) order, stopping at the first Wald-bound
      // crossing — integer micro-nat arithmetic on the materialized-once
      // ranged prefix sum (never a per-arm single-partition window).
      val ev = table(s, dir, "events").select(
        concat(lit("arm_"), pmod(col("user_id"), lit(2L))).as("arm"),
        unix_millis(col("ts")).as("ms"), col("event_id"),
        (col("event_type") === "purchase").as("converted"))
      Profiling.sprt(ev, "arm", Seq("ms", "event_id"), "converted",
        p0 = 0.15, p1 = 0.25)
    }),
    "q_countmin" -> ((s, dir) =>
      // Deterministic count-min sketch (d=4, w=1024, md5 hash family):
      // probe estimates vs exact counts with the one-sided error flag in
      // the output; the sketch is d·w cells at any corpus size.
      TextAnalysis.countMinEstimate(table(s, dir, "documents"),
        probes = Seq("the", "spark", "data", "window", "zzz_absent"))),
    "q_good_turing" -> ((s, dir) =>
      // Good–Turing frequency-of-frequencies smoothing: N_r + smoothed
      // r* via an EXACT r+1 self-join (lead() would skip absent r).
      TextAnalysis.goodTuring(table(s, dir, "documents"))),
    "q_negative_sample" -> ((s, dir) =>
      // Contrastive-training negatives: 3 deterministic pseudo-random
      // partners per doc via evenly spaced strides on the md5-rank ring —
      // reproducible across runs/partitionings, never self.
      Sampling.negativeSample(table(s, dir, "documents"), "doc_id", k = 3)),
    "q_mutual_info" -> ((s, dir) =>
      // Feature-selection scorer: per-cell MI contributions between doc
      // language and source (Σ = MI in nats) — the information-theoretic
      // companion to q_chi2_independence, same contingency plan.
      Profiling.mutualInformation(table(s, dir, "documents"), "lang", "source")),
    "q_percentile_rank" -> ((s, dir) => {
      // Rank-normalization transform: exact midrank percentile of every
      // distinct spend value per event type — distinct-value table +
      // ranged prefix sum, never a global sort.
      val ev = table(s, dir, "events").select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      Eval.percentileRank(ev, "event_type", "cents")
    }),
    "q_ip_cidr" -> ((s, dir) => {
      // Access-log CIDR rollup: requests + distinct clients per /20 (true
      // integer network mask, splits the third octet). IPs synthesized
      // deterministically from events — the oracle rebuilds them.
      val ips = table(s, dir, "events").select(concat_ws(".",
        lit(10), pmod(col("user_id"), lit(256L)),
        pmod(expr("user_id div 256"), lit(256L)),
        pmod(col("event_id"), lit(256L))).as("ip"))
      graft.operators.Urls.cidrRollup(ips, "ip", bits = 20)
    }),
    "q_hampel" -> ((s, dir) => {
      // Hampel despiking of the per-user daily spend series (same series
      // as q_rolling_median): rolling-median/rolling-MAD repair in exact
      // 2×/4× fixed point — per-key bounded frames, no global state.
      val perDay = table(s, dir, "events")
        .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("cents")).cast("long").as("v"))
      graft.operators.TimeSeries.hampel(perDay, "user_id", "day", "v",
        windowRows = 7, k = 3)
    }),
    "q_fuzzy_name_join" -> ((s, dir) =>
      // Entity-resolution candidates over the part-name DOMAIN: collapse
      // rows to the name histogram first, then Levenshtein-match distinct
      // names inside last-token blocks with a length-band prefilter.
      Dedup.fuzzyNameJoin(table(s, dir, "part"), "p_name",
        n => element_at(split(n, " "), -1), maxDist = 3)),
    "q_stream_heavy_hitters" -> ((s, dir) => {
      // The exact heavy-hitters rollup over a document STREAM: token
      // counts aggregate in complete mode (the streaming-state half);
      // the support threshold joins against the drained totals. Shares
      // q_heavy_hitters' oracle.
      val schema = s.read.parquet(s"$dir/documents.parquet").schema
      val src = s.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
      val counts = src.select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).cast("long").as("freq"))
      val drained = runToMemory(s, counts, "complete")
      val total = drained.agg(sum(col("freq")).cast("double").as("total"))
      drained.crossJoin(broadcast(total))
        .filter(col("freq").cast("double") > col("total") * 0.002)
        .select(col("token"), col("freq"))
    }),
    "q_readability" -> ((s, dir) =>
      // Flesch–Kincaid grade per doc (vowel-run syllables, punctuation
      // sentences with ⌈words/15⌉ fallback) — narrow map, one scan.
      TextAnalysis.readability(table(s, dir, "documents"))),
    "q_bpe_pairs" -> ((s, dir) =>
      // BPE-training pair counts: corpus → word histogram (the only
      // corpus-sized pass) → pairs over DISTINCT words → top-20.
      TextAnalysis.bpePairs(table(s, dir, "documents"))),
    "q_bpe_train" -> ((s, dir) =>
      // Iterated BPE training: the 5-round merge sequence (argmax pair
      // per round, greedy left-to-right merge over the word histogram)
      // — the trained merge table a tokenizer ships; the oracle unrolls
      // rounds as MATERIALIZED CTEs and replays replace() bit-for-bit.
      TextAnalysis.bpeTrain(table(s, dir, "documents"), rounds = 5)),
    "q_bpe_apply" -> ((s, dir) =>
      // The trained tokenizer APPLIED: top-30 token histogram of the
      // corpus after the 5 merges (the post-merge segmentation IS the
      // tokenization — one explode + aggregate over the vocab table).
      TextAnalysis.bpeApply(table(s, dir, "documents"), rounds = 5,
        k = 30)),
    "q_bpe_train_batched" -> ((s, dir) =>
      // Batched BPE training (the 100 TB trainer shape): per round the
      // top-4 candidate pairs walked rank-first, every pair whose
      // symbol triple {l,r,lr} is disjoint from the already-SELECTED
      // triples merges in ONE replace job — up to 12 merges in 3
      // rounds vs 3 for sequential. The oracle replays the ranking,
      // the chained greedy selection (recursive CTE over the ≤4
      // candidates), and the slot-unrolled replace chain.
      TextAnalysis.bpeTrainBatched(table(s, dir, "documents"),
        rounds = 3, batchTopN = 4)),
    "q_bpe_heldout" -> ((s, dir) => {
      // Held-out tokenizer eval: train the 5-merge table on EVEN
      // doc_ids, tokenize the ODD half with the frozen merges (applied
      // in training order) — the honest train/test fertility read.
      val docs = table(s, dir, "documents")
      TextAnalysis.bpeHeldOutApply(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), rounds = 5, k = 30)
    }),
    "q_textrank" -> ((s, dir) =>
      // TextRank keywords: PageRank (= all-vertex-restart PPR, exact
      // micro-long walk) over the adjacent-word co-occurrence graph,
      // top-20 by (score, word).
      TextAnalysis.textRank(table(s, dir, "documents"), k = 20)),
    "q_bpe_fertility" -> ((s, dir) =>
      // Tokenizer fertility per source after the 5 trained merges:
      // tokens/word + chars/token — which domain the merge table
      // under-serves (near-character fertility = poor compression).
      TextAnalysis.bpeFertility(table(s, dir, "documents"), "source",
        rounds = 5)),
    "q_minimizer_sketch" -> ((s, dir) =>
      // (8,3)-minimizer sketch per doc: min 60-bit shingle hash per
      // 8-position window, distinct — the sampling sketch; window-min is
      // partitioned by doc, never global.
      TextAnalysis.minimizerSketch(table(s, dir, "documents"))),
    "q_weighted_median" -> ((s, dir) => {
      // Exact quantity-weighted lower median unit price per return flag —
      // smallest price whose cumulative weight reaches half the total
      // (2·cumw ≥ W, integer compare), same distinct-value prefix-sum
      // shape as q_gini.
      val li = table(s, dir, "lineitem").select(col("l_returnflag"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"),
        col("l_quantity").cast("long").as("qty"))
      Eval.weightedMedian(li, "l_returnflag", "cents", "qty")
    }),
    "q_zorder_stats" -> ((s, dir) => {
      // Read-side proof of the Z-order layout: bucket lineitem by the top
      // 6 bits of the (partkey, suppkey) Z-value (= the file boundaries a
      // range-partitioned write would draw) and report each bucket's
      // covered rectangle — small rect_cells means min/max pruning skips
      // buckets for predicates on EITHER key. Integer DIV scaling into the
      // 8-bit grid (never float), one narrow map + a 64-group agg.
      val li = table(s, dir, "lineitem")
      val mx = broadcast(li.agg(max(col("l_partkey")).as("mp"),
        max(col("l_suppkey")).as("ms")))
      val cells = li.crossJoin(mx).select(
        expr("l_partkey * 256 DIV (mp + 1)").as("ca"),
        expr("l_suppkey * 256 DIV (ms + 1)").as("cb"))
      graft.operators.Layout.zOrderStats(
        cells, col("ca"), col("cb"), bits = 8, bucketBits = 6)
    }),
    "q_compaction_plan" -> ((s, dir) => {
      // Catalog-wide compaction PLAN: the per-(event_type, day) micro-file
      // inventory binned into ~2 KB output files by offset binning
      // (cum_bytes_before DIV target) — idempotent pure function of the
      // inventory, the planning half of Layout.compactSmallFiles.
      val files = table(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(length(col("props"))).cast("long").as("n_bytes"))
      graft.operators.Layout.compactionPlan(
        files, "event_type", "day", "n_bytes", targetBytes = 2048L)
    }),
    "q_kmv_distinct" -> ((s, dir) =>
      // K-minimum-values distinct sketch over order keys: 256 smallest
      // 60-bit md5 hashes → unbiased estimate (k−1)·2^60/h_k, checked
      // against the exact count in the same row. TakeOrderedAndProject
      // keeps the k-smallest step a per-partition heap, never a sort.
      Profiling.kmvDistinct(table(s, dir, "orders"), "o_orderkey", k = 256)),
    "q_ktruss" -> ((s, dir) => {
      // 4-truss of the sampled co-purchase graph (parts with key%10 < 3
      // sharing an order — the repeat-filtered graph is triangle-poor):
      // every surviving edge sits on >= 2 triangles WITHIN the truss,
      // the edge-grade community core that cuts the bridge edges
      // q_kcore keeps. Engine peels to the fixpoint (12 rounds at
      // sf0.01); the oracle unrolls 14 id-ordered rounds (idempotent
      // past the fixpoint, pinned by the compare).
      val li = table(s, dir, "lineitem")
        .filter(col("l_partkey") % 10 < 3)
        .select(col("l_orderkey"), col("l_partkey"))
      val e = coPurchasePairs(li)
      graft.operators.Graph.kTruss(e, "src", "dst", k = 4)
    }),
    "q_kcore" -> ((s, dir) => {
      // 3-core of the repeat-co-purchase graph (parts sharing >= 2 orders
      // are adjacent): simultaneous peeling to the fixpoint — the dense
      // community the one-off co-purchases hide. The engine iterates to
      // convergence; the oracle unrolls 14 peel rounds (fixpoint at 11 on
      // this data, pinned by the compare itself).
      val li = table(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").cast("long").as("src"),
          col("b.l_partkey").cast("long").as("dst"))
        .agg(count_distinct(col("a.l_orderkey")).as("n_ord"))
        .filter(col("n_ord") >= 2)
        .select(col("src"), col("dst"))
      graft.operators.Graph.kCore(e, "src", "dst", k = 3)
    }),
    "q_bootstrap_ci" -> ((s, dir) => {
      // Poisson-bootstrap 94% CI of mean order value per market segment —
      // 32 deterministic replicates assembled map-side (per-row md5
      // Poisson weights), CI = 2nd smallest / 2nd largest replicate mean.
      val o = table(s, dir, "orders")
        .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_orderkey"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      Sampling.bootstrapCi(o, "c_mktsegment", "o_orderkey", "cents", b = 32)
    }),
    "q_theil_sen" -> ((s, dir) => {
      // Robust per-type spend trend: Theil–Sen lower-median slope over
      // daily totals in exact micro-cents/day — pairwise slopes explode
      // only within each type's 30-day grid, never across the raw stream.
      val daily = table(s, dir, "events")
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("day_idx"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      graft.operators.TimeSeries.theilSen(daily, "event_type", "day_idx", "cents")
    }),
    "q_gram_covariance" -> ((s, dir) =>
      // Distributed covariance matrix of the embedding corpus (upper
      // triangle, exact 2^12 fixed-point sums) — the PCA/whitening kernel.
      // mapPartitions accumulates each partition's d×d outer product
      // locally; shuffle is P·d² triples, independent of corpus size.
      Similarity.gramCovariance(table(s, dir, "embeddings"))),
    "q_k_anonymity" -> ((s, dir) =>
      // Re-identification audit before a data release: every
      // (segment, nation) quasi-identifier cell with its population and
      // prosecutor-model risk 1/n; cells under k=10 are flagged.
      Profiling.kAnonymity(
        table(s, dir, "customer").select(col("c_mktsegment"),
          col("c_nationkey").cast("long").as("c_nationkey")),
        Seq("c_mktsegment", "c_nationkey"), k = 10L)),
    "q_join_size_est" -> ((s, dir) =>
      // Planner-style join cardinality probe: |orders ⋈ lineitem| from
      // count-min inner products (d=4 × w=1024 cells per side) vs the
      // exact size from per-key counts — one-sided error checked in-row.
      Profiling.cmJoinSizeEstimate(
        table(s, dir, "orders"), "o_orderkey",
        table(s, dir, "lineitem"), "l_orderkey")),
    "q_grid_cluster" -> ((s, dir) =>
      // Grid-density clustering of the embedding cloud (first two dims,
      // 1/32 cells, minPts=3): dense cells connected through the shared
      // CC label propagation — corpus collapses to cell counts in one
      // aggregate; CC runs on the bounded dense-cell table.
      Similarity.gridClusters(table(s, dir, "embeddings"))),
    "q_table_fingerprint" -> ((s, dir) => {
      // Cross-engine content checksum of lineitem per return flag:
      // 60-bit row hashes over a canonical integer/date rendering,
      // commutative reducers — migration validation without a diff.
      val li = table(s, dir, "lineitem").select(col("l_returnflag"),
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"),
        col("l_shipdate").cast("date").as("ship"))
      Profiling.tableFingerprint(li, "l_returnflag",
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "cents", "ship"))
    }),
    "q_stream_kmv" -> ((s, dir) => {
      // Streaming distinct-user estimate per event type via the mergeable
      // KMV Aggregator — state is 64 longs per group no matter how long
      // the stream runs; shares the batch KMV oracle shape.
      val kmv = udaf(new graft.functions.KmvSketchAggregator(64),
        org.apache.spark.sql.Encoders.scalaLong)
      val hashed = eventsStream(s, dir).select(col("event_type"),
        graft.functions.TextFunctions.tokenHash60(
          col("user_id").cast("string")).as("h"))
      val agg = hashed.groupBy(col("event_type")).agg(kmv(col("h")).as("kmv"))
      runToMemory(s, agg, "complete")
        .select(col("event_type"), col("kmv.n_k").as("n_k"),
          col("kmv.h_k").as("h_k"))
        .withColumn("est_distinct",
          when(col("n_k") === 64L,
            round((col("n_k") - 1).cast("double") * lit(math.pow(2, 60)) /
              col("h_k").cast("double"), 6))
            .otherwise(col("n_k").cast("double")))
    }),
    "q_ols2" -> ((s, dir) => {
      // Distributed regression as ONE Gram aggregate: price (whole
      // dollars) on quantity and discount-% via normal equations — nine
      // exact integer moments, closed-form Cramer solve + R², the
      // shared-SQL double arithmetic evaluated by both engines.
      val li = table(s, dir, "lineitem").select(
        round(col("l_extendedprice"), 0).cast("long").as("y"),
        col("l_quantity").cast("long").as("x1"),
        round(col("l_discount") * 100, 0).cast("long").as("x2"))
      Eval.ols2(li, "y", "x1", "x2")
    }),
    "q_graph_stats" -> ((s, dir) => {
      // One-row structural summary of the repeat-co-purchase graph:
      // counts, degree extremes, and degree assortativity (exact moment
      // sums over the degree-joined edge list, double finish).
      val li = table(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").cast("long").as("src"),
          col("b.l_partkey").cast("long").as("dst"))
        .agg(count_distinct(col("a.l_orderkey")).as("n_ord"))
        .filter(col("n_ord") >= 2)
        .select(col("src"), col("dst"))
      graft.operators.Graph.graphStats(e, "src", "dst")
    }),
    "q_knn_eval" -> ((s, dir) =>
      // Leave-one-out 10-NN label eval over the first 50 vectors:
      // neighbors vote (count desc, label tie-break), prediction vs own
      // label in-row — embedding/label quality probe on the exact kernel.
      Similarity.knnEval(table(s, dir, "embeddings"), nQueries = 50L, k = 10)),
    "q_link_prediction" -> ((s, dir) => {
      // Adamic–Adar link prediction on the repeat-co-purchase graph:
      // top-20 non-adjacent part pairs by Σ 1/ln(deg) over common
      // neighbors, micro-quantized so the score sum is an exact long.
      val li = table(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").cast("long").as("src"),
          col("b.l_partkey").cast("long").as("dst"))
        .agg(count_distinct(col("a.l_orderkey")).as("n_ord"))
        .filter(col("n_ord") >= 2)
        .select(col("src"), col("dst"))
      graft.operators.Graph.adamicAdar(e, "src", "dst", topK = 20)
    }),
    "q_conformal" -> ((s, dir) => {
      // Split-conformal 90% interval on the OLS price fit: md5-split,
      // fit half 0, exact ceil(0.9n) residual order statistic on half 1,
      // calibration coverage emitted as the in-row sanity check.
      val li = table(s, dir, "lineitem").select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
        round(col("l_extendedprice"), 0).cast("long").as("y"),
        col("l_quantity").cast("long").as("x1"),
        round(col("l_discount") * 100, 0).cast("long").as("x2"))
      Eval.conformalOls2(li, "id", "y", "x1", "x2")
    }),
    "q_weighted_reservoir" -> ((s, dir) =>
      // Exact-size weighted sample without replacement: 100 docs by
      // Efraimidis–Spirakis exponential keys over n_chars — per-partition
      // top-n heaps, no reservoir state, no global sort.
      Sampling.weightedReservoir(
        table(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", n = 100)),
    "q_did" -> ((s, dir) =>
      // Difference-in-differences on event spend: odd users "treated",
      // period split at day 16 — four exact (sum, n) cells in one
      // aggregate, effect = shared-SQL double over the cell row.
      Eval.diffInDiff(
        table(s, dir, "events").select(
          (pmod(col("user_id"), lit(2L)) === 1L).as("treat"),
          (dayofmonth(col("ts")) >= 16).as("post"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "treat", "post", "cents")),
    "q_l_diversity" -> ((s, dir) =>
      // Homogeneity-attack audit: per (segment, nation) QI cell, distinct
      // account-balance buckets + exact micro-nat entropy; l=3 flag.
      Profiling.lDiversity(
        table(s, dir, "customer").select(col("c_mktsegment"),
          col("c_nationkey").cast("long").as("c_nationkey"),
          floor(col("c_acctbal") / 2000).cast("long").as("bal_bucket")),
        Seq("c_mktsegment", "c_nationkey"), "bal_bucket", l = 3L)),
    "q_exact_jaccard" -> ((s, dir) =>
      // EXACT Jaccard >= 0.5 self-join via prefix filtering (the
      // PPJoin baseline the MinHash LSH approximates): rare-first
      // prefixes bound the inverted index; integer threshold compare.
      graft.operators.Dedup.exactJaccardJoin(
        table(s, dir, "documents"), thresholdPpm = 500000L)),
    "q_minhash_recall" -> ((s, dir) => {
      // recall of the banded MinHash near-dup pairs against the exact
      // prefix-join ground truth at the same threshold — the number
      // that certifies the banding parameters (16 hashes x 4 bands).
      val d = table(s, dir, "documents")
      val exact = graft.operators.Dedup.exactJaccardJoin(d, 500000L)
        .select(col("doc_a"), col("doc_b"))
      val mh = graft.operators.Dedup.nearDupMinhash(d, threshold = 0.5)
        .select(col("doc_a").as("__a"), col("doc_b").as("__b"))
      exact.join(mh,
          col("doc_a") === col("__a") && col("doc_b") === col("__b"),
          "left")
        .agg(count(lit(1)).cast("long").as("n_exact"),
          sum(when(col("__a").isNotNull, 1L).otherwise(0L))
            .cast("long").as("n_found"))
        .withColumn("recall",
          expr("round(CAST(n_found AS DOUBLE) / n_exact, 6)"))
    }),
    "q_t_closeness" -> ((s, dir) =>
      // Skewness-attack audit completing the k-anon/l-div ladder: per
      // QI cell, the exact ordered EMD between its balance-bucket
      // distribution and the table's; t = 0.2.
      Profiling.tCloseness(
        table(s, dir, "customer").select(col("c_mktsegment"),
          col("c_nationkey").cast("long").as("c_nationkey"),
          floor(col("c_acctbal") / 2000).cast("long").as("bal_bucket")),
        Seq("c_mktsegment", "c_nationkey"), "bal_bucket", t = 0.2)),
    "q_mmr_rerank" -> ((s, dir) =>
      // Diversity reranking: greedy λ=0.7 MMR picking 5 of each query's
      // 10-candidate pool — sequential over 5 STEPS, each a bounded
      // per-query argmax on once-materialized pool/pair tables.
      Similarity.mmrRerank(
        table(s, dir, "embeddings").filter(col("vec_id") < 8L)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        table(s, dir, "embeddings").select(col("vec_id"), col("embedding")),
        poolK = 10, selectK = 5)),
    "q_ohlc_bars" -> ((s, dir) => {
      // 6-hour OHLC bars per event type: open/close under the explicit
      // (ts, event_id) total order, one exchange for both windows + agg.
      val ev = table(s, dir, "events").select(col("event_type"),
        unix_millis(col("ts")).as("ms"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      graft.operators.TimeSeries.ohlcBars(
        ev, "event_type", "ms", "event_id", "cents", barMs = 21600000L)
    }),
    "q_stream_ohlc" -> ((s, dir) =>
      // The same bars as a STREAMING aggregate: row_number isn't legal in
      // a streaming agg, so open/close become min_by/max_by over the
      // combined (ts, event_id) key — shares q_ohlc_bars' oracle text.
      runToMemory(s, eventsStream(s, dir)
        .select(col("event_type"), unix_millis(col("ts")).as("ms"),
          col("event_id"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .withColumn("bar_start_ms", expr("(ms DIV 21600000L) * 21600000L"))
        .withColumn("tkey",
          expr("(ms - 1700000000000L) * 100000000L + event_id"))
        .groupBy(col("event_type"), col("bar_start_ms"))
        .agg(min_by(col("cents"), col("tkey")).as("open"),
          max(col("cents")).as("high"), min(col("cents")).as("low"),
          max_by(col("cents"), col("tkey")).as("close"),
          count(lit(1)).cast("long").as("n"),
          sum(col("cents")).cast("long").as("volume")), "complete")),
    "q_streaks" -> ((s, dir) =>
      // Gaps-and-islands: per-user consecutive-active-day streaks via the
      // day − row_number island invariant — distinct-day collapse first,
      // every window bounded by the calendar.
      graft.operators.Sessionize.streaks(
        table(s, dir, "events").select(col("user_id"),
          datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("d")),
        "user_id", "d")),
    "q_pca_power" -> ((s, dir) =>
      // Top principal component by micro-quantized power iteration on the
      // distributed covariance matrix — corpus touched ONCE (the Gramian
      // pass); 12 iterations over d² tiny rows; deterministic trajectory
      // incl. the eigenvector sign, replayed by the unrolled oracle.
      Similarity.pcaPower(table(s, dir, "embeddings"))),
    "q_kmv_set_ops" -> ((s, dir) => {
      // Sketch set algebra: click-audience ∩/∪ purchase-audience from two
      // KMV sketches (k-min union sample → Jaccard → intersection), with
      // the exact distinct-hash answers side by side in the same row.
      val ev = table(s, dir, "events")
      Profiling.kmvSetOps(
        ev.filter(col("event_type") === "click"), "user_id",
        ev.filter(col("event_type") === "purchase"), "user_id", k = 64)
    }),
    "q_twap" -> ((s, dir) =>
      // Time-weighted average spend per (type, day): holding-time weights
      // from lead() under the (ts, event_id) total order, exact integer
      // weighted sums, calendar-bounded windows.
      graft.operators.TimeSeries.twap(
        table(s, dir, "events").select(col("event_type"),
          to_date(col("ts")).as("day"), unix_millis(col("ts")).as("ms"),
          col("event_id"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "day", "ms", "event_id", "cents")),
    "q_impute" -> ((s, dir) =>
      // Median-imputation audit: nulls planted deterministically
      // (event_id % 97), filled with the per-type exact lower median via
      // the weighted-median prefix-sum kernel; summary row per type.
      graft.operators.Normalize.imputeMedianSummary(
        table(s, dir, "events").select(col("event_type"),
          when(pmod(col("event_id"), lit(97L)) === 0L, lit(null))
            .otherwise(round(col("value") * 100, 0).cast("long"))
            .as("cents")),
        "event_type", "cents")),
    "q_srm" -> ((s, dir) =>
      // Sample-ratio-mismatch gate over the experiment population:
      // distinct users per arm vs the fair-coin expectation — the check
      // that runs BEFORE any metric delta is read.
      Profiling.srmCheck(
        table(s, dir, "events").select(col("user_id")).distinct()
          .withColumn("treat", pmod(col("user_id"), lit(2L)) === 1L),
        "treat")),
    "q_cuped" -> ((s, dir) => {
      // CUPED variance-reduced A/B readout: per-user pre (days 1–15) and
      // post (16–30) spend, θ from exact moments, adjusted effect +
      // ρ² (variance removed) in one shared-SQL row.
      val pu = table(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          coalesce(sum(when(dayofmonth(col("ts")) < 16,
            round(col("value") * 100, 0).cast("long"))), lit(0L)).as("pre"),
          coalesce(sum(when(dayofmonth(col("ts")) >= 16,
            round(col("value") * 100, 0).cast("long"))), lit(0L)).as("post"))
        .withColumn("treat", pmod(col("user_id"), lit(2L)) === 1L)
      Eval.cuped(pu, "treat", "pre", "post")
    }),
    "q_wilson_ci" -> ((s, dir) =>
      // Wilson 95% interval on the high-value-event rate per type — the
      // binomial CI that stays in [0,1]; exact counts, closed-form
      // shared-SQL endpoints.
      Profiling.wilsonCi(
        table(s, dir, "events").select(col("event_type"),
          (col("value") > 100).as("success")),
        "event_type", "success")),
    "q_lorenz" -> ((s, dir) => {
      // Lorenz curve of customer order spend: cumulative population vs
      // spend share per decile in exact ppm — gini's plottable companion
      // on the same distinct-value prefix-sum kernel.
      val spend = table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
      Eval.lorenzCurve(spend, "cents")
    }),
    "q_skipping_compare" -> ((s, dir) => {
      // The number that justifies a Z-order rewrite: same cells, two
      // layouts, one range predicate on partkey-cells — buckets pruned
      // and rows still scanned, side by side.
      val li = table(s, dir, "lineitem")
      val mx = broadcast(li.agg(max(col("l_partkey")).as("mp"),
        max(col("l_suppkey")).as("ms")))
      val cells = li.crossJoin(mx).select(
        expr("l_partkey * 256 DIV (mp + 1)").as("ca"),
        expr("l_suppkey * 256 DIV (ms + 1)").as("cb"))
      graft.operators.Layout.skippingCompare(
        cells, col("ca"), col("cb"), predLo = 64L, predHi = 79L)
    }),
    "q_stream_srm" -> ((s, dir) =>
      // The SRM gate as an in-stream monitor: per-arm event counts in a
      // complete-mode aggregate, chi-square on the drained cells.
      runToMemory(s, eventsStream(s, dir)
        .select((pmod(col("user_id"), lit(2L)) === 1L).as("treat"))
        .groupBy(col("treat")).agg(count(lit(1)).cast("long").as("n")),
        "complete")
        .agg(max(when(col("treat"), col("n"))).as("n_t"),
          max(when(!col("treat"), col("n"))).as("n_c"))
        .withColumn("chi2", expr(Profiling.srmChi2Sql))
        .withColumn("srm", expr(s"${Profiling.srmChi2Sql} > 3.841459"))),
    "q_mann_kendall" -> ((s, dir) => {
      // Nonparametric trend significance per type (the theil_sen
      // companion): exact integer S, tie-corrected variance, shared-SQL
      // continuity-corrected z — pairs bounded by the 30-day grid.
      val daily = table(s, dir, "events")
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("day_idx"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      graft.operators.TimeSeries.mannKendall(
        daily, "event_type", "day_idx", "cents")
    }),
    "q_modularity" -> ((s, dir) => {
      // Community-structure quality of the repeat-co-purchase graph under
      // its connected-components partition: per-community Newman-Q
      // contributions in exact micro units.
      val li = table(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").cast("long").as("src"),
          col("b.l_partkey").cast("long").as("dst"))
        .agg(count_distinct(col("a.l_orderkey")).as("n_ord"))
        .filter(col("n_ord") >= 2)
        .select(col("src"), col("dst"))
      graft.operators.Graph.modularity(e, "src", "dst")
    }),
    "q_bh_fdr" -> ((s, dir) => {
      // Multiple-testing control over 150 per-user rate-change tests:
      // Skellam-normal z per user, two-sided p via the SHARED
      // Abramowitz–Stegun tail (the approximation IS the cross-engine
      // contract), Benjamini–Hochberg at q = 0.10.
      val perUser = table(s, dir, "events").groupBy(col("user_id"))
        .agg(
          sum(when(dayofmonth(col("ts")) < 16, 1L).otherwise(0L))
            .cast("long").as("n1"),
          sum(when(dayofmonth(col("ts")) >= 16, 1L).otherwise(0L))
            .cast("long").as("n2"))
        .withColumn("z", expr(
          "round(CAST(n2 - n1 AS DOUBLE) / sqrt(CAST(n1 + n2 AS DOUBLE)), 6)"))
        .withColumn("p", expr(s"round(${Profiling.normalPSql("z")}, 6)"))
      Profiling.bhFdr(perUser, Seq("user_id"), "p", qPpm = 100000L)
    }),
    "q_changepoint" -> ((s, dir) => {
      // Binary-segmentation step: the single best split of each type's
      // daily-total series by between-segment SS — locates what CUSUM
      // alarms on; one prefix-sum window per bounded group.
      val daily = table(s, dir, "events")
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), to_date(lit("2024-01-01"))).as("day_idx"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      graft.operators.TimeSeries.changepoint(
        daily, "event_type", "day_idx", "cents")
    }),
    "q_stream_wilson" -> ((s, dir) =>
      // The Wilson rate CI as an in-stream monitor: complete-mode
      // (success, n) counts per type, closed-form endpoints on the
      // drained cells — shares q_wilson_ci's oracle semantics.
      runToMemory(s, eventsStream(s, dir)
        .select(col("event_type"), (col("value") > 100).as("success"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(when(col("success"), 1L).otherwise(0L)).cast("long").as("s")),
        "complete")
        .withColumn("p_hat", expr("round(CAST(s AS DOUBLE) / n, 6)"))
        .withColumn("ci_lo", expr(Profiling.wilsonSql("-")))
        .withColumn("ci_hi", expr(Profiling.wilsonSql("+")))),
    "q_decile_lift" -> ((s, dir) => {
      // Gains table for a spend-as-score targeting model against the
      // heavy-purchaser label: per-decile lift over the base rate +
      // cumulative positives captured, all exact integer micro/ppm.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          (sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >= 15L)
            .as("heavy"))
      Eval.decileLift(users, "spend", "heavy")
    }),
    "q_stream_bh_fdr" -> ((s, dir) => {
      // The FDR sweep as an in-stream monitor: per-user (n1, n2) cells in
      // a complete-mode streaming aggregate; z/p/BH on the drained test
      // table — shares q_bh_fdr's oracle text.
      val counts = runToMemory(s, eventsStream(s, dir)
        .groupBy(col("user_id"))
        .agg(
          sum(when(dayofmonth(col("ts")) < 16, 1L).otherwise(0L))
            .cast("long").as("n1"),
          sum(when(dayofmonth(col("ts")) >= 16, 1L).otherwise(0L))
            .cast("long").as("n2")),
        "complete")
        .withColumn("z", expr(
          "round(CAST(n2 - n1 AS DOUBLE) / sqrt(CAST(n1 + n2 AS DOUBLE)), 6)"))
        .withColumn("p", expr(s"round(${Profiling.normalPSql("z")}, 6)"))
      Profiling.bhFdr(counts, Seq("user_id"), "p", qPpm = 100000L)
    }),
    "q_ecod_outliers" -> ((s, dir) =>
      // ECOD-style parameterless outlier top-20 over (spend, time-of-day):
      // exact per-dim ECDF tails via the ranged prefix sum, −ln(tail)
      // micro-summed across dims, value-keyed joins (never broadcast).
      Profiling.ecodOutliers(
        table(s, dir, "events").select(col("event_id"),
          round(col("value") * 100, 0).cast("long").as("cents"),
          expr("unix_millis(ts) % 86400000L").as("ms_of_day")),
        "event_id", Seq("cents", "ms_of_day"), topK = 20)),
    "q_graph_features" -> ((s, dir) => {
      // Per-node feature engineering on the repeat-co-purchase graph:
      // degree, triangle participation, local clustering coefficient in
      // exact micro units — the fraud/reco model input table.
      val li = table(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").cast("long").as("src"),
          col("b.l_partkey").cast("long").as("dst"))
        .agg(count_distinct(col("a.l_orderkey")).as("n_ord"))
        .filter(col("n_ord") >= 2)
        .select(col("src"), col("dst"))
      graft.operators.Graph.nodeFeatures(e, "src", "dst")
    }),
    "q_decision_stump" -> ((s, dir) => {
      // One exact tree-split search: every distinct spend value is a
      // candidate threshold for the heavy-purchaser label; ONE ranged
      // prefix-sum scan scores all splits by weighted Gini.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          (sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >= 15L)
            .as("heavy"))
      Eval.decisionStump(users, "spend", "heavy")
    }),
    "q_neg_sampling_table" -> ((s, dir) =>
      // Word2vec negative-sampling prep: count^0.75 unigram distribution
      // with exact ppm cumulative ranges — vocabulary-sized, sampler
      // binary-searches the range column.
      TextAnalysis.negativeSamplingTable(table(s, dir, "documents"))),
    "q_woe_iv" -> ((s, dir) => {
      // Scorecard feature report: spend deciles vs the heavy-purchaser
      // label — per-bin Weight of Evidence + Information Value
      // contributions in exact micro units on the decile kernel.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          (sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >= 15L)
            .as("heavy"))
      Eval.woeBins(users, "spend", "heavy")
    }),
    "q_conversion_lag" -> ((s, dir) => {
      // Funnel latency: exact quartiles + p99 of the view→click lag over
      // converting users — the funnel kernel feeding the one-pass order
      // statistics (no per-group sort anywhere).
      val ev = table(s, dir, "events").withColumn("ts_ms", unix_millis(col("ts")))
      val lags = graft.operators.Sessionize
        .funnel(ev, Seq("view", "click", "purchase"))
        .filter(col("t2").isNotNull)
        .select((col("t2") - col("t1")).as("lag_ms"))
      Eval.orderStatistics(lags, "lag_ms", Seq((1, 4), (1, 2), (3, 4), (99, 100)))
    }),
    "q_ljung_box" -> ((s, dir) => {
      // White-noise gate on each type's daily-total series: Q over the
      // first 5 Pearson-pair autocorrelations vs χ²₅(0.95) — the check
      // before fitting any AR/seasonal model.
      val daily = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_millis(ts) div 86400000").as("day"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("v"))
      graft.operators.TimeSeries.ljungBox(daily, "event_type", "day", "v")
    }),
    "q_kendall_tau" -> ((s, dir) => {
      // Nonparametric spend↔purchases association per user: exact
      // concordant/discordant/tie pair counts over the 150-user table,
      // tie-corrected τ-b as one shared-SQL row.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("n_purch"))
      Profiling.kendallTau(users, "spend", "n_purch")
    }),
    "q_cramers_v" -> ((s, dir) =>
      // Effect size for the lang×source contingency — the in-[0,1]
      // companion to q_chi2_independence; micro-quantized cell sums.
      Profiling.cramersV(table(s, dir, "documents"), "lang", "source")),
    "q_spearman" -> ((s, dir) => {
      // Monotone spend↔purchases association per user WITHOUT O(n²)
      // pairs: doubled midranks off two prefix sums, exact integer
      // moments, shared-SQL Pearson — the scale path next to τ-b.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("n_purch"))
      Profiling.spearman(users, "spend", "n_purch")
    }),
    "q_retrieval_eval" -> ((s, dir) => {
      // Search/RAG eval triple per customer: parts RANKED by spend are
      // the retrieved list, graded relevance from bought quantity
      // (>=60 -> 2, >=30 -> 1); NDCG@10, reciprocal rank, AP@10 from
      // per-element micro-quantized terms — exact integer sums, one
      // double division each.
      val li = table(s, dir, "lineitem").join(table(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").cast("long").as("cust"), col("l_partkey"))
        .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("spend"),
          sum(col("l_quantity").cast("long")).as("qty"))
      val ranked = li
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("cust"))
            .orderBy(col("spend").desc, col("l_partkey"))).cast("long"))
        .withColumn("rel",
          when(col("qty") >= 60L, 2L).when(col("qty") >= 30L, 1L)
            .otherwise(0L))
      Eval.retrievalMetrics(ranked, "cust", "rank", "rel", k = 10)
    }),
    "q_anova_effects" -> ((s, dir) =>
      // q_anova's F with the effect sizes reviewers actually ask for:
      // eta-squared (variance explained) and the less-biased
      // omega-squared, both off the same exact SS assembly.
      Eval.anovaF(
        table(s, dir, "events").select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "cents")
        .withColumn("eta_sq", expr(Eval.anovaEtaSqSql))
        .withColumn("omega_sq", expr(Eval.anovaOmegaSqSql))
        .select(col("g"), col("n"), col("f_stat"), col("eta_sq"),
          col("omega_sq"))),
    "q_anova" -> ((s, dir) =>
      // One-way ANOVA F across event types on per-event cents: exact
      // per-group moment longs, milli-floored between/within sums via
      // pure-BIGINT division splitting, single shared-SQL double finish.
      Eval.anovaF(
        table(s, dir, "events").select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "cents")),
    "q_durbin_watson" -> ((s, dir) =>
      // First-order autocorrelation diagnostic of each type's daily
      // totals: d = Σ(Δe)²/Σe² on n-scaled exact-integer deviations —
      // the companion magnitude to q_runs_test's sign-based z.
      graft.operators.TimeSeries.durbinWatson(
        table(s, dir, "events")
          .groupBy(col("event_type"),
            expr("unix_millis(ts) div 86400000").as("day"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("v")),
        "event_type", "day", "v")),
    "q_runs_test" -> ((s, dir) =>
      // Wald–Wolfowitz runs test on each type's daily-total change signs:
      // up/down/run counts as exact integers, z vs the null run count —
      // the clumpiness alarm next to q_mann_kendall's monotone trend.
      graft.operators.TimeSeries.runsTest(
        table(s, dir, "events")
          .groupBy(col("event_type"),
            expr("unix_millis(ts) div 86400000").as("day"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("v")),
        "event_type", "day", "v")),
    "q_bradley_terry" -> ((s, dir) => {
      // Arena-style preference ranking of event types: each user's
      // pairwise spend comparisons are "games" (higher spend wins, ties
      // skipped); 10 integer MM iterations on the aggregated pair table
      // give preference shares in ppb — bit-identical across engines.
      val spend = table(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      val games = spend.as("x").join(spend.as("y"),
          col("x.user_id") === col("y.user_id") &&
            col("x.event_type") < col("y.event_type"))
        .filter(col("x.cents") =!= col("y.cents"))
        .select(
          when(col("x.cents") > col("y.cents"), col("x.event_type"))
            .otherwise(col("y.event_type")).as("winner"),
          when(col("x.cents") > col("y.cents"), col("y.event_type"))
            .otherwise(col("x.event_type")).as("loser"))
      Eval.bradleyTerry(games, "winner", "loser", iters = 10)
    }),
    "q_markov_stationary" -> ((s, dir) => {
      // Where does user behavior settle: empirical event-type transition
      // chain (per-user (ts, event_id)-ordered pairs), micro-quantized
      // row-stochastic P, 12 integer power-method rounds to the
      // stationary distribution in ppb — bit-identical across engines.
      val ev = table(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("unix_millis(ts)").as("ms"), col("event_id"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ms"), col("event_id"))
      val trans = ev
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
      Eval.markovStationary(trans, "event_type", "next_type", iters = 12)
    }),
    "q_cochran_armitage" -> ((s, dir) => {
      // Ordered dose-response: does the heavy-purchaser rate RISE with
      // click-activity tier (0/1/2)? The 1-df trend chi-square from one
      // exact moment row.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("n_click"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("n_purch"))
        .select(
          when(col("n_click") >= 25L, 2L).when(col("n_click") >= 18L, 1L)
            .otherwise(0L).as("dose"),
          (col("n_purch") >= 15L).as("heavy"))
      Profiling.cochranArmitage(users, "dose", "heavy")
    }),
    "q_mann_whitney" -> ((s, dir) => {
      // Distribution-free spend shift: do high-clickers spend
      // differently? Combined midranks off one prefix sum; exact
      // 2*U1 integer, tie-corrected z + Cliff's delta effect size.
      // (Split on the click rate, balanced ~71/79 at sf0.01 — the
      // original had_error flag is TRUE for every sf0.01 user, which
      // left the test silently degenerate, caught in round 10.)
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          (sum(when(col("event_type") === "click", 1L).otherwise(0L))
            >= 14L).as("clicker"))
      Profiling.mannWhitney(users, "clicker", "spend")
    }),
    "q_kruskal_wallis" -> ((s, dir) =>
      // k-group rank ANOVA: is document length distribution the same
      // across sources? Micro-quantized per-group R^2/n terms, tie
      // correction, df-indexed chi-square critical value.
      Profiling.kruskalWallis(
        table(s, dir, "documents"), "source", "n_chars")),
    "q_cum_incidence" -> ((s, dir) => {
      // Aalen-Johansen competing-risks cumulative incidence: per user
      // the FIRST of error (cause 1) vs signup (cause 2) from first
      // activity, censored (0) at the last event when neither occurs;
      // CIFs per parity cohort — what 1-KM would overstate.
      val agg = table(s, dir, "events")
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          col("event_type"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
          min(when(col("event_type") === "error", col("ms"))).as("e_ms"),
          min(when(col("event_type") === "signup", col("ms"))).as("s_ms"))
      val subj = agg.select(
        concat(lit("c"), pmod(col("user_id"), lit(2L))).as("cohort"),
        expr("(coalesce(least(coalesce(e_ms, s_ms), " +
          "coalesce(s_ms, e_ms)), last_ms) - first_ms) div 3600000")
          .as("t_hours"),
        expr("CASE WHEN e_ms IS NULL AND s_ms IS NULL THEN 0 " +
          "WHEN s_ms IS NULL OR (e_ms IS NOT NULL AND e_ms <= s_ms) " +
          "THEN 1 ELSE 2 END").as("cause"))
      graft.operators.Survival.cumulativeIncidence(
        subj, "cohort", "t_hours", "cause")
    }),
    "q_kaplan_meier" -> ((s, dir) => {
      // Time-to-first-error per user (hours from first activity),
      // right-censored at the last observed event for error-free users;
      // KM curves per parity cohort — exact nano-log survival products.
      val users = table(s, dir, "events")
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          (col("event_type") === "error").as("is_err"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
          min(when(col("is_err"), col("ms"))).as("err_ms"))
        .select(
          concat(lit("c"), pmod(col("user_id"), lit(2L))).as("cohort"),
          expr("(coalesce(err_ms, last_ms) - first_ms) div 3600000")
            .as("t_hours"),
          col("err_ms").isNotNull.as("event"))
      Survival.kaplanMeier(users, "cohort", "t_hours", "event")
    }),
    "q_logrank" -> ((s, dir) => {
      // Do the parity cohorts' time-to-error curves differ? Two-group
      // log-rank chi-square from exact risk sets + nano-quantized
      // per-time (O-E)/V terms.
      val users = table(s, dir, "events")
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          (col("event_type") === "error").as("is_err"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
          min(when(col("is_err"), col("ms"))).as("err_ms"))
        .select((pmod(col("user_id"), lit(2L)) === 0L).as("even_cohort"),
          expr("(coalesce(err_ms, last_ms) - first_ms) div 3600000")
            .as("t_hours"),
          col("err_ms").isNotNull.as("event"))
      Survival.logRank(users, "even_cohort", "t_hours", "event")
    }),
    "q_hits" -> ((s, dir) => {
      // HITS on the customer->supplier purchase graph (the q_pagerank
      // edges): customers score as hubs, suppliers as authorities;
      // 4 fixed max-normalized iterations, oracle unrolls them.
      val edges = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey").cast("long") + 10000000L).as("dst"))
      graft.operators.Graph.hits(edges, "src", "dst", iters = 4)
    }),
    "q_label_prop" -> ((s, dir) => {
      // Majority-vote communities on the repeat-co-purchase graph
      // (the q_modularity edges): 4 synchronous rounds, smallest-label
      // tie-break — exact integer votes, no quantization needed.
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").cast("long").as("src"),
          col("b.l_partkey").cast("long").as("dst"))
        .agg(count_distinct(col("a.l_orderkey")).as("n_ord"))
        .filter(col("n_ord") >= 2)
        .select(col("src"), col("dst"))
      graft.operators.Graph.labelPropagation(e, "src", "dst", rounds = 4)
    }),
    "q_emd" -> ((s, dir) => {
      // HOW FAR apart are the parity cohorts' spend distributions, in
      // cents (Wasserstein-1) — the magnitude companion to q_ks_test's
      // yes/no; micro-quantized CDF-gap rectangles, exact sums.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"))
        .withColumn("even", pmod(col("user_id"), lit(2L)) === 0L)
      Profiling.emd1d(
        users.filter(col("even")).select(col("spend")),
        users.filter(!col("even")).select(col("spend")), "spend")
    }),
    "q_jsd" -> ((s, dir) =>
      // Pairwise Jensen-Shannon divergence between document sources'
      // token distributions — symmetric, finite on disjoint vocabulary;
      // H(M) - (H(P)+H(Q))/2 with nano-quantized entropy terms.
      TextAnalysis.jsDivergence(table(s, dir, "documents"))),
    "q_isotonic" -> ((s, dir) => {
      // Monotone (PAV) calibration of purchase rate vs spend bins via
      // the minimax identity on the B-row bin table — the fitted curve
      // a threshold picker can actually consume.
      val ev = table(s, dir, "events").select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      Eval.isotonicCalibration(ev, "cents", "is_pos")
    }),
    "q_effect_size" -> ((s, dir) => {
      // HOW BIG is the parity-arm spend shift per event type, in SD
      // units: Cohen's d (pooled), Hedges' g (small-sample corrected),
      // Glass's delta (control SD) — the magnitude companion to
      // q_ab_test's t; exact moment row, shared-SQL chain.
      val ev = table(s, dir, "events").select(col("event_type"),
        (pmod(col("user_id"), lit(2L)) === 0L).as("arm"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      Normalize.effectSize(ev, "event_type", "arm", "cents")
    }),
    "q_gumbel" -> ((s, dir) => {
      // Worst-case tail per event type: Gumbel fit over daily block
      // maxima of cents (method of moments) + the 100-day return level
      // — the capacity-planning threshold mean/std can't give.
      val ev = table(s, dir, "events").select(col("event_type"),
        expr("unix_millis(ts) div 86400000").as("day"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      graft.operators.TimeSeries.gumbelFit(ev, "event_type", "day", "cents")
    }),
    "q_pacf" -> ((s, dir) => {
      // AR-order diagnostic on each type's daily-total series: partial
      // autocorrelations 1..5 via the unrolled Durbin-Levinson chain
      // over the rounded rho columns (pure arithmetic, engine-exact).
      val daily = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_millis(ts) div 86400000").as("day"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("v"))
      graft.operators.TimeSeries.pacf(daily, "event_type", "day", "v")
    }),
    "q_pettitt" -> ((s, dir) => {
      // Nonparametric level-shift detection on each type's daily-total
      // series: exact integer U_t off the doubled-midrank identity,
      // K = max|U_t|, where, and the 2exp(-6K^2/(n^3+n^2)) tail.
      val daily = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_millis(ts) div 86400000").as("day"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("v"))
      graft.operators.TimeSeries.pettitt(daily, "event_type", "day", "v")
    }),
    "q_ccf" -> ((s, dir) => {
      // Do clicks LEAD purchases day-over-day? Cross-correlation at
      // lags -5..5 between the daily click and purchase cent totals —
      // exact moment assembly per lag, peak position = lead time.
      val cents = round(col("value") * 100, 0).cast("long")
      val daily = table(s, dir, "events")
        .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
        .agg(sum(when(col("event_type") === "click", cents).otherwise(0L))
            .as("click_cents"),
          sum(when(col("event_type") === "purchase", cents).otherwise(0L))
            .as("purch_cents"))
        .withColumn("k", lit("all"))
      graft.operators.TimeSeries.ccf(daily, "k", "day",
        "click_cents", "purch_cents", maxLag = 5)
    }),
    "q_cochran_q" -> ((s, dir) => {
      // Do ANY of three heavy-purchaser rules (spend/clicks/views)
      // differ on the same users? Cochran's Q — the k-treatment
      // McNemar, exact integer sums, df-indexed critical value.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("np"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("nc"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .cast("long").as("nv"))
        .withColumn("heavy", col("np") >= 15L)
      val long = users.selectExpr("user_id",
        "stack(3, 'a', (spend > 330000) = heavy, " +
          "'b', (nc >= 20) = heavy, 'c', (nv >= 20) = heavy) AS (rule, ok)")
      Profiling.cochranQ(long, "user_id", "rule", "ok")
    }),
    "q_friedman" -> ((s, dir) => {
      // Rank-based k-paired test: do the five event types draw
      // different spend from the SAME users? Doubled midranks within
      // each complete user, exact-integer tie-robust chi-square.
      val ut = table(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      Profiling.friedman(ut, "user_id", "event_type", "cents")
    }),
    "q_hurst" -> ((s, dir) => {
      // Long-memory diagnostic per type on the HOURLY cent series:
      // R/S over dyadic blocks {8,16,32}, exact integer ranges,
      // H from the 3-point dyadic slope.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_millis(ts) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("v"))
      graft.operators.TimeSeries.hurst(hourly, "event_type", "h", "v")
    }),
    "q_rich_club" -> ((s, dir) => {
      // Do the hub parts of the repeat-co-purchase graph interconnect?
      // phi(k) over degree thresholds {2,4,8} — exact integer club
      // edge/member counts, one pass per table.
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").cast("long").as("src"),
          col("b.l_partkey").cast("long").as("dst"))
        .agg(count_distinct(col("a.l_orderkey")).as("n_ord"))
        .filter(col("n_ord") >= 2)
        .select(col("src"), col("dst"))
      graft.operators.Graph.richClub(e, "src", "dst")
    }),
    "q_reach_profile" -> ((s, dir) => {
      // How much of the co-purchase graph do the 4 biggest hubs reach,
      // and how fast? Multi-source BFS levels -> vertices-per-hop
      // profile (max hop = a diameter lower bound).
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").cast("long").as("src"),
          col("b.l_partkey").cast("long").as("dst"))
        .agg(count_distinct(col("a.l_orderkey")).as("n_ord"))
        .filter(col("n_ord") >= 2)
        .select(col("src"), col("dst"))
      val und = e.unionByName(
          e.select(col("dst").as("src"), col("src").as("dst")))
        // the co-purchase self-join is the expensive subtree; the seeds
        // derivation and the BFS both read it — materialize once
        .materialize
      val deg = und.groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("d"))
      val seeds = deg.orderBy(col("d").desc, col("id")).limit(4)
        .select(col("id"))
      graft.operators.Graph.bfsHops(und, seeds, maxHops = 4)
        .groupBy(col("hops"))
        .agg(count(lit(1)).cast("long").as("n_vertices"))
    }),
    "q_cadence" -> ((s, dir) =>
      // Bot screen: per-user inter-event cadence — metronomic gaps
      // (cv < 0.1 over >= 5 gaps) flag automation; exact gap moments.
      Sessionize.cadenceProfile(table(s, dir, "events"), "user_id")),
    "q_pairwise_welch" -> ((s, dir) =>
      // WHICH event types differ in mean cents (parametric post-hoc,
      // the Dunn twin): pairwise Welch t off the exact moment table,
      // A-S normal p, Bonferroni across the 10 pairs.
      Normalize.pairwiseWelch(
        table(s, dir, "events").select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "cents")),
    "q_rolling_corr" -> ((s, dir) => {
      // Are clicks and purchases STILL moving together? Trailing
      // 14-day correlation of the daily cent totals — exact window
      // moments, NULL under 5 periods.
      val cents = round(col("value") * 100, 0).cast("long")
      val daily = table(s, dir, "events")
        .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
        .agg(sum(when(col("event_type") === "click", cents).otherwise(0L))
            .as("xc"),
          sum(when(col("event_type") === "purchase", cents).otherwise(0L))
            .as("yc"))
        .withColumn("k", lit("all"))
      graft.operators.TimeSeries.rollingCorr(daily, "k", "day",
        "xc", "yc")
    }),
    "q_mood_median" -> ((s, dir) => {
      // Mood's median test by composition: above/below the GRAND
      // median per type -> the existing chi2 independence kernel.
      val ev = table(s, dir, "events").select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      val med = broadcast(ev.agg(
        expr("percentile(cents, 0.5)").as("med")))
      Profiling.chi2Independence(
        ev.crossJoin(med).select(col("event_type"),
          when(col("cents") > col("med"), "above")
            .otherwise("at_or_below").as("side")),
        "event_type", "side")
    }),
    "q_kfold_balance" -> ((s, dir) => {
      // 5-fold CV assignment by the portable 60-bit hash on the UNIT
      // (user) key — leakage-free by construction; fold sizes + label
      // balance are the bookkeeping check before training.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg((sum(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)) >= 15L).as("heavy"))
      users.withColumn("fold", expr(
          "pmod(CAST(conv(substring(md5(concat('fold:', " +
            "CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT), 5)"))
        .groupBy(col("fold"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(when(col("heavy"), 1L).otherwise(0L)).cast("long")
            .as("n_pos"))
        .withColumn("pos_rate",
          expr("round(CAST(n_pos AS DOUBLE) / n, 6)"))
    }),
    "q_ordinal_assoc" -> ((s, dir) => {
      // Gamma + both Somers' D next to tau-b — the full ordinal
      // association readout off ONE exact pair-count row (the kendall
      // O(n^2)-on-units kernel).
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("n_purch"))
      Profiling.kendallTau(users, "spend", "n_purch")
        .withColumn("gamma", expr(Profiling.gammaSql))
        .withColumn("somers_d_yx", expr(Profiling.somersDyxSql))
        .withColumn("somers_d_xy", expr(Profiling.somersDxySql))
    }),
    "q_weighted_kappa" -> ((s, dir) => {
      // Ordinal rater agreement: spend tier vs click tier per user,
      // linear weights — one-off disagreements cost less; every term
      // exact integer over the full grid.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("n_click"))
        .select(
          when(col("spend") >= 360000L, 3L).when(col("spend") >= 330000L, 2L)
            .when(col("spend") >= 300000L, 1L).otherwise(0L).as("tier_a"),
          when(col("n_click") >= 25L, 3L).when(col("n_click") >= 20L, 2L)
            .when(col("n_click") >= 15L, 1L).otherwise(0L).as("tier_b"))
      Profiling.weightedKappa(users, "tier_a", "tier_b")
    }),
    "q_pr_auc" -> ((s, dir) => {
      // Imbalance-honest ranking quality of the spend score for
      // purchase: average precision over descending thresholds —
      // exact rational terms on the auc prefix-sum kernel.
      val ev = table(s, dir, "events").select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      Eval.prAuc(ev, "cents", "is_pos")
    }),
    "q_ess" -> ((s, dir) =>
      // How many unweighted users is the spend-weighted sample worth
      // per type? Kish ESS from exact weight moments.
      Sampling.effectiveSampleSize(
        table(s, dir, "events").groupBy(col("event_type"), col("user_id"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("w")),
        "event_type", "w")),
    "q_hapax" -> ((s, dir) =>
      // Zipf-tail authenticity fingerprint per source: hapax/dis
      // legomena counts and the hapax share of vocabulary.
      TextAnalysis.hapaxProfile(table(s, dir, "documents"))),
    "q_tpch_q6" -> ((s, dir) =>
      // TPC-H Q6 shape (forecast revenue change): pure filter +
      // single-cell aggregate, revenue EXACT in cents*pct units —
      // the predicate-pushdown showcase.
      table(s, dir, "lineitem")
        .filter(expr("l_shipdate >= timestamp '1996-01-01' AND " +
          "l_shipdate < timestamp '1997-01-01'") &&
          round(col("l_discount") * 100, 0).cast("long").between(5L, 7L) &&
          col("l_quantity") < 24)
        .select((round(col("l_extendedprice") * 100, 0).cast("long") *
          round(col("l_discount") * 100, 0).cast("long")).as("rev_cp"))
        .agg(count(lit(1)).cast("long").as("n_lines"),
          sum(col("rev_cp")).cast("long").as("revenue_cp"))
        .select(col("n_lines"), col("revenue_cp"),
          expr("round(CAST(revenue_cp AS DOUBLE) / 10000, 6)")
            .as("revenue"))),
    "q_mode" -> ((s, dir) =>
      // Exact per-type modal cent value with the smallest-value
      // tie-break — the deterministic mode a dashboard actually wants.
      table(s, dir, "events")
        .select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .groupBy(col("event_type"), col("cents"))
        .agg(count(lit(1)).cast("long").as("cnt"))
        .groupBy(col("event_type"))
        .agg(max(struct(col("cnt"), (-col("cents")).as("negv"))).as("m"),
          count(lit(1)).cast("long").as("n_distinct"))
        .select(col("event_type"), col("n_distinct"),
          col("m.cnt").as("mode_count"),
          (-col("m.negv")).cast("long").as("mode_cents"))),
    "q_rmst" -> ((s, dir) => {
      // Expected error-free hours in the first 14 days per cohort:
      // area under the KM curve to tau=336 — micro-quantized step
      // rectangles over the rounded survival column.
      val users = table(s, dir, "events")
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          (col("event_type") === "error").as("is_err"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
          min(when(col("is_err"), col("ms"))).as("err_ms"))
        .select(
          concat(lit("c"), pmod(col("user_id"), lit(2L))).as("cohort"),
          expr("(coalesce(err_ms, last_ms) - first_ms) div 3600000")
            .as("t_hours"),
          col("err_ms").isNotNull.as("event"))
      Survival.rmst(users, "cohort", "t_hours", "event", tau = 336L)
    }),
    "q_brier" -> ((s, dir) => {
      // Per-row calibration loss of the spend score vs purchase, plus
      // skill vs the base-rate forecast — next to q_ece's binned gap.
      val ev = table(s, dir, "events").select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      Eval.brier(ev, "cents", "is_pos")
    }),
    "q_harrell_c" -> ((s, dir) => {
      // Does spend ORDER the error failures (survival-side AUC)?
      // Exact pair counts on the aggregated user table — the kendall
      // O(n^2)-on-units regime with the bounded guard.
      val users = table(s, dir, "events")
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          (col("event_type") === "error").as("is_err"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
          min(when(col("is_err"), col("ms"))).as("err_ms"),
          sum(col("cents")).as("spend"))
        .select(col("user_id"),
          expr("(coalesce(err_ms, last_ms) - first_ms) div 3600000")
            .as("t_hours"),
          col("err_ms").isNotNull.as("event"), col("spend"))
      Survival.harrellC(users, "user_id", "t_hours", "event", "spend")
    }),
    "q_jarque_bera" -> ((s, dir) =>
      // Is per-type cent value remotely normal? JB from exact raw
      // moments (DECIMAL x^3/x^4) — the gate before any ±2σ rule.
      Normalize.jarqueBera(
        table(s, dir, "events").select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "cents")),
    "q_bartlett" -> ((s, dir) =>
      // Do the five types share a variance (the ANOVA precondition)?
      // Bartlett B with the small-sample correction, per-group terms
      // milli/nano-quantized; compare with q_brown_forsythe's robust
      // answer.
      Normalize.bartlett(
        table(s, dir, "events").select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "cents")),
    "q_tpch_q1" -> ((s, dir) => {
      // The FULL TPC-H Q1 pricing summary (q1_agg is the 2-column
      // smoke): all sums exact in cents / cents*pct / cents*pct*pct
      // integer units, averages as one double division each — pure
      // map-side-combined aggregate, the scan-throughput benchmark.
      val extc = round(col("l_extendedprice") * 100, 0).cast("long")
      val discp = round(col("l_discount") * 100, 0).cast("long")
      val taxp = round(col("l_tax") * 100, 0).cast("long")
      table(s, dir, "lineitem")
        .filter(expr("l_shipdate <= timestamp '2001-09-01'"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("long").as("qty"), extc.as("extc"),
          (extc * (lit(100L) - discp)).as("disc_cp"),
          (extc * (lit(100L) - discp) * (lit(100L) + taxp)).as("charge_cpp"),
          discp.as("discp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("qty")).cast("long").as("sum_qty"),
          sum(col("extc")).cast("long").as("sum_base_cents"),
          sum(col("disc_cp")).cast("long").as("sum_disc_cp"),
          // cents*pct*pct rows reach ~1e11 — a long sum overflows near
          // 1e8 rows/group, so the charge total runs in DECIMAL
          sum(col("charge_cpp").cast("decimal(38,0)"))
            .cast("decimal(38,0)").as("sum_charge_cpp"),
          count(lit(1)).cast("long").as("count_order"),
          sum(col("discp")).cast("long").as("sum_discp"))
        .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
          col("sum_base_cents"), col("sum_disc_cp"),
          // exposed DECIMAL → STRING (r10 decimal contract; the exact
          // decimal sum happened above)
          col("sum_charge_cpp").cast("string").as("sum_charge_cpp"),
          col("count_order"),
          expr("round(CAST(sum_qty AS DOUBLE) / count_order, 6)")
            .as("avg_qty"),
          expr("round(CAST(sum_base_cents AS DOUBLE) / 100 / count_order," +
            " 6)").as("avg_price"),
          expr("round(CAST(sum_discp AS DOUBLE) / 100 / count_order, 6)")
            .as("avg_disc"))
    }),
    "q_tpch_q18" -> ((s, dir) => {
      // TPC-H Q18 shape (large-volume customers): orders whose total
      // quantity clears the threshold, joined back to customer — the
      // agg-filter-join-back pattern; exact integer quantities.
      val big = table(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
        .filter(col("total_qty") > 320L)
      table(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(table(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("o_date"),
          round(col("o_totalprice") * 100, 0).cast("long")
            .as("total_cents"),
          col("total_qty"))
    }),
    "q_kendalls_w" -> ((s, dir) => {
      // HOW MUCH do the five event types agree on user ranking (not
      // just whether they differ): Kendall's W = chi2_F/(n(k-1)) on
      // the friedman kernel — 0 = no concordance, 1 = identical
      // rankings.
      val ut = table(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      Profiling.friedman(ut, "user_id", "event_type", "cents")
        .select(col("k"), col("n_items"), col("chi2"),
          expr("CASE WHEN chi2 IS NOT NULL AND n_items > 0 AND k > 1 " +
            "THEN round(chi2 / (n_items * (k - 1)), 6) END")
            .as("kendalls_w"))
    }),
    "q_tpch_q3" -> ((s, dir) => {
      // TPC-H Q3 shape (shipping-priority top 10): BUILDING segment,
      // orders before / shipments after the cutoff; revenue kept EXACT
      // in cents*pct units; customer dim broadcast, fact-fact join on
      // the order key.
      val rev = round(col("l_extendedprice") * 100, 0).cast("long") *
        (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
      val c = table(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o = table(s, dir, "orders")
        .filter(expr("o_orderdate < timestamp '1998-06-01'"))
        .select(col("o_orderkey"), col("o_custkey"),
          to_date(col("o_orderdate")).as("o_date"))
      val l = table(s, dir, "lineitem")
        .filter(expr("l_shipdate > timestamp '1998-06-01'"))
        .select(col("l_orderkey"), rev.as("rev"))
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_date"))
        .agg(sum(col("rev")).cast("long").as("revenue_cp"))
        .orderBy(col("revenue_cp").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"), col("o_date"), col("revenue_cp"),
          expr("round(CAST(revenue_cp AS DOUBLE) / 10000, 6)")
            .as("revenue"))
    }),
    "q_tpch_q5" -> ((s, dir) => {
      // TPC-H Q5 shape (local-supplier volume in ASIA for one year):
      // customer and supplier must share a nation; all dims broadcast,
      // the two facts join on the order key.
      val rev = round(col("l_extendedprice") * 100, 0).cast("long") *
        (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
      val asiaNations = table(s, dir, "nation")
        .join(broadcast(table(s, dir, "region")
          .filter(col("r_name") === "ASIA").select(col("r_regionkey"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val o = table(s, dir, "orders")
        .filter(expr("o_orderdate >= timestamp '1996-01-01' AND " +
          "o_orderdate < timestamp '1997-01-01'"))
        .select(col("o_orderkey"), col("o_custkey"))
      val l = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), rev.as("rev"))
      o.join(broadcast(table(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(table(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asiaNations),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev")).cast("long").as("revenue_cp"))
        .select(col("n_name"), col("revenue_cp"),
          expr("round(CAST(revenue_cp AS DOUBLE) / 10000, 6)")
            .as("revenue"))
    }),
    "q_ref_integrity" -> ((s, dir) => {
      // Star-schema FK audit: orphan counts per relation via left-anti
      // joins against the (broadcast) parent key sets — the load-gate
      // check a warehouse runs before trusting a batch.
      def rel(name: String, child: DataFrame, ck: String,
          parent: DataFrame, pk: String): DataFrame = {
        val orphans = child.select(col(ck).as("k"))
          .join(broadcast(parent.select(col(pk).as("k")).distinct()),
            Seq("k"), "left_anti")
          .agg(count(lit(1)).cast("long").as("n_orphans"))
        child.agg(count(lit(1)).cast("long").as("n_child"))
          .crossJoin(orphans)
          .select(lit(name).as("relation"), col("n_child"),
            col("n_orphans"))
      }
      rel("lineitem->orders", table(s, dir, "lineitem"), "l_orderkey",
          table(s, dir, "orders"), "o_orderkey")
        .unionByName(rel("lineitem->part", table(s, dir, "lineitem"),
          "l_partkey", table(s, dir, "part"), "p_partkey"))
        .unionByName(rel("lineitem->supplier", table(s, dir, "lineitem"),
          "l_suppkey", table(s, dir, "supplier"), "s_suppkey"))
        .unionByName(rel("orders->customer", table(s, dir, "orders"),
          "o_custkey", table(s, dir, "customer"), "c_custkey"))
        .unionByName(rel("customer->nation", table(s, dir, "customer"),
          "c_nationkey", table(s, dir, "nation"), "n_nationkey"))
        .unionByName(rel("supplier->nation", table(s, dir, "supplier"),
          "s_nationkey", table(s, dir, "nation"), "n_nationkey"))
    }),
    "q_life_table" -> ((s, dir) => {
      // Actuarial daily life table for time-to-first-error per parity
      // cohort: half-censoring exposure in doubled integers, nano-log
      // survival products.
      val users = table(s, dir, "events")
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          (col("event_type") === "error").as("is_err"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
          min(when(col("is_err"), col("ms"))).as("err_ms"))
        .select(
          concat(lit("c"), pmod(col("user_id"), lit(2L))).as("cohort"),
          expr("(coalesce(err_ms, last_ms) - first_ms) div 3600000")
            .as("t_hours"),
          col("err_ms").isNotNull.as("event"))
      Survival.lifeTable(users, "cohort", "t_hours", "event", width = 24L)
    }),
    "q_perm_test" -> ((s, dir) => {
      // Assumption-free p for the parity-arm spend difference: 64
      // deterministic hash re-randomizations, exact integer sums,
      // add-one p.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"))
        .withColumn("arm", pmod(col("user_id"), lit(2L)) === 0L)
      Sampling.permTest(users, "user_id", "arm", "spend")
    }),
    "q_cox" -> ((s, dir) => {
      // Does spend change the error hazard? Cox PH on time-to-first-
      // error (censored at last activity), covariate = total spend:
      // 3 fixed Newton steps on micro-quantized risk-set sums.
      val users = table(s, dir, "events")
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          (col("event_type") === "error").as("is_err"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
          min(when(col("is_err"), col("ms"))).as("err_ms"),
          sum(col("cents")).as("spend"))
        .select(
          expr("(coalesce(err_ms, last_ms) - first_ms) div 3600000")
            .as("t_hours"),
          col("err_ms").isNotNull.as("event"), col("spend"))
      Survival.coxPH(users, "t_hours", "event", "spend")
    }),
    "q_negbin" -> ((s, dir) =>
      // When q_burstiness says overdispersed: the negative-binomial
      // (r, p) you can actually threshold against, MoM on the dense
      // hourly grid.
      graft.operators.TimeSeries.negbinFit(
        table(s, dir, "events").select(col("event_type"),
          expr("unix_millis(ts) div 3600000").as("h")),
        "event_type", "h")),
    "q_dunn" -> ((s, dir) =>
      // WHICH sources differ in doc-length distribution (after
      // q_kruskal_wallis's omnibus): pairwise Dunn z on the shared
      // midrank kernel, A-S two-sided p, Bonferroni across pairs.
      Profiling.dunnTest(
        table(s, dir, "documents"), "source", "n_chars")),
    "q_eb_shrinkage" -> ((s, dir) => {
      // Honest per-user purchase rates: Beta prior fit by method of
      // moments on the rate distribution, posterior-mean shrinkage —
      // thin keys pull toward the prior, thick keys barely move.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("n_purch"),
          count(lit(1)).cast("long").as("n_events"))
      Eval.ebShrink(users, "user_id", "n_purch", "n_events")
    }),
    "q_mahalanobis" -> ((s, dir) => {
      // Users off the spend~activity correlation ridge: 2-D Mahalanobis
      // top-20 — exact moment covariance, closed-form inverse, rounded
      // distances with id tie-break.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          count(lit(1)).cast("long").as("n_events"))
      Profiling.mahalanobis2d(users, "user_id", "spend", "n_events")
    }),
    "q_partial_corr" -> ((s, dir) => {
      // Does spend~purchases survive controlling for raw activity?
      // Three pairwise Pearsons off ONE exact moment row, partial via
      // the shared chain over the rounded r's.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("y"),
          count(lit(1)).cast("long").as("z"))
      Profiling.partialCorr(users, "x", "y", "z")
    }),
    "q_trimmed_mean" -> ((s, dir) =>
      // Robust per-type cents location: exact 5%-trimmed mean off the
      // distinct-value prefix sum — tie blocks split exactly at cuts.
      Eval.trimmedMean(
        table(s, dir, "events").select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "cents")),
    "q_platt" -> ((s, dir) => {
      // Turn the spend score into a PROBABILITY of purchase: Platt
      // sigmoid fit on the standardized score, 4 fixed Newton steps
      // with micro-quantized gradient/Hessian sums; final log-loss.
      val ev = table(s, dir, "events").select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      Eval.plattScale(ev, "cents", "is_pos")
    }),
    "q_youden" -> ((s, dir) => {
      // WHERE to cut the spend score for the heavy-purchase screen:
      // Youden-J argmax over the exact integer (TPR-FPR) numerator on
      // the auc prefix-sum kernel; smallest-threshold tie-break.
      val ev = table(s, dir, "events").select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      Eval.youdenThreshold(ev, "cents", "is_pos")
    }),
    "q_ece" -> ((s, dir) => {
      // One-number calibration check for the spend score: expected
      // calibration error over the 10-bin reliability table,
      // micro-quantized per-bin gaps, exact weighted sum.
      val ev = table(s, dir, "events").select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      Eval.ece(ev, "cents", "is_pos")
    }),
    "q_rake" -> ((s, dir) =>
      // What is each source ABOUT? RAKE keyphrases: stopword-delimited
      // candidate runs, degree/frequency word scores micro-quantized so
      // phrase sums stay exact; deterministic top-10 per source.
      TextAnalysis.rakeKeyphrases(table(s, dir, "documents"))),
    "q_diversity_index" -> ((s, dir) =>
      // Template-farm screen per source: Shannon/Simpson/evenness of
      // the token distribution — exact pair counts + nano entropy.
      TextAnalysis.diversityIndex(table(s, dir, "documents"))),
    "q_burstiness" -> ((s, dir) =>
      // Poisson-or-bursty per type over the DENSE hourly grid (empty
      // buckets enter through the algebra, not a spine join).
      graft.operators.TimeSeries.fanoFactor(
        table(s, dir, "events").select(col("event_type"),
          expr("unix_millis(ts) div 3600000").as("h")),
        "event_type", "h")),
    "q_mcnemar" -> ((s, dir) => {
      // Paired model comparison on the SAME users: rule A (spend) vs
      // rule B (clicks) predicting the heavy-purchaser label — only the
      // discordant cells drive the continuity-corrected chi-square.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("n_purch"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("n_click"))
        .withColumn("heavy", col("n_purch") >= 15L)
        .withColumn("ok_a", (col("spend") > 330000L) === col("heavy"))
        .withColumn("ok_b", (col("n_click") >= 20L) === col("heavy"))
      Profiling.mcnemar(users, "ok_a", "ok_b")
    }),
    "q_brown_forsythe" -> ((s, dir) =>
      // Homogeneity-of-variance gate for q_anova: ANOVA F on |cents −
      // group median| with medians off the prefix-sum kernel — the
      // robust Levene variant, exact integer deviations throughout.
      Eval.brownForsythe(
        table(s, dir, "events").select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "cents")),
    "q_mcc" -> ((s, dir) => {
      // Matthews correlation of the spend>threshold rule against the
      // heavy-purchaser label — the imbalance-honest single score from
      // four exact confusion cells in one aggregate.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          (sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) >= 15L)
            .as("heavy"))
        .withColumn("pred", col("spend") > 330000L) // ≈ median user spend
      Profiling.mcc(users, "pred", "heavy")
    }),
    "q_sign_test" -> ((s, dir) => {
      // Paired sign test: does each user spend more on even or odd
      // days? Ties drop; exact win counts, one z chain — the
      // weakest-assumption paired test next to the signed-rank tier.
      val users = table(s, dir, "events")
        .select(col("user_id"),
          expr("unix_millis(ts) div 86400000").as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .groupBy(col("user_id"))
        .agg(sum(when(col("day") % 2 === 0L, col("cents")).otherwise(0L))
            .cast("long").as("spend_even"),
          sum(when(col("day") % 2 === 1L, col("cents")).otherwise(0L))
            .cast("long").as("spend_odd"))
      Profiling.signTest(users, "spend_even", "spend_odd")
    }),
    "q_g_test" -> ((s, dir) =>
      // Likelihood-ratio independence of lang × length tier — the G
      // twin of q_chi2_independence; micro-quantized O·ln(O·N/NrNc)
      // cell terms. (Length tier, not source: lang × 20 sources puts
      // df at 76, past the critical table, NULLing the flag — the
      // degenerate-output sweep's r10 find.)
      Profiling.gTest(
        table(s, dir, "documents").select(col("lang"),
          when(col("n_chars") >= 380L, "long")
            .when(col("n_chars") >= 220L, "mid").otherwise("short")
            .as("len_tier")),
        "lang", "len_tier")),
    "q_risk_ratio" -> ((s, dir) => {
      // Does heavy clicking associate with heavy purchasing? RR + OR
      // with Wald log-scale CIs off four exact 2x2 cells (balanced
      // 53/26/47/24 table at sf0.01; the original had_error exposure
      // was TRUE for every user — all four estimates NULLed).
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg((sum(when(col("event_type") === "click", 1L).otherwise(0L))
            >= 14L).as("clicker"),
          (sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            >= 15L).as("heavy"))
      Profiling.riskRatio(users, "clicker", "heavy")
    }),
    "q_cmh" -> ((s, dir) => {
      // The clicker→heavy association CONTROLLED for spend tier:
      // Mantel-Haenszel pooled OR vs the crude OR, CMH chi2, and the
      // Simpson's-paradox flag — per-stratum nano terms, exact sums
      // (same balanced clicker exposure as q_risk_ratio).
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          (sum(when(col("event_type") === "click", 1L).otherwise(0L))
            >= 14L).as("clicker"),
          (sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            >= 15L).as("heavy"))
        .withColumn("tier",
          when(col("spend") >= 360000L, "high")
            .when(col("spend") >= 300000L, "mid").otherwise("low"))
      Profiling.cmh(users, "tier", "clicker", "heavy")
    }),
    "q_wilcoxon_signed" -> ((s, dir) => {
      // Magnitude-aware paired twin of q_sign_test on the SAME pairing
      // (even-day vs odd-day spend per user): doubled midranks of |d|
      // off the prefix-sum kernel, tie-corrected z.
      val users = table(s, dir, "events")
        .select(col("user_id"),
          expr("unix_millis(ts) div 86400000").as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .groupBy(col("user_id"))
        .agg(sum(when(col("day") % 2 === 0L, col("cents")).otherwise(0L))
            .cast("long").as("spend_even"),
          sum(when(col("day") % 2 === 1L, col("cents")).otherwise(0L))
            .cast("long").as("spend_odd"))
      Profiling.wilcoxonSignedRank(users, "spend_even", "spend_odd")
    }),
    "q_page_trend" -> ((s, dir) =>
      // Ordered-alternative sharpening of q_friedman on the same
      // user × event-type spend layout: Page's L with the treatment
      // order = sorted type labels, exact doubled-rank L2.
      Profiling.pageTrend(
        table(s, dir, "events")
          .groupBy(col("user_id"), col("event_type"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("v")),
        "user_id", "event_type", "v")),
    "q_link_predictors" -> ((s, dir) => {
      // The classical predictor battery (common neighbors / Jaccard /
      // preferential attachment / resource allocation) on the SAME
      // repeat-co-purchase graph as q_link_prediction — one wedge
      // enumeration feeds all four scores.
      val li = table(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").cast("long").as("src"),
          col("b.l_partkey").cast("long").as("dst"))
        .agg(count_distinct(col("a.l_orderkey")).as("n_ord"))
        .filter(col("n_ord") >= 2)
        .select(col("src"), col("dst"))
      graft.operators.Graph.linkPredictors(e, "src", "dst", topK = 20)
    }),
    "q_cvm" -> ((s, dir) => {
      // Whole-distribution spend comparison (high-clickers vs the
      // rest) — the integrated-ECDF-gap companion to q_mann_whitney
      // (location) and q_ks_test (max gap): exact decimal numerator
      // over one value-domain prefix sum. Same balanced clicker split
      // as q_mann_whitney (had_error degenerates at sf0.01).
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          (sum(when(col("event_type") === "click", 1L).otherwise(0L))
            >= 14L).as("clicker"))
      Profiling.cramerVonMises(users, "clicker", "spend")
    }),
    "q_jonckheere" -> ((s, dir) => {
      // Does spend INCREASE along purchase-count tiers? The ordered
      // alternative over independent groups (the q_page_trend twin):
      // exact doubled J off the zero-filled grid prefix sums.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("n_purch"))
        .withColumn("tier",
          when(col("n_purch") >= 20L, "3_high")
            .when(col("n_purch") >= 12L, "2_mid").otherwise("1_low"))
      Profiling.jonckheere(users, "tier", "spend")
    }),
    "q_granger" -> ((s, dir) => {
      // Do yesterday's clicks improve today's purchase forecast beyond
      // purchases' own past? Lag-1 Granger F per parity cohort — one
      // moment row solves both nested fits closed-form.
      val daily = table(s, dir, "events")
        .groupBy(concat(lit("c"), pmod(col("user_id"), lit(2L)))
            .as("cohort"),
          expr("unix_millis(ts) div 86400000").as("day"))
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .cast("long").as("y"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("x"))
      graft.operators.TimeSeries.grangerLag1(
        daily, "cohort", "day", "y", "x")
    }),
    "q_hill_tail" -> ((s, dir) =>
      // How heavy is each language's token-frequency tail? Hill MLE on
      // counts >= 2 — the tail-only companion to q_zipf's OLS slope.
      TextAnalysis.hillTail(table(s, dir, "documents"))),
    "q_yules_k" -> ((s, dir) =>
      // Scale-invariant repeat rate per source — the TTR replacement
      // that survives corpus-size changes; exact decimal Σc².
      TextAnalysis.yulesK(table(s, dir, "documents"))),
    "q_forecast_skill" -> ((s, dir) =>
      // Is there weekly structure in each type's daily cents? Season-7
      // naive vs persistence on shared support, exact absolute errors.
      graft.operators.TimeSeries.naiveSkill(
        table(s, dir, "events")
          .groupBy(col("event_type"),
            expr("unix_millis(ts) div 86400000").as("day"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("v")),
        "event_type", "day", "v")),
    "q_nelson_aalen" -> ((s, dir) => {
      // Cumulative hazard of first error per parity cohort — the
      // additive twin of q_kaplan_meier on the same subject table:
      // exact nano hazard increments + Breslow survival.
      val users = table(s, dir, "events")
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          (col("event_type") === "error").as("is_err"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
          min(when(col("is_err"), col("ms"))).as("err_ms"))
        .select(
          concat(lit("c"), pmod(col("user_id"), lit(2L))).as("cohort"),
          expr("(coalesce(err_ms, last_ms) - first_ms) div 3600000")
            .as("t_hours"),
          col("err_ms").isNotNull.as("event"))
      Survival.nelsonAalen(users, "cohort", "t_hours", "event")
    }),
    "q_harmonic_centrality" -> ((s, dir) => {
      // Which parts sit closest to the co-purchase core? Landmark
      // harmonic centrality (8 lowest-id landmarks, 3 BFS hops) — the
      // documented Eppstein-Wang estimator, deterministic end to end.
      val li = table(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").cast("long").as("src"),
          col("b.l_partkey").cast("long").as("dst"))
        .agg(count_distinct(col("a.l_orderkey")).as("n_ord"))
        .filter(col("n_ord") >= 2)
        .select(col("src"), col("dst"))
      graft.operators.Graph.harmonicCentrality(e, "src", "dst")
    }),
    "q_stream_risk_ratio" -> ((s, dir) =>
      // The 2x2 risk readout as an in-stream monitor: complete-mode
      // per-user exposure/outcome state, RR/OR + CIs on the drained
      // table — shares the batch q_risk_ratio oracle.
      Profiling.riskRatio(
        runToMemory(s, eventsStream(s, dir)
          .groupBy(col("user_id"))
          .agg((sum(when(col("event_type") === "click", 1L).otherwise(0L))
              >= 14L).as("clicker"),
            (sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              >= 15L).as("heavy")),
          "complete"),
        "clicker", "heavy")),
    "q_gof_dow" -> ((s, dir) =>
      // Is each type's traffic uniform across the 7-day cycle? Per-key
      // GOF chi2 with the zero-cell correction in the algebra — the
      // calendar-structure alarm next to q_forecast_skill.
      Profiling.gofUniform(
        table(s, dir, "events").select(col("event_type"),
          expr("(unix_millis(ts) div 86400000) % 7").as("dow")),
        "event_type", "dow")),
    "q_shift_function" -> ((s, dir) => {
      // WHERE does heavy purchasers' spend differ from the rest? Nine
      // decile quantiles side by side with their gap — the location
      // readout after q_cvm's whole-distribution yes/no. (Split on the
      // heavy flag, not had_error: every sf0.01 user touches an error,
      // which would empty one side.)
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          (sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            >= 15L).as("heavy"))
      Profiling.shiftFunction(users, "heavy", "spend")
    }),
    "q_capture_recapture" -> ((s, dir) =>
      // Chapman estimate of the distinct-visitor population from two
      // deterministic hash captures, audited in-row against the exact
      // count — the two-sample cousin of q_kmv_distinct.
      Sampling.captureRecapture(table(s, dir, "events"), "user_id")),
    "q_bowker" -> ((s, dir) => {
      // Do users' spend tiers MOVE symmetrically between even and odd
      // days? The kxk McNemar: per-pair micro terms, df = informative
      // pairs only.
      def tier(c: org.apache.spark.sql.Column) =
        when(c >= 180000L, "h").when(c >= 150000L, "m").otherwise("l")
      val users = table(s, dir, "events")
        .select(col("user_id"),
          expr("unix_millis(ts) div 86400000").as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .groupBy(col("user_id"))
        .agg(sum(when(col("day") % 2 === 0L, col("cents")).otherwise(0L))
            .cast("long").as("x"),
          sum(when(col("day") % 2 === 1L, col("cents")).otherwise(0L))
            .cast("long").as("y"))
        .select(tier(col("x")).as("tier_even"), tier(col("y")).as("tier_odd"))
      Profiling.bowkerSymmetry(users, "tier_even", "tier_odd")
    }),
    "q_atkinson" -> ((s, dir) =>
      // Welfare-weighted spend inequality per type (epsilon = 1) —
      // the log-utility companion to q_gini; exact nano ln sums.
      Eval.atkinson(
        table(s, dir, "events").groupBy(col("event_type"), col("user_id"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents")),
        "event_type", "cents")),
    "q_theil_index" -> ((s, dir) =>
      // The decomposable third of the inequality trio on the same
      // per-type user-spend layout — exact milli x·ln x sums.
      Eval.theilIndex(
        table(s, dir, "events").groupBy(col("event_type"), col("user_id"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents")),
        "event_type", "cents")),
    "q_stream_sign_test" -> ((s, dir) =>
      // The paired sign test as an in-stream monitor: complete-mode
      // per-user even/odd-day spend state, sign z on the drained
      // table — shares the batch q_sign_test oracle.
      Profiling.signTest(
        runToMemory(s, eventsStream(s, dir)
          .select(col("user_id"),
            expr("unix_millis(ts) div 86400000").as("day"),
            round(col("value") * 100, 0).cast("long").as("cents"))
          .groupBy(col("user_id"))
          .agg(sum(when(col("day") % 2 === 0L, col("cents"))
              .otherwise(0L)).cast("long").as("x"),
            sum(when(col("day") % 2 === 1L, col("cents"))
              .otherwise(0L)).cast("long").as("y")),
          "complete"),
        "x", "y")),
    "q_risk_diff" -> ((s, dir) => {
      // The absolute-scale 2x2 readout (RD + Wald CI + z + NNT) on the
      // same balanced clicker→heavy table as q_risk_ratio.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg((sum(when(col("event_type") === "click", 1L).otherwise(0L))
            >= 14L).as("clicker"),
          (sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            >= 15L).as("heavy"))
      Profiling.riskDiff(users, "clicker", "heavy")
    }),
    "q_rank_tau" -> ((s, dir) => {
      // Exact tau + footrule over the shared top-100 of the revenue
      // and quantity rankers — the unweighted companion to q_rbo.
      val parts = table(s, dir, "lineitem").groupBy(col("l_partkey"))
        .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
            .as("revenue"),
          sum(col("l_quantity").cast("long")).as("qty"))
      Eval.rankAgreement(parts, "l_partkey", "revenue", "qty", k = 100)
    }),
    "q_rbo" -> ((s, dir) => {
      // Do the revenue ranker and the quantity ranker surface the same
      // top parts? Truncated RBO@100, top-weighted via p=0.9 — exact
      // micro terms off one k-row cumulative.
      val parts = table(s, dir, "lineitem").groupBy(col("l_partkey"))
        .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
            .as("revenue"),
          sum(col("l_quantity").cast("long")).as("qty"))
      Eval.rboTopK(parts, "l_partkey", "revenue", "qty", k = 100)
    }),
    "q_woolf" -> ((s, dir) => {
      // Is the clicker→heavy OR HOMOGENEOUS across the spend tiers
      // q_cmh pools over? Woolf chi2 with inverse-variance weights;
      // empty-cell strata drop and are reported.
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          (sum(when(col("event_type") === "click", 1L).otherwise(0L))
            >= 14L).as("clicker"),
          (sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            >= 15L).as("heavy"))
        .withColumn("tier",
          when(col("spend") >= 360000L, "high")
            .when(col("spend") >= 300000L, "mid").otherwise("low"))
      Profiling.woolf(users, "tier", "clicker", "heavy")
    }),
    "q_cronbach_alpha" -> ((s, dir) =>
      // Do the per-type spends hang together as ONE engagement scale?
      // Cronbach's alpha over the user x type layout — exact moments,
      // nano item variances.
      Profiling.cronbachAlpha(
        table(s, dir, "events")
          .groupBy(col("user_id"), col("event_type"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("v")),
        "user_id", "event_type", "v")),
    "q_fisher_ratio" -> ((s, dir) =>
      // Which embedding dimensions separate the labels? Per-dim
      // between/within scatter off exact fixed-point moments — the
      // space-quality probe before q_knn_eval spends a classifier.
      Similarity.fisherRatio(table(s, dir, "embeddings"))),
    "q_zero_inflation" -> ((s, dir) =>
      // Is each type's quiet time a zero SPIKE (on/off mixture) or
      // plain overdispersion? Van den Broek score chi2 over the dense
      // hourly grid — the sharper question after q_burstiness.
      graft.operators.TimeSeries.zeroInflation(
        table(s, dir, "events").select(col("event_type"),
          expr("unix_millis(ts) div 3600000").as("hour")),
        "event_type", "hour")),
    "q_spiegelhalter" -> ((s, dir) => {
      // Unbinned calibration z of the spend score vs purchase — the
      // bin-free companion to q_ece/q_brier on the same conf mapping.
      val ev = table(s, dir, "events").select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      Eval.spiegelhalterZ(ev, "cents", "is_pos")
    }),
    "q_hosmer_lemeshow" -> ((s, dir) => {
      // The classical binned calibration chi2 (10 fixed-width bins,
      // degenerate bins dropped AND reported) on the brier conf map.
      val ev = table(s, dir, "events").select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      Eval.hosmerLemeshow(ev, "cents", "is_pos")
    }),
    "q_tpch_q14" -> ((s, dir) => {
      // TPC-H Q14 (promotion effect): promo share of one month's
      // discounted revenue — exact cents*pct sums in DECIMAL (STRING
      // exposed), one double division.
      val li = table(s, dir, "lineitem")
        .filter(expr("l_shipdate >= timestamp '1997-09-01' AND " +
          "l_shipdate < timestamp '1997-10-01'"))
        .select(col("l_partkey"),
          (round(col("l_extendedprice") * 100, 0).cast("long") *
            (lit(100L) - round(col("l_discount") * 100, 0).cast("long")))
            .as("disc_cp"))
      li.join(table(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("disc_cp"))
            .otherwise(0L).cast("decimal(38,0)"))
            .cast("decimal(38,0)").as("promo_cp"),
          sum(col("disc_cp").cast("decimal(38,0)"))
            .cast("decimal(38,0)").as("total_cp"))
        .withColumn("promo_pct", expr(
          "CASE WHEN CAST(total_cp AS DOUBLE) > 0 THEN " +
            "round(100.0 * CAST(promo_cp AS DOUBLE) / " +
            "CAST(total_cp AS DOUBLE), 6) END"))
        .withColumn("promo_cp", col("promo_cp").cast("string"))
        .withColumn("total_cp", col("total_cp").cast("string"))
    }),
    "q_tpch_q4" -> ((s, dir) => {
      // TPC-H Q4 shape (order priority checking), ADAPTED: the
      // synthetic lineitem has no commit/receipt dates, so "late" =
      // any line shipped > 30 days after the order date. Same plan
      // skeleton as the real Q4: quarter filter + EXISTS semi-join +
      // priority count.
      val o = table(s, dir, "orders")
        .filter(expr("o_orderdate >= timestamp '1997-07-01' AND " +
          "o_orderdate < timestamp '1997-10-01'"))
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
      o.join(li,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > expr("o_orderdate + INTERVAL 30 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).cast("long").as("order_count"))
    }),
    "q_tpch_q12" -> ((s, dir) => {
      // TPC-H Q12 shape (shipping modes vs priority), ADAPTED: the
      // synthetic lineitem has no l_shipmode, so the return flag plays
      // the mode. Same skeleton: year filter, join, per-mode
      // high/low-priority conditional counts.
      table(s, dir, "lineitem")
        .filter(expr("l_shipdate >= timestamp '1997-01-01' AND " +
          "l_shipdate < timestamp '1998-01-01'"))
        .join(table(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT" ||
            col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
            .cast("long").as("high_line_count"),
          sum(when(col("o_orderpriority") =!= "1-URGENT" &&
            col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
            .cast("long").as("low_line_count"))
    }),
    "q_tpch_q2" -> ((s, dir) => {
      // TPC-H Q2 shape (min-cost supplier), ADAPTED: no partsupp table
      // in the synthetic schema, so the part-supplier catalog derives
      // from lineitem pairs with the min observed sell price as the
      // cost. Same skeleton: region-filtered suppliers, per-part
      // min-cost correlated subquery (rewritten as groupBy-min + an
      // exact-cents equality join back), top-100 by balance.
      val sized = broadcast(table(s, dir, "part")
        .filter(col("p_size").between(10, 20) &&
          col("p_type") === "STANDARD")
        .select(col("p_partkey")))
      val eur = broadcast(table(s, dir, "supplier")
        .join(broadcast(table(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, dir, "region")
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"),
          round(col("s_acctbal") * 100, 0).cast("long")
            .as("s_acctbal_cents"),
          col("n_name")))
      // part filter pushed BELOW the per-pair min so only qualifying
      // parts ever aggregate (per-part min is unaffected by it)
      val costs = table(s, dir, "lineitem")
        .join(sized, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_partkey"), col("l_suppkey"))
        .agg(min(round(col("l_extendedprice") * 100, 0).cast("long"))
          .as("cost_cents"))
        .join(eur, col("l_suppkey") === col("s_suppkey"))
      val minCost = costs.groupBy(col("p_partkey"))
        .agg(min(col("cost_cents")).as("min_cost"))
      costs.join(minCost, Seq("p_partkey"))
        .filter(col("cost_cents") === col("min_cost"))
        .select(col("s_acctbal_cents"), col("s_name"), col("n_name"),
          col("p_partkey"), col("cost_cents"))
        .orderBy(col("s_acctbal_cents").desc, col("n_name"),
          col("s_name"), col("p_partkey"))
        .limit(100)
    }),
    "q_tpch_q7" -> ((s, dir) => {
      // TPC-H Q7 (volume shipping): revenue flowing between two
      // nations by supplier-nation x customer-nation x ship year. The
      // nation pair filter is pushed into BOTH broadcast dims before
      // the fact-fact join; the pair-validity check runs after. Few
      // huge groups => the cents*pct sum runs in DECIMAL and is
      // exposed as STRING per the r10 decimal contract.
      val rev = round(col("l_extendedprice") * 100, 0).cast("long") *
        (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
      val nat = table(s, dir, "nation")
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = table(s, dir, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cus = table(s, dir, "customer")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      table(s, dir, "lineitem")
        .filter(expr("l_shipdate >= timestamp '1996-01-01' AND " +
          "l_shipdate < timestamp '1998-01-01'"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          rev.as("rev"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cus), col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(sum(col("rev").cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("rev_d"))
        .select(col("supp_nation"), col("cust_nation"), col("l_year"),
          col("rev_d").cast("string").as("revenue_cp"),
          expr("round(CAST(rev_d AS DOUBLE) / 10000, 6)").as("revenue"))
    }),
    "q_tpch_q8" -> ((s, dir) => {
      // TPC-H Q8 (national market share): NATION_3's share of ECONOMY
      // part revenue sold into AMERICA, by order year. Numerator and
      // denominator accumulate in DECIMAL (few huge groups), the share
      // divides as DOUBLE.
      val rev = round(col("l_extendedprice") * 100, 0).cast("long") *
        (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
      val amerCust = table(s, dir, "customer")
        .join(broadcast(table(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, dir, "region")
          .filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val suppNat = table(s, dir, "supplier")
        .join(broadcast(table(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      table(s, dir, "lineitem")
        .join(broadcast(table(s, dir, "part")
          .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("l_suppkey"), rev.as("rev"))
        .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
        .join(table(s, dir, "orders")
          .filter(expr("o_orderdate >= timestamp '1996-01-01' AND " +
            "o_orderdate < timestamp '1998-01-01'"))
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).cast("long").as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(amerCust), col("o_custkey") === col("c_custkey"),
          "left_semi")
        .groupBy(col("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3", col("rev"))
            .otherwise(0L).cast("decimal(38,0)"))
            .cast("decimal(38,0)").as("num_d"),
          sum(col("rev").cast("decimal(38,0)"))
            .cast("decimal(38,0)").as("den_d"))
        .select(col("o_year"),
          expr("CASE WHEN CAST(den_d AS DOUBLE) > 0 THEN " +
            "round(CAST(num_d AS DOUBLE) / CAST(den_d AS DOUBLE), 6) " +
            "END").as("mkt_share"),
          col("den_d").cast("string").as("total_rev_cp"))
    }),
    "q_tpch_q9" -> ((s, dir) => {
      // TPC-H Q9 (product-type profit), ADAPTED: no partsupp, so the
      // supply cost proxies as p_retailprice (scaled into the same
      // cents*pct units). Profit per supplier nation per order year
      // over parts named like widget; 25x7 groups aggregate the whole
      // fact table => DECIMAL sums, STRING exposure.
      val amount = round(col("l_extendedprice") * 100, 0).cast("long") *
        (lit(100L) - round(col("l_discount") * 100, 0).cast("long")) -
        round(col("p_retailprice") * 100, 0).cast("long") * lit(100L) *
          col("l_quantity").cast("long")
      table(s, dir, "lineitem")
        .join(broadcast(table(s, dir, "part")
          .filter(col("p_name").like("%widget%"))
          .select(col("p_partkey"), col("p_retailprice"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(table(s, dir, "supplier")
          .join(broadcast(table(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("nation"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("l_orderkey"), col("nation"), amount.as("amount"))
        .join(table(s, dir, "orders")
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("nation"), col("o_year"))
        .agg(sum(col("amount").cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("profit_d"))
        .select(col("nation"), col("o_year"),
          col("profit_d").cast("string").as("sum_profit_cp"),
          expr("round(CAST(profit_d AS DOUBLE) / 10000, 6)")
            .as("sum_profit"))
    }),
    "q_tpch_q10" -> ((s, dir) => {
      // TPC-H Q10 (returned-item revenue): customers who returned
      // goods ordered in one quarter, top 20 by lost revenue. The
      // aggregate runs fact-side keyed on the customer BEFORE the dim
      // join, so the wide customer row never rides the big shuffle.
      val rev = round(col("l_extendedprice") * 100, 0).cast("long") *
        (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
      val agg = table(s, dir, "orders")
        .filter(expr("o_orderdate >= timestamp '1997-10-01' AND " +
          "o_orderdate < timestamp '1998-01-01'"))
        .select(col("o_orderkey"), col("o_custkey"))
        .join(table(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), rev.as("rev")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("rev")).cast("long").as("revenue_cp"))
      agg.join(broadcast(table(s, dir, "customer")
          .join(broadcast(table(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_name"),
            round(col("c_acctbal") * 100, 0).cast("long")
              .as("c_acctbal_cents"),
            col("n_name"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue_cp"),
          expr("round(CAST(revenue_cp AS DOUBLE) / 10000, 6)")
            .as("revenue"),
          col("c_acctbal_cents"), col("n_name"))
        .orderBy(col("revenue_cp").desc, col("c_custkey"))
        .limit(20)
    }),
    "q_tpch_q11" -> ((s, dir) => {
      // TPC-H Q11 shape (important stock), ADAPTED: inventory value
      // proxies as summed sell cents per part over one nation's
      // suppliers. Skeleton preserved: group-by HAVING against a
      // global-scalar fraction (broadcast 1-row cross join, exact
      // integer compare value*1000 > total).
      val perPart = table(s, dir, "lineitem")
        .join(broadcast(table(s, dir, "supplier")
          .join(broadcast(table(s, dir, "nation")
            .filter(col("n_name") === "NATION_7")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_partkey"))
        .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
          .cast("long").as("value_cents"))
      perPart
        .crossJoin(broadcast(perPart.agg(
          sum(col("value_cents")).cast("long").as("total_cents"))))
        .filter(col("value_cents") * 1000 > col("total_cents"))
        .select(col("l_partkey").as("p_partkey"), col("value_cents"))
    }),
    "q_tpch_q13" -> ((s, dir) => {
      // TPC-H Q13 (customer order-count distribution), ADAPTED: the
      // o_comment NOT LIKE filter stands in as an order-priority
      // exclusion. Skeleton preserved: LEFT join with the filter in
      // the join condition (customers with zero surviving orders must
      // count at c_count = 0), then the distribution of counts.
      table(s, dir, "customer").select(col("c_custkey"))
        .join(table(s, dir, "orders")
          .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
          .select(col("o_custkey"), col("o_orderkey")),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).cast("long").as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).cast("long").as("custdist"))
    }),
    "q_tpch_q15" -> ((s, dir) => {
      // TPC-H Q15 (top supplier): quarterly revenue per supplier, keep
      // the supplier(s) equal to the max (scalar subquery => broadcast
      // 1-row cross join; exact BIGINT equality so ties are exact).
      val rev = round(col("l_extendedprice") * 100, 0).cast("long") *
        (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
      val r = table(s, dir, "lineitem")
        .filter(expr("l_shipdate >= timestamp '1997-01-01' AND " +
          "l_shipdate < timestamp '1997-04-01'"))
        .groupBy(col("l_suppkey"))
        .agg(sum(rev).cast("long").as("total_rev_cp"))
      r.crossJoin(broadcast(r.agg(max(col("total_rev_cp")).as("max_rev"))))
        .filter(col("total_rev_cp") === col("max_rev"))
        .join(broadcast(table(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev_cp"),
          expr("round(CAST(total_rev_cp AS DOUBLE) / 10000, 6)")
            .as("total_rev"))
    }),
    "q_tpch_q16" -> ((s, dir) => {
      // TPC-H Q16 shape (part/supplier relationship), ADAPTED: the
      // part-supplier relation derives from DISTINCT lineitem pairs
      // (no partsupp) and the complaints NOT IN subquery stands in as
      // negative-balance suppliers. Skeleton preserved: anti-join the
      // excluded suppliers, brand/type/size filters, COUNT(DISTINCT
      // suppkey) per class.
      table(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .join(broadcast(table(s, dir, "supplier")
          .filter(col("s_acctbal") < 0).select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(table(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#5" &&
            col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
          .select(col("p_partkey"), col("p_brand"), col("p_type"),
            col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"),
          col("p_size").cast("long").as("p_size"))
        .agg(countDistinct(col("l_suppkey")).cast("long")
          .as("supplier_cnt"))
    }),
    "q_tpch_q17" -> ((s, dir) => {
      // TPC-H Q17 (small-quantity-order revenue), ADAPTED: container
      // filter stands in as a size bound. The correlated per-part avg
      // rewrites as groupBy + join back; the 20%-of-avg comparison is
      // EXACT integer arithmetic (qty*5*n < sum_qty), so no double
      // threshold can flip a borderline row across engines.
      val small = broadcast(table(s, dir, "part")
        .filter(col("p_brand") === "Brand#3" && col("p_size") < 10)
        .select(col("p_partkey")))
      val li = table(s, dir, "lineitem")
        .join(small, col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"),
          col("l_quantity").cast("long").as("qty"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("extc"))
      val pa = li.groupBy(col("l_partkey"))
        .agg(sum(col("qty")).as("sumq"),
          count(lit(1)).cast("long").as("cnt"))
      li.join(pa, Seq("l_partkey"))
        .filter(col("qty") * 5 * col("cnt") < col("sumq"))
        .agg(sum(col("extc")).cast("long").as("sum_cents"))
        .select(col("sum_cents"),
          expr("round(CAST(sum_cents AS DOUBLE) / 100 / 7.0, 6)")
            .as("avg_yearly"))
    }),
    "q_tpch_q19" -> ((s, dir) => {
      // TPC-H Q19 (discounted revenue, OR-of-ANDs), ADAPTED: container
      // and shipmode predicates stand in as size and returnflag. The
      // disjunction sits in ONE filter so Catalyst can push the shared
      // l_returnflag conjunct to the scan; single global sum =>
      // DECIMAL, STRING exposure.
      val rev = round(col("l_extendedprice") * 100, 0).cast("long") *
        (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
      table(s, dir, "lineitem")
        .join(broadcast(table(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"), col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .filter(col("l_returnflag") === "N" && (
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30))))
        .agg(sum(rev.cast("decimal(38,0)")).cast("decimal(38,0)")
          .as("rev_d"))
        .select(col("rev_d").cast("string").as("revenue_cp"),
          expr("round(CAST(rev_d AS DOUBLE) / 10000, 6)").as("revenue"))
    }),
    "q_tpch_q20" -> ((s, dir) => {
      // TPC-H Q20 shape (part promotion), ADAPTED: availqty proxies as
      // the supplier's shipped share of a part's yearly volume —
      // suppliers of PROMO parts who shipped > 30% of the part's 1997
      // total, restricted to three nations. Skeleton preserved:
      // nested IN subqueries become semi-joins; the share compare is
      // exact integer (sq*10 > tq*3).
      val yr = table(s, dir, "lineitem")
        .filter(expr("l_shipdate >= timestamp '1997-01-01' AND " +
          "l_shipdate < timestamp '1998-01-01'"))
        .join(broadcast(table(s, dir, "part")
          .filter(col("p_type") === "PROMO").select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .select(col("l_partkey"), col("l_suppkey"),
          col("l_quantity").cast("long").as("qty"))
      val sp = yr.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("qty")).as("sq"))
      val pt = yr.groupBy(col("l_partkey")).agg(sum(col("qty")).as("tq"))
      val qual = sp.join(pt, Seq("l_partkey"))
        .filter(col("sq") * 10 > col("tq") * 3)
        .select(col("l_suppkey")).distinct()
      table(s, dir, "supplier")
        .join(broadcast(table(s, dir, "nation")
          .filter(col("n_name").isin("NATION_4", "NATION_5", "NATION_6"))
          .select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"), "left_semi")
        .join(qual, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
    }),
    "q_tpch_q21" -> ((s, dir) => {
      // TPC-H Q21 (suppliers who kept orders waiting), ADAPTED: "late"
      // = shipped > 60 days after the order date (no receipt/commit
      // dates). The EXISTS/NOT-EXISTS pair rewrites Spark-first as ONE
      // per-order aggregate — n_supp > 1 (another supplier exists) and
      // n_late_supp = 1 (no OTHER late supplier) — instead of two
      // correlated self-joins.
      val l = table(s, dir, "lineitem")
        .join(table(s, dir, "orders")
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          expr("l_shipdate > o_orderdate + INTERVAL 60 DAYS").as("late"))
      val os = l.groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(when(col("late"), col("l_suppkey")))
            .as("n_late_supp"))
      l.filter(col("late"))
        .join(os, Seq("l_orderkey"))
        .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
        .join(broadcast(table(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).cast("long").as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }),
    "q_tpch_q22" -> ((s, dir) => {
      // TPC-H Q22 (global sales opportunity), ADAPTED: country code =
      // nation key (no c_phone), "never ordered" = no order since
      // 2000-09-01 (the synthetic order volume leaves almost nobody
      // order-free for all time). The above-average-balance compare is
      // exact integer (bal*n > sum) so no double threshold straddles
      // engines; NOT EXISTS = left anti.
      val cust = table(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          round(col("c_acctbal") * 100, 0).cast("long").as("bal_cents"),
          col("c_acctbal"))
      val pos = cust.filter(col("c_acctbal") > 0)
        .agg(sum(col("bal_cents")).cast("long").as("s"),
          count(lit(1)).cast("long").as("n"))
      cust.filter(col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
        .crossJoin(broadcast(pos))
        .filter(col("bal_cents") * col("n") > col("s"))
        .join(table(s, dir, "orders")
          .filter(expr("o_orderdate >= timestamp '2000-09-01'"))
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").cast("long").as("cntrycode"))
        .agg(count(lit(1)).cast("long").as("numcust"),
          sum(col("bal_cents")).cast("long").as("totacctbal_cents"))
    }),
    "q_turning_points" -> ((s, dir) => {
      // Is each event type's hourly spend pure noise? Turning-point
      // count vs the i.i.d. null over the 720-hour January series —
      // too few turns = persistence/trend, too many = alternation.
      // Hour index is RELATIVE to Jan 1 2024 (small exact integers).
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("v"))
      graft.operators.TimeSeries.turningPoints(
        hourly, "event_type", "h", "v")
    }),
    "q_cox_stuart" -> ((s, dir) => {
      // Did each event type's hourly spend drift across the month?
      // Cox-Stuart pairs hour i with hour i+ceil(n/2) and sign-tests —
      // the half-span pairing catches slow monotone drifts lag-1
      // tests miss.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("v"))
      graft.operators.TimeSeries.coxStuart(hourly, "event_type", "h", "v")
    }),
    "q_chow_test" -> ((s, dir) => {
      // Did the hourly-spend TREND break mid-month? Chow F on the
      // y ~ hour fit, break at hour 360 (Jan 16 00:00) — pooled vs
      // per-segment residuals per event type.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("v"))
      graft.operators.TimeSeries.chowTest(
        hourly, "event_type", "h", "v", breakBucket = 360L)
    }),
    "q_welch_anova" -> ((s, dir) => {
      // Do mean user-day spends differ across event types WITHOUT
      // assuming equal variances (which q_bartlett shows they don't
      // have)? Welch's F per day-of-week over per-(user, type) totals.
      val obs = table(s, dir, "events")
        .groupBy(dayofweek(col("ts")).cast("long").as("dow"),
          col("event_type"), col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("cents"))
      graft.operators.Normalize.welchAnova(
        obs, "dow", "event_type", "cents")
    }),
    "q_breusch_pagan" -> ((s, dir) =>
      // Does price-residual variance grow with quantity? (It must:
      // extendedprice ~ qty x unit price, so the spread fans out.)
      // LM = n.R^2 of squared OLS residuals regressed back on qty.
      graft.operators.Eval.breuschPagan(
        table(s, dir, "lineitem")
          .select(col("l_quantity").cast("long").as("q"),
            round(col("l_extendedprice") * 100, 0).cast("long").as("p")),
        "q", "p")),
    "q_cooks_distance" -> ((s, dir) =>
      // WHICH parts bend the retail-price ~ size fit: top-20 by
      // Cook's D — the rows a pricing audit deletes and refits.
      graft.operators.Eval.cooksDistance(
        table(s, dir, "part")
          .select(col("p_partkey"), col("p_size").cast("long").as("sz"),
            round(col("p_retailprice") * 100, 0).cast("long").as("rc")),
        "p_partkey", "sz", "rc", topK = 20)),
    "q_hodges_lehmann" -> ((s, dir) => {
      // Robust shift between even- and odd-id users' total spend:
      // the median pairwise difference in cents — outlier-immune where
      // a mean difference isn't, in the metric's own units.
      val users = table(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("cents"))
      graft.operators.Profiling.hodgesLehmann(
        users.filter(pmod(col("user_id"), lit(2L)) === 0L),
        users.filter(pmod(col("user_id"), lit(2L)) === 1L),
        "cents")
    }),
    "q_dist_distance" -> ((s, dir) => {
      // How far apart are click and purchase value distributions?
      // The full histogram-distance panel (TV / Bhattacharyya /
      // Hellinger / overlap) over 10 pooled-span bins.
      val e = table(s, dir, "events")
        .select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("c"))
      graft.operators.Profiling.distDistances(
        e.filter(col("event_type") === "click"),
        e.filter(col("event_type") === "purchase"),
        "c", nBins = 10)
    }),
    "q_fleiss_kappa" -> ((s, dir) => {
      // Three deterministic tier rules as raters over users: does the
      // spend rule agree with the click and view rules beyond chance?
      def tier(c: org.apache.spark.sql.Column, t3: Long, t2: Long, t1: Long) =
        when(c >= t3, 3L).when(c >= t2, 2L).when(c >= t1, 1L).otherwise(0L)
      val users = table(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("spend"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .cast("long").as("n_click"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .cast("long").as("n_view"))
        .materialize
      val long = users.select(col("user_id"), lit("r_spend").as("rater"),
          tier(col("spend"), 360000L, 330000L, 300000L).as("cat"))
        .unionByName(users.select(col("user_id"), lit("r_click").as("rater"),
          tier(col("n_click"), 25L, 20L, 15L).as("cat")))
        .unionByName(users.select(col("user_id"), lit("r_view").as("rater"),
          tier(col("n_view"), 25L, 20L, 15L).as("cat")))
      Profiling.fleissKappa(long, "user_id", "rater", "cat")
    }),
    "q_drawdown" -> ((s, dir) => {
      // Worst peak-to-trough drop in each event type's hourly spend —
      // exact integer drop + the (peak, trough, hour) triple that
      // realizes it, earliest trough on ties.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("v"))
      graft.operators.TimeSeries.drawdown(hourly, "event_type", "h", "v")
    }),
    "q_bollinger" -> ((s, dir) => {
      // 24-hour Bollinger envelope over hourly spend: breach flags are
      // EXACT decimal integer compares (no double sqrt can flip a
      // boolean across engines); only the mid is a double.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("v"))
      graft.operators.TimeSeries.bollinger(
        hourly, "event_type", "h", "v", nBars = 24, k = 2)
    }),
    "q_rsi" -> ((s, dir) => {
      // Cutler's 14-bar RSI over hourly spend per event type: exact
      // long gain/loss sums, one double division at the end.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("v"))
      graft.operators.TimeSeries.rsi(hourly, "event_type", "h", "v", 14)
    }),
    "q_stochastic" -> ((s, dir) => {
      // 14-bar stochastic oscillator: %K from rolling min/max, %D the
      // 3-bar mean of MICRO-QUANTIZED %K (sum of longs — a double sum
      // would be order-dependent across engines).
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("v"))
      graft.operators.TimeSeries.stochasticOsc(
        hourly, "event_type", "h", "v", 14)
    }),
    "q_vwap" -> ((s, dir) =>
      // Volume-weighted average unit price per (returnflag, ship
      // month): notional = extendedprice cents, volume = quantity —
      // the execution-benchmark twin of q_twap's time weighting.
      graft.operators.TimeSeries.vwap(
        table(s, dir, "lineitem").select(col("l_returnflag"),
          date_trunc("month", col("l_shipdate")).cast("date").as("m"),
          round(col("l_extendedprice") * 100, 0).cast("long")
            .as("notional_cents"),
          col("l_quantity").cast("long").as("qty")),
        "l_returnflag", "m", "notional_cents", "qty")),
    "q_atr" -> ((s, dir) => {
      // 8-bar average true range over q_ohlc_bars' 6-hour bars — the
      // gap-aware volatility gauge, composed directly on the bar
      // operator's output.
      val ev = table(s, dir, "events").select(col("event_type"),
        unix_millis(col("ts")).as("ms"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      graft.operators.TimeSeries.atr(
        graft.operators.TimeSeries.ohlcBars(
          ev, "event_type", "ms", "event_id", "cents", barMs = 21600000L),
        "event_type", "bar_start_ms", nBars = 8)
    }),
    "q_binomial_test" -> ((s, dir) =>
      // Do even-id users really generate half of each event type's
      // traffic? Exact-rational null 1/2, continuity-corrected z.
      graft.operators.Profiling.binomialTest(
        table(s, dir, "events")
          .withColumn("even_user", pmod(col("user_id"), lit(2L)) === 0L),
        "event_type", "even_user", p0Num = 1L, p0Den = 2L)),
    "q_poisson_rates" -> ((s, dir) =>
      // Did each event type's arrival RATE change after the first
      // week? Conditional-binomial two-rate test: week-1 events vs the
      // rest, exposures 7 and 24 days.
      graft.operators.Profiling.poissonTwoRate(
        table(s, dir, "events")
          .withColumn("in_week1", dayofmonth(col("ts")) <= 7),
        "event_type", "in_week1", tA = 7L, tB = 24L)),
    "q_anderson_darling" -> ((s, dir) => {
      // Are hourly spends normal? AD weights the CDF distance by
      // 1/(F(1-F)) so tail departures q_jarque_bera smears show up.
      // DOLLARS, not cents: keeps Σx² exactly double-representable.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value"), 0).cast("long")).cast("long").as("v"))
      graft.operators.Normalize.andersonDarling(hourly, "event_type", "v")
    }),
    "q_kpss" -> ((s, dir) => {
      // Is hourly spend level-stationary? KPSS's null is STATIONARY —
      // the mirror of q_dickey_fuller; exact decimal bridge sums,
      // nano-quantized per-row terms.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value"), 0).cast("long")).cast("long").as("v"))
      graft.operators.TimeSeries.kpss(hourly, "event_type", "h", "v")
    }),
    "q_dickey_fuller" -> ((s, dir) => {
      // Does hourly spend mean-revert or random-walk? DF regression of
      // the hourly delta on the lagged level, t vs the -2.86
      // nonstandard critical value.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value"), 0).cast("long")).cast("long").as("v"))
      graft.operators.TimeSeries.dickeyFuller(hourly, "event_type", "h", "v")
    }),
    "q_dsir_weights" -> ((s, dir) =>
      // Which documents look like the English reference slice? DSIR
      // unigram importance weights: avg log p_target/p_source with
      // add-1 smoothing, micro-quantized per token — the cheap
      // resampling score before classifier-based filtering.
      graft.operators.TextAnalysis.dsirWeights(
        table(s, dir, "documents")
          .withColumn("is_en", col("lang") === "en"),
        "is_en")),
    "q_mmd" -> ((s, dir) =>
      // Did the embedding distribution drift between the even and odd
      // vector populations? Linear-kernel MMD^2 = squared distance of
      // the mean embeddings, nano-quantized per dimension.
      graft.operators.Similarity.mmdLinear(
        table(s, dir, "embeddings")
          .withColumn("in_a", pmod(col("vec_id"), lit(2L)) === 0L),
        "in_a")),
    "q_random_projection" -> ((s, dir) =>
      // Seed-free Rademacher JL reduction of the 64-dim embeddings to
      // 4 dims: the +/-1 matrix derives from a multiplicative hash of
      // (i, j), so re-runs and the oracle materialize the same matrix.
      graft.operators.Similarity.randomProjection(
        table(s, dir, "embeddings"), k = 4)),
    "q_local_clustering" -> ((s, dir) => {
      // Which parts sit inside tight co-purchase cliques vs acting as
      // bridges? Per-vertex clustering coefficient, top-20 by
      // (cc, n_tri). Even-part sparsification (the adamicAdar caller
      // discipline) — q_triangle_count already pays for the full graph.
      val li = table(s, dir, "lineitem")
        .filter(pmod(col("l_partkey"), lit(2)) === 0)
        .select(col("l_orderkey"), col("l_partkey"))
      val e = coPurchasePairs(li)
      graft.operators.Graph.localClustering(e, "src", "dst", topK = 20)
    }),
    "q_local_clustering_capped" -> ((s, dir) => {
      // q_local_clustering with the hub-cap valve engaged (maxDeg =
      // 1000, sub-cap on this data — see q_triangle_count_capped):
      // degrees stay FULL-graph while the triangle kernel runs capped,
      // so a cap that silently dropped edges would skew cc and fail
      // the uncapped oracle.
      val li = table(s, dir, "lineitem")
        .filter(pmod(col("l_partkey"), lit(2)) === 0)
        .select(col("l_orderkey"), col("l_partkey"))
      graft.operators.Graph.localClustering(
        coPurchasePairs(li), "src", "dst", topK = 20, maxDeg = 1000L)
    }),
    "q_pq_encode" -> ((s, dir) =>
      // Product-quantization codes: 64-dim embeddings -> 4 subspace
      // codes from deterministic lowest-id codebooks, exact integer L2
      // assignment — the ANN compression step next to q_similarity_ivf.
      graft.operators.Similarity.pqEncode(
        table(s, dir, "embeddings"), m = 4, k = 16)),
    "q_pq_error" -> ((s, dir) =>
      // Reconstruction quality of the PQ codes: per-vector total exact
      // squared distance and per-coordinate RMSE in original units
      // (64 = the corpus embedding dim, pinned with the oracle).
      graft.operators.Similarity.pqEncode(
        table(s, dir, "embeddings"), m = 4, k = 16)
        .groupBy(col("vec_id"))
        .agg(count(lit(1)).cast("long").as("n_subspaces"),
          sum(col("dist2")).cast("long").as("dist2_total"))
        .withColumn("rmse", expr(
          "round(sqrt(CAST(dist2_total AS DOUBLE) / 64) / 4096, 6)"))),
    "q_ivf_recall" -> ((s, dir) => {
      // recall@10 of the IVF path vs the exact cosine brute force —
      // the partition-pruning twin of q_pq_recall's code-table number;
      // together they certify both approximate search paths.
      val e = table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 8L)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val corpus = e.select(col("vec_id"), col("embedding"))
      Similarity.recallAtK(
        Similarity.bruteForceTopK(q, corpus, k = 10),
        Similarity.ivfTopK(q, corpus, k = 10))
    }),
    "q_power_proportion" -> ((s, dir) => {
      // Experiment design for BINARY metrics: per user-cohort, the
      // per-arm n to detect a 2pp conversion lift and the MDE now.
      // "Converted" = 12+ purchase events — the any-purchase predicate
      // saturates to p = 1.0 at every SF (all-NULL guarded outputs;
      // the r11 degenerate sweep's find), this threshold is interior
      // (~0.55-0.8) at sf0.01 and sf0.1 both.
      val users = table(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("np"))
        .select(pmod(col("user_id"), lit(4L)).as("cohort"),
          (col("np") >= 12L).as("converted"))
      Eval.powerProportion(users, "cohort", "converted",
        deltaPpm = 20000L)
    }),
    "q_l2_topk" -> ((s, dir) => {
      // Exact Euclidean top-10 over quantized coordinates — the L2
      // ground truth q_pq_recall measures the code table against
      // (q_similarity_bruteforce is the cosine twin).
      val e = table(s, dir, "embeddings")
      graft.operators.Similarity.l2TopK(
        e.filter(col("vec_id") < 8L)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        e.select(col("vec_id"), col("embedding")), topK = 10)
    }),
    "q_pq_recall" -> ((s, dir) => {
      // recall@10 of the PQ-ADC search vs exact L2 per query — the
      // measure-don't-guess number that validates m/k before the code
      // table ships.
      val e = table(s, dir, "embeddings")
      graft.operators.Similarity.pqRecall(
        e.filter(col("vec_id") < 8L)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        e.select(col("vec_id"), col("embedding")),
        m = 4, k = 16, topK = 10)
    }),
    "q_pq_train" -> ((s, dir) => {
      // Lloyd-trained PQ codebook (2 refinement iterations seeded from
      // the lowest-id convention) — exact integer centroid rounding,
      // replayed by unrolled per-iteration CTEs like pageRank.
      val e = table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      graft.operators.Similarity.pqCodebookTrained(
        e, m = 4, k = 16, iters = 2)
    }),
    "q_pq_rerank" -> ((s, dir) => {
      // ADC search with exact re-ranking (FAISS-style refine): trained
      // m=16/k=16 codes shortlist 400 candidates per query, exact
      // integer L2 re-picks the top 10 — compressed-domain scan
      // economics with measured recall >= 0.96 (BASELINE.md r11).
      val e = table(s, dir, "embeddings")
      graft.operators.Similarity.pqAdcRerankTopK(
        e.filter(col("vec_id") < 8L)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        e.select(col("vec_id"), col("embedding")),
        m = 16, k = 16, topK = 10, rerank = 400, trainIters = 1)
    }),
    "q_pq_recall_rerank" -> ((s, dir) => {
      // recall@10 of the rerank tier vs exact L2 — the certification
      // number next to q_pq_recall's ADC-only value.
      val e = table(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 8L)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val corpus = e.select(col("vec_id"), col("embedding"))
      graft.operators.Similarity.recallAtK(
        graft.operators.Similarity.l2TopK(q, corpus, topK = 10),
        graft.operators.Similarity.pqAdcRerankTopK(
          q, corpus, m = 16, k = 16, topK = 10, rerank = 400,
          trainIters = 1))
    }),
    "q_containment" -> ((s, dir) => {
      // Exact containment join (|A inter B| / |A| >= 0.8): documents
      // near-contained in a longer one — quotes/snippets/partial
      // copies that Jaccard misses; one-sided rare-first prefix
      // against the full inverted index.
      graft.operators.Dedup.exactContainmentJoin(
        table(s, dir, "documents"), thresholdPpm = 800000L)
    }),
    "q_qini" -> ((s, dir) => {
      // Qini uplift deciles: users ranked by total spend, synthetic
      // treatment = even user_id, conversion = 12+ purchases (the
      // interior predicate — any-purchase saturates to 100% at every
      // SF, the q_power_proportion lesson); q per decile + the Qini
      // coefficient vs the random diagonal.
      val u = table(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("spend"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("np"))
        .select(col("user_id"), col("spend"),
          (pmod(col("user_id"), lit(2L)) === 0L).as("treated"),
          (col("np") >= 12L).as("converted"))
      Eval.qiniDeciles(u, "spend", "treated", "converted", "user_id")
    }),
    "q_time_to_convert" -> ((s, dir) => {
      // Touch->conversion latency distribution: per user ms from the
      // first non-purchase touch to the first purchase at-or-after it,
      // summarized as EXACT p25/p50/p90 per parity cohort.
      val ev = table(s, dir, "events").select(col("user_id"),
        col("event_type"), unix_millis(col("ts")).as("ts_ms"))
      val lat = graft.operators.Sessionize.timeToConvert(ev,
          touchTypes = Seq("click", "error", "signup", "view"),
          convType = "purchase")
        .select(concat(lit("c"), pmod(col("user_id"), lit(2L)))
          .as("cohort"), col("latency_ms"))
      graft.operators.Profiling.exactQuantiles(lat, "cohort",
        "latency_ms", Seq(250000L, 500000L, 900000L))
    }),
    "q_shapley" -> ((s, dir) => {
      // Exact Shapley multi-touch attribution over the four non-
      // purchase channels: presence-based coalitions, 16 exact v(S)
      // values, integer factorial-weighted marginals; the efficient/
      // symmetric upgrade of q_attribution's last-touch credit.
      val ev = table(s, dir, "events")
        .select(col("user_id"), col("event_type"))
      graft.operators.Sessionize.shapleyAttribution(ev,
        touchTypes = Seq("click", "error", "signup", "view"),
        convType = "purchase")
    }),
    "q_ks_test" -> ((s, dir) => {
      // Exact two-sample Kolmogorov-Smirnov on purchase vs click spend
      // distributions: the D supremum and its location decided in
      // exact integers over the distinct-value prefix frame.
      val ev = table(s, dir, "events").select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      graft.operators.Profiling.ksTwoSample(
        ev.filter(col("event_type") === "purchase").select(col("cents")),
        ev.filter(col("event_type") === "click").select(col("cents")),
        "cents")
    }),
    "q_chi2_features" -> ((s, dir) => {
      // chi2 feature selection over the hashed bag-of-words vs the
      // is-English label: exact 2x2 cell counts per dimension, one
      // IEEE chain for the statistic.
      val docs = table(s, dir, "documents")
      val items = graft.operators.TextAnalysis.featureHash(
          docs, "doc_id", "text", numFeatures = 64)
        .select(col("doc_id"), col("dim"))
        .join(docs.select(col("doc_id"),
          (col("lang") === "en").as("is_en")), "doc_id")
      Eval.chi2FeatureScores(items, "doc_id", "dim", "is_en")
    }),
    "q_feature_hash" -> ((s, dir) => {
      // Hashing-trick featurizer: 64-dim signed bag-of-words, emitted
      // as non-zero (doc, dim, value) scalar rows — no vocabulary
      // table, both hashes the portable md5 family.
      graft.operators.TextAnalysis.featureHash(
        table(s, dir, "documents"), "doc_id", "text", numFeatures = 64)
    }),
    "q_vocab_stats" -> ((s, dir) => {
      // Vocabulary pruning table: per token tf/df/rank/coverage share
      // plus the is_rare (df < 2) and is_head (top-50% coverage) flags
      // a tokenizer filter pass consumes.
      graft.operators.TextAnalysis.vocabStats(
        table(s, dir, "documents"), "doc_id", "text",
        minDf = 2L, coveragePpm = 500000L)
    }),
    "q_neyman" -> ((s, dir) => {
      // Neyman allocation of a 1000-row sample budget across event
      // types by N_h * s_h of user-event spend (micro-quantized
      // weights, exact integer moments).
      val ev = table(s, dir, "events").select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      graft.operators.Sampling.neymanAllocation(
        ev, "event_type", "cents", totalN = 1000L)
    }),
    "q_betweenness" -> ((s, dir) => {
      // Landmark betweenness (quantized Brandes, 4 lowest-id pivots,
      // 3-hop horizon) over the purchase graph — the "which vertices
      // sit on the most shortest paths" estimator next to
      // q_harmonic_centrality's landmark distances.
      val edges = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey").cast("long") + 10000000L).as("dst"))
      graft.operators.Graph.betweennessLandmarks(edges, "src", "dst",
        nLandmarks = 4, maxHops = 3, topK = 20)
    }),
    "q_katz" -> ((s, dir) => {
      // Katz centrality (4 damped rounds, alpha = 0.05) over the
      // customer->supplier purchase graph — raw path-count prestige
      // next to q_pagerank's normalized flow; micro-long ranks make
      // every round bit-identical across engines.
      val edges = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey").cast("long") + 10000000L).as("dst"))
      graft.operators.Graph.katzCentrality(edges, "src", "dst",
        iters = 4, alpha = 0.05)
    }),
    "q_max_cover" -> ((s, dir) => {
      // Greedy maximum-coverage curation: the 5 documents that cover
      // the most distinct 3-gram shingles, one exact-integer argmax at
      // a time (disjoint gains -> covered_total is their prefix sum).
      graft.operators.Sampling.greedyMaxCover(
        table(s, dir, "documents"), "doc_id", "text", k = 5, n = 3)
    }),
    "q_ngram_novelty" -> ((s, dir) => {
      // Per-doc fraction of distinct 3-gram shingles unseen in any
      // earlier (lower-id) document — the arrival-order diversity
      // signal; a low-novelty batch is content the corpus already has.
      graft.operators.TextAnalysis.ngramNovelty(
        table(s, dir, "documents"), "doc_id", "text", n = 3)
    }),
    "q_silhouette" -> ((s, dir) => {
      // Simplified (centroid) silhouette per IVF cell — the cluster-
      // quality number for the search partition, on the exact
      // deterministic cell ranking the IVF oracle replays.
      val e = table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      graft.operators.Similarity.silhouetteCells(e, nCentroids = 16)
    }),
    "q_page_hinkley" -> ((s, dir) => {
      // Page-Hinkley upward-drift detector on hourly spend per event
      // type: delta = $1 slack, lambda = $500 threshold (cents scale).
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("v"))
      graft.operators.TimeSeries.pageHinkley(
        hourly, "event_type", "h", "v", delta = 100L, lambda = 50000L)
    }),
    "q_enrichment" -> ((s, dir) => {
      // Over-representation analysis: is the high-value flag (spend
      // >= $80) enriched in each event type? Hypergeometric z with the
      // finite-population correction, continuity-corrected.
      val ev = table(s, dir, "events").select(col("event_type"),
        (round(col("value") * 100, 0).cast("long") >= 8000L).as("hi"))
      graft.operators.Profiling.enrichment(ev, "event_type", "hi")
    }),
    "q_tukey_fences" -> ((s, dir) => {
      // Boxplot-rule outlier screen per event type: exact type-1
      // quartiles via the ranged prefix-sum kernel, fence membership
      // decided in integer QUARTERS (no double ever flips a flag).
      val ev = table(s, dir, "events").select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      graft.operators.Profiling.tukeyFences(ev, "event_type", "cents")
    }),
    "q_equidepth_hist" -> ((s, dir) => {
      // ANALYZE-style equi-depth histogram (8 buckets) per event type:
      // each distinct value assigned whole by its end rank — exact
      // counts, optimizer/drift-monitor food.
      val ev = table(s, dir, "events").select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      graft.operators.Profiling.equiDepthHistogram(
        ev, "event_type", "cents", nBuckets = 8)
    }),
    "q_conover" -> ((s, dir) => {
      // Conover squared-ranks variance-homogeneity test across event
      // types — the rank-based sibling of q_bartlett/q_levene: median-
      // centered integer deviations, normalized micro-quantized squared
      // midranks, chi2(k-1) referral.
      val ev = table(s, dir, "events").select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      graft.operators.Normalize.conoverSquaredRanks(
        ev, "event_type", "cents")
    }),
    "q_forecast_accuracy" -> ((s, dir) => {
      // MAE/RMSE/sMAPE/MASE of the seasonal-naive (lag-24) forecast on
      // hourly spend, scaled by the lag-1 naive per Hyndman's MASE.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("v"))
      graft.operators.TimeSeries.forecastAccuracy(
        hourly, "event_type", "h", "v", fLag = 24, sLag = 1)
    }),
    "q_dtype_canary" -> ((s, dir) => {
      // Dtype-contract regression canary (VERDICT r10 #8): the HUGEINT
      // (r7) and DECIMAL (r9) episodes were both "new output dtype
      // class meets the hasher" — this one query exposes every dtype
      // class the engine emits (byte/short/int/long, float/double,
      // boolean, string, date, epoch-millis instants per the output
      // convention, decimal-rendered-as-string per the r10 contract,
      // and NULL cells of two classes), so the next dtype drift fails
      // ONE canary instead of eleven stats queries. Raw timestamps are
      // deliberately absent: the engine's documented convention
      // renders instants as unix_millis BIGINT (Spark LTZ vs DuckDB
      // naive timestamps cannot hash-match).
      val li = table(s, dir, "lineitem")
      li.groupBy(col("l_returnflag").as("flag"))
        .agg(
          count(lit(1)).cast("long").as("c_long"),
          countDistinct(col("l_linenumber")).cast("int").as("c_int"),
          max(col("l_linenumber")).cast("short").as("c_short"),
          min(col("l_linenumber")).cast("byte").as("c_byte"),
          min(col("l_quantity")).cast("float").as("c_float"),
          expr("round(CAST(SUM(CAST(ROUND(l_extendedprice*100, 0)" +
            " AS BIGINT)) AS DOUBLE) / (CAST(100 AS DOUBLE) * COUNT(*))" +
            ", 6)").as("c_double"),
          min(col("l_shipdate")).cast("date").as("c_date"),
          max(unix_millis(col("l_shipdate").cast("timestamp")))
            .cast("long").as("c_ts_ms"),
          sum(col("l_quantity").cast("long").cast("decimal(38,0)"))
            .cast("decimal(38,0)").cast("string").as("c_dec_str"))
        .withColumn("c_bool", col("flag") === "R")
        .withColumn("c_null_double", expr(
          "CASE WHEN flag = 'N' THEN CAST(NULL AS DOUBLE) " +
            "ELSE c_double END"))
        .withColumn("c_null_date", expr(
          "CASE WHEN flag = 'N' THEN CAST(NULL AS DATE) ELSE c_date END"))
    }),
    "q_auc_ci" -> ((s, dir) => {
      // q_auc's point estimate with the DeLong confidence interval:
      // exact integer placement values off the same distinct-score
      // prefix frame, variance from their exact moments.
      val ev = table(s, dir, "events").select(
        round(col("value") * 100, 0).cast("long").as("cents"),
        (col("event_type") === "purchase").as("is_pos"))
      Eval.aucDeLongCi(ev, "cents", "is_pos")
    }),
    "q_power_analysis" -> ((s, dir) => {
      // Experiment design: per event type, the per-arm n needed to
      // detect a $50 lift in user-day spend at alpha=.05 / 80% power,
      // and the minimum detectable effect at the current n.
      val ud = table(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"),
          expr("unix_millis(ts) div 86400000").as("day"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("cents"))
      Eval.powerAnalysis(ud, "event_type", "cents", delta = 5000L)
    }),
    "q_stream_hhi" -> ((s, dir) => {
      // Streaming concentration watch: the per-(type, user) spend
      // rollup runs as a COMPLETE-mode streaming aggregate (the
      // incremental part); the tiny share^2 finish is batch SQL over
      // the drained table — shares q_hhi's oracle text verbatim.
      val perUser = runToMemory(s, eventsStream(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("c")), "complete")
      import org.apache.spark.sql.expressions.Window
      perUser
        .withColumn("t", sum(col("c")).over(
          Window.partitionBy(col("event_type"))).cast("long"))
        .withColumn("term", expr(graft.operators.Eval.hhiTermNanoSql))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n_firms"),
          max(col("t")).as("total"),
          sum(col("term")).cast("long").as("s_nano"),
          max(col("c")).cast("long").as("top_c"))
        .withColumn("hhi", expr(graft.operators.Eval.hhiSql))
        .withColumn("top_share", expr(
          "CASE WHEN total > 0 THEN " +
            "round(CAST(top_c AS DOUBLE) / total, 6) END"))
    }),
    "q_elasticity" -> ((s, dir) => {
      // Price elasticity of demand per brand: slope of ln(qty) on
      // ln(unit price) from MILLI-quantized logs (defined identically
      // in both engines; sums stay inside 2^53) — the log-log OLS
      // every pricing team runs first.
      val li = table(s, dir, "lineitem")
        .join(table(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"),
          expr("CAST(round(1000 * ln(CAST(l_quantity AS DOUBLE)), 0)" +
            " AS BIGINT)").as("y"),
          expr("CAST(round(1000 * ln(round(l_extendedprice * 100, 0) / " +
            "CAST(l_quantity AS DOUBLE)), 0) AS BIGINT)").as("x"))
      graft.operators.TimeSeries.elasticity(li, "p_brand", "x", "y")
    }),
    "q_seasonal_anomaly" -> ((s, dir) => {
      // Decomposition-based anomaly screen: hours whose REMAINDER
      // (what's left after trend + hour-of-day cycle) deviates > 5 MAD
      // — catches spikes the raw-value MAD screen (q_anomaly_mad)
      // would excuse as "it's just a busy hour".
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value"), 0).cast("long")).cast("long").as("v"))
      val d = graft.operators.TimeSeries.classicalDecompose(
          hourly, "event_type", "h", "v", period = 24)
        .select(col("event_type"), col("h"),
          expr("CAST(round(remainder * 1e6, 0) AS BIGINT)").as("r_micro"))
      graft.operators.TimeSeries.madOutliers(
          d, "event_type", "h", "r_micro")
        .withColumn("anomaly", expr("mad > 0 AND dev > 5 * mad"))
        .orderBy(col("dev").desc, col("event_type"), col("h"))
        .limit(20)
    }),
    "q_pq_adc" -> ((s, dir) => {
      // PQ search by asymmetric distance: per-query codeword lookup
      // tables (exact integer L2), corpus scanned as CODES only —
      // the compressed-domain sibling of q_similarity_bruteforce/ivf.
      val e = table(s, dir, "embeddings")
      graft.operators.Similarity.pqAdcTopK(
        e.filter(col("vec_id") < 8L)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        e.select(col("vec_id"), col("embedding")),
        m = 4, k = 16, topK = 10)
    }),
    "q_by_fdr" -> ((s, dir) => {
      // The same 150 per-user rate-change tests as q_bh_fdr, but
      // Benjamini-Yekutieli corrected — valid under ARBITRARY test
      // dependence (the H_m-penalized threshold).
      val perUser = table(s, dir, "events").groupBy(col("user_id"))
        .agg(
          sum(when(dayofmonth(col("ts")) < 16, 1L).otherwise(0L))
            .cast("long").as("n1"),
          sum(when(dayofmonth(col("ts")) >= 16, 1L).otherwise(0L))
            .cast("long").as("n2"))
        .withColumn("z", expr(
          "round(CAST(n2 - n1 AS DOUBLE) / sqrt(CAST(n1 + n2 AS DOUBLE)), 6)"))
        .withColumn("p", expr(s"round(${Profiling.normalPSql("z")}, 6)"))
      Profiling.byFdr(perUser, Seq("user_id"), "p", qPpm = 100000L)
    }),
    "q_wav_activity" -> ((s, dir) => {
      // Voice-activity segments over the decoded frame-energy stream:
      // a GATED saw tone (every third 200-sample frame silenced) gives
      // real on/off structure; segment membership is the exact integer
      // compare sumsq > T^2*n, islands by frame - row_number.
      import s.implicits._
      val media = table(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .as[(Long, Long)]
        .mapPartitions(_.map { case (id, nc) =>
          (id, Multimodal.synthesizeWavGated(
            freqHz = (100 + id % 400).toInt,
            nSamples = (500 + nc % 500).toInt))
        })
        .toDF("doc_id", "content")
      Multimodal.activitySegments(
        Multimodal.wavFrameEnergy(media, frameLen = 200).toDF(),
        thresholdAmp = 16384L)
    }),
    "q_macd" -> ((s, dir) => {
      // Momentum turns in hourly spend: truncated-window EMA12-EMA26
      // with an EMA9 signal line and sign-flip crossover labels —
      // the ewma kernel's proven cross-engine fold, three spans.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value") * 100, 0).cast("long"))
          .cast("long").as("v"))
      graft.operators.TimeSeries.macd(hourly, "event_type", "h", "v")
    }),
    "q_hhi" -> ((s, dir) =>
      // How concentrated is spend within each event type across users?
      // Herfindahl index + dominant share — the mix-concentration twin
      // of q_gini's inequality curve.
      graft.operators.Eval.hhi(
        table(s, dir, "events")
          .select(col("event_type"), col("user_id"),
            round(col("value") * 100, 0).cast("long").as("cents")),
        "event_type", "user_id", "cents")),
    "q_chain_entropy" -> ((s, dir) =>
      // Is the next click predictable from the current page? H(next |
      // current) vs the marginal H(current) over the per-user ordered
      // event-type chain — the one-row "is a sequence model worth it".
      graft.operators.Sessionize.chainEntropy(
        table(s, dir, "events")
          .withColumn("ts_ms", unix_millis(col("ts"))))),
    "q_seasonal_decompose" -> ((s, dir) => {
      // Classical additive decomposition of hourly spend: centered
      // 2x24 MA trend, hour-of-day seasonal (centered), remainder.
      // DOLLARS keep the micro-exact component sums double-safe.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value"), 0).cast("long")).cast("long").as("v"))
      graft.operators.TimeSeries.classicalDecompose(
        hourly, "event_type", "h", "v", period = 24)
    }),
    "q_seasonal_strength" -> ((s, dir) => {
      // Is the hour-of-day cycle or the trend worth modeling? Hyndman
      // variance-ratio strengths over the same decomposition.
      val hourly = table(s, dir, "events")
        .groupBy(col("event_type"),
          expr("(unix_millis(ts) - 1704067200000) div 3600000").as("h"))
        .agg(sum(round(col("value"), 0).cast("long")).cast("long").as("v"))
      graft.operators.TimeSeries.seasonalStrength(
        hourly, "event_type", "h", "v", period = 24)
    }),
    "q_stream_page_hinkley" -> ((s, dir) => {
      // Streaming Page-Hinkley drift tier: the SAME O(1)-per-key
      // (n, sx) stateful fold as q_stream_zscore (its prior moments
      // are exactly PH's running mean inputs), finished by the shared
      // micro-term/cumulative/alarm SQL over the drained batch — the
      // single-batch-determinism contract of the other stream tiers.
      // No Scala-side rounding anywhere: the one round() lives in the
      // shared SQL text both engines evaluate.
      import s.implicits._
      val ev = eventsStream(s, dir)
        .select(
          graft.functions.TextFunctions.tokenHash60(col("event_type"))
            .as("key"),
          unix_millis(col("ts")).as("ts_ms"),
          col("event_id").as("tie"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("x"))
        .as[graft.streaming.StreamingZscore.Ev]
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("key")).orderBy(col("ts_ms"), col("tie"))
      val wc = w.rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
      runToMemory(s,
        graft.streaming.StreamingZscore.zscore(ev).toDF(), "update")
        .withColumn("rn", (col("n_prior") + 1L).cast("long"))
        .withColumn("sv", (col("sx_prior") + col("x")).cast("long"))
        .withColumn("v", col("x"))
        .withColumn("term",
          expr(graft.operators.TimeSeries.phTermMicroSql(100L)))
        .withColumn("ph", sum(col("term")).over(wc).cast("long"))
        .withColumn("ph_min", min(col("ph")).over(wc).cast("long"))
        .withColumn("gap", (col("ph") - col("ph_min")).cast("long"))
        .withColumn("alarm",
          col("gap") > lit(50000L) * lit(1000000L))
        .select(col("key"), col("ts_ms"), col("tie"), col("x"),
          col("rn"), col("sv"), col("ph"), col("ph_min"), col("gap"),
          col("alarm"))
    }),
    "q_stream_zscore" -> ((s, dir) => {
      // Streaming anomaly screen: each spend event judged against the
      // PRIOR per-user moments (three-long state), then folded in.
      // z/flag finish with the SAME shared SQL the window-replay
      // oracle uses; single-file source = one microbatch = batch fold.
      import s.implicits._
      val ev = eventsStream(s, dir)
        .select(col("user_id").as("key"),
          unix_millis(col("ts")).as("ts_ms"),
          col("event_id").as("tie"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("x"))
        .as[graft.streaming.StreamingZscore.Ev]
      runToMemory(s,
        graft.streaming.StreamingZscore.zscore(ev).toDF(), "update")
        .withColumn("z", expr(graft.streaming.StreamingZscore.zSql))
        .withColumn("anomaly", expr("coalesce(abs(z) > 3, false)"))
    }),

    // ---- Round-13 wave 2: graph spectra + HMM decode
    "q_eigen_centrality" -> ((s, dir) => {
      // Truncated power iteration on the undirected part co-purchase
      // graph: 4 UNNORMALIZED rounds, one final max-normalization
      // (deferred by design — see eigenvectorCentrality doc; literal
      // per-round normalization would break engine/oracle parity in
      // finite floats). The Perron-vector complement of q_pagerank's
      // out-degree walk and q_hits' bipartite hub/auth split.
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      graft.operators.Graph.eigenvectorCentrality(
        coPurchasePairs(li), "src", "dst", iters = 4)
    }),
    "q_viterbi" -> ((s, dir) => {
      // Most-likely engaged/idle latent path over each user's first 8
      // events under the fixed integer-score HMM — exact int64 DP
      // (ties prefer E), so path and score are engine-exact with no
      // floating normalization anywhere.
      val ev = table(s, dir, "events")
        .withColumn("ts_ms", unix_millis(col("ts")))
      graft.operators.Sessionize.viterbiDecode(ev, steps = 8)
    }),
    "q_matrix_profile" -> ((s, dir) => {
      // Exact matrix profile over the gap-filled HOURLY event-count
      // series (the time range, not the corpus, bounds the series at
      // ~720 points per 30-day month): 24 h windows, 12 h exclusion
      // zone — per window, the z-normed distance and start of its
      // nearest non-trivial neighbor (motif/discord discovery).
      val perHour = table(s, dir, "events")
        .select(expr("unix_millis(ts) div 3600000").as("hour"))
        .groupBy(col("hour")).agg(count(lit(1)).as("x"))
        .withColumn("k", lit(0))
      val filled = graft.operators.TimeSeries
        .fillBucketGaps(perHour, "k", "hour", "x")
      graft.operators.TimeSeries.matrixProfile(
        filled, "hour", "x", m = 24, excl = 12)
    }),
    "q_ar_forecast" -> ((s, dir) => {
      // Yule-Walker AR(2) on per-user gap-filled daily spend + a
      // 6-step mean-reverting forecast — the model-fitting step the
      // q_acf/q_pacf diagnostics motivate. Degenerate series (zero
      // variance) forecast NULL; users with < 3 days drop (no rho_2).
      val pd = table(s, dir, "events")
        .select(col("user_id"),
          expr("unix_millis(ts) div 86400000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("user_id"), col("day"))
        .agg(sum(col("cents")).as("v"))
      val filled = graft.operators.TimeSeries
        .fillBucketGaps(pd, "user_id", "day", "v")
      graft.operators.TimeSeries.ar2Forecast(
        filled, "user_id", "day", "v", horizon = 6)
    }),
    "q_ridge_path" -> ((s, dir) => {
      // Ridge path over the q_ols2 regression (price on quantity and
      // discount-%): one Gram aggregate, five lambdas fanned over the
      // moment row, closed-form Cramer solve per lambda. lambda = 0
      // reproduces q_ols2's coefficients (spec-pinned).
      val li = table(s, dir, "lineitem").select(
        round(col("l_extendedprice"), 0).cast("long").as("y"),
        col("l_quantity").cast("long").as("x1"),
        round(col("l_discount") * 100, 0).cast("long").as("x2"))
      graft.operators.Eval.ridge2Path(li, "y", "x1", "x2",
        Seq(0L, 1000000L, 10000000L, 100000000L, 1000000000L))
    }),
    "q_poisson_trend" -> ((s, dir) => {
      // Poisson IRLS on daily event counts vs day index (rebased to 0
      // so the micro-quantized weighted moments stay in int64): one
      // row per iteration pins the convergence trajectory, b is the
      // daily log-growth rate.
      val perDay = table(s, dir, "events")
        .select(expr("unix_millis(ts) div 86400000").as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("y"))
        .withColumn("x", col("day") - min(col("day")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
      graft.operators.TimeSeries.poissonTrend(perDay, "x", "y", iters = 4)
    }),
    "q_extractive_chunks" -> ((s, dir) =>
      // Centroid-style extractive selection over 10-token pseudo-
      // sentences: per doc, the most TYPICAL chunk (highest mean corpus
      // log-prob — the summarizer's pick) and the most NOVEL one
      // (lowest — the curation-inspection pick). Vocabulary counts stay
      // a token-keyed shuffle join, never a broadcast.
      graft.operators.TextAnalysis.extractiveChunks(
        table(s, dir, "documents"), chunkTokens = 10)),
    "q_kmeans_lloyd" -> ((s, dir) =>
      // Three CHAINED hash-stable Lloyd rounds (q_kmeans_step is round
      // 1 of this exact trajectory): fixed-point means + float-cast
      // centroids keep every round's assignment engine-exact, so the
      // oracle replays the whole multi-round training run.
      graft.operators.Similarity.kmeansLloydExact(
        table(s, dir, "embeddings"), nCentroids = 8, rounds = 3)),
    "q_target_encode" -> ((s, dir) => {
      // Leave-one-out smoothed target encoding of order priority
      // against a "returned order" label (any R lineitem) — the
      // leakage-safe categorical feature derivation (one category-keyed
      // window + a 1-row global prior).
      val lab = table(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(max((col("l_returnflag") === "R").cast("int")).as("ret"))
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .join(lab, Seq("o_orderkey"))
      graft.operators.Eval.targetEncodeLoo(o, "o_orderpriority", "ret",
        Seq("o_orderkey"), m = 10L)
    }),
    "q_logistic_irls" -> ((s, dir) => {
      // Logistic regression of order fulfillment on price ($k) and
      // priority digit — fixed-count IRLS, one coefficient row per
      // iteration, the exact-moment ols2Solve machinery per round.
      // Label probed interior (33% F at both SFs).
      val o = table(s, dir, "orders").select(
        (col("o_orderstatus") === "F").cast("int").as("y"),
        round(col("o_totalprice") / 1000, 0).cast("long").as("x1"),
        substring(col("o_orderpriority"), 1, 1).cast("long").as("x2"))
      graft.operators.Eval.logisticIrls2(o, "y", "x1", "x2", iters = 4)
    }),
    "q_ipw_ate" -> ((s, dir) => {
      // Hajek IPW average treatment effect of high order priority on
      // order value: logistic propensity on (lineitem count,
      // custkey-bucket), clipped [0.01, 0.99], milli-quantized
      // reweighted sums; the naive mean difference rides along so the
      // output shows what the reweighting moved.
      val nli = table(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("x1"))
      val o = table(s, dir, "orders").select(col("o_orderkey"),
          (substring(col("o_orderpriority"), 1, 1).cast("long") <= 2L)
            .cast("int").as("t"),
          round(col("o_totalprice"), 0).cast("long").as("yo"),
          pmod(col("o_custkey"), lit(7)).cast("long").as("x2"))
        .join(nli, Seq("o_orderkey"))
      graft.operators.Eval.ipwAte(o, "t", "yo", "x1", "x2", iters = 4)
    }),
    "q_hitting_time" -> ((s, dir) => {
      // E[min(steps to first purchase, 8)] from each event type under
      // the observed first-order chain — micro-long recursion, oracle
      // unrolls the 8 rounds.
      val ev = table(s, dir, "events")
        .withColumn("ts_ms", unix_millis(col("ts")))
      graft.operators.Sessionize.expectedHittingTime(
        ev, target = "purchase", horizon = 8)
    }),
    "q_weibull_fit" -> ((s, dir) => {
      // Parametric Weibull summary of the q_kaplan_meier curves:
      // shape/scale per cohort from the probability-plot regression
      // over the interior KM steps (exact micro moments).
      val users = table(s, dir, "events")
        .select(col("user_id"), unix_millis(col("ts")).as("ms"),
          (col("event_type") === "error").as("is_err"))
        .groupBy(col("user_id"))
        .agg(min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"),
          min(when(col("is_err"), col("ms"))).as("err_ms"))
        .select(
          concat(lit("c"), pmod(col("user_id"), lit(2L))).as("cohort"),
          expr("(coalesce(err_ms, last_ms) - first_ms) div 3600000")
            .as("t_hours"),
          col("err_ms").isNotNull.as("event"))
      Survival.weibullFit(users, "cohort", "t_hours", "event")
    }),
    "q_removal_effect" -> ((s, dir) => {
      // Markov removal-effect attribution: which event types carry the
      // 8-step conversion probability? All removal scenarios run in
      // ONE recursion frame; micro-long arithmetic end to end.
      val ev = table(s, dir, "events")
        .withColumn("ts_ms", unix_millis(col("ts")))
      graft.operators.Sessionize.removalEffect(
        ev, target = "purchase", horizon = 8)
    }),
    "q_doubly_robust" -> ((s, dir) => {
      // AIPW on the q_ipw_ate design: logistic propensity + per-arm
      // OLS outcome models, milli-quantized influence sums — the
      // doubly-robust completion of the causal trio (naive/IPW/AIPW).
      val nli = table(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("x1"))
      val o = table(s, dir, "orders").select(col("o_orderkey"),
          (substring(col("o_orderpriority"), 1, 1).cast("long") <= 2L)
            .cast("int").as("t"),
          round(col("o_totalprice"), 0).cast("long").as("yo"),
          pmod(col("o_custkey"), lit(7)).cast("long").as("x2"))
        .join(nli, Seq("o_orderkey"))
      graft.operators.Eval.aipwAte(o, "t", "yo", "x1", "x2", iters = 4)
    }),
    "q_cem_att" -> ((s, dir) => {
      // Coarsened-exact-matching ATT on the same causal design —
      // exact (x1, x2) strata, both-arm cells only, treated-weighted
      // mean differences; reports the unmatched-treated overlap
      // diagnostic.
      val nli = table(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("x1"))
      val o = table(s, dir, "orders").select(col("o_orderkey"),
          (substring(col("o_orderpriority"), 1, 1).cast("long") <= 2L)
            .cast("int").as("t"),
          round(col("o_totalprice"), 0).cast("long").as("yo"),
          pmod(col("o_custkey"), lit(7)).cast("long").as("x2"))
        .join(nli, Seq("o_orderkey"))
      graft.operators.Eval.cemAtt(o, "t", "yo", "x1", "x2")
    }),
    "q_mis" -> ((s, dir) => {
      // Luby maximal independent set on the co-purchase graph: md5
      // priorities replace the RNG, so the whole round trajectory is
      // engine-exact and (id, round) is the pinned output.
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      graft.operators.Graph.maximalIndependentSet(
        coPurchasePairs(li), "src", "dst", maxRounds = 16)
    }),
    "q_simpson_check" -> ((s, dir) => {
      // Simpson's-paradox audit on the causal design: does the
      // aggregate high-priority price difference reverse inside the
      // lineitem-count strata? Exact cross-multiplied sign tests, no
      // division anywhere near the verdict.
      val nli = table(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("x1"))
      val o = table(s, dir, "orders").select(col("o_orderkey"),
          (substring(col("o_orderpriority"), 1, 1).cast("long") <= 2L)
            .cast("int").as("t"),
          round(col("o_totalprice"), 0).cast("long").as("yo"))
        .join(nli, Seq("o_orderkey"))
      graft.operators.Eval.simpsonCheck(o, "t", "yo", "x1")
    }),
    "q_four_cliques" -> ((s, dir) => {
      // K4 participation — one density level past q_triangle_count —
      // on the FULL co-purchase graph: the degree-oriented-DAG
      // enumeration (Chiba–Nishizeki fan-out bound) brought the full
      // graph to triangle-kernel cost, so the former even-part slice
      // is gone.
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      graft.operators.Graph.fourCliqueCounts(
        coPurchasePairs(li), "src", "dst", topK = 20)
    }),
    "q_burrows_delta" -> ((s, dir) =>
      // Burrows' Delta stylometry between the document sources: z-score
      // the top-30 words' micro relative frequencies across sources,
      // mean |dz| per source pair — "which corpora write alike".
      graft.operators.TextAnalysis.burrowsDelta(
        table(s, dir, "documents"), k = 30)),
    "q_boosted_stumps" -> ((s, dir) => {
      // Gradient-boosted depth-1 trees (L2 loss, lr 1/2, 3 rounds) on
      // price vs quantity/discount: exact milli residuals, threshold
      // scans over distinct-value prefix sums, 1-row argmax broadcast
      // per round — the model rows pin the whole boosting trajectory.
      val li = table(s, dir, "lineitem").select(
        round(col("l_extendedprice"), 0).cast("long").as("y"),
        col("l_quantity").cast("long").as("x1"),
        round(col("l_discount") * 100, 0).cast("long").as("x2"))
      graft.operators.Eval.boostedStumps(li, "y", Seq("x1", "x2"),
        rounds = 3)
    }),
    "q_fd_check" -> ((s, dir) => {
      // Functional-dependency audit over four candidate pairs of the
      // orders table: key-like columns hold, the reverse directions
      // leak (exact violation mass per determinant).
      graft.operators.Profiling.fdCheck(table(s, dir, "orders"), Seq(
        ("o_orderkey", "o_custkey"),
        ("o_custkey", "o_orderstatus"),
        ("o_orderpriority", "o_orderstatus"),
        ("o_orderkey", "o_orderpriority")))
    }),
  )

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_sessionize_gap" -> gapSessionizeSql,
    // incremental stitching must reproduce the full recompute exactly
    "q_sessionize_incremental" -> gapSessionizeSql,
    "q_asof_forward" -> asofForwardOracle,
    // forward direction of the custom merge exec: identical relation
    "q_asof_merge_fwd" -> asofForwardOracle,
    "q_asof_nearest" ->
      // both directions on one pass: backward frame orders clicks BEFORE
      // equal-time purchases (side_b 0 < 1), forward frame the reverse
      """WITH u AS (
        |  SELECT event_id, user_id, epoch_ms(ts) AS ms,
        |    CASE WHEN event_type = 'click' THEN event_id END AS c_id,
        |    CASE WHEN event_type = 'click' THEN epoch_ms(ts) END AS c_ms,
        |    CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side_b
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |j AS (
        |  SELECT *,
        |    LAST_VALUE(c_id IGNORE NULLS) OVER wb AS bcid,
        |    LAST_VALUE(c_ms IGNORE NULLS) OVER wb AS bcms,
        |    FIRST_VALUE(c_id IGNORE NULLS) OVER wf AS fcid,
        |    FIRST_VALUE(c_ms IGNORE NULLS) OVER wf AS fcms
        |  FROM u
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY ms, side_b, event_id
        |               ROWS UNBOUNDED PRECEDING),
        |         wf AS (PARTITION BY user_id ORDER BY ms, 1 - side_b, event_id
        |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        |sel AS (
        |  SELECT event_id, user_id, ms,
        |    CASE WHEN bcid IS NULL THEN fcid
        |         WHEN fcid IS NULL THEN bcid
        |         WHEN (fcms - ms) < (ms - bcms) THEN fcid ELSE bcid END AS cid,
        |    CASE WHEN bcid IS NULL THEN fcms
        |         WHEN fcid IS NULL THEN bcms
        |         WHEN (fcms - ms) < (ms - bcms) THEN fcms ELSE bcms END AS cms
        |  FROM j WHERE side_b = 1)
        |SELECT event_id, user_id, ms AS ts_ms,
        |  CAST(COALESCE(cid, -1) AS BIGINT) AS click_event_id,
        |  CAST(COALESCE(cms - ms, 0) AS BIGINT) AS gap_ms
        |FROM sel""".stripMargin,
    "q_overlap_join" ->
      """WITH a AS (
        |  SELECT o_orderkey, epoch_ms(o_orderdate) AS lo_a,
        |    epoch_ms(o_orderdate) + (o_orderkey % 20 + 1) * 86400000 AS hi_a
        |  FROM orders),
        |b AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        |    epoch_ms(TIMESTAMP '1992-01-01') + n_nationkey * 60 * CAST(86400000 AS BIGINT) AS lo_b,
        |    epoch_ms(TIMESTAMP '1992-01-01') + n_nationkey * 60 * CAST(86400000 AS BIGINT)
        |      + 90 * CAST(86400000 AS BIGINT) AS hi_b
        |  FROM nation)
        |SELECT o_orderkey, n_nationkey
        |FROM a JOIN b ON lo_a < hi_b AND lo_b < hi_a""".stripMargin,
    "q_quality_composite" ->
      s"""WITH $qualityCte, $unigramCte
         |SELECT q.doc_id,
         |  round(least(q.stopword_ratio * 5.0, 1.0) * 0.4 +
         |    (1.0 - least(q.symbol_ratio * 10.0, 1.0)) * 0.3 +
         |    least(u.avg_neg_logprob / 12.0, 1.0) * 0.3, 6) AS composite,
         |  round(least(q.stopword_ratio * 5.0, 1.0) * 0.4 +
         |    (1.0 - least(q.symbol_ratio * 10.0, 1.0)) * 0.3 +
         |    least(u.avg_neg_logprob / 12.0, 1.0) * 0.3, 6) >= 0.55 AS keep
         |FROM quality q JOIN u USING (doc_id)""".stripMargin,
    "q_join_shuffle_hash" ->
      """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 200000.0
        |GROUP BY o_orderstatus""".stripMargin,
    "q_union_evolution" ->
      """WITH u AS (
        |  SELECT doc_id, source, n_chars, NULL AS lang, NULL AS quality
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, source, n_chars, lang, n_chars > 200
        |  FROM documents WHERE doc_id % 2 = 1)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(lang) AS BIGINT) AS n_with_lang,
        |  CAST(SUM(CASE WHEN quality THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM u GROUP BY source""".stripMargin,
    // The batch full-rule machine and BOTH streaming tiers emit identical
    // rows (single-trigger replay ≡ batch fold; asserted across tiers in
    // StreamingSpec/CrossImplFuzzSpec), so all three share the recursive-
    // CTE oracle — the sequential state machine, replayed in SQL.
    "q_sessionize_full" -> fullSessionizeSql,
    "q_sessionize_full_incremental" -> fullSessionizeSql,
    "q_sessionize_stream" -> fullSessionizeSql,
    "q_sessionize_stream_tws" -> fullSessionizeSql,
    "q_session_duration" ->
      s"""SELECT user_id, CAST(SUM(max_d) AS BIGINT) AS total_duration FROM (
         |  SELECT user_id, session_id, MAX(duration) AS max_d
         |  FROM ($gapSessionizeSql) GROUP BY user_id, session_id
         |) GROUP BY user_id""".stripMargin,
    "q_loyal_visitors" ->
      s"""SELECT user_id, n_sessions FROM (
         |  SELECT user_id, COUNT(DISTINCT session_id) AS n_sessions
         |  FROM ($gapSessionizeSql) GROUP BY user_id
         |) WHERE n_sessions > 1""".stripMargin,
    "q_uniq_visitors" ->
      "SELECT COUNT(DISTINCT user_id) AS uniq_visitors FROM events",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100, 0) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_star" ->
      """SELECT r_name, n_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q_join_sortmerge" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS price_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_quantity > 10.0
        |GROUP BY o_orderpriority""".stripMargin,
    "q_semi_anti_join" ->
      """SELECT 'with_orders' AS kind, COUNT(*) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'without_orders' AS kind, COUNT(*) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q_outer_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_rows,
        |  COUNT(o_custkey) AS n_matched,
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
        |FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        |  COUNT(*) FILTER (event_type = 'click') AS click,
        |  COUNT(*) FILTER (event_type = 'view') AS view,
        |  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (event_type = 'error') AS error
        |FROM events GROUP BY user_id""".stripMargin,
    "q_scalar_subquery" ->
      """WITH t AS (SELECT CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS total_cents,
        |                 COUNT(*) AS n_orders FROM orders)
        |SELECT o_orderpriority, COUNT(*) AS n_above_avg
        |FROM orders, t
        |WHERE CAST(ROUND(o_totalprice*100,0) AS BIGINT) * n_orders > total_cents
        |GROUP BY o_orderpriority""".stripMargin,
    "q_maxby" ->
      """SELECT o_orderpriority,
        |  arg_max(o_orderkey, cmb) AS max_order,
        |  arg_min(o_orderkey, cmb) AS min_order,
        |  CAST(max(cents) AS BIGINT) AS max_cents
        |FROM (SELECT o_orderpriority, o_orderkey,
        |        CAST(ROUND(o_totalprice*100, 0) AS BIGINT) AS cents,
        |        CAST(ROUND(o_totalprice*100, 0) AS BIGINT) * 1000000000 + o_orderkey AS cmb
        |      FROM orders)
        |GROUP BY o_orderpriority""".stripMargin,
    "q_snapshot_diff" ->
      """WITH o AS (SELECT o_orderkey AS k, CAST(ROUND(o_totalprice*100, 0) AS BIGINT) AS cents
        |           FROM orders WHERE o_orderkey % 11 != 0),
        |n AS (SELECT o_orderkey AS k,
        |        CAST(ROUND(o_totalprice*100, 0) AS BIGINT)
        |          + CASE WHEN o_orderkey % 5 = 0 THEN 100 ELSE 0 END AS cents
        |      FROM orders WHERE o_orderkey % 13 != 0)
        |SELECT COALESCE(o.k, n.k) AS k, o.cents AS old_cents, n.cents AS new_cents,
        |  CASE WHEN o.k IS NULL THEN 'insert' WHEN n.k IS NULL THEN 'delete'
        |       ELSE 'update' END AS op
        |FROM o FULL OUTER JOIN n ON o.k = n.k
        |WHERE o.k IS NULL OR n.k IS NULL OR o.cents IS DISTINCT FROM n.cents""".stripMargin,
    "q_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey, CAST(ROUND(o_totalprice*100, 0) AS BIGINT) AS cents
        |FROM orders o1
        |WHERE CAST(ROUND(o_totalprice*100, 0) AS BIGINT)
        |        * (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o1.o_custkey)
        |      > (SELECT CAST(SUM(CAST(ROUND(o_totalprice*100, 0) AS BIGINT)) AS BIGINT)
        |         FROM orders o3 WHERE o3.o_custkey = o1.o_custkey)""".stripMargin,
    "q_window_dist" ->
      """SELECT o_orderkey, o_orderpriority,
        |  PERCENT_RANK() OVER w AS pr,
        |  CUME_DIST() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY CAST(ROUND(o_totalprice*100, 0) AS BIGINT), o_orderkey)""".stripMargin,
    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders
        |) WHERE rnk <= 3""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "q_map_funcs" ->
      """SELECT event_type, CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_window_agg" ->
      """SELECT epoch_ms(date_trunc('day', ts)) AS day_start_ms, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_session_summary" ->
      s"""SELECT user_id, session_id, COUNT(*) AS n_events,
         |  CAST(MAX(duration) AS BIGINT) AS max_duration,
         |  CAST(MIN(duration) AS BIGINT) AS min_duration
         |FROM ($gapSessionizeSql) GROUP BY user_id, session_id""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))""".stripMargin,
    "q_window_analytics" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(cents) OVER w AS prev_cents,
        |  lead(cents) OVER w AS next_cents,
        |  first_value(cents) OVER (w ROWS UNBOUNDED PRECEDING) AS first_cents,
        |  CAST(SUM(cents) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
        |FROM (SELECT o_custkey, o_orderkey, o_orderdate,
        |        CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q_setops" ->
      """SELECT 'building_with_orders' AS kind, k FROM (
        |  SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT 'building_without_orders' AS kind, k FROM (
        |  SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        |  EXCEPT SELECT o_custkey FROM orders)""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_xml_source" ->
      // reconstructed from source columns — checks the XML round-trip
      """SELECT o_orderpriority AS priority, COUNT(*) AS n,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q_lateral_join" ->
      """SELECT c.c_custkey, x.n_orders, x.max_cents
        |FROM customer c,
        |LATERAL (
        |  SELECT COUNT(*) AS n_orders,
        |    CAST(COALESCE(MAX(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)), -1) AS BIGINT)
        |      AS max_cents
        |  FROM orders o WHERE o.o_custkey = c.c_custkey) x
        |WHERE c.c_custkey % 20 = 0""".stripMargin,
    "q_variant" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(COUNT(CAST(json_extract_string(props, '$.absent') AS BIGINT)) AS BIGINT)
        |    AS n_absent
        |FROM events GROUP BY event_type""".stripMargin,
    "q_string_date" ->
      """SELECT CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS m,
        |  CAST(day(ts) AS BIGINT) AS d,
        |  upper(substr(event_type, 1, 2)) AS et2,
        |  CAST(length(event_type) AS BIGINT) AS et_len,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1, 2, 3, 4, 5""".stripMargin,
    "q_parse_elb" ->
      """SELECT 'u' || CAST(user_id AS VARCHAR) || ':' || CAST(event_id AS VARCHAR) AS ip,
        |  epoch_ms(ts) AS ts_ms
        |FROM events""".stripMargin,
    // the DSv2 source must reproduce the parser exactly — same oracle
    "q_elb_source" ->
      """SELECT 'u' || CAST(user_id AS VARCHAR) || ':' || CAST(event_id AS VARCHAR) AS ip,
        |  epoch_ms(ts) AS ts_ms
        |FROM events""".stripMargin,
    // and its MicroBatchStream tier likewise
    "q_stream_elb_source" ->
      """SELECT 'u' || CAST(user_id AS VARCHAR) || ':' || CAST(event_id AS VARCHAR) AS ip,
        |  epoch_ms(ts) AS ts_ms
        |FROM events""".stripMargin,
    "q_salted_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "q_array_funcs" ->
      """SELECT first3, has_spark, COUNT(*) AS n, CAST(SUM(n_uniq) AS BIGINT) AS sum_uniq
        |FROM (
        |  SELECT doc_id,
        |    array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',') AS first3,
        |    list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
        |  FROM documents)
        |GROUP BY first3, has_spark""".stripMargin,
    "q_dedup_exact" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY md5(text))""".stripMargin,
    "q_dedup_minhash" ->
      s"""WITH $minhashVerifiedCtes
         |SELECT doc_a, doc_b, jaccard FROM verified""".stripMargin,
    "q_dedup_report" ->
      // same reachability closure; duplicated mass = losers' docs/tokens
      s"""WITH RECURSIVE $minhashVerifiedCtes,
         |und AS (
         |  SELECT doc_a AS u, doc_b AS v FROM verified
         |  UNION SELECT doc_b, doc_a FROM verified),
         |reach(u, v) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM und)
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
         |losers AS (
         |  SELECT u AS doc_id FROM reach GROUP BY u HAVING u != MIN(v)),
         |t AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    CASE WHEN doc_id IN (SELECT doc_id FROM losers) THEN 1 ELSE 0 END AS dup
         |  FROM documents)
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(dup) AS BIGINT) AS n_dup_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN dup = 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS n_dup_tokens,
         |  round(sum(dup * n_tokens) * 1.0 / sum(n_tokens), 6) AS dup_token_frac
         |FROM t""".stripMargin,
    "q_dedup_apply" ->
      // keep docs that are not a non-canonical member of any component
      s"""WITH RECURSIVE $minhashVerifiedCtes,
         |und AS (
         |  SELECT doc_a AS u, doc_b AS v FROM verified
         |  UNION SELECT doc_b, doc_a FROM verified),
         |reach(u, v) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM und)
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
         |losers AS (
         |  SELECT u AS doc_id FROM reach GROUP BY u HAVING u != MIN(v))
         |SELECT doc_id, lang, source FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin,
    "q_dedup_components" ->
      // Reachability closure via recursive CTE: component = min reachable
      // id, exactly the fixpoint the Spark label propagation converges to.
      s"""WITH RECURSIVE $minhashVerifiedCtes,
         |und AS (
         |  SELECT doc_a AS u, doc_b AS v FROM verified
         |  UNION SELECT doc_b, doc_a FROM verified),
         |reach(u, v) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM und)
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u)
         |SELECT u AS node, CAST(MIN(v) AS BIGINT) AS component
         |FROM reach GROUP BY u""".stripMargin,
    "q_dedup_simhash" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text,' ') AS tl FROM documents)
         |SELECT doc_id, $simhashSqlExpr AS simhash FROM toks""".stripMargin,
    "q_ngram_jaccard" ->
      s"""WITH $shingleCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  round(len(list_intersect(a.sh, b.sh))*1.0/len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
         |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1""".stripMargin,
    "q_ngram_containment" ->
      s"""WITH $shingleCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  round(len(list_intersect(a.sh, b.sh))*1.0/len(a.sh), 6) AS c_ab,
         |  round(len(list_intersect(a.sh, b.sh))*1.0/len(b.sh), 6) AS c_ba,
         |  greatest(
         |    round(len(list_intersect(a.sh, b.sh))*1.0/len(a.sh), 6),
         |    round(len(list_intersect(a.sh, b.sh))*1.0/len(b.sh), 6)) AS c_max
         |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1""".stripMargin,
    "q_prefix_jaccard" ->
      // INDEPENDENT naive all-pairs oracle (no prefix-filter replay):
      // checks the pruning keeps every qualifying pair. 4-gram shingles.
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS tl FROM documents),
         |sh AS (SELECT doc_id,
         |  list_distinct([tl[i]||'_'||tl[i+1]||'_'||tl[i+2]||'_'||tl[i+3]
         |                 FOR i IN range(1, len(tl)-2)]) AS sh
         |  FROM toks WHERE len(tl) >= 4),
         |ts AS (SELECT doc_id, unnest(sh) AS tok FROM sh),
         |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS s FROM ts GROUP BY doc_id),
         |ov AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS overlap
         |       FROM ts a JOIN ts b ON a.tok = b.tok AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2),
         |j AS (SELECT doc_a, doc_b, overlap, sa.s AS size_a, sb.s AS size_b,
         |    CAST(overlap AS DOUBLE) / (sa.s + sb.s - overlap) AS jac
         |  FROM ov JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b)
         |SELECT doc_a, doc_b, overlap, size_a, size_b, round(jac, 6) AS jaccard
         |FROM j WHERE jac >= 0.5""".stripMargin,
    "q_corpus_overlap" -> corpusOverlapOracle(sampleMod = 1),
    "q_corpus_overlap_sampled" -> corpusOverlapOracle(sampleMod = 4),
    "q_bfs_hops" -> bfsOracle,
    "q_pagerank" -> pagerankOracle,
    "q_ppr" -> pprOracle,
    "q_textrank" -> textrankOracle,
    "q_hits" -> hitsOracle,
    "q_label_prop" -> labelPropOracle,
    "q_emd" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend
         |  FROM events GROUP BY 1),
         |u AS (SELECT spend AS v,
         |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS ia,
         |    CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END AS ib FROM users),
         |per AS (SELECT v, CAST(SUM(ia) AS BIGINT) AS ca,
         |    CAST(SUM(ib) AS BIGINT) AS cb FROM u GROUP BY 1),
         |c AS (SELECT v, ca, cb,
         |    CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) AS cum_ca,
         |    CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) AS cum_cb,
         |    LEAD(v) OVER (ORDER BY v) AS next_v FROM per),
         |t AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
         |    CAST(SUM(cb) AS BIGINT) AS n_b FROM per),
         |g AS (SELECT n_a, n_b,
         |    ${graft.operators.Profiling.emdGapMicroSql} AS gap_micro
         |  FROM c, t WHERE next_v IS NOT NULL),
         |agg AS (SELECT n_a, n_b,
         |    CAST(SUM(gap_micro) AS BIGINT) AS emd_micro
         |  FROM g GROUP BY 1, 2)
         |SELECT n_a, n_b, emd_micro,
         |  round(CAST(emd_micro AS DOUBLE) / 1000000, 6) AS emd
         |FROM agg""".stripMargin,
    "q_jsd" ->
      s"""WITH tk AS (SELECT source AS g,
         |    unnest(string_split(text, ' ')) AS tok FROM documents),
         |counts AS (SELECT g, tok, CAST(COUNT(*) AS BIGINT) AS c FROM tk
         |  WHERE tok <> '' GROUP BY 1, 2),
         |tots AS (SELECT g, CAST(SUM(c) AS BIGINT) AS t
         |  FROM counts GROUP BY 1),
         |hp AS (SELECT g,
         |    CAST(SUM(${graft.operators.TextAnalysis
                  .entropyTermNanoSql("c", "t")}) AS BIGINT) AS h_nano
         |  FROM counts JOIN tots USING (g) GROUP BY g),
         |ex AS (SELECT LEAST(a.g, o.g2) AS ga, GREATEST(a.g, o.g2) AS gb,
         |    a.tok,
         |    CASE WHEN a.g < o.g2 THEN a.c ELSE 0 END AS c_a,
         |    CASE WHEN a.g < o.g2 THEN 0 ELSE a.c END AS c_b,
         |    CASE WHEN a.g < o.g2 THEN t.t ELSE o.t2 END AS t_a,
         |    CASE WHEN a.g < o.g2 THEN o.t2 ELSE t.t END AS t_b
         |  FROM counts a JOIN tots t ON a.g = t.g
         |  JOIN (SELECT g AS g2, t AS t2 FROM tots) o ON a.g <> o.g2),
         |pt AS (SELECT ga, gb, tok, CAST(SUM(c_a) AS BIGINT) AS ca,
         |    CAST(SUM(c_b) AS BIGINT) AS cb, CAST(MAX(t_a) AS BIGINT) AS ta,
         |    CAST(MAX(t_b) AS BIGINT) AS tb FROM ex GROUP BY 1, 2, 3),
         |hm AS (SELECT ga, gb, ta, tb,
         |    CAST(SUM(${graft.operators.TextAnalysis.jsMixtureTermNanoSql})
         |      AS BIGINT) AS hm_nano
         |  FROM pt GROUP BY 1, 2, 3, 4),
         |j AS (SELECT hm.ga, hm.gb, hm.ta, hm.tb, hm.hm_nano,
         |    pa.h_nano AS ha_nano, pb.h_nano AS hb_nano
         |  FROM hm JOIN hp pa ON pa.g = hm.ga JOIN hp pb ON pb.g = hm.gb)
         |SELECT ga AS corpus_a, gb AS corpus_b, ta, tb, hm_nano, ha_nano,
         |  hb_nano, ${graft.operators.TextAnalysis.jsdSql} AS jsd
         |FROM j""".stripMargin,
    "q_isotonic" ->
      """WITH e AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS s,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM events),
        |mm AS (SELECT MIN(s) AS lo, MAX(s) AS hi FROM e),
        |b AS (SELECT CAST((s - lo) * 10 // (hi - lo + 1) AS BIGINT) AS bin,
        |    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos,
        |    round(CAST(SUM(pos) AS DOUBLE) / COUNT(*), 6) AS frac_pos
        |  FROM e, mm GROUP BY 1),
        |cum AS (SELECT bin, CAST(SUM(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
        |    CAST(SUM(n_pos) OVER (ORDER BY bin) AS BIGINT) AS cp FROM b),
        |ks AS (SELECT bin AS k, cn AS cnk, cp AS cpk FROM cum),
        |pairs AS (
        |  SELECT k, CAST(0 AS BIGINT) AS j, cnk AS nn, cpk AS np FROM ks
        |  UNION ALL
        |  SELECT k, jm.bin + 1 AS j, cnk - jm.cn AS nn, cpk - jm.cp AS np
        |  FROM ks JOIN cum jm ON jm.bin < k),
        |pm AS (SELECT k, j, CAST(np AS DOUBLE) / nn AS mean_jk
        |  FROM pairs WHERE nn > 0),
        |im AS (SELECT i.bin AS i, pm.j, MIN(mean_jk) AS inner_min
        |  FROM b i JOIN pm ON pm.j <= i.bin AND i.bin <= pm.k
        |  GROUP BY 1, 2),
        |fit AS (SELECT i, round(MAX(inner_min), 6) AS fitted
        |  FROM im GROUP BY 1)
        |SELECT b.bin, b.n, b.n_pos, b.frac_pos, fit.fitted
        |FROM b JOIN fit ON fit.i = b.bin""".stripMargin,
    "q_effect_size" ->
      s"""WITH e AS (SELECT event_type, user_id % 2 = 0 AS arm,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS x FROM events),
         |m AS (SELECT event_type,
         |    CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(SUM(CASE WHEN arm THEN x ELSE 0 END) AS BIGINT) AS s_a,
         |    CAST(SUM(CASE WHEN arm THEN x*x ELSE 0 END) AS BIGINT) AS sq_a,
         |    CAST(SUM(CASE WHEN arm THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
         |    CAST(SUM(CASE WHEN arm THEN 0 ELSE x END) AS BIGINT) AS s_b,
         |    CAST(SUM(CASE WHEN arm THEN 0 ELSE x*x END) AS BIGINT) AS sq_b
         |  FROM e GROUP BY 1)
         |SELECT event_type, n_a, s_a, sq_a, n_b, s_b, sq_b,
         |  ${graft.operators.Normalize.cohensDSql} AS cohens_d,
         |  ${graft.operators.Normalize.hedgesGSql} AS hedges_g,
         |  ${graft.operators.Normalize.glassDeltaSql} AS glass_delta
         |FROM m""".stripMargin,
    "q_gumbel" ->
      s"""WITH e AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS x FROM events),
         |bm AS (SELECT event_type, day, MAX(x) AS m FROM e GROUP BY 1, 2),
         |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_blocks,
         |    CAST(SUM(m) AS BIGINT) AS sm, CAST(SUM(m*m) AS BIGINT) AS sq
         |  FROM bm GROUP BY 1)
         |SELECT event_type, n_blocks, sm, sq,
         |  round(CAST(sm AS DOUBLE) / n_blocks, 6) AS mean_max,
         |  ${graft.operators.TimeSeries.gumbelBetaSql} AS beta,
         |  ${graft.operators.TimeSeries.gumbelMuSql} AS mu,
         |  ${graft.operators.TimeSeries.gumbelRl100Sql} AS return_level_100
         |FROM a""".stripMargin,
    "q_pacf" -> {
      val lagCtes = (1 to 5).map { k =>
        s"""p$k AS (SELECT event_type, v AS y,
           |    lag(v, $k) OVER (PARTITION BY event_type ORDER BY day) AS x
           |  FROM pd),
           |m$k AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS sx,
           |    SUM(y) AS sy, SUM(x*y) AS sxy, SUM(x*x) AS sxx,
           |    SUM(y*y) AS syy
           |  FROM p$k WHERE x IS NOT NULL GROUP BY 1),
           |r$k AS (SELECT event_type,
           |    round(CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
           |      THEN (n*sxy - sx*sy) / sqrt(CAST(n*sxx - sx*sx AS DOUBLE) *
           |        CAST(n*syy - sy*sy AS DOUBLE)) END, 6) AS rho_$k
           |  FROM m$k)""".stripMargin
      }.mkString(",\n")
      val stepCtes = graft.operators.TimeSeries.pacfSteps.zipWithIndex
        .map { case ((name, sql), i) =>
          s"s${i + 1} AS (SELECT *, $sql AS $name FROM s$i)"
        }.mkString(",\n")
      val last = s"s${graft.operators.TimeSeries.pacfSteps.size}"
      s"""WITH pd AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |base AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_series
         |  FROM pd GROUP BY 1),
         |$lagCtes,
         |s0 AS (SELECT base.event_type, n_series, rho_1, rho_2, rho_3,
         |    rho_4, rho_5
         |  FROM base JOIN r1 USING (event_type) JOIN r2 USING (event_type)
         |  JOIN r3 USING (event_type) JOIN r4 USING (event_type)
         |  JOIN r5 USING (event_type)),
         |$stepCtes
         |SELECT event_type, n_series, round(phi11, 6) AS pacf_1,
         |  round(phi22, 6) AS pacf_2, round(phi33, 6) AS pacf_3,
         |  round(phi44, 6) AS pacf_4, round(phi55, 6) AS pacf_5
         |FROM $last""".stripMargin
    },
    "q_pettitt" ->
      s"""WITH pd AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |pv AS (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS nv
         |  FROM pd GROUP BY 1, 2),
         |rk AS (SELECT event_type, v,
         |    CAST(SUM(nv) OVER (PARTITION BY event_type ORDER BY v)
         |      AS BIGINT) * 2 - nv + 1 AS r2
         |  FROM pv),
         |j AS (SELECT pd.event_type, pd.day, rk.r2 FROM pd
         |  JOIN rk ON rk.event_type = pd.event_type AND rk.v = pd.v),
         |tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM j GROUP BY 1),
         |cum AS (SELECT event_type, day,
         |    CAST(SUM(r2) OVER (PARTITION BY event_type ORDER BY day)
         |      AS BIGINT) AS cr2,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
         |      AS BIGINT) AS ti
         |  FROM j),
         |ut AS (SELECT cum.event_type, tot.n, cum.day, cum.ti,
         |    cr2 - ti * (n + 1) AS u_t
         |  FROM cum JOIN tot USING (event_type) WHERE ti < n),
         |sel AS (SELECT event_type, n, ABS(u_t) AS k_stat, day AS t_change,
         |    ROW_NUMBER() OVER (PARTITION BY event_type
         |      ORDER BY ABS(u_t) DESC, ti ASC) AS rn FROM ut),
         |f AS (SELECT event_type, n, CAST(k_stat AS BIGINT) AS k_stat,
         |    t_change FROM sel WHERE rn = 1)
         |SELECT event_type, n, k_stat, t_change,
         |  ${graft.operators.TimeSeries.pettittPSql} AS p,
         |  ${graft.operators.TimeSeries.pettittPSql} < 0.05 AS significant
         |FROM f""".stripMargin,
    "q_ccf" -> {
      val lagCtes = (-5 to 5).map { k =>
        val idx = k + 5
        val sh = if (k >= 0) s"lag(x0, $k)" else s"lead(x0, ${-k})"
        s"""c$idx AS (SELECT y, $sh OVER (ORDER BY day) AS x FROM pd),
           |m$idx AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
           |    SUM(x*y) AS sxy, SUM(x*x) AS sxx, SUM(y*y) AS syy
           |  FROM c$idx WHERE x IS NOT NULL),
           |r$idx AS (SELECT 'all' AS k, CAST($k AS BIGINT) AS lag,
           |    CAST(n AS BIGINT) AS n,
           |    round(CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
           |      THEN (n*sxy - sx*sy) / sqrt(CAST(n*sxx - sx*sx AS DOUBLE) *
           |        CAST(n*syy - sy*sy AS DOUBLE)) END, 6) AS ccf
           |  FROM m$idx)""".stripMargin
      }.mkString(",\n")
      val unions = (-5 to 5)
        .map(k => s"SELECT * FROM r${k + 5}").mkString("\nUNION ALL ")
      s"""WITH pd AS (SELECT epoch_ms(ts) // 86400000 AS day,
         |    CAST(SUM(CASE WHEN event_type = 'click'
         |      THEN CAST(ROUND(value*100, 0) AS BIGINT) ELSE 0 END)
         |      AS BIGINT) AS x0,
         |    CAST(SUM(CASE WHEN event_type = 'purchase'
         |      THEN CAST(ROUND(value*100, 0) AS BIGINT) ELSE 0 END)
         |      AS BIGINT) AS y
         |  FROM events GROUP BY 1),
         |$lagCtes
         |$unions""".stripMargin
    },
    "q_cochran_q" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS np,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS nc,
         |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS nv
         |  FROM events GROUP BY 1),
         |u2 AS (SELECT user_id, spend, nc, nv, np >= 15 AS heavy
         |  FROM users),
         |lng AS (
         |  SELECT user_id, 'a' AS rule, (spend > 330000) = heavy AS ok
         |    FROM u2
         |  UNION ALL SELECT user_id, 'b', (nc >= 20) = heavy FROM u2
         |  UNION ALL SELECT user_id, 'c', (nv >= 20) = heavy FROM u2),
         |sf AS (SELECT user_id, rule,
         |    CASE WHEN ok THEN 1 ELSE 0 END AS sflag FROM lng),
         |bt AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
         |    CAST(SUM(gj) AS BIGINT) AS sum_g,
         |    CAST(SUM(CAST(gj AS DECIMAL(38,0)) * gj) AS DECIMAL(38,0))
         |      AS sum_g2
         |  FROM (SELECT rule, CAST(SUM(sflag) AS BIGINT) AS gj
         |    FROM sf GROUP BY 1)),
         |bi AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
         |    CAST(SUM(li) AS BIGINT) AS sum_l,
         |    CAST(SUM(li * li) AS BIGINT) AS sum_l2
         |  FROM (SELECT user_id, CAST(SUM(sflag) AS BIGINT) AS li
         |    FROM sf GROUP BY 1)),
         |f AS (SELECT * FROM bt, bi)
         |SELECT k, sum_g, CAST(sum_g2 AS VARCHAR) AS sum_g2,
         |  n_items, sum_l, sum_l2,
         |  ${graft.operators.Profiling.cochranQSql} AS q,
         |  CAST(k - 1 AS BIGINT) AS df,
         |  ${graft.operators.Profiling.chi2Crit95Sql("k - 1")} AS chi2_crit,
         |  ${graft.operators.Profiling.cochranQSql} >
         |    ${graft.operators.Profiling.chi2Crit95Sql("k - 1")}
         |    AS significant
         |FROM f""".stripMargin,
    "q_friedman" ->
      s"""WITH ut AS (SELECT user_id, event_type,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |kk AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
         |  FROM ut),
         |comp AS (SELECT ut.user_id, ut.event_type, ut.v, k FROM ut, kk
         |  QUALIFY COUNT(*) OVER (PARTITION BY user_id) = k),
         |rk AS (SELECT user_id, event_type, k,
         |    CAST(2 * COUNT(*) OVER (PARTITION BY user_id ORDER BY v
         |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      + COUNT(*) OVER (PARTITION BY user_id, v) + 1 AS BIGINT)
         |      AS r2
         |  FROM comp),
         |bt AS (SELECT k,
         |    CAST(SUM(CAST(r2j AS DECIMAL(38,0)) * r2j) AS DECIMAL(38,0))
         |      AS b4n
         |  FROM (SELECT k, event_type, CAST(SUM(r2) AS BIGINT) AS r2j
         |    FROM rk GROUP BY 1, 2) GROUP BY 1),
         |tt AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_items
         |  FROM rk),
         |aa AS (SELECT
         |    CAST(SUM(CAST(r2 AS DECIMAL(38,0)) * r2) AS DECIMAL(38,0))
         |      AS a4 FROM rk),
         |f AS (SELECT * FROM bt, tt, aa)
         |SELECT k, CAST(b4n AS VARCHAR) AS b4n, n_items,
         |  CAST(a4 AS VARCHAR) AS a4,
         |  ${graft.operators.Profiling.friedmanSql} AS chi2,
         |  CAST(k - 1 AS BIGINT) AS df,
         |  ${graft.operators.Profiling.chi2Crit95Sql("k - 1")} AS chi2_crit,
         |  ${graft.operators.Profiling.friedmanSql} >
         |    ${graft.operators.Profiling.chi2Crit95Sql("k - 1")}
         |    AS significant
         |FROM f""".stripMargin,
    "q_hurst" -> {
      val mCtes = graft.operators.TimeSeries.hurstBlockSizes.map { m =>
        s"""bl$m AS (SELECT event_type, (ti - 1) // $m AS block, h, x
           |  FROM idx),
           |z$m AS (SELECT event_type, block, x,
           |    $m * CAST(SUM(x) OVER (PARTITION BY event_type, block
           |      ORDER BY h) AS BIGINT)
           |      - CAST(ROW_NUMBER() OVER (PARTITION BY event_type, block
           |        ORDER BY h) AS BIGINT)
           |      * CAST(SUM(x) OVER (PARTITION BY event_type, block)
           |        AS BIGINT) AS zm,
           |    CAST(SUM(x) OVER (PARTITION BY event_type, block) AS BIGINT)
           |      AS sxb
           |  FROM bl$m),
           |g$m AS (SELECT event_type, block, COUNT(*) AS cnt,
           |    CAST(MAX(zm) AS BIGINT) AS zmax,
           |    CAST(MIN(zm) AS BIGINT) AS zmin,
           |    CAST(MAX(sxb) AS BIGINT) AS sx,
           |    CAST(SUM(x*x) AS BIGINT) AS sxx
           |  FROM z$m GROUP BY 1, 2),
           |f$m AS (SELECT event_type,
           |    ${graft.operators.TimeSeries.hurstRsMicroSql(m)} AS rs_micro
           |  FROM g$m WHERE cnt = $m),
           |a$m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nb_$m,
           |    CAST(SUM(rs_micro) AS BIGINT) AS rsm_$m
           |  FROM f$m WHERE rs_micro IS NOT NULL GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH pd AS (SELECT event_type, epoch_ms(ts) // 3600000 AS h,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS x
         |  FROM events GROUP BY 1, 2),
         |idx AS (SELECT event_type, h, x,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h)
         |      AS BIGINT) AS ti
         |  FROM pd),
         |$mCtes,
         |j AS (SELECT a8.event_type, nb_8, nb_16, nb_32,
         |    ${graft.operators.TimeSeries.hurstMeanRsSql(8)} AS rs_8,
         |    ${graft.operators.TimeSeries.hurstMeanRsSql(16)} AS rs_16,
         |    ${graft.operators.TimeSeries.hurstMeanRsSql(32)} AS rs_32
         |  FROM a8 JOIN a16 USING (event_type) JOIN a32 USING (event_type))
         |SELECT event_type, nb_8, nb_16, nb_32, rs_8, rs_16, rs_32,
         |  ${graft.operators.TimeSeries.hurstSql} AS hurst FROM j"""
        .stripMargin
    },
    "q_rich_club" ->
      s"""WITH pairs AS (SELECT CAST(a.l_partkey AS BIGINT) AS src,
         |    CAST(b.l_partkey AS BIGINT) AS dst
         |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
         |    AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING COUNT(DISTINCT a.l_orderkey) >= 2),
         |e0 AS (SELECT DISTINCT LEAST(src, dst) AS lo,
         |    GREATEST(src, dst) AS hi FROM pairs WHERE src <> dst),
         |deg AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
         |    SELECT lo AS id FROM e0 UNION ALL SELECT hi FROM e0)
         |  GROUP BY 1),
         |ks AS (SELECT CAST(unnest([2, 4, 8]) AS BIGINT) AS k),
         |nk AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_k
         |  FROM deg CROSS JOIN ks WHERE deg.deg > ks.k GROUP BY 1),
         |ek AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS e_k
         |  FROM e0 JOIN deg dl ON dl.id = e0.lo
         |  JOIN deg dh ON dh.id = e0.hi
         |  CROSS JOIN ks WHERE dl.deg > ks.k AND dh.deg > ks.k
         |  GROUP BY 1),
         |f AS (SELECT ks.k, CAST(COALESCE(n_k, 0) AS BIGINT) AS n_k,
         |    CAST(COALESCE(e_k, 0) AS BIGINT) AS e_k
         |  FROM ks LEFT JOIN nk USING (k) LEFT JOIN ek USING (k))
         |SELECT k, n_k, e_k, ${graft.operators.Graph.richClubSql} AS phi
         |FROM f""".stripMargin,
    "q_reach_profile" -> {
      val levels = (1 to 4).map { h =>
        s"""d$h AS (
           |  SELECT id, CAST(MIN(hops) AS BIGINT) AS hops FROM (
           |    SELECT id, hops FROM d${h - 1}
           |    UNION ALL
           |    SELECT e.dst AS id, ${h} AS hops
           |    FROM d${h - 1} f JOIN e ON e.src = f.id
           |    WHERE f.hops = ${h - 1})
           |  GROUP BY id)""".stripMargin
      }.mkString(",\n")
      s"""WITH pairs AS (SELECT CAST(a.l_partkey AS BIGINT) AS src,
         |    CAST(b.l_partkey AS BIGINT) AS dst
         |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
         |    AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING COUNT(DISTINCT a.l_orderkey) >= 2),
         |e AS (SELECT src, dst FROM pairs UNION SELECT dst, src
         |  FROM pairs),
         |deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS d
         |  FROM e GROUP BY 1),
         |d0 AS (SELECT id, CAST(0 AS BIGINT) AS hops FROM (
         |    SELECT id FROM deg ORDER BY d DESC, id LIMIT 4)),
         |$levels
         |SELECT hops, CAST(COUNT(*) AS BIGINT) AS n_vertices
         |FROM d4 GROUP BY 1""".stripMargin
    },
    "q_cadence" ->
      s"""WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id
         |  FROM events),
         |g AS (SELECT user_id, ms - lag(ms) OVER (PARTITION BY user_id
         |    ORDER BY ms, event_id) AS gap FROM e),
         |a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
         |    CAST(SUM(gap) AS BIGINT) AS sg,
         |    CAST(SUM(CAST(gap AS DECIMAL(38,0)) * gap) AS DECIMAL(38,0))
         |      AS sgg
         |  FROM g WHERE gap IS NOT NULL GROUP BY 1)
         |SELECT user_id, n_gaps, sg, CAST(sgg AS VARCHAR) AS sgg,
         |  round(CAST(sg AS DOUBLE) / n_gaps, 6) AS mean_gap_ms,
         |  ${graft.operators.Sessionize.cadenceCvSql} AS cv,
         |  ${graft.operators.Sessionize.cadenceRegularSql} AS is_regular
         |FROM a""".stripMargin,
    "q_pairwise_welch" -> {
      val t = graft.operators.Normalize.pwWelchTSql
      val p = graft.operators.Profiling.normalPSql(t)
      s"""WITH e AS (SELECT event_type AS grp,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS x FROM events),
         |g AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS s, CAST(SUM(x*x) AS BIGINT) AS sq
         |  FROM e GROUP BY 1 HAVING COUNT(*) > 1),
         |kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM g),
         |pairs AS (SELECT a.grp AS grp_a, b.grp AS grp_b,
         |    a.n AS n_a, a.s AS s_a, a.sq AS sq_a,
         |    b.n AS n_b, b.s AS s_b, b.sq AS sq_b, k
         |  FROM g a JOIN g b ON a.grp < b.grp, kk)
         |SELECT grp_a, grp_b, n_a, n_b, $t AS t,
         |  round($p, 6) AS p_normal,
         |  round($p, 6) < 0.05 / (k * (k - 1) / 2) AS significant
         |FROM pairs""".stripMargin
    },
    "q_rolling_corr" ->
      s"""WITH pd AS (SELECT epoch_ms(ts) // 86400000 AS day,
         |    CAST(SUM(CASE WHEN event_type = 'click'
         |      THEN CAST(ROUND(value*100, 0) AS BIGINT) ELSE 0 END)
         |      AS BIGINT) AS xc,
         |    CAST(SUM(CASE WHEN event_type = 'purchase'
         |      THEN CAST(ROUND(value*100, 0) AS BIGINT) ELSE 0 END)
         |      AS BIGINT) AS yc
         |  FROM events GROUP BY 1),
         |w AS (SELECT 'all' AS k, day,
         |    CAST(COUNT(*) OVER fr AS BIGINT) AS n,
         |    CAST(SUM(xc) OVER fr AS BIGINT) AS sx,
         |    CAST(SUM(yc) OVER fr AS BIGINT) AS sy,
         |    CAST(SUM(xc*yc) OVER fr AS BIGINT) AS sxy,
         |    CAST(SUM(xc*xc) OVER fr AS BIGINT) AS sxx,
         |    CAST(SUM(yc*yc) OVER fr AS BIGINT) AS syy
         |  FROM pd WINDOW fr AS (ORDER BY day
         |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
         |SELECT k, day, n,
         |  ${graft.operators.TimeSeries.rollingCorrSql(5)} AS corr
         |FROM w""".stripMargin,
    "q_mood_median" ->
      """WITH e AS (SELECT event_type,
        |    CAST(ROUND(value*100, 0) AS BIGINT) AS cents FROM events),
        |m AS (SELECT median(cents) AS med FROM e),
        |ev AS (SELECT event_type,
        |    CASE WHEN cents > med THEN 'above' ELSE 'at_or_below' END
        |      AS side FROM e, m),
        |cells AS (SELECT event_type, side, CAST(COUNT(*) AS BIGINT)
        |    AS obs FROM ev GROUP BY 1, 2),
        |r AS (SELECT event_type, CAST(SUM(obs) AS BIGINT) AS nr
        |  FROM cells GROUP BY 1),
        |c AS (SELECT side, CAST(SUM(obs) AS BIGINT) AS nc
        |  FROM cells GROUP BY 1),
        |t AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells)
        |SELECT cells.event_type, cells.side, obs,
        |  round(CAST(nr AS DOUBLE) * nc / n, 6) AS expected,
        |  round((CAST(obs AS DOUBLE) - CAST(nr AS DOUBLE) * nc / n) *
        |        (CAST(obs AS DOUBLE) - CAST(nr AS DOUBLE) * nc / n) /
        |        (CAST(nr AS DOUBLE) * nc / n), 6) AS chi2_contrib
        |FROM cells JOIN r ON r.event_type = cells.event_type
        |  JOIN c ON c.side = cells.side CROSS JOIN t""".stripMargin,
    "q_kfold_balance" ->
      """WITH users AS (SELECT user_id,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      >= 15 AS heavy
        |  FROM events GROUP BY 1),
        |f AS (SELECT user_id, heavy,
        |    CAST('0x' || substr(md5('fold:' ||
        |      CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 5 AS fold
        |  FROM users)
        |SELECT CAST(fold AS BIGINT) AS fold,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN heavy THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_pos,
        |  round(CAST(SUM(CASE WHEN heavy THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*), 6) AS pos_rate
        |FROM f GROUP BY 1""".stripMargin,
    "q_ordinal_assoc" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS x,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS y
         |  FROM events GROUP BY 1),
         |idd AS (SELECT x, y, ROW_NUMBER() OVER (ORDER BY x, y) AS i
         |  FROM users),
         |pp AS (SELECT
         |    CAST(sign(b.x - a.x) * sign(b.y - a.y) AS BIGINT) AS cd,
         |    CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
         |    CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
         |  FROM idd a JOIN idd b ON a.i < b.i),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |    CAST(SUM(CASE WHEN cd = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS concordant,
         |    CAST(SUM(CASE WHEN cd = -1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS discordant,
         |    CAST(SUM(tx) AS BIGINT) AS ties_x,
         |    CAST(SUM(ty) AS BIGINT) AS ties_y FROM pp)
         |SELECT n_pairs, concordant, discordant, ties_x, ties_y,
         |  ${graft.operators.Profiling.tauBSql} AS tau_b,
         |  ${graft.operators.Profiling.gammaSql} AS gamma,
         |  ${graft.operators.Profiling.somersDyxSql} AS somers_d_yx,
         |  ${graft.operators.Profiling.somersDxySql} AS somers_d_xy
         |FROM agg""".stripMargin,
    "q_weighted_kappa" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_click
         |  FROM events GROUP BY 1),
         |t AS (SELECT
         |    CASE WHEN spend >= 360000 THEN 3 WHEN spend >= 330000 THEN 2
         |      WHEN spend >= 300000 THEN 1 ELSE 0 END AS i,
         |    CASE WHEN n_click >= 25 THEN 3 WHEN n_click >= 20 THEN 2
         |      WHEN n_click >= 15 THEN 1 ELSE 0 END AS j
         |  FROM users),
         |cells AS (SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
         |    CAST(COUNT(*) AS BIGINT) AS obs FROM t GROUP BY 1, 2),
         |r AS (SELECT i, CAST(SUM(obs) AS BIGINT) AS ri
         |  FROM cells GROUP BY 1),
         |cc AS (SELECT j, CAST(SUM(obs) AS BIGINT) AS cj
         |  FROM cells GROUP BY 1),
         |nn AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells),
         |grid AS (SELECT r.i, cc.j, r.ri, cc.cj,
         |    COALESCE(cells.obs, 0) AS obs
         |  FROM r CROSS JOIN cc LEFT JOIN cells USING (i, j)),
         |a AS (SELECT CAST(SUM(ABS(i - j) * obs) AS BIGINT) AS swo,
         |    CAST(SUM(CAST(ABS(i - j) * ri AS DECIMAL(38,0)) * cj)
         |      AS DECIMAL(38,0)) AS swe
         |  FROM grid),
         |f AS (SELECT swo, swe, n FROM a, nn)
         |SELECT swo, CAST(swe AS VARCHAR) AS swe, n,
         |  ${graft.operators.Profiling.weightedKappaSql} AS kappa_w
         |FROM f""".stripMargin,
    "q_pr_auc" ->
      s"""WITH e AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS v,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
         |  FROM events),
         |per AS (SELECT v, CAST(SUM(p) AS BIGINT) AS cp,
         |    CAST(SUM(1 - p) AS BIGINT) AS cn FROM e GROUP BY 1),
         |c AS (SELECT v, cp, cn,
         |    CAST(SUM(cp) OVER (ORDER BY v) AS BIGINT) AS cum_cp,
         |    CAST(SUM(cn) OVER (ORDER BY v) AS BIGINT) AS cum_cn
         |  FROM per),
         |t AS (SELECT CAST(SUM(cp) AS BIGINT) AS n_pos,
         |    CAST(SUM(cn) AS BIGINT) AS n_neg FROM per),
         |d AS (SELECT cp, n_pos, n_neg,
         |    n_pos - cum_cp + cp AS dp, n_neg - cum_cn + cn AS dn
         |  FROM c, t),
         |w AS (SELECT n_pos, n_neg,
         |    ${graft.operators.Eval.prAucTermMicroSql} AS term_micro
         |  FROM d),
         |a AS (SELECT n_pos, n_neg,
         |    CAST(SUM(term_micro) AS BIGINT) AS ap_micro
         |  FROM w GROUP BY 1, 2)
         |SELECT n_pos, n_neg, ap_micro,
         |  CASE WHEN n_pos > 0 THEN
         |    round(CAST(ap_micro AS DOUBLE) / 1000000, 6) END AS pr_auc
         |FROM a""".stripMargin,
    "q_ess" ->
      s"""WITH u AS (SELECT event_type, user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS w
         |  FROM events GROUP BY 1, 2),
         |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(w) AS BIGINT) AS sw,
         |    CAST(SUM(CAST(w AS DECIMAL(38,0)) * w) AS DECIMAL(38,0))
         |      AS sww
         |  FROM u WHERE w > 0 GROUP BY 1)
         |SELECT event_type, n, sw, CAST(sww AS VARCHAR) AS sww,
         |  ${graft.operators.Sampling.essSql} AS ess,
         |  round(${graft.operators.Sampling.essSql} / n, 6) AS ess_ratio
         |FROM a""".stripMargin,
    "q_hapax" ->
      """WITH tk AS (SELECT source AS g,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |cnt AS (SELECT g, tok, CAST(COUNT(*) AS BIGINT) AS c FROM tk
        |  WHERE tok <> '' GROUP BY 1, 2),
        |a AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS vocab,
        |    CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_hapax,
        |    CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_dis
        |  FROM cnt GROUP BY 1)
        |SELECT g AS source, n_tokens, vocab, n_hapax, n_dis,
        |  CASE WHEN vocab > 0 THEN
        |    round(CAST(n_hapax AS DOUBLE) / vocab, 6) END AS hapax_ratio
        |FROM a""".stripMargin,
    "q_tpch_q6" ->
      """WITH e AS (SELECT
        |    CAST(ROUND(l_extendedprice*100, 0) AS BIGINT) *
        |      CAST(ROUND(l_discount*100, 0) AS BIGINT) AS rev_cp
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |    AND CAST(ROUND(l_discount*100, 0) AS BIGINT) BETWEEN 5 AND 7
        |    AND l_quantity < 24)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(rev_cp) AS BIGINT) AS revenue_cp,
        |  round(CAST(SUM(rev_cp) AS DOUBLE) / 10000, 6) AS revenue
        |FROM e""".stripMargin,
    "q_mode" ->
      """WITH c AS (SELECT event_type,
        |    CAST(ROUND(value*100, 0) AS BIGINT) AS cents,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, cents, cnt,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY cnt DESC, cents ASC) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n_distinct
        |  FROM c)
        |SELECT event_type, CAST(n_distinct AS BIGINT) AS n_distinct,
        |  cnt AS mode_count, cents AS mode_cents
        |FROM r WHERE rn = 1""".stripMargin,
    "q_rmst" ->
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
         |c AS (SELECT grp, t, d,
         |    CAST(SUM(ln_nano) OVER (PARTITION BY grp ORDER BY t)
         |      AS BIGINT) AS cum_ln_nano,
         |    CAST(SUM(zf) OVER (PARTITION BY grp ORDER BY t) AS BIGINT)
         |      AS cum_zf
         |  FROM f),
         |km AS (SELECT grp, t,
         |    ${graft.operators.Survival.kmSurvivalSql} AS survival
         |  FROM c WHERE d > 0),
         |st AS (SELECT grp, t, survival,
         |    lead(t) OVER (PARTITION BY grp ORDER BY t) AS next_t
         |  FROM km),
         |rect AS (SELECT grp, t,
         |    ${graft.operators.Survival.rmstRectMicroSql(336L)}
         |      AS rect_micro FROM st),
         |a AS (SELECT grp, CAST(MIN(t) AS BIGINT) AS t_first,
         |    CAST(COUNT(*) AS BIGINT) AS n_steps,
         |    CAST(SUM(rect_micro) AS BIGINT) AS steps_micro
         |  FROM rect GROUP BY 1)
         |SELECT grp, CAST(336 AS BIGINT) AS tau, n_steps,
         |  round(least(CAST(t_first AS DOUBLE), 336) +
         |    CAST(steps_micro AS DOUBLE) / 1000000, 6) AS rmst
         |FROM a""".stripMargin,
    "q_brier" ->
      s"""WITH e AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS __s,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |  FROM events),
         |mm AS (SELECT MIN(__s) AS lo, MAX(__s) AS hi FROM e),
         |t AS (SELECT lo, hi, y,
         |    ${graft.operators.Eval.brierTermMicroSql} AS term_micro
         |  FROM e, mm),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(y) AS BIGINT) AS n_pos,
         |    CAST(SUM(term_micro) AS BIGINT) AS brier_micro FROM t)
         |SELECT n, n_pos, brier_micro,
         |  round(CAST(brier_micro AS DOUBLE) / n / 1000000, 6) AS brier,
         |  ${graft.operators.Eval.brierSkillSql} AS brier_skill
         |FROM a""".stripMargin,
    "q_harrell_c" ->
      s"""WITH u AS (SELECT user_id, epoch_ms(ts) AS ms,
         |    event_type = 'error' AS is_err,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS cents FROM events),
         |agg AS (SELECT user_id, MIN(ms) AS first_ms, MAX(ms) AS last_ms,
         |    MIN(CASE WHEN is_err THEN ms END) AS err_ms,
         |    CAST(SUM(cents) AS BIGINT) AS spend
         |  FROM u GROUP BY 1),
         |subj AS (SELECT user_id AS id,
         |    (COALESCE(err_ms, last_ms) - first_ms) // 3600000 AS t,
         |    CASE WHEN err_ms IS NOT NULL THEN 1 ELSE 0 END AS ev,
         |    spend AS sc FROM agg),
         |p AS (SELECT CAST(COUNT(*) AS BIGINT) AS comparable,
         |    CAST(SUM(CASE WHEN a.sc > b.sc THEN 1 ELSE 0 END) AS BIGINT)
         |      AS concordant,
         |    CAST(SUM(CASE WHEN a.sc = b.sc THEN 1 ELSE 0 END) AS BIGINT)
         |      AS tied_score
         |  FROM subj a JOIN subj b
         |    ON (a.t < b.t AND a.ev = 1)
         |    OR (a.t = b.t AND a.ev = 1 AND b.ev = 0))
         |SELECT comparable, concordant, tied_score,
         |  ${graft.operators.Survival.harrellCSql} AS c_index
         |FROM p""".stripMargin,
    "q_jarque_bera" ->
      s"""WITH e AS (SELECT event_type,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS x FROM events),
         |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS s1,
         |    CAST(SUM(CAST(x*x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2,
         |    CAST(SUM(CAST(x*x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))
         |      AS s3,
         |    CAST(SUM((CAST(x*x AS DECIMAL(38,0)) * x) * x)
         |      AS DECIMAL(38,0)) AS s4
         |  FROM e GROUP BY 1),
         |b AS (SELECT event_type, n, s1, s2, s3, s4,
         |    ${graft.operators.Normalize.jbSkewSql} AS skewness,
         |    ${graft.operators.Normalize.jbKurtSql} AS kurtosis_excess
         |  FROM a)
         |SELECT event_type, n, s1, CAST(s2 AS VARCHAR) AS s2,
         |  CAST(s3 AS VARCHAR) AS s3, CAST(s4 AS VARCHAR) AS s4,
         |  skewness, kurtosis_excess,
         |  ${graft.operators.Normalize.jbSql} AS jb,
         |  ${graft.operators.Normalize.jbSql} > 5.991465 AS significant
         |FROM b""".stripMargin,
    "q_bartlett" ->
      s"""WITH e AS (SELECT event_type,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS x FROM events),
         |g0 AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ng,
         |    CAST(SUM(x) AS BIGINT) AS sg,
         |    CAST(SUM(CAST(x*x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sqg
         |  FROM e GROUP BY 1),
         |g1 AS (SELECT *, ${graft.operators.Normalize.bartlettVarSql}
         |    AS var_g FROM g0 WHERE ng > 1),
         |g AS (SELECT * FROM g1 WHERE var_g > 0),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
         |    CAST(SUM(ng) AS BIGINT) AS n,
         |    CAST(SUM(${graft.operators.Normalize.bartlettPoolMilliSql})
         |      AS BIGINT) AS pool_milli,
         |    CAST(SUM(${graft.operators.Normalize.bartlettLnMilliSql})
         |      AS BIGINT) AS ln_milli,
         |    CAST(SUM(${graft.operators.Normalize.bartlettInvNanoSql})
         |      AS BIGINT) AS inv_nano FROM g)
         |SELECT k, n, pool_milli, ln_milli, inv_nano,
         |  ${graft.operators.Normalize.bartlettSql} AS bartlett_stat,
         |  CAST(k - 1 AS BIGINT) AS df,
         |  ${graft.operators.Profiling.chi2Crit95Sql("k - 1")}
         |    AS chi2_crit,
         |  ${graft.operators.Normalize.bartlettSql} >
         |    ${graft.operators.Profiling.chi2Crit95Sql("k - 1")}
         |    AS significant
         |FROM a""".stripMargin,
    "q_tpch_q1" ->
      """WITH e AS (SELECT l_returnflag, l_linestatus,
        |    CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(ROUND(l_extendedprice*100, 0) AS BIGINT) AS extc,
        |    CAST(ROUND(l_discount*100, 0) AS BIGINT) AS discp,
        |    CAST(ROUND(l_tax*100, 0) AS BIGINT) AS taxp
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'),
        |a AS (SELECT l_returnflag, l_linestatus,
        |    CAST(SUM(qty) AS BIGINT) AS sum_qty,
        |    CAST(SUM(extc) AS BIGINT) AS sum_base_cents,
        |    CAST(SUM(extc * (100 - discp)) AS BIGINT) AS sum_disc_cp,
        |    CAST(SUM(CAST(extc * (100 - discp) AS DECIMAL(38,0))
        |      * (100 + taxp)) AS DECIMAL(38,0)) AS sum_charge_cpp,
        |    CAST(COUNT(*) AS BIGINT) AS count_order,
        |    CAST(SUM(discp) AS BIGINT) AS sum_discp
        |  FROM e GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus, sum_qty, sum_base_cents,
        |  sum_disc_cp, CAST(sum_charge_cpp AS VARCHAR) AS sum_charge_cpp,
        |  count_order,
        |  round(CAST(sum_qty AS DOUBLE) / count_order, 6) AS avg_qty,
        |  round(CAST(sum_base_cents AS DOUBLE) / 100 / count_order, 6)
        |    AS avg_price,
        |  round(CAST(sum_discp AS DOUBLE) / 100 / count_order, 6)
        |    AS avg_disc
        |FROM a""".stripMargin,
    "q_tpch_q18" ->
      """WITH big AS (SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS BIGINT))
        |    > 320)
        |SELECT c_name, c_custkey, o_orderkey,
        |  CAST(o_orderdate AS DATE) AS o_date,
        |  CAST(ROUND(o_totalprice*100, 0) AS BIGINT) AS total_cents,
        |  total_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q_kendalls_w" ->
      s"""WITH ut AS (SELECT user_id, event_type,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |kk AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
         |  FROM ut),
         |comp AS (SELECT ut.user_id, ut.event_type, ut.v, k FROM ut, kk
         |  QUALIFY COUNT(*) OVER (PARTITION BY user_id) = k),
         |rk AS (SELECT user_id, event_type, k,
         |    CAST(2 * COUNT(*) OVER (PARTITION BY user_id ORDER BY v
         |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      + COUNT(*) OVER (PARTITION BY user_id, v) + 1 AS BIGINT)
         |      AS r2
         |  FROM comp),
         |bt AS (SELECT k,
         |    CAST(SUM(CAST(r2j AS DECIMAL(38,0)) * r2j) AS DECIMAL(38,0))
         |      AS b4n
         |  FROM (SELECT k, event_type, CAST(SUM(r2) AS BIGINT) AS r2j
         |    FROM rk GROUP BY 1, 2) GROUP BY 1),
         |tt AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_items
         |  FROM rk),
         |aa AS (SELECT
         |    CAST(SUM(CAST(r2 AS DECIMAL(38,0)) * r2) AS DECIMAL(38,0))
         |      AS a4 FROM rk),
         |f AS (SELECT * FROM bt, tt, aa),
         |g AS (SELECT k, n_items,
         |    ${graft.operators.Profiling.friedmanSql} AS chi2 FROM f)
         |SELECT k, n_items, chi2,
         |  CASE WHEN chi2 IS NOT NULL AND n_items > 0 AND k > 1
         |    THEN round(chi2 / (n_items * (k - 1)), 6) END AS kendalls_w
         |FROM g""".stripMargin,
    "q_tpch_q3" ->
      """WITH l AS (SELECT l_orderkey,
        |    CAST(ROUND(l_extendedprice*100, 0) AS BIGINT) *
        |      (100 - CAST(ROUND(l_discount*100, 0) AS BIGINT)) AS rev
        |  FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-06-01'),
        |j AS (SELECT l.l_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        |    CAST(SUM(rev) AS BIGINT) AS revenue_cp
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |    AND c_mktsegment = 'BUILDING'
        |  JOIN l ON l.l_orderkey = o_orderkey
        |  WHERE o_orderdate < TIMESTAMP '1998-06-01'
        |  GROUP BY 1, 2)
        |SELECT l_orderkey, o_date, revenue_cp,
        |  round(CAST(revenue_cp AS DOUBLE) / 10000, 6) AS revenue
        |FROM j ORDER BY revenue_cp DESC, l_orderkey LIMIT 10"""
        .stripMargin,
    "q_tpch_q5" ->
      """WITH l AS (SELECT l_orderkey, l_suppkey,
        |    CAST(ROUND(l_extendedprice*100, 0) AS BIGINT) *
        |      (100 - CAST(ROUND(l_discount*100, 0) AS BIGINT)) AS rev
        |  FROM lineitem),
        |j AS (SELECT n_name, CAST(SUM(rev) AS BIGINT) AS revenue_cp
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN l ON l.l_orderkey = o_orderkey
        |  JOIN supplier ON l.l_suppkey = s_suppkey
        |    AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1)
        |SELECT n_name, revenue_cp,
        |  round(CAST(revenue_cp AS DOUBLE) / 10000, 6) AS revenue
        |FROM j""".stripMargin,
    "q_ref_integrity" ->
      """SELECT 'lineitem->orders' AS relation,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_child,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
        |    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |    AS n_orphans
        |UNION ALL SELECT 'lineitem->part',
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
        |    WHERE l_partkey NOT IN (SELECT p_partkey FROM part))
        |UNION ALL SELECT 'lineitem->supplier',
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
        |    WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
        |UNION ALL SELECT 'orders->customer',
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
        |    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
        |UNION ALL SELECT 'customer->nation',
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer),
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
        |    WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
        |UNION ALL SELECT 'supplier->nation',
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM supplier),
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM supplier
        |    WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation))"""
        .stripMargin,
    "q_life_table" ->
      s"""WITH u AS (SELECT user_id, epoch_ms(ts) AS ms,
         |    event_type = 'error' AS is_err FROM events),
         |agg AS (SELECT user_id, MIN(ms) AS first_ms, MAX(ms) AS last_ms,
         |    MIN(CASE WHEN is_err THEN ms END) AS err_ms
         |  FROM u GROUP BY 1),
         |subj AS (SELECT 'c' || CAST(user_id % 2 AS VARCHAR) AS grp,
         |    ((COALESCE(err_ms, last_ms) - first_ms) // 3600000) // 24
         |      AS iv,
         |    CASE WHEN err_ms IS NOT NULL THEN 1 ELSE 0 END AS ev
         |  FROM agg),
         |per AS (SELECT grp, iv, CAST(SUM(ev) AS BIGINT) AS d,
         |    CAST(COUNT(*) - SUM(ev) AS BIGINT) AS c,
         |    CAST(COUNT(*) AS BIGINT) AS m FROM subj GROUP BY 1, 2),
         |r AS (SELECT grp, iv, d, c, m,
         |    CAST(SUM(m) OVER (PARTITION BY grp ORDER BY iv) AS BIGINT)
         |      AS cum_m,
         |    CAST(SUM(m) OVER (PARTITION BY grp) AS BIGINT) AS n_grp
         |  FROM per),
         |s AS (SELECT grp, iv, d, c, n_grp - cum_m + m AS n_enter FROM r),
         |f AS (SELECT grp, iv, d, c, n_enter,
         |    ${graft.operators.Survival.ltLnNanoSql} AS ln_nano,
         |    ${graft.operators.Survival.ltZeroFlagSql} AS zf FROM s),
         |cc AS (SELECT grp, iv, d, c, n_enter,
         |    CAST(SUM(ln_nano) OVER (PARTITION BY grp ORDER BY iv)
         |      AS BIGINT) AS cum_ln_nano,
         |    CAST(SUM(zf) OVER (PARTITION BY grp ORDER BY iv) AS BIGINT)
         |      AS cum_zf
         |  FROM f)
         |SELECT grp, CAST(iv * 24 AS BIGINT) AS interval_start, n_enter,
         |  d, c, ${graft.operators.Survival.ltQSql} AS q,
         |  ${graft.operators.Survival.kmSurvivalSql} AS survival
         |FROM cc""".stripMargin,
    "q_perm_test" ->
      s"""WITH u AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    user_id % 2 = 0 AS arm
         |  FROM events GROUP BY user_id),
         |base AS (SELECT
         |    CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(SUM(CASE WHEN arm THEN spend ELSE 0 END) AS BIGINT)
         |      AS s_a,
         |    CAST(SUM(CASE WHEN arm THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
         |    CAST(SUM(CASE WHEN arm THEN 0 ELSE spend END) AS BIGINT)
         |      AS s_b
         |  FROM u),
         |ob AS (SELECT n_a AS obs_n_a, n_b AS obs_n_b,
         |    ${graft.operators.Sampling.permDeltaMicroSql}
         |      AS obs_delta_micro FROM base),
         |tagged AS (SELECT u.user_id, u.spend, rr.r,
         |    (CAST('0x' || substr(md5('perm' || CAST(rr.r AS VARCHAR) ||
         |      ':' || CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 2)
         |      = 0 AS ra
         |  FROM u CROSS JOIN (SELECT unnest(range(0, 64)) AS r) rr),
         |reps AS (SELECT r,
         |    CAST(SUM(CASE WHEN ra THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(SUM(CASE WHEN ra THEN spend ELSE 0 END) AS BIGINT)
         |      AS s_a,
         |    CAST(SUM(CASE WHEN ra THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
         |    CAST(SUM(CASE WHEN ra THEN 0 ELSE spend END) AS BIGINT)
         |      AS s_b
         |  FROM tagged GROUP BY r),
         |rd AS (SELECT r,
         |    ${graft.operators.Sampling.permDeltaMicroSql} AS delta_micro
         |  FROM reps),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_reps,
         |    CAST(SUM(CASE WHEN delta_micro >= obs_delta_micro THEN 1
         |      ELSE 0 END) AS BIGINT) AS n_ge,
         |    CAST(MAX(obs_n_a) AS BIGINT) AS n_a,
         |    CAST(MAX(obs_n_b) AS BIGINT) AS n_b,
         |    CAST(MAX(obs_delta_micro) AS BIGINT) AS obs_delta_micro
         |  FROM rd, ob WHERE delta_micro IS NOT NULL)
         |SELECT n_a, n_b, n_reps, n_ge,
         |  round(CAST(obs_delta_micro AS DOUBLE) / 1000000, 6)
         |    AS obs_delta,
         |  ${graft.operators.Sampling.permPSql} AS p,
         |  ${graft.operators.Sampling.permPSql} < 0.05 AS significant
         |FROM agg""".stripMargin,
    "q_cox" -> {
      import graft.operators.Survival.{coxTermSql, coxUNanoSql, coxINanoSql, coxStepSql, coxSdSql}
      val steps = (1 to 3).map { i =>
        s"""p$i AS (SELECT beta, t,
           |    CAST(SUM(${coxTermSql("w")}) AS BIGINT) AS w_m,
           |    CAST(SUM(${coxTermSql("w * z")}) AS BIGINT) AS wz_m,
           |    CAST(SUM(${coxTermSql("w * z * z")}) AS BIGINT) AS wzz_m,
           |    CAST(SUM(ev) AS BIGINT) AS d,
           |    CAST(SUM(${coxTermSql("ev * z")}) AS BIGINT) AS evz_m
           |  FROM z CROSS JOIN b${i - 1} GROUP BY beta, t),
           |s$i AS (SELECT beta, t, d, evz_m,
           |    CAST(SUM(w_m) OVER (ORDER BY t DESC) AS BIGINT) AS cum_w_m,
           |    CAST(SUM(wz_m) OVER (ORDER BY t DESC) AS BIGINT)
           |      AS cum_wz_m,
           |    CAST(SUM(wzz_m) OVER (ORDER BY t DESC) AS BIGINT)
           |      AS cum_wzz_m
           |  FROM p$i),
           |a$i AS (SELECT beta,
           |    CAST(SUM($coxUNanoSql) AS BIGINT) AS u_n,
           |    CAST(SUM($coxINanoSql) AS BIGINT) AS i_n
           |  FROM s$i WHERE d > 0 GROUP BY beta),
           |b$i AS (SELECT $coxStepSql AS beta FROM a$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH users AS (SELECT user_id, MIN(epoch_ms(ts)) AS first_ms,
         |    MAX(epoch_ms(ts)) AS last_ms,
         |    MIN(CASE WHEN event_type = 'error' THEN epoch_ms(ts) END)
         |      AS err_ms,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend
         |  FROM events GROUP BY 1),
         |subj AS (SELECT
         |    (COALESCE(err_ms, last_ms) - first_ms) // 3600000 AS t,
         |    CASE WHEN err_ms IS NOT NULL THEN 1 ELSE 0 END AS ev,
         |    spend AS __s FROM users),
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(__s) AS BIGINT) AS ss,
         |    CAST(SUM(__s*__s) AS BIGINT) AS ssq FROM subj),
         |z0 AS (SELECT t, ev, ${graft.operators.Eval.plattZSql} AS z
         |  FROM subj, mm),
         |z AS MATERIALIZED (SELECT t, ev, z FROM z0 WHERE z IS NOT NULL),
         |b0 AS (SELECT CAST(0 AS DOUBLE) AS beta),
         |$steps,
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_fit,
         |    CAST(SUM(ev) AS BIGINT) AS events FROM z)
         |SELECT n_fit, events, round(beta, 6) AS beta_per_sd,
         |  CASE WHEN beta IS NOT NULL THEN round(EXP(beta), 6) END
         |    AS hazard_ratio_per_sd,
         |  CASE WHEN beta IS NOT NULL THEN
         |    round(EXP(beta / ($coxSdSql)), 6) END
         |    AS hazard_ratio_per_unit
         |FROM b3, tot, mm""".stripMargin
    },
    "q_negbin" ->
      s"""WITH e AS (SELECT event_type, epoch_ms(ts) // 3600000 AS b
         |  FROM events),
         |c AS (SELECT event_type, b, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM e GROUP BY 1, 2),
         |a AS (SELECT event_type,
         |    CAST(MAX(b) - MIN(b) + 1 AS BIGINT) AS n_buckets,
         |    CAST(SUM(c) AS BIGINT) AS n_events,
         |    CAST(SUM(c*c) AS BIGINT) AS scc
         |  FROM c GROUP BY 1)
         |SELECT event_type, n_buckets, n_events, scc,
         |  round(CAST(n_events AS DOUBLE) / n_buckets, 6) AS mean_rate,
         |  ${graft.operators.TimeSeries.negbinRSql} AS nb_r,
         |  ${graft.operators.TimeSeries.negbinPSql} AS nb_p
         |FROM a""".stripMargin,
    "q_dunn" ->
      s"""WITH d AS (SELECT source AS grp, n_chars AS v FROM documents),
         |per AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS nv
         |  FROM d GROUP BY 1),
         |rk AS (SELECT v,
         |    CAST(SUM(nv) OVER (ORDER BY v) AS BIGINT) * 2 - nv + 1 AS r2,
         |    CAST(nv AS DECIMAL(38,0)) * nv * nv - nv AS t3t_v
         |  FROM per),
         |tie AS (SELECT CAST(SUM(t3t_v) AS DECIMAL(38,0)) AS t3t FROM rk),
         |g AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS ng,
         |    CAST(SUM(r2) AS BIGINT) AS rg2
         |  FROM d JOIN rk USING (v) GROUP BY 1),
         |tot AS (SELECT CAST(SUM(ng) AS BIGINT) AS n,
         |    CAST(COUNT(*) AS BIGINT) AS k FROM g),
         |pairs AS (SELECT a.grp AS grp_a, b.grp AS grp_b,
         |    a.ng AS n_a, b.ng AS n_b, a.rg2 AS rg2_a, b.rg2 AS rg2_b,
         |    n, k, t3t
         |  FROM g a JOIN g b ON a.grp < b.grp, tot, tie)
         |SELECT grp_a, grp_b, n_a, n_b,
         |  ${graft.operators.Profiling.dunnZSql} AS z,
         |  round(${graft.operators.Profiling.normalPSql(
                graft.operators.Profiling.dunnZSql)}, 6) AS p,
         |  round(${graft.operators.Profiling.normalPSql(
                graft.operators.Profiling.dunnZSql)}, 6)
         |    < 0.05 / (k * (k - 1) / 2) AS significant
         |FROM pairs""".stripMargin,
    "q_eb_shrinkage" ->
      s"""WITH u AS (SELECT user_id,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS x,
         |    CAST(COUNT(*) AS BIGINT) AS nt
         |  FROM events GROUP BY 1),
         |u2 AS (SELECT * FROM u WHERE nt > 0),
         |q AS (SELECT user_id, x, nt,
         |    CAST(ROUND(CAST(x AS DOUBLE) / nt * 1000000, 0) AS BIGINT)
         |      AS p_micro,
         |    CAST(ROUND((CAST(x AS DOUBLE) / nt) * (CAST(x AS DOUBLE) / nt)
         |      * 1000000000, 0) AS BIGINT) AS p2_nano
         |  FROM u2),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS kk,
         |    CAST(SUM(p_micro) AS BIGINT) AS sp_micro,
         |    CAST(SUM(p2_nano) AS BIGINT) AS sp2_nano FROM q),
         |w AS (SELECT u2.user_id, u2.x, u2.nt,
         |    ${graft.operators.Eval.ebAlphaSql} AS alpha_raw,
         |    ${graft.operators.Eval.ebBetaSql} AS beta_raw
         |  FROM u2, m)
         |SELECT user_id, x, nt AS n,
         |  round(CAST(x AS DOUBLE) / nt, 6) AS raw_rate,
         |  round(alpha_raw, 6) AS alpha, round(beta_raw, 6) AS beta,
         |  ${graft.operators.Eval.ebShrunkSql} AS shrunk_rate
         |FROM w""".stripMargin,
    "q_mahalanobis" ->
      s"""WITH u AS (SELECT user_id AS id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS x,
         |    CAST(COUNT(*) AS BIGINT) AS y
         |  FROM events GROUP BY 1),
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))
         |      AS sxx,
         |    CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
         |      AS syy,
         |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
         |      AS sxy FROM u),
         |d AS (SELECT id, x, y,
         |    ${graft.operators.Profiling.mahalanobis2Sql} AS d2
         |  FROM u, mm),
         |r AS (SELECT id, x, y, d2, ROW_NUMBER() OVER (
         |    ORDER BY d2 DESC, id ASC) AS rn
         |  FROM d WHERE d2 IS NOT NULL)
         |SELECT CAST(rn AS BIGINT) AS rnk, id, x, y, d2
         |FROM r WHERE rn <= 20""".stripMargin,
    "q_partial_corr" ->
      s"""WITH u AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS x,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS y,
         |    CAST(COUNT(*) AS BIGINT) AS z
         |  FROM events GROUP BY 1),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(z) AS BIGINT) AS sz,
         |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))
         |      AS sxx,
         |    CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
         |      AS syy,
         |    CAST(SUM(CAST(z AS DECIMAL(38,0)) * z) AS DECIMAL(38,0))
         |      AS szz,
         |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
         |      AS sxy,
         |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * z) AS DECIMAL(38,0))
         |      AS sxz,
         |    CAST(SUM(CAST(y AS DECIMAL(38,0)) * z) AS DECIMAL(38,0))
         |      AS syz FROM u),
         |rr AS (SELECT n,
         |    ${graft.operators.Profiling.rPairSql("x", "y")} AS r_xy,
         |    ${graft.operators.Profiling.rPairSql("x", "z")} AS r_xz,
         |    ${graft.operators.Profiling.rPairSql("y", "z")} AS r_yz
         |  FROM m)
         |SELECT n, r_xy, r_xz, r_yz,
         |  ${graft.operators.Profiling.partialCorrSql} AS r_xy_z
         |FROM rr""".stripMargin,
    "q_trimmed_mean" ->
      """WITH e AS (SELECT event_type,
        |    CAST(ROUND(value*100, 0) AS BIGINT) AS v FROM events),
        |per AS (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS nv
        |  FROM e GROUP BY 1, 2),
        |c AS (SELECT event_type, v, nv,
        |    CAST(SUM(nv) OVER (PARTITION BY event_type ORDER BY v)
        |      AS BIGINT) AS cum_nv FROM per),
        |t AS (SELECT event_type, CAST(SUM(nv) AS BIGINT) AS n
        |  FROM per GROUP BY 1),
        |w AS (SELECT c.event_type, v, nv, cum_nv, n, n * 5 // 100 AS k
        |  FROM c JOIN t USING (event_type)),
        |inc AS (SELECT event_type, v, n, k,
        |    GREATEST(CAST(0 AS BIGINT),
        |      LEAST(cum_nv, n - k) - GREATEST(cum_nv - nv, k))
        |      AS included
        |  FROM w),
        |a AS (SELECT event_type, n, k,
        |    CAST(SUM(v * included) AS BIGINT) AS s_kept,
        |    CAST(SUM(included) AS BIGINT) AS n_kept
        |  FROM inc WHERE included > 0 GROUP BY 1, 2, 3)
        |SELECT event_type, n, k, s_kept, n_kept,
        |  round(CAST(s_kept AS DOUBLE) / n_kept, 6) AS trimmed_mean
        |FROM a""".stripMargin,
    "q_platt" -> {
      import graft.operators.Eval.{plattTermSql, plattStepASql, plattStepBSql, plattZSql, plattSdSql}
      val steps = (1 to 4).map { i =>
        s"""m$i AS (SELECT a, b,
           |    CAST(SUM(${plattTermSql("(p - y) * z")}) AS BIGINT) AS g1m,
           |    CAST(SUM(${plattTermSql("(p - y)")}) AS BIGINT) AS g0m,
           |    CAST(SUM(${plattTermSql("p * (1 - p) * z * z")}) AS BIGINT)
           |      AS h11m,
           |    CAST(SUM(${plattTermSql("p * (1 - p) * z")}) AS BIGINT)
           |      AS h01m,
           |    CAST(SUM(${plattTermSql("p * (1 - p)")}) AS BIGINT) AS h00m
           |  FROM z CROSS JOIN it${i - 1} GROUP BY a, b),
           |it$i AS (SELECT $plattStepASql AS a, $plattStepBSql AS b
           |  FROM m$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS __s,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS __y
         |  FROM events),
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(__s) AS BIGINT) AS ss,
         |    CAST(SUM(__s*__s) AS BIGINT) AS ssq FROM e),
         |z0 AS (SELECT $plattZSql AS z, __y AS y FROM e, mm),
         |z AS MATERIALIZED (SELECT z, y FROM z0 WHERE z IS NOT NULL),
         |it0 AS (SELECT CAST(0 AS DOUBLE) AS a, CAST(0 AS DOUBLE) AS b),
         |$steps,
         |ll AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_fit,
         |    CAST(SUM(${plattTermSql(
                "-(y * LN(p) + (1 - y) * LN(1 - p))")}) AS BIGINT)
         |      AS ll_micro
         |  FROM z CROSS JOIN it4 GROUP BY a, b)
         |SELECT n, round(CAST(ss AS DOUBLE) / n, 6) AS mean_s,
         |  round($plattSdSql, 6) AS sd_s, round(a, 6) AS a,
         |  round(b, 6) AS b,
         |  round(CAST(ll_micro AS DOUBLE) / n_fit / 1000000, 6) AS logloss
         |FROM ll, mm""".stripMargin
    },
    "q_youden" ->
      s"""WITH e AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS v,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
         |  FROM events),
         |per AS (SELECT v, CAST(SUM(p) AS BIGINT) AS cp,
         |    CAST(SUM(1 - p) AS BIGINT) AS cn FROM e GROUP BY 1),
         |c AS (SELECT v,
         |    CAST(SUM(cp) OVER (ORDER BY v) AS BIGINT) AS cum_cp,
         |    CAST(SUM(cn) OVER (ORDER BY v) AS BIGINT) AS cum_cn
         |  FROM per),
         |t AS (SELECT CAST(SUM(cp) AS BIGINT) AS n_pos,
         |    CAST(SUM(cn) AS BIGINT) AS n_neg FROM per),
         |j AS (SELECT v, n_pos, n_neg, cum_cp, cum_cn,
         |    (n_pos - cum_cp) * n_neg - (n_neg - cum_cn) * n_pos AS j_num
         |  FROM c, t),
         |sel AS (SELECT *, ROW_NUMBER() OVER (ORDER BY j_num DESC, v ASC)
         |    AS rn FROM j),
         |f AS (SELECT n_pos, n_neg, v AS threshold,
         |    CAST(j_num AS BIGINT) AS j_num, cum_cp, cum_cn
         |  FROM sel WHERE rn = 1)
         |SELECT n_pos, n_neg, threshold, j_num, cum_cp, cum_cn,
         |  CASE WHEN n_pos > 0 THEN
         |    round(CAST(n_pos - cum_cp AS DOUBLE) / n_pos, 6) END AS tpr,
         |  CASE WHEN n_neg > 0 THEN
         |    round(CAST(n_neg - cum_cn AS DOUBLE) / n_neg, 6) END AS fpr,
         |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         |    round(CAST(j_num AS DOUBLE) /
         |      (CAST(n_pos AS DOUBLE) * n_neg), 6) END AS j
         |FROM f""".stripMargin,
    "q_ece" ->
      s"""WITH e AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS s,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
         |  FROM events),
         |mm AS (SELECT MIN(s) AS lo, MAX(s) AS hi FROM e),
         |b AS (SELECT CAST((s - lo) * 10 // (hi - lo + 1) AS BIGINT)
         |      AS bin,
         |    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT)
         |      AS n_pos,
         |    CAST(SUM(s) AS BIGINT) AS sum_score
         |  FROM e, mm GROUP BY 1),
         |w AS (SELECT b.*, lo, hi FROM b, mm),
         |t AS (SELECT lo, hi, n,
         |    ${graft.operators.Eval.eceTermMicroSql} AS term_micro FROM w),
         |a AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total,
         |    CAST(COUNT(*) AS BIGINT) AS n_bins,
         |    CAST(SUM(term_micro) AS BIGINT) AS ece_micro FROM t)
         |SELECT n_total, n_bins, ece_micro,
         |  round(CAST(ece_micro AS DOUBLE) / n_total / 1000000, 6) AS ece
         |FROM a""".stripMargin,
    "q_rake" -> {
      val stops = graft.operators.TextAnalysis.stopwords("en")
        .map(s => s"'$s'").mkString(", ")
      s"""WITH tl AS (SELECT source AS g, doc_id,
         |    string_split(text, ' ') AS tl FROM documents),
         |tk AS (SELECT g, doc_id, unnest(tl) AS tok,
         |    unnest(range(1, len(tl) + 1)) AS pos FROM tl),
         |tk2 AS (SELECT g, doc_id, tok, pos,
         |    tok IN ($stops) AS is_stop
         |  FROM tk WHERE tok <> ''),
         |runs AS (SELECT g, doc_id, tok, pos, is_stop,
         |    SUM(CASE WHEN is_stop THEN 1 ELSE 0 END) OVER (
         |      PARTITION BY g, doc_id ORDER BY pos) AS grp
         |  FROM tk2),
         |ns AS (SELECT g, doc_id, tok, pos, grp,
         |    COUNT(*) OVER (PARTITION BY g, doc_id, grp) AS plen
         |  FROM runs WHERE NOT is_stop),
         |ws AS (SELECT g, tok, CAST(COUNT(*) AS BIGINT) AS freq,
         |    CAST(SUM(plen) AS BIGINT) AS deg FROM ns GROUP BY 1, 2),
         |ws2 AS (SELECT g, tok,
         |    ${graft.operators.TextAnalysis.rakeWordMicroSql} AS w_micro
         |  FROM ws),
         |ph AS (SELECT ns.g, ns.doc_id, ns.grp,
         |    string_agg(ns.tok, ' ' ORDER BY ns.pos) AS phrase,
         |    CAST(COUNT(*) AS BIGINT) AS n_words,
         |    CAST(SUM(w_micro) AS BIGINT) AS score_micro
         |  FROM ns JOIN ws2 ON ws2.g = ns.g AND ws2.tok = ns.tok
         |  GROUP BY 1, 2, 3),
         |agg AS (SELECT g, phrase, CAST(MAX(n_words) AS BIGINT) AS n_words,
         |    CAST(COUNT(*) AS BIGINT) AS n_occ,
         |    CAST(MAX(score_micro) AS BIGINT) AS score_micro
         |  FROM ph GROUP BY 1, 2),
         |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY g
         |    ORDER BY score_micro DESC, phrase) AS rn FROM agg)
         |SELECT g AS source, CAST(rn AS BIGINT) AS rnk, phrase, n_words,
         |  n_occ, round(CAST(score_micro AS DOUBLE) / 1000000, 6) AS score
         |FROM rk WHERE rn <= 10""".stripMargin
    },
    "q_diversity_index" ->
      s"""WITH tk AS (SELECT source AS g,
         |    unnest(string_split(text, ' ')) AS tok FROM documents),
         |cnt AS (SELECT g, tok, CAST(COUNT(*) AS BIGINT) AS c FROM tk
         |  WHERE tok <> '' GROUP BY 1, 2),
         |wt AS (SELECT g, c,
         |    CAST(SUM(c) OVER (PARTITION BY g) AS BIGINT) AS t FROM cnt),
         |wterm AS (SELECT g, c, t,
         |    ${graft.operators.TextAnalysis.entropyTermNanoSql("c", "t")}
         |      AS term FROM wt),
         |a AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS vocab,
         |    CAST(SUM(c) AS BIGINT) AS n_tokens,
         |    CAST(SUM(CAST(c AS DECIMAL(38,0)) * (c - 1))
         |      AS DECIMAL(38,0)) AS s_pairs,
         |    CAST(SUM(term) AS BIGINT) AS h_nano FROM wterm GROUP BY 1)
         |SELECT g AS source, n_tokens, vocab,
         |  CAST(s_pairs AS VARCHAR) AS s_pairs, h_nano,
         |  round(CAST(h_nano AS DOUBLE) / 1000000000, 6) AS shannon_nats,
         |  ${graft.operators.TextAnalysis.simpsonSql} AS simpson,
         |  CASE WHEN ${graft.operators.TextAnalysis.simpsonSql} > 0 THEN
         |    round(1.0 / ${graft.operators.TextAnalysis.simpsonSql}, 6)
         |    END AS inv_simpson,
         |  ${graft.operators.TextAnalysis.evennessSql} AS evenness
         |FROM a""".stripMargin,
    "q_burstiness" ->
      s"""WITH e AS (SELECT event_type, epoch_ms(ts) // 3600000 AS b
         |  FROM events),
         |c AS (SELECT event_type, b, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM e GROUP BY 1, 2),
         |a AS (SELECT event_type,
         |    CAST(MAX(b) - MIN(b) + 1 AS BIGINT) AS n_buckets,
         |    CAST(SUM(c) AS BIGINT) AS n_events,
         |    CAST(SUM(c*c) AS BIGINT) AS scc
         |  FROM c GROUP BY 1)
         |SELECT event_type, n_buckets, n_events, scc,
         |  ${graft.operators.TimeSeries.fanoSql} AS fano,
         |  ${graft.operators.TimeSeries.burstinessSql} AS burstiness
         |FROM a""".stripMargin,
    "q_triangle_count" -> triangleCountOracle,
    // the hub-cap valve is a no-op below the cap (max co-purchase degree
    // is ~220 at sf0.1 vs maxDeg = 1000), so the capped query verifies
    // against the SAME uncapped enumeration — the ivf_capped discipline
    "q_triangle_count_capped" -> triangleCountOracle,
    "q_similarity_bruteforce" ->
      s"""WITH $normCte,
         |scored AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS vec_id,
         |    round($cosineSqlExpr, 6) AS sim
         |  FROM n q JOIN n c ON q.vec_id < 8 AND c.vec_id != q.vec_id)
         |SELECT qid, vec_id, sim, rank FROM (
         |  SELECT qid, vec_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
         |  FROM scored)
         |WHERE rank <= 10""".stripMargin,
    "q_similarity_ivf" -> ivfOracleSql,
    // the salt-splitting cellCap valve is output-invariant, so the
    // capped query verifies against the SAME uncapped replay
    "q_similarity_ivf_capped" -> ivfOracleSql,
    "q_embedding_neardup" ->
      s"""WITH $normCte,
         |scored AS (
         |  SELECT q.vec_id AS vec_a, c.vec_id AS vec_b,
         |    round($cosineSqlExpr, 6) AS sim
         |  FROM n q JOIN n c ON q.vec_id < c.vec_id)
         |SELECT vec_a, vec_b, sim FROM scored WHERE sim >= 0.4""".stripMargin,
    "q_embedding_neardup_lsh" ->
      // mirrors Similarity.nearDupCosineBlocked at nCentroids = 16: same
      // deterministic cell ranking as the IVF oracle but TOP-2 assignment
      // (multi-assignment recall trick), then exact verification within
      // cells only; DISTINCT dedups pairs sharing both cells
      s"""WITH $normCte,
         |cent AS (SELECT vec_id AS cell, embedding, nrm FROM n ORDER BY vec_id LIMIT 16),
         |assign AS (SELECT vec_id, embedding, nrm, cell FROM (
         |    SELECT q.vec_id, q.embedding, q.nrm, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY round($cosineSqlExpr, 6) DESC, c.cell) AS r
         |    FROM n q CROSS JOIN cent c)
         |  WHERE r <= 2)
         |SELECT DISTINCT vec_a, vec_b, sim FROM (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    round(${cosineSqlExprAs("a", "b")}, 6) AS sim
         |  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id)
         |WHERE sim >= 0.4""".stripMargin,
    "q_embedding_srp" ->
      s"""SELECT vec_id, ${srpSigSqlExpr(32)} AS srp_sig
         |FROM (SELECT vec_id, embedding AS e FROM embeddings)""".stripMargin,
    "q_embedding_neardup_srp" ->
      s"""WITH $normCte,
         |sigs AS (SELECT vec_id, ${srpSigSqlExpr(32)} AS sig
         |         FROM (SELECT vec_id, embedding AS e FROM embeddings)),
         |bands AS (SELECT vec_id, b, (sig >> (4*b)) & 15 AS bk
         |          FROM sigs, range(0, 8) t(b)),
         |cand AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |         FROM bands x JOIN bands y
         |           ON x.b = y.b AND x.bk = y.bk AND x.vec_id < y.vec_id)
         |SELECT vec_a, vec_b, sim FROM (
         |  SELECT cand.vec_a, cand.vec_b, round($cosineSqlExpr, 6) AS sim
         |  FROM cand JOIN n q ON q.vec_id = cand.vec_a
         |            JOIN n c ON c.vec_id = cand.vec_b)
         |WHERE sim >= 0.4""".stripMargin,
    "q_embedding_neardup_srp_mp" ->
      // same band CTEs as q_embedding_neardup_srp; the multi-probe rule is
      // closed-form: same band, keys within Hamming distance 1
      s"""WITH $normCte,
         |sigs AS (SELECT vec_id, ${srpSigSqlExpr(32)} AS sig
         |         FROM (SELECT vec_id, embedding AS e FROM embeddings)),
         |bands AS (SELECT vec_id, b, (sig >> (4*b)) & 15 AS bk
         |          FROM sigs, range(0, 8) t(b)),
         |cand AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |         FROM bands x JOIN bands y
         |           ON x.b = y.b AND bit_count(xor(x.bk, y.bk)) <= 1
         |          AND x.vec_id < y.vec_id)
         |SELECT vec_a, vec_b, sim FROM (
         |  SELECT cand.vec_a, cand.vec_b, round($cosineSqlExpr, 6) AS sim
         |  FROM cand JOIN n q ON q.vec_id = cand.vec_a
         |            JOIN n c ON c.vec_id = cand.vec_b)
         |WHERE sim >= 0.4""".stripMargin,
    "q_kcenter" -> kCenterOracle,
    "q_dtw" -> dtwOracle,
    "q_diversity_sample" ->
      // same deterministic cell assignment as the IVF oracle, then md5-
      // ordered row_number per cell
      s"""WITH $normCte,
         |cent AS (SELECT vec_id AS cell, embedding, nrm FROM n ORDER BY vec_id LIMIT 16),
         |assign AS (SELECT vec_id, cell FROM (
         |    SELECT q.vec_id, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY round($cosineSqlExpr, 6) DESC, c.cell) AS r
         |    FROM n q CROSS JOIN cent c)
         |  WHERE r = 1)
         |SELECT vec_id, cell, rk FROM (
         |  SELECT vec_id, cell,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY cell
         |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) AS rk
         |  FROM assign)
         |WHERE rk <= 3""".stripMargin,
    "q_pack_sequences" ->
      """SELECT doc_id, n_tokens, shard,
        |  CAST(coalesce(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev_tokens,
        |  CAST(coalesce(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512 AS BIGINT) AS bin
        |FROM (SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |        doc_id % 16 AS shard FROM documents)""".stripMargin,
    "q_quantize_int8" ->
      """WITH m AS (SELECT vec_id, embedding AS e,
        |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS ma
        |FROM embeddings),
        |q AS (SELECT vec_id, round(ma/127, 6) AS scale,
        |  CASE WHEN ma = 0 THEN [0 FOR x IN e]
        |       ELSE [CAST(round(CAST(x AS DOUBLE)*127/ma) AS INTEGER) FOR x IN e]
        |  END AS qvec
        |FROM m)
        |SELECT vec_id, scale, CAST(i - 1 AS BIGINT) AS dim, qvec[i] AS q
        |FROM (SELECT vec_id, scale, qvec, unnest(range(1, len(qvec)+1)) AS i FROM q)""".stripMargin,
    "q_text_stats" ->
      """SELECT doc_id, lang,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_regex_tokens,
        |  CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_uniq_tokens,
        |  round(CAST(length(replace(text,' ','')) AS DOUBLE)/len(string_split(text,' ')), 6) AS avg_token_len,
        |  round(CAST(len(list_filter(string_split(text,' '), t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
        |    /len(string_split(text,' ')), 6) AS stopword_ratio
        |FROM documents""".stripMargin,
    "q_lang_id" ->
      """WITH t AS (SELECT doc_id, lang AS labeled_lang, string_split(text,' ') AS tl FROM documents),
        |s AS (SELECT doc_id, labeled_lang,
        |  CAST(len(list_filter(tl, t -> t IN ('der','die','das','und','ein'))) AS BIGINT) AS s_de,
        |  CAST(len(list_filter(tl, t -> t IN ('the','a','of','and','to'))) AS BIGINT) AS s_en,
        |  CAST(len(list_filter(tl, t -> t IN ('el','la','de','y','un'))) AS BIGINT) AS s_es,
        |  CAST(len(list_filter(tl, t -> t IN ('le','la','de','et','un'))) AS BIGINT) AS s_fr,
        |  CAST(len(list_filter(tl, t -> t IN ('的','是','了','在','我'))) AS BIGINT) AS s_zh
        |FROM t)
        |SELECT doc_id, labeled_lang, s_de, s_en, s_es, s_fr, s_zh,
        |  CASE WHEN g = 0 THEN 'und'
        |       WHEN s_de = g THEN 'de' WHEN s_en = g THEN 'en' WHEN s_es = g THEN 'es'
        |       WHEN s_fr = g THEN 'fr' WHEN s_zh = g THEN 'zh' ELSE 'und' END AS pred_lang
        |FROM (SELECT *, greatest(s_de, s_en, s_es, s_fr, s_zh) AS g FROM s)""".stripMargin,
    "q_token_freq" ->
      """SELECT lang, token, COUNT(*) AS freq FROM (
        |  SELECT lang, unnest(string_split(text,' ')) AS token FROM documents)
        |GROUP BY lang, token""".stripMargin,
    "q_fingerprint" ->
      // rolling_hash mirrors TextFunctions.rollingHash: P = 2^31-1, B = 2^16,
      // B^k mod P = 2^((16k) mod 31) (Mersenne), per-term mod, sum mod P
      s"""WITH toks AS (SELECT doc_id, text, string_split(text,' ') AS tl FROM documents)
         |SELECT doc_id, md5(text) AS text_md5,
         |  list_min(list_transform(tl, t -> md5(t))) AS min_token_md5,
         |  $simhashSqlExpr AS simhash,
         |  CAST(list_sum([
         |    ((CAST('0x'||substr(md5(tl[i]),1,15) AS BIGINT) % 2147483647)
         |      * (CAST(1 AS BIGINT) << ((16*(len(tl)-i)) % 31))) % 2147483647
         |    FOR i IN range(1, len(tl)+1)]) % 2147483647 AS BIGINT) AS rolling_hash
         |FROM toks""".stripMargin,
    "q_vocab_growth" ->
      s"""WITH $shingleCte,
         |ex AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
         |fs AS (SELECT shingle, min(doc_id) AS first_seen FROM ex GROUP BY 1)
         |SELECT first_seen // 50 AS bucket, CAST(count(*) AS BIGINT) AS new_shingles
         |FROM fs GROUP BY 1""".stripMargin,
    "q_boilerplate" ->
      s"""WITH $shingleCte,
         |ex AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
         |st AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df,
         |    min(doc_id) AS first_seen FROM ex GROUP BY 1),
         |p AS (SELECT e.doc_id,
         |    CAST(count(*) AS BIGINT) AS n_shingles,
         |    CAST(sum(CASE WHEN st.first_seen = e.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |    CAST(sum(CASE WHEN st.df >= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_common
         |  FROM ex e JOIN st ON st.shingle = e.shingle GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(p.n_shingles, 0) AS n_shingles,
         |  coalesce(p.n_novel, 0) AS n_novel,
         |  coalesce(p.n_common, 0) AS n_common,
         |  CASE WHEN p.n_shingles > 0
         |    THEN round(p.n_novel*1.0/p.n_shingles, 6) END AS novelty_ratio,
         |  CASE WHEN p.n_shingles > 0
         |    THEN round(p.n_common*1.0/p.n_shingles, 6) END AS boilerplate_ratio
         |FROM documents d LEFT JOIN p ON p.doc_id = d.doc_id""".stripMargin,
    "q_repetition" ->
      // bigrams: tl[i]||'_'||tl[i+1] for i in 1..len-1 (DuckDB lists are
      // 1-based; range() excludes its end) — mirrors shingles(toks, 2)
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS tl FROM documents),
        |b AS (SELECT doc_id, CAST(len(tl) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct([tl[i]||'_'||tl[i+1] FOR i IN range(1, len(tl))])) AS BIGINT)
        |    AS n_uniq_bigrams, tl FROM t),
        |top AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_token_freq FROM (
        |  SELECT doc_id, token, COUNT(*) AS c FROM (
        |    SELECT doc_id, unnest(tl) AS token FROM t) GROUP BY doc_id, token)
        |  GROUP BY doc_id),
        |r AS (SELECT b.doc_id, n_tokens, n_uniq_bigrams, top_token_freq,
        |  round(CAST(top_token_freq AS DOUBLE)/n_tokens, 6) AS top_token_ratio,
        |  CASE WHEN n_tokens < 2 THEN 0.0
        |       ELSE round(1.0 - CAST(n_uniq_bigrams AS DOUBLE)/(n_tokens-1), 6)
        |  END AS dup_bigram_ratio
        |FROM b JOIN top ON b.doc_id = top.doc_id)
        |SELECT *, CASE WHEN top_token_ratio > 0.2 THEN 'top_token'
        |               WHEN dup_bigram_ratio > 0.5 THEN 'dup_bigrams'
        |               ELSE 'ok' END AS verdict
        |FROM r""".stripMargin,
    "q_entropy" ->
      """WITH c AS (SELECT doc_id, length(text) AS n, unnest(string_split(text,'')) AS ch
        |  FROM documents),
        |g AS (SELECT doc_id, n, ch, COUNT(*) AS cnt FROM c GROUP BY doc_id, n, ch)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
        |  round(-SUM(cnt/CAST(n AS DOUBLE) * log2(cnt/CAST(n AS DOUBLE))), 6) AS entropy
        |FROM g GROUP BY doc_id, n""".stripMargin,
    "q_pii_redact" ->
      // same synthesized text, same patterns; RE2 needs the 'g' flag for
      // replace-all (Java regexp_replace is global by default)
      """WITH p AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' contact u'||doc_id||'@example.com' ELSE '' END ||
        |    CASE WHEN doc_id % 4 = 0 THEN ' host 10.'||(doc_id % 256)||'.0.'||(doc_id % 100) ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN ' call 555-867-'||lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
        |    AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9._]+@[a-z0-9.]+\.[a-z]+')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ip,
        |  CAST(len(regexp_extract_all(text, '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) AS BIGINT) AS n_phone,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[a-z0-9._]+@[a-z0-9.]+\.[a-z]+', '<EMAIL>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g') AS redacted
        |FROM p""".stripMargin,
    "q_tfidf" ->
      """WITH tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents)
        |  GROUP BY doc_id, term),
        |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
        |scored AS (SELECT doc_id, tf.term, tf, df,
        |    round(CAST(tf AS DOUBLE) * ln(n_docs/df), 6) AS tfidf
        |  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n)
        |SELECT doc_id, term, tf, df, tfidf, rn FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, term ASC) AS rn
        |  FROM scored)
        |WHERE rn <= 3""".stripMargin,
    "q_unigram_logprob" ->
      s"""WITH $unigramCte
         |SELECT doc_id, n_tokens, avg_neg_logprob FROM u""".stripMargin,
    "q_bm25" ->
      // Lucene-form idf ln(1 + (N-df+0.5)/(df+0.5)); k1=1.2, b=0.75;
      // round-6 before ranking, doc_id tie-break — mirrors bm25TopK exactly
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |perdoc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
        |       WHERE term IN ('join', 'vector', 'spark') GROUP BY doc_id, term),
        |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
        |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
        |    AVG(CAST(dl AS DOUBLE)) AS avgdl FROM perdoc),
        |scored AS (
        |  SELECT tf.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matched,
        |    round(SUM(
        |      ln((n_docs - df + 0.5) / (df + 0.5) + 1) *
        |      (CAST(tf AS DOUBLE) * 2.2) /
        |      (CAST(tf AS DOUBLE) + 1.2 * (1 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))), 6)
        |      AS score
        |  FROM tf JOIN perdoc USING (doc_id) JOIN dfreq USING (term) CROSS JOIN stats
        |  GROUP BY tf.doc_id)
        |SELECT doc_id, n_matched, score, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn FROM scored)
        |WHERE rn <= 10""".stripMargin,
    "q_hard_negatives" ->
      // Multi-query BM25 (same formula text as q_bm25), positives
      // excluded, per-query rank window — mirrors
      // Retrieval.hardNegativesBm25 on the same 3 labeled pairs
      """WITH qt(query_id, term) AS (VALUES
        |    (1, 'join'), (1, 'vector'), (1, 'spark'),
        |    (2, 'window'), (2, 'stream'), (2, 'merge'),
        |    (3, 'filter'), (3, 'scan'), (3, 'column')),
        |pos(query_id, pos_doc_id) AS (VALUES (1, 0), (2, 1), (3, 2)),
        |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |perdoc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
        |  FROM tok GROUP BY 1),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
        |  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2),
        |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
        |  FROM tf GROUP BY 1),
        |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
        |    AVG(CAST(dl AS DOUBLE)) AS avgdl FROM perdoc),
        |scored AS (
        |  SELECT qt.query_id, tf.doc_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_matched,
        |    round(SUM(
        |      ln((n_docs - df + 0.5) / (df + 0.5) + 1) *
        |      (CAST(tf AS DOUBLE) * 2.2) /
        |      (CAST(tf AS DOUBLE) + 1.2 * (1 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))), 6)
        |      AS score
        |  FROM tf JOIN qt USING (term) JOIN perdoc USING (doc_id)
        |    JOIN dfreq USING (term) CROSS JOIN stats
        |  GROUP BY 1, 2),
        |ranked AS (SELECT s.query_id, s.doc_id, n_matched, score,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY s.query_id
        |      ORDER BY score DESC, s.doc_id) AS BIGINT) AS neg_rank
        |  FROM scored s JOIN pos p
        |    ON p.query_id = s.query_id AND s.doc_id <> p.pos_doc_id)
        |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, n_matched,
        |  score, neg_rank
        |FROM ranked WHERE neg_rank <= 5""".stripMargin,
    "q_kneser_ney" ->
      // Exact BIGINT bigram/continuation counts off one bigram table;
      // the probability is TextAnalysis.knProbSql verbatim
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tl
         |  FROM documents),
         |b AS (SELECT tl[i] AS w1, tl[i + 1] AS w2
         |  FROM (SELECT doc_id, tl, unnest(range(1, len(tl))) AS i
         |    FROM toks)),
         |big AS MATERIALIZED (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM b GROUP BY 1, 2),
         |lft AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS c1,
         |    CAST(COUNT(*) AS BIGINT) AS nfw FROM big GROUP BY 1),
         |rgt AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS nbw
         |  FROM big GROUP BY 1),
         |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nbig FROM big)
         |SELECT w1, w2, c, c1, nfw, nbw,
         |  ${graft.operators.TextAnalysis.knProbSql(0.75)} AS p_kn
         |FROM big JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN nb
         |WHERE c >= 5
         |ORDER BY p_kn DESC, w1, w2 LIMIT 25""".stripMargin,
    "q_sax" ->
      // PAA segment = ((rn-1)*8)//n (non-negative // ≡ div), letters via
      // TimeSeries.saxSymbolSql verbatim over exact BIGINT moments
      s"""WITH series AS (SELECT CAST(s_nationkey AS BIGINT) AS nation,
         |    CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)
         |      AS m,
         |    CAST(SUM(l_quantity) AS BIGINT) AS qty
         |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |  GROUP BY 1, 2),
         |rows_ AS (SELECT nation, qty,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY nation ORDER BY m)
         |      AS BIGINT) AS rn,
         |    CAST(COUNT(*) OVER (PARTITION BY nation) AS BIGINT) AS nn
         |  FROM series),
         |segd AS (SELECT nation, qty AS __y, nn,
         |    ((rn - 1) * 8) // nn AS __seg FROM rows_),
         |paa AS (SELECT nation, __seg, CAST(SUM(__y) AS BIGINT) AS __ps,
         |    CAST(COUNT(*) AS BIGINT) AS __pc FROM segd GROUP BY 1, 2),
         |stats AS (SELECT nation, CAST(COUNT(*) AS BIGINT) AS __n,
         |    CAST(SUM(__y) AS BIGINT) AS __s,
         |    CAST(SUM(__y * __y) AS BIGINT) AS __q FROM segd GROUP BY 1),
         |sym AS (SELECT nation, __seg, __n,
         |    ${graft.operators.TimeSeries.saxSymbolSql} AS __sym
         |  FROM paa JOIN stats USING (nation))
         |SELECT nation, MAX(__n) AS n,
         |  string_agg(__sym, '' ORDER BY __seg) AS sax_word
         |FROM sym GROUP BY 1""".stripMargin,
    "q_rrf_fusion" ->
      // Replays BM25 top-50 (same CTEs as q_bm25), cosine top-50 around
      // vector 0 (same norm/rounding as q_similarity_ivf), then the
      // 1/(60+rank) fusion: a <=2-element double sum is order-independent
      // (IEEE addition is commutative), rank by rounded rrf desc, id.
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |perdoc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
        |       WHERE term IN ('join', 'vector', 'spark') GROUP BY doc_id, term),
        |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
        |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
        |    AVG(CAST(dl AS DOUBLE)) AS avgdl FROM perdoc),
        |scored AS (
        |  SELECT tf.doc_id, round(SUM(
        |      ln((n_docs - df + 0.5) / (df + 0.5) + 1) *
        |      (CAST(tf AS DOUBLE) * 2.2) /
        |      (CAST(tf AS DOUBLE) + 1.2 * (1 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))), 6)
        |      AS score
        |  FROM tf JOIN perdoc USING (doc_id) JOIN dfreq USING (term) CROSS JOIN stats
        |  GROUP BY tf.doc_id),
        |trank AS (SELECT doc_id AS id, rn FROM (
        |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn FROM scored)
        |  WHERE rn <= 50),
        |n AS (SELECT vec_id, embedding,
        |  sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |q0 AS (SELECT embedding AS qv, nrm AS qn FROM n WHERE vec_id = 0),
        |vrank AS (SELECT vec_id AS id, rk FROM (
        |  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS rk FROM (
        |    SELECT n.vec_id,
        |      round(list_sum([CAST(n.embedding[i] AS DOUBLE)*CAST(q0.qv[i] AS DOUBLE)
        |  FOR i IN range(1, len(n.embedding)+1)]) / (n.nrm * q0.qn), 6) AS sim
        |    FROM n CROSS JOIN q0 WHERE n.vec_id != 0))
        |  WHERE rk <= 50),
        |u AS (SELECT id, CAST(1 AS DOUBLE) / (60 + rn) AS c FROM trank
        |  UNION ALL SELECT id, CAST(1 AS DOUBLE) / (60 + rk) FROM vrank),
        |f AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_lists,
        |    round(SUM(c), 6) AS rrf FROM u GROUP BY id)
        |SELECT id, n_lists, rrf, CAST(r AS BIGINT) AS rank FROM (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY rrf DESC, id) AS r FROM f)
        |WHERE r <= 20""".stripMargin,
    "q_perplexity_sample" ->
      // exact percentile cutpoints over 1e6 fixed-point scores; bucket
      // comparisons are integer-vs-interpolated (never ulp-ambiguous);
      // keep rates replayed with the md5 hash-bucket formula
      s"""WITH $unigramCte,
         |lp AS (SELECT doc_id, CAST(round(avg_neg_logprob * 1e6) AS BIGINT) AS lp FROM u),
         |cuts AS (SELECT quantile_cont(lp, 0.33333333) AS c1,
         |    quantile_cont(lp, 0.66666667) AS c2 FROM lp),
         |b AS (SELECT doc_id, lp,
         |    CASE WHEN lp <= c1 THEN 'head' WHEN lp <= c2 THEN 'middle' ELSE 'tail' END AS bucket
         |  FROM lp CROSS JOIN cuts)
         |SELECT doc_id, lp, bucket FROM b
         |WHERE CAST('0x' || substr(md5(bucket || ':' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
         |  % 100 < CASE bucket WHEN 'head' THEN 100 WHEN 'middle' THEN 50 ELSE 10 END""".stripMargin,
    "q_heavy_hitters" -> heavyHittersSql,
    // the streaming tier computes the same exact rollup (complete-mode
    // token counts + drained-total threshold) — one oracle, two engines
    "q_stream_heavy_hitters" -> heavyHittersSql,
    "q_chunk_dedup" ->
      // same 5-token chunking as the q_chunk_docs oracle over the
      // boiler-spliced text; first occurrence per (doc, chunk_text) kept,
      // reassembly via ORDER BY on the kept chunk indexes
      """WITH p AS (SELECT doc_id,
        |    'subscribe to our newsletter today ' || text || ' subscribe to our newsletter today' AS text
        |  FROM documents),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS tl FROM p),
        |i AS (SELECT doc_id, tl, unnest(range(0, len(tl), 5)) AS i FROM toks),
        |ch AS (SELECT doc_id, CAST(i // 5 AS BIGINT) AS chunk_idx,
        |    array_to_string(tl[i+1:i+5], ' ') AS chunk_text FROM i),
        |n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks FROM ch GROUP BY doc_id),
        |first AS (SELECT doc_id, chunk_text, MIN(chunk_idx) AS chunk_idx
        |  FROM ch GROUP BY doc_id, chunk_text)
        |SELECT first.doc_id, n.n_chunks, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS clean_text,
        |  CAST(n.n_chunks - COUNT(*) AS BIGINT) AS n_dropped
        |FROM first JOIN n ON first.doc_id = n.doc_id
        |GROUP BY first.doc_id, n.n_chunks""".stripMargin,
    "q_repeated_spans" ->
      // window hashes over the rebuilt text: DuckDB pos = Spark pos via
      // i-1 (1-based slices tl[i:i+7] = 8 tokens); dup mark = MIN≠MAX doc
      // per hash; spans = lag/sum run-length merge, strict overlap
      s"""WITH $disclaimerCte,
        |toks AS (SELECT doc_id, string_split(text,' ') AS tl FROM p WHERE len(string_split(text,' ')) >= 8),
        |wh AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
        |    md5(array_to_string(tl[i:i+7], ' ')) AS whash
        |  FROM (SELECT doc_id, tl, unnest(range(1, len(tl) - 6)) AS i FROM toks)),
        |dup AS (SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos,
        |      MIN(doc_id) OVER (PARTITION BY whash) AS mn,
        |      MAX(doc_id) OVER (PARTITION BY whash) AS mx
        |    FROM wh) WHERE mn <> mx),
        |f AS (SELECT doc_id, pos,
        |    CASE WHEN coalesce(pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos), 8) >= 8
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM dup),
        |s AS (SELECT doc_id, pos,
        |    SUM(is_new) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS span_idx
        |  FROM f)
        |SELECT doc_id, CAST(span_idx AS BIGINT) AS span_idx,
        |  CAST(MIN(pos) AS BIGINT) AS start_tok, CAST(MAX(pos) + 8 AS BIGINT) AS end_tok,
        |  CAST(COUNT(*) AS BIGINT) AS n_windows
        |FROM s GROUP BY doc_id, span_idx""".stripMargin,
    "q_repeated_spans_apply" ->
      // spans replayed as in q_repeated_spans, then the interval overlay:
      // +1/-1 delta events union with token rows; running SUM over
      // (pos, kind) marks covered tokens (kind puts deltas before the
      // token at the same position -> end-exclusive semantics)
      s"""WITH $disclaimerCte,
        |t0 AS (SELECT doc_id, string_split(text,' ') AS tl FROM p),
        |toks AS (SELECT doc_id, tl FROM t0 WHERE len(tl) >= 8),
        |wh AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
        |    md5(array_to_string(tl[i:i+7], ' ')) AS whash
        |  FROM (SELECT doc_id, tl, unnest(range(1, len(tl) - 6)) AS i FROM toks)),
        |dup AS (SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos,
        |      MIN(doc_id) OVER (PARTITION BY whash) AS mn,
        |      MAX(doc_id) OVER (PARTITION BY whash) AS mx
        |    FROM wh) WHERE mn <> mx),
        |f AS (SELECT doc_id, pos,
        |    CASE WHEN coalesce(pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos), 8) >= 8
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM dup),
        |s AS (SELECT doc_id, pos,
        |    SUM(is_new) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS span_idx
        |  FROM f),
        |spans AS (SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS start_tok,
        |    CAST(MAX(pos) + 8 AS BIGINT) AS end_tok
        |  FROM s GROUP BY doc_id, span_idx),
        |tok AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, tl[i] AS token
        |  FROM (SELECT doc_id, tl, unnest(range(1, len(tl)+1)) AS i FROM t0)),
        |ev AS (
        |  SELECT doc_id, start_tok AS pos, 1 AS delta, 0 AS kind, CAST(NULL AS VARCHAR) AS token FROM spans
        |  UNION ALL SELECT doc_id, end_tok, -1, 0, CAST(NULL AS VARCHAR) FROM spans
        |  UNION ALL SELECT doc_id, pos, 0, 1, token FROM tok),
        |c AS (SELECT doc_id, pos, kind, token,
        |    SUM(delta) OVER (PARTITION BY doc_id ORDER BY pos, kind ROWS UNBOUNDED PRECEDING) AS cov
        |  FROM ev)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) FILTER (cov = 0) AS BIGINT) AS n_kept,
        |  CAST(COUNT(*) FILTER (cov > 0) AS BIGINT) AS n_removed,
        |  coalesce(string_agg(token, ' ' ORDER BY pos) FILTER (cov = 0), '') AS clean_text
        |FROM c WHERE kind = 1 GROUP BY doc_id""".stripMargin,
    "q_decontaminate" ->
      // 4-gram strings via inclusive 1-based list slices tl[i:i+3];
      // range(1, len-2) caps i at len-3 and is empty when len < 4
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS tl FROM documents),
        |g AS (SELECT doc_id,
        |  list_distinct([array_to_string(tl[i:i+3],'_') FOR i IN range(1, len(tl)-2)]) AS gs
        |  FROM t),
        |te AS (SELECT DISTINCT unnest(gs) AS sh FROM g WHERE doc_id % 20 = 0),
        |tr AS (SELECT doc_id, unnest(gs) AS sh FROM g WHERE doc_id % 20 <> 0)
        |SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap_grams
        |FROM tr JOIN te USING(sh) GROUP BY tr.doc_id""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id, 'text/plain' AS mime,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  CAST((octet_length(CAST(text AS BLOB)) + 15) // 16 AS BIGINT) AS n_frames
        |FROM documents""".stripMargin,
    "q_multimodal_image" ->
      // replays the BMP SYNTHESIS formulas (not the bytes): w/h from
      // doc_id/n_chars, pixel (x, y) = (doc_id + x + 3y) mod 251, px00 =
      // logical pixel (0, 0); the Spark side must decode the actual binary
      // (stride, padding, bottom-up rows) to reproduce these numbers
      """WITH p AS (SELECT doc_id, 1 + doc_id % 64 AS w, 1 + n_chars % 48 AS h
        |  FROM documents),
        |v AS (SELECT doc_id, w, h,
        |  [ (doc_id + (i % w) + 3*(i // w)) % 251 FOR i IN range(0, w*h) ] AS px
        |FROM p)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(24 AS BIGINT) AS bits_per_pixel, CAST(w*h AS BIGINT) AS n_px,
        |  CAST(doc_id % 251 AS BIGINT) AS px00,
        |  CAST(list_max(px) AS BIGINT) AS peak_px,
        |  round(CAST(list_sum(px) AS DOUBLE)/(w*h), 6) AS mean_px
        |FROM v""".stripMargin,
    "q_wav_spectrum" ->
      s"""WITH p AS (SELECT doc_id, 100 + doc_id % 400 AS freq,
         |    LEAST(500 + n_chars % 500, 2048) AS n
         |  FROM documents WHERE doc_id < 8),
         |samp AS (SELECT doc_id, n, unnest(range(0, n)) AS i, freq
         |  FROM p),
         |sv AS (SELECT doc_id, n, i,
         |    ((i * freq) % 8000) * 65536 // 8000 - 32768 AS amp
         |  FROM samp),
         |sk AS (SELECT sv.*, k FROM sv,
         |  (SELECT unnest(range(1, 65)) AS k)),
         |t AS (SELECT doc_id, n, k,
         |    ${graft.operators.Multimodal.dftTermMicroSql("cos")} AS re_t,
         |    ${graft.operators.Multimodal.dftTermMicroSql("sin")} AS im_t
         |  FROM sk),
         |g AS (SELECT doc_id, n, k,
         |    CAST(SUM(re_t) AS BIGINT) AS re_micro,
         |    CAST(SUM(im_t) AS BIGINT) AS im_micro
         |  FROM t GROUP BY 1, 2, 3),
         |e AS (SELECT doc_id, n, k,
         |    CAST(CAST(re_micro AS DECIMAL(38,0)) * re_micro +
         |      CAST(im_micro AS DECIMAL(38,0)) * im_micro
         |      AS DECIMAL(38,0)) AS e2
         |  FROM g)
         |SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
         |  CAST(k AS BIGINT) AS k_peak,
         |  CAST(e2 AS VARCHAR) AS peak_energy_sq,
         |  round(CAST(k AS DOUBLE) * 8000 / n, 6) AS freq_hz
         |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY e2 DESC, k) AS r FROM e)
         |WHERE r = 1""".stripMargin,
    "q_multimodal_wav" ->
      // replays the SAWTOOTH SYNTHESIS formulas per sample (not the bytes):
      // freq/n from doc_id/n_chars, sample(i) = ((i·freq) mod 8000)·65536
      // // 8000 − 32768 — the Spark side must parse the actual RIFF/PCM
      // binary (chunk walk, fmt gate, data scan) to reproduce these stats
      """WITH p AS (SELECT doc_id, 100 + doc_id % 400 AS freq,
        |    500 + n_chars % 500 AS n FROM documents),
        |v AS (SELECT doc_id, n,
        |  [ abs(((i * freq) % 8000) * 65536 // 8000 - 32768) FOR i IN range(0, n) ] AS amp
        |FROM p)
        |SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(1 AS BIGINT) AS n_channels, CAST(16 AS BIGINT) AS bits_per_sample,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(list_max(amp) AS BIGINT) AS peak_abs,
        |  CAST(list_sum(amp) AS BIGINT) AS sum_abs
        |FROM v""".stripMargin,
    "q_wav_frame_energy" ->
      // replays the saw-tone synthesis sample-by-sample (same integer
      // formula as q_multimodal_wav, signed not abs) and folds exact Σx²
      // per 200-sample frame; rms derives from the integers in SQL round()
      """WITH p AS (SELECT doc_id, 100 + doc_id % 400 AS freq,
        |    500 + n_chars % 500 AS n FROM documents),
        |s AS (SELECT doc_id, freq, unnest(range(0, n)) AS i FROM p),
        |v AS (SELECT doc_id, i // 200 AS frame,
        |  ((i * freq) % 8000) * 65536 // 8000 - 32768 AS x FROM s)
        |SELECT doc_id, CAST(frame AS BIGINT) AS frame,
        |  CAST(COUNT(*) AS BIGINT) AS n_samples,
        |  CAST(SUM(x * x) AS BIGINT) AS sumsq,
        |  round(sqrt(CAST(SUM(x * x) AS DOUBLE) / COUNT(*)), 6) AS rms
        |FROM v GROUP BY doc_id, frame""".stripMargin,
    "q_image_dhash" ->
      // replays tile sums from the pixel formula, then every dHash bit via
      // the exact integer cross-product compare; Hamming via bit_count(xor)
      """WITH p AS (SELECT doc_id, 1 + doc_id % 64 AS w, 1 + n_chars % 48 AS h
        |  FROM documents),
        |s AS (SELECT doc_id, w, unnest(range(0, w*h)) AS i FROM p),
        |t AS (SELECT doc_id, (i % w) // 8 AS tile_x, (i // w) // 8 AS tile_y,
        |    CAST(COUNT(*) AS BIGINT) AS n_px,
        |    CAST(SUM((doc_id + (i % w) + 3*(i // w)) % 251) AS BIGINT) AS sum_px
        |  FROM s GROUP BY 1, 2, 3),
        |pr AS (SELECT a.doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY a.doc_id
        |      ORDER BY a.tile_y, a.tile_x) - 1 AS k,
        |    CASE WHEN a.sum_px * b.n_px > b.sum_px * a.n_px
        |      THEN 1 ELSE 0 END AS bit
        |  FROM t a JOIN t b ON b.doc_id = a.doc_id
        |    AND b.tile_y = a.tile_y AND b.tile_x = a.tile_x + 1),
        |hh AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bits,
        |    CAST(SUM(bit * (CAST(1 AS BIGINT) << k)) AS BIGINT) AS dhash
        |  FROM pr GROUP BY 1)
        |SELECT doc_id, n_bits, dhash,
        |  CAST(bit_count(xor(dhash, lag(dhash, 1) OVER (ORDER BY doc_id)))
        |    AS BIGINT) AS hamming_prev
        |FROM hh""".stripMargin,
    "q_image_ahash" ->
      // replays tile + whole-image sums from the pixel formula; every
      // aHash bit via the exact integer cross-product compare
      """WITH p AS (SELECT doc_id, 1 + doc_id % 64 AS w, 1 + n_chars % 48 AS h
        |  FROM documents),
        |s AS (SELECT doc_id, w, unnest(range(0, w*h)) AS i FROM p),
        |t AS (SELECT doc_id, (i % w) // 8 AS tile_x, (i // w) // 8 AS tile_y,
        |    CAST(COUNT(*) AS BIGINT) AS n_px,
        |    CAST(SUM((doc_id + (i % w) + 3*(i // w)) % 251) AS BIGINT) AS sum_px
        |  FROM s GROUP BY 1, 2, 3),
        |tt AS (SELECT doc_id, CAST(SUM(sum_px) AS BIGINT) AS s_tot,
        |    CAST(SUM(n_px) AS BIGINT) AS n_tot FROM t GROUP BY 1),
        |pr AS (SELECT t.doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY t.doc_id
        |      ORDER BY tile_y, tile_x) - 1 AS k,
        |    CASE WHEN sum_px * n_tot > s_tot * n_px THEN 1 ELSE 0 END
        |      AS bit
        |  FROM t JOIN tt USING (doc_id)),
        |hh AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bits,
        |    CAST(SUM(bit * (CAST(1 AS BIGINT) << k)) AS BIGINT) AS ahash
        |  FROM pr GROUP BY 1)
        |SELECT doc_id, n_bits, ahash,
        |  CAST(bit_count(xor(ahash, lag(ahash, 1) OVER (ORDER BY doc_id)))
        |    AS BIGINT) AS hamming_prev
        |FROM hh""".stripMargin,
    "q_image_neardup_dhash" ->
      // INDEPENDENT all-pairs formulation (no banding): valid as an
      // equality oracle because maxHamming(3) < bands(6) makes the
      // engine's LSH exhaustive, and every bucket here is far under the
      // star-fallback cap (largest n_bits group ~52 docs at sf0.01).
      """WITH p AS (SELECT doc_id, 1 + doc_id % 64 AS w, 1 + n_chars % 48 AS h
        |  FROM documents),
        |s AS (SELECT doc_id, w, unnest(range(0, w*h)) AS i FROM p),
        |t AS (SELECT doc_id, (i % w) // 8 AS tile_x, (i // w) // 8 AS tile_y,
        |    CAST(COUNT(*) AS BIGINT) AS n_px,
        |    CAST(SUM((doc_id + (i % w) + 3*(i // w)) % 251) AS BIGINT) AS sum_px
        |  FROM s GROUP BY 1, 2, 3),
        |pr AS (SELECT a.doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY a.doc_id
        |      ORDER BY a.tile_y, a.tile_x) - 1 AS k,
        |    CASE WHEN a.sum_px * b.n_px > b.sum_px * a.n_px
        |      THEN 1 ELSE 0 END AS bit
        |  FROM t a JOIN t b ON b.doc_id = a.doc_id
        |    AND b.tile_y = a.tile_y AND b.tile_x = a.tile_x + 1),
        |hh AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bits,
        |    CAST(SUM(bit * (CAST(1 AS BIGINT) << k)) AS BIGINT) AS dhash
        |  FROM pr GROUP BY 1)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
        |FROM hh a JOIN hh b
        |  ON a.n_bits = b.n_bits AND b.doc_id > a.doc_id
        |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3""".stripMargin,
    "q_image_otsu" ->
      s"""WITH p AS (SELECT doc_id, 1 + doc_id % 64 AS w,
         |    1 + n_chars % 48 AS h FROM documents),
         |s AS (SELECT doc_id, w, unnest(range(0, w*h)) AS i FROM p),
         |v AS (SELECT doc_id,
         |    (doc_id + (i % w) + 3*(i // w)) % 251 AS px FROM s),
         |hist AS (SELECT doc_id, px, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM v GROUP BY 1, 2),
         |c AS (SELECT doc_id, px, cnt,
         |    CAST(SUM(cnt) OVER pw AS BIGINT) AS cum_cnt,
         |    CAST(SUM(px * cnt) OVER pw AS BIGINT) AS cum_pxc,
         |    CAST(SUM(cnt) OVER (PARTITION BY doc_id) AS BIGINT)
         |      AS n_px,
         |    CAST(SUM(px * cnt) OVER (PARTITION BY doc_id) AS BIGINT)
         |      AS s_tot
         |  FROM hist WINDOW pw AS (PARTITION BY doc_id ORDER BY px
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |f AS (SELECT doc_id, px, cum_cnt, n_px,
         |    CAST(cum_pxc * n_px - s_tot * cum_cnt AS BIGINT) AS d
         |  FROM c WHERE cum_cnt > 0 AND cum_cnt < n_px),
         |j AS (SELECT *, ${graft.operators.Multimodal.otsuJSql} AS j
         |  FROM f)
         |SELECT doc_id, n_px, CAST(px AS BIGINT) AS threshold,
         |  d AS j_num,
         |  round(CAST(n_px - cum_cnt AS DOUBLE) / n_px, 6) AS fg_frac
         |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY j DESC, px) AS r FROM j)
         |WHERE r = 1""".stripMargin,
    "q_image_tiles" ->
      // replays the gray-ramp pixel formula (same as q_multimodal_image)
      // grouped into 8×8 logical tiles; edge tiles keep their true n_px
      """WITH p AS (SELECT doc_id, 1 + doc_id % 64 AS w, 1 + n_chars % 48 AS h
        |  FROM documents),
        |s AS (SELECT doc_id, w, unnest(range(0, w*h)) AS i FROM p),
        |v AS (SELECT doc_id, (i % w) // 8 AS tile_x, (i // w) // 8 AS tile_y,
        |  (doc_id + (i % w) + 3*(i // w)) % 251 AS px FROM s)
        |SELECT doc_id, CAST(tile_x AS BIGINT) AS tile_x,
        |  CAST(tile_y AS BIGINT) AS tile_y,
        |  CAST(COUNT(*) AS BIGINT) AS n_px, CAST(SUM(px) AS BIGINT) AS sum_px,
        |  round(CAST(SUM(px) AS DOUBLE) / COUNT(*), 6) AS mean_px
        |FROM v GROUP BY doc_id, tile_x, tile_y""".stripMargin,
    "q_multimodal_decode" ->
      // replays the stub codec's formulas: dims from the byte length, f3
      // from the md5-derived 60-bit payload hash (same bytes: DuckDB md5
      // hashes the VARCHAR's UTF-8 encoding, the kernel hashes the binary
      // content column = UTF-8 encode of text)
      """SELECT doc_id, 'text/plain' AS mime,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  CAST(octet_length(CAST(text AS BLOB)) % 640 + 1 AS BIGINT) AS width,
        |  CAST(octet_length(CAST(text AS BLOB)) % 480 + 1 AS BIGINT) AS height,
        |  round(CAST(CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % 1009 AS DOUBLE), 6) AS f3
        |FROM documents""".stripMargin,
    "q_compress_ratio" ->
      // the deflate bit-stream is engine-internal; the oracle pins the
      // exact byte length and the two Spark-side assertions to 1 — a
      // failed round-trip or size bound breaks the hash
      """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  1 AS roundtrip_ok, 1 AS size_ok
        |FROM documents""".stripMargin,
    "q_approx_distinct" ->
      "SELECT count(DISTINCT user_id) AS exact_users, 1 AS est_ok FROM events",
    "q_hll_merge" ->
      """SELECT event_type, count(DISTINCT CAST(ts AS DATE)) AS n_days,
        |  count(DISTINCT user_id) AS exact_users, 1 AS est_ok
        |FROM events GROUP BY event_type""".stripMargin,
    "q_approx_percentile" ->
      """SELECT event_type,
        |  round(quantile_cont(cents, 0.5), 6) AS p50,
        |  round(quantile_cont(cents, 0.9), 6) AS p90,
        |  round(quantile_cont(cents, 0.99), 6) AS p99,
        |  1 AS ok50, 1 AS ok90, 1 AS ok99
        |FROM (SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM events)
        |GROUP BY event_type""".stripMargin,
    "q_freq_items" ->
      // the KPS sketch is exact here (see the query comment): 100 slots,
      // 5 distinct values, no decrement ever fires
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "q_asof_join" -> asofBackwardOracle,
    // the custom-plan merge computes the identical relation
    "q_asof_merge" -> asofBackwardOracle,
    "q_range_join" ->
      """WITH tiers(tier, lo, hi) AS (VALUES
        |    ('t0', 0, 10000), ('t1', 10000, 20000), ('t2', 20000, 30000),
        |    ('t3', 30000, 40000), ('t4', 40000, 50000)),
        |v AS (SELECT event_id, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM events)
        |SELECT tier, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents
        |FROM v JOIN tiers ON cents >= lo AND cents < hi
        |GROUP BY tier""".stripMargin,
    "q_gap_fill" ->
      """WITH d AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day, COUNT(*) AS v
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM d GROUP BY 1),
        |spine AS (SELECT user_id, unnest(range(d0, d1 + 1)) AS day FROM s)
        |SELECT spine.user_id, spine.day, CAST(COALESCE(v, 0) AS BIGINT) AS v
        |FROM spine LEFT JOIN d USING (user_id, day)""".stripMargin,
    "q_interpolate" ->
      """WITH pd AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |ext AS (SELECT user_id, MIN(day) AS b0, MAX(day) AS b1 FROM pd GROUP BY 1),
        |spine AS (SELECT user_id, unnest(range(b0, b1 + 1)) AS day FROM ext),
        |j AS (
        |  SELECT spine.user_id, spine.day, v
        |  FROM spine LEFT JOIN pd USING (user_id, day)),
        |w AS (
        |  SELECT user_id, day, v,
        |    last_value(v IGNORE NULLS) OVER wb AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER wb AS pb,
        |    first_value(v IGNORE NULLS) OVER wf AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER wf AS nb
        |  FROM j
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wf AS (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, day,
        |  round(CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
        |    ELSE pv + (nv - pv) * (day - pb) / CAST(nb - pb AS DOUBLE) END, 6) AS v,
        |  CAST(v IS NOT NULL AS INT) AS observed
        |FROM w""".stripMargin,
    "q_seasonal_dow" ->
      """WITH pd AS (
        |  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
        |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, day % 7 AS dow, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(v) AS BIGINT) AS sv
        |  FROM pd GROUP BY 1, 2)
        |SELECT pd.event_type, pd.day, pd.v,
        |  round(CAST(sv AS DOUBLE) / n, 6) AS seasonal,
        |  round(CAST(pd.v AS DOUBLE) - CAST(sv AS DOUBLE) / n, 6) AS resid
        |FROM pd JOIN s
        |  ON s.event_type = pd.event_type AND s.dow = pd.day % 7""".stripMargin,
    "q_ewma" ->
      """WITH pd AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT user_id, day, v,
        |    list(CAST(v AS DOUBLE)) OVER (PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) AS vs
        |  FROM pd)
        |SELECT user_id, day, v,
        |  round(
        |    list_sum(list_transform(vs, (x, i) -> x * pow(0.7, len(vs) - i))) /
        |    ((1 - pow(0.7, len(vs))) / 0.3), 6) AS ewma
        |FROM w""".stripMargin,
    "q_rolling_median" ->
      """WITH pd AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, day, v,
        |  round(quantile_cont(CAST(v AS DOUBLE), 0.5) OVER (
        |    PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS roll_med
        |FROM pd""".stripMargin,
    "q_interval_union" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_ms(ts) AS s, epoch_ms(ts) + 300000 AS e
        |  FROM events),
        |m AS (
        |  SELECT user_id, s, e,
        |    max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |  FROM iv),
        |f AS (
        |  SELECT user_id, s, e,
        |    CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS nw
        |  FROM m),
        |isl AS (
        |  SELECT user_id, s, e,
        |    SUM(nw) OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM f),
        |mg AS (
        |  SELECT user_id, island, MIN(s) AS s, MAX(e) AS e
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_intervals,
        |  CAST(SUM(e - s) AS BIGINT) AS covered
        |FROM mg GROUP BY 1""".stripMargin,
    "q_anomaly_mad" ->
      """WITH pm AS (
        |  SELECT event_type, epoch_ms(ts) // 60000 AS minute, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, quantile_cont(n, 0.5) AS med FROM pm GROUP BY 1),
        |d AS (
        |  SELECT pm.event_type, minute, n, med, ABS(n - med) AS rawdev
        |  FROM pm JOIN m USING (event_type)),
        |md AS (SELECT event_type, quantile_cont(rawdev, 0.5) AS mad FROM d GROUP BY 1)
        |SELECT d.event_type, minute, n, round(med, 6) AS med,
        |  round(mad, 6) AS mad, round(rawdev, 6) AS dev
        |FROM d JOIN md USING (event_type)
        |ORDER BY rawdev DESC, d.event_type, minute LIMIT 20""".stripMargin,
    "q_scd2" ->
      """WITH c AS (
        |  SELECT CAST(o_custkey AS BIGINT) AS k,
        |    epoch_ms(o_orderdate) // 86400000 AS ts,
        |    o_orderstatus AS status, CAST(o_orderkey AS BIGINT) AS tie
        |  FROM orders),
        |o AS (
        |  SELECT k, ts, status, tie,
        |    row_number() OVER w AS rn, lag(status) OVER w AS prev
        |  FROM c WINDOW w AS (PARTITION BY k ORDER BY ts, tie)),
        |isl AS (
        |  SELECT k, ts, status, tie FROM o
        |  WHERE rn = 1 OR prev IS DISTINCT FROM status),
        |v AS (
        |  SELECT k, status, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY k ORDER BY ts, tie) AS valid_to
        |  FROM isl)
        |SELECT k AS o_custkey, status, valid_from,
        |  COALESCE(valid_to, -1) AS valid_to,
        |  CAST(valid_to IS NULL AS INT) AS is_current
        |FROM v""".stripMargin,
    "q_retention" ->
      """WITH d AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
        |c AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id)
        |SELECT cohort_day, day - cohort_day AS offset,
        |  CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_users
        |FROM d JOIN c USING (user_id)
        |WHERE day - cohort_day <= 7
        |GROUP BY cohort_day, day - cohort_day""".stripMargin,
    "q_funnel" -> funnelOracle,
    // single-batch stream == batch funnel (see the query's doc comment)
    "q_stream_funnel" -> funnelOracle,
    "q_markov_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(ts), event_id) AS to_type
        |  FROM events),
        |m AS (
        |  SELECT from_type, to_type, COUNT(*) AS n
        |  FROM seq WHERE to_type IS NOT NULL
        |  GROUP BY from_type, to_type)
        |SELECT from_type, to_type, n,
        |  round(n / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
        |FROM m""".stripMargin,
    "q_stream_cadence" ->
      s"""WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id
         |  FROM events),
         |g AS (SELECT user_id, ms - lag(ms) OVER (PARTITION BY user_id
         |    ORDER BY ms, event_id) AS gap FROM e),
         |a AS (SELECT user_id,
         |    CAST(COUNT(gap) AS BIGINT) AS n_gaps,
         |    CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS sg,
         |    CAST(COALESCE(SUM(gap*gap), 0) AS BIGINT) AS sgg
         |  FROM g GROUP BY 1)
         |SELECT user_id, n_gaps, sg, sgg,
         |  ${graft.operators.Sessionize.cadenceCvSql} AS cv,
         |  ${graft.operators.Sessionize.cadenceCvSql} < 0.1
         |    AND n_gaps >= 5 AS is_regular
         |FROM a""".stripMargin,
    "q_stream_cusum" ->
      """WITH RECURSIVE o AS (
        |  SELECT user_id AS key, epoch_ms(ts) AS ts_ms, event_id AS tie,
        |    CAST(ROUND(value * 100, 0) AS BIGINT) AS x,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(ts), event_id) AS rn
        |  FROM events),
        |r AS (
        |  SELECT key, rn, ts_ms, tie, x,
        |    greatest(0, x - 500 - 50) AS pos,
        |    greatest(0, 500 - x - 50) AS neg
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.key, o.rn, o.ts_ms, o.tie, o.x,
        |    greatest(0, r.pos + o.x - 500 - 50),
        |    greatest(0, r.neg + 500 - o.x - 50)
        |  FROM o JOIN r ON o.key = r.key AND o.rn = r.rn + 1)
        |SELECT key, ts_ms, tie, x, CAST(pos AS BIGINT) AS cusum_pos,
        |  CAST(neg AS BIGINT) AS cusum_neg,
        |  CAST(pos > 2000 OR neg > 2000 AS INT) AS alarm
        |FROM r""".stripMargin,
    "q_cusum" ->
      """WITH RECURSIVE pd AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |med AS (
        |  SELECT user_id, CAST(quantile_cont(v, 0.5) * 2 AS BIGINT) AS t2
        |  FROM pd GROUP BY 1),
        |o AS (
        |  SELECT pd.user_id, day, v, 2 * v AS x2, t2,
        |    row_number() OVER (PARTITION BY pd.user_id ORDER BY day) AS rn
        |  FROM pd JOIN med USING (user_id)),
        |r AS (
        |  SELECT user_id, rn, day, v,
        |    greatest(0, x2 - t2 - 100) AS pos,
        |    greatest(0, t2 - x2 - 100) AS neg
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.user_id, o.rn, o.day, o.v,
        |    greatest(0, r.pos + o.x2 - o.t2 - 100),
        |    greatest(0, r.neg + o.t2 - o.x2 - 100)
        |  FROM o JOIN r ON o.user_id = r.user_id AND o.rn = r.rn + 1)
        |SELECT user_id, day, v, CAST(pos AS BIGINT) AS cusum_pos,
        |  CAST(neg AS BIGINT) AS cusum_neg,
        |  CAST(pos > 1000 OR neg > 1000 AS INT) AS alarm
        |FROM r""".stripMargin,
    "q_prorate" ->
      """WITH li AS (
        |  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |    CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS w
        |  FROM lineitem),
        |o AS (
        |  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS t
        |  FROM orders),
        |j AS (
        |  SELECT l_orderkey, l_linenumber, w, t,
        |    SUM(w) OVER (PARTITION BY l_orderkey) AS bigw
        |  FROM li JOIN o ON l_orderkey = o_orderkey),
        |b AS (
        |  SELECT l_orderkey, l_linenumber, t,
        |    (t * w) // bigw AS base, (t * w) % bigw AS rem
        |  FROM j),
        |r AS (
        |  SELECT l_orderkey, l_linenumber, base,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY rem DESC, l_linenumber) AS rk,
        |    t - SUM(base) OVER (PARTITION BY l_orderkey) AS leftover
        |  FROM b)
        |SELECT l_orderkey, l_linenumber,
        |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
        |    AS alloc_cents
        |FROM r""".stripMargin,
    "q_session_entry_exit" ->
      """WITH s1 AS (
        |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms,
        |    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |              OR epoch_ms(ts) // 1000
        |                 - lag(epoch_ms(ts)) OVER w // 1000 > 1800
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
        |s2 AS (
        |  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM s1),
        |s3 AS (
        |  SELECT *, MIN(ms) OVER (PARTITION BY user_id, session_idx) AS first_ms
        |  FROM s2)
        |SELECT user_id,
        |  CAST(user_id AS VARCHAR) || '-' || CAST(first_ms AS VARCHAR) AS session_id,
        |  arg_min(event_type, CAST(ms AS HUGEINT) * 100000000 + event_id) AS entry_type,
        |  arg_max(event_type, CAST(ms AS HUGEINT) * 100000000 + event_id) AS exit_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(MAX(ms // 1000 - first_ms // 1000) AS BIGINT) AS duration,
        |  CAST(COUNT(*) = 1 AS INT) AS bounce
        |FROM s3
        |GROUP BY user_id, session_id""".stripMargin,
    "q_ransac" ->
      s"""WITH pts AS MATERIALIZED (
         |  SELECT CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS id,
         |    CAST(l_quantity AS BIGINT) AS x,
         |    CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS y
         |  FROM lineitem),
         |sel AS MATERIALIZED (SELECT id, x, y,
         |    CAST(row_number() OVER (ORDER BY hh, id) AS BIGINT) AS rk
         |  FROM (SELECT id, x, y, CAST('0x' || substr(md5(
         |        'ransac:' || CAST(id AS VARCHAR)), 1, 15) AS BIGINT)
         |      AS hh FROM pts)
         |  QUALIFY rk <= 32),
         |cand AS MATERIALIZED (SELECT (a.rk + 1) // 2 AS cand,
         |    a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
         |  FROM sel a JOIN sel b
         |    ON b.rk = a.rk + 1 AND a.rk % 2 = 1 AND b.x != a.x),
         |inl AS MATERIALIZED (SELECT cand, x1, y1, x2, y2,
         |    CAST(COUNT(*) AS BIGINT) AS n_inliers
         |  FROM pts p CROSS JOIN cand c
         |  WHERE ${graft.operators.TimeSeries.ransacInlierSql(200000L)}
         |  GROUP BY 1, 2, 3, 4, 5),
         |win AS MATERIALIZED (SELECT * FROM inl
         |  ORDER BY n_inliers DESC, cand LIMIT 1),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM pts),
         |fit AS (SELECT cand, x1, y1, x2, y2, n_inliers,
         |    CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(x * y) AS BIGINT) AS sxy,
         |    CAST(SUM(x * x) AS BIGINT) AS sxx
         |  FROM pts, win
         |  WHERE ${graft.operators.TimeSeries.ransacInlierSql(200000L)}
         |  GROUP BY 1, 2, 3, 4, 5, 6)
         |SELECT cand, x1, y1, x2, y2, n_inliers, n_total,
         |  round(CAST(n_inliers AS DOUBLE) / n_total, 6) AS inlier_frac,
         |  ${graft.operators.TimeSeries.ransacSlopeSql} AS slope,
         |  ${graft.operators.TimeSeries.ransacInterceptSql} AS intercept
         |FROM fit, tot""".stripMargin,
    "q_trend_ols" ->
      """WITH pd AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |x0 AS (
        |  SELECT user_id,
        |    day - MIN(day) OVER (PARTITION BY user_id) AS x, v AS y
        |  FROM pd),
        |m AS (
        |  SELECT user_id, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM x0 GROUP BY 1)
        |SELECT user_id, CAST(n AS BIGINT) AS n,
        |  round(CASE WHEN n * sxx - sx * sx > 0
        |    THEN (n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE)
        |    END, 6) AS slope,
        |  round(CASE WHEN n * sxx - sx * sx > 0
        |    THEN (sy - sx * ((n * sxy - sx * sy) /
        |        CAST(n * sxx - sx * sx AS DOUBLE))) / CAST(n AS DOUBLE)
        |    END, 6) AS intercept,
        |  round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |    THEN CAST(n * sxy - sx * sy AS DOUBLE) *
        |         CAST(n * sxy - sx * sy AS DOUBLE) /
        |         (CAST(n * sxx - sx * sx AS DOUBLE) *
        |          CAST(n * syy - sy * sy AS DOUBLE))
        |    END, 6) AS r2
        |FROM m""".stripMargin,
    "q_acf" ->
      """WITH pd AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT user_id, v AS y,
        |    lag(v, 1) OVER (PARTITION BY user_id ORDER BY day) AS x
        |  FROM pd),
        |m AS (
        |  SELECT user_id, COUNT(*) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
        |    SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM p WHERE x IS NOT NULL GROUP BY 1)
        |SELECT user_id, CAST(n AS BIGINT) AS n,
        |  round(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
        |    THEN (n * sxy - sx * sy) /
        |      sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
        |           CAST(n * syy - sy * sy AS DOUBLE))
        |    END, 6) AS acf
        |FROM m""".stripMargin,
    "q_rfm" ->
      """WITH a AS (
        |  SELECT user_id, MAX(epoch_ms(ts) // 86400000) AS last_b,
        |    COUNT(*) AS frequency,
        |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS monetary
        |  FROM events GROUP BY 1),
        |b AS (
        |  SELECT user_id, MAX(last_b) OVER () - last_b AS recency,
        |    frequency, monetary
        |  FROM a),
        |c AS (
        |  SELECT user_id, recency, frequency, monetary,
        |    CAST(ntile(5) OVER (ORDER BY recency DESC, user_id) AS INT) AS r_score,
        |    CAST(ntile(5) OVER (ORDER BY frequency, user_id) AS INT) AS f_score,
        |    CAST(ntile(5) OVER (ORDER BY monetary, user_id) AS INT) AS m_score
        |  FROM b)
        |SELECT user_id, recency, frequency, monetary, r_score, f_score,
        |  m_score,
        |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) ||
        |    CAST(m_score AS VARCHAR) AS segment
        |FROM c""".stripMargin,
    "q_benford" ->
      """WITH v AS (
        |  SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS c
        |  FROM events),
        |h AS (
        |  SELECT event_type,
        |    CAST(substr(CAST(abs(c) AS VARCHAR), 1, 1) AS INT) AS digit,
        |    COUNT(*) AS n
        |  FROM v WHERE c IS NOT NULL AND abs(c) > 0 GROUP BY 1, 2),
        |t AS (SELECT event_type, SUM(n) AS n_group FROM h GROUP BY 1)
        |SELECT h.event_type, digit, CAST(n AS BIGINT) AS n,
        |  round(n / CAST(n_group AS DOUBLE), 6) AS obs_freq,
        |  round(log10(1 + 1.0 / digit), 6) AS benford_freq,
        |  round(n_group *
        |    pow(n / CAST(n_group AS DOUBLE) - log10(1 + 1.0 / digit), 2)
        |    / log10(1 + 1.0 / digit), 6) AS chi2_contrib
        |FROM h JOIN t USING (event_type)""".stripMargin,
    "q_scd2_asof" ->
      """WITH c AS (
        |  SELECT CAST(o_custkey AS BIGINT) AS k,
        |    epoch_ms(o_orderdate) // 86400000 AS ts,
        |    o_orderstatus AS status, CAST(o_orderkey AS BIGINT) AS tie
        |  FROM orders),
        |o AS (
        |  SELECT k, ts, status, tie,
        |    row_number() OVER w AS rn, lag(status) OVER w AS prev
        |  FROM c WINDOW w AS (PARTITION BY k ORDER BY ts, tie)),
        |isl AS (
        |  SELECT k, ts, status, tie FROM o
        |  WHERE rn = 1 OR prev IS DISTINCT FROM status),
        |v AS (
        |  SELECT k, status, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY k ORDER BY ts, tie) AS valid_to
        |  FROM isl)
        |SELECT k AS o_custkey, status, valid_from,
        |  COALESCE(valid_to, -1) AS valid_to
        |FROM v
        |WHERE valid_from <= 9500 AND (valid_to IS NULL OR valid_to > 9500)""".stripMargin,
    "q_holt" ->
      """WITH RECURSIVE pd AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |o AS (
        |  SELECT user_id, day, v,
        |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
        |  FROM pd),
        |r AS (
        |  SELECT user_id, rn, day, v, v * 1000000 AS l, CAST(0 AS BIGINT) AS b
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.user_id, o.rn, o.day, o.v,
        |    (3 * o.v * 1000000 + 7 * (r.l + r.b)) // 10,
        |    (((3 * o.v * 1000000 + 7 * (r.l + r.b)) // 10 - r.l) + 4 * r.b) // 5
        |  FROM o JOIN r ON o.user_id = r.user_id AND o.rn = r.rn + 1)
        |SELECT user_id, day, v, CAST(l AS BIGINT) AS level_fp,
        |  CAST(b AS BIGINT) AS trend_fp, CAST(l + b AS BIGINT) AS forecast_fp
        |FROM r""".stripMargin,
    "q_sssp" ->
      """WITH e0 AS (
        |  SELECT CAST(o_custkey AS BIGINT) AS src,
        |    CAST(l_suppkey + 10000000 AS BIGINT) AS dst,
        |    epoch_ms(l_shipdate) // 86400000 - epoch_ms(o_orderdate) // 86400000 AS w
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |e AS (
        |  SELECT src, dst, MIN(w) AS w FROM (
        |    SELECT src, dst, w FROM e0
        |    UNION ALL SELECT dst, src, w FROM e0) GROUP BY 1, 2),
        |d0 AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS id, CAST(0 AS BIGINT) AS d
        |  FROM customer WHERE c_custkey < 5),
        |d1 AS (SELECT id, MIN(d) AS d FROM (
        |  SELECT id, d FROM d0
        |  UNION ALL SELECT e.dst, d0.d + e.w FROM d0 JOIN e ON d0.id = e.src)
        |  GROUP BY 1),
        |d2 AS (SELECT id, MIN(d) AS d FROM (
        |  SELECT id, d FROM d1
        |  UNION ALL SELECT e.dst, d1.d + e.w FROM d1 JOIN e ON d1.id = e.src)
        |  GROUP BY 1),
        |d3 AS (SELECT id, MIN(d) AS d FROM (
        |  SELECT id, d FROM d2
        |  UNION ALL SELECT e.dst, d2.d + e.w FROM d2 JOIN e ON d2.id = e.src)
        |  GROUP BY 1),
        |d4 AS (SELECT id, MIN(d) AS d FROM (
        |  SELECT id, d FROM d3
        |  UNION ALL SELECT e.dst, d3.d + e.w FROM d3 JOIN e ON d3.id = e.src)
        |  GROUP BY 1)
        |SELECT id, d FROM d4""".stripMargin,
    "q_path_trigrams" ->
      """WITH s AS (
        |  SELECT user_id, event_type AS t0,
        |    lead(event_type, 1) OVER w AS t1,
        |    lead(event_type, 2) OVER w AS t2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id))
        |SELECT t0 || '>' || t1 || '>' || t2 AS path, COUNT(*) AS n
        |FROM s WHERE t2 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "q_market_basket" ->
      """WITH bi AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        |tot AS (SELECT COUNT(DISTINCT b) AS n_total FROM bi),
        |freq AS (SELECT i, COUNT(*) AS n_i FROM bi GROUP BY 1),
        |pairs AS (
        |  SELECT l.i AS part_a, r.i AS part_b, COUNT(*) AS n_ab
        |  FROM bi l JOIN bi r ON l.b = r.b AND l.i < r.i
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
        |SELECT part_a, part_b, CAST(n_ab AS BIGINT) AS n_ab,
        |  CAST(fa.n_i AS BIGINT) AS n_a, CAST(fb.n_i AS BIGINT) AS n_b,
        |  round(n_ab * n_total / CAST(fa.n_i * fb.n_i AS DOUBLE), 6) AS lift
        |FROM pairs
        |JOIN freq fa ON fa.i = part_a
        |JOIN freq fb ON fb.i = part_b, tot""".stripMargin,
    "q_jaro_winkler" ->
      """SELECT a.p_partkey AS pk_a, b.p_partkey AS pk_b,
        |  round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS sim
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 6) >= 0.75""".stripMargin,
    "q_seq_match" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
        |    CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
        |      WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
        |      WHEN 'error' THEN 'e' END AS c
        |  FROM events),
        |s AS (
        |  SELECT user_id, string_agg(c, '' ORDER BY ts_ms, event_id) AS seq
        |  FROM e WHERE c IS NOT NULL GROUP BY 1)
        |SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
        |  CAST(len(regexp_extract_all(seq, 'v[ce]*p')) AS BIGINT) AS n_match,
        |  CAST(CASE WHEN len(regexp_extract_all(seq, 'v[ce]*p')) > 0
        |    THEN strpos(seq, regexp_extract(seq, 'v[ce]*p'))
        |    ELSE 0 END AS BIGINT) AS first_pos
        |FROM s""".stripMargin,
    "q_attribution" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type
        |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
        |w AS (
        |  SELECT user_id, ts_ms, event_type,
        |    last_value(CASE WHEN event_type IN ('view', 'click')
        |      THEN struct_pack(ts := ts_ms, ch := event_type) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
        |  FROM e)
        |SELECT CASE WHEN lt IS NOT NULL AND ts_ms - lt.ts <= 21600000
        |    THEN lt.ch ELSE '(none)' END AS channel,
        |  CAST(COUNT(*) AS BIGINT) AS n_conversions,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM w WHERE event_type = 'purchase' GROUP BY 1""".stripMargin,
    "q_listagg" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  string_agg(o_orderpriority, ',' ORDER BY o_orderkey) AS priorities
        |FROM orders WHERE o_custkey % 50 = 0
        |GROUP BY o_custkey""".stripMargin,
    "q_percentile" ->
      """SELECT event_type,
        |  round(quantile_cont(cents, 0.5), 6) AS p50,
        |  round(quantile_cont(cents, 0.9), 6) AS p90,
        |  round(quantile_cont(cents, 0.99), 6) AS p99
        |FROM (SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents FROM events)
        |GROUP BY event_type""".stripMargin,
    "q_ab_test" ->
      // Welch t assembled from exact BIGINT moments; the double expression
      // mirrors Normalize.welchTTest term-for-term (variance =
      // (Σx² − Σx·mean) / (n−1) in DOUBLE — the integer n·Σx² form
      // overflows long at scale and DuckDB would widen to HUGEINT).
      """WITH m AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN c ELSE 0 END) AS BIGINT) AS s_a,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN c * c ELSE 0 END) AS BIGINT) AS sq_a,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 0 ELSE c END) AS BIGINT) AS s_b,
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 0 ELSE c * c END) AS BIGINT) AS sq_b
        |  FROM (SELECT event_type, user_id,
        |          CAST(ROUND(value * 100, 0) AS BIGINT) AS c FROM events)
        |  GROUP BY 1)
        |SELECT event_type, n_a, n_b,
        |  round(CASE WHEN n_a > 0 THEN CAST(s_a AS DOUBLE) / n_a END, 6) AS mean_a,
        |  round(CASE WHEN n_b > 0 THEN CAST(s_b AS DOUBLE) / n_b END, 6) AS mean_b,
        |  round(CASE WHEN n_a > 1 AND n_b > 1 AND
        |      (CAST(sq_a AS DOUBLE) - CAST(s_a AS DOUBLE) * (CAST(s_a AS DOUBLE) / n_a)) / CAST(n_a - 1 AS DOUBLE) / n_a +
        |      (CAST(sq_b AS DOUBLE) - CAST(s_b AS DOUBLE) * (CAST(s_b AS DOUBLE) / n_b)) / CAST(n_b - 1 AS DOUBLE) / n_b > 0
        |    THEN (CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b) /
        |      sqrt((CAST(sq_a AS DOUBLE) - CAST(s_a AS DOUBLE) * (CAST(s_a AS DOUBLE) / n_a)) / CAST(n_a - 1 AS DOUBLE) / n_a +
        |           (CAST(sq_b AS DOUBLE) - CAST(s_b AS DOUBLE) * (CAST(s_b AS DOUBLE) / n_b)) / CAST(n_b - 1 AS DOUBLE) / n_b)
        |  END, 6) AS t
        |FROM m""".stripMargin,
    // q_stream_psi_drift computes the same counts from a streamed current
    // sample and composes through the identical PSI assembly — one
    // formula, one shared oracle (psiDriftOracle val)
    "q_psi_drift" -> psiDriftOracle,
    "q_stream_psi_drift" -> psiDriftOracle,
    "q_keyword_spot" ->
      // whole-token semantics: list_filter over the split tokens, never a
      // substring scan
      """SELECT doc_id, needle, CAST(n_hits AS BIGINT) AS n_hits FROM (
        |  SELECT doc_id, needle,
        |    len(list_filter(string_split(text, ' '), t -> t = needle)) AS n_hits
        |  FROM documents,
        |    (SELECT unnest(['join', 'vector', 'spark', 'data']) AS needle))
        |WHERE n_hits > 0""".stripMargin,
    "q_stream_keyword_alert" ->
      """SELECT needle, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_hits) AS BIGINT) AS total_hits FROM (
        |  SELECT doc_id, needle,
        |    len(list_filter(string_split(text, ' '), t -> t = needle)) AS n_hits
        |  FROM documents,
        |    (SELECT unnest(['join', 'vector', 'spark', 'data']) AS needle))
        |WHERE n_hits > 0 GROUP BY needle""".stripMargin,
    "q_train_shuffle" ->
      """SELECT doc_id, md5('shuf:' || CAST(doc_id AS VARCHAR)) AS h,
        |  CAST(ROW_NUMBER() OVER (
        |    ORDER BY md5('shuf:' || CAST(doc_id AS VARCHAR)), doc_id)
        |    AS BIGINT) AS pos
        |FROM documents""".stripMargin,
    "q_pmi_collocations" ->
      // identical PMI expression tree; bigrams via 1-based comprehension
      """WITH tl AS (SELECT string_split(text, ' ') AS tl FROM documents),
        |uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cw
        |  FROM (SELECT unnest(tl) AS w FROM tl) GROUP BY 1),
        |bi0 AS (SELECT unnest([struct_pack(a := tl[i], b := tl[i + 1])
        |    FOR i IN range(1, len(tl))]) AS p FROM tl),
        |bi AS (SELECT p.a AS a, p.b AS b, CAST(COUNT(*) AS BIGINT) AS cab
        |  FROM bi0 GROUP BY 1, 2),
        |nu AS (SELECT CAST(SUM(cw) AS BIGINT) AS nu FROM uni),
        |nb AS (SELECT CAST(SUM(cab) AS BIGINT) AS nb FROM bi),
        |sc AS (SELECT a, b, cab,
        |    round(ln((CAST(cab AS DOUBLE) / nb) /
        |      ((CAST(ca.cw AS DOUBLE) / nu) * (CAST(cb.cw AS DOUBLE) / nu))), 6) AS pmi
        |  FROM bi JOIN uni ca ON ca.w = bi.a JOIN uni cb ON cb.w = bi.b, nu, nb
        |  WHERE cab >= 5)
        |SELECT a, b, cab, pmi, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, a, b) AS rn FROM sc)
        |WHERE rn <= 20""".stripMargin,
    "q_chi2_independence" ->
      // expected = row-marginal · col-marginal / total, mirrored
      // term-for-term (CAST(nr AS DOUBLE) * nc / n)
      """WITH ev AS (SELECT event_type,
        |    'arm_' || CAST(user_id % 2 AS VARCHAR) AS arm FROM events),
        |cells AS (SELECT event_type, arm, CAST(COUNT(*) AS BIGINT) AS obs
        |  FROM ev GROUP BY 1, 2),
        |r AS (SELECT event_type, CAST(SUM(obs) AS BIGINT) AS nr
        |  FROM cells GROUP BY 1),
        |c AS (SELECT arm, CAST(SUM(obs) AS BIGINT) AS nc FROM cells GROUP BY 1),
        |t AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells)
        |SELECT cells.event_type, cells.arm, obs,
        |  round(CAST(nr AS DOUBLE) * nc / n, 6) AS expected,
        |  round((CAST(obs AS DOUBLE) - CAST(nr AS DOUBLE) * nc / n) *
        |        (CAST(obs AS DOUBLE) - CAST(nr AS DOUBLE) * nc / n) /
        |        (CAST(nr AS DOUBLE) * nc / n), 6) AS chi2_contrib
        |FROM cells JOIN r ON r.event_type = cells.event_type
        |  JOIN c ON c.arm = cells.arm CROSS JOIN t""".stripMargin,
    "q_ks_users" ->
      // naive single-window cumsum is fine AS AN ORACLE; the engine's
      // distributed prefix sum must produce the identical D
      """WITH a AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS v
        |  FROM events WHERE user_id % 2 = 0),
        |b AS (SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS v
        |  FROM events WHERE user_id % 2 != 0),
        |per AS (SELECT v, CAST(SUM(ca) AS BIGINT) AS ca,
        |    CAST(SUM(cb) AS BIGINT) AS cb
        |  FROM (SELECT v, 1 AS ca, 0 AS cb FROM a
        |        UNION ALL SELECT v, 0, 1 FROM b) GROUP BY 1),
        |t AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
        |    CAST(SUM(cb) AS BIGINT) AS n_b FROM per),
        |c AS (SELECT
        |    CAST(SUM(ca) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cuma,
        |    CAST(SUM(cb) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumb
        |  FROM per)
        |SELECT n_a, n_b,
        |  round(MAX(abs(CAST(cuma AS DOUBLE) / n_a - CAST(cumb AS DOUBLE) / n_b)), 6) AS d
        |FROM c, t GROUP BY n_a, n_b""".stripMargin,
    "q_recursive_cte" ->
      // identical recursion in DuckDB; // is the integer-division twin of
      // Spark's div (both truncate; keys are positive)
      """WITH RECURSIVE r(c_custkey, depth, root) AS (
        |  SELECT c_custkey, CAST(0 AS BIGINT) AS depth, c_custkey AS root
        |  FROM customer WHERE c_custkey = 1
        |  UNION ALL
        |  SELECT c.c_custkey, CAST(r.depth + 1 AS BIGINT), r.root
        |  FROM customer c JOIN r ON (c.c_custkey // 2) = r.c_custkey
        |  WHERE c.c_custkey > 1)
        |SELECT c_custkey, CAST(depth AS BIGINT) AS depth, root FROM r""".stripMargin,
    "q_merge_upsert" ->
      """WITH o AS (SELECT o_orderkey,
        |    CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
        |    o_orderstatus FROM orders),
        |b AS (SELECT * FROM o WHERE o_orderkey % 11 != 0),
        |c AS (SELECT o_orderkey, CAST(cents + 1 AS BIGINT) AS cents,
        |    lower(o_orderstatus) AS o_orderstatus,
        |    o_orderkey % 17 = 0 AS del
        |  FROM o WHERE o_orderkey % 13 = 0),
        |m AS (SELECT COALESCE(b.o_orderkey, c.o_orderkey) AS o_orderkey,
        |    CASE WHEN c.o_orderkey IS NULL THEN 'keep'
        |         WHEN c.del AND b.o_orderkey IS NOT NULL THEN 'delete'
        |         WHEN c.del THEN 'noop'
        |         WHEN b.o_orderkey IS NULL THEN 'insert'
        |         ELSE 'update' END AS op,
        |    CASE WHEN c.o_orderkey IS NULL THEN b.cents
        |         WHEN c.del THEN NULL ELSE c.cents END AS cents,
        |    CASE WHEN c.o_orderkey IS NULL THEN b.o_orderstatus
        |         WHEN c.del THEN NULL ELSE c.o_orderstatus END AS o_orderstatus
        |  FROM b FULL OUTER JOIN c ON b.o_orderkey = c.o_orderkey)
        |SELECT o_orderkey, op, CAST(cents AS BIGINT) AS cents, o_orderstatus
        |FROM m WHERE op != 'noop'""".stripMargin,
    "q_skyline" ->
      // independent all-pairs NOT EXISTS formulation of the frontier
      """WITH p AS (SELECT cents, d, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |    SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
        |      epoch_ms(o_orderdate) // 86400000 AS d FROM orders)
        |  GROUP BY 1, 2)
        |SELECT cents, CAST(d AS BIGINT) AS d, n FROM p a
        |WHERE NOT EXISTS (SELECT 1 FROM p b
        |  WHERE b.cents <= a.cents AND b.d >= a.d
        |    AND (b.cents < a.cents OR b.d > a.d))""".stripMargin,
    "q_winsorize" ->
      """WITH c AS (
        |  SELECT event_id, event_type,
        |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        |  FROM events),
        |q AS (
        |  SELECT event_type, quantile_cont(cents, 0.1) AS lo,
        |    quantile_cont(cents, 0.9) AS hi
        |  FROM c GROUP BY 1)
        |SELECT event_id, c.event_type, cents,
        |  round(least(greatest(CAST(cents AS DOUBLE), lo), hi), 6) AS v_wins
        |FROM c JOIN q ON q.event_type = c.event_type""".stripMargin,
    "q_zscore_norm" ->
      // Population variance from exact BIGINT moments; the double
      // expression tree mirrors Normalize.zscore term-for-term so both
      // engines run the identical IEEE sequence.
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |m AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(n_tokens) AS BIGINT) AS s,
        |    CAST(SUM(n_tokens * n_tokens) AS BIGINT) AS sq
        |  FROM d GROUP BY 1)
        |SELECT doc_id, d.source, n_tokens,
        |  CASE WHEN CAST(sq AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n) > 0
        |    THEN round((CAST(n_tokens AS DOUBLE) - CAST(s AS DOUBLE) / n) /
        |      sqrt(CAST(sq AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)), 6)
        |  END AS z
        |FROM d JOIN m ON m.source = d.source""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) // 2500000 AS bucket,
        |  COUNT(*) AS n,
        |  CAST(MIN(ROUND(o_totalprice * 100, 0)) AS BIGINT) AS min_cents,
        |  CAST(MAX(ROUND(o_totalprice * 100, 0)) AS BIGINT) AS max_cents
        |FROM orders GROUP BY 1""".stripMargin,
    "q_hash_sample" ->
      """SELECT event_id, user_id, event_type, hb FROM (
        |  SELECT event_id, user_id, event_type,
        |    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS hb
        |  FROM events)
        |WHERE hb < 5""".stripMargin,
    "q_train_split" ->
      """SELECT CASE WHEN hb < 80 THEN 'train' WHEN hb < 90 THEN 'val' ELSE 'test' END AS split,
        |  event_type, COUNT(*) AS n
        |FROM (
        |  SELECT event_type,
        |    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS hb
        |  FROM events)
        |GROUP BY 1, 2""".stripMargin,
    "q_split_leakage_safe" ->
      // Same reachability closure as q_dedup_components, then the
      // q_train_split bucket replay on the component representative.
      s"""WITH RECURSIVE $minhashVerifiedCtes,
         |und AS (
         |  SELECT doc_a AS u, doc_b AS v FROM verified
         |  UNION SELECT doc_b, doc_a FROM verified),
         |reach(u, v) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM und)
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
         |comp AS (SELECT u AS doc_id, MIN(v) AS c FROM reach GROUP BY u)
         |SELECT doc_id, rep,
         |  CASE WHEN hb < 80 THEN 'train' WHEN hb < 90 THEN 'val' ELSE 'test' END AS split
         |FROM (
         |  SELECT d.doc_id,
         |    CAST(COALESCE(c.c, d.doc_id) AS BIGINT) AS rep,
         |    CAST('0x' || substr(md5(CAST(COALESCE(c.c, d.doc_id) AS VARCHAR)), 1, 15) AS BIGINT)
         |      % 100 AS hb
         |  FROM documents d LEFT JOIN comp c USING (doc_id))""".stripMargin,
    "q_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE CAST('0x' || substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 <
        |  CASE WHEN lang = 'en' THEN 60 WHEN lang = 'fr' THEN 30
        |       WHEN lang = 'es' THEN 15 ELSE 10 END""".stripMargin,
    "q_chunk_docs" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tl FROM documents),
        |i AS (SELECT doc_id, tl, unnest(range(0, len(tl), 50)) AS i FROM toks)
        |SELECT doc_id, CAST(i // 50 AS BIGINT) AS chunk_idx,
        |  array_to_string(tl[i+1:i+50], ' ') AS chunk_text,
        |  CAST(least(50, len(tl) - i) AS BIGINT) AS n_tokens
        |FROM i""".stripMargin,
    "q_edit_distance" ->
      """WITH d AS (SELECT doc_id, text FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
        |  round(CAST(levenshtein(a.text, b.text) AS DOUBLE)
        |    / greatest(length(a.text), length(b.text), 1), 6) AS edit_ratio
        |FROM d a JOIN d b ON b.doc_id = a.doc_id + 1""".stripMargin,
    "q_quality_score" ->
      s"""WITH $qualityCte
         |SELECT doc_id, lang, n_tokens, avg_token_len, stopword_ratio, symbol_ratio, verdict
         |FROM quality""".stripMargin,
    "q_train_pipeline" ->
      s"""WITH $qualityCte,
         |gated AS (SELECT d.doc_id, d.text FROM documents d
         |          JOIN quality q ON q.doc_id = d.doc_id AND q.verdict = 'ok'),
         |keep AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)),
         |ded AS (SELECT g.doc_id, g.text FROM gated g JOIN keep k ON k.doc_id = g.doc_id),
         |toks AS (SELECT doc_id, string_split(text, ' ') AS tl FROM ded),
         |i AS (SELECT doc_id, tl, unnest(range(0, len(tl), 50)) AS i FROM toks),
         |ch AS (SELECT doc_id,
         |         CAST(least(50, len(tl) - i) AS BIGINT) AS n_tokens,
         |         doc_id || '_' || CAST(i // 50 AS VARCHAR) AS chunk_id
         |       FROM i),
         |sp AS (SELECT doc_id, n_tokens,
         |         CASE WHEN hb < 80 THEN 'train' WHEN hb < 90 THEN 'val' ELSE 'test' END AS split
         |       FROM (SELECT *,
         |               CAST('0x' || substr(md5(chunk_id), 1, 15) AS BIGINT) % 100 AS hb
         |             FROM ch))
         |SELECT split, COUNT(*) AS n_chunks, COUNT(DISTINCT doc_id) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
         |FROM sp GROUP BY split""".stripMargin,
    "q_curation_pipeline" ->
      s"""WITH $qualityCte,
         |$shingleCte,
         |ex AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
         |st AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df FROM ex GROUP BY 1),
         |bp AS (SELECT e.doc_id,
         |    CAST(count(*) AS BIGINT) AS n_shingles,
         |    CAST(sum(CASE WHEN st.df >= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_common
         |  FROM ex e JOIN st ON st.shingle = e.shingle GROUP BY 1),
         |gated AS (SELECT d.doc_id, d.source, d.text FROM documents d
         |  JOIN quality q ON q.doc_id = d.doc_id AND q.verdict = 'ok'
         |  LEFT JOIN bp ON bp.doc_id = d.doc_id
         |  WHERE bp.doc_id IS NULL OR 5 * bp.n_common <= 3 * bp.n_shingles),
         |w AS (SELECT source, CAST(ascii(substr(source, -1)) % 3 + 1 AS BIGINT) AS wt
         |  FROM (SELECT DISTINCT source FROM gated)),
         |tot AS (SELECT CAST(sum(wt) AS BIGINT) AS denom FROM w),
         |bb AS (SELECT source, CAST(8000 * wt // denom AS BIGINT) AS budget FROM w, tot),
         |dd AS (SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
         |  FROM gated),
         |cc AS (SELECT doc_id, source, n_tokens,
         |    sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS cum_before
         |  FROM dd)
         |SELECT cc.source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(cc.n_tokens) AS BIGINT) AS n_tokens
         |FROM cc JOIN bb ON bb.source = cc.source
         |WHERE cc.cum_before < bb.budget
         |GROUP BY cc.source""".stripMargin,
    "q_unpivot" ->
      """SELECT metric, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents FROM (
        |  SELECT 'quantity' AS metric, CAST(ROUND(l_quantity * 100, 0) AS BIGINT) AS cents FROM lineitem
        |  UNION ALL SELECT 'extendedprice', CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'discount', CAST(ROUND(l_discount * 100, 0) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'tax', CAST(ROUND(l_tax * 100, 0) AS BIGINT) FROM lineitem)
        |GROUP BY metric""".stripMargin,
    "q_window_range" ->
      """SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) // 86400000 AS day,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) OVER (
        |    PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate) // 86400000
        |    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing_cents
        |FROM orders""".stripMargin,
    "q_global_sort" ->
      """SELECT o_orderkey, epoch_ms(o_orderdate) AS odate_ms, o_totalprice
        |FROM orders ORDER BY odate_ms, o_orderkey""".stripMargin,
    "q_date_arith" ->
      // DuckDB dayofweek is 0=Sunday..6; Spark is 1=Sunday..7 -> +1
      """SELECT epoch_ms(date_trunc('month', o_orderdate)) AS month_ms,
        |  COUNT(*) AS n,
        |  CAST(SUM(last_day(CAST(o_orderdate AS DATE)) - CAST(o_orderdate AS DATE)) AS BIGINT) AS sum_days_to_eom,
        |  CAST(SUM(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) - DATE '1970-01-01') AS BIGINT) AS sum_plus3m_day,
        |  CAST(SUM(dayofweek(CAST(o_orderdate AS DATE)) + 1) AS BIGINT) AS sum_dow
        |FROM orders GROUP BY 1""".stripMargin,
    "q_multi_distinct" ->
      """SELECT epoch_ms(ts) // 86400000 AS day,
        |  COUNT(DISTINCT user_id) AS uniq_users,
        |  COUNT(DISTINCT event_type) AS uniq_types,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q_session_window_dynamic" ->
      // running-max-of-window-ends replay (see the query comment for why
      // the max over ALL previous ends is the correct merge bound)
      """SELECT user_id, MIN(ms) AS start_ms, MAX(ms + gap) AS end_ms,
        |  COUNT(*) AS n_events
        |FROM (
        |  SELECT user_id, ms, gap,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |                      ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM (
        |    SELECT event_id, user_id, ms, gap,
        |      CASE WHEN runend IS NULL OR ms >= runend THEN 1 ELSE 0 END AS is_new
        |    FROM (
        |      SELECT event_id, user_id, epoch_ms(ts) AS ms,
        |        CASE WHEN event_type = 'purchase' THEN 3600000 ELSE 900000 END AS gap,
        |        MAX(epoch_ms(ts) + CASE WHEN event_type = 'purchase' THEN 3600000 ELSE 900000 END)
        |          OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runend
        |      FROM events)))
        |GROUP BY user_id, sess""".stripMargin,
    "q_session_window_builtin" ->
      // mirrors session_window's merge rule: new session iff the millis gap
      // to the previous event is >= 30 min; end = last event + gap
      """SELECT user_id, MIN(ms) AS start_ms, MAX(ms) + 1800000 AS end_ms,
        |  COUNT(*) AS n_events
        |FROM (
        |  SELECT user_id, ms,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |                      ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM (
        |    SELECT event_id, user_id, epoch_ms(ts) AS ms,
        |      CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
        |                OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w >= 1800000
        |           THEN 1 ELSE 0 END AS is_new
        |    FROM events
        |    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)))
        |GROUP BY user_id, sess""".stripMargin,
    "q_stats_agg" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  round(stddev_samp(l_quantity), 6) AS sd_qty,
        |  round(var_samp(l_quantity), 6) AS var_qty,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_window_ntile" ->
      """SELECT o_orderpriority, o_orderkey,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) DESC, o_orderkey)""".stripMargin,
    "q_streaming_update" ->
      "SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id",
    "q_stream_foreach_merge" ->
      "SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id",
    "q_streaming_window" ->
      """SELECT (epoch_ms(ts) // 21600000) * 21600000 AS win_start_ms, event_type,
        |  COUNT(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_streaming_sliding" ->
      """SELECT ws AS win_start_ms, event_type, COUNT(*) AS n FROM (
        |  SELECT event_type,
        |    unnest([(epoch_ms(ts) // 10800000 - 1) * 10800000,
        |            (epoch_ms(ts) // 10800000) * 10800000]) AS ws
        |  FROM events)
        |GROUP BY ws, event_type""".stripMargin,
    "q_dedup_stream" ->
      "SELECT DISTINCT user_id FROM events",
    "q_stream_dedup_watermark" ->
      // single-batch source: every key emitted exactly once (no watermark
      // eviction + re-emission can occur inside one microbatch)
      "SELECT DISTINCT user_id, event_type FROM events",
    "q_stream_static_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q_stream_stream_join" ->
      """SELECT p.event_id AS p_id, c.event_id AS c_id,
        |  epoch_ms(p.ts) AS p_ts_ms, epoch_ms(c.ts) AS c_ts_ms
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts""".stripMargin,
    "q_stream_quality_gate" ->
      s"""WITH $qualityCte
         |SELECT verdict, COUNT(*) AS n FROM quality GROUP BY verdict""".stripMargin,
    "q_stream_dedup_docs" ->
      "SELECT DISTINCT md5(text) AS text_md5 FROM documents",
    "q_dedup_normalized" ->
      // same spliced variants; normalization mirrored in RE2 ('g' flag =
      // Java's replace-all default); [^a-z0-9 ] / ' +' stay inside the
      // Java-RE2-identical regex subset (no \s/\w shorthands)
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT -(doc_id + 1), '  ' || upper(text) || '  !!'
        |  FROM documents WHERE doc_id % 7 = 0),
        |norm AS (SELECT doc_id,
        |    md5(trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_md5
        |  FROM all_docs)
        |SELECT MIN(doc_id) AS doc_id, norm_md5, CAST(COUNT(*) AS BIGINT) AS n_group
        |FROM norm GROUP BY norm_md5""".stripMargin,
    "q_bigram_logprob" ->
      // bigram (w1,w2) = adjacent 1-based list slots; corpus counts as
      // windows over the per-doc counts — same shape as the Spark plan
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS tl FROM documents),
        |b AS (SELECT doc_id, tl[i] AS w1, tl[i+1] AS w2
        |  FROM (SELECT doc_id, tl, unnest(range(1, len(tl))) AS i FROM toks)),
        |c AS (SELECT doc_id, w1, w2, COUNT(*) AS c FROM b GROUP BY doc_id, w1, w2),
        |f AS (SELECT doc_id, c,
        |    SUM(c) OVER (PARTITION BY w1, w2) AS c12,
        |    SUM(c) OVER (PARTITION BY w1) AS c1
        |  FROM c)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
        |  round(-SUM(c * log2(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))) / SUM(c), 6)
        |    AS avg_neg_logprob
        |FROM f GROUP BY doc_id""".stripMargin,
    "q_zipf" ->
      // 2^20 fixed-point least squares (integer-exact sums, HUGEINT in
      // DuckDB ≡ decimal(38) in Spark); only the final division floats
      """WITH f AS (SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        |    SELECT lang, unnest(string_split(text,' ')) AS token FROM documents)
        |  GROUP BY lang, token),
        |r AS (SELECT lang, freq,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY freq DESC, token ASC) AS rank
        |  FROM f),
        |q AS (SELECT lang,
        |    CAST(round(log2(CAST(rank AS DOUBLE)) * 1048576) AS BIGINT) AS x,
        |    CAST(round(log2(CAST(freq AS DOUBLE)) * 1048576) AS BIGINT) AS y
        |  FROM r),
        |s AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_terms,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy, SUM(x*x) AS sxx
        |  FROM q GROUP BY lang)
        |SELECT lang, n_terms,
        |  round(CAST(n_terms*sxy - sx*sy AS DOUBLE)
        |    / NULLIF(CAST(n_terms*sxx - sx*sx AS DOUBLE), 0), 6) AS zipf_slope
        |FROM s""".stripMargin,
    "q_mixture_sample" ->
      // CAST targets to DOUBLE (bare 0.002 is DECIMAL in DuckDB — different
      // rounding than Spark's double lit); op order (t*n)/c then *1e6 then
      // floor matches Sampling.mixtureSample bit-for-bit
      """WITH c AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS c FROM documents GROUP BY source),
        |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
        |r AS (SELECT source,
        |    CAST(floor(least(1.0, t * n / c) * 1e6) AS BIGINT) AS keep_ppm
        |  FROM (SELECT source, c,
        |      CASE source WHEN 'src0' THEN CAST(0.002 AS DOUBLE)
        |                  WHEN 'src1' THEN CAST(0.01 AS DOUBLE)
        |                  WHEN 'src2' THEN CAST(0.02 AS DOUBLE)
        |                  WHEN 'src3' THEN CAST(0.05 AS DOUBLE)
        |                  WHEN 'src4' THEN CAST(0.08 AS DOUBLE)
        |                  ELSE CAST(0.0 AS DOUBLE) END AS t
        |    FROM c) CROSS JOIN n)
        |SELECT d.doc_id, d.source, r.keep_ppm
        |FROM documents d JOIN r USING (source)
        |WHERE CAST('0x' || substr(md5(d.source || ':' || CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |  % 1000000 < r.keep_ppm""".stripMargin,
    "q_histogram_equalize" ->
      """WITH b AS (SELECT doc_id, n_chars // 100 AS len_bin FROM documents),
        |c AS (SELECT len_bin, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1),
        |m AS (SELECT min(c) AS mn FROM c),
        |r AS (SELECT len_bin, CAST(mn * 1000000 // c AS BIGINT) AS keep_ppm FROM c, m)
        |SELECT b.doc_id, b.len_bin, r.keep_ppm
        |FROM b JOIN r USING (len_bin)
        |WHERE CAST('0x' || substr(md5(CAST(b.len_bin AS VARCHAR) || ':' || CAST(b.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |  % 1000000 < r.keep_ppm""".stripMargin,
    "q_stream_budget_admit" ->
      // Closed-form batching-invariant admission rule: same budget CTEs as
      // q_token_budget_mix, cumsum ordered by ARRIVAL (doc_id) instead of
      // the md5 admission hash.
      """WITH w AS (SELECT source, CAST(ascii(substr(source, -1)) % 3 + 1 AS BIGINT) AS wt
        |  FROM (SELECT DISTINCT source FROM documents)),
        |tot AS (SELECT CAST(sum(wt) AS BIGINT) AS denom FROM w),
        |b AS (SELECT source, CAST(10000 * wt // denom AS BIGINT) AS budget FROM w, tot),
        |d AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS cum_before
        |  FROM d)
        |SELECT c.doc_id, c.source, c.n_tokens, c.cum_before
        |FROM c JOIN b ON b.source = c.source
        |WHERE c.cum_before < b.budget""".stripMargin,
    "q_budget_select" ->
      // Same CTEs as q_token_budget_mix with the cumsum ordered by
      // (-n_chars, doc_id) — longest-first greedy fill.
      """WITH w AS (SELECT source, CAST(ascii(substr(source, -1)) % 3 + 1 AS BIGINT) AS wt
        |  FROM (SELECT DISTINCT source FROM documents)),
        |tot AS (SELECT CAST(sum(wt) AS BIGINT) AS denom FROM w),
        |b AS (SELECT source, CAST(10000 * wt // denom AS BIGINT) AS budget FROM w, tot),
        |d AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, -n_chars AS h
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS cum_before
        |  FROM d)
        |SELECT c.doc_id, c.source, c.n_tokens, c.cum_before
        |FROM c JOIN b ON b.source = c.source
        |WHERE c.cum_before < b.budget""".stripMargin,
    "q_token_budget_mix" ->
      // The oracle uses the NAIVE per-source window cumsum — an independent
      // formulation of the same prefix sum the distributed form computes;
      // `//` keeps the budget floor in integer math.
      """WITH w AS (SELECT source, CAST(ascii(substr(source, -1)) % 3 + 1 AS BIGINT) AS wt
        |  FROM (SELECT DISTINCT source FROM documents)),
        |tot AS (SELECT CAST(sum(wt) AS BIGINT) AS denom FROM w),
        |b AS (SELECT source, CAST(10000 * wt // denom AS BIGINT) AS budget FROM w, tot),
        |d AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS cum_before
        |  FROM d)
        |SELECT c.doc_id, c.source, c.n_tokens, c.cum_before
        |FROM c JOIN b ON b.source = c.source
        |WHERE c.cum_before < b.budget""".stripMargin,
    "q_dedup_keep_best" ->
      // same reachability closure as q_dedup_components; winner per
      // component by (n_chars DESC, doc_id ASC); singletons keep themselves
      // via the COALESCE'd left join
      s"""WITH RECURSIVE $minhashVerifiedCtes,
         |und AS (
         |  SELECT doc_a AS u, doc_b AS v FROM verified
         |  UNION SELECT doc_b, doc_a FROM verified),
         |reach(u, v) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM und)
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
         |comp AS (SELECT u AS doc_id, MIN(v) AS component FROM reach GROUP BY u),
         |m AS (SELECT d.doc_id, d.lang, d.source, d.n_chars,
         |    COALESCE(c.component, d.doc_id) AS comp
         |  FROM documents d LEFT JOIN comp c USING (doc_id)),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY comp
         |    ORDER BY n_chars DESC, doc_id ASC) AS rn FROM m)
         |SELECT doc_id, lang, source FROM r WHERE rn = 1""".stripMargin,
    "q_embedding_centroids" ->
      // 2^24 fixed-point mean: float->double is exact, the scaled products
      // are exact integers (24-bit mantissas, |x| < 2^15), so the integer
      // SUM is order-independent — both engines compute identical doubles
      """WITH ex AS (SELECT label, CAST(i - 1 AS BIGINT) AS dim,
        |    CAST(round(CAST(e[i] AS DOUBLE) * 16777216) AS BIGINT) AS fx
        |  FROM (SELECT label, embedding AS e,
        |          unnest(range(1, len(embedding)+1)) AS i
        |        FROM embeddings))
        |SELECT label, dim, CAST(COUNT(*) AS BIGINT) AS n,
        |  round(CAST(SUM(fx) AS DOUBLE) / COUNT(*) / 16777216, 6) AS centroid
        |FROM ex GROUP BY label, dim""".stripMargin,
    "q_kmeans_step" ->
      // Replays the Lloyd step: lowest-id seeds, rounded-cosine argmax
      // assignment (cell-id tie-break — the q_similarity_ivf pattern),
      // then the same 2^24 fixed-point mean as q_embedding_centroids.
      """WITH n AS (SELECT vec_id, embedding,
        |  sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
        |FROM embeddings),
        |cent AS (SELECT vec_id AS cell, embedding AS cvec, nrm AS cnrm
        |  FROM n ORDER BY vec_id LIMIT 8),
        |a AS (SELECT vec_id, embedding, cell FROM (
        |    SELECT q.vec_id, q.embedding, c.cell,
        |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |        ORDER BY round(list_sum([CAST(q.embedding[i] AS DOUBLE)*CAST(c.cvec[i] AS DOUBLE)
        |  FOR i IN range(1, len(q.embedding)+1)]) / (q.nrm * c.cnrm), 6) DESC, c.cell) AS r
        |    FROM n q CROSS JOIN cent c)
        |  WHERE r = 1),
        |ex AS (SELECT cell, CAST(i - 1 AS BIGINT) AS dim,
        |    CAST(round(CAST(e[i] AS DOUBLE) * 16777216) AS BIGINT) AS fx
        |  FROM (SELECT cell, embedding AS e,
        |          unnest(range(1, len(embedding)+1)) AS i
        |        FROM a))
        |SELECT cell, dim, CAST(COUNT(*) AS BIGINT) AS n,
        |  round(CAST(SUM(fx) AS DOUBLE) / COUNT(*) / 16777216, 6) AS centroid
        |FROM ex GROUP BY cell, dim""".stripMargin,
    "q_cdc_chunk" ->
      // window hash = md5-prefix-60 of the 4-token window ending at pos
      // (1-based slice tl[pos-2:pos+1]); boundary lagged 1 then running-sum
      // -> chunk index, exactly the Spark plan's window chain
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS tl FROM documents),
        |p AS (SELECT doc_id, tl, unnest(range(0, len(tl))) AS pos FROM toks),
        |b AS (SELECT doc_id, pos, tl[pos+1] AS token,
        |    CASE WHEN pos >= 3 AND pos < len(tl) - 1 AND
        |      CAST('0x' || substr(md5(array_to_string(tl[pos-2:pos+1], ' ')), 1, 15) AS BIGINT)
        |        % 16 = 0
        |    THEN 1 ELSE 0 END AS boundary
        |  FROM p),
        |l AS (SELECT doc_id, pos, token,
        |    COALESCE(LAG(boundary) OVER (PARTITION BY doc_id ORDER BY pos), 0) AS lb
        |  FROM b),
        |c AS (SELECT doc_id, pos, token,
        |    SUM(lb) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS chunk_idx
        |  FROM l)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(MIN(pos) AS BIGINT) AS start_tok, CAST(MAX(pos) + 1 AS BIGINT) AS end_tok,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  string_agg(token, ' ' ORDER BY pos) AS chunk_text,
        |  md5(string_agg(token, ' ' ORDER BY pos)) AS chunk_md5
        |FROM c GROUP BY doc_id, chunk_idx""".stripMargin,
    "q_bloom_join" ->
      // the bloom pass is a pure prefilter (false positives removed by the
      // semi join) -> the oracle is the plain IN-subquery semi join
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000.0)""".stripMargin,
    "q_semdedup" ->
      // same deterministic cell assignment as the IVF oracle; drop any
      // vector with a lower-id in-cell neighbor at rounded cosine >= 0.35
      s"""WITH $normCte,
         |cent AS (SELECT vec_id AS cell, embedding, nrm FROM n ORDER BY vec_id LIMIT 16),
         |assign AS (SELECT vec_id, embedding, nrm, cell FROM (
         |    SELECT q.vec_id, q.embedding, q.nrm, c.cell,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY round($cosineSqlExpr, 6) DESC, c.cell) AS r
         |    FROM n q CROSS JOIN cent c)
         |  WHERE r = 1),
         |dropped AS (SELECT DISTINCT b.vec_id
         |  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE round(${cosineSqlExprAs("a", "b")}, 6) >= 0.35)
         |SELECT vec_id, cell FROM assign
         |WHERE vec_id NOT IN (SELECT vec_id FROM dropped)""".stripMargin,
    "q_linear_classifier" ->
      // portable 60-bit md5 token hash -> 1024 feature buckets -> exact
      // int64 Knuth-multiplicative per-bucket weight in [-1, 1)
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |w AS (SELECT doc_id,
        |    (CAST('0x' || substr(md5(token), 1, 15) AS BIGINT) % 1024)
        |      * 2654435761 % 1000003 / 1000003.0 * 2.0 - 1.0 AS w
        |  FROM t)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  round(AVG(w), 6) AS score,
        |  CASE WHEN round(AVG(w), 6) >= 0 THEN 'keep' ELSE 'drop' END AS label
        |FROM w GROUP BY doc_id""".stripMargin,
    "q_nb_classifier" ->
      // independent replay of the closed-form fit: Laplace-smoothed class
      // log-likelihood ratios from (doc,token) counts + log prior odds;
      // prediction thresholds on the ROUNDED log-odds (tie-stable)
      """WITH base AS (
        |  SELECT doc_id, CAST(lang = 'en' AS INT) AS y, text FROM documents),
        |tok AS (SELECT doc_id, y, unnest(string_split(text, ' ')) AS token FROM base),
        |c AS (SELECT doc_id, y, token, CAST(COUNT(*) AS BIGINT) AS c
        |      FROM tok GROUP BY doc_id, y, token),
        |f AS (SELECT *,
        |    CAST(SUM(CASE WHEN y = 1 THEN c ELSE 0 END) OVER (PARTITION BY token) AS DOUBLE) AS f1,
        |    CAST(SUM(CASE WHEN y = 0 THEN c ELSE 0 END) OVER (PARTITION BY token) AS DOUBLE) AS f0
        |  FROM c),
        |s AS (SELECT
        |    CAST(SUM(CASE WHEN y = 1 THEN c ELSE 0 END) AS DOUBLE) AS t1,
        |    CAST(SUM(CASE WHEN y = 0 THEN c ELSE 0 END) AS DOUBLE) AS t0,
        |    CAST(COUNT(DISTINCT token) AS DOUBLE) AS v FROM c),
        |p AS (SELECT CAST(SUM(y) AS DOUBLE) AS n1, CAST(COUNT(*) AS DOUBLE) AS n FROM base),
        |sc AS (SELECT doc_id, MAX(y) AS label, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    round(SUM(CAST(c AS DOUBLE) *
        |        (ln((f1 + 1) / (t1 + v)) - ln((f0 + 1) / (t0 + v)))) +
        |      MAX(ln(n1 / (n - n1))), 6) AS log_odds
        |  FROM f CROSS JOIN s CROSS JOIN p GROUP BY doc_id)
        |SELECT doc_id, label, n_tokens, log_odds,
        |  CAST(log_odds > 0 AS INT) AS pred,
        |  CAST((log_odds > 0) = (label = 1) AS INT) AS correct
        |FROM sc""".stripMargin,
    "q_url_normalize" ->
      // reconstructs the expected canonical URL from the event columns
      // directly (host lowercased, www./port/trackers/fragment/trailing
      // slash gone, surviving params sorted: a=1 < b=N)
      """SELECT event_id,
        |  'host' || CAST(user_id % 20 AS VARCHAR) || '.example.com/' || event_type ||
        |  '/' || CAST(event_id % 50 AS VARCHAR) ||
        |  '?a=1&b=' || CAST(event_id % 3 AS VARCHAR) AS url_norm
        |FROM events""".stripMargin,
    "q_csv_source" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
        |  round(SUM(c_acctbal), 2) AS bal
        |FROM customer GROUP BY c_mktsegment""".stripMargin,
    "q_orc_source" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  round(SUM(value), 2) AS sum_value, epoch_ms(MAX(ts)) AS max_ts_ms
        |FROM events GROUP BY event_type""".stripMargin,
    "q_stream_lsh_dedup" ->
      // admitted <=> no band key shared with a lower-id doc; docs without
      // shingles (no bands) always admitted. Same sig/band family as the
      // minhash oracle.
      s"""WITH $shingleCte,
         |sig AS (SELECT doc_id, sh,
         |  [list_min(list_transform(sh, t ->
         |     (((1103515245*(i+1)+12345) % 2147483647)
         |        * (CAST('0x'||substr(md5(t),1,15) AS BIGINT) % 1073741824)
         |      + ((1103515245*(i+17)+12345) % 2147483647)) % 2147483647))
         |   FOR i IN range(0,16)] AS sg
         |FROM sh WHERE len(sh) > 0),
         |bandkeys AS (SELECT doc_id, unnest(
         |  [CAST(sg[j*4+1] AS VARCHAR)||'_'||CAST(sg[j*4+2] AS VARCHAR)||'_'||
         |   CAST(sg[j*4+3] AS VARCHAR)||'_'||CAST(sg[j*4+4] AS VARCHAR) FOR j IN range(0,4)]) AS bk
         |FROM sig),
         |m AS (SELECT bk, min(doc_id) AS min_id FROM bandkeys GROUP BY bk),
         |dropped AS (SELECT DISTINCT b.doc_id
         |  FROM bandkeys b JOIN m USING (bk) WHERE b.doc_id > m.min_id)
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT doc_id FROM dropped)""".stripMargin,
    "q_stream_interval_left_join" ->
      // matched pairs = the plain interval join; null-extended rows only
      // for purchases whose join window provably closed under the final
      // global watermark = min(max p_ts, max c_ts) - 60 s
      """WITH p AS (SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts
        |       FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS c_id, user_id AS c_user, ts AS c_ts
        |       FROM events WHERE event_type = 'click'),
        |wm AS (SELECT least((SELECT max(p_ts) FROM p), (SELECT max(c_ts) FROM c))
        |         - INTERVAL 60 SECOND AS w),
        |matched AS (SELECT p_id, c_id, epoch_ms(p_ts) AS p_ts_ms, epoch_ms(c_ts) AS c_ts_ms
        |  FROM p JOIN c ON p_user = c_user
        |    AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts)
        |SELECT p_id, c_id, p_ts_ms, c_ts_ms FROM matched
        |UNION ALL
        |SELECT p_id, CAST(NULL AS BIGINT), epoch_ms(p_ts), CAST(NULL AS BIGINT)
        |FROM p CROSS JOIN wm
        |WHERE p_ts < wm.w AND p_id NOT IN (SELECT p_id FROM matched)""".stripMargin,
    "q_minhash_estimate" ->
      // adjacent-id pairs; signature agreement fraction vs exact jaccard,
      // same affine family as the minhash dedup oracle
      s"""WITH $shingleCte,
         |sig AS (SELECT doc_id, sh,
         |  [list_min(list_transform(sh, t ->
         |     (((1103515245*(i+1)+12345) % 2147483647)
         |        * (CAST('0x'||substr(md5(t),1,15) AS BIGINT) % 1073741824)
         |      + ((1103515245*(i+17)+12345) % 2147483647)) % 2147483647))
         |   FOR i IN range(0,16)] AS sg
         |FROM sh WHERE len(sh) > 0)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  round(len(list_intersect(a.sh, b.sh))*1.0
         |    / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard_exact,
         |  round(len([i FOR i IN range(1,17) IF a.sg[i] = b.sg[i]])/16.0, 6) AS jaccard_est
         |FROM sig a JOIN sig b ON b.doc_id = a.doc_id + 1""".stripMargin,
    "q_skew_profile" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(MAX(c) AS BIGINT) AS max_rows, round(AVG(c), 6) AS avg_rows,
        |  round(MAX(c) / AVG(c), 6) AS skew_ratio
        |FROM (SELECT event_type, user_id, COUNT(*) AS c
        |      FROM events GROUP BY event_type, user_id)
        |GROUP BY event_type""".stripMargin,
    "q_profile_table" ->
      """SELECT 'o_orderkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_nulls,
        |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
        |  CAST(MIN(o_orderkey) AS VARCHAR) AS min_val, CAST(MAX(o_orderkey) AS VARCHAR) AS max_val
        |FROM orders
        |UNION ALL
        |SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
        |  CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
        |  CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
        |  CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
        |  CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
        |  MIN(o_orderstatus), MAX(o_orderstatus)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
        |  CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
        |  CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
        |  MIN(o_orderpriority), MAX(o_orderpriority)
        |FROM orders""".stripMargin,
    "q_weighted_sample" ->
      """SELECT doc_id, n_chars,
        |  CAST(least(n_chars * 1250, 1000000) AS BIGINT) AS w_micro
        |FROM documents
        |WHERE CAST('0x' || substr(md5('w:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |  % 1000000 < least(n_chars * 1250, 1000000)""".stripMargin,
    "q_auc" ->
      """WITH e AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS v,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos FROM events),
        |per AS (SELECT v, CAST(SUM(pos) AS BIGINT) AS cp,
        |    CAST(SUM(1 - pos) AS BIGINT) AS cn FROM e GROUP BY v),
        |c AS (SELECT v, cp, cn,
        |    CAST(SUM(cn) OVER (ORDER BY v) AS BIGINT) AS cum_cn FROM per),
        |tot AS (SELECT CAST(SUM(cp) AS BIGINT) AS n_pos,
        |    CAST(SUM(cn) AS BIGINT) AS n_neg FROM per)
        |SELECT n_pos, n_neg,
        |  CAST(SUM(cp * (2*(cum_cn - cn) + cn)) AS BIGINT) AS num,
        |  CAST(2 * n_pos * n_neg AS BIGINT) AS den,
        |  round(CAST(SUM(cp * (2*(cum_cn - cn) + cn)) AS DOUBLE)
        |    / (2.0 * n_pos * n_neg), 6) AS auc
        |FROM c, tot GROUP BY n_pos, n_neg""".stripMargin,
    "q_calibration_bins" ->
      """WITH e AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS s,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos FROM events),
        |mm AS (SELECT MIN(s) AS lo, MAX(s) AS hi FROM e)
        |SELECT CAST((s - lo) * 10 // (hi - lo + 1) AS BIGINT) AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos,
        |  CAST(SUM(s) AS BIGINT) AS sum_score,
        |  round(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS mean_score,
        |  round(CAST(SUM(pos) AS DOUBLE) / COUNT(*), 6) AS frac_pos
        |FROM e, mm GROUP BY 1""".stripMargin,
    "q_classifier_eval" ->
      s"""$langPredCte,
        |cells AS (SELECT pred_lang AS p, labeled_lang AS a,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM pred GROUP BY 1, 2),
        |cls AS (SELECT DISTINCT p AS clazz FROM cells
        |  UNION SELECT DISTINCT a FROM cells),
        |st AS (SELECT clazz,
        |  CAST(COALESCE((SELECT SUM(n) FROM cells WHERE p = clazz AND a = clazz), 0) AS BIGINT) AS tp,
        |  CAST(COALESCE((SELECT SUM(n) FROM cells WHERE p = clazz AND a <> clazz), 0) AS BIGINT) AS fp,
        |  CAST(COALESCE((SELECT SUM(n) FROM cells WHERE a = clazz AND p <> clazz), 0) AS BIGINT) AS fn
        |  FROM cls)
        |SELECT clazz, tp, fp, fn,
        |  CASE WHEN tp + fp = 0 THEN 0.0
        |       ELSE round(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS "precision",
        |  CASE WHEN tp + fn = 0 THEN 0.0
        |       ELSE round(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS recall,
        |  CASE WHEN 2*tp + fp + fn = 0 THEN 0.0
        |       ELSE round(CAST(2*tp AS DOUBLE) / (2*tp + fp + fn), 6) END AS f1
        |FROM st""".stripMargin,
    "q_cohens_kappa" ->
      s"""$langPredCte,
        |cells AS (SELECT pred_lang AS p, labeled_lang AS a,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM pred GROUP BY 1, 2),
        |m AS (SELECT CAST(SUM(n) AS BIGINT) AS n_items,
        |    CAST(COALESCE(SUM(CASE WHEN p = a THEN n END), 0) AS BIGINT) AS n_agree
        |  FROM cells),
        |rc AS (SELECT CAST(SUM(np * na) AS BIGINT) AS sum_rc FROM
        |  (SELECT p AS c, CAST(SUM(n) AS BIGINT) AS np FROM cells GROUP BY 1) x
        |  JOIN (SELECT a AS c, CAST(SUM(n) AS BIGINT) AS na FROM cells GROUP BY 1) y
        |  USING (c))
        |SELECT n_items, n_agree, sum_rc,
        |  CAST(n_items * n_agree - sum_rc AS BIGINT) AS num,
        |  CAST(n_items * n_items - sum_rc AS BIGINT) AS den,
        |  round(CAST(n_items * n_agree - sum_rc AS DOUBLE)
        |    / (n_items * n_items - sum_rc), 6) AS kappa
        |FROM m, rc""".stripMargin,
    "q_gini" ->
      """WITH o AS (SELECT c_mktsegment AS seg,
        |    CAST(ROUND(o_totalprice*100, 0) AS BIGINT) AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |per AS (SELECT seg, v, CAST(COUNT(*) AS BIGINT) AS nv FROM o GROUP BY 1, 2),
        |c AS (SELECT seg, v, nv,
        |    CAST(SUM(nv) OVER (PARTITION BY seg ORDER BY v) AS BIGINT) AS cum FROM per),
        |g AS (SELECT seg, CAST(SUM(nv) AS BIGINT) AS n,
        |    CAST(SUM(v * nv) AS BIGINT) AS sum_val,
        |    CAST(SUM(v * nv * (2*(cum - nv) + nv + 1)) AS BIGINT) AS twice
        |  FROM c GROUP BY seg)
        |SELECT seg AS c_mktsegment, n, sum_val,
        |  CAST(twice - (n + 1) * sum_val AS BIGINT) AS num,
        |  CAST(n * sum_val AS BIGINT) AS den,
        |  round(CAST(twice - (n + 1) * sum_val AS DOUBLE) / (n * sum_val), 6) AS gini
        |FROM g""".stripMargin,
    "q_quantile_norm" ->
      """WITH e AS (SELECT event_type AS g,
        |    CAST(ROUND(value*100, 0) AS BIGINT) AS v FROM events),
        |perg AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS nv FROM e GROUP BY 1, 2),
        |cg AS (SELECT g, v, nv,
        |    CAST(SUM(nv) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum FROM perg),
        |ng AS (SELECT g, CAST(SUM(nv) AS BIGINT) AS n_g FROM perg GROUP BY g),
        |perp AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS nvp FROM e GROUP BY v),
        |cp AS (SELECT v, nvp, CAST(SUM(nvp) OVER (ORDER BY v) AS BIGINT) AS cump FROM perp),
        |np AS (SELECT CAST(SUM(nvp) AS BIGINT) AS n_pool FROM perp),
        |req AS (SELECT g, v, nv,
        |    greatest(((2*cum - nv + 1) * n_pool + 2*n_g - 1) // (2*n_g), 1) AS pos
        |  FROM cg JOIN ng USING (g), np)
        |SELECT req.g AS event_type, req.v, req.nv, CAST(pos AS BIGINT) AS pos,
        |  cp.v AS v_norm
        |FROM req JOIN cp ON pos - 1 >= cump - nvp AND pos - 1 < cump""".stripMargin,
    "q_rendezvous" ->
      """SELECT doc_id, CAST(s AS BIGINT) AS shard FROM (
        |  SELECT doc_id, s, ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY h DESC, s DESC) AS rn
        |  FROM (SELECT doc_id, s,
        |      CAST('0x' || substr(md5('rv' || CAST(s AS VARCHAR) || ':' ||
        |        CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |    FROM documents, (SELECT unnest(range(0, 8)) AS s)))
        |WHERE rn = 1""".stripMargin,
    "q_order_stats" ->
      """WITH e AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS v FROM events),
        |per AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS nv FROM e GROUP BY v),
        |c AS (SELECT v, nv, CAST(SUM(nv) OVER (ORDER BY v) AS BIGINT) AS cum FROM per),
        |t AS (SELECT CAST(SUM(nv) AS BIGINT) AS n FROM per),
        |fr AS (SELECT CAST(f_num AS BIGINT) AS f_num, CAST(f_den AS BIGINT) AS f_den
        |  FROM (VALUES (1, 4), (1, 2), (3, 4), (99, 100)) AS f(f_num, f_den)),
        |m AS (SELECT f_num, f_den, n,
        |    greatest((f_num * n + f_den - 1) // f_den, 1) AS pos FROM fr, t)
        |SELECT f_num, f_den, n, CAST(pos AS BIGINT) AS pos, v AS value
        |FROM c, m WHERE cum >= pos AND cum - nv < pos""".stripMargin,
    "q_log_templates" ->
      """WITH lines AS (SELECT event_id,
        |    strftime(ts, '%Y-%m-%dT%H:%M:%S.%fZ') || ' elb u' ||
        |    CAST(user_id AS VARCHAR) || ':' || CAST(event_id AS VARCHAR) ||
        |    ' 10.0.0.1:80 0.0 0.0 0.0 200 200 0 699 GET http://x/y HTTP/1.1' AS line
        |  FROM events),
        |tl AS (SELECT event_id, string_split(line, ' ') AS tl FROM lines),
        |toks0 AS (SELECT event_id, unnest([struct_pack(pos := i, tok := tl[i])
        |    FOR i IN range(1, len(tl) + 1)]) AS p FROM tl),
        |toks AS (SELECT event_id, p.pos AS pos, p.tok AS tok FROM toks0),
        |freq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY tok),
        |t2 AS (SELECT event_id, pos,
        |    CASE WHEN tf >= 1000 THEN tok ELSE '<*>' END AS t2
        |  FROM toks JOIN freq USING (tok)),
        |tmpl AS (SELECT event_id, string_agg(t2, ' ' ORDER BY pos) AS template
        |  FROM t2 GROUP BY event_id)
        |SELECT template, CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM tmpl GROUP BY template""".stripMargin,
    "q_sprt" -> {
      val (incPos, incNeg, upper, lower) =
        Profiling.sprtConstants(0.15, 0.25, 0.05, 0.05)
      s"""WITH e AS (SELECT 'arm_' || CAST(user_id % 2 AS VARCHAR) AS arm,
         |    epoch_ms(ts) AS ms, event_id,
         |    CASE WHEN event_type = 'purchase' THEN ${incPos}
         |         ELSE ${incNeg} END AS llr
         |  FROM events),
         |c AS (SELECT arm, llr,
         |    CAST(SUM(llr) OVER w AS BIGINT) AS cum,
         |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS n_obs
         |  FROM e WINDOW w AS (PARTITION BY arm ORDER BY ms, event_id)),
         |f AS (SELECT arm, CAST(MIN(n_obs) AS BIGINT) AS cn,
         |    CAST(arg_min(cum, n_obs) AS BIGINT) AS cllr
         |  FROM c WHERE cum >= ${upper} OR cum <= ${lower} GROUP BY arm),
         |t AS (SELECT arm, CAST(SUM(llr) AS BIGINT) AS fllr,
         |    CAST(COUNT(*) AS BIGINT) AS nt FROM e GROUP BY arm)
         |SELECT t.arm,
         |  CASE WHEN cn IS NULL THEN 'continue'
         |       WHEN cllr >= ${upper} THEN 'accept_h1'
         |       ELSE 'accept_h0' END AS decision,
         |  COALESCE(cn, nt) AS n_obs, COALESCE(cllr, fllr) AS llr_micro,
         |  CAST(${upper} AS BIGINT) AS upper_micro,
         |  CAST(${lower} AS BIGINT) AS lower_micro
         |FROM t LEFT JOIN f ON t.arm = f.arm""".stripMargin
    },
    "q_countmin" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |cells AS (SELECT r, h % 1024 AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM (SELECT r, CAST('0x' || substr(md5(
        |      'cm' || CAST(r AS VARCHAR) || ':' || token), 1, 15) AS BIGINT) AS h
        |    FROM toks, (SELECT unnest(range(0, 4)) AS r))
        |  GROUP BY 1, 2),
        |probes AS (SELECT unnest(['the','spark','data','window','zzz_absent']) AS token),
        |pb AS (SELECT token, r, CAST('0x' || substr(md5(
        |      'cm' || CAST(r AS VARCHAR) || ':' || token), 1, 15) AS BIGINT) % 1024 AS bucket
        |  FROM probes, (SELECT unnest(range(0, 4)) AS r)),
        |est AS (SELECT token, CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS cm_est
        |  FROM pb LEFT JOIN cells USING (r, bucket) GROUP BY token),
        |ex AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_freq
        |  FROM toks GROUP BY token)
        |SELECT token, CAST(COALESCE(exact_freq, 0) AS BIGINT) AS exact_freq,
        |  cm_est, cm_est >= COALESCE(exact_freq, 0) AS is_over
        |FROM est LEFT JOIN ex USING (token)""".stripMargin,
    "q_good_turing" ->
      """WITH tf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS r FROM (
        |    SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |  GROUP BY token),
        |nr AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM tf GROUP BY r)
        |SELECT a.r, a.n_r,
        |  round((a.r + 1) * CAST(COALESCE(b.n_r, 0) AS DOUBLE) / a.n_r, 6) AS r_star
        |FROM nr a LEFT JOIN nr b ON b.r = a.r + 1""".stripMargin,
    "q_negative_sample" ->
      """WITH r AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (
        |    ORDER BY md5('neg:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS pos
        |  FROM documents),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r),
        |p AS (SELECT doc_id AS anchor_id, CAST(j AS BIGINT) AS j,
        |    ((pos - 1 + 1 + (j - 1) * (n - 1) // 3) % n) + 1 AS partner_pos
        |  FROM (SELECT doc_id, pos, n, unnest(range(1, 4)) AS j FROM r, n))
        |SELECT anchor_id, j, b.doc_id AS neg_id
        |FROM p JOIN r b ON b.pos = p.partner_pos""".stripMargin,
    "q_mutual_info" ->
      """WITH cells AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS obs
        |  FROM documents GROUP BY 1, 2),
        |xs AS (SELECT lang, CAST(SUM(obs) AS BIGINT) AS n_x FROM cells GROUP BY 1),
        |ys AS (SELECT source, CAST(SUM(obs) AS BIGINT) AS n_y FROM cells GROUP BY 1),
        |t AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells)
        |SELECT lang, source, obs, n_x, n_y,
        |  round((CAST(obs AS DOUBLE) / n) *
        |    ln((CAST(obs AS DOUBLE) * n) /
        |      (CAST(n_x AS DOUBLE) * n_y)), 6) AS mi_contrib
        |FROM cells JOIN xs USING (lang) JOIN ys USING (source) CROSS JOIN t""".stripMargin,
    "q_percentile_rank" ->
      """WITH e AS (SELECT event_type,
        |    CAST(ROUND(value*100, 0) AS BIGINT) AS v FROM events),
        |per AS (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS nv
        |  FROM e GROUP BY 1, 2),
        |c AS (SELECT event_type, v, nv,
        |    CAST(SUM(nv) OVER (PARTITION BY event_type ORDER BY v) AS BIGINT) AS cum
        |  FROM per),
        |t AS (SELECT event_type, CAST(SUM(nv) AS BIGINT) AS n FROM per GROUP BY 1)
        |SELECT c.event_type, v, nv, n,
        |  round(CAST(2*cum - nv + 1 AS DOUBLE) / (2*n), 6) AS pct_rank
        |FROM c JOIN t ON c.event_type = t.event_type""".stripMargin,
    "q_ip_cidr" ->
      """WITH ips AS (SELECT
        |    10 * 16777216 + (user_id % 256) * 65536 +
        |    ((user_id // 256) % 256) * 256 + (event_id % 256) AS ipl
        |  FROM events),
        |m AS (SELECT CAST((ipl // 4096) * 4096 AS BIGINT) AS net, ipl FROM ips)
        |SELECT CAST(net // 16777216 AS VARCHAR) || '.' ||
        |    CAST((net // 65536) % 256 AS VARCHAR) || '.' ||
        |    CAST((net // 256) % 256 AS VARCHAR) || '.' ||
        |    CAST(net % 256 AS VARCHAR) || '/20' AS subnet,
        |  CAST(COUNT(*) AS BIGINT) AS n_requests,
        |  CAST(COUNT(DISTINCT ipl) AS BIGINT) AS n_ips
        |FROM m GROUP BY 1""".stripMargin,
    "q_hampel" ->
      """WITH pd AS (
        |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
        |    CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |h AS (SELECT user_id, day, v,
        |    CAST(quantile_cont(CAST(2*v AS DOUBLE), 0.5) OVER w AS BIGINT) AS med2,
        |    CAST(2 * mad(2*v) OVER w AS BIGINT) AS mad4
        |  FROM pd WINDOW w AS (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT user_id, day, v, med2, mad4,
        |  2*abs(2*v - med2) > 3*mad4 AS is_outlier,
        |  CAST(CASE WHEN 2*abs(2*v - med2) > 3*mad4 THEN med2 ELSE 2*v END
        |    AS BIGINT) AS repaired2
        |FROM h""".stripMargin,
    "q_fuzzy_name_join" ->
      """WITH names AS (SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n,
        |    string_split(p_name, ' ')[-1] AS blk FROM part GROUP BY p_name)
        |SELECT a.name AS name_a, b.name AS name_b, a.n AS n_a, b.n AS n_b,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
        |FROM names a JOIN names b ON a.blk = b.blk AND a.name < b.name
        |WHERE abs(length(a.name) - length(b.name)) <= 3
        |  AND levenshtein(a.name, b.name) <= 3""".stripMargin,
    "q_readability" ->
      """WITH st AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT) AS n_syllables,
        |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS np
        |  FROM documents),
        |s2 AS (SELECT doc_id, n_words, n_syllables,
        |    CASE WHEN np > 0 THEN np ELSE (n_words + 14) // 15 END AS n_sentences
        |  FROM st)
        |SELECT doc_id, n_words, CAST(n_sentences AS BIGINT) AS n_sentences,
        |  n_syllables,
        |  round(0.39 * CAST(n_words AS DOUBLE) / n_sentences
        |    + 11.8 * CAST(n_syllables AS DOUBLE) / n_words - 15.59, 6) AS fk_grade
        |FROM s2""".stripMargin,
    "q_bpe_pairs" ->
      """WITH vocab AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS wf FROM
        |    (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w
        |  HAVING length(w) >= 2 AND NOT regexp_matches(w, '[_''\\]')),
        |pairs AS (SELECT pair, CAST(SUM(wf) AS BIGINT) AS freq FROM
        |    (SELECT wf, unnest([substring(w, i, 2)
        |        FOR i IN range(1, CAST(length(w) AS INT))]) AS pair FROM vocab)
        |  GROUP BY pair)
        |SELECT pair, freq,
        |  CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, pair) AS BIGINT) AS rn
        |FROM pairs ORDER BY freq DESC, pair LIMIT 20""".stripMargin,
    "q_bpe_train" -> bpeTrainOracle,
    "q_bpe_train_batched" -> bpeTrainBatchedOracle,
    "q_bpe_apply" -> bpeApplyOracle,
    "q_bpe_heldout" -> bpeHeldOutOracle,
    "q_bpe_fertility" ->
      s"""WITH $bpeCtes,
         |sym AS (SELECT w,
         |    CAST(len(string_split(trim(seg, '_'), '__')) AS BIGINT)
         |      AS nt,
         |    CAST(length(w) AS BIGINT) AS nc FROM g5),
         |ps AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS cnt FROM
         |    (SELECT source, unnest(string_split(text, ' ')) AS w
         |      FROM documents)
         |  WHERE length(w) >= 2 GROUP BY 1, 2)
         |SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_words,
         |  CAST(SUM(cnt * nt) AS BIGINT) AS n_tokens,
         |  CAST(SUM(cnt * nc) AS BIGINT) AS n_chars,
         |  round(CAST(SUM(cnt * nt) AS DOUBLE) /
         |    CAST(SUM(cnt) AS DOUBLE), 6) AS tokens_per_word,
         |  round(CAST(SUM(cnt * nc) AS DOUBLE) /
         |    CAST(SUM(cnt * nt) AS DOUBLE), 6) AS chars_per_token
         |FROM ps JOIN sym USING (w) GROUP BY 1""".stripMargin,
    "q_minimizer_sketch" ->
      """WITH tl AS (SELECT doc_id, string_split(text, ' ') AS tl FROM documents),
        |sh0 AS (SELECT doc_id, unnest([struct_pack(pos := i,
        |      h := CAST('0x' || substr(md5(array_to_string(tl[i:i+2], '_')), 1, 15) AS BIGINT))
        |    FOR i IN range(1, len(tl) - 1)]) AS p FROM tl),
        |sh AS (SELECT doc_id, p.pos AS pos, p.h AS h FROM sh0)
        |SELECT DISTINCT doc_id, MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
        |  ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS minimizer
        |FROM sh""".stripMargin,
    "q_weighted_median" ->
      """WITH li AS (SELECT l_returnflag AS g,
        |    CAST(ROUND(l_extendedprice*100, 0) AS BIGINT) AS v,
        |    CAST(l_quantity AS BIGINT) AS q FROM lineitem),
        |per AS (SELECT g, v, CAST(SUM(q) AS BIGINT) AS w FROM li GROUP BY 1, 2),
        |c AS (SELECT g, v, w,
        |    CAST(SUM(w) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cw FROM per),
        |tot AS (SELECT g, CAST(SUM(w) AS BIGINT) AS w_total FROM per GROUP BY g)
        |SELECT c.g AS l_returnflag, tot.w_total, CAST(MIN(v) AS BIGINT) AS w_median
        |FROM c JOIN tot ON c.g = tot.g
        |WHERE 2 * cw >= w_total GROUP BY c.g, tot.w_total""".stripMargin,
    "q_zorder_stats" ->
      s"""WITH mx AS (SELECT max(l_partkey) AS mp, max(l_suppkey) AS ms FROM lineitem),
         |cells AS (SELECT l_partkey * 256 // (mp + 1) AS ca,
         |    l_suppkey * 256 // (ms + 1) AS cb FROM lineitem, mx),
         |z AS (SELECT ca, cb,
         |    ${graft.operators.Layout.zValueSql("ca", "cb", 8)} AS z FROM cells)
         |SELECT (z >> 10) AS zbucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  min(ca) AS min_a, max(ca) AS max_a,
         |  min(cb) AS min_b, max(cb) AS max_b,
         |  (max(ca) - min(ca) + 1) * (max(cb) - min(cb) + 1) AS rect_cells
         |FROM z GROUP BY 1""".stripMargin,
    "q_compaction_plan" ->
      """WITH f AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(length(props)) AS BIGINT) AS n_bytes
        |  FROM events GROUP BY 1, 2),
        |c AS (SELECT event_type, day, n_bytes,
        |    CAST(COALESCE(SUM(n_bytes) OVER (PARTITION BY event_type
        |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0) AS BIGINT) AS cum_before
        |  FROM f)
        |SELECT event_type, day, n_bytes, cum_before,
        |  cum_before // 2048 AS bin FROM c""".stripMargin,
    "q_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT CAST('0x' ||
        |    substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM orders),
        |k AS (SELECT h FROM h ORDER BY h LIMIT 256),
        |kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_k, max(h) AS h_k FROM k),
        |ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_distinct FROM h),
        |est AS (SELECT n_k, h_k, exact_distinct, (n_k = 256) AS saturated,
        |    CASE WHEN n_k = 256
        |      THEN round(CAST(n_k - 1 AS DOUBLE) * power(2, 60) / h_k, 6)
        |      ELSE CAST(n_k AS DOUBLE) END AS est_distinct
        |  FROM kk, ex)
        |SELECT n_k, h_k, exact_distinct, saturated, est_distinct,
        |  round(abs(est_distinct / exact_distinct - 1), 6) AS rel_err
        |FROM est""".stripMargin,
    "q_ktruss" ->
      s"""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
         |  WHERE l_partkey % 10 < 3),
         |ec AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS lo,
         |    b.l_partkey AS hi
         |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
         |    AND a.l_partkey < b.l_partkey),
         |${graft.operators.Graph.kTrussSql(k = 4, rounds = 14)}""".stripMargin,
    "q_kcore" ->
      s"""WITH e0 AS MATERIALIZED (SELECT a.l_partkey AS src, b.l_partkey AS dst
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2),
         |es AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         |${graft.operators.Graph.kCoreSql(k = 3, rounds = 14)}""".stripMargin,
    "q_bootstrap_ci" -> {
      val wExpr = graft.operators.Sampling.poissonThresholds
        .map(t => s"CASE WHEN h >= ${t} THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH o AS (SELECT c_mktsegment AS g, o_orderkey AS id,
         |    CAST(ROUND(o_totalprice*100, 0) AS BIGINT) AS v
         |  FROM orders JOIN customer ON o_custkey = c_custkey),
         |base AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |    round(CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS point_est
         |  FROM o GROUP BY g),
         |reps AS (SELECT g, b, v, CAST('0x' || substr(md5('bs' ||
         |      CAST(b AS VARCHAR) || ':' || CAST(id AS VARCHAR)), 1, 15)
         |    AS BIGINT) AS h
         |  FROM o, (SELECT unnest(range(0, 32)) AS b)),
         |wts AS (SELECT g, b, (${wExpr}) AS w, v FROM reps),
         |cells AS (SELECT g, b, CAST(SUM(w) AS BIGINT) AS wn,
         |    CAST(SUM(w*v) AS BIGINT) AS ws FROM wts GROUP BY g, b),
         |means AS (SELECT g, b,
         |    round(CAST(ws AS DOUBLE) / CAST(wn AS DOUBLE), 6) AS mean_b
         |  FROM cells WHERE wn > 0),
         |ranked AS (SELECT g, mean_b,
         |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY mean_b, b) AS rn,
         |    COUNT(*) OVER (PARTITION BY g) AS n_reps FROM means),
         |ci AS (SELECT g, max(CASE WHEN rn = 2 THEN mean_b END) AS ci_lo,
         |    max(CASE WHEN rn = n_reps - 1 THEN mean_b END) AS ci_hi
         |  FROM ranked GROUP BY g)
         |SELECT base.g AS c_mktsegment, n_rows, point_est, ci_lo, ci_hi
         |FROM base JOIN ci ON base.g = ci.g""".stripMargin
    },
    "q_theil_sen" ->
      """WITH daily AS (SELECT event_type AS g,
        |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS x,
        |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |pairs AS (SELECT a.g, a.x AS x1, b.x AS x2,
        |    CAST(ROUND(CAST((b.y - a.y) * 1000000 AS DOUBLE) / (b.x - a.x),
        |      0) AS BIGINT) AS slope_micro
        |  FROM daily a JOIN daily b ON a.g = b.g AND a.x < b.x),
        |ranked AS (SELECT g, slope_micro,
        |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY slope_micro, x1, x2) AS rn,
        |    COUNT(*) OVER (PARTITION BY g) AS n_pairs FROM pairs)
        |SELECT g AS event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
        |  slope_micro AS sen_slope_micro
        |FROM ranked WHERE rn = (n_pairs + 1) // 2""".stripMargin,
    "q_gram_covariance" ->
      // 2^12 fixed-point quantization (Spark round = DuckDB round, the
      // q_kmeans_step precedent), exact integer sums, then identical
      // double arithmetic for the covariance; q² = 4096² = 16777216
      """WITH x AS MATERIALIZED (SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
        |    CAST(round(CAST(e[i] AS DOUBLE) * 4096, 0) AS BIGINT) AS xq
        |  FROM (SELECT vec_id, embedding AS e,
        |          unnest(range(1, len(embedding)+1)) AS i FROM embeddings)),
        |p AS (SELECT a.dim AS i, b.dim AS j,
        |    CAST(SUM(a.xq * b.xq) AS BIGINT) AS s_ij
        |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.dim <= b.dim
        |  GROUP BY 1, 2),
        |m AS (SELECT dim, CAST(SUM(xq) AS BIGINT) AS m FROM x GROUP BY dim),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings)
        |SELECT p.i, p.j, n, s_ij, ma.m AS m_i, mb.m AS m_j,
        |  round((CAST(s_ij AS DOUBLE) / n -
        |    (CAST(ma.m AS DOUBLE) / n) * (CAST(mb.m AS DOUBLE) / n))
        |    / 16777216.0, 8) AS cov
        |FROM p JOIN m ma ON p.i = ma.dim JOIN m mb ON p.j = mb.dim, n""".stripMargin,
    "q_k_anonymity" ->
      """SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |  CAST(COUNT(*) AS BIGINT) AS n, (COUNT(*) >= 10) AS anonymous,
        |  round(1.0 / COUNT(*), 6) AS risk
        |FROM customer GROUP BY 1, 2""".stripMargin,
    "q_join_size_est" ->
      """WITH ka AS (SELECT CAST(o_orderkey AS VARCHAR) AS key FROM orders),
        |kb AS (SELECT CAST(l_orderkey AS VARCHAR) AS key FROM lineitem),
        |ca AS (SELECT r, h % 1024 AS bucket, CAST(COUNT(*) AS BIGINT) AS ca
        |  FROM (SELECT key, r, CAST('0x' || substr(md5('cm' ||
        |      CAST(r AS VARCHAR) || ':' || key), 1, 15) AS BIGINT) AS h
        |    FROM ka, (SELECT unnest(range(0, 4)) AS r)) GROUP BY 1, 2),
        |cb AS (SELECT r, h % 1024 AS bucket, CAST(COUNT(*) AS BIGINT) AS cb
        |  FROM (SELECT key, r, CAST('0x' || substr(md5('cm' ||
        |      CAST(r AS VARCHAR) || ':' || key), 1, 15) AS BIGINT) AS h
        |    FROM kb, (SELECT unnest(range(0, 4)) AS r)) GROUP BY 1, 2),
        |ip AS (SELECT ca.r, CAST(SUM(ca.ca * cb.cb) AS BIGINT) AS ip
        |  FROM ca JOIN cb ON ca.r = cb.r AND ca.bucket = cb.bucket GROUP BY 1),
        |est AS (SELECT min(ip) AS cm_est FROM ip),
        |exact AS (SELECT CAST(SUM(na * nb) AS BIGINT) AS exact_size
        |  FROM (SELECT key, CAST(COUNT(*) AS BIGINT) AS na FROM ka GROUP BY 1) a
        |  JOIN (SELECT key, CAST(COUNT(*) AS BIGINT) AS nb FROM kb GROUP BY 1) b
        |    USING (key))
        |SELECT exact_size, cm_est, (cm_est >= exact_size) AS is_over
        |FROM est, exact""".stripMargin,
    "q_grid_cluster" ->
      // reachability closure over 8-adjacent dense cells — same
      // recursive-CTE fixpoint as q_dedup_components' oracle
      """WITH RECURSIVE cells AS (SELECT
        |    CAST(floor(CAST(embedding[1] AS DOUBLE) * 32) AS BIGINT) AS cx,
        |    CAST(floor(CAST(embedding[2] AS DOUBLE) * 32) AS BIGINT) AS cy,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM embeddings GROUP BY 1, 2),
        |dense AS (SELECT cx, cy, n,
        |    (cx + 1000) * 1000000 + (cy + 1000) AS id
        |  FROM cells WHERE n >= 3),
        |und AS (SELECT a.id AS u, b.id AS v FROM dense a JOIN dense b
        |  ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
        |    AND a.id <> b.id),
        |reach(u, v) AS (
        |  SELECT id, id FROM dense
        |  UNION
        |  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u)
        |SELECT cx, cy, n, comp.cluster
        |FROM dense JOIN (SELECT u AS id, CAST(MIN(v) AS BIGINT) AS cluster
        |  FROM reach GROUP BY u) comp USING (id)""".stripMargin,
    "q_table_fingerprint" ->
      """WITH h AS (SELECT l_returnflag, CAST('0x' || substr(md5(
        |    COALESCE(CAST(l_orderkey AS VARCHAR), '<NUL>') || '|' ||
        |    COALESCE(CAST(l_partkey AS VARCHAR), '<NUL>') || '|' ||
        |    COALESCE(CAST(l_suppkey AS VARCHAR), '<NUL>') || '|' ||
        |    COALESCE(CAST(l_linenumber AS VARCHAR), '<NUL>') || '|' ||
        |    COALESCE(CAST(CAST(ROUND(l_extendedprice*100, 0) AS BIGINT)
        |      AS VARCHAR), '<NUL>') || '|' ||
        |    COALESCE(CAST(CAST(l_shipdate AS DATE) AS VARCHAR), '<NUL>')),
        |    1, 15) AS BIGINT) AS h
        |  FROM lineitem)
        |SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(h % 1099511627776) AS BIGINT) AS hash_sum,
        |  MIN(h) AS hash_min, MAX(h) AS hash_max
        |FROM h GROUP BY 1""".stripMargin,
    "q_stream_kmv" ->
      """WITH h AS (SELECT DISTINCT event_type, CAST('0x' ||
        |    substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM events),
        |r AS (SELECT event_type, h,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
        |  FROM h),
        |k AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_k,
        |    MAX(h) AS h_k FROM r WHERE rn <= 64 GROUP BY 1)
        |SELECT event_type, n_k, h_k,
        |  CASE WHEN n_k = 64
        |    THEN round(CAST(n_k - 1 AS DOUBLE) * power(2, 60) / h_k, 6)
        |    ELSE CAST(n_k AS DOUBLE) END AS est_distinct
        |FROM k""".stripMargin,
    "q_ols2" -> {
      val solve = graft.operators.Eval.ols2Solve
        .map { case (name, sql) => s"$sql AS $name" }.mkString(",\n  ")
      s"""WITH li AS (SELECT CAST(ROUND(l_extendedprice, 0) AS BIGINT) AS y,
         |    CAST(l_quantity AS BIGINT) AS x1,
         |    CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS x2 FROM lineitem),
         |sums AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
         |    CAST(SUM(x1*x1) AS BIGINT) AS s11,
         |    CAST(SUM(x1*x2) AS BIGINT) AS s12,
         |    CAST(SUM(x2*x2) AS BIGINT) AS s22,
         |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x1*y) AS BIGINT) AS s1y,
         |    CAST(SUM(x2*y) AS BIGINT) AS s2y,
         |    CAST(SUM(y*y) AS BIGINT) AS syy FROM li)
         |SELECT n, s1, s2, s11, s12, s22, sy, s1y, s2y, syy,
         |  $solve
         |FROM sums""".stripMargin
    },
    "q_graph_stats" ->
      s"""WITH e0 AS MATERIALIZED (SELECT a.l_partkey AS src, b.l_partkey AS dst
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2),
         |es AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         |deg AS MATERIALIZED (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg
         |  FROM es GROUP BY 1),
         |ds AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
         |    MAX(deg) AS max_deg,
         |    round(CAST(SUM(deg) AS DOUBLE) / COUNT(*), 6) AS avg_deg FROM deg),
         |mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
         |    CAST(SUM(a.deg) AS BIGINT) AS sx, CAST(SUM(b.deg) AS BIGINT) AS sy,
         |    CAST(SUM(a.deg*a.deg) AS BIGINT) AS sxx,
         |    CAST(SUM(b.deg*b.deg) AS BIGINT) AS syy,
         |    CAST(SUM(a.deg*b.deg) AS BIGINT) AS sxy
         |  FROM es JOIN deg a ON es.src = a.id JOIN deg b ON es.dst = b.id)
         |SELECT n_vertices, m // 2 AS n_edges, max_deg, avg_deg,
         |  ${graft.operators.Graph.assortativitySql} AS assortativity
         |FROM ds, mo""".stripMargin,
    "q_knn_eval" ->
      s"""WITH $normCte,
         |scored AS (SELECT q.vec_id AS qid, c.vec_id AS vec_id,
         |    round($cosineSqlExpr, 6) AS sim
         |  FROM n q JOIN n c ON q.vec_id < 50 AND c.vec_id != q.vec_id),
         |top AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
         |      AS rank FROM scored) WHERE rank <= 10),
         |votes AS (SELECT t.qid, CAST(e.label AS BIGINT) AS label,
         |    CAST(COUNT(*) AS BIGINT) AS n_votes
         |  FROM top t JOIN embeddings e ON t.vec_id = e.vec_id GROUP BY 1, 2),
         |pred AS (SELECT qid, label AS pred_label, n_votes FROM (
         |    SELECT qid, label, n_votes, ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY n_votes DESC, label) AS rn FROM votes) WHERE rn = 1)
         |SELECT p.qid, p.pred_label, p.n_votes,
         |  CAST(e.label AS BIGINT) AS true_label,
         |  (p.pred_label = CAST(e.label AS BIGINT)) AS correct
         |FROM pred p JOIN embeddings e ON p.qid = e.vec_id""".stripMargin,
    "q_link_prediction" ->
      """WITH e0 AS MATERIALIZED (SELECT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2),
        |es AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |contrib AS MATERIALIZED (SELECT src AS w,
        |    CAST(ROUND(1000000.0 / ln(CAST(COUNT(*) AS DOUBLE)), 0) AS BIGINT)
        |      AS contrib
        |  FROM es GROUP BY 1 HAVING COUNT(*) >= 2),
        |wedges AS (SELECT x.src AS w, x.dst AS a, y.dst AS b
        |  FROM es x JOIN es y ON x.src = y.src AND x.dst < y.dst),
        |scored AS (SELECT a, b, CAST(SUM(contrib) AS BIGINT) AS aa_micro,
        |    CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM wedges JOIN contrib USING (w) GROUP BY 1, 2)
        |SELECT a, b, aa_micro, n_common FROM scored s
        |WHERE NOT EXISTS (SELECT 1 FROM es
        |  WHERE es.src = s.a AND es.dst = s.b)
        |ORDER BY aa_micro DESC, a, b LIMIT 20""".stripMargin,
    "q_conformal" -> {
      val solve = graft.operators.Eval.ols2Solve.toMap
      s"""WITH li AS (SELECT l_orderkey * 10 + l_linenumber AS id,
         |    CAST(ROUND(l_extendedprice, 0) AS BIGINT) AS y,
         |    CAST(l_quantity AS BIGINT) AS x1,
         |    CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS x2 FROM lineitem),
         |tagged AS MATERIALIZED (SELECT *, CAST('0x' ||
         |    substr(md5('cf:' || CAST(id AS VARCHAR)), 1, 15) AS BIGINT) % 2
         |    AS half FROM li),
         |sums AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
         |    CAST(SUM(x1*x1) AS BIGINT) AS s11,
         |    CAST(SUM(x1*x2) AS BIGINT) AS s12,
         |    CAST(SUM(x2*x2) AS BIGINT) AS s22,
         |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x1*y) AS BIGINT) AS s1y,
         |    CAST(SUM(x2*y) AS BIGINT) AS s2y,
         |    CAST(SUM(y*y) AS BIGINT) AS syy
         |  FROM tagged WHERE half = 0),
         |fit AS MATERIALIZED (SELECT n AS n_train, ${solve("b0")} AS b0,
         |    ${solve("b1")} AS b1, ${solve("b2")} AS b2 FROM sums),
         |resid AS MATERIALIZED (SELECT n_train, CAST(ROUND(abs(
         |      CAST(y AS DOUBLE) - (b0 + b1 * CAST(x1 AS DOUBLE) +
         |        b2 * CAST(x2 AS DOUBLE))) * 1000000.0, 0) AS BIGINT) AS r
         |  FROM tagged, fit WHERE half = 1),
         |per AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS nv FROM resid GROUP BY r),
         |c AS (SELECT r, nv,
         |    CAST(SUM(nv) OVER (ORDER BY r) AS BIGINT) AS cum FROM per),
         |t AS (SELECT CAST(SUM(nv) AS BIGINT) AS n_calib FROM per),
         |m AS (SELECT n_calib,
         |    greatest((9 * n_calib + 9) // 10, 1) AS pos FROM t),
         |q AS (SELECT n_calib, CAST(pos AS BIGINT) AS pos, r AS q90_micro
         |  FROM c, m WHERE cum >= pos AND cum - nv < pos),
         |cov AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_covered
         |  FROM resid, q WHERE resid.r <= q.q90_micro)
         |SELECT f.n_train, q.n_calib, q.pos, q.q90_micro, cov.n_covered,
         |  round(CAST(cov.n_covered AS DOUBLE) / q.n_calib, 6) AS coverage
         |FROM fit f, q, cov""".stripMargin
    },
    "q_weighted_reservoir" ->
      """WITH k AS (SELECT doc_id, n_chars,
        |    ln((CAST('0x' || substr(md5('wr:' || CAST(doc_id AS VARCHAR)),
        |      1, 15) AS BIGINT) + 1.0) / power(2, 60)) / n_chars AS es_key
        |  FROM documents)
        |SELECT doc_id, n_chars,
        |  CAST(ROUND(es_key * 1000000, 0) AS BIGINT) AS es_key_micro
        |FROM k ORDER BY es_key DESC, doc_id LIMIT 100""".stripMargin,
    "q_did" ->
      s"""WITH e AS (SELECT (user_id % 2 = 1) AS treat,
         |    (day(ts) >= 16) AS post,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS cents FROM events),
         |cells AS (SELECT treat, post, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(cents) AS BIGINT) AS s FROM e GROUP BY 1, 2),
         |w AS (SELECT
         |    max(CASE WHEN treat AND post THEN s END) AS s_t1,
         |    max(CASE WHEN treat AND post THEN n END) AS n_t1,
         |    max(CASE WHEN treat AND NOT post THEN s END) AS s_t0,
         |    max(CASE WHEN treat AND NOT post THEN n END) AS n_t0,
         |    max(CASE WHEN NOT treat AND post THEN s END) AS s_c1,
         |    max(CASE WHEN NOT treat AND post THEN n END) AS n_c1,
         |    max(CASE WHEN NOT treat AND NOT post THEN s END) AS s_c0,
         |    max(CASE WHEN NOT treat AND NOT post THEN n END) AS n_c0
         |  FROM cells)
         |SELECT s_t1, n_t1, s_t0, n_t0, s_c1, n_c1, s_c0, n_c0,
         |  ${graft.operators.Eval.didSql} AS dd_effect FROM w""".stripMargin,
    "q_l_diversity" ->
      s"""WITH c0 AS (SELECT c_mktsegment, CAST(c_nationkey AS BIGINT)
         |    AS c_nationkey,
         |    CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS bal_bucket
         |  FROM customer),
         |cells AS (SELECT c_mktsegment, c_nationkey, bal_bucket,
         |    CAST(COUNT(*) AS BIGINT) AS c FROM c0 GROUP BY 1, 2, 3),
         |tot AS (SELECT c_mktsegment, c_nationkey,
         |    CAST(SUM(c) AS BIGINT) AS n FROM cells GROUP BY 1, 2),
         |j AS (SELECT cells.c_mktsegment, cells.c_nationkey, n, c,
         |    ${graft.operators.Profiling.entropyCellSql} AS ent_c
         |  FROM cells JOIN tot USING (c_mktsegment, c_nationkey))
         |SELECT c_mktsegment, c_nationkey, n,
         |  CAST(COUNT(*) AS BIGINT) AS distinct_sensitive,
         |  CAST(SUM(ent_c) AS BIGINT) AS entropy_micro,
         |  (COUNT(*) >= 3) AS l_diverse
         |FROM j GROUP BY 1, 2, 3""".stripMargin,
    "q_mmr_rerank" ->
      s"""WITH $normCte,
         |pool AS MATERIALIZED (SELECT qid, vec_id, sim AS rel FROM (
         |    SELECT q.vec_id AS qid, c.vec_id AS vec_id,
         |      round($cosineSqlExpr, 6) AS sim,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY round($cosineSqlExpr, 6) DESC, c.vec_id) AS rank
         |    FROM n q JOIN n c ON q.vec_id < 8 AND c.vec_id != q.vec_id)
         |  WHERE rank <= 10),
         |pairs AS MATERIALIZED (SELECT x.qid, x.vec_id AS a, y.vec_id AS b,
         |    round(list_sum([CAST(q.embedding[i] AS DOUBLE) *
         |        CAST(c.embedding[i] AS DOUBLE)
         |      FOR i IN range(1, len(q.embedding)+1)]) / (q.nrm * c.nrm), 6)
         |      AS psim
         |  FROM pool x JOIN pool y ON x.qid = y.qid AND x.vec_id != y.vec_id
         |  JOIN n q ON q.vec_id = x.vec_id JOIN n c ON c.vec_id = y.vec_id),
         |${graft.operators.Similarity.mmrSql(selectK = 5)}""".stripMargin,
    "q_ohlc_bars" -> ohlcOracleSql,
    "q_stream_ohlc" -> ohlcOracleSql,
    "q_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id,
        |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d
        |  FROM events),
        |isl AS (SELECT user_id,
        |    d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS island
        |  FROM days),
        |g AS (SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
        |  CAST(COUNT(*) AS BIGINT) AS n_streaks, MAX(len) AS longest_streak
        |FROM g GROUP BY 1""".stripMargin,
    "q_pca_power" -> pcaPowerOracleSql,
    "q_kmv_set_ops" ->
      """WITH ha AS MATERIALIZED (SELECT DISTINCT CAST('0x' ||
        |    substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM events WHERE event_type = 'click'),
        |hb AS MATERIALIZED (SELECT DISTINCT CAST('0x' ||
        |    substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM events WHERE event_type = 'purchase'),
        |u AS MATERIALIZED (SELECT h FROM ha UNION SELECT h FROM hb),
        |uk AS (SELECT t.h, (ha.h IS NOT NULL) AS ina, (hb.h IS NOT NULL) AS inb
        |  FROM (SELECT h FROM u ORDER BY h LIMIT 64) t
        |  LEFT JOIN ha ON t.h = ha.h LEFT JOIN hb ON t.h = hb.h),
        |sk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_k, MAX(h) AS h_k,
        |    CAST(SUM(CASE WHEN ina AND inb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS j_common FROM uk),
        |ex AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS exact_union,
        |    (SELECT CAST(COUNT(*) AS BIGINT) FROM ha JOIN hb USING (h))
        |      AS exact_intersection),
        |est AS (SELECT n_k, h_k, j_common, exact_union, exact_intersection,
        |    CASE WHEN n_k = 64
        |      THEN round(CAST(n_k - 1 AS DOUBLE) * power(2, 60) / h_k, 6)
        |      ELSE CAST(n_k AS DOUBLE) END AS est_union,
        |    round(CAST(j_common AS DOUBLE) / n_k, 6) AS est_jaccard
        |  FROM sk, ex)
        |SELECT n_k, h_k, j_common, exact_union, exact_intersection,
        |  est_union, est_jaccard,
        |  round(est_jaccard * est_union, 6) AS est_intersection
        |FROM est""".stripMargin,
    "q_twap" ->
      """WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    epoch_ms(ts) AS ms, event_id,
        |    CAST(ROUND(value*100, 0) AS BIGINT) AS cents FROM events),
        |l AS (SELECT event_type, day, cents,
        |    LEAD(ms) OVER (PARTITION BY event_type, day
        |      ORDER BY ms, event_id) - ms AS w FROM e),
        |f AS (SELECT * FROM l WHERE w IS NOT NULL)
        |SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n_holds,
        |  CAST(SUM(w) AS BIGINT) AS total_ms,
        |  CAST(SUM(w*cents) AS BIGINT) AS wsum,
        |  CASE WHEN SUM(w) > 0
        |    THEN round(CAST(SUM(w*cents) AS DOUBLE) / SUM(w), 6) END AS twap
        |FROM f GROUP BY 1, 2""".stripMargin,
    "q_impute" ->
      """WITH e AS (SELECT event_type, CASE WHEN event_id % 97 = 0 THEN NULL
        |    ELSE CAST(ROUND(value*100, 0) AS BIGINT) END AS cents
        |  FROM events),
        |per AS (SELECT event_type, cents AS v, CAST(COUNT(*) AS BIGINT) AS w
        |  FROM e WHERE cents IS NOT NULL GROUP BY 1, 2),
        |c AS (SELECT event_type, v, w, CAST(SUM(w) OVER (
        |    PARTITION BY event_type ORDER BY v) AS BIGINT) AS cw FROM per),
        |tot AS (SELECT event_type, CAST(SUM(w) AS BIGINT) AS wt
        |  FROM per GROUP BY 1),
        |med AS (SELECT c.event_type, CAST(MIN(v) AS BIGINT) AS imputed_median
        |  FROM c JOIN tot USING (event_type) WHERE 2*cw >= wt GROUP BY 1),
        |st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_missing,
        |    CAST(SUM(COALESCE(cents, 0)) AS BIGINT) AS sum_present
        |  FROM e GROUP BY 1)
        |SELECT st.event_type, n, n_missing, sum_present, imputed_median,
        |  sum_present + n_missing * imputed_median AS sum_after
        |FROM st JOIN med USING (event_type)""".stripMargin,
    "q_srm" ->
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
         |t AS (SELECT
         |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_t,
         |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_c FROM u)
         |SELECT n_t, n_c, ${graft.operators.Profiling.srmChi2Sql} AS chi2,
         |  ${graft.operators.Profiling.srmChi2Sql} > 3.841459 AS srm
         |FROM t""".stripMargin,
    "q_cuped" -> {
      val (th, rho) = (graft.operators.Eval.cupedThetaSql,
        graft.operators.Eval.cupedRho2Sql)
      s"""WITH pu AS (SELECT user_id,
         |    CAST(COALESCE(SUM(CASE WHEN day(ts) < 16
         |      THEN CAST(ROUND(value*100, 0) AS BIGINT) END), 0) AS BIGINT)
         |      AS pre,
         |    CAST(COALESCE(SUM(CASE WHEN day(ts) >= 16
         |      THEN CAST(ROUND(value*100, 0) AS BIGINT) END), 0) AS BIGINT)
         |      AS post,
         |    (user_id % 2 = 1) AS treat
         |  FROM events GROUP BY user_id),
         |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(pre) AS BIGINT) AS sx, CAST(SUM(post) AS BIGINT) AS sy,
         |    CAST(SUM(pre*pre) AS BIGINT) AS sxx,
         |    CAST(SUM(post*post) AS BIGINT) AS syy,
         |    CAST(SUM(pre*post) AS BIGINT) AS sxy FROM pu),
         |a AS (SELECT
         |    CAST(SUM(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         |    CAST(SUM(CASE WHEN treat THEN post END) AS BIGINT) AS sy_t,
         |    CAST(SUM(CASE WHEN treat THEN pre END) AS BIGINT) AS sx_t,
         |    CAST(SUM(CASE WHEN NOT treat THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
         |    CAST(SUM(CASE WHEN NOT treat THEN post END) AS BIGINT) AS sy_c,
         |    CAST(SUM(CASE WHEN NOT treat THEN pre END) AS BIGINT) AS sx_c
         |  FROM pu)
         |SELECT n, sx, sy, sxx, syy, sxy, n_t, sy_t, sx_t, n_c, sy_c, sx_c,
         |  round($th, 6) AS theta, $rho AS rho2,
         |  round(CAST(sy_t AS DOUBLE)/n_t - CAST(sy_c AS DOUBLE)/n_c, 6)
         |    AS raw_diff,
         |  round((CAST(sy_t AS DOUBLE)/n_t - CAST(sy_c AS DOUBLE)/n_c) -
         |    $th * (CAST(sx_t AS DOUBLE)/n_t - CAST(sx_c AS DOUBLE)/n_c), 6)
         |    AS adj_diff
         |FROM g, a""".stripMargin
    },
    "q_wilson_ci" -> wilsonOracleSql,
    "q_stream_wilson" -> wilsonOracleSql,
    "q_lorenz" ->
      """WITH spend AS (SELECT o_custkey,
        |    CAST(SUM(CAST(ROUND(o_totalprice*100, 0) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |per AS (SELECT cents AS v, CAST(COUNT(*) AS BIGINT) AS nu,
        |    CAST(SUM(cents) AS BIGINT) AS sv FROM spend GROUP BY 1),
        |c AS (SELECT v, nu, sv,
        |    CAST(SUM(nu) OVER (ORDER BY v) AS BIGINT) AS cum_nu,
        |    CAST(SUM(sv) OVER (ORDER BY v) AS BIGINT) AS cum_sv FROM per),
        |tot AS (SELECT CAST(SUM(nu) AS BIGINT) AS n_users,
        |    CAST(SUM(sv) AS BIGINT) AS total_spend FROM per),
        |dec AS (SELECT ((cum_nu - 1) * 10) // n_users AS decile,
        |    CAST(SUM(nu) AS BIGINT) AS n_users_in,
        |    MAX(cum_nu) AS cum_users, MAX(cum_sv) AS cum_spend
        |  FROM c, tot GROUP BY 1)
        |SELECT decile, n_users_in,
        |  (cum_users * 1000000) // n_users AS cum_user_ppm,
        |  (cum_spend * 1000000) // total_spend AS cum_spend_ppm
        |FROM dec, tot""".stripMargin,
    "q_skipping_compare" -> {
      val z = graft.operators.Layout.zValueSql("ca", "cb", 8)
      s"""WITH mx AS (SELECT max(l_partkey) AS mp, max(l_suppkey) AS ms
         |  FROM lineitem),
         |cells AS MATERIALIZED (SELECT l_partkey * 256 // (mp + 1) AS ca,
         |    l_suppkey * 256 // (ms + 1) AS cb FROM lineitem, mx),
         |zs AS (SELECT (z >> 10) AS zbucket, min(ca) AS min_a,
         |    max(ca) AS max_a, CAST(COUNT(*) AS BIGINT) AS n_rows
         |  FROM (SELECT ca, cb, $z AS z FROM cells) GROUP BY 1),
         |ls AS (SELECT cb // 4 AS bucket, min(ca) AS min_a, max(ca) AS max_a,
         |    CAST(COUNT(*) AS BIGINT) AS n_rows FROM cells GROUP BY 1),
         |sz AS (SELECT 'zorder' AS layout,
         |    CAST(COUNT(*) AS BIGINT) AS n_buckets,
         |    CAST(SUM(CASE WHEN max_a < 64 OR min_a > 79 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_skipped,
         |    CAST(SUM(CASE WHEN max_a < 64 OR min_a > 79 THEN 0 ELSE n_rows
         |      END) AS BIGINT) AS rows_scanned FROM zs),
         |sl AS (SELECT 'linear_b' AS layout,
         |    CAST(COUNT(*) AS BIGINT) AS n_buckets,
         |    CAST(SUM(CASE WHEN max_a < 64 OR min_a > 79 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_skipped,
         |    CAST(SUM(CASE WHEN max_a < 64 OR min_a > 79 THEN 0 ELSE n_rows
         |      END) AS BIGINT) AS rows_scanned FROM ls)
         |SELECT * FROM sz UNION ALL SELECT * FROM sl""".stripMargin
    },
    "q_stream_srm" ->
      s"""WITH t AS (SELECT
         |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_t,
         |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_c FROM events)
         |SELECT n_t, n_c, ${graft.operators.Profiling.srmChi2Sql} AS chi2,
         |  ${graft.operators.Profiling.srmChi2Sql} > 3.841459 AS srm
         |FROM t""".stripMargin,
    "q_mann_kendall" -> {
      val (v, z) = (graft.operators.TimeSeries.mkVarSql,
        graft.operators.TimeSeries.mkZSql)
      s"""WITH daily AS (SELECT event_type AS g,
         |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS x,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS y
         |  FROM events GROUP BY 1, 2),
         |s AS (SELECT a.g, CAST(SUM(CASE WHEN b.y > a.y THEN 1
         |      WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
         |  FROM daily a JOIN daily b ON a.g = b.g AND a.x < b.x GROUP BY 1),
         |tt AS (SELECT g, y, CAST(COUNT(*) AS BIGINT) AS t
         |  FROM daily GROUP BY 1, 2),
         |ties AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_distinct_y,
         |    CAST(SUM(t) AS BIGINT) AS n,
         |    CAST(SUM(t*(t-1)*(2*t+5)) AS BIGINT) AS tie_term
         |  FROM tt GROUP BY 1)
         |SELECT s.g AS event_type, s_stat, n_distinct_y, n, tie_term,
         |  $v AS var_s, $z AS z, abs($z) > 1.959964 AS significant
         |FROM s JOIN ties USING (g)""".stripMargin
    },
    "q_modularity" ->
      s"""WITH RECURSIVE e0 AS MATERIALIZED (
         |  SELECT a.l_partkey AS src, b.l_partkey AS dst
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2),
         |es AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         |reach(u, v) AS (
         |  SELECT src, src FROM (SELECT DISTINCT src FROM es)
         |  UNION
         |  SELECT r.u, e.dst FROM reach r JOIN es e ON r.v = e.src),
         |lab AS MATERIALIZED (SELECT u AS node, CAST(MIN(v) AS BIGINT) AS label
         |  FROM reach GROUP BY u),
         |m2t AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM es),
         |tagged AS (SELECT a.label AS cu, b.label AS cv
         |  FROM es JOIN lab a ON es.src = a.node JOIN lab b ON es.dst = b.node),
         |perc AS (SELECT cu AS label, CAST(COUNT(*) AS BIGINT) AS a_c,
         |    CAST(SUM(CASE WHEN cu = cv THEN 1 ELSE 0 END) AS BIGINT) AS e_in
         |  FROM tagged GROUP BY 1)
         |SELECT label, a_c, e_in, m2,
         |  ${graft.operators.Graph.modularityCellSql} AS contrib_micro
         |FROM perc, m2t""".stripMargin,
    "q_bh_fdr" -> bhFdrOracleSql,
    "q_stream_bh_fdr" -> bhFdrOracleSql,
    "q_decile_lift" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    (SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 15)
         |      AS heavy
         |  FROM events GROUP BY 1),
         |per AS (SELECT -spend AS v, CAST(COUNT(*) AS BIGINT) AS nu,
         |    CAST(SUM(CASE WHEN heavy THEN 1 ELSE 0 END) AS BIGINT) AS np
         |  FROM users GROUP BY 1),
         |c AS (SELECT v, nu, np,
         |    CAST(SUM(nu) OVER (ORDER BY v) AS BIGINT) AS cum_nu,
         |    CAST(SUM(np) OVER (ORDER BY v) AS BIGINT) AS cum_np FROM per),
         |tot AS (SELECT CAST(SUM(nu) AS BIGINT) AS n_units,
         |    CAST(SUM(np) AS BIGINT) AS n_pos_total FROM per),
         |dec AS (SELECT ((cum_nu - 1) * 10) // n_units AS decile,
         |    n_units, n_pos_total,
         |    CAST(SUM(nu) AS BIGINT) AS n, CAST(SUM(np) AS BIGINT) AS n_pos,
         |    MAX(cum_np) AS cum_pos
         |  FROM c, tot GROUP BY 1, 2, 3)
         |SELECT decile, n, n_pos, ${graft.operators.Eval.liftSql}
         |    AS lift_micro,
         |  (cum_pos * 1000000) // n_pos_total AS cum_gain_ppm
         |FROM dec""".stripMargin,
    "q_changepoint" -> changepointOracleSql,
    "q_ecod_outliers" -> {
      val cell = graft.operators.Profiling.ecodCellSql
      s"""WITH ev AS (SELECT event_id,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS cents,
         |    epoch_ms(ts) % 86400000 AS ms_of_day FROM events),
         |p1 AS (SELECT cents AS v, CAST(COUNT(*) AS BIGINT) AS nv
         |  FROM ev GROUP BY 1),
         |c1 AS (SELECT v, nv,
         |    CAST(SUM(nv) OVER (ORDER BY v) AS BIGINT) AS cum_nv FROM p1),
         |n1 AS (SELECT CAST(SUM(nv) AS BIGINT) AS n FROM p1),
         |s1 AS (SELECT v, $cell AS sc FROM c1, n1),
         |p2 AS (SELECT ms_of_day AS v, CAST(COUNT(*) AS BIGINT) AS nv
         |  FROM ev GROUP BY 1),
         |c2 AS (SELECT v, nv,
         |    CAST(SUM(nv) OVER (ORDER BY v) AS BIGINT) AS cum_nv FROM p2),
         |n2 AS (SELECT CAST(SUM(nv) AS BIGINT) AS n FROM p2),
         |s2 AS (SELECT v, $cell AS sc FROM c2, n2)
         |SELECT ev.event_id, ev.cents, ev.ms_of_day,
         |  s1.sc AS sc_cents, s2.sc AS sc_ms_of_day,
         |  s1.sc + s2.sc AS score_micro
         |FROM ev JOIN s1 ON ev.cents = s1.v JOIN s2 ON ev.ms_of_day = s2.v
         |ORDER BY score_micro DESC, event_id LIMIT 20""".stripMargin
    },
    "q_graph_features" ->
      s"""WITH e0 AS MATERIALIZED (SELECT a.l_partkey AS src, b.l_partkey AS dst
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2),
         |es AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
         |deg AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg
         |  FROM es GROUP BY 1),
         |t AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
         |  FROM e0 e1 JOIN e0 e2 ON e2.src = e1.dst
         |  JOIN e0 e3 ON e3.src = e1.src AND e3.dst = e2.dst),
         |x AS (SELECT a AS id FROM t UNION ALL SELECT b FROM t
         |  UNION ALL SELECT c FROM t),
         |tri AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_tri
         |  FROM x GROUP BY 1),
         |f AS (SELECT deg.id, deg.deg, COALESCE(tri.n_tri, 0) AS n_tri
         |  FROM deg LEFT JOIN tri USING (id))
         |SELECT id, deg, n_tri, ${graft.operators.Graph.lccSql} AS lcc_micro
         |FROM f""".stripMargin,
    "q_decision_stump" -> {
      val (split, parent) = (graft.operators.Eval.giniSplitSql,
        graft.operators.Eval.giniParentSql)
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    (SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 15)
         |      AS heavy
         |  FROM events GROUP BY 1),
         |per AS (SELECT spend AS v, CAST(COUNT(*) AS BIGINT) AS nu,
         |    CAST(SUM(CASE WHEN heavy THEN 1 ELSE 0 END) AS BIGINT) AS np
         |  FROM users GROUP BY 1),
         |c AS (SELECT v, nu, np,
         |    CAST(SUM(nu) OVER (ORDER BY v) AS BIGINT) AS cum_nu,
         |    CAST(SUM(np) OVER (ORDER BY v) AS BIGINT) AS cum_np FROM per),
         |tot AS (SELECT CAST(SUM(nu) AS BIGINT) AS n_total,
         |    CAST(SUM(np) AS BIGINT) AS p_total FROM per),
         |sc AS (SELECT *, $split AS gini_split_micro
         |  FROM c, tot WHERE cum_nu < n_total),
         |b AS (SELECT * FROM sc ORDER BY gini_split_micro, v LIMIT 1)
         |SELECT v AS split_value, cum_nu AS n_left, cum_np AS pos_left,
         |  n_total - cum_nu AS n_right, p_total - cum_np AS pos_right,
         |  n_total, p_total, $parent AS gini_parent_micro, gini_split_micro,
         |  $parent - gini_split_micro AS gain_micro
         |FROM b""".stripMargin
    },
    "q_neg_sampling_table" ->
      s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token
         |  FROM documents),
         |cc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM toks GROUP BY 1),
         |w AS (SELECT token, cnt,
         |    ${graft.operators.TextAnalysis.ns075Sql} AS w_micro FROM cc),
         |c AS (SELECT token, cnt, w_micro,
         |    CAST(SUM(w_micro) OVER (ORDER BY token) AS BIGINT) AS cum
         |  FROM w),
         |tot AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS w_total FROM w)
         |SELECT token, cnt, w_micro, cum - w_micro AS range_start,
         |  cum AS range_end, w_total
         |FROM c, tot""".stripMargin,
    "q_woe_iv" -> {
      val (woe, iv) = (graft.operators.Eval.woeSql, graft.operators.Eval.ivSql)
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    (SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 15)
         |      AS heavy
         |  FROM events GROUP BY 1),
         |per AS (SELECT spend AS v, CAST(COUNT(*) AS BIGINT) AS nu,
         |    CAST(SUM(CASE WHEN heavy THEN 1 ELSE 0 END) AS BIGINT) AS np
         |  FROM users GROUP BY 1),
         |c AS (SELECT v, nu, np,
         |    CAST(SUM(nu) OVER (ORDER BY v) AS BIGINT) AS cum_nu,
         |    CAST(SUM(np) OVER (ORDER BY v) AS BIGINT) AS cum_np FROM per),
         |tot AS (SELECT CAST(SUM(nu) AS BIGINT) AS n_units,
         |    CAST(SUM(np) AS BIGINT) AS p_total FROM per),
         |dec AS (SELECT ((cum_nu - 1) * 10) // n_units AS decile,
         |    n_units, p_total,
         |    CAST(SUM(nu) AS BIGINT) AS n, CAST(SUM(np) AS BIGINT) AS pos
         |  FROM c, tot GROUP BY 1, 2, 3),
         |f AS (SELECT decile, n_units, p_total, n, pos, n - pos AS neg
         |  FROM dec)
         |SELECT decile, n, pos, neg, $woe AS woe_micro, $iv AS iv_micro
         |FROM f""".stripMargin
    },
    "q_conversion_lag" ->
      """WITH s1 AS (SELECT user_id, MIN(epoch_ms(ts)) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, MIN(epoch_ms(ts)) AS t2
        |  FROM events e JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND epoch_ms(ts) >= s1.t1
        |  GROUP BY e.user_id),
        |lag AS (SELECT s2.t2 - s1.t1 AS v FROM s1 JOIN s2 USING (user_id)),
        |per AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS nv FROM lag GROUP BY v),
        |c AS (SELECT v, nv,
        |    CAST(SUM(nv) OVER (ORDER BY v) AS BIGINT) AS cum FROM per),
        |t AS (SELECT CAST(SUM(nv) AS BIGINT) AS n FROM per),
        |fr AS (SELECT CAST(f_num AS BIGINT) AS f_num,
        |    CAST(f_den AS BIGINT) AS f_den
        |  FROM (VALUES (1, 4), (1, 2), (3, 4), (99, 100)) AS f(f_num, f_den)),
        |m AS (SELECT f_num, f_den, n,
        |    greatest((f_num * n + f_den - 1) // f_den, 1) AS pos FROM fr, t)
        |SELECT f_num, f_den, n, CAST(pos AS BIGINT) AS pos, v AS value
        |FROM c, m WHERE cum >= pos AND cum - nv < pos""".stripMargin,
    "q_ljung_box" -> {
      val lagCtes = (1 to 5).map { k =>
        s"""p$k AS (SELECT event_type, v AS y,
           |    lag(v, $k) OVER (PARTITION BY event_type ORDER BY day) AS x
           |  FROM pd),
           |m$k AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS sx,
           |    SUM(y) AS sy, SUM(x*y) AS sxy, SUM(x*x) AS sxx,
           |    SUM(y*y) AS syy
           |  FROM p$k WHERE x IS NOT NULL GROUP BY 1),
           |r$k AS (SELECT event_type,
           |    round(CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
           |      THEN (n*sxy - sx*sy) / sqrt(CAST(n*sxx - sx*sx AS DOUBLE) *
           |        CAST(n*syy - sy*sy AS DOUBLE)) END, 6) AS rho_$k
           |  FROM m$k)""".stripMargin
      }.mkString(",\n")
      val q = graft.operators.TimeSeries.lbSql(5)
      s"""WITH pd AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |base AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_series
         |  FROM pd GROUP BY 1),
         |$lagCtes
         |SELECT base.event_type, n_series, rho_1, rho_2, rho_3, rho_4, rho_5,
         |  $q AS lb_stat, $q > 11.0705 AS significant
         |FROM base JOIN r1 USING (event_type) JOIN r2 USING (event_type)
         |  JOIN r3 USING (event_type) JOIN r4 USING (event_type)
         |  JOIN r5 USING (event_type)""".stripMargin
    },
    "q_kendall_tau" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS x,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS y
         |  FROM events GROUP BY 1),
         |idd AS (SELECT x, y, ROW_NUMBER() OVER (ORDER BY x, y) AS i
         |  FROM users),
         |pp AS (SELECT
         |    CAST(sign(b.x - a.x) * sign(b.y - a.y) AS BIGINT) AS cd,
         |    CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
         |    CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
         |  FROM idd a JOIN idd b ON a.i < b.i),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |    CAST(SUM(CASE WHEN cd = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS concordant,
         |    CAST(SUM(CASE WHEN cd = -1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS discordant,
         |    CAST(SUM(tx) AS BIGINT) AS ties_x,
         |    CAST(SUM(ty) AS BIGINT) AS ties_y FROM pp)
         |SELECT n_pairs, concordant, discordant, ties_x, ties_y,
         |  ${graft.operators.Profiling.tauBSql} AS tau_b
         |FROM agg""".stripMargin,
    "q_cramers_v" ->
      s"""WITH cells AS (SELECT lang AS x, source AS y,
         |    CAST(COUNT(*) AS BIGINT) AS obs FROM documents GROUP BY 1, 2),
         |r AS (SELECT x, CAST(SUM(obs) AS BIGINT) AS rx
         |  FROM cells GROUP BY 1),
         |cc AS (SELECT y, CAST(SUM(obs) AS BIGINT) AS cy
         |  FROM cells GROUP BY 1),
         |nn AS (SELECT CAST(SUM(obs) AS BIGINT) AS n,
         |    CAST(COUNT(DISTINCT x) AS BIGINT) AS n_x,
         |    CAST(COUNT(DISTINCT y) AS BIGINT) AS n_y FROM cells),
         |grid AS (SELECT r.x, cc.y, r.rx, cc.cy,
         |    COALESCE(cells.obs, 0) AS obs
         |  FROM r CROSS JOIN cc LEFT JOIN cells USING (x, y)),
         |j AS (SELECT grid.obs, grid.rx, grid.cy, nn.n, nn.n_x, nn.n_y,
         |    ${graft.operators.Profiling.chi2CellMicroSql} AS contrib_micro
         |  FROM grid, nn),
         |t AS (SELECT n, n_x, n_y,
         |    CAST(SUM(contrib_micro) AS BIGINT) AS chi2_micro
         |  FROM j GROUP BY 1, 2, 3)
         |SELECT n, n_x, n_y, chi2_micro,
         |  ${graft.operators.Profiling.cramersVSql} AS cramers_v
         |FROM t""".stripMargin,
    "q_spearman" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_purch
         |  FROM events GROUP BY 1),
         |px AS (SELECT spend AS v, CAST(COUNT(*) AS BIGINT) AS nv
         |  FROM users GROUP BY 1),
         |cx AS (SELECT v AS spend,
         |    CAST(SUM(nv) OVER (ORDER BY v) AS BIGINT) * 2 - nv + 1 AS rx2
         |  FROM px),
         |py AS (SELECT n_purch AS v, CAST(COUNT(*) AS BIGINT) AS nv
         |  FROM users GROUP BY 1),
         |cy AS (SELECT v AS n_purch,
         |    CAST(SUM(nv) OVER (ORDER BY v) AS BIGINT) * 2 - nv + 1 AS ry2
         |  FROM py),
         |j AS (SELECT rx2, ry2 FROM users
         |  JOIN cx USING (spend) JOIN cy USING (n_purch)),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(rx2) AS BIGINT) AS sx, CAST(SUM(ry2) AS BIGINT) AS sy,
         |    CAST(SUM(rx2*rx2) AS DECIMAL(38,0)) AS sxx,
         |    CAST(SUM(ry2*ry2) AS DECIMAL(38,0)) AS syy,
         |    CAST(SUM(rx2*ry2) AS DECIMAL(38,0)) AS sxy FROM j)
         |SELECT n, sx, sy,
         |  CAST(sxx AS VARCHAR) AS sxx, CAST(syy AS VARCHAR) AS syy,
         |  CAST(sxy AS VARCHAR) AS sxy,
         |  ${graft.operators.Profiling.pearsonMomentsSql} AS spearman_rho
         |FROM m""".stripMargin,
    "q_retrieval_eval" ->
      s"""WITH li AS (SELECT CAST(o.o_custkey AS BIGINT) AS cust, l.l_partkey,
         |    CAST(SUM(CAST(ROUND(l.l_extendedprice*100, 0) AS BIGINT))
         |      AS BIGINT) AS spend,
         |    CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  GROUP BY 1, 2),
         |rk AS (SELECT cust, spend,
         |    CASE WHEN qty >= 60 THEN 2 WHEN qty >= 30 THEN 1 ELSE 0 END
         |      AS rel,
         |    CAST(row_number() OVER (PARTITION BY cust
         |      ORDER BY spend DESC, l_partkey) AS BIGINT) AS r
         |  FROM li),
         |h AS (SELECT cust, r, rel,
         |    CAST(row_number() OVER (PARTITION BY cust ORDER BY rel DESC, r)
         |      AS BIGINT) AS ideal_r,
         |    CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) OVER
         |      (PARTITION BY cust ORDER BY r ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS BIGINT) AS hits_at_r
         |  FROM rk),
         |agg AS (SELECT cust, CAST(COUNT(*) AS BIGINT) AS n_cand,
         |    CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_rel,
         |    CAST(SUM(CASE WHEN r <= 10 THEN CAST(round(
         |      rel*1000000.0/log2(r+1), 0) AS BIGINT) ELSE 0 END)
         |      AS BIGINT) AS dcg_micro,
         |    CAST(SUM(CASE WHEN ideal_r <= 10 THEN CAST(round(
         |      rel*1000000.0/log2(ideal_r+1), 0) AS BIGINT) ELSE 0 END)
         |      AS BIGINT) AS idcg_micro,
         |    CAST(MAX(CASE WHEN rel > 0 THEN CAST(round(1000000.0/r, 0)
         |      AS BIGINT) END) AS BIGINT) AS rr_micro,
         |    CAST(SUM(CASE WHEN rel > 0 AND r <= 10 THEN CAST(round(
         |      hits_at_r*1000000.0/r, 0) AS BIGINT) ELSE 0 END)
         |      AS BIGINT) AS ap_sum_micro
         |  FROM h GROUP BY 1)
         |SELECT cust, n_cand, n_rel, dcg_micro, idcg_micro, rr_micro,
         |  ap_sum_micro, ${graft.operators.Eval.ndcgSql} AS ndcg,
         |  ${graft.operators.Eval.apSql(10)} AS ap
         |FROM agg""".stripMargin,
    "q_anova" ->
      s"""WITH per AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ng,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS sg,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT) *
         |      CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS ssg
         |  FROM events GROUP BY 1),
         |t AS (SELECT ng, sg, ssg,
         |    CAST(${graft.operators.Eval.sqOverNWhole("sg", "ng", "//")}
         |      AS BIGINT) AS tg_whole,
         |    CAST(${graft.operators.Eval.sqOverNFracMilli("sg", "ng", "//")}
         |      AS BIGINT) AS tg_frac FROM per),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS g,
         |    CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(sg) AS BIGINT) AS s,
         |    CAST(SUM(ssg) AS BIGINT) AS ss,
         |    CAST(SUM(tg_whole) AS BIGINT) AS t_whole,
         |    CAST(SUM(tg_frac) AS BIGINT) AS t_frac FROM t)
         |SELECT g, n, s, ss, t_whole, t_frac,
         |  ${graft.operators.Eval.anovaSsbSql("//")} AS ssb,
         |  ${graft.operators.Eval.anovaSswSql} AS ssw,
         |  ${graft.operators.Eval.anovaFSql("//")} AS f_stat
         |FROM agg""".stripMargin,
    "q_anova_effects" ->
      s"""WITH per AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ng,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS sg,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT) *
         |      CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS ssg
         |  FROM events GROUP BY 1),
         |t AS (SELECT ng, sg, ssg,
         |    CAST(${graft.operators.Eval.sqOverNWhole("sg", "ng", "//")}
         |      AS BIGINT) AS tg_whole,
         |    CAST(${graft.operators.Eval.sqOverNFracMilli("sg", "ng", "//")}
         |      AS BIGINT) AS tg_frac FROM per),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS g,
         |    CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(sg) AS BIGINT) AS s,
         |    CAST(SUM(ssg) AS BIGINT) AS ss,
         |    CAST(SUM(tg_whole) AS BIGINT) AS t_whole,
         |    CAST(SUM(tg_frac) AS BIGINT) AS t_frac FROM t),
         |f AS (SELECT g, n,
         |    ${graft.operators.Eval.anovaSsbSql("//")} AS ssb,
         |    ${graft.operators.Eval.anovaSswSql} AS ssw,
         |    ${graft.operators.Eval.anovaFSql("//")} AS f_stat
         |  FROM agg)
         |SELECT g, n, f_stat,
         |  ${graft.operators.Eval.anovaEtaSqSql} AS eta_sq,
         |  ${graft.operators.Eval.anovaOmegaSqSql} AS omega_sq
         |FROM f""".stripMargin,
    "q_durbin_watson" ->
      s"""WITH pd AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(v) AS BIGINT) AS s FROM pd GROUP BY 1),
         |e AS (SELECT pd.event_type, day, n, n * v - s AS e
         |  FROM pd JOIN st USING (event_type)),
         |d AS (SELECT event_type, n, e,
         |    e - lag(e) OVER (PARTITION BY event_type ORDER BY day) AS de
         |  FROM e),
         |agg AS (SELECT event_type, MAX(n) AS n,
         |    SUM(CAST(e AS HUGEINT) * e) AS sse,
         |    SUM(CAST(de AS HUGEINT) * de) AS ssd
         |  FROM d GROUP BY 1)
         |SELECT event_type, n,
         |  CAST(sse AS VARCHAR) AS sse, CAST(ssd AS VARCHAR) AS ssd,
         |  ${graft.operators.TimeSeries.dwSql} AS dw
         |FROM agg""".stripMargin,
    "q_runs_test" ->
      s"""WITH pd AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |d AS (SELECT event_type, day,
         |    v - lag(v) OVER (PARTITION BY event_type ORDER BY day) AS dd
         |  FROM pd),
         |sg AS (SELECT event_type, day, CAST(sign(dd) AS BIGINT) AS s
         |  FROM d WHERE dd IS NOT NULL AND dd <> 0),
         |rr AS (SELECT event_type, s,
         |    CASE WHEN lag(s) OVER (PARTITION BY event_type ORDER BY day)
         |      IS NULL OR lag(s) OVER (PARTITION BY event_type
         |      ORDER BY day) <> s THEN 1 ELSE 0 END AS new_run
         |  FROM sg),
         |agg AS (SELECT event_type,
         |    CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
         |    CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_down,
         |    CAST(SUM(new_run) AS BIGINT) AS n_runs
         |  FROM rr GROUP BY 1)
         |SELECT event_type, n_up, n_down, n_runs,
         |  ${graft.operators.TimeSeries.runsZSql} AS z
         |FROM agg""".stripMargin,
    "q_bradley_terry" -> {
      val iterCtes = (1 to 10).map { i =>
        val p = s"t${i - 1}"
        s"""d$i AS MATERIALIZED (SELECT item, CAST(SUM(term) AS BIGINT) AS d
           |  FROM (SELECT np.a AS item,
           |      n_games * 1000000000000 // (ta.theta + tb.theta) AS term
           |    FROM np JOIN $p ta ON np.a = ta.item
           |      JOIN $p tb ON np.b = tb.item
           |    UNION ALL
           |    SELECT np.b AS item,
           |      n_games * 1000000000000 // (ta.theta + tb.theta) AS term
           |    FROM np JOIN $p ta ON np.a = ta.item
           |      JOIN $p tb ON np.b = tb.item) z GROUP BY 1),
           |r$i AS (SELECT items.item, items.n_wins,
           |    CASE WHEN d > 0 THEN n_wins * 1000000000000 // d ELSE 0 END
           |      AS raw
           |  FROM items JOIN d$i USING (item)),
           |tt$i AS (SELECT CAST(SUM(raw) AS BIGINT) AS t FROM r$i),
           |t$i AS MATERIALIZED (SELECT item,
           |    CAST(CASE WHEN t > 0 THEN greatest(raw * 1000000000 // t, 1)
           |      ELSE 1 END AS BIGINT) AS theta
           |  FROM r$i, tt$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH sp AS (SELECT user_id, event_type,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS cents
         |  FROM events GROUP BY 1, 2),
         |g AS (SELECT
         |    CASE WHEN x.cents > y.cents THEN x.event_type
         |      ELSE y.event_type END AS w,
         |    CASE WHEN x.cents > y.cents THEN y.event_type
         |      ELSE x.event_type END AS l
         |  FROM sp x JOIN sp y ON x.user_id = y.user_id
         |    AND x.event_type < y.event_type
         |  WHERE x.cents <> y.cents),
         |np AS MATERIALIZED (SELECT least(w, l) AS a, greatest(w, l) AS b,
         |    CAST(COUNT(*) AS BIGINT) AS n_games FROM g GROUP BY 1, 2),
         |wi AS (SELECT w AS item, CAST(COUNT(*) AS BIGINT) AS n_wins
         |  FROM g GROUP BY 1),
         |items AS MATERIALIZED (SELECT u.item,
         |    CAST(COALESCE(wi.n_wins, 0) AS BIGINT) AS n_wins
         |  FROM (SELECT a AS item FROM np UNION SELECT b FROM np) u
         |  LEFT JOIN wi USING (item)),
         |kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM items),
         |t0 AS MATERIALIZED (SELECT item,
         |    CAST(1000000000 // k AS BIGINT) AS theta FROM items, kk),
         |$iterCtes
         |SELECT items.item, items.n_wins, theta AS bt_share_ppb
         |FROM items JOIN t10 USING (item)""".stripMargin
    },
    "q_markov_stationary" -> {
      val iterCtes = (1 to 12).map { i =>
        val p = s"t${i - 1}"
        s"""f$i AS MATERIALIZED (SELECT pp.dst AS state,
           |    CAST(SUM(x.x * p_micro // 1000000) AS BIGINT) AS inflow
           |  FROM pp JOIN $p x ON pp.src = x.state GROUP BY 1),
           |s$i AS (SELECT st.state,
           |    (CASE WHEN outs.state IS NULL THEN x.x ELSE 0 END) +
           |      COALESCE(f.inflow, 0) AS raw
           |  FROM states st JOIN $p x USING (state)
           |  LEFT JOIN outs USING (state) LEFT JOIN f$i f USING (state)),
           |tt$i AS (SELECT CAST(SUM(raw) AS BIGINT) AS t FROM s$i),
           |t$i AS MATERIALIZED (SELECT state,
           |    CAST(CASE WHEN t > 0 THEN raw * 1000000000 // t ELSE 0 END
           |      AS BIGINT) AS x
           |  FROM s$i, tt$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS ms,
         |    event_id FROM events),
         |tr AS (SELECT event_type AS src,
         |    lead(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ms, event_id) AS dst
         |  FROM ev),
         |pairs AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM tr WHERE dst IS NOT NULL GROUP BY 1, 2),
         |outtot AS (SELECT src, CAST(SUM(n) AS BIGINT) AS n_out
         |  FROM pairs GROUP BY 1),
         |pp AS MATERIALIZED (SELECT pairs.src, pairs.dst,
         |    CAST(n * 1000000 // n_out AS BIGINT) AS p_micro
         |  FROM pairs JOIN outtot USING (src)),
         |states AS MATERIALIZED (SELECT src AS state FROM pp
         |  UNION SELECT dst FROM pp),
         |outs AS MATERIALIZED (SELECT DISTINCT src AS state FROM pp),
         |kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM states),
         |t0 AS MATERIALIZED (SELECT state,
         |    CAST(1000000000 // k AS BIGINT) AS x FROM states, kk),
         |$iterCtes
         |SELECT states.state, t12.x AS stationary_ppb
         |FROM states JOIN t12 USING (state)""".stripMargin
    },
    "q_cochran_armitage" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_click,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_purch
         |  FROM events GROUP BY 1),
         |d AS (SELECT CASE WHEN n_click >= 25 THEN 2
         |      WHEN n_click >= 18 THEN 1 ELSE 0 END AS w,
         |    CASE WHEN n_purch >= 15 THEN 1 ELSE 0 END AS y FROM users),
         |per AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS ng,
         |    CAST(SUM(y) AS BIGINT) AS rg FROM d GROUP BY 1),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS g,
         |    CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(rg) AS BIGINT) AS r,
         |    CAST(SUM(w * ng) AS BIGINT) AS swn,
         |    CAST(SUM(w * rg) AS BIGINT) AS swr,
         |    CAST(SUM(w * w * ng) AS BIGINT) AS sw2n FROM per)
         |SELECT g, n, r, swn, swr, sw2n,
         |  ${graft.operators.Profiling.caChi2Sql} AS chi2_trend,
         |  ${graft.operators.Profiling.caChi2Sql} > 3.841459 AS significant
         |FROM agg""".stripMargin,
    "q_mann_whitney" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) >= 14 AS had_error
         |  FROM events GROUP BY 1),
         |per AS (SELECT spend AS v, CAST(COUNT(*) AS BIGINT) AS nv
         |  FROM users GROUP BY 1),
         |rk AS (SELECT v,
         |    CAST(SUM(nv) OVER (ORDER BY v) AS BIGINT) * 2 - nv + 1 AS r2,
         |    CAST(nv AS DECIMAL(38,0)) * nv * nv - nv AS t3t_v
         |  FROM per),
         |tie AS (SELECT CAST(SUM(t3t_v) AS DECIMAL(38,0)) AS t3t FROM rk),
         |m AS (SELECT
         |    CAST(SUM(CASE WHEN had_error THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n1,
         |    CAST(SUM(CASE WHEN had_error THEN 0 ELSE 1 END) AS BIGINT)
         |      AS n2,
         |    CAST(SUM(CASE WHEN had_error THEN r2 ELSE 0 END) AS BIGINT)
         |      AS r1x2
         |  FROM users JOIN rk ON users.spend = rk.v),
         |a AS (SELECT n1, n2, CAST(r1x2 - n1*(n1+1) AS BIGINT) AS u1x2,
         |    t3t FROM m, tie)
         |SELECT n1, n2, u1x2, CAST(t3t AS VARCHAR) AS t3t,
         |  ${graft.operators.Profiling.mwZSql} AS z,
         |  ${graft.operators.Profiling.cliffsDeltaSql} AS cliffs_delta,
         |  abs(${graft.operators.Profiling.mwZSql}) > 1.959964 AS significant
         |FROM a""".stripMargin,
    "q_kruskal_wallis" ->
      s"""WITH d AS (SELECT source AS grp, n_chars AS v FROM documents),
         |per AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS nv
         |  FROM d GROUP BY 1),
         |rk AS (SELECT v,
         |    CAST(SUM(nv) OVER (ORDER BY v) AS BIGINT) * 2 - nv + 1 AS r2,
         |    CAST(nv AS DECIMAL(38,0)) * nv * nv - nv AS t3t_v
         |  FROM per),
         |tie AS (SELECT CAST(SUM(t3t_v) AS DECIMAL(38,0)) AS t3t FROM rk),
         |pg AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS ng,
         |    CAST(SUM(r2) AS BIGINT) AS rgx2
         |  FROM d JOIN rk USING (v) GROUP BY 1),
         |pc AS (SELECT ng,
         |    ${graft.operators.Profiling.kwCellMicroSql} AS s_micro FROM pg),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS g,
         |    CAST(SUM(ng) AS BIGINT) AS n,
         |    CAST(SUM(s_micro) AS DECIMAL(38,0)) AS s_micro FROM pc),
         |t AS (SELECT g, n, s_micro, t3t FROM a, tie)
         |SELECT g, n, CAST(s_micro AS VARCHAR) AS s_micro,
         |  CAST(t3t AS VARCHAR) AS t3t,
         |  ${graft.operators.Profiling.kwHSql} AS h,
         |  CAST(g - 1 AS BIGINT) AS df,
         |  ${graft.operators.Profiling.chi2Crit95Sql("g - 1")} AS chi2_crit,
         |  ${graft.operators.Profiling.kwHSql} >
         |    ${graft.operators.Profiling.chi2Crit95Sql("g - 1")} AS significant
         |FROM t""".stripMargin,
    "q_cum_incidence" ->
      s"""WITH u AS (SELECT user_id, epoch_ms(ts) AS ms, event_type
         |  FROM events),
         |agg AS (SELECT user_id, MIN(ms) AS first_ms, MAX(ms) AS last_ms,
         |    MIN(CASE WHEN event_type = 'error' THEN ms END) AS e_ms,
         |    MIN(CASE WHEN event_type = 'signup' THEN ms END) AS s_ms
         |  FROM u GROUP BY 1),
         |subj AS (SELECT 'c' || CAST(user_id % 2 AS VARCHAR) AS grp,
         |    (COALESCE(LEAST(COALESCE(e_ms, s_ms), COALESCE(s_ms, e_ms)),
         |      last_ms) - first_ms) // 3600000 AS t,
         |    CASE WHEN e_ms IS NULL AND s_ms IS NULL THEN 0
         |      WHEN s_ms IS NULL OR (e_ms IS NOT NULL AND e_ms <= s_ms)
         |      THEN 1 ELSE 2 END AS cause
         |  FROM agg),
         |per AS (SELECT grp, t,
         |    CAST(SUM(CASE WHEN cause = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS d1,
         |    CAST(SUM(CASE WHEN cause = 2 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS d2,
         |    CAST(COUNT(*) AS BIGINT) AS m FROM subj GROUP BY 1, 2),
         |r AS (SELECT grp, t, d1, d2, m,
         |    CAST(SUM(m) OVER (PARTITION BY grp ORDER BY t) AS BIGINT)
         |      AS cum_m,
         |    CAST(SUM(m) OVER (PARTITION BY grp) AS BIGINT) AS n_grp
         |  FROM per),
         |sx AS (SELECT grp, t, d1, d2, d1 + d2 AS d,
         |    n_grp - cum_m + m AS n_at_risk FROM r),
         |f AS (SELECT grp, t, d1, d2, n_at_risk,
         |    ${graft.operators.Survival.kmLnNanoSql} AS ln_nano,
         |    ${graft.operators.Survival.kmZeroFlagSql} AS zf FROM sx),
         |c AS (SELECT grp, t, d1, d2, n_at_risk, ln_nano, zf,
         |    CAST(SUM(ln_nano) OVER (PARTITION BY grp ORDER BY t)
         |      AS BIGINT) AS cum_ln_nano,
         |    CAST(SUM(zf) OVER (PARTITION BY grp ORDER BY t) AS BIGINT)
         |      AS cum_zf
         |  FROM f),
         |i AS (SELECT grp, t, d1, d2, n_at_risk,
         |    ${graft.operators.Survival.ajIncMicroSql("d1")}
         |      AS inc1_micro,
         |    ${graft.operators.Survival.ajIncMicroSql("d2")}
         |      AS inc2_micro
         |  FROM c)
         |SELECT grp, t, n_at_risk, d1, d2,
         |  round(CAST(SUM(inc1_micro) OVER (PARTITION BY grp ORDER BY t)
         |    AS DOUBLE) / 1e6, 6) AS cif1,
         |  round(CAST(SUM(inc2_micro) OVER (PARTITION BY grp ORDER BY t)
         |    AS DOUBLE) / 1e6, 6) AS cif2
         |FROM i QUALIFY d1 + d2 > 0""".stripMargin,
    "q_kaplan_meier" ->
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
         |  FROM f)
         |SELECT grp, t, n_at_risk, d,
         |  ${graft.operators.Survival.kmSurvivalSql} AS survival
         |FROM c WHERE d > 0""".stripMargin,
    "q_logrank" ->
      s"""WITH u AS (SELECT user_id, epoch_ms(ts) AS ms,
         |    event_type = 'error' AS is_err FROM events),
         |agg AS (SELECT user_id, MIN(ms) AS first_ms, MAX(ms) AS last_ms,
         |    MIN(CASE WHEN is_err THEN ms END) AS err_ms
         |  FROM u GROUP BY 1),
         |subj AS (SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS g1,
         |    (COALESCE(err_ms, last_ms) - first_ms) // 3600000 AS t,
         |    CASE WHEN err_ms IS NOT NULL THEN 1 ELSE 0 END AS ev
         |  FROM agg),
         |per AS (SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
         |    CAST(SUM(g1 * ev) AS BIGINT) AS d1,
         |    CAST(COUNT(*) AS BIGINT) AS m, CAST(SUM(g1) AS BIGINT) AS m1
         |  FROM subj GROUP BY 1),
         |r AS (SELECT t, d, d1, m, m1,
         |    CAST(SUM(m) OVER (ORDER BY t) AS BIGINT) AS cum_m,
         |    CAST(SUM(m1) OVER (ORDER BY t) AS BIGINT) AS cum_m1,
         |    CAST(SUM(m) OVER () AS BIGINT) AS n_tot,
         |    CAST(SUM(m1) OVER () AS BIGINT) AS n1_tot
         |  FROM per),
         |s AS (SELECT t, d, d1, n_tot - cum_m + m AS n_at_risk,
         |    n1_tot - cum_m1 + m1 AS n1_at_risk
         |  FROM r WHERE d > 0),
         |f AS (SELECT d, ${graft.operators.Survival.lrOmeNanoSql} AS ome_nano,
         |    ${graft.operators.Survival.lrVarNanoSql} AS v_nano FROM s),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_times,
         |    CAST(SUM(d) AS BIGINT) AS events,
         |    CAST(SUM(ome_nano) AS BIGINT) AS ome_nano,
         |    CAST(SUM(v_nano) AS BIGINT) AS v_nano FROM f)
         |SELECT n_times, events, ome_nano, v_nano,
         |  ${graft.operators.Survival.lrChi2Sql} AS chi2,
         |  ${graft.operators.Survival.lrChi2Sql} > 3.841459 AS significant
         |FROM a""".stripMargin,
    "q_mcnemar" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_purch,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_click
         |  FROM events GROUP BY 1),
         |p AS (SELECT (spend > 330000) = (n_purch >= 15) AS ok_a,
         |    (n_click >= 20) = (n_purch >= 15) AS ok_b FROM users),
         |agg AS (SELECT
         |    CAST(SUM(CASE WHEN ok_a AND NOT ok_b THEN 1 ELSE 0 END)
         |      AS BIGINT) AS b_only_a,
         |    CAST(SUM(CASE WHEN NOT ok_a AND ok_b THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c_only_b,
         |    CAST(SUM(CASE WHEN ok_a = ok_b THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_concordant
         |  FROM p)
         |SELECT b_only_a, c_only_b, n_concordant,
         |  ${graft.operators.Profiling.mcnemarSql} AS chi2,
         |  ${graft.operators.Profiling.mcnemarSql} > 3.841459 AS significant
         |FROM agg""".stripMargin,
    "q_brown_forsythe" ->
      s"""WITH u AS (SELECT event_type AS g,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS v FROM events),
         |per AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS w
         |  FROM u GROUP BY 1, 2),
         |c AS (SELECT g, v, w, CAST(SUM(w) OVER (PARTITION BY g
         |    ORDER BY v) AS BIGINT) AS cum_w FROM per),
         |tot AS (SELECT g, CAST(SUM(w) AS BIGINT) AS w_total
         |  FROM per GROUP BY 1),
         |med AS (SELECT c.g, MIN(v) AS med FROM c JOIN tot USING (g)
         |  WHERE 2*cum_w >= w_total GROUP BY 1),
         |dev AS (SELECT u.g, abs(u.v - med.med) AS z
         |  FROM u JOIN med USING (g)),
         |perg AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
         |    CAST(SUM(z) AS BIGINT) AS sg,
         |    CAST(SUM(z*z) AS BIGINT) AS ssg FROM dev GROUP BY 1),
         |t AS (SELECT ng, sg, ssg,
         |    CAST(${graft.operators.Eval.sqOverNWhole("sg", "ng", "//")}
         |      AS BIGINT) AS tg_whole,
         |    CAST(${graft.operators.Eval.sqOverNFracMilli("sg", "ng", "//")}
         |      AS BIGINT) AS tg_frac FROM perg),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS g,
         |    CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(sg) AS BIGINT) AS s,
         |    CAST(SUM(ssg) AS BIGINT) AS ss,
         |    CAST(SUM(tg_whole) AS BIGINT) AS t_whole,
         |    CAST(SUM(tg_frac) AS BIGINT) AS t_frac FROM t)
         |SELECT g, n, s, ss, t_whole, t_frac,
         |  ${graft.operators.Eval.anovaSsbSql("//")} AS ssb,
         |  ${graft.operators.Eval.anovaSswSql} AS ssw,
         |  ${graft.operators.Eval.anovaFSql("//")} AS f_stat
         |FROM agg""".stripMargin,
    "q_mcc" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    (SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 15)
         |      AS heavy
         |  FROM events GROUP BY 1),
         |p AS (SELECT (spend > 330000) AS pred, heavy FROM users),
         |c AS (SELECT
         |    CAST(SUM(CASE WHEN pred AND heavy THEN 1 ELSE 0 END) AS BIGINT)
         |      AS tp,
         |    CAST(SUM(CASE WHEN pred AND NOT heavy THEN 1 ELSE 0 END)
         |      AS BIGINT) AS fp,
         |    CAST(SUM(CASE WHEN NOT pred AND NOT heavy THEN 1 ELSE 0 END)
         |      AS BIGINT) AS tn,
         |    CAST(SUM(CASE WHEN NOT pred AND heavy THEN 1 ELSE 0 END)
         |      AS BIGINT) AS fn FROM p)
         |SELECT tp, fp, tn, fn, ${graft.operators.Profiling.mccSql} AS mcc
         |FROM c""".stripMargin,
    "q_sign_test" -> signTestOracleSql,
    // the streaming tier drains to the identical per-user paired table —
    // ONE oracle text serves both (the q_stream_wilson pattern)
    "q_stream_sign_test" -> signTestOracleSql,
    "q_g_test" ->
      s"""WITH d AS (SELECT lang,
         |    CASE WHEN n_chars >= 380 THEN 'long'
         |      WHEN n_chars >= 220 THEN 'mid' ELSE 'short' END
         |      AS len_tier FROM documents),
         |cells AS (SELECT lang, len_tier,
         |    CAST(COUNT(*) AS BIGINT) AS obs FROM d GROUP BY 1, 2),
         |rr AS (SELECT lang, CAST(SUM(obs) AS BIGINT) AS nr
         |  FROM cells GROUP BY 1),
         |cc AS (SELECT len_tier, CAST(SUM(obs) AS BIGINT) AS nc
         |  FROM cells GROUP BY 1),
         |tt AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM cells),
         |j AS (SELECT obs, nr, nc, n
         |  FROM cells JOIN rr USING (lang) JOIN cc USING (len_tier), tt),
         |w AS (SELECT n, ${graft.operators.Profiling.gCellMicroSql}
         |    AS term_micro FROM j),
         |a AS (SELECT
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM rr) AS r,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM cc) AS c,
         |    MAX(n) AS n,
         |    CAST(SUM(term_micro) AS BIGINT) AS g_micro FROM w)
         |SELECT r, c, n, g_micro,
         |  ${graft.operators.Profiling.gSql} AS g,
         |  CAST((r - 1) * (c - 1) AS BIGINT) AS df,
         |  ${graft.operators.Profiling.chi2Crit95Sql("(r - 1) * (c - 1)")}
         |    AS chi2_crit,
         |  ${graft.operators.Profiling.gSql} >
         |    ${graft.operators.Profiling.chi2Crit95Sql("(r - 1) * (c - 1)")}
         |    AS significant
         |FROM a""".stripMargin,
    "q_risk_ratio" -> riskRatioOracleSql,
    // the streaming tier drains to the identical per-user table —
    // ONE oracle text serves both (the q_stream_wilson pattern)
    "q_stream_risk_ratio" -> riskRatioOracleSql,
    "q_cmh" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) >= 14 AS clicker,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) >= 15 AS heavy
         |  FROM events GROUP BY 1),
         |u2 AS (SELECT CASE WHEN spend >= 360000 THEN 'high'
         |      WHEN spend >= 300000 THEN 'mid' ELSE 'low' END AS s,
         |    clicker AS e0, heavy AS o0 FROM users),
         |st AS (SELECT s,
         |    CAST(SUM(CASE WHEN e0 AND o0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS a,
         |    CAST(SUM(CASE WHEN e0 AND NOT o0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS b,
         |    CAST(SUM(CASE WHEN NOT e0 AND o0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c,
         |    CAST(SUM(CASE WHEN NOT e0 AND NOT o0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS d,
         |    CAST(COUNT(*) AS BIGINT) AS nk
         |  FROM u2 GROUP BY 1 HAVING COUNT(*) > 1),
         |t AS (SELECT a, b, c, d, nk,
         |    ${graft.operators.Profiling.cmhENanoSql} AS e_nano,
         |    ${graft.operators.Profiling.cmhVNanoSql} AS v_nano,
         |    ${graft.operators.Profiling.cmhAdNanoSql} AS adn_nano,
         |    ${graft.operators.Profiling.cmhBcNanoSql} AS bcn_nano
         |  FROM st),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
         |    CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
         |    CAST(SUM(c) AS BIGINT) AS sc, CAST(SUM(d) AS BIGINT) AS sd,
         |    CAST(SUM(e_nano) AS BIGINT) AS se_nano,
         |    CAST(SUM(v_nano) AS BIGINT) AS sv_nano,
         |    CAST(SUM(adn_nano) AS BIGINT) AS sadn_nano,
         |    CAST(SUM(bcn_nano) AS BIGINT) AS sbcn_nano
         |  FROM t)
         |SELECT k, sa, sb, sc, sd, se_nano, sv_nano, sadn_nano, sbcn_nano,
         |  ${graft.operators.Profiling.cmhChi2Sql} AS chi2_mh,
         |  ${graft.operators.Profiling.cmhChi2Sql} > 3.841459
         |    AS significant,
         |  ${graft.operators.Profiling.cmhOrSql} AS or_mh,
         |  ${graft.operators.Profiling.cmhCrudeOrSql} AS or_crude,
         |  ${graft.operators.Profiling.cmhFlipSql} AS simpson_flip
         |FROM agg""".stripMargin,
    "q_wilcoxon_signed" ->
      s"""WITH e AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS cents FROM events),
         |u AS (SELECT user_id,
         |    CAST(SUM(CASE WHEN day % 2 = 0 THEN cents ELSE 0 END)
         |      AS BIGINT) AS x,
         |    CAST(SUM(CASE WHEN day % 2 = 1 THEN cents ELSE 0 END)
         |      AS BIGINT) AS y
         |  FROM e GROUP BY 1),
         |d AS (SELECT ABS(x - y) AS ad, x > y AS pos FROM u
         |  WHERE x <> y),
         |per AS (SELECT ad, CAST(COUNT(*) AS BIGINT) AS nv
         |  FROM d GROUP BY 1),
         |rk AS (SELECT ad,
         |    CAST(SUM(nv) OVER (ORDER BY ad) AS BIGINT) * 2 - nv + 1
         |      AS r2,
         |    CAST(nv AS DECIMAL(38,0)) * nv * nv - nv AS t3t_v
         |  FROM per),
         |tie AS (SELECT CAST(SUM(t3t_v) AS DECIMAL(38,0)) AS t3t FROM rk),
         |m0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
         |    CAST(SUM(CASE WHEN pos THEN r2 ELSE 0 END) AS BIGINT)
         |      AS wpos2
         |  FROM d JOIN rk USING (ad)),
         |f AS (SELECT m, wpos2, t3t FROM m0, tie)
         |SELECT m, wpos2, CAST(t3t AS VARCHAR) AS t3t,
         |  ${graft.operators.Profiling.wsrZSql} AS z,
         |  abs(${graft.operators.Profiling.wsrZSql}) > 1.959964
         |    AS significant
         |FROM f""".stripMargin,
    "q_page_trend" ->
      s"""WITH ut AS (SELECT user_id, event_type,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |kk AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
         |  FROM ut),
         |comp AS (SELECT ut.user_id, ut.event_type, ut.v, k FROM ut, kk
         |  QUALIFY COUNT(*) OVER (PARTITION BY user_id) = k),
         |rk AS (SELECT user_id, event_type, k,
         |    CAST(2 * COUNT(*) OVER (PARTITION BY user_id ORDER BY v
         |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      + COUNT(*) OVER (PARTITION BY user_id, v) + 1 AS BIGINT)
         |      AS r2
         |  FROM comp),
         |rs AS (SELECT k, event_type, CAST(SUM(r2) AS BIGINT) AS r2j
         |  FROM rk GROUP BY 1, 2),
         |ord AS (SELECT event_type,
         |    CAST(ROW_NUMBER() OVER (ORDER BY event_type) AS BIGINT) AS cj
         |  FROM (SELECT DISTINCT event_type FROM rs) q),
         |bt AS (SELECT k, CAST(SUM(cj * r2j) AS BIGINT) AS l2
         |  FROM rs JOIN ord USING (event_type) GROUP BY 1),
         |tt AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_items
         |  FROM rk),
         |f AS (SELECT * FROM bt, tt)
         |SELECT k, l2, n_items,
         |  ${graft.operators.Profiling.pageZSql} AS z,
         |  abs(${graft.operators.Profiling.pageZSql}) > 1.959964
         |    AS significant
         |FROM f""".stripMargin,
    "q_link_predictors" ->
      s"""WITH e0 AS MATERIALIZED (SELECT a.l_partkey AS src,
        |    b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2),
        |es AS MATERIALIZED (SELECT src, dst FROM e0
        |  UNION SELECT dst, src FROM e0),
        |deg AS MATERIALIZED (SELECT src AS w,
        |    CAST(COUNT(*) AS BIGINT) AS deg FROM es GROUP BY 1),
        |centers AS MATERIALIZED (SELECT w,
        |    CAST(ROUND(1000000.0 / deg, 0) AS BIGINT) AS ra_contrib
        |  FROM deg WHERE deg >= 2),
        |wedges AS (SELECT x.src AS w, x.dst AS a, y.dst AS b
        |  FROM es x JOIN es y ON x.src = y.src AND x.dst < y.dst),
        |scored AS (SELECT a, b,
        |    CAST(SUM(ra_contrib) AS BIGINT) AS ra_micro,
        |    CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM wedges JOIN centers USING (w) GROUP BY 1, 2),
        |wd AS (SELECT s.a, s.b, s.n_common, s.ra_micro,
        |    da.deg AS deg_a, db.deg AS deg_b
        |  FROM scored s JOIN deg da ON da.w = s.a
        |    JOIN deg db ON db.w = s.b),
        |f AS (SELECT a, b, n_common, deg_a, deg_b,
        |    ${graft.operators.Graph.jaccardMicroSql} AS jaccard_micro,
        |    CAST(deg_a * deg_b AS BIGINT) AS pref_attach, ra_micro
        |  FROM wd)
        |SELECT a, b, n_common, deg_a, deg_b, jaccard_micro, pref_attach,
        |  ra_micro
        |FROM f s
        |WHERE NOT EXISTS (SELECT 1 FROM es
        |  WHERE es.src = s.a AND es.dst = s.b)
        |ORDER BY ra_micro DESC, a, b LIMIT 20""".stripMargin,
    "q_cvm" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) >= 14 AS clicker
         |  FROM events GROUP BY 1),
         |per AS (SELECT spend AS v,
         |    CAST(SUM(CASE WHEN clicker THEN 1 ELSE 0 END) AS BIGINT)
         |      AS c1,
         |    CAST(SUM(CASE WHEN clicker THEN 0 ELSE 1 END) AS BIGINT)
         |      AS c2
         |  FROM users GROUP BY 1),
         |c AS (SELECT v, c1, c2,
         |    CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS cum1,
         |    CAST(SUM(c2) OVER (ORDER BY v) AS BIGINT) AS cum2 FROM per),
         |tt AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
         |    CAST(SUM(c2) AS BIGINT) AS n2 FROM per),
         |w AS (SELECT n1, n2,
         |    CAST(c1 + c2 AS DECIMAL(38,0)) *
         |      (CAST(cum1 AS DECIMAL(38,0)) * n2
         |        - CAST(cum2 AS DECIMAL(38,0)) * n1) *
         |      (CAST(cum1 AS DECIMAL(38,0)) * n2
         |        - CAST(cum2 AS DECIMAL(38,0)) * n1) AS term
         |  FROM c, tt),
         |a AS (SELECT n1, n2, CAST(SUM(term) AS DECIMAL(38,0)) AS num
         |  FROM w GROUP BY 1, 2)
         |SELECT n1, n2, CAST(num AS VARCHAR) AS num,
         |  ${graft.operators.Profiling.cvmTSql} AS t,
         |  ${graft.operators.Profiling.cvmTSql} > 0.461249 AS significant
         |FROM a""".stripMargin,
    "q_jonckheere" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_purch
         |  FROM events GROUP BY 1),
         |u2 AS (SELECT CASE WHEN n_purch >= 20 THEN '3_high'
         |      WHEN n_purch >= 12 THEN '2_mid' ELSE '1_low' END AS g,
         |    spend AS v FROM users),
         |per AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS nv
         |  FROM u2 GROUP BY 1, 2),
         |vals AS (SELECT DISTINCT v FROM per),
         |grps AS (SELECT DISTINCT g FROM per),
         |grid AS (SELECT grps.g, vals.v, COALESCE(per.nv, 0) AS nv
         |  FROM vals CROSS JOIN grps
         |  LEFT JOIN per ON per.g = grps.g AND per.v = vals.v),
         |c AS (SELECT g, v, nv,
         |    CAST(SUM(nv) OVER (PARTITION BY g ORDER BY v) AS BIGINT)
         |      AS cum FROM grid),
         |jj AS (SELECT CAST(SUM(CAST(y.nv AS DECIMAL(38,0)) *
         |      (x.cum * 2 - x.nv)) AS DECIMAL(38,0)) AS j2
         |  FROM c x JOIN c y ON x.v = y.v AND x.g < y.g),
         |sz AS (SELECT g, CAST(SUM(nv) AS BIGINT) AS ng
         |  FROM per GROUP BY 1),
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
         |    CAST(SUM(ng) AS BIGINT) AS n,
         |    CAST(SUM(CAST(ng AS DECIMAL(38,0)) * ng) AS DECIMAL(38,0))
         |      AS sg2,
         |    CAST(SUM(CAST(ng AS DECIMAL(38,0)) * ng * (ng * 2 + 3))
         |      AS DECIMAL(38,0)) AS sg23 FROM sz),
         |f AS (SELECT * FROM jj, mm)
         |SELECT CAST(j2 AS VARCHAR) AS j2, k, n,
         |  CAST(sg2 AS VARCHAR) AS sg2, CAST(sg23 AS VARCHAR) AS sg23,
         |  ${graft.operators.Profiling.jtZSql} AS z,
         |  abs(${graft.operators.Profiling.jtZSql}) > 1.959964
         |    AS significant
         |FROM f""".stripMargin,
    "q_granger" -> {
      val solve = graft.operators.TimeSeries.grangerSolve.toMap
      s"""WITH d AS (SELECT 'c' || CAST(user_id % 2 AS VARCHAR) AS cohort,
         |    epoch_ms(ts) // 86400000 AS day,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS y,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS x
         |  FROM events GROUP BY 1, 2),
         |l AS (SELECT cohort, y, x,
         |    lag(y) OVER (PARTITION BY cohort ORDER BY day) AS yl,
         |    lag(x) OVER (PARTITION BY cohort ORDER BY day) AS xl
         |  FROM d),
         |m AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(yl) AS BIGINT) AS s1,
         |    CAST(SUM(xl) AS BIGINT) AS s2,
         |    CAST(SUM(yl*yl) AS BIGINT) AS s11,
         |    CAST(SUM(yl*xl) AS BIGINT) AS s12,
         |    CAST(SUM(xl*xl) AS BIGINT) AS s22,
         |    CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(yl*y) AS BIGINT) AS s1y,
         |    CAST(SUM(xl*y) AS BIGINT) AS s2y,
         |    CAST(SUM(y*y) AS BIGINT) AS syy
         |  FROM l WHERE yl IS NOT NULL AND xl IS NOT NULL GROUP BY 1)
         |SELECT cohort, n, s1, s2, s11, s12, s22, sy, s1y, s2y, syy,
         |  ${solve("b_yl")} AS b_yl,
         |  ${solve("b_xl")} AS b_xl,
         |  ${solve("f_stat")} AS f_stat,
         |  ${solve("significant")} AS significant
         |FROM m""".stripMargin
    },
    "q_hill_tail" ->
      s"""WITH tk AS (SELECT lang AS g,
         |    unnest(string_split(text, ' ')) AS tok FROM documents),
         |cnt AS (SELECT g, tok, CAST(COUNT(*) AS BIGINT) AS c FROM tk
         |  WHERE tok <> '' GROUP BY 1, 2),
         |tail AS (SELECT g, ${graft.operators.TextAnalysis.hillLnNanoSql(2L)}
         |    AS ln_nano FROM cnt WHERE c >= 2),
         |a AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS m_tail,
         |    CAST(SUM(ln_nano) AS BIGINT) AS sln_nano
         |  FROM tail GROUP BY 1)
         |SELECT g AS lang, m_tail, sln_nano,
         |  ${graft.operators.TextAnalysis.hillAlphaSql} AS alpha
         |FROM a""".stripMargin,
    "q_yules_k" ->
      s"""WITH tk AS (SELECT source AS g,
         |    unnest(string_split(text, ' ')) AS tok FROM documents),
         |cnt AS (SELECT g, tok, CAST(COUNT(*) AS BIGINT) AS c FROM tk
         |  WHERE tok <> '' GROUP BY 1, 2),
         |a AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS vocab,
         |    CAST(SUM(c) AS BIGINT) AS n_tokens,
         |    CAST(SUM(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0))
         |      AS s2
         |  FROM cnt GROUP BY 1)
         |SELECT g AS source, n_tokens, vocab, CAST(s2 AS VARCHAR) AS s2,
         |  ${graft.operators.TextAnalysis.yulesKSql} AS yules_k
         |FROM a""".stripMargin,
    "q_forecast_skill" ->
      s"""WITH pd AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |l AS (SELECT event_type, v,
         |    lag(v, 1) OVER (PARTITION BY event_type ORDER BY day) AS l1,
         |    lag(v, 7) OVER (PARTITION BY event_type ORDER BY day) AS ls
         |  FROM pd),
         |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(ABS(v - l1)) AS BIGINT) AS sae_naive,
         |    CAST(SUM(ABS(v - ls)) AS BIGINT) AS sae_season
         |  FROM l WHERE l1 IS NOT NULL AND ls IS NOT NULL GROUP BY 1)
         |SELECT event_type, n, sae_naive, sae_season,
         |  ${graft.operators.TimeSeries.naiveSkillSql} AS skill
         |FROM a""".stripMargin,
    "q_nelson_aalen" ->
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
         |    ${graft.operators.Survival.naHazardNanoSql} AS h_nano
         |  FROM s),
         |c AS (SELECT grp, t, d, n_at_risk,
         |    CAST(SUM(h_nano) OVER (PARTITION BY grp ORDER BY t)
         |      AS BIGINT) AS cum_h_nano
         |  FROM f)
         |SELECT grp, t, n_at_risk, d,
         |  ${graft.operators.Survival.naCumHazardSql} AS cum_hazard,
         |  ${graft.operators.Survival.naBreslowSql} AS surv_breslow
         |FROM c WHERE d > 0""".stripMargin,
    "q_harmonic_centrality" ->
      """WITH e0 AS MATERIALIZED (SELECT a.l_partkey AS src,
        |    b.l_partkey AS dst
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2),
        |es AS MATERIALIZED (SELECT src, dst FROM e0
        |  UNION SELECT dst, src FROM e0),
        |lm AS MATERIALIZED (SELECT src AS u FROM es GROUP BY 1
        |  ORDER BY 1 LIMIT 8),
        |d0 AS MATERIALIZED (SELECT u AS lm, u AS v FROM lm),
        |n1 AS MATERIALIZED (
        |  SELECT DISTINCT d0.lm, es.dst AS v FROM d0
        |    JOIN es ON es.src = d0.v
        |  EXCEPT SELECT lm, v FROM d0),
        |p1 AS MATERIALIZED (SELECT lm, v FROM d0
        |  UNION SELECT lm, v FROM n1),
        |n2 AS MATERIALIZED (
        |  SELECT DISTINCT n1.lm, es.dst AS v FROM n1
        |    JOIN es ON es.src = n1.v
        |  EXCEPT SELECT lm, v FROM p1),
        |p2 AS MATERIALIZED (SELECT lm, v FROM p1
        |  UNION SELECT lm, v FROM n2),
        |n3 AS MATERIALIZED (
        |  SELECT DISTINCT n2.lm, es.dst AS v FROM n2
        |    JOIN es ON es.src = n2.v
        |  EXCEPT SELECT lm, v FROM p2),
        |alld AS (SELECT lm, v, 1 AS d FROM n1
        |  UNION ALL SELECT lm, v, 2 FROM n2
        |  UNION ALL SELECT lm, v, 3 FROM n3)
        |SELECT v,
        |  CAST(SUM(CAST(ROUND(1000000.0 / d, 0) AS BIGINT)) AS BIGINT)
        |    AS harmonic_micro,
        |  CAST(COUNT(*) AS BIGINT) AS n_reached
        |FROM alld GROUP BY 1
        |ORDER BY harmonic_micro DESC, v LIMIT 20""".stripMargin,
    "q_gof_dow" ->
      s"""WITH e AS (SELECT event_type,
         |    (epoch_ms(ts) // 86400000) % 7 AS dow FROM events),
         |cells AS (SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS o
         |  FROM e GROUP BY 1, 2),
         |kk AS (SELECT CAST(COUNT(DISTINCT dow) AS BIGINT) AS k
         |  FROM cells),
         |tot AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS n
         |  FROM cells GROUP BY 1),
         |d AS (SELECT c.event_type, k, n,
         |    CAST(o AS DECIMAL(38,0)) * k - n AS dev
         |  FROM cells c JOIN tot USING (event_type), kk),
         |a AS (SELECT event_type, k, n,
         |    CAST(COUNT(*) AS BIGINT) AS k_obs,
         |    CAST(SUM(dev * dev) AS DECIMAL(38,0)) AS sdev2
         |  FROM d GROUP BY 1, 2, 3)
         |SELECT event_type, k, n, k_obs,
         |  CAST(sdev2 AS VARCHAR) AS sdev2,
         |  ${graft.operators.Profiling.gofChi2Sql} AS chi2,
         |  CAST(k - 1 AS BIGINT) AS df,
         |  ${graft.operators.Profiling.chi2Crit95Sql("k - 1")}
         |    AS chi2_crit,
         |  ${graft.operators.Profiling.gofChi2Sql} >
         |    ${graft.operators.Profiling.chi2Crit95Sql("k - 1")}
         |    AS significant
         |FROM a""".stripMargin,
    "q_shift_function" ->
      """WITH users AS (SELECT user_id,
        |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
        |      AS spend,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) >= 15 AS heavy
        |  FROM events GROUP BY 1),
        |qa AS (SELECT quantile_cont(spend,
        |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS q
        |  FROM users WHERE heavy),
        |qb AS (SELECT quantile_cont(spend,
        |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS q
        |  FROM users WHERE NOT heavy),
        |ea AS (SELECT generate_subscripts(q, 1) AS i, unnest(q) AS v
        |  FROM qa),
        |eb AS (SELECT generate_subscripts(q, 1) AS i, unnest(q) AS v
        |  FROM qb)
        |SELECT CAST(ea.i * 10 AS BIGINT) AS decile,
        |  round(ea.v, 6) AS q_a, round(eb.v, 6) AS q_b,
        |  round(ea.v - eb.v, 6) AS shift
        |FROM ea JOIN eb ON ea.i = eb.i""".stripMargin,
    "q_capture_recapture" ->
      s"""WITH ids AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS id
         |  FROM events),
         |h AS (SELECT
         |    CAST('0x' || substr(md5('capA:' || id), 1, 15) AS BIGINT)
         |      % 2 = 0 AS in_a,
         |    CAST('0x' || substr(md5('capB:' || id), 1, 15) AS BIGINT)
         |      % 2 = 0 AS in_b
         |  FROM ids),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_distinct,
         |    CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(SUM(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |    CAST(SUM(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END)
         |      AS BIGINT) AS m
         |  FROM h)
         |SELECT exact_distinct, n1, n2, m,
         |  ${graft.operators.Sampling.chapmanSql} AS est,
         |  CASE WHEN exact_distinct > 0 THEN
         |    round(abs(${graft.operators.Sampling.chapmanSql} /
         |      exact_distinct - 1), 6) END AS rel_err
         |FROM a""".stripMargin,
    "q_bowker" ->
      s"""WITH e AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS cents FROM events),
         |u AS (SELECT user_id,
         |    CAST(SUM(CASE WHEN day % 2 = 0 THEN cents ELSE 0 END)
         |      AS BIGINT) AS x,
         |    CAST(SUM(CASE WHEN day % 2 = 1 THEN cents ELSE 0 END)
         |      AS BIGINT) AS y
         |  FROM e GROUP BY 1),
         |t AS (SELECT
         |    CASE WHEN x >= 180000 THEN 'h' WHEN x >= 150000 THEN 'm'
         |      ELSE 'l' END AS i,
         |    CASE WHEN y >= 180000 THEN 'h' WHEN y >= 150000 THEN 'm'
         |      ELSE 'l' END AS j
         |  FROM u),
         |cells AS (SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n FROM t
         |  WHERE i <> j GROUP BY 1, 2),
         |pairs AS (SELECT least(i, j) AS lo, greatest(i, j) AS hi,
         |    CAST(SUM(CASE WHEN i < j THEN n ELSE 0 END) AS BIGINT)
         |      AS nij,
         |    CAST(SUM(CASE WHEN i > j THEN n ELSE 0 END) AS BIGINT)
         |      AS nji
         |  FROM cells GROUP BY 1, 2),
         |w AS (SELECT ${graft.operators.Profiling.bowkerTermMicroSql}
         |    AS term_micro FROM pairs),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
         |    CAST(SUM(term_micro) AS BIGINT) AS chi2_micro FROM w)
         |SELECT m, chi2_micro,
         |  ${graft.operators.Profiling.bowkerChi2Sql} AS chi2,
         |  m AS df,
         |  ${graft.operators.Profiling.chi2Crit95Sql("m")} AS chi2_crit,
         |  ${graft.operators.Profiling.bowkerChi2Sql} >
         |    ${graft.operators.Profiling.chi2Crit95Sql("m")}
         |    AS significant
         |FROM a""".stripMargin,
    "q_atkinson" ->
      s"""WITH u AS (SELECT event_type, user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS cents
         |  FROM events GROUP BY 1, 2),
         |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(cents) AS BIGINT) AS sx,
         |    CAST(SUM(CAST(ROUND(LN(CAST(cents AS DOUBLE)) * 1000000000,
         |      0) AS BIGINT)) AS BIGINT) AS sln_nano
         |  FROM u WHERE cents > 0 GROUP BY 1)
         |SELECT event_type, n, sx, sln_nano,
         |  ${graft.operators.Eval.atkinsonSql} AS atkinson
         |FROM a""".stripMargin,
    "q_theil_index" ->
      s"""WITH u AS (SELECT event_type, user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS cents
         |  FROM events GROUP BY 1, 2),
         |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(cents) AS BIGINT) AS sx,
         |    CAST(SUM(CAST(ROUND(cents * LN(CAST(cents AS DOUBLE)) *
         |      1000, 0) AS BIGINT)) AS BIGINT) AS sxlx_milli
         |  FROM u WHERE cents > 0 GROUP BY 1)
         |SELECT event_type, n, sx, sxlx_milli,
         |  ${graft.operators.Eval.theilSql} AS theil
         |FROM a""".stripMargin,
    "q_risk_diff" ->
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
         |  ${graft.operators.Profiling.rdSql} AS risk_diff,
         |  ${graft.operators.Profiling.rdCiSql("-")} AS rd_lo,
         |  ${graft.operators.Profiling.rdCiSql("+")} AS rd_hi,
         |  ${graft.operators.Profiling.rdZSql} AS z,
         |  ${graft.operators.Profiling.nntSql} AS nnt
         |FROM x""".stripMargin,
    "q_rank_tau" ->
      s"""WITH parts AS (SELECT l_partkey,
         |    CAST(SUM(CAST(ROUND(l_extendedprice*100, 0) AS BIGINT))
         |      AS BIGINT) AS revenue,
         |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
         |  FROM lineitem GROUP BY 1),
         |ta AS (SELECT l_partkey AS id,
         |    CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, l_partkey)
         |      AS BIGINT) AS ra
         |  FROM parts QUALIFY ra <= 100),
         |tb AS (SELECT l_partkey AS id,
         |    CAST(ROW_NUMBER() OVER (ORDER BY qty DESC, l_partkey)
         |      AS BIGINT) AS rb
         |  FROM parts QUALIFY rb <= 100),
         |sh AS (SELECT id, ra, rb FROM ta JOIN tb USING (id)),
         |pr AS (SELECT
         |    CAST(SUM(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) > 0
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_con,
         |    CAST(SUM(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) < 0
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_dis
         |  FROM sh x JOIN sh y ON x.id < y.id),
         |ft AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
         |    CAST(SUM(ABS(ra - rb)) AS BIGINT) AS footrule FROM sh),
         |f AS (SELECT CAST(100 AS BIGINT) AS k, m, n_con, n_dis,
         |    footrule FROM pr, ft)
         |SELECT k, m, n_con, n_dis, footrule,
         |  ${graft.operators.Eval.rankTauSql} AS tau
         |FROM f""".stripMargin,
    "q_rbo" ->
      s"""WITH parts AS (SELECT l_partkey,
         |    CAST(SUM(CAST(ROUND(l_extendedprice*100, 0) AS BIGINT))
         |      AS BIGINT) AS revenue,
         |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
         |  FROM lineitem GROUP BY 1),
         |ta AS (SELECT l_partkey AS id,
         |    CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, l_partkey)
         |      AS BIGINT) AS ra
         |  FROM parts QUALIFY ra <= 100),
         |tb AS (SELECT l_partkey AS id,
         |    CAST(ROW_NUMBER() OVER (ORDER BY qty DESC, l_partkey)
         |      AS BIGINT) AS rb
         |  FROM parts QUALIFY rb <= 100),
         |j AS (SELECT greatest(ra, rb) AS maxr FROM ta JOIN tb USING (id)),
         |cnt AS (SELECT maxr, CAST(COUNT(*) AS BIGINT) AS c FROM j
         |  GROUP BY 1),
         |spine AS (SELECT CAST(gs.generate_series AS BIGINT) AS d
         |  FROM generate_series(1, 100) gs),
         |cum AS (SELECT d, CAST(SUM(COALESCE(c, 0)) OVER (ORDER BY d)
         |      AS BIGINT) AS agree
         |  FROM spine LEFT JOIN cnt ON cnt.maxr = spine.d),
         |t AS (SELECT d, agree,
         |    ${graft.operators.Eval.rboTermMicroSql} AS term_micro
         |  FROM cum),
         |a AS (SELECT CAST(MAX(d) AS BIGINT) AS k,
         |    CAST(MAX(agree) AS BIGINT) AS n_both,
         |    CAST(SUM(term_micro) AS BIGINT) AS rbo_micro FROM t)
         |SELECT k, n_both, rbo_micro,
         |  ${graft.operators.Eval.rboSql} AS rbo
         |FROM a""".stripMargin,
    "q_woolf" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) >= 14 AS clicker,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) >= 15 AS heavy
         |  FROM events GROUP BY 1),
         |u2 AS (SELECT CASE WHEN spend >= 360000 THEN 'high'
         |      WHEN spend >= 300000 THEN 'mid' ELSE 'low' END AS s,
         |    clicker AS e0, heavy AS o0 FROM users),
         |st AS (SELECT s,
         |    CAST(SUM(CASE WHEN e0 AND o0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS a,
         |    CAST(SUM(CASE WHEN e0 AND NOT o0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS b,
         |    CAST(SUM(CASE WHEN NOT e0 AND o0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c,
         |    CAST(SUM(CASE WHEN NOT e0 AND NOT o0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS d
         |  FROM u2 GROUP BY 1),
         |ok0 AS (SELECT *,
         |    (a > 0 AND b > 0 AND c > 0 AND d > 0) AS ok FROM st),
         |t AS (SELECT ok,
         |    ${graft.operators.Profiling.woolfWMicroSql} AS w_micro,
         |    ${graft.operators.Profiling.woolfWlMicroSql} AS wl_micro,
         |    ${graft.operators.Profiling.woolfWl2MicroSql} AS wl2_micro
         |  FROM ok0),
         |agg AS (SELECT
         |    CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT)
         |      AS k_used,
         |    CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT)
         |      AS k_dropped,
         |    CAST(SUM(w_micro) AS BIGINT) AS sw_micro,
         |    CAST(SUM(wl_micro) AS BIGINT) AS swl_micro,
         |    CAST(SUM(wl2_micro) AS BIGINT) AS swl2_micro
         |  FROM t)
         |SELECT k_used, k_dropped, sw_micro, swl_micro, swl2_micro,
         |  ${graft.operators.Profiling.woolfChi2Sql} AS chi2,
         |  CAST(greatest(k_used - 1, 0) AS BIGINT) AS df,
         |  ${graft.operators.Profiling.chi2Crit95Sql("k_used - 1")}
         |    AS chi2_crit,
         |  ${graft.operators.Profiling.woolfChi2Sql} >
         |    ${graft.operators.Profiling.chi2Crit95Sql("k_used - 1")}
         |    AS significant
         |FROM agg""".stripMargin,
    "q_cronbach_alpha" ->
      s"""WITH ut AS (SELECT user_id, event_type,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS v
         |  FROM events GROUP BY 1, 2),
         |kk AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
         |  FROM ut),
         |comp AS (SELECT ut.user_id, ut.event_type, ut.v, k FROM ut, kk
         |  QUALIFY COUNT(*) OVER (PARTITION BY user_id) = k),
         |it AS (SELECT k, event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(v) AS BIGINT) AS s,
         |    CAST(SUM(CAST(v AS DECIMAL(38,0)) * v) AS DECIMAL(38,0))
         |      AS sq
         |  FROM comp GROUP BY 1, 2),
         |iv AS (SELECT k, n,
         |    ${graft.operators.Profiling.cronbachItemVarMilliSql}
         |      AS var_milli FROM it),
         |ia AS (SELECT k, CAST(MAX(n) AS BIGINT) AS n_units,
         |    CAST(SUM(var_milli) AS BIGINT) AS sum_var_milli
         |  FROM iv GROUP BY 1),
         |tt AS (SELECT user_id, CAST(SUM(v) AS BIGINT) AS t FROM comp
         |  GROUP BY 1),
         |ta AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt,
         |    CAST(SUM(t) AS BIGINT) AS st,
         |    CAST(SUM(CAST(t AS DECIMAL(38,0)) * t) AS DECIMAL(38,0))
         |      AS stq FROM tt),
         |f AS (SELECT * FROM ia, ta)
         |SELECT k, n_units, sum_var_milli,
         |  ${graft.operators.Profiling.cronbachAlphaSql} AS alpha
         |FROM f""".stripMargin,
    "q_spiegelhalter" ->
      s"""WITH e AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS __s,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |  FROM events),
         |mm AS (SELECT MIN(__s) AS lo, MAX(__s) AS hi FROM e),
         |t AS (SELECT
         |    ${graft.operators.Eval.spiegelNumMicroSql} AS num_micro,
         |    ${graft.operators.Eval.spiegelDenMicroSql} AS den_micro
         |  FROM e, mm),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(num_micro) AS BIGINT) AS snum_micro,
         |    CAST(SUM(den_micro) AS BIGINT) AS sden_micro FROM t)
         |SELECT n, snum_micro, sden_micro,
         |  ${graft.operators.Eval.spiegelZSql} AS z,
         |  abs(${graft.operators.Eval.spiegelZSql}) > 1.959964
         |    AS significant
         |FROM a""".stripMargin,
    "q_hosmer_lemeshow" ->
      s"""WITH e AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS __s,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
         |  FROM events),
         |mm AS (SELECT MIN(__s) AS lo, MAX(__s) AS hi FROM e),
         |b AS (SELECT y,
         |    CASE WHEN hi > lo THEN least(CAST(9 AS BIGINT),
         |      (__s - lo) * 10 // (hi - lo)) ELSE CAST(0 AS BIGINT) END
         |      AS bin,
         |    CAST(ROUND((CASE WHEN hi > lo THEN
         |      CAST(__s - lo AS DOUBLE) / (hi - lo) ELSE
         |      CAST(0 AS DOUBLE) END) * 1000000, 0) AS BIGINT) AS e_micro
         |  FROM e, mm),
         |g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS nb,
         |    CAST(SUM(y) AS BIGINT) AS o1,
         |    CAST(SUM(e_micro) AS BIGINT) AS e1_micro
         |  FROM b GROUP BY 1),
         |t AS (SELECT nb, e1_micro,
         |    (e1_micro > 0 AND e1_micro < nb * 1000000) AS usable,
         |    ${graft.operators.Eval.hlTermMicroSql} AS term_micro
         |  FROM g),
         |a AS (SELECT
         |    CAST(SUM(CASE WHEN usable THEN 1 ELSE 0 END) AS BIGINT)
         |      AS bins_used,
         |    CAST(SUM(CASE WHEN usable THEN 0 ELSE 1 END) AS BIGINT)
         |      AS bins_dropped,
         |    CAST(SUM(CASE WHEN usable THEN term_micro ELSE 0 END)
         |      AS BIGINT) AS hl_micro
         |  FROM t)
         |SELECT bins_used, bins_dropped, hl_micro,
         |  ${graft.operators.Eval.hlChi2Sql} AS hl_chi2,
         |  CAST(greatest(bins_used - 2, 0) AS BIGINT) AS df,
         |  ${graft.operators.Profiling.chi2Crit95Sql("bins_used - 2")}
         |    AS chi2_crit,
         |  ${graft.operators.Eval.hlChi2Sql} >
         |    ${graft.operators.Profiling.chi2Crit95Sql("bins_used - 2")}
         |    AS significant
         |FROM a""".stripMargin,
    "q_tpch_q14" ->
      """WITH li AS (SELECT l_partkey,
        |    CAST(ROUND(l_extendedprice*100, 0) AS BIGINT) *
        |      (100 - CAST(ROUND(l_discount*100, 0) AS BIGINT)) AS disc_cp
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |    AND l_shipdate < TIMESTAMP '1997-10-01'),
        |a AS (SELECT
        |    CAST(SUM(CASE WHEN p_type = 'PROMO' THEN
        |      CAST(disc_cp AS DECIMAL(38,0)) ELSE 0 END)
        |      AS DECIMAL(38,0)) AS promo_cp,
        |    CAST(SUM(CAST(disc_cp AS DECIMAL(38,0))) AS DECIMAL(38,0))
        |      AS total_cp
        |  FROM li JOIN part ON l_partkey = p_partkey)
        |SELECT CAST(promo_cp AS VARCHAR) AS promo_cp,
        |  CAST(total_cp AS VARCHAR) AS total_cp,
        |  CASE WHEN CAST(total_cp AS DOUBLE) > 0 THEN
        |    round(100.0 * CAST(promo_cp AS DOUBLE) /
        |      CAST(total_cp AS DOUBLE), 6) END AS promo_pct
        |FROM a""".stripMargin,
    "q_tpch_q4" ->
      """SELECT o_orderpriority,
        |  CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o_orderdate < TIMESTAMP '1997-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY 1""".stripMargin,
    "q_tpch_q12" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT',
        |    '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1""".stripMargin,
    "q_tpch_q2" ->
      """WITH eur AS (SELECT s_suppkey, s_name,
        |    CAST(ROUND(s_acctbal*100, 0) AS BIGINT) AS s_acctbal_cents,
        |    n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
        |sized AS (SELECT p_partkey FROM part
        |  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'),
        |costs AS (SELECT p_partkey, l_suppkey,
        |    MIN(CAST(ROUND(l_extendedprice*100, 0) AS BIGINT)) AS cost_cents
        |  FROM lineitem JOIN sized ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |ec AS (SELECT c.p_partkey, c.cost_cents, e.s_acctbal_cents,
        |    e.s_name, e.n_name
        |  FROM costs c JOIN eur e ON c.l_suppkey = e.s_suppkey),
        |mc AS (SELECT p_partkey, MIN(cost_cents) AS min_cost
        |  FROM ec GROUP BY 1)
        |SELECT s_acctbal_cents, s_name, n_name, ec.p_partkey, cost_cents
        |FROM ec JOIN mc ON ec.p_partkey = mc.p_partkey
        |  AND ec.cost_cents = mc.min_cost
        |ORDER BY s_acctbal_cents DESC, n_name, s_name, ec.p_partkey
        |LIMIT 100""".stripMargin,
    "q_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(CAST(SUM(CAST(rev AS DECIMAL(38,0))) AS DECIMAL(38,0))
        |    AS VARCHAR) AS revenue_cp,
        |  round(CAST(SUM(CAST(rev AS DECIMAL(38,0))) AS DOUBLE) / 10000,
        |    6) AS revenue
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |    CAST(ROUND(l_extendedprice*100, 0) AS BIGINT) *
        |      (100 - CAST(ROUND(l_discount*100, 0) AS BIGINT)) AS rev
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE n1.n_name IN ('NATION_1', 'NATION_2')
        |    AND n2.n_name IN ('NATION_1', 'NATION_2')
        |    AND n1.n_name <> n2.n_name
        |    AND l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01') x
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_tpch_q8" ->
      """SELECT o_year,
        |  CASE WHEN CAST(SUM(CAST(rev AS DECIMAL(38,0))) AS DOUBLE) > 0
        |    THEN round(
        |      CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN
        |        CAST(rev AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0))
        |        END) AS DOUBLE) /
        |      CAST(SUM(CAST(rev AS DECIMAL(38,0))) AS DOUBLE), 6)
        |  END AS mkt_share,
        |  CAST(CAST(SUM(CAST(rev AS DECIMAL(38,0))) AS DECIMAL(38,0))
        |    AS VARCHAR) AS total_rev_cp
        |FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(ROUND(l_extendedprice*100, 0) AS BIGINT) *
        |      (100 - CAST(ROUND(l_discount*100, 0) AS BIGINT)) AS rev,
        |    n2.n_name AS supp_nation
        |  FROM part JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |    AND r_name = 'AMERICA'
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE p_type = 'ECONOMY'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01') x
        |GROUP BY 1""".stripMargin,
    "q_tpch_q9" ->
      """SELECT nation, o_year,
        |  CAST(CAST(SUM(CAST(amount AS DECIMAL(38,0))) AS DECIMAL(38,0))
        |    AS VARCHAR) AS sum_profit_cp,
        |  round(CAST(SUM(CAST(amount AS DECIMAL(38,0))) AS DOUBLE) /
        |    10000, 6) AS sum_profit
        |FROM (SELECT n_name AS nation,
        |    CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(ROUND(l_extendedprice*100, 0) AS BIGINT) *
        |      (100 - CAST(ROUND(l_discount*100, 0) AS BIGINT)) -
        |    CAST(ROUND(p_retailprice*100, 0) AS BIGINT) * 100 *
        |      CAST(l_quantity AS BIGINT) AS amount
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_name LIKE '%widget%') x
        |GROUP BY 1, 2""".stripMargin,
    "q_tpch_q10" ->
      """SELECT c_custkey, c_name, revenue_cp,
        |  round(CAST(revenue_cp AS DOUBLE) / 10000, 6) AS revenue,
        |  c_acctbal_cents, n_name
        |FROM (SELECT o_custkey, CAST(SUM(rev) AS BIGINT) AS revenue_cp
        |  FROM (SELECT o_custkey,
        |      CAST(ROUND(l_extendedprice*100, 0) AS BIGINT) *
        |        (100 - CAST(ROUND(l_discount*100, 0) AS BIGINT)) AS rev
        |    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |    WHERE o_orderdate >= TIMESTAMP '1997-10-01'
        |      AND o_orderdate < TIMESTAMP '1998-01-01'
        |      AND l_returnflag = 'R') y
        |  GROUP BY 1) a
        |JOIN (SELECT c_custkey, c_name,
        |    CAST(ROUND(c_acctbal*100, 0) AS BIGINT) AS c_acctbal_cents,
        |    n_name
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey) c
        |  ON a.o_custkey = c.c_custkey
        |ORDER BY revenue_cp DESC, c_custkey LIMIT 20""".stripMargin,
    "q_tpch_q11" ->
      """WITH val AS (SELECT l_partkey,
        |    CAST(SUM(CAST(ROUND(l_extendedprice*100, 0) AS BIGINT))
        |      AS BIGINT) AS value_cents
        |  FROM lineitem
        |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
        |    JOIN nation ON s_nationkey = n_nationkey
        |    WHERE n_name = 'NATION_7')
        |  GROUP BY 1)
        |SELECT l_partkey AS p_partkey, value_cents FROM val
        |WHERE value_cents * 1000 > (SELECT SUM(value_cents) FROM val)"""
        .stripMargin,
    "q_tpch_q13" ->
      """WITH co AS (SELECT c_custkey,
        |    CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY 1)
        |SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM co GROUP BY 1""".stripMargin,
    "q_tpch_q15" ->
      """WITH r AS (SELECT l_suppkey,
        |    CAST(SUM(CAST(ROUND(l_extendedprice*100, 0) AS BIGINT) *
        |      (100 - CAST(ROUND(l_discount*100, 0) AS BIGINT)))
        |      AS BIGINT) AS total_rev_cp
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_rev_cp,
        |  round(CAST(total_rev_cp AS DOUBLE) / 10000, 6) AS total_rev
        |FROM supplier JOIN r ON s_suppkey = l_suppkey
        |WHERE total_rev_cp = (SELECT MAX(total_rev_cp) FROM r)"""
        .stripMargin,
    "q_tpch_q16" ->
      """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |    WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_tpch_q17" ->
      """WITH li AS (SELECT l_partkey,
        |    CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(ROUND(l_extendedprice*100, 0) AS BIGINT) AS extc
        |  FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part
        |    WHERE p_brand = 'Brand#3' AND p_size < 10)),
        |pa AS (SELECT l_partkey, SUM(qty) AS sumq,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM li GROUP BY 1)
        |SELECT CAST(SUM(extc) AS BIGINT) AS sum_cents,
        |  round(CAST(SUM(extc) AS DOUBLE) / 100 / 7.0, 6) AS avg_yearly
        |FROM li JOIN pa ON li.l_partkey = pa.l_partkey
        |WHERE qty * 5 * cnt < sumq""".stripMargin,
    "q_tpch_q19" ->
      """SELECT CAST(CAST(SUM(CAST(rev AS DECIMAL(38,0)))
        |    AS DECIMAL(38,0)) AS VARCHAR) AS revenue_cp,
        |  round(CAST(SUM(CAST(rev AS DECIMAL(38,0))) AS DOUBLE) / 10000,
        |    6) AS revenue
        |FROM (SELECT CAST(ROUND(l_extendedprice*100, 0) AS BIGINT) *
        |    (100 - CAST(ROUND(l_discount*100, 0) AS BIGINT)) AS rev
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE l_returnflag = 'N' AND (
        |    (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
        |      AND l_quantity BETWEEN 1 AND 11) OR
        |    (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        |      AND l_quantity BETWEEN 10 AND 20) OR
        |    (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |      AND l_quantity BETWEEN 20 AND 30))) x""".stripMargin,
    "q_tpch_q20" ->
      """WITH yr AS (SELECT l_partkey, l_suppkey,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |    AND l_partkey IN (SELECT p_partkey FROM part
        |      WHERE p_type = 'PROMO')),
        |sp AS (SELECT l_partkey, l_suppkey, SUM(qty) AS sq
        |  FROM yr GROUP BY 1, 2),
        |pt AS (SELECT l_partkey, SUM(qty) AS tq FROM yr GROUP BY 1),
        |qual AS (SELECT DISTINCT sp.l_suppkey AS k
        |  FROM sp JOIN pt ON sp.l_partkey = pt.l_partkey
        |  WHERE sp.sq * 10 > pt.tq * 3)
        |SELECT s_suppkey, s_name FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |  AND n_name IN ('NATION_4', 'NATION_5', 'NATION_6')
        |WHERE s_suppkey IN (SELECT k FROM qual)""".stripMargin,
    "q_tpch_q21" ->
      """WITH l AS (SELECT l_orderkey, l_suppkey,
        |    CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        |      THEN 1 ELSE 0 END AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |    AND o_orderstatus = 'F'),
        |os AS (SELECT l_orderkey,
        |    COUNT(DISTINCT l_suppkey) AS n_supp,
        |    COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END)
        |      AS n_late_supp
        |  FROM l GROUP BY 1)
        |SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM l JOIN os ON l.l_orderkey = os.l_orderkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |WHERE l.late = 1 AND os.n_supp > 1 AND os.n_late_supp = 1
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20"""
        .stripMargin,
    "q_tpch_q22" ->
      """WITH pos AS (SELECT
        |    CAST(SUM(CAST(ROUND(c_acctbal*100, 0) AS BIGINT))
        |      AS BIGINT) AS s,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM customer WHERE c_acctbal > 0),
        |recent AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2000-09-01'),
        |c AS (SELECT c_custkey, c_nationkey,
        |    CAST(ROUND(c_acctbal*100, 0) AS BIGINT) AS bal_cents
        |  FROM customer, pos
        |  WHERE CAST(ROUND(c_acctbal*100, 0) AS BIGINT) * n > s
        |    AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
        |    AND c_custkey NOT IN (SELECT o_custkey FROM recent))
        |SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,
        |  CAST(COUNT(*) AS BIGINT) AS numcust,
        |  CAST(SUM(bal_cents) AS BIGINT) AS totacctbal_cents
        |FROM c GROUP BY 1""".stripMargin,
    "q_turning_points" ->
      s"""WITH hb AS (SELECT event_type,
         |    (epoch_ms(ts) - 1704067200000) // 3600000 AS h,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS v
         |  FROM events GROUP BY 1, 2),
         |w AS (SELECT event_type, v,
         |    lag(v) OVER (PARTITION BY event_type ORDER BY h) AS p,
         |    lead(v) OVER (PARTITION BY event_type ORDER BY h) AS f
         |  FROM hb),
         |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN p IS NOT NULL AND f IS NOT NULL
         |      AND (v - p) * (f - v) < 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_turning
         |  FROM w GROUP BY 1)
         |SELECT event_type, n, n_turning,
         |  ${graft.operators.TimeSeries.turningZSql} AS z,
         |  abs(${graft.operators.TimeSeries.turningZSql}) > 1.959964
         |    AS significant
         |FROM m""".stripMargin,
    "q_cox_stuart" ->
      s"""WITH hb AS (SELECT event_type,
         |    (epoch_ms(ts) - 1704067200000) // 3600000 AS h,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS v
         |  FROM events GROUP BY 1, 2),
         |sq AS (SELECT event_type, v,
         |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY h)
         |      AS BIGINT) AS rn,
         |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
         |      AS nk
         |  FROM hb),
         |j AS (SELECT lo.event_type, lo.nk, lo.v AS v_lo, hi.v AS v_hi
         |  FROM (SELECT *, rn + (nk + 1) // 2 AS rn_pair FROM sq
         |    WHERE rn * 2 <= nk) lo
         |  JOIN sq hi ON hi.event_type = lo.event_type
         |    AND hi.rn = lo.rn_pair),
         |m AS (SELECT event_type, CAST(MAX(nk) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN v_hi > v_lo THEN 1 ELSE 0 END)
         |      AS BIGINT) AS s_plus,
         |    CAST(SUM(CASE WHEN v_hi < v_lo THEN 1 ELSE 0 END)
         |      AS BIGINT) AS s_minus
         |  FROM j GROUP BY 1)
         |SELECT event_type, n, s_plus, s_minus,
         |  ${graft.operators.TimeSeries.coxStuartZSql} AS z,
         |  CASE WHEN abs(${graft.operators.TimeSeries.coxStuartZSql})
         |      > 1.959964 THEN
         |    CASE WHEN ${graft.operators.TimeSeries.coxStuartZSql} > 0
         |      THEN 'increasing' ELSE 'decreasing' END
         |  ELSE 'none' END AS trend
         |FROM m""".stripMargin,
    "q_chow_test" ->
      s"""WITH hb AS (SELECT event_type,
         |    (epoch_ms(ts) - 1704067200000) // 3600000 AS h,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS v
         |  FROM events GROUP BY 1, 2),
         |m AS (SELECT event_type,
         |    CAST(SUM(CASE WHEN h < 360 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_1,
         |    CAST(SUM(CASE WHEN h < 360 THEN h ELSE 0 END) AS BIGINT)
         |      AS sx_1,
         |    CAST(SUM(CASE WHEN h < 360 THEN v ELSE 0 END) AS BIGINT)
         |      AS sy_1,
         |    CAST(SUM(CASE WHEN h < 360 THEN h*h ELSE 0 END) AS BIGINT)
         |      AS sxx_1,
         |    CAST(SUM(CASE WHEN h < 360 THEN h*v ELSE 0 END) AS BIGINT)
         |      AS sxy_1,
         |    CAST(SUM(CASE WHEN h < 360 THEN CAST(v AS DECIMAL(38,0))*v
         |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0))
         |      AS syy_1,
         |    CAST(SUM(CASE WHEN h >= 360 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_2,
         |    CAST(SUM(CASE WHEN h >= 360 THEN h ELSE 0 END) AS BIGINT)
         |      AS sx_2,
         |    CAST(SUM(CASE WHEN h >= 360 THEN v ELSE 0 END) AS BIGINT)
         |      AS sy_2,
         |    CAST(SUM(CASE WHEN h >= 360 THEN h*h ELSE 0 END) AS BIGINT)
         |      AS sxx_2,
         |    CAST(SUM(CASE WHEN h >= 360 THEN h*v ELSE 0 END) AS BIGINT)
         |      AS sxy_2,
         |    CAST(SUM(CASE WHEN h >= 360 THEN CAST(v AS DECIMAL(38,0))*v
         |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0))
         |      AS syy_2
         |  FROM hb GROUP BY 1)
         |SELECT event_type, n_1 AS n1, n_2 AS n2,
         |  ${graft.operators.TimeSeries.chowFSql} AS f_stat,
         |  ${graft.operators.TimeSeries.chowFSql} >
         |    CAST(2.995732 AS DOUBLE) AS significant
         |FROM m""".stripMargin,
    "q_welch_anova" ->
      s"""WITH obs AS (SELECT
         |    CAST(dayofweek(ts) + 1 AS BIGINT) AS dow, event_type,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS x
         |  FROM events GROUP BY dayofweek(ts), event_type, user_id),
         |g0 AS (SELECT dow, event_type, CAST(COUNT(*) AS BIGINT) AS ng,
         |    CAST(SUM(x) AS BIGINT) AS sg,
         |    CAST(SUM(CAST(x*x AS DECIMAL(38,0))) AS DECIMAL(38,0))
         |      AS sqg
         |  FROM obs GROUP BY 1, 2),
         |g1 AS (SELECT *, ${graft.operators.Normalize.bartlettVarSql}
         |    AS var_g FROM g0 WHERE ng > 1),
         |g2 AS (SELECT * FROM g1 WHERE var_g > 0),
         |g AS (SELECT *, ${graft.operators.Normalize.waWNanoSql}
         |    AS w_nano FROM g2),
         |gw AS (SELECT *, ${graft.operators.Normalize.waWmMicroSql}
         |    AS wm_micro FROM g),
         |per AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS k,
         |    CAST(SUM(ng) AS BIGINT) AS n,
         |    CAST(SUM(w_nano) AS BIGINT) AS w_sum_nano,
         |    CAST(SUM(wm_micro) AS BIGINT) AS wm_sum_micro
         |  FROM gw GROUP BY 1),
         |jn AS (SELECT gw.*, per.k, per.n, per.w_sum_nano,
         |    per.wm_sum_micro
         |  FROM gw JOIN per ON gw.dow = per.dow),
         |t AS (SELECT *, ${graft.operators.Normalize.waAMicroSql}
         |    AS a_micro, ${graft.operators.Normalize.waLNanoSql}
         |    AS l_nano FROM jn),
         |f AS (SELECT dow, CAST(MAX(k) AS BIGINT) AS k,
         |    CAST(MAX(n) AS BIGINT) AS n,
         |    CAST(SUM(a_micro) AS BIGINT) AS a_sum_micro,
         |    CAST(SUM(l_nano) AS BIGINT) AS l_sum_nano
         |  FROM t GROUP BY 1)
         |SELECT dow, k, n, a_sum_micro, l_sum_nano,
         |  ${graft.operators.Normalize.waFSql} AS f_stat,
         |  CAST(k - 1 AS BIGINT) AS df1,
         |  ${graft.operators.Normalize.waDf2Sql} AS df2,
         |  ${graft.operators.Normalize.waFSql} >
         |    ${graft.operators.Profiling.chi2Crit95Sql("k - 1")} / (k - 1)
         |    AS significant
         |FROM f""".stripMargin,
    "q_breusch_pagan" ->
      s"""WITH pts AS (SELECT CAST(l_quantity AS BIGINT) AS __x,
         |    CAST(ROUND(l_extendedprice*100, 0) AS BIGINT) AS __y
         |  FROM lineitem),
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(__x) AS BIGINT) AS sx,
         |    CAST(SUM(__y) AS BIGINT) AS sy,
         |    CAST(SUM(__x*__x) AS BIGINT) AS sxx,
         |    CAST(SUM(__x*__y) AS BIGINT) AS sxy
         |  FROM pts),
         |r AS (SELECT __x, n, sx, sxx,
         |    ${graft.operators.Eval.bpResid2Sql} AS g FROM pts, mm),
         |a AS (SELECT n, sx, sxx,
         |    CAST(SUM(g) AS DECIMAL(38,0)) AS sg,
         |    CAST(SUM(CAST(g AS DECIMAL(38,0)) * __x) AS DECIMAL(38,0))
         |      AS sgx,
         |    CAST(SUM(CAST(g AS DECIMAL(38,0)) * g) AS DECIMAL(38,0))
         |      AS sgg
         |  FROM r GROUP BY 1, 2, 3)
         |SELECT n, ${graft.operators.Eval.bpLmSql} AS lm,
         |  ${graft.operators.Eval.bpLmSql} > 3.841459 AS significant
         |FROM a""".stripMargin,
    "q_cooks_distance" ->
      s"""WITH pts AS (SELECT p_partkey AS id,
         |    CAST(p_size AS BIGINT) AS __x,
         |    CAST(ROUND(p_retailprice*100, 0) AS BIGINT) AS __y
         |  FROM part),
         |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(__x) AS BIGINT) AS sx,
         |    CAST(SUM(__y) AS BIGINT) AS sy,
         |    CAST(SUM(__x*__x) AS BIGINT) AS sxx,
         |    CAST(SUM(__x*__y) AS BIGINT) AS sxy,
         |    CAST(SUM(CAST(__y*__y AS DECIMAL(38,0))) AS DECIMAL(38,0))
         |      AS syy
         |  FROM pts),
         |d AS (SELECT id, __x, __y,
         |    ${graft.operators.Eval.cooksDSql} AS d FROM pts, mm),
         |top AS (SELECT * FROM d WHERE d IS NOT NULL
         |  ORDER BY d DESC, id LIMIT 20)
         |SELECT CAST(row_number() OVER (ORDER BY d DESC, id) AS BIGINT)
         |    AS rnk, id, __x AS x, __y AS y, d
         |FROM top""".stripMargin,
    "q_hodges_lehmann" ->
      """WITH users AS (SELECT user_id,
        |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1),
        |pairs AS (SELECT a.cents - b.cents AS d
        |  FROM (SELECT cents FROM users WHERE user_id % 2 = 0) a
        |  CROSS JOIN (SELECT cents FROM users WHERE user_id % 2 = 1) b),
        |per AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS nd
        |  FROM pairs GROUP BY 1),
        |c AS (SELECT d, SUM(nd) OVER (ORDER BY d
        |    ROWS UNBOUNDED PRECEDING) AS cum_nd FROM per),
        |tot AS (SELECT CAST(SUM(nd) AS BIGINT) AS np FROM per),
        |lo AS (SELECT MIN(d) AS d_lo FROM c, tot
        |  WHERE cum_nd >= (np + 1) // 2),
        |hi AS (SELECT MIN(d) AS d_hi FROM c, tot
        |  WHERE cum_nd >= (np + 2) // 2)
        |SELECT np AS n_pairs, CAST(d_lo + d_hi AS BIGINT) AS hl_x2,
        |  round(CAST(d_lo + d_hi AS DOUBLE) / 2, 6) AS hl
        |FROM lo, hi, tot""".stripMargin,
    "q_dist_distance" ->
      s"""WITH u AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS v,
         |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS __ca,
         |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
         |      AS __cb
         |  FROM events WHERE event_type IN ('click', 'purchase')),
         |ext AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM u),
         |bins AS (SELECT CASE WHEN hi > lo THEN
         |      least(CAST(9 AS BIGINT), (v - lo) * 10 // (hi - lo))
         |    ELSE CAST(0 AS BIGINT) END AS bin,
         |    CAST(SUM(__ca) AS BIGINT) AS ca,
         |    CAST(SUM(__cb) AS BIGINT) AS cb
         |  FROM u, ext GROUP BY 1),
         |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
         |    CAST(SUM(cb) AS BIGINT) AS n_b FROM bins),
         |t AS (SELECT bin, ca, cb, n_a, n_b,
         |    ${graft.operators.Profiling.ddTvNanoSql} AS tv_nano,
         |    ${graft.operators.Profiling.ddBcNanoSql} AS bc_nano,
         |    ${graft.operators.Profiling.ddOvNanoSql} AS ov_nano
         |  FROM bins, tot),
         |f AS (SELECT n_a, n_b, CAST(COUNT(*) AS BIGINT) AS n_bins,
         |    CAST(SUM(tv_nano) AS BIGINT) AS tv_sum,
         |    CAST(SUM(bc_nano) AS BIGINT) AS bc_sum,
         |    CAST(SUM(ov_nano) AS BIGINT) AS ov_sum
         |  FROM t GROUP BY 1, 2)
         |SELECT n_a, n_b, n_bins,
         |  round(CAST(tv_sum AS DOUBLE) / 1000000000 / 2, 6)
         |    AS total_variation,
         |  round(CAST(bc_sum AS DOUBLE) / 1000000000, 6)
         |    AS bhattacharyya_coef,
         |  CASE WHEN bc_sum > 0 THEN
         |    round(-LN(CAST(bc_sum AS DOUBLE) / 1000000000), 6) END
         |    AS bhattacharyya_dist,
         |  round(sqrt(greatest(CAST(0 AS DOUBLE),
         |    1 - CAST(bc_sum AS DOUBLE) / 1000000000)), 6) AS hellinger,
         |  round(CAST(ov_sum AS DOUBLE) / 1000000000, 6)
         |    AS overlap_coef
         |FROM f""".stripMargin,
    "q_zero_inflation" ->
      s"""WITH e AS (SELECT event_type,
         |    epoch_ms(ts) // 3600000 AS h FROM events),
         |c AS (SELECT event_type, h, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM e GROUP BY 1, 2),
         |a AS (SELECT event_type,
         |    CAST(MAX(h) - MIN(h) + 1 AS BIGINT) AS n_buckets,
         |    CAST(COUNT(*) AS BIGINT) AS n_nonzero,
         |    CAST(SUM(c) AS BIGINT) AS n_events
         |  FROM c GROUP BY 1),
         |f AS (SELECT event_type, n_buckets,
         |    CAST(n_buckets - n_nonzero AS BIGINT) AS n_zero, n_events
         |  FROM a)
         |SELECT event_type, n_buckets, n_zero, n_events,
         |  ${graft.operators.TimeSeries.ziScoreSql} AS score_chi2,
         |  ${graft.operators.TimeSeries.ziScoreSql} > 3.841459
         |    AS significant
         |FROM f""".stripMargin,
    "q_fisher_ratio" ->
      s"""WITH ex AS (SELECT label AS lbl,
         |    generate_subscripts(embedding, 1) AS dim,
         |    unnest(embedding) AS x FROM embeddings),
         |qv AS (SELECT lbl, CAST(dim AS BIGINT) AS dim,
         |    CAST(ROUND(CAST(x AS DOUBLE) * 16777216, 0) AS BIGINT) AS q
         |  FROM ex),
         |per AS (SELECT dim, lbl, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(q) AS BIGINT) AS s,
         |    CAST(SUM(CAST(q AS DECIMAL(38,0)) * q) AS DECIMAL(38,0))
         |      AS sq
         |  FROM qv GROUP BY 1, 2),
         |pm AS (SELECT dim, lbl, n, s, sq,
         |    CAST(ROUND(CAST(s AS DOUBLE) / n, 0) AS BIGINT) AS mu
         |  FROM per),
         |gl AS (SELECT dim,
         |    CAST(ROUND(CAST(SUM(s) AS DOUBLE) / SUM(n), 0) AS BIGINT)
         |      AS mug
         |  FROM pm GROUP BY 1),
         |t AS (SELECT pm.dim,
         |    sq - CAST(mu AS DECIMAL(38,0)) * s * 2
         |      + CAST(n AS DECIMAL(38,0)) * mu * mu AS w_l,
         |    CAST(n AS DECIMAL(38,0)) * (mu - mug) * (mu - mug) AS b_l
         |  FROM pm JOIN gl USING (dim)),
         |a AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS k_labels,
         |    CAST(SUM(w_l) AS DECIMAL(38,0)) AS w,
         |    CAST(SUM(b_l) AS DECIMAL(38,0)) AS b
         |  FROM t GROUP BY 1)
         |SELECT dim, k_labels,
         |  ${graft.operators.Similarity.fisherSql} AS fisher,
         |  CAST(w AS VARCHAR) AS w, CAST(b AS VARCHAR) AS b
         |FROM a""".stripMargin,
    "q_fleiss_kappa" ->
      s"""WITH users AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_click,
         |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_view
         |  FROM events GROUP BY 1),
         |lng AS (
         |  SELECT user_id, 'r_spend' AS rater,
         |      CASE WHEN spend >= 360000 THEN 3 WHEN spend >= 330000
         |        THEN 2 WHEN spend >= 300000 THEN 1 ELSE 0 END AS cat
         |    FROM users
         |  UNION ALL SELECT user_id, 'r_click',
         |      CASE WHEN n_click >= 25 THEN 3 WHEN n_click >= 20 THEN 2
         |        WHEN n_click >= 15 THEN 1 ELSE 0 END FROM users
         |  UNION ALL SELECT user_id, 'r_view',
         |      CASE WHEN n_view >= 25 THEN 3 WHEN n_view >= 20 THEN 2
         |        WHEN n_view >= 15 THEN 1 ELSE 0 END FROM users),
         |nr AS (SELECT CAST(COUNT(DISTINCT rater) AS BIGINT) AS n_raters
         |  FROM lng),
         |comp AS (SELECT lng.user_id, CAST(lng.cat AS VARCHAR) AS cat,
         |    n_raters FROM lng, nr
         |  QUALIFY COUNT(*) OVER (PARTITION BY user_id) = n_raters),
         |cells AS (SELECT n_raters, user_id, cat,
         |    CAST(COUNT(*) AS BIGINT) AS nic FROM comp GROUP BY 1, 2, 3),
         |pi AS (SELECT n_raters,
         |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_items,
         |    CAST(SUM(CAST(nic AS DECIMAL(38,0)) * nic) AS DECIMAL(38,0))
         |      AS s_nic2
         |  FROM cells GROUP BY 1),
         |pc AS (SELECT CAST(SUM(CAST(colsum AS DECIMAL(38,0)) * colsum)
         |      AS DECIMAL(38,0)) AS s_col2
         |  FROM (SELECT cat, CAST(SUM(nic) AS BIGINT) AS colsum
         |    FROM cells GROUP BY 1)),
         |f AS (SELECT * FROM pi, pc)
         |SELECT n_raters, n_items,
         |  ${graft.operators.Profiling.fleissKappaSql} AS kappa,
         |  CAST(s_nic2 AS VARCHAR) AS s_nic2,
         |  CAST(s_col2 AS VARCHAR) AS s_col2
         |FROM f""".stripMargin,
    "q_drawdown" ->
      s"""WITH $hourlySpendCte,
         |r AS (SELECT event_type, h, v,
         |    MAX(v) OVER (PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max,
         |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
         |  FROM hb),
         |d AS (SELECT event_type, n, run_max - v AS dd, run_max, v, h,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY run_max - v DESC, h) AS rn FROM r),
         |m AS (SELECT event_type, n, CAST(dd AS BIGINT) AS max_dd,
         |    CAST(run_max AS BIGINT) AS peak_v, v AS trough_v,
         |    h AS trough_bucket
         |  FROM d WHERE rn = 1)
         |SELECT event_type, n, max_dd, peak_v, trough_v, trough_bucket,
         |  ${graft.operators.TimeSeries.ddFracSql} AS dd_frac
         |FROM m""".stripMargin,
    "q_bollinger" ->
      s"""WITH $hourlySpendCte,
         |r AS (SELECT event_type, h, v,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         |    CAST(SUM(v) OVER (PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS BIGINT) AS s,
         |    CAST(SUM(CAST(v AS DECIMAL(38,0)) * v) OVER (
         |      PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
         |      AS DECIMAL(38,0)) AS ss
         |  FROM hb)
         |SELECT event_type, h, v, round(CAST(s AS DOUBLE) / 24, 6) AS mid,
         |  ${graft.operators.TimeSeries.bollingerBreachSql(24, 2, hi = true)}
         |    AS breach_hi,
         |  ${graft.operators.TimeSeries.bollingerBreachSql(24, 2, hi = false)}
         |    AS breach_lo
         |FROM r WHERE rn >= 24""".stripMargin,
    "q_rsi" ->
      s"""WITH $hourlySpendCte,
         |r AS (SELECT event_type, h, v,
         |    v - lag(v) OVER (PARTITION BY event_type ORDER BY h) AS d,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |  FROM hb),
         |f AS (SELECT * FROM r WHERE d IS NOT NULL),
         |g AS (SELECT event_type, h, v, rn,
         |    CAST(SUM(CASE WHEN d > 0 THEN d ELSE 0 END) OVER (
         |      PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT) AS sg,
         |    CAST(SUM(CASE WHEN d < 0 THEN -d ELSE 0 END) OVER (
         |      PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT) AS sl
         |  FROM f)
         |SELECT event_type, h, v, sg, sl,
         |  ${graft.operators.TimeSeries.rsiSql} AS rsi
         |FROM g WHERE rn > 14""".stripMargin,
    "q_stochastic" ->
      s"""WITH $hourlySpendCte,
         |r AS (SELECT event_type, h, v,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         |    MIN(v) OVER (PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS lo,
         |    MAX(v) OVER (PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS hi
         |  FROM hb),
         |k AS (SELECT event_type, h, v,
         |    ${graft.operators.TimeSeries.stochKMicroSql} AS k_micro
         |  FROM r WHERE rn >= 14),
         |g AS (SELECT event_type, h, v, k_micro,
         |    CAST(COUNT(k_micro) OVER (PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS d_n,
         |    CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS f_n,
         |    CAST(SUM(k_micro) OVER (PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS d_sum
         |  FROM k)
         |SELECT event_type, h, v,
         |  CASE WHEN k_micro IS NOT NULL THEN
         |    round(CAST(k_micro AS DOUBLE) / 1e6, 6) END AS pct_k,
         |  ${graft.operators.TimeSeries.stochDSql} AS pct_d
         |FROM g""".stripMargin,
    "q_vwap" ->
      s"""WITH t AS (SELECT l_returnflag,
         |    CAST(date_trunc('month', l_shipdate) AS DATE) AS m,
         |    CAST(ROUND(l_extendedprice*100, 0) AS BIGINT) AS notional_cents,
         |    CAST(l_quantity AS BIGINT) AS q FROM lineitem),
         |g AS (SELECT l_returnflag, m,
         |    CAST(COUNT(*) AS BIGINT) AS n_trades,
         |    CAST(SUM(q) AS BIGINT) AS qty,
         |    CAST(SUM(notional_cents) AS BIGINT) AS notional
         |  FROM t GROUP BY 1, 2)
         |SELECT l_returnflag, m, n_trades, qty, notional,
         |  ${graft.operators.TimeSeries.vwapSql} AS vwap
         |FROM g""".stripMargin,
    "q_atr" ->
      s"""WITH e AS (SELECT event_type, epoch_ms(ts) AS ms, event_id,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS cents FROM events),
         |b AS (SELECT event_type, (ms // 21600000) * 21600000
         |      AS bar_start_ms,
         |    (ms - 1700000000000) * 100000000 + event_id AS tkey, cents
         |  FROM e),
         |bars AS (SELECT event_type, bar_start_ms, MAX(cents) AS h,
         |    MIN(cents) AS l, arg_max(cents, tkey) AS c
         |  FROM b GROUP BY 1, 2),
         |lg AS (SELECT event_type, bar_start_ms, h, l, c,
         |    lag(c) OVER (PARTITION BY event_type ORDER BY bar_start_ms)
         |      AS __pc,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY bar_start_ms) AS rn
         |  FROM bars),
         |t AS (SELECT event_type, bar_start_ms, rn,
         |    CAST(${graft.operators.TimeSeries.trSql} AS BIGINT) AS tr
         |  FROM lg),
         |g AS (SELECT event_type, bar_start_ms, rn, tr,
         |    CAST(SUM(tr) OVER (PARTITION BY event_type ORDER BY bar_start_ms
         |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS BIGINT) AS tr_sum
         |  FROM t)
         |SELECT event_type, bar_start_ms, tr,
         |  round(CAST(tr_sum AS DOUBLE) / 8, 6) AS atr
         |FROM g WHERE rn >= 8""".stripMargin,
    "q_binomial_test" ->
      s"""WITH g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS x
         |  FROM events GROUP BY 1),
         |z AS (SELECT event_type, n, x,
         |    ${graft.operators.Profiling.binomialZSql("1", "2")} AS z
         |  FROM g)
         |SELECT event_type, n, x, z,
         |  round(${graft.operators.Profiling.normalPSql("z")}, 6)
         |    AS p_normal,
         |  abs(z) > 1.959964 AS significant
         |FROM z""".stripMargin,
    "q_poisson_rates" ->
      s"""WITH g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN day(ts) <= 7 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS x
         |  FROM events GROUP BY 1),
         |z AS (SELECT event_type, n, x,
         |    round(CAST(x AS DOUBLE) / 7, 6) AS rate_a,
         |    round(CAST(n - x AS DOUBLE) / 24, 6) AS rate_b,
         |    ${graft.operators.Profiling.binomialZSql("7", "31")} AS z
         |  FROM g)
         |SELECT event_type, n, x, rate_a, rate_b, z,
         |  round(${graft.operators.Profiling.normalPSql("z")}, 6)
         |    AS p_normal,
         |  abs(z) > 1.959964 AS significant
         |FROM z""".stripMargin,
    "q_anderson_darling" ->
      s"""WITH $hourlyDollarsCte,
         |w AS (SELECT event_type, v,
         |    CAST(COUNT(*) OVER wk AS BIGINT) AS n,
         |    CAST(SUM(v) OVER wk AS BIGINT) AS sx,
         |    CAST(SUM(CAST(v AS DECIMAL(38,0)) * v) OVER wk
         |      AS DECIMAL(38,0)) AS sxx,
         |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY v)
         |      AS BIGINT) AS r
         |  FROM hd WINDOW wk AS (PARTITION BY event_type)),
         |t AS (SELECT event_type, n,
         |    ${graft.operators.Normalize.adTermSql} AS term FROM w),
         |g AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
         |    CAST(SUM(term) AS BIGINT) AS s_micro
         |  FROM t GROUP BY 1),
         |a AS (SELECT event_type, n, s_micro,
         |    ${graft.operators.Normalize.adA2Sql} AS a2 FROM g)
         |SELECT event_type, n, s_micro, a2,
         |  ${graft.operators.Normalize.adAStarSql} AS a2_star,
         |  coalesce(${graft.operators.Normalize.adAStarSql} > 0.787, false)
         |    AS significant
         |FROM a""".stripMargin,
    "q_kpss" ->
      s"""WITH $hourlyDollarsCte,
         |w AS (SELECT event_type, v,
         |    CAST(COUNT(*) OVER wk AS BIGINT) AS n,
         |    CAST(SUM(v) OVER wk AS BIGINT) AS sv,
         |    CAST(SUM(CAST(v AS DECIMAL(38,0)) * v) OVER wk
         |      AS DECIMAL(38,0)) AS sxx,
         |    CAST(row_number() OVER wo AS BIGINT) AS t,
         |    CAST(SUM(v) OVER (PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS ps
         |  FROM hd WINDOW wk AS (PARTITION BY event_type),
         |    wo AS (PARTITION BY event_type ORDER BY h)),
         |t AS (SELECT event_type, n,
         |    ${graft.operators.TimeSeries.kpssTermNanoSql} AS term FROM w),
         |g AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
         |    CAST(SUM(term) AS BIGINT) AS s_nano
         |  FROM t GROUP BY 1)
         |SELECT event_type, n, s_nano,
         |  ${graft.operators.TimeSeries.kpssEtaSql} AS eta,
         |  coalesce(${graft.operators.TimeSeries.kpssEtaSql} > 0.463, false)
         |    AS nonstationary
         |FROM g""".stripMargin,
    "q_dickey_fuller" ->
      s"""WITH $hourlyDollarsCte,
         |d AS (SELECT event_type, v,
         |    lag(v) OVER (PARTITION BY event_type ORDER BY h) AS x
         |  FROM hd),
         |f AS (SELECT event_type, x, v - x AS y FROM d
         |  WHERE x IS NOT NULL),
         |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))
         |      AS sxx,
         |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
         |      AS sxy,
         |    CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
         |      AS syy
         |  FROM f GROUP BY 1)
         |SELECT event_type, m, sx, sy,
         |  ${graft.operators.TimeSeries.dfBetaSql} AS beta,
         |  ${graft.operators.TimeSeries.dfTSql} AS t_stat,
         |  coalesce(${graft.operators.TimeSeries.dfTSql} < -2.86, false)
         |    AS stationary,
         |  CAST(sxx AS VARCHAR) AS sxx, CAST(sxy AS VARCHAR) AS sxy,
         |  CAST(syy AS VARCHAR) AS syy
         |FROM g""".stripMargin,
    "q_dsir_weights" ->
      s"""WITH ex AS (SELECT doc_id, lang = 'en' AS tgt,
         |    unnest(string_split(text,' ')) AS token FROM documents),
         |uc AS (SELECT doc_id, tgt, token, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM ex GROUP BY 1, 2, 3),
         |uf AS (SELECT doc_id, c,
         |    CAST(SUM(c) OVER (PARTITION BY token) AS BIGINT) AS fs,
         |    CAST(SUM(CASE WHEN tgt THEN c ELSE 0 END)
         |      OVER (PARTITION BY token) AS BIGINT) AS ft
         |  FROM uc),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS ns,
         |    CAST(SUM(CASE WHEN tgt THEN c ELSE 0 END) AS BIGINT) AS nt,
         |    CAST(COUNT(DISTINCT token) AS BIGINT) AS v FROM uc),
         |t AS (SELECT doc_id, c,
         |    ${graft.operators.TextAnalysis.dsirRatioMicroSql} AS rm
         |  FROM uf CROSS JOIN tot),
         |g AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |    CAST(SUM(c * rm) AS BIGINT) AS s_micro
         |  FROM t GROUP BY 1)
         |SELECT doc_id, n_tokens, s_micro,
         |  ${graft.operators.TextAnalysis.dsirAvgSql} AS avg_log_ratio
         |FROM g""".stripMargin,
    "q_mmd" ->
      s"""WITH x AS (SELECT vec_id % 2 = 0 AS a, CAST(i - 1 AS BIGINT) AS dim,
         |    CAST(round(CAST(e[i] AS DOUBLE) * 4096, 0) AS BIGINT) AS xq
         |  FROM (SELECT vec_id, embedding AS e,
         |      unnest(range(1, len(embedding)+1)) AS i FROM embeddings)),
         |p AS (SELECT dim,
         |    CAST(SUM(CASE WHEN a THEN xq ELSE 0 END) AS BIGINT) AS sa,
         |    CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na_d,
         |    CAST(SUM(CASE WHEN NOT a THEN xq ELSE 0 END) AS BIGINT) AS sb,
         |    CAST(SUM(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS nb_d
         |  FROM x GROUP BY 1),
         |t AS (SELECT dim, na_d, nb_d,
         |    ${graft.operators.Similarity.mmdTermNanoSql} AS term FROM p),
         |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS d,
         |    CAST(MAX(na_d) AS BIGINT) AS n_a,
         |    CAST(MAX(nb_d) AS BIGINT) AS n_b,
         |    CAST(SUM(term) AS BIGINT) AS s_nano FROM t)
         |SELECT d, n_a, n_b, s_nano,
         |  ${graft.operators.Similarity.mmdSql} AS mmd2
         |FROM g""".stripMargin,
    "q_random_projection" ->
      s"""WITH x AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS i,
         |    CAST(round(CAST(e[i] AS DOUBLE) * 4096, 0) AS BIGINT) AS xq
         |  FROM (SELECT vec_id, embedding AS e,
         |      unnest(range(1, len(embedding)+1)) AS i FROM embeddings)),
         |jj AS (SELECT CAST(unnest(range(0, 4)) AS BIGINT) AS j),
         |t AS (SELECT vec_id, j, xq,
         |    ${graft.operators.Similarity.rpSignSql} AS sgn
         |  FROM x CROSS JOIN jj)
         |SELECT vec_id, j, CAST(SUM(xq * sgn) AS BIGINT) AS y_q,
         |  round(CAST(SUM(xq * sgn) AS DOUBLE) / 4096, 6) AS y
         |FROM t GROUP BY 1, 2""".stripMargin,
    "q_local_clustering" -> localClusteringOracle,
    // hub-cap no-op below the cap — see q_triangle_count_capped
    "q_local_clustering_capped" -> localClusteringOracle,
    "q_pq_encode" ->
      s"""WITH $pqEncodeCtes
         |SELECT vec_id, subspace, code, dist2 FROM pq""".stripMargin,
    "q_pq_error" ->
      s"""WITH $pqEncodeCtes,
         |g AS (SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_subspaces,
         |    CAST(SUM(dist2) AS BIGINT) AS dist2_total
         |  FROM pq GROUP BY 1)
         |SELECT vec_id, n_subspaces, dist2_total,
         |  round(sqrt(CAST(dist2_total AS DOUBLE) / 64) / 4096, 6) AS rmse
         |FROM g""".stripMargin,
    "q_exact_jaccard" ->
      s"""WITH $shingleCte,
         |ex AS (SELECT doc_id AS id, unnest(sh.sh) AS s FROM sh),
         |dft AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS df
         |  FROM ex GROUP BY 1),
         |rk AS (SELECT id, ex.s,
         |    CAST(row_number() OVER (PARTITION BY id ORDER BY df, ex.s)
         |      AS BIGINT) AS rk,
         |    CAST(COUNT(*) OVER (PARTITION BY id) AS BIGINT) AS sz
         |  FROM ex JOIN dft USING (s)),
         |pre AS (SELECT id, s FROM rk
         |  WHERE rk <= sz - ((500000 * sz + 999999) // 1000000) + 1),
         |cand AS (SELECT DISTINCT a.id AS doc_a, b.id AS doc_b
         |  FROM pre a JOIN pre b ON a.s = b.s AND a.id < b.id),
         |szs AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS sz
         |  FROM ex GROUP BY 1),
         |cm AS (SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT)
         |      AS common
         |  FROM cand c JOIN ex ea ON ea.id = c.doc_a
         |    JOIN ex eb ON eb.id = c.doc_b AND eb.s = ea.s
         |  GROUP BY 1, 2)
         |SELECT cm.doc_a, cm.doc_b, common,
         |  sa.sz AS sz_a, sb.sz AS sz_b,
         |  round(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6)
         |    AS jaccard
         |FROM cm JOIN szs sa ON sa.id = cm.doc_a
         |  JOIN szs sb ON sb.id = cm.doc_b
         |WHERE common * 1000000 >= 500000 * (sa.sz + sb.sz - common)
         |""".stripMargin,
    "q_minhash_recall" ->
      s"""WITH $minhashVerifiedCtes,
         |ex AS (SELECT doc_id AS id, unnest(sh.sh) AS s FROM sh),
         |dft AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS df
         |  FROM ex GROUP BY 1),
         |rk AS (SELECT id, ex.s,
         |    CAST(row_number() OVER (PARTITION BY id ORDER BY df, ex.s)
         |      AS BIGINT) AS rk,
         |    CAST(COUNT(*) OVER (PARTITION BY id) AS BIGINT) AS sz
         |  FROM ex JOIN dft USING (s)),
         |pre AS (SELECT id, s FROM rk
         |  WHERE rk <= sz - ((500000 * sz + 999999) // 1000000) + 1),
         |cand AS (SELECT DISTINCT a.id AS doc_a, b.id AS doc_b
         |  FROM pre a JOIN pre b ON a.s = b.s AND a.id < b.id),
         |szs AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS sz
         |  FROM ex GROUP BY 1),
         |cm AS (SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT)
         |      AS common
         |  FROM cand c JOIN ex ea ON ea.id = c.doc_a
         |    JOIN ex eb ON eb.id = c.doc_b AND eb.s = ea.s
         |  GROUP BY 1, 2),
         |exact AS (SELECT cm.doc_a, cm.doc_b
         |  FROM cm JOIN szs sa ON sa.id = cm.doc_a
         |    JOIN szs sb ON sb.id = cm.doc_b
         |  WHERE common * 1000000 >= 500000 * (sa.sz + sb.sz - common))
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
         |  CAST(SUM(CASE WHEN v.doc_a IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_found,
         |  round(CAST(SUM(CASE WHEN v.doc_a IS NOT NULL THEN 1 ELSE 0 END)
         |    AS DOUBLE) / COUNT(*), 6) AS recall
         |FROM exact LEFT JOIN verified v ON v.doc_a = exact.doc_a
         |  AND v.doc_b = exact.doc_b""".stripMargin,
    "q_t_closeness" ->
      s"""WITH base AS (SELECT c_mktsegment,
         |    CAST(c_nationkey AS BIGINT) AS c_nationkey,
         |    CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS v FROM customer),
         |cells AS (SELECT c_mktsegment, c_nationkey, v,
         |    CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY 1, 2, 3),
         |grp AS (SELECT c_mktsegment, c_nationkey,
         |    CAST(SUM(c) AS BIGINT) AS n_cell FROM cells GROUP BY 1, 2),
         |gv AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cg
         |  FROM base GROUP BY 1),
         |gv2 AS (SELECT v,
         |    CAST(SUM(cg) OVER (ORDER BY v) AS BIGINT) AS cum_g,
         |    CAST(SUM(cg) OVER () AS BIGINT) AS n_tot,
         |    CAST(COUNT(*) OVER () AS BIGINT) AS m_vals
         |  FROM gv),
         |grid AS (SELECT g.c_mktsegment, g.c_nationkey, g.n_cell, z.v,
         |    z.cum_g, z.n_tot, z.m_vals, COALESCE(cells.c, 0) AS c
         |  FROM grp g CROSS JOIN gv2 z
         |  LEFT JOIN cells ON cells.c_mktsegment = g.c_mktsegment
         |    AND cells.c_nationkey = g.c_nationkey AND cells.v = z.v),
         |cum AS (SELECT *, CAST(SUM(c) OVER (PARTITION BY c_mktsegment,
         |      c_nationkey ORDER BY v) AS BIGINT) AS cum_c FROM grid),
         |agg AS (SELECT c_mktsegment, c_nationkey, n_cell, n_tot, m_vals,
         |    CAST(SUM(ABS(cum_c * n_tot - cum_g * n_cell)) AS BIGINT)
         |      AS s_num
         |  FROM cum GROUP BY 1, 2, 3, 4, 5)
         |SELECT c_mktsegment, c_nationkey, n_cell, s_num,
         |  ${graft.operators.Profiling.tCloseEmdSql} AS emd,
         |  coalesce(${graft.operators.Profiling.tCloseEmdSql} <= 0.2, true)
         |    AS t_close
         |FROM agg""".stripMargin,
    "q_ivf_recall" ->
      s"""WITH $normCte,
         |cent AS (SELECT vec_id AS cell, embedding, nrm FROM n
         |  ORDER BY vec_id LIMIT 16),
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
         |  WHERE r <= 4),
         |ivfres AS (SELECT qid, vec_id FROM (
         |  SELECT qid, vec_id,
         |    ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY sim DESC, vec_id) AS rank
         |  FROM (SELECT DISTINCT p.qid, a.vec_id,
         |          round(${cosineSqlExprAs("p", "a")}, 6) AS sim
         |        FROM probes p JOIN assign a ON p.cell = a.cell
         |          AND a.vec_id != p.qid))
         |  WHERE rank <= 10),
         |bfs AS (SELECT qid, vec_id FROM (
         |    SELECT q.vec_id AS qid, c.vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |        ORDER BY round($cosineSqlExpr, 6) DESC, c.vec_id) AS rank
         |    FROM n q JOIN n c ON q.vec_id < 8 AND c.vec_id != q.vec_id)
         |  WHERE rank <= 10)
         |SELECT bfs.qid, CAST(COUNT(*) AS BIGINT) AS n_truth,
         |  CAST(SUM(CASE WHEN ivfres.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_match,
         |  round(CAST(SUM(CASE WHEN ivfres.vec_id IS NOT NULL THEN 1
         |    ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS recall
         |FROM bfs LEFT JOIN ivfres ON ivfres.qid = bfs.qid
         |  AND ivfres.vec_id = bfs.vec_id
         |GROUP BY 1""".stripMargin,
    "q_power_proportion" ->
      s"""WITH u AS (SELECT user_id % 4 AS cohort,
         |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 12
         |      AS converted
         |  FROM events GROUP BY user_id),
         |g AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT)
         |      AS x
         |  FROM u GROUP BY 1)
         |SELECT cohort, n, x, round(CAST(x AS DOUBLE) / n, 6) AS p,
         |  ${graft.operators.Eval.powerPropNReqSql(20000L)} AS n_required,
         |  ${graft.operators.Eval.powerPropMdeSql} AS mde
         |FROM g""".stripMargin,
    "q_l2_topk" ->
      s"""WITH $pqEncodeCtes,
         |qx AS (SELECT vec_id AS qid, i, xq AS qq FROM x
         |  WHERE vec_id < 8),
         |bf AS (SELECT qid, x.vec_id,
         |    CAST(SUM((qq - x.xq) * (qq - x.xq)) AS BIGINT) AS dist2
         |  FROM x JOIN qx ON qx.i = x.i WHERE x.vec_id <> qx.qid
         |  GROUP BY 1, 2)
         |SELECT qid, vec_id, dist2, rank FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY qid
         |    ORDER BY dist2, vec_id) AS BIGINT) AS rank FROM bf)
         |WHERE rank <= 10""".stripMargin,
    "q_pq_recall" ->
      s"""WITH $pqEncodeCtes,
         |qx AS (SELECT vec_id AS qid, subspace, i, xq FROM x
         |  WHERE vec_id < 8),
         |bf AS (SELECT qid, x.vec_id,
         |    CAST(SUM((qx.xq - x.xq) * (qx.xq - x.xq)) AS BIGINT) AS dist2
         |  FROM x JOIN qx ON qx.i = x.i WHERE x.vec_id <> qx.qid
         |  GROUP BY 1, 2),
         |bft AS (SELECT qid, vec_id FROM (SELECT *,
         |    row_number() OVER (PARTITION BY qid ORDER BY dist2, vec_id)
         |      AS rn FROM bf) WHERE rn <= 10),
         |adc AS (SELECT qid, qx.subspace, cb.code,
         |    CAST(SUM((qx.xq - cb.cq) * (qx.xq - cb.cq)) AS BIGINT) AS d2
         |  FROM qx JOIN cb ON cb.subspace = qx.subspace AND cb.i = qx.i
         |  GROUP BY 1, 2, 3),
         |ap AS (SELECT adc.qid, pq.vec_id,
         |    CAST(SUM(adc.d2) AS BIGINT) AS adc_dist2
         |  FROM pq JOIN adc ON adc.subspace = pq.subspace
         |    AND adc.code = pq.code
         |  WHERE pq.vec_id <> adc.qid GROUP BY 1, 2),
         |adct AS (SELECT qid, vec_id FROM (SELECT *,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY adc_dist2, vec_id) AS rn FROM ap) WHERE rn <= 10)
         |SELECT bft.qid, CAST(COUNT(*) AS BIGINT) AS n_truth,
         |  CAST(SUM(CASE WHEN adct.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_match,
         |  round(CAST(SUM(CASE WHEN adct.vec_id IS NOT NULL THEN 1
         |    ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS recall
         |FROM bft LEFT JOIN adct ON adct.qid = bft.qid
         |  AND adct.vec_id = bft.vec_id
         |GROUP BY 1""".stripMargin,
    "q_pq_train" ->
      s"""WITH ${pqTrainedCtes(4, 16, 2)}
         |SELECT code, subspace, i, cq FROM cb_2""".stripMargin,
    "q_pq_rerank" ->
      s"""WITH ${pqTrainedCtes(16, 16, 1)},
         |${pqRerankCtes("cb_1", 400)}
         |SELECT qid, vec_id, dist2, rank FROM (SELECT *,
         |    CAST(row_number() OVER (PARTITION BY qid
         |      ORDER BY dist2, vec_id) AS BIGINT) AS rank FROM rer)
         |WHERE rank <= 10""".stripMargin,
    "q_pq_recall_rerank" ->
      s"""WITH ${pqTrainedCtes(16, 16, 1)},
         |${pqRerankCtes("cb_1", 400)},
         |rrt AS (SELECT qid, vec_id FROM (SELECT *,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY dist2, vec_id) AS rn FROM rer) WHERE rn <= 10),
         |bf AS (SELECT qid, x.vec_id,
         |    CAST(SUM((qx.xq - x.xq) * (qx.xq - x.xq)) AS BIGINT)
         |      AS dist2
         |  FROM x JOIN qx ON qx.i = x.i WHERE x.vec_id <> qx.qid
         |  GROUP BY 1, 2),
         |bft AS (SELECT qid, vec_id FROM (SELECT *,
         |    row_number() OVER (PARTITION BY qid ORDER BY dist2, vec_id)
         |      AS rn FROM bf) WHERE rn <= 10)
         |SELECT bft.qid, CAST(COUNT(*) AS BIGINT) AS n_truth,
         |  CAST(SUM(CASE WHEN rrt.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_match,
         |  round(CAST(SUM(CASE WHEN rrt.vec_id IS NOT NULL THEN 1
         |    ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS recall
         |FROM bft LEFT JOIN rrt ON rrt.qid = bft.qid
         |  AND rrt.vec_id = bft.vec_id
         |GROUP BY 1""".stripMargin,
    "q_containment" ->
      s"""WITH $shingleCte,
         |ex AS (SELECT doc_id AS id, unnest(sh.sh) AS s FROM sh),
         |dft AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS df
         |  FROM ex GROUP BY 1),
         |rk AS (SELECT id, ex.s,
         |    CAST(row_number() OVER (PARTITION BY id ORDER BY df, ex.s)
         |      AS BIGINT) AS rk,
         |    CAST(COUNT(*) OVER (PARTITION BY id) AS BIGINT) AS sz
         |  FROM ex JOIN dft USING (s)),
         |pre AS (SELECT id, s FROM rk
         |  WHERE rk <= sz - ((800000 * sz + 999999) // 1000000) + 1),
         |cand AS (SELECT DISTINCT a.id AS doc_a, b.id AS doc_b
         |  FROM pre a JOIN ex b ON a.s = b.s AND a.id <> b.id),
         |szs AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS sz
         |  FROM ex GROUP BY 1),
         |cm AS (SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT)
         |      AS common
         |  FROM cand c JOIN ex ea ON ea.id = c.doc_a
         |    JOIN ex eb ON eb.id = c.doc_b AND eb.s = ea.s
         |  GROUP BY 1, 2)
         |SELECT cm.doc_a, cm.doc_b, common,
         |  sa.sz AS sz_a, sb.sz AS sz_b,
         |  round(CAST(common AS DOUBLE) / sa.sz, 6) AS containment
         |FROM cm JOIN szs sa ON sa.id = cm.doc_a
         |  JOIN szs sb ON sb.id = cm.doc_b
         |WHERE common * 1000000 >= 800000 * sa.sz""".stripMargin,
    "q_qini" ->
      s"""WITH u AS (SELECT user_id,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS spend,
         |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS cv
         |  FROM events GROUP BY 1),
         |r AS (SELECT user_id, spend, user_id % 2 = 0 AS treated,
         |    cv >= 12 AS converted,
         |    CAST(row_number() OVER (ORDER BY spend DESC, user_id)
         |      AS BIGINT) AS rk,
         |    CAST(COUNT(*) OVER () AS BIGINT) AS n
         |  FROM u),
         |c AS (SELECT (rk * 10 + n - 1) // n AS decile, rk,
         |    CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END)
         |      OVER pw AS BIGINT) AS c_t,
         |    CAST(SUM(CASE WHEN treated AND converted THEN 1 ELSE 0 END)
         |      OVER pw AS BIGINT) AS c_ct,
         |    CAST(SUM(CASE WHEN NOT treated THEN 1 ELSE 0 END)
         |      OVER pw AS BIGINT) AS c_c,
         |    CAST(SUM(CASE WHEN NOT treated AND converted THEN 1
         |      ELSE 0 END) OVER pw AS BIGINT) AS c_cc
         |  FROM r WINDOW pw AS (ORDER BY rk
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |d AS (SELECT decile, CAST(MAX(rk) AS BIGINT) AS depth,
         |    CAST(MAX(c_t) AS BIGINT) AS n_t,
         |    CAST(MAX(c_ct) AS BIGINT) AS conv_t,
         |    CAST(MAX(c_c) AS BIGINT) AS n_c,
         |    CAST(MAX(c_cc) AS BIGINT) AS conv_c
         |  FROM c GROUP BY 1),
         |qd AS (SELECT *, ${graft.operators.Eval.qiniQMicroSql}
         |    AS q_micro FROM d),
         |tr AS (SELECT *, CAST(q_micro +
         |      lag(q_micro, 1, 0) OVER (ORDER BY decile)
         |    AS BIGINT) AS __trap
         |  FROM qd)
         |SELECT decile, depth, n_t, conv_t, n_c, conv_c,
         |  CASE WHEN q_micro IS NOT NULL THEN
         |    round(q_micro / 1e6, 6) END AS q,
         |  ${graft.operators.Eval.qiniCoefSql(10)} AS qini_coef
         |FROM tr""".stripMargin,
    "q_time_to_convert" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms
         |  FROM events),
         |ft AS (SELECT user_id, MIN(ts_ms) AS t0 FROM e
         |  WHERE event_type IN ('click', 'error', 'signup', 'view')
         |  GROUP BY 1),
         |lat AS (SELECT 'c' || CAST(e.user_id % 2 AS VARCHAR) AS cohort,
         |    CAST(MIN(e.ts_ms) - MAX(ft.t0) AS BIGINT) AS v
         |  FROM e JOIN ft ON ft.user_id = e.user_id
         |  WHERE e.event_type = 'purchase' AND e.ts_ms >= ft.t0
         |  GROUP BY e.user_id, 1),
         |per AS (SELECT cohort, v, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM lat GROUP BY 1, 2),
         |c AS (SELECT *,
         |    CAST(SUM(cnt) OVER (PARTITION BY cohort ORDER BY v)
         |      AS BIGINT) AS cum,
         |    CAST(SUM(cnt) OVER (PARTITION BY cohort) AS BIGINT) AS n
         |  FROM per),
         |q AS (SELECT CAST(q AS BIGINT) AS q_ppm
         |  FROM (VALUES (250000), (500000), (900000)) t(q))
         |SELECT cohort, q_ppm, CAST(MAX(n) AS BIGINT) AS n,
         |  CAST(MIN(v) AS BIGINT) AS value
         |FROM c JOIN q ON cum >= (q_ppm * n + 999999) // 1000000
         |GROUP BY 1, 2""".stripMargin,
    "q_shapley" ->
      s"""WITH um AS (SELECT user_id, CAST(SUM(b) AS BIGINT) AS mask
         |  FROM (SELECT DISTINCT user_id,
         |      CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
         |        WHEN 'signup' THEN 4 WHEN 'view' THEN 8 END AS b
         |    FROM events
         |    WHERE event_type IN ('click', 'error', 'signup', 'view'))
         |  GROUP BY 1),
         |cv AS (SELECT DISTINCT user_id FROM events
         |  WHERE event_type = 'purchase'),
         |sig AS (SELECT mask, CAST(SUM(CASE WHEN cv.user_id IS NOT NULL
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_conv
         |  FROM um LEFT JOIN cv USING (user_id) GROUP BY 1),
         |co AS (SELECT CAST(range AS BIGINT) AS s FROM range(0, 16)),
         |vs AS (SELECT co.s,
         |    CAST(COALESCE(SUM(sig.n_conv), 0) AS BIGINT) AS v
         |  FROM co LEFT JOIN sig ON (sig.mask & co.s) = sig.mask
         |  GROUP BY 1),
         |ch AS (SELECT * FROM (VALUES ('click', 1), ('error', 2),
         |    ('signup', 4), ('view', 8)) AS t(channel, bit)),
         |pairs AS (SELECT ch.channel,
         |    ((a.s >> 0) & 1) + ((a.s >> 1) & 1) + ((a.s >> 2) & 1) +
         |      ((a.s >> 3) & 1) AS ps,
         |    a.v AS v_s, b.v AS v_si
         |  FROM ch JOIN vs a ON (a.s & ch.bit) = 0
         |  JOIN vs b ON b.s = (a.s | ch.bit))
         |SELECT channel,
         |  CAST(SUM((CASE ps WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2
         |    ELSE 6 END) * (v_si - v_s)) AS BIGINT) AS phi_num,
         |  round(CAST(SUM((CASE ps WHEN 0 THEN 6 WHEN 1 THEN 2
         |    WHEN 2 THEN 2 ELSE 6 END) * (v_si - v_s)) AS DOUBLE) / 24,
         |    6) AS phi
         |FROM pairs GROUP BY 1""".stripMargin,
    "q_ks_test" ->
      s"""WITH e AS (SELECT event_type,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS v FROM events
         |  WHERE event_type IN ('purchase', 'click')),
         |u AS (SELECT v,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
         |      END) AS BIGINT) AS ca,
         |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
         |      END) AS BIGINT) AS cb
         |  FROM e GROUP BY 1),
         |c AS (SELECT v, ca, cb,
         |    CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) AS cum_ca,
         |    CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) AS cum_cb,
         |    CAST(SUM(ca) OVER () AS BIGINT) AS n_a,
         |    CAST(SUM(cb) OVER () AS BIGINT) AS n_b
         |  FROM u),
         |g AS (SELECT *, ABS(cum_ca * n_b - cum_cb * n_a) AS gap
         |  FROM c),
         |m AS (SELECT CAST(MAX(gap) AS BIGINT) AS d_num FROM g)
         |SELECT n_a, n_b, d_num, CAST(MIN(v) AS BIGINT) AS d_at,
         |  ${graft.operators.Profiling.ksDSql} AS d,
         |  ${graft.operators.Profiling.ksSigSql} AS significant
         |FROM g, m WHERE gap = d_num GROUP BY 1, 2, 3""".stripMargin,
    "q_chi2_features" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' '))
         |    AS tok FROM documents),
         |h0 AS (SELECT doc_id,
         |    CAST('0x'||substr(md5(tok),1,15) AS BIGINT) % 64 AS dim,
         |    CASE WHEN CAST('0x'||substr(md5('sgn:'||tok),1,15)
         |      AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS s
         |  FROM t),
         |h AS (SELECT doc_id, dim FROM h0
         |  GROUP BY 1, 2 HAVING SUM(s) <> 0),
         |lb0 AS (SELECT doc_id, lang = 'en' AS is_en FROM documents),
         |it AS (SELECT h.doc_id, h.dim, lb0.is_en
         |  FROM h JOIN lb0 USING (doc_id)),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_pos
         |  FROM (SELECT DISTINCT doc_id, is_en FROM it)),
         |gg AS (SELECT dim,
         |    CAST(SUM(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS a,
         |    CAST(SUM(CASE WHEN is_en THEN 0 ELSE 1 END) AS BIGINT) AS b
         |  FROM it GROUP BY 1),
         |cc AS (SELECT dim, a, b, CAST(n_pos - a AS BIGINT) AS c,
         |    CAST(n_docs - n_pos - b AS BIGINT) AS d FROM gg, tot)
         |SELECT dim, a, b, c, d,
         |  ${graft.operators.Eval.chi2x2Sql} AS chi2,
         |  coalesce(${graft.operators.Eval.chi2x2Sql} > 3.841459, false)
         |    AS significant
         |FROM cc""".stripMargin,
    "q_feature_hash" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' '))
         |    AS tok FROM documents),
         |h AS (SELECT doc_id,
         |    CAST('0x'||substr(md5(tok),1,15) AS BIGINT) % 64 AS dim,
         |    CASE WHEN CAST('0x'||substr(md5('sgn:'||tok),1,15)
         |      AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS s
         |  FROM t)
         |SELECT doc_id, dim, CAST(SUM(s) AS BIGINT) AS value
         |FROM h GROUP BY 1, 2 HAVING SUM(s) <> 0""".stripMargin,
    "q_vocab_stats" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' '))
         |    AS token FROM documents),
         |per AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS tf,
         |    CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
         |  FROM t GROUP BY 1),
         |c AS (SELECT *,
         |    CAST(row_number() OVER (ORDER BY tf DESC, token) AS BIGINT)
         |      AS rank,
         |    CAST(SUM(tf) OVER (ORDER BY tf DESC, token) AS BIGINT)
         |      AS cum_tf,
         |    CAST(SUM(tf) OVER () AS BIGINT) AS tot
         |  FROM per)
         |SELECT token, tf, df, rank,
         |  round(CAST(cum_tf AS DOUBLE) / tot, 6) AS cum_share,
         |  df < 2 AS is_rare,
         |  cum_tf * 1000000 <= 500000 * tot AS is_head
         |FROM c""".stripMargin,
    "q_neyman" ->
      s"""WITH e AS (SELECT event_type,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS v FROM events),
         |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pop,
         |    CAST(SUM(v) AS BIGINT) AS sx,
         |    CAST(SUM(CAST(v AS DECIMAL(38,0)) * v) AS DECIMAL(38,0))
         |      AS __sxx
         |  FROM e GROUP BY 1),
         |w AS (SELECT event_type, n_pop, sx,
         |    ${graft.operators.Sampling.neymanSdSql} AS sd FROM m),
         |w2 AS (SELECT event_type, n_pop, sx, sd,
         |    CAST(round(1000000 * n_pop * coalesce(sd, 0), 0) AS BIGINT)
         |      AS w_micro FROM w),
         |tt AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS wt FROM w2),
         |b AS (SELECT event_type, n_pop, sx, sd, w_micro, wt,
         |    CASE WHEN wt > 0 THEN CAST((CAST(1000 AS HUGEINT) *
         |      w_micro) // wt AS BIGINT) ELSE CAST(0 AS BIGINT) END
         |      AS base,
         |    CASE WHEN wt > 0 THEN CAST((CAST(1000 AS HUGEINT) *
         |      w_micro) % wt AS BIGINT) ELSE CAST(0 AS BIGINT) END
         |      AS rem
         |  FROM w2, tt),
         |d AS (SELECT CASE WHEN MAX(wt) > 0 THEN
         |    1000 - CAST(SUM(base) AS BIGINT)
         |    ELSE CAST(0 AS BIGINT) END AS def FROM b),
         |r AS (SELECT *, row_number() OVER
         |    (ORDER BY rem DESC, event_type) AS rk FROM b)
         |SELECT event_type, n_pop, sx, sd, w_micro,
         |  CAST(base + CASE WHEN rk <= def THEN 1 ELSE 0 END
         |    AS BIGINT) AS alloc
         |FROM r, d""".stripMargin,
    "q_betweenness" -> betweennessOracle,
    "q_katz" -> katzOracle,
    "q_max_cover" -> maxCoverOracle,
    "q_ngram_novelty" ->
      s"""WITH $shingleCte,
         |ex AS (SELECT doc_id, unnest(sh.sh) AS g FROM sh),
         |fs AS (SELECT g, CAST(MIN(doc_id) AS BIGINT) AS first_id
         |  FROM ex GROUP BY 1)
         |SELECT ex.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         |  CAST(SUM(CASE WHEN fs.first_id = ex.doc_id THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_novel,
         |  round(CAST(SUM(CASE WHEN fs.first_id = ex.doc_id THEN 1
         |    ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS novelty
         |FROM ex JOIN fs USING (g)
         |GROUP BY 1""".stripMargin,
    "q_silhouette" ->
      s"""WITH $normCte,
         |cent AS (SELECT vec_id AS cell, embedding, nrm FROM n
         |  ORDER BY vec_id LIMIT 16),
         |d AS (SELECT q.vec_id, c.cell,
         |    round($cosineSqlExpr, 6) AS sim,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY round($cosineSqlExpr, 6) DESC, c.cell) AS r
         |  FROM n q CROSS JOIN cent c),
         |pv AS (SELECT vec_id,
         |    CAST(MAX(CASE WHEN r = 1 THEN cell END) AS BIGINT) AS cell,
         |    MAX(CASE WHEN r = 1 THEN sim END) AS sim_own,
         |    MAX(CASE WHEN r = 2 THEN sim END) AS sim_next
         |  FROM d WHERE r <= 2 GROUP BY 1),
         |sm AS (SELECT cell,
         |    ${graft.operators.Similarity.silhouetteMicroSql} AS s_micro
         |  FROM pv),
         |g AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(s_micro) AS BIGINT) AS s_sum,
         |    CAST(COUNT(s_micro) AS BIGINT) AS s_n
         |  FROM sm GROUP BY 1)
         |SELECT cell, n, s_sum, s_n,
         |  CASE WHEN s_n > 0 THEN
         |    round(CAST(s_sum AS DOUBLE) / s_n / 1e6, 6) END AS s_mean
         |FROM g""".stripMargin,
    "q_page_hinkley" ->
      s"""WITH $hourlySpendCte,
         |r AS (SELECT event_type, h, v,
         |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY h)
         |      AS BIGINT) AS rn,
         |    CAST(SUM(v) OVER (PARTITION BY event_type ORDER BY h)
         |      AS BIGINT) AS sv
         |  FROM hb),
         |t AS (SELECT event_type, h,
         |    ${graft.operators.TimeSeries.phTermMicroSql(100L)} AS term
         |  FROM r),
         |p AS (SELECT event_type, h,
         |    CAST(SUM(term) OVER (PARTITION BY event_type ORDER BY h)
         |      AS BIGINT) AS ph
         |  FROM t),
         |gaps AS (SELECT event_type, h,
         |    ph - CAST(MIN(ph) OVER (PARTITION BY event_type ORDER BY h)
         |      AS BIGINT) AS gap
         |  FROM p),
         |fl AS (SELECT event_type, h, gap,
         |    gap > CAST(50000 AS BIGINT) * 1000000 AS alarm FROM gaps)
         |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |  MAX(alarm) AS drift,
         |  CAST(MIN(CASE WHEN alarm THEN h END) AS BIGINT)
         |    AS first_alarm_bucket,
         |  round(CAST(MAX(gap) AS BIGINT) / 1e6, 6) AS max_gap
         |FROM fl GROUP BY 1""".stripMargin,
    "q_enrichment" ->
      s"""WITH e AS (SELECT event_type,
         |    CAST(ROUND(value*100, 0) AS BIGINT) >= 8000 AS hi
         |  FROM events),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot,
         |    CAST(SUM(CASE WHEN hi THEN 1 ELSE 0 END) AS BIGINT)
         |      AS k_tot FROM e),
         |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN hi THEN 1 ELSE 0 END) AS BIGINT) AS k
         |  FROM e GROUP BY 1),
         |j AS (SELECT * FROM g, tot)
         |SELECT event_type, n, k, n_tot, k_tot,
         |  round(CAST(n AS DOUBLE) * k_tot / n_tot, 6) AS expected,
         |  ${graft.operators.Profiling.enrichRatioSql} AS ratio,
         |  ${graft.operators.Profiling.enrichZSql} AS z,
         |  round(${graft.operators.Profiling.normalPSql(
            graft.operators.Profiling.enrichZSql)}, 6) AS p_normal,
         |  coalesce(abs(${graft.operators.Profiling.enrichZSql})
         |    > 1.959964, false) AS significant
         |FROM j""".stripMargin,
    "q_tukey_fences" ->
      s"""WITH e AS (SELECT event_type,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS v FROM events),
         |per AS (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM e GROUP BY 1, 2),
         |c AS (SELECT *,
         |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY v)
         |      AS BIGINT) AS cum,
         |    CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
         |  FROM per),
         |qa AS (SELECT event_type, CAST(MIN(v) AS BIGINT) AS q1
         |  FROM c WHERE cum >= (n + 3) // 4 GROUP BY 1),
         |qb AS (SELECT event_type, CAST(MIN(v) AS BIGINT) AS q3
         |  FROM c WHERE cum >= (3 * n + 3) // 4 GROUP BY 1),
         |f AS (SELECT qa.event_type, q1, q3,
         |    4 * q1 - 6 * (q3 - q1) AS lo4,
         |    4 * q3 + 6 * (q3 - q1) AS hi4
         |  FROM qa JOIN qb USING (event_type))
         |SELECT c.event_type, CAST(MAX(n) AS BIGINT) AS n, q1, q3,
         |  q3 - q1 AS iqr,
         |  round(CAST(lo4 AS DOUBLE) / 4, 6) AS fence_lo,
         |  round(CAST(hi4 AS DOUBLE) / 4, 6) AS fence_hi,
         |  CAST(SUM(CASE WHEN 4 * v < lo4 THEN cnt ELSE 0 END)
         |    AS BIGINT) AS n_low,
         |  CAST(SUM(CASE WHEN 4 * v > hi4 THEN cnt ELSE 0 END)
         |    AS BIGINT) AS n_high
         |FROM c JOIN f USING (event_type)
         |GROUP BY 1, 3, 4, 5, 6, 7""".stripMargin,
    "q_equidepth_hist" ->
      s"""WITH e AS (SELECT event_type,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS v FROM events),
         |per AS (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM e GROUP BY 1, 2),
         |c AS (SELECT *,
         |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY v)
         |      AS BIGINT) AS cum,
         |    CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
         |  FROM per)
         |SELECT event_type, (cum * 8 + n - 1) // n AS bucket,
         |  CAST(MIN(v) AS BIGINT) AS lo, CAST(MAX(v) AS BIGINT) AS hi,
         |  CAST(SUM(cnt) AS BIGINT) AS cnt,
         |  CAST(COUNT(*) AS BIGINT) AS n_distinct
         |FROM c GROUP BY 1, 2""".stripMargin,
    "q_conover" ->
      s"""WITH e AS (SELECT event_type,
         |    CAST(ROUND(value*100, 0) AS BIGINT) AS v FROM events),
         |per AS (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM e GROUP BY 1, 2),
         |c AS (SELECT *,
         |    CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY v)
         |      AS BIGINT) AS cum,
         |    CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
         |  FROM per),
         |ma AS (SELECT event_type, CAST(MIN(v) AS BIGINT) AS m_lo
         |  FROM c WHERE cum >= (n + 1) // 2 GROUP BY 1),
         |mb AS (SELECT event_type, CAST(MIN(v) AS BIGINT) AS m_hi
         |  FROM c WHERE cum >= (n + 2) // 2 GROUP BY 1),
         |med AS (SELECT ma.event_type, m_lo + m_hi AS m2
         |  FROM ma JOIN mb USING (event_type)),
         |u AS (SELECT e.event_type, ABS(2 * e.v - m2) AS u
         |  FROM e JOIN med USING (event_type)),
         |pu AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS cnt_u
         |  FROM u GROUP BY 1),
         |rk AS (SELECT u, cnt_u,
         |    CAST(SUM(cnt_u) OVER (ORDER BY u) AS BIGINT) AS cum_cnt_u,
         |    CAST(SUM(cnt_u) OVER () AS BIGINT) AS nn FROM pu),
         |aa AS (SELECT u, cnt_u, nn,
         |    ${graft.operators.Normalize.conoverAMicroSql} AS a
         |  FROM (SELECT *, 2 * cum_cnt_u - cnt_u + 1 AS r2 FROM rk)),
         |pg AS (SELECT ug.event_type,
         |    CAST(SUM(ug.c_gu * aa.a) AS BIGINT) AS s_g,
         |    CAST(SUM(ug.c_gu) AS BIGINT) AS n_g
         |  FROM (SELECT event_type, u, CAST(COUNT(*) AS BIGINT) AS c_gu
         |      FROM u GROUP BY 1, 2) ug
         |    JOIN aa ON aa.u = ug.u
         |  GROUP BY 1),
         |pt AS (SELECT event_type, s_g, n_g,
         |    CAST(round(CAST(s_g AS DOUBLE) * s_g / n_g, 0) AS BIGINT)
         |      AS term FROM pg),
         |tt AS (SELECT CAST(MAX(nn) AS BIGINT) AS n,
         |    CAST(SUM(cnt_u * a * a) AS BIGINT) AS sa2 FROM aa),
         |gg AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
         |    CAST(SUM(term) AS BIGINT) AS st,
         |    CAST(SUM(s_g) AS BIGINT) AS s_tot FROM pt)
         |SELECT n, k, st, s_tot, sa2,
         |  ${graft.operators.Normalize.conoverTSql} AS t_conover,
         |  ${graft.operators.Profiling.chi2Crit95Sql("k - 1")}
         |    AS chi2_crit,
         |  coalesce(${graft.operators.Normalize.conoverTSql} >
         |    ${graft.operators.Profiling.chi2Crit95Sql("k - 1")}, false)
         |    AS significant
         |FROM gg, tt""".stripMargin,
    "q_forecast_accuracy" ->
      s"""WITH $hourlySpendCte,
         |r AS (SELECT event_type, h, v,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h)
         |      AS rn,
         |    lag(v, 24) OVER (PARTITION BY event_type ORDER BY h) AS yf,
         |    lag(v, 1) OVER (PARTITION BY event_type ORDER BY h) AS ys
         |  FROM hb),
         |t AS (SELECT event_type, v, yf, ys,
         |    ${graft.operators.TimeSeries.smapeTermMicroSql} AS sm_term
         |  FROM r WHERE rn > 24),
         |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(ABS(v - yf)) AS BIGINT) AS sae,
         |    CAST(SUM((v - yf) * (v - yf)) AS BIGINT) AS sse,
         |    CAST(SUM(ABS(v - ys)) AS BIGINT) AS sas,
         |    CAST(SUM(sm_term) AS BIGINT) AS sm_sum,
         |    CAST(COUNT(sm_term) AS BIGINT) AS sm_n
         |  FROM t GROUP BY 1)
         |SELECT event_type, n, sae, sse, sas, sm_sum, sm_n,
         |  round(CAST(sae AS DOUBLE) / n, 6) AS mae,
         |  round(sqrt(CAST(sse AS DOUBLE) / n), 6) AS rmse,
         |  ${graft.operators.TimeSeries.smapeSql} AS smape,
         |  ${graft.operators.TimeSeries.maseSql} AS mase
         |FROM g""".stripMargin,
    "q_dtype_canary" ->
      s"""WITH g AS (SELECT l_returnflag AS flag,
         |    CAST(COUNT(*) AS BIGINT) AS c_long,
         |    CAST(COUNT(DISTINCT l_linenumber) AS INTEGER) AS c_int,
         |    CAST(MAX(l_linenumber) AS SMALLINT) AS c_short,
         |    CAST(MIN(l_linenumber) AS TINYINT) AS c_byte,
         |    CAST(MIN(l_quantity) AS REAL) AS c_float,
         |    round(CAST(SUM(CAST(ROUND(l_extendedprice*100, 0) AS BIGINT))
         |      AS DOUBLE) / (100.0 * COUNT(*)), 6) AS c_double,
         |    CAST(MIN(l_shipdate) AS DATE) AS c_date,
         |    CAST(epoch_ms(MAX(l_shipdate)) AS BIGINT) AS c_ts_ms,
         |    CAST(CAST(SUM(CAST(l_quantity AS BIGINT)) AS DECIMAL(38,0))
         |      AS VARCHAR) AS c_dec_str
         |  FROM lineitem GROUP BY 1)
         |SELECT flag, c_long, c_int, c_short, c_byte, c_float, c_double,
         |  c_date, c_ts_ms, c_dec_str, flag = 'R' AS c_bool,
         |  CASE WHEN flag = 'N' THEN NULL ELSE c_double END
         |    AS c_null_double,
         |  CASE WHEN flag = 'N' THEN NULL ELSE c_date END AS c_null_date
         |FROM g""".stripMargin,
    "q_auc_ci" ->
      s"""WITH per AS (SELECT CAST(ROUND(value*100, 0) AS BIGINT) AS v,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS cp,
         |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END)
         |      AS BIGINT) AS cn
         |  FROM events GROUP BY 1),
         |c AS (SELECT *,
         |    CAST(SUM(cn) OVER (ORDER BY v) AS BIGINT) AS cum_cn,
         |    CAST(SUM(cp) OVER (ORDER BY v) AS BIGINT) AS cum_cp
         |  FROM per),
         |tot AS (SELECT CAST(SUM(cp) AS BIGINT) AS n_pos,
         |    CAST(SUM(cn) AS BIGINT) AS n_neg FROM per),
         |t AS (SELECT c.*, n_pos, n_neg,
         |    2*(cum_cn - cn) + cn AS vpos,
         |    2*(n_pos - cum_cp) + cp AS wneg
         |  FROM c, tot),
         |g AS (SELECT n_pos, n_neg,
         |    CAST(SUM(cp * vpos) AS BIGINT) AS sv,
         |    CAST(SUM(CAST(cp AS DECIMAL(38,0)) * vpos * vpos)
         |      AS DECIMAL(38,0)) AS svv,
         |    CAST(SUM(cn * wneg) AS BIGINT) AS sw,
         |    CAST(SUM(CAST(cn AS DECIMAL(38,0)) * wneg * wneg)
         |      AS DECIMAL(38,0)) AS sww
         |  FROM t GROUP BY 1, 2),
         |a AS (SELECT n_pos, n_neg, sv, sw,
         |    ${graft.operators.Eval.aucPointSql} AS auc,
         |    ${graft.operators.Eval.aucSeSql} AS se FROM g)
         |SELECT n_pos, n_neg, sv, sw, auc, se,
         |  round(auc - 1.959964 * se, 6) AS ci_lo,
         |  round(auc + 1.959964 * se, 6) AS ci_hi
         |FROM a""".stripMargin,
    "q_power_analysis" ->
      s"""WITH ud AS (SELECT event_type, user_id,
         |    epoch_ms(ts) // 86400000 AS day,
         |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT)
         |      AS cents
         |  FROM events GROUP BY 1, 2, 3),
         |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(cents) AS BIGINT) AS sx,
         |    CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents)
         |      AS DECIMAL(38,0)) AS sxx
         |  FROM ud GROUP BY 1)
         |SELECT event_type, n,
         |  ${graft.operators.Eval.powerVarSql} AS variance,
         |  ${graft.operators.Eval.powerNReqSql(5000L)} AS n_required,
         |  ${graft.operators.Eval.powerMdeSql} AS mde
         |FROM g""".stripMargin,
    "q_elasticity" ->
      s"""WITH li AS (SELECT p_brand,
         |    CAST(round(1000 * ln(CAST(l_quantity AS DOUBLE)), 0)
         |      AS BIGINT) AS y,
         |    CAST(round(1000 * ln(CAST(ROUND(l_extendedprice*100, 0)
         |      AS BIGINT) / CAST(l_quantity AS DOUBLE)), 0) AS BIGINT) AS x
         |  FROM lineitem JOIN part ON l_partkey = p_partkey),
         |g AS (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS m,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))
         |      AS sxx,
         |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
         |      AS sxy,
         |    CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
         |      AS syy
         |  FROM li GROUP BY 1)
         |SELECT p_brand, m AS n,
         |  ${graft.operators.TimeSeries.dfBetaSql} AS slope,
         |  ${graft.operators.TimeSeries.elasticityR2Sql} AS r2
         |FROM g""".stripMargin,
    "q_seasonal_anomaly" ->
      s"""WITH $decomposeCtes,
         |rm AS (SELECT event_type, h,
         |    CAST(round(remainder * 1e6, 0) AS BIGINT) AS r_micro
         |  FROM dc),
         |m AS (SELECT event_type, quantile_cont(r_micro, 0.5) AS med
         |  FROM rm GROUP BY 1),
         |d AS (SELECT rm.event_type, h, r_micro, med,
         |    ABS(r_micro - med) AS rawdev
         |  FROM rm JOIN m USING (event_type)),
         |md AS (SELECT event_type, quantile_cont(rawdev, 0.5) AS mad
         |  FROM d GROUP BY 1)
         |SELECT d.event_type, h, r_micro, round(med, 6) AS med,
         |  round(mad, 6) AS mad, round(rawdev, 6) AS dev,
         |  (mad > 0 AND rawdev > 5 * mad) AS anomaly
         |FROM d JOIN md USING (event_type)
         |ORDER BY rawdev DESC, d.event_type, h LIMIT 20""".stripMargin,
    "q_pq_adc" ->
      s"""WITH $pqEncodeCtes,
         |qx AS (SELECT vec_id AS qid, subspace, i, xq FROM x
         |  WHERE vec_id < 8),
         |adc AS (SELECT qid, qx.subspace, cb.code,
         |    CAST(SUM((qx.xq - cb.cq) * (qx.xq - cb.cq)) AS BIGINT) AS d2
         |  FROM qx JOIN cb ON cb.subspace = qx.subspace AND cb.i = qx.i
         |  GROUP BY 1, 2, 3),
         |ap AS (SELECT adc.qid, pq.vec_id,
         |    CAST(SUM(adc.d2) AS BIGINT) AS adc_dist2
         |  FROM pq JOIN adc ON adc.subspace = pq.subspace
         |    AND adc.code = pq.code
         |  WHERE pq.vec_id <> adc.qid GROUP BY 1, 2)
         |SELECT qid, vec_id, adc_dist2, rank FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY qid
         |    ORDER BY adc_dist2, vec_id) AS BIGINT) AS rank FROM ap)
         |WHERE rank <= 10""".stripMargin,
    "q_by_fdr" ->
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
         |r2 AS (SELECT *, CAST(SUM(CAST(round(1000000.0 / p_rank, 0)
         |      AS BIGINT)) OVER () AS BIGINT) AS hm_micro FROM r),
         |ks AS (SELECT CAST(COALESCE(MAX(CASE WHEN p * m_tests * hm_micro
         |      <= p_rank * 100000 THEN p_rank END), 0) AS BIGINT) AS k_star
         |  FROM r2)
         |SELECT user_id, n1, n2, z, p, p_rank, m_tests, hm_micro, k_star,
         |  (p_rank <= k_star) AS rejected
         |FROM r2, ks""".stripMargin,
    "q_wav_activity" ->
      // replays the GATED saw synthesis sample-by-sample (the
      // synthesizeWavGated formula), folds exact frame sums, then the
      // same integer threshold + gaps-and-islands segmentation
      """WITH p AS (SELECT doc_id, 100 + doc_id % 400 AS freq,
        |    500 + n_chars % 500 AS n FROM documents),
        |s AS (SELECT doc_id, freq, unnest(range(0, n)) AS i FROM p),
        |v AS (SELECT doc_id, i // 200 AS frame,
        |    CASE WHEN (i // 200) % 3 = 0 THEN 0
        |      ELSE ((i * freq) % 8000) * 65536 // 8000 - 32768 END AS x
        |  FROM s),
        |f AS (SELECT doc_id, CAST(frame AS BIGINT) AS frame,
        |    CAST(COUNT(*) AS BIGINT) AS n_samples,
        |    CAST(SUM(x * x) AS BIGINT) AS sumsq
        |  FROM v GROUP BY 1, 2),
        |a AS (SELECT *, frame - row_number() OVER (PARTITION BY doc_id
        |      ORDER BY frame) AS isl
        |  FROM f WHERE sumsq > 268435456 * n_samples),
        |g AS (SELECT doc_id, isl,
        |    CAST(MIN(frame) AS BIGINT) AS start_frame,
        |    CAST(MAX(frame) AS BIGINT) AS end_frame,
        |    CAST(COUNT(*) AS BIGINT) AS n_frames,
        |    CAST(SUM(n_samples) AS BIGINT) AS n_samples,
        |    CAST(SUM(sumsq) AS BIGINT) AS sumsq
        |  FROM a GROUP BY 1, 2)
        |SELECT doc_id, start_frame, end_frame, n_frames, n_samples,
        |  sumsq, round(sqrt(CAST(sumsq AS DOUBLE) / n_samples), 6) AS rms
        |FROM g""".stripMargin,
    "q_macd" ->
      s"""WITH $hourlySpendCte,
         |w1 AS (SELECT event_type, h, v,
         |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY h)
         |      AS BIGINT) AS rn,
         |    list(CAST(v AS DOUBLE)) OVER (PARTITION BY event_type
         |      ORDER BY h ROWS BETWEEN 59 PRECEDING AND CURRENT ROW) AS vs
         |  FROM hb),
         |m AS (SELECT event_type, h, v, rn,
         |    round(${graft.operators.TimeSeries.emaFoldDuckSql("vs",
              graft.operators.TimeSeries.emaAlpha(12))} -
         |      ${graft.operators.TimeSeries.emaFoldDuckSql("vs",
              graft.operators.TimeSeries.emaAlpha(26))}, 6) AS macd
         |  FROM w1),
         |m2 AS (SELECT event_type, h, v, rn, macd,
         |    list(macd) OVER (PARTITION BY event_type ORDER BY h
         |      ROWS BETWEEN 59 PRECEDING AND CURRENT ROW) AS ms
         |  FROM m),
         |sg AS (SELECT event_type, h, v, rn, macd,
         |    round(${graft.operators.TimeSeries.emaFoldDuckSql("ms",
              graft.operators.TimeSeries.emaAlpha(9))}, 6) AS signal
         |  FROM m2),
         |hh AS (SELECT event_type, h, v, rn, macd, signal,
         |    ${graft.operators.TimeSeries.macdHistSql} AS histogram
         |  FROM sg),
         |cc AS (SELECT *, lag(histogram) OVER (PARTITION BY event_type
         |    ORDER BY h) AS __ph FROM hh)
         |SELECT event_type, h, v, macd, signal, histogram,
         |  ${graft.operators.TimeSeries.macdCrossSql} AS crossover
         |FROM cc WHERE rn >= 26""".stripMargin,
    "q_stream_hhi" -> hhiOracleSql,
    "q_hhi" -> hhiOracleSql,
    "q_chain_entropy" ->
      s"""WITH s AS (SELECT user_id, event_type,
         |    lead(event_type) OVER (PARTITION BY user_id
         |      ORDER BY epoch_ms(ts), event_id) AS to_type
         |  FROM events),
         |cells AS (SELECT event_type AS from_type, to_type,
         |    CAST(COUNT(*) AS BIGINT) AS nij
         |  FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2),
         |cw AS (SELECT from_type, to_type, nij,
         |    CAST(SUM(nij) OVER (PARTITION BY from_type) AS BIGINT) AS ni
         |  FROM cells),
         |ct AS (SELECT nij,
         |    ${graft.operators.Sessionize.condTermMicroSql} AS t_cond
         |  FROM cw),
         |ca AS (SELECT CAST(SUM(nij) AS BIGINT) AS n_transitions,
         |    CAST(SUM(t_cond) AS BIGINT) AS s_cond_micro FROM ct),
         |mg AS (SELECT from_type, CAST(MAX(ni) AS BIGINT) AS ni
         |  FROM cw GROUP BY 1),
         |mt AS (SELECT ni,
         |    ${graft.operators.Sessionize.margTermMicroSql} AS t_marg
         |  FROM mg),
         |ma AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_states,
         |    CAST(SUM(t_marg) AS BIGINT) AS s_marg_micro FROM mt)
         |SELECT n_transitions, n_states,
         |  round(-CAST(s_cond_micro AS DOUBLE) / n_transitions / 1e6, 6)
         |    AS h_cond_bits,
         |  round(-CAST(s_marg_micro AS DOUBLE) / n_transitions / 1e6, 6)
         |    AS h_marginal_bits
         |FROM ca CROSS JOIN ma""".stripMargin,
    "q_seasonal_decompose" ->
      s"""WITH $decomposeCtes
         |SELECT event_type, h, v, phase, trend, seasonal, remainder
         |FROM dc""".stripMargin,
    "q_seasonal_strength" ->
      s"""WITH $decomposeCtes,
         |mi AS (SELECT event_type,
         |    CAST(round(remainder * 1e6, 0) AS BIGINT) AS r_mi,
         |    CAST(round(seasonal * 1e6, 0) AS BIGINT) +
         |      CAST(round(remainder * 1e6, 0) AS BIGINT) AS sr_mi,
         |    CAST(round(trend * 1e6, 0) AS BIGINT) +
         |      CAST(round(remainder * 1e6, 0) AS BIGINT) AS tr_mi
         |  FROM dc),
         |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(r_mi) AS BIGINT) AS s_r,
         |    CAST(SUM(CAST(r_mi AS DECIMAL(38,0)) * r_mi)
         |      AS DECIMAL(38,0)) AS q_r,
         |    CAST(SUM(sr_mi) AS BIGINT) AS s_sr,
         |    CAST(SUM(CAST(sr_mi AS DECIMAL(38,0)) * sr_mi)
         |      AS DECIMAL(38,0)) AS q_sr,
         |    CAST(SUM(tr_mi) AS BIGINT) AS s_tr,
         |    CAST(SUM(CAST(tr_mi AS DECIMAL(38,0)) * tr_mi)
         |      AS DECIMAL(38,0)) AS q_tr
         |  FROM mi GROUP BY 1)
         |SELECT event_type, n,
         |  ${graft.operators.TimeSeries.strengthSql("sr")} AS f_seasonal,
         |  ${graft.operators.TimeSeries.strengthSql("tr")} AS f_trend
         |FROM g""".stripMargin,
    "q_stream_page_hinkley" ->
      s"""WITH o AS (SELECT
         |    CAST('0x'||substr(md5(event_type),1,15) AS BIGINT) AS key,
         |    epoch_ms(ts) AS ts_ms, event_id AS tie,
         |    CAST(ROUND(value * 100, 0) AS BIGINT) AS x
         |  FROM events),
         |r AS (SELECT key, ts_ms, tie, x, x AS v,
         |    CAST(row_number() OVER pw AS BIGINT) AS rn,
         |    CAST(SUM(x) OVER pw AS BIGINT) AS sv
         |  FROM o WINDOW pw AS (PARTITION BY key ORDER BY ts_ms, tie
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |t AS (SELECT key, ts_ms, tie, x, rn, sv,
         |    ${graft.operators.TimeSeries.phTermMicroSql(100L)} AS term
         |  FROM r),
         |p AS (SELECT key, ts_ms, tie, x, rn, sv,
         |    CAST(SUM(term) OVER pw AS BIGINT) AS ph
         |  FROM t WINDOW pw AS (PARTITION BY key ORDER BY ts_ms, tie
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |g AS (SELECT *, CAST(MIN(ph) OVER pw AS BIGINT) AS ph_min
         |  FROM p WINDOW pw AS (PARTITION BY key ORDER BY ts_ms, tie
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT key, ts_ms, tie, x, rn, sv, ph, ph_min,
         |  ph - ph_min AS gap,
         |  ph - ph_min > CAST(50000 AS BIGINT) * 1000000 AS alarm
         |FROM g""".stripMargin,
    "q_stream_zscore" ->
      s"""WITH o AS (SELECT user_id AS key, epoch_ms(ts) AS ts_ms,
         |    event_id AS tie, CAST(ROUND(value * 100, 0) AS BIGINT) AS x
         |  FROM events),
         |w AS (SELECT key, ts_ms, tie, x,
         |    CAST(COUNT(*) OVER pw AS BIGINT) AS n_prior,
         |    CAST(COALESCE(SUM(x) OVER pw, 0) AS BIGINT) AS sx_prior,
         |    CAST(COALESCE(SUM(x * x) OVER pw, 0) AS BIGINT) AS sxx_prior
         |  FROM o WINDOW pw AS (PARTITION BY key ORDER BY ts_ms, tie
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         |SELECT key, ts_ms, tie, x, n_prior, sx_prior, sxx_prior,
         |  ${graft.streaming.StreamingZscore.zSql} AS z,
         |  coalesce(abs(${graft.streaming.StreamingZscore.zSql}) > 3, false)
         |    AS anomaly
         |FROM w""".stripMargin,
    "q_eigen_centrality" -> eigenCentralityOracle,
    "q_viterbi" -> viterbiOracle,
    "q_mis" -> misOracle,
    "q_boosted_stumps" -> boostedStumpsOracle,
    "q_simpson_check" ->
      s"""WITH nli AS (SELECT l_orderkey AS o_orderkey,
         |    CAST(COUNT(*) AS BIGINT) AS x1 FROM lineitem GROUP BY 1),
         |base AS (SELECT
         |    CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS BIGINT) <= 2
         |      THEN 1 ELSE 0 END AS t,
         |    CAST(ROUND(o_totalprice, 0) AS BIGINT) AS yo, x1
         |  FROM orders o JOIN nli USING (o_orderkey)),
         |cells AS (SELECT x1 AS g, CAST(SUM(t) AS BIGINT) AS nt,
         |    CAST(SUM(1 - t) AS BIGINT) AS nc,
         |    CAST(SUM(t * yo) AS BIGINT) AS syt,
         |    CAST(SUM((1 - t) * yo) AS BIGINT) AS syc
         |  FROM base GROUP BY 1),
         |a AS (SELECT CAST(SUM(nt) AS BIGINT) AS snt,
         |    CAST(SUM(nc) AS BIGINT) AS snc,
         |    CAST(SUM(syt) AS BIGINT) AS ssyt,
         |    CAST(SUM(syc) AS BIGINT) AS ssyc,
         |    CAST(SUM(CASE WHEN nt > 0 AND nc > 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_both,
         |    CAST(SUM(CASE WHEN nt > 0 AND nc > 0
         |      THEN CAST(sign(syt * nc - syc * nt) AS BIGINT)
         |      ELSE 0 END) AS BIGINT) AS sign_sum,
         |    CAST(SUM(CASE WHEN nt > 0 AND nc > 0
         |        AND syt * nc - syc * nt = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_tied
         |  FROM cells),
         |b AS (SELECT a.*,
         |    CAST(sign(ssyt * snc - ssyc * snt) AS BIGINT) AS overall_sign
         |  FROM a),
         |c AS (SELECT b.*,
         |    ${graft.operators.Eval.simpsonOppositeSql} AS n_opposite
         |  FROM b)
         |SELECT round(CAST(ssyt AS DOUBLE) / snt -
         |    CAST(ssyc AS DOUBLE) / snc, 6) AS diff_overall,
         |  n_both AS n_strata,
         |  n_both - n_tied - n_opposite AS n_agreeing,
         |  n_opposite, n_tied,
         |  overall_sign <> 0 AND n_opposite = n_both AND n_both > 0
         |    AS full_reversal
         |FROM c""".stripMargin,
    "q_four_cliques" ->
      // id-ordered triangle enumeration + the 3-way mutual-neighbor
      // extension (d > c) — each K4 exactly once, same top-20 order
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
        |k AS (
        |  SELECT t.a, t.b, t.c, x1.v AS d
        |  FROM t
        |  JOIN e x1 ON x1.u = t.c
        |  JOIN e x2 ON x2.u = t.b AND x2.v = x1.v
        |  JOIN e x3 ON x3.u = t.a AND x3.v = x1.v),
        |x AS (
        |  SELECT a AS id FROM k
        |  UNION ALL SELECT b FROM k
        |  UNION ALL SELECT c FROM k
        |  UNION ALL SELECT d FROM k)
        |SELECT id, CAST(count(*) AS BIGINT) AS n_k4 FROM x GROUP BY id
        |ORDER BY n_k4 DESC, id LIMIT 20""".stripMargin,
    "q_burrows_delta" ->
      s"""WITH tkf AS (SELECT src, w FROM (SELECT source AS src,
         |    unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE length(w) > 0),
         |counts AS (SELECT src, w, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM tkf GROUP BY 1, 2),
         |ct AS (SELECT src, w, c,
         |    CAST(SUM(c) OVER (PARTITION BY src) AS BIGINT) AS tot
         |  FROM counts),
         |nsrc AS (SELECT CAST(COUNT(DISTINCT src) AS BIGINT) AS ns
         |  FROM counts),
         |gw AS (SELECT w, CAST(SUM(c) AS BIGINT) AS cg
         |  FROM counts GROUP BY 1),
         |topw AS (SELECT w FROM (SELECT w,
         |    row_number() OVER (ORDER BY cg DESC, w) AS rk FROM gw)
         |  WHERE rk <= 30),
         |srcs AS (SELECT DISTINCT src, tot FROM ct),
         |grid AS (SELECT srcs.src, topw.w,
         |    CAST(ROUND(CAST(COALESCE(ct.c, 0) AS DOUBLE) / srcs.tot
         |      * 1000000, 0) AS BIGINT) AS fm
         |  FROM srcs CROSS JOIN topw
         |  LEFT JOIN ct ON ct.src = srcs.src AND ct.w = topw.w),
         |zt AS (SELECT src, w, fm,
         |    CAST(SUM(fm) OVER (PARTITION BY w) AS BIGINT) AS sf,
         |    CAST(SUM(fm * fm) OVER (PARTITION BY w) AS BIGINT) AS sff
         |  FROM grid),
         |z AS (SELECT src, w,
         |    ${graft.operators.TextAnalysis.burrowsZSql} AS z
         |  FROM zt, nsrc),
         |zz AS (SELECT src, w, z FROM z WHERE z IS NOT NULL),
         |p AS (SELECT a.src AS src_a, b.src AS src_b,
         |    CAST(ROUND(abs(a.z - b.z) * 1000000, 0) AS BIGINT) AS dm
         |  FROM zz a JOIN zz b ON b.w = a.w AND a.src < b.src)
         |SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  round(CAST(SUM(dm) AS DOUBLE) / COUNT(*) / 1000000, 6) AS delta
         |FROM p GROUP BY 1, 2""".stripMargin,
    "q_fd_check" -> Seq(
        ("o_orderkey", "o_custkey"),
        ("o_custkey", "o_orderstatus"),
        ("o_orderpriority", "o_orderstatus"),
        ("o_orderkey", "o_orderpriority"))
      .map { case (det, dep) =>
        s"""SELECT '$det' AS determinant, '$dep' AS dependent,
           |  CAST(COUNT(*) AS BIGINT) AS n_det_values,
           |  CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_violating_det,
           |  CAST(SUM(nd - 1) AS BIGINT) AS n_extra_dep,
           |  SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS holds
           |FROM (SELECT $det,
           |    COUNT(DISTINCT coalesce(CAST($dep AS VARCHAR), chr(1)))
           |      AS nd
           |  FROM orders GROUP BY 1)""".stripMargin
      }.mkString("\nUNION ALL "),
    "q_matrix_profile" -> matrixProfileOracle,
    "q_ar_forecast" -> arForecastOracle,
    "q_ridge_path" -> ridgePathOracle,
    "q_poisson_trend" -> poissonTrendOracle,
    "q_hitting_time" -> hittingTimeOracle,
    "q_weibull_fit" -> weibullFitOracle,
    "q_removal_effect" -> removalEffectOracle,
    "q_doubly_robust" -> doublyRobustOracle,
    "q_cem_att" ->
      s"""WITH nli AS (SELECT l_orderkey AS o_orderkey,
         |    CAST(COUNT(*) AS BIGINT) AS x1 FROM lineitem GROUP BY 1),
         |base AS (SELECT
         |    CASE WHEN CAST(substr(o_orderpriority, 1, 1) AS BIGINT) <= 2
         |      THEN 1 ELSE 0 END AS t,
         |    CAST(ROUND(o_totalprice, 0) AS BIGINT) AS yo,
         |    o_custkey % 7 AS x2, x1
         |  FROM orders o JOIN nli USING (o_orderkey)),
         |cells AS (SELECT x1, x2, CAST(SUM(t) AS BIGINT) AS nt,
         |    CAST(SUM(1 - t) AS BIGINT) AS nc,
         |    CAST(SUM(t * yo) AS BIGINT) AS syt,
         |    CAST(SUM((1 - t) * yo) AS BIGINT) AS syc
         |  FROM base GROUP BY 1, 2),
         |a AS (SELECT
         |    CAST(COUNT(CASE WHEN nt > 0 AND nc > 0 THEN 1 END) AS BIGINT)
         |      AS n_strata_matched,
         |    CAST(SUM(CASE WHEN nt > 0 AND nc > 0 THEN nt ELSE 0 END)
         |      AS BIGINT) AS n_treated_matched,
         |    CAST(SUM(CASE WHEN nt > 0 AND nc = 0 THEN nt ELSE 0 END)
         |      AS BIGINT) AS n_treated_unmatched,
         |    CAST(SUM(${graft.operators.Eval.cemCellSql}) AS BIGINT) AS sw
         |  FROM cells)
         |SELECT n_strata_matched, n_treated_matched, n_treated_unmatched,
         |  CASE WHEN n_treated_matched > 0 THEN
         |    round(CAST(sw AS DOUBLE) / 1000 / n_treated_matched, 6)
         |  ELSE NULL END AS att_cem
         |FROM a""".stripMargin,
    "q_extractive_chunks" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tl
        |  FROM documents),
        |tk AS (SELECT doc_id, unnest(range(0, len(tl))) AS pos, tl
        |  FROM toks),
        |tko AS (SELECT doc_id, pos, tl[pos + 1] AS w FROM tk
        |  WHERE length(tl[pos + 1]) > 0),
        |wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cw
        |  FROM tko GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cw) AS BIGINT) AS tw FROM wc),
        |ch AS (SELECT doc_id, CAST(pos // 10 AS BIGINT) AS chunk_idx,
        |    CAST(SUM(CAST(ROUND(ln(CAST(cw AS DOUBLE) / tw) * 1000000, 0)
        |      AS BIGINT)) AS BIGINT) AS slp,
        |    CAST(COUNT(*) AS BIGINT) AS nw
        |  FROM tko JOIN wc USING (w) CROSS JOIN tot GROUP BY 1, 2),
        |cs0 AS (SELECT doc_id, chunk_idx,
        |    round(CAST(slp AS DOUBLE) / nw / 1000000, 6) AS avg_lp
        |  FROM ch),
        |cs AS (SELECT doc_id, chunk_idx, avg_lp,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY avg_lp DESC, chunk_idx) AS rt,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY avg_lp, chunk_idx) AS rv,
        |    CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_chunks
        |  FROM cs0)
        |SELECT t.doc_id, t.n_chunks,
        |  t.chunk_idx AS typical_idx, t.avg_lp AS typical_score,
        |  v.chunk_idx AS novel_idx, v.avg_lp AS novel_score
        |FROM cs t JOIN cs v ON v.doc_id = t.doc_id
        |WHERE t.rt = 1 AND v.rv = 1""".stripMargin,
    "q_kmeans_lloyd" ->
      graft.operators.Similarity.kmeansLloydOracleSql(
        nCentroids = 8, rounds = 3),
    "q_logistic_irls" -> {
      val out = (1 to 4).map(i =>
        s"SELECT CAST($i AS BIGINT) AS iter, b0, b1, b2 FROM i$i")
        .mkString("\nUNION ALL ")
      s"""WITH s AS (SELECT
         |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
         |    CAST(ROUND(o_totalprice / 1000, 0) AS BIGINT) AS x1,
         |    CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS x2
         |  FROM orders),
         |${logisticIrlsCtes(4)}
         |$out""".stripMargin
    },
    "q_ipw_ate" -> {
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
         |f AS (SELECT base.*, ${graft.operators.Eval.ipwEhSql(0.01)} AS eh
         |  FROM base, i4),
         |a AS (SELECT CAST(SUM(t) AS BIGINT) AS n_treated,
         |    CAST(SUM(1 - t) AS BIGINT) AS n_control,
         |    ${ml("t * yo / eh")} AS ty,
         |    ${ml("t / eh")} AS tw,
         |    ${ml("(1 - t) * yo / (1.0 - eh)")} AS cy,
         |    ${ml("(1 - t) / (1.0 - eh)")} AS cw,
         |    CAST(SUM(t * yo) AS BIGINT) AS sty,
         |    CAST(SUM((1 - t) * yo) AS BIGINT) AS scy
         |  FROM f)
         |SELECT n_treated, n_control,
         |  ${graft.operators.Eval.ipwAteSql} AS ate_ipw,
         |  ${graft.operators.Eval.naiveDiffSql} AS diff_naive
         |FROM a""".stripMargin
    },
    "q_target_encode" -> {
      val enc = graft.operators.Eval.targetEncodeSql(10L)
      s"""WITH lab AS (SELECT l_orderkey AS o_orderkey,
         |    MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS __y
         |  FROM lineitem GROUP BY 1),
         |b AS (SELECT o.o_orderkey, o_orderpriority, __y
         |  FROM orders o JOIN lab USING (o_orderkey)),
         |w AS (SELECT *,
         |    CAST(SUM(__y) OVER (PARTITION BY o_orderpriority) AS BIGINT)
         |      AS __sc,
         |    CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT)
         |      AS __nc
         |  FROM b),
         |g AS (SELECT CAST(SUM(__y) AS BIGINT) AS __sg,
         |    CAST(COUNT(*) AS BIGINT) AS __ng FROM b)
         |SELECT o_orderkey, o_orderpriority,
         |  CAST(__y AS BIGINT) AS label, $enc AS enc
         |FROM w, g""".stripMargin
    },
  )

  /** The q_ols2 moment CTE + a VALUES lambda grid + the shared ridge
    * Cramer text (Eval.ridge2Solve). */
  private lazy val ridgePathOracle: String = {
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
  private lazy val poissonTrendOracle: String = {
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
  private lazy val boostedStumpsOracle: String = {
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
  private lazy val hittingTimeOracle: String = {
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
  private lazy val removalEffectOracle: String = {
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
  private lazy val weibullFitOracle: String =
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
  private lazy val doublyRobustOracle: String = {
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
  private def logisticIrlsCtes(iters: Int): String = {
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
  private lazy val matrixProfileOracle: String =
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
  private lazy val arForecastOracle: String = {
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
  private val symCoPurchaseCte: String =
    """cu AS (
      |  SELECT DISTINCT CAST(a.l_partkey AS BIGINT) AS lo,
      |                  CAST(b.l_partkey AS BIGINT) AS hi
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |e AS (SELECT lo AS src, hi AS dst FROM cu
      |  UNION ALL SELECT hi AS src, lo AS dst FROM cu)""".stripMargin

  /** Unrolled 4-round max-normalized power iteration over the
    * symmetrized co-purchase graph (Graph.eigenCentralitySql). */
  private lazy val eigenCentralityOracle: String =
    s"""WITH $symCoPurchaseCte,
       |${graft.operators.Graph.eigenCentralitySql(4)}""".stripMargin

  /** Unrolled Luby rounds over the same symmetrized edge set
    * (Graph.misSql — post-convergence rounds are empty on both
    * engines). */
  private lazy val misOracle: String =
    s"""WITH $symCoPurchaseCte,
       |${graft.operators.Graph.misSql(16)}""".stripMargin

  /** First-8-events pivot per user (exactly-8 contract) + the unrolled
    * integer-score Viterbi chain (Sessionize.viterbiSqlCtes — the SAME
    * score maps the Spark DP interpolates, so path and score are
    * engine-exact integers). */
  private lazy val viterbiOracle: String =
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
  private lazy val bhFdrOracleSql: String =
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

  private lazy val changepointOracleSql: String =
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
  private lazy val signTestOracleSql: String =
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
  private lazy val riskRatioOracleSql: String =
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
  private lazy val wilsonOracleSql: String =
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
  private lazy val hourlySpendCte: String =
    """hb AS (SELECT event_type,
      |    (epoch_ms(ts) - 1704067200000) // 3600000 AS h,
      |    CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2)""".stripMargin

  /** Shared by q_hhi (batch) and q_stream_hhi (complete-mode streaming
    * rollup + batch share² finish): identical concentration semantics,
    * one oracle text. */
  private lazy val hhiOracleSql: String =
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
  private lazy val ivfOracleSql: String =
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

  private lazy val pqEncodeCtes: String =
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
  private def pqTrainedCtes(m: Int, k: Int, iters: Int): String = {
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
  private def pqRerankCtes(cb: String, rerank: Int): String =
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
  private lazy val decomposeCtes: String = {
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
  private lazy val hourlyDollarsCte: String =
    """hd AS (SELECT event_type,
      |    (epoch_ms(ts) - 1704067200000) // 3600000 AS h,
      |    CAST(SUM(CAST(ROUND(value, 0) AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1, 2)""".stripMargin

  private lazy val ohlcOracleSql: String =
    """WITH e AS (SELECT event_type, epoch_ms(ts) AS ms, event_id,
      |    CAST(ROUND(value*100, 0) AS BIGINT) AS cents FROM events),
      |b AS (SELECT event_type, (ms // 21600000) * 21600000 AS bar_start_ms,
      |    (ms - 1700000000000) * 100000000 + event_id AS tkey, cents FROM e)
      |SELECT event_type, bar_start_ms, arg_min(cents, tkey) AS open,
      |  MAX(cents) AS high, MIN(cents) AS low, arg_max(cents, tkey) AS close,
      |  CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS volume
      |FROM b GROUP BY 1, 2""".stripMargin

  private lazy val pcaPowerOracleSql: String =
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
  private lazy val minhashVerifiedCtes: String =
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
  private val psiDriftOracle: String =
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

  private val unigramCte: String =
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
  private val heavyHittersSql: String =
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
  private val langPredCte: String =
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
  private val disclaimerCte: String =
    s"""p AS (SELECT doc_id, text ||
       |    CASE WHEN doc_id % 3 = 0 THEN ' $RepeatedDisclaimer' ELSE '' END ||
       |    CASE WHEN doc_id % 6 = 0 THEN ' $RepeatedDisclaimer' ELSE '' END
       |    AS text
       |  FROM documents)""".stripMargin

  /** 3-gram word shingles, distinct, joined with '_' (1-based list math). */
  /** Backward as-of (latest click at-or-before each purchase), shared by
    * the union+window query and the custom-plan merge query — identical
    * semantics, different physical strategy. */
  private val asofBackwardOracle: String =
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
  private val asofForwardOracle: String =
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
  private val funnelOracle: String =
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
  private val bfsOracle: String = {
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
  private val hitsOracle: String =
    s"""WITH e AS (
       |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
       |    CAST(l_suppkey AS BIGINT) + 10000000 AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |v AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
       |${graft.operators.Graph.hitsSql(4)}""".stripMargin

  private val labelPropOracle: String =
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
  private lazy val betweennessOracle: String = {
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
  private lazy val bpeTrainOracle: String = {
    val out = (1 to 5).map { i =>
      s"SELECT CAST($i AS BIGINT) AS step, l AS l_sym, r AS r_sym, " +
        s"l || r AS merged, freq FROM m$i"
    }.mkString("\nUNION ALL ")
    s"WITH $bpeCtes\n$out"
  }

  /** Token histogram after the 5 trained merges — the apply half of
    * the tokenizer story, over the same unrolled CTE chain. */
  private lazy val bpeApplyOracle: String =
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
  private lazy val bpeCtes: String = bpeCtesFor("TRUE", "")

  /** The sequential-BPE CTE chain over `documents` rows matching
    * `pred`, with every CTE name prefixed `px` — so the held-out
    * oracle can train on one corpus half under one namespace while
    * tokenizing the other. */
  private def bpeCtesFor(pred: String, px: String): String = {
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
  private lazy val bpeHeldOutOracle: String = {
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
  private lazy val bpeTrainBatchedOracle: String = {
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
  private lazy val triangleCountOracle: String =
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

  private lazy val localClusteringOracle: String =
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

  private lazy val katzOracle: String = {
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
  private lazy val maxCoverOracle: String = {
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

  private val pagerankOracle: String = {
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
  private lazy val pprOracle: String = {
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
  private def pprIterCtes(rounds: Int, alpha: Double): String =
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
  private lazy val textrankOracle: String = {
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
  private def corpusOverlapOracle(sampleMod: Int): String = {
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

  private val shingleCte: String =
    """toks AS (SELECT doc_id, string_split(text,' ') AS tl FROM documents),
      |sh AS (SELECT doc_id,
      |  list_distinct([tl[i]||'_'||tl[i+1]||'_'||tl[i+2] FOR i IN range(1, len(tl)-1)]) AS sh
      |FROM toks)""".stripMargin

  /** 32-bit SimHash over whitespace tokens `tl` (60-bit md5-hex token hash,
    * per-bit sign sums, packed) — mirrors TextFunctions.simhash32. */
  private val simhashSqlExpr: String =
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
  private def srpSigSqlExpr(planes: Int): String =
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
  private val qualityCte: String =
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
  private lazy val kCenterOracle: String = {
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
  private lazy val dtwOracle: String = {
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
  private val normCte: String =
    """n AS (SELECT vec_id, embedding,
      |  sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
      |FROM embeddings)""".stripMargin

  /** Cosine between `qa`.embedding and `ca`.embedding using the norms above —
    * mirrors Similarity.cosine's dot/(sqrt*sqrt) shape and fold order. */
  private def cosineSqlExprAs(qa: String, ca: String): String =
    s"""list_sum([CAST($qa.embedding[i] AS DOUBLE)*CAST($ca.embedding[i] AS DOUBLE)
       |  FOR i IN range(1, len($qa.embedding)+1)]) / ($qa.nrm * $ca.nrm)""".stripMargin

  private val cosineSqlExpr: String = cosineSqlExprAs("q", "c")

  /** FULL-rule sessionize (gap + size + duration cuts) as a RECURSIVE CTE:
    * the per-key state machine ([[graft.operators.SessionEngine.advance]])
    * advances one event per recursion step — iteration i joins the working
    * table (each key's state after event i) with each key's event i+1 and
    * applies the cut rules; the three cuts OR together because they share
    * the fresh-session outcome. Gotcha pinned here: the cut flag must live
    * in a DERIVED TABLE — as a lateral alias in the recursive SELECT,
    * an unqualified `cut` resolves to the PREVIOUS iteration's column of
    * the same name (r.cut), silently lagging every cut by one event. */
  private val fullSessionizeSql: String =
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
  private val gapSessionizeSql: String =
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
