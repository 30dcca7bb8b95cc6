package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Materialize.MaterializeOps

/** Physical data layout for scan pruning — the write-side half of the scale
  * story. A 100 TB table is only as fast as what a query can SKIP:
  *
  *  - hive-partitioning by a low-cardinality column prunes whole directories
  *    at planning time (`PartitionFilters` on the scan);
  *  - sorting by a second column within each file clusters values so parquet
  *    row-group min/max statistics skip pages for pushed-down range
  *    predicates (`PushedFilters` on the scan).
  *
  * `writeClustered` produces exactly that layout with one shuffle: the
  * repartition aligns tasks to partition values (one writer task per value —
  * no small-file explosion where every task writes every partition), and the
  * in-task sort feeds parquet monotone chunks. LayoutSpec pins both pruning
  * behaviors on read-back. */
object Layout {

  /** Write `df` hive-partitioned by `partCol`, sorted by `sortCol` within
    * each file. For skewed partition values add a salt column to `partCol`'s
    * repartition key (same trade as Skew.saltedJoin). */
  def writeClustered(df: DataFrame, path: String, partCol: String, sortCol: String): Unit =
    df.repartition(col(partCol))
      .sortWithinPartitions(col(partCol), col(sortCol))
      .write
      .partitionBy(partCol)
      .mode("overwrite")
      .parquet(path)

  /** Bit-interleaved Z-value of two long columns: bit i of `a` lands at
    * position 2i, bit i of `b` at 2i+1. Pure integer expressions —
    * codegen'd, no UDF. Inputs are expected in [0, 2^bits); out-of-range
    * values are CLAMPED to that interval first (saturating, not silently
    * bit-masked: a raw timestamp fed in unscaled saturates to the top cell
    * instead of interleaving its low bits into noise — degraded clustering,
    * never wrong data). [[writeZOrdered]] handles the scaling. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31]: $bits")
    val top = lit((1L << bits) - 1)
    def clamp(c: Column): Column = least(greatest(c, lit(0L)), top)
    val (ca, cb) = (clamp(a), clamp(b))
    (0 until bits).map { i =>
      shiftright(ca, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(cb, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Write `df` Z-ORDER-clustered on two numeric columns: each output file
    * covers a small rectangle in (colA, colB) space, so parquet min/max
    * stats prune files for range predicates on EITHER column — the
    * multi-dimensional complement of [[writeClustered]]'s linear sort
    * (which clusters one column and leaves the other scattered). Columns
    * are min/max-scaled into `bits`-bit grid cells, interleaved into a
    * Z-value, then range-partitioned into `files` files, sorted within
    * each.
    *
    * Cost note: unless `ranges` is supplied, the min/max aggregation is a
    * FULL extra scan of `df` before the write re-executes the upstream plan
    * — for an expensive pipeline either persist `df` first or pass the
    * known `ranges` ((loA, hiA), (loB, hiB)) and skip the scan entirely. */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      colA: String,
      colB: String,
      files: Int,
      bits: Int = 16,
      ranges: Option[((Double, Double), (Double, Double))] = None): Unit = {
    val ((loA, hiA), (loB, hiB)) = ranges.getOrElse {
      val r = df.agg(
        min(col(colA)).cast("double"), max(col(colA)).cast("double"),
        min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
      if (r.isNullAt(0) || r.isNullAt(2)) ((0d, 0d), (0d, 0d)) // empty/all-null input
      else ((r.getDouble(0), r.getDouble(1)), (r.getDouble(2), r.getDouble(3)))
    }
    val top = (1L << bits) - 1
    def scale(c: String, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else ((col(c).cast("double") - lit(lo)) / lit(hi - lo) * top).cast("long")
    val z = zValue(scale(colA, loA, hiA), scale(colB, loB, hiB), bits)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction — the maintenance job every long-lived
    * streaming/incremental sink needs: micro-batch sinks (file sink,
    * MergeSink, the LSH index) accrete files far below the HDFS/parquet
    * sweet spot, and a 100 TB table of 1 MB files dies on open() overhead
    * and footer reads long before scan bandwidth matters. Rewrites `dir`
    * into ceil(bytes/targetBytes) files via a round-robin repartition
    * (size-based, not key-based — compaction must not assume a key), then
    * atomically swaps directories (write to sibling tmp, rename over).
    * Returns (filesBefore, filesAfter). Content equality and file-count
    * collapse are pinned by LayoutSpec.
    *
    * CONCURRENCY CONTRACT: the caller must quiesce writers first (pause the
    * streaming sink / run between increments) — a file appended after the
    * read snapshot would be destroyed by the swap. This is the same
    * stop-the-writer requirement every rewrite-based compactor without a
    * transaction log has; pair it with a table format's commit protocol
    * when writers can't be paused.
    *
    * LOCAL-FILESYSTEM SCOPE: the swap uses java.io.File.renameTo, which
    * only works on a posix-local path — on hdfs:// or s3a:// it returns
    * false and the compactor aborts before touching live data. The swap is
    * also not crash-atomic: a crash between the two renames leaves the
    * data parked at `<dir>.__compact_old` (and the rewrite at
    * `<dir>.__compact_tmp`) — recovery is renaming `.__compact_old` back.
    * An object-store deployment would swap via the table format's commit
    * protocol instead. */
  /** Distributed GLOBAL row number over an arbitrary total order — the
    * training-data shuffle-order assigner: position every row by a
    * deterministic pseudo-random key (e.g. md5 of the id) without ever
    * sorting the table through one partition. `Window.orderBy` with no
    * partition key is the classic scale trap (WindowExec moves ALL rows to
    * a single task); this runs the token-budget operators' distributed
    * prefix sum instead: range-partition on the order key, local
    * row_number per partition, per-partition counts broadcast back as
    * offsets — two tiny windows over n_partitions rows and ONE range
    * exchange of the data.
    *
    * `orderCols` must be a total order (append a unique id as the last
    * column) or positions are nondeterministic within ties. Positions are
    * 1-based, matching SQL ROW_NUMBER. */
  def globalRowNumber(
      df: DataFrame,
      orderCols: Seq[String],
      posCol: String = "pos"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val oc = orderCols.map(col)
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(p, oc: _*)
      .sortWithinPartitions(oc: _*)
      .withColumn("__pid", spark_partition_id())
      // materialize ONCE before the row-number/offsets fan-out — without
      // this each branch samples its own range bounds and __pid can
      // disagree between branches (silently wrong positions at scale).
      // Full rationale: Eval.rangedCumsum.
      .materialize
    val wLocal = Window.partitionBy(col("__pid")).orderBy(oc: _*)
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__pn"))
      .withColumn("__off", coalesce(sum(col("__pn")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__off"))
    ranged
      .withColumn("__rn", row_number().over(wLocal))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(posCol, (col("__off") + col("__rn")).cast("long"))
      .drop("__pid", "__rn", "__off")
  }

  /** Per-bucket clustering statistics of a Z-order layout — the read-side
    * proof that [[writeZOrdered]]'s interleave buys data skipping. Inputs
    * are integer grid cells in [0, 2^bits) (the caller scales raw keys —
    * integer `DIV`, never float division, so the oracle replays bit-exact).
    * Rows are bucketed by the TOP `bucketBits` bits of the Z-value (= the
    * file boundary a range-partitioned write would draw), and each bucket
    * reports its row count plus the min/max rectangle it covers in BOTH
    * dimensions: `rect_cells`, the rectangle's area, is the quantity parquet
    * min/max pruning acts on — small rectangles mean a predicate on EITHER
    * column skips most buckets. One narrow codegen'd map + one agg; no
    * shuffle beyond the 2^bucketBits-group aggregation. */
  def zOrderStats(
      df: DataFrame,
      cellA: Column,
      cellB: Column,
      bits: Int = 8,
      bucketBits: Int = 6): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 2 * bits,
      s"bucketBits must be in [1, ${2 * bits}]: $bucketBits")
    val z = zValue(cellA, cellB, bits)
    df.select(cellA.as("__ca"), cellB.as("__cb"),
        shiftright(z, 2 * bits - bucketBits).as("zbucket"))
      .groupBy(col("zbucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("__ca")).as("min_a"), max(col("__ca")).as("max_a"),
        min(col("__cb")).as("min_b"), max(col("__cb")).as("max_b"))
      .withColumn("rect_cells",
        (col("max_a") - col("min_a") + 1) * (col("max_b") - col("min_b") + 1))
  }

  /** Head-to-head data-skipping comparison — the number that justifies a
    * Z-order rewrite: bucket the same cells two ways (Z-order top-bits =
    * a z-ordered write's file boundaries; `cb DIV k` = a linear
    * sort-on-B write's boundaries) and count how many buckets a range
    * predicate on dimension A can prune from each layout's min/max stats,
    * plus the rows a scan must still read. The linear-on-B layout
    * clusters B and scatters A, so its A-ranges span everything and
    * nothing prunes; the Z layout prunes most buckets for the same
    * predicate. Two aggregates over the cell table; output is 2 rows. */
  def skippingCompare(
      cells: DataFrame,
      cellA: Column,
      cellB: Column,
      predLo: Long,
      predHi: Long,
      bits: Int = 8,
      bucketBits: Int = 6): DataFrame = {
    def summarize(stats: DataFrame, layout: String) = stats
      .withColumn("__skip", col("max_a") < predLo || col("min_a") > predHi)
      .agg(count(lit(1)).cast("long").as("n_buckets"),
        sum(when(col("__skip"), 1L).otherwise(0L)).cast("long").as("n_skipped"),
        sum(when(!col("__skip"), col("n_rows")).otherwise(0L)).cast("long")
          .as("rows_scanned"))
      .withColumn("layout", lit(layout))
      .select(col("layout"), col("n_buckets"), col("n_skipped"),
        col("rows_scanned"))
    require(bucketBits <= bits,
      s"linear layout needs bucketBits <= bits: $bucketBits/$bits")
    val zStats = zOrderStats(cells, cellA, cellB, bits, bucketBits)
      .select(col("min_a"), col("max_a"), col("n_rows"))
    // cb domain [0, 2^bits) → 2^bucketBits linear buckets
    val linStats = cells
      .select(cellA.as("__ca"), cellB.as("__cb"))
      .groupBy(expr(s"__cb DIV ${1L << (bits - bucketBits)}L").as("bucket"))
      .agg(min(col("__ca")).as("min_a"), max(col("__ca")).as("max_a"),
        count(lit(1)).cast("long").as("n_rows"))
    summarize(zStats, "zorder").unionByName(summarize(linStats, "linear_b"))
  }

  /** DuckDB-SQL rendering of [[zValue]]'s bit interleave over expressions
    * `a`/`b` (already-clamped BIGINT cells) — generated from the same
    * (bits) constants so the oracle replays the exact arithmetic. */
  def zValueSql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a) >> $i) & 1) * ${1L << (2 * i)} + ((($b) >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")

  /** Logical compaction plan — which small files coalesce into which output
    * bin. [[compactSmallFiles]] is the physical rewrite for ONE local
    * directory; a 100 TB lakehouse first PLANS compaction across the whole
    * catalog, and that plan is itself a dataframe job over the file
    * inventory: per table-partition (`partCol`), files in `orderCol` order
    * are assigned bin = cum_bytes_before DIV targetBytes — offset binning,
    * so every bin's input is within one file of `targetBytes` and the
    * assignment is a pure function of the inventory (idempotent re-planning
    * across scheduler retries). The window is per-partition: file
    * inventories are metadata-scale (files per table-partition, not rows),
    * so a bounded per-group window is the right tool; an inventory with
    * millions of files in ONE partition would swap this for
    * [[globalRowNumber]]'s ranged prefix sum. */
  def compactionPlan(
      files: DataFrame,
      partCol: String,
      orderCol: String,
      bytesCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(partCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("cum_before", coalesce(sum(col(bytesCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"cum_before DIV ${targetBytes}L"))
  }

  /** Rendezvous (highest-random-weight) shard assignment: every id goes
    * to the shard with the maximum md5-derived weight — the consistent
    * sharding rule where REMOVING a shard only relocates that shard's
    * ids (no global reshuffle, unlike `id mod n`). Pure narrow map: the
    * per-shard weights evaluate as one codegen'd array expression and
    * `array_max` picks the (weight, shard) lexicographic max — no UDF,
    * no join, exactly replayable in SQL. */
  def rendezvousAssign(
      df: DataFrame, idCol: String, shards: Int): DataFrame = {
    require(shards >= 1, s"shards must be >= 1: $shards")
    df.withColumn("shard", expr(
      s"""array_max(transform(sequence(0, ${shards - 1}),
         |  s -> struct(
         |    CAST(conv(substring(md5(concat('rv', s, ':',
         |      CAST($idCol AS STRING))), 1, 15), 16, 10) AS BIGINT) AS h,
         |    CAST(s AS BIGINT) AS shard))).shard""".stripMargin))
  }

  def compactSmallFiles(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val d = new java.io.File(dir.stripSuffix("/"))
    def parquetFiles = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val before = parquetFiles
    val nBefore = before.length
    if (nBefore == 0) return (0, 0)
    val totalBytes = before.map(_.length()).sum
    val nAfter = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val base = d.getPath
    val tmp = new java.io.File(base + ".__compact_tmp")
    spark.read.parquet(base).repartition(nAfter)
      .write.mode("overwrite").parquet(tmp.getPath)
    // atomic-enough swap: move old aside, promote tmp, drop old
    val old = new java.io.File(base + ".__compact_old")
    graft.streaming.MergeSink.deleteRecursively(old)
    if (!d.renameTo(old)) {
      graft.streaming.MergeSink.deleteRecursively(tmp)
      sys.error(s"compact: cannot move $base aside (non-local filesystem?); live data untouched")
    }
    if (!tmp.renameTo(d)) {
      val restored = old.renameTo(d)
      graft.streaming.MergeSink.deleteRecursively(tmp)
      sys.error(
        if (restored) s"compact: cannot promote $tmp; original restored at $base"
        else s"compact: cannot promote $tmp AND restore failed — data parked at ${old.getPath}; rename it back to $base")
    }
    graft.streaming.MergeSink.deleteRecursively(old)
    (nBefore, parquetFiles.length)
  }
}
