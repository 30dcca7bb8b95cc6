package graft

import org.apache.spark.sql.Dataset

/** The ONE lineage-cut point for every operator that materializes an
  * intermediate (iterative kernels, frames consumed by several
  * downstream stages, mid-loop action inputs).
  *
  * Why a switch: `localCheckpoint` stores blocks in executor memory/disk
  * with NO replication — fast and exactly right on local[32], but on a
  * real cluster a single lost executor discards its blocks and FAILS the
  * query (lineage is truncated, so Spark cannot recompute them). At
  * 100 TB an executor loss must cost a recompute window, not the query,
  * so cluster deployments flip one conf and every operator routes
  * through reliable `checkpoint()` against a durable directory instead.
  *
  * Confs (session-scoped, read per call so tests can flip them):
  *  - `graft.checkpoint.mode`: `local` (default — eager
  *    localCheckpoint) or `reliable` (eager checkpoint to the
  *    checkpoint dir).
  *  - `graft.checkpoint.dir`: directory for reliable mode; applied via
  *    `SparkContext.setCheckpointDir` on first use if none is set yet.
  *    On a cluster this must be HDFS/S3, not local disk; the local-fs
  *    default under java.io.tmpdir exists so single-JVM runs work out
  *    of the box.
  *
  * Both modes are eager (the plan computes here) and both return a
  * Dataset whose plan is a scan of the materialized blocks — identical
  * results by construction; MaterializeSpec pins that on a fixture.
  *
  * RELIABLE-MODE DISK LIFECYCLE — reliable checkpoints are PERMANENT
  * files: Spark never deletes them unless
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` was set at
  * SparkContext CREATION (and even then cleanup waits on driver GC of
  * the RDD reference). Iterative operators (connectedComponents, BFS,
  * truss, Lloyd loops) call `.materialize` once or more per round, so
  * an unmanaged long-lived session accumulates unbounded data under
  * `graft.checkpoint.dir`. Two supported disciplines:
  *  1. set the cleaner conf when building the cluster SparkSession
  *     (best-effort, GC-driven), and/or
  *  2. wrap each query (or batch of queries) in [[reliableScope]],
  *     which routes its checkpoints to a fresh subdirectory and
  *     deletes it when the scope exits — deterministic, and the
  *     discipline Bench/ScaleSmoke use in reliable runs.
  */
object Materialize {

  /** Run `body` with reliable checkpoints routed to a fresh
    * subdirectory of the configured checkpoint dir, then DELETE that
    * subdirectory. The caller must fully consume every result inside
    * the scope (write/collect/count) — the returned Datasets' plans
    * scan the checkpoint files, which are gone once the scope exits.
    * No-op wrapper semantics in `local` mode (nothing is written to
    * the dir, and the delete of the unused subdir is harmless).
    * `SparkContext.setCheckpointDir` already creates a UUID subdir per
    * call, so scoping is one re-point + one recursive delete.
    *
    * On exit the session's checkpoint dir is RE-POINTED AWAY from the
    * deleted scope dir — back under the prior dir if one was set, else
    * to the configured base — so a later reliable-mode [[apply]]
    * outside any scope writes into the tracked base directory, never
    * into the untracked ghost of a deleted scope (the round-12 ADVICE
    * leak). NOT safe for concurrent queries on one SparkSession: the
    * checkpoint dir is SparkContext-global, so two live scopes would
    * re-point the shared dir and each scope's exit would delete the
    * other's in-flight checkpoint files — serialize scopes per
    * session (Bench/ScaleSmoke/Verify all do). */
  def reliableScope[A](spark: org.apache.spark.sql.SparkSession)(body: => A): A = {
    val sc = spark.sparkContext
    val prior = sc.getCheckpointDir
    val base = spark.conf.get("graft.checkpoint.dir",
      s"${System.getProperty("java.io.tmpdir")}/graft-checkpoints")
    sc.setCheckpointDir(base)
    val dir = sc.getCheckpointDir.get
    try body
    finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(sc.hadoopConfiguration).delete(p, true)
      // setCheckpointDir(prior) would nest a fresh UUID under the old
      // scope dir; re-pointing at the base (= the parent of every
      // prior dir this module ever set) keeps post-scope checkpoints
      // inside the one tracked tree either way.
      sc.setCheckpointDir(prior.map(d =>
        new org.apache.hadoop.fs.Path(d).getParent.toString)
        .getOrElse(base))
    }
  }
  def apply[T](ds: Dataset[T]): Dataset[T] = {
    val s = ds.sparkSession
    s.conf.get("graft.checkpoint.mode", "local") match {
      case "reliable" =>
        val sc = s.sparkContext
        if (sc.getCheckpointDir.isEmpty) {
          sc.setCheckpointDir(s.conf.get("graft.checkpoint.dir",
            s"${System.getProperty("java.io.tmpdir")}/graft-checkpoints"))
        }
        ds.checkpoint(eager = true)
      case "local" => ds.localCheckpoint(eager = true)
      case other => sys.error(
        s"graft.checkpoint.mode must be 'local' or 'reliable': $other")
    }
  }

  /** [[apply]] plus a STATS RESET — for fixpoint loops whose per-round
    * plan SELF-JOINS the previous round's frame (pointer jumping,
    * handshake targets): `localCheckpoint` truncates the lineage but
    * PRESERVES the logical plan's `sizeInBytes`, and a self-join
    * SQUARES it, so the BigInt statistic doubles its bit length every
    * iteration — by ~20 iterations the size-only stats visitor is
    * multiplying million-bit integers and PLANNING time dwarfs
    * execution (measured: bits exactly doubled per materialize+self-
    * join round; nested loops like Borůvka-over-components hung for
    * 20+ minutes in `BigInteger.multiplyToomCook3`). Rebuilding the
    * frame from its checkpointed RDD resets stats to the default —
    * costs one InternalRow↔Row conversion layer (fine for the
    * vertex-sized state frames these loops carry) and forgoes
    * auto-broadcast for the frame (fixpoint state is join-keyed
    * anyway). */
  def freshStats(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val m = apply(df)
    m.sparkSession.createDataFrame(m.rdd, m.schema)
  }

  /** `.materialize` postfix syntax so operator code reads like the
    * `.localCheckpoint(true)` chains it replaces. */
  implicit class MaterializeOps[T](private val ds: Dataset[T])
      extends AnyVal {
    def materialize: Dataset[T] = Materialize(ds)
  }

  /** `.materializeFresh` postfix for [[freshStats]]. */
  implicit class MaterializeFreshOps(
      private val df: org.apache.spark.sql.DataFrame) extends AnyVal {
    def materializeFresh: org.apache.spark.sql.DataFrame =
      Materialize.freshStats(df)
  }
}
