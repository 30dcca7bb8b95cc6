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
  */
object Materialize {
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

  /** `.materialize` postfix syntax so operator code reads like the
    * `.localCheckpoint(true)` chains it replaces. */
  implicit class MaterializeOps[T](private val ds: Dataset[T])
      extends AnyVal {
    def materialize: Dataset[T] = Materialize(ds)
  }
}
