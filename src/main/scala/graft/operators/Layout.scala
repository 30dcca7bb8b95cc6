package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

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
}
