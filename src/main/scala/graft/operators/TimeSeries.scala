package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series shaping: gap filling over integer bucket spines. */
object TimeSeries {

  /** Fill missing buckets per key with a constant: builds each key's spine
    * `sequence(min_bucket, max_bucket)` and left-joins the observed values
    * back. Input is an ALREADY-aggregated (key, bucket, value) table so the
    * operator composes with any upstream aggregation.
    *
    * Scale shape: one key-hashed aggregate for the per-key extents, one
    * bounded `explode(sequence(...))` (spine length = per-key bucket span,
    * never data-proportional beyond it), one key+bucket-hashed join back.
    * The spine generation is distributed — no driver-side calendar, no
    * cross join against a global dimension table. Keys whose span is
    * pathological (one key covering the whole epoch) fan out to span-many
    * rows — cap upstream if bucket ranges are adversarial. */
  def fillBucketGaps(
      perBucket: DataFrame,
      keyCol: String,
      bucketCol: String,
      valueCol: String,
      fill: Long = 0L): DataFrame = {
    val spine = perBucket
      .groupBy(col(keyCol))
      .agg(min(col(bucketCol)).as("__b0"), max(col(bucketCol)).as("__b1"))
      .select(col(keyCol), explode(expr("sequence(__b0, __b1)")).as(bucketCol))
    spine
      .join(perBucket, Seq(keyCol, bucketCol), "left")
      .select(col(keyCol), col(bucketCol),
        coalesce(col(valueCol), lit(fill)).as(valueCol))
  }
}
