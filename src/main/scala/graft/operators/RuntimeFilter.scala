package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.BinaryType

/** Explicit bloom-filter runtime join filtering.
  *
  * Spark's own `InjectRuntimeFilter` rule does this opportunistically (and
  * only between shuffle stages of the SAME query); this operator makes the
  * pattern a first-class, caller-controlled step so a pipeline can build the
  * filter once from a selective dim side and prefilter a 100 TB fact scan
  * BEFORE the shuffle — the dominant cost at scale is shuffling fact rows
  * that the join would discard anyway.
  *
  * Mechanics: the small side's join keys are hashed (xxhash64, seed 42) into
  * a `spark.util.sketch.BloomFilter` via the distributed
  * `stat.bloomFilter` tree-aggregate — driver memory holds ONE bloom of
  * O(expectedItems · log(1/fpp)) bits (~1.2 MB at 10⁶ keys / 1% fpp),
  * independent of fact-side size. The filter is then embedded as a binary
  * literal inside Spark's own codegen'd [[BloomFilterMightContain]]
  * predicate — no Scala UDF, the fact scan stays inside WholeStageCodegen
  * and the predicate travels with the plan (no broadcast round-trip).
  *
  * EXACTNESS: the bloom pass is `might contain` (false positives survive);
  * the left-semi join behind it removes them, so the operator's result is
  * bit-identical to the plain semi join — which is exactly what the DuckDB
  * oracle checks. The bloom only changes HOW MUCH data reaches the shuffle.
  */
object RuntimeFilter {

  /** `big ⋉ small` on `bigKey = smallKey`, with a bloom prefilter on the
    * big side. `expectedItems` sizes the bloom (overshoot is wasted bits,
    * undershoot inflates fpp — both safe; correctness never depends on it). */
  def bloomSemiJoin(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val bf = small
      .select(xxhash64(col(smallKey)).as("__h"))
      .stat.bloomFilter("__h", expectedItems, fpp)
    val bytes = {
      val bos = new ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val might = bridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      XxHash64(Seq(bridge.expression(col(bigKey))), 42L)))
    big
      .filter(col(bigKey).isNotNull && might)
      .join(small.select(col(smallKey).as(bigKey)), Seq(bigKey), "left_semi")
  }
}
