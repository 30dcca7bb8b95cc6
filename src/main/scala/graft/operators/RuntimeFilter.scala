package graft.operators

import java.io.ByteArrayOutputStream

import graft.functions.expressions.BloomMightContain
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

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
  * independent of fact-side size. The filter then rides in the codegen'd
  * [[BloomMightContain]] predicate — no Scala UDF, the fact scan stays
  * inside WholeStageCodegen. The bytes are an expression FIELD, not a
  * binary Literal child: Spark's own `BloomFilterMightContain` + Literal
  * rendered the full filter into every AQE `explainString` and OOM'd the
  * driver at MB-scale blooms (see BloomMightContain scaladoc).
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
    // xxhash64 hashes int and long inputs DIFFERENTLY, so a type mismatch
    // between the key columns (e.g. parquet schema drift int vs bigint)
    // would produce bloom FALSE NEGATIVES — rows dropped before the semi
    // join can recover them, a silent wrong answer. Refuse loudly; the
    // caller casts one side explicitly.
    val bigType = big.schema(bigKey).dataType
    val smallType = small.schema(smallKey).dataType
    require(bigType == smallType,
      s"bloomSemiJoin key types must match exactly (xxhash64 is not " +
        s"cast-stable): $bigKey is ${bigType.catalogString}, " +
        s"$smallKey is ${smallType.catalogString} — cast one side first")
    val bf = small
      .select(xxhash64(col(smallKey)).as("__h"))
      .stat.bloomFilter("__h", expectedItems, fpp)
    val bytes = {
      val bos = new ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val might = bridge.column(BloomMightContain(
      bridge.expression(xxhash64(col(bigKey))), bytes))
    big
      .filter(col(bigKey).isNotNull && might)
      .join(small.select(col(smallKey).as(bigKey)), Seq(bigKey), "left_semi")
  }
}
