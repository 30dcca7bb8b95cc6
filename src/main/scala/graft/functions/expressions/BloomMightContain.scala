package graft.functions.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.BloomFilter

/** Native bloom-membership predicate over a pre-built filter.
  *
  * Why not Spark's own `BloomFilterMightContain` with the serialized bloom
  * as a binary `Literal`: a literal lives in the expression TREE, so every
  * plan stringification (AQE logs an `explainString` on EVERY plan update)
  * renders the full filter — a 1.2 MB bloom became a multi-GB explain
  * string and OOM'd an 8 GB driver before the first task ran. Here the
  * bytes are a constructor FIELD, not a child expression: plan strings show
  * only `bloom_might_contain(child)`, while serialization still ships the
  * bytes to executors (the deserialized filter is a transient lazy, rebuilt
  * once per JVM).
  *
  * Semantics: child must be a LongType hash (callers pass `xxhash64(key)`);
  * null child → null (standard null-intolerant predicate). False positives
  * are expected — callers MUST re-verify exactly (see
  * `operators/RuntimeFilter`).
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint hash argument, got ${child.dataType.catalogString}")

  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $bf.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
