package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel behind [[JaroWinklerSim]] — standard Jaro similarity
  * (match window ⌊max(|a|,|b|)/2⌋−1, transpositions = half the
  * out-of-order matches) with the Winkler prefix boost applied only when
  * jaro > 0.7 (prefix capped at 4, scaling 0.1) — the ANSI-engine
  * convention (DuckDB's jaro_winkler_similarity has the same threshold,
  * verified empirically: jw('aX','aYZWVUTSRQ') = jaro = 0.5333, unboosted).
  * Comparison unit is the UTF-16 CODE UNIT (Java chars): identical to
  * code-point comparison for all BMP text; strings with surrogate pairs
  * compare per half, which can differ from a code-point engine — the
  * oracle corpus is ASCII, where every unit choice agrees.
  * Scala emits static forwarders for object methods, so Janino-generated
  * code calls this directly. */
object JaroWinklerKernel {

  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    if (s.isEmpty && t.isEmpty) return 1.0
    if (s.isEmpty || t.isEmpty) return 0.0
    val ls = s.length
    val lt = t.length
    val window = math.max(0, math.max(ls, lt) / 2 - 1)
    val sMatch = new Array[Boolean](ls)
    val tMatch = new Array[Boolean](lt)
    var m = 0
    var i = 0
    while (i < ls) {
      val lo = math.max(0, i - window)
      val hi = math.min(lt - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true; tMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk the matched chars of both strings in order
    var trans = 0
    var k = 0
    i = 0
    while (i < ls) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / ls + md / lt + (md - trans / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxP = math.min(4, math.min(ls, lt))
    while (prefix < maxP && s.charAt(prefix) == t.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

/** Native Catalyst expression: Jaro-Winkler similarity in [0,1] over two
  * strings — the fuzzy-match scorer Spark's builtin set lacks (it ships
  * levenshtein only). A real Expression rather than a UDF so it stays
  * inside WholeStageCodegen (one static call per row, no boxing/closure)
  * and canonicalizes equal across plan subtrees. Null-intolerant: any
  * null input → null. */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string arguments, got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.JaroWinklerKernel.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSim {
  /** Column-level API. */
  def jaroWinkler(a: Column, b: Column): Column =
    bridge.column(JaroWinklerSim(bridge.expression(a), bridge.expression(b)))
}
