package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the dedup-key step of a web-crawl pipeline.
  * Two crawls of the same page differ in scheme case, `www.` prefix, port,
  * tracking params, param order, fragments, and trailing slashes; URL-level
  * dedup (and host-level aggregation) needs one canonical form first.
  *
  * Everything is a narrow per-row map (`parse_url` + string/array
  * functions): no shuffle, no UDF, fully codegen-eligible except the small
  * param-filter HOF, and exactly replayable by the SQL oracle via
  * regexp + list functions. Reference analogy: the reference normalizes its
  * log-line URL field before grouping (`processes/Parse.scala`); this is
  * the same idea promoted to a reusable operator.
  */
object Urls {

  /** Query-param names that never identify content (analytics trackers). */
  private val trackerPattern = "^(utm_[a-z]+|gclid|fbclid|ref)="

  /** Canonical form of one URL column:
    *  - scheme is dropped, output is scheme-relative (`host/path?query`)
    *  - host lowercased, leading `www.` stripped, port stripped
    *    (`parse_url(_, "HOST")` already excludes the port)
    *  - path: trailing `/` stripped (root becomes the empty path)
    *  - query: tracking params removed, survivors sorted for order
    *    independence; `?` omitted when nothing survives
    *  - fragment dropped (`parse_url` never returns it in HOST/PATH/QUERY)
    */
  def canonical(url: Column): Column = {
    val host = regexp_replace(lower(parse_url(url, lit("HOST"))), "^www\\.", "")
    val path = regexp_replace(parse_url(url, lit("PATH")), "/$", "")
    val kept = array_sort(
      filter(split(parse_url(url, lit("QUERY")), "&"), p => !p.rlike(trackerPattern)))
    // single evaluation of the (regex-heavy) param chain: prepend '?', then
    // erase a lone '?' — the no-surviving-params case — instead of
    // branching on the chain's emptiness (a when() would re-evaluate it)
    val canonQ = regexp_replace(
      concat(lit("?"), coalesce(array_join(kept, "&"), lit(""))), "^\\?$", "")
    concat(host, path, canonQ)
  }

  /** Tag rows with `url_norm` = [[canonical]] of `urlCol`. */
  def normalize(df: DataFrame, urlCol: String): DataFrame =
    df.withColumn("url_norm", canonical(col(urlCol)))

  /** Canonicalized-URL dedup: first (lowest `idCol`) row per canonical URL.
    * Shuffles on the canonical form — i.e. ∝ distinct URLs, the exact-dedup
    * discipline ([[Dedup.exact]]). */
  def dedupByUrl(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val norm = normalize(df, urlCol)
    val keep = norm.groupBy(col("url_norm")).agg(min(col(idCol)).as(idCol))
    norm.join(keep, Seq("url_norm", idCol))
  }
}
