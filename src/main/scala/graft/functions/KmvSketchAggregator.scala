package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values sketch as a typed `Aggregator` — the MERGEABLE form
  * of `Profiling.kmvDistinct`: the buffer is the k smallest DISTINCT
  * hashes seen so far (sorted ascending), so partial map-side sketches
  * union losslessly in `merge`, which is what lets the same aggregate run
  * batch, streaming-complete-mode, and sketch-algebra use cases (union of
  * two corpora = merge of their sketches) with state capped at k longs
  * per group regardless of stream length.
  *
  * Insertion keeps the buffer sorted via binary search (O(log k) probe +
  * O(k) copy, k is small by construction); a hash ≥ the current kth
  * minimum is rejected without copying, so the steady-state per-row cost
  * after warmup is just the probe. */
final class KmvSketchAggregator(k: Int)
    extends Aggregator[Long, Seq[Long], KmvSketch] {
  require(k >= 2, s"k must be >= 2: $k")

  override def zero: Seq[Long] = Vector.empty

  private def insert(buf: Seq[Long], h: Long): Seq[Long] = {
    if (buf.length == k && h >= buf.last) return buf
    val i = {
      // first index with buf(i) >= h
      var lo = 0; var hi = buf.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (buf(mid) < h) lo = mid + 1 else hi = mid
      }
      lo
    }
    if (i < buf.length && buf(i) == h) buf // distinct hashes only
    else {
      val grown = (buf.take(i) :+ h) ++ buf.drop(i)
      if (grown.length > k) grown.take(k) else grown
    }
  }

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] = insert(buf, h)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[Long]): KmvSketch =
    KmvSketch(buf.length.toLong, if (buf.isEmpty) 0L else buf.last)

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  override def outputEncoder: Encoder[KmvSketch] = Encoders.product[KmvSketch]
}

final case class KmvSketch(n_k: Long, h_k: Long)
