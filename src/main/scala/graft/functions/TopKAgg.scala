package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact top-k by score as a typed [[Aggregator]] — the scale-correct
  * alternative to `row_number().over(window).filter(rk <= k)` for "best k
  * per group":
  *
  *  - a window rank SORTS every candidate row inside each partition before
  *    discarding all but k — O(n log n) per group and no partial
  *    aggregation;
  *  - this aggregator keeps a bounded k-buffer per group, shrinks data
  *    MAP-SIDE (each task emits at most k rows per group into the
  *    exchange), and merges buffers associatively — O(n log k), shuffle
  *    volume k·groups instead of n.
  *
  * Ties break toward the smaller id (same contract as the window-based ANN
  * queries). The buffer is a plain sorted List (k is small); for k beyond
  * ~100 swap in a bounded heap.
  */
object TopKAgg {

  type Scored = (Double, Long) // (score, id)

  final case class TopK(k: Int)
      extends Aggregator[Scored, List[Scored], Seq[Scored]] {

    private val ord: Ordering[Scored] =
      Ordering.by[Scored, (Double, Long)] { case (s, id) => (-s, id) }

    override def zero: List[Scored] = Nil

    override def reduce(buf: List[Scored], a: Scored): List[Scored] =
      trim(insert(buf, a))

    override def merge(b1: List[Scored], b2: List[Scored]): List[Scored] =
      trim((b1 ++ b2).sorted(ord))

    private def insert(buf: List[Scored], a: Scored): List[Scored] = {
      val (before, after) = buf.span(x => ord.lt(x, a))
      before ::: a :: after
    }

    private def trim(buf: List[Scored]): List[Scored] = buf.take(k)

    override def finish(r: List[Scored]): Seq[Scored] = r

    // Catalyst-native encoders: the buffer ships through the exchange as
    // array<struct<double,bigint>> (columnar, no kryo blobs) and the output
    // is directly explodable in DataFrame space.
    override def bufferEncoder: Encoder[List[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }
}
