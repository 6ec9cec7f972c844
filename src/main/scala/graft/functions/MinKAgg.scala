package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded k-minimum-values (KMV) set sketch as a typed [[Aggregator]]:
  * keeps the k smallest DISTINCT hash values seen per group — the classic
  * Bar-Yossef/Beyer KMV distinct-count sketch, and the one mergeable
  * distinct sketch that also supports INTERSECTION estimates (via Jaccard
  * over the merged sketch), which HLL structurally cannot.
  *
  * Scale contract (same as [[TopKAgg]]): the buffer is bounded at k, so
  * each task emits at most k values per group into the exchange — shuffle
  * volume k·groups, never n — and `merge` is associative/commutative, so
  * partial aggregation applies. Duplicate hashes collapse on insert AND on
  * merge (a KMV sketch is over a SET; feeding the raw stream without a
  * pre-`distinct()` is the point — it saves the extra dedup shuffle).
  * The buffer is a sorted List (k ≤ ~100); swap in a bounded heap beyond.
  */
object MinKAgg {

  final case class MinK(k: Int)
      extends Aggregator[Long, List[Long], Seq[Long]] {

    override def zero: List[Long] = Nil

    override def reduce(buf: List[Long], a: Long): List[Long] = insert(buf, a)

    override def merge(b1: List[Long], b2: List[Long]): List[Long] =
      b2.foldLeft(b1)(insert)

    /** Sorted-unique bounded insert: no-op when `a` is already present or
      * larger than a full buffer's max. */
    private def insert(buf: List[Long], a: Long): List[Long] = {
      val (before, after) = buf.span(_ < a)
      if (after.headOption.contains(a)) buf
      else if (before.length >= k) buf
      else (before ::: a :: after).take(k)
    }

    override def finish(r: List[Long]): Seq[Long] = r

    override def bufferEncoder: Encoder[List[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
