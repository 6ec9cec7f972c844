package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SimHash signature as ONE typed aggregate: input = 64-bit token hash,
  * buffer = the 64 per-bit vote counters packed in a single `Array[Long]`,
  * output = the 64-bit signature (bit b set iff the bit-b votes sum
  * positive).
  *
  * This replaces the column-formulation — 64 independent `sum(when(...))`
  * aggregate expressions — which was correct and codegen'd but carried 64
  * aggregation buffers per group and a 64-expression-wide codegen unit;
  * plan/compile overhead made it the slowest query in the round-1 bench.
  * Here the aggregate carries one buffer slot, the per-row update is a tight
  * 64-iteration primitive loop, and partial aggregation still applies
  * map-side (vote counters are associative), so the exchange ships one
  * 64-long array per (partition, doc) — the same scale shape, ~64× fewer
  * aggregate states.
  *
  * Vote semantics (unchanged): each token occurrence votes +1 on bit b if
  * its hash has bit b set, else −1; ties (vote sum 0) leave the bit clear.
  */
object SimHashAgg extends Aggregator[Long, Array[Long], Long] {

  override def zero: Array[Long] = new Array[Long](64)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < 64) {
      // +1 when bit i of h is set, −1 otherwise
      buf(i) += (((h >>> i) & 1L) << 1) - 1L
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Long = {
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (buf(i) > 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  // Catalyst-native encoders: the buffer crosses the exchange as a columnar
  // array<bigint>, not a serialized blob.
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
