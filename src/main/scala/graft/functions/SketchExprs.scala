package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Native Catalyst probe for a BROADCAST Bloom filter (round 15,
  * optimization guide step 2 — eliminate non-codegen expressions in the
  * hot path).
  *
  * The library's Bloom semi-join reductions (q115's closing-edge filter)
  * previously probed through a Scala UDF: one boxed `Long → java.lang.
  * Long` conversion plus an interpreted function dispatch per CANDIDATE
  * row — and the candidate stream is the m^1.5-sized wedge set, the
  * single hottest row count in the plan. Spark's own runtime-filter
  * expression (`BloomFilterMightContain`) is codegen'd but takes the
  * serialized sketch as a LITERAL, which embeds the ~1.5 MB bitset in
  * the plan tree (a 3 MB explain string, re-serialized with every plan
  * copy). This expression keeps the sketch where the UDF kept it — a
  * torrent BROADCAST, shipped to each executor once — and generates a
  * direct `mightContainLong` call inside whole-stage codegen, resolving
  * the broadcast value once per generated class instance, not per row.
  * False-positive semantics are identical to the UDF it replaces (same
  * sketch object, same probe method); correctness never depends on it —
  * every caller confirms candidates with an exact join downstream. */
object SketchExprs {

  case class BloomMightContainBc(child: Expression,
      bloom: Broadcast[org.apache.spark.util.sketch.BloomFilter])
      extends UnaryExpression {

    override def dataType: DataType = BooleanType

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain_bc requires bigint, got ${child.dataType}")

    override def nullSafeEval(v: Any): Any =
      bloom.value.mightContainLong(v.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val bcCls = classOf[Broadcast[_]].getName
      val bfCls = classOf[org.apache.spark.util.sketch.BloomFilter].getName
      val bcRef = ctx.addReferenceObj("graftBloomBc", bloom, bcCls)
      val bf = ctx.addMutableState(bfCls, "graftBloom")
      nullSafeCodeGen(ctx, ev, v => s"""
         |if ($bf == null) $bf = ($bfCls) $bcRef.value();
         |${ev.value} = $bf.mightContainLong($v);
         |""".stripMargin)
    }

    override protected def withNewChildInternal(
        newChild: Expression): BloomMightContainBc = copy(child = newChild)
  }

  /** Column-level entry: `true` when the broadcast sketch might contain
    * the (bigint) key — a codegen'd `mightContainLong`. */
  def bloom_might_contain_bc(k: Column,
      bloom: Broadcast[org.apache.spark.util.sketch.BloomFilter]): Column =
    GraftColumnBridge.column(
      BloomMightContainBc(GraftColumnBridge.expression(k), bloom))
}
