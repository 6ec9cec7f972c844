package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for space-filling-curve indexing.
  *
  * The unrolled-projection Hilbert builder ([[graft.operators.Layout]]'s
  * original form, kept for the cross-check spec) stacks ~6 projections per
  * level × 16 levels; the per-row work is trivial but Catalyst pays
  * analysis/optimization/codegen over a ~100-Project plan on every
  * invocation — measured ~2 s of per-call overhead at sf0.1. This
  * expression is the same top-down state machine as ONE codegen'd loop:
  * plan depth 1, whole-stage codegen keeps the scan fused, and the
  * semantics (d-increment `(3rx)⊕ry` folded to arithmetic, reflect-then-
  * swap when ry=0) are bit-identical to the unrolled chain — which is what
  * the DuckDB oracle (q104) and the exhaustive-grid spec pin. */
object SpatialExprs {

  /** Hilbert distance of the point (x, y) on the 2^bits × 2^bits grid.
    * Inputs must be LongType in [0, 2^bits); behavior matches the unrolled
    * chain for ANY long inputs (two's-complement masking). */
  case class HilbertIndex(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression {
    // bits=0 would shift by -1 (s = Long.MinValue, silent all-zero output);
    // bits>31 overflows s*s — fail construction, not rows
    require(bits >= 1 && bits <= 31,
      s"hilbert bits must be in [1, 31], got $bits")
    override def dataType: DataType = LongType

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == LongType && right.dataType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"hilbert_index requires (bigint, bigint), got " +
          s"(${left.dataType}, ${right.dataType})")

    override def nullSafeEval(xv: Any, yv: Any): Any = {
      var x = xv.asInstanceOf[Long]
      var y = yv.asInstanceOf[Long]
      var d = 0L
      var s = 1L << (bits - 1)
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * (if (rx == 0L) ry else 3L - ry)
        if (ry == 0L) {
          if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (xv, yv) => {
        val x = ctx.freshName("hx")
        val y = ctx.freshName("hy")
        val s = ctx.freshName("hs")
        val rx = ctx.freshName("hrx")
        val ry = ctx.freshName("hry")
        val t = ctx.freshName("ht")
        val acc = ctx.freshName("hacc")
        s"""
           |long $x = $xv; long $y = $yv; long $acc = 0L;
           |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
           |  long $rx = (($x & $s) > 0) ? 1L : 0L;
           |  long $ry = (($y & $s) > 0) ? 1L : 0L;
           |  $acc += $s * $s * (($rx == 0L) ? $ry : (3L - $ry));
           |  if ($ry == 0L) {
           |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
           |    long $t = $x; $x = $y; $y = $t;
           |  }
           |}
           |${ev.value} = $acc;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): HilbertIndex =
      copy(left = newLeft, right = newRight)
  }

  def hilbert_index(x: Column, y: Column, bits: Int): Column =
    GraftColumnBridge.column(HilbertIndex(
      GraftColumnBridge.expression(x), GraftColumnBridge.expression(y), bits))
}
