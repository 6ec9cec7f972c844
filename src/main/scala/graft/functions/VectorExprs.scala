package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`) are evaluated
  * interpreted — each row allocates lambda variables and boxes every element,
  * and the surrounding operator falls out of whole-stage codegen. A brute-
  * force ANN scan is exactly the shape that suffers: one dot product per
  * (row × query). These expressions generate a tight primitive loop instead
  * (`doGenCode`), keeping the scan inside WholeStageCodegen.
  *
  * Only `array<double>` is accepted; inputs are cast explicitly at the call
  * site (same contract the higher-order versions had). Null elements yield
  * null results (NullIntolerant-style), matching `zip_with`+`aggregate`
  * semantics on null-free arrays — the only case the engine produces.
  */
object VectorExprs {

  /** Σ aᵢ·bᵢ over two equal-length array<double> columns; null if lengths
    * differ (defensive — mismatched embedding widths are data corruption,
    * surfaced as null rather than a wrong number). */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    // can be null on NON-null inputs (length mismatch) — the default
    // child-derived nullability would make Spark read garbage instead of null
    override def nullable: Boolean = true
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      if (left.dataType == ArrayType(DoubleType, containsNull = false) ||
          left.dataType == ArrayType(DoubleType, containsNull = true))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"dot_product requires array<double>, got ${left.dataType}")
    }

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      if (a.numElements() != b.numElements()) null
      else {
        var s = 0.0; var i = 0; val n = a.numElements()
        while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
        s
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $s += $a.getDouble($i) * $b.getDouble($i);
           |  }
           |  ${ev.value} = $s;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** √(Σ aᵢ²) over an array<double> column. */
  case class L2Norm(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      var s = 0.0; var i = 0; val n = a.numElements()
      while (i < n) { val x = a.getDouble(i); s += x * x; i += 1 }
      math.sqrt(s)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val x = ctx.freshName("x")
        s"""
           |int $n = $a.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = $a.getDouble($i);
           |  $s += $x * $x;
           |}
           |${ev.value} = java.lang.Math.sqrt($s);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column wrappers. */
  def dot_product(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def l2_norm(a: Column): Column =
    GraftColumnBridge.column(L2Norm(GraftColumnBridge.expression(a)))
}
