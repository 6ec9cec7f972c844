package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization.
  *
  * Canonical composition is a standard corpus-prep stage (the same text
  * arrives as composed "é" from one crawler and "e"+U+0301 from another,
  * and every downstream exact-match step — dedup fingerprints, vocabulary
  * counts, PII scans — silently fragments until the corpus is normalized).
  * A Scala UDF would work but drops out of whole-stage codegen and boxes
  * every row; this expression stays inside the generated plan (the
  * [[SpatialExprs.HilbertIndex]] discipline) and calls the JDK's
  * `java.text.Normalizer` directly. The already-normalized fast path
  * returns the INPUT UTF8String untouched — on realistic corpora almost
  * every row is already NFC, so the common case allocates one transient
  * String and no new UTF8String. */
object StringExprs {

  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType.isInstanceOf[org.apache.spark.sql.types.StringType])
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"nfc requires string, got ${child.dataType}")

    override def nullSafeEval(v: Any): Any = {
      val u = v.asInstanceOf[UTF8String]
      val s = u.toString
      val n = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      if (n.equals(s)) u else UTF8String.fromString(n)
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val s = ctx.freshName("nfcIn")
        val n = ctx.freshName("nfcOut")
        s"""
           |String $s = $c.toString();
           |String $n = java.text.Normalizer.normalize(
           |  $s, java.text.Normalizer.Form.NFC);
           |${ev.value} = $n.equals($s)
           |  ? $c : org.apache.spark.unsafe.types.UTF8String.fromString($n);
           |""".stripMargin
      })

    override protected def withNewChildInternal(
        newChild: Expression): NfcNormalize = copy(child = newChild)
  }

  /** NFC-normalize a string column (null-safe, codegen'd). */
  def nfc(c: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(c)))
}
