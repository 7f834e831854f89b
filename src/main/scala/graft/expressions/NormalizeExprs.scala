package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.{Glue => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical normalization (NFC) as a native codegen
  * expression. Web corpora mix composed and decomposed forms of the
  * same text (e.g. `é` as U+00E9 vs `e`+U+0301) — visually identical,
  * byte-different, so every downstream hash family (exact dedup,
  * minhash shingles, sentence dedup) treats them as distinct
  * documents. Curation pipelines normalize FIRST; Spark has no
  * built-in for it, and a UDF would break the engine's zero-UDF /
  * whole-stage-codegen discipline, hence the native expression.
  */
object NormalizeExprs {
  /** NFC-normalize a string column (NULL in → NULL out). */
  def nfc(text: Column): Column =
    ExpressionUtils.column(NfcNormalizeExpr(ExpressionUtils.expression(text)))
}

/** `Normalizer.normalize(s, NFC)` with an already-normalized fast
  * path: ASCII (the overwhelming majority of web text after encoding
  * QA) short-circuits through `isNormalized` and returns the INPUT
  * UTF8String — no new allocation, no byte copy — so the expression
  * costs one bounds-checked scan per clean row.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nfc_normalize needs string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalizeExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
