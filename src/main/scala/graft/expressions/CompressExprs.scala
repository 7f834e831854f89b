package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.{Glue => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: deflate(text).bytes / text.bytes.
  * Highly templated/repetitive documents compress far below natural
  * prose, so LLM-data pipelines use a low ratio as a boilerplate filter
  * (complementary to the n-gram repetition score — deflate sees long-
  * range and cross-line structure that fixed-n shingles miss).
  */
object CompressExprs {
  def compressionRatio(text: Column): Column =
    ExpressionUtils.column(CompressRatioExpr(ExpressionUtils.expression(text)))
}

/** deflate-compressed size over raw UTF-8 size (raw deflate, fixed
  * level 6 — deterministic for a given zlib). Empty string → 1.0.
  * Codegen'd; one thread-local Deflater reused per task thread — no
  * per-row native allocation.
  */
case class CompressRatioExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"compression_ratio needs string, got $t")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "compression_ratio"

  override def nullSafeEval(input: Any): Any =
    CompressRatioExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.CompressRatioExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CompressRatioExpr =
    copy(child = newChild)
}

object CompressRatioExpr {
  private val deflaters = ThreadLocal.withInitial[java.util.zip.Deflater](() =>
    new java.util.zip.Deflater(6, true))

  def compute(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }
}
