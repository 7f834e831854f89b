package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.{Glue => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a native expression.
  *
  * The sketch travels as its serialized bytes (a plain constructor
  * payload, so the expression ships to executors with the task) and is
  * deserialized once per executor; codegen binds the deserialized
  * filter as a reference object, so the per-row cost is one
  * `mightContainLong` — two xx-derived bit probes, no allocation.
  */
object BloomExprs {
  /** True iff `hash64` (a 64-bit key hash) might be in the filter.
    * No false negatives; false-positive rate is the filter's `fpp`.
    */
  def mightContain(hash64: Column, bloom: BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    ExpressionUtils.column(
      BloomMightContainExpr(ExpressionUtils.expression(hash64), bos.toByteArray))
  }
}

case class BloomMightContainExpr(child: Expression, bloomBytes: Array[Byte])
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bloom_might_contain needs bigint, got $t")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", filter,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}
