// Hosted under org.apache.spark.sql for the same reason as
// VecExpressions.scala: native Catalyst expressions wrap into Columns via
// the classic ExpressionUtils.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(key)` over a pre-built [[BloomFilter]].
  *
  * The filter rides INSIDE the expression (it is `Serializable`), exactly
  * how Spark's own runtime row-level filters ship their
  * `BloomFilterAggregate` result in the plan: at the default 3% fpp a
  * 1M-key filter is ~0.9 MB — plan-shippable, far below what a broadcast
  * hash relation of the same keys would cost, and it needs no shuffle on
  * the probe side. Codegen registers the filter as a reference object, so
  * the probe is a single virtual call inside whole-stage codegen; the
  * interpreted path uses the same instance.
  *
  * Keys are `LongType` by contract — callers hash arbitrary key types
  * through `xxhash64` on BOTH the build and the probe side (see
  * `graft.joins.BloomPrune`), which keeps put/probe hashing consistent
  * without per-type dispatch.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def column(key: Column, bloom: BloomFilter): Column =
    ExpressionUtils.column(
      BloomMightContain(ExpressionUtils.expression(key), bloom))
}
