package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DecimalType, LongType, TimestampNTZType}

/** Native Catalyst expression for the 128-bit Morton (Z-order)
  * interleave of two temporal dimensions — the codegen'd replacement for
  * the per-row Scala UDF the z-layout writer used through round 7
  * (`sources/Layout.scala`), modeled on [[CosineSimilarity]]. The
  * reference computes the same curve position per index entry in
  * crux-core/src/crux/morton.clj:60-64 (longs->morton-number).
  *
  * Inputs are TIMESTAMP_NTZ (whose Catalyst-internal representation IS a
  * micros-since-epoch long) or raw micros longs, so `doGenCode` reads two
  * primitive longs and calls the shared static
  * [[graft.bitemp.Morton.zDecimal]] kernel — no boxing, no Row
  * round-trip, and the expression stays inside whole-stage codegen
  * (FunctionsSpec pins the WholeStageCodegen span). Output is
  * `decimal(38,0)`: any interleave of two sub-2^63 micros is < 2^126.
  */
case class MortonZ(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case TimestampNTZType | LongType => true; case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"morton_z expects timestamp_ntz or bigint arguments, got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DecimalType(38, 0)
  override def prettyName: String = "morton_z"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.bitemp.Morton.zDecimal(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.bitemp.Morton.zDecimal($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonZ =
    copy(left = newLeft, right = newRight)
}
