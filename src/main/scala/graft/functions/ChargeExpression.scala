package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the TPC-H "charge":
  * price · (1 − discount) · (1 + tax).
  *
  * The l01 operator proves the semantics with a Scala UDF; this is the
  * SURVEY §4 upgrade path — a real `Expression` with `doGenCode`, so the
  * arithmetic fuses into WholeStageCodegen instead of crossing the UDF
  * boundary (boxing + closure call per row). Registered as SQL function
  * `graft_charge` via [[graft.plans.GraftExtensions]].
  */
final case class ChargeExpression(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_charge"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires three DOUBLE arguments, got " +
      children.map(_.dataType.simpleString).mkString(", "))

  override def nullSafeEval(p: Any, d: Any, t: Any): Any =
    p.asInstanceOf[Double] * (1.0 - d.asInstanceOf[Double]) * (1.0 + t.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, d, t) => s"$p * (1.0 - $d) * (1.0 + $t)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ChargeExpression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
