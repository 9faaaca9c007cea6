package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd greatest common divisor over BIGINT — the ClickHouse
  * `gcd`/`lcm` scalar family [public: CH arithmetic-function docs].
  * Spark has NO gcd builtin, so this is the (b)-tier answer from the
  * build rules: a custom Catalyst `Expression` with `doGenCode` (a tight
  * Euclid loop in generated Java) rather than a UDF (which would box
  * every row and block whole-stage codegen). DuckDB's builtin `gcd` is
  * the oracle — gcd of int64 is a pure integer function, bit-exact by
  * construction; `lcm` composes at the call site as `(a div gcd)·b`
  * (division first, so the product cannot overflow unless the true lcm
  * does). Semantics match DuckDB/CH: gcd(0, x) = |x|, result is always
  * non-negative; Long.MinValue inputs (whose |x| overflows) are outside
  * the contract and documented here rather than silently wrong — the
  * fixture domain is positive keys.
  */
final case class GcdExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_gcd"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_gcd requires two BIGINT arguments, got " +
        s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = math.abs(a.asInstanceOf[Long])
    var y = math.abs(b.asInstanceOf[Long])
    while (y != 0L) { val t = x % y; x = y; y = t }
    x
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val t = ctx.freshName("t")
      s"""
         |long $x = java.lang.Math.abs($a);
         |long $y = java.lang.Math.abs($b);
         |while ($y != 0L) { long $t = $x % $y; $x = $y; $y = $t; }
         |${ev.value} = $x;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GcdExpression =
    copy(left = newLeft, right = newRight)
}
