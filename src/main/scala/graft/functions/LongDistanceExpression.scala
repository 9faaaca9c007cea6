package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd integer vector distances over `ARRAY<BIGINT>` — the
  * k38 / ADC scoring arithmetic as ONE tight loop instead of a
  * `zip_with` + `aggregate` HOF chain (higher-order functions evaluate
  * their lambda per element through the interpreted path and materialize
  * the intermediate array per pair; at ~200k candidate pairs × 64 dims
  * that interpretive overhead dominated k38's bench cost). Same exact
  * int64 arithmetic, same skip-null-element posture as
  * [[DotProductExpression]].
  *
  * `mode`: 0 = L1 (Σ|aᵢ−bᵢ|), 1 = squared L2 (Σ(aᵢ−bᵢ)²),
  * 2 = L∞ (max|aᵢ−bᵢ|). Registered as `graft_l1_long` /
  * `graft_l2sq_long` / `graft_linf_long` by
  * [[graft.plans.GraftExtensions]].
  */
final case class LongDistanceExpression(left: Expression, right: Expression,
                                        mode: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String =
    mode match { case 0 => "graft_l1_long"; case 1 => "graft_l2sq_long"
                 case _ => "graft_linf_long" }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
        s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val d = x.getLong(i) - y.getLong(i)
        mode match {
          case 0 => s += math.abs(d)
          case 1 => s += d * d
          case _ => val ad = math.abs(d); if (ad > s) s = ad
        }
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val acc = mode match {
        case 0 => s"$s += java.lang.Math.abs($d);"
        case 1 => s"$s += $d * $d;"
        case _ => s"long __ad = java.lang.Math.abs($d); if (__ad > $s) $s = __ad;"
      }
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDistanceExpression =
    copy(left = newLeft, right = newRight)
}
