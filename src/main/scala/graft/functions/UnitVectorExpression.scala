package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native L2 unit-normalization of a float/double array, widened to
  * ARRAY<DOUBLE>.
  *
  * The HOF formulation `transform(v, x -> x / sqrt(aggregate(...)))`
  * re-evaluates the full norm subtree once PER ELEMENT (the lambda body is
  * bound per element and higher-order functions are interpreted, not
  * codegen'd) — 64 dot products per 64-dim row. This expression is two
  * codegen'd loops (accumulate norm², divide) producing the output array in
  * one pass, and it also absorbs the float→double widening cast so the
  * separate `transform(v, cast)` disappears.
  *
  * Null elements are emitted as 0.0 (embedding fixtures never carry null
  * elements; the guard keeps eval total). A zero vector divides by 0 →
  * ±Infinity/NaN elements, matching the HOF form it replaces.
  */
final case class UnitVectorExpression(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_unit"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE>, got ${t.simpleString(10)}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Double](n)
    val isF = elemIsFloat
    var s = 0.0
    var i = 0
    while (i < n) {
      val v =
        if (x.isNullAt(i)) 0.0
        else if (isF) x.getFloat(i).toDouble
        else x.getDouble(i)
      out(i) = v
      s += v * v
      i += 1
    }
    val norm = math.sqrt(s)
    i = 0
    while (i < n) { out(i) = out(i) / norm; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val arr = ctx.freshName("arr")
      val norm = ctx.freshName("norm")
      val v = ctx.freshName("v")
      val get = if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double[] $arr = new double[$n];
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.isNullAt($i) ? 0.0 : $get;
         |  $arr[$i] = $v;
         |  $s += $v * $v;
         |}
         |double $norm = java.lang.Math.sqrt($s);
         |for (int $i = 0; $i < $n; $i++) { $arr[$i] /= $norm; }
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnitVectorExpression =
    copy(child = newChild)
}
