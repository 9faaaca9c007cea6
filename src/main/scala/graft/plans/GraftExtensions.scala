package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{AdcScoreExpression, CanonicalizeTextExpression, ChargeExpression, DotProductExpression, GcdExpression, LongDistanceExpression, PackBytesExpression, UnitVectorExpression}

/** Engine extension point (SURVEY §4 "custom code actually needed" item 2).
  *
  * Installed via `spark.sql.extensions=graft.plans.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`. v1
  * deliberately injects no optimizer rules or strategies — Catalyst already
  * plans every §2 operator well (SURVEY §4); this registers the native
  * functions only.
  */
final class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_charge"),
      new ExpressionInfo(classOf[ChargeExpression].getName, "graft_charge"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "graft_charge(price, discount, tax)")
        // accept any numeric input: analyzer-independent explicit casts
        val Seq(p, d, t) = children.map(c =>
          org.apache.spark.sql.catalyst.expressions.Cast(
            c, org.apache.spark.sql.types.DoubleType))
        ChargeExpression(p, d, t)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpression].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot(array<double>, array<double>)")
        DotProductExpression(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_pack_bytes"),
      new ExpressionInfo(classOf[PackBytesExpression].getName, "graft_pack_bytes"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_pack_bytes(array<int>)")
        PackBytesExpression(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_adc"),
      new ExpressionInfo(classOf[AdcScoreExpression].getName, "graft_adc"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_adc(binary, array<double>)")
        AdcScoreExpression(children(0), children(1))
      }))
    Seq(("graft_l1_long", 0), ("graft_l2sq_long", 1), ("graft_linf_long", 2))
      .foreach { case (name, mode) =>
        ext.injectFunction((
          new FunctionIdentifier(name),
          new ExpressionInfo(classOf[LongDistanceExpression].getName, name),
          (children: Seq[Expression]) => {
            require(children.size == 2, s"$name(array<bigint>, array<bigint>)")
            LongDistanceExpression(children(0), children(1), mode)
          }))
      }
    ext.injectFunction((
      new FunctionIdentifier("graft_gcd"),
      new ExpressionInfo(classOf[GcdExpression].getName, "graft_gcd"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_gcd(bigint, bigint)")
        val Seq(a, b) = children.map(c =>
          org.apache.spark.sql.catalyst.expressions.Cast(
            c, org.apache.spark.sql.types.LongType))
        GcdExpression(a, b)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_canon"),
      new ExpressionInfo(classOf[CanonicalizeTextExpression].getName, "graft_canon"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_canon(string)")
        CanonicalizeTextExpression(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_unit"),
      new ExpressionInfo(classOf[UnitVectorExpression].getName, "graft_unit"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_unit(array<float|double>)")
        UnitVectorExpression(children.head)
      }))
  }
}
