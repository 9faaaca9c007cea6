package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType}

/** Pack an ARRAY<INT> of PQ codes (each in [0, 255]) into a BINARY of the
  * same length — one byte per subspace code. This is the byte-budget PQ
  * storage form: at M=8 subspaces the per-vector ANN artifact is 8 bytes
  * flat, vs the ARRAY<INT> form's 4 bytes per element plus Spark's
  * UnsafeArrayData header/null-bitmap overhead (measured ≥4× larger in
  * ScaleOpsSpec). Values are truncated to their low byte; PQ codebooks cap
  * ksub at 256 so encode-produced codes always fit.
  */
final case class PackBytesExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_pack_bytes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<INT>, got ${t.simpleString(10)}")
  }

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = if (xs.isNullAt(i)) 0 else (xs.getInt(i) & 0xFF).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (byte) ($a.isNullAt($i) ? 0 : ($a.getInt($i) & 0xFF));
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PackBytesExpression =
    copy(child = newChild)
}

/** Asymmetric-distance (ADC) score of a BINARY PQ code against a flattened
  * per-subspace lookup table: Σ_m table[m·ksub + (codes[m] & 0xFF)], with
  * ksub = |table| / |codes|. The table — M × ksub dots of the probe's
  * subvectors against the codewords — is a per-query literal, so the probed
  * clusters are scored by one codegen'd loop over an M-byte buffer per row:
  * no array allocation, no full-vector read, stays inside
  * WholeStageCodegen. This is the probe-side half of byte-budget PQ
  * (Ivf.topKPqAdcBytes); the int-array path keeps the HOF form for
  * comparison.
  */
final case class AdcScoreExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY codes, ARRAY<DOUBLE> table), got " +
        s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[Array[Byte]]
    val table = b.asInstanceOf[ArrayData]
    if (codes.length == 0) 0.0
    else {
      val ksub = table.numElements() / codes.length
      var s = 0.0
      var m = 0
      while (m < codes.length) {
        val idx = m * ksub + (codes(m) & 0xFF)
        if (idx < table.numElements() && !table.isNullAt(idx)) s += table.getDouble(idx)
        m += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val ksub = ctx.freshName("ksub")
      val idx = ctx.freshName("idx")
      val s = ctx.freshName("s")
      s"""
         |double $s = 0.0;
         |if ($a.length > 0) {
         |  int $ksub = $b.numElements() / $a.length;
         |  for (int $m = 0; $m < $a.length; $m++) {
         |    int $idx = $m * $ksub + ($a[$m] & 0xFF);
         |    if ($idx < $b.numElements() && !$b.isNullAt($idx)) {
         |      $s += $b.getDouble($idx);
         |    }
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScoreExpression =
    copy(left = newLeft, right = newRight)
}
