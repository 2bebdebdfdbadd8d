package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst dot product over numeric arrays — the vector hot-path
  * kernel under every cosine computation (brute-force ANN, IVF probe, LSH
  * verify). Spark's higher-order `aggregate(zip_with(...))` evaluates a
  * lambda per ELEMENT with boxed values and no codegen; `doGenCode` here
  * emits a primitive `for` loop over the two `ArrayData`, so a 64-dim dot
  * is 64 fused multiply-adds inside the whole-stage-codegen loop.
  * Accumulation order is left-to-right, identical to the HOF form it
  * replaces — results are bit-equal, so the DuckDB oracles are unaffected.
  *
  * Element nulls are treated as 0 (embedding columns are non-null by
  * construction; `SelectVectorColumnOp` asserts the dtype).
  */
case class DotProductExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
    : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product needs array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xf = elemIsFloat(left); val yf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
        s += xv * yv
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
      def get(arr: String, isFloat: Boolean) =
        if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += ${get(a, elemIsFloat(left))} * ${get(b, elemIsFloat(right))};
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** Native ADC gather-sum — the per-candidate kernel of IVF-PQ scoring:
  * `Σ_s lut[s·ksub + codes[s]]`, where `lut` is the query's asymmetric
  * lookup table (array<double>, one dot product per (subspace, codeword))
  * and `codes` the candidate's PQ code vector (array<int>). This is the
  * operation product quantization exists for: per candidate O(m) primitive
  * lookups instead of an O(d) vector dot — a UDF here would re-box the
  * 128-entry LUT per PAIR and erase the asymptotic win. Accumulation is in
  * subspace order (s ascending), replayable by the SQL oracle.
  *
  * Out-of-range codes contribute 0 (cannot happen for codes produced by
  * [[graft.ext.Similarity.PqCodebooks.encode]]; the guard keeps the kernel
  * total rather than throwing inside generated code).
  */
case class AdcGatherSumExpr(left: Expression, right: Expression, ksub: Int)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
    : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val lutOk = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val codesOk = right.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (lutOk && codesOk && ksub > 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"adc_gather_sum needs (array<double>, array<int>) and ksub > 0, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}, ksub=$ksub")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val n = lut.numElements()
    var s = 0.0
    var i = 0
    while (i < m) {
      if (!codes.isNullAt(i)) {
        val idx = i * ksub + codes.getInt(i)
        if (idx >= 0 && idx < n && !lut.isNullAt(idx)) s += lut.getDouble(idx)
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val idx = ctx.freshName("idx")
      s"""
         |int $m = $b.numElements();
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  if (!$b.isNullAt($i)) {
         |    int $idx = $i * $ksub + $b.getInt($i);
         |    if ($idx >= 0 && $idx < $n && !$a.isNullAt($idx)) {
         |      $s += $a.getDouble($idx);
         |    }
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcGatherSumExpr =
    copy(left = newLeft, right = newRight)
}

object VectorKernels {

  /** Codegen'd dot product (see [[DotProductExpr]]). */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Codegen'd ADC gather-sum (see [[AdcGatherSumExpr]]). */
  def adcGatherSum(lut: Column, codes: Column, ksub: Int): Column =
    GraftColumnBridge.column(AdcGatherSumExpr(
      GraftColumnBridge.expression(lut), GraftColumnBridge.expression(codes), ksub))
}
