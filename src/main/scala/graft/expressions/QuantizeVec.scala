package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Fused micro-unit quantizer: array<float|double> → array<bigint> with
  * `round(x · 1e6)` per element — ONE expression node replacing the
  * 64-node unrolled `array(round(get(v,0)·1e6)…)` tree every similarity
  * plan used to carry. The unrolled form costs nothing at runtime but its
  * SIZE dominates short jobs: Catalyst analysis, canonicalization, and
  * Janino compilation all walk those 64·k nodes on every similarity query
  * (the q170 codegen-blowup lesson, applied at the plan layer).
  *
  * Semantics are BIT-IDENTICAL to the unrolled form (the SQL oracles were
  * validated against it):
  *  - each element: `cast(round(cast(x as double) · 1e6, 0) as long)` with
  *    Spark's Round double semantics — BigDecimal HALF_UP (away from
  *    zero), NOT Math.round (which rounds -0.5 toward +infinity);
  *  - `dim` output elements always: a missing index (input shorter than
  *    `dim`) or a NULL element yields NULL, exactly like `get(v, i)`;
  *  - non-finite elements follow the LEGACY (non-ANSI) cast chain —
  *    NaN → 0, +Inf → Long.MaxValue, -Inf → Long.MinValue — a deliberate
  *    total-function choice: ANSI cast (the session default) would abort
  *    the whole job on one NaN embedding element, which is the wrong
  *    failure mode for a quantizer feeding 100 TB similarity scans.
  */
case class QuantizeVec(child: Expression, dim: Int) extends UnaryExpression {
  require(dim >= 1, s"dim must be >= 1, got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_quantize_vec requires array<float> or array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_quantize_vec"

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    QuantizeVec.quantize(input.asInstanceOf[ArrayData], dim, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.QuantizeVec.quantize($c, $dim, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
}

object QuantizeVec {
  /** `round(x·1e6)` with Spark's Round-on-double rule (BigDecimal HALF_UP —
    * away from zero on .5, unlike Math.round). Non-finite inputs reproduce
    * Spark's `cast(round(double) as long)` chain instead of reaching
    * `BigDecimal.valueOf` (which throws on NaN/Inf): Round passes NaN/Inf
    * through untouched and the long cast then yields 0 / Long.MaxValue /
    * Long.MinValue — so one NaN embedding element degrades that element,
    * not the whole job. The scaled value is what's guarded: a finite x
    * near ±1.8e302 overflows to ±Inf only after the ·1e6. */
  private def roundMicro(d: Double): Long = {
    val scaled = d * 1000000d
    if (java.lang.Double.isNaN(scaled)) 0L
    else if (scaled == Double.PositiveInfinity) Long.MaxValue
    else if (scaled == Double.NegativeInfinity) Long.MinValue
    else java.math.BigDecimal.valueOf(scaled)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
  }

  def quantize(arr: ArrayData, dim: Int, isFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    val m = math.min(n, dim)
    var hasNull = dim > n
    var i = 0
    while (!hasNull && i < m) { if (arr.isNullAt(i)) hasNull = true; i += 1 }
    if (!hasNull) {
      val out = new Array[Long](dim)
      var j = 0
      while (j < dim) {
        out(j) = roundMicro(if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j))
        j += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](dim)
      var j = 0
      while (j < dim) {
        out(j) =
          if (j >= n || arr.isNullAt(j)) null
          else Long.box(roundMicro(if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)))
        j += 1
      }
      new GenericArrayData(out)
    }
  }
}
