package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused integer dot product over two array<long> columns.
  *
  * The composable alternatives are bad at both ends: `aggregate(zip_with(…))`
  * is an interpreted higher-order function (no codegen), and a fully
  * unrolled 64-term expression tree codegens into enormous Janino classes
  * whose compilation dominates short jobs. This expression is one virtual
  * call into a tight primitive loop — small generated code, no boxing, no
  * per-element null checks (quantized vectors are containsNull=false by
  * construction).
  *
  * Used by every similarity operator (SURVEY §2.D: fused expression for the
  * vector hot path). Overflow note: callers quantize to micro-units so
  * |a·b| < 2^53 for any realistic embedding; int64 wraps above that (same
  * contract as the SQL oracle's BIGINT arithmetic).
  */
case class ArrayDotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dotq requires (array<bigint>, array<bigint>), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dotq"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayDotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.ArrayDotProduct.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ArrayDotProduct].getName, "graft_dotq")
}
