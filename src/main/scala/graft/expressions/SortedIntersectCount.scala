package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Intersection size of two SORTED array<long> columns by linear merge —
  * zero allocation per pair, against `size(array_intersect(a,b))` which
  * builds a hash set per evaluation. With |A∩B| in hand, Jaccard needs no
  * union materialization either: |A∪B| = |A|+|B|−|A∩B|.
  *
  * Callers must pass arrays sorted ascending with distinct elements (e.g.
  * `sort_array(collect_set(...))` — sorted ONCE per document, reused across
  * every candidate pair it appears in). Unsorted input silently undercounts:
  * this is the documented contract, enforced upstream, because checking
  * sortedness per pair would cost the merge itself.
  */
case class SortedIntersectCount(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_sorted_intersect_count requires (array<bigint>, array<bigint>), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.SortedIntersectCount.count($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SortedIntersectCount].getName, "graft_sorted_intersect_count")
}
