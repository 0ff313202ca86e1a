package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** One-pass 60-bit SimHash aggregate over token-hash longs.
  *
  * The composable formulation needs 60 separate `sum` aggregates (one per
  * bit) over the exploded token stream — 60 aggregate-buffer updates per
  * row. This custom `TypedImperativeAggregate` keeps all 60 signed counters
  * in one primitive array buffer and unpacks the input hash once per row.
  * Identical output to the 60-sum formulation and to
  * [[graft.ops.Dedup.simhash60]]: bit j of the result is set iff the count
  * of inputs with bit j set exceeds half the inputs (sum of ±1 > 0).
  */
case class SimhashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash60 requires bigint input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](61) // [0..59] bit sums, [60] count

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < 60) { buf(j) += ((h >>> j) & 1L); j += 1 }
      buf(60) += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 61) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    // signed sum for bit j = 2*count_set(j) - n; positive ⇔ 2*buf(j) > n
    val n = buf(60)
    var out = 0L
    var j = 0
    while (j < 60) { if (2 * buf(j) > n) out |= (1L << j); j += 1 }
    out
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(61 * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(61)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimhashAgg =
    copy(child = newChildren.head)
}

object SimhashAgg {
  val info: ExpressionInfo = new ExpressionInfo(classOf[SimhashAgg].getName, "graft_simhash60")
}
