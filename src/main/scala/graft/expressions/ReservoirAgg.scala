package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded deterministic reservoir: keep the `k` rows with the SMALLEST
  * `(draw, id)` pairs seen by this buffer — the aggregate form of
  * "hash-ordered top-k per group" sampling.
  *
  * The window-rank form ([[graft.ops.Stats.stratifiedSample]]) shuffles
  * EVERY row of the table to rank it; this buffer keeps at most `k`
  * (draw, id) pairs under partial aggregation, so the exchange after the
  * map side carries ≤ k pairs PER GROUP PER TASK instead of the whole
  * table — the shape that makes "sample N per group" affordable on a
  * 100 TB fact table. Because the kept set is "the k globally smallest
  * (draw, id)" — a pure function of the input MULTISET — merges are sound
  * in any order and the result is identical to the window form when `draw`
  * is a deterministic hash (never rand()): retry-stable, engine-portable,
  * oracle-checkable.
  *
  * Output: ARRAY<STRUCT<draw BIGINT, id BIGINT>> sorted ascending, so
  * `posexplode` yields the same `sample_rank` the window form assigns.
  * Both children must be BIGINT; a row with NULL draw or id is SKIPPED —
  * callers that claim parity with a window-rank form must exclude those
  * rows there too (row_number ranks NULLs, it does not drop them; see
  * [[graft.ops.Stats.stratifiedSample]]'s explicit isNotNull filter).
  */
case class ReservoirAgg(
    draw: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ReservoirAgg.Buffer] {

  require(k >= 1, "graft_reservoir needs k >= 1")

  override def children: Seq[Expression] = Seq(draw, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("draw", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_reservoir"

  override def checkInputDataTypes(): TypeCheckResult =
    if (draw.dataType == LongType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_reservoir requires (bigint draw, bigint id), got " +
        s"(${draw.dataType.catalogString}, ${id.dataType.catalogString})")

  // max-heap on (draw, id): peek is the LARGEST kept pair — the eviction
  // candidate. Size never exceeds k.
  override def createAggregationBuffer(): ReservoirAgg.Buffer =
    new ReservoirAgg.Buffer(new java.util.PriorityQueue[Array[Long]](
      math.min(k, 64), ReservoirAgg.maxFirst))

  private def offer(buf: ReservoirAgg.Buffer, d: Long, i: Long): Unit = {
    val q = buf.q
    if (q.size < k) q.add(Array(d, i))
    else {
      val top = q.peek()
      if (d < top(0) || (d == top(0) && i < top(1))) {
        q.poll(); q.add(Array(d, i))
      }
    }
  }

  override def update(buf: ReservoirAgg.Buffer, input: InternalRow): ReservoirAgg.Buffer = {
    val d = draw.eval(input)
    val i = id.eval(input)
    if (d != null && i != null)
      offer(buf, d.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: ReservoirAgg.Buffer, b: ReservoirAgg.Buffer): ReservoirAgg.Buffer = {
    val it = b.q.iterator()
    while (it.hasNext) { val p = it.next(); offer(a, p(0), p(1)) }
    a
  }

  override def eval(buf: ReservoirAgg.Buffer): Any = {
    val arr = buf.q.toArray(new Array[Array[Long]](buf.q.size))
    java.util.Arrays.sort(arr, ReservoirAgg.minFirst)
    new GenericArrayData(arr.map(p => InternalRow(p(0), p(1)): Any))
  }

  override def serialize(buf: ReservoirAgg.Buffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.q.size * 16)
    bb.putInt(buf.q.size)
    val it = buf.q.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p(0)); bb.putLong(p(1)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ReservoirAgg.Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val size = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < size) { buf.q.add(Array(bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ReservoirAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ReservoirAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ReservoirAgg =
    copy(draw = newChildren(0), id = newChildren(1))
}

object ReservoirAgg {
  final class Buffer(val q: java.util.PriorityQueue[Array[Long]])
  /** Largest (draw, id) first — heap order for eviction. */
  val maxFirst: java.util.Comparator[Array[Long]] = (a, b) => {
    val c = java.lang.Long.compare(b(0), a(0))
    if (c != 0) c else java.lang.Long.compare(b(1), a(1))
  }
  /** Smallest (draw, id) first — output order (= sample_rank order). */
  val minFirst: java.util.Comparator[Array[Long]] = (a, b) => {
    val c = java.lang.Long.compare(a(0), b(0))
    if (c != 0) c else java.lang.Long.compare(a(1), b(1))
  }
  val info: ExpressionInfo = new ExpressionInfo(classOf[ReservoirAgg].getName, "graft_reservoir")
}
