package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch over a string stream — the bounded-
  * memory heavy-hitters aggregate. Exact top-k by token needs a full
  * vocabulary-sized aggregation; this keeps AT MOST `k` counters per
  * aggregation buffer regardless of stream length or cardinality, with the
  * deterministic guarantee
  *
  *   est(x) <= true(x) <= est(x) + N/(k+1)
  *
  * for every item x (absent ⇒ est 0), so any item with true count > N/(k+1)
  * is guaranteed present. Buffers MERGE soundly (Agarwal et al., "Mergeable
  * Summaries", PODS'12): counts sum keywise, then the (k+1)-th largest value
  * is subtracted from all and non-positive entries drop — the bound holds for
  * the combined stream, which is what makes the sketch correct under Spark's
  * partial aggregation (any partitioning, any merge order).
  *
  * Update is the classic decrement-all step, amortized O(1) per row (each
  * O(k) pass retires k+1 stream units); eviction order is deterministic.
  * Output: struct(n BIGINT, items ARRAY<STRUCT<item STRING, est BIGINT>>),
  * items sorted (est desc, item asc) so the rendering is deterministic for a
  * given merge tree.
  */
case class FreqItemsAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqItemsAgg.Buffer] {

  require(k >= 1, "FreqItemsAgg needs k >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false),
      nullable = false)))
  override def prettyName: String = "graft_freq_items"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_freq_items requires string input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): FreqItemsAgg.Buffer =
    new FreqItemsAgg.Buffer(new java.util.HashMap[String, Long](), 0L)

  override def update(buf: FreqItemsAgg.Buffer, input: InternalRow): FreqItemsAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.n += 1
      val item = v.asInstanceOf[UTF8String].toString
      // counters are always >= 1 (zeros are removed), so 0 means absent
      val cur = buf.counts.getOrDefault(item, 0L)
      if (cur > 0L) buf.counts.put(item, cur + 1)
      else if (buf.counts.size < k) buf.counts.put(item, 1L)
      else {
        // decrement-all: retires one unit of every counter AND the new item
        val it = buf.counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1)
        }
      }
    }
    buf
  }

  override def merge(a: FreqItemsAgg.Buffer, b: FreqItemsAgg.Buffer): FreqItemsAgg.Buffer = {
    a.n += b.n
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      a.counts.put(e.getKey, a.counts.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (a.counts.size > k) {
      // subtract the (k+1)-th largest count from everything; <= k survive
      val vals = new Array[Long](a.counts.size)
      var i = 0
      val vi = a.counts.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val d = vals(vals.length - (k + 1)) // (k+1)-th largest
      val ei = a.counts.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        if (e.getValue <= d) ei.remove() else e.setValue(e.getValue - d)
      }
    }
    a
  }

  override def eval(buf: FreqItemsAgg.Buffer): Any = {
    val entries = new Array[(String, Long)](buf.counts.size)
    var i = 0
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    scala.util.Sorting.stableSort(entries,
      (x: (String, Long), y: (String, Long)) =>
        x._2 > y._2 || (x._2 == y._2 && x._1 < y._1))
    val rows: Array[Any] = entries.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est): Any
    }
    InternalRow(buf.n, new GenericArrayData(rows))
  }

  override def serialize(buf: FreqItemsAgg.Buffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqItemsAgg.Buffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readLong()
    val size = in.readInt()
    val m = new java.util.HashMap[String, Long](size * 2)
    var i = 0
    while (i < size) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      m.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    new FreqItemsAgg.Buffer(m, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = newChildren.head)
}

object FreqItemsAgg {
  /** counts: item -> Misra–Gries counter (≤ k entries); n: stream length. */
  final class Buffer(val counts: java.util.HashMap[String, Long], var n: Long)
  val info: ExpressionInfo = new ExpressionInfo(classOf[FreqItemsAgg].getName, "graft_freq_items")
}
