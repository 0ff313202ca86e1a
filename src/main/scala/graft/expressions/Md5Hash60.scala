package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5 hash: the first 15 hex nibbles of md5(input) as a long —
  * bit-identical to `conv(substring(md5(c),1,15),16,10)` (and to the DuckDB
  * oracle's `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`) but computed
  * directly from the digest bytes: no hex-string materialization, no base
  * conversion, and a real `doGenCode` so it stays inside whole-stage codegen
  * (SURVEY §2.D: custom codegen `Expression` for hot text ops).
  *
  * The reference delegates stable record hashing to `polars-hash`
  * (reference: projects/feray/pyproject.toml:26); this is the analogous
  * engine-native primitive for the oracle-reproducible hash family.
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_md5hash60 requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5hash60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5Hash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {
  private val localMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex nibbles of the digest == big-endian first 8 bytes >>> 4. */
  def hash(s: UTF8String): Long = {
    val md = localMd5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Hex nibbles 17–31 of the digest (== big-endian bytes 8..15 >>> 4) —
    * a second 60-bit value INDEPENDENT of [[hash]] from the same digest;
    * oracle twin `CAST('0x'||substr(md5(x),17,15) AS BIGINT)`. Feeds the
    * dual-polynomial composite gram fingerprint ([[DualPolyRollHash]]). */
  def hashTail(s: UTF8String): Long = {
    val md = localMd5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 8
    while (i < 16) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Md5Hash60].getName, "graft_md5hash60")
}
