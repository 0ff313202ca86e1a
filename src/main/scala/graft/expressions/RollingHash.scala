package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Per-token 60-bit md5 hashes, reduced mod P — ONE md5 per token for the
  * whole document, computed natively inside whole-stage codegen. This is the
  * front half of the Rabin–Karp rolling-gram scheme (Lee et al. 2022,
  * arXiv:2107.06499 use rolling fingerprints over token streams for
  * exact-substring dedup): downstream gram hashes are pure integer
  * polynomial combines of these values ([[PolyRollHash]]), so an L-token
  * gram costs O(1) instead of the O(L) md5-of-the-concatenated-string the
  * r10 path paid at every position.
  *
  * Oracle twin (DuckDB):
  * `list_transform(string_split(t,' '), tk -> CAST('0x'||substr(md5(tk),1,15) AS BIGINT) % P)`.
  */
case class TokenHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_token_hashes requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TokenHashes.hash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TokenHashes.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
}

object TokenHashes {
  /** Mersenne prime 2^31-1 — mirrors [[graft.ops.Dedup.P]]; kept < 2^31 so
    * every product in the polynomial combine stays under 2^62. */
  val P: Long = 2147483647L

  def hash(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      // split()/shingle arrays never carry null elements; a null (possible
      // only via hand-built arrays) hashes like the empty token
      val s = if (arr.isNullAt(i)) org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
              else arr.getUTF8String(i)
      out(i) = Md5Hash60.hash(s) % P
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Polynomial rolling hashes of every `span`-length window of a token-hash
  * array: `H(i) = (Σ_k h[i+k] · B^(span-1-k)) mod P`, emitted `mod outMod`
  * (pass `outMod = P` for the raw fingerprint, or a bucket count for
  * hashed-feature spaces). The classic Rabin–Karp update makes each window
  * O(1): `H(i+1) = ((H(i) − h[i]·B^(span−1))·B + h[i+span]) mod P`.
  *
  * Shingle edge rule (shared with [[graft.ops.Dedup.shingleStringsFromTokens]]):
  * an input SHORTER than `span` emits ONE hash — the polynomial over all its
  * elements (the "whole text is the only shingle" convention), so gram
  * counts per document match the string-shingle family exactly. Callers that
  * want strictly full windows (span dedup) pre-filter on array size.
  *
  * All arithmetic is exact in Long: values < P < 2^31 and B < 2^20, so
  * `acc·B + h < 2^52` and `h·B^(span-1) mod-P products < 2^62`. The DuckDB
  * oracle reproduces H(i) directly (no rolling needed there):
  * `(hs[i]*C(span-1) % P + hs[i+1]*C(span-2) % P + … + hs[i+span-1]) % P`
  * with `C(j) = B^j mod P` precomputed constants — identical values, plain
  * integer SQL.
  */
case class PolyRollHash(child: Expression, span: Int, outMod: Long)
    extends UnaryExpression {
  require(span >= 1, s"span must be >= 1, got $span")
  require(outMod >= 1 && outMod <= TokenHashes.P,
    s"outMod must be in [1, ${TokenHashes.P}], got $outMod")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_poly_roll_hash requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_poly_roll_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyRollHash.roll(input.asInstanceOf[ArrayData], span, outMod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.PolyRollHash.roll($c, $span, ${outMod}L)")

  override protected def withNewChildInternal(newChild: Expression): PolyRollHash =
    copy(child = newChild)
}

object PolyRollHash {
  /** Polynomial base (prime, < 2^20 so acc·B never overflows). Interpolated
    * into the DuckDB oracles as a literal. */
  val B: Long = 1000003L
  private val P: Long = TokenHashes.P

  /** B^j mod P — for oracle-SQL constant generation. */
  def bPow(j: Int): Long = {
    var v = 1L; var i = 0
    while (i < j) { v = v * B % P; i += 1 }
    v
  }

  def roll(arr: ArrayData, span: Int, outMod: Long): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    def at(i: Int): Long = if (arr.isNullAt(i)) 0L else arr.getLong(i) % P
    if (n < span) {
      // shingle edge rule: one hash over the whole (short) array
      var h = 0L; var i = 0
      while (i < n) { h = (h * B + at(i)) % P; i += 1 }
      return new GenericArrayData(Array(h % outMod))
    }
    val out = new Array[Long](n - span + 1)
    val top = bPow(span - 1)
    var h = 0L
    var i = 0
    while (i < span) { h = (h * B + at(i)) % P; i += 1 }
    out(0) = h % outMod
    var p = 1
    while (p <= n - span) {
      h = (h - at(p - 1) * top % P + P) % P
      h = (h * B + at(p + span - 1)) % P
      out(p) = h % outMod
      p += 1
    }
    new GenericArrayData(out)
  }
}
