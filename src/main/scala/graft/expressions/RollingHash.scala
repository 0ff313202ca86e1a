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
  * `tail = false` takes the digest's FIRST 60 bits, `tail = true` its
  * SECOND 60 bits (hex nibbles 17–31) — two independent per-token hash
  * streams from the same single md5, feeding [[DualPolyRollHash]]'s
  * dual-polynomial composite fingerprint.
  *
  * Oracle twins (DuckDB):
  * `list_transform(string_split(t,' '), tk -> CAST('0x'||substr(md5(tk),1,15) AS BIGINT) % P)`
  * and `substr(md5(tk),17,15)` for the tail stream.
  */
case class TokenHashes(child: Expression, tail: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_token_hashes requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TokenHashes.hash(input.asInstanceOf[ArrayData], tail)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TokenHashes.hash($c, $tail)")

  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
}

object TokenHashes {
  /** Mersenne prime 2^31-1 — mirrors [[graft.ops.Dedup.P]]; kept < 2^31 so
    * every product in the polynomial combine stays under 2^62. */
  val P: Long = 2147483647L

  def hash(arr: ArrayData, tail: Boolean): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      // split()/shingle arrays never carry null elements; a null (possible
      // only via hand-built arrays) hashes like the empty token
      val s = if (arr.isNullAt(i)) org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
              else arr.getUTF8String(i)
      out(i) = (if (tail) Md5Hash60.hashTail(s) else Md5Hash60.hash(s)) % P
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
  /** Second, independent polynomial base for [[DualPolyRollHash]]'s
    * composite fingerprint (also prime, < 2^20). */
  val B2: Long = 1000033L
  private val P: Long = TokenHashes.P

  /** B^j mod P — for oracle-SQL constant generation. */
  def bPow(j: Int): Long = bPow(j, B)

  /** base^j mod P — the parameterized form ([[DualPolyRollHash]] oracles
    * interpolate constants for BOTH bases). */
  def bPow(j: Int, base: Long): Long = {
    var v = 1L; var i = 0
    while (i < j) { v = v * base % P; i += 1 }
    v
  }

  def roll(arr: ArrayData, span: Int, outMod: Long): ArrayData =
    new GenericArrayData(rollRaw(arr, span, outMod, B))

  /** The shared rolling kernel — raw long array out, parameterized base. */
  private[expressions] def rollRaw(arr: ArrayData, span: Int, outMod: Long,
      base: Long): Array[Long] = {
    val n = arr.numElements()
    if (n == 0) return Array.emptyLongArray
    def at(i: Int): Long = if (arr.isNullAt(i)) 0L else arr.getLong(i) % P
    if (n < span) {
      // shingle edge rule: one hash over the whole (short) array
      var h = 0L; var i = 0
      while (i < n) { h = (h * base + at(i)) % P; i += 1 }
      return Array(h % outMod)
    }
    val out = new Array[Long](n - span + 1)
    val top = bPow(span - 1, base)
    var h = 0L
    var i = 0
    while (i < span) { h = (h * base + at(i)) % P; i += 1 }
    out(0) = h % outMod
    var p = 1
    while (p <= n - span) {
      h = (h - at(p - 1) * top % P + P) % P
      h = (h * base + at(p + span - 1)) % P
      out(p) = h % outMod
      p += 1
    }
    out
  }
}

/** Composite ≈62-bit rolling gram fingerprint: two INDEPENDENT Rabin–Karp
  * polynomials — the head-60-bit token-hash stream under base B and the
  * tail-60-bit stream under base B2 ([[TokenHashes]] `tail` flag) — rolled
  * in lockstep and packed as `h1 · P + h2` (< 2^62, exact in Long, a
  * bijection of the pair). A single mod-P polynomial lives in a 31-bit
  * space where corpus-wide gram-membership comparison is already expected
  * to collide at sf1 gram counts (birthday bound ~2^15.5 grams) and is
  * catastrophic at 100 TB; a false positive here requires BOTH independent
  * 31-bit fingerprints to collide (~2^31 birthday bound — out of reach at
  * any realistic gram count). Used by the span-dedup family
  * ([[graft.ops.Dedup.duplicateSpanStats]]); the feature-hashing users
  * (bigram LM buckets, hashed n-gram features) stay on the single
  * polynomial — collisions are part of that contract.
  *
  * The DuckDB oracle reproduces each polynomial positionally with
  * interpolated `base^j mod P` constants and packs identically:
  * `(poly1 % P) * P + (poly2 % P)` — every product < 2^62, plain BIGINT.
  */
case class DualPolyRollHash(left: Expression, right: Expression, span: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(span >= 1, s"span must be >= 1, got $span")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dual_poly_roll_hash requires two array<bigint>, got " +
          s"${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_dual_poly_roll_hash"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DualPolyRollHash.roll(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], span)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.DualPolyRollHash.roll($a, $b, $span)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DualPolyRollHash =
    copy(left = newLeft, right = newRight)
}

object DualPolyRollHash {
  private val P: Long = TokenHashes.P

  def roll(a: ArrayData, b: ArrayData, span: Int): ArrayData = {
    val h1 = PolyRollHash.rollRaw(a, span, P, PolyRollHash.B)
    val h2 = PolyRollHash.rollRaw(b, span, P, PolyRollHash.B2)
    // both streams come from the same token array, so lengths always agree;
    // a mismatch means the caller zipped different documents — fail loudly
    require(h1.length == h2.length,
      s"dual rolling-hash stream length mismatch: ${h1.length} vs ${h2.length}")
    val out = new Array[Long](h1.length)
    var i = 0
    while (i < out.length) { out(i) = h1(i) * P + h2(i); i += 1 }
    new GenericArrayData(out)
  }
}
