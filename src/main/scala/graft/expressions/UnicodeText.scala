package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization primitives — the text-cleaning step a corpus
  * pipeline runs BEFORE any hash-keyed operator: the same visible text can
  * arrive precomposed (é = U+00E9) or decomposed (e + U+0301), and every
  * downstream exact-dedup / fingerprint / gram hash treats those byte
  * sequences as different documents unless the corpus is normalized first.
  *
  * Both are native codegen `Expression`s (SURVEY §2.D custom-Expression
  * family): the JDK's `java.text.Normalizer` (ICU-derived, in `java.base`)
  * does the per-string work, an `isNormalized` fast path returns the input
  * UTF8String untouched for already-canonical text (the overwhelmingly
  * common case — ASCII is normalization-invariant), and `doGenCode` keeps
  * the call inside whole-stage codegen.
  *
  * Cross-engine contract: NFC/NFD are Unicode-standard canonical forms —
  * DuckDB's `nfc_normalize` agrees on every assigned codepoint (both
  * implement UAX #15); [[StripAccents]] is NFD + drop-combining-marks
  * (category Mn), which matches DuckDB's `strip_accents` on Latin
  * diacritics (the q161 oracle pins a planted set; exotic scripts where
  * utf8proc's lump tables diverge from plain Mn-stripping are out of the
  * pinned contract).
  */
case class UnicodeNormalize(child: Expression, formName: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
    else if (!UnicodeText.Forms.contains(formName))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: unknown form '$formName' (one of ${UnicodeText.Forms.keys.mkString("/")})")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = StringType
  override def prettyName: String = s"graft_${formName.toLowerCase}"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeText.normalize(input.asInstanceOf[UTF8String], formName)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.expressions.UnicodeText.normalize($c, "$formName")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

/** NFD-decompose then drop combining marks (general category Mn): é→e, ü→u,
  * ñ→n, ç→c — the accent-folding half of a canonical dedup key. Characters
  * with no canonical decomposition (ø, æ, ß) pass through unchanged. */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_strip_accents requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_strip_accents"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeText.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.UnicodeText.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object UnicodeText {
  import java.text.Normalizer

  /** Resolved once; the codegen call path looks the form up per row — an
    * enum-map get, not a parse. */
  val Forms: Map[String, Normalizer.Form] = Map(
    "NFC" -> Normalizer.Form.NFC, "NFD" -> Normalizer.Form.NFD,
    "NFKC" -> Normalizer.Form.NFKC, "NFKD" -> Normalizer.Form.NFKD)

  def normalize(s: UTF8String, formName: String): UTF8String = {
    val form = Forms(formName)
    val str = s.toString
    // already-normal fast path: no allocation, the input buffer flows on
    // (ASCII — virtually all corpus bytes — is normal under every form)
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFD) &&
        !hasCombining(str)) return s
    val d = Normalizer.normalize(str, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  private def hasCombining(str: String): Boolean = {
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (Character.getType(cp) == Character.NON_SPACING_MARK) return true
      i += Character.charCount(cp)
    }
    false
  }

  val nfcInfo: ExpressionInfo = new ExpressionInfo(
    classOf[UnicodeNormalize].getName, "graft_nfc")
  val nfkcInfo: ExpressionInfo = new ExpressionInfo(
    classOf[UnicodeNormalize].getName, "graft_nfkc")
  val stripInfo: ExpressionInfo = new ExpressionInfo(
    classOf[StripAccents].getName, "graft_strip_accents")
}
