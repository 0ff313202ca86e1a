package graft

import org.apache.spark.sql.functions._

/** Scalar functions whose oracle DuckDB 1.0 cannot compute (soundex, crc32,
  * sha1): verified here against PUBLIC test vectors instead, so the q92/q95
  * coverage rests on the algorithm spec rather than on Spark agreeing with
  * itself. */
class ScalarFuncsSpec extends SparkSpec {
  import spark.implicits._

  test("soundex matches the published vectors (standard American Soundex)") {
    val vectors = Seq(
      "Robert" -> "R163", "Rupert" -> "R163",
      "Ashcraft" -> "A261", "Ashcroft" -> "A261", // H transparent
      "Tymczak" -> "T522", "Pfister" -> "P236",
      "Honeyman" -> "H555", "Miller" -> "M460", "Jackson" -> "J250")
    val got = vectors.map(_._1).toDF("w")
      .select(col("w"), soundex(col("w")).as("s")).as[(String, String)].collect().toMap
    vectors.foreach { case (w, exp) => assert(got(w) == exp, s"soundex($w)") }
    // lowercase input uppercases; non-letter first char returns input as-is
    val edge = Seq("robert", "4-NOT").toDF("w")
      .select(soundex(col("w"))).as[String].collect()
    assert(edge(0) == "R163" && edge(1) == "4-NOT")
  }

  test("crc32 and sha1 match the published vectors") {
    val row = Seq(("abc", "")).toDF("a", "e").select(
      crc32(col("a").cast("binary")).as("crc_abc"),
      crc32(col("e").cast("binary")).as("crc_empty"),
      sha1(col("a").cast("binary")).as("sha_abc"),
      sha1(col("e").cast("binary")).as("sha_empty"))
      .as[(Long, Long, String, String)].head()
    assert(row._1 == 891568578L)  // CRC-32 of "abc" (IEEE 802.3): 0x352441C2
    assert(row._2 == 0L)
    assert(row._3 == "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(row._4 == "da39a3ee5e6b4b0d3255bfef95601890afd80709")
  }

  test("unicode normalization: NFC composes, NFKC folds compatibility, strip_accents folds marks") {
    val T = graft.ops.TextOps
    // decomposed e+COMBINING ACUTE (U+0301) composes to U+00E9; precomposed
    // and pure-ASCII inputs take the fast path (input buffer returned)
    val rows = Seq(
      ("cafe\u0301", "caf\u00e9"),
      ("caf\u00e9", "caf\u00e9"),
      ("ascii only", "ascii only")
    ).toDF("raw", "want")
      .select(T.nfc(col("raw")).as("got"), col("want")).as[(String, String)].collect()
    rows.foreach { case (got, want) => assert(got == want, s"nfc: $got vs $want") }
    // NFKC: ligature fi (U+FB01), fullwidth A (U+FF21), superscript 2
    // (U+00B2), double-struck N (U+2115)
    val k = Seq(("\ufb01le \uff21 x\u00b2 \u2115")).toDF("s")
      .select(T.nfkc(col("s"))).as[String].head()
    assert(k == "file A x2 N", s"nfkc: $k")
    // strip_accents on the q161-pinned set (DuckDB-agreement set), both NFC
    // and NFD inputs, plus the no-decomposition passthroughs (U+00F8 U+00E6
    // U+00DF)
    val sa = Seq(("caf\u00e9 \u00fcber ni\u00f1o \u00e7\u00e0 \u00f8\u00e6\u00df e\u0301"))
      .toDF("s").select(T.stripAccents(col("s"))).as[String].head()
    assert(sa == "cafe uber nino ca \u00f8\u00e6\u00df e", s"strip: $sa")
    // canonicalText: the full dedup-key chain collapses all the byte-level
    // variants of the same visible text (NFC/NFD, case, whitespace)
    val keys = Seq("Caf\u00e9  du   Parc", "cafe\u0301 du parc", "CAF\u00c9 DU\tPARC")
      .toDF("s").select(T.canonicalText(col("s"))).as[String].collect().toSet
    assert(keys == Set("cafe du parc"), s"canonical: $keys")
    // NULL passthrough
    assert(Seq((null: String)).toDF("s").select(T.nfc(col("s"))).head().isNullAt(0))
  }

  test("unicode normalization SQL surface matches the Scala columns") {
    GraftExtensions.install(spark)
    // NB: Spark's chr() is byte-based (mod 256), so the non-ASCII inputs go
    // in as raw UTF-8 literals built Scala-side
    val got = spark.sql(
      s"SELECT graft_nfc('cafe\u0301'), graft_nfkc('\ufb01le'), " +
        "graft_strip_accents('caf\u00e9')").head()
    assert(got.getString(0) == "caf\u00e9")
    assert(got.getString(1) == "file")
    assert(got.getString(2) == "cafe")
  }
}
