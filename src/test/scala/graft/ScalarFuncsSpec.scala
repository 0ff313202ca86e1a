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
}
