package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing (north-star surface).
  *
  * Media payloads are opaque `BinaryType` columns plus a typed metadata
  * struct; decode / feature-extract operators run per-partition so a real
  * codec (JNI / external lib) drops in behind the [[MediaDecoder]] trait
  * without touching the pipeline shape. The container has no media codecs, so
  * [[StubDecoder]] is a clearly-marked deterministic fake — the Spark-side
  * plumbing (schema, partitioning, batch iteration, failure capture) is real
  * and tested.
  *
  * Scale notes: payload bytes never shuffle — metadata extraction and
  * feature extraction are projections; anything keyed (e.g. near-dup on
  * feature vectors) first reduces to small fixed-size columns.
  */
object Multimodal {

  /** Typed metadata carried alongside every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** Synthesize a deterministic fake media payload for a row: a parseable
    * header `IMG:<w>x<h>:` followed by pseudo-random body bytes derived from
    * the id. Used by fixtures/tests; at 100 TB the payload comes from object
    * storage instead. */
  def fakePayload(id: Column): Column = {
    val w = (pmod(id, lit(4)) + 1) * 64
    val h = (pmod(id, lit(3)) + 1) * 64
    val body = md5(concat(lit("body"), id))
    concat(lit("IMG:"), w.cast("string"), lit("x"), h.cast("string"), lit(":"), body).cast("binary")
  }

  /** Parse the typed metadata struct out of a payload header — pure
    * expressions (codegen'd), no decode of the body. */
  def extractMeta(bin: Column): Column = {
    val s = bin.cast("string")
    struct(
      regexp_extract(s, "^([A-Z]+):", 1).as("format"),
      regexp_extract(s, "^[A-Z]+:([0-9]+)x", 1).cast("int").as("width"),
      regexp_extract(s, "^[A-Z]+:[0-9]+x([0-9]+):", 1).cast("int").as("height"),
      length(bin).cast("long").as("n_bytes"))
  }

  /** Per-partition media decoder: bytes → fixed-size feature vector.
    * Implementations must be serializable (shipped to executors). */
  trait MediaDecoder extends Serializable {
    def dim: Int
    /** Decode one payload; throw on corrupt input (captured per-row). */
    def decode(bytes: Array[Byte]): Array[Float]
  }

  /** Deterministic STUB for the missing codec libraries: a normalized
    * byte-value histogram. Stands in for "decode image → embed"; swap for a
    * real codec behind the same trait. */
  final class StubDecoder(val dim: Int = 16) extends MediaDecoder {
    def decode(bytes: Array[Byte]): Array[Float] = {
      if (bytes == null || bytes.isEmpty) throw new IllegalArgumentException("empty payload")
      val counts = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) { counts((bytes(i) & 0xff) % dim) += 1f; i += 1 }
      val n = bytes.length.toFloat
      counts.map(_ / n)
    }
  }

  /** Row-level decode outcome: errors travel as data (SafeMap contract, A2). */
  private val decodeResultType = StructType(Seq(
    StructField("ok", BooleanType, nullable = true),
    StructField("features", ArrayType(FloatType), nullable = true),
    StructField("error", StringType, nullable = true)))

  /** Decode a binary column to feature vectors via mapPartitions: one decoder
    * instance per partition (real codecs have per-thread init cost), failures
    * captured per-row as data, schema appended — the genuine 100 TB shape for
    * batch media decode. */
  def decodeFeatures(df: DataFrame, binCol: String, decoder: MediaDecoder,
                     outCol: String = "decoded"): DataFrame = {
    val schema = df.schema.add(outCol, decodeResultType)
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val out =
          try {
            val f = decoder.decode(r.getAs[Array[Byte]](idx))
            Row(true, f.toSeq, null)
          } catch {
            case e: Throwable => Row(false, null, s"${e.getClass.getSimpleName}: ${e.getMessage}")
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }
  }

  /** Frame-sample a "video" payload: slice the body into fixed-size frames
    * and keep every `everyN`-th — pure expressions over binary. */
  def frameSample(bin: Column, frameBytes: Int, everyN: Int): Column = {
    val nFrames = floor(length(bin) / frameBytes).cast("int")
    transform(
      filter(sequence(lit(0), greatest(nFrames - 1, lit(0))),
        i => (i < nFrames) && (i % everyN === 0)),
      i => bin.substr(i * frameBytes + 1, lit(frameBytes)))
  }
}
