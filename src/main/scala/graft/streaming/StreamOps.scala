package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming operators for the fastlane/serving path (reference design:
  * README.md:47-55). Everything here is schema-generic (works on any
  * DataFrame) so batch pipelines lift to streams unchanged.
  */
object StreamOps {

  /** Event-time tumbling/sliding window aggregation with a watermark (late
    * data beyond `watermarkDelay` is dropped and state is bounded — the only
    * sane configuration at 100 TB/day stream volume). */
  def windowedAgg(stream: DataFrame, tsCol: String, windowDur: String,
                  watermarkDelay: String, slide: Option[String] = None)
                 (aggs: (org.apache.spark.sql.Column, Seq[org.apache.spark.sql.Column])): DataFrame = {
    val w = slide match {
      case Some(s) => window(col(tsCol), windowDur, s)
      case None => window(col(tsCol), windowDur)
    }
    stream.withWatermark(tsCol, watermarkDelay)
      .groupBy(w +: Seq(aggs._1): _*)
      .agg(aggs._2.head, aggs._2.tail: _*)
  }

  /** Stateful latest-value-per-key over an unbounded stream via
    * mapGroupsWithState: state is ONE row per key (bounded by key
    * cardinality, not stream length). Emits the current latest row for a key
    * every time the key appears in a micro-batch — the canonical serving-side
    * "current feature value" operator. */
  def latestPerKey(stream: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val schema = stream.schema
    val tsIdx = schema.fieldIndex(tsCol)
    implicit val rowEnc = Encoders.row(schema)
    implicit val keyEnc = Encoders.STRING
    implicit val tupleEnc = Encoders.tuple(Encoders.STRING, Encoders.row(schema))
    stream
      .groupByKey((r: Row) => String.valueOf(r.getAs[Any](keyCol)))
      .mapGroupsWithState[Row, (String, Row)](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Row], state: GroupState[Row]) =>
          val incoming = rows.maxBy(r => r.getAs[java.sql.Timestamp](tsIdx).getTime)
          val latest = state.getOption match {
            case Some(prev)
              if prev.getAs[java.sql.Timestamp](tsIdx).getTime >
                 incoming.getAs[java.sql.Timestamp](tsIdx).getTime => prev
            case _ => incoming
          }
          state.update(latest)
          (key, latest)
      }
      .toDF("key", "latest")
      .select(col("latest.*"))
  }

  /** Streaming exact dedup on a key with a watermark-bounded state window:
    * first occurrence passes, replays within the watermark horizon are
    * dropped (Structured Streaming's dropDuplicates keeps state only for
    * the watermark window — bounded memory). */
  def dedupStream(stream: DataFrame, keyCols: Seq[String], tsCol: String,
                  watermarkDelay: String): DataFrame =
    stream.withWatermark(tsCol, watermarkDelay)
      .dropDuplicates(keyCols :+ tsCol)
}
