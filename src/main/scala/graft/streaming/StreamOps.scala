package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming operators for the fastlane/serving path (reference design:
  * README.md:47-55). Everything here is schema-generic (works on any
  * DataFrame) so batch pipelines lift to streams unchanged.
  */
object StreamOps {

  /** Declarative stream-source descriptor: which `readStream` format to use
    * and its options. Pipelines written against [[source]] are one CONFIG
    * swap away from any connector — the same windowed-agg/fastlane code runs
    * off files in a test, the rate source in a soak, and Kafka in production.
    * (This build environment ships no Kafka connector jar, so the [[kafka]]
    * descriptor can't be STARTED here; the descriptor carries the standard
    * option keys (`kafka.bootstrap.servers`/`subscribe`/`startingOffsets`)
    * so it binds as soon as the jar is on the classpath.) */
  final case class StreamSource(
      format: String,
      options: Map[String, String] = Map.empty,
      path: Option[String] = None,
      schema: Option[org.apache.spark.sql.types.StructType] = None)

  object StreamSource {
    /** File-based source (json/csv/parquet dir); streaming file sources
      * require an explicit schema. */
    def file(format: String, dir: String,
             schema: org.apache.spark.sql.types.StructType,
             options: Map[String, String] = Map.empty): StreamSource =
      StreamSource(format, options, Some(dir), Some(schema))
    /** Built-in rate source (soak/throughput testing). */
    def rate(rowsPerSecond: Int): StreamSource =
      StreamSource("rate", Map("rowsPerSecond" -> rowsPerSecond.toString))
    /** Kafka topic subscription (needs the spark-sql-kafka connector jar). */
    def kafka(bootstrapServers: String, topic: String,
              startingOffsets: String = "earliest"): StreamSource =
      StreamSource("kafka", Map(
        "kafka.bootstrap.servers" -> bootstrapServers,
        "subscribe" -> topic,
        "startingOffsets" -> startingOffsets))
  }

  /** Open a streaming DataFrame from a descriptor — the single entry point
    * every pipeline should read through (see [[StreamSource]]). */
  def source(spark: org.apache.spark.sql.SparkSession, src: StreamSource): DataFrame = {
    val reader = spark.readStream.format(src.format).options(src.options)
    src.schema.foreach(reader.schema)
    src.path.map(reader.load).getOrElse(reader.load())
  }

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

  /** Continuously-updated heavy hitters over an unbounded stream: the
    * Misra–Gries aggregate [[graft.expressions.FreqItemsAgg]] as a streaming
    * global aggregation — Structured Streaming keeps the sketch buffer (≤ k
    * counters + the stream length, a few KB) as the query state and merges
    * each micro-batch's partials into it, so state size is CONSTANT in
    * stream length and cardinality where an exact token-count aggregation's
    * state grows with the vocabulary. The deterministic
    * `est ≤ true ≤ est + n/(k+1)` bound holds over everything ingested so
    * far (the merge is order-insensitive). Emit with
    * `outputMode("complete")`; output is one row: (n_total, items). */
  def heavyHittersStream(stream: DataFrame, itemCol: String, k: Int): DataFrame =
    stream.groupBy().agg(graft.ops.Stats.freqItemsAgg(itemCol, k).as("__s"))
      .select(col("__s.n").as("n_total"), col("__s.items").as("items"))

  /** Stream-stream equi-join with an event-time range bound — the
    * Structured Streaming two-stream join (clicks-to-impressions, features-
    * to-labels): rows join when keys match AND the right event falls inside
    * `[left.ts, left.ts + within]`. BOTH sides carry watermarks and the
    * time-range predicate, which is what lets Spark expire join state — an
    * unconstrained stream-stream join's state grows with the whole stream,
    * the one unbounded-memory shape a 100 TB/day pipeline cannot ship.
    * Inner joins emit as matches arrive; `left_outer` additionally emits
    * unmatched left rows once their watermark horizon passes. Right-side
    * columns are suffixed `suffix` so the two event schemas can share
    * names. */
  def intervalJoinStreams(left: DataFrame, right: DataFrame,
                          keyCol: String, leftTsCol: String, rightTsCol: String,
                          watermarkDelay: String, within: String,
                          joinType: String = "inner",
                          suffix: String = "_r"): DataFrame = {
    require(Seq("inner", "left_outer").contains(joinType),
      s"joinType must be inner or left_outer, got $joinType")
    val l = left.withWatermark(leftTsCol, watermarkDelay)
    val r0 = right.withWatermark(rightTsCol, watermarkDelay)
    val r = r0.columns.foldLeft(r0)((d, c) => d.withColumnRenamed(c, c + suffix))
    l.join(r,
      col(keyCol) === col(keyCol + suffix) &&
        col(rightTsCol + suffix) >= col(leftTsCol) &&
        col(rightTsCol + suffix) <= col(leftTsCol) + expr(s"INTERVAL $within"),
      joinType)
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
