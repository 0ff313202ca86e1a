package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Evt(user_id: Long, ts: java.sql.Timestamp, value: Double)

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("watermarked tumbling window aggregation over a stream") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Evt]
    val out = StreamOps.windowedAgg(mem.toDF(), "ts", "1 hour", "2 hours")(
      (col("user_id"), Seq(count(lit(1)).as("n"), sum("value").as("sv"))))
      .select(col("window.start").as("ws"), col("user_id"), col("n"), col("sv"))
    val q = out.writeStream.format("memory").queryName("win_agg").outputMode("update").start()
    mem.addData(
      Evt(1, ts("2024-01-01 10:05:00"), 1.0),
      Evt(1, ts("2024-01-01 10:55:00"), 2.0),
      Evt(1, ts("2024-01-01 11:05:00"), 4.0),
      Evt(2, ts("2024-01-01 10:10:00"), 8.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM win_agg")
      .as[(java.sql.Timestamp, Long, Long, Double)].collect().toSet
    assert(rows == Set(
      (ts("2024-01-01 10:00:00"), 1L, 2L, 3.0),
      (ts("2024-01-01 11:00:00"), 1L, 1L, 4.0),
      (ts("2024-01-01 10:00:00"), 2L, 1L, 8.0)))
    q.stop()
  }

  test("sliding window aggregation: events land in every overlapping window") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Evt]
    val out = StreamOps.windowedAgg(mem.toDF(), "ts", "1 hour", "2 hours",
        slide = Some("30 minutes"))(
      (col("user_id"), Seq(count(lit(1)).as("n"), sum("value").as("sv"))))
      .select(col("window.start").as("ws"), col("user_id"), col("n"), col("sv"))
    val q = out.writeStream.format("memory").queryName("slide_agg")
      .outputMode("update").start()
    mem.addData(
      Evt(1, ts("2024-01-01 10:05:00"), 1.0),  // windows 09:30 and 10:00
      Evt(1, ts("2024-01-01 10:40:00"), 2.0))  // windows 10:00 and 10:30
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM slide_agg")
      .as[(java.sql.Timestamp, Long, Long, Double)].collect().toSet
    assert(rows == Set(
      (ts("2024-01-01 09:30:00"), 1L, 1L, 1.0),
      (ts("2024-01-01 10:00:00"), 1L, 2L, 3.0),
      (ts("2024-01-01 10:30:00"), 1L, 1L, 2.0)))
    q.stop()
  }

  test("heavyHittersStream: sketch state merges across micro-batches; bound holds over the whole stream") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    val out = StreamOps.heavyHittersStream(mem.toDF().toDF("token"), "token", k = 5)
    val q = out.writeStream.format("memory").queryName("hh_stream")
      .outputMode("complete").start()
    // batch 1: "hot" dominates; batch 2: "warm" surges + singleton noise —
    // the guarantee must hold over the UNION, not per batch
    mem.addData(Seq.fill(60)("hot") ++ (1 to 30).map(i => s"n1_$i"): _*)
    q.processAllAvailable()
    mem.addData(Seq.fill(50)("warm") ++ Seq.fill(20)("hot") ++ (1 to 40).map(i => s"n2_$i"): _*)
    q.processAllAvailable()
    val row = spark.sql("SELECT n_total, items FROM hh_stream").collect().head
    val n = row.getLong(0)
    assert(n == 200, s"stream length $n")
    val items = row.getSeq[Row](1).map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(items.size <= 5)
    val exact = Map("hot" -> 80L, "warm" -> 50L)
    // every item with true count > n/(k+1) = 33.3 must be present, est bounded
    exact.foreach { case (tok, truth) =>
      val est = items.getOrElse(tok, fail(s"heavy hitter $tok missing: $items"))
      assert(est <= truth && truth - est <= n / 6 + 1, s"$tok est $est vs $truth")
    }
    q.stop()
  }

  test("latestPerKey keeps one state row per key and emits the running latest") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Evt]
    val out = StreamOps.latestPerKey(mem.toDF(), "user_id", "ts")
    val q = out.writeStream.format("memory").queryName("latest").outputMode("update").start()
    mem.addData(Evt(1, ts("2024-01-01 10:00:00"), 1.0), Evt(1, ts("2024-01-01 11:00:00"), 2.0))
    q.processAllAvailable()
    // batch 2: an OLDER event arrives late — latest must not regress
    mem.addData(Evt(1, ts("2024-01-01 10:30:00"), 9.9))
    q.processAllAvailable()
    val vals = spark.sql("SELECT value FROM latest").as[Double].collect()
    assert(vals.last == 2.0, s"latest regressed: ${vals.toSeq}")
    q.stop()
  }

  test("streaming dedup drops replays") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Evt]
    val out = StreamOps.dedupStream(mem.toDF(), Seq("user_id"), "ts", "1 hour")
    val q = out.writeStream.format("memory").queryName("dedup").outputMode("append").start()
    mem.addData(Evt(1, ts("2024-01-01 10:00:00"), 1.0))
    q.processAllAvailable()
    mem.addData(Evt(1, ts("2024-01-01 10:00:00"), 1.0), // exact replay
      Evt(2, ts("2024-01-01 10:00:00"), 2.0))
    q.processAllAvailable()
    assert(spark.sql("SELECT * FROM dedup").count() == 2)
    q.stop()
  }

  test("stream-stream join: views join purchases within the watermark window") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions._
    val views = MemoryStream[Evt]
    val buys = MemoryStream[Evt]
    val joined = StreamOps.intervalJoinStreams(
      views.toDF(), buys.toDF(), "user_id", "ts", "ts",
      watermarkDelay = "1 hour", within = "30 MINUTES")
    val q = joined.writeStream.format("memory").queryName("ssj").outputMode("append").start()
    views.addData(Evt(1, ts("2024-01-01 10:00:00"), 1.0), Evt(2, ts("2024-01-01 10:00:00"), 2.0))
    buys.addData(Evt(1, ts("2024-01-01 10:20:00"), 10.0), // within 30m of view
      Evt(2, ts("2024-01-01 11:30:00"), 20.0))            // outside the window
    q.processAllAvailable()
    val rows = spark.sql("SELECT user_id, value_r FROM ssj").as[(Long, Double)].collect().toSet
    assert(rows == Set((1L, 10.0)))
    q.stop()
  }

  test("stream-stream LEFT OUTER interval join emits unmatched left rows after the horizon") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions._
    val views = MemoryStream[Evt]
    val buys = MemoryStream[Evt]
    val joined = StreamOps.intervalJoinStreams(
      views.toDF(), buys.toDF(), "user_id", "ts", "ts",
      watermarkDelay = "10 minutes", within = "30 MINUTES", joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssjlo").outputMode("append").start()
    views.addData(Evt(1, ts("2024-01-01 10:00:00"), 1.0),  // will match
      Evt(2, ts("2024-01-01 10:00:00"), 2.0))              // never matches
    buys.addData(Evt(1, ts("2024-01-01 10:05:00"), 10.0))
    q.processAllAvailable()
    // advance both watermarks far past view 2's join horizon so its
    // unmatched row flushes as (user 2, NULL right side)
    views.addData(Evt(9, ts("2024-01-01 13:00:00"), 0.0))
    buys.addData(Evt(9, ts("2024-01-01 13:00:01"), 0.0))
    q.processAllAvailable()
    views.addData(Evt(9, ts("2024-01-01 14:00:00"), 0.0))
    buys.addData(Evt(9, ts("2024-01-01 14:00:01"), 0.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT user_id, value_r FROM ssjlo WHERE user_id IN (1, 2)")
      .as[(Long, Option[Double])].collect().toSet
    assert(rows == Set((1L, Some(10.0)), (2L, None)))
    q.stop()
  }

  test("StreamSource shim: the SAME windowed-agg pipeline runs off a file source and a rate source") {
    import org.apache.spark.sql.functions._
    // the pipeline, written once against a descriptor-opened stream
    def pipeline(stream: org.apache.spark.sql.DataFrame, name: String) = {
      val q = StreamOps.windowedAgg(stream, "ts", "1 hour", "2 hours")(
        (col("user_id"), Seq(count(lit(1)).as("n"), sum("value").as("sv"))))
        .select(col("window.start").as("ws"), col("user_id"), col("n"), col("sv"))
        .writeStream.format("memory").queryName(name).outputMode("update").start()
      q.processAllAvailable(); q
    }
    // FILE source via the shim
    val dir = tmpDir("stream_src")
    Seq(Evt(1, ts("2024-01-01 10:05:00"), 1.0), Evt(1, ts("2024-01-01 10:55:00"), 2.0),
      Evt(2, ts("2024-01-01 10:10:00"), 8.0))
      .toDF().coalesce(1).write.mode("overwrite").json(dir)
    val fileStream = StreamOps.source(spark, StreamOps.StreamSource.file(
      "json", dir, org.apache.spark.sql.Encoders.product[Evt].schema))
    val qf = pipeline(fileStream, "src_file")
    val fromFile = spark.sql("SELECT user_id, n, sv FROM src_file")
      .as[(Long, Long, Double)].collect().toSet
    assert(fromFile == Set((1L, 2L, 3.0), (2L, 1L, 8.0)), fromFile)
    qf.stop()
    // RATE source via the SAME entry point: rename rate's columns into the
    // pipeline's schema — nothing else about the pipeline changes
    val rateStream = StreamOps.source(spark, StreamOps.StreamSource.rate(500))
      .select(col("value").as("user_id"), col("timestamp").as("ts"),
        col("value").cast("double").as("value"))
    val qr = pipeline(rateStream, "src_rate")
    Thread.sleep(1500); qr.processAllAvailable()
    assert(spark.sql("SELECT * FROM src_rate").count() > 0, "rate source produced no rows")
    qr.stop()
    // KAFKA descriptor: the env has no connector jar, so assert the surface —
    // standard option keys, bound through the same entry point
    val k = StreamOps.StreamSource.kafka("broker:9092", "features")
    assert(k.format == "kafka" &&
      k.options("kafka.bootstrap.servers") == "broker:9092" &&
      k.options("subscribe") == "features" &&
      k.options("startingOffsets") == "earliest")
  }
}
