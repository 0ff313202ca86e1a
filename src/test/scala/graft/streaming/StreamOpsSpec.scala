package graft.streaming

import graft.SparkSpec
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
}
