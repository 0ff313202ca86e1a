package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import scala.collection.mutable

object ScratchTimelineJobs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val descs = mutable.ArrayBuffer.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        descs += Option(js.properties.getProperty("spark.job.description"))
          .getOrElse(js.stageInfos.headOption.map(_.name).getOrElse("?")).take(90)
      }
    })
    val ev = Tables.load(spark, "/root/testdata/sf0.1", "events")
    val ref = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    // warmup
    ops.Events.categoryDriftTimeline(ev, "event_type", "ts", ref, 604800L).collect()
    graft.core.TrackedCache.release()
    spark.catalog.clearCache()
    Thread.sleep(300); descs.clear()
    val t0 = System.nanoTime()
    ops.Events.categoryDriftTimeline(ev, "event_type", "ts", ref, 604800L).collect()
    val t1 = System.nanoTime()
    Thread.sleep(300)
    println(s"JOBS=${descs.size} wall=${(t1-t0)/1e6}ms")
    descs.zipWithIndex.foreach { case (d, i) => println(f"  job$i%02d $d") }
    spark.stop()
  }
}
