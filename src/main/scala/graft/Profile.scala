package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.Sort

/** Ad-hoc profiling main: per-query timing in 3 modes (noop write, noop
  * without the protocol-only trailing global sort, count).
  *
  * `--jobs [names…]` mode: per-query SPARK JOB COUNT + wall on the first
  * cold run after warm-up — the floor-arithmetic aid for adjudicating
  * sub-second queries (time ≈ njobs × scheduler floor), with each job's
  * description printed so a reader can see WHICH stage the schedule spends
  * its rounds on. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // mirror Bench's scan-split floor and AQE coalescing so profiled
      // schedules match what the bench actually measures
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST", (512 * 1024).toString))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "false"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_AQE_ADVISORY",
          BenchConf.advisoryFor(sfDir, cpus.toInt).toString))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val jobsMode = args.headOption.contains("--jobs")
    val rest = if (jobsMode) args.drop(1).toSeq else args.toSeq
    val names = if (rest.nonEmpty) rest
      else Seq("q26_json_funcs", "q61_memo_novel_rows", "q79_doc_fingerprint", "q74_cosine_neardup", "q71_minhash_lsh_neardup", "q01_pricing_summary")

    if (jobsMode) {
      val descs = scala.collection.mutable.ArrayBuffer.empty[String]
      // job id → (start ms, description); end time filled on JobEnd so the
      // printout carries each job's WALL time — job counts alone can't
      // separate "many cheap broadcast builds" from "few expensive actions"
      val starts = scala.collection.mutable.Map.empty[Int, (Long, String)]
      val durs = scala.collection.mutable.Map.empty[Int, Long]
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          descs.synchronized {
            val d = (Option(js.properties.getProperty("spark.job.description")).toSeq ++
              js.stageInfos.map(si => si.name.take(60) + s"[${si.numTasks}t]")).mkString(" | ").take(240)
            descs += d
            starts(js.jobId) = (js.time, d)
            ()
          }
        }
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          descs.synchronized {
            starts.get(je.jobId).foreach { case (t0, _) => durs(je.jobId) = je.time - t0 }
            ()
          }
        }
      })
      for (name <- names) {
        val fn = SparkEntry.queries(name)
        // warm-up populates persistTracked caches; those one-time jobs must
        // not count toward the steady-state schedule
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        graft.core.TrackedCache.release()
        spark.catalog.clearCache()
        Thread.sleep(300); descs.synchronized { descs.clear(); starts.clear(); durs.clear() }
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wallMs = (System.nanoTime() - t0) / 1e6
        Thread.sleep(300)
        descs.synchronized {
          println(f"[jobs] $name%-34s JOBS=${descs.size}%3d wall=$wallMs%8.1fms jobms=${durs.values.sum}")
          starts.toSeq.sortBy(_._1).foreach { case (id, (_, d)) =>
            println(f"  job$id%02d ${durs.getOrElse(id, -1L)}%6dms $d")
          }
        }
        graft.core.TrackedCache.release()
        spark.catalog.clearCache()
      }
    } else {
      for (name <- names) {
        val fn = SparkEntry.queries(name)
        def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
        val tNoop = time(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
        val df = fn(spark, sfDir)
        val unsorted = df.queryExecution.logical match {
          case Sort(_, true, child, _) =>
            new org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row](
              spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], child,
              org.apache.spark.sql.Encoders.row(df.schema))
          case _ => df
        }
        val tNoSort = time(unsorted.write.format("noop").mode("overwrite").save())
        val tAgain = time(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
        println(f"[profile] $name%-28s noop=$tNoop%6.2f  nosort=$tNoSort%6.2f  noop2=$tAgain%6.2f")
      }
    }
    spark.stop()
  }
}
