package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fastlane serving-latency measurement (reference promise: low-latency
  * single-row serving — reference: README.md:47-50). Reports warm-session
  * [[graft.streaming.Fastlane.serveOnce]] wall latency (transform + store
  * MERGE included) as p50/p95/p99 over `calls` single-row invocations, next
  * to the full batch-lane cost (PipelineRunner.run: fingerprint, memo
  * anti-join, checks, report, store write) on the same one-row frame — the
  * gap between the two is what the fastlane exists to avoid.
  *
  * Usage: runMain graft.ServeLatency [calls]  (default 100)
  * Prints one JSON line {"metric":"serve_latency", ...}.
  */
object ServeLatency {
  def main(args: Array[String]): Unit = {
    val calls = args.headOption.map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files.createTempDirectory("graft_servelat").toString
    val store = new core.FeatureStore(root)
    val registry = new core.Registry(root)
    val feature = core.FeatureDef(
      name = "user_value_sum",
      entityKeys = Seq("user_id"),
      codeVersion = "v1",
      transform = df => df.groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("value").cast("double").as("sum_value")))

    // seed the store so every measured call is a MERGE into an existing
    // table (the serving steady state), not a bootstrap write
    val seed = (1L to 1000L).map(i => (i, i * 1.5)).toDF("user_id", "value")
    store.write(core.Versioning.withSystemColumns(feature.transform(seed), feature),
      feature.name, Map("mode" -> "seed"))

    def oneRow(i: Long) = Seq((i, i * 2.0)).toDF("user_id", "value")

    // warm-up: codegen, parquet committer, Derby — not billed
    (1 to 5).foreach(i => streaming.Fastlane.serveOnce(feature, oneRow(9000000L + i), store)(spark))

    val lat = (1 to calls).map { i =>
      val t0 = System.nanoTime()
      streaming.Fastlane.serveOnce(feature, oneRow(1000000L + i), store)(spark)
      (System.nanoTime() - t0) / 1e6 // ms
    }.sorted
    def pct(p: Double) = lat((p * (lat.size - 1)).round.toInt)

    // warm serving session: version tracked in-session, fused one-action
    // merge, AQE pinned off — the COW route minus its per-call fixed costs
    val session = new streaming.Fastlane.ServingSession(feature, store)
    (1 to 5).foreach(i => session.serve(oneRow(9500000L + i)))
    val sess = (1 to calls).map { i =>
      val t0 = System.nanoTime()
      session.serve(oneRow(7000000L + i))
      (System.nanoTime() - t0) / 1e6
    }.sorted

    // file-level serving merge ([[streaming.Fastlane.serveOnceBucketed]]):
    // rewrites only the served key's bucket (1/numBuckets of the table) —
    // the merge whose latency is independent of table size
    val bstore = new core.BucketedStore(s"$root/bucketed", numBuckets = 64)
    streaming.Fastlane.serveOnceBucketed(feature, seed, bstore) // bootstrap
    (1 to 5).foreach(i =>
      streaming.Fastlane.serveOnceBucketed(feature, oneRow(8000000L + i), bstore))
    val bucketed = (1 to calls).map { i =>
      val t0 = System.nanoTime()
      streaming.Fastlane.serveOnceBucketed(feature, oneRow(4000000L + i), bstore)
      (System.nanoTime() - t0) / 1e6
    }.sorted

    // the O(batch) delta-append serving write ([[streaming.Fastlane
    // .serveAppend]]'s per-batch path): no table rewrite, no merge read —
    // the lowest-latency write the store offers
    val append = (1 to calls).map { i =>
      val out = core.Versioning.withSystemColumns(
        feature.transform(oneRow(3000000L + i)), feature)
      val t0 = System.nanoTime()
      store.appendDelta(feature.name, out)
      (System.nanoTime() - t0) / 1e6
    }.sorted

    // batch lane on the SAME one-row frame: full run machinery + store write
    val batch = (1 to 10).map { i =>
      val t0 = System.nanoTime()
      core.PipelineRunner.run(feature, oneRow(2000000L + i), store, registry)
      (System.nanoTime() - t0) / 1e6
    }.sorted

    def fmt(v: Double) = "%.1f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"metric":"serve_latency","calls":$calls,"p50_ms":${fmt(pct(0.5))},"p95_ms":${fmt(pct(0.95))},"p99_ms":${fmt(pct(0.99))},"session_p50_ms":${fmt(sess(sess.size / 2))},"session_p95_ms":${fmt(sess((0.95 * (sess.size - 1)).round.toInt))},"bucketed_p50_ms":${fmt(bucketed(bucketed.size / 2))},"bucketed_p95_ms":${fmt(bucketed((0.95 * (bucketed.size - 1)).round.toInt))},"append_p50_ms":${fmt(append(append.size / 2))},"append_p95_ms":${fmt(append((0.95 * (append.size - 1)).round.toInt))},"batch_p50_ms":${fmt(batch(batch.size / 2))},"batch_min_ms":${fmt(batch.head)}}""")

    // the crossover the bucketed route exists for: at a LARGE stored table,
    // the copy-on-write merge rewrites every row per call (O(table)) while
    // the file-level merge rewrites 1/numBuckets — per-call wall should
    // separate by ~table size / bucket size here and keep separating as the
    // table grows
    val bigN = sys.env.getOrElse("SPARK_GRAFT_SERVE_BIG_N", "500000").toLong
    val big = spark.range(1L, bigN + 1).select(col("id").as("user_id"),
      (col("id") * 1.5).as("value"))
    val root2 = java.nio.file.Files.createTempDirectory("graft_servelat_big").toString
    val flatBig = new core.FeatureStore(root2)
    val buckBig = new core.BucketedStore(s"$root2/bucketed", numBuckets = 64)
    streaming.Fastlane.serveOnce(feature, big, flatBig)
    streaming.Fastlane.serveOnceBucketed(feature, big, buckBig)
    val flatLarge = (1 to 5).map { i =>
      val t0 = System.nanoTime()
      streaming.Fastlane.serveOnce(feature, oneRow(5000000L + i), flatBig)
      (System.nanoTime() - t0) / 1e6
    }.sorted
    val buckLarge = (1 to 15).map { i =>
      val t0 = System.nanoTime()
      streaming.Fastlane.serveOnceBucketed(feature, oneRow(6000000L + i), buckBig)
      (System.nanoTime() - t0) / 1e6
    }.sorted
    println(s"""{"metric":"serve_latency_large_table","rows":$bigN,"flat_merge_p50_ms":${fmt(flatLarge(flatLarge.size / 2))},"bucketed_merge_p50_ms":${fmt(buckLarge(buckLarge.size / 2))}}""")
    spark.stop()
  }
}
