package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.Sort

/** Ad-hoc profiling main: per-query timing in 3 modes (noop write, noop
  * without the protocol-only trailing global sort, count). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val names = if (args.nonEmpty) args.toSeq
      else Seq("q26_json_funcs", "q61_memo_novel_rows", "q79_doc_fingerprint", "q74_cosine_neardup", "q71_minhash_lsh_neardup", "q01_pricing_summary")
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
    spark.stop()
  }
}
