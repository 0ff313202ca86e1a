package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated fixture tables (TESTDATA.md).
  *
  * One parquet file per table under `dir` (e.g. /root/testdata/sf0.01).
  * The reference delegates scans to Ibis/Polars/delta-rs
  * (reference: projects/feray/pyproject.toml:24-25, README.md:15); here the
  * scan is Spark's vectorized parquet reader with pushdown + pruning built in.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    // rejects; read the raw int64 and truncate ns -> us (matches DuckDB's
    // TIMESTAMP conversion, which also truncates).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.schema("ts").dataType match {
        // integer division: ts is ~1.7e18 ns, beyond double's exact range
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
        // regenerated fixtures (Sf1Gen) already carry TIMESTAMP(MICROS)
        case _ => df
      }
    else df
  }

  /** Register all fixture tables as temp views (for spark.sql entry points). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
