package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Run/metadata registry (reference: Postgres + sqlmodel catalog,
  * README.md:16, projects/feray/pyproject.toml:27; materialization reports
  * with data_version + metrics, defs/ray/ray_external.py:10-15,
  * defs/ray/ray_integration.py:36-41).
  *
  * Backed by an append-only parquet table so it needs no database in this
  * environment; the same [[RunReport]] rows would go to Postgres via
  * `df.write.jdbc` where a JDBC driver is present (config swap, no code
  * change upstream of the sink).
  */
final case class RunReport(
    feature: String,
    runId: String,
    codeVersion: String,
    dataVersion: String,
    fingerprint: String,
    storeVersion: Long,
    nRows: Long,
    nNovel: Long,
    memoHit: Boolean,
    status: String,
    startedAt: java.sql.Timestamp,
    finishedAt: java.sql.Timestamp,
    checkFailures: Seq[String])

class Registry(val root: String)(implicit spark: SparkSession) {
  import spark.implicits._

  private val path = s"$root/_graft_registry"

  def record(r: RunReport): Unit =
    Seq(r).toDF().write.mode(SaveMode.Append).parquet(path)

  def runs(feature: Option[String] = None): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path)))
      return Seq.empty[RunReport].toDF()
    val df = spark.read.parquet(path)
    feature.map(f => df.filter($"feature" === f)).getOrElse(df)
  }

  /** Latest successful run per feature (for fingerprint short-circuit). */
  def latestRun(feature: String): Option[RunReport] = {
    val rows = runs(Some(feature)).filter($"status" === "ok")
      .orderBy($"finishedAt".desc).limit(1).as[RunReport].collect()
    rows.headOption
  }
}

/** JDBC-backed registry: the literal Postgres-catalog shape of the reference
  * (README.md:16) — same [[RunReport]] rows through `df.write.jdbc`. Works
  * against any JDBC database; tests use embedded Derby. `checkFailures` is
  * flattened to one string column (JDBC has no array type portably). */
class JdbcRegistry(url: String, table: String, props: java.util.Properties)
                  (implicit spark: SparkSession) extends Registry(root = "") {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  override def record(r: RunReport): Unit =
    Seq(r).toDF()
      .withColumn("checkFailures", concat_ws("; ", col("checkFailures")))
      .write.mode(SaveMode.Append)
      // VARCHAR, not the CLOB default: filters push down as string
      // comparisons, and Derby can't compare CLOBs
      .option("createTableColumnTypes",
        "feature VARCHAR(256), runId VARCHAR(64), codeVersion VARCHAR(128), " +
        "dataVersion VARCHAR(128), fingerprint VARCHAR(64), status VARCHAR(32), " +
        "checkFailures VARCHAR(4096)")
      .jdbc(url, table, props)

  override def runs(feature: Option[String] = None): DataFrame = {
    val df =
      try spark.read.jdbc(url, table, props)
        .withColumn("checkFailures",
          when(col("checkFailures") === "", array().cast("array<string>"))
            .otherwise(split(col("checkFailures"), "; ")))
      catch { case _: Exception => return Seq.empty[RunReport].toDF() } // table not created yet
    feature.map(f => df.filter(col("feature") === f)).getOrElse(df)
  }
}
