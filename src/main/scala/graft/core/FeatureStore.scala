package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.hadoop.fs.Path
import java.nio.charset.StandardCharsets

/** Versioned table store: Delta-lite over plain Parquet (the reference stores
  * features in Delta Lake via delta-rs — reference: README.md:15 — we
  * reproduce the capabilities that matter: versioned writes, time travel,
  * MERGE upsert — without delta jars).
  *
  * Layout (works on any Hadoop FS: local, HDFS, s3a):
  * {{{
  *   root/<feature>/v=N/part-*.parquet      // immutable version snapshots
  *   root/<feature>/_graft_log/N.json       // manifest per version
  * }}}
  *
  * Writers create version N+1 and only then write the manifest — readers
  * resolve the latest MANIFESTED version, so a crashed half-written dir is
  * invisible (manifest-last commit protocol). Single-writer-per-feature is
  * assumed (the reference's orchestrator serializes materializations too).
  */
final class FeatureStore(val root: String)(implicit spark: SparkSession) {

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def logDir(feature: String) = new Path(s"$root/$feature/_graft_log")
  private def versionDir(feature: String, v: Long) = s"$root/$feature/v=$v"

  /** All committed versions, ascending. */
  def versions(feature: String): Seq[Long] = {
    val dir = logDir(feature)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong).sorted.toSeq
  }

  def latestVersion(feature: String): Option[Long] = versions(feature).lastOption

  /** Write a new immutable version; returns the version number. */
  def write(df: DataFrame, feature: String, meta: Map[String, String] = Map.empty): Long = {
    val v = latestVersion(feature).map(_ + 1).getOrElse(0L)
    df.write.mode(SaveMode.Overwrite).parquet(versionDir(feature, v))
    commitManifest(feature, v, meta)
    v
  }

  private def commitManifest(feature: String, v: Long, meta: Map[String, String]): Unit = {
    val entries = (meta ++ Map(
      "version" -> v.toString,
      "committed_at" -> java.time.Instant.now().toString))
      .map { case (k, s) => s""""$k": "${s.replace("\\", "\\\\").replace("\"", "\\\"")}"""" }
    val json = entries.mkString("{", ", ", "}")
    val out = fs.create(new Path(logDir(feature), s"$v.json"), true)
    out.write(json.getBytes(StandardCharsets.UTF_8)); out.close()
  }

  /** Read the latest version (or a specific one — time travel,
    * delta-rs `version_as_of` parity). */
  def read(feature: String, asOfVersion: Option[Long] = None): DataFrame = {
    val v = asOfVersion.orElse(latestVersion(feature))
      .getOrElse(throw new IllegalArgumentException(s"feature $feature has no versions"))
    require(versions(feature).contains(v), s"feature $feature has no version $v")
    spark.read.parquet(versionDir(feature, v))
  }

  /** Read a version the caller already KNOWS is committed (e.g. the
    * version its own `write` just returned) — skips the manifest listing
    * the checked [[read]] pays per call. The caller owns the existence
    * guarantee; a wrong version fails at scan time, not analysis time. */
  private[graft] def readCommitted(feature: String, v: Long): DataFrame =
    spark.read.parquet(versionDir(feature, v))

  def readOrEmpty(feature: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    latestVersion(feature) match {
      case Some(_) => read(feature)
      case None => spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  /** MERGE upsert: rows in `updates` replace current rows with the same
    * entity key; unmatched current rows carry over (delta-rs MERGE parity).
    * Written as one anti-join + union — two keyed shuffles, no driver
    * materialization; at 100 TB this is the standard copy-on-write MERGE
    * (file-level pruning would be the next refinement). */
  def merge(feature: String, updates: DataFrame, entityKeys: Seq[String],
            meta: Map[String, String] = Map.empty): Long = {
    val merged = latestVersion(feature) match {
      case None => updates
      case Some(_) =>
        val current = read(feature)
        current.join(updates.select(entityKeys.map(org.apache.spark.sql.functions.col): _*),
            entityKeys, "left_anti")
          .unionByName(updates, allowMissingColumns = true)
    }
    write(merged, feature, meta + ("operation" -> "merge"))
  }

  // ---- append-delta path (fastlane serving) -------------------------------
  // A MERGE per micro-batch rewrites the whole table (copy-on-write): O(table)
  // per batch — unacceptable for single-row serving. Deltas make the write
  // O(batch): each batch lands in its own sequence dir under the CURRENT base
  // version; readers overlay deltas onto the base with last-write-wins per
  // entity; compact() folds everything into the next full version.

  private def deltaRoot(feature: String, base: Long) = new Path(s"$root/$feature/_deltas/$base")

  private def deltaSeqs(feature: String, base: Long): Seq[Long] = {
    val dir = deltaRoot(feature, base)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName.toLong).sorted.toSeq
  }

  /** O(batch) upsert: append `rows` as the next delta of the current base
    * version. Returns the delta sequence number. */
  def appendDelta(feature: String, rows: DataFrame): Long = {
    val base = latestVersion(feature)
      .getOrElse(throw new IllegalArgumentException(s"feature $feature has no base version to delta"))
    val seq = deltaSeqs(feature, base).lastOption.map(_ + 1).getOrElse(0L)
    rows.write.mode(SaveMode.ErrorIfExists).parquet(s"${deltaRoot(feature, base)}/$seq")
    seq
  }

  /** Current state = latest base version overlaid with its deltas,
    * last-write-wins per entity key (later delta seq beats earlier; any
    * delta beats base). One keyed window — no table rewrite on read. */
  def readCurrent(feature: String, entityKeys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = latestVersion(feature)
      .getOrElse(throw new IllegalArgumentException(s"feature $feature has no versions"))
    val seqs = deltaSeqs(feature, base)
    if (seqs.isEmpty) return read(feature)
    val baseDf = read(feature).withColumn("__delta_seq", lit(-1L))
    val deltas = seqs.map(s0 =>
      spark.read.parquet(s"${deltaRoot(feature, base)}/$s0").withColumn("__delta_seq", lit(s0)))
    val all = deltas.foldLeft(baseDf)(_.unionByName(_))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(entityKeys.map(col): _*).orderBy(col("__delta_seq").desc)
    all.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn", "__delta_seq")
  }

  /** Fold base + deltas into the next full version and clear the deltas. */
  def compact(feature: String, entityKeys: Seq[String],
              meta: Map[String, String] = Map.empty): Long = {
    val base = latestVersion(feature)
      .getOrElse(throw new IllegalArgumentException(s"feature $feature has no versions"))
    val v = write(readCurrent(feature, entityKeys), feature, meta + ("operation" -> "compact"))
    fs.delete(deltaRoot(feature, base), true)
    v
  }

  /** Drop all but the newest `keepLast` versions: delete version dirs FIRST,
    * manifests LAST (mirror of the manifest-last commit — a crashed vacuum
    * leaves dangling manifests pointing at deleted dirs, so readers of old
    * versions fail loudly rather than read partial data; latest is never
    * touched). Bounds storage growth of the copy-on-write MERGE at scale. */
  def vacuum(feature: String, keepLast: Int = 1): Seq[Long] = {
    require(keepLast >= 1)
    val old = versions(feature).dropRight(keepLast)
    old.foreach { v =>
      fs.delete(new Path(versionDir(feature, v)), true)
      fs.delete(new Path(logDir(feature), s"$v.json"), false)
    }
    old
  }

  /** Manifest JSON (raw) for audit / registry display. */
  def manifest(feature: String, v: Long): String = {
    val in = fs.open(new Path(logDir(feature), s"$v.json"))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }
}
