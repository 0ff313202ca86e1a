package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path
import java.nio.charset.StandardCharsets

/** Bucketed versioned store with FILE-LEVEL incremental MERGE — the
  * Delta-grade upgrade over [[FeatureStore]]'s copy-on-write (SURVEY §4
  * marks data-skipping/file-level ops as the deferred CUSTOM piece).
  *
  * Layout:
  * {{{
  *   root/<feature>/b=K/v<N>.parquet        // one file per (bucket, write)
  *   root/<feature>/_graft_log/N.json       // manifest: bucket -> file
  * }}}
  *
  * Rows are routed to `numBuckets` stable hash-buckets of the entity key.
  * A MERGE reads ONLY the buckets that updates touch, rewrites those as new
  * files, and the new version's manifest references the untouched buckets'
  * EXISTING files — at 100 TB a point-update of one entity rewrites
  * 1/numBuckets of the table instead of all of it, and time travel is free
  * (old manifests still reference the old files; nothing is overwritten).
  * Bucket routing also means a key-equi join against another table bucketed
  * the same way needs no shuffle of this side.
  */
final class BucketedStore(val root: String, val numBuckets: Int = 64,
                          val deltaCheckpointEvery: Int = 10)
                         (implicit spark: SparkSession) {
  require(numBuckets > 0)
  require(deltaCheckpointEvery > 0)

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def logDir(feature: String) = new Path(s"$root/$feature/_graft_log")

  private def bucketCol(entityKeys: Seq[String]) =
    pmod(xxhash64(entityKeys.map(col): _*), lit(numBuckets)).cast("int")

  /** Lowest version whose data files [[vacuum]] guaranteed to retain; reads
    * of versions below this fail loudly (their files were reclaimed). */
  def vacuumHorizon(feature: String): Option[Long] =
    readSmall(new Path(logDir(feature), "_vacuum_horizon")).map(_.trim.toLong)

  /** Resolve the version a read targets, failing with a store-level error —
    * naming the retention horizon — when it points below [[vacuum]]'s
    * reclaim line (instead of a generic parquet file-not-found later). */
  private def resolveVersion(feature: String, asOfVersion: Option[Long]): Long = {
    val v = asOfVersion.orElse(latestVersion(feature))
      .getOrElse(throw new IllegalArgumentException(s"feature $feature has no versions"))
    vacuumHorizon(feature).foreach { h =>
      if (v < h) throw new IllegalStateException(
        s"feature $feature version $v is below the vacuum horizon $h: its data " +
          s"files were reclaimed; earliest time-travelable version is $h")
    }
    v
  }

  def versions(feature: String): Seq[Long] = {
    val dir = logDir(feature)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong).sorted.toSeq
  }

  def latestVersion(feature: String): Option[Long] = versions(feature).lastOption

  // ---- atomic cross-table cursors -----------------------------------------
  // A multi-table writer (e.g. the BM25 postings/termdf/stats trio) has no
  // cross-table transaction in this store; these publish a tiny driver-side
  // record of "the versions that belong together" ATOMICALLY, so readers pin
  // a consistent snapshot instead of inferring one from latest-version
  // stability. Append-only numbered slots; a slot is CLAIMED first with an
  // exclusive-create lock file (rename alone is NOT a safe claim: local-FS
  // rename silently OVERWRITES an existing destination, so two racing
  // writers would both "succeed" and one committed record would vanish),
  // then the fully-written temp file renames into the claimed slot.
  // ATOMICITY SCOPE of the claim: create(overwrite = false) is atomic on
  // HDFS and POSIX-backed filesystems; Hadoop's LocalFileSystem (and S3A)
  // implement it as exists-check-then-create, so under those two racing
  // writers CAN both claim a slot. The temp file is therefore
  // WRITER-UNIQUE ($v.tmp.$nonce) — in the worst local-FS race the slot
  // holds one writer's COMPLETE record (last rename wins whole), never an
  // interleaving of two writers sharing one temp path. The single-writer
  // cadence makes that race a crash-recovery edge, not a steady state.
  // Readers take the highest numbered slot and never see a missing or
  // half-written record.

  /** Atomically publish a small text cursor under `root/_cursor/<name>/`.
    * Bounded retry under contention (the single-writer cadence makes a
    * race a crash-recovery edge, not a steady state); fails loudly after
    * 16 contended slots rather than recursing unboundedly. */
  def writeCursor(name: String, txt: String): Unit = {
    val dir = new Path(s"$root/_cursor/$name")
    fs.mkdirs(dir)
    val base = cursorVersions(dir).lastOption.map(_ + 1).getOrElse(0L)
    var tries = 0
    while (tries < 16) {
      // skip PAST a contended slot rather than re-trying it: a writer that
      // crashed between claim and rename leaves an orphaned lock on v, and
      // re-trying v forever would wedge the cursor — readers tolerate
      // numbering gaps (they take the highest COMPLETED slot)
      val v = base + tries
      val lock = new Path(dir, s"$v.lock")
      val claimed =
        try { fs.create(lock, false).close(); true }
        catch { case _: java.io.IOException => false }
      if (claimed) {
        // writer-unique temp: if the local-FS non-atomic create let two
        // writers claim this slot, their temp writes must not collide
        val tmp = new Path(dir, s"$v.tmp.${java.util.UUID.randomUUID()}")
        writeSmall(tmp, txt)
        if (!fs.rename(tmp, new Path(dir, v.toString)))
          throw new IllegalStateException(
            s"writeCursor: rename into claimed slot $v failed under $dir")
        fs.delete(lock, false)
        return
      }
      tries += 1
    }
    throw new IllegalStateException(
      s"writeCursor: could not claim a slot under $dir after 16 attempts — " +
        "too many concurrent writers for the single-writer cursor contract")
  }

  /** Reap crash debris under `_cursor/`: a writer that dies between its
    * slot claim and the rename leaves `<v>.lock` (and possibly its
    * writer-unique `<v>.tmp.<nonce>`) behind forever. [[writeCursor]]
    * already SKIPS such slots (readers tolerate numbering gaps), so the
    * debris is harmless to correctness — this bounds its accumulation.
    * Only files older than `olderThanMs` go: a LIVE claim is held for
    * milliseconds, so the default one-hour horizon cannot touch it.
    * Runs as part of [[vacuum]] so the standing maintenance cadence
    * reaps cursor debris for free. Returns the deleted relative paths. */
  def reapCursorLocks(olderThanMs: Long = 3600 * 1000L): Seq[String] = {
    val cursorRoot = new Path(s"$root/_cursor")
    if (!fs.exists(cursorRoot)) return Seq.empty
    val horizon = System.currentTimeMillis() - olderThanMs
    fs.listStatus(cursorRoot).toSeq.filter(_.isDirectory).flatMap { d =>
      fs.listStatus(d.getPath).toSeq
        .filter { s =>
          val nm = s.getPath.getName
          // ".tmp" (no nonce) catches debris from pre-r15 writers
          (nm.endsWith(".lock") || nm.contains(".tmp.") || nm.endsWith(".tmp")) &&
            s.getModificationTime < horizon
        }
        .flatMap { s =>
          // only report what was ACTUALLY removed — a failed delete (e.g. a
          // permission issue on a shared store) must not read as reaped
          if (fs.delete(s.getPath, false))
            Some(s"_cursor/${d.getPath.getName}/${s.getPath.getName}")
          else None
        }
    }
  }

  /** Latest published cursor value, None when never published. */
  def readCursor(name: String): Option[String] = {
    val dir = new Path(s"$root/_cursor/$name")
    cursorVersions(dir).lastOption.flatMap(v => readSmall(new Path(dir, v.toString)))
  }

  private def cursorVersions(dir: Path): Seq[Long] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName).filter(_.forall(_.isDigit))
      .map(_.toLong).sorted.toSeq

  /** manifest = bucket id -> relative file dirs. One dir per bucket after a
    * full write/merge; [[appendBucketed]] adds dirs (";"-joined in the JSON
    * — the separator can't occur in the `files_vN/__b=K` paths the store
    * generates) and [[compactBuckets]] folds them back to one.
    *
    * Cached per (root, feature, version) in the JVM-wide
    * [[BucketedStore.manifestCache]] — sound because a version's manifest
    * is IMMUTABLE once committed (see the invalidation contract on the
    * companion object). */
  private def readManifest(feature: String, v: Long): Map[Int, Seq[String]] =
    BucketedStore.manifestCache.getOrElseUpdate((root, feature, v), {
      val in = fs.open(new Path(logDir(feature), s"$v.json"))
      val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      // minimal parser for {"<bucket>": "<path>[;<path>...]", ...}
      "\"([0-9]+)\"\\s*:\\s*\"([^\"]+)\"".r.findAllMatchIn(json)
        .map(m => m.group(1).toInt -> m.group(2).split(';').toSeq).toMap
    })

  private def writeManifest(feature: String, v: Long, manifest: Map[Int, Seq[String]]): Unit = {
    val json = manifest.toSeq.sortBy(_._1)
      .map { case (b, ps) => s""""$b": "${ps.mkString(";")}"""" }.mkString("{", ", ", "}")
    val out = fs.create(new Path(logDir(feature), s"$v.json"), true)
    out.write(json.getBytes(StandardCharsets.UTF_8)); out.close()
    // committing v through THIS JVM refreshes every cache entry the new
    // version touches — covers the root-recreated-in-place edge (a fresh
    // store at a previously-used root restarts at v=0 and overwrites any
    // stale entries as it commits)
    BucketedStore.manifestCache.put((root, feature, v), manifest)
    BucketedStore.statsCache.remove((root, feature, v))
    BucketedStore.mergedSchemaCache.keySet
      .filter(k => k._1 == root && k._2 == feature && k._3 == v)
      .foreach(BucketedStore.mergedSchemaCache.remove)
    ()
  }

  // ---- per-bucket column stats (file-skipping, Delta/Z-order-style) --------

  /** stats = bucket -> col -> (min, max), numeric columns only. Stored as a
    * TSV sidecar next to the manifest; buckets whose stats column is entirely
    * NULL carry no entry (a range predicate can't match NULL, so [[scanPruned]]
    * may still skip them — see there). */
  private def statsFile(feature: String, v: Long) = new Path(logDir(feature), s"$v.stats.tsv")

  private def readStats(feature: String, v: Long): Map[Int, Map[String, (Double, Double)]] =
    BucketedStore.statsCache.getOrElseUpdate((root, feature, v), {
      val p = statsFile(feature, v)
      if (!fs.exists(p)) Map.empty
      else {
        val in = fs.open(p)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        txt.linesIterator.filter(_.nonEmpty).toSeq
          .map { line =>
            val Array(b, c, mn, mx) = line.split('\t')
            (b.toInt, c, (mn.toDouble, mx.toDouble))
          }
          .groupBy(_._1)
          .map { case (b, rows) => b -> rows.map(r => r._2 -> r._3).toMap }
      }
    })

  private def writeStats(feature: String, v: Long,
                         stats: Map[Int, Map[String, (Double, Double)]]): Unit = {
    if (stats.isEmpty) return
    val txt = stats.toSeq.sortBy(_._1).flatMap { case (b, cols) =>
      cols.toSeq.sortBy(_._1).map { case (c, (mn, mx)) => s"$b\t$c\t$mn\t$mx" }
    }.mkString("\n")
    val out = fs.create(statsFile(feature, v), true)
    out.write(txt.getBytes(StandardCharsets.UTF_8)); out.close()
    BucketedStore.statsCache.put((root, feature, v), stats)
    ()
  }

  /** One narrow agg pass over the already-bucketed frame: per-bucket min/max
    * of each stats column, collected to the driver (≤ numBuckets rows). */
  private def computeStats(bucketed: DataFrame, statsCols: Seq[String]): Map[Int, Map[String, (Double, Double)]] = {
    if (statsCols.isEmpty) return Map.empty
    // NaN is EXCLUDED from the ranges: Spark's max orders NaN above every
    // double, so one NaN row would poison mx to NaN and `mx >= lo` would
    // prune buckets that hold matching rows. A range predicate can never
    // match NaN, so excluding it keeps pruning sound (all-NaN bucket => no
    // entry => skip, same rule as all-NULL).
    val aggs = statsCols.flatMap { c =>
      val d = col(c).cast("double")
      val clean = when(!isnan(d), d)
      Seq(min(clean).as(s"__mn_$c"), max(clean).as(s"__mx_$c"))
    }
    bucketed.groupBy("__b").agg(aggs.head, aggs.tail: _*).collect().map { row =>
      val b = row.getInt(0)
      b -> statsCols.flatMap { c =>
        val mn = row.getAs[Any](s"__mn_$c"); val mx = row.getAs[Any](s"__mx_$c")
        if (mn == null || mx == null) None
        else Some(c -> (mn.asInstanceOf[Double], mx.asInstanceOf[Double]))
      }.toMap
    }.toMap
  }

  // ---- Delta-log compatibility probe ---------------------------------------
  // Each version ALSO emits root/<feature>/_delta_log/<v padded to 20>.json
  // with protocol/metaData/add/remove actions in the open Delta commit
  // layout, so an external Delta reader can open simple tables written here.
  // Add actions carry per-file min/max stats; metaData is re-emitted on any
  // commit whose schema differs from the last emitted one (schema evolution
  // via merge is reflected, as delta-rs does); maintenance rewrites
  // (compactBuckets/optimizeZorder) commit with dataChange:false so a Delta
  // streaming reader does not reprocess compacted files as new rows.
  // Scope limits (this environment ships no delta jars to prove more):
  // no checkpoints, no deletion vectors, and vacuum() is NOT mirrored (the
  // log keeps advertising reclaimed files — the native horizon marker makes
  // the native reader fail loudly instead; see vacuum).
  // The native manifest remains the source of truth — the log is a faithful
  // mirror of it, written right after.

  private def deltaLogFile(feature: String, v: Long) =
    new Path(s"$root/$feature/_delta_log/" + f"$v%020d" + ".json")

  /** Last schemaString emitted into the Delta mirror, so a commit can detect
    * schema evolution and re-emit metaData exactly when it changes. */
  private def deltaSchemaFile(feature: String) = new Path(logDir(feature), "_delta_schema")

  private def readSmall(p: Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString) finally in.close()
    }

  private def writeSmall(p: Path, txt: String): Unit = {
    val out = fs.create(p, true)
    out.write(txt.getBytes(StandardCharsets.UTF_8)); out.close()
  }

  /** (relativePath, size, modificationTime) of every part file under a
    * manifest-relative bucket directory. */
  private def listPartFiles(feature: String, rel: String): Seq[(String, Long, Long)] = {
    val dir = new Path(s"$root/$feature/$rel")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.filter(_.getPath.getName.startsWith("part-"))
      .map(f => (s"$rel/${f.getPath.getName}", f.getLen, f.getModificationTime))
  }

  private def jsonEsc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** RAW per-file stats JSON for a bucket (Delta `stats` field content) —
    * shared by the commit writer (escaped into the action) and the
    * checkpoint writer (stored as a plain string column). Only finite
    * bounds are emitted: NaN/Infinity are not legal JSON tokens. */
  private def fileStatsJson(stats: Map[Int, Map[String, (Double, Double)]],
                            b: Int): Option[String] =
    stats.get(b)
      .map(_.filter { case (_, (mn, mx)) =>
        !mn.isNaN && !mn.isInfinity && !mx.isNaN && !mx.isInfinity })
      .filter(_.nonEmpty).map { cols =>
        val mins = cols.toSeq.sortBy(_._1)
          .map { case (c, (mn, _)) => s""""${jsonEsc(c)}":$mn""" }.mkString(",")
        val maxs = cols.toSeq.sortBy(_._1)
          .map { case (c, (_, mx)) => s""""${jsonEsc(c)}":$mx""" }.mkString(",")
        s"""{"minValues":{$mins},"maxValues":{$maxs}}"""
      }

  private def writeDeltaLog(feature: String, v: Long, schemaJson: String,
      addRels: Seq[String], removeRels: Seq[String],
      stats: Map[Int, Map[String, (Double, Double)]] = Map.empty,
      dataChange: Boolean = true): Unit = {
    val now = System.currentTimeMillis
    // metaData is (re-)emitted when the commit's schema differs from the
    // last emitted one — v0 always, and any schema-evolving merge/append
    // after that (delta-rs readers pick up the widened schema mid-log)
    val protocol =
      if (v == 0L) Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""")
      else Seq.empty
    val metaData =
      if (v == 0L || !readSmall(deltaSchemaFile(feature)).contains(schemaJson)) Seq(
        s"""{"metaData":{"id":"${java.util.UUID.nameUUIDFromBytes(s"$root/$feature".getBytes(StandardCharsets.UTF_8))}","format":{"provider":"parquet","options":{}},"schemaString":"${jsonEsc(schemaJson)}","partitionColumns":["__b"],"configuration":{},"createdTime":$now}}""")
      else Seq.empty
    val header = protocol ++ metaData
    val adds = addRels.sorted.flatMap(rel => listPartFiles(feature, rel).map {
      case (p, len, mt) =>
        val b = rel.substring(rel.lastIndexOf("__b=") + 4)
        // per-file stats in the open Delta layout (a JSON string inside the
        // action) from the bucket's tracked min/max — bucket-level ranges are
        // conservative-correct per file (a reader may scan more, never less);
        // numRecords is omitted (per-bucket, not per-file, in the sidecar)
        val statsField = fileStatsJson(stats, b.toInt)
          .map(j => s""","stats":"${jsonEsc(j)}"""").getOrElse("")
        s"""{"add":{"path":"${jsonEsc(p)}","partitionValues":{"__b":"$b"},"size":$len,"modificationTime":$mt,"dataChange":$dataChange$statsField}}"""
    })
    val removes = removeRels.sorted.flatMap(rel => listPartFiles(feature, rel).map {
      case (p, _, _) =>
        s"""{"remove":{"path":"${jsonEsc(p)}","deletionTimestamp":$now,"dataChange":$dataChange}}"""
    })
    val out = fs.create(deltaLogFile(feature, v), true)
    out.write((header ++ adds ++ removes).mkString("\n").getBytes(StandardCharsets.UTF_8))
    out.close()
    writeSmall(deltaSchemaFile(feature), schemaJson)
    // a long-lived table's log replay otherwise costs O(versions) per open:
    // every deltaCheckpointEvery commits, snapshot the aggregated state so
    // a reader pays one checkpoint + the tail commits
    if (v > 0 && v % deltaCheckpointEvery == 0)
      writeDeltaCheckpoint(feature, v, schemaJson)
  }

  // ---- Delta checkpointing -------------------------------------------------
  // Every `deltaCheckpointEvery` commits the mirror also writes the open
  // Delta checkpoint layout: `<v padded to 20>.checkpoint.parquet` holding
  // the AGGREGATED state at v (protocol + metaData + one add per live file,
  // each action a nullable struct column) plus the `_last_checkpoint`
  // pointer {"version":v,"size":n}. A reader then replays one parquet file
  // + the commits AFTER v instead of every version since 0 —
  // [[deltaLiveFiles]] is that replay, and the spec asserts the bound.
  // Tombstones (expired removes) are omitted: the mirror never vacuums
  // through the Delta view, so nothing downstream depends on them.

  private def deltaCheckpointFile(feature: String, v: Long) =
    new Path(s"$root/$feature/_delta_log/" + f"$v%020d" + ".checkpoint.parquet")

  private def lastCheckpointFile(feature: String) =
    new Path(s"$root/$feature/_delta_log/_last_checkpoint")

  private def writeDeltaCheckpoint(feature: String, v: Long, schemaJson: String): Unit = {
    import spark.implicits._
    val manifest = readManifest(feature, v)
    val stats = readStats(feature, v)
    val now = System.currentTimeMillis
    val proto = BucketedStore.CkptRow(
      protocol = Some(BucketedStore.CkptProtocol(1, 2)),
      metaData = None, add = None)
    val meta = BucketedStore.CkptRow(
      protocol = None,
      metaData = Some(BucketedStore.CkptMetaData(
        id = java.util.UUID.nameUUIDFromBytes(
          s"$root/$feature".getBytes(StandardCharsets.UTF_8)).toString,
        format = BucketedStore.CkptFormat("parquet", Map.empty),
        schemaString = schemaJson,
        partitionColumns = Seq("__b"),
        configuration = Map.empty,
        createdTime = now)),
      add = None)
    val adds = manifest.toSeq.sortBy(_._1).flatMap { case (b, rels) =>
      rels.flatMap(rel => listPartFiles(feature, rel)).map { case (p, len, mt) =>
        BucketedStore.CkptRow(None, None, Some(BucketedStore.CkptAdd(
          path = p, partitionValues = Map("__b" -> b.toString),
          size = len, modificationTime = mt, dataChange = true,
          stats = fileStatsJson(stats, b).orNull)))
      }
    }
    val rows = Seq(proto, meta) ++ adds
    // Spark writes a directory; the Delta layout wants ONE file with the
    // exact checkpoint name — write to a temp dir, move the single part in
    val tmp = new Path(s"$root/$feature/_delta_log/.ckpt_tmp_$v")
    rows.toDS().coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val part = fs.listStatus(tmp).map(_.getPath)
      .find(_.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(s"checkpoint write for $feature v$v produced no part file"))
    val dest = deltaCheckpointFile(feature, v)
    if (fs.exists(dest)) fs.delete(dest, false)
    fs.rename(part, dest)
    fs.delete(tmp, true)
    writeSmall(lastCheckpointFile(feature), s"""{"version":$v,"size":${rows.length}}""")
  }

  /** Reconstruct the LIVE file set of the latest version from the Delta
    * mirror alone — the replay an external Delta reader performs: start
    * from `_last_checkpoint`'s snapshot when present, then apply only the
    * commits after it. Returns (live relative paths, commit JSONs read) —
    * the second element is the spec's handle on the O(tail) bound. */
  private[graft] def deltaLiveFiles(feature: String): (Set[String], Int) = {
    val logDirPath = new Path(s"$root/$feature/_delta_log")
    val ckptVersion = readSmall(lastCheckpointFile(feature)).flatMap { txt =>
      "\"version\"\\s*:\\s*([0-9]+)".r.findFirstMatchIn(txt).map(_.group(1).toLong)
    }
    val base: Set[String] = ckptVersion match {
      case None => Set.empty
      case Some(cv) =>
        spark.read.parquet(deltaCheckpointFile(feature, cv).toString)
          .where(col("add").isNotNull).select("add.path")
          .collect().map(_.getString(0)).toSet
    }
    val commitVs = fs.listStatus(logDirPath).map(_.getPath.getName).toSeq
      .filter(n => n.endsWith(".json") && n.stripSuffix(".json").forall(_.isDigit))
      .map(_.stripSuffix(".json").toLong)
      .filter(v => ckptVersion.forall(_ < v)).sorted
    val live = commitVs.foldLeft(base) { (acc, v) =>
      val in = fs.open(deltaLogFile(feature, v))
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      val added = "\"add\":\\{\"path\":\"([^\"]+)\"".r
        .findAllMatchIn(txt).map(_.group(1)).toSet
      val removed = "\"remove\":\\{\"path\":\"([^\"]+)\"".r
        .findAllMatchIn(txt).map(_.group(1)).toSet
      acc -- removed ++ added
    }
    (live, commitVs.size)
  }

  /** Write `df` as a full new version: every non-empty bucket gets one file
    * directory. `statsCols` (numeric) get per-bucket min/max recorded for
    * [[scanPruned]] file skipping. Returns the version. */
  def write(df: DataFrame, feature: String, entityKeys: Seq[String],
            statsCols: Seq[String] = Nil): Long = {
    val v = latestVersion(feature).map(_ + 1).getOrElse(0L)
    val bucketed = df.withColumn("__b", bucketCol(entityKeys))
    bucketed.write.mode(SaveMode.Overwrite)
      .partitionBy("__b").parquet(s"$root/$feature/files_v$v")
    val buckets = bucketed.select("__b").distinct().collect().map(_.getInt(0))
    writeManifest(feature, v, buckets.map(b => b -> Seq(s"files_v$v/__b=$b")).toMap)
    val st = computeStats(bucketed, statsCols)
    writeStats(feature, v, st)
    // a full write REPLACES the table: previous version's files are removed
    // from the Delta view (they stay on disk for native time travel)
    val prevFiles =
      if (v == 0L) Seq.empty else readManifest(feature, v - 1).values.flatten.toSeq
    writeDeltaLog(feature, v, bucketed.schema.json,
      buckets.map(b => s"files_v$v/__b=$b").toSeq, prevFiles, st)
    v
  }

  // ---- Z-order clustered layout --------------------------------------------

  private def layoutFile(feature: String, v: Long) = new Path(logDir(feature), s"$v.zorder")

  /** Cluster columns of version `v` if it was written by [[writeClustered]];
    * empty for hash-bucketed versions. */
  def clusteredBy(feature: String, v: Long): Seq[String] = {
    val p = layoutFile(feature, v)
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      txt.trim.split('\t').toSeq.filter(_.nonEmpty)
    }
  }

  /** Z-ORDER clustered full write (the OPTIMIZE ZORDER analogue): instead of
    * hash-routing rows to buckets, each row's file is chosen by the top bits
    * of a Morton value interleaved from EQUI-DEPTH bin ids of `clusterCols` —
    * rows close in every cluster dimension land in the same file, so each
    * file's recorded [min,max] per column is a tight band and
    * [[scanPrunedMulti]]'s conjunctive pruning skips real files. Hash
    * bucketing scatters every value range across all buckets (per-bucket
    * min/max ≈ the global range — nothing prunes); this layout is the write
    * side that makes the multi-column read side effective.
    *
    * Scale shape: one Greenwald-Khanna quantile-sketch pass computes the
    * (1<<bitsPerCol)-1 bin boundaries per column (driver receives only the
    * boundaries), then the routing column is pure codegen'd integer
    * arithmetic — no sort, no extra shuffle beyond the partitioned write
    * itself. Equi-depth bins keep file sizes balanced under skew, exactly
    * where equi-width interleaving degenerates.
    *
    * Rows with NULL in a cluster column route to bin 0 (a range predicate can
    * never match NULL, and min/max stats ignore NULLs, so pruning stays
    * correct). Clustered versions don't support hash-routed [[merge]]/
    * [[lookup]] — those fail loudly rather than mis-route; re-cluster with a
    * fresh writeClustered after bulk changes (same policy as Delta, where
    * Z-order is a table-maintenance rewrite, not an incremental property). */
  def writeClustered(df: DataFrame, feature: String, entityKeys: Seq[String],
                     clusterCols: Seq[String], statsCols: Seq[String] = Nil,
                     bitsPerCol: Int = 6): Long =
    writeClusteredInternal(df, feature, entityKeys, clusterCols, statsCols,
      bitsPerCol, dataChange = true)

  /** `dataChange=false` only for [[optimizeZorder]]: the rewrite changes no
    * logical rows, and the open Delta format marks maintenance commits so
    * streaming readers don't reprocess rewritten files as new data. */
  private def writeClusteredInternal(df: DataFrame, feature: String, entityKeys: Seq[String],
                     clusterCols: Seq[String], statsCols: Seq[String],
                     bitsPerCol: Int, dataChange: Boolean): Long = {
    require(clusterCols.nonEmpty, "writeClustered needs at least one cluster column")
    require(bitsPerCol >= 1 && bitsPerCol * clusterCols.length <= 30,
      s"bitsPerCol=$bitsPerCol x ${clusterCols.length} cols must stay under 30 z-bits")
    val nBins = 1 << bitsPerCol
    // equi-depth boundaries per column from one sketch pass; duplicate
    // quantiles (heavy skew) collapse — fewer, still-correct bins
    val probs = (1 until nBins).map(_.toDouble / nBins).toArray
    val boundaries: Seq[Array[Double]] = clusterCols.map { c =>
      df.select(col(c).cast("double").as(c)).stat
        .approxQuantile(c, probs, 0.001).distinct.sorted
    }
    // bin id = #boundaries strictly below the value: a fold of codegen'd
    // comparisons (<= 2^bitsPerCol terms), NULL-safe (NULL fails every
    // comparison -> bin 0)
    val binIds = clusterCols.zip(boundaries).map { case (c, bs) =>
      bs.foldLeft(lit(0)) { (acc, b) =>
        acc + when(col(c).cast("double") > lit(b), 1).otherwise(0) }
    }
    // Morton interleave: bit i of column j lands at z-bit i*ncols + j
    val ncols = clusterCols.length
    val z = (0 until bitsPerCol).foldLeft(lit(0)) { (acc, i) =>
      binIds.zipWithIndex.foldLeft(acc) { case (a, (bin, j)) =>
        a.bitwiseOR(shiftleft(shiftright(bin, i).bitwiseAND(lit(1)), i * ncols + j))
      }
    }
    // file id = z scaled into [0, numBuckets): with equi-depth bins z is
    // ~uniform, so files are balanced for any numBuckets (no power-of-two
    // requirement)
    val fileId = shiftright(z.cast("long") * numBuckets, bitsPerCol * ncols).cast("int")

    val v = latestVersion(feature).map(_ + 1).getOrElse(0L)
    val bucketed = df.withColumn("__b", fileId)
    bucketed.write.mode(SaveMode.Overwrite)
      .partitionBy("__b").parquet(s"$root/$feature/files_v$v")
    val buckets = bucketed.select("__b").distinct().collect().map(_.getInt(0))
    writeManifest(feature, v, buckets.map(b => b -> Seq(s"files_v$v/__b=$b")).toMap)
    val st = computeStats(bucketed, (clusterCols ++ statsCols).distinct)
    writeStats(feature, v, st)
    val lay = fs.create(layoutFile(feature, v), true)
    lay.write(clusterCols.mkString("\t").getBytes(StandardCharsets.UTF_8)); lay.close()
    val prevFiles =
      if (v == 0L) Seq.empty else readManifest(feature, v - 1).values.flatten.toSeq
    writeDeltaLog(feature, v, bucketed.schema.json,
      buckets.map(b => s"files_v$v/__b=$b").toSeq, prevFiles, st, dataChange)
    v
  }

  /** All manifest-driven reads go through here: mergeSchema reconciles
    * files written before/after a schema-widening merge or append (Spark
    * otherwise infers from one arbitrary footer, silently dropping the new
    * columns — and a compaction after that would make the loss permanent).
    * Empty path lists fail LOUDLY: an empty write leaves no footer to
    * recover a schema from, so there is no correct silent answer.
    *
    * The MERGED SCHEMA is cached per (root, feature, version, file set):
    * mergeSchema inference runs a distributed footer-read job per call, so
    * an indexed query that re-reads the same committed version paid 1-2
    * Spark jobs per read for a schema that cannot change (a version's file
    * set is immutable once manifested — see the companion's invalidation
    * contract). First read infers + caches; repeat reads pass the schema
    * explicitly and skip the job. Keyed by the exact rel list because a
    * SUBSET read (scanPruned/readTouched) of a schema-evolved version may
    * legitimately merge to a narrower schema than the full set. */
  private def readPaths(feature: String, v: Long, rels: Seq[String]): DataFrame = {
    if (rels.isEmpty)
      throw new IllegalStateException(
        s"feature $feature v$v references no data files (empty write?)")
    val paths = rels.map(p => s"$root/$feature/$p")
    val key = (root, feature, v, rels.sorted.mkString(";"))
    BucketedStore.mergedSchemaCache.get(key) match {
      case Some(schema) => spark.read.schema(schema).parquet(paths: _*)
      case None =>
        val df = spark.read.option("mergeSchema", "true").parquet(paths: _*)
        BucketedStore.mergedSchemaCache.put(key, df.schema)
        df
    }
  }

  /** Read a version (default latest) by loading exactly the files its
    * manifest references. */
  def read(feature: String, entityKeys: Seq[String], asOfVersion: Option[Long] = None): DataFrame = {
    val v = resolveVersion(feature, asOfVersion)
    readPaths(feature, v, readManifest(feature, v).values.flatten.toSeq)
  }

  /** FILE-LEVEL MERGE: upsert `updates` by entity key, rewriting ONLY the
    * buckets the updates hash into; all other buckets carry into the new
    * version by manifest reference (zero IO). */
  def merge(feature: String, updates: DataFrame, entityKeys: Seq[String]): Long = {
    val prev = latestVersion(feature)
      .getOrElse(throw new IllegalArgumentException(s"merge into empty feature $feature; write() first"))
    // a clustered version's manifest keys are z-ranges, not hash buckets —
    // hash-routing updates into it would silently corrupt; fail loudly
    require(clusteredBy(feature, prev).isEmpty,
      s"feature $feature v$prev is Z-order clustered; merge needs a hash-bucketed version (re-write, then merge)")
    val manifest = readManifest(feature, prev)
    val v = prev + 1

    // persisted: the dup-key check, the touched-bucket collect, and the
    // merged write are all actions over this frame — without the persist an
    // arbitrary upstream pipeline executes once per action, and a
    // NON-DETERMINISTIC source could pass the check yet route/write
    // different rows. Batch-sized by the merge contract.
    val upd = updates.withColumn("__b", bucketCol(entityKeys))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // one-row-per-key upsert contract: a batch with duplicate keys would
    // anti-join away the stored row and append BOTH copies — the silent
    // version of Delta's "multiple source rows matched" error. ONE agg pass
    // computes both counts; the struct wrapper keeps countDistinct null-safe
    // (a bare multi-column countDistinct drops rows with any NULL key).
    val cnts = upd.agg(count(lit(1)).as("__n"),
      countDistinct(struct(entityKeys.map(col): _*)).as("__nd")).head()
    require(cnts.getLong(0) == cnts.getLong(1),
      s"merge batch contains duplicate entity keys for $feature; dedupe the batch first")
    val touched = upd.select("__b").distinct().collect().map(_.getInt(0)).toSet

    // current rows of ONLY the touched buckets
    val touchedRels = manifest.filter(t => touched(t._1)).values.flatten.toSeq
    val currentTouched =
      if (touchedRels.isEmpty) None
      else Some(readPaths(feature, prev, touchedRels))

    val merged = currentTouched match {
      case None => upd
      case Some(cur) =>
        cur.withColumn("__b", bucketCol(entityKeys))
          .join(upd.select(entityKeys.map(col): _*), entityKeys, "left_anti")
          .unionByName(upd, allowMissingColumns = true)
    }
    merged.write.mode(SaveMode.Overwrite)
      .partitionBy("__b").parquet(s"$root/$feature/files_v$v")
    val newBuckets = merged.select("__b").distinct().collect().map(_.getInt(0))
    val newManifest = (manifest -- touched) ++
      newBuckets.map(b => b -> Seq(s"files_v$v/__b=$b")).toMap
    writeManifest(feature, v, newManifest)
    // stats: untouched buckets carry forward by reference (their files didn't
    // change); rewritten buckets recompute over the same columns the previous
    // version tracked — one narrow agg over only the rewritten slice
    val prevStats = readStats(feature, prev)
    val trackedCols = prevStats.values.flatMap(_.keys).toSeq.distinct
    val mergedStats =
      if (trackedCols.isEmpty) Map.empty[Int, Map[String, (Double, Double)]]
      else {
        val recomputed = computeStats(merged, trackedCols.filter(merged.columns.contains))
        val st = (prevStats -- touched) ++ recomputed
        writeStats(feature, v, st)
        st
      }
    // Delta view of the merge: rewritten buckets' new files are added, the
    // replaced files removed; untouched buckets carry implicitly
    writeDeltaLog(feature, v, merged.schema.json,
      newBuckets.map(b => s"files_v$v/__b=$b").toSeq,
      manifest.filter(t => touched(t._1)).values.flatten.toSeq, mergedStats)
    v
    } finally upd.unpersist(false)
  }

  /** O(batch) APPEND: route `rows` to their buckets and ADD the new file
    * dirs to the touched buckets' manifest entries — no existing file is
    * read or rewritten (vs [[merge]]'s rewrite of every touched bucket).
    * The growth path for monotonically-appending tables (event logs, the
    * LSH dedup index): write cost is O(batch) regardless of table size.
    * NOT an upsert — duplicate keys accumulate; dedupe downstream or with
    * [[merge]]. Tracked stats WIDEN with the appended slice (union of
    * ranges — conservative-correct for pruning). Run [[compactBuckets]] on
    * a cadence to fold multi-dir buckets back to one. */
  def appendBucketed(feature: String, rows: DataFrame, entityKeys: Seq[String]): Long = {
    val prev = latestVersion(feature)
      .getOrElse(throw new IllegalArgumentException(s"append into empty feature $feature; write() first"))
    require(clusteredBy(feature, prev).isEmpty,
      s"feature $feature v$prev is Z-order clustered; append needs hash routing")
    val manifest = readManifest(feature, prev)
    val v = prev + 1
    val bucketed = rows.withColumn("__b", bucketCol(entityKeys))
    bucketed.write.mode(SaveMode.Overwrite)
      .partitionBy("__b").parquet(s"$root/$feature/files_v$v")
    val newBuckets = bucketed.select("__b").distinct().collect().map(_.getInt(0))
    writeManifest(feature, v, manifest ++ newBuckets.map(b =>
      b -> (manifest.getOrElse(b, Seq.empty) :+ s"files_v$v/__b=$b")).toMap)
    val prevStats = readStats(feature, prev)
    val tracked = prevStats.values.flatMap(_.keys).toSeq.distinct
    val stats =
      if (tracked.isEmpty) Map.empty[Int, Map[String, (Double, Double)]]
      else {
        val add = computeStats(bucketed, tracked.filter(rows.columns.contains))
        val widened = (prevStats.keySet ++ add.keySet).map { b =>
          val pm = prevStats.getOrElse(b, Map.empty[String, (Double, Double)])
          val am = add.getOrElse(b, Map.empty[String, (Double, Double)])
          b -> (pm.keySet ++ am.keySet).map { c =>
            c -> ((pm.get(c), am.get(c)) match {
              case (Some((l1, h1)), Some((l2, h2))) => (math.min(l1, l2), math.max(h1, h2))
              case (Some(x), None) => x
              case (None, x) => x.get
            })
          }.toMap
        }.toMap
        writeStats(feature, v, widened)
        widened
      }
    // append = pure adds in the Delta view; nothing is removed
    writeDeltaLog(feature, v, bucketed.schema.json,
      newBuckets.map(b => s"files_v$v/__b=$b").toSeq, Seq.empty, stats)
    v
  }

  /** Fold every multi-dir bucket (accumulated by [[appendBucketed]]) back
    * to one file dir — the OPTIMIZE/compaction half of the append cycle.
    * Reads ONLY the multi-dir buckets; single-dir buckets carry by
    * reference. No-op (returns the current version) when nothing needs
    * compacting. Old dirs stay on disk for time travel until [[vacuum]]. */
  def compactBuckets(feature: String, entityKeys: Seq[String]): Long = {
    val prev = latestVersion(feature)
      .getOrElse(throw new IllegalArgumentException(s"feature $feature has no versions"))
    require(clusteredBy(feature, prev).isEmpty,
      s"feature $feature v$prev is Z-order clustered; compact needs hash routing")
    val manifest = readManifest(feature, prev)
    val multi = manifest.filter(_._2.size > 1)
    if (multi.isEmpty) return prev
    val v = prev + 1
    // reading bucket dirs directly drops the __b partition column, so the
    // routing column is re-derived with the identical hash
    val rows = readPaths(feature, prev, multi.values.flatten.toSeq)
    val bucketed = rows.withColumn("__b", bucketCol(entityKeys))
    bucketed.write.mode(SaveMode.Overwrite)
      .partitionBy("__b").parquet(s"$root/$feature/files_v$v")
    val rewritten = bucketed.select("__b").distinct().collect().map(_.getInt(0))
    writeManifest(feature, v, manifest ++ rewritten.map(b =>
      b -> Seq(s"files_v$v/__b=$b")).toMap)
    // ranges are unchanged by compaction: carry the stats sidecar forward
    val prevStats = readStats(feature, prev)
    writeStats(feature, v, prevStats)
    // compaction changes no logical rows — dataChange:false keeps Delta
    // streaming readers from reprocessing the folded files as new data
    writeDeltaLog(feature, v, bucketed.schema.json,
      rewritten.map(b => s"files_v$v/__b=$b").toSeq,
      multi.values.flatten.toSeq, prevStats, dataChange = false)
    v
  }

  /** Stats-pruned range scan: read ONLY the bucket files whose recorded
    * [min,max] for `statsCol` intersects [lo,hi] (inclusive), then apply the
    * filter. Buckets with NO stats entry for the column fall into two cases:
    * the version tracked the column (entry absent ⇒ the bucket's values are
    * all NULL ⇒ a range predicate can never match ⇒ skip), or the version
    * tracked nothing (no sidecar ⇒ cannot skip ⇒ read). At 100 TB this is
    * the manifest-level analogue of parquet row-group skipping: the planner
    * touches `numBuckets` stat rows instead of listing every file. */
  def scanPruned(feature: String, entityKeys: Seq[String], statsCol: String,
                 lo: Double, hi: Double, asOfVersion: Option[Long] = None): DataFrame =
    scanPrunedMulti(feature, entityKeys, Seq((statsCol, lo, hi)), asOfVersion)

  /** CONJUNCTIVE multi-column stats pruning: a bucket is read only if its
    * recorded [min,max] intersects EVERY requested range — the keep-sets of
    * the individual predicates intersect, so adding a predicate can only
    * shrink the file list (Z-order-style data skipping without the curve:
    * the sidecar already stores per-column min/max per bucket). Per column,
    * untracked ⇒ conservative keep; tracked but entry absent ⇒ the bucket's
    * values are all NULL ⇒ the range can't match ⇒ skip. */
  def scanPrunedMulti(feature: String, entityKeys: Seq[String],
      ranges: Seq[(String, Double, Double)],
      asOfVersion: Option[Long] = None): DataFrame = {
    require(ranges.nonEmpty, "scanPrunedMulti needs at least one (col, lo, hi) range")
    val v = resolveVersion(feature, asOfVersion)
    val stats = readStats(feature, v)
    val manifest = readManifest(feature, v)
    // a column NO bucket has an entry for is indistinguishable from untracked
    // (an all-NULL bucket writes no entry) — reading everything is the
    // conservative-correct answer for both
    val tracked = ranges.map { case (c, _, _) =>
      c -> stats.values.exists(_.contains(c)) }.toMap
    val keep = manifest.filter { case (b, _) =>
      ranges.forall { case (c, lo, hi) =>
        if (!tracked(c)) true
        else stats.get(b).flatMap(_.get(c)) match {
          case Some((mn, mx)) => mx >= lo && mn <= hi
          case None           => false // tracked column, all-NULL bucket: skip
        }
      }
    }
    val pred = ranges.map { case (c, lo, hi) =>
      col(c) >= lit(lo) && col(c) <= lit(hi) }.reduce(_ && _)
    if (keep.isEmpty) read(feature, entityKeys, Some(v)).where(pred).limit(0)
    else readPaths(feature, v, keep.values.flatten.toSeq).where(pred)
  }

  /** SET-pruned read: load only the buckets that the key values present in
    * `keys` hash into — the batch form of [[lookup]] (one Spark job computes
    * the distinct bucket ids — ≤ numBuckets ints to the driver — then one
    * scan of just those files). At 100 TB this is how an incremental
    * pipeline touches an indexed table: per-batch IO is
    * |touched buckets| / numBuckets of the table, independent of table
    * size for a fixed batch. `keys` must have the entity-key columns with
    * the STORED column types (same frame family the index was built from). */
  def readTouched(feature: String, entityKeys: Seq[String], keys: DataFrame,
                  asOfVersion: Option[Long] = None): DataFrame = {
    val v = resolveVersion(feature, asOfVersion)
    require(clusteredBy(feature, v).isEmpty,
      s"feature $feature v$v is Z-order clustered; readTouched needs hash routing")
    val manifest = readManifest(feature, v)
    val touched = keys.select(bucketCol(entityKeys).as("__b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val rels = manifest.filter(t => touched(t._1)).values.flatten.toSeq
    if (rels.isEmpty) read(feature, entityKeys, Some(v)).limit(0)
    else readPaths(feature, v, rels)
  }

  /** Point lookup: hash the literal key to its bucket and read ONLY that
    * bucket's file — a serving-side get that touches 1/numBuckets of the
    * table regardless of table size. */
  def lookup(feature: String, entityKeys: Seq[String], keyValues: Seq[Any],
             asOfVersion: Option[Long] = None): DataFrame = {
    require(entityKeys.length == keyValues.length)
    val v = resolveVersion(feature, asOfVersion)
    require(clusteredBy(feature, v).isEmpty,
      s"feature $feature v$v is Z-order clustered; point lookup needs a hash-bucketed version")
    val manifest = readManifest(feature, v)
    if (manifest.isEmpty) return read(feature, entityKeys, Some(v)).limit(0)
    // same hash the writer used, evaluated IN-PROCESS: lookup is the serving
    // path (A14 fastlane), and a one-row Spark job spends ~50-100 ms of
    // scheduler latency computing a hash the driver evaluates in microseconds.
    // xxhash64 hashes by TYPE, so each literal is cast to the STORED key
    // column's type first (an Int passed for a Long column would otherwise
    // hash differently and silently miss) — types come from one cached
    // parquet footer read.
    val schema = keySchema(feature, v, manifest)
    val types = entityKeys.map(k => schema(k).dataType)
    val b = bucketOf(keyValues, types)
    manifest.get(b) match {
      case None => read(feature, entityKeys, Some(v)).limit(0)
      case Some(ps) =>
        val df = readPaths(feature, v, ps)
        entityKeys.zip(keyValues).foldLeft(df) { case (d, (k, kv)) =>
          d.filter(col(k) === lit(kv).cast(schema(k).dataType)) }
    }
  }

  // one footer read per (feature, version), then in-memory — the serving
  // path stays Spark-job-free after the first lookup
  private val schemaCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long), org.apache.spark.sql.types.StructType]
  private def keySchema(feature: String, v: Long,
      manifest: Map[Int, Seq[String]]): org.apache.spark.sql.types.StructType =
    schemaCache.getOrElseUpdate((feature, v),
      spark.read.parquet(s"$root/$feature/${manifest.values.head.head}").schema)

  /** Driver-side twin of [[bucketCol]]: evaluate pmod(xxhash64(keys), n) on
    * literal values with the catalyst expressions themselves — no Spark job.
    * Each literal is cast to the stored key column's Catalyst type so the
    * bucket is bit-identical to the executor-side bucketCol routing even
    * when the caller's Scala type differs (Int for a LongType key, ...).
    * Exposed for spec-level routing-equivalence assertions. */
  private[graft] def bucketOf(keyValues: Seq[Any],
      keyTypes: Seq[org.apache.spark.sql.types.DataType]): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal => CatLit, Pmod, XxHash64}
    require(keyValues.length == keyTypes.length)
    val lits = keyValues.zip(keyTypes).map { case (kv, t) =>
      val l = CatLit(kv)
      if (l.dataType == t) l else CatLit(Cast(l, t).eval(null), t)
    }
    new Pmod(new XxHash64(lits), CatLit(numBuckets.toLong))
      .eval(null).asInstanceOf[Long].toInt
  }

  /** Table maintenance: re-cluster the LATEST version by Z-order (the
    * OPTIMIZE ZORDER BY analogue). Reads the current version and writes a
    * new clustered one; older versions (and time travel to them) are
    * untouched. Typical cycle at scale: hash-bucketed writes + merges absorb
    * updates cheaply, a periodic optimize re-establishes tight per-file
    * ranges for the hot predicate columns, [[vacuum]] reclaims the old
    * files once the retention window passes. */
  def optimizeZorder(feature: String, entityKeys: Seq[String],
                     clusterCols: Seq[String], statsCols: Seq[String] = Nil,
                     bitsPerCol: Int = 6): Long = {
    val cur = read(feature, entityKeys).drop("__b")
    writeClusteredInternal(cur, feature, entityKeys, clusterCols, statsCols,
      bitsPerCol, dataChange = false)
  }

  /** Table maintenance: delete data files not referenced by any of the last
    * `keepVersions` manifests (the VACUUM analogue — bounded storage under
    * continuous merges, at the cost of time travel past the horizon).
    * Returns the deleted relative paths. Never touches the manifests or the
    * Delta log mirror (history stays auditable; only bytes are reclaimed) —
    * but the retention horizon is recorded in `_graft_log/_vacuum_horizon`
    * so reads of reclaimed versions fail with a store-level error naming
    * the horizon instead of a generic parquet file-not-found. */
  def vacuum(feature: String, keepVersions: Int = 2): Seq[String] = {
    require(keepVersions >= 1, "vacuum must keep at least the latest version")
    // cursor-claim crash debris rides the same maintenance cadence — and
    // BEFORE the nothing-to-reclaim early return, so a store whose data
    // versions are already tight still sheds its orphaned locks
    reapCursorLocks()
    val vs = versions(feature)
    if (vs.size <= keepVersions) return Seq.empty
    val retained = vs.takeRight(keepVersions)
    val live: Set[String] = retained
      .flatMap(v => readManifest(feature, v).values.flatten).toSet
    // horizon is MONOTONE: a later vacuum with a larger keepVersions must
    // not lower it below versions whose files an earlier vacuum already
    // reclaimed (the guard would silently re-open the file-not-found hole)
    val horizon = math.max(retained.head, vacuumHorizon(feature).getOrElse(Long.MinValue))
    writeSmall(new Path(logDir(feature), "_vacuum_horizon"), horizon.toString)
    val featureDir = new Path(s"$root/$feature")
    // candidate bucket dirs live under files_v*/__b=*; a dir is reclaimable
    // iff NO retained manifest references it
    val dead = fs.listStatus(featureDir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("files_v"))
      .flatMap { vdir =>
        fs.listStatus(vdir.getPath).toSeq.filter(_.isDirectory)
          .map(b => s"${vdir.getPath.getName}/${b.getPath.getName}")
      }
      .filterNot(live)
    dead.foreach(rel => fs.delete(new Path(s"$root/$feature/$rel"), true))
    // drop files_vN roots with no remaining bucket DIRS so the layout stays
    // listable at scale (Spark leaves a _SUCCESS marker in every root, so an
    // emptiness check would never fire — the marker goes with the root)
    fs.listStatus(featureDir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("files_v"))
      .foreach { vdir =>
        if (!fs.listStatus(vdir.getPath).exists(_.isDirectory))
          fs.delete(vdir.getPath, true) }
    dead
  }

  /** CHANGE DATA FEED between two versions (the Delta CDF analogue):
    * returns the rows that changed with a `_change_type` column —
    * `insert`, `delete`, `update_preimage`, `update_postimage` — keyed on
    * the entity.
    *
    * Scale shape: the manifests say exactly WHICH buckets differ between
    * the versions (merge/append rewrite only touched buckets; untouched
    * buckets share file references), so the diff reads ONLY the changed
    * buckets of each version — at 100 TB a single-entity merge's change
    * feed reads 2/numBuckets of the table, not two full snapshots. Within
    * the changed buckets, one full-outer join on the entity key classifies
    * rows; non-key columns are compared by a null-safe xxhash64 fingerprint
    * over the UNION of both versions' columns (schema evolution: a column
    * absent in the older version fingerprints as NULL there, so a row that
    * gained a value registers as an update).
    *
    * Both versions must be at or above the vacuum horizon and hash-bucketed
    * (fails loudly otherwise, like every versioned read here). Defined for
    * tables under the one-row-per-key upsert discipline ([[merge]]'s
    * contract); duplicate keys accumulated via [[appendBucketed]] multiply
    * through the key join — dedupe first. */
  def changes(feature: String, entityKeys: Seq[String],
              fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion < toVersion,
      s"changes needs fromVersion < toVersion, got $fromVersion >= $toVersion")
    val vFrom = resolveVersion(feature, Some(fromVersion))
    val vTo = resolveVersion(feature, Some(toVersion))
    require(clusteredBy(feature, vFrom).isEmpty && clusteredBy(feature, vTo).isEmpty,
      s"feature $feature has a Z-order clustered endpoint; CDF needs hash-bucketed versions")
    val mFrom = readManifest(feature, vFrom)
    val mTo = readManifest(feature, vTo)
    val changedBuckets = (mFrom.keySet ++ mTo.keySet)
      .filter(b => mFrom.get(b) != mTo.get(b))
    val relsFrom = mFrom.filter(t => changedBuckets(t._1)).values.flatten.toSeq
    val relsTo = mTo.filter(t => changedBuckets(t._1)).values.flatten.toSeq

    // nothing rewritten between the versions: empty feed with the TO schema
    if (changedBuckets.isEmpty)
      return read(feature, entityKeys, Some(vTo)).limit(0)
        .withColumn("_change_type", lit(""))

    val oldRows = if (relsFrom.isEmpty) None else Some(readPaths(feature, vFrom, relsFrom))
    val newRows = if (relsTo.isEmpty) None else Some(readPaths(feature, vTo, relsTo))
    // output schema = the TO version's schema (+ _change_type); preimages of
    // dropped columns are reported under the to-schema with nulls
    val toCols: Seq[String] = newRows.orElse(oldRows).map(_.columns.toSeq).getOrElse(Seq.empty)
      .filterNot(_ == "__b")
    def aligned(df: DataFrame, all: Seq[String]): DataFrame =
      df.select(all.map(c => if (df.columns.contains(c)) col(c) else lit(null).as(c)): _*)
    val allCols: Seq[String] =
      (oldRows.map(_.columns.toSeq).getOrElse(Seq.empty) ++
        newRows.map(_.columns.toSeq).getOrElse(Seq.empty))
        .distinct.filterNot(_ == "__b")
    val nonKey = allCols.filterNot(entityKeys.contains)
    // same null-safety rule as Versioning.dataHash: xxhash64 passes the seed
    // through on NULL, which alone would make (NULL, x) ≡ (x, NULL) — the
    // interleaved isNull flags pin every column position in the fold
    def fp(df: DataFrame): DataFrame =
      df.withColumn("__fp",
        if (nonKey.isEmpty) lit(0L)
        else xxhash64(nonKey.sorted.flatMap(c => Seq(col(c).isNull, col(c))): _*))
    val empty = aligned(newRows.orElse(oldRows).get, allCols).limit(0)
    val o = fp(oldRows.map(aligned(_, allCols)).getOrElse(empty))
      .select((entityKeys.map(col) :+ struct((nonKey.map(col) :+ col("__fp")): _*).as("__o")): _*)
    val n = fp(newRows.map(aligned(_, allCols)).getOrElse(empty))
      .select((entityKeys.map(col) :+ struct((nonKey.map(col) :+ col("__fp")): _*).as("__n")): _*)
    val joined = o.join(n, entityKeys, "full_outer")
    def emit(side: org.apache.spark.sql.Column, kind: String) =
      (entityKeys.map(col) ++ nonKey.map(c => side.getField(c).as(c)) :+
        lit(kind).as("_change_type"))
    val inserts = joined.where(col("__o").isNull)
      .select(emit(col("__n"), "insert"): _*)
    val deletes = joined.where(col("__n").isNull)
      .select(emit(col("__o"), "delete"): _*)
    val updated = joined.where(col("__o").isNotNull && col("__n").isNotNull &&
      col("__o").getField("__fp") =!= col("__n").getField("__fp"))
    val pre = updated.select(emit(col("__o"), "update_preimage"): _*)
    val post = updated.select(emit(col("__n"), "update_postimage"): _*)
    inserts.unionByName(deletes).unionByName(pre).unionByName(post)
      .select((toCols.map(col) :+ col("_change_type")): _*)
  }

  // ---- incremental CDF consumption ----------------------------------------
  // The consumer side of [[changes]]: a named durable cursor per downstream
  // pipeline, so each poll emits exactly the changes since the consumer's
  // last COMMITTED position. Two-phase by design — pollChanges never moves
  // the cursor; the consumer processes the feed, then calls advanceCursor
  // with the returned toVersion. A crash between the two replays the same
  // feed on the next poll (at-least-once, the same contract as the
  // checkpointed ingest loops; pair with idempotent downstream writes).

  private def cursorFile(feature: String, cursor: String) = {
    require(cursor.nonEmpty && cursor.forall(c => c.isLetterOrDigit || c == '_' || c == '-'),
      s"cursor name must be [A-Za-z0-9_-]+, got '$cursor'")
    new Path(logDir(feature), s"_cursor_$cursor")
  }

  /** Committed position of `cursor` (None = never advanced). */
  def cursorPosition(feature: String, cursor: String): Option[Long] =
    readSmall(cursorFile(feature, cursor)).map(_.trim.toLong)

  /** Changes since the cursor's committed position, up to the latest
    * version. First poll (no committed position) emits the CURRENT snapshot
    * as `insert` rows — the bootstrap a brand-new consumer needs. Returns
    * (feed, toVersion); an already-caught-up consumer gets an empty feed
    * with toVersion = its position. Commit with [[advanceCursor]] AFTER
    * processing. */
  def pollChanges(feature: String, entityKeys: Seq[String],
                  cursor: String): (DataFrame, Long) = {
    val latest = latestVersion(feature)
      .getOrElse(throw new IllegalArgumentException(s"feature $feature has no versions"))
    cursorPosition(feature, cursor) match {
      case None =>
        (read(feature, entityKeys, Some(latest)).drop("__b")
          .withColumn("_change_type", lit("insert")), latest)
      case Some(pos) if pos >= latest =>
        (read(feature, entityKeys, Some(latest)).limit(0)
          .withColumn("_change_type", lit("")), pos)
      case Some(pos) =>
        (changes(feature, entityKeys, pos, latest), latest)
    }
  }

  /** Commit a consumer position. Monotone: moving a cursor backwards is
    * refused (it would silently re-deliver already-committed history —
    * reset by deleting the cursor file deliberately, not by accident). */
  def advanceCursor(feature: String, cursor: String, toVersion: Long): Unit = {
    cursorPosition(feature, cursor).foreach { pos =>
      require(toVersion >= pos,
        s"cursor $cursor at $pos cannot move backwards to $toVersion")
    }
    writeSmall(cursorFile(feature, cursor), toVersion.toString)
  }

  /** Fraction of the table a merge of `updates` would rewrite (observability
    * for the 100 TB story). */
  def rewriteFraction(feature: String, updates: DataFrame, entityKeys: Seq[String]): Double = {
    val touched = updates.withColumn("__b", bucketCol(entityKeys))
      .select("__b").distinct().count()
    touched.toDouble / numBuckets
  }
}

object BucketedStore {
  // ---- session metadata cache ----------------------------------------------
  // JVM-wide caches for IMMUTABLE version-keyed artifacts (the Delta/Iceberg
  // snapshot-cache analogue). INVALIDATION CONTRACT:
  //  * A version's manifest, stats sidecar and file set never change after
  //    the manifest commit (manifest-last protocol; merge/append/compact
  //    always create a NEW version) — so (root, feature, version)-keyed
  //    entries can never go stale under the store's own API.
  //  * Concurrent writers only ADD versions. Version RESOLUTION
  //    (versions()/latestVersion/vacuumHorizon) is deliberately NOT cached:
  //    every read re-lists the log dir, so a version committed by another
  //    writer (or a horizon moved by a concurrent vacuum) is visible
  //    immediately.
  //  * vacuum() deletes data files but never rewrites manifests; a read of
  //    a reclaimed version fails loudly at scan time with or without the
  //    cache (and resolveVersion's horizon check reads the live marker).
  //  * Out of contract: an external process deleting a store root and
  //    recreating different content at the same path while this JVM holds
  //    entries for it. Recreation through THIS JVM's API is covered —
  //    writeManifest refreshes/invalidates the keys it commits.
  private[core] val manifestCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, Long), Map[Int, Seq[String]]]
  private[core] val statsCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, Long), Map[Int, Map[String, (Double, Double)]]]
  private[core] val mergedSchemaCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, Long, String), org.apache.spark.sql.types.StructType]

  // Checkpoint row layout (the open Delta checkpoint schema, minimal
  // columns): one action per row, the others null. Top-level case classes so
  // Spark's product encoder derives the nullable-struct schema.
  case class CkptFormat(provider: String, options: Map[String, String])
  case class CkptProtocol(minReaderVersion: Int, minWriterVersion: Int)
  case class CkptMetaData(id: String, format: CkptFormat, schemaString: String,
      partitionColumns: Seq[String], configuration: Map[String, String],
      createdTime: Long)
  case class CkptAdd(path: String, partitionValues: Map[String, String],
      size: Long, modificationTime: Long, dataChange: Boolean, stats: String)
  case class CkptRow(protocol: Option[CkptProtocol],
      metaData: Option[CkptMetaData], add: Option[CkptAdd])
}
