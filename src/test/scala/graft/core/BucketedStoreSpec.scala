package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  test("file-level merge rewrites only touched buckets; untouched files are shared across versions") {
    val store = new BucketedStore(tmpDir("bstore"), numBuckets = 16)
    val base = (1L to 1000L).map(i => (i, s"name$i", i * 1.0)).toDF("id", "name", "score")
    store.write(base, "f", Seq("id"))

    // update 3 entities → at most 3 of 16 buckets rewritten
    val updates = Seq((5L, "FIVE", 5.5), (6L, "SIX", 6.6), (700L, "SEVEN", 7.7))
      .toDF("id", "name", "score")
    assert(store.rewriteFraction("f", updates, Seq("id")) <= 3.0 / 16)
    store.merge("f", updates, Seq("id"))

    // correctness: upserted rows replaced, everything else intact
    val cur = store.read("f", Seq("id"))
    assert(cur.count() == 1000)
    assert(cur.filter($"id" === 5L).select("name").as[String].head() == "FIVE")
    assert(cur.filter($"id" === 10L).select("name").as[String].head() == "name10")

    // time travel: version 0 still has the original rows
    val v0 = store.read("f", Seq("id"), asOfVersion = Some(0))
    assert(v0.filter($"id" === 5L).select("name").as[String].head() == "name5")

    // file sharing: the two manifests agree on every untouched bucket path
    val m0 = scala.io.Source.fromFile(s"${store.root}/f/_graft_log/0.json").mkString
    val m1 = scala.io.Source.fromFile(s"${store.root}/f/_graft_log/1.json").mkString
    def paths(s: String) = "\"([0-9]+)\": \"([^\"]+)\"".r.findAllMatchIn(s)
      .map(m => m.group(1).toInt -> m.group(2)).toMap
    val (p0, p1) = (paths(m0), paths(m1))
    val shared = p1.filter { case (b, p) => p0.get(b).contains(p) }
    assert(shared.size >= 13, s"expected >=13 of 16 buckets shared, got ${shared.size}")
    assert(shared.values.forall(_.startsWith("files_v0/")), "shared buckets must reference v0 files")
  }

  test("point lookup reads a single bucket and returns the row") {
    val store = new BucketedStore(tmpDir("bstore"), numBuckets = 16)
    val base = (1L to 500L).map(i => (i, s"name$i")).toDF("id", "name")
    store.write(base, "f", Seq("id"))
    val hit = store.lookup("f", Seq("id"), Seq(42L))
    assert(hit.select("name").as[String].collect().toSeq == Seq("name42"))
    // reads one bucket: scanned files come from exactly one __b dir
    val files = hit.inputFiles
    assert(files.nonEmpty && files.map(_.split("/__b=")(1).split("/")(0)).distinct.length == 1, files.toSeq)
    // lookup after merge sees the update
    store.merge("f", Seq((42L, "FORTY-TWO")).toDF("id", "name"), Seq("id"))
    assert(store.lookup("f", Seq("id"), Seq(42L)).select("name").as[String].head() == "FORTY-TWO")
  }

  test("new entities land in their buckets; merge into missing feature fails loudly") {
    val store = new BucketedStore(tmpDir("bstore"), numBuckets = 4)
    store.write(Seq((1L, "a")).toDF("id", "x"), "g", Seq("id"))
    store.merge("g", Seq((2L, "b"), (3L, "c")).toDF("id", "x"), Seq("id"))
    assert(store.read("g", Seq("id")).count() == 3)
    intercept[IllegalArgumentException](
      store.merge("nope", Seq((1L, "a")).toDF("id", "x"), Seq("id")))
  }

  test("scanPruned reads only the bucket files whose min/max intersects the range") {
    val store = new BucketedStore(tmpDir("bstats"), numBuckets = 4)
    // craft values DISJOINT per bucket: v = bucket(id)*1000 + id, computing
    // the bucket with the same hash the store uses, so each file's [min,max]
    // is a distinct thousand-band and pruning is observable
    val df = spark.range(100).select(col("id"))
      .withColumn("b", pmod(xxhash64(col("id")), lit(4)).cast("int"))
      .select(col("id"), (col("b") * 1000 + col("id")).cast("double").as("v"))
    store.write(df, "s", Seq("id"), statsCols = Seq("v"))

    val banded = df.collect().map(r => (r.getLong(0), r.getDouble(1)))
    val expect = banded.filter { case (_, v) => v >= 2000 && v <= 2999 }.toSet
    val pruned = store.scanPruned("s", Seq("id"), "v", 2000, 2999)
    assert(pruned.select("id", "v").as[(Long, Double)].collect().toSet == expect)
    // file skipping happened: every scanned file is the one 2xxx bucket dir
    val dirs = pruned.inputFiles.map(_.split("/__b=")(1).split("/")(0)).distinct
    assert(dirs.length == 1, s"read ${dirs.toSeq}, wanted 1 bucket")

    // empty intersection: zero files, schema intact
    val none = store.scanPruned("s", Seq("id"), "v", 99999, 100000)
    assert(none.count() == 0 && none.columns.contains("v"))
    // untracked column: conservative full read, still correct
    val all = store.scanPruned("s", Seq("id"), "id", 10, 20)
    assert(all.count() == 11)
  }

  test("lookup routing is bit-identical to writer routing for non-Long key types") {
    // INT key column: a caller passing a Scala Int OR a Long must land on the
    // same bucket the writer's xxhash64(IntegerType) routed the row to —
    // xxhash64 hashes by type, so the literal is cast to the STORED type
    val store = new BucketedStore(tmpDir("btypes"), numBuckets = 16)
    val ints = (1 to 500).map(i => (i, s"name$i")).toDF("id", "name")
    store.write(ints, "fi", Seq("id"))
    assert(store.lookup("fi", Seq("id"), Seq(42)).select("name").as[String]
      .collect().toSeq == Seq("name42"), "Int literal for Int column")
    assert(store.lookup("fi", Seq("id"), Seq(42L)).select("name").as[String]
      .collect().toSeq == Seq("name42"), "Long literal for Int column (cast to stored type)")
    // LONG key column, Int literal — the exact silent-miss case from ADVICE
    val longs = (1L to 500L).map(i => (i, s"name$i")).toDF("id", "name")
    store.write(longs, "fl", Seq("id"))
    assert(store.lookup("fl", Seq("id"), Seq(42)).select("name").as[String]
      .collect().toSeq == Seq("name42"), "Int literal for Long column")
    // STRING key column for good measure
    val strs = (1 to 200).map(i => (s"key$i", i)).toDF("id", "n")
    store.write(strs, "fs", Seq("id"))
    assert(store.lookup("fs", Seq("id"), Seq("key42")).select("n").as[Int]
      .collect().toSeq == Seq(42))
  }

  test("scanPrunedMulti: conjunctive 2-column predicate reads fewer files than either alone") {
    val store = new BucketedStore(tmpDir("bmulti"), numBuckets = 8)
    // two stats columns with DIFFERENT bucket->band layouts: v bands by
    // bucket, w bands by bucket reversed — a (v, w) conjunction can only be
    // satisfied where both keep-sets intersect
    val df = spark.range(400).select(col("id"))
      .withColumn("b", pmod(xxhash64(col("id")), lit(8)).cast("int"))
      .select(col("id"),
        (col("b") * 1000 + col("id")).cast("double").as("v"),
        ((lit(7) - col("b")) * 1000 + col("id")).cast("double").as("w"))
    store.write(df, "m", Seq("id"), statsCols = Seq("v", "w"))

    def nFiles(d: org.apache.spark.sql.DataFrame) =
      d.inputFiles.map(_.split("/__b=")(1).split("/")(0)).distinct.length
    // v in bucket-3 band AND w in bucket-5 band: disjoint buckets -> 0 rows,
    // and the conjunction proves it from stats alone (no files read)
    val disjoint = store.scanPrunedMulti("m", Seq("id"),
      Seq(("v", 3000.0, 3999.0), ("w", 2000.0, 2999.0)))
    assert(disjoint.count() == 0)
    // v band selects bucket 3; w band for the SAME bucket (w = (7-3)*1000+id)
    // agrees -> exactly that bucket's file, same as single-column pruning
    val oneV = store.scanPruned("m", Seq("id"), "v", 3000.0, 3999.0)
    val both = store.scanPrunedMulti("m", Seq("id"),
      Seq(("v", 3000.0, 3999.0), ("w", 4000.0, 4999.0)))
    assert(nFiles(both) == 1 && nFiles(oneV) == 1)
    assert(both.select("id").as[Long].collect().toSet ==
      oneV.select("id").as[Long].collect().toSet)
    // a WIDE v range (all buckets) + narrow w range: the second column does
    // the pruning — strictly fewer files than the v-only scan
    val wideV = store.scanPruned("m", Seq("id"), "v", 0.0, 8000.0)
    val narrowed = store.scanPrunedMulti("m", Seq("id"),
      Seq(("v", 0.0, 8000.0), ("w", 4000.0, 4999.0)))
    assert(nFiles(narrowed) == 1 && nFiles(wideV) == 8,
      s"conjunction read ${nFiles(narrowed)}, v-only read ${nFiles(wideV)}")
    // correctness: conjunction == full read + both predicates
    val expect = df.where(col("v").between(0.0, 8000.0) && col("w").between(4000.0, 4999.0))
      .select("id").as[Long].collect().toSet
    assert(narrowed.select("id").as[Long].collect().toSet == expect)
  }

  test("writeClustered: Z-order layout prunes multi-column ranges that hash bucketing cannot") {
    // two INDEPENDENT pseudo-uniform columns: under hash bucketing every
    // bucket's [min,max] spans ~the full range of both (nothing prunes);
    // under Z-order clustering a conjunctive box predicate touches only the
    // files whose z-range intersects the box
    val df = spark.range(8000).select(col("id"),
      (col("id") % 100).cast("double").as("v"),
      ((col("id") * 7919) % 100).cast("double").as("w"))
    val ranges = Seq(("v", 0.0, 24.0), ("w", 0.0, 24.0))
    def nFiles(d: org.apache.spark.sql.DataFrame) =
      d.inputFiles.map(_.split("/__b=")(1).split("/")(0)).distinct.length

    val hashStore = new BucketedStore(tmpDir("bzh"), numBuckets = 16)
    hashStore.write(df, "t", Seq("id"), statsCols = Seq("v", "w"))
    val hashScan = hashStore.scanPrunedMulti("t", Seq("id"), ranges)

    val zStore = new BucketedStore(tmpDir("bzz"), numBuckets = 16)
    zStore.writeClustered(df, "t", Seq("id"), clusterCols = Seq("v", "w"))
    assert(zStore.clusteredBy("t", 0) == Seq("v", "w"))
    val zScan = zStore.scanPrunedMulti("t", Seq("id"), ranges)

    // identical results...
    val expect = df.where(col("v") <= 24.0 && col("w") <= 24.0)
      .select("id").as[Long].collect().toSet
    assert(hashScan.select("id").as[Long].collect().toSet == expect)
    assert(zScan.select("id").as[Long].collect().toSet == expect)
    // ...but the clustered layout actually skips files: a quarter-by-quarter
    // box covers ~1/16 of the z-space — at most a third of the 16 files even
    // with bin-boundary slop, while the hash layout reads all of them
    assert(nFiles(hashScan) == 16, s"hash layout read ${nFiles(hashScan)}")
    assert(nFiles(zScan) <= 5, s"z layout read ${nFiles(zScan)} of 16 files")

    // clustered files stay balanced under equi-depth binning (no empty/giant
    // file skew): every file within 3x of the mean row count
    val sizes = zStore.read("t", Seq("id"))
      .groupBy(input_file_name()).count().select("count").as[Long].collect()
    assert(sizes.length >= 8, s"expected >=8 non-empty files, got ${sizes.length}")
    assert(sizes.max <= 3 * (8000 / sizes.length), s"skewed file sizes: ${sizes.toSeq}")

    // hash-routed ops on a clustered version fail loudly instead of mis-routing
    intercept[IllegalArgumentException](zStore.lookup("t", Seq("id"), Seq(7L)))
    intercept[IllegalArgumentException](
      zStore.merge("t", Seq((1L, 1.0, 1.0)).toDF("id", "v", "w"), Seq("id")))
  }

  test("optimizeZorder + vacuum: maintenance cycle re-clusters the table and reclaims dead files") {
    val store = new BucketedStore(tmpDir("bmaint"), numBuckets = 8)
    val df = spark.range(2000).select(col("id"),
      (col("id") % 50).cast("double").as("v"),
      ((col("id") * 7919) % 50).cast("double").as("w"))
    store.write(df, "t", Seq("id"), statsCols = Seq("v", "w"))
    store.merge("t", Seq((7L, 1.0, 1.0)).toDF("id", "v", "w"), Seq("id"))

    // OPTIMIZE: new clustered version; content identical, layout clustered
    val v = store.optimizeZorder("t", Seq("id"), Seq("v", "w"))
    assert(store.clusteredBy("t", v) == Seq("v", "w"))
    val expect = df.where(col("id") =!= 7L).select("id").as[Long].collect().toSet + 7L
    assert(store.read("t", Seq("id")).select("id").as[Long].collect().toSet == expect)
    // the clustered layout prunes a 2-col box the hash layout couldn't
    val box = Seq(("v", 0.0, 9.0), ("w", 0.0, 9.0))
    val nBefore = store.scanPrunedMulti("t", Seq("id"), box, asOfVersion = Some(1))
      .inputFiles.map(_.split("/__b=")(1).split("/")(0)).distinct.length
    val nAfter = store.scanPrunedMulti("t", Seq("id"), box)
      .inputFiles.map(_.split("/__b=")(1).split("/")(0)).distinct.length
    assert(nAfter < nBefore, s"clustered scan read $nAfter vs hash $nBefore")

    // VACUUM keeping only the clustered version: v0/v1 bucket dirs reclaimed,
    // latest fully readable, manifests still on disk for audit
    val deleted = store.vacuum("t", keepVersions = 1)
    assert(deleted.nonEmpty && deleted.forall(p => p.startsWith("files_v0/") || p.startsWith("files_v1/")))
    assert(store.read("t", Seq("id")).count() == 2000)
    assert(store.versions("t") == Seq(0L, 1L, 2L))
    // below the horizon the data is gone (that's the documented trade)
    intercept[Exception](store.read("t", Seq("id"), asOfVersion = Some(0)).count())
    // idempotent: nothing left to reclaim
    assert(store.vacuum("t", keepVersions = 1).isEmpty)
  }

  test("merge recomputes stats for rewritten buckets and carries the rest") {
    val store = new BucketedStore(tmpDir("bstats2"), numBuckets = 4)
    val df = spark.range(100).select(col("id"))
      .withColumn("b", pmod(xxhash64(col("id")), lit(4)).cast("int"))
      .select(col("id"), (col("b") * 1000 + col("id")).cast("double").as("v"))
    store.write(df, "s", Seq("id"), statsCols = Seq("v"))
    // push id=7's value far outside its bucket's old band
    store.merge("s", Seq((7L, 500000.0)).toDF("id", "v"), Seq("id"))
    val hit = store.scanPruned("s", Seq("id"), "v", 499999, 500001)
    assert(hit.select("id").as[Long].collect().toSeq == Seq(7L))
    // the rewritten bucket's max widened to 500000, so only bands BELOW its
    // min can still prove disjointness — query one of those and expect one file
    val b7 = spark.range(1).select(pmod(xxhash64(lit(7L)), lit(4)).cast("int")).head().getInt(0)
    val (target, expectDirs) =
      if (b7 >= 1) (b7 - 1, 1) // below the widened bucket: prunes to 1 file
      else (1, 2)              // widened bucket is band 0: overlaps everything
    val band = store.scanPruned("s", Seq("id"), "v", target * 1000.0, target * 1000.0 + 999)
    val dirs = band.inputFiles.map(_.split("/__b=")(1).split("/")(0)).distinct
    assert(dirs.length == expectDirs, s"read ${dirs.toSeq}, wanted $expectDirs")
  }

  test("appendBucketed + compactBuckets: O(batch) growth, widened stats, fold-back, vacuum") {
    val store = new BucketedStore(tmpDir("bappend"), numBuckets = 8)
    val base = spark.range(800).select(col("id"), (col("id") % 100).cast("double").as("v"))
    store.write(base, "t", Seq("id"), statsCols = Seq("v"))

    // append a small batch with an OUT-OF-RANGE stats value
    val batch = Seq((9001L, 5000.0), (9002L, 5001.0)).toDF("id", "v")
    store.appendBucketed("t", batch, Seq("id"))
    // content: union, no rewrite of untouched buckets (their v0 dirs remain
    // the only entry)
    assert(store.read("t", Seq("id")).count() == 802)
    val m1 = scala.io.Source.fromFile(s"${store.root}/t/_graft_log/1.json").mkString
    val entries = "\"([0-9]+)\": \"([^\"]+)\"".r.findAllMatchIn(m1)
      .map(m => m.group(1).toInt -> m.group(2).split(';').toSeq).toMap
    assert(entries.values.count(_.size > 1) <= 2, s"more buckets touched than batch rows: $entries")
    assert(entries.values.count(_.size > 1) >= 1)
    assert(entries.values.flatten.count(_.startsWith("files_v0/")) == 8,
      "append must keep every v0 dir referenced")
    // lookup sees appended rows through the multi-dir bucket
    assert(store.lookup("t", Seq("id"), Seq(9001L)).select("v").as[Double]
      .collect().toSeq == Seq(5000.0))
    // stats widened: the 5000-range scan finds the appended rows
    val hit = store.scanPruned("t", Seq("id"), "v", 4999.0, 5002.0)
    assert(hit.select("id").as[Long].collect().toSet == Set(9001L, 9002L))

    // compact folds multi-dir buckets back to one; content and stats survive
    val vC = store.compactBuckets("t", Seq("id"))
    val mC = scala.io.Source.fromFile(s"${store.root}/t/_graft_log/$vC.json").mkString
    assert(!mC.contains(";"), s"compacted manifest still multi-dir: $mC")
    assert(store.read("t", Seq("id")).count() == 802)
    assert(store.scanPruned("t", Seq("id"), "v", 4999.0, 5002.0)
      .select("id").as[Long].collect().toSet == Set(9001L, 9002L))
    // idempotent no-op when nothing is multi-dir
    assert(store.compactBuckets("t", Seq("id")) == vC)
    // vacuum keeps the compacted layout readable
    store.vacuum("t", keepVersions = 1)
    assert(store.read("t", Seq("id")).count() == 802)
  }

  test("stats stay sound under NaN values; merge rejects duplicate-key batches; schema widens through append+compact") {
    val store = new BucketedStore(tmpDir("bedge"), numBuckets = 4)
    // one NaN row must not poison its bucket's max (which would prune away
    // real matches); the NaN row itself is range-unmatchable
    val df = spark.range(100).select(col("id"),
      when(col("id") === 7, lit(Double.NaN)).otherwise(col("id").cast("double")).as("v"))
    store.write(df, "t", Seq("id"), statsCols = Seq("v"))
    val hit = store.scanPruned("t", Seq("id"), "v", 50.0, 60.0)
    assert(hit.select("id").as[Long].collect().toSet == (50L to 60L).toSet)

    // merge with duplicate keys in the batch = silent double-row corruption;
    // must fail loudly instead
    intercept[IllegalArgumentException](
      store.merge("t", Seq((7L, 1.0), (7L, 2.0)).toDF("id", "v"), Seq("id")))

    // a widening append (new column) + compact must not lose the column to
    // single-footer schema inference
    store.appendBucketed("t",
      Seq((9001L, 1.0, "extra")).toDF("id", "v", "note"), Seq("id"))
    store.compactBuckets("t", Seq("id"))
    val out = store.read("t", Seq("id"))
    assert(out.columns.contains("note"), out.columns.mkString(","))
    assert(out.where(col("id") === 9001L).select("note").as[String]
      .collect().toSeq == Seq("extra"))
    assert(out.count() == 101)
  }

  test("delta-log add actions carry per-file min/max stats in the open layout") {
    val store = new BucketedStore(tmpDir("bdstats"), numBuckets = 4)
    val df = spark.range(100).select(col("id"),
      (col("id") * 2).cast("double").as("v"))
    store.write(df, "f", Seq("id"), statsCols = Seq("v"))
    val adds = scala.io.Source.fromFile(f"${store.root}/f/_delta_log/${0L}%020d.json")
      .getLines().filter(_.contains(""""add":{""")).toSeq
    assert(adds.nonEmpty)
    adds.foreach { a =>
      // the stats field is a JSON STRING (escaped) per the Delta spec
      val m = """"stats":"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(a)
        .getOrElse(fail(s"no stats in $a"))
      val stats = m.group(1).replace("\\\"", "\"")
      assert(stats.contains(""""minValues":{"v":""") &&
        stats.contains(""""maxValues":{"v":"""), stats)
    }
    // untracked write: adds carry no stats field, log still well-formed
    store.write(df.select("id"), "g", Seq("id"))
    val g = scala.io.Source.fromFile(f"${store.root}/g/_delta_log/${0L}%020d.json")
      .getLines().filter(_.contains(""""add":{""")).toSeq
    assert(g.nonEmpty && g.forall(!_.contains(""""stats"""")))
  }

  test("delta-log probe: commit JSONs mirror the manifest and replay to the live file set") {
    val store = new BucketedStore(tmpDir("bdelta"), numBuckets = 8)
    val base = (1L to 400L).map(i => (i, s"name$i")).toDF("id", "name")
    store.write(base, "f", Seq("id"))
    store.merge("f", Seq((42L, "FORTY-TWO"), (300L, "THREE")).toDF("id", "name"), Seq("id"))

    def actions(v: Long): Seq[String] = {
      val p = f"${store.root}/f/_delta_log/$v%020d.json"
      scala.io.Source.fromFile(p).getLines().toSeq
    }
    def field(line: String, key: String): String =
      s""""$key":"((?:[^"\\\\]|\\\\.)*)"""".r.findFirstMatchIn(line).map(_.group(1))
        .getOrElse(fail(s"no $key in $line"))

    // v0: protocol, metaData (schemaString parses back to a Spark schema,
    // partitioned by __b), one add per manifest bucket, every path live
    val v0 = actions(0)
    assert(v0.head.contains(""""protocol":{"minReaderVersion":1"""))
    val meta = v0(1)
    assert(meta.contains(""""partitionColumns":["__b"]"""))
    val schemaStr = field(meta, "schemaString").replace("\\\"", "\"")
    val parsed = org.apache.spark.sql.types.DataType.fromJson(schemaStr)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(parsed.fieldNames.toSet == Set("id", "name", "__b"), parsed.treeString)
    val adds0 = v0.drop(2)
    assert(adds0.forall(_.contains(""""add":{""")))
    adds0.foreach { a =>
      assert(new java.io.File(s"${store.root}/f/${field(a, "path")}").exists(), a)
    }

    // v1 (merge): adds for rewritten buckets, removes for the replaced files
    val v1 = actions(1)
    val adds1 = v1.filter(_.contains(""""add":{"""))
    val removes1 = v1.filter(_.contains(""""remove":{"""))
    assert(adds1.nonEmpty && removes1.nonEmpty)
    assert(removes1.forall(r => field(r, "path").startsWith("files_v0/")))

    // replaying the log (v0 adds + v1 adds - v1 removes) reconstructs
    // EXACTLY the file set the native v1 manifest references
    val replayed = (adds0 ++ adds1).map(field(_, "path")).toSet --
      removes1.map(field(_, "path")).toSet
    val m1 = scala.io.Source.fromFile(s"${store.root}/f/_graft_log/1.json").mkString
    val manifestDirs = "\"([0-9]+)\": \"([^\"]+)\"".r.findAllMatchIn(m1)
      .map(_.group(2)).toSet
    val live = manifestDirs.flatMap { rel =>
      new java.io.File(s"${store.root}/f/$rel").listFiles()
        .filter(_.getName.startsWith("part-")).map(f => s"$rel/${f.getName}")
    }
    assert(replayed == live, s"replayed ${replayed.size} vs live ${live.size}")
  }

  test("changes: CDF between versions reads only rewritten buckets; insert/update/delete classified") {
    val store = new BucketedStore(tmpDir("bcdf"), numBuckets = 8)
    val base = (1L to 400L).map(i => (i, s"name$i")).toDF("id", "name")
    store.write(base, "f", Seq("id"))                                    // v0
    store.merge("f", Seq((42L, "FORTY-TWO"), (998L, "NEW")).toDF("id", "name"), Seq("id")) // v1
    val cdf = store.changes("f", Seq("id"), 0L, 1L)
    val rows = cdf.select("id", "name", "_change_type")
      .as[(Long, String, String)].collect().toSet
    assert(rows == Set(
      (998L, "NEW", "insert"),
      (42L, "name42", "update_preimage"),
      (42L, "FORTY-TWO", "update_postimage")),
      s"unexpected feed: $rows")
    // file-level bound: the feed reads only the rewritten buckets' files of
    // the two versions, never the untouched snapshot
    val touched = cdf.inputFiles.map(_.split("/__b=")(1).split("/")(0)).distinct
    assert(touched.length <= 2 * 2, s"CDF read ${touched.length} buckets for a 2-key merge")
    // identical versions adjacent: merging an EQUAL row is an update by
    // hash only if the payload differs — re-merging the same value emits
    // nothing for that key
    store.merge("f", Seq((42L, "FORTY-TWO"), (999L, "X")).toDF("id", "name"), Seq("id")) // v2
    val cdf2 = store.changes("f", Seq("id"), 1L, 2L)
      .select("id", "_change_type").as[(Long, String)].collect().toSet
    assert(cdf2 == Set((999L, "insert")), s"re-merged equal row must not appear: $cdf2")
    // schema evolution: v3 adds column w for one key — the feed carries the
    // TO schema and the gained value registers as an update
    store.merge("f", Seq((7L, "name7", 3.5)).toDF("id", "name", "w"), Seq("id")) // v3
    val cdf3 = store.changes("f", Seq("id"), 2L, 3L)
    assert(cdf3.columns.toSet == Set("id", "name", "w", "_change_type"))
    val r3 = cdf3.select("id", "_change_type").as[(Long, String)].collect().toSet
    assert(r3 == Set((7L, "update_preimage"), (7L, "update_postimage")), r3.toString)
    // a full write that drops rows surfaces them as deletes
    store.write(base.where(col("id") <= 100), "f", Seq("id"))            // v4
    val del = store.changes("f", Seq("id"), 3L, 4L)
      .where(col("_change_type") === "delete").count()
    assert(del == 302, s"expected 300 base deletes + 998/999 inserts gone, got $del")
    // no changes between a version and itself-equivalent span: empty feed
    assert(store.changes("f", Seq("id"), 0L, 1L).count() == 3)
  }

  test("pollChanges: durable cursor delivers each change once; crash before advance replays") {
    val store = new BucketedStore(tmpDir("bpoll"), numBuckets = 8)
    store.write((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"), "f", Seq("id")) // v0
    // first poll: bootstrap snapshot as inserts
    val (boot, to0) = store.pollChanges("f", Seq("id"), "consumer_a")
    assert(to0 == 0L && boot.count() == 100 &&
      boot.select("_change_type").distinct().as[String].collect().toSeq == Seq("insert"))
    store.advanceCursor("f", "consumer_a", to0)
    // caught up: empty feed, position unchanged
    val (empty, toSame) = store.pollChanges("f", Seq("id"), "consumer_a")
    assert(toSame == 0L && empty.count() == 0)
    // two merges, then one poll: the feed spans BOTH versions
    store.merge("f", Seq((5L, "UPD5")).toDF("id", "v"), Seq("id"))   // v1
    store.merge("f", Seq((200L, "NEW")).toDF("id", "v"), Seq("id")) // v2
    val (feed, to2) = store.pollChanges("f", Seq("id"), "consumer_a")
    assert(to2 == 2L)
    val kinds = feed.select("id", "_change_type").as[(Long, String)].collect().toSet
    assert(kinds == Set((5L, "update_preimage"), (5L, "update_postimage"), (200L, "insert")), kinds.toString)
    // crash before advance: the SAME feed replays (at-least-once)
    val (replay, toR) = store.pollChanges("f", Seq("id"), "consumer_a")
    assert(toR == 2L &&
      replay.select("id", "_change_type").as[(Long, String)].collect().toSet == kinds)
    store.advanceCursor("f", "consumer_a", to2)
    assert(store.pollChanges("f", Seq("id"), "consumer_a")._1.count() == 0)
    // a SECOND consumer has its own independent cursor (bootstraps fresh)
    val (boot2, _) = store.pollChanges("f", Seq("id"), "consumer_b")
    assert(boot2.count() == 101)
    // cursors are monotone: accidental rewind is refused
    intercept[IllegalArgumentException](store.advanceCursor("f", "consumer_a", 0L))
  }

  test("delta checkpoint: 20-version table opens from checkpoint + tail commits only") {
    // checkpoint every 5 commits: a 20-version history must open from the
    // v20 checkpoint + 0 tail commits, not a 21-commit replay
    val store = new BucketedStore(tmpDir("bckpt"), numBuckets = 8,
      deltaCheckpointEvery = 5)
    val base = (1L to 400L).map(i => (i, s"name$i")).toDF("id", "name")
    store.write(base, "f", Seq("id"))                                   // v0
    (1 to 20).foreach { i =>                                            // v1..v20
      store.merge("f",
        Seq((i.toLong, s"UPD$i"), (200L + i, s"U$i")).toDF("id", "name"), Seq("id"))
    }
    val logDir = new java.io.File(s"${store.root}/f/_delta_log")
    // _last_checkpoint points at the newest multiple of 5
    val last = scala.io.Source.fromFile(new java.io.File(logDir, "_last_checkpoint")).mkString
    assert(last.contains("\"version\":20"), last)
    assert(new java.io.File(logDir, f"${20L}%020d.checkpoint.parquet").isFile)
    // the checkpoint parquet carries protocol + metaData + one add per live
    // file, with per-file stats where tracked
    val ck = spark.read.parquet(s"${store.root}/f/_delta_log/" + f"${20L}%020d" + ".checkpoint.parquet")
    assert(ck.where(col("protocol").isNotNull).count() == 1)
    assert(ck.where(col("metaData").isNotNull).count() == 1)
    val nAdds = ck.where(col("add").isNotNull).count()
    // replay FROM THE MIRROR ALONE: live set matches the native manifest,
    // and the replay read zero tail commits past the checkpoint
    val (live, commitsRead) = store.deltaLiveFiles("f")
    assert(commitsRead == 0, s"read $commitsRead tail commits, checkpoint should cover all")
    assert(live.size == nAdds.toInt)
    val native = store.read("f", Seq("id")).inputFiles
      .map(_.split("/f/").last).toSet
    assert(live == native, s"mirror live set ${live.size} != native ${native.size}")
    // two more commits: replay = checkpoint + exactly the 2 tail commits
    store.merge("f", Seq((999L, "tail1")).toDF("id", "name"), Seq("id")) // v21
    store.merge("f", Seq((998L, "tail2")).toDF("id", "name"), Seq("id")) // v22
    val (live2, commitsRead2) = store.deltaLiveFiles("f")
    assert(commitsRead2 == 2, s"expected 2 tail commits, read $commitsRead2")
    val native2 = store.read("f", Seq("id")).inputFiles
      .map(_.split("/f/").last).toSet
    assert(live2 == native2)
    // next multiple of 5 rolls the checkpoint forward
    (1 to 3).foreach(i =>
      store.merge("f", Seq((900L + i, s"x$i")).toDF("id", "name"), Seq("id"))) // v23..v25
    val last2 = scala.io.Source.fromFile(new java.io.File(logDir, "_last_checkpoint")).mkString
    assert(last2.contains("\"version\":25"), last2)
    assert(store.deltaLiveFiles("f")._2 == 0)
  }

  test("delta-log fidelity: maintenance commits are dataChange:false, schema evolution re-emits metaData, vacuum horizon fails loudly") {
    val store = new BucketedStore(tmpDir("bfidelity"), numBuckets = 4)
    val base = (1L to 200L).map(i => (i, i.toDouble)).toDF("id", "v")
    store.write(base, "f", Seq("id"))                                  // v0
    def actions(v: Long): Seq[String] = scala.io.Source
      .fromFile(f"${store.root}/f/_delta_log/$v%020d.json").getLines().toSeq

    // schema-EVOLVING merge (new column w): metaData is re-emitted with the
    // widened schema, as an external reader needs to pick up mid-log
    store.merge("f", Seq((5L, 5.0, "x")).toDF("id", "v", "w"), Seq("id")) // v1
    val meta1 = actions(1).filter(_.contains(""""metaData":{"""))
    assert(meta1.size == 1, "schema-evolving merge must re-emit metaData")
    assert(meta1.head.contains("\\\"w\\\""), meta1.head)
    // schema-PRESERVING merge: no metaData action
    store.merge("f", Seq((6L, 6.0, "y")).toDF("id", "v", "w"), Seq("id")) // v2
    assert(actions(2).forall(!_.contains(""""metaData":{""")))

    // append + compact: the compaction commit carries dataChange:false on
    // every action (a Delta streaming reader must not re-ingest the files)
    store.appendBucketed("f", Seq((901L, 1.0, "z")).toDF("id", "v", "w"), Seq("id")) // v3
    assert(actions(3).filter(_.contains(""""add":{"""))
      .forall(_.contains(""""dataChange":true""")))
    val v4 = store.compactBuckets("f", Seq("id"))
    assert(v4 == 4L)
    val acts4 = actions(4).filter(a => a.contains(""""add":{""") || a.contains(""""remove":{"""))
    assert(acts4.nonEmpty && acts4.forall(_.contains(""""dataChange":false""")), acts4.mkString("\n"))
    // OPTIMIZE ZORDER is likewise a logical no-op rewrite
    store.optimizeZorder("f", Seq("id"), Seq("v"))                     // v5
    val acts5 = actions(5).filter(a => a.contains(""""add":{""") || a.contains(""""remove":{"""))
    assert(acts5.nonEmpty && acts5.forall(_.contains(""""dataChange":false""")))

    // vacuum records its horizon; a read below it names the horizon instead
    // of failing deep in parquet path resolution
    store.vacuum("f", keepVersions = 1)
    assert(store.vacuumHorizon("f").contains(5L))
    val e = intercept[IllegalStateException](store.read("f", Seq("id"), asOfVersion = Some(1)))
    assert(e.getMessage.contains("vacuum horizon 5"), e.getMessage)
    assert(store.read("f", Seq("id")).count() == 201)
    // horizon is MONOTONE: after new versions land, a vacuum with a larger
    // keepVersions must NOT lower it below already-reclaimed versions
    // (v5 is clustered, so the new version is a full write, not a merge)
    store.write(base.toDF("id", "v"), "f", Seq("id"))                  // v6
    store.vacuum("f", keepVersions = 5)
    assert(store.vacuumHorizon("f").contains(5L),
      s"horizon dropped to ${store.vacuumHorizon("f")} — reads of reclaimed versions would pass the guard")
    intercept[IllegalStateException](store.read("f", Seq("id"), asOfVersion = Some(3)))
  }

  test("atomic cursors: publish/read roundtrip, latest-wins, append-only slots") {
    val store = new BucketedStore(tmpDir("bcur"), numBuckets = 4)
    assert(store.readCursor("trio").isEmpty)
    store.writeCursor("trio", "0\t0\t0")
    assert(store.readCursor("trio").contains("0\t0\t0"))
    // re-publication takes a NEW numbered slot; readers always see the
    // latest complete record (no delete window, no half-written file)
    store.writeCursor("trio", "1\t1\t1")
    store.writeCursor("trio", "2\t1\t2")
    assert(store.readCursor("trio").contains("2\t1\t2"))
    // independent cursor names don't interfere
    store.writeCursor("other", "x")
    assert(store.readCursor("trio").contains("2\t1\t2"))
    assert(store.readCursor("other").contains("x"))
    // crash recovery: a writer that died between claiming a slot and
    // renaming into it leaves an orphaned .lock; the next publish must
    // skip PAST it (readers tolerate the numbering gap) instead of
    // retrying the wedged slot forever
    val dir = new org.apache.hadoop.fs.Path(s"${store.root}/_cursor/trio")
    val hfs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.create(new org.apache.hadoop.fs.Path(dir, "3.lock"), false).close()
    store.writeCursor("trio", "4\t4\t4")
    assert(store.readCursor("trio").contains("4\t4\t4"),
      "an orphaned claim must not wedge the cursor")
    // orphan reaping: crash debris (.lock + writer-unique .tmp.<nonce>)
    // OLDER than the horizon is deleted; a LIVE (fresh) claim is untouched
    val orphanTmp = new org.apache.hadoop.fs.Path(dir, "3.tmp.deadbeef")
    hfs.create(orphanTmp, false).close()
    val old = System.currentTimeMillis() - 48L * 3600 * 1000
    hfs.setTimes(new org.apache.hadoop.fs.Path(dir, "3.lock"), old, old)
    hfs.setTimes(orphanTmp, old, old)
    val live = new org.apache.hadoop.fs.Path(dir, "9.lock") // a claim in flight
    hfs.create(live, false).close()
    val reaped = store.reapCursorLocks()
    assert(reaped.toSet == Set("_cursor/trio/3.lock", "_cursor/trio/3.tmp.deadbeef"),
      s"exactly the aged debris goes: $reaped")
    assert(hfs.exists(live), "a live claim must never be reaped")
    assert(!hfs.exists(new org.apache.hadoop.fs.Path(dir, "3.lock")))
    assert(store.readCursor("trio").contains("4\t4\t4"),
      "published records are untouched by the reaper")
    hfs.delete(live, false)
    // vacuum runs the reaper as part of the standing maintenance cadence
    hfs.create(new org.apache.hadoop.fs.Path(dir, "5.lock"), false).close()
    hfs.setTimes(new org.apache.hadoop.fs.Path(dir, "5.lock"), old, old)
    import spark.implicits._
    store.write(Seq((1L, "a")).toDF("id", "v"), "bcur_f", Seq("id"))
    store.vacuum("bcur_f", keepVersions = 1)
    assert(!hfs.exists(new org.apache.hadoop.fs.Path(dir, "5.lock")),
      "vacuum must reap aged cursor debris")
  }

  test("runBucketed: memoizing runner over file-level merge") {
    import org.apache.spark.sql.functions._
    val root = tmpDir("brun")
    val store = new BucketedStore(root, numBuckets = 16)
    val registry = new Registry(root)
    val feature = FeatureDef("cust_stats", Seq("c_custkey"), "v1",
      df => df.groupBy("c_custkey").agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("spend")))
    val input = graft.Tables.load(spark, sfDir, "customer")
      .join(graft.Tables.load(spark, sfDir, "orders"), col("c_custkey") === col("o_custkey"))
    val r1 = PipelineRunner.runBucketed(feature, input, store, registry,
      checks = Seq(Checks.unique(Seq("c_custkey"))))
    assert(!r1.memoHit && r1.report.status == "ok")
    // rerun: record-level memo hit, no new version
    val r2 = PipelineRunner.runBucketed(feature, input, store, registry)
    assert(r2.memoHit && r2.report.nNovel == 0 && r2.report.storeVersion == r1.report.storeVersion)
    // one changed entity -> one novel record, tiny rewrite
    val changed = input.filter(col("o_orderkey") =!= input.select(min("o_orderkey")).collect()(0).getLong(0))
    val r3 = PipelineRunner.runBucketed(feature, changed, store, registry)
    assert(r3.report.nNovel == 1 && r3.report.nRows == r1.report.nRows)
  }
}
