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
