package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VersioningSpec extends SparkSpec {
  import spark.implicits._

  private val feature = FeatureDef("f", Seq("id"), "v1", identity)

  test("record hash is stable across column order and row order") {
    val a = Seq((1, "x", 10.0), (2, "y", 20.0)).toDF("id", "s", "d")
    val b = Seq((2, "y", 20.0), (1, "x", 10.0)).toDF("id", "s", "d").select("d", "id", "s")
    val ha = Versioning.withSystemColumns(a, feature)
      .select("id", Versioning.DataHashCol).as[(Int, Long)].collect().toMap
    val hb = Versioning.withSystemColumns(b, feature)
      .select("id", Versioning.DataHashCol).as[(Int, Long)].collect().toMap
    assert(ha == hb)
  }

  test("payload change changes the hash; key and system cols are excluded") {
    val a = Seq((1, "x")).toDF("id", "s")
    val a2 = Seq((1, "x!")).toDF("id", "s")
    def h(df: org.apache.spark.sql.DataFrame) =
      Versioning.withSystemColumns(df, feature).select(Versioning.DataHashCol).as[Long].head()
    assert(h(a) != h(a2))
    // null vs empty string must differ
    val n = Seq((1, null.asInstanceOf[String])).toDF("id", "s")
    val e = Seq((1, "")).toDF("id", "s")
    assert(h(n) != h(e))
  }

  test("dataVersion is order-insensitive and content-sensitive") {
    val a = Versioning.withSystemColumns(Seq((1, "x"), (2, "y")).toDF("id", "s"), feature)
    val b = Versioning.withSystemColumns(Seq((2, "y"), (1, "x")).toDF("id", "s"), feature)
    val c = Versioning.withSystemColumns(Seq((2, "y"), (1, "z")).toDF("id", "s"), feature)
    assert(Versioning.dataVersion(a) == Versioning.dataVersion(b))
    assert(Versioning.dataVersion(a) != Versioning.dataVersion(c))
  }

  test("pipeline fingerprint: sorted upstreams, code-sensitive") {
    val f1 = Versioning.pipelineFingerprint("v1", Seq("a", "b"))
    val f2 = Versioning.pipelineFingerprint("v1", Seq("b", "a"))
    val f3 = Versioning.pipelineFingerprint("v2", Seq("a", "b"))
    assert(f1 == f2 && f1 != f3)
  }
}
