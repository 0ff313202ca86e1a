package graft

import org.apache.spark.sql.functions._

/** Bucketing: pre-shuffling fact tables on the join key at write time so
  * repeated joins/aggregations on that key run with NO exchange — the
  * canonical 100 TB co-location strategy (SURVEY §2/§4 "bucketing for
  * co-located joins"). */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    // (warehouse dir is a temp dir set at session build — static config)
    // disable broadcast so the join strategy decision is about shuffles
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ord = Tables.load(spark, sfDir, "orders")
      val li = Tables.load(spark, sfDir, "lineitem")
      ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("orders_b")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString

      // the join itself must not exchange either side (bucket layout IS the
      // required distribution); only the final small aggregation shuffles
      val joinSection = plan.split("HashAggregate").last
      assert(joinSection.contains("SortMergeJoin") || joinSection.contains("ShuffledHashJoin"), plan)
      assert(!joinSection.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

      // and it computes the same result as the plain join
      val expect = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
