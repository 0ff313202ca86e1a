package graft

import org.apache.spark.sql.functions._

/** Physical-plan shape assertions: the 100 TB contract, executable.
  * These lock in the plan properties the operators were designed around —
  * a regression that silently de-broadcasts a dim join or breaks filter
  * pushdown fails CI, not a production cluster. */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  /** Physical plan with the AQE wrapper unwrapped: the adaptive node is an
    * opaque LEAF, so `.collect` on it silently finds nothing and a shape
    * assertion passes vacuously. (toString is unaffected — it prints the
    * whole initial plan.) */
  private def physical(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.execution.SparkPlan =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }

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

  test("q03: partial aggregates sit BELOW the joins (lineitem collapses per order, then per customer, before any fact-fact shuffle)") {
    val df = SparkEntry.queries("q03_join_agg_revenue")(spark, sfDir)
    val plan = df.queryExecution.optimizedPlan
    val joins = plan.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.size == 4, plan.toString)
    // the per-order and per-customer rollups must survive optimization as
    // Aggregates underneath join children — Catalyst must not collapse them
    // back into one post-join aggregation
    val aggsUnderJoins = joins.map(_.children.map(c =>
      c.collect { case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }.size).sum).sum
    assert(aggsUnderJoins >= 2, s"pre-join aggregates lost:\n$plan")
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

  test("CBO: ANALYZE stats drive a 3-way join reorder (small table pulled innermost)") {
    // own session: CBO confs are session-scoped, so the shared spec session
    // keeps its default (rule-based) behavior
    val s = spark.newSession()
    s.conf.set("spark.sql.cbo.enabled", "true")
    s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // plan .stats is evaluated lazily on THIS thread via SQLConf.get, which
    // reads the ACTIVE session — newSession() doesn't activate itself, so
    // without this the rowCount check sees the base session's cbo=false
    org.apache.spark.sql.SparkSession.setActiveSession(s)
    try {
      s.range(3000).selectExpr("id % 50 AS k", "id AS p1")
        .write.mode("overwrite").saveAsTable("cbo_big1")
      s.range(3000).selectExpr("id % 50 AS k", "id AS p2")
        .write.mode("overwrite").saveAsTable("cbo_big2")
      s.range(10).selectExpr("id AS k", "id AS p3")
        .write.mode("overwrite").saveAsTable("cbo_small")
      Seq("cbo_big1", "cbo_big2", "cbo_small").foreach(t =>
        s.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS"))
      // stats are in the catalog and reach the optimizer
      val rc = s.table("cbo_big1").queryExecution.optimizedPlan.stats.rowCount
      assert(rc.contains(BigInt(3000)), s"stats missing: $rc")
      // written worst-first: big1 x big2 (180k intermediate) then small;
      // CBO must rewire so the 10-row table joins before the big-big pair
      val q = s.sql(
        """SELECT count(*) FROM cbo_big1 b1
           JOIN cbo_big2 b2 ON b1.k = b2.k
           JOIN cbo_small sm ON b1.k = sm.k""")
      val joins = q.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
      assert(joins.size == 2, q.queryExecution.optimizedPlan.toString)
      val innermostTables = joins.last.collectLeaves().flatMap(_.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.catalogTable.map(_.identifier.table).getOrElse("")
      })
      assert(innermostTables.contains("cbo_small"),
        s"CBO did not reorder; innermost join reads $innermostTables\n" +
          q.queryExecution.optimizedPlan.toString)
    } finally {
      Seq("cbo_big1", "cbo_big2", "cbo_small").foreach(t =>
        s.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }

  test("q99: decontamination broadcasts the eval side; corpus text never joins raw") {
    val p = planOf("q99_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q103: mixture sampling is map-side only (no exchange before the protocol sort)") {
    val df = SparkEntry.queries("q103_mixture_sample")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    // the ONLY exchange allowed is the final rangepartitioning for ORDER BY
    assert(!p.contains("hashpartitioning"), p)
  }

  test("q102: sequence packing shuffles once, keyed on the shard column") {
    val df = SparkEntry.queries("q102_pack_sequences")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert("hashpartitioning\\(source".r.findAllIn(p).size >= 1, p)
    // no global single-partition window
    assert(!p.contains("SinglePartition"), p)
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

  test("q105: sessionization is ONE user-keyed shuffle (no join; lag, counter, and session agg share it)") {
    val df = SparkEntry.queries("q105_sessionize")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    // one hashpartitioning exchange for the window; the session groupBy
    // reuses the user clustering (plus the protocol sort's rangepartitioning)
    assert("hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("q138: sliding window is window-expansion + ONE keyed agg shuffle (partial agg AFTER the expansion)") {
    val df = SparkEntry.queries("q138_sliding_window")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    // the duration/slide expansion must NOT multiply rows through the
    // exchange raw: partial aggregation collapses each task to (window,
    // type) groups first, so exactly one hashpartitioning exchange (plus
    // the protocol sort's range partitioning) moves group rows only
    assert("hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial"), s"map-side partial aggregate missing:\n$p")
  }

  test("q106: gap-fill's event-sized work is a single keyed agg; the fill join is grid-sized and the spine broadcasts") {
    val df = SparkEntry.queries("q106_gapfill_daily")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    // every consumer (spine bounds, the two 1-row guard stats, the key
    // list, the fill join) must read the persisted post-agg frame — any
    // InMemoryTableScan short of 5 means one consumer re-runs the
    // event-sized aggregation (a full re-scan at 100 TB)...
    assert("InMemoryTableScan".r.findAllIn(p).size == 5, p)
    // the guarded day spine BROADCASTS into the grid — the key side (the
    // big one at scale) never shuffles for the cross join
    assert(p.contains("BroadcastNestedLoopJoin BuildRight, Cross"), p)
    // and the fill itself is a broadcast join, not a shuffled one
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q108: histogram aggregates partial+final (exchange carries bins, not rows)") {
    val p = SparkEntry.queries("q108_histogram")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_count") || p.contains("partial_min"), p)
    assert(!p.contains("Join"), p)
  }

  test("q110: PII redaction is map-side only (no exchange before the protocol sort)") {
    val df = SparkEntry.queries("q110_pii_redaction")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    // only the final ORDER BY rangepartitioning; no hashpartitioning anywhere
    assert(!p.contains("hashpartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("q77/q78: text-quality and lang-id plans are lambda-free (stay in whole-stage codegen)") {
    // r5 regression class: filter(toks, t => array_contains(...)) is a
    // CodegenFallback HOF whose lambda body gets no CSE — it re-evaluated the
    // split per language per row. The multiset counting must stay native.
    Seq("q77_text_quality", "q78_lang_id").foreach { q =>
      val p = planOf(q).toLowerCase
      assert(!p.contains("lambdafunction"), s"$q plan contains an interpreted HOF lambda")
    }
  }

  test("q21: no exact percentile(), no Expand, and no sketch aggregate keyed by a data column") {
    // r6/r7 regression class, two shapes of the same disease:
    //  (a) exact percentile() buffers EVERY value of its global group on one
    //      reducer — the median must come from the bounded value histogram;
    //  (b) count_distinct mixed with ANY sketch aggregate makes the
    //      one-distinct rewrite key the partial agg by l_partkey, so every
    //      distinct key carries its own multi-KB HLL/percentile buffer
    //      (14-18 s at sf0.1; unbounded at 100 TB). Sketch aggregates must
    //      only ever appear GLOBAL (no grouping keys).
    val df = SparkEntry.queries("q21_approx_agg")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("percentile("), s"interpreted exact percentile in plan:\n$p")
    assert(!p.contains("Expand"), s"distinct-rewrite Expand in plan:\n$p")
    val sketchAggs = physical(df).collect {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
      case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
    }
    assert(sketchAggs.forall(_.asInstanceOf[org.apache.spark.sql.execution.aggregate.BaseAggregateExec]
        .groupingExpressions.isEmpty),
      s"sketch aggregate keyed by a data column (per-key buffers):\n$p")
  }

  test("q115: fused corpus profile is ONE exchange and ONE corpus explode") {
    // the point of the fusion: repartition(id) is the only shuffle — the
    // per-(doc,gram) count AND the per-doc rollup both run inside that
    // partitioning (hashpartitioning(id) satisfies both clusterings), and
    // the corpus is shingled exactly once
    val df = SparkEntry.queries("q115_corpus_profile")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert("hashpartitioning".r.findAllIn(p).size == 1, p)
    assert("Generate".r.findAllIn(p).size == 1, p)
  }

  test("q118: incremental near-dup broadcasts the new batch; corpus profile never shuffles for the candidate join") {
    // the incremental contract: per-batch cost independent of corpus size —
    // the banded corpus side streams map-side through a BroadcastHashJoin
    // against the (small) new batch's banded signatures
    val df = SparkEntry.queries("q118_incremental_neardup")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"candidate join not broadcast:\n$p")
  }

  test("q117: bigram LM — transition table broadcasts over the cached occurrence frame; no string-keyed exchange") {
    // the r12 shape: the corpus tokenizes+hashes ONCE into a persisted
    // occurrence frame; the vocab²-bounded transition table broadcasts back
    // over it, so the only occurrence-sized exchange is the partially
    // aggregated per-doc rollup — and no exchange may partition on a string
    // column (the text/gram strings themselves must never be shuffle keys)
    val df = SparkEntry.queries("q117_bigram_lm")(spark, sfDir)
    val shuffles = physical(df).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    val stringKeyed = shuffles.filter(_.outputPartitioning match {
      case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
        h.expressions.exists(_.dataType ==
          org.apache.spark.sql.types.StringType)
      case _ => false
    })
    assert(stringKeyed.isEmpty,
      s"exchange keyed on a string column:\n${stringKeyed.mkString("\n")}")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange"),
      s"transition table not broadcast:\n$p")
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      s"occurrence frame not read from cache:\n$p")
  }

  test("q120: winsorize bounds come from a bins-sized agg broadcast back; the fact side never shuffles for the clip") {
    val df = SparkEntry.queries("q120_winsorize")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"bounds not broadcast:\n$p")
    assert(!p.contains("percentile("), s"interpreted percentile in plan:\n$p")
  }

  test("q121: grouped percentiles are bins-only after the partial agg; window partitioning feeds the final agg; no interpreted percentile") {
    // the scale contract: exchange 1 carries MAP-SIDE-COMBINED (group, value)
    // bins (partial_count below it), exchange 2 re-keys bins by group for the
    // window, and the final agg runs INSIDE that partitioning (no third
    // exchange) — nothing row-sized ever shuffles, no per-group value buffer
    val df = SparkEntry.queries("q121_grouped_percentiles")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("percentile("), s"interpreted percentile in plan:\n$p")
    assert("hashpartitioning".r.findAllIn(p).size == 2,
      s"expected the two bins-sized exchanges only:\n$p")
    assert(p.contains("partial_count"), s"histogram agg lost its map-side combine:\n$p")
  }

  test("q123: indexed incremental match broadcasts the batch against set-pruned index scans") {
    // the index contract: the corpus side is plain pruned parquet scans of
    // the touched buckets, joined map-side against the broadcast batch —
    // never a corpus-wide shuffle for candidates
    val df = SparkEntry.queries("q123_indexed_neardup")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"candidate join not broadcast:\n$p")
  }

  test("q134: indexed ANN search joins broadcast centroids/probes; never a cartesian corpus product") {
    // the serving contract: centroid ranking and the probe->list candidate
    // join ride broadcasts (centroid set and probe set are both tiny);
    // candidates come from pruned parquet scans of the probed buckets — a
    // CartesianProduct anywhere means the corpus got cross-joined
    val df = SparkEntry.queries("q134_indexed_ann_topk")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"corpus cross-join in plan:\n$p")
    assert(p.contains("Broadcast"), s"no broadcast in the probe path:\n$p")
  }

  test("bloomDecontaminate: corpus text never a shuffle key; sketch is a subquery, not a join side") {
    // the probe side must stay map-side against the scalar bloom: no
    // exchange may carry a string column, and the only joins in the plan
    // are the final flag attach (id-keyed) — not a gram-level join
    val docs = Tables.load(spark, sfDir, "documents")
    val df = graft.ops.TextOps.bloomDecontaminate(
      docs.where(col("doc_id") % 10 < 9), docs.where(col("doc_id") % 10 === 9),
      "doc_id", "text", "doc_id", "text")
    val shuffles = physical(df).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    val stringKeyed = shuffles.filter(_.outputPartitioning match {
      case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
        h.expressions.exists(_.dataType == org.apache.spark.sql.types.StringType)
      case _ => false
    })
    assert(stringKeyed.isEmpty,
      s"exchange keyed on a string column:\n${stringKeyed.mkString("\n")}")
    assert(physical(df).toString.contains("Subquery"),
      "bloom sketch must reach might_contain as a scalar subquery")
  }

  test("q128: passage dedup is join-free — one explode, digest + id exchanges only") {
    // the keep decision travels as a flag into the per-doc regroup, so a
    // fully-duplicated document reappears WITHOUT an outer join against a
    // corpus-sized doc list (that join's build side would be the whole
    // corpus at scale); no exchange may partition on a raw string either —
    // the winner window keys on the passage's md5 digest
    val df = SparkEntry.queries("q128_paragraph_dedup")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"passage dedup grew a join:\n$p")
    assert("Generate".r.findAllIn(p).size == 1, p)
    assert("hashpartitioning".r.findAllIn(p).size == 2, p) // digest, then id
  }

  test("q100/q79: repetitionStats and fingerprintDf shuffle ONCE (text rides the repartition)") {
    Seq("q100_repetition_stats", "q79_doc_fingerprint").foreach { q =>
      val p = SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString
      assert("hashpartitioning".r.findAllIn(p).size == 1, s"$q:\n$p")
    }
  }

  test("runtime bloom filter from a selective dim filter prunes the fact scan (shuffle join)") {
    // own session: thresholds scaled to the fixture (prod defaults assume a
    // 10 GB application side); broadcast disabled so the join actually
    // shuffles — broadcast joins don't need the bloom filter
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = Tables.load(s, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val ord = Tables.load(s, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
    val p = j.queryExecution.optimizedPlan.toString
    assert(p.toLowerCase.contains("bloom"), s"no runtime bloom filter injected:\n$p")
  }

  test("AQE splits a skewed shuffle-join partition at runtime (skew=true in the final plan)") {
    // own session: thresholds scaled down so the fixture's hot key (60% of
    // rows on one value) crosses the skew factor; broadcast disabled so the
    // join shuffles. This is the runtime half of the skew story — SkewJoin
    // covers the planned half for KNOWN hot keys.
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val left = s.range(200000)
      .selectExpr("CASE WHEN id % 10 < 6 THEN 0 ELSE id END AS k", "id AS payload")
    val right = s.range(50000).selectExpr("id AS k", "id * 2 AS v")
    val j = left.join(right, "k")
    // collect() runs THIS dataset's QueryExecution (write.save() would spawn
    // a fresh one and leave j's adaptive plan unfinalized)
    j.collect()
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("skew=true"), s"no runtime skew split:\n$p")
  }

  test("q140: span dedup's corpus-wide gram count is groupBy+semi-join, never a window on the gram hash") {
    val df = SparkEntry.queries("q140_dup_span_stats")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    // a Window partitioned on __h would buffer every position of a hot gram
    // in ONE partition; the groupBy form partial-aggregates it map-side
    assert(!p.contains("windowspecdefinition(__h"), p)
    assert(p.contains("LeftSemi"), p)
    // island merge still windows on the doc id — that partitioning is fine
    assert(p.contains("windowspecdefinition(id"), p)
  }

  test("q150: fused filter pipeline is map-side only (no exchange before the protocol sort)") {
    val df = SparkEntry.queries("q150_filter_pipeline")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    // one corpus scan, zero data-sized exchanges: only the ORDER BY's
    // rangepartitioning — chaining the four standalone ops would scan 4x
    assert(!p.contains("hashpartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("q155: BPE encoding is map-side only (no exchange, join or UDF before the protocol sort)") {
    // a pre-learned merge table (the production shape) — the q155 QUERY
    // also retrains, which is q154's own cost; this locks the encode half
    val docs = Tables.load(spark, sfDir, "documents")
    val df = ops.TextOps.applyBpeMerges(docs, "doc_id", "text",
      Seq(("e", "r"), ("a", "n"), ("an", "\u0004")))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("hashpartitioning"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
  }

  test("q146/q151: UniMax selection is the bounded reservoir — no Window anywhere in the plan") {
    Seq("q146_unimax_mixture", "q151_unimax_epochs").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      val p = physical(df).toString
      assert(!p.contains("windowspecdefinition"),
        s"$q must not funnel the corpus through |sources| window partitions:\n$p")
      assert(p.toLowerCase.contains("reservoir"), s"$q bounded reservoir route not taken:\n$p")
    }
  }

  test("q162/q163: HTML strip and chunking are map-side only (no exchange before the protocol sort)") {
    Seq("q162_html_strip", "q163_chunk_documents").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("hashpartitioning"),
        s"$q must not shuffle before the ORDER BY:\n$p")
    }
  }

  test("q161: unicode canonicalization expressions stay inside whole-stage codegen") {
    val df = SparkEntry.queries("q161_unicode_canonical_dedup")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CodegenFallback"), p)
    assert(p.contains("graft_nfc") || p.contains("UnicodeNormalize") ||
      p.contains("staticinvoke"), p)
  }

  test("q165: boilerplate line strip broadcasts the hot set; the line frame shuffles only for count and regroup") {
    val df = SparkEntry.queries("q165_boilerplate_lines")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    // hot-set verdict join must be broadcast — a shuffled join would move
    // every line for a tiny frequent set
    assert(p.contains("BroadcastHashJoin"), s"hot-set join not broadcast:\n$p")
  }

  test("q170: PQ encode has no exchange before the protocol sort; q171 reads only the codes map-side") {
    val p170 = planOf("q170_pq_encode")
    assert(!p170.contains("hashpartitioning"), p170)
    val p171 = planOf("q171_pq_adc_topk")
    // one window for the per-query top-k is the only keyed shuffle
    assert("hashpartitioning\\(query_id".r.findAllIn(p171).size >= 1, p171)
  }

  test("q186: BM25 candidates are all-broadcast — the corpus never shuffles for a join") {
    val p = planOf("q186_bm25_topk")
    // dl rides the explode map-side; queries/df/stats broadcast — any
    // SortMergeJoin here means a corpus-sized shuffle snuck back in
    assert(!p.contains("SortMergeJoin"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
  }

  test("q186: the query vocabulary prunes the token stream BEFORE the keyed aggregation") {
    val p = planOf("q186_bm25_topk")
    // the term-filter broadcast join must sit BELOW the (doc_id, term)
    // hash aggregate: the shuffle then carries only query-term postings.
    // Structural check: in the printed tree (parents before children) the
    // DEEPEST BroadcastHashJoin must sit below the (doc_id, term) exchange
    // — i.e. print after it. Candidate-side joins print above; only the
    // pre-agg term-filter join prints below. Dropping the prune would put
    // every BHJ above the exchange and fail this.
    val lastBhj = p.lastIndexOf("BroadcastHashJoin")
    val agg = p.indexOf("hashpartitioning(doc_id")
    assert(lastBhj >= 0 && agg >= 0 && lastBhj > agg,
      s"term-filter join not below the doc-term aggregation: bhj@$lastBhj agg@$agg\n$p")
  }

  test("q191: the recall curve never joins corpus-sized sides — broadcast everywhere") {
    val p = planOf("q191_ivf_recall_curve")
    // truth/probe-rank/histogram joins all carry |Q|-bounded sides; a
    // SortMergeJoin would mean a corpus-sized exchange snuck into the
    // pair-resolution path
    assert(!p.contains("SortMergeJoin"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
  }

  test("q204: semantic decon's per-doc argmax is a partial-aggregable scalar — no Window, no SortMergeJoin, eval broadcast") {
    val p = planOf("q204_semantic_decontaminate")
    // the per-document nearest-eval attribution is a running struct max
    // (partial agg map-side), NOT a per-group rank window — a Window here
    // would sort-shuffle the full corpus x eval cross product
    assert(!p.contains("Window"), p)
    // the eval side broadcasts; a SortMergeJoin means a corpus-sized
    // exchange snuck into the scoring path
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    // the one hash exchange carries (corpus_id, best-so-far) pairs — it is
    // keyed on corpus_id, and partial_max must sit BELOW it (parents print
    // first, so the partial agg prints AFTER the exchange in the tree)
    val ex = p.indexOf("hashpartitioning(corpus_id")
    val partial = p.lastIndexOf("partial_max")
    assert(ex >= 0 && partial > ex,
      s"partial max not below the corpus_id exchange: ex@$ex partial@$partial\n$p")
  }

  test("profile-served drift over STORED profiles plans zero corpus work — no Generate anywhere") {
    // the monitors' serve-time contract: against persisted profiles the
    // plan contains no posexplode/Generate (the only way a corpus enters
    // these ops) — every frame is ≤ dim·bins rows. (q202/q203 compute the
    // profiles inline for the oracle gate, so they are not the lock site;
    // the full-outer dim-keyed join legitimately plans as a 64-row SMJ in
    // both the direct and served routes.)
    import org.apache.spark.sql.functions.col
    val emb = Tables.load(spark, sfDir, "embeddings")
    val dir = tmpDir("plan_prof")
    graft.ops.Similarity.embeddingProfile(
      emb.filter(col("vec_id") % 2 === 0), "embedding").write.parquet(s"$dir/a")
    graft.ops.Similarity.embeddingProfile(
      emb.filter(col("vec_id") % 2 === 1), "embedding").write.parquet(s"$dir/b")
    val pa = spark.read.parquet(s"$dir/a")
    val pb = spark.read.parquet(s"$dir/b")
    for ((nm, df) <- Seq(
        "mean" -> graft.ops.Similarity.embeddingDriftFromProfiles(pa, pb),
        "shape" -> graft.ops.Similarity.embeddingShapeDriftFromProfiles(pa, pb))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Generate"), s"$nm serve plan touches a corpus:\n$p")
    }
  }

  test("SEGMENTED profile-served drift over STORED profiles also plans zero corpus work — no Generate anywhere") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val docs = Tables.load(spark, sfDir, "documents")
    val dir = tmpDir("plan_gprof")
    graft.ops.Similarity.embeddingProfileByGroup(
      emb.filter(col("vec_id") % 2 === 0), "embedding", "label").write.parquet(s"$dir/ea")
    graft.ops.Similarity.embeddingProfileByGroup(
      emb.filter(col("vec_id") % 2 === 1), "embedding", "label").write.parquet(s"$dir/eb")
    graft.ops.TextOps.tokenProfileByGroup(
      docs.filter(col("doc_id") % 2 === 0), "text", "source").write.parquet(s"$dir/ta")
    graft.ops.TextOps.tokenProfileByGroup(
      docs.filter(col("doc_id") % 2 === 1), "text", "source").write.parquet(s"$dir/tb")
    val (ea, eb) = (spark.read.parquet(s"$dir/ea"), spark.read.parquet(s"$dir/eb"))
    val (ta, tb) = (spark.read.parquet(s"$dir/ta"), spark.read.parquet(s"$dir/tb"))
    for ((nm, df) <- Seq(
        "mean" -> graft.ops.Similarity.embeddingDriftByGroupFromProfiles(ea, eb, "label"),
        "shape" -> graft.ops.Similarity.embeddingShapeDriftByGroupFromProfiles(ea, eb, "label"),
        "token" -> graft.ops.TextOps.tokenDriftByGroupFromProfiles(ta, tb, "source", 10))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Generate"), s"$nm segmented serve plan touches a corpus:\n$p")
    }
  }

  test("q207: segmented drift's totals BROADCAST back over the scored frame; only the rank window is group-keyed, behind a WindowGroupLimit") {
    val p = planOf("q207_token_drift_by_source")
    // the r15 shape computed per-group totals as Window.partitionBy(source)
    // sums — buffering a group's ENTIRE vocab-sized slice in one window
    // task (the r15 verdict's structural watch item). The fixed shape:
    // totals are a groupBy(source) aggregate BROADCAST back (the scoring
    // join stays on the (source, token) partitioning — fully parallel at
    // any vocab/group ratio), and the ONLY window is the rank, fed by a
    // WindowGroupLimit per-partition top-M heap so the group-keyed
    // exchange carries <= topM * tasks rows per group
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastQueryStage"),
      s"expected the per-group totals to broadcast back:\n$p")
    assert("Window \\[".r.findAllIn(p).size == 1,
      s"expected exactly 1 Window (rank only — a totals window crept back in):\n$p")
    // rank <= topM pushes into the window as a per-partition top-M heap
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q167: unigram encode is ONE map-side pass (no exchange before the protocol sort)") {
    val p = planOf("q167_unigram_encode")
    assert(!p.contains("hashpartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("q186: per-doc dl is an attribute BELOW the explode — never re-evaluated per token") {
    // the r14 defect class: a select(id, perDocExpr, explode(arr)) analyzes
    // to Project[id, perDocExpr, out] ABOVE the Generate, re-running the
    // per-doc expression once per exploded token (O(doclen²)/doc — measured
    // 4-6x on the whole BM25 pass). Lock the fixed shape: no Project that
    // sits above a Generate computes an array-sized expression, and the
    // Generate carries dl through as a plain attribute.
    import org.apache.spark.sql.execution.{GenerateExec, ProjectExec, SparkPlan}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.catalyst.expressions.{ArrayFilter, Size}
    val outer = physical(SparkEntry.queries("q186_bm25_topk")(spark, sfDir))
    // the doc-term frame is persisted — its Generate lives in the CACHED
    // plan, behind InMemoryTableScan leaves; chase every cached relation
    def expand(p: SparkPlan): Seq[SparkPlan] = {
      val unwrapped = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.initialPlan
        case other => other
      }
      unwrapped +: unwrapped.collect { case s: InMemoryTableScanExec => s }
        .flatMap(s => expand(s.relation.cachedPlan))
    }
    val plans = expand(outer)
    val gens = plans.flatMap(_.collect { case g: GenerateExec => g })
    assert(gens.nonEmpty, "expected Generate (explode) nodes in the BM25 plan")
    assert(gens.exists(_.requiredChildOutput.exists(_.name == "dl")),
      s"the doc-term Generate must pass dl through as an attribute:\n$outer")
    val offenders = plans.flatMap(_.collect {
      case p: ProjectExec
        if p.exists(_.isInstanceOf[GenerateExec]) &&
           p.projectList.exists(_.exists {
             case _: Size | _: ArrayFilter => true
             case _ => false
           }) => p
    })
    assert(offenders.isEmpty,
      s"array-sized expression in a Project ABOVE a Generate (per-token re-evaluation):\n${offenders.mkString("\n")}")
  }

  test("r16 profile-served routes (timeline, numeric) plan zero event/corpus work from stored profiles") {
    // the serve-time contract extended to the round's new legs: against
    // persisted profiles the timeline read and the scalar drift read scan
    // ONLY the bounded profile parquet — no events/corpus relation in the
    // plan (checked by file path: the only FileScans are the profile dirs)
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, sfDir, "events")
    val dir = tmpDir("plan_prof16")
    graft.ops.Events.bucketCategoryProfile(ev, "event_type", "ts", 604800L)
      .write.parquet(s"$dir/tl")
    graft.ops.Stats.numericProfile(ev.filter(col("user_id") % 2 === 0), "value")
      .write.parquet(s"$dir/na")
    graft.ops.Stats.numericProfile(ev.filter(col("user_id") % 2 === 1), "value")
      .write.parquet(s"$dir/nb")
    graft.ops.Stats.numericProfileByGroup(
        ev.filter(col("user_id") % 2 === 0), "value", "event_type")
      .write.parquet(s"$dir/ga")
    graft.ops.Stats.numericProfileByGroup(
        ev.filter(col("user_id") % 2 === 1), "value", "event_type")
      .write.parquet(s"$dir/gb")
    graft.ops.Events.bucketNumericProfile(ev, "value", "ts", 604800L)
      .write.parquet(s"$dir/ntl")
    graft.ops.Stats.numericProfile(ev, "value").write.parquet(s"$dir/nref")
    val ref = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect()  // materialize the reference OUTSIDE the measured plan
    val refDf = spark.createDataFrame(
      spark.sparkContext.parallelize(ref.toSeq),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType))))
    val tlServe = graft.ops.Events.categoryDriftTimelineFromProfiles(
      spark.read.parquet(s"$dir/tl"), refDf, "event_type")
    val numServe = graft.ops.Stats.numericShapeDriftFromProfiles(
      spark.read.parquet(s"$dir/na"), spark.read.parquet(s"$dir/nb"))
    val gnumServe = graft.ops.Stats.numericShapeDriftByGroupFromProfiles(
      spark.read.parquet(s"$dir/ga"), spark.read.parquet(s"$dir/gb"),
      "event_type")
    val ntlServe = graft.ops.Events.numericDriftTimelineFromProfiles(
      spark.read.parquet(s"$dir/ntl"), spark.read.parquet(s"$dir/nref"))
    for ((nm, df) <- Seq("timeline" -> tlServe, "numeric" -> numServe,
        "numericByGroup" -> gnumServe, "numericTimeline" -> ntlServe)) {
      val p = df.queryExecution.executedPlan.toString
      val scans = "file:[^ ,\\]]*".r.findAllIn(p).toList
      assert(scans.forall(_.contains("plan_prof16")),
        s"$nm serve plan scans a non-profile relation:\n${scans.filterNot(_.contains("plan_prof16"))}")
    }
  }

  test("r18 profile-served embedding timeline plans zero corpus work from stored profiles — no Generate, only profile scans") {
    // the serve-time contract for the round's new leg: against a persisted
    // (bucket, pos, bin) profile the embedding timeline scans ONLY the
    // bounded profile parquet — no embeddings relation, and no posexplode
    // (Generate) anywhere in the plan
    import org.apache.spark.sql.functions._
    val emb = Tables.load(spark, sfDir, "embeddings")
      .withColumn("ts", timestamp_micros(col("vec_id") * lit(3600000000L)))
    val dir = tmpDir("plan_prof18")
    graft.ops.Events.bucketEmbeddingProfile(emb, "embedding", "ts", 604800L)
      .write.parquet(s"$dir/etl")
    graft.ops.Similarity.embeddingProfile(emb, "embedding")
      .write.parquet(s"$dir/eref")
    val serve = graft.ops.Events.embeddingDriftTimelineFromProfiles(
      spark.read.parquet(s"$dir/etl"), spark.read.parquet(s"$dir/eref"))
    val p = serve.queryExecution.executedPlan.toString
    val scans = "file:[^ ,\\]]*".r.findAllIn(p).toList
    assert(scans.nonEmpty && scans.forall(_.contains("plan_prof18")),
      s"embedding timeline serve plan scans a non-profile relation:\n${scans.filterNot(_.contains("plan_prof18"))}")
    assert(!p.contains("Generate"),
      "serve plan must not re-explode vectors (no Generate)")
  }

  test("q225: KS drift's cumulative is the two-level prefix sum — a range exchange, and every data-sized Window is __pid-partitioned") {
    val p = planOf("q225_ks_drift")
    // the naive shape is one Window [ORDER BY v] with no PARTITION BY over
    // the whole pooled column — one task holds everything. The two-level
    // shape: the distinct-value frame range-repartitions, the ≤ rangeParts
    // partition totals ride the only unpartitioned window, and the local
    // cumulative windows are keyed by the partition id
    assert(p.contains("rangepartitioning"),
      s"expected the range repartition exchange:\n$p")
    val winSpecs = "Window \\[[^\\]]*\\], \\[[^\\]]*\\]".r.findAllIn(p).toList
    // exactly two windows: the offset prefix (≤ rangeParts rows, pid-
    // ordered) and the local cumulative (pid-partitioned)
    assert("Window \\[".r.findAllIn(p).size == 2, s"expected 2 windows:\n$p")
    assert(p.contains("partitionBy") || p.contains("__pid"),
      s"expected the local cumulative to be __pid-partitioned:\n$p")
    // the scoring side sees only broadcasts — no shuffle join of two
    // corpus-sized sides
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastQueryStage"),
      s"expected offsets/totals to broadcast:\n$p")
    assert(winSpecs.nonEmpty)
  }

  test("q292: composed pipeline touches the raw corpus exactly twice (train + eval) across all six stages; all stage boundaries persisted") {
    // The one-scan-per-stage claim, executable: six pipeline stages
    // (filter → paragraph dedup → near-dup gate → decontaminate →
    // mixture → shards) over a 100 TB corpus must not re-read parquet
    // per stage. The fused filter carries text/source through its own
    // projection (no verdict semi-join back against a second scan), and
    // every later stage reads a persisted boundary. Distinct cached
    // plans are walked once each — toString would re-print a shared
    // cache at every reference and overcount.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val df = SparkEntry.queries("q292_composed_pipeline")(spark, sfDir)
    val seen = scala.collection.mutable.Set[Int]()
    var fileScans = 0
    var cacheStages = 0
    // AQE wraps each cached stage plan; the adaptive node is an opaque
    // LEAF to foreach, so unwrap to its initialPlan explicitly
    def walkPhys(p: SparkPlan): Unit = p.foreach {
      case a: AdaptiveSparkPlanExec => walkPhys(a.initialPlan)
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("documents")) =>
        fileScans += 1
      case c: InMemoryTableScanExec =>
        val cp = c.relation.cacheBuilder.cachedPlan
        if (seen.add(System.identityHashCode(cp))) { cacheStages += 1; walkPhys(cp) }
      case _ => ()
    }
    df.queryExecution.optimizedPlan.foreach {
      case lr: LogicalRelation if (lr.relation match {
            case fs: HadoopFsRelation =>
              fs.location.rootPaths.exists(_.toString.contains("documents"))
            case _ => false
          }) =>
        fileScans += 1
      case im: InMemoryRelation =>
        val cp = im.cacheBuilder.cachedPlan
        if (seen.add(System.identityHashCode(cp))) { cacheStages += 1; walkPhys(cp) }
      case _ => ()
    }
    assert(fileScans == 2,
      s"expected exactly 2 raw documents scans (train split + eval split), got $fileScans")
    // 4 explicit boundaries (filtered, paragraph-deduped, near-dup
    // survivors, decontaminated) + whatever the stage ops persist
    // internally — the load-bearing lock is the scan count above
    assert(cacheStages >= 4,
      s"expected >= 4 persisted stage boundaries (filtered, paragraph-deduped, near-dup-survivors, decontaminated), got $cacheStages")
  }

  test("q293: multimodal chain scans the raw corpus ONCE; the image near-dup pair join is banded, never a cartesian product") {
    // the q292 walker, retargeted: the image leg derives from the
    // persisted filter survivors (decode only runs on them), so exactly
    // one raw documents scan exists anywhere in the composed plan — and
    // the Hamming pair join must stay keyed on the pigeonhole band
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val df = SparkEntry.queries("q293_composed_multimodal_pipeline")(spark, sfDir)
    val seen = scala.collection.mutable.Set[Int]()
    var fileScans = 0
    var cartesian = 0
    def walkPhys(p: SparkPlan): Unit = p.foreach {
      case a: AdaptiveSparkPlanExec => walkPhys(a.initialPlan)
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("documents")) =>
        fileScans += 1
      case _: org.apache.spark.sql.execution.joins.CartesianProductExec =>
        cartesian += 1
      case c: InMemoryTableScanExec =>
        val cp = c.relation.cacheBuilder.cachedPlan
        if (seen.add(System.identityHashCode(cp))) walkPhys(cp)
      case _ => ()
    }
    df.queryExecution.optimizedPlan.foreach {
      case lr: LogicalRelation if (lr.relation match {
            case fs: HadoopFsRelation =>
              fs.location.rootPaths.exists(_.toString.contains("documents"))
            case _ => false
          }) =>
        fileScans += 1
      case im: InMemoryRelation =>
        val cp = im.cacheBuilder.cachedPlan
        if (seen.add(System.identityHashCode(cp))) walkPhys(cp)
      case _ => ()
    }
    assert(fileScans == 1,
      s"expected exactly 1 raw documents scan (images derive from the persisted filter survivors), got $fileScans")
    assert(cartesian == 0,
      s"expected no CartesianProduct anywhere (Hamming pairs are band-keyed), found $cartesian")
  }

  test("q229: the drift timeline has exactly one Window (the per-bucket rank) and the spine sides broadcast") {
    val p = planOf("q229_category_drift_timeline")
    assert("Window \\[".r.findAllIn(p).size == 1,
      s"expected exactly 1 Window (the rank):\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastQueryStage"),
      s"expected the bounded spine sides to broadcast:\n$p")
  }
}
