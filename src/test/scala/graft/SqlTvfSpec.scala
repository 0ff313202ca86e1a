package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The SQL table-function surface (GraftExtensions) must be plan-equivalent
  * to the Scala API: same rows, and the TVF expansion IS the Scala call's
  * logical plan, so any drift would be a bug in the registration glue. */
class SqlTvfSpec extends SparkSpec {

  GraftExtensions.install(spark)

  private def docs = Tables.load(spark, sfDir, "documents")
  private def emb = Tables.load(spark, sfDir, "embeddings")

  private def same(a: DataFrame, b: DataFrame): Unit = {
    val ca = a.columns.sorted.toSeq
    assert(ca == b.columns.sorted.toSeq, s"$ca vs ${b.columns.sorted.toSeq}")
    val sa = a.select(ca.map(col): _*).collect().map(_.toSeq).sortBy(_.mkString("|"))
    val sb = b.select(ca.map(col): _*).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(sa.sameElements(sb), s"${sa.length} vs ${sb.length} rows or content differ")
  }

  test("graft_neardup_pairs == Dedup.minhashNearDupPairs") {
    docs.createOrReplaceTempView("tvf_docs")
    same(
      spark.sql("SELECT * FROM graft_neardup_pairs('tvf_docs','doc_id','text',3,12,4,0.2)"),
      ops.Dedup.minhashNearDupPairs(docs, "doc_id", "text", 3, 12, 4, 0.2))
  }

  test("graft_ngram_jaccard_pairs == Dedup.ngramJaccardPairs") {
    docs.createOrReplaceTempView("tvf_docs")
    same(
      spark.sql("SELECT * FROM graft_ngram_jaccard_pairs('tvf_docs','doc_id','text','source',3,0.2)"),
      ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source", 3, 0.2))
  }

  test("graft_cosine_topk == Similarity.bruteForceTopK") {
    emb.createOrReplaceTempView("tvf_emb")
    emb.filter(col("vec_id") < 5).createOrReplaceTempView("tvf_q")
    same(
      spark.sql("SELECT * FROM graft_cosine_topk('tvf_q','tvf_emb','vec_id','vec_id','embedding',5)"),
      ops.Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "vec_id", "embedding", 5))
  }

  test("graft_exact_dedup == Dedup.exactByContent; composes with SQL around it") {
    docs.createOrReplaceTempView("tvf_docs")
    same(
      spark.sql("SELECT * FROM graft_exact_dedup('tvf_docs','doc_id','text')"),
      ops.Dedup.exactByContent(docs, "doc_id", Seq("text")))
    // the TVF result is a real relation: joins/filters/aggregates compose
    val n = spark.sql("""
      SELECT count(*) AS n FROM graft_exact_dedup('tvf_docs','doc_id','text')
      WHERE n_copies > 1""").head().getLong(0)
    assert(n >= 0)
  }

  test("graft_semantic_dedup == Similarity.semanticDedup") {
    emb.createOrReplaceTempView("tvf_emb")
    same(
      spark.sql("SELECT * FROM graft_semantic_dedup('tvf_emb','vec_id','embedding',0.5,4)"),
      ops.Similarity.semanticDedup(emb, "vec_id", "embedding", 0.5, 4))
  }

  test("graft_paragraph_dedup == Dedup.paragraphDedup; composes with SQL around it") {
    docs.createOrReplaceTempView("tvf_docs")
    same(
      spark.sql("SELECT * FROM graft_paragraph_dedup('tvf_docs','doc_id','text',20)"),
      ops.Dedup.paragraphDedup(docs, "doc_id", "text", 20))
    val n = spark.sql("""
      SELECT count(*) AS n FROM graft_paragraph_dedup('tvf_docs','doc_id','text',20)
      WHERE n_kept < n_total""").head().getLong(0)
    assert(n >= 0)
  }

  test("graft_gopher_rules and graft_shard_assign == their Scala APIs") {
    docs.createOrReplaceTempView("tvf_docs")
    same(
      spark.sql("SELECT * FROM graft_gopher_rules('tvf_docs','doc_id','text')"),
      ops.TextOps.gopherRules(docs, "doc_id", "text"))
    same(
      spark.sql("SELECT * FROM graft_shard_assign('tvf_docs','doc_id',8)"),
      ops.Shards.assign(docs, "doc_id", 8))
  }

  test("graft_stratified_sample and graft_topk_group == their Scala APIs") {
    docs.createOrReplaceTempView("tvf_docs")
    same(
      spark.sql("SELECT * FROM graft_stratified_sample('tvf_docs','source','doc_id',5)"),
      ops.Stats.stratifiedSampleBounded(docs, "source", "doc_id", 5))
    docs.selectExpr("source", "doc_id", "length(text) AS len")
      .createOrReplaceTempView("tvf_docs_len")
    same(
      spark.sql("SELECT * FROM graft_topk_group('tvf_docs_len','source','doc_id','len',3,1)"),
      ops.Stats.topKPerGroupBounded(
        spark.table("tvf_docs_len"), "source", "doc_id", "len", 3, desc = true))
  }

  test("graft_temperature_mixture / graft_unimax / graft_unimax_epochs == their Scala APIs") {
    docs.createOrReplaceTempView("tvf_docs")
    same(
      spark.sql("SELECT * FROM graft_temperature_mixture('tvf_docs','doc_id','source',0.5)"),
      ops.TextOps.temperatureMixture(docs, "doc_id", "source", 0.5))
    same(
      spark.sql("SELECT * FROM graft_unimax('tvf_docs','doc_id','source',300)"),
      ops.TextOps.unimaxMixture(docs, "doc_id", "source", 300L))
    same(
      spark.sql("SELECT * FROM graft_unimax_epochs('tvf_docs','doc_id','source',1200,3)"),
      ops.TextOps.unimaxEpochsMixture(docs, "doc_id", "source", 1200L, 3))
  }

  test("graft_c4_rules / graft_filter_pipeline == their Scala APIs; SQL composes around them") {
    docs.createOrReplaceTempView("tvf_docs")
    same(
      spark.sql("SELECT * FROM graft_c4_rules('tvf_docs','doc_id','text',3,5)"),
      ops.TextOps.c4Rules(docs, "doc_id", "text", 3, 5))
    same(
      spark.sql("SELECT * FROM graft_filter_pipeline('tvf_docs','doc_id','text','en,de')"),
      ops.TextOps.filterPipeline(docs, "doc_id", "text", Seq("en", "de")))
    import spark.implicits._
    val n = spark.sql("""
      SELECT count(*) FROM graft_filter_pipeline('tvf_docs','doc_id','text','en')
      WHERE accept""").as[Long].head()
    assert(n >= 0)
  }

  test("graft_dsir_scores / graft_linear_scores == their Scala APIs") {
    docs.createOrReplaceTempView("tvf_docs")
    docs.filter(col("source").isin("src0", "src1")).createOrReplaceTempView("tvf_target")
    same(
      spark.sql("SELECT * FROM graft_dsir_scores('tvf_docs','tvf_target','doc_id','text',256)"),
      ops.TextOps.dsirScores(docs,
        docs.filter(col("source").isin("src0", "src1")), "doc_id", "text", 256))
    val wt = ops.TextOps.lexiconGramWeights(spark,
      Seq(("join", 1000000L), ("hash join", 2000000L), ("slow", -500000L)), 256)
    wt.createOrReplaceTempView("tvf_weights")
    same(
      spark.sql("SELECT * FROM graft_linear_scores('tvf_docs','tvf_weights','doc_id','text',256,10)"),
      ops.TextOps.linearGramScores(docs, "doc_id", "text", wt, 256, 10L))
  }

  test("graft_bpe_learn / graft_bpe_encode == their Scala APIs; learn feeds encode in SQL") {
    docs.createOrReplaceTempView("tvf_docs")
    same(
      spark.sql("SELECT * FROM graft_bpe_learn('tvf_docs','text',6)"),
      ops.TextOps.learnBpeMerges(docs, "text", 6))
    // the SQL pipeline: materialize the learned table, encode with it
    spark.sql("SELECT * FROM graft_bpe_learn('tvf_docs','text',6)")
      .createOrReplaceTempView("tvf_merges")
    same(
      spark.sql("SELECT * FROM graft_bpe_encode('tvf_docs','doc_id','text','tvf_merges')"),
      ops.TextOps.applyBpeMerges(docs, "doc_id", "text",
        ops.TextOps.learnBpeMerges(docs, "text", 6)))
  }

  test("graft_containment_pairs == the Scala API") {
    docs.createOrReplaceTempView("tvf_docs_cont")
    same(
      spark.sql("SELECT * FROM graft_containment_pairs('tvf_docs_cont','doc_id','text','source',3,0.5)"),
      ops.Dedup.ngramContainmentPairs(docs, "doc_id", "text", "source", 3, 0.5))
    intercept[Exception](
      spark.sql("SELECT * FROM graft_containment_pairs('tvf_docs_cont','doc_id','text')").collect())
  }

  test("graft_lsh_band_calibration == Dedup.lshBandCalibration") {
    val d = docs.filter(col("doc_id") < 500)
    d.createOrReplaceTempView("tvf_docs_cal")
    same(
      spark.sql("SELECT * FROM graft_lsh_band_calibration('tvf_docs_cal','doc_id','text',3,12,0.2)"),
      ops.Dedup.lshBandCalibration(d, "doc_id", "text", 3, 12, 0.2))
  }

  test("graft_mmr_select == Similarity.mmrSelect") {
    emb.createOrReplaceTempView("tvf_emb_mmr")
    emb.filter(col("vec_id") === 0).createOrReplaceTempView("tvf_q_mmr")
    same(
      spark.sql("SELECT * FROM graft_mmr_select('tvf_emb_mmr','vec_id','embedding','tvf_q_mmr','embedding',4,700000)"),
      ops.Similarity.mmrSelect(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") === 0), "embedding", k = 4, lambdaMicro = 700000L))
  }

  test("graft_ivf_recall_curve == Similarity.ivfRecallCurve") {
    emb.createOrReplaceTempView("tvf_emb_rc")
    emb.filter(col("vec_id") < 5).createOrReplaceTempView("tvf_q_rc")
    same(
      spark.sql("SELECT * FROM graft_ivf_recall_curve('tvf_q_rc','tvf_emb_rc','vec_id','vec_id','embedding',10,16)"),
      ops.Similarity.ivfRecallCurve(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "vec_id", "embedding", k = 10, nlist = 16))
    intercept[Exception](
      spark.sql("SELECT * FROM graft_ivf_recall_curve('tvf_q_rc','tvf_emb_rc','vec_id','vec_id','embedding',10)").collect())
  }

  test("graft_bm25_topk / graft_token_drift == their Scala APIs") {
    val d = docs.limit(300)
    d.createOrReplaceTempView("tvf_docs_bm25")
    d.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 5)).as("qtext"))
      .createOrReplaceTempView("tvf_queries_bm25")
    same(
      spark.sql("SELECT * FROM graft_bm25_topk('tvf_docs_bm25','doc_id','text','tvf_queries_bm25','query_id','qtext',3)"),
      ops.TextOps.bm25TopK(d, "doc_id", "text",
        d.filter(col("doc_id") % 7 === 0)
          .select(col("doc_id").as("query_id"),
            concat_ws(" ", slice(split(col("text"), " "), 1, 5)).as("qtext")),
        "query_id", "qtext", 3))
    d.filter(col("doc_id") % 2 === 0).createOrReplaceTempView("tvf_drift_a")
    d.filter(col("doc_id") % 2 === 1).createOrReplaceTempView("tvf_drift_b")
    same(
      spark.sql("SELECT * FROM graft_token_drift('tvf_drift_a','tvf_drift_b','text',20)"),
      ops.TextOps.tokenDrift(d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 === 1), "text", 20))
    intercept[Exception](
      spark.sql("SELECT * FROM graft_token_drift('tvf_drift_a','tvf_drift_b')").collect())
  }

  test("graft_canonical_per_cluster == the Scala API (clusters from a temp view)") {
    val d = docs.filter(col("doc_id") < 500)
    d.createOrReplaceTempView("tvf_docs_canon")
    val pairs = ops.Dedup.minhashNearDupPairs(d, "doc_id", "text", 3, 12, 4, 0.2)
    val clusters = ops.Dedup.nearDupClusters(pairs)
    clusters.createOrReplaceTempView("tvf_clusters_canon")
    same(
      spark.sql("SELECT * FROM graft_canonical_per_cluster('tvf_docs_canon','doc_id','n_chars','tvf_clusters_canon')"),
      ops.Dedup.canonicalPerCluster(d, "doc_id", "n_chars", clusters))
    intercept[Exception](
      spark.sql("SELECT * FROM graft_canonical_per_cluster('tvf_docs_canon','doc_id')").collect())
  }

  test("graft_kcenter_coreset == the Scala API") {
    emb.createOrReplaceTempView("tvf_emb_kcenter")
    same(
      spark.sql("SELECT * FROM graft_kcenter_coreset('tvf_emb_kcenter','vec_id','embedding',4)"),
      ops.Similarity.kCenterGreedy(emb, "vec_id", "embedding", 4))
    intercept[Exception](
      spark.sql("SELECT * FROM graft_kcenter_coreset('tvf_emb_kcenter','vec_id')").collect())
  }

  test("graft_unigram_learn / graft_unigram_encode == their Scala APIs; learn feeds encode in SQL") {
    docs.createOrReplaceTempView("tvf_docs_uni")
    same(
      spark.sql("SELECT * FROM graft_unigram_learn('tvf_docs_uni','text',20)"),
      ops.TextOps.learnUnigramVocab(docs, "text", vocabSize = 20))
    // the SQL pipeline: materialize the learned vocab, Viterbi-encode with it
    spark.sql("SELECT * FROM graft_unigram_learn('tvf_docs_uni','text',20,4,2,4,16)")
      .createOrReplaceTempView("tvf_uni_vocab")
    same(
      spark.sql("SELECT * FROM graft_unigram_encode('tvf_docs_uni','doc_id','text','tvf_uni_vocab',4,16)"),
      ops.TextOps.encodeUnigram(docs, "doc_id", "text",
        ops.TextOps.learnUnigramVocab(docs, "text", vocabSize = 20)))
    // arity misuse fails loudly
    intercept[Exception](
      spark.sql("SELECT * FROM graft_unigram_learn('tvf_docs_uni','text')").collect())
  }

  test("graft_changes == BucketedStore.changes; composes with SQL filters") {
    val root = tmpDir("tvfcdf")
    val store = new graft.core.BucketedStore(root, numBuckets = 8)
    import spark.implicits._
    store.write((1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"), "f", Seq("id"))
    store.merge("f", Seq((7L, "UPDATED"), (99L, "NEW")).toDF("id", "v"), Seq("id"))
    same(
      spark.sql(s"SELECT * FROM graft_changes('$root','f','id',0,1,8)"),
      store.changes("f", Seq("id"), 0L, 1L))
    // SQL composes around the feed
    val n = spark.sql(
      s"SELECT count(*) FROM graft_changes('$root','f','id',0,1,8) WHERE _change_type = 'insert'")
      .as[Long].head()
    assert(n == 1L)
  }

  test("graft_time_travel == BucketedStore.read at each version; -1 = latest") {
    val root = tmpDir("tvftt")
    val store = new graft.core.BucketedStore(root, numBuckets = 8)
    import spark.implicits._
    store.write((1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"), "f", Seq("id"))
    store.merge("f", Seq((7L, "UPDATED"), (99L, "NEW")).toDF("id", "v"), Seq("id"))
    same(
      spark.sql(s"SELECT * FROM graft_time_travel('$root','f','id',0,8)"),
      store.read("f", Seq("id"), Some(0L)))
    same(
      spark.sql(s"SELECT * FROM graft_time_travel('$root','f','id',-1,8)"),
      store.read("f", Seq("id")))
    // v0 must NOT see the merge
    import spark.implicits._
    val v0 = spark.sql(
      s"SELECT count(*) FROM graft_time_travel('$root','f','id',0,8) WHERE id = 99")
      .as[Long].head()
    assert(v0 == 0L)
  }

  test("SQL aggregate surface: graft_reservoir in GROUP BY == the Scala sampler") {
    docs.createOrReplaceTempView("tvf_docs")
    val sqlIds = spark.sql(s"""
        SELECT source, s.id AS doc_id
        FROM (SELECT source, graft_reservoir(
                pmod(graft_md5hash60(CAST(doc_id AS STRING)), ${ops.Dedup.P}L),
                doc_id, 5) AS smp
              FROM tvf_docs GROUP BY source)
        LATERAL VIEW explode(smp) t AS s""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val scalaIds = ops.Stats.stratifiedSampleBounded(docs, "source", "doc_id", 5)
      .select("source", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(sqlIds == scalaIds)
  }

  test("SQL aggregate surface: graft_freq_items guarantees a >N/(k+1) item survives") {
    docs.createOrReplaceTempView("tvf_docs")
    // half the stream is one item — true count N/2 > N/4, so the sketch
    // GUARANTEES it in the output (the Misra-Gries bound); the rest are
    // near-unique and may legitimately all be retired
    val r = spark.sql("""
        SELECT graft_freq_items(
          CASE WHEN doc_id % 2 = 0 THEN 'heavy' ELSE concat('x', doc_id) END, 3) AS f
        FROM tvf_docs""")
      .selectExpr("f.n", "size(f.items)", "f.items").collect()(0)
    assert(r.getLong(0) == docs.count())
    assert(r.getInt(1) <= 3 && r.getInt(1) >= 1)
    val items = r.getSeq[org.apache.spark.sql.Row](2).map(_.getString(0))
    assert(items.contains("heavy"))
  }

  test("round-11 TVFs == their Scala APIs (chunk, lines, unigram, percentiles, scalars)") {
    docs.createOrReplaceTempView("tvf_docs")
    same(
      spark.sql("SELECT * FROM graft_chunk_documents('tvf_docs','doc_id','text',32,8)"),
      ops.TextOps.chunkDocuments(docs, "doc_id", "text", 32, 8))
    // newline-structured fixture for the line strip
    docs.select(col("doc_id"),
        concat_ws("\n", lit("banner"), col("text"), lit("banner")).as("text"))
      .createOrReplaceTempView("tvf_ldocs")
    same(
      spark.sql("SELECT * FROM graft_strip_frequent_lines('tvf_ldocs','doc_id','text',5)"),
      ops.Dedup.stripFrequentLines(
        spark.table("tvf_ldocs"), "doc_id", "text", 5))
    same(
      spark.sql("SELECT * FROM graft_unigram_learn('tvf_docs','text',40)"),
      ops.TextOps.learnUnigramVocab(docs, "text", 40))
    spark.sql("SELECT * FROM graft_unigram_learn('tvf_docs','text',40)")
      .createOrReplaceTempView("tvf_uvocab")
    same(
      spark.sql("SELECT * FROM graft_unigram_encode('tvf_docs','doc_id','text','tvf_uvocab')"),
      ops.TextOps.encodeUnigram(docs, "doc_id", "text",
        ops.TextOps.learnUnigramVocab(docs, "text", 40)))
    same(
      spark.sql("SELECT * FROM graft_exact_percentiles('tvf_docs','n_chars','0.25,0.5,0.75')"),
      ops.Stats.exactPercentilesUnbounded(docs, "n_chars", Seq(0.25, 0.5, 0.75)))
    same(
      spark.sql("SELECT * FROM graft_grouped_exact_percentiles('tvf_docs','lang','n_chars','0.5,0.9')"),
      ops.Stats.groupedExactPercentilesUnbounded(docs, "lang", "n_chars", Seq(0.5, 0.9)))
    // scalar compositions
    val r = spark.sql(
      "SELECT graft_strip_html('<p>a</p><script>x</script>b &amp; c') AS h, " +
      "graft_canonical_text('  Caf\u00e9   du  PARC ') AS c, " +
      "graft_registered_domain('news.bbc.co.uk') AS d").head()
    assert(r.getString(0) == "a b & c")
    assert(r.getString(1) == "cafe du parc")
    assert(r.getString(2) == "bbc.co.uk")
  }

  test("graft_hard_negatives / graft_sample_negatives == their Scala APIs") {
    emb.createOrReplaceTempView("tvf_emb_hn")
    emb.filter(col("vec_id") < 4).createOrReplaceTempView("tvf_anchors_hn")
    same(
      spark.sql("SELECT * FROM graft_hard_negatives('tvf_anchors_hn','tvf_emb_hn','vec_id','vec_id','embedding',5,0.98D)"),
      ops.Similarity.hardNegatives(emb.filter(col("vec_id") < 4), emb,
        "vec_id", "vec_id", "embedding", k = 5, maxCosine = 0.98))
    val corpus = docs.filter(col("doc_id") < 100)
    corpus.createOrReplaceTempView("tvf_corpus_ns")
    corpus.filter(col("doc_id") < 8).createOrReplaceTempView("tvf_anchors_ns")
    same(
      spark.sql("SELECT * FROM graft_sample_negatives('tvf_anchors_ns','doc_id','tvf_corpus_ns','doc_id',5,100,'n_chars',3)"),
      ops.Shards.sampleNegatives(corpus.filter(col("doc_id") < 8), "doc_id",
        corpus, "doc_id", k = 5, nCorpus = 100L,
        payloadCols = Seq("n_chars"), seed = 3L))
  }

  test("graft_embedding_drift == Similarity.embeddingDrift") {
    emb.filter(col("vec_id") % 2 === 0).createOrReplaceTempView("tvf_edrift_a")
    emb.filter(col("vec_id") % 2 === 1).createOrReplaceTempView("tvf_edrift_b")
    same(
      spark.sql("SELECT * FROM graft_embedding_drift('tvf_edrift_a','tvf_edrift_b','embedding')"),
      ops.Similarity.embeddingDrift(emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1), "embedding"))
  }

  test("graft_embedding_shape_drift == Similarity.embeddingShapeDrift") {
    emb.filter(col("vec_id") % 2 === 0).createOrReplaceTempView("tvf_esdrift_a")
    emb.filter(col("vec_id") % 2 === 1).createOrReplaceTempView("tvf_esdrift_b")
    same(
      spark.sql("SELECT * FROM graft_embedding_shape_drift('tvf_esdrift_a','tvf_esdrift_b','embedding')"),
      ops.Similarity.embeddingShapeDrift(emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1), "embedding"))
  }

  test("graft_semantic_decontaminate == Similarity.semanticDecontaminate") {
    emb.createOrReplaceTempView("tvf_sdecon_c")
    emb.filter(col("vec_id") % 97 === 0).createOrReplaceTempView("tvf_sdecon_e")
    same(
      spark.sql("SELECT * FROM graft_semantic_decontaminate('tvf_sdecon_c','vec_id','tvf_sdecon_e','vec_id','embedding',0.95)"),
      ops.Similarity.semanticDecontaminate(emb,
        emb.filter(col("vec_id") % 97 === 0),
        "vec_id", "vec_id", "embedding", threshold = 0.95))
  }

  test("graft_token_drift_by_group == TextOps.tokenDriftByGroup") {
    docs.filter(col("doc_id") % 2 === 0).createOrReplaceTempView("tvf_gdrift_a")
    docs.filter(col("doc_id") % 2 === 1).createOrReplaceTempView("tvf_gdrift_b")
    same(
      spark.sql("SELECT * FROM graft_token_drift_by_group('tvf_gdrift_a','tvf_gdrift_b','text','source',5)"),
      ops.TextOps.tokenDriftByGroup(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "text", "source", topM = 5))
  }

  test("graft_embedding_drift_by_group == Similarity.embeddingDriftByGroup") {
    emb.filter(col("vec_id") % 2 === 0).createOrReplaceTempView("tvf_gedrift_a")
    emb.filter(col("vec_id") % 2 === 1).createOrReplaceTempView("tvf_gedrift_b")
    same(
      spark.sql("SELECT * FROM graft_embedding_drift_by_group('tvf_gedrift_a','tvf_gedrift_b','embedding','label')"),
      ops.Similarity.embeddingDriftByGroup(emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1), "embedding", "label"))
  }

  test("graft_token_profile / graft_embedding_profile == the Scala profile builders") {
    docs.createOrReplaceTempView("tvf_prof_docs")
    emb.createOrReplaceTempView("tvf_prof_emb")
    same(
      spark.sql("SELECT * FROM graft_token_profile('tvf_prof_docs','text')"),
      ops.TextOps.tokenProfile(docs, "text"))
    same(
      spark.sql("SELECT * FROM graft_embedding_profile('tvf_prof_emb','embedding')"),
      ops.Similarity.embeddingProfile(emb, "embedding"))
  }

  test("profile-served monitor TVFs: build with the builder TVFs, serve with the from_profiles TVFs == the direct Scala routes") {
    docs.filter(col("doc_id") % 2 === 0).createOrReplaceTempView("tvf_psrv_da")
    docs.filter(col("doc_id") % 2 === 1).createOrReplaceTempView("tvf_psrv_db")
    emb.filter(col("vec_id") % 2 === 0).createOrReplaceTempView("tvf_psrv_ea")
    emb.filter(col("vec_id") % 2 === 1).createOrReplaceTempView("tvf_psrv_eb")
    // build the profiles entirely in SQL — the serving read consumes them
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW tvf_psrv_tpa AS SELECT * FROM graft_token_profile('tvf_psrv_da','text')")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW tvf_psrv_tpb AS SELECT * FROM graft_token_profile('tvf_psrv_db','text')")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW tvf_psrv_epa AS SELECT * FROM graft_embedding_profile('tvf_psrv_ea','embedding')")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW tvf_psrv_epb AS SELECT * FROM graft_embedding_profile('tvf_psrv_eb','embedding')")
    same(
      spark.sql("SELECT * FROM graft_token_drift_from_profiles('tvf_psrv_tpa','tvf_psrv_tpb',20)"),
      ops.TextOps.tokenDrift(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "text", topM = 20))
    same(
      spark.sql("SELECT * FROM graft_embedding_drift_from_profiles('tvf_psrv_epa','tvf_psrv_epb')"),
      ops.Similarity.embeddingDrift(emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1), "embedding"))
    same(
      spark.sql("SELECT * FROM graft_embedding_shape_drift_from_profiles('tvf_psrv_epa','tvf_psrv_epb')"),
      ops.Similarity.embeddingShapeDrift(emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1), "embedding"))
  }

  test("SEGMENTED profile TVFs: grouped builders + grouped from_profiles reads == the direct Scala routes") {
    docs.filter(col("doc_id") % 2 === 0).createOrReplaceTempView("tvf_gp_da")
    docs.filter(col("doc_id") % 2 === 1).createOrReplaceTempView("tvf_gp_db")
    emb.filter(col("vec_id") % 2 === 0).createOrReplaceTempView("tvf_gp_ea")
    emb.filter(col("vec_id") % 2 === 1).createOrReplaceTempView("tvf_gp_eb")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW tvf_gp_tpa AS SELECT * FROM graft_token_profile_by_group('tvf_gp_da','text','source')")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW tvf_gp_tpb AS SELECT * FROM graft_token_profile_by_group('tvf_gp_db','text','source')")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW tvf_gp_epa AS SELECT * FROM graft_embedding_profile_by_group('tvf_gp_ea','embedding','label')")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW tvf_gp_epb AS SELECT * FROM graft_embedding_profile_by_group('tvf_gp_eb','embedding','label')")
    same(
      spark.sql("SELECT * FROM graft_token_drift_by_group_from_profiles('tvf_gp_tpa','tvf_gp_tpb','source',5)"),
      ops.TextOps.tokenDriftByGroup(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "text", "source", topM = 5))
    same(
      spark.sql("SELECT * FROM graft_embedding_drift_by_group_from_profiles('tvf_gp_epa','tvf_gp_epb','label')"),
      ops.Similarity.embeddingDriftByGroup(emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1), "embedding", "label"))
    same(
      spark.sql("SELECT * FROM graft_embedding_shape_drift_by_group_from_profiles('tvf_gp_epa','tvf_gp_epb','label')"),
      ops.Similarity.embeddingShapeDriftByGroup(emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1), "embedding", "label"))
  }

  test("graft_ks_drift / graft_ks_drift_by_group == Stats.ksDrift routes") {
    val ev = Tables.load(spark, sfDir, "events")
    ev.filter(col("user_id") % 2 === 0).createOrReplaceTempView("tvf_ks_a")
    ev.filter(col("user_id") % 2 === 1).createOrReplaceTempView("tvf_ks_b")
    same(
      spark.sql("SELECT * FROM graft_ks_drift('tvf_ks_a','tvf_ks_b','value')"),
      ops.Stats.ksDrift(ev.filter(col("user_id") % 2 === 0),
        ev.filter(col("user_id") % 2 === 1), "value"))
    same(
      spark.sql("SELECT * FROM graft_ks_drift_by_group('tvf_ks_a','tvf_ks_b','value','event_type')"),
      ops.Stats.ksDriftByGroup(ev.filter(col("user_id") % 2 === 0),
        ev.filter(col("user_id") % 2 === 1), "value", "event_type"))
  }

  test("graft_category_drift_timeline == Events.categoryDriftTimeline") {
    val ev = Tables.load(spark, sfDir, "events")
    val ref = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    ev.createOrReplaceTempView("tvf_cdt_ev")
    ref.createOrReplaceTempView("tvf_cdt_ref")
    same(
      spark.sql("SELECT * FROM graft_category_drift_timeline('tvf_cdt_ev','event_type','ts','tvf_cdt_ref',604800)"),
      ops.Events.categoryDriftTimeline(ev, "event_type", "ts", ref, 604800L))
  }

  test("graft_numeric_profile / graft_numeric_shape_drift(_from_profiles) == the Stats scalar-monitor routes") {
    val ev = Tables.load(spark, sfDir, "events")
    ev.filter(col("user_id") % 2 === 0).createOrReplaceTempView("tvf_nsd_a")
    ev.filter(col("user_id") % 2 === 1).createOrReplaceTempView("tvf_nsd_b")
    same(
      spark.sql("SELECT * FROM graft_numeric_profile('tvf_nsd_a','value',16,31250000)"),
      ops.Stats.numericProfile(ev.filter(col("user_id") % 2 === 0), "value"))
    same(
      spark.sql("SELECT * FROM graft_numeric_shape_drift('tvf_nsd_a','tvf_nsd_b','value',16,31250000)"),
      ops.Stats.numericShapeDrift(ev.filter(col("user_id") % 2 === 0),
        ev.filter(col("user_id") % 2 === 1), "value"))
    spark.sql("SELECT * FROM graft_numeric_profile('tvf_nsd_a','value',16,31250000)")
      .createOrReplaceTempView("tvf_nsd_pa")
    spark.sql("SELECT * FROM graft_numeric_profile('tvf_nsd_b','value',16,31250000)")
      .createOrReplaceTempView("tvf_nsd_pb")
    same(
      spark.sql("SELECT * FROM graft_numeric_shape_drift_from_profiles('tvf_nsd_pa','tvf_nsd_pb')"),
      ops.Stats.numericShapeDrift(ev.filter(col("user_id") % 2 === 0),
        ev.filter(col("user_id") % 2 === 1), "value"))
  }

  test("graft_token_drift_attribution_by_group == TextOps.tokenDriftAttributionByGroup") {
    docs.filter(col("doc_id") % 40 < 20).createOrReplaceTempView("tvf_gattr_a")
    docs.filter(col("doc_id") % 40 >= 20).createOrReplaceTempView("tvf_gattr_b")
    same(
      spark.sql("SELECT * FROM graft_token_drift_attribution_by_group('tvf_gattr_a','tvf_gattr_b','doc_id','text','source',5,3)"),
      ops.TextOps.tokenDriftAttributionByGroup(
        docs.filter(col("doc_id") % 40 < 20),
        docs.filter(col("doc_id") % 40 >= 20),
        "doc_id", "text", "source", topM = 5, topK = 3))
  }

  test("graft_embedding_drift_attribution_by_group == Similarity.embeddingDriftAttributionByGroup") {
    emb.filter(col("vec_id") % 2 === 0).createOrReplaceTempView("tvf_geattr_a")
    emb.filter(col("vec_id") % 2 === 1).createOrReplaceTempView("tvf_geattr_b")
    same(
      spark.sql("SELECT * FROM graft_embedding_drift_attribution_by_group('tvf_geattr_a','tvf_geattr_b','vec_id','embedding','label',3,5)"),
      ops.Similarity.embeddingDriftAttributionByGroup(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", "label", topD = 3, topK = 5))
  }

  test("non-literal and malformed TVF arguments fail loudly") {
    docs.createOrReplaceTempView("tvf_docs")
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft_neardup_pairs('tvf_docs','doc_id','text',3,12,4)"))
    assert(e.getMessage.contains("usage:"), e.getMessage)
  }
}
