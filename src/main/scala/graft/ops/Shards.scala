package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic global shuffle + shard assignment for training-data
  * writing — the last step of a corpus pipeline: examples must reach the
  * trainer in a reproducible pseudo-random order, split into N balanced
  * shard files (north-star training-pipeline surface; the reference's
  * declared store layer writes plain table files with no ordering
  * contract — reference README.md:15-17).
  *
  * The permutation key is the first 52 bits of `md5(id:seed)` — the same
  * engine-portable uniform draw as [[Stats.weightedBernoulliSample]] — so
  * the order is reproducible across engines, retries, and cluster sizes,
  * and changing `seed` re-shuffles.
  *
  * Scale shape: [[assign]] is a pure map-side projection (zero shuffle);
  * [[shuffled]] adds the ONE shuffle a shard write inherently needs
  * (repartition on shard id + in-partition sort by the draw). There is
  * deliberately NO global row_number: a total position index would need
  * either a single-task window or a zipWithIndex two-pass; writers only
  * need (shard, within-shard order), which this provides scalably.
  */
object Shards {

  /** 52-bit uniform draw from `md5(id:seed)` — integer-exact everywhere. */
  private[ops] def u52(id: Column, seed: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + seed))), 1, 13), 16, 10)
      .cast("long")

  /** Map-side only: adds `shard` (pmod of the draw — balanced in
    * expectation, uniform by construction) and `ord` (the within-shard
    * sort key). Collisions on `ord` are broken by id at write time. */
  def assign(df: DataFrame, idCol: String, nShards: Int,
             seed: String = "graft"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val h = u52(col(idCol), seed)
    df.withColumn("ord", h).withColumn("shard", pmod(h, lit(nShards.toLong)))
  }

  /** The write-ready form: one repartition keyed on shard, rows sorted by
    * (shard, draw) — shard runs stay contiguous even when the hash
    * partitioner maps two shard ids to one task, so
    * `.write.partitionBy("shard")` (or a foreachPartition writer) emits N
    * reproducibly-shuffled files regardless of the collision layout. */
  def shuffled(df: DataFrame, idCol: String, nShards: Int,
               seed: String = "graft"): DataFrame =
    assign(df, idCol, nShards, seed)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"), col(idCol))

  /** Length-bucketed fixed-size batching — the padding-waste killer for
    * padded training/inference batches: documents bucket by
    * `floor(length / bucketWidth)`, batches of `batchSize` form WITHIN a
    * bucket (in deterministic (length, id) order), so every batch pads to
    * the max of near-equal lengths instead of the corpus max. Emits per
    * row: `bucket`, `batch` (bucket-local), `pos` (0-based slot), and
    * `batch_max_len` (what the batch pads to) — `sum(length) /
    * sum(batch_max_len)` over a batch's rows is its padding efficiency.
    *
    * Scale shape: ONE keyed exchange, on the bucket id; both window passes
    * (rank → batch slot, then the per-(bucket,batch) max) and nothing else
    * run inside that partitioning — subset clustering keeps the second
    * window and any downstream per-batch aggregation exchange-free. A
    * bucket's rows are bounded by the corpus' length distribution, not the
    * corpus (pick `bucketWidth` so buckets stay task-sized at scale; the
    * in-bucket sort is the exchange's spill-safe sort, not a global one). */
  def batchByLength(df: DataFrame, idCol: String, lengthCol: String,
                    batchSize: Int, bucketWidth: Int): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    import org.apache.spark.sql.expressions.Window
    val bucket = floor(col(lengthCol).cast("long") / lit(bucketWidth.toLong))
    val wB = Window.partitionBy(col("bucket"))
      .orderBy(col(lengthCol), col(idCol))
    val slot = row_number().over(wB) - 1
    val wBatch = Window.partitionBy(col("bucket"), col("batch"))
    df.withColumn("bucket", bucket)
      .withColumn("batch", floor(slot / lit(batchSize)).cast("long"))
      .withColumn("pos", pmod(slot, lit(batchSize)).cast("long"))
      .withColumn("batch_max_len", max(col(lengthCol)).over(wBatch))
  }

  /** Deterministic NEGATIVE sampling for contrastive-training pair
    * construction: for each anchor, k corpus rows that are provably (a)
    * never the anchor itself and (b) pairwise DISTINCT — the ring-offset
    * scheme `neg_j = (anchor + 1 + (j·B + seed) mod (N−1)) mod N` over a
    * DENSE id space [0, N), with the stride B chosen as the smallest
    * integer ≥ 2 coprime to N−1 (driver-computed, deterministic), so the
    * k offsets are distinct mod N−1 for any k ≤ N−1. Fully reproducible
    * across engines/retries/cluster sizes (pure integer arithmetic — no
    * RNG state), re-seedable, and the anchor table never shuffles: the k
    * expansion is a map-side `explode(sequence)`, the only exchange is
    * the keyed join that fetches each negative's payload columns.
    *
    * `nCorpus` is the dense-id row count, hoisted (a production caller
    * knows its corpus size; the op must not pay a count action).
    *
    * DENSE-ID CONTRACT, ENFORCED: the ring-offset guarantee assumes
    * corpus ids are exactly [0, nCorpus). A corpus with HOLES — the
    * normal shape of a post-dedup corpus, this engine's own primary
    * output — would make the payload join silently drop the missing
    * `neg_id`s and an anchor quietly gets fewer than k negatives. The
    * payload fetch is therefore a LEFT join with an in-plan raise_error
    * on any unmatched negative (zero extra jobs — the check rides the
    * join output): a holed id space fails by name, pointing at
    * re-densification (row_number over a stable order) instead of
    * under-delivering. The guard rides ALL THREE key columns (anchor_id,
    * neg_rank, neg_id) — Catalyst prunes unreferenced projections,
    * raise_error included, so a single-column guard vanishes for any
    * consumer that drops that column; a consumer would have to discard
    * every key column (an output with no anchor linkage — meaningless for
    * pair construction) to prune the contract check away. Duplicate
    * corpus ids are the join's other failure mode and surface as extra
    * output rows, not silence.
    * Output: (anchor_id, neg_rank 1..k, neg_id, payloadCols...). */
  def sampleNegatives(anchors: DataFrame, anchorIdCol: String,
      corpus: DataFrame, corpusIdCol: String, k: Int, nCorpus: Long,
      payloadCols: Seq[String] = Nil, seed: Long = 0L): DataFrame = {
    require(nCorpus >= 2, s"need at least 2 corpus rows, got $nCorpus")
    require(k >= 1 && k <= nCorpus - 1,
      s"k must be in [1, nCorpus-1] for distinct non-self negatives, got $k")
    val m = nCorpus - 1
    val stride = (2L to m + 2).find(b => BigInt(b).gcd(BigInt(m)) == 1).get
    val negId = pmod(
      col("__a") + lit(1L) + pmod(lit(stride) * (col("neg_rank") - 1) + lit(seed), lit(m)),
      lit(nCorpus))
    val expanded = anchors
      .select(col(anchorIdCol).cast("long").as("anchor_id"))
      .withColumn("__a", col("anchor_id"))
      .withColumn("neg_rank", explode(sequence(lit(1L), lit(k.toLong))))
      .select(col("anchor_id"), col("neg_rank"), negId.as("neg_id"))
    val payload = corpus
      .select((col(corpusIdCol).cast("long").as("neg_id") +: payloadCols.map(col)): _*)
      .withColumn("__present", lit(true))
    def guarded(c: Column): Column = c + when(col("__present").isNull,
      raise_error(concat(
        lit("sampleNegatives: corpus has no row for neg_id "), col("neg_id"),
        lit(s" — the dense-id contract requires corpus ids to be exactly " +
          s"[0, $nCorpus); a corpus with holes (e.g. post-dedup output) " +
          "under-delivers negatives silently — re-densify ids first " +
          "(row_number() - 1 over a stable order) or fix nCorpus")))
      ).otherwise(lit(0L))
    expanded.join(payload, Seq("neg_id"), "left")
      .select((guarded(col("anchor_id")).as("anchor_id") +:
        guarded(col("neg_rank")).as("neg_rank") +:
        guarded(col("neg_id")).as("neg_id") +:
        payloadCols.map(col)): _*)
  }
}
