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
}
