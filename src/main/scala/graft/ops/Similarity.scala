package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star surface; the reference stack's Ray Data declares Arrow tensor
  * columns — reference: examples/pyproject.toml:78 — but no similarity ops).
  *
  * Numeric determinism: float dot products are order-dependent, so for
  * oracle-checkable results every vector is first quantized to integer
  * micro-units (`round(x * 1e6)`). Dot products and norms are then EXACT
  * int64 arithmetic (64 dims × (3e5)² ≈ 6e12 ≪ 2^63) and the final
  * `dot / sqrt(n_a*n_b)` is a single correctly-rounded IEEE op — bit-identical
  * in any engine. Quantization error (~1e-6 relative) is far below any
  * meaningful similarity threshold.
  *
  * Scale design:
  *  - Brute force is the correctness baseline: a broadcast of the (small)
  *    query set against the corpus — never corpus×corpus.
  *  - The LSH path blocks the corpus into random-hyperplane sign buckets:
  *    only same-bucket (or probed-neighbor-bucket) pairs are scored; the
  *    shuffle is keyed on the bucket id. Hyperplanes are pseudo-random but
  *    deterministic (md5-derived ±1 components), so results are reproducible
  *    and oracle-checkable.
  */
object Similarity {

  /** Quantize float[dim] to exact integer micro-units (array<long>). */
  def quantize(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * 1000000d).cast("long"))

  /** Exact int64 dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Cosine similarity of two quantized vectors (exact ints → one IEEE div). */
  def cosineQ(a: Column, b: Column): Column = {
    // norms are exact int64 (< 2^53) but their PRODUCT overflows int64 —
    // convert each to double first (exact), one rounding in the multiply.
    val d = dotQ(a, b).cast("double")
    val na = dotQ(a, a)
    val nb = dotQ(b, b)
    when(na === 0 || nb === 0, lit(0.0))
      .otherwise(d / sqrt(na.cast("double") * nb.cast("double")))
  }

  /** Brute-force cosine top-k: for each query vector, the k most similar
    * corpus vectors. The query side is broadcast (queries ≪ corpus); the
    * corpus streams through once; per-query top-k is a keyed window, so no
    * global sort and no corpus×corpus blow-up. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     queryIdCol: String, corpusIdCol: String, vecCol: String,
                     k: Int): DataFrame = {
    val q = queries.select(col(queryIdCol).as("query_id"), quantize(col(vecCol)).as("__qv"))
    val c = corpus.select(col(corpusIdCol).as("corpus_id"), quantize(col(vecCol)).as("__cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("corpus_id") || lit(true))
      .select(col("query_id"), col("corpus_id"), cosineQ(col("__qv"), col("__cv")).as("cosine"))
    TopK.perGroup(scored, Seq("query_id"),
      Seq(col("cosine").desc, col("corpus_id").asc), k, rankCol = "rank")
  }

  /** Deterministic pseudo-random ±1 hyperplane component for (plane, dim):
    * the low bit of a 60-bit md5 hash. */
  private def signComponent(plane: Int, i: Column): Column =
    Dedup.md5Hash60(concat_ws(":", lit("plane"), lit(plane), i))
      .bitwiseAND(lit(1L)) * 2 - 1

  /** Random-hyperplane LSH bucket id: `planes` sign bits packed into a long —
    * bit p is (±1-plane-p · vec) > 0. Same-bucket vectors agree on every
    * hyperplane side — cosine-similar vectors collide with high probability. */
  def lshBucketImpl(qvec: Column, planes: Int): Column = {
    // dot of ±1 plane p with quantized vec: sum_i sign(p,i) * v[i]
    def planeDot(p: Int): Column =
      aggregate(
        zip_with(qvec, sequence(lit(0), size(qvec) - 1), (v, i) => v * signComponent(p, i)),
        lit(0L), (acc, x) => acc + x)
    (0 until planes).map(p => when(planeDot(p) > 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** LSH-bucketed cosine top-k: score only same-bucket pairs. Approximate
    * (recall < 1 across bucket boundaries) but the shuffle is keyed on the
    * bucket id — the 100 TB path. Deterministic, so still oracle-checkable. */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              queryIdCol: String, corpusIdCol: String, vecCol: String,
              k: Int, planes: Int = 4): DataFrame = {
    val q = queries.select(col(queryIdCol).as("query_id"), quantize(col(vecCol)).as("__qv"))
      .withColumn("__bucket", lshBucketImpl(col("__qv"), planes))
    val c = corpus.select(col(corpusIdCol).as("corpus_id"), quantize(col(vecCol)).as("__cv"))
      .withColumn("__bucket", lshBucketImpl(col("__cv"), planes))
    val scored = c.join(q, Seq("__bucket"))
      .select(col("query_id"), col("corpus_id"), cosineQ(col("__qv"), col("__cv")).as("cosine"))
    TopK.perGroup(scored, Seq("query_id"),
      Seq(col("cosine").desc, col("corpus_id").asc), k, rankCol = "rank")
  }

  /** Embedding-cosine near-duplicate pairs: LSH-blocked, then exact cosine
    * filter. Same keyed-shuffle shape as [[Dedup.minhashNearDupPairs]]. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, planes: Int = 4): DataFrame = {
    val v = df.select(col(idCol), quantize(col(vecCol)).as("__v"))
      .withColumn("__bucket", lshBucketImpl(col("__v"), planes))
    val l = v.select(col(idCol).as("id_l"), col("__v").as("__v_l"), col("__bucket"))
    val r = v.select(col(idCol).as("id_r"), col("__v").as("__v_r"), col("__bucket"))
    l.join(r, Seq("__bucket")).where(col("id_l") < col("id_r"))
      .select(col("id_l"), col("id_r"), cosineQ(col("__v_l"), col("__v_r")).as("cosine"))
      .where(col("cosine") >= threshold)
      .distinct()
  }
}
