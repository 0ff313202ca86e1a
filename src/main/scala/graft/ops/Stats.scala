package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution statistics over feature columns — the profiling pass a
  * training pipeline runs before normalization/clipping decisions.
  *
  * Reference scope: feray declares feature-statistics assets over its
  * feature tables (README.md:21-23); the computation shape here is
  * Spark-first.
  */
object Stats {

  /** Fixed-width histogram of `valueCol` over `[lo, hi)` with `nBins` bins;
    * out-of-range values clamp into the edge bins (no silent drops). Rows
    * with NULL values are excluded.
    *
    * Bin assignment is pure IEEE-754 double arithmetic (subtract, divide,
    * floor — each correctly rounded, so bit-identical in any conforming
    * engine), which makes the result hash-stable cross-engine.
    *
    * Scale shape: a map-side bin projection feeding one keyed aggregation —
    * partial aggregation collapses each task to ≤ `nBins` rows before the
    * shuffle, so the exchange moves O(tasks · nBins), never O(rows).
    */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double,
      nBins: Int): DataFrame = {
    val width = (hi - lo) / nBins
    val bin = least(greatest(floor((col(valueCol) - lo) / width), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("long")
    df.where(col(valueCol).isNotNull)
      .select(bin.as("bin"), col(valueCol).as("__v"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), min("__v").as("min_v"), max("__v").as("max_v"))
  }
}
