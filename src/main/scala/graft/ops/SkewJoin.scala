package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-tolerant equi-join via key salting (the manual complement to AQE's
  * runtime skew-join splitting — use when a handful of hot keys are known to
  * dominate, e.g. null-like sentinel entities in a 100 TB feature join).
  *
  * The left (large, skewed) side gets a random salt in [0, salts); the right
  * side is replicated `salts` times. The join key becomes (key, salt), so a
  * hot key's rows spread over `salts` reducers instead of one. Replication
  * cost is |right| × salts — use only when right ≪ left.
  */
object SkewJoin {

  def saltedEquiJoin(left: DataFrame, right: DataFrame, on: Seq[String],
                     salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // salt must be a pure function of the ROW, not of task placement:
    // rand(seed) re-draws per task attempt, so AQE replanning or a retry
    // re-salts rows non-reproducibly. xxhash64 over the full row spreads a
    // hot key uniformly and is deterministic everywhere.
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salts)).cast("int"))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, on :+ "__salt", joinType).drop("__salt")
  }
}
