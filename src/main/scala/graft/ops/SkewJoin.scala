package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-tolerant equi-join via key salting (the manual complement to AQE's
  * runtime skew-join splitting — use when a handful of hot keys are known to
  * dominate, e.g. null-like sentinel entities in a 100 TB feature join).
  *
  * Two operators:
  *  - [[saltedEquiJoin]] salts EVERY left row and replicates the whole right
  *    side ×salts — simple, but pays replication on keys that aren't skewed.
  *  - [[hotKeySaltedJoin]] detects the heavy-hitter keys first (one narrow
  *    count-aggregate over the key columns only), salts ONLY those rows, and
  *    plain-joins the rest. At 100 TB this is the shape you want: the ×salts
  *    replication cost applies to a bounded handful of keys, the cold path
  *    stays a vanilla shuffle join, and the hot-key set is small enough to
  *    ship as a literal IN-list filter on both sides.
  */
object SkewJoin {

  /** Join types the salted paths can express: the right side is replicated
    * ×salts, so an UNMATCHED right row would surface once per replica under
    * right/full-outer — refuse those instead of silently multiplying rows.
    * (For a right-skewed right/full join, swap the sides.) */
  private val SaltableJoinTypes = Set("inner", "left", "leftouter", "left_outer", "cross")

  def saltedEquiJoin(left: DataFrame, right: DataFrame, on: Seq[String],
                     salts: Int, joinType: String = "inner",
                     saltCols: Seq[String] = Nil): DataFrame = {
    require(salts > 0)
    require(SaltableJoinTypes(joinType.toLowerCase.replace(" ", "")),
      s"salted join supports ${SaltableJoinTypes.mkString("/")}, not $joinType")
    // enforced, not just documented: a saltCols list that is a subset of the
    // join keys is constant WITHIN each key, so every hot row would hash to
    // one salt — zero spread — while the right side still pays the ×salts
    // explode
    require(saltCols.isEmpty || saltCols.exists(c => !on.contains(c)),
      s"saltCols (${saltCols.mkString(",")}) must include a column outside the " +
        s"join keys (${on.mkString(",")}), or the salt is constant per key and spreads nothing")
    // salt must be (a) a pure function of the ROW, not of task placement —
    // rand(seed) re-draws per task attempt, so AQE replanning or a retry
    // re-salts rows non-reproducibly — and (b) varying WITHIN a hot key, or
    // every hot row lands on one salt and nothing spreads (key-only hashing
    // is useless here). Default: hash every left column. At 100 TB pass
    // `saltCols` = join keys + one unique/high-cardinality column so wide
    // rows don't pay a full-row hash per row.
    val src = if (saltCols.nonEmpty) saltCols else left.columns.toSeq
    val l = left.withColumn("__salt",
      pmod(xxhash64(src.map(col): _*), lit(salts)).cast("int"))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, on :+ "__salt", joinType).drop("__salt")
  }

  /** Keys owning more than `hotFraction` of the (sampled) left rows.
    * Detection cost is one aggregate over the key columns only — the payload
    * never moves — on a `sampleFraction` sample (1.0 = exact). Returns at
    * most 1/hotFraction keys by construction, so collecting them is bounded
    * regardless of table size. */
  def hotKeys(left: DataFrame, on: Seq[String], hotFraction: Double = 0.01,
              sampleFraction: Double = 1.0): Seq[Seq[Any]] = {
    require(hotFraction > 0 && hotFraction <= 1)
    val keys = left.select(on.map(col): _*)
    val sampled = (if (sampleFraction < 1.0) keys.sample(sampleFraction, seed = 7) else keys)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // scalar total first, then a literal threshold on the per-key counts —
      // NOT a global window over the counted frame, which would funnel every
      // key's count through one partition
      val tot = sampled.count()
      sampled.groupBy(on.map(col): _*).agg(count(lit(1)).as("__n"))
        .where(col("__n") >= lit(math.max(1.0, tot * hotFraction)))
        .select(on.map(col): _*).collect().map(_.toSeq).toSeq
    } finally { sampled.unpersist() }
  }

  /** Two-path skew join: rows whose key is in `hot` take the salted path
    * (hot-key rows spread over `salts` reducers; only the hot slice of the
    * right side is replicated), everything else takes a plain shuffle join.
    * The two paths partition the key space, so their union is exactly the
    * full join for inner/left/right/full alike.
    *
    * Pass `hot` from [[hotKeys]] (or a known sentinel list). Keys are
    * compared as literal tuples — the hot set is bounded, so the IN-filter
    * is a broadcast-free codegen'd predicate on both sides. Join types are
    * limited to [[SaltableJoinTypes]] (see there for why).
    */
  def hotKeySaltedJoin(left: DataFrame, right: DataFrame, on: Seq[String],
                       salts: Int, hot: Seq[Seq[Any]],
                       joinType: String = "inner",
                       saltCols: Seq[String] = Nil): DataFrame = {
    require(salts > 0)
    if (hot.isEmpty) return left.join(right, on, joinType)
    val hotPred: Column = hot.map { kv =>
      on.zip(kv).map { case (c, v) => col(c) <=> lit(v) }.reduce(_ && _)
    }.reduce(_ || _)
    // isin-style predicates are NULL on null keys and filter() drops NULL —
    // coalesce so null-keyed rows deterministically route to the cold path
    // (they never equi-match, but outer joins must still preserve them)
    val isHot = coalesce(hotPred, lit(false))
    val hotJoin = saltedEquiJoin(
      left.where(isHot), right.where(isHot), on, salts, joinType, saltCols)
    val coldJoin = left.where(!isHot).join(right.where(!isHot), on, joinType)
    hotJoin.unionByName(coldJoin)
  }

  /** Convenience: detect heavy hitters on the left side, then run the
    * two-path join. `hotFraction` = share of left rows a key must own to be
    * salted (default 1%). */
  def autoSaltedJoin(left: DataFrame, right: DataFrame, on: Seq[String],
                     salts: Int, hotFraction: Double = 0.01,
                     joinType: String = "inner",
                     saltCols: Seq[String] = Nil): DataFrame =
    hotKeySaltedJoin(left, right, on, salts,
      hotKeys(left, on, hotFraction), joinType, saltCols)
}
