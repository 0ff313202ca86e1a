package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.TrackedCache.TrackedDataset

/** Event-stream batch operators: gap-based sessionization and time-grid
  * gap-filling (resampling). Complements the Structured Streaming
  * `session_window` path (q33) with the batch formulation a backfill over
  * historical logs needs.
  *
  * Reference scope: feray's event/feature pipelines declare sessionized and
  * regularly-resampled features over raw event logs (README.md:21-23); the
  * reference delegates the computation to its query engines, so the shapes
  * here are Spark-first designs, not translations.
  */
object Events {

  /** Gap-based sessionization: a new session starts when the time since the
    * user's previous event exceeds `gapSec` (strictly). One output row per
    * session: ordinal within the user, start/end, duration, event count,
    * distinct event types.
    *
    * Scale shape: ONE shuffle on the user key. The lag and the running
    * session counter ride the same `(user, ts, tie)` sort within that
    * exchange, and the per-session aggregation re-uses the user clustering
    * (partial agg on already-sorted data). Never a self-join, never a
    * driver-side pass. `tieCol` (a unique id) makes the order total, so the
    * session assignment is deterministic under ties.
    */
  def sessionize(df: DataFrame, userCol: String, tsCol: String, tieCol: String,
      typeCol: String, gapSec: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val us = TimeCols.epochMicros(col(tsCol))
    val prev = lag(TimeCols.epochMicros(col(tsCol)), 1).over(w)
    val isNew = when(prev.isNull || us - prev > gapSec * 1000000L, 1L).otherwise(0L)
    df.withColumn("__brk", isNew)
      .withColumn("session_seq", sum(col("__brk")).over(w))
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        count_distinct(col(typeCol)).as("n_event_types"))
      .withColumn("duration_sec",
        ((TimeCols.epochMicros(col("session_end")) - TimeCols.epochMicros(col("session_start")))
          / lit(1000000L)).cast("long"))
  }

  /** Zero-filled daily activity grid: per-key event counts over EVERY day in
    * the observed range, missing (key, day) cells filled with 0 — the
    * resample/gap-fill primitive behind regular time-series features.
    *
    * Scale shape: the only data-sized pass is the keyed daily aggregation
    * (one shuffle). The day spine is generated from the 1-row min/max
    * aggregate (`sequence` + explode — days, not events), BROADCAST into
    * the fill (the key side — the big one at scale — never shuffles for
    * the grid), and the fill join runs small×small post-agg — at 100 TB
    * the grid is |keys|·|days|, never event-sized. The grid IS the
    * output, so it rides the family's loud PRODUCT guard: |keys|·|days|
    * over `maxGrid` fails in-plan (a 10⁹-key table crossed with a
    * 10-year spine is a 3.6×10¹²-row grid no caller wants silently) —
    * evaluated on the broadcast spine side, so the guard fires while the
    * broadcast builds, before any grid row materializes.
    */
  def gapFillDaily(df: DataFrame, keyCol: String, tsCol: String,
      maxGrid: Long = 1L << 26): DataFrame = {
    require(maxGrid >= 1, s"maxGrid must be >= 1, got $maxGrid")
    // persisted: the spine bounds, the key list, and the fill join all read
    // this grid-sized frame — without the persist each use re-runs the
    // event-sized aggregation (three full scans at 100 TB)
    val daily = df
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .persistTracked()
    val spine = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    // 1-row guard stats: both factors are post-agg bounded aggregates
    val stats = daily.select(col(keyCol)).distinct().agg(count(lit(1)).as("__nk"))
      .crossJoin(daily.agg(
        (datediff(max(col("day")), min(col("day"))) + 1).cast("long").as("__nd")))
    // the PRODUCT guard multiplies in decimal(38,0): at extreme
    // cardinalities a long __nk·__nd overflows negative and would pass
    // silently. The day factor ALSO gets its own bound — the spine is
    // BROADCAST below, so a million-day range (a key set of 1 with a
    // corrupted far-future timestamp) must fail loudly rather than build
    // a driver-sized broadcast the old shuffled cross join would have
    // absorbed gracefully.
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val spineGuarded = spine.crossJoin(broadcast(stats))
      .select(col("day"),
        when(col("__nd") > maxGrid,
          raise_error(concat(lit("gapFillDaily: "), col("__nd"),
            lit(s" days > maxGrid=$maxGrid — the day spine broadcasts, so " +
              "the time range alone must stay grid-bounded; check for " +
              "outlier timestamps or bound the range"))))
          .when(dec(col("__nk")) * dec(col("__nd")) > dec(lit(maxGrid)),
            raise_error(concat(lit("gapFillDaily: grid "), col("__nk"),
              lit(" keys × "), col("__nd"),
              lit(s" days > maxGrid=$maxGrid — bound the key set or the " +
                "time range; raise the cap only if the cluster can hold " +
                "the full grid"))))
          .otherwise(lit(0L)).as("__zero"))
    val grid = daily.select(col(keyCol)).distinct().crossJoin(broadcast(spineGuarded))
    grid.join(daily, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"),
        (coalesce(col("n_events"), lit(0L)) + col("__zero")).as("n_events"))
  }

  /** Three-step funnel in ONE user-keyed shuffle — no self-joins. For each
    * user: `t1` = earliest step-1 event, `t2` = earliest step-2 event
    * strictly after SOME step-1 event, `t3` = likewise after a qualifying
    * step-2. Prefix window minima make the per-row qualification exact: a
    * step-2 row qualifies iff a step-1 event precedes it in time, which is
    * precisely a property of its own ordered prefix — so the running
    * `min(step-1 ts)` decides it without a join, and the global minima fall
    * out of the final aggregation on the same clustering. Times are emitted
    * as epoch micros (exact int64).
    */
  def funnel(df: DataFrame, userCol: String, tsCol: String, tieCol: String,
      typeCol: String, s1: String, s2: String, s3: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // materialize each running min before the next consults it — the window
    // specs are identical, so the projections share one exchange + sort
    val step1 = col(typeCol) === s1
    val base = df.withColumn("__us", TimeCols.epochMicros(col(tsCol)))
      .withColumn("__t1c", when(step1, col("__us")))
      .withColumn("__t1r", min(col("__t1c")).over(w))
    val step2 = col(typeCol) === s2 && col("__t1r").isNotNull && col("__us") > col("__t1r")
    val base2 = base.withColumn("__t2c", when(step2, col("__us")))
      .withColumn("__t2r", min(col("__t2c")).over(w))
    val step3 = col(typeCol) === s3 && col("__t2r").isNotNull && col("__us") > col("__t2r")
    base2
      .withColumn("__t3c", when(step3, col("__us")))
      .groupBy(col(userCol))
      .agg(min("__t1c").as("t1_us"), min("__t2c").as("t2_us"), min("__t3c").as("t3_us"))
      .withColumn("depth",
        when(col("t3_us").isNotNull, 3)
          .when(col("t2_us").isNotNull, 2)
          .when(col("t1_us").isNotNull, 1).otherwise(0))
  }

  /** Weekly retention cohorts: users grouped by the ISO week of their first
    * activity; for each (cohort_week, week_offset) the count of users still
    * active that many weeks later.
    *
    * Scale shape: per-user-day distinct + per-user first-day agg + the
    * activity⋈first join are ALL keyed on the user — one clustering reused
    * thrice; the final cohort rollup aggregates |users|·|active days| →
    * |cohorts|·|offsets| with map-side partials.
    */
  def retentionCohorts(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val active = df.select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d")).distinct()
    val first = active.groupBy("__u").agg(min("__d").as("__d0"))
    active.join(first, "__u")
      .select(col("__u"),
        date_trunc("week", col("__d0")).cast("date").as("cohort_week"),
        expr("datediff(__d, __d0) div 7").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count_distinct(col("__u")).as("n_users"))
  }

  /** Per-key exponentially-weighted moving average over the event stream —
    * the classic time-decayed feature (recent behavior weighs more):
    * y₀ = x₀, yᵢ = (1−α)·yᵢ₋₁ + α·xᵢ over the key's events in
    * (ts, id) order. Events with NULL values are excluded.
    *
    * The fold is ONE ordered left-reduce of correctly-rounded double ops:
    * the streaming per-key walk here and DuckDB's `list_reduce` in the q175
    * oracle visit the identical element order with the identical per-step
    * arithmetic, so the result is bit-exact cross-engine whenever α
    * (and 1−α) are exactly representable doubles — use dyadic alphas
    * (0.25, 0.5, 0.125…) when hash-exactness matters; any α is fine for
    * same-engine use. A recursive definition can't ride a builtin window
    * frame (each value depends on the previous RESULT), which is why this
    * is a grouped fold and not a Window.
    *
    * Scale shape: one key-keyed exchange with SECONDARY SORT — repartition
    * by key, sort within partitions by (key, ts, id, value), then a
    * streaming per-partition fold that holds ONE accumulator per in-flight
    * key. No per-key array ever materializes (the r11 shape collected each
    * key's whole event series into one `collect_list` buffer — a hot key's
    * history was its reducer's task memory), so a key with 10⁹ events folds
    * at constant memory. Output: (key, n_events, ewma).
    * Preconditions: event timestamps are non-NULL (a NULL ts would sort
    * nulls-first here but nulls-last in most SQL engines — exclude or
    * impute them upstream), and the key is an atomic comparable type
    * (group-boundary detection uses value equality). */
  def ewmaPerKey(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val kField = df.schema(keyCol)
    // group-boundary detection below uses external-value equality (`==` on
    // Row.get). That is value equality for every orderable external type
    // Spark will let through the repartition/sort (numerics, strings,
    // date/time, decimals, arrays→ArraySeq, structs→Row) EXCEPT BinaryType,
    // whose Array[Byte] compares by reference — every event would silently
    // become its own group. Fail loudly instead of documenting a footgun.
    require(!kField.dataType.isInstanceOf[BinaryType],
      s"ewmaPerKey: key column '$keyCol' is BINARY — Array[Byte] equality is " +
        "reference-based, so group boundaries cannot be detected; cast the " +
        "key to STRING (e.g. hex(key)) first")
    val prepared = df.where(col(valueCol).isNotNull)
      .select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
        col(idCol).as("__id"), col(valueCol).cast("double").as("__v"))
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__ts"), col("__id"), col("__v"))
    val outSchema = StructType(Seq(
      StructField(keyCol, kField.dataType, kField.nullable),
      StructField("n_events", LongType, nullable = false),
      StructField("ewma", DoubleType, nullable = true)))
    val oneMinus = 1 - alpha
    prepared.mapPartitions { it =>
      new Iterator[Row] {
        private var cur: Row = if (it.hasNext) it.next() else null
        override def hasNext: Boolean = cur != null
        override def next(): Row = {
          val k = cur.get(0)
          var n = 0L
          var acc = 0.0
          var sameKey = true
          while (sameKey) {
            val v = cur.getDouble(3)
            acc = if (n == 0L) v else acc * oneMinus + v * alpha
            n += 1
            cur = if (it.hasNext) it.next() else null
            sameKey = cur != null &&
              (if (k == null) cur.isNullAt(0) else k == cur.get(0))
          }
          Row(k, n, acc)
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Categorical drift TIMELINE: per time bucket, the exact two-sample
    * chi-square of the bucket's category distribution against a fixed
    * REFERENCE profile — the monitoring family turned into the dashboard
    * time series ("when did the mix shift, and which category led it").
    * `refProfile` is a (catCol, n) frame — `TextOps.tokenProfile`'s shape
    * with the caller's category column; concatenated partial profiles are
    * accepted (re-aggregated by category first). Buckets are
    * `bucketSec`-wide UTC-epoch tumbling windows; the statistic per
    * bucket is the tokenDrift chi-square summand verbatim with
    * (n_a, t_a) = reference and (n_b, t_b) = the bucket, summed over the
    * union of reference and observed categories (a category absent from
    * one side counts 0 there — absence IS the drift signal). Output, one
    * row per non-empty bucket: (bucket_start epoch-seconds, n_events,
    * chi2_micro, top_cat, top_chi2_micro) with top_cat the bucket's
    * highest-contribution category (ties → smallest category).
    *
    * Scale shape: the corpus is touched ONCE — the (bucket, category)
    * keyed count is the only event-sized pass. Everything downstream
    * (bucket spine × category union, reference join, totals, the
    * per-bucket rank window) runs on bounded frames: categories are
    * category-bounded and buckets time-bounded, both under LOUD in-plan
    * guards (`maxBuckets`, `maxCats`) consistent with the family
    * discipline. The bucket counts are ADDITIVE under (bucket, cat)-keyed
    * sum, so a stored timeline profile grows O(batch) exactly like the
    * monitor profiles. */
  def categoryDriftTimeline(df: DataFrame, catCol: String, tsCol: String,
      refProfile: DataFrame, bucketSec: Long,
      maxBuckets: Long = 1L << 20, maxCats: Long = 1L << 22,
      maxSpine: Long = 1L << 26): DataFrame = {
    // the one event-sized pass; persisted — the spine, totals, and scoring
    // all read it
    val counts = bucketCategoryProfile(df, catCol, tsCol, bucketSec)
      .select(col("bucket_start"), col(catCol).as("__cat"),
        col("n").as("n_b"))
    timelineFromCounts(counts, refProfile, catCol, maxBuckets, maxCats, maxSpine)
  }

  /** The timeline's ADDITIVE sufficient statistic: per (bucket, category)
    * event counts — `TextOps.tokenProfile`'s shape with a time-bucket key
    * prepended. Additive under (bucket_start, cat)-keyed sum, exact
    * integers, so the streaming maintenance loop
    * ([[graft.streaming.Fastlane.ingestBucketCategoryProfile]]) grows a
    * stored timeline at O(batch + touched buckets) per micro-batch, and
    * [[categoryDriftTimelineFromProfiles]] serves the dashboard without
    * re-touching the events. One keyed aggregation; bucketing and
    * NULL handling are [[categoryDriftTimeline]]'s verbatim. */
  def bucketCategoryProfile(df: DataFrame, catCol: String, tsCol: String,
      bucketSec: Long): DataFrame = {
    require(bucketSec >= 1, s"bucketSec must be >= 1, got $bucketSec")
    df.where(col(catCol).isNotNull && col(tsCol).isNotNull)
      .select(floorBucket(col(tsCol), bucketSec).as("bucket_start"), col(catCol))
      .groupBy("bucket_start", catCol).agg(count(lit(1)).as("n"))
  }

  /** FLOOR time bucketing: epoch-seconds of the `bucketSec`-wide bucket
    * containing `ts`. Spark's `div` truncates toward zero, which for
    * pre-1970 timestamps (negative epoch micros) would assign an event to
    * a bucket STARTING AFTER it; subtracting the non-negative `pmod`
    * remainder first makes the division exact, so truncation == floor on
    * the whole timeline — matching SQL `//` floor semantics and the
    * library's own RangeJoin bucketing.
    *
    * MIGRATION NOTE (r17 change): builds before this used
    * truncate-toward-zero, which assigns pre-1970 (negative-epoch) events
    * to a DIFFERENT bucket_start than floor does. A stored bucket*Profile
    * feature containing pre-1970 events and written by an earlier build
    * will not merge-align with newly computed buckets — the same period
    * splits into two bucket_start keys on merge-add. Rebuild such
    * profiles from the events once; profiles with no pre-1970 data are
    * unaffected (the two rules agree on non-negative epochs). */
  private[graft] def floorBucket(ts: Column, bucketSec: Long): Column = {
    val us = TimeCols.epochMicros(ts)
    val w = bucketSec * 1000000L
    call_function("div", us - pmod(us, lit(w)), lit(w)) * lit(bucketSec)
  }

  /** [[categoryDriftTimeline]] computed from a STORED
    * [[bucketCategoryProfile]] frame instead of the events — the serving
    * read of the streaming dashboard: the profile's per-(bucket, cat) n
    * IS the count the direct route aggregates, so the answer is IDENTICAL
    * to running the timeline over the events the profile summarizes
    * (spec- and oracle-asserted). Inputs are re-aggregated by
    * (bucket_start, cat) first, so concatenated partial profiles are also
    * accepted. Cost: one (buckets × categories)-bounded scan — the events
    * are never touched at serve time. */
  def categoryDriftTimelineFromProfiles(bucketProf: DataFrame,
      refProfile: DataFrame, catCol: String,
      maxBuckets: Long = 1L << 20, maxCats: Long = 1L << 22,
      maxSpine: Long = 1L << 26): DataFrame = {
    val counts = bucketProf.groupBy(col("bucket_start"), col(catCol))
      .agg(sum("n").as("n_b"))
      .select(col("bucket_start"), col(catCol).as("__cat"), col("n_b"))
    timelineFromCounts(counts, refProfile, catCol, maxBuckets, maxCats, maxSpine)
  }

  /** SEGMENTED categorical drift TIMELINE — [[categoryDriftTimeline]]
    * per group (source, region, user cohort…): "when did SOURCE X's
    * category mix shift" as one frame instead of a per-group loop. Per
    * (group, bucket) the exact chi-square of the bucket's category
    * distribution against the GROUP'S OWN reference profile —
    * `refProfile` is a (groupCol, catCol, n) frame (the
    * `tokenProfileByGroup` shape with the caller's category column);
    * concatenated partials re-aggregate. A group absent from the
    * reference scores 0 on all its buckets (the per-group empty-side
    * convention); NULL groups are excluded. Output, one row per
    * non-empty (group, bucket): (group, bucket_start, n_events,
    * chi2_micro, top_cat, top_chi2_micro). [[timelineAnomalies]] applies
    * per group by filtering first (its whole-timeline median is the
    * global contract).
    *
    * Scale shape: the events are touched ONCE — the (group, bucket, cat)
    * keyed count is the only event-sized pass. Every downstream join is
    * keyed on a group-prefixed key (per-group spine = the group's own
    * buckets × its own category union, built by a group-keyed join, NOT
    * a global cross product — a category alien to a group never charges
    * it), so no single-task funnels and no data-sized broadcasts at ANY
    * group count; the only broadcast is the 1-row guard frame. The
    * loud guards bound the worst group's factors AND the true spine size
    * Σ_g buckets_g · cats_g. */
  def categoryDriftTimelineByGroup(df: DataFrame, catCol: String,
      tsCol: String, groupCol: String, refProfile: DataFrame,
      bucketSec: Long,
      maxBuckets: Long = 1L << 20, maxCats: Long = 1L << 22,
      maxSpine: Long = 1L << 26): DataFrame = {
    val counts = bucketCategoryProfileByGroup(df, catCol, tsCol, groupCol,
        bucketSec)
      .select(col(groupCol), col("bucket_start"), col(catCol).as("__cat"),
        col("n").as("n_b"))
    timelineByGroupFromCounts(counts, refProfile, catCol, groupCol,
      maxBuckets, maxCats, maxSpine, "categoryDriftTimelineByGroup")
  }

  /** The segmented timeline's ADDITIVE sufficient statistic: per
    * (group, bucket, category) event counts — [[bucketCategoryProfile]]
    * with the group key prepended, additive under
    * (group, bucket_start, cat)-keyed sum, so the streaming maintenance
    * loop ([[graft.streaming.Fastlane.ingestBucketCategoryProfileByGroup]])
    * grows a stored per-source timeline at O(batch + touched buckets)
    * and [[categoryDriftTimelineByGroupFromProfiles]] serves the
    * dashboard without re-touching the events. Bucketing (floor) and
    * NULL handling are the global profile's verbatim; NULL groups are
    * excluded. */
  def bucketCategoryProfileByGroup(df: DataFrame, catCol: String,
      tsCol: String, groupCol: String, bucketSec: Long): DataFrame = {
    require(bucketSec >= 1, s"bucketSec must be >= 1, got $bucketSec")
    require(groupCol != "bucket_start" && groupCol != "n" &&
      groupCol != catCol && groupCol != "__cat",
      s"groupCol collides with an output column name: $groupCol")
    df.where(col(groupCol).isNotNull && col(catCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(groupCol), floorBucket(col(tsCol), bucketSec).as("bucket_start"),
        col(catCol))
      .groupBy(groupCol, "bucket_start", catCol).agg(count(lit(1)).as("n"))
  }

  /** [[categoryDriftTimelineByGroup]] computed from a STORED
    * [[bucketCategoryProfileByGroup]] frame instead of the events — the
    * serving read of the segmented streaming dashboard: identical answer
    * to the direct route over the events the profile summarizes (spec-
    * and oracle-asserted); concatenated partial profiles re-aggregate.
    * Cost: one spine-bounded scan — the events are never touched at
    * serve time. */
  def categoryDriftTimelineByGroupFromProfiles(bucketProf: DataFrame,
      refProfile: DataFrame, catCol: String, groupCol: String,
      maxBuckets: Long = 1L << 20, maxCats: Long = 1L << 22,
      maxSpine: Long = 1L << 26): DataFrame = {
    val counts = bucketProf
      .groupBy(col(groupCol), col("bucket_start"), col(catCol))
      .agg(sum("n").as("n_b"))
      .select(col(groupCol), col("bucket_start"), col(catCol).as("__cat"),
        col("n_b"))
    timelineByGroupFromCounts(counts, refProfile, catCol, groupCol,
      maxBuckets, maxCats, maxSpine, "categoryDriftTimelineByGroup")
  }

  /** Shared scoring tail of [[categoryDriftTimelineByGroup]] /
    * [[categoryDriftTimelineByGroupFromProfiles]] — one code path so the
    * direct and profile-served routes cannot drift. Input: per-(group,
    * bucket, __cat) counts (the tail repartitions and persists them). See
    * [[categoryDriftTimelineByGroup]] for the group-keyed scale
    * argument. */
  private def timelineByGroupFromCounts(counts: DataFrame,
      refProfile: DataFrame, catCol: String, groupCol: String,
      maxBuckets: Long, maxCats: Long, maxSpine: Long,
      opName: String): DataFrame = {
    require(maxBuckets >= 1 && maxCats >= 1 && maxSpine >= 1,
      s"guards must be >= 1, got maxBuckets=$maxBuckets maxCats=$maxCats " +
        s"maxSpine=$maxSpine")
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val np = scala.util.Try(counts.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt).getOrElse(200)
    // EXCHANGE-MINIMAL tail (r19) — see timelineFromCounts. The pinned key
    // here is the GROUP: the bounded counts repartition by groupCol once
    // (explicit np so AQE cannot re-coalesce one side out of
    // co-partitioning), and every downstream groupBy, per-group window,
    // and join is keyed on a superset of it, so the whole scoring tail —
    // per-group universe, per-(group, bucket) totals, guard statistics,
    // the spine cross, the counts join, the rank window, the final
    // rollup — runs exchange-free on that one clustering: 3 exchanges +
    // 1 broadcast total (the r18 shape paid ~30 AQE stage/broadcast
    // rounds; profiled at 31 of q272's 33 jobs). Skew note: a single
    // group's slice is one task, but every frame on the key is
    // spine-bounded by the loud guards — never event-sized.
    // NO persist — see timelineFromCounts: exchange reuse over identical
    // repartition subtrees keeps the corpus one-pass WITHOUT hiding the
    // pinned partitioning behind a cached AQE plan.
    val cnt = counts.repartition(np, col(groupCol))
    val wG = Window.partitionBy(groupCol)
    // per-group category universe WITH the group's reference mass and
    // total: observed cats enter with n_a=0 via the union (absence needs
    // no later left join), t_a/__nc/__rnc ride the same group-keyed sort
    val uni = cnt.select(col(groupCol), col("__cat"), lit(0L).as("n_a"))
      .unionByName(refProfile.select(col(groupCol),
        col(catCol).as("__cat"), col("n").cast("long").as("n_a")))
      .repartition(np, col(groupCol))
      .groupBy(col(groupCol), col("__cat")).agg(sum("n_a").as("n_a"))
      .withColumn("t_a", sum("n_a").over(wG))
      .withColumn("__nc", count(lit(1)).over(wG))
      .withColumn("__rnc", row_number().over(wG.orderBy(col("__cat"))))
    val gbkts = cnt.groupBy(col(groupCol), col("bucket_start"))
      .agg(sum("n_b").as("t_b"), sum("n_b").as("n_events"))
      .withColumn("__nb", count(lit(1)).over(wG))
      .withColumn("__tbmax", max("t_b").over(wG))
      .withColumn("__rnb", row_number().over(wG.orderBy(col("bucket_start"))))
    // ONE 1-row guard frame: worst-group factor caps (the per-group frame
    // is the honest unit for a segmented op — a quiet source cannot hide a
    // source whose bucket or category count explodes), the TRUE spine size
    // Σ_g buckets·cats, and the decimal(38,0) headroom of the exact
    // chi-square — all from one bounded join of the rn=1 rows, armed by
    // ONE raise_error projection that fires while the guard broadcast
    // builds, before any spine row materializes.
    val guard = gbkts.where(col("__rnb") === 1)
      .select(col(groupCol), col("__nb"), col("__tbmax"))
      .join(uni.where(col("__rnc") === 1)
        .select(col(groupCol), col("__nc"), col("t_a")), Seq(groupCol))
      .agg(
        coalesce(max("__nb"), lit(0L)).as("__nbk"),
        coalesce(max("__nc"), lit(0L)).as("__ncat"),
        coalesce(sum(col("__nb") * col("__nc")), lit(0L)).as("__spine"),
        coalesce(max(when(dec(col("t_a")) * dec(col("__tbmax")) >=
            dec(lit(10000000000000000L)), lit(1L)).otherwise(lit(0L))),
          lit(0L)).as("__hviol"))
      .select(
        when(col("__nbk") > maxBuckets,
          raise_error(concat(lit(s"$opName: "), col("__nbk"),
            lit(s" buckets in one group > maxBuckets=$maxBuckets — widen " +
              "bucketSec or raise the cap if the executors have the memory"))))
        .when(col("__ncat") > maxCats,
          raise_error(concat(lit(s"$opName: "), col("__ncat"),
            lit(s" categories in one group > maxCats=$maxCats — a category " +
              "column this wide is an id, not a categorical"))))
        .when(col("__spine") > maxSpine,
          raise_error(concat(lit(s"$opName: spine "), col("__spine"),
            lit(s" (Σ_g buckets·cats) > maxSpine=$maxSpine — widen " +
              "bucketSec or coarsen the category column; raise the cap " +
              "only if the cluster can hold the full scoring spine"))))
        .when(col("__hviol") > 0,
          raise_error(lit(s"$opName: t_a·t_b ≥ 1e16 exceeds the " +
            "decimal(38,0) headroom of the exact chi-square — " +
            "pre-aggregate or subsample the sides")))
        .otherwise(lit(0L)).as("__zero"))
    // the guard's __zero rides n_a so the optimizer cannot prune it; the
    // group-keyed stream side keeps the pinned hash(groupCol) partitioning
    // through the broadcast, so everything below joins exchange-free
    val uniG = uni.select(col(groupCol), col("__cat"), col("n_a"),
        col("t_a"))
      .crossJoin(broadcast(guard))
      .select(col(groupCol), col("__cat"),
        (col("n_a") + col("__zero")).as("n_a"), col("t_a"))
    val spine = gbkts
      .select(col(groupCol), col("bucket_start"), col("n_events"),
        col("t_b"))
      .join(uniG, Seq(groupCol))
      .join(cnt, Seq(groupCol, "bucket_start", "__cat"), "left")
      .select(col(groupCol), col("bucket_start"), col("__cat"),
        col("n_events"),
        col("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        col("t_a"),
        col("t_b"))
    val diff = dec(col("n_a")) * dec(col("t_b")) - dec(col("n_b")) * dec(col("t_a"))
    val contrib = when(col("t_a") === 0 || col("t_b") === 0 ||
        col("n_a") + col("n_b") === 0, lit(0L))
      .otherwise(call_function("div",
        dec(lit(1000000L)) * diff * diff,
        (dec(col("n_a")) + dec(col("n_b"))) * dec(col("t_a")) * dec(col("t_b")))
        .cast("long"))
    val scored = spine.withColumn("__contrib", contrib)
    // nulls LAST on the tie-break: a NULL category can only enter via the
    // caller's reference profile (observed counts filter NULLs), and SQL
    // engines put NULLs last on ASC — nulls-first would let a NULL ref
    // category win an all-zero tie and diverge from every SQL oracle
    val wTop = Window.partitionBy(col(groupCol), col("bucket_start"))
      .orderBy(col("__contrib").desc, col("__cat").asc_nulls_last)
    scored
      .withColumn("__rk", row_number().over(wTop))
      .groupBy(col(groupCol), col("bucket_start"))
      .agg(max("n_events").as("n_events"),
        sum("__contrib").as("chi2_micro"),
        max(when(col("__rk") === 1, col("__cat"))).as("top_cat"),
        max(when(col("__rk") === 1, col("__contrib"))).as("top_chi2_micro"))
  }

  /** NUMERIC drift TIMELINE — the scalar twin of
    * [[categoryDriftTimeline]], completing the time axis for the scalar
    * monitor family: per time bucket, the exact binned chi-square of the
    * bucket's value distribution against a fixed REFERENCE
    * [[graft.ops.Stats.numericProfile]] ("when did the length/latency/
    * price distribution shift"). Values bin exactly as the scalar
    * profiles do (one shared binning expression — the routes cannot
    * drift on bin edges); the per-bucket statistic is the timeline
    * chi-square verbatim with bins as the categories. Output, one row
    * per non-empty bucket: (bucket_start, n_events, chi2_micro, top_bin,
    * top_chi2_micro) with top_bin the bucket's highest-contribution bin
    * (ties → smallest bin). [[timelineAnomalies]] applies to the output
    * unchanged — same (bucket_start, chi2_micro) contract.
    *
    * Scale shape: the corpus is touched ONCE — the (bucket, bin) keyed
    * count is the only event-sized pass; everything downstream is
    * (buckets × bins)-bounded under the categorical timeline's guards
    * (bins ≤ 256 by construction on the direct route). Counts are
    * ADDITIVE under (bucket, bin)-keyed sum —
    * [[graft.streaming.Fastlane.ingestBucketNumericProfile]] grows a
    * stored timeline O(batch + touched buckets) per micro-batch and
    * [[numericDriftTimelineFromProfiles]] serves it with zero event
    * scans. */
  def numericDriftTimeline(df: DataFrame, valueCol: String, tsCol: String,
      refProfile: DataFrame, bucketSec: Long, bins: Int = 16,
      binWidthMicro: Long = 31250000L,
      maxBuckets: Long = 1L << 20, maxBins: Long = 1L << 22,
      maxSpine: Long = 1L << 26): DataFrame = {
    val counts = bucketNumericProfile(df, valueCol, tsCol, bucketSec,
        bins, binWidthMicro)
      .select(col("bucket_start"), col("bin").as("__cat"),
        col("n").as("n_b"))
    timelineFromCounts(counts, refProfile, "bin", maxBuckets, maxBins,
        maxSpine, "numericDriftTimeline")
      .withColumnRenamed("top_cat", "top_bin")
  }

  /** The numeric timeline's ADDITIVE sufficient statistic: per
    * (bucket, bin) value counts — [[graft.ops.Stats.numericProfile]]'s
    * shape with a time-bucket key prepended, binned by the SAME shared
    * expression. Additive under (bucket_start, bin)-keyed sum, exact
    * integers; bucketing (floor) and NULL/NaN handling are
    * [[numericDriftTimeline]]'s verbatim. */
  def bucketNumericProfile(df: DataFrame, valueCol: String, tsCol: String,
      bucketSec: Long, bins: Int = 16,
      binWidthMicro: Long = 31250000L): DataFrame = {
    require(bucketSec >= 1, s"bucketSec must be >= 1, got $bucketSec")
    Stats.requireBinSpec(bins, binWidthMicro)
    df.select(floorBucket(col(tsCol), bucketSec).as("bucket_start"),
        col(valueCol).cast("double").as("__v"), col(tsCol).as("__ts"))
      .where(col("__ts").isNotNull &&
        col("__v").isNotNull && !isnan(col("__v")))
      .select(col("bucket_start"),
        Stats.microBin(col("__v"), bins, binWidthMicro).as("bin"))
      .groupBy("bucket_start", "bin").agg(count(lit(1)).as("n"))
  }

  /** [[numericDriftTimeline]] computed from a STORED
    * [[bucketNumericProfile]] frame instead of the events — the serving
    * read of the streaming scalar dashboard: identical answer to the
    * direct route over the events the profile summarizes (spec- and
    * oracle-asserted). Inputs re-aggregate by (bucket_start, bin) first,
    * so concatenated partial profiles are accepted. Cost: one
    * (buckets × bins)-bounded scan — the events are never touched at
    * serve time. */
  def numericDriftTimelineFromProfiles(bucketProf: DataFrame,
      refProfile: DataFrame,
      maxBuckets: Long = 1L << 20, maxBins: Long = 1L << 22,
      maxSpine: Long = 1L << 26): DataFrame = {
    val counts = bucketProf.groupBy(col("bucket_start"), col("bin"))
      .agg(sum("n").as("n_b"))
      .select(col("bucket_start"), col("bin").as("__cat"), col("n_b"))
    timelineFromCounts(counts, refProfile, "bin", maxBuckets, maxBins,
        maxSpine, "numericDriftTimeline")
      .withColumnRenamed("top_cat", "top_bin")
  }

  /** SEGMENTED numeric drift TIMELINE — "when did SOURCE X's value
    * distribution shift" as one frame: [[numericDriftTimeline]] per
    * group, each (group, bucket) scored against the GROUP'S OWN
    * reference [[graft.ops.Stats.numericProfileByGroup]] frame
    * (groupCol, bin, n). Binning is the scalar family's ONE shared
    * expression; the scoring tail is the segmented categorical
    * timeline's verbatim with bins as the categories — per-group spine
    * by group-keyed joins, loud factor + Σ_g spine + headroom guards, a
    * ref-less group scores 0. Output: (group, bucket_start, n_events,
    * chi2_micro, top_bin, top_chi2_micro). [[timelineAnomaliesByGroup]]
    * applies to the output unchanged. */
  def numericDriftTimelineByGroup(df: DataFrame, valueCol: String,
      tsCol: String, groupCol: String, refProfile: DataFrame,
      bucketSec: Long, bins: Int = 16, binWidthMicro: Long = 31250000L,
      maxBuckets: Long = 1L << 20, maxBins: Long = 1L << 22,
      maxSpine: Long = 1L << 26): DataFrame = {
    val counts = bucketNumericProfileByGroup(df, valueCol, tsCol, groupCol,
        bucketSec, bins, binWidthMicro)
      .select(col(groupCol), col("bucket_start"), col("bin").as("__cat"),
        col("n").as("n_b"))
    timelineByGroupFromCounts(counts, refProfile, "bin", groupCol,
        maxBuckets, maxBins, maxSpine, "numericDriftTimelineByGroup")
      .withColumnRenamed("top_cat", "top_bin")
  }

  /** The segmented numeric timeline's ADDITIVE sufficient statistic:
    * per (group, bucket, bin) value counts, additive under
    * (group, bucket_start, bin)-keyed sum; bucketing (floor), binning
    * (shared expression), and NULL/NaN/null-group handling are
    * [[numericDriftTimelineByGroup]]'s verbatim. Maintained O(batch +
    * touched buckets) by
    * [[graft.streaming.Fastlane.ingestBucketNumericProfileByGroup]]. */
  def bucketNumericProfileByGroup(df: DataFrame, valueCol: String,
      tsCol: String, groupCol: String, bucketSec: Long, bins: Int = 16,
      binWidthMicro: Long = 31250000L): DataFrame = {
    require(bucketSec >= 1, s"bucketSec must be >= 1, got $bucketSec")
    Stats.requireBinSpec(bins, binWidthMicro)
    require(groupCol != "bucket_start" && groupCol != "n" &&
      groupCol != "bin" && groupCol != "__v" && groupCol != "__ts",
      s"groupCol collides with an internal column name: $groupCol")
    df.select(col(groupCol), floorBucket(col(tsCol), bucketSec).as("bucket_start"),
        col(valueCol).cast("double").as("__v"), col(tsCol).as("__ts"))
      .where(col(groupCol).isNotNull && col("__ts").isNotNull &&
        col("__v").isNotNull && !isnan(col("__v")))
      .select(col(groupCol), col("bucket_start"),
        Stats.microBin(col("__v"), bins, binWidthMicro).as("bin"))
      .groupBy(groupCol, "bucket_start", "bin").agg(count(lit(1)).as("n"))
  }

  /** [[numericDriftTimelineByGroup]] computed from a STORED
    * [[bucketNumericProfileByGroup]] frame instead of the events — the
    * serving read of the segmented streaming scalar dashboard: identical
    * answer to the direct route (spec- and oracle-asserted);
    * concatenated partial profiles re-aggregate; events never touched at
    * serve time. */
  def numericDriftTimelineByGroupFromProfiles(bucketProf: DataFrame,
      refProfile: DataFrame, groupCol: String,
      maxBuckets: Long = 1L << 20, maxBins: Long = 1L << 22,
      maxSpine: Long = 1L << 26): DataFrame = {
    val counts = bucketProf
      .groupBy(col(groupCol), col("bucket_start"), col("bin"))
      .agg(sum("n").as("n_b"))
      .select(col(groupCol), col("bucket_start"), col("bin").as("__cat"),
        col("n_b"))
    timelineByGroupFromCounts(counts, refProfile, "bin", groupCol,
        maxBuckets, maxBins, maxSpine, "numericDriftTimelineByGroup")
      .withColumnRenamed("top_cat", "top_bin")
  }

  /** EMBEDDING drift TIMELINE — the last modality gains its time axis
    * ("WHEN did the representation shift", not just "did it"): per time
    * bucket, the exact binned chi-square of the bucket's per-(dimension,
    * bin) component distribution against a fixed REFERENCE
    * [[graft.ops.Similarity.embeddingProfile]] — an encoder upgrade or a
    * broken preprocessing step shows up as the bucket where chi2 jumps.
    * Components quantize and bin through the embedding family's ONE
    * shared expression ([[graft.ops.Similarity.componentBin]] — the
    * routes cannot drift on bin edges); the per-bucket statistic is the
    * categorical timeline's chi-square verbatim with (dimension, bin)
    * PAIRS as the categories (a composite struct key through the shared
    * scoring tail), so a pair observed in the bucket but not the
    * reference — or vice versa — contributes exactly as an unseen
    * category does. Padded positions of short vectors land in bin 0 with
    * component 0, the family convention. Output, one row per non-empty
    * bucket: (bucket_start, n_components, chi2_micro, top_pos, top_bin,
    * top_chi2_micro) with (top_pos, top_bin) the bucket's
    * highest-contribution cell (ties → smallest (pos, bin)).
    * [[timelineAnomalies]] applies to the output unchanged — same
    * (bucket_start, chi2_micro) contract.
    *
    * Scale shape: the corpus is touched ONCE — the (bucket, pos, bin)
    * keyed count is the only vector-sized pass (posexplode map-side,
    * partial aggregation collapses each task to ≤ buckets·dim·bins rows
    * before the exchange). Everything downstream is (buckets × dim·bins)
    * -bounded under the categorical timeline's guards (dim·bins ≤ 4096·256
    * by construction). Counts are ADDITIVE under (bucket, pos, bin)-keyed
    * sum — [[graft.streaming.Fastlane.ingestBucketEmbeddingProfile]]
    * grows a stored timeline O(batch + touched buckets) per micro-batch
    * and [[embeddingDriftTimelineFromProfiles]] serves it with zero
    * corpus scans. */
  def embeddingDriftTimeline(df: DataFrame, vecCol: String, tsCol: String,
      refProfile: DataFrame, bucketSec: Long, dim: Int = 64,
      bins: Int = 16, binWidthMicro: Long = 31250L,
      maxBuckets: Long = 1L << 20, maxSpine: Long = 1L << 26): DataFrame = {
    val counts = bucketEmbeddingProfile(df, vecCol, tsCol, bucketSec,
        dim, bins, binWidthMicro)
      .select(col("bucket_start"), pbKey.as("__cat"), col("n").as("n_b"))
    decodeTopCell(timelineFromCounts(counts, refAsPb(refProfile), "__cat",
      maxBuckets, 1L << 22, maxSpine, "embeddingDriftTimeline"))
  }

  /** The embedding timeline's ADDITIVE sufficient statistic: per
    * (bucket, dimension, bin) component counts and exact micro sums —
    * [[graft.ops.Similarity.embeddingProfile]]'s shape with a time-bucket
    * key prepended, binned by the SAME shared expression. Additive under
    * (bucket_start, pos, bin)-keyed sum, exact integers — maintained
    * O(batch + touched buckets) by
    * [[graft.streaming.Fastlane.ingestBucketEmbeddingProfile]]; bucketing
    * (floor) and the padding convention are the family's verbatim. The
    * `s` sums ride along so a stored timeline profile also answers
    * per-bucket MEAN questions, exactly as the flat embeddingProfile
    * serves both monitors. */
  def bucketEmbeddingProfile(df: DataFrame, vecCol: String, tsCol: String,
      bucketSec: Long, dim: Int = 64, bins: Int = 16,
      binWidthMicro: Long = 31250L): DataFrame = {
    require(bucketSec >= 1, s"bucketSec must be >= 1, got $bucketSec")
    Similarity.requireEmbeddingBinSpec(dim, bins, binWidthMicro)
    df.where(col(tsCol).isNotNull)
      .select(floorBucket(col(tsCol), bucketSec).as("bucket_start"),
        posexplode(Similarity.quantize(col(vecCol), dim)).as(Seq("pos", "__q")))
      .select(col("bucket_start"), col("pos"),
        Similarity.componentBin(col("__q"), bins, binWidthMicro).as("bin"),
        coalesce(col("__q"), lit(0L)).as("__q0"))
      .groupBy("bucket_start", "pos", "bin")
      .agg(count(lit(1)).as("n"), sum(col("__q0")).as("s"))
  }

  /** [[embeddingDriftTimeline]] computed from a STORED
    * [[bucketEmbeddingProfile]] frame instead of the vectors — the
    * serving read of the streaming representation dashboard: identical
    * answer to the direct route over the corpora the profile summarizes
    * (spec- and oracle-asserted). Inputs re-aggregate by
    * (bucket_start, pos, bin) first, so concatenated partial profiles
    * are accepted. Cost: one (buckets × dim·bins)-bounded scan — the
    * vectors are never touched at serve time. */
  def embeddingDriftTimelineFromProfiles(bucketProf: DataFrame,
      refProfile: DataFrame,
      maxBuckets: Long = 1L << 20, maxSpine: Long = 1L << 26): DataFrame = {
    val counts = bucketProf
      .groupBy(col("bucket_start"), col("pos"), col("bin"))
      .agg(sum("n").as("n_b"))
      .select(col("bucket_start"), pbKey.as("__cat"), col("n_b"))
    decodeTopCell(timelineFromCounts(counts, refAsPb(refProfile), "__cat",
      maxBuckets, 1L << 22, maxSpine, "embeddingDriftTimeline"))
  }

  /** SEGMENTED embedding drift TIMELINE — "when did SOURCE X's
    * representation shift" as one frame: [[embeddingDriftTimeline]] per
    * group, each (group, bucket) scored against the GROUP'S OWN reference
    * [[graft.ops.Similarity.embeddingProfileByGroup]] frame
    * (groupCol, pos, bin, n). The scoring tail is the segmented
    * categorical timeline's verbatim with (pos, bin) cells as the
    * categories — per-group spine by group-keyed joins, loud factor +
    * Σ_g spine + headroom guards, a ref-less group scores 0.
    * [[timelineAnomaliesByGroup]] applies to the output unchanged. */
  def embeddingDriftTimelineByGroup(df: DataFrame, vecCol: String,
      tsCol: String, groupCol: String, refProfile: DataFrame,
      bucketSec: Long, dim: Int = 64, bins: Int = 16,
      binWidthMicro: Long = 31250L,
      maxBuckets: Long = 1L << 20, maxSpine: Long = 1L << 26): DataFrame = {
    val counts = bucketEmbeddingProfileByGroup(df, vecCol, tsCol, groupCol,
        bucketSec, dim, bins, binWidthMicro)
      .select(col(groupCol), col("bucket_start"), pbKey.as("__cat"),
        col("n").as("n_b"))
    decodeTopCell(timelineByGroupFromCounts(counts,
      refAsPbByGroup(refProfile, groupCol), "__cat", groupCol,
      maxBuckets, 1L << 22, maxSpine, "embeddingDriftTimelineByGroup"))
  }

  /** The segmented embedding timeline's ADDITIVE sufficient statistic:
    * per (group, bucket, dimension, bin) component counts and micro sums,
    * additive under (group, bucket_start, pos, bin)-keyed sum; bucketing
    * (floor), binning (shared expression), padding, and null-group
    * handling are the family's verbatim. Maintained O(batch + touched
    * buckets) by
    * [[graft.streaming.Fastlane.ingestBucketEmbeddingProfileByGroup]]. */
  def bucketEmbeddingProfileByGroup(df: DataFrame, vecCol: String,
      tsCol: String, groupCol: String, bucketSec: Long, dim: Int = 64,
      bins: Int = 16, binWidthMicro: Long = 31250L): DataFrame = {
    require(bucketSec >= 1, s"bucketSec must be >= 1, got $bucketSec")
    Similarity.requireEmbeddingBinSpec(dim, bins, binWidthMicro)
    require(groupCol != "bucket_start" && groupCol != "n" &&
      groupCol != "s" && groupCol != "pos" && groupCol != "bin",
      s"groupCol collides with an output column name: $groupCol")
    df.where(col(groupCol).isNotNull && col(tsCol).isNotNull)
      .select(col(groupCol), floorBucket(col(tsCol), bucketSec).as("bucket_start"),
        posexplode(Similarity.quantize(col(vecCol), dim)).as(Seq("pos", "__q")))
      .select(col(groupCol), col("bucket_start"), col("pos"),
        Similarity.componentBin(col("__q"), bins, binWidthMicro).as("bin"),
        coalesce(col("__q"), lit(0L)).as("__q0"))
      .groupBy(groupCol, "bucket_start", "pos", "bin")
      .agg(count(lit(1)).as("n"), sum(col("__q0")).as("s"))
  }

  /** [[embeddingDriftTimelineByGroup]] computed from a STORED
    * [[bucketEmbeddingProfileByGroup]] frame instead of the vectors —
    * the serving read of the segmented representation dashboard:
    * identical answer to the direct route (spec- and oracle-asserted);
    * concatenated partial profiles re-aggregate; vectors never touched
    * at serve time. */
  def embeddingDriftTimelineByGroupFromProfiles(bucketProf: DataFrame,
      refProfile: DataFrame, groupCol: String,
      maxBuckets: Long = 1L << 20, maxSpine: Long = 1L << 26): DataFrame = {
    val counts = bucketProf
      .groupBy(col(groupCol), col("bucket_start"), col("pos"), col("bin"))
      .agg(sum("n").as("n_b"))
      .select(col(groupCol), col("bucket_start"), pbKey.as("__cat"),
        col("n_b"))
    decodeTopCell(timelineByGroupFromCounts(counts,
      refAsPbByGroup(refProfile, groupCol), "__cat", groupCol,
      maxBuckets, 1L << 22, maxSpine, "embeddingDriftTimelineByGroup"))
  }

  /** EMBEDDING MEAN-SHIFT timeline — the time axis of the MEAN monitor
    * ([[embeddingDriftTimeline]] is the SHAPE leg; a mean-only shift and
    * a variance-only shift are distinct failure modes, so the dashboard
    * needs both): per time bucket, each dimension's exact cleared mean
    * shift against a fixed REFERENCE
    * [[graft.ops.Similarity.embeddingProfile]] —
    * [[graft.ops.Similarity.embeddingDrift]]'s statistic verbatim with
    * the bucket as snapshot B, folded from the SAME stored
    * [[bucketEmbeddingProfile]] rows (the (n, s) sums are why the
    * timeline statistic carries `s`). Output, one row per non-empty
    * bucket: (bucket_start, n_components, l1_shift_micro, top_pos,
    * top_shift_micro, direction) — `l1_shift_micro` = Σ_pos shift (the
    * L1 norm of the bucket's mean-shift vector, the scalar the alerting
    * layer consumes), (top_pos, top_shift_micro, direction) the
    * worst-moved dimension (ties → smallest pos; direction +1 = the
    * reference mean is higher). An empty side scores 0 by the family's
    * convention; padded positions count with component 0.
    *
    * Scale shape: the vectors are touched ONCE ([[bucketEmbeddingProfile]]
    * — posexplode map-side, ≤ buckets·dim·bins rows after partial
    * aggregation); the per-(bucket, pos) fold, the broadcast dim-sized
    * reference join, and the per-bucket rank window all run on
    * spine-bounded frames. Serving: pass a STORED profile through
    * [[embeddingMeanShiftTimelineFromProfiles]] — zero corpus scans. */
  def embeddingMeanShiftTimeline(df: DataFrame, vecCol: String,
      tsCol: String, refProfile: DataFrame, bucketSec: Long, dim: Int = 64,
      bins: Int = 16, binWidthMicro: Long = 31250L): DataFrame =
    embeddingMeanShiftTimelineFromProfiles(
      bucketEmbeddingProfile(df, vecCol, tsCol, bucketSec, dim, bins,
        binWidthMicro),
      refProfile)

  /** [[embeddingMeanShiftTimeline]] computed from a STORED
    * [[bucketEmbeddingProfile]] frame — also the direct route's whole
    * body (the direct route just builds the profile inline), so the two
    * routes are ONE code path by construction. Folding bins per
    * (bucket, pos) recovers the exact per-bucket per-dim (n, s) —
    * padding included — exactly as
    * [[graft.ops.Similarity.embeddingDriftFromProfiles]] folds the flat
    * profile. */
  def embeddingMeanShiftTimelineFromProfiles(bucketProf: DataFrame,
      refProfile: DataFrame): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val perDim = bucketProf.groupBy(col("bucket_start"), col("pos"))
      .agg(sum("n").as("n_b"), sum(dec(col("s"))).as("s_b"))
    val ref = refProfile.groupBy(col("pos"))
      .agg(sum("n").as("n_a"), sum(dec(col("s"))).as("s_a"))
    val rawDiff = col("s_a") * dec(col("n_b")) - col("s_b") * dec(col("n_a"))
    val shift = when(col("n_a") === 0 || col("n_b") === 0, lit(0L))
      .otherwise(call_function("div", abs(rawDiff),
        dec(col("n_a")) * dec(col("n_b")))).cast("long")
    // left join: a dimension absent from the reference (never observed
    // there) scores 0 on the empty-side rule via the coalesced n_a = 0
    val scored = perDim.join(broadcast(ref), Seq("pos"), "left")
      .select(col("bucket_start"), col("pos"), col("n_b"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("s_a"), lit(0L).cast("decimal(38,0)")).as("s_a"),
        col("s_b"))
      .withColumn("__shift", shift)
      .withColumn("__dir",
        when(col("n_a") === 0 || col("n_b") === 0, 0)
          .when(rawDiff > 0, 1).when(rawDiff < 0, -1).otherwise(0))
    val wTop = Window.partitionBy("bucket_start")
      .orderBy(col("__shift").desc, col("pos").asc)
    scored
      .withColumn("__rk", row_number().over(wTop))
      .groupBy("bucket_start")
      .agg(sum("n_b").as("n_components"),
        sum("__shift").as("l1_shift_micro"),
        max(when(col("__rk") === 1, col("pos"))).as("top_pos"),
        max(when(col("__rk") === 1, col("__shift"))).as("top_shift_micro"),
        max(when(col("__rk") === 1, col("__dir"))).as("direction"))
  }

  /** SEGMENTED [[embeddingMeanShiftTimeline]] — "when did SOURCE X's
    * representation MEAN move, and along which dimension": per
    * (group, bucket) each dimension's exact cleared mean shift against
    * the GROUP'S OWN reference
    * [[graft.ops.Similarity.embeddingProfileByGroup]] frame
    * (groupCol, pos, bin, n, s). Conventions are the global op's per
    * group: a group absent from the reference scores 0 on every bucket
    * (empty-side rule via the coalesced sums), padded positions carry
    * component 0. Output: (group, bucket_start, n_components,
    * l1_shift_micro, top_pos, top_shift_micro, direction).
    *
    * Scale shape: one vector-sized pass
    * ([[bucketEmbeddingProfileByGroup]]); the (group, bucket, pos) fold,
    * the (group, pos)-keyed reference join, and the rank window
    * PARTITIONED by (group, bucket) all run on spine-bounded frames —
    * scales with group count, no single-task funnel. */
  def embeddingMeanShiftTimelineByGroup(df: DataFrame, vecCol: String,
      tsCol: String, groupCol: String, refProfile: DataFrame,
      bucketSec: Long, dim: Int = 64, bins: Int = 16,
      binWidthMicro: Long = 31250L): DataFrame =
    embeddingMeanShiftTimelineByGroupFromProfiles(
      bucketEmbeddingProfileByGroup(df, vecCol, tsCol, groupCol, bucketSec,
        dim, bins, binWidthMicro),
      refProfile, groupCol)

  /** [[embeddingMeanShiftTimelineByGroup]] computed from a STORED
    * [[bucketEmbeddingProfileByGroup]] frame — also the direct route's
    * whole body (one code path by construction, the global op's
    * discipline); the SAME stored segmented profile serves the shape leg
    * ([[embeddingDriftTimelineByGroupFromProfiles]]) and this mean leg. */
  def embeddingMeanShiftTimelineByGroupFromProfiles(bucketProf: DataFrame,
      refProfile: DataFrame, groupCol: String): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val perDim = bucketProf
      .groupBy(col(groupCol), col("bucket_start"), col("pos"))
      .agg(sum("n").as("n_b"), sum(dec(col("s"))).as("s_b"))
    val ref = refProfile.groupBy(col(groupCol), col("pos"))
      .agg(sum("n").as("n_a"), sum(dec(col("s"))).as("s_a"))
    val rawDiff = col("s_a") * dec(col("n_b")) - col("s_b") * dec(col("n_a"))
    val shift = when(col("n_a") === 0 || col("n_b") === 0, lit(0L))
      .otherwise(call_function("div", abs(rawDiff),
        dec(col("n_a")) * dec(col("n_b")))).cast("long")
    val scored = perDim.join(ref, Seq(groupCol, "pos"), "left")
      .select(col(groupCol), col("bucket_start"), col("pos"), col("n_b"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("s_a"), lit(0L).cast("decimal(38,0)")).as("s_a"),
        col("s_b"))
      .withColumn("__shift", shift)
      .withColumn("__dir",
        when(col("n_a") === 0 || col("n_b") === 0, 0)
          .when(rawDiff > 0, 1).when(rawDiff < 0, -1).otherwise(0))
    val wTop = Window.partitionBy(col(groupCol), col("bucket_start"))
      .orderBy(col("__shift").desc, col("pos").asc)
    scored
      .withColumn("__rk", row_number().over(wTop))
      .groupBy(col(groupCol), col("bucket_start"))
      .agg(sum("n_b").as("n_components"),
        sum("__shift").as("l1_shift_micro"),
        max(when(col("__rk") === 1, col("pos"))).as("top_pos"),
        max(when(col("__rk") === 1, col("__shift"))).as("top_shift_micro"),
        max(when(col("__rk") === 1, col("__dir"))).as("direction"))
  }

  /** The embedding timeline's composite category key: (pos, bin) as ONE
    * struct column, so the (dimension, bin) cell rides the shared
    * categorical scoring tail unchanged. Explicit casts pin the struct
    * schema on every route (a stored profile reads pos back as int and
    * bin as long; the direct route produces the same). */
  private def pbKey: Column =
    struct(col("pos").cast("int").as("pos"), col("bin").cast("long").as("bin"))

  /** A reference [[graft.ops.Similarity.embeddingProfile]] (pos, bin, n)
    * re-keyed on the composite cell for the shared tail. A pure
    * projection: the tails re-aggregate the reference by category anyway
    * (that is what makes concatenated partial profiles acceptable), so a
    * pre-aggregation here would only add an exchange. */
  private def refAsPb(refProfile: DataFrame): DataFrame =
    refProfile.select(pbKey.as("__cat"), col("n"))

  /** Segmented twin of [[refAsPb]] over an
    * [[graft.ops.Similarity.embeddingProfileByGroup]] frame. */
  private def refAsPbByGroup(refProfile: DataFrame, groupCol: String): DataFrame =
    refProfile.select(col(groupCol), pbKey.as("__cat"), col("n"))

  /** Decode the shared tail's composite top category back to
    * (top_pos, top_bin) and rename the count to n_components (each vector
    * contributes `dim` components per bucket — the honest unit). */
  private def decodeTopCell(tl: DataFrame): DataFrame = {
    val cols = tl.columns.toSeq.flatMap {
      case "n_events" => Seq(col("n_events").as("n_components"))
      case "top_cat" => Seq(col("top_cat.pos").as("top_pos"),
        col("top_cat.bin").as("top_bin"))
      case c => Seq(col(c))
    }
    tl.select(cols: _*)
  }

  /** SEGMENTED [[timelineAnomalies]] — Hampel median + k·MAD per GROUP
    * over a segmented drift timeline ((group, bucket_start, chi2_micro,
    * …) — [[categoryDriftTimelineByGroup]]'s or
    * [[numericDriftTimelineByGroup]]'s output): each group is its own
    * alerting baseline, so a noisy source cannot inflate a quiet
    * source's threshold. Lower medians keep it exact-integer, as the
    * global rule. Output: (group, bucket_start, chi2_micro, med_micro,
    * mad_micro, is_anomaly).
    *
    * Scale shape: the four stacked windows are GROUP-partitioned — each
    * group's buckets-bounded slice sorts in its own tasks (better than
    * the global rule's single bounded task), nothing event-sized. */
  def timelineAnomaliesByGroup(timeline: DataFrame, groupCol: String,
      k: Long = 3L): DataFrame = {
    require(k >= 0, s"k must be >= 0, got $k")
    val whole = Window.partitionBy(col(groupCol))
    val wChi = Window.partitionBy(col(groupCol))
      .orderBy(col("chi2_micro").asc, col("bucket_start").asc)
    val wDev = Window.partitionBy(col(groupCol))
      .orderBy(col("__dev").asc, col("bucket_start").asc)
    def lowerRank = call_function("div", col("__n") + lit(1L), lit(2L))
    timeline.select(col(groupCol), col("bucket_start"), col("chi2_micro"))
      .withColumn("__n", count(lit(1)).over(whole))
      .withColumn("__rk", row_number().over(wChi))
      .withColumn("med_micro",
        max(when(col("__rk") === lowerRank, col("chi2_micro"))).over(whole))
      .withColumn("__dev", abs(col("chi2_micro") - col("med_micro")))
      .withColumn("__rk2", row_number().over(wDev))
      .withColumn("mad_micro",
        max(when(col("__rk2") === lowerRank, col("__dev"))).over(whole))
      .select(col(groupCol), col("bucket_start"), col("chi2_micro"),
        col("med_micro"), col("mad_micro"),
        (col("chi2_micro") > col("med_micro") + lit(k) * col("mad_micro"))
          .as("is_anomaly"))
  }

  /** Anomaly flags over a drift TIMELINE — the alerting layer: a bucket
    * is anomalous when its chi2 exceeds the timeline's LOWER MEDIAN plus
    * `k` times the median absolute deviation (Hampel's robust outlier
    * rule — median/MAD instead of mean/stddev so one huge spike cannot
    * mask the others by inflating the threshold). Lower medians (the
    * sorted element at rank ⌊(n+1)/2⌋) keep everything in exact integers
    * — no interpolation, so every engine agrees bit-for-bit. Output: the
    * timeline's (bucket_start, chi2_micro) plus (med_micro, mad_micro,
    * is_anomaly); an empty timeline yields no rows.
    *
    * Scale shape: the timeline is buckets-bounded by construction
    * (produced under [[categoryDriftTimeline]]'s `maxBuckets` guard and
    * the `maxSpine` PRODUCT guard — a dashboard-sized timeline is
    * hundreds-to-thousands of rows; the default caps are a ceiling, not a
    * sizing), so the single-partition windows here are bounded the same
    * way — this op never sees event-sized data. The whole rule is ONE linear plan of
    * four stacked windows over that bounded frame (no joins, no
    * broadcasts, no second read of the input — the first formulation's
    * median/MAD crossJoin branches cost ~30 extra scheduler jobs and
    * tripled the wall on a frame of a few hundred rows). */
  def timelineAnomalies(timeline: DataFrame, k: Long = 3L): DataFrame = {
    require(k >= 0, s"k must be >= 0, got $k")
    // partitionBy(lit(1)): one task — bounded by the timeline's own
    // maxBuckets guard, never event-sized
    val whole = Window.partitionBy(lit(1))
    val wChi = Window.partitionBy(lit(1))
      .orderBy(col("chi2_micro").asc, col("bucket_start").asc)
    val wDev = Window.partitionBy(lit(1))
      .orderBy(col("__dev").asc, col("bucket_start").asc)
    def lowerRank = call_function("div", col("__n") + lit(1L), lit(2L))
    timeline.select(col("bucket_start"), col("chi2_micro"))
      .withColumn("__n", count(lit(1)).over(whole))
      .withColumn("__rk", row_number().over(wChi))
      .withColumn("med_micro",
        max(when(col("__rk") === lowerRank, col("chi2_micro"))).over(whole))
      .withColumn("__dev", abs(col("chi2_micro") - col("med_micro")))
      .withColumn("__rk2", row_number().over(wDev))
      .withColumn("mad_micro",
        max(when(col("__rk2") === lowerRank, col("__dev"))).over(whole))
      .select(col("bucket_start"), col("chi2_micro"),
        col("med_micro"), col("mad_micro"),
        (col("chi2_micro") > col("med_micro") + lit(k) * col("mad_micro"))
          .as("is_anomaly"))
  }

  /** Record ONE monitor run into a persisted HISTORY feature — the write
    * half of the drift-of-drift layer: every snapshot-pair monitor
    * (tokenDrift's Σchi2, ksDrift's ks_micro, a timeline bucket's
    * chi2_micro…) produces one scalar per run, and persisting those as
    * (monitor, run_ts, stat_micro) rows turns the caller-invented alert
    * threshold into a SELF-CONTAINED baseline: [[monitorRunAnomalies]]
    * flags the runs that exceed the history's own Hampel bound. Keyed
    * merge on (monitor, run_ts): re-recording a run overwrites it
    * (idempotent under retries — the at-least-once-safe shape), distinct
    * monitors share one history feature without clashing. Cost: one
    * row-sized merge touching 1/numBuckets of the table. */
  def recordMonitorRun(store: graft.core.BucketedStore, feature: String,
      monitor: String, runTs: Long, statMicro: Long)
      (implicit spark: org.apache.spark.sql.SparkSession): Long = {
    import spark.implicits._
    val row = Seq((monitor, runTs, statMicro))
      .toDF("monitor", "run_ts", "stat_micro")
    if (store.latestVersion(feature).isEmpty)
      store.write(row, feature, Seq("monitor", "run_ts"))
    else
      store.merge(feature, row, Seq("monitor", "run_ts"))
  }

  /** Drift-of-drift: Hampel anomaly flags over a STORED monitor-run
    * HISTORY ((run_ts, stat_micro, …) rows — [[recordMonitorRun]]'s
    * shape, one monitor's slice). [[timelineAnomalies]]'s rule verbatim
    * with runs as the buckets — median + k·MAD of the history decides
    * which runs fired, so the alerting layer needs no caller-invented
    * threshold and tightens itself as the history grows. The history is
    * runs-bounded by construction (one row per monitor run), so the
    * single-task windows inside are bounded the same way. */
  def monitorRunAnomalies(history: DataFrame, k: Long = 3L): DataFrame =
    timelineAnomalies(
      history.select(col("run_ts").as("bucket_start"),
        col("stat_micro").as("chi2_micro")), k)
      .select(col("bucket_start").as("run_ts"),
        col("chi2_micro").as("stat_micro"),
        col("med_micro"), col("mad_micro"), col("is_anomaly"))

  /** [[monitorRunAnomalies]] per MONITOR over a shared history feature —
    * each monitor is its own baseline ([[timelineAnomaliesByGroup]]'s
    * rule with monitors as the groups), so a noisy monitor cannot
    * inflate a quiet monitor's threshold. Input:
    * (monitor, run_ts, stat_micro) rows — [[recordMonitorRun]]'s shape,
    * unsliced. */
  def monitorRunAnomaliesByMonitor(history: DataFrame,
      k: Long = 3L): DataFrame =
    timelineAnomaliesByGroup(
      history.select(col("monitor"), col("run_ts").as("bucket_start"),
        col("stat_micro").as("chi2_micro")), "monitor", k)
      .select(col("monitor"), col("bucket_start").as("run_ts"),
        col("chi2_micro").as("stat_micro"),
        col("med_micro"), col("mad_micro"), col("is_anomaly"))

  /** Shared scoring tail of [[categoryDriftTimeline]] /
    * [[categoryDriftTimelineFromProfiles]] — one code path so the direct
    * and profile-served routes cannot drift. Input: per-(bucket, __cat)
    * counts (the tail repartitions and persists them). */
  private def timelineFromCounts(counts: DataFrame, refProfile: DataFrame,
      catCol: String, maxBuckets: Long, maxCats: Long,
      maxSpine: Long, opName: String = "categoryDriftTimeline"): DataFrame = {
    require(maxBuckets >= 1 && maxCats >= 1 && maxSpine >= 1,
      s"guards must be >= 1, got maxBuckets=$maxBuckets maxCats=$maxCats " +
        s"maxSpine=$maxSpine")
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val np = scala.util.Try(counts.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt).getOrElse(200)
    // EXCHANGE-MINIMAL tail (r19): the r18 shape built a separate bounded
    // frame per guard statistic and let the planner key each join its own
    // way — with AQE every exchange materializes as its own scheduler job,
    // so a buckets-bounded serve paid ~30 broadcast/stage rounds of fixed
    // latency (r18 profile: 31 of q272's 33 jobs). This shape pins ONE
    // partitioning up front — the bounded counts repartitioned by
    // bucket_start (explicit np so AQE cannot re-coalesce it out of
    // co-partitioning) — and every downstream groupBy/window/join is keyed
    // on a superset of it, so Spark's subset-clustering rule keeps the
    // whole scoring tail exchange-free: 3 exchanges + 2 broadcasts total.
    // The corpus pass (the caller's partial-aggregated counts) is
    // untouched; only bounded frames ride the pinned key.
    // NO persist on these shared frames: a cached AQE plan hides its
    // partitioning from consumers (InMemoryTableScan reports unknown →
    // every consumer re-exchanges). Unpersisted, each consumer sees the
    // IDENTICAL repartition exchange subtree and Spark's exchange reuse
    // executes the corpus pass once and ReusedExchanges the rest — same
    // one-pass guarantee, with the partitioning visible to the planner.
    val cnt = counts.repartition(np, col("bucket_start"))
    // category universe WITH the reference mass: observed cats enter with
    // n_a=0 via the union, so absence-of-a-ref-category needs no later
    // left join — uni IS ref ∪ observed, one frame instead of two
    val uni = cnt.select(col("__cat"), lit(0L).as("n_a"))
      .unionByName(refProfile.select(col(catCol).as("__cat"),
        col("n").cast("long").as("n_a")))
      .repartition(np, col("__cat"))
      .groupBy("__cat").agg(sum("n_a").as("n_a"))
    val bkts = cnt.groupBy("bucket_start")
      .agg(sum("n_b").as("t_b"), sum("n_b").as("n_events"))
    // ONE 1-row guard frame: every guard statistic — bucket count, category
    // count, the PRODUCT spine bound (each factor can sit under its own
    // cap while buckets × cats is still a spine no cluster wants), and the
    // decimal(38,0) headroom of the exact chi-square, whose summand peaks
    // at 10⁶·(t_a·t_b)² and silently NULLs once t_a·t_b > 10¹⁶ — folds out
    // of a single union+aggregate pass, armed by ONE raise_error
    // projection that fires while the guard broadcast builds, before any
    // spine row materializes.
    val guard = bkts.select(lit("b").as("__src"), col("t_b").as("__v"))
      .unionByName(uni.select(lit("c").as("__src"), col("n_a").as("__v")))
      .agg(
        coalesce(sum(when(col("__src") === "b", lit(1L))), lit(0L))
          .as("__nbk"),
        max(when(col("__src") === "b", col("__v"))).as("__tbmax"),
        coalesce(sum(when(col("__src") === "c", lit(1L))), lit(0L))
          .as("__ncat"),
        coalesce(sum(when(col("__src") === "c", col("__v"))), lit(0L))
          .as("t_a"))
      .select(col("t_a"),
        when(col("__nbk") > maxBuckets,
          raise_error(concat(lit(s"$opName: "), col("__nbk"),
            lit(s" buckets > maxBuckets=$maxBuckets — widen bucketSec or " +
              "raise the cap if the executors have the memory"))))
        .when(col("__ncat") > maxCats,
          raise_error(concat(lit(s"$opName: "), col("__ncat"),
            lit(s" categories > maxCats=$maxCats — a category column this " +
              "wide is an id, not a categorical"))))
        .when(col("__ncat") * col("__nbk") > maxSpine,
          raise_error(concat(lit(s"$opName: spine "),
            col("__nbk"), lit(" buckets × "), col("__ncat"),
            lit(s" categories > maxSpine=$maxSpine — widen bucketSec or " +
              "coarsen the category column; raise the cap only if the " +
              "cluster can hold the full scoring spine"))))
        .when(dec(col("t_a")) * dec(coalesce(col("__tbmax"), lit(0L))) >=
            dec(lit(10000000000000000L)),
          raise_error(lit(s"$opName: t_a·t_b ≥ 1e16 exceeds " +
            "the decimal(38,0) headroom of the exact chi-square — " +
            "pre-aggregate or subsample the sides")))
        .otherwise(lit(0L)).as("__zero"))
    // the guard's __zero rides n_a so the optimizer cannot prune it; t_a
    // (the reference total) rides the same 1-row broadcast
    val uniG = uni.crossJoin(broadcast(guard))
      .select(col("__cat"), (col("n_a") + col("__zero")).as("n_a"),
        col("t_a"))
    // spine = buckets × (ref ∪ observed) categories: the stream side keeps
    // the pinned hash(bucket_start) partitioning through the broadcast
    // join, so the counts join, the rank window, and the final rollup all
    // run exchange-free on it
    val spine = bkts.crossJoin(broadcast(uniG))
      .join(cnt, Seq("bucket_start", "__cat"), "left")
      .select(col("bucket_start"), col("__cat"), col("n_events"),
        col("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        col("t_a"),
        col("t_b"))
    val diff = dec(col("n_a")) * dec(col("t_b")) - dec(col("n_b")) * dec(col("t_a"))
    val contrib = when(col("t_a") === 0 || col("t_b") === 0 ||
        col("n_a") + col("n_b") === 0, lit(0L))
      .otherwise(call_function("div",
        dec(lit(1000000L)) * diff * diff,
        (dec(col("n_a")) + dec(col("n_b"))) * dec(col("t_a")) * dec(col("t_b")))
        .cast("long"))
    val scored = spine.withColumn("__contrib", contrib)
    // nulls LAST on the tie-break — see timelineByGroupFromCounts
    val wTop = Window.partitionBy("bucket_start")
      .orderBy(col("__contrib").desc, col("__cat").asc_nulls_last)
    scored
      .withColumn("__rk", row_number().over(wTop))
      .groupBy("bucket_start")
      .agg(max("n_events").as("n_events"),
        sum("__contrib").as("chi2_micro"),
        max(when(col("__rk") === 1, col("__cat"))).as("top_cat"),
        max(when(col("__rk") === 1, col("__contrib"))).as("top_chi2_micro"))
  }
}
