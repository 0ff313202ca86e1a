package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution statistics over feature columns — the profiling pass a
  * training pipeline runs before normalization/clipping decisions.
  *
  * Reference scope: feray declares feature-statistics assets over its
  * feature tables (README.md:21-23); the computation shape here is
  * Spark-first.
  */
object Stats {

  /** Bins cap for the exact-histogram percentile family: above this the
    * "bins-only exchange" claim is void (the histogram is becoming the
    * column) and the correct tool is percentile_approx. */
  val DefaultMaxDistinct = 65536

  /** Row cap for the GLOBAL exact-percentile sort tier (one task sorts the
    * whole finite column in a single window partition); columns beyond it
    * take the iterative bins-only narrowing. */
  val ExactPercentileSortCap: Long = 1L << 22

  /** Runtime guard for the bounded-cardinality contract: adds 0 when the
    * histogram is within bounds, raises a loud error the moment any window
    * partition's bin count exceeds `maxDistinct`. Embedded into an already-
    * computed windowed column so it costs nothing and can't be pruned. */
  private def cardinalityGuard(binCount: org.apache.spark.sql.Column,
      maxDistinct: Int, op: String, valueCol: String): org.apache.spark.sql.Column =
    when(binCount > maxDistinct, raise_error(lit(
      s"$op: column '$valueCol' exceeds $maxDistinct distinct values — the exact " +
        "histogram path would carry ~one bin per value through the exchange " +
        "(a row-sized shuffle, the thing this operator exists to avoid). Use " +
        "percentile_approx for continuous columns, or raise maxDistinct if the " +
        "cardinality is genuinely bounded."))).otherwise(lit(0L))

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
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    val width = (hi - lo) / nBins
    val bin = least(greatest(floor((col(valueCol) - lo) / width), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("long")
    df.where(col(valueCol).isNotNull)
      .select(bin.as("bin"), col(valueCol).as("__v"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), min("__v").as("min_v"), max("__v").as("max_v"))
  }

  /** Exact percentile of a BOUNDED-CARDINALITY value column via its value
    * histogram — the scale-safe replacement for the interpreted global
    * `percentile()` aggregate, which buffers every value of its group on one
    * reducer (for a global percentile at 100 TB that one buffer is the whole
    * column). Here the map side collapses the column to one (value, count)
    * row per distinct value, the exchange carries bins, and the
    * interpolation runs over the bounded histogram; the single-partition
    * window is over the HISTOGRAM, never rows.
    *
    * Reproduces `percentile(col, p)`'s definition exactly: k = p*(n-1);
    * result = v[floor(k)] + frac(k)*(v[ceil(k)] - v[floor(k)]) with v the
    * 0-based sorted values — a row's sorted-index range is [lo, hi) from the
    * cumulative counts, so the two picks are conditional maxes over the
    * histogram (asserted value-equal to percentile() in ApproxSpec).
    *
    * Use when the column's distinct-value count is bounded (quantities,
    * grades, categorical scores); for unbounded doubles use
    * percentile_approx. The `maxDistinct` guard enforces that contract AT
    * RUNTIME: a continuous double column would silently turn the "bins"
    * exchange into a row-sized shuffle, so the histogram fails loudly
    * instead (the check rides the existing full-frame window — no extra
    * pass; it can only fire on the already-aggregated bins frame).
    */
  def histogramPercentile(df: DataFrame, valueCol: String, p: Double,
      maxDistinct: Int = DefaultMaxDistinct): DataFrame = {
    require(p >= 0 && p <= 1, s"p must be in [0,1], got $p")
    val cw = Window.orderBy("__q")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fw = Window.orderBy("__q")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.where(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("double").as("__q"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__hi", sum("__c").over(cw))
      .withColumn("__lo", col("__hi") - col("__c"))
      .withColumn("__k", (sum("__c").over(fw) - 1) * p
        + cardinalityGuard(count(lit(1)).over(fw), maxDistinct,
            "histogramPercentile", valueCol))
      .agg(
        max(when(col("__lo") <= floor(col("__k")) && floor(col("__k")) < col("__hi"),
          col("__q"))).as("__vlo"),
        max(when(col("__lo") <= ceil(col("__k")) && ceil(col("__k")) < col("__hi"),
          col("__q"))).as("__vhi"),
        max(col("__k")).as("__k"))
      .select((col("__vlo")
        + (col("__k") - floor(col("__k"))) * (col("__vhi") - col("__vlo")))
        .as("percentile"))
  }

  /** Exact PER-GROUP percentiles over the per-group value histogram — the
    * grouped form of [[histogramPercentile]], and the scale-safe replacement
    * for `percentile() OVER group`: the interpreted aggregate buffers every
    * value of each group on its reducer (a hot group's buffer is that whole
    * group), while here the map side collapses each group to its (value,
    * count) histogram and the cumulative windows run over histogram rows.
    *
    * One exchange total: the window's hashpartitioning(group) also satisfies
    * the final per-group aggregation, so Catalyst inserts no further
    * exchange. Same `percentile()` interpolation (k = p·(n−1), linear
    * between the two bracketing sorted values) per group, one output column
    * per requested p named `p<round(p*100)>`. Bounded-cardinality contract
    * (and runtime `maxDistinct` guard, here per GROUP — the window is
    * group-partitioned) as [[histogramPercentile]]. */
  def groupedHistogramPercentiles(df: DataFrame, groupCol: String,
      valueCol: String, ps: Seq[Double],
      maxDistinct: Int = DefaultMaxDistinct): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), s"ps must be in [0,1]: $ps")
    val names = percentileLabels(ps)
    val cw = Window.partitionBy(groupCol).orderBy("__q")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fw = Window.partitionBy(groupCol).orderBy("__q")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val hist = df.where(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol).cast("double").as("__q"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__hi", sum("__c").over(cw))
      .withColumn("__lo", col("__hi") - col("__c"))
      .withColumn("__n", sum("__c").over(fw)
        + cardinalityGuard(count(lit(1)).over(fw), maxDistinct,
            "groupedHistogramPercentiles", valueCol))
    val aggs = ps.zip(names).flatMap { case (p, nm) =>
      val k = (col("__n") - 1) * p
      Seq(
        max(when(col("__lo") <= floor(k) && floor(k) < col("__hi"), col("__q"))).as(s"__vlo_$nm"),
        max(when(col("__lo") <= ceil(k) && ceil(k) < col("__hi"), col("__q"))).as(s"__vhi_$nm"),
        max(k).as(s"__k_$nm"))
    }
    hist.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol) +: names.map { nm =>
        (col(s"__vlo_$nm") + (col(s"__k_$nm") - floor(col(s"__k_$nm"))) *
          (col(s"__vhi_$nm") - col(s"__vlo_$nm"))).as(nm)
      }: _*)
  }

  /** Winsorize (percentile-clip) a value column: values below the `pLo`
    * percentile clamp up to it, values above `pHi` clamp down — the standard
    * outlier treatment before normalization/feature scaling. Both bounds use
    * [[histogramPercentile]]'s exact interpolation over ONE shared value
    * histogram (same bounded-cardinality contract; one histogram aggregation,
    * one single-row broadcast back onto the fact side — the fact table never
    * shuffles). NULLs pass through as NULL. Appends `outCol` (double). */
  def winsorize(df: DataFrame, valueCol: String, pLo: Double, pHi: Double,
                outCol: String = "winsorized",
                maxDistinct: Int = DefaultMaxDistinct): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val cw = Window.orderBy("__q")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fw = Window.orderBy("__q")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val hist = df.where(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("double").as("__q"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__hi", sum("__c").over(cw))
      .withColumn("__lo", col("__hi") - col("__c"))
      .withColumn("__n", sum("__c").over(fw)
        + cardinalityGuard(count(lit(1)).over(fw), maxDistinct, "winsorize", valueCol))
    def pick(p: Double, tag: String) = {
      val k = (col("__n") - 1) * p
      Seq(
        max(when(col("__lo") <= floor(k) && floor(k) < col("__hi"), col("__q"))).as(s"__vlo_$tag"),
        max(when(col("__lo") <= ceil(k) && ceil(k) < col("__hi"), col("__q"))).as(s"__vhi_$tag"),
        max(k).as(s"__k_$tag"))
    }
    def interp(tag: String) =
      col(s"__vlo_$tag") + (col(s"__k_$tag") - floor(col(s"__k_$tag"))) *
        (col(s"__vhi_$tag") - col(s"__vlo_$tag"))
    val aggs = pick(pLo, "l") ++ pick(pHi, "h")
    val bounds = hist.agg(aggs.head, aggs.tail: _*)
      .select(interp("l").as("__wlo"), interp("h").as("__whi"))
    df.crossJoin(broadcast(bounds))
      .withColumn(outCol,
        // explicit NULL passthrough: greatest/least SKIP nulls, they don't
        // propagate them, so a NULL value would silently clamp to the bound
        when(col(valueCol).isNull, lit(null).cast("double"))
          .otherwise(least(greatest(col(valueCol).cast("double"), col("__wlo")), col("__whi"))))
      .drop("__wlo", "__whi")
  }

  /** Exact percentile of an UNBOUNDED-cardinality double column — the
    * missing third leg of the percentile family: `percentile()` buffers the
    * whole column on one reducer, [[histogramPercentile]] requires bounded
    * distinct values (its guard rejects continuous columns), and
    * `percentile_approx` is approximate. This is the classic distributed
    * exact selection by iterative value-domain narrowing: each round is ONE
    * map-side bin projection + keyed aggregation whose exchange carries
    * O(tasks · nBins) rows (never the column), the driver walks the ≤ nBins
    * cumulative counts to find the bin holding the target rank, and the
    * search range shrinks to that bin's observed [min, max]. A range that
    * collapses (min == max) IS the answer; a residual bin of ≤ `maxResidual`
    * rows resolves by a TakeOrdered top-(r+1) — bounded driver work by
    * construction. For 100 TB this is a handful of full scans with bins-only
    * exchanges — the shape that survives where a global sort or one-reducer
    * buffer dies.
    *
    * Reproduces `percentile(col, p)` exactly: k = p·(n−1), linear
    * interpolation between the 0-based sorted values at floor(k)/ceil(k)
    * (both found by exact rank-selection). Every float op downstream of the
    * exact ranks — the k product and the interpolation — is a correctly-
    * rounded IEEE double op, so any conforming engine reproduces the hash.
    * NULLs are excluded; an empty column yields an empty frame.
    *
    * Returns a 1-row frame (percentile: double). `ps` variant below shares
    * the initial count/min/max pass across requested percentiles. */
  def exactPercentileUnbounded(df: DataFrame, valueCol: String, p: Double,
      nBins: Int = 8192, maxResidual: Long = 1L << 17,
      maxSortRows: Long = ExactPercentileSortCap): DataFrame =
    // single-output column is always named "percentile", so ANY p in [0,1]
    // is fine here — the whole-percent label guard applies only to the
    // multi form, whose labels ARE the output columns
    exactPercentilesImpl(df, valueCol, Seq(p), Seq("percentile"), nBins,
      maxResidual, maxSortRows)

  /** Multi-percentile form of [[exactPercentileUnbounded]]: one shared
    * count/min/max pass, then — for a column that fits one task's sort
    * (≤ `maxSortRows` finite values) — ONE global rank-pick pass (the
    * [[groupedSortPercentiles]] discipline: row_number + broadcast rank
    * filter; the single-partition sort is bounded by the cap). Beyond the
    * cap, one rank-selection per DISTINCT bracketing rank (p25/p50/p75/p99
    * over the same column reuse nothing else — each rank's narrowing walks
    * its own range) over the persisted value frame. Output is one row with
    * a `p<round(p*100)>` double column per requested p (a p that does not
    * round-trip through that whole-percent label — 0.999, 0.005 — fails
    * loudly rather than silently mislabeling the column).
    *
    * NaN follows `percentile()` semantics: NaN sorts AFTER every finite
    * double, so the top nNaN ranks are NaN and any percentile whose
    * bracketing rank lands there returns NaN. The narrowing itself runs
    * over the finite values only (NaN would poison min/max and every bin
    * boundary — the histogram ranges could never converge). */
  def exactPercentilesUnbounded(df: DataFrame, valueCol: String, ps: Seq[Double],
      nBins: Int = 8192, maxResidual: Long = 1L << 17,
      maxSortRows: Long = ExactPercentileSortCap): DataFrame =
    exactPercentilesImpl(df, valueCol, ps, percentileLabels(ps), nBins,
      maxResidual, maxSortRows)

  /** Marker in the one-job sort tier's in-plan guard error: the driver
    * catches it and falls back to the head-first tiers. */
  private val BeyondSortCapMarker = "graft-exact-percentile-beyond-sort-cap"

  /** OPTIMISTIC one-job global sort tier: when Catalyst's size estimate
    * says the column plausibly fits the sort cap, answer every percentile
    * in a SINGLE action — no head pass. The row count is derived in-plan
    * from fwd-rank + rev-rank − 1 (the [[groupedSortPercentiles]] two-rank
    * identity, global form, unique tiebreaker for duplicate values), the
    * bracketing ranks are conditional aggregates over it, and the
    * `maxSortRows` contract rides the aggregation input as a loud
    * raise_error guard whose marker the caller catches to fall back. The
    * guard evaluates AFTER the single-task sort ran — it bounds the
    * optimistic tier's damage to one wasted job when Catalyst's estimate
    * lied low, not the sort itself (which is why the tier is only entered
    * when the estimate sits FAR inside the cap). NaN
    * needs no special path here: the ascending double sort puts NaN last,
    * so a bracketing rank in the NaN suffix picks NaN — `percentile()`
    * semantics by construction.
    *
    * Returns None when the input is empty-of-rows is fine (n = 0 → caller
    * emits the empty frame). Throws the marker error beyond the cap. */
  private def sortTierOneJob(base0: DataFrame, ps: Seq[Double],
      names: Seq[String], schema: org.apache.spark.sql.types.StructType,
      maxSortRows: Long): DataFrame = {
    val spark = base0.sparkSession
    val wAsc = Window.orderBy(col("__v").asc, col("__tb").asc)
    val wDesc = Window.orderBy(col("__v").desc, col("__tb").desc)
    val ranked = base0.withColumn("__tb", monotonically_increasing_id())
      .withColumn("__idx", row_number().over(wAsc).cast("long") - 1)
      .withColumn("__n", col("__idx") + row_number().over(wDesc).cast("long"))
    val guard = when(col("__n") > maxSortRows, raise_error(lit(
      s"$BeyondSortCapMarker: column exceeds maxSortRows=$maxSortRows")))
      .otherwise(lit(0L))
    def kk(p: Double) = lit(p) * (col("__n") - 1).cast("double")
    val pickAggs = ps.indices.flatMap { i =>
      Seq(max(when(col("__idx") === floor(kk(ps(i))), col("__v"))).as(s"__lo_$i"),
        max(when(col("__idx") === ceil(kk(ps(i))), col("__v"))).as(s"__hi_$i"))
    }
    val row = ranked.agg(max(col("__n") + guard).as("__n"), pickAggs: _*)
      .collect()(0)
    if (row.isNullAt(0))
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    val n = row.getLong(0)
    val out = ps.indices.map { i =>
      val k = ps(i) * (n - 1)
      val vLo = row.getDouble(1 + 2 * i)
      val vHi = row.getDouble(2 + 2 * i)
      // equal brackets return the value directly (percentile()'s
      // lowerIndex == higherIndex shortcut): the interpolation form would
      // turn an equal +-Infinity bracket into 0 * (Inf - Inf) = NaN
      java.lang.Double.valueOf(
        if (vLo == vHi) vLo else vLo + (k - math.floor(k)) * (vHi - vLo))
    }
    spark.createDataFrame(
      java.util.Collections.singletonList(org.apache.spark.sql.Row(out: _*)), schema)
  }

  private def exactPercentilesImpl(df: DataFrame, valueCol: String,
      ps: Seq[Double], names: Seq[String],
      nBins: Int, maxResidual: Long, maxSortRows: Long): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), s"ps must be in [0,1]: $ps")
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    require(maxResidual >= 1 && maxResidual < Int.MaxValue, s"maxResidual out of range: $maxResidual")
    val spark = df.sparkSession
    val v = col(valueCol).cast("double")
    val base0 = df.where(v.isNotNull).select(v.as("__v"))
    // optimistic single-action path: trust Catalyst's byte estimate only
    // when it is FAR inside the cap (8 B/row × maxSortRows — conservative:
    // a 100 TB column estimates far beyond this and never tries). The
    // in-plan guard backstops an estimate that was wrong the other way:
    // its marker error aborts the optimistic job and the head-first tiers
    // below — including iterative narrowing — take over gracefully.
    val schemaOut = org.apache.spark.sql.types.StructType(
      names.map(org.apache.spark.sql.types.StructField(_,
        org.apache.spark.sql.types.DoubleType, nullable = true)))
    val estBytes =
      try base0.queryExecution.optimizedPlan.stats.sizeInBytes
      catch { case scala.util.control.NonFatal(_) => BigInt(Long.MaxValue) }
    if (estBytes <= BigInt(8L) * BigInt(maxSortRows)) {
      try return sortTierOneJob(base0, ps, names, schemaOut, maxSortRows)
      catch {
        case e: Throwable if {
          var t: Throwable = e; var hit = false
          while (t != null && !hit) {
            hit = Option(t.getMessage).exists(_.contains(BeyondSortCapMarker))
            t = t.getCause
          }
          hit
        } => () // estimate lied low — fall through to the head-first tiers
      }
    }
    // ±Infinity is segmented like NaN: infinities sort deterministically
    // (-Inf prefix, +Inf between the finite values and the NaN suffix) but
    // POISON the narrowing loop — a bin width of (hi − lo)/nBins over an
    // infinite range is Inf and the round can never shrink it. Count each
    // side in the head pass, resolve ranks landing in an infinite segment
    // directly, and narrow only the FINITE interior.
    val isFin = !isnan(col("__v")) &&
      col("__v") =!= Double.PositiveInfinity && col("__v") =!= Double.NegativeInfinity
    val head = base0.agg(count(lit(1)),
      coalesce(sum(when(isnan(col("__v")), 1L).otherwise(0L)), lit(0L)),
      min(when(isFin, col("__v"))),
      max(when(isFin, col("__v"))),
      coalesce(sum(when(col("__v") === Double.NegativeInfinity, 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(col("__v") === Double.PositiveInfinity, 1L).otherwise(0L)), lit(0L)))
      .collect()(0)
    val n = head.getLong(0)
    val nNaN = head.getLong(1)
    val nNegInf = head.getLong(4)
    val nPosInf = head.getLong(5)
    val nFinite = n - nNaN // non-NaN count (includes ±Inf — the sort-tier domain)
    val nInterior = nFinite - nNegInf - nPosInf
    val schema = org.apache.spark.sql.types.StructType(
      names.map(org.apache.spark.sql.types.StructField(_,
        org.apache.spark.sql.types.DoubleType, nullable = true)))
    if (n == 0L)
      return spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    val (globalLo, globalHi) =
      if (nInterior == 0L) (0.0, 0.0) else (head.getDouble(2), head.getDouble(3))
    val base = base0.where(!isnan(col("__v")))
    // one narrowing state per DISTINCT bracketing rank across all requested
    // percentiles (p25/p50/p75 share ranks whenever n is small); rounds are
    // BATCHED — every state at the same depth shares ONE Spark action, so
    // the job count is O(rounds), never O(percentiles · rounds)
    final class St(val rank: Long) {
      // narrowing rank is RELATIVE to the finite interior (the -Inf prefix
      // resolves directly above)
      var lo = globalLo; var hi = globalHi; var r = rank - nNegInf; var cnt = nInterior
      var ans = Option.empty[Double]
    }
    val states = ps.flatMap { p =>
      val k = p * (n - 1)
      Seq(math.floor(k).toLong, math.ceil(k).toLong)
    }.distinct.map { rk =>
      val st = new St(rk)
      // ranks in the NaN suffix / infinite segments resolve immediately
      if (rk >= nFinite) st.ans = Some(Double.NaN)
      else if (rk < nNegInf) st.ans = Some(Double.NegativeInfinity)
      else if (rk >= nNegInf + nInterior) st.ans = Some(Double.PositiveInfinity)
      st
    }
    // SORT TIER (the groupedSortPercentiles discipline, global form): a
    // column that fits one task's sort resolves every rank in ONE pass —
    // global row_number + a broadcast rank filter. The single-partition
    // sort is bounded by the same contract that bounds a grouped hot key;
    // beyond it the iterative bins-only narrowing below takes over.
    val sortable = nFinite > 0 && nFinite <= maxSortRows &&
      states.exists(_.ans.isEmpty)
    if (sortable) {
      // ranks are known driver-side (the head pass), so the picks are pure
      // conditional aggregation over the ranked rows — no rank-frame
      // broadcast join (its build was a whole extra stage on this path)
      val wanted = states.filter(_.ans.isEmpty)
      val w = Window.orderBy("__v")
      val aggs = wanted.map(st =>
        max(when(col("__idx") === st.rank, col("__v"))).as(s"__r${st.rank}"))
      val row = base
        .withColumn("__idx", row_number().over(w).cast("long") - 1)
        .agg(aggs.head, aggs.tail: _*).collect()(0)
      wanted.zipWithIndex.foreach { case (st, i) => st.ans = Some(row.getDouble(i)) }
    }
    // every narrowing round and the residual pass rescan the 1-column
    // frame — persist it (disk-backed) for that path alone; released
    // before return
    val narrowing = states.exists(_.ans.isEmpty)
    if (narrowing)
      base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var rounds = 0
    while (states.exists(st => st.ans.isEmpty && st.cnt > maxResidual)) {
      rounds += 1
      require(rounds <= 200, "exactPercentileUnbounded: no convergence after " +
        "200 rounds — pathological input")
      states.foreach(st => if (st.ans.isEmpty && st.lo == st.hi) st.ans = Some(st.lo))
      // states needing a histogram round, grouped by identical range so each
      // distinct range is scanned once; all groups ride ONE union + collect
      val active = states.filter(st => st.ans.isEmpty && st.cnt > maxResidual)
        .groupBy(st => (st.lo, st.hi)).toSeq
      if (active.nonEmpty) {
        val frames = active.zipWithIndex.map { case (((lo, hi), _), tag) =>
          val width = (hi - lo) / nBins
          val bin =
            if (width <= 0 || lo + width == lo)
              // range narrower than double resolution at this magnitude:
              // only a handful of representable doubles remain — bin by value
              col("__v")
            else
              least(greatest(floor((col("__v") - lit(lo)) / lit(width)), lit(0.0)),
                lit((nBins - 1).toDouble))
          base.where(col("__v") >= lo && col("__v") <= hi)
            .groupBy(bin.as("__b")).agg(count(lit(1)).as("__c"),
              min("__v").as("__mn"), max("__v").as("__mx"))
            .select(lit(tag).as("__t"), col("__b"), col("__c"), col("__mn"), col("__mx"))
        }
        val hist = frames.reduce(_.union(_)).collect()
          .groupBy(_.getInt(0))
          .view.mapValues(_.sortBy(_.getDouble(1))).toMap
        active.zipWithIndex.foreach { case ((_, sts), tag) =>
          val bins = hist(tag)
          sts.foreach { st =>
            var cum = 0L
            var i = 0
            while (cum + bins(i).getLong(2) <= st.r) { cum += bins(i).getLong(2); i += 1 }
            st.r -= cum
            st.cnt = bins(i).getLong(2)
            st.lo = bins(i).getDouble(3)
            st.hi = bins(i).getDouble(4)
            if (st.lo == st.hi) st.ans = Some(st.lo)
          }
        }
      }
    }
    // bounded residuals, all in ONE union + collect: the r-th (0-based)
    // smallest of <= maxResidual in-range rows = max of the ascending
    // top-(r+1) (TakeOrderedAndProject per branch)
    val residual = states.filter(_.ans.isEmpty)
    if (residual.nonEmpty) {
      val frames = residual.zipWithIndex.map { case (st, tag) =>
        base.where(col("__v") >= st.lo && col("__v") <= st.hi)
          .orderBy(col("__v").asc).limit((st.r + 1).toInt)
          .agg(max("__v").as("__v")).select(lit(tag).as("__t"), col("__v"))
      }
      val got = frames.reduce(_.union(_)).collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      residual.zipWithIndex.foreach { case (st, tag) => st.ans = Some(got(tag)) }
    }
    if (narrowing) base.unpersist(false)
    val byRank = states.map(st => st.rank -> st.ans.get).toMap
    val out = ps.map { p =>
      val k = p * (n - 1)
      val vLo = byRank(math.floor(k).toLong)
      val vHi = byRank(math.ceil(k).toLong)
      // a NaN bracket propagates through the correctly-rounded interpolation
      // equal brackets return the value directly (percentile()'s
      // lowerIndex == higherIndex shortcut): the interpolation form would
      // turn an equal +-Infinity bracket into 0 * (Inf - Inf) = NaN
      java.lang.Double.valueOf(
        if (vLo == vHi) vLo else vLo + (k - math.floor(k)) * (vHi - vLo))
    }
    spark.createDataFrame(
      java.util.Collections.singletonList(org.apache.spark.sql.Row(out: _*)), schema)
  }

  /** `p<round(p·100)>` output labels with a loud round-trip guard: a p the
    * whole-percent label cannot represent (0.999, 0.005) fails instead of
    * silently mislabeling the column (0.999 would read "p100"). */
  private def percentileLabels(ps: Seq[Double]): Seq[String] = {
    val names = ps.map { p =>
      require(math.round(p * 100) / 100.0 == p,
        s"percentile $p has no whole-percent label (p${math.round(p * 100)} " +
          "would mislabel it) — use a whole-percent p, or percentile_approx " +
          "for finer quantiles")
      s"p${math.round(p * 100)}"
    }
    require(names.distinct.size == names.size, s"p labels collide: $names")
    names
  }

  /** Exact per-GROUP percentiles of an unbounded-cardinality double column
    * for groups that FIT ONE TASK'S SORT — the fully-lazy fast tier of the
    * grouped-exact family: ONE keyed exchange, each group rank-sorted in
    * its own task (`row_number`), bracketing ranks picked by conditional
    * aggregation under the SAME partitioning (no further exchange), and
    * the `percentile()` interpolation computed in the projection. No
    * driver-side actions at all — callers compose it lazily like any
    * other operator.
    *
    * The `maxSortGroup` contract is enforced AT RUNTIME in-plan (the
    * [[histogramPercentile]] guard pattern): a group larger than the cap
    * raises loudly instead of silently sorting an unbounded hot key in one
    * task — beyond-task groups belong to
    * [[groupedExactPercentilesUnbounded]]'s iterative narrowing tier.
    *
    * Matches `percentile(col, p)` per group exactly, including NaN (window
    * double-order sorts NaN last, same as the aggregate). NULL values
    * excluded; NULL group = a group. Output: (group, p<label>…). */
  def groupedSortPercentiles(df: DataFrame, groupCol: String,
      valueCol: String, ps: Seq[Double],
      maxSortGroup: Long = 1L << 22): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), s"ps must be in [0,1]: $ps")
    require(maxSortGroup >= 1, s"maxSortGroup must be >= 1, got $maxSortGroup")
    val names = percentileLabels(ps)
    val base = df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).cast("double").as("__v"))
      // unique per-row tiebreaker: makes BOTH window orders below total, so
      // the descending rank is the exact reverse permutation of the
      // ascending one even on duplicate values (fwd + rev − 1 = |group|
      // would NOT hold under row_number's arbitrary tie order otherwise)
      .withColumn("__tb", monotonically_increasing_id())
    // the group size comes from TWO row_numbers over the SAME exchange —
    // fwd (asc) + rev (desc) − 1 = n on every row — replacing the r12
    // shape's separate counts branch + join: one exchange and one scan of
    // the input where there were two of each. Both window sorts stream
    // (row_number's running frame); the second Window reuses the first's
    // hash(__g) partitioning, adding only a partition-local re-sort.
    // NOT count().over(whole group): an unbounded count frame makes
    // WindowExec buffer every group row in its frame array (measured ~3x
    // the whole op).
    val wAsc = Window.partitionBy("__g").orderBy(col("__v").asc, col("__tb").asc)
    val wDesc = Window.partitionBy("__g").orderBy(col("__v").desc, col("__tb").desc)
    val ranked = base
      .withColumn("__idx", row_number().over(wAsc).cast("long") - 1)
      .withColumn("__n", col("__idx") + row_number().over(wDesc).cast("long"))
    // the maxSortGroup contract guard rides the aggregation input in-plan
    // (the histogramPercentile pattern) — n is on every row now. NOTE:
    // this is a LOUD-CONTRACT error, not a work guard — it evaluates after
    // the window stage has already sorted the oversized group (the price
    // of the zero-extra-action design; the r12 counts-branch guard fired
    // pre-sort but cost a whole extra exchange+join on every call). A
    // workload KNOWN to carry beyond-task hot keys should call
    // groupedExactPercentilesUnbounded directly rather than rely on this
    // error as a router.
    val guard = when(col("__n") > maxSortGroup, raise_error(lit(
      s"groupedSortPercentiles: a group exceeds $maxSortGroup rows — one task " +
        "would sort an unbounded hot key; use groupedExactPercentilesUnbounded " +
        "(iterative narrowing) for beyond-task groups"))).otherwise(lit(0L))
    def k(p: Double) = lit(p) * (col("__n") - 1).cast("double")
    val aggs = ps.zip(names).flatMap { case (p, nm) =>
      Seq(
        max(when(col("__idx") === floor(k(p)), col("__v"))).as(s"__vlo_$nm"),
        max(when(col("__idx") === ceil(k(p)), col("__v"))).as(s"__vhi_$nm"))
    }
    val agged = ranked.groupBy(col("__g"))
      .agg(max(col("__n") + guard).as("__n"), aggs: _*)
    val outCols = col("__g").as(groupCol) +: ps.zip(names).map { case (p, nm) =>
      val kk = k(p)
      // equal-bracket shortcut (percentile() semantics): an equal
      // +-Infinity bracket must return that infinity, not 0*(Inf-Inf)=NaN;
      // NaN brackets fall to the otherwise branch and propagate as before
      when(col(s"__vlo_$nm") === col(s"__vhi_$nm"), col(s"__vlo_$nm"))
        .otherwise(col(s"__vlo_$nm") + (kk - floor(kk).cast("double"))
          * (col(s"__vhi_$nm") - col(s"__vlo_$nm"))).as(nm)
    }
    agged.select(outCols: _*)
  }

  /** Per-GROUP exact percentiles of an UNBOUNDED-cardinality double column
    * — the grouped form of [[exactPercentilesUnbounded]], and the missing
    * counterpart of [[groupedHistogramPercentiles]] (whose guard rejects
    * continuous columns). TWO-TIER:
    *
    *  - Groups whose finite count fits one task's sort (≤ `maxSortGroup`
    *    rows) resolve in a single shared per-group window pass — exact
    *    rank picks by `row_number`, no narrowing rounds. For typical
    *    workloads that is every group, so the whole op is TWO actions
    *    (head stats + window); the window sorts each group in its own
    *    task and the semi-join keeps only wanted groups in the pass.
    *  - Beyond-task groups (100 TB hot keys) use iterative value-domain
    *    rank-selection: each round broadcasts the distinct (group, range)
    *    rows — ranges DEDUPLICATED, so round 1 scans each group once, not
    *    once per rank — onto the fact side, bins in one keyed aggregation
    *    whose exchange carries O(tasks · ranges · nBins) histogram rows
    *    (never the column), and the driver advances every state from one
    *    collect; the final residual pass ranks ≤ `maxResidual` in-range
    *    rows per state under ONE state-keyed window. The fact table is
    *    persisted for this path (it re-scans O(rounds) times) and never
    *    shuffles by value.
    *
    * Driver state is |groups| · 2|ps| narrowing records — the `maxGroups`
    * guard makes that contract loud, mirroring the histogram family's
    * cardinality guard (per-group percentiles over millions of groups want
    * the bounded-histogram or approx forms, not rank-selection).
    *
    * Reproduces `percentile(col, p) OVER group` exactly (k = p·(n_g−1),
    * linear interpolation, correctly-rounded double ops; NaN sorts last,
    * as in `percentile()`). NULL values are excluded; a NULL GROUP is a
    * group like any other (SQL GROUP BY semantics).
    * Output: (group, p<round(p·100)>…), one row per group. */
  def groupedExactPercentilesUnbounded(df: DataFrame, groupCol: String,
      valueCol: String, ps: Seq[Double], nBins: Int = 1024,
      maxResidual: Long = 1L << 16, maxGroups: Int = 65536,
      maxSortGroup: Long = 1L << 22): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), s"ps must be in [0,1]: $ps")
    require(nBins >= 2 && maxResidual >= 1 && maxResidual < Int.MaxValue,
      s"bad nBins=$nBins / maxResidual=$maxResidual")
    require(maxSortGroup >= maxResidual,
      s"maxSortGroup ($maxSortGroup) must be >= maxResidual ($maxResidual)")
    val names = percentileLabels(ps)
    val spark = df.sparkSession
    val gType = df.schema(groupCol).dataType
    val base0 = df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).cast("double").as("__v"))
    // ±Infinity segments like NaN (see exactPercentilesImpl): the -Inf
    // prefix and +Inf suffix resolve from head counts, only the FINITE
    // interior narrows — an infinite bin width can never shrink.
    val isFinG = !isnan(col("__v")) &&
      col("__v") =!= Double.PositiveInfinity && col("__v") =!= Double.NegativeInfinity
    val heads = base0.groupBy("__g")
      .agg(count(lit(1)).as("n"),
        sum(when(isnan(col("__v")), 1L).otherwise(0L)).as("n_nan"),
        min(when(isFinG, col("__v"))).as("mn"),
        max(when(isFinG, col("__v"))).as("mx"),
        sum(when(col("__v") === Double.NegativeInfinity, 1L).otherwise(0L)).as("n_ninf"),
        sum(when(col("__v") === Double.PositiveInfinity, 1L).otherwise(0L)).as("n_pinf"))
      .limit(maxGroups + 1).collect()
    require(heads.length <= maxGroups,
      s"groupedExactPercentilesUnbounded: more than $maxGroups groups — the " +
        "narrowing state would no longer be driver-bounded; use " +
        "groupedHistogramPercentiles (bounded values) or percentile_approx")
    // NaN rows are excluded from rank selection (percentile() sorts NaN
    // last — those ranks resolve to NaN immediately from the head counts)
    // because a NaN would poison min/max and bin boundaries.
    val base = base0.where(!isnan(col("__v")))
    final class St(val g: Any, val n: Long, val rank: Long, val winCnt: Long) {
      var lo = 0.0; var hi = 0.0; var r = rank; var cnt = 0L
      var ans = Option.empty[Double]
    }
    val states = heads.flatMap { row =>
      val (g, n, nNaN) = (row.get(0), row.getLong(1), row.getLong(2))
      val (nNegInf, nPosInf) = (row.getLong(5), row.getLong(6))
      val nFinite = n - nNaN // non-NaN: the sort path's window size
      val nInterior = nFinite - nNegInf - nPosInf
      val (mn, mx) =
        if (nInterior == 0L) (0.0, 0.0) else (row.getDouble(3), row.getDouble(4))
      ps.flatMap { p =>
        val k = p * (n - 1)
        Seq(math.floor(k).toLong, math.ceil(k).toLong)
      }.distinct.map { rk =>
        val st = new St(g, n, rk, nFinite)
        st.lo = mn; st.hi = mx; st.cnt = nInterior
        // narrowing rank is RELATIVE to the finite interior
        st.r = rk - nNegInf
        if (rk >= nFinite) st.ans = Some(Double.NaN)
        else if (rk < nNegInf) st.ans = Some(Double.NegativeInfinity)
        else if (rk >= nNegInf + nInterior) st.ans = Some(Double.PositiveInfinity)
        else if (mn == mx) st.ans = Some(mn)
        st
      }
    }.toSeq
    val sid = states.zipWithIndex.toMap
    import org.apache.spark.sql.types._
    // SORT-PATH / NARROWING-PATH SPLIT: a group whose non-NaN count fits
    // one task's sort (≤ maxSortGroup — the window ranks EVERY non-NaN row
    // of the group, infinities included) resolves ALL its ranks in the
    // single shared window pass below — for typical workloads that is
    // every group, making the whole op TWO actions (heads + window). Only
    // beyond-task groups (the 100 TB hot keys this operator exists for)
    // pay the iterative bins-only narrowing.
    val (sortStates, narrowStates) =
      states.filter(_.ans.isEmpty).partition(_.winCnt <= maxSortGroup)
    // only the narrowing path re-scans base (once per round + residual) —
    // persist it for that path alone; the sort path reads it exactly once
    val persisted = narrowStates.nonEmpty
    if (persisted)
      base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var rounds = 0
    while (narrowStates.exists(st => st.ans.isEmpty && st.cnt > maxResidual)) {
      rounds += 1
      require(rounds <= 200, "groupedExactPercentilesUnbounded: no convergence " +
        "after 200 rounds — pathological input")
      val active = narrowStates.filter(st => st.ans.isEmpty && st.cnt > maxResidual)
      // histogram ranges DEDUPLICATE by (group, lo, hi): in round 1 every
      // rank of a group shares the group's full range, so the scan feeds
      // one histogram per GROUP, not one per rank — the r11 shape joined
      // per state and multiplied the scanned rows by ranks-per-group
      val ranges = active.groupBy(st => (st.g, st.lo, st.hi)).toSeq
      val rSchema = StructType(Seq(
        StructField("__rid", IntegerType), StructField("__sg", gType),
        StructField("__lo", DoubleType), StructField("__hi", DoubleType),
        StructField("__w", DoubleType)))
      val rRows = ranges.zipWithIndex.map { case (((g, lo, hi), _), rid) =>
        org.apache.spark.sql.Row(Int.box(rid), g, Double.box(lo),
          Double.box(hi), Double.box((hi - lo) / nBins))
      }
      val sdf = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rRows).asJava), rSchema)
      val binKey = when(col("__w") <= 0 || col("__lo") + col("__w") === col("__lo"),
          col("__v"))
        .otherwise(least(greatest(floor((col("__v") - col("__lo")) / col("__w")),
          lit(0.0)), lit((nBins - 1).toDouble)))
      val hist = base.join(broadcast(sdf), col("__g") <=> col("__sg"))
        .where(col("__v") >= col("__lo") && col("__v") <= col("__hi"))
        .groupBy(col("__rid"), binKey.as("__b"))
        .agg(count(lit(1)).as("__c"), min("__v").as("__mn"), max("__v").as("__mx"))
        .collect()
        .groupBy(_.getInt(0))
        .view.mapValues(_.sortBy(_.getDouble(3))).toMap // value order == __mn order
      ranges.zipWithIndex.foreach { case ((_, sts), rid) =>
        val bins = hist(rid)
        sts.foreach { st =>
          var cum = 0L
          var i = 0
          while (cum + bins(i).getLong(2) <= st.r) { cum += bins(i).getLong(2); i += 1 }
          st.r -= cum
          st.cnt = bins(i).getLong(2)
          st.lo = bins(i).getDouble(3)
          st.hi = bins(i).getDouble(4)
          if (st.lo == st.hi) st.ans = Some(st.lo)
        }
      }
    }
    // narrowed residuals: per-state rank selection over ≤ maxResidual
    // in-range rows each (ranges are disjoint bins by now, so the join
    // duplication is bounded by bins, not groups)
    val residual = narrowStates.filter(_.ans.isEmpty)
    if (residual.nonEmpty) {
      val rSchema = StructType(Seq(
        StructField("__sid", IntegerType), StructField("__sg", gType),
        StructField("__lo", DoubleType), StructField("__hi", DoubleType),
        StructField("__r", LongType)))
      val rRows = residual.map(st => org.apache.spark.sql.Row(
        Int.box(sid(st)), st.g, Double.box(st.lo), Double.box(st.hi),
        Long.box(st.r)))
      val sdf = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rRows).asJava), rSchema)
      val w = Window.partitionBy("__sid").orderBy("__v")
      val got = base.join(broadcast(sdf), col("__g") <=> col("__sg"))
        .where(col("__v") >= col("__lo") && col("__v") <= col("__hi"))
        .withColumn("__rk", row_number().over(w))
        .where(col("__rk") === col("__r") + 1)
        .select(col("__sid"), col("__v")).collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      residual.foreach(st => st.ans = Some(got(sid(st))))
    }
    // sort-path groups: ONE shared window pass ranks every wanted
    // (group, rank) — no per-state row duplication, no narrowing rounds
    if (sortStates.nonEmpty) {
      val wSchema = StructType(Seq(
        StructField("__wg", gType), StructField("__wr", LongType)))
      val wRows = sortStates.map(st =>
        org.apache.spark.sql.Row(st.g, Long.box(st.rank)))
      val wdf = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(wRows).asJava), wSchema)
      val keep = wdf.select(col("__wg")).distinct()
      val w = Window.partitionBy("__g").orderBy("__v")
      val got = base
        .join(broadcast(keep), col("__g") <=> col("__wg"), "left_semi")
        .withColumn("__idx", row_number().over(w).cast("long") - 1)
        .join(broadcast(wdf), col("__g") <=> col("__wg") && col("__idx") === col("__wr"))
        .select(col("__g"), col("__wr"), col("__v")).collect()
        .map(r => (r.get(0), r.getLong(1)) -> r.getDouble(2)).toMap
      sortStates.foreach(st => st.ans = Some(got((st.g, st.rank))))
    }
    if (persisted) base.unpersist(false)
    val byKey = states.map(st => (st.g, st.rank) -> st.ans.get).toMap
    val outSchema = StructType(
      StructField(groupCol, gType) +:
        names.map(StructField(_, DoubleType)))
    val rows = heads.map { row =>
      val (g, n) = (row.get(0), row.getLong(1))
      val vals = ps.map { p =>
        val k = p * (n - 1)
        val vLo = byKey((g, math.floor(k).toLong))
        val vHi = byKey((g, math.ceil(k).toLong))
        Double.box(
          if (vLo == vHi) vLo else vLo + (k - math.floor(k)) * (vHi - vLo))
      }
      org.apache.spark.sql.Row.fromSeq(g +: vals)
    }
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows.toSeq).asJava), outSchema)
  }

  /** Deterministic stratified sample: at most `n` rows per group, chosen by
    * the 60-bit md5 hash of the id — stable across runs, task retries, AND
    * engines (never `rand()`), so a resumed pipeline re-selects the exact
    * same rows.
    *
    * Scale shape: one group-keyed shuffle; the rank window sorts within the
    * group. For pathologically hot groups, pre-filtering on a hash
    * threshold (cf. `TextOps.sampleMixture`) bounds the sort input.
    */
  def stratifiedSample(df: DataFrame, groupCol: String, idCol: String,
      n: Int): DataFrame = {
    val h = pmod(Dedup.md5Hash60(col(idCol).cast("string")), lit(Dedup.P))
    val w = Window.partitionBy(groupCol).orderBy(h.asc, col(idCol).asc)
    // NULL ids are not sampleable identities: excluded EXPLICITLY here so
    // the window and bounded ([[stratifiedSampleBounded]]) forms agree on
    // any input — without the filter, ASC null-first ordering would give
    // NULL-id rows the leading ranks in this form only
    df.where(col(idCol).isNotNull)
      .withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= n)
  }

  /** Bounded-memory form of [[stratifiedSample]]: same deterministic
    * hash-ordered sample (identical (group, id, sample_rank) set — spec- and
    * oracle-asserted), but computed with [[graft.expressions.ReservoirAgg]]
    * under partial aggregation. The window form SHUFFLES EVERY ROW of the
    * table to rank it; here each map task keeps ≤ n (draw, id) pairs per
    * group, so the exchange carries ≤ n·tasks rows per group and the
    * 100 TB fact table itself never moves. Returns (group, id, sample_rank)
    * — semi-join the ids back to fetch full rows (ids-only output is the
    * point: the payload never rides the aggregation). `idCol` must be an
    * integral column (loudly required — a silent cast would turn string ids
    * into an empty sample); the draw hashes its decimal string form so
    * ranks match [[stratifiedSample]] exactly. NULL ids are excluded in
    * both forms. */
  def stratifiedSampleBounded(df: DataFrame, groupCol: String, idCol: String,
      n: Int): DataFrame = {
    requireIntegral(df, idCol, "stratifiedSampleBounded idCol")
    val draw = pmod(Dedup.md5Hash60(col(idCol).cast("string")), lit(Dedup.P))
    reservoir(df, groupCol, idCol, draw, n)
      .select(col(groupCol), col(idCol), col("rank").as("sample_rank"))
  }

  /** Bounded-memory top-k per group by an integral order column — the
    * aggregate replacement for `row_number() OVER (PARTITION BY g ORDER BY
    * v)` + `rank <= k`, which shuffles EVERY row to rank it. Same
    * [[graft.expressions.ReservoirAgg]] machinery as
    * [[stratifiedSampleBounded]]: each buffer keeps ≤ k (key, id) pairs, so
    * the exchange carries ≤ k·tasks per group. Descending order rides the
    * BITWISE COMPLEMENT of the value (`~v` is a monotone order reversal
    * with no `-Long.MinValue` overflow). Ties break on smaller id — the
    * window form's `ORDER BY v [DESC], id ASC`. Returns (group, id,
    * orderCol, rank). Both `idCol` and `orderCol` must be integral columns
    * (loudly required — a silent double truncation would reorder the
    * top-k); rows with NULL id or order value are excluded. */
  def topKPerGroupBounded(df: DataFrame, groupCol: String, idCol: String,
      orderCol: String, k: Int, desc: Boolean = true): DataFrame = {
    requireIntegral(df, idCol, "topKPerGroupBounded idCol")
    requireIntegral(df, orderCol, "topKPerGroupBounded orderCol")
    val v = col(orderCol).cast("long")
    val draw = if (desc) bitwise_not(v) else v
    // the reconstructed order value is cast BACK to the input column's type:
    // the draw rides int64 internally, but emitting long for an int/short
    // input would drift the output schema from the window form it replaces
    val orderType = df.schema(orderCol).dataType
    reservoir(df, groupCol, idCol, draw, k)
      .select(col(groupCol), col(idCol),
        (if (desc) bitwise_not(col("__draw")) else col("__draw"))
          .cast(orderType).as(orderCol),
        col("rank"))
  }

  /** The bounded forms route ids and order values through int64: anything
    * non-integral would cast to NULL (string ids → empty sample) or
    * truncate (double scores → reordered top-k) SILENTLY. Fail loudly
    * instead; callers pre-quantize doubles (cents/micro-units) the same way
    * every exact op in this engine does. */
  private def requireIntegral(df: DataFrame, c: String, what: String): Unit = {
    val dt = df.schema(c).dataType
    require(dt == org.apache.spark.sql.types.LongType ||
        dt == org.apache.spark.sql.types.IntegerType ||
        dt == org.apache.spark.sql.types.ShortType ||
        dt == org.apache.spark.sql.types.ByteType,
      s"$what must be an integral column, got ${dt.catalogString} for '$c' — " +
        "quantize doubles (e.g. cents) or densify string ids first")
  }

  /** Shared reservoir plumbing: k smallest (draw, id) per group via the
    * bounded aggregate, exploded to (group, id, __draw, rank). */
  private def reservoir(df: DataFrame, groupCol: String, idCol: String,
      draw: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.GraftColumn
    val agg = GraftColumn.of(
      graft.expressions.ReservoirAgg(
        GraftColumn.expr(draw), GraftColumn.expr(col(idCol).cast("long")), k)
        .toAggregateExpression())
    df.groupBy(col(groupCol))
      .agg(agg.as("__sample"))
      .select(col(groupCol), posexplode(col("__sample")).as(Seq("__pos", "__s")))
      .select(col(groupCol), col("__s.id").as(idCol), col("__s.draw").as("__draw"),
        (col("__pos") + 1).cast("int").as("rank"))
  }

  /** Weighted (probability-proportional-to-size) Bernoulli sampling:
    * include a row with probability `min(1, weight·expectedN / W)` where
    * `W = Σ weight` — the Poisson-sampling form of weighted subsampling
    * (quality- or length-weighted corpus selection). Deterministic and
    * engine-portable BY CONSTRUCTION: the uniform draw is the first 52
    * bits of `md5(id:seed)` and the inclusion test is the integer
    * cross-multiplication `u52·W < weight·expectedN·2^52` in
    * DECIMAL(38,0) — no float op anywhere, so any engine that can hash
    * md5 and multiply integers selects the IDENTICAL row set. Weights
    * must be integral (pre-quantize float weights); magnitudes must keep
    * both products under 38 digits (u52 < 2^52 ≈ 16 digits, so W up to
    * ~20 digits is safe).
    *
    * Scale shape: one aggregation pass for the scalar W (bounded driver
    * collect), then the filter is map-side only — zero shuffles on the
    * sampled table, retry-stable under speculative re-execution. */
  def weightedBernoulliSample(df: DataFrame, idCol: String, weightCol: String,
      expectedN: Long, seed: String = "graft"): DataFrame = {
    require(expectedN >= 0, s"expectedN must be >= 0, got $expectedN")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val wRow = df.agg(sum(col(weightCol).cast(dec)).as("W")).collect()(0)
    if (wRow.isNullAt(0)) df.where(lit(false)) // empty/all-null weights
    else {
      val totalW = wRow.getDecimal(0)
      val u52 = conv(substring(
        md5(concat(col(idCol).cast("string"), lit(":" + seed))), 1, 13), 16, 10).cast(dec)
      df.where(u52 * lit(totalW) <
        col(weightCol).cast(dec) * lit(expectedN).cast(dec) * lit(1L << 52).cast(dec))
    }
  }

  /** Per-group z-score normalization. Mean and variance come from exact
    * integer-cent sums (the q35 cross-engine pattern: int64 sums, then one
    * correctly-rounded int64→double conversion per term), so every float op
    * downstream — subtract, divide, sqrt — is identically rounded in any
    * IEEE-754 engine. Degenerate groups (zero variance) get z = 0.
    *
    * Scale shape: one keyed agg (partial+final), then the group-stats frame
    * — |groups| rows — broadcasts back onto the fact side: the fact table
    * never shuffles for the normalization.
    */
  def zscorePerGroup(df: DataFrame, keyCol: String, idCol: String,
      valueCol: String): DataFrame = {
    val c = round(col(valueCol) * 100).cast("long")
    // n counts NON-NULL values only (count(*) would mix NULL rows into the
    // mean/variance denominators while sum skips them — corrupting every
    // non-null row's z); sums go through decimal so c² can't wrap int64
    // (30k.00 quantizes to 3e6 cents, c² = 9e12 — ~1M such rows overflow a
    // long sum)
    val cd = col("__c").cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val stats = df.withColumn("__c", c)
      .groupBy(keyCol)
      .agg(count(col("__c")).as("__n"), sum(cd).as("__s"),
        sum(cd * col("__c")).as("__q"))
    val mean = col("__s").cast("double") / col("__n")
    val varPop = (col("__q").cast("double")
      - col("__s").cast("double") * col("__s").cast("double") / col("__n")) / col("__n")
    df.withColumn("__c", c)
      .join(broadcast(stats), Seq(keyCol))
      .select(col(keyCol), col(idCol),
        // NULL value -> NULL z (before the degenerate-group clamp, which
        // would otherwise emit 0); varPop <= 0 catches both true-zero
        // variance AND the tiny negatives double rounding can produce,
        // where sqrt would return NaN
        when(col("__c").isNull, lit(null).cast("double"))
          .when(varPop <= 0d, 0d)
          .otherwise((col("__c").cast("double") - mean) / sqrt(varPop)).as("z"))
  }

  /** Robust per-group scaling: (value − group median) / group IQR — the
    * outlier-resistant counterpart of [[zscorePerGroup]] (mean/stddev move
    * with every outlier; median/IQR don't). Group stats come from ONE
    * [[groupedHistogramPercentiles]] pass (bins-only exchanges) and
    * broadcast back; the fact side never shuffles. Degenerate groups
    * (IQR = 0) get 0, NULL values stay NULL. */
  def robustScalePerGroup(df: DataFrame, keyCol: String, idCol: String,
      valueCol: String, maxDistinct: Int = DefaultMaxDistinct): DataFrame = {
    val stats = groupedHistogramPercentiles(df, keyCol, valueCol,
      Seq(0.25, 0.5, 0.75), maxDistinct)
      .select(col(keyCol), col("p50").as("__med"),
        (col("p75") - col("p25")).as("__iqr"))
    // LEFT join: a group whose values are entirely NULL has no histogram
    // rows and thus no stats row — an inner join would silently DROP its
    // rows; with the left join they survive with z = NULL (the natural
    // null-propagation of the arithmetic, matching SQL semantics where the
    // group's quantiles are NULL)
    df.join(broadcast(stats), Seq(keyCol), "left")
      .select(col(keyCol), col(idCol),
        when(col(valueCol).isNull, lit(null).cast("double"))
          .when(col("__iqr") === 0d, 0d)
          .otherwise((col(valueCol).cast("double") - col("__med")) / col("__iqr"))
          .as("robust_z"))
  }

  /** Approximate heavy hitters of a string column via the Misra–Gries sketch
    * [[graft.expressions.FreqItemsAgg]]: one row per surviving sketch item
    * with its estimate and the total stream length. Memory is `k` counters
    * PER AGGREGATION BUFFER regardless of stream length or cardinality — the
    * 100 TB alternative to a full vocabulary-sized groupBy when only the
    * frequent tail matters — and the deterministic guarantee
    * `est <= true <= est + n_total/(k+1)` means every item with true count
    * above `n_total/(k+1)` is present. Buffers merge soundly under Spark's
    * partial aggregation (any partitioning / merge order). */
  /** The Misra–Gries aggregate as a Column — shared by [[heavyHitters]] and
    * the streaming form (`StreamOps.heavyHittersStream`) so the two paths
    * can never diverge in how the sketch is constructed. */
  private[graft] def freqItemsAgg(itemCol: String, k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftColumn
    GraftColumn.of(
      graft.expressions.FreqItemsAgg(GraftColumn.expr(col(itemCol).cast("string")), k)
        .toAggregateExpression())
  }

  def heavyHitters(df: DataFrame, itemCol: String, k: Int): DataFrame =
    df.groupBy().agg(freqItemsAgg(itemCol, k).as("__s"))
      .select(col("__s.n").as("n_total"), explode(col("__s.items")).as("__e"))
      .select(col("__e.item").as("item"), col("__e.est").as("est"), col("n_total"))

  /** Count–min point-frequency estimates (Cormode & Muthukrishnan 2005,
    * "An improved data stream summary: the count-min sketch") — the
    * POINT-QUERY companion to [[heavyHitters]]'s Misra–Gries (which finds
    * frequent items but can't answer "how often did X occur" for an
    * arbitrary X): d = ⌈ln(1/(1−confidence))⌉ rows × w = ⌈2/eps⌉ cells,
    * independent of stream length or cardinality, mergeable under Spark's
    * partial aggregation (Spark's own DataSketches-style
    * `count_min_sketch` aggregate builds it; seeded, so the realized
    * estimates are deterministic). Guarantee: `est ≥ true` always;
    * `est ≤ true + eps·N` with probability ≥ confidence per probe (a
    * FIXED seed makes the realized bound a deterministic fact — q172 pins
    * both as hash-compared booleans, the q21/q119 discipline for sketch
    * outputs).
    *
    * Scale shape: one aggregation pass (the sketch merges map-side), one
    * bounded driver read of the sketch bytes; probes evaluate driver-side
    * against the deserialized sketch. Output: (item, true guarantees as
    * booleans are the CALLER's job — this returns (item, est, n_total)). */
  def countMinFrequencies(df: DataFrame, itemCol: String, probes: Seq[String],
      eps: Double = 0.01, confidence: Double = 0.999, seed: Int = 42): DataFrame = {
    require(probes.nonEmpty, "need at least one probe item")
    val row = df.where(col(itemCol).isNotNull).agg(
      count_min_sketch(col(itemCol).cast("string"), lit(eps), lit(confidence),
        lit(seed)).as("__s"),
      count(lit(1)).as("__n")).head()
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](0)))
    val n = row.getLong(1)
    val spark = df.sparkSession
    import spark.implicits._
    probes.map(p => (p, sketch.estimateCount(p), n)).toDF("item", "est", "n_total")
  }

  // ---- exact two-sample Kolmogorov–Smirnov drift (Kolmogorov 1933;
  // Massey 1951, JASA 46 "The Kolmogorov-Smirnov Test for Goodness of
  // Fit") — the scalar-feature leg of the monitoring family ---------------

  /** Exact two-sample Kolmogorov–Smirnov drift for a numeric column — the
    * plain-scalar leg of the monitoring family (token chi-square covers
    * categorical, embedding mean/shape cover vectors; this covers a
    * numeric feature column directly). D = max_v |F_A(v) − F_B(v)|
    * evaluated EXACTLY in cleared-denominator integers: d_num =
    * max_v |cumA(v)·n_b − cumB(v)·n_a| over the pooled distinct values and
    * ks_micro = ⌊10⁶·d_num / (n_a·n_b)⌋ — no doubles in the statistic, so
    * every engine agrees bit-for-bit. `at_value` is the smallest value
    * attaining the max (the drift location; deterministic under ties).
    * NULL/NaN are excluded on both sides; an empty side scores 0 (the
    * family's absent-side convention). Output: ONE row
    * (n_a, n_b, ks_micro, at_value).
    *
    * Scale shape: the naive form — one `ORDER BY value` window — is the
    * classic global-cumulative trap (a single task holds the whole
    * column). Avoided with a two-level distributed prefix sum: per-side
    * counts collapse to pooled DISTINCT values on ONE exchange, a range
    * repartition orders them across `rangeParts` tasks, the ≤ rangeParts
    * partition totals prefix-sum on the intentionally-tiny side, and each
    * partition's local cumulative window adds its broadcast offset — every
    * task touches only its own value range at ANY column cardinality. */
  def ksDrift(dfA: DataFrame, dfB: DataFrame, valueCol: String,
      rangeParts: Int = 64): DataFrame = {
    import graft.core.TrackedCache.TrackedDataset
    require(rangeParts >= 1, s"rangeParts must be >= 1, got $rangeParts")
    def side(df: DataFrame, ca: Long, cb: Long) = df
      .select(col(valueCol).cast("double").as("__v"))
      .where(col("__v").isNotNull && !isnan(col("__v")))
      .select(col("__v"), lit(ca).as("__ca"), lit(cb).as("__cb"))
    val counts = side(dfA, 1L, 0L).unionByName(side(dfB, 0L, 1L))
      .groupBy("__v").agg(sum("__ca").as("a"), sum("__cb").as("b"))
    // persisted: the partition-totals pass and the scoring pass both read
    // it — uncached, each branch would re-scan BOTH corpora
    val ranged = counts.repartitionByRange(rangeParts, col("__v"))
      .sortWithinPartitions("__v")
      .withColumn("__pid", spark_partition_id())
      .persistTracked()
    val ptot = ranged.groupBy("__pid")
      .agg(sum("a").as("pa"), sum("b").as("pb"))
    // ≤ rangeParts rows: the one intentionally-single-task window
    val wOff = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val poff = ptot.select(col("__pid"),
      coalesce(sum("pa").over(wOff), lit(0L)).as("__offa"),
      coalesce(sum("pb").over(wOff), lit(0L)).as("__offb"))
    val tot = ptot.agg(
      coalesce(sum("pa"), lit(0L)).as("n_a"),
      coalesce(sum("pb"), lit(0L)).as("n_b"))
    val wLoc = Window.partitionBy("__pid").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val cum = ranged.select(col("__v"), col("__pid"),
      sum("a").over(wLoc).as("__la"), sum("b").over(wLoc).as("__lb"))
    val dev = cum.join(broadcast(poff), Seq("__pid"))
      .crossJoin(broadcast(tot))
      .select(col("__v"), col("n_a"), col("n_b"),
        abs(dec(col("__la") + col("__offa")) * dec(col("n_b")) -
            dec(col("__lb") + col("__offb")) * dec(col("n_a"))).as("__dev"))
    dev.agg(
        max(struct(col("__dev").as("d"), (-col("__v")).as("nv"))).as("m"),
        max("n_a").as("__na"), max("n_b").as("__nb"))
      .select(
        coalesce(col("__na"), lit(0L)).as("n_a"),
        coalesce(col("__nb"), lit(0L)).as("n_b"),
        when(coalesce(col("__na"), lit(0L)) === 0 ||
             coalesce(col("__nb"), lit(0L)) === 0, lit(0L))
          .otherwise(call_function("div",
            dec(lit(1000000L)) * col("m.d"),
            dec(col("__na")) * dec(col("__nb"))).cast("long")).as("ks_micro"),
        (-col("m.nv")).as("at_value"))
  }

  /** The scalar monitor's ADDITIVE sufficient statistic — the numeric
    * twin of `Similarity.embeddingProfile` for a plain feature column:
    * each value quantizes to exact micros (`round(x·10⁶)`, the engine-wide
    * convention) and floors into one of `bins` buckets of `binWidthMicro`
    * micros (clamped to [−bins/2, bins/2−1]); output is (bin, n) counts.
    * Additive under bin-keyed sum — profile(A ∪ B) == profile(A) +
    * profile(B), exact integers — so the streaming maintenance loop
    * ([[graft.streaming.Fastlane.ingestNumericProfile]]) keeps a stored
    * profile current at O(batch) per micro-batch and
    * [[numericShapeDriftFromProfiles]] serves the scalar drift monitor
    * without re-touching the corpora. [[ksDrift]] is the EXACT direct
    * test; this binned form is what a bounded stored profile can serve —
    * the same direct-vs-servable split as embeddingDrift vs its profiles.
    * NULL/NaN excluded (scalar semantics — no padding convention).
    *
    * Scale shape: one bin-keyed count — partial aggregation collapses
    * each task to ≤ bins rows before the one exchange; the corpus never
    * shuffles. */
  def numericProfile(df: DataFrame, valueCol: String, bins: Int = 16,
      binWidthMicro: Long = 31250000L): DataFrame = {
    requireBinSpec(bins, binWidthMicro)
    df.select(col(valueCol).cast("double").as("__v"))
      .where(col("__v").isNotNull && !isnan(col("__v")))
      .select(microBin(col("__v"), bins, binWidthMicro).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
  }

  /** The scalar-monitor family's ONE binning expression (quantize to exact
    * micros, floor into `binWidthMicro`-wide bins, clamp to
    * [−bins/2, bins/2−1]) — shared by the global/segmented profiles and
    * the numeric timeline so the routes cannot drift on bin edges. Input
    * must already be cast to double and NULL/NaN-filtered. */
  private[ops] def microBin(v: Column, bins: Int,
      binWidthMicro: Long): Column = {
    val hb = bins / 2
    least(greatest(
      floor(round(v * lit(1000000d)).cast("long") / lit(binWidthMicro)),
      lit(-hb.toLong)), lit(hb - 1L))
  }

  private[ops] def requireBinSpec(bins: Int, binWidthMicro: Long): Unit = {
    require(bins >= 2 && bins <= 256 && bins % 2 == 0,
      s"bins must be even and in [2, 256], got $bins")
    require(binWidthMicro >= 1,
      s"binWidthMicro must be >= 1, got $binWidthMicro")
  }

  /** Binned two-sample chi-square drift for a numeric column — the
    * PROFILE-SERVABLE scalar monitor ([[ksDrift]] is exact but needs the
    * full value sets; this needs only two ≤ bins-row profiles, so it is
    * the form a streaming monitor stores and serves). Per bin the
    * tokenDrift chi-square summand runs verbatim in exact integers;
    * output one row per occupied bin: (bin, n_a, n_b, chi2_micro, rank),
    * rank by contribution (ties → smaller bin). An empty side scores 0. */
  def numericShapeDrift(dfA: DataFrame, dfB: DataFrame, valueCol: String,
      bins: Int = 16, binWidthMicro: Long = 31250000L): DataFrame = {
    requireBinSpec(bins, binWidthMicro)
    // ONE tagged-union aggregation for both sides (the tokenCountsBoth /
    // ksDrift discipline): each side's binned rows enter with a (1,0)/(0,1)
    // indicator pair and one bin-keyed exchange sums both — replacing two
    // per-side aggregations + a full-outer join (row-identical: a bin
    // present on either side appears once with both counts, absent side 0).
    def side(df: DataFrame, a: Long, b: Long) = df
      .select(col(valueCol).cast("double").as("__v"))
      .where(col("__v").isNotNull && !isnan(col("__v")))
      .select(microBin(col("__v"), bins, binWidthMicro).as("bin"),
        lit(a).as("__ca"), lit(b).as("__cb"))
    numericShapeDriftFromJoined(
      side(dfA, 1L, 0L).unionByName(side(dfB, 0L, 1L))
        .groupBy("bin").agg(sum("__ca").as("n_a"), sum("__cb").as("n_b")))
  }

  /** [[numericShapeDrift]] computed from two STORED [[numericProfile]]
    * frames instead of the corpora — the serving read of the streaming
    * scalar monitor: the profile's per-bin n IS the count the direct
    * route aggregates, so the answer is IDENTICAL to running the drift
    * over the corpora the profiles summarize (spec- and oracle-asserted).
    * Inputs are re-aggregated by bin first, so concatenated partial
    * profiles are accepted. Cost: two ≤ bins-row scans — the corpora are
    * never touched at serve time. */
  def numericShapeDriftFromProfiles(profA: DataFrame,
      profB: DataFrame): DataFrame =
    numericShapeDriftFromJoined(
      profA.select(col("bin"), col("n").as("__ca"), lit(0L).as("__cb"))
        .unionByName(
          profB.select(col("bin"), lit(0L).as("__ca"), col("n").as("__cb")))
        .groupBy("bin").agg(sum("__ca").as("n_a"), sum("__cb").as("n_b")))

  /** Shared chi-square tail of [[numericShapeDrift]] /
    * [[numericShapeDriftFromProfiles]] — one code path so the direct and
    * profile-served routes cannot drift. Input: the tagged-union
    * (bin, n_a, n_b) counts (non-null by construction; the per-side
    * re-aggregation of concatenated partial profiles rides the same
    * exchange). The frame is ≤ bins rows throughout; the unpartitioned
    * rank window is bins-bounded by construction. */
  private def numericShapeDriftFromJoined(joined0: DataFrame): DataFrame = {
    import graft.core.TrackedCache.TrackedDataset
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val joined = joined0.persistTracked()
    // exact-integer headroom guard: the chi-square summand peaks at
    // 10⁶·(t_a·t_b)², which exceeds decimal(38,0) — a silent NULL —
    // once t_a·t_b > 10¹⁶; fail loudly instead
    val totals = joined.agg(
        coalesce(sum("n_a"), lit(0L)).as("t_a"),
        coalesce(sum("n_b"), lit(0L)).as("t_b"))
      .select(
        (col("t_a") + when(
          dec(col("t_a")) * dec(col("t_b")) >= dec(lit(10000000000000000L)),
          raise_error(lit("numericShapeDrift: t_a·t_b ≥ 1e16 exceeds the " +
            "decimal(38,0) headroom of the exact chi-square — " +
            "pre-aggregate or subsample the sides")))
          .otherwise(lit(0L))).as("t_a"),
        col("t_b"))
    val diff = dec(col("n_a")) * dec(col("t_b")) - dec(col("n_b")) * dec(col("t_a"))
    val contrib = when(col("t_a") === 0 || col("t_b") === 0, lit(0L))
      .otherwise(call_function("div",
        dec(lit(1000000L)) * diff * diff,
        (dec(col("n_a")) + dec(col("n_b"))) * dec(col("t_a")) * dec(col("t_b")))
        .cast("long"))
    joined.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_a"), col("n_b"),
        contrib.as("chi2_micro"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("chi2_micro").desc, col("bin").asc)))
  }

  /** SEGMENTED [[numericProfile]] — the scalar monitor's additive
    * sufficient statistic PER GROUP: (group, bin, n) counts, additive
    * under (group, bin)-keyed sum exactly like the global profile, which
    * is what lets the streaming maintenance loop
    * ([[graft.streaming.Fastlane.ingestNumericProfileByGroup]]) keep a
    * per-source scalar profile current at O(batch + touched buckets) per
    * micro-batch. A stored pair then serves
    * [[numericShapeDriftByGroupFromProfiles]] without re-touching the
    * corpora — the per-source scalar-drift dashboard reads profiles, same
    * as the token/embedding monitors. Binning (exact-micro quantize,
    * floor, clamp) is [[numericProfile]]'s verbatim; NULL groups are
    * excluded (a null segment is not a segment), NULL/NaN values excluded
    * as in the global form.
    *
    * Scale shape: one (group, bin)-keyed count — partial aggregation
    * collapses each task to ≤ groups·bins rows before the one exchange;
    * the corpus never shuffles. */
  def numericProfileByGroup(df: DataFrame, valueCol: String,
      groupCol: String, bins: Int = 16,
      binWidthMicro: Long = 31250000L): DataFrame = {
    requireBinSpec(bins, binWidthMicro)
    require(groupCol != "bin" && groupCol != "n" && groupCol != "__v",
      s"groupCol collides with an internal column name: $groupCol")
    df.select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .where(col(groupCol).isNotNull &&
        col("__v").isNotNull && !isnan(col("__v")))
      .select(col(groupCol), microBin(col("__v"), bins, binWidthMicro).as("bin"))
      .groupBy(groupCol, "bin").agg(count(lit(1)).as("n"))
  }

  /** SEGMENTED [[numericShapeDrift]] — the binned scalar monitor per
    * group (source, shard, model-version…): per group the identical exact
    * chi-square over that group's own bin distribution (each group's
    * totals are its own t_a/t_b — a group is its own two-sample test).
    * Output: (group, bin, n_a, n_b, chi2_micro, rank), rank by
    * contribution within the group (ties → smaller bin); a group with
    * either side empty scores 0 everywhere (the per-group empty-side
    * convention). This closes the last asymmetry in the monitoring
    * matrix: token, embedding, and scalar monitors are all global AND
    * segmented, direct AND profile-served.
    *
    * Scale shape: the (group, bin) count aggregations key their own
    * exchanges and the full-outer join reuses that partitioning; the
    * per-group totals are a `groupBy(group)` aggregate BROADCAST back
    * under the LOUD `maxBroadcastGroups` in-plan guard (the
    * tokenDriftByGroup shape — scoring stays on the (group, bin)
    * partitioning), and the only group-keyed exchange is the rank window
    * over ≤ bins rows per group. */
  def numericShapeDriftByGroup(dfA: DataFrame, dfB: DataFrame,
      valueCol: String, groupCol: String, bins: Int = 16,
      binWidthMicro: Long = 31250000L,
      maxBroadcastGroups: Long = 1L << 22): DataFrame = {
    requireBinSpec(bins, binWidthMicro)
    require(groupCol != "bin" && groupCol != "n" && groupCol != "__v",
      s"groupCol collides with an internal column name: $groupCol")
    // ONE tagged-union (group, bin)-keyed aggregation for both sides —
    // see [[numericShapeDrift]]; NULL groups excluded as in
    // [[numericProfileByGroup]] (a null segment is not a segment)
    def side(df: DataFrame, a: Long, b: Long) = df
      .select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .where(col(groupCol).isNotNull &&
        col("__v").isNotNull && !isnan(col("__v")))
      .select(col(groupCol), microBin(col("__v"), bins, binWidthMicro).as("bin"),
        lit(a).as("__ca"), lit(b).as("__cb"))
    numericShapeDriftByGroupFromJoined(
      side(dfA, 1L, 0L).unionByName(side(dfB, 0L, 1L))
        .groupBy(groupCol, "bin")
        .agg(sum("__ca").as("n_a"), sum("__cb").as("n_b")),
      groupCol, maxBroadcastGroups)
  }

  /** [[numericShapeDriftByGroup]] computed from two STORED
    * [[numericProfileByGroup]] frames instead of the corpora — the
    * serving read of the segmented streaming scalar monitor: the
    * profile's per-(group, bin) n IS the count the direct route
    * aggregates, so the answer is IDENTICAL to running the drift over the
    * corpora the profiles summarize (spec- and oracle-asserted). Inputs
    * are re-aggregated by (group, bin) first, so concatenated partial
    * profiles are accepted. Cost: two (groups·bins)-bounded scans — the
    * corpora are never touched at serve time. */
  def numericShapeDriftByGroupFromProfiles(profA: DataFrame,
      profB: DataFrame, groupCol: String,
      maxBroadcastGroups: Long = 1L << 22): DataFrame =
    numericShapeDriftByGroupFromJoined(
      profA.select(col(groupCol), col("bin"),
          col("n").as("__ca"), lit(0L).as("__cb"))
        .unionByName(profB.select(col(groupCol), col("bin"),
          lit(0L).as("__ca"), col("n").as("__cb")))
        .groupBy(groupCol, "bin")
        .agg(sum("__ca").as("n_a"), sum("__cb").as("n_b")),
      groupCol, maxBroadcastGroups)

  /** Shared per-group chi-square tail of [[numericShapeDriftByGroup]] /
    * [[numericShapeDriftByGroupFromProfiles]] — one code path so the
    * direct and profile-served routes cannot drift; the grouped twin of
    * [[numericShapeDriftFromJoined]], carrying the same decimal(38,0)
    * headroom guard per group. Input: tagged-union (group, bin, n_a, n_b)
    * counts, non-null by construction. */
  private def numericShapeDriftByGroupFromJoined(joined0: DataFrame,
      groupCol: String,
      maxBroadcastGroups: Long): DataFrame = {
    import graft.core.TrackedCache.TrackedDataset
    require(maxBroadcastGroups >= 1,
      s"maxBroadcastGroups must be >= 1, got $maxBroadcastGroups")
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    // persisted ((groups·bins)-bounded): the totals aggregation and the
    // scoring join both read it
    val joined = joined0.persistTracked()
    // persisted (one row per group): the guard's count and the broadcast
    // rows both read it inside the one build
    val totals0 = joined.groupBy(groupCol)
      .agg(sum("n_a").as("t_a"), sum("n_b").as("t_b"))
      .persistTracked()
    val ngr = totals0.agg(count(lit(1)).as("__ng"))
    val totals = totals0.crossJoin(ngr)
      .select(col(groupCol),
        (col("t_a")
          + when(col("__ng") > maxBroadcastGroups,
            raise_error(concat(lit("numericShapeDriftByGroup: "), col("__ng"),
              lit(s" groups > maxBroadcastGroups=$maxBroadcastGroups — the " +
                "per-group totals broadcast one row per group; a group " +
                "column this wide is an id, not a segmentation — raise the " +
                "cap if the executors have the memory")))).otherwise(lit(0L))
          + when(dec(col("t_a")) * dec(col("t_b")) >= dec(lit(10000000000000000L)),
            raise_error(lit("numericShapeDriftByGroup: t_a·t_b ≥ 1e16 " +
              "exceeds the decimal(38,0) headroom of the exact chi-square " +
              "— pre-aggregate or subsample the sides"))).otherwise(lit(0L))
        ).as("t_a"),
        col("t_b"))
    val diff = dec(col("n_a")) * dec(col("t_b")) - dec(col("n_b")) * dec(col("t_a"))
    val contrib = when(col("t_a") === 0 || col("t_b") === 0, lit(0L))
      .otherwise(call_function("div",
        dec(lit(1000000L)) * diff * diff,
        (dec(col("n_a")) + dec(col("n_b"))) * dec(col("t_a")) * dec(col("t_b")))
        .cast("long"))
    val wr = Window.partitionBy(groupCol)
      .orderBy(col("chi2_micro").desc, col("bin").asc)
    joined.join(broadcast(totals), Seq(groupCol))
      .select(col(groupCol), col("bin"), col("n_a"), col("n_b"),
        contrib.as("chi2_micro"))
      .withColumn("rank", row_number().over(wr))
  }

  /** SEGMENTED [[ksDrift]] — one exact KS test per group in a single
    * pass, the scalar twin of `tokenDriftByGroup`/`embeddingDriftByGroup`:
    * per-source feature-drift dashboards read one frame instead of
    * looping groups. Output: (group, n_a, n_b, ks_micro, at_value), one
    * row per group seen on either side; a group absent from one side
    * scores 0. NULL groups are excluded (a null segment is not a
    * segment); NULL/NaN values are excluded as in the global form.
    *
    * Scale shape: the same two-level distributed prefix sum, range-keyed
    * on (group, value) — a group's cumulative never funnels into one task
    * however large its value set. The per-group totals and per-partition
    * offsets broadcast under a LOUD `maxBroadcastGroups` in-plan guard
    * (the family discipline: a group column that wide is an id, not a
    * segmentation). */
  def ksDriftByGroup(dfA: DataFrame, dfB: DataFrame, valueCol: String,
      groupCol: String, rangeParts: Int = 64,
      maxBroadcastGroups: Long = 1L << 22): DataFrame = {
    import graft.core.TrackedCache.TrackedDataset
    require(rangeParts >= 1, s"rangeParts must be >= 1, got $rangeParts")
    require(maxBroadcastGroups >= 1,
      s"maxBroadcastGroups must be >= 1, got $maxBroadcastGroups")
    require(groupCol != "__v" && groupCol != "__pid",
      s"groupCol collides with an internal column name: $groupCol")
    def side(df: DataFrame, ca: Long, cb: Long) = df
      .select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .where(col(groupCol).isNotNull &&
        col("__v").isNotNull && !isnan(col("__v")))
      .select(col(groupCol), col("__v"),
        lit(ca).as("__ca"), lit(cb).as("__cb"))
    val counts = side(dfA, 1L, 0L).unionByName(side(dfB, 0L, 1L))
      .groupBy(groupCol, "__v").agg(sum("__ca").as("a"), sum("__cb").as("b"))
    // persisted: partition-totals pass + scoring pass, as in ksDrift
    val ranged = counts
      .repartitionByRange(rangeParts, col(groupCol), col("__v"))
      .sortWithinPartitions(groupCol, "__v")
      .withColumn("__pid", spark_partition_id())
      .persistTracked()
    val ptot = ranged.groupBy(groupCol, "__pid")
      .agg(sum("a").as("pa"), sum("b").as("pb"))
    // per-group prefix over pids: ≤ rangeParts rows per group, group-keyed
    val wOff = Window.partitionBy(groupCol).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val poff = ptot.select(col(groupCol), col("__pid"),
      coalesce(sum("pa").over(wOff), lit(0L)).as("__offa"),
      coalesce(sum("pb").over(wOff), lit(0L)).as("__offb"))
    val tot0 = ptot.groupBy(groupCol)
      .agg(sum("pa").as("n_a"), sum("pb").as("n_b"))
    val ngr = tot0.agg(count(lit(1)).as("__ng"))
    val tot = tot0.crossJoin(ngr).select(col(groupCol),
      (col("n_a") + when(col("__ng") > maxBroadcastGroups,
        raise_error(concat(lit("ksDriftByGroup: "), col("__ng"),
          lit(s" groups > maxBroadcastGroups=$maxBroadcastGroups — the " +
            "per-group totals broadcast one row per group; a group column " +
            "this wide is an id, not a segmentation — raise the cap if " +
            "the executors have the memory")))).otherwise(lit(0L))).as("n_a"),
      col("n_b"))
    val wLoc = Window.partitionBy(col("__pid"), col(groupCol)).orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val cum = ranged.select(col(groupCol), col("__v"), col("__pid"),
      sum("a").over(wLoc).as("__la"), sum("b").over(wLoc).as("__lb"))
    val dev = cum.join(broadcast(poff), Seq(groupCol, "__pid"))
      .join(broadcast(tot), Seq(groupCol))
      .select(col(groupCol), col("__v"), col("n_a"), col("n_b"),
        abs(dec(col("__la") + col("__offa")) * dec(col("n_b")) -
            dec(col("__lb") + col("__offb")) * dec(col("n_a"))).as("__dev"))
    dev.groupBy(groupCol).agg(
        max(struct(col("__dev").as("d"), (-col("__v")).as("nv"))).as("m"),
        max("n_a").as("__na"), max("n_b").as("__nb"))
      .select(col(groupCol),
        col("__na").as("n_a"), col("__nb").as("n_b"),
        when(col("__na") === 0 || col("__nb") === 0, lit(0L))
          .otherwise(call_function("div",
            dec(lit(1000000L)) * col("m.d"),
            dec(col("__na")) * dec(col("__nb"))).cast("long")).as("ks_micro"),
        (-col("m.nv")).as("at_value"))
  }
}
