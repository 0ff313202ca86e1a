package graft

import org.apache.spark.sql.functions._

/** Accuracy of the approximate aggregates (q21 is rows-only in the oracle
  * gate because approx values are engine-specific; the accuracy contract
  * lives here instead, against exact values). */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact; percentile_approx near exact median") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val (approxD, exactD, approxMed, exactMed) = li.agg(
      approx_count_distinct(col("l_partkey")).as("ad"),
      countDistinct(col("l_partkey")).as("ed"),
      percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("am"),
      expr("median(l_quantity)").as("em"))
      .as[(Long, Long, Double, Double)].head()
    assert(math.abs(approxD - exactD).toDouble / exactD < 0.05,
      s"HLL too far off: $approxD vs $exactD")
    assert(math.abs(approxMed - exactMed) <= 1.0,
      s"approx median too far off: $approxMed vs $exactMed")
  }

  test("histogramPercentile matches the interpreted percentile() bit-for-bit") {
    val li = Tables.load(spark, sfDir, "lineitem")
    Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0).foreach { p =>
      val hp = graft.ops.Stats.histogramPercentile(li, "l_quantity", p)
        .as[Double].head()
      val ref = li.agg(expr(s"percentile(l_quantity, $p)")).as[Double].head()
      assert(hp == ref, s"p=$p: histogram $hp vs percentile() $ref")
    }
    // odd/even small frames exercise both interpolation branches
    val odd = Seq(3.0, 1.0, 2.0).toDF("v")
    assert(graft.ops.Stats.histogramPercentile(odd, "v", 0.5).as[Double].head() == 2.0)
    val even = Seq(1.0, 2.0, 3.0, 10.0).toDF("v")
    assert(graft.ops.Stats.histogramPercentile(even, "v", 0.5).as[Double].head() == 2.5)
    // duplicates spanning the pick
    val dup = Seq(1.0, 2.0, 2.0, 2.0, 9.0).toDF("v")
    assert(graft.ops.Stats.histogramPercentile(dup, "v", 0.5).as[Double].head() == 2.0)
  }

  test("histogram-percentile family fails loudly past the cardinality bound") {
    // a "continuous" column: every value distinct — exactly the case where
    // the exact histogram silently becomes a row-sized shuffle
    val cont = spark.range(1000).select((col("id") + 0.5).as("v"))
    val e = intercept[Exception](
      graft.ops.Stats.histogramPercentile(cont, "v", 0.5, maxDistinct = 100)
        .as[Double].head())
    assert(e.getMessage.contains("distinct values"), e.getMessage)
    // grouped form guards PER GROUP
    val grouped = spark.range(1000).select((col("id") % 2).as("g"), (col("id") + 0.5).as("v"))
    val eg = intercept[Exception](
      graft.ops.Stats.groupedHistogramPercentiles(grouped, "g", "v", Seq(0.5), maxDistinct = 100)
        .collect())
    assert(eg.getMessage.contains("distinct values"), eg.getMessage)
    val ew = intercept[Exception](
      graft.ops.Stats.winsorize(cont, "v", 0.05, 0.95, maxDistinct = 100).collect())
    assert(ew.getMessage.contains("distinct values"), ew.getMessage)
    // within the bound the same shapes still answer
    assert(graft.ops.Stats.histogramPercentile(cont, "v", 0.5, maxDistinct = 1000)
      .as[Double].head() == 500.0)
  }

  test("exactPercentileUnbounded matches percentile() bit-for-bit on a continuous column") {
    // every value distinct — the case the histogram family's guard REJECTS;
    // force tiny narrowing parameters so the test exercises multiple
    // histogram rounds AND the residual TakeOrdered path, across partitions
    val cont = spark.range(997).repartition(7)
      .select((pmod(col("id") * 7919, lit(997)).cast("double") / 3.0 + 0.125).as("v"))
    Seq(0.0, 0.25, 0.5, 0.739, 0.75, 1.0).foreach { p =>
      val got = graft.ops.Stats.exactPercentileUnbounded(cont, "v", p,
        nBins = 4, maxResidual = 8, maxSortRows = 8).as[Double].head()
      val ref = cont.agg(expr(s"percentile(v, $p)")).as[Double].head()
      assert(got == ref, s"p=$p: rank-select $got vs percentile() $ref")
    }
    // the real fixture column, default parameters
    val li = Tables.load(spark, sfDir, "lineitem")
    val multi = graft.ops.Stats.exactPercentilesUnbounded(li, "l_extendedprice",
      Seq(0.25, 0.5, 0.75)).head()
    val refs = li.agg(expr("percentile(l_extendedprice, 0.25)"),
      expr("percentile(l_extendedprice, 0.5)"),
      expr("percentile(l_extendedprice, 0.75)")).head()
    (0 until 3).foreach(i => assert(multi.getDouble(i) == refs.getDouble(i),
      s"col $i: ${multi.getDouble(i)} vs ${refs.getDouble(i)}"))
  }

  test("exactPercentileUnbounded edge cases: constants, duplicates, n=1, NULLs, empty") {
    val S = graft.ops.Stats
    // constant column: range collapses on the first round
    val const = Seq.fill(50)(7.25).toDF("v").repartition(5)
    assert(S.exactPercentileUnbounded(const, "v", 0.5, nBins = 4, maxResidual = 2)
      .as[Double].head() == 7.25)
    // heavy duplicates around the pick + NULL exclusion
    val dup = (Seq.fill(40)(Some(2.0)) ++ Seq(Some(1.0), Some(9.0), None)).toDF("v")
    assert(S.exactPercentileUnbounded(dup, "v", 0.5, nBins = 4, maxResidual = 4)
      .as[Double].head() == 2.0)
    assert(S.exactPercentileUnbounded(Seq(42.0).toDF("v"), "v", 0.73)
      .as[Double].head() == 42.0)
    // empty input -> empty frame (not a NaN row)
    assert(S.exactPercentileUnbounded(Seq.empty[Double].toDF("v"), "v", 0.5).count() == 0L)
    // interpolated even-count pick, residual path
    val even = Seq(1.0, 2.0, 3.0, 10.0).toDF("v")
    assert(S.exactPercentileUnbounded(even, "v", 0.5).as[Double].head() == 2.5)
    // the MULTI form's labeled columns reject mislabel-able percentiles
    // (the single form's output is always "percentile", so any p is fine —
    // asserted by the 0.739 case above)
    val e = intercept[IllegalArgumentException](
      S.exactPercentilesUnbounded(even, "v", Seq(0.999)))
    assert(e.getMessage.contains("whole-percent"), e.getMessage)
    assert(S.exactPercentileUnbounded(even, "v", 0.999).as[Double].head() ==
      even.agg(expr("percentile(v, 0.999)")).as[Double].head())
  }

  test("optimistic one-job sort tier: a lying-low size estimate trips the in-plan guard and falls back") {
    val S = graft.ops.Stats
    // explode multiplies rows 40x but Catalyst's size-only stats don't see
    // it (estimate 200 B for 2000 rows): the optimistic single-action tier
    // opens, its in-plan cap guard fires mid-job, and the head-first tiers
    // (here: narrowing) take over and still answer bit-for-bit
    val blown = spark.range(50)
      .select(explode(array((0 until 40).map(i => lit(i * 0.75)): _*)).as("v"))
    val est = blown.where(col("v").isNotNull).select(col("v").as("__v"))
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(est <= 8L * 64, s"precondition: estimate $est must open the 64-row gate")
    val got = S.exactPercentileUnbounded(blown, "v", 0.5,
      nBins = 4, maxResidual = 8, maxSortRows = 64).as[Double].head()
    val ref = blown.agg(expr("percentile(v, 0.5)")).as[Double].head()
    assert(got == ref, s"fallback diverged: $got vs $ref")
  }

  test("exact percentile families return an equal ±Infinity bracket, not 0·(Inf−Inf)=NaN") {
    val S = graft.ops.Stats
    // [1.0, +Inf], p=1.0: both brackets are +Inf — percentile() returns
    // +Inf via its equal-index shortcut; the naive interpolation form
    // yields Inf + 0*(Inf-Inf) = NaN. Exercise the sort tier, the
    // head-first tier, and the grouped forms.
    val vs = Seq(1.0, Double.PositiveInfinity).toDF("v")
    val ref = vs.agg(expr("percentile(v, 1.0)"), expr("percentile(v, 0.0)")).head()
    Seq(1L << 22, 1L).foreach { sortCap => // force both tiers
      val row = S.exactPercentilesUnbounded(vs, "v", Seq(1.0, 0.0),
        nBins = 4, maxResidual = 4, maxSortRows = sortCap).head()
      assert(row.getDouble(0) == ref.getDouble(0) && row.getDouble(0).isPosInfinity,
        s"sortCap=$sortCap: ${row.getDouble(0)}")
      assert(row.getDouble(1) == 1.0)
    }
    val neg = Seq(Double.NegativeInfinity, Double.NegativeInfinity, 2.0).toDF("v")
    assert(S.exactPercentilesUnbounded(neg, "v", Seq(0.25), nBins = 4,
      maxResidual = 4).head().getDouble(0).isNegInfinity)
    val g = Seq(("a", 1.0), ("a", Double.PositiveInfinity), ("b", 2.0)).toDF("g", "v")
    val gOut = S.groupedSortPercentiles(g, "g", "v", Seq(1.0))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gOut("a").isPosInfinity && gOut("b") == 2.0)
    val gOut2 = S.groupedExactPercentilesUnbounded(g, "g", "v", Seq(1.0),
        nBins = 4, maxResidual = 1, maxGroups = 10, maxSortGroup = 1L)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gOut2("a").isPosInfinity && gOut2("b") == 2.0)
  }

  test("exact percentile families follow percentile()'s NaN-sorts-last rule") {
    val S = graft.ops.Stats
    // 3 finite + 2 NaN: ranks 3,4 are NaN; p0.5 (k=2) hits finite 3.0,
    // p1.0 hits NaN, p0.75 (k=3) interpolates finite->NaN = NaN — exactly
    // percentile()'s double-ordering behavior, which the narrowing loop
    // would otherwise never converge on (NaN poisons min/max and bins)
    val vs = Seq(1.0, 3.0, 2.0, Double.NaN, Double.NaN).toDF("v")
    val row = S.exactPercentilesUnbounded(vs, "v", Seq(0.5, 0.75, 1.0),
      nBins = 4, maxResidual = 2, maxSortRows = 2).head()
    val ref = vs.agg(expr("percentile(v, 0.5)"), expr("percentile(v, 0.75)"),
      expr("percentile(v, 1.0)")).head()
    assert(row.getDouble(0) == ref.getDouble(0))
    assert(row.getDouble(1).isNaN == ref.getDouble(1).isNaN && row.getDouble(1).isNaN)
    assert(row.getDouble(2).isNaN && ref.getDouble(2).isNaN)
    // all-NaN column: every percentile is NaN, no convergence failure
    val allNaN = Seq(Double.NaN, Double.NaN).toDF("v")
    assert(S.exactPercentilesUnbounded(allNaN, "v", Seq(0.5)).head().getDouble(0).isNaN)
    // grouped form, both tiers, checked against percentile() itself
    val g = Seq(("a", 1.0), ("a", Double.NaN), ("a", 5.0), ("b", Double.NaN))
      .toDF("g", "v")
    val gref = g.groupBy("g")
      .agg(expr("percentile(v, 0.5)"), expr("percentile(v, 1.0)"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    Seq(1L << 22, 1L).foreach { sortCap =>
      val out = S.groupedExactPercentilesUnbounded(g, "g", "v", Seq(0.5, 1.0),
        nBins = 4, maxResidual = 1, maxGroups = 10, maxSortGroup = sortCap)
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      def eqOrBothNaN(a: Double, b: Double) = a == b || (a.isNaN && b.isNaN)
      Seq("a", "b").foreach { k =>
        assert(eqOrBothNaN(out(k)._1, gref(k)._1) && eqOrBothNaN(out(k)._2, gref(k)._2),
          s"cap $sortCap group $k: ${out(k)} vs ${gref(k)}")
      }
    }
  }

  test("groupedExactPercentilesUnbounded matches per-group percentile() bit-for-bit") {
    val S = graft.ops.Stats
    // continuous values, several groups, a NULL group, NULL values, forced
    // multi-round narrowing AND residual ranking via tiny parameters
    val df = spark.range(900).repartition(5).select(
      when(col("id") % 4 === 3, lit(null).cast("string"))
        .otherwise(concat(lit("g"), col("id") % 4)).as("g"),
      when(col("id") % 97 === 0, lit(null).cast("double"))
        .otherwise(pmod(col("id") * 7919, lit(997)).cast("double") / 7.0).as("v"))
    // maxSortGroup = maxResidual forces the NARROWING tier (every group is
    // beyond-task for the test) — rounds + residual ranking both exercised
    val got = S.groupedExactPercentilesUnbounded(df, "g", "v",
      Seq(0.25, 0.5, 0.9), nBins = 4, maxResidual = 8, maxSortGroup = 8)
      .collect().map(r => Option(r.getString(0)) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val ref = df.where(col("v").isNotNull).groupBy("g").agg(
      expr("percentile(v, 0.25)"), expr("percentile(v, 0.5)"), expr("percentile(v, 0.9)"))
      .collect().map(r => Option(r.getString(0)) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (g, v) => assert(v == ref(g), s"group $g: $v vs ${ref(g)}") }
    // the default SORT tier answers identically (two actions, one window)
    val gotSort = S.groupedExactPercentilesUnbounded(df, "g", "v",
      Seq(0.25, 0.5, 0.9))
      .collect().map(r => Option(r.getString(0)) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(gotSort == got, s"sort tier diverged: $gotSort vs $got")
    // ... and so does the fully-lazy single-exchange form (incl. NaN sorts
    // last: add NaN rows and re-check against percentile() directly)
    val lazySort = S.groupedSortPercentiles(df, "g", "v", Seq(0.25, 0.5, 0.9))
      .collect().map(r => Option(r.getString(0)) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(lazySort == got, s"lazy sort form diverged: $lazySort vs $got")
    val withNaN = df.withColumn("v",
      when(col("v") > 100, lit(Double.NaN)).otherwise(col("v")))
    val lzN = S.groupedSortPercentiles(withNaN, "g", "v", Seq(0.5, 0.9))
      .collect().map(r => Option(r.getString(0)) -> (r.getDouble(1), r.getDouble(2))).toMap
    val refN = withNaN.where(col("v").isNotNull).groupBy("g")
      .agg(expr("percentile(v, 0.5)"), expr("percentile(v, 0.9)"))
      .collect().map(r => Option(r.getString(0)) -> (r.getDouble(1), r.getDouble(2))).toMap
    def eqn(a: Double, b: Double) = a == b || (a.isNaN && b.isNaN)
    refN.foreach { case (g, (a, b)) =>
      assert(eqn(lzN(g)._1, a) && eqn(lzN(g)._2, b), s"$g: ${lzN(g)} vs ($a,$b)") }
    // heavy duplicate values: the lazy form derives each group's size from
    // fwd-rank + rev-rank − 1, which only holds when the two window orders
    // are exact reverse permutations — ties would break a bare row_number
    // pair, so this pins the unique-tiebreaker discipline
    val tied = spark.range(1200).repartition(7).select(
      (col("id") % 3).cast("string").as("g"),
      (col("id") % 5).cast("double").as("v"))
    val gotTied = S.groupedSortPercentiles(tied, "g", "v", Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val refTied = tied.groupBy("g").agg(
      expr("percentile(v, 0.25)"), expr("percentile(v, 0.5)"), expr("percentile(v, 0.75)"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(gotTied == refTied, s"ties broke the two-rank identity: $gotTied vs $refTied")
    // the in-plan cap guard fires loudly on a beyond-task group
    val eg = intercept[Exception](
      S.groupedSortPercentiles(df, "g", "v", Seq(0.5), maxSortGroup = 10).collect())
    assert(eg.getMessage.contains("beyond-task") ||
      Option(eg.getCause).exists(_.getMessage.contains("beyond-task")), eg.getMessage)
    // real fixture column, default parameters
    val li = Tables.load(spark, sfDir, "lineitem")
    val m = graft.ops.Stats.groupedExactPercentilesUnbounded(
      li, "l_returnflag", "l_extendedprice", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val rm = li.groupBy("l_returnflag").agg(expr("percentile(l_extendedprice, 0.5)"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m == rm, s"$m vs $rm")
    // group-cardinality guard fires loudly
    val wide = spark.range(100).select(col("id").cast("string").as("g"),
      col("id").cast("double").as("v"))
    val e = intercept[IllegalArgumentException](
      S.groupedExactPercentilesUnbounded(wide, "g", "v", Seq(0.5), maxGroups = 10))
    assert(e.getMessage.contains("groups"), e.getMessage)
  }

  test("q21 bounds-booleans hold and the plan avoids the value-buffering shapes") {
    val row = SparkEntry.queries("q21_approx_agg")(spark, sfDir).head()
    assert(row.getLong(0) > 0)
    assert(row.getBoolean(1), s"approx_parts_ok false: $row")
    assert(row.getBoolean(2), s"approx_median_ok false: $row")
  }
}
