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
}
