package graft

import org.apache.spark.sql.functions._

/** Exact two-sample Kolmogorov–Smirnov drift (Stats.ksDrift /
  * ksDriftByGroup): hand-computed statistic, partitioning invariance of
  * the two-level distributed prefix sum, NULL/NaN exclusion, the
  * absent-side convention, and the grouped route's equivalence to
  * per-group global calls. */
class KsDriftSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed KS: A=[1,2,3] B=[2,3,4,4] -> D=6/12 at v=3") {
    val a = Seq(1.0, 2.0, 3.0).toDF("x")
    val b = Seq(2.0, 3.0, 4.0, 4.0).toDF("x")
    val r = ops.Stats.ksDrift(a, b, "x")
      .as[(Long, Long, Long, Double)].head()
    // cumA=[1,2,3,3], cumB=[0,1,2,4]; dev = |cumA*4 - cumB*3| = [4,5,6,0]
    assert(r == ((3L, 4L, 500000L, 3.0)), s"got $r")
  }

  test("identical inputs score 0; at_value is the smallest value") {
    val a = Seq(5.0, 1.0, 3.0).toDF("x")
    val r = ops.Stats.ksDrift(a, a, "x").as[(Long, Long, Long, Double)].head()
    assert(r == ((3L, 3L, 0L, 1.0)), s"got $r")
  }

  test("partitioning invariance: rangeParts 1 == 7 == 64 on events") {
    val ev = Tables.load(spark, sfDir, "events")
    val a = ev.filter(col("user_id") % 2 === 0)
    val b = ev.filter(col("user_id") % 2 === 1)
    val rs = Seq(1, 7, 64).map(p =>
      ops.Stats.ksDrift(a, b, "value", rangeParts = p)
        .as[(Long, Long, Long, Double)].head())
    assert(rs.distinct.size == 1, s"parts-dependent answers: $rs")
    assert(rs.head._3 > 0 || rs.head._1 == 0) // a real statistic came out
  }

  test("NULL and NaN rows are excluded on both sides") {
    val a = Seq(Some(1.0), Some(2.0), Some(3.0), None, Some(Double.NaN))
      .toDF("x")
    val b = Seq(Some(2.0), Some(3.0), Some(4.0), Some(4.0), None,
      Some(Double.NaN)).toDF("x")
    val r = ops.Stats.ksDrift(a, b, "x").as[(Long, Long, Long, Double)].head()
    assert(r == ((3L, 4L, 500000L, 3.0)), s"got $r")
  }

  test("an empty side scores 0 (the family's absent-side convention)") {
    val a = Seq(1.0, 2.0).toDF("x")
    val empty = Seq.empty[Double].toDF("x")
    val r = ops.Stats.ksDrift(a, empty, "x")
      .as[(Long, Long, Long, Double)].head()
    assert(r._1 == 2L && r._2 == 0L && r._3 == 0L, s"got $r")
    // empty-both: still one row, ks 0, no at_value to report
    val r2 = ops.Stats.ksDrift(empty, empty, "x")
      .as[(Long, Long, Long, Option[Double])].head()
    assert(r2 == ((0L, 0L, 0L, None)), s"got $r2")
  }

  test("grouped route == per-group global calls on events; NULL group excluded") {
    val ev = Tables.load(spark, sfDir, "events")
    val a = ev.filter(col("user_id") % 2 === 0)
    val b = ev.filter(col("user_id") % 2 === 1)
    val grouped = ops.Stats.ksDriftByGroup(a, b, "value", "event_type")
      .orderBy("event_type")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(grouped.nonEmpty)
    grouped.foreach { case (g, na, nb, ks, at) =>
      val r = ops.Stats.ksDrift(
        a.filter(col("event_type") === g), b.filter(col("event_type") === g),
        "value").as[(Long, Long, Long, Double)].head()
      assert(r == ((na, nb, ks, at)), s"group $g: grouped ($na,$nb,$ks,$at) vs global $r")
    }
    // a null-group row changes nothing
    val aPlus = a.select(col("event_type"), col("value"), col("user_id"))
      .unionByName(Seq((null.asInstanceOf[String], 123.0, 0L))
        .toDF("event_type", "value", "user_id"))
    val g2 = ops.Stats.ksDriftByGroup(aPlus, b, "value", "event_type")
      .orderBy("event_type")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(g2.toSeq == grouped.toSeq, "null group leaked into the answer")
  }

  test("grouped partitioning invariance: rangeParts 1 == 5 == 64") {
    val ev = Tables.load(spark, sfDir, "events")
    val a = ev.filter(col("user_id") % 2 === 0)
    val b = ev.filter(col("user_id") % 2 === 1)
    val rs = Seq(1, 5, 64).map(p =>
      ops.Stats.ksDriftByGroup(a, b, "value", "event_type", rangeParts = p)
        .orderBy("event_type")
        .as[(String, Long, Long, Long, Double)].collect().toSeq)
    assert(rs.distinct.size == 1, "parts-dependent grouped answers")
  }

  test("maxBroadcastGroups guard fires by name") {
    val a = Seq(("g1", 1.0), ("g2", 2.0)).toDF("g", "x")
    val e = intercept[Exception] {
      ops.Stats.ksDriftByGroup(a, a, "x", "g", maxBroadcastGroups = 1L)
        .collect()
    }
    assert(e.getMessage.contains("ksDriftByGroup"), e.getMessage)
  }
}
