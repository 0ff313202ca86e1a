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

  test("numericProfile: additive, NULL/NaN excluded, clamped tails") {
    val a = Seq(Some(0.0), Some(10.0), Some(10.0), Some(1e9), Some(-1e9),
      None, Some(Double.NaN)).toDF("x")
    // width 31.25 units: 0 and 10 land in bin 0, 1e9 clamps to 7, -1e9 to -8
    val p = ops.Stats.numericProfile(a, "x")
      .as[(Long, Long)].collect().toMap
    assert(p == Map(0L -> 3L, 7L -> 1L, -8L -> 1L), s"got $p")
    // additivity: profile(A ∪ B) == profile(A) + profile(B)
    val b = Seq(5.0, 40.0, -40.0).toDF("x")
    val pa = ops.Stats.numericProfile(a, "x").as[(Long, Long)].collect().toMap
    val pb = ops.Stats.numericProfile(b, "x").as[(Long, Long)].collect().toMap
    val pu = ops.Stats.numericProfile(
      a.select(col("x")).unionByName(b.select(col("x"))), "x")
      .as[(Long, Long)].collect().toMap
    val added = (pa.keySet ++ pb.keySet).map(k =>
      k -> (pa.getOrElse(k, 0L) + pb.getOrElse(k, 0L))).toMap
    assert(pu == added, s"union $pu vs added $added")
  }

  test("numericShapeDrift: hand-computed bins; profile-served == direct; concatenated partials accepted") {
    val a = Seq(0.0, 10.0, 10.0, 40.0).toDF("x")   // bins: 0,0,0,1
    val b = Seq(0.0, 40.0, 40.0, 40.0).toDF("x")   // bins: 0,1,1,1
    val direct = ops.Stats.numericShapeDrift(a, b, "x")
      .orderBy("rank").as[(Long, Long, Long, Long, Int)].collect().toList
    // j: bin0 (3,1), bin1 (1,3); t_a=t_b=4
    // contrib(bin0) = 1e6*(3*4-1*4)^2/((3+1)*4*4) = 1e6*64/64 = 1000000
    // contrib(bin1) symmetric = 1000000; tie -> bin0 first
    assert(direct == List((0L, 3L, 1L, 1000000L, 1), (1L, 1L, 3L, 1000000L, 2)),
      s"got $direct")
    val served = ops.Stats.numericShapeDriftFromProfiles(
      ops.Stats.numericProfile(a, "x"), ops.Stats.numericProfile(b, "x"))
      .orderBy("rank").as[(Long, Long, Long, Long, Int)].collect().toList
    assert(served == direct, s"served $served vs direct $direct")
    // concatenated partial profiles re-aggregate before scoring
    val aHalf1 = Seq(0.0, 10.0).toDF("x")
    val aHalf2 = Seq(10.0, 40.0).toDF("x")
    val concat = ops.Stats.numericShapeDriftFromProfiles(
      ops.Stats.numericProfile(aHalf1, "x")
        .unionByName(ops.Stats.numericProfile(aHalf2, "x")),
      ops.Stats.numericProfile(b, "x"))
      .orderBy("rank").as[(Long, Long, Long, Long, Int)].collect().toList
    assert(concat == direct, s"concat $concat vs direct $direct")
    // an empty side scores 0 everywhere
    val empty = Seq.empty[Double].toDF("x")
    val z = ops.Stats.numericShapeDrift(a, empty, "x")
      .as[(Long, Long, Long, Long, Int)].collect()
    assert(z.nonEmpty && z.forall(_._4 == 0L), s"got ${z.toList}")
  }

  test("maxBroadcastGroups guard fires by name") {
    val a = Seq(("g1", 1.0), ("g2", 2.0)).toDF("g", "x")
    val e = intercept[Exception] {
      ops.Stats.ksDriftByGroup(a, a, "x", "g", maxBroadcastGroups = 1L)
        .collect()
    }
    assert(e.getMessage.contains("ksDriftByGroup"), e.getMessage)
  }

  test("numericShapeDriftByGroup: each group is its own two-sample test; stable group 0; one-side-empty group 0; guard by name") {
    // g1 is the global hand case verbatim within its own totals; g2 is
    // distribution-stable; g3 exists only on side A -> all 0 by the
    // per-group empty-side convention
    val a = Seq(("g1", 0.0), ("g1", 10.0), ("g1", 10.0), ("g1", 40.0),
      ("g2", 5.0), ("g2", 5.0), ("g3", 7.0)).toDF("g", "x")
    val b = Seq(("g1", 0.0), ("g1", 40.0), ("g1", 40.0), ("g1", 40.0),
      ("g2", 5.0), ("g2", 5.0)).toDF("g", "x")
    val out = ops.Stats.numericShapeDriftByGroup(a, b, "x", "g")
      .orderBy("g", "rank")
      .as[(String, Long, Long, Long, Long, Int)].collect().toList
    val g1 = out.filter(_._1 == "g1").map(r => (r._2, r._3, r._4, r._5, r._6))
    assert(g1 == List((0L, 3L, 1L, 1000000L, 1), (1L, 1L, 3L, 1000000L, 2)),
      s"g1 must reproduce the global hand case within its own totals: $g1")
    assert(out.filter(_._1 == "g2").forall(_._5 == 0L), "stable group scores 0")
    assert(out.filter(_._1 == "g3").forall(_._5 == 0L),
      "one-side-empty group is 0 by convention, per group")
    // the totals-broadcast contract fires loudly, by name
    val e = intercept[Exception] {
      ops.Stats.numericShapeDriftByGroup(a, b, "x", "g",
        maxBroadcastGroups = 1L).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("maxBroadcastGroups"), s"guard must fail by name: $msg")
  }

  test("numericShapeDriftByGroupFromProfiles: profile-served == direct, bit-identical; concatenated partials accepted") {
    val a = Seq(("g1", 0.0), ("g1", 10.0), ("g1", 10.0), ("g1", 40.0),
      ("g2", 5.0), ("g2", 90.0)).toDF("g", "x")
    val b = Seq(("g1", 0.0), ("g1", 40.0), ("g1", 40.0), ("g1", 40.0),
      ("g2", 5.0), ("g2", 5.0)).toDF("g", "x")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("g", "rank")
      .as[(String, Long, Long, Long, Long, Int)].collect().toList
    val direct = rows(ops.Stats.numericShapeDriftByGroup(a, b, "x", "g"))
    val served = rows(ops.Stats.numericShapeDriftByGroupFromProfiles(
      ops.Stats.numericProfileByGroup(a, "x", "g"),
      ops.Stats.numericProfileByGroup(b, "x", "g"), "g"))
    assert(served.nonEmpty && served == direct,
      s"served $served vs direct $direct")
    // concatenated partial profiles re-aggregate before scoring
    val aHalf1 = Seq(("g1", 0.0), ("g1", 10.0), ("g2", 5.0)).toDF("g", "x")
    val aHalf2 = Seq(("g1", 10.0), ("g1", 40.0), ("g2", 90.0)).toDF("g", "x")
    val concat = rows(ops.Stats.numericShapeDriftByGroupFromProfiles(
      ops.Stats.numericProfileByGroup(aHalf1, "x", "g")
        .unionByName(ops.Stats.numericProfileByGroup(aHalf2, "x", "g")),
      ops.Stats.numericProfileByGroup(b, "x", "g"), "g"))
    assert(concat == direct, s"concat $concat vs direct $direct")
    // per-group profile additivity: profile(A ∪ B) == profile(A) + profile(B)
    val pa = ops.Stats.numericProfileByGroup(a, "x", "g")
      .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val pb = ops.Stats.numericProfileByGroup(b, "x", "g")
      .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val pu = ops.Stats.numericProfileByGroup(a.unionByName(b), "x", "g")
      .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val added = (pa.keySet ++ pb.keySet).map(k =>
      k -> (pa.getOrElse(k, 0L) + pb.getOrElse(k, 0L))).toMap
    assert(pu == added, s"union $pu vs added $added")
  }
}
