package graft

import graft.core.{FeatureDef, FeatureGraph, Versioning}
import graft.ops.{Dedup, SkewJoin}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY §5): hash stability, jaccard bounds, fingerprint
  * laws — ScalaCheck generators driven explicitly (the scalatest-scalacheck
  * bridge artifact isn't in the offline cache). */
class PropertySpec extends AnyFunSuite {

  /** Run `body` over `n` generated samples with deterministic seeds. */
  private def forAllSamples[A](gen: Gen[A], n: Int = 50)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  test("viterbiPieces: reconstruction, vocab membership, length bound, coverage law") {
    val genWord = Gen.listOfN(8, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    forAllSamples(genWord, 100) { w =>
      // vocab: all single chars (coverage) + every 2..4-substring of w with
      // a deterministic pseudo-probability
      val subs = (for (i <- 0 until w.length; l <- 2 to math.min(4, w.length - i))
        yield w.substring(i, i + l)).distinct
      val q: Map[String, Long] =
        (Seq("a", "b", "c").map(c => c -> (1000L + c.hashCode % 97)) ++
          subs.map(p => p -> (1L + math.abs((w + p).hashCode) % 1048575L))).toMap
      val pieces = graft.ops.TextOps.viterbiPieces(w, q, 4)
      assert(pieces.mkString == w, s"'$w' -> $pieces does not reconstruct")
      assert(pieces.forall(q.contains), s"'$w' -> $pieces uses unknown pieces")
      assert(pieces.forall(p => p.nonEmpty && p.length <= 4))
      // with single-char coverage the segmentation always exists
      assert(pieces.nonEmpty || w.isEmpty)
      // removing coverage for a char present in w makes the word unreachable
      if (w.contains('a')) {
        val q2 = q.view.filterKeys(p => !p.contains('a')).toMap
        assert(graft.ops.TextOps.viterbiPieces(w, q2, 4) == Nil)
      }
    }
  }

  test("u8cmp preserves codepoint order (the UTF-8 order law, incl. supplementary planes)") {
    val genCp = Gen.frequency(
      (4, Gen.choose(0x20, 0x7e)),          // ASCII
      (2, Gen.choose(0xa0, 0xffff)),        // BMP
      (1, Gen.choose(0x10000, 0x10ffff)))   // supplementary
      .suchThat(cp => cp < 0xd800 || cp > 0xdfff)
    val genStr = Gen.listOfN(4, genCp)
      .map(cps => cps.flatMap(Character.toChars(_)).mkString)
    forAllSamples(Gen.zip(genStr, genStr), 200) { case (a, b) =>
      val byByte = Integer.signum(graft.ops.TextOps.u8cmp(a, b))
      val cpsA = a.codePoints().toArray.toSeq
      val cpsB = b.codePoints().toArray.toSeq
      val byCp = Integer.signum(
        Ordering.Implicits.seqOrdering[Seq, Int].compare(cpsA, cpsB))
      assert(byByte == byCp, s"'$a' vs '$b': byte $byByte, codepoint $byCp")
      // and it disagrees with UTF-16-unit order exactly where Java would
      // missort supplementary characters — the reason the engine never uses
      // String.compareTo for ranking
    }
  }

  test("planBands: divisor contract, error-optimality, monotone strictness in threshold") {
    def scurve(b: Int, r: Int, s: Double) =
      1 - math.pow(1 - math.pow(s, r.toDouble), b.toDouble)
    def err(b: Int, r: Int, t: Double): Double = {
      val n = 1000
      (0 until n).map { i =>
        val s = (i + 0.5) / n
        if (s < t) scurve(b, r, s) else 1 - scurve(b, r, s)
      }.sum / n
    }
    for (nh <- Seq(12, 16, 24, 60); t <- Seq(0.2, 0.4, 0.5, 0.7, 0.9)) {
      val (b, r) = Dedup.planBands(t, nh)
      assert(b * r == nh, s"($b,$r) must factor $nh")
      // optimal among ALL divisor pairs (independent re-derivation)
      val all = (1 to nh).filter(nh % _ == 0).map(bb => (bb, nh / bb))
      val best = all.map { case (bb, rr) => err(bb, rr, t) }.min
      assert(math.abs(err(b, r, t) - best) < 1e-12,
        s"t=$t nh=$nh: planBands picked ($b,$r) err=${err(b, r, t)} vs best $best")
      // crossover sits on the correct side-ish of the threshold: the
      // S-curve at t is between 5% and 95% (a degenerate all-or-nothing
      // plan would pin it to 0 or 1)
      val p = scurve(b, r, t)
      assert(p > 0.05 && p < 0.95, s"t=$t nh=$nh ($b,$r): curve at t = $p")
    }
    // stricter threshold => at least as many rows per band (monotone dial)
    val rows = Seq(0.2, 0.5, 0.8).map(t => Dedup.planBands(t, 24)._2)
    assert(rows == rows.sorted, s"rows per band must grow with threshold: $rows")
    intercept[IllegalArgumentException](Dedup.planBands(0.0, 12))
    intercept[IllegalArgumentException](Dedup.planBands(0.5, 1))
  }

  test("hashCoeffs are deterministic, odd multipliers, within [1, P)") {
    val a = Dedup.hashCoeffs(64); val b = Dedup.hashCoeffs(64)
    assert(a == b)
    assert(a.forall { case (m, c) => m % 2 == 1 && m > 0 && m < Dedup.P && c > 0 && c < Dedup.P })
    assert(a.map(_._1).distinct.size == 64, "multipliers must not repeat")
  }

  test("pipeline fingerprint: permutation-invariant, injective on code version") {
    forAllSamples(Gen.listOfN(5, Gen.alphaNumStr.suchThat(_.nonEmpty))) { ups =>
      val f1 = Versioning.pipelineFingerprint("v1", ups)
      val f2 = Versioning.pipelineFingerprint("v1", scala.util.Random.shuffle(ups))
      assert(f1 == f2)
      assert(f1 != Versioning.pipelineFingerprint("v2", ups))
    }
  }

  test("FeatureGraph topo order respects dependencies and rejects cycles") {
    def fd(n: String) = FeatureDef(n, Seq("k"), "v1", identity)
    val g = FeatureGraph(
      Seq(fd("c"), fd("a"), fd("b")),
      deps = Map("c" -> Seq("b"), "b" -> Seq("a")))
    assert(g.topoOrder.map(_.name) == Seq("a", "b", "c"))
    val cyc = FeatureGraph(Seq(fd("x"), fd("y")), deps = Map("x" -> Seq("y"), "y" -> Seq("x")))
    intercept[IllegalArgumentException](cyc.topoOrder)
  }
}

/** Spark-backed property-style checks (shared session). */
class SparkPropertySpec extends SparkSpec {
  import spark.implicits._

  test("record hash: permutation of rows/columns never changes per-row hashes") {
    val feature = FeatureDef("f", Seq("id"), "v1", identity)
    val data = (1 to 50).map(i => (i.toLong, s"s$i", i * 1.5))
    val base = Versioning.withSystemColumns(data.toDF("id", "s", "d"), feature)
      .select("id", Versioning.DataHashCol).as[(Long, Long)].collect().toMap
    val shuffled = Versioning.withSystemColumns(
      scala.util.Random.shuffle(data).toDF("id", "s", "d").select("d", "s", "id"), feature)
      .select("id", Versioning.DataHashCol).as[(Long, Long)].collect().toMap
    assert(base == shuffled)
  }

  test("reservoir sampler: bounded == window form on inputs with DUPLICATED (group, id) rows") {
    // duplicate ids stress the eviction boundary: a pair exactly equal to
    // the heap top must be kept or dropped exactly as multiset-k-smallest
    // semantics demand — the window form (row_number over draw, id) is the
    // ground truth. Generated multisets draw ids from a SMALL range so
    // duplicates (2x, 3x copies) are common at every k boundary.
    import graft.ops.Stats
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      nRows <- Gen.chooseNum(1, 40)
      ids <- Gen.listOfN(nRows, Gen.chooseNum(0L, 12L))  // heavy duplication
      k <- Gen.chooseNum(1, 6)
    } yield (ids, k)
    (0 until 12).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { case (ids, k) =>
        val df = ids.zipWithIndex.map { case (id, j) => (id, s"g${j % 2}") }
          .toDF("id", "grp").repartition(5)
        def rows(d: org.apache.spark.sql.DataFrame) =
          d.select("grp", "id", "sample_rank").as[(String, Long, Int)]
            .collect().sorted.toList
        val win = rows(Stats.stratifiedSample(df, "grp", "id", n = k))
        val bounded = rows(Stats.stratifiedSampleBounded(df, "grp", "id", n = k))
        assert(bounded == win,
          s"seed=$i k=$k ids=$ids:\n window=$win\n bounded=$bounded")
      }
    }
    // same pinning for the top-k form: duplicated (order, id) pairs at the
    // boundary, both directions; output order-column TYPE must match input
    val dup = Seq(("a", 1L, 5), ("a", 1L, 5), ("a", 2L, 5), ("a", 3L, 4),
        ("a", 3L, 4), ("b", 1L, 7), ("b", 1L, 7))
      .toDF("grp", "id", "v").repartition(3)
    Seq(true, false).foreach { desc =>
      val o = if (desc) col("v").desc else col("v").asc
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("grp").orderBy(o, col("id").asc)
      val win = dup.withColumn("rank", row_number().over(w)).where(col("rank") <= 2)
        .select("grp", "id", "v", "rank")
        .as[(String, Long, Int, Int)].collect().sorted.toList
      val b = Stats.topKPerGroupBounded(dup, "grp", "id", "v", k = 2, desc = desc)
      assert(b.schema("v").dataType == org.apache.spark.sql.types.IntegerType,
        "reconstructed order column must keep the input type, not widen to long")
      assert(b.select("grp", "id", "v", "rank")
        .as[(String, Long, Int, Int)].collect().sorted.toList == win, s"desc=$desc")
    }
  }

  test("jaccard pairs: symmetric inputs give values in [0,1]; self-pair jaccard is 1") {
    val docs = Tables.load(spark, sfDir, "documents").limit(40)
    val withSelf = docs.select(col("doc_id"), col("text"))
      .union(docs.select(col("doc_id") + 1000000, col("text")))  // exact copies
    val pairs = Dedup.ngramJaccardPairs(withSelf.withColumn("b", lit(1)),
      "doc_id", "text", "b", threshold = 0.05)
    val j = pairs.select("jaccard").as[Double].collect()
    assert(j.forall(x => x >= 0.05 && x <= 1.0))
    // every original doc pairs with its planted copy at jaccard 1.0
    val perfect = pairs.filter(col("id_r") - col("id_l") === 1000000).select("jaccard").as[Double].collect()
    assert(perfect.length >= 40 && perfect.forall(_ == 1.0))
  }

  test("salted join equals plain join (any salt count)") {
    val left = (1 to 200).map(i => (i % 7L, i.toLong)).toDF("k", "v")
    val right = Seq((0L, "z"), (1L, "a"), (2L, "b"), (6L, "f")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).select("k", "v", "name")
      .as[(Long, Long, String)].collect().sorted.toSeq
    for (salts <- Seq(1, 4, 16)) {
      val salted = SkewJoin.saltedEquiJoin(left, right, Seq("k"), salts)
        .select("k", "v", "name").as[(Long, Long, String)].collect().sorted.toSeq
      assert(salted == plain, s"salts=$salts diverged")
    }
  }

  test("histogram percentiles == interpreted percentile() on random multisets and probabilities") {
    // random duplicate-heavy value lists × random p: the histogram
    // formulation must track percentile()'s interpolation bit-for-bit
    val rnd = new scala.util.Random(7)
    (0 until 8).foreach { trial =>
      val n = 20 + rnd.nextInt(200)
      val vals = Seq.fill(n)((rnd.nextInt(15) + 1).toDouble)
      val p = math.rint(rnd.nextDouble() * 100) / 100.0
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val hist = graft.ops.Stats.histogramPercentile(df, "v", p)
        .as[Double].head()
      val exact = df.agg(expr(s"percentile(v, $p)")).as[Double].head()
      assert(hist == exact, s"trial $trial: p=$p hist=$hist exact=$exact")
      // winsorize bounds clamp into [min, max] and are monotone in p
      val w = graft.ops.Stats.winsorize(df, "v", 0.1, 0.9, "w")
        .select("w").as[Double].collect()
      assert(w.min >= vals.min && w.max <= vals.max)
    }
  }

  test("heavy-hitter sketch: merging any partitioning of a stream keeps the MG bound") {
    val rnd = new scala.util.Random(11)
    (0 until 4).foreach { trial =>
      val stream = Seq.fill(3000)(s"t${(math.pow(rnd.nextDouble(), 3) * 50).toInt}")
      val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      for (parts <- Seq(1, 7, 32)) {
        val out = graft.ops.Stats.heavyHitters(
          stream.toDF("t").repartition(parts), "t", 12)
          .select("item", "est").as[(String, Long)].collect()
        out.foreach { case (item, est) =>
          val truth = exact.getOrElse(item, 0L)
          assert(est <= truth && truth - est <= 3000 / 13 + 1,
            s"trial $trial parts=$parts: $item est=$est truth=$truth")
        }
      }
    }
  }

  test("exact dedup is idempotent: dedup of dedup output changes nothing") {
    val docs = Tables.load(spark, sfDir, "documents")
    val d1 = Dedup.exactByContent(docs, "doc_id", Seq("text"))
    val kept = docs.join(d1.select(col("keep_id").as("doc_id")), Seq("doc_id"), "left_semi")
    val d2 = Dedup.exactByContent(kept, "doc_id", Seq("text"))
    assert(d1.count() == d2.count())
    assert(d2.filter(col("n_copies") > 1).count() == 0)
  }

  test("paragraph dedup laws on random corpora: conservation, idempotence, all-unique identity") {
    // random docs over a TINY vocab so cross-doc window collisions actually
    // happen; window = 3 tokens to exercise ragged tails
    val doc = Gen.chooseNum(3, 23).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    def samples[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
      (0 until n).foreach(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body))
    samples(Gen.listOfN(12, doc), n = 8) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = Dedup.paragraphDedup(df, "doc_id", "text", tokensPerPassage = 3)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // conservation: every doc reappears exactly once; kept ≤ total
      assert(once.length == texts.length)
      assert(once.forall { case (_, _, k, t) => k >= 0 && k <= t })
      // total kept passages across the corpus == number of DISTINCT windows
      val allWindows = texts.zipWithIndex.flatMap { case (t, _) =>
        t.split(" ").grouped(3).map(_.mkString(" ")) }
      assert(once.map(_._3).sum == allWindows.distinct.size.toLong)
      // idempotence: re-deduping the kept text (same window size) is identity
      // — every surviving window is globally unique already
      val cleaned = once.filter(_._2.nonEmpty).map(t => (t._1, t._2)).toSeq.toDF("doc_id", "text")
      val twice = Dedup.paragraphDedup(cleaned, "doc_id", "text", tokensPerPassage = 3)
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      once.filter(_._2.nonEmpty).foreach { case (id, txt, _, _) =>
        assert(twice(id) == txt, s"doc $id not stable under re-dedup")
      }
    }
    // all-unique corpus passes through byte-identical
    val uniq = Seq((1L, "u1 u2 u3 u4 u5 u6 u7"), (2L, "v1 v2 v3")).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(uniq, "doc_id", "text", tokensPerPassage = 3)
      .select("id", "clean_text").collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out == Map(1L -> "u1 u2 u3 u4 u5 u6 u7", 2L -> "v1 v2 v3"))
  }

  test("DualPolyRollHash: packing law h1*P+h2, window count, and per-window polynomial identity") {
    import graft.expressions.{DualPolyRollHash, PolyRollHash, TokenHashes}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val P = TokenHashes.P
    val genArr = for {
      n <- Gen.choose(0, 24)
      a <- Gen.listOfN(n, Gen.choose(0L, P - 1))
      b <- Gen.listOfN(n, Gen.choose(0L, P - 1))
      span <- Gen.choose(1, 9)
    } yield (a.toArray, b.toArray, span)
    (0 until 200).foreach { seed =>
      val (a, b, span) = genArr.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val dual = DualPolyRollHash.roll(
        new GenericArrayData(a), new GenericArrayData(b), span).toLongArray()
      val r1 = PolyRollHash.roll(new GenericArrayData(a), span, P).toLongArray()
      // the tail stream under base B2: recompute positionally from scratch
      def polyAt(h: Array[Long], i: Int, L: Int, base: Long): Long = {
        var acc = 0L; var k = 0
        while (k < L) { acc = (acc * base + h(i + k) % P) % P; k += 1 }
        acc
      }
      val expectedLen =
        if (a.length == 0) 0 else math.max(1, a.length - span + 1)
      assert(dual.length == expectedLen && r1.length == expectedLen)
      dual.indices.foreach { i =>
        val l = math.min(span, a.length)
        val off = if (a.length < span) 0 else i
        val h2 = polyAt(b, off, l, PolyRollHash.B2)
        assert(dual(i) == r1(i) * P + h2,
          s"window $i: ${dual(i)} != ${r1(i)} * P + $h2 (span $span, n ${a.length})")
        assert(dual(i) >= 0, "packed fingerprint overflowed")
      }
    }
  }
}
