package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("backward as-of join: latest right row at or before left ts") {
    val left = Seq(
      ("u1", ts("2024-01-01 10:00:00"), "p1"),
      ("u1", ts("2024-01-01 12:00:00"), "p2"),
      ("u2", ts("2024-01-01 09:00:00"), "p3")).toDF("k", "lts", "lid")
    val right = Seq(
      ("u1", ts("2024-01-01 09:30:00"), 1.0),
      ("u1", ts("2024-01-01 11:00:00"), 2.0),
      ("u2", ts("2024-01-01 09:00:00"), 3.0)). // exact tie: <= matches
      toDF("k", "rts", "v")
    val out = AsOfJoin.asofBackward(left, right, Seq("k"), "lts", "rts", Seq("v"))
      .select("lid", "v").as[(String, Option[Double])].collect().toMap
    assert(out == Map("p1" -> Some(1.0), "p2" -> Some(2.0), "p3" -> Some(3.0)))
  }

  test("forward as-of join: earliest right row at or after left ts") {
    val left = Seq(
      ("u1", ts("2024-01-01 10:00:00"), "p1"),
      ("u1", ts("2024-01-01 12:00:00"), "p2"),
      ("u2", ts("2024-01-01 09:00:00"), "p3")).toDF("k", "lts", "lid")
    val right = Seq(
      ("u1", ts("2024-01-01 11:00:00"), 1.0),
      ("u1", ts("2024-01-01 13:00:00"), 2.0),
      ("u2", ts("2024-01-01 09:00:00"), 3.0)). // exact tie: >= matches
      toDF("k", "rts", "v")
    val out = AsOfJoin.asofForward(left, right, Seq("k"), "lts", "rts", Seq("v"))
      .select("lid", "v").as[(String, Option[Double])].collect().toMap
    assert(out == Map("p1" -> Some(1.0), "p2" -> Some(2.0), "p3" -> Some(3.0)))
    // forward tolerance: match further than tol ahead is nulled
    val strict = AsOfJoin.asofForward(left, right, Seq("k"), "lts", "rts", Seq("v"),
      toleranceMicros = Some(1800L * 1000000L)) // 30 min
      .select("lid", "v").as[(String, Option[Double])].collect().toMap
    assert(strict("p1").isEmpty && strict("p2").isEmpty && strict("p3").contains(3.0))
  }

  test("NULL payload on the matched row is NOT back-filled from an older row") {
    // right row at 11:00 matches but carries v=NULL, w="b"; a per-column fill
    // would splice v=1.0 from the 09:00 row — the whole-row struct fill must
    // keep the matched row atomic (Polars/DuckDB asof semantics)
    val left = Seq(("u1", ts("2024-01-01 12:00:00"), "p")).toDF("k", "lts", "lid")
    val right = Seq(
      ("u1", ts("2024-01-01 09:00:00"), Some(1.0), "a"),
      ("u1", ts("2024-01-01 11:00:00"), None, "b")).toDF("k", "rts", "v", "w")
    val row = AsOfJoin.asofBackward(left, right, Seq("k"), "lts", "rts", Seq("v", "w"))
      .select("v", "w", "matched_rts").as[(Option[Double], String, java.sql.Timestamp)].head()
    assert(row == ((None, "b", ts("2024-01-01 11:00:00"))), s"spliced: $row")
    // forward direction: left at 08:00 matches the 09:00 row; a later NULL-v
    // row must not leak backwards either — mirror with NULL on the matched row
    val left2 = Seq(("u1", ts("2024-01-01 10:00:00"), "p")).toDF("k", "lts", "lid")
    val row2 = AsOfJoin.asofForward(left2, right, Seq("k"), "lts", "rts", Seq("v", "w"))
      .select("v", "w", "matched_rts").as[(Option[Double], String, java.sql.Timestamp)].head()
    assert(row2 == ((None, "b", ts("2024-01-01 11:00:00"))), s"spliced: $row2")
  }

  test("tolerance nulls out stale matches") {
    val left = Seq(("u1", ts("2024-01-01 12:00:00"), "p")).toDF("k", "lts", "lid")
    val right = Seq(("u1", ts("2024-01-01 09:00:00"), 7.0)).toDF("k", "rts", "v")
    val strict = AsOfJoin.asofBackward(left, right, Seq("k"), "lts", "rts", Seq("v"),
      toleranceMicros = Some(3600L * 1000000L)) // 1h < 3h gap
    assert(strict.select("v").as[Option[Double]].head().isEmpty)
    val loose = AsOfJoin.asofBackward(left, right, Seq("k"), "lts", "rts", Seq("v"),
      toleranceMicros = Some(4 * 3600L * 1000000L))
    assert(loose.select("v").as[Option[Double]].head().contains(7.0))
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup groups identical content") {
    val df = Seq((1L, "same text here"), (2L, "same text here"), (3L, "different"))
      .toDF("id", "text")
    val out = Dedup.exactByContent(df, "id", Seq("text"))
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (3L, 1L)))
  }

  test("multi-column digest preserves field boundaries and null-vs-empty") {
    // a separator-joined concat collides ("ab","c") with ("a","bc") when a
    // value contains the separator, and NULL with "" (concat_ws skips nulls);
    // the JSON-struct digest must keep all five rows distinct
    // (row 3 embeds the old \u0001 separator byte inside a value)
    val df = Seq(
      (1L, "ab", "c"), (2L, "a", "bc"),
      (3L, "ab", "c"), (4L, null.asInstanceOf[String], ""), (5L, "", null.asInstanceOf[String]))
      .toDF("id", "x", "y")
    val out = Dedup.exactByContent(df, "id", Seq("x", "y"))
    assert(out.count() == 5, "multi-column contents silently merged")
    // and identical multi-column content still merges
    val same = Seq((1L, "a", "b"), (2L, "a", "b")).toDF("id", "x", "y")
    assert(Dedup.exactByContent(same, "id", Seq("x", "y")).count() == 1)
  }

  test("dedupCorpusExact keeps one row per distinct content") {
    import spark.implicits._
    val df = Seq((5L, "x"), (2L, "x"), (3L, "y")).toDF("id", "text")
    val kept = Dedup.dedupCorpusExact(df, "id", Seq("text"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("stripFrequentLines: every occurrence of a frequent line drops, threshold exact") {
    val docs = Seq(
      (1L, "banner line\nunique alpha\nbanner line"),
      (2L, "banner line\nunique beta"),
      (3L, "banner line\nnear hot"),
      (4L, "near hot\nunique gamma"),
      (5L, "banner line\n banner line ")) // trim-normalized: still the banner
      .toDF("doc_id", "text")
    // banner: 6 occurrences (>= 3 drops, including the first); "near hot":
    // 2 occurrences (< 3, kept everywhere)
    val out = Dedup.stripFrequentLines(docs, "doc_id", "text", minCount = 3)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "unique alpha", 1L, 3L)))
    assert(out(1) == ((2L, "unique beta", 1L, 2L)))
    assert(out(2) == ((3L, "near hot", 1L, 2L)))
    assert(out(3) == ((4L, "near hot\nunique gamma", 2L, 2L)))
    // doc 5 is ALL boilerplate -> survives as an empty row, not a dropped row
    assert(out(4) == ((5L, "", 0L, 2L)))
    // minCount boundary: with minCount = 7 the banner (6x) is kept
    val lax = Dedup.stripFrequentLines(docs, "doc_id", "text", minCount = 7)
      .as[(Long, String, Long, Long)].collect()
    assert(lax.forall(r => r._3 == r._4), lax.mkString(","))
    intercept[IllegalArgumentException](
      Dedup.stripFrequentLines(docs, "doc_id", "text", minCount = 1))
  }

  test("paragraphDedup removes duplicated passages corpus-wide, first occurrence wins") {
    val p1 = (1 to 20).map(i => s"a$i").mkString(" ")   // shared passage
    val p2 = (1 to 20).map(i => s"b$i").mkString(" ")
    val u  = (1 to 20).map(i => s"u$i").mkString(" ")
    val tail = (1 to 5).map(i => s"t$i").mkString(" ")  // partial final window
    val docs = Seq(
      (1L, s"$p1 $p2"),        // both passages first seen here — all kept
      (2L, s"$p1 $u"),         // p1 already seen in doc 1 — only u survives
      (3L, s"$p2 $p2"),        // cross-doc AND intra-doc repeat — nothing survives
      (4L, s"$u $tail"))       // u seen in doc 2; 5-token tail window kept
      .toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "doc_id", "text", tokensPerPassage = 20)
      .select("id", "clean_text", "n_kept", "n_total")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, s"$p1 $p2", 2L, 2L)))
    assert(out(1) == ((2L, u, 1L, 2L)))
    assert(out(2) == ((3L, "", 0L, 2L)))
    assert(out(3) == ((4L, tail, 1L, 2L)))
  }

  test("paragraphDedup reconstruction preserves document order of kept passages") {
    // three distinct windows; the middle one is a duplicate of an earlier
    // doc's — reconstruction must stitch window 0 and window 2 in order
    val w0 = (1 to 20).map(i => s"x$i").mkString(" ")
    val dup = (1 to 20).map(i => s"d$i").mkString(" ")
    val w2 = (1 to 20).map(i => s"y$i").mkString(" ")
    val docs = Seq((1L, dup), (2L, s"$w0 $dup $w2")).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "doc_id", "text", tokensPerPassage = 20)
      .filter(col("id") === 2L).select("clean_text").as[String].collect()
    assert(out.head == s"$w0 $w2")
  }

  test("duplicateSpanStats finds and merges cross-doc repeated token spans") {
    // ten-token shared run inside distinct surroundings: with spanTokens=4
    // the run contributes 7 overlapping duplicated 4-grams per doc, which
    // must merge into ONE maximal 10-token span each; doc 3 has no repeat
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 $shared a4 a5"),
      (2L, s"b1 $shared b2 b3 b4"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8"))
      .toDF("doc_id", "text")
    val out = Dedup.duplicateSpanStats(docs, "doc_id", "text", spanTokens = 4)
      .select("doc_id", "n_tokens", "dup_spans", "dup_tokens", "dup_frac")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 15L, 1L, 10L, 10.0 / 15)))
    assert(out(1) == ((2L, 14L, 1L, 10L, 10.0 / 14)))
    assert(out(2) == ((3L, 8L, 0L, 0L, 0.0)))
  }

  test("duplicateSpanStats: INTRA-doc repeats count; disjoint repeats stay separate spans") {
    val run = "r1 r2 r3 r4"                       // repeated twice inside doc 1
    val docs = Seq(
      (1L, s"$run x1 x2 x3 $run"),                // two disjoint 4-token spans
      (2L, "y1 y2 y3 y4 y5 y6 y7 y8"))
      .toDF("doc_id", "text")
    val out = Dedup.duplicateSpanStats(docs, "doc_id", "text", spanTokens = 4)
      .where(col("doc_id") === 1L)
      .select("dup_spans", "dup_tokens").as[(Long, Long)].head()
    assert(out == ((2L, 8L)))
  }

  test("stripDuplicateSpans removes exactly the duplicated tokens, n_removed == stats dup_tokens") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 $shared a4 a5"),
      (2L, s"b1 $shared b2 b3 b4"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8"),
      (4L, shared))                               // doc IS one big span → ""
      .toDF("doc_id", "text")
    val out = Dedup.stripDuplicateSpans(docs, "doc_id", "text", spanTokens = 4)
      .select("doc_id", "clean_text", "n_removed")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "a1 a2 a3 a4 a5", 10L)))
    assert(out(1) == ((2L, "b1 b2 b3 b4", 10L)))
    assert(out(2) == ((3L, "c1 c2 c3 c4 c5 c6 c7 c8", 0L)))
    assert(out(3) == ((4L, "", 10L)))
    // cross-op law on real data: strip's removal count equals stats' span size
    val docsReal = Tables.load(spark, sfDir, "documents").limit(200)
    val stats = Dedup.duplicateSpanStats(docsReal, "doc_id", "text", spanTokens = 8)
      .select(col("doc_id"), col("dup_tokens"))
    val strip = Dedup.stripDuplicateSpans(docsReal, "doc_id", "text", spanTokens = 8)
      .select(col("doc_id"), col("n_removed"))
    assert(stats.join(strip, Seq("doc_id"))
      .where(col("dup_tokens") =!= col("n_removed")).count() == 0)
  }

  test("containment pairs: quote inclusion found in both roles; prefix filter loses nothing vs brute force") {
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val docs = Seq(
      (1L, quote, "s"),                                     // fully inside 2
      (2L, s"a1 a2 a3 $quote a4 a5 a6 a7 a8 a9 a10 a11 a12 a13 a14", "s"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10", "s"),          // unrelated
      (4L, quote, "other"))                                 // other block
      .toDF("doc_id", "text", "source")
    val out = Dedup.ngramContainmentPairs(docs, "doc_id", "text", "source",
      n = 3, threshold = 0.8)
      .select("id_a", "id_b", "containment").as[(Long, Long, Double)].collect()
    // doc 1's 10 shingles all occur in doc 2 -> containment 1.0 for (1,2);
    // the reverse direction is far below 0.8; doc 3 and the other-block
    // copy never pair
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
    // exactness law on real data: the prefix-filtered result equals the
    // brute-force all-ordered-pairs computation
    val real = Tables.load(spark, sfDir, "documents").limit(300)
    val got = Dedup.ngramContainmentPairs(real, "doc_id", "text", "source",
      n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val prof = Dedup.shingleProfiles(real, "doc_id", "text", 3, Nil, Seq("source"))
      .select(col("doc_id"), col("source"), col("__shingles"))
    val brute = prof.as("a").join(prof.as("b"),
        col("a.source") <=> col("b.source") && col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        (size(array_intersect(col("a.__shingles"), col("b.__shingles"))).cast("double")
          / size(col("a.__shingles")).cast("double")).as("c"))
      .where(col("c") >= 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == brute, s"prefix filter diverged: missing=${brute -- got} extra=${got -- brute}")
  }

  test("overlapBound is the exact verify-arithmetic minimum k (ceil in doubles overshoots boundaries)") {
    // the law: overlapBound(sz, t) == min{ k >= 1 : k.toDouble/sz.toDouble >= t },
    // i.e. the loosest bound that never excludes a pair the verify step accepts
    val thresholds = Seq(0.07, 0.1, 0.3, 0.5, 0.7, 0.8, 1.0 / 3.0, 1.0)
    val szs = (1 to 500).map(_.toLong)
    for (t <- thresholds) {
      val got = szs.toDF("sz")
        .select(col("sz"), Dedup.overlapBound(col("sz"), t).as("b"))
        .as[(Long, Long)].collect().toMap
      for (sz <- szs) {
        val want = (1L to sz).find(k => k.toDouble / sz.toDouble >= t).getOrElse(sz)
        assert(got(sz) == want, s"sz=$sz t=$t: got ${got(sz)}, want $want")
      }
    }
    // the motivating boundary: t=0.07, sz=100 — fl(100·0.07)=7.000…01 so raw
    // ceil says 8, but inter=7 verifies (fl(7/100) == the 0.07 literal)
    assert(math.ceil(100 * 0.07) == 8.0)
    assert(7.0 / 100.0 >= 0.07)
  }

  test("canonicalPerCluster keeps the best-scoring member; singletons keep themselves") {
    val docs = Seq(
      (1L, 50L), (2L, 90L), (3L, 90L),   // cluster rep 1: best score 90, tie -> id 2
      (7L, 10L))                          // singleton
      .toDF("doc_id", "n_chars")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "cluster_rep")
    val out = Dedup.canonicalPerCluster(docs, "doc_id", "n_chars", clusters)
      .select("cluster_rep", "keep_id", "best_score", "n_members")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 2L, 90L, 3L), (7L, 7L, 10L, 1L)))
  }

  test("span dedup is immune to single-polynomial 31-bit gram collisions") {
    // Brute-force a REAL collision in the old 31-bit space: two distinct
    // 2-grams whose base-B polynomials over the md5 token hashes agree
    // mod P (birthday bound ~2^15.5 pairs — a few hundred tokens suffice).
    // The dual-polynomial composite must separate them, and the span-dedup
    // pipeline must report no duplicate for docs containing one each.
    import graft.expressions.{Md5Hash60, PolyRollHash, TokenHashes}
    import org.apache.spark.unsafe.types.UTF8String
    val P = Dedup.P
    val toks = (0 until 800).map(i => s"ctok$i")
    val h = toks.map(t => Md5Hash60.hash(UTF8String.fromString(t)) % P)
    val seen = new scala.collection.mutable.HashMap[Long, (Int, Int)]()
    var hit: Option[((Int, Int), (Int, Int))] = None
    var a = 0
    while (hit.isEmpty && a < toks.length) {
      var b = 0
      while (hit.isEmpty && b < toks.length) {
        val poly = (h(a) * PolyRollHash.B % P + h(b)) % P
        seen.get(poly) match {
          case Some(prev) if prev != ((a, b)) => hit = Some((prev, (a, b)))
          case None => seen.put(poly, (a, b))
          case _ => ()
        }
        b += 1
      }
      a += 1
    }
    val ((a1, b1), (a2, b2)) = hit.getOrElse(fail("no 31-bit collision found"))
    val g1 = s"${toks(a1)} ${toks(b1)}"
    val g2 = s"${toks(a2)} ${toks(b2)}"
    // sanity: the single 31-bit polynomial really collides on these grams
    def poly1(x: Int, y: Int) = (h(x) * PolyRollHash.B % P + h(y)) % P
    assert(g1 != g2 && poly1(a1, b1) == poly1(a2, b2))
    // the dual composite separates them (second independent stream + base)
    def h2of(t: String) = Md5Hash60.hashTail(UTF8String.fromString(t)) % P
    def dual(x: Int, y: Int, tx: String, ty: String) =
      poly1(x, y) * P + (h2of(tx) * PolyRollHash.B2 % P + h2of(ty)) % P
    assert(dual(a1, b1, toks(a1), toks(b1)) != dual(a2, b2, toks(a2), toks(b2)))
    // end-to-end: under the old 31-bit fingerprint these two docs would be
    // flagged 100% duplicated; the dual path must report zero
    val docs = Seq((1L, g1), (2L, g2)).toDF("doc_id", "text")
    val out = Dedup.duplicateSpanStats(docs, "doc_id", "text", spanTokens = 2)
      .select("doc_id", "dup_spans").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 0L))
    // and a GENUINE shared gram still dedups under the dual fingerprint
    val dup = Seq((1L, s"$g1 zz"), (2L, s"pre $g1"))
      .toDF("doc_id", "text")
    val dupOut = Dedup.duplicateSpanStats(dup, "doc_id", "text", spanTokens = 2)
      .select("doc_id", "dup_spans").as[(Long, Long)].collect().toMap
    assert(dupOut == Map(1L -> 1L, 2L -> 1L))
  }

  test("minhash-LSH finds planted near-duplicates and skips unrelated docs") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val nearDup = base + " omicron"  // one appended token: Jaccard = 12/13
    val unrelated = "one two three four five six seven eight nine ten eleven twelve"
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.3)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("incremental new-vs-corpus matches == full-corpus pairs restricted to cross-split; admitNonDup filters") {
    val docs = Tables.load(spark, sfDir, "documents").limit(300)
    val corpus = docs.where(pmod(col("doc_id"), lit(5)) < 4)
    val newDocs = docs.where(pmod(col("doc_id"), lit(5)) === 4)
    val prof = Dedup.shingleProfiles(corpus, "doc_id", "text", 3, Dedup.hashCoeffs(12))
    val inc = Dedup.minhashNewVsCorpus(newDocs, "doc_id", "text",
        prof, "doc_id", "__sig", "__shingles", threshold = 0.2)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    // ground truth: the batch-oblivious full-corpus run, keeping only pairs
    // that straddle the split (canonicalized to unordered form)
    val full = Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.2)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    val crossFull = full.filter { case (l, r) => (l % 5 == 4) != (r % 5 == 4) }
      .map { case (l, r) => if (l % 5 == 4) (l, r) else (r, l) }
    assert(inc == crossFull, s"incremental $inc vs full-restricted $crossFull")
    // admitNonDup keeps exactly the unmatched new docs
    val matches = Dedup.minhashNewVsCorpus(newDocs, "doc_id", "text",
      prof, "doc_id", "__sig", "__shingles", threshold = 0.2)
    val admitted = Dedup.admitNonDup(newDocs, "doc_id", matches)
      .select("doc_id").as[Long].collect().toSet
    val newIds = newDocs.select("doc_id").as[Long].collect().toSet
    assert(admitted == newIds -- inc.map(_._1))
  }

  test("indexed incremental match == scan-based match; batch touches a strict subset of index buckets") {
    val docs = Tables.load(spark, sfDir, "documents").limit(300)
    val corpus = docs.where(pmod(col("doc_id"), lit(5)) < 4)
    val newDocs = docs.where(pmod(col("doc_id"), lit(5)) === 4)
    val prof = Dedup.shingleProfiles(corpus, "doc_id", "text", 3, Dedup.hashCoeffs(12))
    val store = new graft.core.BucketedStore(tmpDir("lshidx"), numBuckets = 32)
    Dedup.indexCorpus(prof, "doc_id", "__sig", "__shingles", store, "corpus")

    val indexed = Dedup.matchIndexed(newDocs, "doc_id", "text",
        store, "corpus", threshold = 0.2)
      .select("new_id", "corpus_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val scanned = Dedup.minhashNewVsCorpus(newDocs, "doc_id", "text",
        prof, "doc_id", "__sig", "__shingles", threshold = 0.2)
      .select("new_id", "corpus_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(indexed == scanned, s"indexed $indexed vs scanned $scanned")

    // the pruned band read touches strictly fewer buckets than a full scan
    // for a single-doc batch (its <= bands band keys hash into <= bands of
    // the 32 buckets)
    val one = newDocs.limit(1)
    val oneProf = Dedup.shingleProfiles(one, "doc_id", "text", 3, Dedup.hashCoeffs(12))
    val oneBanded = Dedup.explodeBands(oneProf.select(col("doc_id"), col("__sig")),
      "__sig", 4, 3).select("band_key")
    val touched = store.readTouched("corpus_bands", Seq("band_key"), oneBanded)
      .inputFiles.map(_.split("/__b=")(1).split("/")(0)).distinct.length
    val total = store.read("corpus_bands", Seq("band_key"))
      .inputFiles.map(_.split("/__b=")(1).split("/")(0)).distinct.length
    assert(touched <= 4 && touched < total,
      s"single-doc batch read $touched of $total buckets")
  }

  test("appendToIndex: incrementally grown index == index rebuilt from the full corpus") {
    val docs = Tables.load(spark, sfDir, "documents").limit(300)
    val part1 = docs.where(pmod(col("doc_id"), lit(5)) < 2)
    val part2 = docs.where(pmod(col("doc_id"), lit(5)).isin(2, 3))
    val newDocs = docs.where(pmod(col("doc_id"), lit(5)) === 4)
    def profOf(df: org.apache.spark.sql.DataFrame) =
      Dedup.shingleProfiles(df, "doc_id", "text", 3, Dedup.hashCoeffs(12))

    // grown: index part1, then append part2's profiles
    val grown = new graft.core.BucketedStore(tmpDir("idxgrow"), numBuckets = 32)
    Dedup.indexCorpus(profOf(part1), "doc_id", "__sig", "__shingles", grown, "c")
    Dedup.appendToIndex(profOf(part2), "doc_id", "__sig", "__shingles", grown, "c")
    // rebuilt: one index over the union
    val rebuilt = new graft.core.BucketedStore(tmpDir("idxfull"), numBuckets = 32)
    Dedup.indexCorpus(profOf(part1.unionByName(part2)), "doc_id", "__sig", "__shingles",
      rebuilt, "c")

    def matches(store: graft.core.BucketedStore) =
      Dedup.matchIndexed(newDocs, "doc_id", "text", store, "c", threshold = 0.2)
        .select("new_id", "corpus_id", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
    assert(matches(grown) == matches(rebuilt))
    // compaction keeps the grown index's answers identical
    grown.compactBuckets("c_bands", Seq("band_key"))
    grown.compactBuckets("c_profile", Seq("corpus_id"))
    assert(matches(grown) == matches(rebuilt))
  }

  test("NULL edges: NULL-block docs still pair; NULL-text docs keep a simhash") {
    // two identical docs whose block column is NULL: the null-safe block
    // join must still compare them (a plain equi-join never would)
    val txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq((1L, txt, null.asInstanceOf[String]),
      (2L, txt, null.asInstanceOf[String]),
      (3L, "one two three four five six seven eight nine ten", "b1"))
      .toDF("doc_id", "text", "src")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "src", threshold = 0.5)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), pairs.toString)
    // NULL text must not vanish from the simhash universe (minhash keeps it)
    val withNull = Seq((1L, null.asInstanceOf[String]), (2L, "real text here"))
      .toDF("doc_id", "text")
    val sims = Dedup.simhashes(withNull, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(sims == Set(1L, 2L), s"NULL-text doc dropped: $sims")
  }

  test("near-dup clustering: transitive closure with min-id representative") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 3L)).toDF("id_l", "id_r")
    val cc = Dedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    // {1,2,3,9} -> 1, {5,6} -> 5
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("CC loop truncates lineage: plan depth stays bounded over many rounds") {
    import spark.implicits._
    // a chain graph needs ~diameter rounds of min-label propagation; without
    // periodic localCheckpoint the returned frame's logical plan chains
    // through EVERY round (hundreds of nodes) — the scale-killer at 100 TB
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("id_l", "id_r")
    val out = Dedup.nearDupClusters(chain)
    val depth = out.queryExecution.logical.numberedTreeString.linesIterator.size
    assert(depth < 80, s"plan depth $depth suggests unbounded lineage")
    val cc = out.as[(Long, Long)].collect().toMap
    assert(cc.keySet == (1L to 12L).toSet && cc.values.toSet == Set(1L))
  }

  test("dedupCorpusNear keeps one representative per near-dup cluster") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val docs = Seq(
      (1L, base), (2L, base + " omicron"), (3L, base + " omicron pi"),
      (7L, "one two three four five six seven eight nine ten eleven twelve")).toDF("doc_id", "text")
    val kept = Dedup.dedupCorpusNear(docs, "doc_id", "text", threshold = 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && kept.contains(7L))
    assert(!kept.contains(2L), s"near-dup 2 should be removed: $kept")
  }

  test("simhash pigeonhole banding finds ALL pairs within the hamming radius") {
    val docs = Tables.load(spark, sfDir, "documents").limit(60)
    val viaBanding = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 8)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    // brute force over all pairs (no banding) as ground truth
    val sims = docs.select(col("doc_id"), Dedup.simhash60(col("text")).as("s"))
    val brute = sims.as("l").join(sims.as("r"), col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id"), col("r.doc_id"),
        bit_count(col("l.s").bitwiseXOR(col("r.s"))).as("d"))
      .filter(col("d") <= 8)
      .select(col("l.doc_id"), col("r.doc_id")).as[(Long, Long)].collect().toSet
    assert(viaBanding == brute, "banding must be lossless within the radius")
  }

  test("hammingNearDupPairs: exact pigeonhole over a precomputed 64-bit hash, boundary-inclusive, NULLs excluded") {
    // hand-built hashes with KNOWN distances to a base b: 0, 1, exactly 3
    // (the boundary — pigeonhole must still catch it), 4 (outside), and a
    // far-away value; plus a NULL hash that must not pair with anything
    val b = 0x0123456789abcdefL
    val rows = Seq(
      (1L, Some(b)),
      (2L, Some(b)),                                  // hamming 0
      (3L, Some(b ^ (1L << 63))),                     // hamming 1 (sign bit)
      (4L, Some(b ^ 0x8000000100000002L)),            // hamming 3, spread bands
      (5L, Some(b ^ 0x000000000000000fL)),            // hamming 4, one band
      (6L, Some(~b)),                                 // hamming 64
      (7L, None: Option[Long]))
      .toDF("id", "h")
    val pairs = Dedup.hammingNearDupPairs(rows, "id", "h", maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((1L, 2L, 0), (1L, 3L, 1), (1L, 4L, 3),
      (2L, 3L, 1), (2L, 4L, 3), (3L, 4L, 2)),
      s"got $pairs")
    // hamming(3,4): b^(1<<63) vs b^0x8000000100000002 = xor 0x...1...2 -> 2 bits
    // radius boundary honored: 4 pairs with 1/2 at distance 4, not reported
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
    val e = intercept[IllegalArgumentException] {
      Dedup.hammingNearDupPairs(rows, "id", "h", maxHamming = 4)
    }
    assert(e.getMessage.contains("divide 64"))
  }
}

class LshCalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("lshBandCalibration: monotone in bands; n_caught(b) == |minhashNearDupPairs(bands=b)|") {
    val docs = Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 1000)
    val curve = Dedup.lshBandCalibration(docs, "doc_id", "text", n = 3,
        numHashes = 12, threshold = 0.2).orderBy("bands")
      .select("bands", "n_caught", "n_true", "recall_micro")
      .as[(Int, Long, Long, Long)].collect()
    assert(curve.map(_._1).sameElements(Seq(1, 2, 3, 4, 6, 12)))
    assert(curve.sliding(2).forall(p => p(0)._2 <= p(1)._2),
      "catch counts must be monotone non-decreasing in bands")
    assert(curve.forall(r => r._2 <= r._3), "caught is a subset of truth")
    assert(curve.forall(r => r._4 == (if (r._3 == 0) 0L else 1000000L * r._2 / r._3)))
    // the catch rule IS the candidate rule: at any divisor b, the caught
    // truth pairs are exactly the pairs minhashNearDupPairs(bands=b) emits
    // (banded candidates intersected with the exact-Jaccard verify)
    for (b <- Seq(2, 4)) {
      val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text", n = 3,
        numHashes = 12, bands = b, threshold = 0.2).count()
      assert(curve.find(_._1 == b).get._2 == pairs, s"bands=$b")
    }
  }

  test("lshBandCalibration: maxTruthDocs sampling contract fires loudly, by name; a compliant slice is unchanged") {
    val docs = Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 200)
    // over the cap: the exact-Jaccard ground truth is the one inherently
    // corpus-wide pass in the suite — an unsampled calibration input must
    // fail by NAME at the first truth-side scan, not run quadratic work
    val e = intercept[Exception] {
      Dedup.lshBandCalibration(docs, "doc_id", "text", n = 3,
        numHashes = 12, threshold = 0.2, maxTruthDocs = 50L).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("maxTruthDocs"), s"guard must fail by name, got: $msg")
    assert(msg.contains("sampled slice"),
      "guard must point at the calibrate-on-a-slice discipline")
    intercept[IllegalArgumentException](Dedup.lshBandCalibration(
      docs, "doc_id", "text", maxTruthDocs = 0L))
    // at/under the cap the curve is IDENTICAL to the unguarded default
    val base = Dedup.lshBandCalibration(docs, "doc_id", "text", n = 3,
        numHashes = 12, threshold = 0.2).orderBy("bands")
      .select("bands", "n_caught", "n_true", "recall_micro")
      .as[(Int, Long, Long, Long)].collect().toSeq
    val capped = Dedup.lshBandCalibration(docs, "doc_id", "text", n = 3,
        numHashes = 12, threshold = 0.2, maxTruthDocs = 200L).orderBy("bands")
      .select("bands", "n_caught", "n_true", "recall_micro")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(base.nonEmpty && base == capped)
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("brute-force top-k: self is rank 1 with cosine 1.0") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val out = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 3), emb, "vec_id", "vec_id", "embedding", k = 3)
    val top1 = out.filter(col("rank") === 1)
      .select("query_id", "corpus_id", "cosine")
      .as[(Long, Long, Double)].collect()
    assert(top1.forall { case (q, c, cos) => q == c && math.abs(cos - 1.0) < 1e-9 })
  }

  test("LSH top-k achieves reasonable recall vs brute force") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(queries, emb, "vec_id", "vec_id", "embedding", k = 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(queries, emb, "vec_id", "vec_id", "embedding", k = 5, planes = 2)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall > 0.3, s"LSH recall too low: $recall") // 2 planes ≈ 4 buckets
    // self-match always survives (same vector → same bucket)
    assert((0L until 20L).forall(q => lsh.contains((q, q))))
  }

  test("PQ: self-reconstruction ranks, ADC recall vs brute force, code determinism") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    // codes are deterministic and partitioning-invariant
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", m = 8, ksub = 16)
      .as[(Long, Seq[Int])].collect().sortBy(_._1)
    val codes2 = Similarity.pqEncode(emb.repartition(7), "vec_id", "embedding",
      m = 8, ksub = 16).as[(Long, Seq[Int])].collect().sortBy(_._1)
    assert(codes.sameElements(codes2))
    assert(codes.forall(_._2.length == 8))
    assert(codes.forall(_._2.forall(c => c >= 0 && c < 16)))
    // a codebook SEED vector reconstructs exactly: its own codeword at
    // distance 0 in every subspace -> seed i gets code i everywhere
    val seedCodes = codes.take(16)
    seedCodes.zipWithIndex.foreach { case ((_, cs), i) =>
      assert(cs.forall(_ == i), s"seed $i codes: $cs") }
    // ADC: each seed query's rank-1 hit is itself at adc_dist 0
    val queries = emb.where(col("vec_id") < 5)
    val adc = Similarity.pqAdcTopK(queries, emb, "vec_id", "vec_id",
      "embedding", k = 10, m = 8, ksub = 16)
    val top1 = adc.where(col("rank") === 1)
      .select("query_id", "corpus_id", "adc_dist")
      .as[(Long, Long, Long)].collect()
    assert(top1.forall { case (q, c, d) => q == c && d == 0L }, top1.mkString(","))
    // recall against exact L2 top-10 (PQ is lossy; seed-codebook recall on
    // random data is modest but must beat chance by a wide margin)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "vec_id",
      "embedding", k = 10).select("query_id", "corpus_id")
      .as[(Long, Long)].collect().toSet
    val got = adc.select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall > 0.1, s"ADC recall vs brute force too low: $recall")
  }

  test("kCenterGreedy: farthest-point order, tie → smaller id, k > n, partition-invariant") {
    def vec(x: Float) = (x +: Seq.fill(63)(0.0f)).toArray
    val pts = Seq((0L, vec(0f)), (1L, vec(1f)), (2L, vec(10f)), (3L, vec(11f)))
      .toDF("vec_id", "embedding")
    // seed = smallest id (pos 0); farthest = pos 11; then pos 1 vs pos 10
    // tie at min-dist 1e12 → smaller id wins; last picks the other
    val out = Similarity.kCenterGreedy(pts, "vec_id", "embedding", k = 4)
      .select("rank", "vec_id", "sel_dist").as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1, 0L, 0L), (2, 3L, 121L * 1000000000000L),
      (3, 1L, 1000000000000L), (4, 2L, 1000000000000L)))
    // k beyond the corpus: one row per vector, no failure
    assert(Similarity.kCenterGreedy(pts, "vec_id", "embedding", k = 9).count() == 4L)
    // physical partitioning must not change the greedy sequence
    val out7 = Similarity.kCenterGreedy(pts.repartition(7), "vec_id", "embedding", k = 4)
      .select("rank", "vec_id", "sel_dist").as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(out7.toSeq == out.toSeq)
  }

  test("kCenterGreedy: greedy cover radius within the 2-approximation bound of the brute-force optimum") {
    // classic guarantee: greedy max-min radius <= 2x optimal k-center
    // radius — on SQUARED distances that is a factor 4. Deterministic tiny
    // instances, optimum by exhaustive subset search.
    val rnd = new scala.util.Random(7)
    (0 until 5).foreach { trial =>
      val n = 6 + rnd.nextInt(3)
      val k = 2 + rnd.nextInt(2)
      val vecs = (0 until n).map(i =>
        (i.toLong, Array.fill(64)(rnd.nextInt(21).toFloat - 10f)))
      val df = vecs.toDF("vec_id", "embedding")
      val picked = Similarity.kCenterGreedy(df, "vec_id", "embedding", k)
        .select("vec_id").as[Long].collect().toSet
      assert(picked.size == k && picked.contains(vecs.map(_._1).min))
      def q(v: Array[Float]) = v.map(x => math.round(x.toDouble * 1e6))
      def d2(a: Array[Long], b: Array[Long]) =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      val qs = vecs.map { case (id, v) => id -> q(v) }.toMap
      def radius(centers: Set[Long]): Long =
        vecs.map { case (id, _) => centers.map(c => d2(qs(id), qs(c))).min }.max
      val greedyR = radius(picked)
      val optR = vecs.map(_._1).combinations(k).map(s => radius(s.toSet)).min
      assert(greedyR <= 4 * optR,
        s"trial $trial (n=$n,k=$k): greedy r2 $greedyR > 4x optimal $optR")
    }
  }

  test("ADC rankers refuse an unbounded query side (plan-literal cap)") {
    // |queries|·m·ksub literal entries cap at 2^20: at m=8, ksub=16 the
    // guard trips past 8192 queries — build 8193 synthetic unit vectors
    // and assert the loud failure BEFORE any table computes
    val emb = Tables.load(spark, sfDir, "embeddings")
    val maxQ = (Similarity.MaxAdcTableEntries / (8L * 16)).toInt
    val vec = array((0 until 64).map(i => lit(if (i == 0) 1.0f else 0.0f)): _*)
    val tooMany = spark.range(maxQ + 1)
      .select(col("id").as("vec_id"), vec.as("embedding"))
    val e = intercept[IllegalArgumentException](
      Similarity.pqAdcTopK(tooMany, emb.limit(32), "vec_id", "vec_id",
        "embedding", k = 3, m = 8, ksub = 16))
    assert(e.getMessage.contains("plan literals"))
  }

  test("persisted IVF-PQ index: search ≡ the in-memory composition") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val store = new graft.core.BucketedStore(tmpDir("ivfpq"), numBuckets = 16)
    Similarity.indexVectorsPq(emb, "vec_id", "embedding", store, "ann",
      nlist = 16, m = 8, ksub = 16)
    val queries = emb.where(col("vec_id") < 10)
    val served = Similarity.searchIndexedPq(queries, "vec_id", "embedding",
      store, "ann", k = 5, nprobe = 4)
      .select("query_id", "corpus_id", "adc_dist", "rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._4))
    val direct = Similarity.ivfPqTopK(queries, emb, "vec_id", "vec_id",
      "embedding", k = 5, nlist = 16, nprobe = 4)
      .select("query_id", "corpus_id", "adc_dist", "rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._4))
    assert(served.sameElements(direct))
  }

  test("IVF-PQ: codeword queries self-hit at rank 1 with ADC 0; candidates respect probes") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.where(col("vec_id") < 10) // all 10 are PQ seed codewords
    val out = Similarity.ivfPqTopK(queries, emb, "vec_id", "vec_id",
      "embedding", k = 5, nlist = 16, nprobe = 4)
    val top1 = out.where(col("rank") === 1)
      .select("query_id", "corpus_id", "adc_dist")
      .as[(Long, Long, Long)].collect()
    assert(top1.length == 10)
    assert(top1.forall { case (q, c, d) => q == c && d == 0L }, top1.mkString(","))
    // every emitted candidate must lie in one of the query's probed lists:
    // re-deriving the probe sets through ivfTopK with the same geometry,
    // the IVF-PQ result ids are a subset of the IVF candidate ids at k=50
    val ivf = Similarity.ivfTopK(queries, emb, "vec_id", "vec_id",
      "embedding", k = 50, nlist = 16, nprobe = 4)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val pairs = out.select("query_id", "corpus_id").as[(Long, Long)].collect()
    // (k=50 truncates the IVF side; check only pairs the IVF list kept)
    assert(pairs.count(ivf.contains) >= pairs.length / 2)
  }

  test("PQ Lloyd refinement: distortion non-increasing, deterministic, iters=0 == seed") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val seed = Similarity.pqCodebook(emb, "vec_id", "embedding", 8, 16)
    val zero = Similarity.pqCodebookRefined(emb, "vec_id", "embedding", 8, 16, iters = 0)
    assert(seed.flatten.flatten.toSeq == zero.flatten.flatten.toSeq)
    var prev = Similarity.pqDistortion(emb, "embedding", seed)
    (1 to 3).foreach { it =>
      val cb = Similarity.pqCodebookRefined(emb, "vec_id", "embedding", 8, 16, iters = it)
      val d = Similarity.pqDistortion(emb, "embedding", cb)
      assert(d <= prev, s"iter $it distortion rose: $d > $prev")
      prev = d
    }
    // refinement must actually move the needle on this corpus
    assert(prev < Similarity.pqDistortion(emb, "embedding", seed))
    // deterministic across partitionings
    val a = Similarity.pqCodebookRefined(emb, "vec_id", "embedding", 8, 16, iters = 2)
    val b = Similarity.pqCodebookRefined(emb.repartition(7), "vec_id", "embedding", 8, 16, iters = 2)
    assert(a.flatten.flatten.toSeq == b.flatten.flatten.toSeq)
    // refined codebooks feed encode/ADC unchanged
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", 8, 16, 64, a)
    assert(codes.count() == emb.count())
  }

  test("semanticDedup collapses a transitive near-dup chain to one survivor") {
    // A(0°) ≈ B(18°) ≈ C(36°) at threshold 0.9: cos18° ≈ .951 ≥ .9 but
    // cos36° ≈ .809 < .9 — A and C are NOT a direct pair, only reachable
    // through B. The connected-components step must still collapse all
    // three onto rep A. D is orthogonal and untouched.
    def v(deg: Double): Array[Float] = {
      val a = Array.fill(64)(0f)
      a(0) = math.cos(math.toRadians(deg)).toFloat
      a(1) = math.sin(math.toRadians(deg)).toFloat
      a
    }
    val d = Array.fill(64)(0f); d(2) = 1f
    val emb = Seq((10L, v(0)), (11L, v(18)), (12L, v(36)), (13L, d))
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.9, planes = 2)
      .select("id", "rep", "kept").as[(Long, Long, Boolean)].collect().toSet
    assert(out == Set((10L, 10L, true), (11L, 10L, false), (12L, 10L, false),
      (13L, 13L, true)))
  }

  test("semanticDedup invariants on the real corpus: reps are minima, kept ⇔ self-rep") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val out = Similarity.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.5, planes = 4)
      .select("id", "rep", "kept").as[(Long, Long, Boolean)].collect()
    assert(out.length == emb.count(), "one row per corpus row")
    assert(out.forall { case (id, rep, kept) => rep <= id && kept == (rep == id) })
    // every cluster's rep is itself kept (the min member survives)
    val reps = out.map(_._2).toSet
    val keptIds = out.filter(_._3).map(_._1).toSet
    assert(reps.subsetOf(keptIds))
  }

  test("IVF top-k: self-match survives and recall vs brute force is reasonable") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(queries, emb, "vec_id", "vec_id", "embedding", k = 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(queries, emb, "vec_id", "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 3)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert((0L until 20L).forall(q => ivf.contains((q, q))), "self-match lost")
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall > 0.3, s"IVF recall too low: $recall")
  }

  test("IVF top-k works over arbitrary (string) ids; dense-numeric results unchanged") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    // same corpus, ids mapped to NON-numeric strings ("doc-0042"): the
    // seeding must not depend on ids being dense numerics
    val sEmb = emb.select(format_string("doc-%04d", col("vec_id")).as("vec_id"),
      col("embedding"))
    val sQueries = sEmb.filter(col("vec_id") < "doc-0020")
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(queries, emb, "vec_id", "vec_id", "embedding", k = 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val sIvf = Similarity.ivfTopK(sQueries, sEmb, "vec_id", "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 3)
      .select("query_id", "corpus_id").as[(String, String)].collect().toSet
    // self-match survives and recall holds — the functional bar, id-type-free
    assert((0 until 20).forall(q => sIvf.contains((f"doc-$q%04d", f"doc-$q%04d"))), "self-match lost")
    // zero-padded string order == numeric order here, so the string-id run
    // must select the SAME (query, corpus) pairs as the numeric-id run
    val ivf = Similarity.ivfTopK(queries, emb, "vec_id", "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 3)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(sIvf.map { case (q, c) => (q.drop(4).toLong, c.drop(4).toLong) } == ivf)
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall > 0.3, s"IVF recall too low: $recall")
    // refined path over string ids too (kmeansCentroids shares the seeding)
    val refined = Similarity.ivfTopK(sQueries, sEmb, "vec_id", "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 3, refineIters = 1)
      .select("query_id", "corpus_id").as[(String, String)].collect().toSet
    assert((0 until 20).forall(q => refined.contains((f"doc-$q%04d", f"doc-$q%04d"))))
  }

  test("k-means-refined IVF is deterministic and does not lose recall vs seeded") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    def run(iters: Int): Set[(Long, Long)] =
      Similarity.ivfTopK(queries, emb, "vec_id", "vec_id", "embedding",
        k = 5, nlist = 8, nprobe = 3, refineIters = iters)
        .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val brute = Similarity.bruteForceTopK(queries, emb, "vec_id", "vec_id", "embedding", k = 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val seeded = run(0)
    val refined = run(2)
    val rSeeded = (brute & seeded).size.toDouble / brute.size
    val rRefined = (brute & refined).size.toDouble / brute.size
    assert(rRefined >= rSeeded - 0.05, s"refined $rRefined < seeded $rSeeded")
    assert((0L until 20L).forall(q => refined.contains((q, q))), "self-match lost")
    // Lloyd in quantized space is fully deterministic: same input, same lists
    assert(run(2) == refined)
    // centroids actually moved off the seeds
    val c0 = Similarity.kmeansCentroids(emb, "vec_id", "embedding", nlist = 8, iters = 0)
    val c2 = Similarity.kmeansCentroids(emb, "vec_id", "embedding", nlist = 8, iters = 2)
    assert(c0.map(_._1) == c2.map(_._1))
    assert(c0.zip(c2).exists { case ((_, a), (_, b)) => !a.sameElements(b) })
  }

  test("kmeansCentroids: extreme nlist hits the Lloyd driver-reduction cap loudly") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    // each Lloyd round collects nlist*dim rows to the driver; the guard
    // must fire BEFORE any job runs (no partial work, no silent OOM path)
    val e = intercept[IllegalArgumentException] {
      Similarity.kmeansCentroids(emb, "vec_id", "embedding", nlist = 1000000, iters = 1)
    }
    assert(e.getMessage.contains("Lloyd driver-reduction cap"), e.getMessage)
  }

  test("persistent IVF index: searchIndexed == in-memory ivfTopK, probe IO is bucket-pruned") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val store = new graft.core.BucketedStore(tmpDir("ivfidx"), numBuckets = 16)
    Similarity.indexVectors(emb, "vec_id", "embedding", store, "ann", nlist = 16)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "corpus_id", "rank").as[(Long, Long, Int)].collect().toSet
    val mem = rows(Similarity.ivfTopK(queries, emb, "vec_id", "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 4))
    val idx = rows(Similarity.searchIndexed(queries, "vec_id", "embedding",
      store, "ann", k = 5, nprobe = 4))
    assert(idx == mem, "index route must be output-identical to the in-memory route")
    // a single query probes nprobe=2 lists -> readTouched must open at most
    // 2 of the 16 list buckets (the sub-linear serving contract)
    val one = Similarity.searchIndexed(emb.filter(col("vec_id") === 0), "vec_id",
      "embedding", store, "ann", k = 3, nprobe = 2)
    def bucketsOf(df: org.apache.spark.sql.DataFrame) =
      df.inputFiles.filter(_.contains("ann_lists"))
        .map(_.split("/__b=")(1).split("/")(0)).distinct.length
    val total = bucketsOf(store.read("ann_lists", Seq("cent_id")))
    val touched = bucketsOf(one)
    assert(touched >= 1 && touched <= 2 && touched < total,
      s"single-query probe read $touched of $total list buckets")
  }

  test("appendToVectorIndex: grown index answers == index rebuilt from the full corpus") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    // split so part1 keeps ids 0..15: seedCentroids picks the 16 smallest
    // ids, so part1's seeds == the union's seeds and grown/rebuilt share the
    // exact centroid geometry (assignment is centroid-relative)
    val part2 = emb.filter(col("vec_id") >= 16 && col("vec_id") % 4 === 0)
    val part1 = emb.filter(col("vec_id") < 16 || col("vec_id") % 4 =!= 0)
    val grown = new graft.core.BucketedStore(tmpDir("ivfgrow"), numBuckets = 16)
    Similarity.indexVectors(part1, "vec_id", "embedding", grown, "ann", nlist = 16)
    Similarity.appendToVectorIndex(part2, "vec_id", "embedding", grown, "ann")
    val rebuilt = new graft.core.BucketedStore(tmpDir("ivffull"), numBuckets = 16)
    Similarity.indexVectors(emb, "vec_id", "embedding", rebuilt, "ann", nlist = 16)
    val queries = emb.filter(col("vec_id") < 10)
    def rows(st: graft.core.BucketedStore) =
      Similarity.searchIndexed(queries, "vec_id", "embedding", st, "ann", k = 5, nprobe = 4)
        .select("query_id", "corpus_id", "rank").as[(Long, Long, Int)].collect().toSet
    val before = rows(grown)
    assert(before == rows(rebuilt))
    // compaction folds the appended dirs without changing any answer
    grown.compactBuckets("ann_lists", Seq("cent_id"))
    assert(rows(grown) == before)
  }

  test("relistVectorIndex: re-listed index == index rebuilt at the new geometry") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    // grow an index through appends from a small bootstrap (nlist=4 frozen),
    // then relist at the full-corpus geometry
    val part1 = emb.filter(col("vec_id") < 100)
    val part2 = emb.filter(col("vec_id") >= 100)
    val grown = new graft.core.BucketedStore(tmpDir("ivfrelist"), numBuckets = 16)
    Similarity.indexVectors(part1, "vec_id", "embedding", grown, "ann", nlist = 4)
    Similarity.appendToVectorIndex(part2, "vec_id", "embedding", grown, "ann")
    val newNlist = Similarity.relistVectorIndex(grown, "ann", nlist = 16)
    assert(newNlist == 16)
    val rebuilt = new graft.core.BucketedStore(tmpDir("ivfrelistref"), numBuckets = 16)
    Similarity.indexVectors(emb, "vec_id", "embedding", rebuilt, "ann", nlist = 16)
    val queries = emb.filter(col("vec_id") < 10)
    def rows(st: graft.core.BucketedStore) =
      Similarity.searchIndexed(queries, "vec_id", "embedding", st, "ann", k = 5, nprobe = 4)
        .select("query_id", "corpus_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(rows(grown) == rows(rebuilt),
      "relisted index must answer identically to one rebuilt at the same nlist")
    // the stored centroid table reflects the new geometry
    assert(grown.read("ann_centroids", Seq("cent_id")).count() == 16)
    // auto mode picks autoNlist(N) of the STORED corpus
    val autoN = Similarity.relistVectorIndex(grown, "ann")
    assert(autoN == Similarity.autoNlist(emb.count()))
    // time travel: the pre-relist list table is still readable
    val vs = grown.versions("ann_lists")
    assert(vs.size >= 3) // build, append, relist, auto-relist
    assert(grown.read("ann_lists", Seq("cent_id"), Some(vs.head)).count() == part1.count())
  }

  test("hardNegatives: never self, respects the near-dup cap, == brute-force tail at cap 1.0") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val anchors = emb.filter(col("vec_id") < 5)
    val out = Similarity.hardNegatives(anchors, emb, "vec_id", "vec_id",
        "embedding", k = 5)
      .select("anchor_id", "neg_id", "cosine", "neg_rank")
      .as[(Long, Long, Double, Int)].collect()
    assert(out.length == 25)
    assert(out.forall(r => r._1 != r._2), "an anchor mined itself as a negative")
    // cap 1.0 == the brute-force ranking with self dropped and re-ranked
    val bruteByAnchor = Similarity.bruteForceTopK(anchors, emb, "vec_id", "vec_id",
        "embedding", k = 6)
      .orderBy("query_id", "rank")
      .select("query_id", "corpus_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (a, rows) =>
        a -> rows.map(_._2).filter(_ != a).take(5).toSeq }
    out.groupBy(_._1).foreach { case (a, rows) =>
      assert(rows.sortBy(_._4).map(_._2).toSeq == bruteByAnchor(a), s"anchor $a")
    }
    // the near-dup exclusion cap holds
    val capped = Similarity.hardNegatives(anchors, emb, "vec_id", "vec_id",
        "embedding", k = 5, maxCosine = 0.5)
      .select("cosine").as[Double].collect()
    assert(capped.forall(_ <= 0.5))
  }

  test("embeddingDrift: identical snapshots score 0; a planted per-dim offset ranks first with the exact cleared mean shift; empty side is 0 by convention") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    // identical snapshots: every dimension's shift is exactly 0
    val same = Similarity.embeddingDrift(emb, emb, "embedding")
      .select("shift_micro", "direction").as[(Long, Int)].collect()
    assert(same.nonEmpty && same.forall(r => r._1 == 0L && r._2 == 0))
    // hand case with float-exact components (0.25/0.5/0.75): dim 0 means
    // are equal (0.5 both sides -> shift 0, direction 0); dim 1 exists only
    // in B with mean 0.25 -> cleared shift |0 - 250000*2| // (2*1) = 250000,
    // direction -1 (B higher), rank 1; all other dims 0, ties break pos asc
    def vec(xs: (Int, Float)*) = (0 until 64).map(i => xs.toMap.getOrElse(i, 0.0f))
    val a = Seq((0L, vec(0 -> 0.25f)), (1L, vec(0 -> 0.75f))).toDF("vec_id", "embedding")
    val b = Seq((2L, vec(0 -> 0.5f, 1 -> 0.25f))).toDF("vec_id", "embedding")
    val drift = Similarity.embeddingDrift(a, b, "embedding")
      .select("pos", "shift_micro", "direction", "rank")
      .as[(Int, Long, Int, Int)].collect().sortBy(_._4)
    assert(drift.length == 64)
    val top = drift.head
    assert(top == ((1, 250000L, -1, 1)), s"planted dim must rank 1 exactly: $top")
    assert(drift.tail.head._1 == 0 && drift.tail.head._2 == 0L && drift.tail.head._3 == 0,
      s"equal-mean dim scores 0: ${drift.tail.head}")
    assert(drift.tail.forall(r => r._2 == 0L && r._3 == 0))
    assert(drift.tail.map(_._1).toSeq == (0 +: (2 to 63)), "zero ties break pos asc")
    // empty snapshot: no distribution to drift from -> 0 everywhere (the
    // tokenDrift convention), and the join side vanishes without error
    val empty = Similarity.embeddingDrift(emb, emb.limit(0), "embedding")
      .select("shift_micro").as[Long].collect()
    assert(empty.forall(_ == 0L))
    // dim contract: the final rank is a partition-less window, safe only
    // on a dim-sized frame — an absurd dim must fail loudly at build time,
    // not funnel a corpus through one task
    val eDim = intercept[IllegalArgumentException](
      Similarity.embeddingDrift(emb, emb, "embedding", dim = 1000000))
    assert(eDim.getMessage.contains("4096"), s"dim guard by name: ${eDim.getMessage}")
    intercept[IllegalArgumentException](
      Similarity.embeddingDrift(emb, emb, "embedding", dim = 0))
  }

  test("embeddingDriftByGroup: each group is its own snapshot pair; drifted group flags its dim while stable group scores 0; one-side-empty group 0") {
    def vec(xs: (Int, Float)*) = (0 until 64).map(i => xs.toMap.getOrElse(i, 0.0f))
    // g1 drifts on dim 1 (the global hand case: B-only mass, shift 250000,
    // direction -1); g2 is identical across snapshots; g3 exists only in A
    val a = Seq((1, vec(0 -> 0.25f)), (1, vec(0 -> 0.75f)),
                (2, vec(4 -> 0.5f)), (3, vec(9 -> 1.0f)))
      .toDF("label", "embedding")
    val b = Seq((1, vec(0 -> 0.5f, 1 -> 0.25f)), (2, vec(4 -> 0.5f)))
      .toDF("label", "embedding")
    val out = Similarity.embeddingDriftByGroup(a, b, "embedding", "label")
      .select("label", "pos", "shift_micro", "direction", "rank")
      .as[(Int, Int, Long, Int, Int)].collect()
    assert(out.length == 3 * 64)
    val g1top = out.filter(r => r._1 == 1 && r._5 == 1).head
    assert(g1top == ((1, 1, 250000L, -1, 1)),
      s"g1 must reproduce the global hand case within its own totals: $g1top")
    assert(out.filter(r => r._1 == 1 && r._2 == 0).head._3 == 0L,
      "g1's equal-mean dim scores 0")
    assert(out.filter(_._1 == 2).forall(r => r._3 == 0L && r._4 == 0),
      "stable group scores 0 on every dimension")
    assert(out.filter(_._1 == 3).forall(r => r._3 == 0L && r._4 == 0),
      "one-side-empty group is 0 by convention, per group")
    // per-group rank is dense 1..64 within every group
    assert(out.groupBy(_._1).forall(_._2.map(_._5).sorted.sameElements(1 to 64)))
  }

  test("embeddingShapeDrift: planted VARIANCE-ONLY shift ranks first with the hand-computed chi-square while the mean monitor scores it 0") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    // identical snapshots: every dimension's chi-square is exactly 0
    val same = Similarity.embeddingShapeDrift(emb, emb, "embedding")
      .select("chi2_micro").as[Long].collect()
    assert(same.nonEmpty && same.forall(_ == 0L))
    // planted case: dim 5 keeps its MEAN (0 both sides) but B triples the
    // spread — ±0.1 vs ±0.3. Width 31250 micro: ±100000 -> bins 3/-4,
    // ±300000 -> floor(±9.6) clamped to 7/-8. Four one-sided buckets, each
    // contributing 1e6*(1*2-0*2)^2 // ((1+0)*2*2) = 1000000 -> chi2 4000000.
    def vec(xs: (Int, Float)*) = (0 until 64).map(i => xs.toMap.getOrElse(i, 0.0f))
    val a = Seq((0L, vec(5 -> 0.1f)), (1L, vec(5 -> -0.1f))).toDF("vec_id", "embedding")
    val b = Seq((2L, vec(5 -> 0.3f)), (3L, vec(5 -> -0.3f))).toDF("vec_id", "embedding")
    val shape = Similarity.embeddingShapeDrift(a, b, "embedding")
      .select("pos", "t_a", "t_b", "chi2_micro", "rank")
      .as[(Int, Long, Long, Long, Int)].collect().sortBy(_._5)
    assert(shape.length == 64)
    assert(shape.head == ((5, 2L, 2L, 4000000L, 1)),
      s"planted variance dim must rank 1 with the exact chi2: ${shape.head}")
    assert(shape.tail.forall(_._4 == 0L), "all equal-shape dims score 0")
    assert(shape.tail.map(_._1).toSeq == ((0 to 4) ++ (6 to 63)),
      "zero ties break pos asc")
    // the SAME input through the mean monitor: dim 5's means are equal, so
    // embeddingDrift provably scores the shift 0 — the complementarity
    // this op exists for
    val mean = Similarity.embeddingDrift(a, b, "embedding")
      .select("shift_micro").as[Long].collect()
    assert(mean.forall(_ == 0L),
      "variance-only shift must be invisible to the mean monitor")
    // empty snapshot: 0 by convention everywhere, no divide-by-zero abort
    val empty = Similarity.embeddingShapeDrift(emb, emb.limit(0), "embedding")
      .select("chi2_micro").as[Long].collect()
    assert(empty.forall(_ == 0L))
    // contracts: dim / bins / width guards fire by name
    intercept[IllegalArgumentException](
      Similarity.embeddingShapeDrift(emb, emb, "embedding", dim = 5000))
    intercept[IllegalArgumentException](
      Similarity.embeddingShapeDrift(emb, emb, "embedding", bins = 3))
    intercept[IllegalArgumentException](
      Similarity.embeddingShapeDrift(emb, emb, "embedding", binWidthMicro = 0))
  }

  test("semanticDecontaminate: self is contamination at 1.0; near-paraphrase flagged, far vectors clean; ties attribute to smaller eval id; guard by name") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    def vec(xs: (Int, Float)*) = (0 until 64).map(i => xs.toMap.getOrElse(i, 0.0f))
    // corpus: 10 = exact copy of eval 0; 11 = near-paraphrase (same
    // direction + small orthogonal noise); 12 = orthogonal (clean)
    val evalSet = Seq((0L, vec(0 -> 1.0f)), (1L, vec(1 -> 1.0f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, vec(0 -> 1.0f)),
      (11L, vec(0 -> 1.0f, 2 -> 0.1f)),
      (12L, vec(3 -> 1.0f))).toDF("vec_id", "embedding")
    val out = Similarity.semanticDecontaminate(corpus, evalSet,
        "vec_id", "vec_id", "embedding", threshold = 0.9)
      .select("corpus_id", "max_eval_cosine", "nearest_eval_id", "contaminated")
      .as[(Long, Double, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out.map(_._1) == Seq(10L, 11L, 12L))
    assert(out(0)._2 == 1.0 && out(0)._3 == 0L && out(0)._4,
      s"exact copy must flag at 1.0 against eval 0: ${out(0)}")
    assert(out(1)._4 && out(1)._3 == 0L && out(1)._2 > 0.99 && out(1)._2 < 1.0,
      s"paraphrase must flag below 1.0: ${out(1)}")
    assert(!out(2)._4 && out(2)._2 == 0.0, s"orthogonal doc is clean: ${out(2)}")
    // tie attribution: a corpus vector equidistant from BOTH eval items
    // must attribute to the smaller eval id
    val tied = Seq((20L, vec(0 -> 1.0f, 1 -> 1.0f))).toDF("vec_id", "embedding")
    val t = Similarity.semanticDecontaminate(tied, evalSet,
        "vec_id", "vec_id", "embedding", threshold = 0.5)
      .select("nearest_eval_id").as[Long].head()
    assert(t == 0L, s"cosine tie must break toward the smaller eval id, got $t")
    // empty eval set: vacuously nothing to flag
    assert(Similarity.semanticDecontaminate(corpus, evalSet.limit(0),
      "vec_id", "vec_id", "embedding", threshold = 0.9).count() == 0L)
    // the broadcast contract fires loudly, by name, pointing at the
    // indexed route
    val e = intercept[Exception] {
      Similarity.semanticDecontaminate(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "vec_id", "embedding", threshold = 0.9,
        maxBroadcastEval = 2L).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("maxBroadcastEval"), s"guard must fail by name: $msg")
    assert(msg.contains("searchIndexed"), "guard must point at the indexed route")
    intercept[IllegalArgumentException](Similarity.semanticDecontaminate(
      corpus, evalSet, "vec_id", "vec_id", "embedding", threshold = 1.5))
  }

  test("embeddingShapeDriftByGroup: planted variance shift isolates to its group; stable and one-side-empty groups score 0") {
    def vec(xs: (Int, Float)*) = (0 until 64).map(i => xs.toMap.getOrElse(i, 0.0f))
    // g1 is the global shape-drift hand case (same mean, tripled spread on
    // dim 5 -> chi2 4000000); g2 identical distributions; g3 only in A
    val a = Seq((1, vec(5 -> 0.1f)), (1, vec(5 -> -0.1f)),
                (2, vec(3 -> 0.2f)), (3, vec(7 -> 1.0f)))
      .toDF("label", "embedding")
    val b = Seq((1, vec(5 -> 0.3f)), (1, vec(5 -> -0.3f)),
                (2, vec(3 -> 0.2f))).toDF("label", "embedding")
    val out = Similarity.embeddingShapeDriftByGroup(a, b, "embedding", "label")
      .select("label", "pos", "chi2_micro", "rank")
      .as[(Int, Int, Long, Int)].collect()
    assert(out.length == 3 * 64)
    val g1top = out.filter(r => r._1 == 1 && r._4 == 1).head
    assert(g1top == ((1, 5, 4000000L, 1)),
      s"g1 must reproduce the global hand case within its own totals: $g1top")
    assert(out.filter(r => r._1 == 1 && r._2 != 5).forall(_._3 == 0L))
    assert(out.filter(_._1 == 2).forall(_._3 == 0L), "stable group scores 0")
    assert(out.filter(_._1 == 3).forall(_._3 == 0L),
      "one-side-empty group is 0 by convention, per group")
    assert(out.groupBy(_._1).forall(_._2.map(_._4).sorted.sameElements(1 to 64)),
      "per-group rank is dense 1..64")
  }

  test("hardNegatives: anchor-broadcast contract guard fires loudly, by name") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val anchors = emb.filter(col("vec_id") < 5) // 5 anchors > cap of 2
    val e = intercept[Exception] {
      Similarity.hardNegatives(anchors, emb, "vec_id", "vec_id",
        "embedding", k = 3, maxBroadcastAnchors = 2L).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("maxBroadcastAnchors"),
      s"guard must fail by name, got: $msg")
    assert(msg.contains("searchIndexed"),
      "guard must point at the sharded-index route for corpus-scale anchors")
    // the cap itself must be >= 1 — there is no non-broadcast route inside
    intercept[IllegalArgumentException](Similarity.hardNegatives(
      anchors, emb, "vec_id", "vec_id", "embedding", k = 3,
      maxBroadcastAnchors = 0L))
    // results under a generous cap are unchanged vs the default
    val a2 = emb.filter(col("vec_id") < 3)
    val base = Similarity.hardNegatives(a2, emb, "vec_id", "vec_id",
      "embedding", k = 4).orderBy("anchor_id", "neg_rank").collect().toSeq
    val guarded = Similarity.hardNegatives(a2, emb, "vec_id", "vec_id",
      "embedding", k = 4, maxBroadcastAnchors = 3L)
      .orderBy("anchor_id", "neg_rank").collect().toSeq
    assert(base == guarded)
  }

  test("mmrSelect: hand case, λ=1 == relevance ranking, λ=0 == most-diverse, k>n exhausts") {
    // q = e1; id0 = q itself, id2 ≈ q, id1 ⟂ q. λ=0.7: pick1 = id0 (rel 1);
    // pick2 = id2 (0.7·rel − 0.3·sim ≈ 0.4·0.998 > id1's 0); pick3 = id1
    def vec(xs: (Int, Float)*) =
      (0 until 64).map(i => xs.toMap.getOrElse(i, 0.0f))
    val tiny = Seq(
      (0L, vec(0 -> 1.0f)),
      (1L, vec(1 -> 1.0f)),
      (2L, vec(0 -> 1.0f, 1 -> 0.05f))).toDF("vec_id", "embedding")
    val q0 = tiny.filter(col("vec_id") === 0)
    val hand = Similarity.mmrSelect(tiny, "vec_id", "embedding", q0, "embedding",
        k = 5, lambdaMicro = 700000L)
      .orderBy("rank").select("rank", "vec_id").as[(Int, Long)].collect().toSeq
    assert(hand == Seq((1, 0L), (2, 2L), (3, 1L)), s"got $hand (k>n exhausts at 3)")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val query = emb.filter(col("vec_id") === 0)
    // λ=1: the penalty vanishes — the greedy sequence IS the brute-force
    // relevance ranking (same (cosine desc, id asc) total order)
    val rel = Similarity.mmrSelect(emb, "vec_id", "embedding", query, "embedding",
        k = 5, lambdaMicro = 1000000L)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    val brute = Similarity.bruteForceTopK(query, emb, "vec_id", "vec_id",
        "embedding", k = 5)
      .orderBy("rank").select("corpus_id").as[Long].collect().toSeq
    assert(rel == brute, "pure-relevance MMR must equal the brute-force ranking")
    // λ=0: pure diversity — round 1 is all-ties (smallest id), round 2 is
    // the minimal CLAMPED cosine to it (ties → smaller id)
    val pool = emb.filter(col("vec_id") < 50)
    val div = Similarity.mmrSelect(pool, "vec_id", "embedding", query, "embedding",
        k = 2, lambdaMicro = 0L)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(div.head == 0L)
    val cosTo0 = Similarity.bruteForceTopK(query, pool, "vec_id", "vec_id",
        "embedding", k = 50)
      .select("corpus_id", "cosine").as[(Long, Double)].collect()
    val expected = cosTo0.filter(_._1 != 0L)
      .minBy { case (id, c) => (math.max(0.0, c), id) }._1
    assert(div(1) == expected, s"λ=0 round 2 must take the least-similar (got ${div(1)}, want $expected)")
  }

  test("ivfRecallCurve: monotone, full-probe recall is 1.0, found@p == |ivfTopK(p) ∩ truth|") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val curve = Similarity.ivfRecallCurve(queries, emb, "vec_id", "vec_id",
        "embedding", k = 10, nlist = 16).orderBy("nprobe")
      .select("nprobe", "n_found", "n_true", "recall_micro")
      .as[(Int, Long, Long, Long)].collect()
    assert(curve.length == 16)
    assert(curve.map(_._1).sameElements(1 to 16))
    assert(curve.sliding(2).forall(p => p(0)._2 <= p(1)._2),
      "found counts must be monotone non-decreasing in nprobe")
    assert(curve.last._4 == 1000000L, "probing every list must find the full truth")
    // the curve's found@p is EXACTLY what the search op would return: the
    // true neighbors whose assigned lists sit in the first p probes (the
    // (cosine desc, id asc) total order makes the equivalence rigorous —
    // a probed true neighbor is outranked only by other truth members)
    val truth = Similarity.bruteForceTopK(queries, emb, "vec_id", "vec_id",
        "embedding", k = 10)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(curve.head._3 == truth.size)
    for (p <- Seq(1, 2, 4)) {
      val served = Similarity.ivfTopK(queries, emb, "vec_id", "vec_id",
          "embedding", k = 10, nlist = 16, nprobe = p)
        .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
      assert(curve(p - 1)._2 == served.intersect(truth).size, s"nprobe=$p")
    }
  }

  test("PQ index append + relist: grown-then-relisted == rebuilt; old versions vacuumable") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val part1 = emb.filter(col("vec_id") < 100)
    val part2 = emb.filter(col("vec_id") >= 100)
    val grown = new graft.core.BucketedStore(tmpDir("pqgrow"), numBuckets = 16)
    Similarity.indexVectorsPq(part1, "vec_id", "embedding", grown, "ann",
      nlist = 4, m = 8, ksub = 16)
    Similarity.appendToPqIndex(part2, "vec_id", "embedding", grown, "ann")
    // O(batch) append covered the full corpus
    assert(grown.read("ann_pqlists", Seq("cent_id")).count() == emb.count())
    val queries = emb.filter(col("vec_id") < 10)
    def rows(st: graft.core.BucketedStore) =
      Similarity.searchIndexedPq(queries, "vec_id", "embedding", st, "ann",
          k = 5, nprobe = 4)
        .select("query_id", "corpus_id", "adc_dist", "rank")
        .as[(Long, Long, Long, Int)].collect().toSet
    // geometry pinned by the append: part1's codeword queries still
    // self-hit at rank 1 with ADC 0 (nprobe=4 of nlist=4 probes every list)
    assert(rows(grown).count { case (q, c, d, r) => r == 1 && q == c && d == 0L } == 10)
    // appended vectors ARE served through the grown index
    val probe2 = emb.filter(col("vec_id") >= 100 && col("vec_id") < 105)
    val hits = Similarity.searchIndexedPq(probe2, "vec_id", "embedding", grown, "ann",
        k = 5, nprobe = 4)
      .select("query_id", "corpus_id").as[(Long, Long)].collect()
    assert(hits.exists(_._2 >= 100), hits.mkString(","))
    // relist at the full-corpus geometry == an index rebuilt fresh from it
    val newN = Similarity.relistPqIndex(emb, "vec_id", "embedding", grown, "ann",
      nlist = 16)
    assert(newN == 16)
    val rebuilt = new graft.core.BucketedStore(tmpDir("pqrebuild"), numBuckets = 16)
    Similarity.indexVectorsPq(emb, "vec_id", "embedding", rebuilt, "ann",
      nlist = 16, m = 8, ksub = 16)
    assert(rows(grown) == rows(rebuilt),
      "relisted PQ index must answer identically to one rebuilt at the same geometry")
    // time travel: the pre-relist list table is still readable
    val vs = grown.versions("ann_pqlists")
    assert(vs.size >= 2)
    assert(grown.read("ann_pqlists", Seq("cent_id"), Some(vs.head)).count() == part1.count())
    // vacuum drops the pre-relist versions; the served answer is unchanged
    val removed = grown.vacuum("ann_pqlists", keepVersions = 1)
    assert(removed.nonEmpty)
    assert(rows(grown) == rows(rebuilt))
    // auto mode picks autoNlist(N) of the given corpus
    val autoN = Similarity.relistPqIndex(emb, "vec_id", "embedding", grown, "ann")
    assert(autoN == Similarity.autoNlist(emb.count()))
  }

  test("relistVectorIndex with refineIters: deterministic and answers stay index-consistent") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val store = new graft.core.BucketedStore(tmpDir("ivfrelistkm"), numBuckets = 16)
    Similarity.indexVectors(emb, "vec_id", "embedding", store, "ann", nlist = 4)
    Similarity.relistVectorIndex(store, "ann", nlist = 8, refineIters = 2)
    // refined relist must agree with the in-memory refined route over the
    // same corpus and geometry (kmeansCentroidsQ shares the Lloyd loop)
    val queries = emb.filter(col("vec_id") < 10)
    val idx = Similarity.searchIndexed(queries, "vec_id", "embedding", store, "ann",
        k = 5, nprobe = 3)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val mem = Similarity.ivfTopK(queries, emb, "vec_id", "vec_id", "embedding",
        k = 5, nlist = 8, nprobe = 3, refineIters = 2)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(idx == mem)
  }

  test("embedding drift by group from profiles: BOTH per-group monitors served from one stored profile pair == direct routes") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b = emb.filter(col("vec_id") % 2 === 1)
    val profA = Similarity.embeddingProfileByGroup(a, "embedding", "label")
    val profB = Similarity.embeddingProfileByGroup(b, "embedding", "label")
    // mean monitor
    def meanRows(df: org.apache.spark.sql.DataFrame) = df
      .select("label", "pos", "n_a", "n_b", "s_a", "s_b", "shift_micro",
        "direction", "rank")
      .as[(Int, Int, Long, Long, Long, Long, Long, Int, Int)]
      .collect().sortBy(r => (r._1, r._9)).toSeq
    val meanDirect = meanRows(
      Similarity.embeddingDriftByGroup(a, b, "embedding", "label"))
    assert(meanDirect.nonEmpty &&
      meanRows(Similarity.embeddingDriftByGroupFromProfiles(profA, profB, "label"))
        == meanDirect,
      "per-group mean drift served from profiles must equal the direct route")
    // shape monitor, from the SAME profiles
    def shapeRows(df: org.apache.spark.sql.DataFrame) = df
      .select("label", "pos", "t_a", "t_b", "chi2_micro", "rank")
      .as[(Int, Int, Long, Long, Long, Int)]
      .collect().sortBy(r => (r._1, r._6)).toSeq
    val shapeDirect = shapeRows(
      Similarity.embeddingShapeDriftByGroup(a, b, "embedding", "label"))
    assert(shapeDirect.nonEmpty &&
      shapeRows(Similarity.embeddingShapeDriftByGroupFromProfiles(profA, profB, "label"))
        == shapeDirect,
      "per-group shape drift served from the same profiles must equal the direct route")
    // padding convention survives the profile round-trip: short vectors'
    // padded positions count into bin 0 with s += 0 on both routes
    def vec(n: Int, xs: (Int, Float)*) = (0 until n).map(i => xs.toMap.getOrElse(i, 0.0f))
    val shortA = Seq((1, vec(3, 0 -> 0.5f)), (2, vec(64, 1 -> 0.25f)))
      .toDF("label", "embedding")
    val shortB = Seq((1, vec(64, 0 -> 0.5f)), (2, vec(5, 1 -> 0.75f)))
      .toDF("label", "embedding")
    val sDirect = meanRows(
      Similarity.embeddingDriftByGroup(shortA, shortB, "embedding", "label"))
    val sServed = meanRows(Similarity.embeddingDriftByGroupFromProfiles(
      Similarity.embeddingProfileByGroup(shortA, "embedding", "label"),
      Similarity.embeddingProfileByGroup(shortB, "embedding", "label"), "label"))
    assert(sServed == sDirect, "padded positions must fold back identically")
  }

  test("embeddingDriftAttribution: hand-computed pulls in BOTH drift directions; ties break to smaller id; guards by name") {
    def vec(xs: (Int, Float)*) = (0 until 64).map(i => xs.toMap.getOrElse(i, 0.0f))
    // dim 0 drifts DOWN (A mean 0.5 -> B mean 0.2): direction +1,
    //   shift = (1e6*3 - 6e5*2) // 6 = 300000; contrib = s_a - 2q
    // dim 1 drifts UP (A mean 0 -> B mean 0.4/3): direction -1,
    //   shift = |0 - 4e5*2| // 6 = 133333; contrib = 2q
    val a = Seq((0L, vec(0 -> 0.25f)), (1L, vec(0 -> 0.75f)))
      .toDF("vec_id", "embedding")
    val b = Seq((10L, vec(0 -> 0.1f)), (11L, vec(0 -> 0.2f, 1 -> 0.4f)),
                (12L, vec(0 -> 0.3f))).toDF("vec_id", "embedding")
    val out = Similarity.embeddingDriftAttribution(a, b, "vec_id", "embedding",
        topD = 2, topK = 2)
      .select("pos", "shift_micro", "direction", "vec_id", "comp_micro",
        "contrib_scaled", "contrib_rank")
      .as[(Int, Long, Int, Long, Long, Long, Int)]
      .collect().sortBy(r => (r._1, r._7)).toSeq
    assert(out == Seq(
      (0, 300000L, 1, 10L, 100000L, 800000L, 1),
      (0, 300000L, 1, 11L, 200000L, 600000L, 2),
      (1, 133333L, -1, 11L, 400000L, 800000L, 1),
      (1, 133333L, -1, 10L, 0L, 0L, 2)), // zero tie -> smaller id
      s"hand case mismatch: $out")
    // contracts fire by name
    intercept[IllegalArgumentException](Similarity.embeddingDriftAttribution(
      a, b, "vec_id", "embedding", topD = 100))
    intercept[IllegalArgumentException](Similarity.embeddingDriftAttribution(
      a, b, "vec_id", "embedding", topK = 0))
  }

  test("embeddingDriftAttributionByGroup == the global op per label slice (zero-direction dims dropped); identical snapshots attribute nothing") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b = emb.filter(col("vec_id") % 2 === 1)
    val grouped = Similarity.embeddingDriftAttributionByGroup(a, b,
        "vec_id", "embedding", "label", topD = 3, topK = 5)
      .select("label", "pos", "shift_micro", "direction", "vec_id",
        "comp_micro", "contrib_scaled", "contrib_rank")
      .as[(Int, Int, Long, Int, Long, Long, Long, Int)].collect().toSeq
    assert(grouped.nonEmpty)
    grouped.map(_._1).distinct.foreach { lbl =>
      val global = Similarity.embeddingDriftAttribution(
          a.filter(col("label") === lbl), b.filter(col("label") === lbl),
          "vec_id", "embedding", topD = 3, topK = 5)
        .where(col("direction") =!= 0)
        .select("pos", "shift_micro", "direction", "vec_id", "comp_micro",
          "contrib_scaled", "contrib_rank")
        .as[(Int, Long, Int, Long, Long, Long, Int)].collect().toSet
      val slice = grouped.filter(_._1 == lbl)
        .map(r => (r._2, r._3, r._4, r._5, r._6, r._7, r._8)).toSet
      assert(slice == global, s"label $lbl: grouped slice != global")
    }
    assert(Similarity.embeddingDriftAttributionByGroup(a, a, "vec_id",
      "embedding", "label", topD = 3, topK = 5).count() == 0L)
  }
}

class ShardsSpec extends SparkSpec {
  import spark.implicits._

  test("sampleNegatives: k distinct non-self negatives, full ring at k=N-1, reproducible") {
    val docs = Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 100)
    val anchors = docs.filter(col("doc_id") < 10)
    def run(seed: Long) = Shards.sampleNegatives(anchors, "doc_id",
        docs, "doc_id", k = 99, nCorpus = 100L, payloadCols = Seq("n_chars"),
        seed = seed)
      .select("anchor_id", "neg_rank", "neg_id")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val out = run(3L)
    assert(out.length == 10 * 99)
    out.groupBy(_._1).foreach { case (a, rows) =>
      val negs = rows.map(_._3)
      assert(!negs.contains(a), s"anchor $a sampled itself")
      // at k = N-1 the ring provably covers every non-self id exactly once
      assert(negs.toSet == (0L until 100L).toSet - a, s"anchor $a ring incomplete")
    }
    assert(run(3L) == out, "same seed must reproduce bit-identically")
    assert(run(4L) != out, "a different seed must permute")
    // guards: k beyond the distinctness bound, degenerate corpus
    intercept[IllegalArgumentException](Shards.sampleNegatives(
      anchors, "doc_id", docs, "doc_id", k = 100, nCorpus = 100L))
    intercept[IllegalArgumentException](Shards.sampleNegatives(
      anchors, "doc_id", docs, "doc_id", k = 1, nCorpus = 1L))
  }

  test("sampleNegatives: a holed id space violates the dense-id contract LOUDLY") {
    // post-dedup shape: ids [0, 100) with 37 removed — the ring can land on
    // 37, and silently under-delivering negatives for that anchor is the
    // failure the in-plan guard closes
    val holed = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") < 100 && col("doc_id") =!= 37)
    val anchors = holed.filter(col("doc_id") < 10)
    val e = intercept[Exception] {
      Shards.sampleNegatives(anchors, "doc_id", holed, "doc_id",
        k = 99, nCorpus = 100L, payloadCols = Seq("n_chars")).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("dense-id"), s"must fail naming the contract, got: $msg")
    // the guard survives column pruning: a consumer keeping only ONE key
    // column (anchor_id + payload) must still raise — the check rides all
    // three key columns, so pruning neg_id/neg_rank can't erase it
    val e2 = intercept[Exception] {
      Shards.sampleNegatives(anchors, "doc_id", holed, "doc_id",
          k = 99, nCorpus = 100L, payloadCols = Seq("n_chars"))
        .select("anchor_id", "n_chars").collect()
    }
    val msg2 = Option(e2.getMessage).getOrElse("") +
      Option(e2.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg2.contains("dense-id"),
      s"guard pruned away with the neg_id column, got: $msg2")
    // and a dense corpus still sails through the guarded join unchanged
    val dense = Tables.load(spark, sfDir, "documents").filter(col("doc_id") < 100)
    val ok = Shards.sampleNegatives(anchors, "doc_id", dense, "doc_id",
      k = 5, nCorpus = 100L, payloadCols = Seq("n_chars"))
    assert(ok.count() == anchors.count() * 5)
  }

  test("batchByLength: bounded batches of near-equal lengths; per-batch max is the pad target") {
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "n_chars")
    val out = Shards.batchByLength(docs, "doc_id", "n_chars",
      batchSize = 8, bucketWidth = 50)
    assert(out.count() == docs.count(), "batching must not drop or duplicate rows")
    // batch invariants: ≤ batchSize rows, pos is a 0..size-1 permutation,
    // batch_max_len == the batch's true max length
    val bad = out.groupBy("bucket", "batch").agg(
        count(lit(1)).as("sz"), max("pos").as("mx"), count_distinct(col("pos")).as("np"),
        max("n_chars").as("truemax"), first("batch_max_len").as("claimed"),
        count_distinct(col("batch_max_len")).as("nclaims"))
      .where(col("sz") > 8 || col("mx") =!= col("sz") - 1 || col("np") =!= col("sz") ||
        col("truemax") =!= col("claimed") || col("nclaims") =!= 1)
    assert(bad.count() == 0, s"batch invariant violations:\n${bad.collect().mkString("\n")}")
    // every row's length lands inside its bucket's range
    assert(out.where(floor(col("n_chars").cast("double") / 50) =!= col("bucket")).count() == 0)
    // padding efficiency must beat (or match) one-global-batch padding
    val (len, pad) = out.agg(sum(col("n_chars")), sum(col("batch_max_len")))
      .as[(Long, Long)].head()
    val globalMax = docs.agg(max("n_chars")).as[Long].head()
    assert(pad <= globalMax * docs.count(), "bucketed padding must not exceed global-max padding")
    assert(len <= pad)
  }

  test("temperatureMixture: T=1 keeps all; T=0.5 keeps the smallest source whole and flattens") {
    val df = ((1L to 1000L).map(i => (i, "big")) ++ (2001L to 2010L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    assert(TextOps.temperatureMixture(df, "doc_id", "source", 1.0).count() == 1010)
    val kept = TextOps.temperatureMixture(df, "doc_id", "source", 0.5)
    val bySrc = kept.groupBy("source").count().as[(String, Long)].collect().toMap
    // rel = n^(T-1) is maximal for the SMALLEST source → it keeps rate 1
    assert(bySrc.getOrElse("small", 0L) == 10L)
    // big keeps ≈ sqrt(10/1000) = 10% — deterministic, bounded loosely here
    val bigKept = bySrc.getOrElse("big", 0L)
    assert(bigKept > 50 && bigKept < 200, s"big source kept $bigKept of 1000")
    // reproducible row-for-row
    val again = TextOps.temperatureMixture(df, "doc_id", "source", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept.select("doc_id").as[Long].collect().toSet)
  }

  test("assign is deterministic, covers every shard, and balances within reason") {
    val docs = Tables.load(spark, sfDir, "documents")
    val a = Shards.assign(docs, "doc_id", 8)
      .select("doc_id", "shard", "ord").as[(Long, Long, Long)].collect()
    val b = Shards.assign(docs, "doc_id", 8)
      .select("doc_id", "shard", "ord").as[(Long, Long, Long)].collect()
    assert(a.toSet == b.toSet, "assignment must be deterministic")
    val sizes = a.groupBy(_._2).map(_._2.length)
    assert(a.map(_._2).toSet == (0L until 8L).toSet, "some shard is empty")
    assert(sizes.max <= 3 * sizes.min, s"shards badly unbalanced: $sizes")
    // a different seed re-shuffles
    val c = Shards.assign(docs, "doc_id", 8, seed = "other")
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    val aMap = a.map(t => t._1 -> t._2).toMap
    assert(aMap != c, "seed has no effect on shard placement")
  }

  test("shuffled: contiguous sorted shard runs, invariant to input partitioning") {
    val docs = Tables.load(spark, sfDir, "documents").limit(400)
    def partitionOrders(in: org.apache.spark.sql.DataFrame) =
      Shards.shuffled(in, "doc_id", 4)
        .select("shard", "ord", "doc_id").rdd
        .mapPartitions(it => Iterator(it.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList))
        .collect().toSeq
    val p1 = partitionOrders(docs)
    val p2 = partitionOrders(docs.repartition(13))
    assert(p1.length == 4, "repartition must produce nShards tasks")
    // within every task: shard runs contiguous and each sorted by the draw
    // (the hash partitioner may map two shard ids into one task — the
    // write contract survives that because the sort leads with shard)
    assert(p1.forall(p => p == p.sorted), "rows not sorted by (shard, draw) within a task")
    assert(p1.flatten.map(_._1).toSet == Set(0L, 1L, 2L, 3L), "missing shard")
    // the same reproducible order regardless of how the input was partitioned
    assert(p1 == p2, "shard order depends on input partitioning")
  }
}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("bucketed interval join == plain non-equi join; plan is an equi join") {
    val points = Seq((1L, ts("2024-01-01 10:15:00")), (2L, ts("2024-01-01 11:45:00")),
      (3L, ts("2024-01-01 23:59:00"))).toDF("pid", "pts")
    val ivals = Seq((10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (20L, ts("2024-01-01 11:30:00"), ts("2024-01-01 12:30:00"))).toDF("iid", "s0", "e0")
    val got = RangeJoin.bucketedIntervalJoin(points, "pts", ivals, "s0", "e0", 600L * 1000000)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val plain = points.join(ivals, col("pts") >= col("s0") && col("pts") <= col("e0"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == plain && got == Set((1L, 10L), (2L, 20L)))
    // the join is keyed (SortMergeJoin/ShuffledHashJoin/BroadcastHashJoin on
    // __bucket), never a nested-loop over all pairs
    val plan = RangeJoin.bucketedIntervalJoin(points, "pts", ivals, "s0", "e0", 600L * 1000000)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }

  test("toLocalIterator streams results without materializing the frame on the driver") {
    val it = spark.range(1000).toDF("id").toLocalIterator()
    assert(it.hasNext && it.next().getLong(0) == 0L)
  }
}

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join == plain join, and the hot key spreads across all salts") {
    val salts = 8
    // 1200 of 2000 left rows share key 1 — the hot key
    val left = spark.range(2000).select(
      when(col("id") < 1200, lit(1L)).otherwise(col("id")).as("k"), col("id").as("payload"))
    val right = spark.range(2000).select(col("id").as("k"), (col("id") * 2).as("v"))
    val plain = left.join(right, Seq("k")).select("payload", "v")
      .as[(Long, Long)].collect().toSet
    val salted = SkewJoin.saltedEquiJoin(left, right, Seq("k"), salts).select("payload", "v")
      .as[(Long, Long)].collect().toSet
    assert(salted == plain)
    // the salt is a pure row function: recomputing assigns identical salts
    val saltExpr = pmod(xxhash64(col("k"), col("payload")), lit(salts))
    val spread = left.filter(col("k") === 1).select(saltExpr).distinct().count()
    assert(spread == salts, s"hot key only reached $spread of $salts salt partitions")
    val a = left.select(saltExpr.as("s")).as[Long].collect()
    val b = left.select(saltExpr.as("s")).as[Long].collect()
    assert(a.sameElements(b), "salt assignment must be deterministic")
  }

  test("hotKeys finds exactly the heavy hitters") {
    // key 1 owns 60% of rows, key 2 owns 20%, the rest are singletons
    val left = spark.range(1000).select(
      when(col("id") < 600, lit(1L)).when(col("id") < 800, lit(2L))
        .otherwise(col("id")).as("k"))
    val hot = SkewJoin.hotKeys(left, Seq("k"), hotFraction = 0.1)
    assert(hot.map(_.head).toSet == Set(1L, 2L), s"got $hot")
  }

  test("hotKeySaltedJoin == plain join, hot slice salted, cold slice not replicated") {
    val salts = 4
    val left = spark.range(500).select(
      when(col("id") < 300, lit(1L)).otherwise(col("id")).as("k"), col("id").as("payload"))
    val right = spark.range(500).select(col("id").as("k"), (col("id") * 3).as("v"))
    val plain = left.join(right, Seq("k")).select("payload", "v")
      .as[(Long, Long)].collect().toSet
    val twoPath = SkewJoin.autoSaltedJoin(left, right, Seq("k"), salts, hotFraction = 0.1)
      .select("payload", "v").as[(Long, Long)].collect().toSet
    assert(twoPath == plain)
  }

  test("hotKeySaltedJoin preserves null-keyed rows (cold path) on inner/left") {
    val left = Seq((Some(1L), "h1"), (Some(1L), "h2"), (None, "ln"), (Some(9L), "lc"))
      .toDF("k", "payload")
    val right = Seq((Some(1L), "r1"), (None, "rn"), (Some(7L), "rc")).toDF("k", "v")
    val hot = Seq(Seq(1L: java.lang.Long))
    for (jt <- Seq("inner", "left")) {
      val exp = left.join(right, Seq("k"), jt).select("payload", "v")
        .as[(Option[String], Option[String])].collect().toSet
      val got = SkewJoin.hotKeySaltedJoin(left, right, Seq("k"), 4, hot, jt)
        .select("payload", "v").as[(Option[String], Option[String])].collect().toSet
      assert(got == exp, s"$jt: $got != $exp")
    }
    // right/full outer would multiply unmatched right rows ×salts — refused
    intercept[IllegalArgumentException] {
      SkewJoin.hotKeySaltedJoin(left, right, Seq("k"), 4, hot, "full")
    }
  }

  test("saltCols that only repeat the join keys are refused (salt would be constant per key)") {
    val left = Seq((1L, "a"), (1L, "b")).toDF("k", "payload")
    val right = Seq((1L, "r")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      SkewJoin.saltedEquiJoin(left, right, Seq("k"), 4, saltCols = Seq("k"))
    }
    // keys + a varying column is the documented 100 TB shape — accepted
    val ok = SkewJoin.saltedEquiJoin(left, right, Seq("k"), 4, saltCols = Seq("k", "payload"))
    assert(ok.count() == 2)
  }
}

class SafeMapSpec extends SparkSpec {
  import spark.implicits._

  test("safeUdf captures exceptions as data; job completes") {
    val f = SafeMap.safeUdf((x: Int) => if (x % 3 == 0) throw new IllegalStateException(s"bad $x") else x * 2)
    val df = spark.range(10).select(col("id").cast("int").as("x"))
      .withColumn("result", f(col("x")))
    val (ok, bad) = SafeMap.split(df)
    assert(ok.count() == 6 && bad.count() == 4)
    assert(bad.select("result.error").as[String].collect().forall(_.startsWith("IllegalStateException")))
    assert(ok.select("result.value").as[Int].collect().forall(_ % 2 == 0))
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def bmpOf(w: Int, h: Int)(luma: (Int, Int) => Int): Array[Byte] =
    Multimodal.syntheticBmp(w, h, luma)

  private def pngOf(w: Int, h: Int)(luma: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = luma(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dhash64: dual-decoder identity (BMP wire == ImageIO; PNG wire == ImageIO), hand case, brightness invariance") {
    def pat(x: Int, y: Int) = (x * 37 + y * 11) % 251
    val bmp = bmpOf(18, 16)(pat)
    val png = pngOf(18, 16)(pat)
    // the same pixels through three independent parse paths hash identically
    val hBmpWire = Multimodal.dhash64(new Multimodal.BmpDecoder(), bmp)
    val hBmpIio = Multimodal.dhash64(new Multimodal.ImageIODecoder(), bmp)
    val hPngWire = Multimodal.dhash64(new Multimodal.PngDecoder(), png)
    val hPngIio = Multimodal.dhash64(new Multimodal.ImageIODecoder(), png)
    assert(hBmpWire == hBmpIio, f"BMP wire $hBmpWire%016x != ImageIO $hBmpIio%016x")
    assert(hPngWire == hPngIio, f"PNG wire $hPngWire%016x != ImageIO $hPngIio%016x")
    assert(hBmpWire == hPngWire, "same pixels, different container, same hash")
    // hand case on a 9x8 image (one pixel per cell): row 0 strictly
    // increasing -> its 8 gradient bits all 0 (left never brighter);
    // row 1 strictly decreasing -> its 8 bits all 1
    val hand = bmpOf(9, 8)((x, y) =>
      if (y == 0) x * 10 else if (y == 1) 200 - x * 10 else 7)
    val hh = Multimodal.dhash64(new Multimodal.BmpDecoder(), hand)
    assert((hh & 0xffL) == 0L, f"row0 bits: ${hh & 0xffL}%02x")
    assert(((hh >> 8) & 0xffL) == 0xffL, f"row1 bits: ${(hh >> 8) & 0xffL}%02x")
    assert((hh >> 16) == 0L, "flat rows must contribute no bits")
    // a global brightness shift preserves every gradient sign -> hamming 0
    val bright = bmpOf(18, 16)((x, y) => math.min(pat(x, y) + 30, 255))
    val hB = Multimodal.dhash64(new Multimodal.BmpDecoder(), bright)
    assert(java.lang.Long.bitCount(hBmpWire ^ hB) == 0,
      "brightness shift must not move the dHash")
    // resize DOWN to half (9x8, the grid itself): pooling means the
    // gradient signs survive -> near-dup distance, not a random 32
    val half = bmpOf(9, 8)((gx, gy) => {
      var s = 0
      for (dx <- 0 until 2; dy <- 0 until 2) s += pat(gx * 2 + dx, gy * 2 + dy)
      s / 4
    })
    val hHalf = Multimodal.dhash64(new Multimodal.BmpDecoder(), half)
    assert(java.lang.Long.bitCount(hBmpWire ^ hHalf) <= 8,
      s"resized twin drifted ${java.lang.Long.bitCount(hBmpWire ^ hHalf)} bits")
  }

  test("imageDhash: per-partition hashing with per-row failure capture (corrupt and too-small payloads)") {
    val good = bmpOf(18, 16)((x, y) => (x + y) % 200)
    val tiny = bmpOf(8, 4)((x, y) => x) // under the 9x8 grid
    val df = Seq((1L, good), (2L, Array[Byte](1, 2, 3)), (3L, tiny))
      .toDF("id", "img")
    val out = Multimodal.imageDhash(df, "img", new Multimodal.BmpDecoder())
      .select(col("id"), col("dhashed.ok"), col("dhashed.dhash"),
        col("dhashed.error"))
      .as[(Long, Boolean, Option[Long], Option[String])].collect().sortBy(_._1)
    assert(out(0)._2 && out(0)._3.isDefined)
    assert(!out(1)._2 && out(1)._4.exists(_.contains("BMP")))
    assert(!out(2)._2 && out(2)._4.exists(_.contains("too small")))
    // deterministic across runs
    val again = Multimodal.imageDhash(df, "img", new Multimodal.BmpDecoder())
      .where(col("id") === 1).select("dhashed.dhash").as[Long].head()
    assert(out(0)._3.contains(again))
  }

  test("decodeFeatures: per-partition decode with per-row failure capture") {
    val df = Seq(
      (1L, "IMG:64x64:payloadbytes".getBytes("UTF-8")),
      (2L, Array.empty[Byte]), // corrupt: decoder throws
      (3L, "IMG:128x64:other".getBytes("UTF-8"))).toDF("id", "payload")
    val out = Multimodal.decodeFeatures(df, "payload", new Multimodal.StubDecoder(8))
    val rows = out.select(col("id"), col("decoded.ok"), size(col("decoded.features")), col("decoded.error"))
      .as[(Long, Boolean, Option[Int], Option[String])].collect().sortBy(_._1)
    assert(rows(0)._2 && rows(0)._3.contains(8))
    assert(!rows(1)._2 && rows(1)._4.exists(_.contains("empty payload")))
    assert(rows(2)._2)
    // deterministic: same payload → same features
    val f1 = out.filter(col("id") === 1).select("decoded.features").as[Seq[Float]].head()
    val f2 = Multimodal.decodeFeatures(df, "payload", new Multimodal.StubDecoder(8))
      .filter(col("id") === 1).select("decoded.features").as[Seq[Float]].head()
    assert(f1 == f2)
  }

  test("WavDecoder: real RIFF/PCM-16 parse — sine RMS, duration, channels; corrupt rejected") {
    // synthesize a REAL wav: 1 channel, 8 kHz, 16-bit PCM, 0.5 s of a
    // 440 Hz sine at amplitude 0.5 — RMS must land at 0.5/sqrt(2)
    def wav(channels: Int, rate: Int, seconds: Double, amp: Double): Array[Byte] = {
      val frames = (rate * seconds).toInt
      val n = frames * channels
      val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(36 + n * 2); bb.put("WAVE".getBytes)
      bb.put("fmt ".getBytes); bb.putInt(16)
      bb.putShort(1); bb.putShort(channels.toShort); bb.putInt(rate)
      bb.putInt(rate * channels * 2); bb.putShort((channels * 2).toShort); bb.putShort(16)
      bb.put("data".getBytes); bb.putInt(n * 2)
      (0 until frames).foreach { i =>
        val s = (amp * math.sin(2 * math.Pi * 440 * i / rate) * 32767).toShort
        (0 until channels).foreach(_ => bb.putShort(s))
      }
      bb.array()
    }
    val df = Seq(
      (1L, wav(1, 8000, 0.5, 0.5)),
      (2L, wav(2, 16000, 0.25, 0.9)),
      (3L, "RIFFxxxxWAVEjunk".getBytes("UTF-8"))).toDF("id", "payload")
    val out = Multimodal.decodeFeatures(df, "payload", new Multimodal.WavDecoder)
      .select(col("id"), col("decoded.ok"), col("decoded.features"), col("decoded.error"))
      .as[(Long, Boolean, Option[Seq[Float]], Option[String])].collect().sortBy(_._1)
    val Some(f1) = out(0)._3
    assert(out(0)._2 && f1(0) == 1f, "channels")
    assert(math.abs(f1(1) - 8000f / 48000f) < 1e-4, "sample rate")
    assert(math.abs(f1(2) - 0.5f) < 1e-3, "duration")
    assert(math.abs(f1(3) - 0.5 / math.sqrt(2)) < 0.01, s"sine RMS: ${f1(3)}")
    assert(f1(4) > 0.49f && f1(4) <= 0.51f, "peak ~ amplitude")
    val Some(f2) = out(1)._3
    assert(f2(0) == 2f && math.abs(f2(2) - 0.25f) < 1e-3)
    assert(!out(2)._2 && out(2)._4.nonEmpty, out(2)._4.toString)
  }

  test("WavDecoder: sample stream parity with the JDK's javax.sound reader") {
    // independent-implementation cross-check (same pattern as the
    // PngDecoder/ImageIODecoder pair): recompute the amplitude features
    // from the PCM stream javax.sound.sampled decodes, and require the
    // wire-format parser's features to match to float precision
    def wav(channels: Int, rate: Int, frames: Int): Array[Byte] = {
      val n = frames * channels
      val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(36 + n * 2); bb.put("WAVE".getBytes)
      bb.put("fmt ".getBytes); bb.putInt(16)
      bb.putShort(1); bb.putShort(channels.toShort); bb.putInt(rate)
      bb.putInt(rate * channels * 2); bb.putShort((channels * 2).toShort); bb.putShort(16)
      bb.put("data".getBytes); bb.putInt(n * 2)
      (0 until frames).foreach { i =>
        val s = (0.7 * math.sin(2 * math.Pi * 317 * i / rate) * 32767).toShort
        (0 until channels).foreach(c => bb.putShort((s + c * 100).toShort))
      }
      bb.array()
    }
    for (bytes <- Seq(wav(1, 8000, 4000), wav(2, 16000, 1600))) {
      val ours = new Multimodal.WavDecoder().decode(bytes)
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      val raw = in.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val n = raw.length / 2
      var sumSq = 0.0; var sumAbs = 0.0; var sum = 0.0
      var peak = 0.0; var crossings = 0; var prevNeg = false
      (0 until n).foreach { i =>
        val s = bb.getShort(i * 2) / 32768.0
        sumSq += s * s; sumAbs += math.abs(s); sum += s
        if (math.abs(s) > peak) peak = math.abs(s)
        val neg = s < 0
        if (i > 0 && neg != prevNeg) crossings += 1
        prevNeg = neg
      }
      val frames = n / fmt.getChannels
      val ref = Seq(fmt.getChannels.toFloat, fmt.getSampleRate / 48000f,
        (frames.toDouble / fmt.getSampleRate).toFloat,
        math.sqrt(sumSq / n).toFloat, peak.toFloat,
        (crossings.toDouble / n).toFloat, (sumAbs / n).toFloat, (sum / n).toFloat)
      assert(ours.toSeq.zip(ref).forall { case (a, b) => math.abs(a - b) < 1e-6 },
        s"wire ${ours.toSeq} vs javax.sound $ref")
    }
  }

  test("BmpDecoder: real 24bpp BMP parse — solid color means, padded rows; corrupt rejected") {
    // synthesize a REAL bmp: 24bpp bottom-up, rows padded to 4 bytes
    def bmp(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
      val rowBytes = ((w * 3 + 3) / 4) * 4
      val bb = java.nio.ByteBuffer.allocate(54 + rowBytes * h)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte); bb.put('M'.toByte); bb.putInt(54 + rowBytes * h)
      bb.putInt(0); bb.putInt(54)                      // reserved, data offset
      bb.putInt(40); bb.putInt(w); bb.putInt(h)        // info header
      bb.putShort(1); bb.putShort(24); bb.putInt(0)    // planes, bpp, compression
      bb.putInt(rowBytes * h); bb.putInt(2835); bb.putInt(2835); bb.putInt(0); bb.putInt(0)
      (0 until h).foreach { _ =>
        (0 until w).foreach { _ =>
          bb.put(b.toByte); bb.put(g.toByte); bb.put(r.toByte)
        }
        (w * 3 until rowBytes).foreach(_ => bb.put(0.toByte))
      }
      bb.array()
    }
    // width 3 forces row padding (9 -> 12 bytes): padding must not leak
    // into the means
    val df = Seq(
      (1L, bmp(3, 2, 255, 0, 0)),    // solid red, padded rows
      (2L, bmp(4, 4, 10, 200, 30)),
      (3L, Array[Byte]('B', 'M', 1, 2, 3))).toDF("id", "payload")
    val out = Multimodal.decodeFeatures(df, "payload", new Multimodal.BmpDecoder)
      .select(col("id"), col("decoded.ok"), col("decoded.features"), col("decoded.error"))
      .as[(Long, Boolean, Option[Seq[Float]], Option[String])].collect().sortBy(_._1)
    val Some(f1) = out(0)._3
    assert(out(0)._2 && f1(0) == 3f / 4096 && f1(1) == 2f / 4096)
    assert(f1(3) == 1f && f1(4) == 0f && f1(5) == 0f, s"solid red means: $f1")
    assert(f1(7) == 0f, "solid color has zero luma stddev")
    val Some(f2) = out(1)._3
    assert(math.abs(f2(3) - 10f / 255) < 1e-4 && math.abs(f2(4) - 200f / 255) < 1e-4)
    assert(!out(2)._2, "truncated BMP must be captured as a row error")
  }

  test("PngDecoder: real 8-bit PNG (independently JDK-encoded) — solid/gradient stats, RGBA alpha ignored, corrupt rejected") {
    import java.awt.image.BufferedImage
    // the PNGs come from the JDK's OWN encoder (javax.imageio), so the
    // decoder is checked against an independent implementation — including
    // whatever row filters the encoder's heuristics pick
    def png(im: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(im, "png", bos), "JDK PNG encoder unavailable")
      bos.toByteArray
    }
    def solid(w: Int, h: Int, argb: Int, typ: Int): BufferedImage = {
      val im = new BufferedImage(w, h, typ)
      for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, argb)
      im
    }
    // horizontal gray ramp 0..255: known mean 127.5 and variance 65535/12
    val ramp = new BufferedImage(256, 4, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 256) ramp.setRGB(x, y, (x << 16) | (x << 8) | x)
    val df = Seq(
      (1L, png(solid(5, 3, 0xffff0000, BufferedImage.TYPE_INT_RGB))),  // solid red, RGB
      (2L, png(ramp)),
      (3L, png(solid(4, 4, 0x400a14c8, BufferedImage.TYPE_INT_ARGB))), // RGBA, alpha 0x40
      (4L, "not a png at all".getBytes("UTF-8"))).toDF("id", "payload")
    val out = Multimodal.decodeFeatures(df, "payload", new Multimodal.PngDecoder)
      .select(col("id"), col("decoded.ok"), col("decoded.features"), col("decoded.error"))
      .as[(Long, Boolean, Option[Seq[Float]], Option[String])].collect().sortBy(_._1)
    val Some(f1) = out(0)._3
    assert(out(0)._2 && f1(0) == 5f / 4096 && f1(1) == 3f / 4096 && f1(2) == 24f / 32, f1.toString)
    assert(f1(3) == 1f && f1(4) == 0f && f1(5) == 0f, s"solid red means: $f1")
    assert(f1(7) < 1e-6, "solid color has ~zero luma stddev")
    val Some(f2) = out(1)._3
    assert(math.abs(f2(3) - 127.5 / 255) < 1e-4, s"ramp mean: ${f2(3)}")
    assert(math.abs(f2(7) - math.sqrt(65535.0 / 12) / 255) < 1e-3, s"ramp std: ${f2(7)}")
    val Some(f3) = out(2)._3
    assert(f3(2) == 1f, "RGBA is 32 bpp")
    assert(math.abs(f3(3) - 10f / 255) < 1e-4 && math.abs(f3(4) - 20f / 255) < 1e-4 &&
      math.abs(f3(5) - 200f / 255) < 1e-4, s"alpha must not leak into channel means: $f3")
    assert(!out(3)._2 && out(3)._4.exists(_.contains("PNG")), out(3)._4.toString)
  }

  test("ImageIODecoder: real JPEG decode; PNG parity with the wire-format PngDecoder; corrupt rejected") {
    import java.awt.image.BufferedImage
    def enc(im: BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(im, fmt, bos), s"JDK $fmt encoder unavailable")
      bos.toByteArray
    }
    def solid(w: Int, h: Int, argb: Int, typ: Int): BufferedImage = {
      val im = new BufferedImage(w, h, typ)
      for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, argb)
      im
    }
    val gray = solid(16, 16, 0xff808080, BufferedImage.TYPE_INT_RGB)
    val red = solid(8, 8, 0xffff0000, BufferedImage.TYPE_INT_RGB)
    val rgba = solid(4, 4, 0x400a14c8, BufferedImage.TYPE_INT_ARGB)
    val df = Seq(
      (1L, enc(gray, "jpg")),   // lossy: JPEG of mid-gray decodes near-exact
      (2L, enc(red, "jpg")),    // lossy: chroma subsampling wiggles a solid red a little
      (3L, enc(red, "png")),
      (4L, enc(rgba, "png")),
      (5L, "definitely not an image".getBytes("UTF-8"))).toDF("id", "payload")
    val out = Multimodal.decodeFeatures(df, "payload", new Multimodal.ImageIODecoder)
      .select(col("id"), col("decoded.ok"), col("decoded.features"), col("decoded.error"))
      .as[(Long, Boolean, Option[Seq[Float]], Option[String])].collect().sortBy(_._1)
    val Some(j1) = out(0)._3
    assert(out(0)._2 && j1(0) == 16f / 4096 && j1(2) == 24f / 32, j1.toString)
    assert(math.abs(j1(3) - 128.0 / 255) < 0.01 && math.abs(j1(6) - 128.0 / 255) < 0.01,
      s"JPEG mid-gray means: $j1")
    assert(j1(7) < 0.02, "solid JPEG has ~zero luma stddev")
    val Some(j2) = out(1)._3
    assert(j2(3) > 0.9 && j2(4) < 0.1 && j2(5) < 0.1, s"JPEG solid red means: $j2")
    // formats the wire-format decoders DON'T handle: GIF and palette PNG
    // (TYPE_BYTE_INDEXED encodes as PNG color type 3) decode through the
    // registry with exact solid-color stats
    for (fmt <- Seq("gif" -> BufferedImage.TYPE_BYTE_INDEXED, "png" -> BufferedImage.TYPE_BYTE_INDEXED)) {
      val f = new Multimodal.ImageIODecoder().decode(enc(solid(6, 5, 0xffff0000, fmt._2), fmt._1))
      assert(f(0) == 6f / 4096 && f(1) == 5f / 4096, s"${fmt._1} dims: ${f.toSeq}")
      assert(f(3) == 1f && f(4) == 0f && f(5) == 0f, s"${fmt._1} solid red: ${f.toSeq}")
    }
    // PNG path: ImageIO and the hand-rolled wire-format decoder must agree
    // exactly (both read non-premultiplied 8-bit channels)
    val png = new Multimodal.PngDecoder
    for ((bytes, name) <- Seq(enc(red, "png") -> "rgb", enc(rgba, "png") -> "rgba")) {
      val a = new Multimodal.ImageIODecoder().decode(bytes).toSeq
      val b = png.decode(bytes).toSeq
      assert(a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-6 },
        s"$name: imageio $a vs wire $b")
    }
    assert(!out(4)._2 && out(4)._4.exists(_.contains("ImageIO")), out(4)._4.toString)
  }

  test("decompression-bomb guard: kilobyte payloads declaring huge dims are clean rejects") {
    // a crafted PNG whose IHDR declares width 2^29: stride*bpp overflows
    // Int, so the pre-allocation guards must run in Long AND the pixel cap
    // must reject from the parsed header — never an array-bounds error or
    // a multi-GB allocation
    def craftedPng(w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + 25 + 13 + 12)
      bb.putLong(0x89504e470d0a1a0aL)              // PNG signature
      bb.putInt(13); bb.put("IHDR".getBytes("US-ASCII"))
      bb.putInt(w); bb.putInt(h)
      bb.put(8.toByte); bb.put(2.toByte)           // 8-bit RGB
      bb.put(0.toByte); bb.put(0.toByte); bb.put(0.toByte)
      bb.putInt(0)                                 // CRC (unchecked)
      bb.putInt(1); bb.put("IDAT".getBytes("US-ASCII")); bb.put(0.toByte); bb.putInt(0)
      bb.putInt(0); bb.put("IEND".getBytes("US-ASCII")); bb.putInt(0)
      bb.array()
    }
    val png = new Multimodal.PngDecoder
    val e1 = intercept[IllegalArgumentException] { png.decode(craftedPng(1 << 29, 3)) }
    assert(e1.getMessage.contains("decode cap"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] { png.decode(craftedPng(100000, 100000)) }
    assert(e2.getMessage.contains("decode cap"), e2.getMessage)
    // ImageIO route: the same kilobyte PNG declaring a 10-gigapixel canvas —
    // header dims are read FIRST (ImageReader.getWidth/getHeight), so the
    // reject happens before any raster allocation (ImageIO.read would have
    // allocated it blind)
    val e3 = intercept[IllegalArgumentException] {
      new Multimodal.ImageIODecoder().decode(craftedPng(100000, 100000))
    }
    assert(e3.getMessage.contains("decode cap"), e3.getMessage)
    // and the errors-as-data contract holds end-to-end: the same payloads
    // through decodeFeatures travel as row errors, not executor failures
    val df = Seq((1L, craftedPng(1 << 29, 3)), (2L, craftedPng(100000, 100000)))
      .toDF("id", "payload")
    val rows = Multimodal.decodeFeatures(df, "payload", new Multimodal.ImageIODecoder)
      .select(col("id"), col("decoded.ok"), col("decoded.error"))
      .as[(Long, Boolean, Option[String])].collect().sortBy(_._1)
    assert(rows.forall(r => !r._2 && r._3.exists(_.contains("decode cap"))), rows.mkString(";"))
  }

  test("metadata extraction and frame sampling") {
    val df = spark.range(1, 5).select(col("id"),
      Multimodal.fakePayload(col("id")).as("p"))
    val meta = df.select(col("id"), Multimodal.extractMeta(col("p")).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"))
      .as[(Long, String, Int, Int)].collect()
    assert(meta.forall { case (id, f, w, h) =>
      f == "IMG" && w == ((id % 4 + 1) * 64) && h == ((id % 3 + 1) * 64) })
    val frames = df.select(size(Multimodal.frameSample(col("p"), 8, 2)).as("n")).as[Int].collect()
    assert(frames.forall(_ > 0))
  }
}

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bm25TopK: hand-computed rational-idf scores, ranking, absence semantics") {
    // corpus: d1="a b a" (dl 3), d2="b c" (2), d3="c c c c" (4); N=3, L=9
    // query q1="a c": term a (df 1, tf(d1)=2), term c (df 2, tf(d2)=1, tf(d3)=4)
    //   d1: floor(1e6*8*22*2*9 / (3*(180+27+81))) = 3666666
    //   d3: floor(1e6*8*22*4*9 / (5*(360+27+108))) = 2560000 (exact)
    //   d2: floor(1e6*8*22*1*9 / (5*(90+27+54)))  = 1852631
    val corpus = Seq((1L, "a b a"), (2L, "b c"), (3L, "c c c c")).toDF("doc_id", "text")
    val queries = Seq((10L, "a c"), (11L, "zzz")).toDF("query_id", "qtext")
    val out = TextOps.bm25TopK(corpus, "doc_id", "text",
        queries, "query_id", "qtext", k = 2)
      .select("query_id", "doc_id", "bm25_micro", "rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._4))
    // k=2 keeps d1 and d3; q11 shares no term with any doc -> absent
    assert(out.toSeq == Seq((10L, 1L, 3666666L, 1), (10L, 3L, 2560000L, 2)), out.toSeq)
    // duplicate query terms count once (distinct-term BM25)
    val dupQ = Seq((20L, "a a c")).toDF("query_id", "qtext")
    val dup = TextOps.bm25TopK(corpus, "doc_id", "text", dupQ, "query_id", "qtext", 3)
      .where(col("doc_id") === 1L).select("bm25_micro").as[Long].head()
    assert(dup == 3666666L)
  }

  test("searchIndexedBm25 == bm25TopK on the same corpus (serving route identical)") {
    val docs = Tables.load(spark, sfDir, "documents").limit(300)
    val queries = docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 5)).as("qtext"))
    val store = new graft.core.BucketedStore(tmpDir("bm25idx"), numBuckets = 8)
    TextOps.indexBm25(docs, "doc_id", "text", store, "bm")
    val direct = TextOps.bm25TopK(docs, "doc_id", "text",
        queries, "query_id", "qtext", k = 3)
      .select("query_id", "doc_id", "bm25_micro", "rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._4))
    val served = TextOps.searchIndexedBm25(queries, "query_id", "qtext",
        store, "bm", k = 3)
      .select("query_id", "doc_id", "bm25_micro", "rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._4))
    assert(direct.nonEmpty && served.toSeq == direct.toSeq,
      s"served ${served.length} vs direct ${direct.length}")
  }

  test("searchIndexedBm25 legacy path (pre-trio-commit index): quiet store serves identically; a never-stabilizing trio RAISES by name") {
    // end-to-end: delete the trio commit record — the legacy inference
    // must stabilize immediately (nothing in flight) and serve the same
    // answers as the pinned route
    val docs = Tables.load(spark, sfDir, "documents").limit(200)
    val queries = docs.filter(col("doc_id") % 11 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 5)).as("qtext"))
    val store = new graft.core.BucketedStore(tmpDir("bm25legacy"), numBuckets = 8)
    TextOps.indexBm25(docs, "doc_id", "text", store, "bm")
    def rows() = TextOps.searchIndexedBm25(queries, "query_id", "qtext",
        store, "bm", k = 3)
      .select("query_id", "doc_id", "bm25_micro", "rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val pinned = rows()
    val trioDir = new org.apache.hadoop.fs.Path(s"${store.root}/_cursor/bm_bm25_trio")
    val hfs = trioDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(hfs.delete(trioDir, true), "trio record must exist to delete")
    assert(rows() == pinned, "legacy inference on a quiet store serves identically")
    // the stabilize helper: a trio that MOVES on every capture (a writer
    // appending continuously) must raise by name after maxTries — through
    // r14 it proceeded with only a stderr warning, silently risking a
    // torn snapshot (new postings scored against old df/stats)
    var v = 0L
    val e = intercept[IllegalStateException](TextOps.stabilizeLegacyTrio("bm",
      () => { v += 1; (v, v, v) }, maxTries = 5))
    assert(e.getMessage.contains("never stabilized"), e.getMessage)
    assert(e.getMessage.contains("trio commit record"), e.getMessage)
    // one in-flight append then quiet: the loop retries PAST the movement
    var calls = 0L
    val snap = TextOps.stabilizeLegacyTrio("bm",
      () => { calls += 1; if (calls < 3) (calls, 0L, 0L) else (9L, 9L, 9L) })
    assert(snap == ((9L, 9L, 9L)))
  }

  test("appendToBm25Index: grown index == rebuilt from the full corpus; compaction answer-stable") {
    val docs = Tables.load(spark, sfDir, "documents").limit(300)
    val part1 = docs.filter(col("doc_id") % 3 =!= 0)
    val part2 = docs.filter(col("doc_id") % 3 === 0)
    val queries = docs.filter(col("doc_id") % 7 === 0)
      .select(col("doc_id").as("query_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 5)).as("qtext"))
    val grown = new graft.core.BucketedStore(tmpDir("bm25grow"), numBuckets = 8)
    TextOps.indexBm25(part1, "doc_id", "text", grown, "bm")
    TextOps.appendToBm25Index(part2, "doc_id", "text", grown, "bm")
    val rebuilt = new graft.core.BucketedStore(tmpDir("bm25rebuild"), numBuckets = 8)
    TextOps.indexBm25(docs, "doc_id", "text", rebuilt, "bm")
    def rows(st: graft.core.BucketedStore) =
      TextOps.searchIndexedBm25(queries, "query_id", "qtext", st, "bm", k = 3)
        .select("query_id", "doc_id", "bm25_micro", "rank")
        .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val grownRows = rows(grown)
    assert(grownRows.nonEmpty && grownRows == rows(rebuilt),
      "append must be EXACT: grown index answers identically to a rebuild")
    // df and stats merged additively, not clobbered
    assert(grown.read("bm_stats", Seq("__sk")).select("n_docs").as[Long].head()
      == docs.count())
    // the maintenance cadence folds the appended dirs without changing answers
    grown.compactBuckets("bm_postings", Seq("term"))
    assert(rows(grown) == grownRows)
  }

  test("tokenDriftByGroup: each group is its own two-sample test; stable group scores 0; one-side-empty group 0 by convention") {
    // g1 is the tokenDrift hand case verbatim (x 2000000, z 1000000,
    // y 333333 at t_a=t_b=3); g2 is distribution-stable; g3 exists only in
    // snapshot A, so its totals zero the denominator -> all 0
    val a = Seq(("g1", "x x y"), ("g2", "p p"), ("g3", "q q")).toDF("source", "text")
    val b = Seq(("g1", "y y z"), ("g2", "p p")).toDF("source", "text")
    val out = TextOps.tokenDriftByGroup(a, b, "text", "source", topM = 10)
      .select("source", "token", "chi2_micro", "rank")
      .as[(String, String, Long, Int)].collect().sortBy(r => (r._1, r._4))
    val g1 = out.filter(_._1 == "g1").map(r => (r._2, r._3, r._4)).toSeq
    assert(g1 == Seq(("x", 2000000L, 1), ("z", 1000000L, 2), ("y", 333333L, 3)),
      s"g1 must reproduce the global hand case within its own totals: $g1")
    assert(out.filter(_._1 == "g2").forall(_._3 == 0L), "stable group scores 0")
    assert(out.filter(_._1 == "g3").forall(_._3 == 0L),
      "one-side-empty group is 0 by convention, per group")
    // topM truncates per group, not globally
    val top1 = TextOps.tokenDriftByGroup(a, b, "text", "source", topM = 1)
      .select("source", "token").as[(String, String)].collect().toSet
    assert(top1 == Set(("g1", "x"), ("g2", "p"), ("g3", "q")))
    // the totals-broadcast contract fires loudly, by name
    val e = intercept[Exception] {
      TextOps.tokenDriftByGroup(a, b, "text", "source", topM = 10,
        maxBroadcastGroups = 2L).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("maxBroadcastGroups"), s"guard must fail by name: $msg")
  }

  test("tokenDriftByGroupFromProfiles: profile-served == direct, bit-identical; concatenated partial profiles accepted") {
    val docs = Tables.load(spark, sfDir, "documents")
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("source", "token", "n_a", "n_b", "chi2_micro", "rank")
      .as[(String, String, Long, Long, Long, Int)]
      .collect().sortBy(r => (r._1, r._6)).toSeq
    val direct = rows(TextOps.tokenDriftByGroup(a, b, "text", "source", topM = 10))
    val served = rows(TextOps.tokenDriftByGroupFromProfiles(
      TextOps.tokenProfileByGroup(a, "text", "source"),
      TextOps.tokenProfileByGroup(b, "text", "source"), "source", topM = 10))
    assert(direct.nonEmpty && served == direct,
      "the segmented profile-served route must be identical to the direct route")
    // additivity: a profile assembled from concatenated PARTIAL profiles
    // (the streaming-grown layout before any merge) serves the same answer
    val aPartial = TextOps.tokenProfileByGroup(
        a.filter(col("doc_id") % 4 === 0), "text", "source")
      .union(TextOps.tokenProfileByGroup(
        a.filter(col("doc_id") % 4 === 2), "text", "source"))
    val servedPartial = rows(TextOps.tokenDriftByGroupFromProfiles(
      aPartial, TextOps.tokenProfileByGroup(b, "text", "source"),
      "source", topM = 10))
    assert(servedPartial == direct, "concatenated partials must re-aggregate")
  }


  test("tokenDriftAttribution: shrinking tokens attribute to A's carriers, growing to B's introducers; ranks match the monitor; identical snapshots attribute nothing") {
    // A: doc1 "x x y", doc3 "x z" (x3 y1 z1, T_a=5)
    // B: doc2 "y y z", doc4 "z z" (y2 z3, T_b=5)
    //   x: diff +15, chi2 1e6*225//(3*25) = 3000000, direction +1 (shrank)
    //   z: diff -10, chi2 1e6*100//(4*25) = 1000000, direction -1 (grew)
    //   y: diff  -5, chi2 1e6*25//(3*25)  =  333333, direction -1
    val a = Seq((1L, "x x y"), (3L, "x z")).toDF("doc_id", "text")
    val b = Seq((2L, "y y z"), (4L, "z z")).toDF("doc_id", "text")
    val out = TextOps.tokenDriftAttribution(a, b, "doc_id", "text", topM = 10, topK = 2)
      .select("token", "chi2_micro", "direction", "rank", "doc_id", "n_occ", "contrib_rank")
      .as[(String, Long, Int, Int, Long, Long, Int)]
      .collect().sortBy(r => (r._4, r._7)).toSeq
    assert(out == Seq(
      ("x", 3000000L, 1, 1, 1L, 2L, 1),   // vanished token -> A's carriers
      ("x", 3000000L, 1, 1, 3L, 1L, 2),
      ("z", 1000000L, -1, 2, 4L, 2L, 1),  // grown token -> B's introducers
      ("z", 1000000L, -1, 2, 2L, 1L, 2),
      ("y", 333333L, -1, 3, 2L, 2L, 1)),  // only one B doc carries y
      s"hand case mismatch: $out")
    // the attributed (token, rank) set IS the monitor's own ranking
    val docs = Tables.load(spark, sfDir, "documents")
    val da = docs.filter(col("doc_id") % 2 === 0)
    val db = docs.filter(col("doc_id") % 2 === 1)
    val monitor = TextOps.tokenDrift(da, db, "text", topM = 10)
      .select("token", "rank").as[(String, Int)].collect().toSet
    val attributed = TextOps.tokenDriftAttribution(da, db, "doc_id", "text",
        topM = 10, topK = 3)
      .select("token", "rank").distinct().as[(String, Int)].collect().toSet
    assert(attributed.nonEmpty && attributed.subsetOf(monitor),
      s"attribution must rank by the monitor's own chi-square: ${attributed -- monitor}")
    // identical snapshots: every direction is 0 — nothing to attribute
    assert(TextOps.tokenDriftAttribution(a, a, "doc_id", "text",
      topM = 10, topK = 2).count() == 0L)
    intercept[IllegalArgumentException](
      TextOps.tokenDriftAttribution(a, b, "doc_id", "text", topM = 0, topK = 2))
    intercept[IllegalArgumentException](
      TextOps.tokenDriftAttribution(a, b, "doc_id", "text", topM = 10, topK = 0))
  }

  test("tokenDriftAttributionByGroup: per-group hand case == the global op run on each group's slice; cross-group tokens don't leak; identical snapshots attribute nothing") {
    // group g1 reuses the global spec's hand case verbatim; g2 is a
    // different drift so any cross-group leak would change both answers
    val a = Seq(("g1", 1L, "x x y"), ("g1", 3L, "x z"),
      ("g2", 5L, "p p q"), ("g2", 7L, "p")).toDF("source", "doc_id", "text")
    val b = Seq(("g1", 2L, "y y z"), ("g1", 4L, "z z"),
      ("g2", 6L, "q q"), ("g2", 8L, "q p")).toDF("source", "doc_id", "text")
    val grouped = TextOps.tokenDriftAttributionByGroup(a, b, "doc_id", "text",
        "source", topM = 10, topK = 2)
      .select("source", "token", "chi2_micro", "direction", "rank",
        "doc_id", "n_occ", "contrib_rank")
      .as[(String, String, Long, Int, Int, Long, Long, Int)]
      .collect().toSeq
    Seq("g1", "g2").foreach { g =>
      val global = TextOps.tokenDriftAttribution(
          a.filter(col("source") === g), b.filter(col("source") === g),
          "doc_id", "text", topM = 10, topK = 2)
        .select("token", "chi2_micro", "direction", "rank", "doc_id",
          "n_occ", "contrib_rank")
        .as[(String, Long, Int, Int, Long, Long, Int)].collect().toSet
      val slice = grouped.filter(_._1 == g)
        .map(r => (r._2, r._3, r._4, r._5, r._6, r._7, r._8)).toSet
      assert(slice == global, s"group $g: grouped $slice vs global $global")
    }
    // identical snapshots: nothing to attribute in any group
    assert(TextOps.tokenDriftAttributionByGroup(a, a, "doc_id", "text",
      "source", topM = 10, topK = 2).count() == 0L)
  }

  test("vocabularyNoveltyByGroup: hand-computed novelty; concatenated partials re-aggregate; all-new and no-new edges") {
    import graft.ops.TextOps
    val a = Seq(("g1", "x x y"), ("g2", "p p")).toDF("source", "text")
    val b = Seq(("g1", "x z z"), ("g2", "p p p"), ("g3", "m")).toDF("source", "text")
    val out = TextOps.vocabularyNoveltyByGroup(
        TextOps.tokenProfileByGroup(a, "text", "source"),
        TextOps.tokenProfileByGroup(b, "text", "source"), "source")
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long)].collect().toList
    assert(out == List(
      // g1: B has x(1) z(2); z new -> 1 type, mass 2 of 3 -> 666666
      ("g1", 1L, 2L, 2L, 3L, 666666L),
      // g2: B has p(3), nothing new
      ("g2", 0L, 0L, 1L, 3L, 0L),
      // g3: absent from A entirely -> everything new
      ("g3", 1L, 1L, 1L, 1L, 1000000L)), s"got $out")
    // concatenated partial profiles re-aggregate before the join
    val bp1 = TextOps.tokenProfileByGroup(
      Seq(("g1", "x z")).toDF("source", "text"), "text", "source")
    val bp2 = TextOps.tokenProfileByGroup(
      Seq(("g1", "z"), ("g2", "p p p"), ("g3", "m")).toDF("source", "text"),
      "text", "source")
    val concat = TextOps.vocabularyNoveltyByGroup(
        TextOps.tokenProfileByGroup(a, "text", "source"),
        bp1.unionByName(bp2), "source")
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long)].collect().toList
    assert(concat == out, s"concat $concat vs $out")
  }

  test("vocabularyNoveltyTimeline: hand-computed per-bucket novelty; segmented twin; anomalies ride after rename; ref-less group all-novel") {
    import graft.ops.{TextOps, Events}
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // ref vocabulary: {x, y}. bucket 0: x x z (z new, 1 of 3 mass);
    // bucket 1: w w w (all new)
    val toks = Seq(
      (ts("2024-01-01 10:00:00"), "x"), (ts("2024-01-01 10:10:00"), "x"),
      (ts("2024-01-01 10:20:00"), "z"),
      (ts("2024-01-01 11:05:00"), "w"), (ts("2024-01-01 11:30:00"), "w"),
      (ts("2024-01-01 11:45:00"), "w")).toDF("ts", "token")
    val ref = TextOps.tokenProfile(Seq("x x y").toDF("text"), "text")
    val out = TextOps.vocabularyNoveltyTimeline(
        Events.bucketCategoryProfile(toks, "token", "ts", 3600L), ref)
      .orderBy("bucket_start")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toList
    assert(out.size == 2 && out(1)._1 - out(0)._1 == 3600L, s"buckets: $out")
    assert(out(0) == ((out(0)._1, 1L, 1L, 2L, 3L, 333333L)), s"b0: ${out(0)}")
    assert(out(1) == ((out(1)._1, 1L, 3L, 1L, 3L, 1000000L)), s"b1: ${out(1)}")
    // the alerting layer applies verbatim after the rename
    val anom = Events.timelineAnomalies(
        TextOps.vocabularyNoveltyTimeline(
          Events.bucketCategoryProfile(toks, "token", "ts", 3600L), ref)
          .select(col("bucket_start"),
            col("novelty_micro").as("chi2_micro")), k = 0L)
      .orderBy("bucket_start")
      .as[(Long, Long, Long, Long, Boolean)].collect().toList
    assert(anom.size == 2 && anom(1)._5 && !anom(0)._5,
      s"the all-novel bucket must flag: $anom")
    // segmented: g2 absent from the reference -> ALL its mass novel
    val gtoks = toks.withColumn("g", lit("g1"))
      .unionByName(Seq((ts("2024-01-01 10:30:00"), "q", "g2"))
        .toDF("ts", "token", "g"))
    val gref = TextOps.tokenProfileByGroup(
      Seq(("g1", "x x y")).toDF("g", "text"), "text", "g")
    val gout = TextOps.vocabularyNoveltyTimelineByGroup(
        Events.bucketCategoryProfileByGroup(gtoks, "token", "ts", "g", 3600L),
        gref, "g")
      .orderBy("g", "bucket_start")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toList
    val g1 = gout.filter(_._1 == "g1").map(t => (t._2, t._3, t._4, t._5, t._6, t._7))
    assert(g1 == out.map(t => (t._1, t._2, t._3, t._4, t._5, t._6)),
      s"g1 must equal the global hand case: $g1 vs $out")
    val g2 = gout.filter(_._1 == "g2")
    assert(g2.size == 1 && g2.head._3 == 1L && g2.head._7 == 1000000L,
      s"ref-less group must be all-novel: $g2")
  }

  test("vocabularyNovelty (global): hand case; == the lit-group segmented answer; empty-B and store-shape edges") {
    import graft.ops.TextOps
    // A: x x y p p; B: x z z p p p m  ->  new: z(2) m(1) = 3 of 7 types {x,z,p,m}
    val a = Seq("x x y p p").toDF("text")
    val b = Seq("x z z p p p m").toDF("text")
    val out = TextOps.vocabularyNovelty(
        TextOps.tokenProfile(a, "text"), TextOps.tokenProfile(b, "text"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(out == ((2L, 3L, 4L, 7L, 428571L)), s"got $out")
    // the global statistic equals the segmented one under a constant group
    val seg = TextOps.vocabularyNoveltyByGroup(
        TextOps.tokenProfileByGroup(a.withColumn("g", lit("all")), "text", "g"),
        TextOps.tokenProfileByGroup(b.withColumn("g", lit("all")), "text", "g"),
        "g")
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert((seg._2, seg._3, seg._4, seg._5, seg._6) == out,
      s"global must equal constant-group segmented: $seg vs $out")
    // an empty B side scores 0 (one row, all zeros — a monitor never
    // returns an empty frame for "nothing arrived")
    val empty = Seq.empty[String].toDF("text")
    val z = TextOps.vocabularyNovelty(
        TextOps.tokenProfile(a, "text"), TextOps.tokenProfile(empty, "text"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(z == ((0L, 0L, 0L, 0L, 0L)), s"got $z")
    // concatenated partial profiles re-aggregate before the join
    val concat = TextOps.vocabularyNovelty(
        TextOps.tokenProfile(a, "text"),
        TextOps.tokenProfile(Seq("x z p p").toDF("text"), "text")
          .unionByName(TextOps.tokenProfile(Seq("z p m").toDF("text"), "text")))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(concat == out, s"concat $concat vs $out")
  }

  test("tokenDrift: hand-computed chi-square contributions; one-sided tokens rank by full mass") {
    // A: x2 y1 (T_a=3); B: y2 z1 (T_b=3)
    //   x: floor(1e6*36/(2*9)) = 2000000; z: floor(1e6*9/(1*9)) = 1000000
    //   y: floor(1e6*9/(3*9))  = 333333
    val a = Seq((1L, "x x y")).toDF("doc_id", "text")
    val b = Seq((2L, "y y z")).toDF("doc_id", "text")
    val out = TextOps.tokenDrift(a, b, "text", topM = 10)
      .select("token", "n_a", "n_b", "chi2_micro", "rank")
      .as[(String, Long, Long, Long, Int)].collect().sortBy(_._5)
    assert(out.toSeq == Seq(
      ("x", 2L, 0L, 2000000L, 1),
      ("z", 0L, 1L, 1000000L, 2),
      ("y", 1L, 2L, 333333L, 3)), out.toSeq)
    // topM truncates deterministically
    val top1 = TextOps.tokenDrift(a, b, "text", topM = 1)
      .select("token").as[String].collect().toSeq
    assert(top1 == Seq("x"))
  }

  test("gopherRules: each rule rejects independently; a conforming doc passes all") {
    // 60 words, mean length in [3,10], all alphabetic, ≥2 Gopher stopwords
    val good = (1 to 56).map(i => s"word$i").mkString(" ") + " the and of with"
    val tooShort = "the and just a few words here"                  // < 50 words
    val longWords = (1 to 60).map(_ => "supercalifragilistic").mkString(" ") +
      " the and"                                                    // mean len > 10
    val nonAlpha = ((1 to 55).map(_ => "12345") ++ Seq("the", "and", "of", "with", "to"))
      .mkString(" ")                                                // alpha ratio 5/60 < 0.8
    val noStops = (1 to 60).map(i => s"token$i").mkString(" ")      // 0 stopword hits
    val df = Seq((1L, good), (2L, tooShort), (3L, longWords), (4L, nonAlpha), (5L, noStops))
      .toDF("doc_id", "text")
    val out = TextOps.gopherRules(df, "doc_id", "text")
      .select("id", "r_word_count", "r_mean_word_len", "r_alpha_words", "r_stopwords", "accept")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, true, true, true, true, true)), s"good doc: ${out(1L)}")
    assert(!out(2L)._2 && !out(2L)._6, "word-count rule missed")
    assert(!out(3L)._3 && !out(3L)._6, "mean-word-len rule missed")
    assert(!out(4L)._4 && !out(4L)._6, "alpha-words rule missed")
    assert(!out(5L)._5 && !out(5L)._6, "stopword rule missed")
  }

  test("bloomDecontaminate: flags every exactly-contaminated doc; planted hit caught, clean doc clean") {
    val evalSet = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "intro words then alpha beta gamma appears here"),   // shares a trigram
      (2L, "completely unrelated content nothing shared at all"),
      (3L, "delta epsilon zeta closes the eval sentence too"))  // shares a trigram
      .toDF("doc_id", "text")
    val out = TextOps.bloomDecontaminate(corpus, evalSet,
        "doc_id", "text", "doc_id", "text", n = 3,
        expectedEvalGrams = 1000L, fpp = 0.001)
      .select("doc_id", "bloom_hit").as[(Long, Boolean)].collect().toMap
    assert(out(1L) && out(3L), "planted contamination missed — bloom false negative")
    assert(!out(2L), "clean doc flagged (possible but fpp=0.001 over 6 grams; deterministic hash)")
    // superset property on the real fixture: bloom hits ⊇ exact hits
    val docs = Tables.load(spark, sfDir, "documents")
    val c = docs.where(col("doc_id") % 10 < 9)
    val e = docs.where(col("doc_id") % 10 === 9)
    val bloomIds = TextOps.bloomDecontaminate(c, e, "doc_id", "text", "doc_id", "text")
      .where(col("bloom_hit")).select("doc_id").as[Long].collect().toSet
    val exactIds = TextOps.contaminationReport(c, e, "doc_id", "text", "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(exactIds.subsetOf(bloomIds),
      s"${(exactIds -- bloomIds).size} exact hits escaped the bloom")
  }

  test("quality features and language id are deterministic and sane") {
    val df = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "el perro es grande y la casa es blanca"),
      (3L, "zzz qqq xxx")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      TextOps.langId(col("text")).as("lang"),
      TextOps.qualityFeatures(col("text")).as("q"))
    val langs = out.select("doc_id", "lang").as[(Long, String)].collect().toMap
    assert(langs(1L) == "en" && langs(2L) == "es" && langs(3L) == "unknown")
    val q1 = out.filter(col("doc_id") === 1).select("q.stopword_ratio").as[Double].head()
    assert(q1 > 0.2) // "the" twice + "on" in 6 tokens
  }

  test("qualityFilter drops degenerate documents") {
    import spark.implicits._
    val df = Seq(
      (1L, "a reasonable length document with several distinct tokens here"),
      (2L, "x x x x x x x x x x x x"),            // uniq_ratio 1/12
      (3L, "too short")).toDF("doc_id", "text")   // < 5 tokens
    val kept = TextOps.qualityFilter(df, "text").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("fingerprint winnow-min matches for identical text only") {
    val df = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g"), (3L, "h i j k l m n"))
      .toDF("id", "text")
    val fp = df.select(col("id"), TextOps.fingerprint(col("text")).as("f"))
      .select(col("id"), col("f.content_md5"), col("f.winnow_min"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(fp(0)._2 == fp(1)._2 && fp(0)._3 == fp(1)._3)
    assert(fp(0)._2 != fp(2)._2)
  }

  test("contaminationReport finds shared n-grams; decontaminate drops flagged docs") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // contains eval 10's 3-grams
      (2L, "completely unrelated training text about spark engines"),
      (3L, "quick brown fox appears here too")).toDF("doc_id", "text")
    val evalSet = Seq(
      (10L, "the quick brown fox jumps"),
      (11L, "nothing in common at all")).toDF("doc_id", "text")
    val report = TextOps.contaminationReport(
      corpus, evalSet, "doc_id", "text", "doc_id", "text", n = 3, minShared = 1)
      .as[(Long, Long, Long)].collect().toSet
    // doc 1 shares "the quick brown","quick brown fox","brown fox jumps" with eval 10;
    // doc 3 shares "quick brown fox"
    assert(report == Set((1L, 10L, 3L), (3L, 10L, 1L)))
    val survivors = TextOps.decontaminate(
      corpus, evalSet, "doc_id", "text", "doc_id", "text", n = 3, minShared = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(2L))
    // raising the bar to >= 2 shared grams keeps doc 3
    val lax = TextOps.decontaminate(
      corpus, evalSet, "doc_id", "text", "doc_id", "text", n = 3, minShared = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(lax == Set(2L, 3L))
  }

  test("overlapContamination: occurrence-weighted gram fraction vs the eval set") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),          // 3 grams, all in eval 10
      (2L, "totally unrelated training words here"),
      (3L, "the quick brown fox jumps the quick brown fox jumps")) // 8 grams, all hit
      .toDF("doc_id", "text")
    val evalSet = Seq((10L, "the quick brown fox jumps over")).toDF("doc_id", "text")
    val out = TextOps.overlapContamination(
      corpus, evalSet, "doc_id", "text", "doc_id", "text", n = 3, maxOverlap = 0.5)
      .select("doc_id", "n_grams", "hit_grams", "contaminated")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 3L, 3L, true)))
    assert(out(1)._3 == 0L && !out(1)._4)
    // doc 3's grams: 8 total; the wrap-around grams ("jumps the quick",
    // "fox jumps the") are NOT in the eval set → 6/8 hit, still >= 0.5
    assert(out(2) == ((3L, 8L, 6L, true)))
    // the plan must broadcast the eval gram set — corpus text never shuffles
    val plan = TextOps.overlapContamination(
      corpus, evalSet, "doc_id", "text", "doc_id", "text").queryExecution.executedPlan
    assert(plan.toString.contains("BroadcastHashJoin"),
      s"expected broadcast eval-gram join, got:\n$plan")
  }

  test("packSequences: concat-then-chunk layout per shard, docs may straddle packs") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 100L), // shard a: cum 300, 600, 700
      ("b", 4L, 600L)                                    // shard b: oversized doc
    ).toDF("source", "doc_id", "n_tokens")
    val out = TextOps.packSequences(df, "doc_id", "n_tokens", budget = 512, shardCol = "source")
      .select("doc_id", "pack_id", "pack_offset")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ((0L, 0L)))   // starts at 0
    assert(out(2L) == ((0L, 300L))) // starts at 300, straddles into pack 1
    assert(out(3L) == ((1L, 88L)))  // starts at 600 = pack 1, offset 88
    assert(out(4L) == ((0L, 0L)))   // shard b restarts at 0
  }

  test("sampleMixture: deterministic per-source hash thresholds; unlisted sources drop") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, if (i <= 200) "keep_all" else if (i <= 300) "half" else "ghost"))
      .toDF("doc_id", "source")
    val out = TextOps.sampleMixture(df, "doc_id", "source",
      Map("keep_all" -> 1.0, "half" -> 0.5))
    val bySrc = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc("keep_all") == 200L)        // fraction 1.0 keeps everything
    assert(!bySrc.contains("ghost"))          // absent from the map -> dropped
    assert(bySrc("half") > 20 && bySrc("half") < 80) // ~50 of 100, hash-dependent
    // reproducible: second run selects the identical id set
    val ids1 = out.select("doc_id").as[Long].collect().toSet
    val ids2 = TextOps.sampleMixture(df, "doc_id", "source",
      Map("keep_all" -> 1.0, "half" -> 0.5)).select("doc_id").as[Long].collect().toSet
    assert(ids1 == ids2)
  }

  test("topTokens: frequency-ordered vocabulary with occurrence and doc counts") {
    import spark.implicits._
    val df = Seq((1L, "a b a"), (2L, "a c"), (3L, "b b")).toDF("doc_id", "text")
    // a: 3 occurrences in 2 docs; b: 3 in 2; c: 1 in 1
    val out = TextOps.topTokens(df, "doc_id", "text", topK = 2)
      .as[(String, Long, Long)].collect().sortBy(r => (-r._2, r._1)).toList
    assert(out == List(("a", 3L, 2L), ("b", 3L, 2L)))
  }

  test("learnBpeMerges: greedy left-to-right merges, deterministic tie-break, pair exhaustion") {
    import spark.implicits._
    val eow = "\u0004"
    // "aaaa" x2: step 0 counts (a,a)=6 overlapping-adjacent vs (a,eow)=2;
    // greedy application gives aa|aa|eow (never a|aa|a). Step 1 is the
    // tie-break: (aa,aa)=2 ties (aa,eow)=2 and eow (U+0004) sorts before
    // "aa", so (aa,eow) wins. Step 2 merges the rest; step 3 has no pairs
    // left -> 3 rows despite numMerges=5.
    val df = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val out = TextOps.learnBpeMerges(df, "text", numMerges = 5)
      .as[(Int, String, String, String, Long)].collect().toList
    assert(out == List(
      (0, "a", "a", "aa", 6L),
      (1, "aa", eow, "aa" + eow, 2L),
      (2, "aa", "aa" + eow, "aaaa" + eow, 2L)))
    // "aaa": after merging (a,a) greedily the word is aa|a|eow — the
    // left-to-right discipline, not a|aa|eow — so step 1's candidates are
    // (aa,a)=1 and (a,eow)=1, and the lexicographic tie-break picks (a,eow)
    val df2 = Seq((1L, "aaa")).toDF("doc_id", "text")
    val out2 = TextOps.learnBpeMerges(df2, "text", numMerges = 2)
      .as[(Int, String, String, String, Long)].collect().toList
    assert(out2 == List(
      (0, "a", "a", "aa", 2L),
      (1, "a", eow, "a" + eow, 1L)))
    // frequency weighting: the dictionary counts words once each but pair
    // counts are word-frequency-weighted ("lo" appears in both words)
    val df3 = Seq((1L, "low low low lot")).toDF("doc_id", "text")
    val first = TextOps.learnBpeMerges(df3, "text", numMerges = 1)
      .as[(Int, String, String, String, Long)].collect().head
    assert(first == ((0, "l", "o", "lo", 4L)))
  }

  test("learnBpeMerges batched rounds: rank-ordered stale application, step ids k*m+j") {
    import spark.implicits._
    val eow = ""
    val df = Seq((1L, "ab ab cd cd")).toDF("doc_id", "text")
    // one round of m=2: round-start ranks are (a,b) then (b,eow) — the
    // second is STALE after the first consumes every b, so it applies as a
    // no-op but is still recorded with its round-start count
    val batched = TextOps.learnBpeMerges(df, "text", numMerges = 2, mergesPerRound = 2)
      .as[(Int, String, String, String, Long)].collect().toList
    assert(batched == List(
      (0, "a", "b", "ab", 2L),
      (1, "b", eow, "b" + eow, 2L)))
    // classic m=1 recounts between the two merges and picks (ab,eow) instead
    val classic = TextOps.learnBpeMerges(df, "text", numMerges = 2)
      .as[(Int, String, String, String, Long)].collect().toList
    assert(classic == List(
      (0, "a", "b", "ab", 2L),
      (1, "ab", eow, "ab" + eow, 2L)))
  }

  test("applyBpeMerges: in-order greedy encode, word-boundary isolation, subword counts") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa aaa"), (2L, ""), (3L, "b")).toDF("doc_id", "text")
    val merges = Seq(("a", "a"), ("aa", "\u0004"))
    val out = TextOps.applyBpeMerges(docs, "doc_id", "text", merges)
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // "aaaa": a|a|a|a|eow -> greedy (a,a) -> aa|aa|eow -> (aa,eow) -> aa|aa</w>
    // "aaa":  a|a|a|eow -> aa|a|eow (left-to-right) -> no (aa,eow) adjacency,
    //         so the unmerged end-of-word marker stays its own subword
    assert(out(1L) == (("aa aa</w> aa a </w>", 5L)))
    assert(out(2L) == (("", 0L)))
    assert(out(3L) == (("b </w>", 2L)))
    // the merge CANNOT cross the bare word-boundary space: without the
    // boundary, (a,a) would merge the last 'a' of word 1 with the first of
    // word 2 — assert the seam stayed intact on "a a"
    val cross = TextOps.applyBpeMerges(
        Seq((1L, "a a")).toDF("doc_id", "text"), "doc_id", "text", Seq(("a", "a")))
      .as[(Long, String, Long)].collect().head
    assert(cross == ((1L, "a </w> a </w>", 4L)))
    // DataFrame overload applies the learned table in step order
    val viaDf = TextOps.applyBpeMerges(docs, "doc_id", "text",
      TextOps.learnBpeMerges(Seq((1L, "aaaa aaaa")).toDF("doc_id", "text"), "text", 2))
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(viaDf(1L) == (("aa aa</w> aa a </w>", 5L)))
  }

  test("viterbiPieces: max-probability segmentation, longer-piece tie-break, coverage") {
    // micro-probs scale by 2^20; p = q/2^20
    val q = Map("a" -> 1048L, "b" -> 1048L, "ab" -> 16384L, "aa" -> 64L)
    // [ab] p=16384/2^20 beats [a][b] p=(1048/2^20)^2
    assert(TextOps.viterbiPieces("ab", q, 4) == List("ab"))
    // "aab": a+ab (p_a * p_ab) beats aa+b and a+a+b
    assert(TextOps.viterbiPieces("aab", q, 4) == List("a", "ab"))
    // exact-tie case: all probs exactly 1.0 (q = 2^20) -> every path scores
    // 1.0; the longer final piece wins at each DP position
    val tie = Map("c" -> 1048576L, "d" -> 1048576L, "cd" -> 1048576L)
    assert(TextOps.viterbiPieces("cd", tie, 4) == List("cd"))
    assert(TextOps.viterbiPieces("ccd", tie, 4) == List("c", "cd"))
    // uncovered word -> Nil
    assert(TextOps.viterbiPieces("cx", tie, 4) == Nil)
    assert(TextOps.viterbiPieces("", q, 4) == Nil)
  }

  test("learnUnigramVocab: structure, determinism, local == distributed routes") {
    val docs = Tables.load(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    def run() = TextOps.learnUnigramVocab(docs, "text", vocabSize = 40,
      maxPieceLen = 4, rounds = 2, seedMultiplier = 4, maxWordLen = 16)
      .as[(Long, String, Long, Long)].collect().toList
    val local = run()
    // every single character of the corpus is in the vocab
    val chars = local.map(_._2).filter(_.length == 1).toSet
    val corpusChars = docs.select(explode(split(col("text"), "")).as("ch"))
      .where(col("ch") =!= " " && col("ch") =!= "").distinct()
      .as[String].collect().toSet
    assert(corpusChars.subsetOf(chars), s"missing chars: ${corpusChars -- chars}")
    assert(local.size <= 40 && local.map(_._2).distinct.size == local.size)
    // ranks are 1..n in (count desc, piece asc) order
    assert(local.map(_._1) == (1L to local.size).toList)
    assert(local.sliding(2).forall {
      case List(x, y) => x._3 > y._3 || (x._3 == y._3 && x._2 < y._2)
      case _ => true })
    // partitioning-invariant
    assert(TextOps.learnUnigramVocab(docs.repartition(13), "text", 40, 4, 2, 4, 16)
      .as[(Long, String, Long, Long)].collect().toList == local)
    // distributed route identical
    val prop = "graft.unigram.localDictLimit"
    val old = sys.props.get(prop)
    sys.props(prop) = "0"
    try assert(run() == local)
    finally old match {
      case Some(v) => sys.props(prop) = v
      case None => sys.props -= prop
    }
  }

  test("encodeUnigram: decode round-trip, UNK passthrough, piece counts") {
    val docs = Tables.load(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val vocab = TextOps.learnUnigramVocab(docs, "text", 40, 4, 2, 4, 16)
    val extra = Seq(
      (90001L, "join xyz0"),            // unseen chars -> whole-word piece
      (90002L, "a" * 17),               // > maxWordLen -> whole-word piece
      (90003L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val enc = TextOps.encodeUnigram(docs.unionByName(extra), "doc_id", "text",
      vocab, 4, 16)
    // decode: dropping the separators must restore the original text
    val bad = enc.join(docs.unionByName(extra), "doc_id")
      .where(col("text").isNotNull &&
        replace(col("unigram_text"), lit("\u0002"), lit("")) =!= col("text"))
      .count()
    assert(bad == 0L, s"$bad docs fail the strip-separators round-trip")
    val m = enc.as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    // unseen chars: word passes whole (no separator inside xyz0)
    assert(m(90001L)._2.split(" ", -1).last == "xyz0", m(90001L)._2)
    // oversized word: single piece
    assert(m(90002L)._2 == "a" * 17 && m(90002L)._3 == 1L)
    assert(m(90003L)._2 == null && m(90003L)._3 == 0L)
    // n_pieces == words + intra-word separators
    val nOk = enc.where(col("unigram_text").isNotNull)
      .where(TextOps.tokenCount(col("unigram_text"))
        + (length(col("unigram_text"))
           - length(replace(col("unigram_text"), lit("\u0002"), lit("")))) =!= col("n_pieces"))
      .count()
    assert(nOk == 0L, s"$nOk docs have inconsistent n_pieces")
  }

  test("learnBpeMerges: local-dict route == distributed rounds (classic and batched)") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    def run(n: Int, m: Int) = TextOps.learnBpeMerges(docs, "text", n, m)
      .as[(Int, String, String, String, Long)].collect().toList
    val localClassic = run(10, 1)
    val localBatched = run(10, 4)
    val prop = "graft.bpe.localDictLimit"
    val old = sys.props.get(prop)
    sys.props(prop) = "0" // force the distributed fallback
    try {
      assert(run(10, 1) == localClassic)
      assert(run(10, 4) == localBatched)
    } finally old match {
      case Some(v) => sys.props(prop) = v
      case None => sys.props -= prop
    }
  }

  test("applyBpeMergesPartitioned == applyBpeMerges (chain route) on fixture + edge docs") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents").select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (90001L, "a  double  space"),   // multiplicity must survive identically
        (90002L, " leading and trailing "),
        (90003L, ""),
        (90004L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val merges = TextOps.learnBpeMerges(docs, "text", 12)
      .orderBy("step").select("left_tok", "right_tok")
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))
    val chain = TextOps.applyBpeMerges(docs, "doc_id", "text", merges)
    val part = TextOps.applyBpeMergesPartitioned(docs, "doc_id", "text", merges)
    val mism = chain.as("c").join(part.as("p"), "doc_id")
      .where(not(col("c.bpe_text") <=> col("p.bpe_text")) ||
        not(col("c.n_subwords") <=> col("p.n_subwords")))
      .count()
    assert(mism == 0L, s"$mism documents differ between the chain and partitioned routes")
  }

  test("bpeDecode(applyBpeMerges(x)) == x on the fixture corpus (canonical spacing)") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
      // canonicalize: the rendering collapses separator multiplicity, so
      // the exact round-trip claim is scoped to single-spaced text
      .select(col("doc_id"), regexp_replace(trim(col("text")), " +", " ").as("text"))
    val merges = TextOps.learnBpeMerges(docs, "text", 12)
    val bad = TextOps.applyBpeMerges(docs, "doc_id", "text", merges)
      .join(docs, "doc_id")
      .where(TextOps.bpeDecode(col("bpe_text")) =!= col("text"))
      .count()
    assert(bad == 0L, s"$bad documents fail the encode/decode round-trip")
  }

  test("repetitionStats: counts and fractions on a degenerate vs normal doc") {
    import spark.implicits._
    val df = Seq(
      (1L, "spam spam spam spam"),        // 2-grams: "spam spam" x3
      (2L, "all distinct words here now") // 4 distinct 2-grams
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionStats(df, "doc_id", "text", n = 2)
      .select("doc_id", "n_grams", "distinct_grams", "top_gram_count",
        "dup_gram_frac", "top_gram_frac")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 1L, 3L, 2.0 / 3.0, 1.0)))
    assert(out(2L) == ((2L, 4L, 4L, 1L, 0.0, 0.25)))
  }

  test("minhashPairsFromProfile over corpusProfile == minhashNearDupPairs from raw text") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents").limit(400)
    val fromText = graft.ops.Dedup.minhashNearDupPairs(
      docs, "doc_id", "text", n = 3, numHashes = 12, bands = 4, threshold = 0.2)
      .as[(Long, Long, Double)].collect().toSet
    val profile = TextOps.corpusProfile(docs, "doc_id", "text", n = 3, numHashes = 12)
    val fromProfile = graft.ops.Dedup.minhashPairsFromProfile(
      profile, "doc_id", "minhash_sig", "shingles",
      numHashes = 12, bands = 4, threshold = 0.2)
      .as[(Long, Long, Double)].collect().toSet
    assert(fromProfile == fromText)
    assert(fromText.nonEmpty, "fixture should contain planted near-dups")
  }

  test("langIdDf == column-form langId on the corpus (same argmax, same ties, same unknowns)") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents").limit(400)
      .select(col("doc_id"), col("text"))
      // adversarial extras: no hits, exact tie (en "the a" vs es "el la"
      // resolves lexicographically), multiset counts (repeated stopwords)
      .unionByName(Seq(
        (9000001L, "xyzzy plugh qwerty"),
        (9000002L, "the a el la"),
        (9000003L, "the the the el"),
        (9000004L, "")).toDF("doc_id", "text"))
    val viaCol = docs.select(col("doc_id"),
      TextOps.langId(col("text")).as("g")).as[(Long, String)].collect().toMap
    val viaDf = TextOps.langIdDf(docs, "doc_id", "text", "g")
      .as[(Long, String)].collect().toMap
    assert(viaDf == viaCol)
    assert(viaDf(9000001L) == "unknown" && viaDf(9000004L) == "unknown")
    assert(viaDf(9000002L) == "en") // tie 2-2 -> lexicographic first
    assert(viaDf(9000003L) == "en") // multiset: 'the' x3 beats 'el' x1
  }

  test("ngramJaccardPairs prefix filtering == brute-force all-pairs (zero recall loss)") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents").limit(150)
      .select(col("doc_id"), col("text"), col("source"))
    for (t <- Seq(0.1, 0.2, 0.5)) {
      val got = graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source",
        n = 3, threshold = t)
        .select("id_l", "id_r", "jaccard").as[(Long, Long, Double)].collect().toSet
      // brute force: every same-block pair, exact jaccard, no prefix filter
      val sh = graft.ops.Dedup.shingleProfiles(docs, "doc_id", "text", 3, Nil, Seq("source"))
      val brute = sh.select(col("doc_id").as("id_l"), col("source"), col("__shingles").as("a"))
        .join(sh.select(col("doc_id").as("id_r"), col("source"), col("__shingles").as("b")), Seq("source"))
        .where(col("id_l") < col("id_r"))
        .select(col("id_l"), col("id_r"), graft.ops.Dedup.jaccardSorted(col("a"), col("b")).as("j"))
        .where(col("j") >= t)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == brute, s"t=$t: prefix-filtered ${got.size} vs brute ${brute.size}")
    }
  }

  test("lexiconHits == multisetHits on the stopword lexicon; empty/no-hit rows get 0") {
    import spark.implicits._
    val lex = Seq("the", "a", "of", "and", "to", "in", "is", "on")
    val docs = Tables.load(spark, sfDir, "documents").limit(300)
    val viaJoin = TextOps.lexiconHits(docs, "doc_id", "text", lex, "hits")
      .select("doc_id", "hits").as[(Long, Long)].collect().toMap
    val viaScan = docs.select(col("doc_id"),
      TextOps.multisetHits(graft.ops.Dedup.tokens(col("text")), lex).cast("long").as("hits"))
      .as[(Long, Long)].collect().toMap
    assert(viaJoin == viaScan)
    // a row with zero lexicon hits still comes back (left join + coalesce)
    val zero = TextOps.lexiconHits(
      Seq((1L, "xyzzy plugh"), (2L, "the cat on the mat")).toDF("doc_id", "text"),
      "doc_id", "text", lex, "hits")
      .select("doc_id", "hits").as[(Long, Long)].collect().toMap
    assert(zero == Map(1L -> 0L, 2L -> 3L))
    // a word listed TWICE in the lexicon counts once per listing, exactly
    // like multisetHits' one-term-per-list-element semantics
    val dup = Seq("the", "the", "cat")
    val dupDf = Seq((1L, "the cat sat")).toDF("doc_id", "text")
    val viaJoinDup = TextOps.lexiconHits(dupDf, "doc_id", "text", dup, "hits")
      .select("hits").as[Long].head()
    val viaScanDup = dupDf.select(
      TextOps.multisetHits(graft.ops.Dedup.tokens(col("text")), dup).cast("long"))
      .as[Long].head()
    assert(viaJoinDup == 3L && viaJoinDup == viaScanDup)
  }

  test("bigramLmScore: hand-computed micro-prob means; single-token edge rule") {
    import spark.implicits._
    // corpus: c(a b)=1, c(b a)=1, c(a c)=1 -> P(b|a)=P(c|a)=1/2, P(a|b)=1;
    // "x y" and the single-token doc "z" are their own only transitions (p=1)
    val docs = Seq((1L, "a b a c"), (2L, "x y"), (3L, "z")).toDF("doc_id", "text")
    val out = TextOps.bigramLmScore(docs, "doc_id", "text")
      .select("doc_id", "lm_micro_sum", "n_bigrams", "lm_score")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((2000000L, 3L, 2000000.0 / 3)))
    assert(out(2L) == ((1000000L, 1L, 1000000.0)))
    assert(out(3L) == ((1000000L, 1L, 1000000.0)))
    // templated text scores strictly higher than the same tokens scrambled
    // into unique transitions
    val mix = Seq((1L, "the cat sat . the cat sat . the cat sat ."),
      (2L, "sat the . cat sat cat the . sat . the cat")).toDF("doc_id", "text")
    val s = TextOps.bigramLmScore(mix, "doc_id", "text")
      .select("doc_id", "lm_score").as[(Long, Double)].collect().toMap
    assert(s(1L) > s(2L), s.toString)
    // the keyed-join opt-out (maxBroadcastTransitions = 0) is answer-identical
    val s0 = TextOps.bigramLmScore(mix, "doc_id", "text",
      maxBroadcastTransitions = 0L)
      .select("doc_id", "lm_score").as[(Long, Double)].collect().toMap
    assert(s0 == s, s"opt-out diverged: $s0 vs $s")
    // the in-plan contract guard fires loudly when the transition table
    // exceeds the cap (no silent driver-OOM broadcast)
    val eg = intercept[Exception](
      TextOps.bigramLmScore(mix, "doc_id", "text",
        maxBroadcastTransitions = 2L).collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(eg).exists(_.contains("maxBroadcastTransitions")), msgs(eg).toString)
  }

  test("corpusProfile == fingerprintDf + shingleProfiles sig/set + repetitionStats, one pass") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents").limit(200)
    val n = 3; val numHashes = 12
    val prof = TextOps.corpusProfile(docs, "doc_id", "text", n, numHashes)
      .persist()
    // fingerprint half (corpusProfile's winnow_min is at the SAME n)
    val fp = TextOps.fingerprintDf(docs, "doc_id", "text", shingleN = n)
      .select(col("doc_id"), col("content_md5"), col("winnow_min"))
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // minhash signature + sorted shingle set half
    val sh = graft.ops.Dedup.shingleProfiles(docs, "doc_id", "text", n,
      graft.ops.Dedup.hashCoeffs(numHashes))
      .select(col("doc_id"), col("__shingles"), col("__sig"))
      .as[(Long, Seq[Long], Seq[Long])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // repetition half at the same n
    val rep = TextOps.repetitionStats(docs, "doc_id", "text", n)
      .select("doc_id", "n_grams", "distinct_grams", "top_gram_count")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val got = prof.select(col("doc_id"), col("content_md5"), col("winnow_min"),
      col("shingles"), col("minhash_sig"), col("n_grams"),
      col("distinct_grams"), col("top_gram_count"))
      .as[(Long, String, Long, Seq[Long], Seq[Long], Long, Long, Long)].collect()
    assert(got.length == fp.size && got.nonEmpty)
    got.foreach { case (id, md5v, wmin, set, sig, ng, dg, tg) =>
      assert((md5v, wmin) == fp(id), s"fingerprint mismatch doc $id")
      assert(set == sh(id)._1, s"shingle set mismatch doc $id")
      assert(sig == sh(id)._2, s"signature mismatch doc $id")
      assert((id, ng, dg, tg) == rep(id), s"repetition mismatch doc $id")
    }
    prof.unpersist()
  }

  test("unimaxMixture: exact budget, whole-source prefix, remainder to smallest; identity above total") {
    // sizes: tiny=2, mid=5, big=20  (total 27)
    val df = ((1L to 2L).map((_, "tiny")) ++ (11L to 15L).map((_, "mid")) ++
      (101L to 120L).map((_, "big"))).toDF("doc_id", "source")
    // budget >= total keeps everything (one-epoch cap)
    assert(TextOps.unimaxMixture(df, "doc_id", "source", 27).count() == 27)
    assert(TextOps.unimaxMixture(df, "doc_id", "source", 100).count() == 27)
    // budget 12: tiny kept whole (2*3=6 <= 12); mid: 5*2=10 <= 10 -> whole;
    // big takes the remaining 5
    val a12 = TextOps.unimaxMixture(df, "doc_id", "source", 12)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(a12 == Map("tiny" -> 2L, "mid" -> 5L, "big" -> 5L), a12.toString)
    // budget 9: tiny whole (2*3=6 <= 9); mid fails (5*2=10 > 7) -> mid/big
    // split 7 = 3 each + remainder 1 to mid (smaller source first)
    val a9 = TextOps.unimaxMixture(df, "doc_id", "source", 9)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(a9 == Map("tiny" -> 2L, "mid" -> 4L, "big" -> 3L), a9.toString)
    // exact budget and reproducible row-for-row
    val k1 = TextOps.unimaxMixture(df, "doc_id", "source", 9)
      .select("doc_id").as[Long].collect().toSet
    assert(k1.size == 9)
    assert(k1 == TextOps.unimaxMixture(df, "doc_id", "source", 9)
      .select("doc_id").as[Long].collect().toSet)
    // NULL ids are not sampleable
    val withNull = df.unionAll(Seq((Option.empty[Long], "tiny")).toDF("doc_id", "source"))
    assert(TextOps.unimaxMixture(withNull, "doc_id", "source", 100).count() == 27)
    // NULL sources are excluded BEFORE the size aggregation: they neither
    // receive budget nor silently consume it (pre-r10 they inflated the
    // waterfill then vanished at the allocation join)
    val withNullSrc = df.unionAll(
      Seq((900L, Option.empty[String]), (901L, Option.empty[String])).toDF("doc_id", "source"))
    val ns = TextOps.unimaxMixture(withNullSrc, "doc_id", "source", 9)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(ns == Map("tiny" -> 2L, "mid" -> 4L, "big" -> 3L), ns.toString)
  }

  test("unimaxMixture: bounded reservoir route == window form, multi-partition input") {
    // long ids take the ReservoirAgg route; casting the SAME ids to string
    // forces the window fallback — md5 draws are identical (both hash the
    // decimal string), so the selected id sets must agree exactly
    val df = (Seq((1L, "tiny"), (2L, "tiny")) ++
      (11L to 15L).map((_, "mid")) ++
      (101L to 120L).map((_, "big"))).toDF("doc_id", "source")
      .repartition(7)
    for (budget <- Seq(5L, 9L, 12L, 27L)) {
      val bounded = TextOps.unimaxMixture(df, "doc_id", "source", budget)
        .select("doc_id").as[Long].collect().toSet
      val window = TextOps.unimaxMixture(
        df.withColumn("doc_id", col("doc_id").cast("string")), "doc_id", "source", budget)
        .select("doc_id").as[String].collect().toSet.map((s: String) => s.toLong)
      assert(bounded == window, s"budget=$budget: $bounded vs $window")
      assert(bounded.size == math.min(budget, 27L), s"budget=$budget size=${bounded.size}")
    }
  }

  test("c4Rules: sentence/line/lorem/brace rules hand-computed") {
    val df = Seq(
      (1L, "A good doc sentence one. And sentence two here! A third question?"),
      (2L, "only one sentence here."),
      (3L, "lines\nwith few words. second sentence ok. third one here."),
      (4L, "Lorem Ipsum dolor sit amet. More text here now. Third sentence too."),
      (5L, "code { leaked } doc. second sentence words. third sentence words."))
      .toDF("doc_id", "text")
    val out = TextOps.c4Rules(df, "doc_id", "text")
      .select("id", "n_sentences", "n_short_lines", "r_sentences", "r_line_words",
        "r_lorem", "r_brace", "accept")
      .as[(Long, Long, Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == (1L, 3L, 0L, true, true, true, true, true))
    // doc 2: its single line "only one sentence here." has 4 words (< 5)
    assert(out(2L) == (2L, 1L, 1L, false, false, true, true, false))
    // doc 3: line "lines" has 1 word (< 5)
    assert(out(3L)._3 == 1L && !out(3L)._5 && !out(3L)._8)
    assert(!out(4L)._6 && !out(4L)._8, "lorem ipsum must be case-insensitive")
    assert(!out(5L)._7 && !out(5L)._8)
  }

  test("unimax waterfill edges: single source, equal sizes, budget below |sources|") {
    // single source: plain truncation to the budget
    val one = (1L to 10L).map((_, "only")).toDF("doc_id", "source")
    assert(TextOps.unimaxMixture(one, "doc_id", "source", 4).count() == 4)
    // three equal 5-row sources, budget 7: none fits whole (5*3 > 7), so
    // base 2 + remainder 1 to the first in ascending (size, name) order
    val eq = (1L to 5L).map((_, "a")) ++ (11L to 15L).map((_, "b")) ++
      (21L to 25L).map((_, "c"))
    val eqDf = eq.toDF("doc_id", "source")
    val a7 = TextOps.unimaxMixture(eqDf, "doc_id", "source", 7)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(a7 == Map("a" -> 3L, "b" -> 2L, "c" -> 2L), a7.toString)
    // budget below the source count: only the first `budget` sources
    // (ascending) get one row each — exact budget, no over-allocation
    val a2 = TextOps.unimaxMixture(eqDf, "doc_id", "source", 2)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(a2 == Map("a" -> 1L, "b" -> 1L), a2.toString)
    // epochs with a remainder split: caps 6/6 at E=2, budget 9 -> 5 + 4
    val two = ((1L to 3L).map((_, "x")) ++ (11L to 13L).map((_, "y")))
      .toDF("doc_id", "source")
    val e9 = TextOps.unimaxEpochsMixture(two, "doc_id", "source", 9, maxEpochs = 2)
    assert(e9.count() == 9)
    val bySrc = e9.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc == Map("x" -> 5L, "y" -> 4L), bySrc.toString)
    assert(e9.select(max("epoch")).as[Long].head() == 1L, "cap respected")
  }

  test("unimaxEpochsMixture: epoch caps, complete + partial epochs, E=1 == unimaxMixture") {
    val df = (Seq((1L, "tiny"), (2L, "tiny")) ++
      (11L to 15L).map((_, "mid")) ++
      (101L to 120L).map((_, "big"))).toDF("doc_id", "source")
    // sizes 2/5/20 (total 27); caps at E=3: 6/15/60 (total 81)
    // budget >= total cap keeps every row exactly E times
    val all = TextOps.unimaxEpochsMixture(df, "doc_id", "source", 100, maxEpochs = 3)
    assert(all.count() == 81)
    assert(all.groupBy("doc_id").count().select("count").as[Long].collect().forall(_ == 3))
    assert(all.select("epoch").distinct().as[Long].collect().toSet == Set(0L, 1L, 2L))
    // budget 30: tiny whole at cap (6 = 3 epochs); mid/big split 24 -> 12
    // each, so mid (n=5) = 2 complete epochs + 2-row partial, big (n=20) =
    // a 12-row partial of epoch 0
    val b30 = TextOps.unimaxEpochsMixture(df, "doc_id", "source", 30, maxEpochs = 3)
    assert(b30.count() == 30)
    val bySrcEpoch = b30.groupBy("source", "epoch").count()
      .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(bySrcEpoch == Map(
      ("tiny", 0L) -> 2L, ("tiny", 1L) -> 2L, ("tiny", 2L) -> 2L,
      ("mid", 0L) -> 5L, ("mid", 1L) -> 5L, ("mid", 2L) -> 2L,
      ("big", 0L) -> 12L), bySrcEpoch.toString)
    // the partial epoch picks the SAME hash-rank-first ids as the one-epoch
    // form at that allocation, and is reproducible
    val midPartial = b30.where(col("source") === "mid" && col("epoch") === 2)
      .select("doc_id").as[Long].collect().toSet
    val midDirect = TextOps.unimaxMixture(
      df.where(col("source") === "mid"), "doc_id", "source", 2)
      .select("doc_id").as[Long].collect().toSet
    assert(midPartial == midDirect, s"$midPartial vs $midDirect")
    // maxEpochs = 1 degenerates to unimaxMixture exactly
    for (budget <- Seq(9L, 12L, 27L)) {
      val e1 = TextOps.unimaxEpochsMixture(df, "doc_id", "source", budget, maxEpochs = 1)
      assert(e1.select("epoch").distinct().as[Long].collect().toSeq == Seq(0L))
      assert(e1.select("doc_id").as[Long].collect().toSet ==
        TextOps.unimaxMixture(df, "doc_id", "source", budget)
          .select("doc_id").as[Long].collect().toSet, s"budget=$budget")
    }
  }

  test("filterPipeline: fused verdicts == standalone langId/quality/gopher/c4 ops") {
    val texts = Seq(
      1L -> ("the cat sat of the mat and was the best cat in town today. " * 5 +
        "it was a very good day for the cat to be out. the end of the story is here."),
      2L -> "only one sentence here.",                     // fails c4 + gopher
      3L -> "lorem Ipsum dolor sit amet. more of the filler text here. third one now.",
      4L -> ("der die das und ist " * 15 + "hier. mehr text der die das und ist hier auch. und noch ein satz der passt."),
      5L -> ("x " * 60).trim,                              // degenerate: fails uniq_ratio
      6L -> "code { leaked } of the doc. second sentence of the words. third sentence of the words.")
    val df = texts.toDF("doc_id", "text")
    val fused = TextOps.filterPipeline(df, "doc_id", "text", wantedLangs = Seq("en"))
      .select("id", "lang_guess", "r_lang", "r_quality", "r_gopher", "r_c4", "accept")
      .as[(Long, String, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // each family verdict must equal its standalone op on the same rows
    val lang = TextOps.langIdDf(df, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    val qualityKept = TextOps.qualityFilter(df, "text")
      .select("doc_id").as[Long].collect().toSet
    val gopher = TextOps.gopherRules(df, "doc_id", "text")
      .select("id", "accept").as[(Long, Boolean)].collect().toMap
    val c4 = TextOps.c4Rules(df, "doc_id", "text")
      .select("id", "accept").as[(Long, Boolean)].collect().toMap
    texts.map(_._1).foreach { id =>
      val f = fused(id)
      assert(f._2 == lang(id), s"doc $id lang: ${f._2} vs ${lang(id)}")
      assert(f._3 == (lang(id) == "en"), s"doc $id r_lang")
      assert(f._4 == qualityKept.contains(id), s"doc $id r_quality")
      assert(f._5 == gopher(id), s"doc $id r_gopher")
      assert(f._6 == c4(id), s"doc $id r_c4")
      assert(f._7 == (f._3 && f._4 && f._5 && f._6), s"doc $id accept")
    }
    // the fixture exercises both outcomes of every family
    assert(fused.values.exists(_._5) && fused.values.exists(!_._5), "gopher spread")
    assert(fused.values.exists(_._6) && fused.values.exists(!_._6), "c4 spread")
    assert(fused.values.exists(_._3) && fused.values.exists(!_._3), "lang spread")
    assert(fused.values.exists(_._4) && fused.values.exists(!_._4), "quality spread")
  }

  test("linearGramScores: lexicon weights drive sign and ordering; gram counts exact; spine keeps unscored docs") {
    val lex = Seq(("good", 1000000L), ("bad", -1000000L), ("very good", 3000000L))
    val df = Seq(
      (1L, "good good stuff"),      // 2x good = +2e6 over 5 grams
      (2L, "bad bad bad"),          // 3x bad = -3e6 over 5 grams
      (3L, "very good stuff here"), // very good bigram + good unigram
      (4L, "neutral words only"))   // nothing weighted
      .toDF("doc_id", "text")
    val wt = TextOps.lexiconGramWeights(spark, lex, buckets = 65536)
    val out = TextOps.linearGramScores(df, "doc_id", "text", wt, buckets = 65536)
      .select("doc_id", "n_grams", "score_micro_sum", "score_mean")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // unigrams + bigrams: n tokens + (n-1) bigrams
    assert(out(1L)._2 == 5L && out(2L)._2 == 5L && out(3L)._2 == 7L && out(4L)._2 == 5L)
    assert(out(1L)._3 == 2000000L, out(1L).toString)
    assert(out(2L)._3 == -3000000L, out(2L).toString)
    assert(out(3L)._3 == 1000000L + 3000000L, out(3L).toString)
    assert(out(4L)._3 == 0L && out(4L)._4 == 0.0)
    assert(out(1L)._4 == 2000000.0 / 5 && out(2L)._4 < 0)
    // bias shifts every document uniformly
    val biased = TextOps.linearGramScores(df, "doc_id", "text", wt,
      buckets = 65536, biasMicro = 500000L)
      .select("doc_id", "score_micro_sum").as[(Long, Long)].collect().toMap
    assert(biased.forall { case (id, s) => s == out(id)._3 + 500000L })
  }

  test("dsirScores: target-like docs outscore off-target; gram counts exact") {
    // target distribution = docs about "cats"; raw corpus has one on-target
    // and one off-target doc of the same length
    val target = Seq((100L, "cat cat cat cat"), (101L, "cat cat cat cat")).toDF("doc_id", "text")
    val corpus = Seq((1L, "cat cat cat cat"), (2L, "dog dog dog dog")).toDF("doc_id", "text")
    val out = TextOps.dsirScores(corpus, target, "doc_id", "text", buckets = 64)
      .select("doc_id", "n_grams", "dsir_micro_sum")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // 4 unigrams + 3 bigrams each
    assert(out(1L)._2 == 7L && out(2L)._2 == 7L)
    assert(out(1L)._3 > out(2L)._3,
      s"on-target doc must outscore off-target: ${out(1L)._3} vs ${out(2L)._3}")
    // reproducible
    val again = TextOps.dsirScores(corpus, target, "doc_id", "text", buckets = 64)
      .select("doc_id", "dsir_micro_sum").as[(Long, Long)].collect().toMap
    assert(again == out.map { case (k, v) => k -> v._3 })
  }

  test("collocations: hand-computed PMI ratio and ranking; frequencySpectrum invariants") {
    // corpus: "a b" x4, "a c" x1, "c c" x1 -> N = 12 tokens
    // c(a)=5, c(b)=4, c(c)=3; cxy(a,b)=4, cxy(a,c)=1, cxy(c,c)=1
    val docs = (Seq.fill(4)("a b") ++ Seq("a c", "c c")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextOps.collocations(docs, "text", topK = 5, minCount = 1)
      .as[(String, String, Long, Long, Long, Double)].collect()
    val m = out.map(r => (r._1, r._2) -> r).toMap
    // ratio(a,b) = 4*12/(5*4) = 2.4; ratio(c,c) = 1*12/(3*3) = 4/3; (a,c)=12/15
    assert(m(("a", "b"))._6 == (4.0 * 12.0) / (5.0 * 4.0))
    assert(m(("c", "c"))._6 == 12.0 / 9.0)
    assert(out.head._1 == "a" && out.head._2 == "b") // highest ratio first
    // minCount floors out the rare pairs
    assert(TextOps.collocations(docs, "text", 5, minCount = 2).count() == 1L)
    // spectrum: types by occurrence count — a:5, b:4, c:3 -> one type each
    val sp = TextOps.frequencySpectrum(docs, "text")
      .as[(Long, Long)].collect().toMap
    assert(sp == Map(5L -> 1L, 4L -> 1L, 3L -> 1L))
    // mass check on the fixture: sum(occurrences * n_types) == token count
    val fix = Tables.load(spark, sfDir, "documents")
    val mass = TextOps.frequencySpectrum(fix, "text")
      .agg(sum(col("occurrences") * col("n_types"))).head().getLong(0)
    val toks = fix.select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "").count()
    assert(mass == toks, s"$mass vs $toks")
  }

  test("registeredDomain: www strip, ccSLD suffixes, subdomains, blocklist gate") {
    import spark.implicits._
    def rd(h: String): String =
      Seq(h).toDF("h").select(TextOps.registeredDomain(col("h"))).as[String].head()
    assert(rd("www.example.com") == "example.com")
    assert(rd("a.b.example.com") == "example.com")
    assert(rd("news.bbc.co.uk") == "bbc.co.uk")
    assert(rd("bbc.co.uk") == "bbc.co.uk")
    // bare two-level suffix has no registrable label: heuristic keeps it
    assert(rd("co.uk") == "co.uk")
    assert(rd("localhost") == "localhost")
    assert(rd("example.org") == "example.org")
    val df = Seq((1L, "www.spam.co.uk"), (2L, "ok.example.com"), (3L, "spam.co.uk"))
      .toDF("id", "host")
    val kept = TextOps.domainBlocklistFilter(df, "host", Seq("spam.co.uk"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }

  test("chunkDocuments: window math, overlap, tail handling, degenerate docs") {
    import spark.implicits._
    def toks(k: Int) = (1 to k).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, toks(10)), (2L, toks(3)), (3L, toks(4)), (4L, "solo"))
      .toDF("doc_id", "text")
    val out = TextOps.chunkDocuments(df, "doc_id", "text", 4, 2)
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // 10 tokens, chunk 4, stride 2 -> ceil((10-2)/2) = 4 chunks at 0,2,4,6
    assert(out(1L).map(_._3).toSeq == Seq(
      "t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8", "t7 t8 t9 t10"))
    assert(out(1L).map(_._4).toSeq == Seq(4L, 4L, 4L, 4L))
    // shorter than one chunk -> exactly one (possibly short) chunk
    assert(out(2L).map(_._3).toSeq == Seq("t1 t2 t3"))
    assert(out(4L).map(_._3).toSeq == Seq("solo"))
    // exactly one chunk's worth -> one chunk, no redundant tail window
    assert(out(3L).map(_._3).toSeq == Seq("t1 t2 t3 t4"))
    // reconstruction: chunk 0 + each later chunk minus its overlap == doc
    val rebuilt = out(1L).map(_._3.split(" ").toSeq).zipWithIndex
      .flatMap { case (c, i) => if (i == 0) c else c.drop(2) }
    assert(rebuilt.toSeq == (1 to 10).map(i => s"t$i"))
    // zero overlap: disjoint cover
    val z = TextOps.chunkDocuments(df.where(col("doc_id") === 1L),
      "doc_id", "text", 3, 0).as[(Long, Long, String, Long)].collect().sortBy(_._2)
    assert(z.map(_._3).toSeq == Seq("t1 t2 t3", "t4 t5 t6", "t7 t8 t9", "t10"))
    // guards
    intercept[IllegalArgumentException](
      TextOps.chunkDocuments(df, "doc_id", "text", 4, 4))
  }

  test("stripHtml: tags, script/style contents, comments, entities, whitespace") {
    def run(s: String): String =
      Seq(s).toDF("h").select(TextOps.stripHtml(col("h"))).as[String].head()
    // block tags become separators, never gluing words
    assert(run("<p>alpha</p><p>beta</p>") == "alpha beta")
    // script and style drop WITH contents, case-insensitive, across newlines
    assert(run("a<SCRIPT type=x>var q = '<p>';\nmore()</script>b") == "a b")
    assert(run("x<style>p { color: red }</style>y<!-- note\nnote -->z") == "x y z")
    // entity decode: &amp; last, so &amp;lt; stays literal &lt;
    assert(run("<div>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;</div>")
      == "a & b <tag> \"q\" 's'")
    assert(run("one&amp;lt;two") == "one&lt;two")
    assert(run("a&nbsp;&nbsp;b") == "a b")
    // attributes with > inside quotes are out of the regex contract, but
    // plain attributed tags strip
    assert(run("""<a href="u" class='c'>link</a> tail""") == "link tail")
    // whitespace collapse + trim; NULL passthrough
    assert(run("  <br/>  a\n\n b\t") == "a b")
    assert(Seq((null: String)).toDF("h")
      .select(TextOps.stripHtml(col("h"))).head().isNullAt(0))
  }
}

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("quantizeInt8: codes are floor(v*127/norm + 0.5), zero vector -> zero codes") {
    val dim = 4
    val df = Seq(
      (1L, Array(3.0f, 4.0f, 0.0f, 0.0f)), // norm 5
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector
      (3L, Array(-3.0f, 4.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df, "vec_id", "embedding", dim = dim)
      .select("vec_id", "l2_norm", "codes")
      .as[(Long, Double, Seq[Int])].collect().map(r => r._1 -> r).toMap
    assert(math.abs(out(1L)._2 - 5.0) < 1e-9)
    // 3/5*127 = 76.2 -> 76; 4/5*127 = 101.6 -> floor(102.1) = 102
    assert(out(1L)._3 == Seq(76, 102, 0, 0))
    assert(out(2L)._2 == 0.0 && out(2L)._3 == Seq(0, 0, 0, 0))
    // negative component: floor(-76.2 + 0.5) = floor(-75.7) = -76
    assert(out(3L)._3 == Seq(-76, 102, 0, 0))
    // codes reconstruct the direction: cosine(original, codes) ~ 1
    val c = out(1L)._3.map(_.toDouble)
    val v = Seq(3.0, 4.0, 0.0, 0.0)
    val cos = c.zip(v).map { case (a, b) => a * b }.sum /
      (math.sqrt(c.map(x => x * x).sum) * math.sqrt(v.map(x => x * x).sum))
    assert(cos > 0.9999)
  }

  test("fused QuantizeVec ≡ the unrolled round(get(v,i)·1e6) tree, incl. half-up and short/null edges") {
    def unrolled(vec: org.apache.spark.sql.Column, dim: Int) =
      array((0 until dim).map(i =>
        round(get(vec, lit(i)).cast("double") * 1000000d).cast("long")): _*)
    // real embeddings: element-wise equality across the whole fixture
    val emb = Tables.load(spark, sfDir, "embeddings")
    val diff = emb.select(
        Similarity.quantize(col("embedding"), 64).as("a"),
        unrolled(col("embedding"), 64).as("b"))
      .where(not(col("a") <=> col("b"))).count()
    assert(diff == 0L, s"$diff rows diverge from the unrolled form")
    // adversarial values: exact .5 boundaries both signs (HALF_UP away from
    // zero — Math.round would disagree at -0.0000005), short array → null
    // tail, null element passthrough
    val edge = Seq(
      (1L, Array[java.lang.Float](0.0000005f, -0.0000005f, 1.5e-6f, null)),
      (2L, Array[java.lang.Float](1.0f)))
      .toDF("id", "v")
    val got = edge.select(col("id"), Similarity.quantize(col("v"), 6).as("a"),
        unrolled(col("v"), 6).as("b"))
      .where(not(col("a") <=> col("b"))).count()
    assert(got == 0L)
    // non-finite elements: round() passes NaN/Inf through and the LEGACY
    // long cast yields 0 / Long.MaxValue / Long.MinValue — the fused form
    // reproduces that total-function chain instead of throwing (one NaN
    // embedding element must not kill a 100 TB job; ANSI cast would)
    val nonFinite = Seq(
      (1L, Array(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity, 2.5f)))
      .toDF("id", "v")
    val vals = nonFinite.select(Similarity.quantize(col("v"), 4))
      .as[Array[Long]].head()
    assert(vals.sameElements(Array(0L, Long.MaxValue, Long.MinValue, 2500000L)),
      vals.mkString(","))
    // pin "legacy chain" literally: with ANSI off the unrolled tree agrees
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val nf = nonFinite.select(col("id"),
          Similarity.quantize(col("v"), 4).as("a"), unrolled(col("v"), 4).as("b"))
        .where(not(col("a") <=> col("b"))).count()
      assert(nf == 0L)
    } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
  }
}

class TimeColsSpec extends SparkSpec {
  import spark.implicits._

  test("epochMicros: zoned and NTZ agree; raw numeric input fails at analysis") {
    val zoned = Seq(java.sql.Timestamp.valueOf("2024-01-02 03:04:05.000006"))
      .toDF("ts")
    val z = zoned.select(TimeCols.epochMicros(col("ts")).as("us")).as[Long].head()
    val n = zoned.select(TimeCols.epochMicros(col("ts").cast("timestamp_ntz")).as("us"))
      .as[Long].head()
    assert(z == n, s"zoned $z vs ntz $n")
    // a raw LONG (e.g. pre-converted epoch nanos) must be rejected at
    // analysis, not silently read as epoch seconds
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1704164645000006L).toDF("ns")
        .select(TimeCols.epochMicros(col("ns"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("cast"), err.getMessage)
  }
}

class EventsSpec extends SparkSpec {
  import spark.implicits._
  import java.sql.Timestamp

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize: strict gap split, ordinal per user, duration and type counts") {
    val df = Seq(
      // user 1: two sessions — 10:00/10:10 then a 31-min gap to 10:41
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 10:10:00"), 1L, "click"),
      (3L, ts("2024-01-01 10:41:00"), 1L, "view"),
      // user 2: one session — gap exactly 30 min does NOT split (strict >)
      (4L, ts("2024-01-01 09:00:00"), 2L, "view"),
      (5L, ts("2024-01-01 09:30:00"), 2L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Events.sessionize(df, "user_id", "ts", "event_id", "event_type", gapSec = 1800)
      .select("user_id", "session_seq", "n_events", "n_event_types", "duration_sec")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toList
    assert(out == List(
      (1L, 1L, 2L, 2L, 600L), // view+click, 10 min
      (1L, 2L, 1L, 1L, 0L),
      (2L, 1L, 2L, 1L, 1800L)))
  }

  test("gapFillDaily: missing (key, day) cells appear with 0") {
    val df = Seq(
      ("a", ts("2024-01-01 05:00:00")),
      ("a", ts("2024-01-03 05:00:00")),
      ("b", ts("2024-01-02 05:00:00")))
      .toDF("event_type", "ts")
    val out = Events.gapFillDaily(df, "event_type", "ts")
      .select(col("event_type"), col("day").cast("string"), col("n_events"))
      .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2)).toList
    // full 3-day spine for both keys, zeros where absent
    assert(out == List(
      ("a", "2024-01-01", 1L), ("a", "2024-01-02", 0L), ("a", "2024-01-03", 1L),
      ("b", "2024-01-01", 0L), ("b", "2024-01-02", 1L), ("b", "2024-01-03", 0L)))
  }

  test("gapFillDaily: |keys|·|days| over maxGrid fails loudly in-plan") {
    val df = Seq(
      ("a", ts("2024-01-01 05:00:00")),
      ("a", ts("2024-01-03 05:00:00")),
      ("b", ts("2024-01-02 05:00:00")))
      .toDF("event_type", "ts")
    // 2 keys × 3 days = 6 > 5 — the grid guard must fire before the fill
    val e = intercept[Exception] {
      Events.gapFillDaily(df, "event_type", "ts", maxGrid = 5L).collect()
    }
    assert(e.getMessage.contains("maxGrid"), e.getMessage)
    // at the cap exactly, the op passes and the answer is unchanged
    val ok = Events.gapFillDaily(df, "event_type", "ts", maxGrid = 6L)
      .agg(count(lit(1)), sum("n_events")).as[(Long, Long)].head()
    assert(ok == ((6L, 3L)))
  }
}

class KeywordsSpec extends SparkSpec {
  import spark.implicits._

  test("keywords: tf-desc/df-asc/token-asc ranking, tfidf consistent with counts") {
    val df = Seq(
      (1L, "x x y common"),
      (2L, "y common common"),
      (3L, "z common")).toDF("doc_id", "text")
    val out = TextOps.keywords(df, "doc_id", "text", topK = 2)
      .as[(Long, Int, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // doc 1: x (tf 2) first; then y (df 2) beats common (df 3)
    assert(out((1L, 1))._3 == "x" && out((1L, 1))._4 == 2L && out((1L, 1))._5 == 1L)
    assert(out((1L, 2))._3 == "y")
    // doc 2: common tf 2 wins; doc 3: z (df 1) beats common
    assert(out((2L, 1))._3 == "common")
    assert(out((3L, 1))._3 == "z")
    // tfidf = tf * ln(N/df): x in doc1 = 2*ln(3/1)
    assert(math.abs(out((1L, 1))._6 - 2.0 * math.log(3.0)) < 1e-12)
  }
}

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("histogram: fixed-width bins, out-of-range values clamp to edges, nulls dropped") {
    val df = Seq[java.lang.Double](-5.0, 0.0, 0.5, 1.0, 3.9, 4.0, 99.0, null)
      .toDF("v")
    // [0,4) in 4 bins of width 1; -5 clamps to bin 0, 99 and 4.0 clamp to bin 3
    val out = Stats.histogram(df, "v", lo = 0.0, hi = 4.0, nBins = 4)
      .select("bin", "n", "min_v", "max_v")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toList
    assert(out == List(
      (0L, 3L, -5.0, 0.5), (1L, 1L, 1.0, 1.0), (3L, 3L, 3.9, 99.0)))
  }

  test("weightedBernoulliSample: deterministic, weight-0 excluded, dominant weight certain, expected count in range") {
    val df = (0L until 1000L).map(i => (i, if (i == 0) 0L else 10L))
      .toDF("id", "w")
    val a = Stats.weightedBernoulliSample(df, "id", "w", expectedN = 100)
      .select("id").as[Long].collect().toSet
    val b = Stats.weightedBernoulliSample(df, "id", "w", expectedN = 100)
      .select("id").as[Long].collect().toSet
    assert(a == b, "same seed must select the same set")
    assert(!a.contains(0L), "zero-weight row sampled")
    // expected |a| = 100·(uniform weights); md5 draws are iid-ish — allow 3σ
    assert(a.size > 60 && a.size < 140, s"count ${a.size} far from expected 100")
    // a row carrying ≥ W/expectedN of the total weight has p = 1
    val df2 = (0L until 100L).map(i => (i, if (i == 7) 1000000L else 1L)).toDF("id", "w")
    val s2 = Stats.weightedBernoulliSample(df2, "id", "w", expectedN = 10)
      .select("id").as[Long].collect().toSet
    assert(s2.contains(7L), "certain-inclusion row missing")
    // different seed decorrelates
    val c = Stats.weightedBernoulliSample(df, "id", "w", expectedN = 100, seed = "other")
      .select("id").as[Long].collect().toSet
    assert(a != c, "seed has no effect")
  }
}

class WinsorizeSpec extends SparkSpec {
  import spark.implicits._

  test("groupedHistogramPercentiles == interpreted percentile() per group") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val viaHist = graft.ops.Stats.groupedHistogramPercentiles(
        li, "l_returnflag", "l_quantity", Seq(0.25, 0.5, 0.9))
      .select("l_returnflag", "p25", "p50", "p90")
      .as[(String, Double, Double, Double)].collect().toSet
    val viaExact = li.groupBy("l_returnflag").agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"))
      .select("l_returnflag", "p25", "p50", "p90")
      .as[(String, Double, Double, Double)].collect().toSet
    assert(viaHist == viaExact)
  }

  test("robustScalePerGroup: hand-computed median/IQR; degenerate and NULL edges") {
    // group a: values 1..5 -> med 3, q1 2, q3 4, iqr 2; group b: constant
    val df = Seq(
      (1L, "a", Some(1.0)), (2L, "a", Some(2.0)), (3L, "a", Some(3.0)),
      (4L, "a", Some(4.0)), (5L, "a", Some(5.0)), (6L, "a", None),
      (7L, "b", Some(9.0)), (8L, "b", Some(9.0))).toDF("id", "g", "v")
    val out = graft.ops.Stats.robustScalePerGroup(df, "g", "id", "v")
      .select("id", "robust_z").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(-1.0) && out(3L).contains(0.0) && out(5L).contains(1.0))
    assert(out(2L).contains(-0.5) && out(4L).contains(0.5))
    assert(out(6L).isEmpty, "NULL value must stay NULL")
    assert(out(7L).contains(0.0) && out(8L).contains(0.0), "zero-IQR group -> 0")
    // a group whose values are ALL NULL must keep its rows (z = NULL), not
    // silently vanish through an inner stats join
    val withNullGroup = df.unionByName(
      Seq((9L, "c", Option.empty[Double]), (10L, "c", Option.empty[Double]))
        .toDF("id", "g", "v"))
    val out2 = graft.ops.Stats.robustScalePerGroup(withNullGroup, "g", "id", "v")
      .select("id", "robust_z").as[(Long, Option[Double])].collect().toMap
    assert(out2.keySet.contains(9L) && out2.keySet.contains(10L),
      s"all-NULL group rows dropped: ${out2.keySet}")
    assert(out2(9L).isEmpty && out2(10L).isEmpty)
  }

  test("winsorize clips to exact interpolated percentiles; NULLs pass through") {
    // values 0..100 plus an outlier pair; p10/p90 of 0..100 ∪ {-1000, 1000}:
    // n=103, k_lo = 102*0.1 = 10.2 over sorted values
    val vals = (0 to 100).map(_.toDouble) ++ Seq(-1000.0, 1000.0)
    val df = (vals.map(Option(_)) :+ Option.empty[Double]).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = graft.ops.Stats.winsorize(df, "v", 0.1, 0.9, "w")
      .select("id", "w").as[(Long, Option[Double])].collect().toMap
    // expected bounds = percentile() definition over the sorted list
    val sorted = vals.sorted
    def pct(p: Double): Double = {
      val k = (sorted.length - 1) * p
      sorted(k.floor.toInt) + (k - k.floor) * (sorted(k.ceil.toInt) - sorted(k.floor.toInt))
    }
    val (lo, hi) = (pct(0.1), pct(0.9))
    vals.indices.foreach { i =>
      val expect = math.min(math.max(vals(i), lo), hi)
      assert(out(i.toLong).contains(expect), s"id $i: ${out(i.toLong)} vs $expect")
    }
    assert(out(vals.length.toLong).isEmpty, "NULL must stay NULL, not clamp")
  }
}

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("Misra-Gries guarantees hold under multi-partition merges: est <= true <= est + n/(k+1)") {
    // skewed stream: token i appears i^2 times, plus a high-cardinality tail
    // of singletons; shuffled ordering and 16 partitions force real partial
    // buffers and merges
    val heavyPart = (1 to 30).flatMap(i => Seq.fill(i * i)(s"tok$i"))
    val tail = (1 to 5000).map(i => s"rare$i")
    val stream = scala.util.Random.shuffle(heavyPart ++ tail)
    val df = stream.toDF("token").repartition(16)
    val k = 20
    val n = stream.size.toLong
    val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val sketch = graft.ops.Stats.heavyHitters(df, "token", k)
      .select("item", "est", "n_total").as[(String, Long, Long)].collect()
    assert(sketch.forall(_._3 == n))
    assert(sketch.length <= k, s"sketch holds ${sketch.length} > k=$k items")
    // underestimate bounded by n/(k+1); never an overestimate
    sketch.foreach { case (item, est, _) =>
      val truth = exact.getOrElse(item, 0L)
      assert(est <= truth, s"$item overestimated: $est > $truth")
      assert(truth - est <= n / (k + 1) + 1, s"$item est too low: $est vs $truth")
    }
    // presence guarantee: every item with true count > n/(k+1) is in the sketch
    val present = sketch.map(_._1).toSet
    exact.filter(_._2 > n.toDouble / (k + 1)).keys.foreach { hh =>
      assert(present.contains(hh), s"heavy hitter $hh missing from sketch")
    }
  }

  test("uniform high-cardinality stream stays within k counters (no heavy items to report)") {
    val df = (1 to 20000).map(i => s"u${i % 4000}").toDF("token").repartition(8)
    val out = graft.ops.Stats.heavyHitters(df, "token", 10).collect()
    assert(out.length <= 10)
  }
}

class CentroidsSpec extends SparkSpec {
  import spark.implicits._

  test("labelCentroids: exact quantized means per (label, dim)") {
    val df = Seq(
      (0, Array(1.0f, 0.0f)),
      (0, Array(0.0f, 1.0f)),
      (1, Array(0.5f, 0.5f))).toDF("label", "embedding")
    val out = Similarity.labelCentroids(df, "label", "embedding")
      .as[(Int, Int, Long, Double)].collect().map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(out((0, 0)) == ((2L, 500000.0)))
    assert(out((0, 1)) == ((2L, 500000.0)))
    assert(out((1, 0)) == ((1L, 500000.0)))
    assert(out((1, 1)) == ((1L, 500000.0)))
  }
}

class PiiSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii: masks email/ip/phone, flags reflect the original text") {
    val df = Seq(
      (1L, "mail me at bob.smith+x@corp.example.org today"),
      (2L, "server 192.168.0.1 responded"),
      (3L, "call +1 415 555 0199 now"),
      (4L, "clean text, nothing to hide")).toDF("id", "text")
    val out = TextOps.redactPii(df, "text")
      .select("id", "text", "has_email", "has_ip", "has_phone")
      .as[(Long, String, Boolean, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == "mail me at <EMAIL> today" && out(1L)._3)
    assert(out(2L)._2 == "server <IP> responded" && out(2L)._4)
    assert(out(3L)._2 == "call <PHONE> now" && out(3L)._5)
    assert(out(4L)._2 == "clean text, nothing to hide"
      && !out(4L)._3 && !out(4L)._4 && !out(4L)._5)
  }
}

class EwmaSpec extends SparkSpec {
  import spark.implicits._

  test("ewmaPerKey: hand-computed fold, ordering, NULL exclusion, single event") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val df = Seq(
      // user 1, deliberately out of arrival order: sorted by ts the values
      // are 4.0, 8.0, 2.0 -> y = 4; 0.75*4+0.25*8 = 5; 0.75*5+0.25*2 = 4.25
      (1L, ts(3), 30L, Some(2.0)),
      (1L, ts(1), 10L, Some(4.0)),
      (1L, ts(2), 20L, Some(8.0)),
      // NULL value excluded entirely
      (1L, ts(4), 40L, None),
      // ts tie broken by event_id: 1.0 then 3.0 -> 0.75*1+0.25*3 = 1.5
      (2L, ts(1), 2L, Some(3.0)),
      (2L, ts(1), 1L, Some(1.0)),
      (3L, ts(1), 1L, Some(7.5))).toDF("user_id", "ts", "event_id", "value")
    val out = graft.ops.Events.ewmaPerKey(df, "user_id", "ts", "event_id", "value", 0.25)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ((3L, 4.25)))
    assert(out(2L) == ((2L, 1.5)))
    assert(out(3L) == ((1L, 7.5)))
    // partitioning-invariant
    val out2 = graft.ops.Events.ewmaPerKey(df.repartition(7), "user_id", "ts",
      "event_id", "value", 0.25).as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out2 == out)
    intercept[IllegalArgumentException](
      graft.ops.Events.ewmaPerKey(df, "user_id", "ts", "event_id", "value", 1.0))
    // a BINARY key must be rejected loudly at plan time — Array[Byte]'s
    // reference equality would silently make every event its own group
    val binKeyed = df.withColumn("bkey",
      org.apache.spark.sql.functions.unhex(
        org.apache.spark.sql.functions.conv(col("user_id"), 10, 16)))
    val err = intercept[IllegalArgumentException](
      graft.ops.Events.ewmaPerKey(binKeyed, "bkey", "ts", "event_id", "value", 0.25))
    assert(err.getMessage.contains("BINARY"))
  }

  test("ewmaPerKey: a pathologically hot key streams through the fold") {
    // 200k events on ONE key: the r11 collect_list shape buffered the whole
    // series in a single task buffer; the streaming secondary-sort fold
    // holds one accumulator. Values are exact dyadic steps so the expected
    // fold is reproducible in plain Scala.
    val n = 200000
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (0 until n).map(i =>
      (7L, new java.sql.Timestamp(base + i * 1000L), i.toLong, (i % 8).toDouble))
    val df = rows.toDF("user_id", "ts", "event_id", "value").repartition(13)
    val out = graft.ops.Events.ewmaPerKey(df, "user_id", "ts", "event_id", "value", 0.5)
      .as[(Long, Long, Double)].head()
    var exp = 0.0
    (0 until n).foreach { i =>
      val v = (i % 8).toDouble
      exp = if (i == 0) v else exp * 0.5 + v * 0.5
    }
    assert(out == ((7L, n.toLong, exp)))
  }

  test("categoryDriftTimeline: hand-computed chi-square per bucket, top category, ref-only categories contribute") {
    import org.apache.spark.sql.functions._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      // hour bucket 0: a,a,b   hour bucket 1: b,b
      (ts("2024-01-01 10:00:00"), "a"), (ts("2024-01-01 10:20:00"), "a"),
      (ts("2024-01-01 10:59:00"), "b"),
      (ts("2024-01-01 11:05:00"), "b"), (ts("2024-01-01 11:30:00"), "b"))
      .toDF("ts", "cat")
    val ref = Seq(("a", 1L), ("b", 1L)).toDF("cat", "n")
    val out = Events.categoryDriftTimeline(df, "cat", "ts", ref, 3600L)
      .orderBy("bucket_start")
      .as[(Long, Long, Long, String, Long)].collect().toList
    assert(out.map(_._1).distinct.size == 2 &&
      out(1)._1 - out(0)._1 == 3600L, s"buckets: ${out.map(_._1)}")
    // bucket 0 (a=2,b=1, t_b=3; ref a=1,b=1, t_a=2):
    //   a: (1*3-2*2)^2 -> 1e6*1/((1+2)*2*3)=55555; b: 1e6*1/((1+1)*2*3)=83333
    assert(out(0)._2 == 3L && out(0)._3 == 55555L + 83333L &&
      out(0)._4 == "b" && out(0)._5 == 83333L, s"bucket0: ${out(0)}")
    // bucket 1 (b=2, t_b=2): a: 1e6*4/((1+0)*2*2)=1000000 (ABSENCE is the
    // signal); b: 1e6*4/((1+2)*2*2)=333333
    assert(out(1)._2 == 2L && out(1)._3 == 1000000L + 333333L &&
      out(1)._4 == "a" && out(1)._5 == 1000000L, s"bucket1: ${out(1)}")
    // a bucket matching the reference mix exactly scores 0
    val same = Seq((ts("2024-01-01 10:00:00"), "a"),
      (ts("2024-01-01 10:01:00"), "a"), (ts("2024-01-01 10:02:00"), "b"),
      (ts("2024-01-01 10:03:00"), "b")).toDF("ts", "cat")
    val z = Events.categoryDriftTimeline(same, "cat", "ts", ref, 3600L)
      .as[(Long, Long, Long, String, Long)].head()
    assert(z._3 == 0L && z._5 == 0L, s"matched mix scored: $z")
    // a reference-only category charges every bucket for its absence
    val ref3 = Seq(("a", 1L), ("b", 1L), ("c", 2L)).toDF("cat", "n")
    val z3 = Events.categoryDriftTimeline(same, "cat", "ts", ref3, 3600L)
      .as[(Long, Long, Long, String, Long)].head()
    assert(z3._3 > 0L && z3._4 == "c", s"ref-only cat not charged: $z3")
    // guards fire by name
    val eBk = intercept[Exception] {
      Events.categoryDriftTimeline(df, "cat", "ts", ref, 3600L,
        maxBuckets = 1L).collect()
    }
    assert(eBk.getMessage.contains("categoryDriftTimeline"), eBk.getMessage)
    val eCat = intercept[Exception] {
      Events.categoryDriftTimeline(df, "cat", "ts", ref, 3600L,
        maxCats = 1L).collect()
    }
    assert(eCat.getMessage.contains("categoryDriftTimeline"), eCat.getMessage)
    // the PRODUCT guard fires even when both factors sit under their caps
    val eSp = intercept[Exception] {
      Events.categoryDriftTimeline(df, "cat", "ts", ref, 3600L,
        maxSpine = 3L).collect()
    }
    assert(eSp.getMessage.contains("maxSpine"), eSp.getMessage)
  }

  test("categoryDriftTimelineByGroup: each group scores against ITS OWN reference; alien categories don't charge a group; profile-served == direct; guards by name") {
    import org.apache.spark.sql.functions._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // g1 is the global hand case verbatim (two hour buckets); g2 is a
    // single stable bucket; g2's category q must never appear in g1's
    // spine (an alien category would charge g1 for q's absence)
    val df = Seq(
      ("g1", ts("2024-01-01 10:00:00"), "a"), ("g1", ts("2024-01-01 10:20:00"), "a"),
      ("g1", ts("2024-01-01 10:59:00"), "b"),
      ("g1", ts("2024-01-01 11:05:00"), "b"), ("g1", ts("2024-01-01 11:30:00"), "b"),
      ("g2", ts("2024-01-01 10:10:00"), "q"), ("g2", ts("2024-01-01 10:40:00"), "r"))
      .toDF("g", "ts", "cat")
    val ref = Seq(("g1", "a", 1L), ("g1", "b", 1L),
      ("g2", "q", 1L), ("g2", "r", 1L)).toDF("g", "cat", "n")
    val out = Events.categoryDriftTimelineByGroup(df, "cat", "ts", "g", ref, 3600L)
      .orderBy("g", "bucket_start")
      .as[(String, Long, Long, Long, String, Long)].collect().toList
    val g1 = out.filter(_._1 == "g1")
    // identical numbers to the global categoryDriftTimeline hand case
    assert(g1.size == 2 && g1(1)._2 - g1(0)._2 == 3600L, s"g1 buckets: $g1")
    assert(g1(0)._3 == 3L && g1(0)._4 == 55555L + 83333L &&
      g1(0)._5 == "b" && g1(0)._6 == 83333L, s"g1 bucket0: ${g1(0)}")
    assert(g1(1)._3 == 2L && g1(1)._4 == 1000000L + 333333L &&
      g1(1)._5 == "a" && g1(1)._6 == 1000000L, s"g1 bucket1: ${g1(1)}")
    // g2 matches its own reference mix exactly -> 0 (and is untouched by
    // g1's categories)
    val g2 = out.filter(_._1 == "g2")
    assert(g2.size == 1 && g2.head._4 == 0L && g2.head._6 == 0L,
      s"g2 must score 0 against its own ref: $g2")
    // a group with no reference at all scores 0 on all its buckets
    val refG1 = Seq(("g1", "a", 1L), ("g1", "b", 1L)).toDF("g", "cat", "n")
    val noRef = Events.categoryDriftTimelineByGroup(df, "cat", "ts", "g", refG1, 3600L)
      .where(col("g") === "g2")
      .as[(String, Long, Long, Long, String, Long)].collect().toList
    assert(noRef.nonEmpty && noRef.forall(_._4 == 0L),
      s"ref-less group must score 0: $noRef")
    // profile-served == direct, bit-identical
    val served = Events.categoryDriftTimelineByGroupFromProfiles(
        Events.bucketCategoryProfileByGroup(df, "cat", "ts", "g", 3600L),
        ref, "cat", "g")
      .orderBy("g", "bucket_start")
      .as[(String, Long, Long, Long, String, Long)].collect().toList
    assert(served == out, s"served $served vs direct $out")
    // guards fire by the segmented op's name, including the spine product
    val eSp = intercept[Exception] {
      Events.categoryDriftTimelineByGroup(df, "cat", "ts", "g", ref, 3600L,
        maxSpine = 3L).collect()
    }
    assert(eSp.getMessage.contains("categoryDriftTimelineByGroup") &&
      eSp.getMessage.contains("maxSpine"), eSp.getMessage)
  }

  test("numericDriftTimeline: hand-computed per-bucket binned chi-square (the categorical hand case with bins as categories); profile-served == direct; anomalies apply unchanged") {
    import org.apache.spark.sql.functions._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // value 10.0 -> bin 0, value 40.0 -> bin 1: the categoryDriftTimeline
    // hand case with a->bin0, b->bin1 — same exact chi-squares expected
    val df = Seq(
      (ts("2024-01-01 10:00:00"), 10.0), (ts("2024-01-01 10:20:00"), 10.0),
      (ts("2024-01-01 10:59:00"), 40.0),
      (ts("2024-01-01 11:05:00"), 40.0), (ts("2024-01-01 11:30:00"), 40.0))
      .toDF("ts", "v")
    val ref = Seq((0L, 1L), (1L, 1L)).toDF("bin", "n")
    val out = Events.numericDriftTimeline(df, "v", "ts", ref, 3600L)
      .orderBy("bucket_start")
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(out.map(_._1).distinct.size == 2 &&
      out(1)._1 - out(0)._1 == 3600L, s"buckets: ${out.map(_._1)}")
    assert(out(0)._2 == 3L && out(0)._3 == 55555L + 83333L &&
      out(0)._4 == 1L && out(0)._5 == 83333L, s"bucket0: ${out(0)}")
    assert(out(1)._2 == 2L && out(1)._3 == 1000000L + 333333L &&
      out(1)._4 == 0L && out(1)._5 == 1000000L, s"bucket1: ${out(1)}")
    // NULL/NaN values are excluded, the scalar convention
    val noisy = df.unionByName(Seq(
      (ts("2024-01-01 10:10:00"), Double.NaN)).toDF("ts", "v"))
    val clean = Events.numericDriftTimeline(noisy, "v", "ts", ref, 3600L)
      .orderBy("bucket_start")
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(clean == out, s"NaN must not count: $clean")
    // profile-served == direct, bit-identical; concatenated partials OK
    val served = Events.numericDriftTimelineFromProfiles(
        Events.bucketNumericProfile(df, "v", "ts", 3600L), ref)
      .orderBy("bucket_start")
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(served == out, s"served $served vs direct $out")
    val half1 = df.limit(2)
    val half2 = df.except(half1)
    val concat = Events.numericDriftTimelineFromProfiles(
        Events.bucketNumericProfile(half1, "v", "ts", 3600L)
          .unionByName(Events.bucketNumericProfile(half2, "v", "ts", 3600L)),
        ref)
      .orderBy("bucket_start")
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(concat == out, s"concat $concat vs direct $out")
    // the alerting layer consumes the numeric timeline unchanged
    val an = Events.timelineAnomalies(
        Events.numericDriftTimeline(df, "v", "ts", ref, 3600L), k = 0L)
      .orderBy("bucket_start")
      .as[(Long, Long, Long, Long, Boolean)].collect().toList
    assert(an.map(_._2) == out.map(_._3),
      "anomaly layer must carry the timeline's chi2 through")
    // guards fire by the NUMERIC op's name
    val eBk = intercept[Exception] {
      Events.numericDriftTimeline(df, "v", "ts", ref, 3600L,
        maxBuckets = 1L).collect()
    }
    assert(eBk.getMessage.contains("numericDriftTimeline"), eBk.getMessage)
  }

  test("numericDriftTimelineByGroup: per-group hand case == the global numeric timeline within the group; served == direct; anomalies-by-group uses per-group baselines") {
    import org.apache.spark.sql.functions._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // g1 = the numeric-timeline hand case verbatim (10.0->bin0,
    // 40.0->bin1); g2 = one stable bucket matching its own ref
    val df = Seq(
      ("g1", ts("2024-01-01 10:00:00"), 10.0), ("g1", ts("2024-01-01 10:20:00"), 10.0),
      ("g1", ts("2024-01-01 10:59:00"), 40.0),
      ("g1", ts("2024-01-01 11:05:00"), 40.0), ("g1", ts("2024-01-01 11:30:00"), 40.0),
      ("g2", ts("2024-01-01 10:10:00"), 10.0), ("g2", ts("2024-01-01 10:40:00"), 40.0))
      .toDF("g", "ts", "v")
    val ref = Seq(("g1", 0L, 1L), ("g1", 1L, 1L),
      ("g2", 0L, 1L), ("g2", 1L, 1L)).toDF("g", "bin", "n")
    val out = Events.numericDriftTimelineByGroup(df, "v", "ts", "g", ref, 3600L)
      .orderBy("g", "bucket_start")
      .as[(String, Long, Long, Long, Long, Long)].collect().toList
    val g1 = out.filter(_._1 == "g1")
    assert(g1.size == 2 && g1(0)._3 == 3L && g1(0)._4 == 55555L + 83333L &&
      g1(0)._5 == 1L && g1(0)._6 == 83333L, s"g1 bucket0: $g1")
    assert(g1(1)._3 == 2L && g1(1)._4 == 1000000L + 333333L &&
      g1(1)._5 == 0L && g1(1)._6 == 1000000L, s"g1 bucket1: $g1")
    val g2 = out.filter(_._1 == "g2")
    assert(g2.size == 1 && g2.head._4 == 0L, s"stable group must score 0: $g2")
    // profile-served == direct, bit-identical
    val served = Events.numericDriftTimelineByGroupFromProfiles(
        Events.bucketNumericProfileByGroup(df, "v", "ts", "g", 3600L),
        ref, "g")
      .orderBy("g", "bucket_start")
      .as[(String, Long, Long, Long, Long, Long)].collect().toList
    assert(served == out, s"served $served vs direct $out")
    // per-group anomalies: each group ranks against ITS OWN median/MAD —
    // g1's buckets [138888, 1333333] give med 138888, mad 0 (single-side
    // deviations [0, 1194445] -> lower rank 1 = 0), so k=0 flags only the
    // larger bucket; g2's single bucket is its own median -> not flagged
    val an = Events.timelineAnomaliesByGroup(
        Events.numericDriftTimelineByGroup(df, "v", "ts", "g", ref, 3600L),
        "g", k = 0L)
      .orderBy("g", "bucket_start")
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toList
    val ag1 = an.filter(_._1 == "g1")
    assert(ag1.map(_._6) == List(false, true), s"g1 flags: $ag1")
    assert(ag1.forall(_._4 == 138888L), s"g1 per-group median: $ag1")
    val ag2 = an.filter(_._1 == "g2")
    assert(ag2.size == 1 && !ag2.head._6, s"g2 flags: $ag2")
  }

  test("embeddingDriftTimeline: the numeric hand case at dim=1 (cells == bins); served == direct; concatenated partials; padding convention; anomalies apply; guards by name") {
    import org.apache.spark.sql.functions._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // dim=1, binWidth=1.0: component 0.5 -> cell (0,0), 1.5 -> cell (0,1)
    // — the numericDriftTimeline hand case verbatim with (pos,bin) cells,
    // so the exact chi-squares must match it number for number
    val df = Seq(
      (ts("2024-01-01 10:00:00"), Seq(0.5f)), (ts("2024-01-01 10:20:00"), Seq(0.5f)),
      (ts("2024-01-01 10:59:00"), Seq(1.5f)),
      (ts("2024-01-01 11:05:00"), Seq(1.5f)), (ts("2024-01-01 11:30:00"), Seq(1.5f)))
      .toDF("ts", "vec")
    val ref = Seq((0, 0L, 1L), (0, 1L, 1L)).toDF("pos", "bin", "n")
    def run(d: org.apache.spark.sql.DataFrame) =
      Events.embeddingDriftTimeline(d, "vec", "ts", ref, 3600L,
          dim = 1, bins = 4, binWidthMicro = 1000000L)
        .orderBy("bucket_start")
        .as[(Long, Long, Long, Int, Long, Long)].collect().toList
    val out = run(df)
    assert(out.size == 2 && out(1)._1 - out(0)._1 == 3600L, s"buckets: $out")
    assert(out(0)._2 == 3L && out(0)._3 == 55555L + 83333L &&
      out(0)._4 == 0 && out(0)._5 == 1L && out(0)._6 == 83333L, s"bucket0: ${out(0)}")
    assert(out(1)._2 == 2L && out(1)._3 == 1000000L + 333333L &&
      out(1)._4 == 0 && out(1)._5 == 0L && out(1)._6 == 1000000L, s"bucket1: ${out(1)}")
    // profile-served == direct, bit-identical; concatenated partials OK
    val served = Events.embeddingDriftTimelineFromProfiles(
        Events.bucketEmbeddingProfile(df, "vec", "ts", 3600L,
          dim = 1, bins = 4, binWidthMicro = 1000000L), ref)
      .orderBy("bucket_start")
      .as[(Long, Long, Long, Int, Long, Long)].collect().toList
    assert(served == out, s"served $served vs direct $out")
    val half1 = df.limit(2)
    val half2 = df.except(half1)
    def prof(d: org.apache.spark.sql.DataFrame) =
      Events.bucketEmbeddingProfile(d, "vec", "ts", 3600L,
        dim = 1, bins = 4, binWidthMicro = 1000000L)
    val concat = Events.embeddingDriftTimelineFromProfiles(
        prof(half1).unionByName(prof(half2)), ref)
      .orderBy("bucket_start")
      .as[(Long, Long, Long, Int, Long, Long)].collect().toList
    assert(concat == out, s"concat $concat vs direct $out")
    // padding: a SHORT (empty) vector pads to dim — cell (0, bin 0) with
    // n counted and s += 0, the embeddingProfile convention
    val padded = prof(Seq((ts("2024-01-01 10:01:00"), Seq.empty[Float]))
        .toDF("ts", "vec"))
      .as[(Long, Int, Long, Long, Long)].collect().toList
    assert(padded.size == 1 && padded.head._2 == 0 && padded.head._3 == 0L &&
      padded.head._4 == 1L && padded.head._5 == 0L, s"padding: $padded")
    // the alerting layer consumes the embedding timeline unchanged
    val an = Events.timelineAnomalies(
        Events.embeddingDriftTimeline(df, "vec", "ts", ref, 3600L,
          dim = 1, bins = 4, binWidthMicro = 1000000L), k = 0L)
      .orderBy("bucket_start")
      .as[(Long, Long, Long, Long, Boolean)].collect().toList
    assert(an.map(_._2) == out.map(_._3),
      "anomaly layer must carry the timeline's chi2 through")
    // guards fire by the EMBEDDING op's name
    val eBk = intercept[Exception] {
      Events.embeddingDriftTimeline(df, "vec", "ts", ref, 3600L,
        dim = 1, bins = 4, binWidthMicro = 1000000L,
        maxBuckets = 1L).collect()
    }
    assert(eBk.getMessage.contains("embeddingDriftTimeline"), eBk.getMessage)
  }

  test("embeddingDriftTimelineByGroup: per-group hand case == the global embedding timeline within the group; served == direct; ref-less group scores 0") {
    import org.apache.spark.sql.functions._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      ("g1", ts("2024-01-01 10:00:00"), Seq(0.5f)), ("g1", ts("2024-01-01 10:20:00"), Seq(0.5f)),
      ("g1", ts("2024-01-01 10:59:00"), Seq(1.5f)),
      ("g1", ts("2024-01-01 11:05:00"), Seq(1.5f)), ("g1", ts("2024-01-01 11:30:00"), Seq(1.5f)),
      ("g2", ts("2024-01-01 10:10:00"), Seq(0.5f)))
      .toDF("g", "ts", "vec")
    val ref = Seq(("g1", 0, 0L, 1L), ("g1", 0, 1L, 1L)).toDF("g", "pos", "bin", "n")
    val out = Events.embeddingDriftTimelineByGroup(df, "vec", "ts", "g", ref,
        3600L, dim = 1, bins = 4, binWidthMicro = 1000000L)
      .orderBy("g", "bucket_start")
      .as[(String, Long, Long, Long, Int, Long, Long)].collect().toList
    val g1 = out.filter(_._1 == "g1")
    assert(g1.size == 2 && g1(0)._3 == 3L && g1(0)._4 == 55555L + 83333L &&
      g1(0)._6 == 1L && g1(0)._7 == 83333L, s"g1 bucket0: $g1")
    assert(g1(1)._3 == 2L && g1(1)._4 == 1000000L + 333333L &&
      g1(1)._6 == 0L && g1(1)._7 == 1000000L, s"g1 bucket1: $g1")
    // g2 has no reference profile: every bucket scores 0 by convention
    val g2 = out.filter(_._1 == "g2")
    assert(g2.size == 1 && g2.head._4 == 0L, s"ref-less group must score 0: $g2")
    // profile-served == direct, bit-identical
    val served = Events.embeddingDriftTimelineByGroupFromProfiles(
        Events.bucketEmbeddingProfileByGroup(df, "vec", "ts", "g", 3600L,
          dim = 1, bins = 4, binWidthMicro = 1000000L),
        ref, "g")
      .orderBy("g", "bucket_start")
      .as[(String, Long, Long, Long, Int, Long, Long)].collect().toList
    assert(served == out, s"served $served vs direct $out")
  }

  test("embeddingMeanShiftTimeline: hand-computed per-bucket cleared shifts at dim=1, direction signs, L1; served route is the direct route's own body") {
    import org.apache.spark.sql.functions._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // ref = one 0.5 and one 1.5 component: n_a=2, s_a=2,000,000 micro.
    // bucket0 = [0.5, 0.5, 1.5]: n_b=3, s_b=2,500,000 ->
    //   diff = 2e6*3 - 2.5e6*2 = +1e6 -> dir +1, shift = 1e6 // 6 = 166666
    // bucket1 = [1.5, 1.5]: n_b=2, s_b=3,000,000 ->
    //   diff = 2e6*2 - 3e6*2 = -2e6 -> dir -1, shift = 2e6 // 4 = 500000
    val df = Seq(
      (ts("2024-01-01 10:00:00"), Seq(0.5f)), (ts("2024-01-01 10:20:00"), Seq(0.5f)),
      (ts("2024-01-01 10:59:00"), Seq(1.5f)),
      (ts("2024-01-01 11:05:00"), Seq(1.5f)), (ts("2024-01-01 11:30:00"), Seq(1.5f)))
      .toDF("ts", "vec")
    val ref = Seq((0, 0L, 1L, 500000L), (0, 1L, 1L, 1500000L))
      .toDF("pos", "bin", "n", "s")
    val out = Events.embeddingMeanShiftTimeline(df, "vec", "ts", ref, 3600L,
        dim = 1, bins = 4, binWidthMicro = 1000000L)
      .orderBy("bucket_start")
      .as[(Long, Long, Long, Int, Long, Int)].collect().toList
    assert(out.size == 2, s"buckets: $out")
    assert(out(0)._2 == 3L && out(0)._3 == 166666L && out(0)._4 == 0 &&
      out(0)._5 == 166666L && out(0)._6 == 1, s"bucket0: ${out(0)}")
    assert(out(1)._2 == 2L && out(1)._3 == 500000L && out(1)._4 == 0 &&
      out(1)._5 == 500000L && out(1)._6 == -1, s"bucket1: ${out(1)}")
    // profile-served == direct (one code path by construction, asserted
    // anyway against a ROUND-TRIPPED stored profile)
    val served = Events.embeddingMeanShiftTimelineFromProfiles(
        Events.bucketEmbeddingProfile(df, "vec", "ts", 3600L,
          dim = 1, bins = 4, binWidthMicro = 1000000L), ref)
      .orderBy("bucket_start")
      .as[(Long, Long, Long, Int, Long, Int)].collect().toList
    assert(served == out, s"served $served vs direct $out")
  }

  test("embeddingMeanShiftTimelineByGroup: per-group hand case == the global mean-shift timeline within the group; ref-less group scores 0; served == direct") {
    import org.apache.spark.sql.functions._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // g1 = the global mean-shift hand case verbatim; g2 has no reference
    val df = Seq(
      ("g1", ts("2024-01-01 10:00:00"), Seq(0.5f)), ("g1", ts("2024-01-01 10:20:00"), Seq(0.5f)),
      ("g1", ts("2024-01-01 10:59:00"), Seq(1.5f)),
      ("g1", ts("2024-01-01 11:05:00"), Seq(1.5f)), ("g1", ts("2024-01-01 11:30:00"), Seq(1.5f)),
      ("g2", ts("2024-01-01 10:10:00"), Seq(0.5f)))
      .toDF("g", "ts", "vec")
    val ref = Seq(("g1", 0, 0L, 1L, 500000L), ("g1", 0, 1L, 1L, 1500000L))
      .toDF("g", "pos", "bin", "n", "s")
    val out = Events.embeddingMeanShiftTimelineByGroup(df, "vec", "ts", "g",
        ref, 3600L, dim = 1, bins = 4, binWidthMicro = 1000000L)
      .orderBy("g", "bucket_start")
      .as[(String, Long, Long, Long, Int, Long, Int)].collect().toList
    val g1 = out.filter(_._1 == "g1")
    assert(g1.size == 2 &&
      g1(0)._3 == 3L && g1(0)._4 == 166666L && g1(0)._6 == 166666L && g1(0)._7 == 1 &&
      g1(1)._3 == 2L && g1(1)._4 == 500000L && g1(1)._6 == 500000L && g1(1)._7 == -1,
      s"g1: $g1")
    val g2 = out.filter(_._1 == "g2")
    assert(g2.size == 1 && g2.head._4 == 0L && g2.head._7 == 0,
      s"ref-less group must score 0: $g2")
    val served = Events.embeddingMeanShiftTimelineByGroupFromProfiles(
        Events.bucketEmbeddingProfileByGroup(df, "vec", "ts", "g", 3600L,
          dim = 1, bins = 4, binWidthMicro = 1000000L), ref, "g")
      .orderBy("g", "bucket_start")
      .as[(String, Long, Long, Long, Int, Long, Int)].collect().toList
    assert(served == out, s"served $served vs direct $out")
  }

  test("recordMonitorRun + monitorRunAnomalies: history grows one keyed merge per run, re-record overwrites, flags == timelineAnomalies on the same series; per-monitor baselines independent") {
    val store = new graft.core.BucketedStore(tmpDir("monhist"), numBuckets = 4)
    // monitor A: a quiet series with one spike; monitor B: all-large runs
    // (its own baseline — nothing flags)
    val runsA = Seq((10L, 3L), (20L, 1L), (30L, 4L), (40L, 2L), (50L, 100L))
    val runsB = Seq((10L, 900L), (20L, 1000L), (30L, 950L))
    runsA.foreach { case (t, v) =>
      Events.recordMonitorRun(store, "hist", "A", t, v) }
    runsB.foreach { case (t, v) =>
      Events.recordMonitorRun(store, "hist", "B", t, v) }
    // re-recording a run is an overwrite, not a duplicate
    Events.recordMonitorRun(store, "hist", "A", 50L, 100L)
    val hist = store.read("hist", Seq("monitor", "run_ts"))
    assert(hist.count() == 8L, "re-record must overwrite, not append")
    val flagged = Events.monitorRunAnomalies(
        hist.where(col("monitor") === "A"), k = 3L)
      .orderBy("run_ts")
      .as[(Long, Long, Long, Long, Boolean)].collect().toList
    // identical numbers to the timelineAnomalies hand case (med 3, mad 1)
    assert(flagged.forall(r => r._3 == 3L && r._4 == 1L), s"med/mad: $flagged")
    assert(flagged.map(r => r._1 -> r._5).toMap ==
      Map(10L -> false, 20L -> false, 30L -> false, 40L -> false, 50L -> true))
    // per-monitor: B's large-but-stable runs don't flag, A's spike still does
    val byMon = Events.monitorRunAnomaliesByMonitor(hist, k = 3L)
      .orderBy("monitor", "run_ts")
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toList
    assert(byMon.filter(_._1 == "B").forall(!_._6), s"B must not flag: $byMon")
    assert(byMon.count(r => r._1 == "A" && r._6) == 1, s"A's spike: $byMon")
  }

  test("bucketCategoryProfile: FLOOR bucketing — a pre-1970 event lands in the bucket starting BEFORE it") {
    import org.apache.spark.sql.functions._
    // epoch-anchored (NOT Timestamp.valueOf, which parses in the JVM
    // default TZ and would shift the instants on a non-UTC machine):
    // epoch −1800 s = 1969-12-31 23:30 UTC — truncate-toward-zero would
    // put it in bucket 0 (which STARTS AFTER the event); floor puts it in
    // bucket −3600 — SQL `//` semantics, as the DuckDB oracle computes
    def ts(epochSec: Long) = new java.sql.Timestamp(epochSec * 1000L)
    val df = Seq(
      (ts(-1800L), "a"),
      (ts(1800L), "a"))
      .toDF("ts", "cat")
    val out = Events.bucketCategoryProfile(df, "cat", "ts", 3600L)
      .orderBy("bucket_start")
      .as[(Long, String, Long)].collect().toList
    assert(out.map(_._1) == List(-3600L, 0L),
      s"pre-1970 bucket must floor, not truncate: $out")
  }

  test("timelineAnomalies: Hampel median + k*MAD with lower medians, odd and even counts, empty input") {
    def tl(vals: Seq[(Long, Long)]) =
      vals.toDF("bucket_start", "chi2_micro")
    // odd count: sorted [1,2,3,4,100] -> med rank 3 = 3; dev sorted
    // [0,1,1,2,97] -> mad = 1; k=3 threshold 6 -> only 100 flags
    val odd = Events.timelineAnomalies(
        tl(Seq((10L, 3L), (20L, 1L), (30L, 4L), (40L, 2L), (50L, 100L))), k = 3L)
      .orderBy("bucket_start")
      .as[(Long, Long, Long, Long, Boolean)].collect().toList
    assert(odd.forall(r => r._3 == 3L && r._4 == 1L), s"med/mad wrong: $odd")
    assert(odd.map(r => r._1 -> r._5).toMap ==
      Map(10L -> false, 20L -> false, 30L -> false, 40L -> false, 50L -> true),
      s"flags wrong: $odd")
    // even count: LOWER median — sorted [1,2,3,100] -> rank (4+1)/2=2 ->
    // med 2; dev sorted [0,1,1,98] -> mad 1; k=0 -> strictly above med
    val even = Events.timelineAnomalies(
        tl(Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 100L))), k = 0L)
      .orderBy("bucket_start")
      .as[(Long, Long, Long, Long, Boolean)].collect().toList
    assert(even.forall(r => r._3 == 2L && r._4 == 1L), s"med/mad wrong: $even")
    assert(even.map(_._5) == List(false, false, true, true), s"flags: $even")
    // empty timeline yields no rows (not a null-stats row)
    assert(Events.timelineAnomalies(tl(Seq.empty), k = 3L).count() == 0L)
  }
}

class FunnelSpec extends SparkSpec {
  import spark.implicits._
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel: steps must occur strictly in order; out-of-order events don't count") {
    val df = Seq(
      // user 1 completes the funnel in order
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 10:05:00"), 1L, "click"),
      (3L, ts("2024-01-01 10:10:00"), 1L, "purchase"),
      // user 2: click BEFORE any view — depth stops at 1 (the later view)
      (4L, ts("2024-01-01 09:00:00"), 2L, "click"),
      (5L, ts("2024-01-01 09:30:00"), 2L, "view"),
      // user 3: purchase before click — view->click ok, purchase doesn't count
      (6L, ts("2024-01-01 08:00:00"), 3L, "view"),
      (7L, ts("2024-01-01 08:10:00"), 3L, "purchase"),
      (8L, ts("2024-01-01 08:20:00"), 3L, "click"),
      // user 4: no funnel events at all
      (9L, ts("2024-01-01 07:00:00"), 4L, "error"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Events.funnel(df, "user_id", "ts", "event_id", "event_type",
      "view", "click", "purchase")
      .select("user_id", "depth").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 0))
  }

  test("funnel: a second click after a late view still completes step 2") {
    val df = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, "click"),   // too early
      (2L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (3L, ts("2024-01-01 11:00:00"), 1L, "click"),   // qualifies
      (4L, ts("2024-01-01 12:00:00"), 1L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Events.funnel(df, "user_id", "ts", "event_id", "event_type",
      "view", "click", "purchase")
      .select("user_id", "t2_us", "depth").as[(Long, Option[Long], Int)].collect().head
    assert(out._3 == 3)
    assert(out._2.contains(ts("2024-01-01 11:00:00").getTime * 1000))
  }
}

class RetentionSpec extends SparkSpec {
  import spark.implicits._
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("retentionCohorts: offsets in 7-day buckets from first activity") {
    val df = Seq(
      // u1 first active Mon 2024-01-01 week; returns 8 days later (offset 1)
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-10 10:00:00")),
      // u2 same cohort week, only week 0
      (2L, ts("2024-01-03 10:00:00")))
      .toDF("user_id", "ts")
    val out = Events.retentionCohorts(df, "user_id", "ts")
      .select(col("cohort_week").cast("string"), col("week_offset"), col("n_users"))
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2)).toList
    assert(out == List(("2024-01-01", 0L, 2L), ("2024-01-01", 1L, 1L)))
  }
}

class StratifiedZscoreSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedSample: deterministic across invocations, capped per group") {
    val df = (1L to 100L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "grp")
    val s1 = Stats.stratifiedSample(df, "grp", "id", n = 10)
      .select("grp", "id").as[(String, Long)].collect().sorted.toList
    val s2 = Stats.stratifiedSample(df, "grp", "id", n = 10)
      .select("grp", "id").as[(String, Long)].collect().sorted.toList
    assert(s1 == s2)
    assert(s1.count(_._1 == "a") == 10 && s1.count(_._1 == "b") == 10)
  }

  test("stratifiedSampleBounded == window form; plan is agg-only with no window rank") {
    // the bounded form must pick the IDENTICAL (grp, id, rank) set — over a
    // deliberately re-partitioned input so partial buffers really merge
    val df = (1L to 1000L).map(i => (i, s"g${i % 5}")).toDF("id", "grp")
      .repartition(13)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("grp", "id", "sample_rank").as[(String, Long, Int)].collect().toSet
    val win = rows(Stats.stratifiedSample(df, "grp", "id", n = 17))
    val bounded = Stats.stratifiedSampleBounded(df, "grp", "id", n = 17)
    assert(rows(bounded) == win)
    // the scale contract: no Window/row_number anywhere — the sample comes
    // from a partial+final aggregate over k-bounded reservoir buffers
    val p = bounded.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"bounded form fell back to a window rank:\n$p")
    assert(p.contains("graft_reservoir"), s"reservoir aggregate missing:\n$p")
    // groups smaller than n return the whole group, ranked identically
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "grp")
    assert(rows(Stats.stratifiedSampleBounded(tiny, "grp", "id", n = 10)) ==
      rows(Stats.stratifiedSample(tiny, "grp", "id", n = 10)))
    assert(Stats.stratifiedSampleBounded(tiny, "grp", "id", n = 10).count() == 3)
  }

  test("topKPerGroupBounded == window rank across signs, both directions, MinValue edge") {
    // values span negative/positive INCLUDING Long.MinValue: the descending
    // order rides ~v, which must stay a monotone reversal everywhere
    val df = Seq(
      ("a", 1L, 5L), ("a", 2L, -3L), ("a", 3L, Long.MinValue), ("a", 4L, 5L),
      ("a", 5L, Long.MaxValue), ("b", 6L, 0L), ("b", 7L, -1L))
      .toDF("grp", "id", "v").repartition(7)
    def window(desc: Boolean) = {
      val o = if (desc) col("v").desc else col("v").asc
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("grp").orderBy(o, col("id").asc)
      df.withColumn("rank", row_number().over(w)).where(col("rank") <= 3)
        .select("grp", "id", "v", "rank")
        .as[(String, Long, Long, Int)].collect().toSet
    }
    def bounded(desc: Boolean) =
      Stats.topKPerGroupBounded(df, "grp", "id", "v", k = 3, desc = desc)
        .select(col("grp"), col("id"), col("v"), col("rank"))
        .as[(String, Long, Long, Int)].collect().toSet
    assert(bounded(desc = true) == window(desc = true))
    assert(bounded(desc = false) == window(desc = false))
    // non-integral columns fail LOUDLY (a silent cast would empty or
    // reorder the result)
    val bad = df.withColumn("vd", col("v").cast("double"))
      .withColumn("ids", concat(lit("x"), col("id")))
    intercept[IllegalArgumentException](
      Stats.topKPerGroupBounded(bad, "grp", "id", "vd", k = 3))
    intercept[IllegalArgumentException](
      Stats.stratifiedSampleBounded(bad, "grp", "ids", n = 3))
  }

  test("both sampler forms exclude NULL ids identically") {
    val df = Seq((Some(1L), "a"), (Some(2L), "a"), (None, "a"), (Some(3L), "b"))
      .toDF("id", "grp")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("grp", "id", "sample_rank").as[(String, Long, Int)].collect().toSet
    val win = rows(Stats.stratifiedSample(df, "grp", "id", n = 10))
    assert(win == rows(Stats.stratifiedSampleBounded(df, "grp", "id", n = 10)))
    assert(win.map(_._2) == Set(1L, 2L, 3L), "NULL id must not be sampled or ranked")
  }

  test("zscorePerGroup: NULL values neither corrupt group stats nor clamp to 0") {
    // group g: [10, 20, null] — stats must come from the two non-null rows
    // (n=2, mean=15), and the null row's z must be NULL, not 0
    val df = Seq(("g", 1L, Some(10.0)), ("g", 2L, Some(20.0)), ("g", 3L, Option.empty[Double]))
      .toDF("grp", "id", "v")
    val out = Stats.zscorePerGroup(df, "grp", "id", "v")
      .select("id", "z").as[(Long, Option[Double])].collect().toMap
    assert(out(3L).isEmpty, "NULL value must yield NULL z")
    assert(out(1L).exists(z => math.abs(z + 1.0) < 1e-12), out.toString)
    assert(out(2L).exists(z => math.abs(z - 1.0) < 1e-12), out.toString)
  }

  test("zscorePerGroup: zero-mean unit-variance within group; degenerate group -> 0") {
    val df = Seq(
      ("g", 1L, 10.0), ("g", 2L, 20.0), ("g", 3L, 30.0),
      ("h", 4L, 5.0), ("h", 5L, 5.0)).toDF("grp", "id", "v")
    val out = Stats.zscorePerGroup(df, "grp", "id", "v")
      .as[(String, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(math.abs(out(2L)) < 1e-12)                 // mean of g
    assert(math.abs(out(1L) + out(3L)) < 1e-12)       // symmetric
    assert(math.abs(out(3L) - math.sqrt(1.5)) < 1e-9) // (30-20)/sqrt(200/3)
    assert(out(4L) == 0.0 && out(5L) == 0.0)          // zero variance
  }

}
