package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.TrackedCache.TrackedDataset

/** Deduplication operators for large-scale text corpora (north-star surface;
  * the reference's record-level hashing dependency `polars-hash`
  * (reference: projects/feray/pyproject.toml:26) covers only exact content
  * hashing — near-dup families below are the 100 TB training-data extensions).
  *
  * Design notes for scale:
  *  - Exact dedup is a single hash-shuffle on the content digest (never on the
  *    raw text — the shuffle key is 16 bytes, not kilobytes).
  *  - MinHash/LSH turns all-pairs O(n²) into `bands` keyed shuffles: only
  *    documents sharing a band bucket ever meet. Candidate verification is a
  *    join on (idL, idR), linear in candidate count.
  *  - SimHash banding is EXACT for a hamming radius: splitting the 60-bit
  *    fingerprint into maxHamming+1 bands guarantees (pigeonhole) that any
  *    pair within the radius collides on ≥1 band — no recall loss, same
  *    keyed-shuffle shape.
  *  - Every hash is engine-reproducible (md5-derived, no JVM-specific seeds)
  *    so results are testable against an independent SQL oracle.
  *  - CACHE LIFECYCLE: the multi-consumer operators (pair generation,
  *    incremental matching) persist internal frames (profiles, band rows,
  *    candidates) that outlive the returned DataFrame. One-shot callers are
  *    fine; long-lived sessions invoking them repeatedly should
  *    `spark.catalog.clearCache()` after materializing each result — the
  *    bench harness and the streaming ingest loops do exactly this.
  */
object Dedup {

  /** 2^31-1, Mersenne prime — universal-hash modulus kept below 2^31 so
    * `a*h+b` stays under 2^62 (no bigint overflow in either engine). */
  val P: Long = 2147483647L

  /** Deterministic universal-hash coefficients (LCG from a fixed seed, odd,
    * < P). Interpolated into both the Spark plan and the SQL oracle. */
  def hashCoeffs(numHashes: Int): Seq[(Long, Long)] = {
    var s = 42L
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L) & 0x7fffffffffffffffL; s % (P - 2) + 1 }
    Seq.fill(numHashes)((next() | 1L, next()))
  }

  /** Stable 60-bit non-negative hash of a string column: first 15 hex chars
    * of md5, as a long. Reproducible in any engine with md5 (the oracle uses
    * `conv(substring(md5(c),1,15),16,10)`); computed natively by the codegen
    * expression [[graft.expressions.Md5Hash60]] — digest bytes straight to
    * long, no hex-string round trip. */
  def md5Hash60(c: Column): Column =
    org.apache.spark.sql.GraftColumn.of(
      graft.expressions.Md5Hash60(org.apache.spark.sql.GraftColumn.expr(c)))

  /** Polynomial rolling-hash base (Rabin–Karp gram fingerprints) —
    * interpolated into the DuckDB oracles as a literal. */
  val B: Long = graft.expressions.PolyRollHash.B

  /** Per-token 60-bit md5 hashes mod P — one md5 per token, native codegen
    * ([[graft.expressions.TokenHashes]]). Front half of the rolling-gram
    * scheme; bind to a column once and feed [[polyRollHash]]. */
  def tokenHashes(toks: Column): Column =
    org.apache.spark.sql.GraftColumn.of(
      graft.expressions.TokenHashes(org.apache.spark.sql.GraftColumn.expr(toks)))

  /** The INDEPENDENT second per-token hash stream (md5 hex nibbles 17–31,
    * mod P) — pairs with [[tokenHashes]] in [[dualRollHash]]'s composite
    * fingerprint. */
  def tokenHashesTail(toks: Column): Column =
    org.apache.spark.sql.GraftColumn.of(
      graft.expressions.TokenHashes(org.apache.spark.sql.GraftColumn.expr(toks),
        tail = true))

  /** Composite ≈62-bit rolling gram fingerprint of every `span`-length
    * window: two independent polynomials (head/tail token-hash streams,
    * bases B/B2) packed as `h1·P + h2`
    * ([[graft.expressions.DualPolyRollHash]]). This is the MEMBERSHIP-grade
    * fingerprint — span dedup and decontamination compare it corpus-wide,
    * where a single 31-bit mod-P polynomial already collides at sf1 gram
    * counts. Feature-hashing users (bucket counts) keep [[polyRollHash]]. */
  def dualRollHash(toks: Column, span: Int): Column =
    org.apache.spark.sql.GraftColumn.of(
      graft.expressions.DualPolyRollHash(
        org.apache.spark.sql.GraftColumn.expr(tokenHashes(toks)),
        org.apache.spark.sql.GraftColumn.expr(tokenHashesTail(toks)), span))

  /** O(1)-per-window Rabin–Karp polynomial hashes of every `span`-length
    * window of a token-hash array, values mod `outMod`
    * ([[graft.expressions.PolyRollHash]]; shingle short-array edge rule). */
  def polyRollHash(tokenHashes: Column, span: Int, outMod: Long = P): Column =
    org.apache.spark.sql.GraftColumn.of(
      graft.expressions.PolyRollHash(
        org.apache.spark.sql.GraftColumn.expr(tokenHashes), span, outMod))

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingle STRINGS (no hashing — keep the lambda cheap; Spark
    * evaluates higher-order-function bodies interpreted, so crypto hashes
    * belong in a flat codegen'd projection AFTER the explode, not in here).
    * Shorter-than-n docs produce one shingle of the whole text
    * (concat_ws skips the null tail tokens). */
  def shingleStrings(text: Column, n: Int): Column =
    shingleStringsFromTokens(tokens(text), n)

  /** Shingles from an already-materialized token ARRAY COLUMN. Callers on a
    * hot path must bind the tokens to a column first: expression trees are
    * not common-subexpression-eliminated inside interpreted lambdas, so
    * shingling directly off `split(text)` re-splits the text once per
    * `get()` — O(n·shingles) splits per row. */
  def shingleStringsFromTokens(toks: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(lit(1), size(toks) - (n - 1))),
      i => concat_ws(" ", (0 until n).map(k => get(toks, i + (k - 1))): _*))

  /** Word n-gram shingle hashes, reduced mod P, de-duplicated (a set).
    * Column form (per-row, zero-shuffle) — use [[shingleProfiles]] for the
    * high-throughput exploded pipeline. */
  def shingleHashes(text: Column, n: Int): Column =
    array_distinct(transform(shingleStrings(text, n), s => pmod(md5Hash60(s), lit(P))))

  /** The high-throughput shingle pipeline: explode shingle strings, hash in
    * a flat codegen'd projection, then ONE groupBy(id) computing BOTH the
    * minhash signature (one `min` aggregate per hasher) and the distinct
    * shingle-hash set. One keyed shuffle total; md5 never runs interpreted. */
  def shingleProfiles(df: DataFrame, idCol: String, textCol: String, n: Int,
                      coeffs: Seq[(Long, Long)], keep: Seq[String] = Nil): DataFrame = {
    val exploded = df
      .select(col(idCol) +: keep.map(col) :+ tokens(col(textCol)).as("__toks"): _*)
      .select(col(idCol) +: keep.map(col) :+ explode(shingleStringsFromTokens(col("__toks"), n)).as("__s"): _*)
      .select(col(idCol) +: keep.map(col) :+ pmod(md5Hash60(col("__s")), lit(P)).as("__h"): _*)
    val sigMins = coeffs.zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("__h") + lit(b)) % lit(P)).as(s"__m$i")
    }
    // sets come out SORTED (sorted once per doc) so pair-wise verification
    // can use the native linear-merge intersect instead of per-pair hash sets
    val grouped = exploded.groupBy((col(idCol) +: keep.map(col)): _*)
      .agg(sort_array(collect_set(col("__h"))).as("__shingles"), sigMins: _*)
    if (coeffs.isEmpty) grouped
    else grouped.select(col(idCol) +: keep.map(col) :+ col("__shingles") :+
      array(coeffs.indices.map(i => col(s"__m$i")): _*).as("__sig"): _*)
  }

  /** MinHash signature: for each universal hash (a,b), min over the shingle
    * set of (a*h+b) mod P. One pass over the shingles per hasher, all
    * codegen'd builtins — no UDF. */
  def minhashSignature(shingles: Column, coeffs: Seq[(Long, Long)]): Column =
    array(coeffs.map { case (a, b) =>
      aggregate(shingles, lit(Long.MaxValue),
        (acc, h) => least(acc, (lit(a) * h + lit(b)) % lit(P)))
    }: _*)

  /** Explode a signature into (band_id, band_key) rows; band_key is the md5 of
    * the band's slice so the shuffle key is small and uniform. */
  def explodeBands(df: DataFrame, sigCol: String, bands: Int, rowsPerBand: Int,
                   bandIdCol: String = "band_id", bandKeyCol: String = "band_key"): DataFrame =
    df.select(col("*"), posexplode(transform(
      sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws(",", slice(col(sigCol), b * rowsPerBand + 1, lit(rowsPerBand)))))
    ).as(Seq(bandIdCol, bandKeyCol)))

  /** Exact Jaccard similarity of two shingle-hash sets. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val uni = size(array_union(a, b))
    when(uni === 0, lit(1.0)).otherwise(inter.cast("double") / uni.cast("double"))
  }

  /** Exact Jaccard over SORTED distinct arrays: native linear-merge intersect
    * (zero allocation per pair); |A∪B| = |A|+|B|−|A∩B|. */
  def jaccardSorted(a: Column, b: Column): Column = {
    val inter = org.apache.spark.sql.GraftColumn.of(
      graft.expressions.SortedIntersectCount(
        org.apache.spark.sql.GraftColumn.expr(a), org.apache.spark.sql.GraftColumn.expr(b)))
    val uni = size(a).cast("long") + size(b).cast("long") - inter
    when(uni === 0, lit(1.0)).otherwise(inter.cast("double") / uni.cast("double"))
  }

  /** Integer-robust PPJoin overlap bound: the smallest integer k admitted
    * by the VERIFY step's own double arithmetic (`k / sz >= t`), never the
    * raw `ceil(sz·t)` — whose double product can round up past an exact
    * integer boundary (e.g. t=0.07, sz=100: fl(100·0.07)=7.000…01 → ceil 8,
    * yet inter=7 verifies since fl(7/100) >= 0.07) and silently drop
    * exact-boundary pairs, contradicting "zero recall loss". One
    * conditional decrement restores the boundary (the product's FP error is
    * « 1 for any 32-bit set size); the second is belt-and-braces. Any
    * undershoot is recall-safe — a looser bound only admits more
    * candidates, and the exact verify decides. Floored at 1 (a qualifying
    * pair shares at least one element). */
  private[ops] def overlapBound(sz: Column, threshold: Double): Column = {
    val t = lit(threshold)
    val a0 = ceil(sz * t)
    val a1 = when((a0 - 1).cast("double") / sz.cast("double") >= t, a0 - 1).otherwise(a0)
    val a2 = when((a1 - 1).cast("double") / sz.cast("double") >= t, a1 - 1).otherwise(a1)
    greatest(a2, lit(1L))
  }

  /** LSH band planner (Leskovec/Rajaraman/Ullman, MMDS §3.4.3): choose
    * (bands, rowsPerBand) with bands·rows = numHashes whose candidate
    * S-curve p(s) = 1 − (1 − s^rows)^bands best matches a step at
    * `threshold` — minimizing ∫₀ᵗ p(s) ds + ∫ₜ¹ (1 − p(s)) ds (expected
    * false-positive candidate mass plus false-negative mass under a uniform
    * similarity prior). Exact-Jaccard verification downstream removes the
    * FPs but pays their join cost; FNs are unrecoverable — which is exactly
    * what the integral trades. More bands = permissive (low crossover),
    * more rows = strict; the default (12 hashes, 4 bands) has its crossover
    * (1/b)^(1/r) at 0.63, right for thresholds ≥ 0.5 but missing pairs at
    * 0.2–0.3 — this planner picks the divisor pair a caller's threshold
    * actually wants. */
  def planBands(threshold: Double, numHashes: Int): (Int, Int) = {
    require(threshold > 0 && threshold < 1,
      s"planBands threshold must be in (0,1), got $threshold")
    require(numHashes >= 2, s"planBands needs >= 2 hashes, got $numHashes")
    val divisorPairs = (1 to numHashes)
      .filter(numHashes % _ == 0).map(b => (b, numHashes / b))
    def err(b: Int, r: Int): Double = {
      val n = 1000
      (0 until n).map { i =>
        val s = (i + 0.5) / n
        val p = 1 - math.pow(1 - math.pow(s, r.toDouble), b.toDouble)
        if (s < threshold) p else 1 - p
      }.sum / n
    }
    divisorPairs.minBy { case (b, r) => err(b, r) }
  }

  /** MinHash-LSH near-duplicate pairs.
    *
    * Pipeline: shingle → minhash signature → band explode → self-join on
    * (band_id, band_key) with idL < idR → distinct candidates → exact-Jaccard
    * verify ≥ threshold. The self-join is the only shuffle that grows with
    * corpus size, and it is keyed on 16-byte band hashes. Size `bands` with
    * [[planBands]] when the threshold differs from the defaults' 0.63
    * crossover.
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          n: Int = 3, numHashes: Int = 12, bands: Int = 4,
                          threshold: Double = 0.5): DataFrame = {
    val sh = shingleProfiles(df, idCol, textCol, n, hashCoeffs(numHashes))
    minhashPairsFromProfile(sh, idCol, "__sig", "__shingles",
      numHashes, bands, threshold)
  }

  /** MinHash-LSH near-dup pairs from a PRECOMPUTED profile frame — the
    * fused-pass consumer: a pipeline runs [[graft.ops.TextOps.corpusProfile]]
    * ONCE over the raw corpus, then near-dup pairs, clustering, and
    * fingerprint consumers all reuse it without re-shingling 100 TB of text
    * (spec-asserted identical to the from-raw-text path). The profile needs
    * a minhash-signature array column (numHashes longs from [[hashCoeffs]])
    * and the sorted distinct shingle-hash set. */
  def minhashPairsFromProfile(profile: DataFrame, idCol: String,
                              sigCol: String, shinglesCol: String,
                              numHashes: Int, bands: Int,
                              threshold: Double): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    // both sides of the band self-join AND the verify joins read this frame:
    // cache it (small: id + signature + hash set) or Spark recomputes the
    // whole upstream profile pipeline once per reference
    val sh = profile.select(col(idCol), col(sigCol).as("__sig"),
        col(shinglesCol).as("__shingles"))
      .persistTracked()
    val banded = explodeBands(sh.select(col(idCol), col("__sig")), "__sig", bands, rowsPerBand)
      .select(col(idCol), col("band_id"), col("band_key"))
    val l = banded.select(col(idCol).as("id_l"), col("band_id"), col("band_key"))
    val r = banded.select(col(idCol).as("id_r"), col("band_id"), col("band_key"))
    val cand = l.join(r, Seq("band_id", "band_key")).where(col("id_l") < col("id_r"))
      .select("id_l", "id_r").distinct()
    val sets = sh.select(col(idCol), col("__shingles"))
    cand
      .join(sets.select(col(idCol).as("id_l"), col("__shingles").as("__sh_l")), Seq("id_l"))
      .join(sets.select(col(idCol).as("id_r"), col("__shingles").as("__sh_r")), Seq("id_r"))
      .select(col("id_l"), col("id_r"),
        jaccardSorted(col("__sh_l"), col("__sh_r")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** LSH band-calibration curve — the "measure, don't guess" discipline
    * ([[graft.ops.Similarity.ivfRecallCurve]]) for the near-dup family:
    * from ONE MinHash signature computation, measure for EVERY divisor
    * band count b of `numHashes` the fraction of TRUE near-dup pairs
    * (exact Jaccard ≥ `threshold` — the zero-recall-loss prefix-filtered
    * ground truth of [[ngramJaccardPairs]]) that the banded candidate
    * join at b bands would catch. A pair is caught iff some band of
    * numHashes/b consecutive signature rows agrees on both sides —
    * exactly [[minhashNearDupPairs]]'s candidate rule, so
    * n_caught(b) ≡ |minhashNearDupPairs(bands = b)| (spec-asserted), and
    * recall is monotone non-decreasing in b (smaller bands agree more
    * easily). Output: one row per divisor,
    * (bands, rows_per_band, n_caught, n_true, recall_micro) with
    * recall_micro = 10⁶·caught // true (exact integer).
    *
    * Scale shape: the truth pass is prefix-keyed (never all-pairs), the
    * signature pass is one keyed aggregation, the flag join carries
    * |truth| rows, and ALL divisor curves ride a single conditional
    * aggregation — but ground truth is inherently corpus-wide exact
    * Jaccard whose candidate density grows super-linearly (measured 50×
    * wall at 100× rows), so calibrate over a SAMPLED slice (the
    * recall-curve practice) and apply the chosen (bands, rows) at full
    * scale. That sampling discipline is an IN-OP CONTRACT, not a
    * convention: `maxTruthDocs` rides the truth pass as an in-plan
    * scalar guard (the `maxBroadcastAnchors` pattern — no extra
    * driver-side count job) and a calibration input above it fails by
    * NAME at the first truth-side scan, before any quadratic work —
    * not hours into an accidental corpus-wide exact dedup at 100 TB.
    * Pass a larger cap deliberately when the slice really is that big. */
  def lshBandCalibration(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 12, threshold: Double = 0.5,
      maxTruthDocs: Long = 100000L): DataFrame = {
    require(numHashes >= 1 && numHashes <= 64,
      s"numHashes must be in [1, 64], got $numHashes")
    require(maxTruthDocs >= 1,
      s"maxTruthDocs must be >= 1, got $maxTruthDocs — the exact-Jaccard " +
        "ground truth has no non-quadratic route; calibrate on a sample")
    val divisors = (1 to numHashes).filter(numHashes % _ == 0)
    // in-plan doc-count guard riding the TRUTH pass's text column: the
    // count agg is a column-pruned scan, the 1-row cross join broadcasts,
    // and the guard wraps the one column the shingle explode consumes —
    // Catalyst cannot prune it away, and it fires at the scan, before the
    // prefix join pays anything quadratic
    val nDocs = df.agg(count(lit(1)).as("__ncal"))
    val guarded = df.crossJoin(nDocs)
      .select(col(idCol),
        when(col("__ncal") > maxTruthDocs,
          raise_error(concat(
            lit("lshBandCalibration: calibration input has "), col("__ncal"),
            lit(s" docs > maxTruthDocs=$maxTruthDocs — the exact-Jaccard " +
              "ground truth is corpus-wide (candidate density grows " +
              "super-linearly); calibrate on a sampled slice and apply the " +
              "chosen (bands, rows_per_band) at full scale, or raise the " +
              "cap deliberately for a slice this size"))))
          .otherwise(col(textCol)).as(textCol),
        lit(0).as("__cal_blk"))
    val truth = ngramJaccardPairs(guarded, idCol, textCol, "__cal_blk", n, threshold)
      .select("id_l", "id_r")
    val sig = shingleProfiles(df, idCol, textCol, n, hashCoeffs(numHashes))
      .select(col(idCol), col("__sig"))
    def caught(b: Int): Column = {
      val r = numHashes / b
      (0 until b).map { j =>
        (0 until r).map(i =>
          col("__sig_l")(j * r + i) === col("__sig_r")(j * r + i)).reduce(_ && _)
      }.reduce(_ || _)
    }
    val flagged = truth
      .join(sig.select(col(idCol).as("id_l"), col("__sig").as("__sig_l")), Seq("id_l"))
      .join(sig.select(col(idCol).as("id_r"), col("__sig").as("__sig_r")), Seq("id_r"))
    val agg1 = flagged.agg(count(lit(1)).as("n_true"),
      divisors.map(b =>
        coalesce(sum(when(caught(b), 1L).otherwise(0L)), lit(0L)).as(s"__n_$b")): _*)
    val stackExpr = s"stack(${divisors.length}, " + divisors.map(b =>
      s"$b, ${numHashes / b}, __n_$b").mkString(", ") +
      ") AS (bands, rows_per_band, n_caught)"
    agg1.selectExpr(stackExpr, "n_true")
      .select(col("bands").cast("int").as("bands"),
        col("rows_per_band").cast("int").as("rows_per_band"),
        col("n_caught"), col("n_true"),
        when(col("n_true") === 0, lit(0L))
          .otherwise(expr("(1000000 * n_caught) div n_true")).as("recall_micro"))
  }

  /** INCREMENTAL MinHash-LSH: near-dup matches of a NEW document batch
    * against an ALREADY-PROFILED corpus — the streaming-ingest shape. A
    * 100 TB corpus is shingled once (its stored [[shingleProfiles]] /
    * [[graft.ops.TextOps.corpusProfile]] output is reused as-is); each
    * arriving batch shingles ONLY its own text, bands its signatures, and
    * joins its banded rows against the corpus's banded signatures. With
    * `broadcastNew` (the normal case: batch ≪ corpus) the candidate join is
    * map-side over the corpus — the corpus profile never shuffles, and
    * per-batch cost is O(batch + collisions), independent of corpus size.
    * Verification joins touch only colliding (new, corpus) pairs.
    *
    * Output: (new_id, corpus_id, jaccard ≥ threshold) — feed to
    * [[admitNonDup]] to keep only genuinely novel documents. */
  def minhashNewVsCorpus(newDocs: DataFrame, idCol: String, textCol: String,
                         corpusProfile: DataFrame, corpusIdCol: String,
                         sigCol: String, shinglesCol: String,
                         n: Int = 3, numHashes: Int = 12, bands: Int = 4,
                         threshold: Double = 0.5,
                         broadcastNew: Boolean = true): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val newProf = shingleProfiles(newDocs, idCol, textCol, n, hashCoeffs(numHashes))
      .persistTracked()
    val corpus = corpusProfile.select(col(corpusIdCol).as("corpus_id"),
      col(sigCol).as("__csig"), col(shinglesCol).as("__csh"))
    val bandedNew = explodeBands(newProf.select(col(idCol), col("__sig")),
        "__sig", bands, rowsPerBand)
      .select(col(idCol).as("new_id"), col("band_id"), col("band_key"))
    val bandedCorpus = explodeBands(corpus.select(col("corpus_id"), col("__csig").as("__sig")),
        "__sig", bands, rowsPerBand)
      .select(col("corpus_id"), col("band_id"), col("band_key"))
    val newSide = if (broadcastNew) broadcast(bandedNew) else bandedNew
    val cand = bandedCorpus.join(newSide, Seq("band_id", "band_key"))
      .select("new_id", "corpus_id").distinct()
    cand
      .join(newProf.select(col(idCol).as("new_id"), col("__shingles").as("__sh_n")), Seq("new_id"))
      .join(corpus.select(col("corpus_id"), col("__csh").as("__sh_c")), Seq("corpus_id"))
      .select(col("new_id"), col("corpus_id"),
        jaccardSorted(col("__sh_n"), col("__sh_c")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Build the PERSISTENT LSH index for [[matchIndexed]]: the corpus
    * profile's banded signatures land in a [[graft.core.BucketedStore]]
    * hash-bucketed BY BAND KEY, and the shingle sets in a sibling table
    * bucketed by document id. A batch then touches only the buckets its own
    * band keys hash into — per-batch IO is |touched buckets|/numBuckets of
    * the index, independent of corpus size for a fixed batch (where
    * [[minhashNewVsCorpus]] must still scan the whole profile every batch).
    * Grow the index with [[appendToIndex]] (O(batch) dir-appends; NEVER
    * `BucketedStore.merge`, which upserts by key — many documents share a
    * band key, so merging band rows would silently replace siblings), and
    * run `store.compactBuckets` on a cadence. */
  def indexCorpus(profile: DataFrame, idCol: String,
                  sigCol: String, shinglesCol: String,
                  store: graft.core.BucketedStore, feature: String,
                  numHashes: Int = 12, bands: Int = 4): Unit = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val banded = explodeBands(
        profile.select(col(idCol).as("corpus_id"), col(sigCol).as("__sig")),
        "__sig", bands, numHashes / bands)
      .select(col("corpus_id"), col("band_id"), col("band_key"))
    store.write(banded, s"${feature}_bands", Seq("band_key"))
    store.write(
      profile.select(col(idCol).as("corpus_id"), col(shinglesCol).as("__shingles")),
      s"${feature}_profile", Seq("corpus_id"))
  }

  /** Incrementally grow an LSH index built by [[indexCorpus]] with a batch
    * of newly admitted documents' profiles: their banded signatures and
    * shingle sets APPEND to the index tables (`appendBucketed` — O(batch)
    * new-dir adds, no existing index file read or rewritten). With this,
    * the full online loop is: [[matchIndexed]] the batch → admit novel docs
    * → appendToIndex their profiles — every step independent of corpus
    * size. Compact on a cadence via `store.compactBuckets`. */
  def appendToIndex(newProfile: DataFrame, idCol: String,
                    sigCol: String, shinglesCol: String,
                    store: graft.core.BucketedStore, feature: String,
                    numHashes: Int = 12, bands: Int = 4): Unit = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val banded = explodeBands(
        newProfile.select(col(idCol).as("corpus_id"), col(sigCol).as("__sig")),
        "__sig", bands, numHashes / bands)
      .select(col("corpus_id"), col("band_id"), col("band_key"))
    store.appendBucketed(s"${feature}_bands", banded, Seq("band_key"))
    store.appendBucketed(s"${feature}_profile",
      newProfile.select(col(idCol).as("corpus_id"), col(shinglesCol).as("__shingles")),
      Seq("corpus_id"))
  }

  /** Index-accelerated [[minhashNewVsCorpus]]: candidate generation reads
    * ONLY the index buckets the batch's band keys hash into
    * (`readTouched`), and shingle verification reads only the buckets of
    * the candidate corpus ids — two set-pruned scans instead of two full
    * ones. Output is identical to [[minhashNewVsCorpus]] over the same
    * profile (spec-asserted). */
  def matchIndexed(newDocs: DataFrame, idCol: String, textCol: String,
                   store: graft.core.BucketedStore, feature: String,
                   n: Int = 3, numHashes: Int = 12, bands: Int = 4,
                   threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val newProf = shingleProfiles(newDocs, idCol, textCol, n, hashCoeffs(numHashes))
      .persistTracked()
    val newBanded = explodeBands(newProf.select(col(idCol), col("__sig")),
        "__sig", bands, numHashes / bands)
      .select(col(idCol).as("new_id"), col("band_id"), col("band_key"))
      .persistTracked()
    val bandsSubset = store.readTouched(s"${feature}_bands", Seq("band_key"),
      newBanded.select("band_key"))
    // persisted: readTouched's bucket-id collect is an action and the verify
    // join reads cand again — without this the pruned index scan + candidate
    // join would execute twice per call
    val cand = bandsSubset.join(broadcast(newBanded), Seq("band_id", "band_key"))
      .select("new_id", "corpus_id").distinct()
      .persistTracked()
    val profSubset = store.readTouched(s"${feature}_profile", Seq("corpus_id"),
      cand.select("corpus_id"))
    cand
      .join(newProf.select(col(idCol).as("new_id"), col("__shingles").as("__sh_n")), Seq("new_id"))
      .join(profSubset.select(col("corpus_id"), col("__shingles").as("__sh_c")), Seq("corpus_id"))
      .select(col("new_id"), col("corpus_id"),
        jaccardSorted(col("__sh_n"), col("__sh_c")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Ingest filter over [[minhashNewVsCorpus]]: the new-batch rows with NO
    * near-dup in the profiled corpus (anti-join on the match list). */
  def admitNonDup(newDocs: DataFrame, idCol: String, matches: DataFrame): DataFrame =
    newDocs.join(matches.select(col("new_id").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** 60-bit SimHash of the token multiset: bit j is set iff the weighted sum
    * of token-hash bits j is positive. Column form (per-row, zero-shuffle;
    * interpreted HOF body — fine for small frames, tests, and the oracle). */
  def simhash60(text: Column): Column = {
    val hs = transform(tokens(coalesce(text, lit(""))), t => md5Hash60(t))
    aggregate(
      sequence(lit(0), lit(59)), lit(0L),
      (acc, j) => acc + when(
        aggregate(hs, lit(0L), (a, h) => a + (call_function("shiftright", h, j).bitwiseAND(lit(1L)) * 2 - 1)) > 0,
        call_function("shiftleft", lit(1L), j)).otherwise(lit(0L)))
  }

  /** High-throughput SimHash pipeline: explode tokens, hash in a codegen'd
    * projection, ONE groupBy(id) running the one-pass custom aggregate
    * [[graft.expressions.SimhashAgg]] (all 60 bit counters in a single
    * primitive buffer — vs 60 separate sum aggregates).
    * Identical output to [[simhash60]] (integer sums are order-insensitive). */
  def simhashes(df: DataFrame, idCol: String, textCol: String,
                outCol: String = "__simhash"): DataFrame = {
    val exploded = df
      // NULL text coalesces to "" (one empty token) so the doc keeps a
      // simhash instead of vanishing through explode(NULL) — matching the
      // minhash family, which shingles NULL-as-empty and retains the doc
      .select(col(idCol), explode(tokens(coalesce(col(textCol), lit("")))).as("__t"))
      .select(col(idCol), md5Hash60(col("__t")).as("__h"))
    val agg = org.apache.spark.sql.GraftColumn.of(
      graft.expressions.SimhashAgg(org.apache.spark.sql.GraftColumn.expr(col("__h")))
        .toAggregateExpression())
    exploded.groupBy(col(idCol)).agg(agg.as(outCol))
  }

  /** SimHash near-dup pairs within `maxHamming`, using EXACT pigeonhole
    * banding: the 60-bit fingerprint is split into maxHamming+1 bands; any
    * pair with hamming ≤ maxHamming must agree on at least one band, so
    * banding loses nothing while keeping the join keyed (no all-pairs). */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 3): DataFrame = {
    val nBands = maxHamming + 1
    val bitsPer = 60 / nBands
    val withSim = simhashes(df, idCol, textCol)
      .persistTracked()
    val banded = withSim.select(col(idCol), col("__simhash"),
      posexplode(transform(sequence(lit(0), lit(nBands - 1)),
        b => call_function("shiftright", col("__simhash"), b * lit(bitsPer))
          .bitwiseAND(lit((1L << bitsPer) - 1)))).as(Seq("band_id", "band_key")))
    val l = banded.select(col(idCol).as("id_l"), col("__simhash").as("__sim_l"), col("band_id"), col("band_key"))
    val r = banded.select(col(idCol).as("id_r"), col("__simhash").as("__sim_r"), col("band_id"), col("band_key"))
    l.join(r, Seq("band_id", "band_key")).where(col("id_l") < col("id_r"))
      .select(col("id_l"), col("id_r"),
        bit_count(col("__sim_l").bitwiseXOR(col("__sim_r"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Near-dup pairs over ANY precomputed 64-bit fingerprint column within
    * `maxHamming`, by EXACT pigeonhole banding — the [[simhashNearDupPairs]]
    * machinery generalized to an externally-supplied hash (an image dHash
    * from [[graft.ops.Multimodal.imageDhash]], a rolling doc fingerprint…):
    * the 64 bits split into maxHamming+1 bands, any pair within the radius
    * must agree on at least one whole band, so candidates are a
    * band-keyed equi-join — never all pairs — and every candidate verifies
    * with the exact popcount. Zero recall loss. Output: (id_l, id_r,
    * hamming ≤ maxHamming), id_l < id_r. NULL hashes are excluded.
    *
    * Scale shape: one projection pass emits maxHamming+1 rows per input
    * row; the join is keyed on (band_id, band_key) — a band shared by k
    * rows costs k² candidate pairs, the LSH-family cost profile (dense
    * clusters surface, unrelated rows never meet). */
  def hammingNearDupPairs(df: DataFrame, idCol: String, hashCol: String,
                          maxHamming: Int = 3): DataFrame = {
    val nBands = maxHamming + 1
    require(nBands >= 1 && 64 % nBands == 0,
      s"maxHamming+1 must divide 64 (1, 3, 7, 15, 31, 63), got $maxHamming")
    val bitsPer = 64 / nBands
    val mask = if (bitsPer == 64) -1L else (1L << bitsPer) - 1
    val h = df.where(col(hashCol).isNotNull)
      .select(col(idCol), col(hashCol).cast("long").as("__h"))
    val banded = h.select(col(idCol), col("__h"),
      posexplode(transform(sequence(lit(0), lit(nBands - 1)),
        b => call_function("shiftright", col("__h"), b * lit(bitsPer))
          .bitwiseAND(lit(mask)))).as(Seq("band_id", "band_key")))
    val l = banded.select(col(idCol).as("id_l"), col("__h").as("__h_l"),
      col("band_id"), col("band_key"))
    val r = banded.select(col(idCol).as("id_r"), col("__h").as("__h_r"),
      col("band_id"), col("band_key"))
    l.join(r, Seq("band_id", "band_key")).where(col("id_l") < col("id_r"))
      .select(col("id_l"), col("id_r"),
        bit_count(col("__h_l").bitwiseXOR(col("__h_r"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard pairs within a blocking column (e.g. same
    * `source`), candidates generated by EXACT prefix filtering (the PPJoin
    * bound): under any global total order of the shingle universe — here the
    * sets' own ascending hash order — J(A,B) >= t implies A and B share an
    * element within the first |A| - ceil(t*|A|) + 1 (resp. |B|...) elements
    * of each sorted set. Candidates are therefore a join keyed on
    * (block, prefix-shingle-hash), NEVER all pairs per block: block sizes
    * grow linearly with the corpus, so the r6 block-cross-join was quadratic
    * at scale (95x runtime at 10x data in the ScaleRehearsal; this shape
    * re-measured ~linear). Zero recall loss — the bound is exact, and every
    * candidate is verified with the true Jaccard; the size-ratio prefilter
    * prunes before any per-pair intersection runs. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCol: String, n: Int = 3, threshold: Double = 0.3): DataFrame = {
    require(threshold > 0, "prefix filtering needs threshold > 0 (J >= 0 is all pairs)")
    val sh = shingleProfiles(df, idCol, textCol, n, coeffs = Nil, keep = Seq(blockCol))
      .select(col(idCol), col(blockCol), col("__shingles").as("__sh"),
        size(col("__shingles")).as("__sz"))
      .persistTracked()
    val prefixLen = (col("__sz") - overlapBound(col("__sz"), threshold) + 1).cast("int")
    val pre = sh.select(col(idCol), col(blockCol), col("__sz"),
      explode(slice(col("__sh"), lit(1), prefixLen)).as("__p"))
    val l = pre.select(col(idCol).as("id_l"), col(blockCol).as("__blk_l"), col("__sz").as("__sz_l"), col("__p"))
    val r = pre.select(col(idCol).as("id_r"), col(blockCol).as("__blk_r"), col("__sz").as("__sz_r"), col("__p"))
    // null-safe block equality: rows with a NULL block form their own block
    // (a plain equi-join's NULL != NULL would silently never compare them —
    // two identical NULL-block docs would both survive dedup)
    val cand = l.join(r,
        col("__blk_l") <=> col("__blk_r") && l("__p") === r("__p"))
      .where(col("id_l") < col("id_r"))
      // exact size bound: J(A,B) <= min(|A|,|B|)/max(|A|,|B|) — prunes most
      // candidates before the distinct and the per-pair set intersection
      .where(least(col("__sz_l"), col("__sz_r")).cast("double") /
        greatest(col("__sz_l"), col("__sz_r")).cast("double") >= threshold)
      .select("id_l", "id_r").distinct()
    val sets = sh.select(col(idCol), col("__sh"))
    cand
      .join(sets.select(col(idCol).as("id_l"), col("__sh").as("__sh_l")), Seq("id_l"))
      .join(sets.select(col(idCol).as("id_r"), col("__sh").as("__sh_r")), Seq("id_r"))
      .select(col("id_l"), col("id_r"), jaccardSorted(col("__sh_l"), col("__sh_r")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Exact n-gram CONTAINMENT pairs within a blocking column — the
    * asymmetric cousin of [[ngramJaccardPairs]]: emit (id_a, id_b,
    * containment) for every ordered pair with
    * `|Sa ∩ Sb| / |Sa| >= threshold` — "document a's n-grams are mostly
    * inside b" (quote inclusion, boilerplate supersets, partial scrapes —
    * the near-dup families MISS these: a short doc fully quoted inside a
    * long one has low Jaccard but containment 1.0).
    *
    * Candidate generation is the exact PPJoin-style prefix bound adapted to
    * containment: |Sa ∩ Sb| >= α(|Sa|) (the integer-robust
    * [[overlapBound]], matching the verify arithmetic at exact boundaries)
    * forces a shared element within the first |Sa| − α + 1 elements of
    * SORTED Sa — but only
    * the CONTAINED side can prefix-truncate (the container must offer its
    * whole set), so the join is a-prefix × b-full keyed on
    * (block, shingle-hash). The size bound |Sb| >= ceil(t·|Sa|) prunes
    * before the distinct; every candidate verifies with the exact
    * linear-merge intersect. Zero recall loss within a block.
    *
    * Scale shape: the profile pass is ONE keyed exchange
    * ([[shingleProfiles]]); candidates are keyed joins (never all pairs
    * per block); verification is linear in candidates. */
  def ngramContainmentPairs(df: DataFrame, idCol: String, textCol: String,
                            blockCol: String, n: Int = 3,
                            threshold: Double = 0.8): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"containment threshold must be in (0,1], got $threshold")
    val sh = shingleProfiles(df, idCol, textCol, n, coeffs = Nil, keep = Seq(blockCol))
      .select(col(idCol), col(blockCol), col("__shingles").as("__sh"),
        size(col("__shingles")).as("__sz"))
      .persistTracked()
    val prefixLen = (col("__sz") - overlapBound(col("__sz"), threshold) + 1).cast("int")
    val a = sh.select(col(idCol).as("id_a"), col(blockCol).as("__blk_a"),
      col("__sz").as("__sz_a"), explode(slice(col("__sh"), lit(1), prefixLen)).as("__p"))
    val b = sh.select(col(idCol).as("id_b"), col(blockCol).as("__blk_b"),
      col("__sz").as("__sz_b"), explode(col("__sh")).as("__p"))
    val cand = a.join(b,
        col("__blk_a") <=> col("__blk_b") && a("__p") === b("__p"))
      .where(col("id_a") =!= col("id_b"))
      .where(col("__sz_b") >= overlapBound(col("__sz_a"), threshold))
      .select("id_a", "id_b").distinct()
    val sets = sh.select(col(idCol), col("__sh"), col("__sz"))
    val inter = org.apache.spark.sql.GraftColumn.of(
      graft.expressions.SortedIntersectCount(
        org.apache.spark.sql.GraftColumn.expr(col("__sh_a")),
        org.apache.spark.sql.GraftColumn.expr(col("__sh_b"))))
    cand
      .join(sets.select(col(idCol).as("id_a"), col("__sh").as("__sh_a"),
        col("__sz").as("__sz_a")), Seq("id_a"))
      .join(sets.select(col(idCol).as("id_b"), col("__sh").as("__sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (inter.cast("double") / col("__sz_a").cast("double")).as("containment"))
      .where(col("containment") >= threshold)
  }

  /** Connected components over near-dup pairs: every document gets the
    * MINIMUM id reachable through the pair graph as its cluster
    * representative. Iterative min-label propagation — each round is one
    * keyed aggregation (the standard Spark shape; large-star/small-star
    * would halve rounds at extreme diameters but near-dup clusters are
    * shallow). Converges in O(component diameter) rounds; `maxIter` bounds
    * the loop, and convergence is checked with a cheap count, not collect. */
  def nearDupClusters(pairs: DataFrame, idLCol: String = "id_l", idRCol: String = "id_r",
                      maxIter: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    // undirected edges, both directions + self-loops over the node set.
    // localCheckpoint (not persist): truncates the logical plan to the
    // materialized RDD, so the pair-generation lineage (the whole LSH
    // pipeline) is analyzed/optimized ONCE here instead of on every round's
    // action — without it each iteration re-plans the full upstream tree
    // (twice, via the union branches) and driver planning dominates the loop.
    // Checkpoint the DIRECTED pairs, not the union: a checkpointed union
    // materializes the pair pipeline once per branch (both union legs run
    // the upstream map stages — measured as two equal back-to-back jobs in
    // q292's schedule), while the flip into the second direction is a
    // narrow projection over the already-materialized partitions.
    val p = pairs.select(col(idLCol).as("src"), col(idRCol).as("dst"))
      .localCheckpoint()
    val edges = p.union(p.select(col("dst").as("src"), col("src").as("dst")))
    // round 0 folded into initialization: label = min(self, direct neighbors)
    var labels = edges.select(col("src").as("id"), col("dst").as("rep"))
      .union(edges.select(col("src").as("id"), col("src").as("rep")))
      .groupBy("id").agg(min("rep").as("rep"))
      .persistTracked()
    var iter = 0
    var converged = false
    // labels only ever DECREASE, so an unchanged label sum ⇔ fixpoint — the
    // convergence check rides the same single action that materializes the
    // round (no extra join+count job per iteration)
    var prevSum: Option[java.math.BigDecimal] = None
    while (iter < maxIter && !converged) {
      // candidate label per node: min over (own label, neighbors' labels)
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "src").withColumnRenamed("rep", "nrep"), Seq("src"))
        .select(col("dst").as("id"), col("nrep").as("rep"))
      val grown = labels.select(col("id"), col("rep"))
        .union(viaNeighbors)
        .groupBy("id").agg(min("rep").as("rep"))
      // every 3rd round, TRUNCATE the lineage: the logical plan otherwise
      // chains through all prior rounds, so at 100 TB one evicted cached
      // partition cascades recompute to round 0 and the driver holds an
      // ever-deeper plan. localCheckpoint is eager and persists the result,
      // so it doubles as this round's materializing action.
      val checkpointRound = iter % 3 == 2
      val next =
        if (checkpointRound) grown.localCheckpoint()
        else grown.persistTracked()
      val s = next.agg(sum(col("rep").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .collect()(0).getDecimal(0)
      labels.unpersist()
      labels = next
      // s is null iff the label set is empty (no pairs at all) — trivially
      // a fixpoint, and compareTo(null) would throw
      converged = s == null || prevSum.exists(_.compareTo(s) == 0)
      prevSum = Option(s)
      iter += 1
    }
    // edges/labels checkpoint blocks are reclaimed by the ContextCleaner once
    // the frames go out of scope; nothing data-sized is pinned past the loop
    labels.select(col("id"), col("rep").as("cluster_rep"))
  }

  /** Per-cluster CANONICAL selection — the quality-aware keep policy on top
    * of [[nearDupClusters]]: within each near-dup cluster keep the member
    * with the HIGHEST score (ties → smallest id), instead of the blind
    * min-id rule. This is the standard "keep the best copy" refinement
    * (e.g. longest/highest-quality variant of a scraped page); documents
    * absent from the pair graph are their own singleton cluster and
    * survive as their own canonical.
    *
    * Output: one row per cluster —
    * `(cluster_rep, keep_id, best_score, n_members)`.
    *
    * Scale shape: one cluster-keyed exchange; the rank window and the
    * member count share its partitioning (no further exchange), and window
    * partitions are near-dup clusters — small by construction. */
  def canonicalPerCluster(df: DataFrame, idCol: String, scoreCol: String,
                          clusters: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spine = df.select(col(idCol).as("id"), col(scoreCol).as("__score"))
    val withRep = spine
      .join(clusters.select(col("id"), col("cluster_rep")), Seq("id"), "left")
      .withColumn("cluster_rep", coalesce(col("cluster_rep"), col("id")))
    val w = Window.partitionBy("cluster_rep")
      .orderBy(col("__score").desc_nulls_last, col("id").asc)
    val cw = Window.partitionBy("cluster_rep")
    withRep
      .withColumn("__rk", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(cw))
      .where(col("__rk") === 1)
      .select(col("cluster_rep"), col("id").as("keep_id"),
        col("__score").as("best_score"), col("n_members"))
  }

  /** End-to-end near-dup corpus dedup: MinHash-LSH pairs → connected
    * components → keep the cluster representative (min id); documents with
    * no near-dup survive untouched (they never enter the pair graph). */
  def dedupCorpusNear(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, numHashes: Int = 12, bands: Int = 4,
                      threshold: Double = 0.5): DataFrame = {
    val pairs = minhashNearDupPairs(df, idCol, textCol, n, numHashes, bands, threshold)
    val clusters = nearDupClusters(pairs)
    df.join(clusters.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .where(col("cluster_rep").isNull || col("cluster_rep") === col(idCol))
      .drop("cluster_rep")
  }

  /** Exact corpus dedup: drop all but the smallest-id row per content
    * digest (the table-in, table-out form of [[exactByContent]]). */
  def dedupCorpusExact(df: DataFrame, idCol: String, contentCols: Seq[String]): DataFrame =
    df.join(exactByContent(df, idCol, contentCols)
        .select(col("keep_id").as(idCol)), Seq(idCol), "left_semi")

  /** Passage-level exact dedup (the MassiveText/Gopher recipe: duplicated
    * paragraphs are removed corpus-wide, not whole documents): split each
    * document into fixed `tokensPerPassage`-token non-overlapping windows
    * (a deterministic stand-in for paragraph boundaries — the fixture
    * corpus has no newlines), keep the FIRST occurrence of every distinct
    * passage by `(id, passage_idx)` order, and reconstruct the surviving
    * text per document. Intra-document repeats collapse too.
    *
    * Output: one row per input document —
    * `(id, clean_text, n_kept, n_total)`; a document whose every passage
    * was seen earlier survives with `clean_text = ""` / `n_kept = 0`, so
    * callers decide the drop policy.
    *
    * Scale shape: two keyed exchanges, both linear, and NO join. The
    * winner-per-passage window partitions on the passage's 16-byte digest
    * (each passage's text rides the shuffle exactly once — same key
    * discipline as [[exactByContent]]; WindowGroupLimit prunes losers
    * before the exchange too), then ALL passages regroup onto id with the
    * keep decision as a flag — so a fully-duplicated document still emits
    * its empty row without a corpus-sized outer join back to the doc
    * list. No driver materialization, no all-pairs anywhere. */
  def paragraphDedup(df: DataFrame, idCol: String, textCol: String,
                     tokensPerPassage: Int = 20): DataFrame = {
    val passages = passageExplode(df, idCol, textCol, tokensPerPassage)
    // first (id, passage_idx) wins per distinct passage, keyed on the digest
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(md5(col("passage")))
      .orderBy(col("id"), col("passage_idx"))
    passageReassemble(
      passages.withColumn("__keep", row_number().over(win) === 1))
  }

  /** Corpus-frequency line filtering — the RefinedWeb/CCNet boilerplate
    * strip (RefinedWeb arXiv:2306.01116 line-wise corrections; CCNet
    * arXiv:1911.00359 drops lines duplicated across shards): any LINE
    * (author-delimited by `sep`, trim-normalized for counting) occurring at
    * least `minCount` times corpus-wide is boilerplate (nav menus, cookie
    * banners, legal footers) and EVERY occurrence is removed. Contrast
    * [[paragraphDedup]] (fixed token windows, first occurrence SURVIVES):
    * boilerplate policy wants the banner gone from every page, not kept
    * once.
    *
    * Output: one row per input document `(id, clean_text, n_kept,
    * n_total)`; a fully-boilerplate document survives with empty text, so
    * callers decide the drop policy.
    *
    * Scale shape: the exploded frame carries (id, idx, line) once
    * (persisted — both the count pass and the flag probe scan it); the
    * corpus-wide frequency is `groupBy(hash)+count` — partial aggregation
    * collapses a 10⁸-occurrence banner to one row per map task, no hot
    * window partition — and the (usually tiny) hot set is measured and
    * EXPLICITLY broadcast under a `maxBroadcastHotLines` contract guard
    * (the [[graft.ops.TextOps.bigramLmScore]] transition-table pattern), so
    * the corpus never shuffles for the verdict — relying on AQE's estimate
    * here left an unhinted shuffle join whose build side is one skewed
    * banner key at scale.
    *
    * FAILURE SEMANTICS (changed in r13 — callers migrating from earlier
    * rounds take note): a hot set beyond the cap RAISES mid-query with a
    * loud in-plan error naming the cap, instead of the old silent count-
    * then-fall-back-to-the-keyed-join behavior. The old fallback cost a
    * driver-side count action on every call (including SQL-TVF analysis)
    * and hid the moment a corpus outgrew its broadcast budget; callers who
    * WANT the keyed join (corpora with huge hot sets — AQE skew-split
    * applies there) opt in explicitly with `maxBroadcastHotLines = 0`.
    * The flagged lines then regroup join-free onto the doc id with the
    * keep flag ([[paragraphDedup]]'s reassembly discipline). Linear,
    * skew-proof, no all-pairs. */
  def stripFrequentLines(df: DataFrame, idCol: String, textCol: String,
      minCount: Long, sep: String = "\n",
      maxBroadcastHotLines: Long = 1L << 22): DataFrame = {
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    // 0 = opt out of the broadcast into the keyed join
    val lines = df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("line_idx", "line")))
      .withColumn("__k", md5Hash60(trim(col("line"))))
      .persistTracked()
    val hot = lines.groupBy("__k").agg(count(lit(1)).as("__c"))
      .where(col("__c") >= minCount)
      .select(col("__k"), lit(true).as("__hot"))
    // broadcast with an IN-PLAN scalar-count guard (the bigramLmScore
    // transition-table pattern) — no driver-side count job at frame-
    // CONSTRUCTION time (the r13 first cut ran one, which also executed at
    // SQL-TVF analysis time). maxBroadcastHotLines = 0 opts out into the
    // keyed join for corpora whose hot set is known to be huge.
    val hotSide =
      if (maxBroadcastHotLines <= 0) hot
      else {
        val nHot = hot.agg(count(lit(1)).as("__nhot"))
        broadcast(hot.crossJoin(nHot)
          .select(col("__k"),
            (col("__hot") && when(col("__nhot") > maxBroadcastHotLines,
              raise_error(concat(lit("stripFrequentLines: hot-line set has "),
                col("__nhot"),
                lit(s" keys > maxBroadcastHotLines=$maxBroadcastHotLines — " +
                  "raise the cap (bigger broadcast) or pass 0 to opt out " +
                  "into the keyed join")))).otherwise(lit(true))).as("__hot")))
      }
    lines.join(hotSide, Seq("__k"), "left")
      .withColumn("__keep", col("__hot").isNull)
      .groupBy("id").agg(
        concat_ws(sep, transform(
          array_sort(collect_list(
            when(col("__keep"), struct(col("line_idx"), col("line"))))),
          p => p.getField("line"))).as("clean_text"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        count(lit(1)).as("n_total"))
  }

  /** Map-side passage explode shared by [[paragraphDedup]] and the
    * streaming gate [[graft.streaming.Fastlane.ingestPassageDeduped]]:
    * one row per fixed-width token window —
    * `(id, __n_total, passage_idx, passage)` — no exchange. */
  private[graft] def passageExplode(df: DataFrame, idCol: String,
      textCol: String, tokensPerPassage: Int): DataFrame = {
    require(tokensPerPassage > 0, s"tokensPerPassage must be positive, got $tokensPerPassage")
    val w = tokensPerPassage
    df.select(col(idCol).as("id"), split(col(textCol), " ").as("__toks"))
      .withColumn("__n_total",
        ceil(size(col("__toks")).cast("double") / lit(w.toDouble)).cast("long"))
      .select(col("id"), col("__n_total"),
        posexplode(transform(
          sequence(lit(0L), col("__n_total") - 1),
          i => concat_ws(" ", slice(col("__toks"), (i * w + 1).cast("int"), lit(w)))
        )).as(Seq("passage_idx", "passage")))
  }

  /** Reassemble [[passageExplode]] rows carrying a boolean `__keep` flag
    * into one row per document `(id, clean_text, n_kept, n_total)`: every
    * passage flows to its document with the flag (collect_list SKIPS the
    * nulls of dropped passages), so each document reappears — empty when
    * everything was a duplicate — without a corpus-sized outer join back
    * to the doc list. */
  private[graft] def passageReassemble(flagged: DataFrame): DataFrame =
    flagged
      .groupBy("id").agg(
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(col("__keep"), struct(col("passage_idx"), col("passage"))))),
          p => p.getField("passage"))).as("clean_text"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        first(col("__n_total")).as("n_total"))
      .select(col("id"), col("clean_text"), col("n_kept"), col("n_total"))

  /** Merged maximal duplicated spans per document — the shared core of
    * [[duplicateSpanStats]] and [[stripDuplicateSpans]]. A token position is
    * duplicated when the `spanTokens`-token gram starting there occurs ≥ 2
    * times corpus-wide (any document, including the same one); overlapping
    * duplicated grams coalesce into maximal `[span_start, span_end]` token
    * intervals (classic gaps-and-islands over the position stream).
    *
    * Returns `(id, span_start, span_end)` — documents with no duplicated
    * span emit nothing; callers re-join onto their own doc spine.
    *
    * Scale shape: the exploded frame is `(id, pos, h)` — 20 bytes per token
    * position, never the text. The corpus-wide occurrence count (the
    * distributed stand-in for the suffix-array scan) is a
    * `groupBy(__h).count` + LEFT SEMI join — NOT a window over `__h`: a
    * boilerplate gram repeated 10⁸× partial-aggregates to one row per map
    * task instead of buffering every position in a single hot window
    * partition, and both the count and the join consume the SAME shuffle of
    * the position frame on `__h` (ReuseExchange), so the skew-proof shape
    * costs no extra exchange. One more keyed exchange on the doc id merges
    * islands; the island groupBy reuses the doc partitioning (subset
    * clustering). Linear in total token count, no all-pairs. */
  private def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
                             spanTokens: Int): DataFrame = {
    require(spanTokens > 1, s"spanTokens must be > 1, got $spanTokens")
    val L = spanTokens
    import org.apache.spark.sql.expressions.Window
    // Rabin–Karp rolling gram fingerprints (the Lee et al. construction):
    // ONE md5 per token, then every L-token window hash is an O(1) integer
    // rolling update — the r10 path md5-hashed the concatenated L-token
    // string at every position (O(L) hash work per position, the dominant
    // cost of the whole operator). The fingerprint is the DUAL-polynomial
    // ≈62-bit composite ([[dualRollHash]]): corpus-wide membership in a
    // single 31-bit mod-P space was already expected to collide at sf1
    // gram counts (birthday ~2^15.5) — a silent false-duplicate source the
    // oracle could never catch because it replays the identical hash. Both
    // halves run native inside whole-stage codegen; the oracle recomputes
    // both polynomials per position in plain integer SQL and packs them
    // with the same h1·P + h2 rule.
    val pos = df
      .select(col(idCol).as("id"), split(col(textCol), " ").as("__toks"))
      .where(size(col("__toks")) >= L)
      .select(col("id"),
        posexplode(dualRollHash(col("__toks"), L))
          .as(Seq("pos", "__h")))
    val dupHashes = pos.groupBy(col("__h")).agg(count(lit(1)).as("__cnt"))
      .where(col("__cnt") >= 2)
      .select(col("__h"))
    val dup = pos.join(dupHashes, Seq("__h"), "left_semi")
      .select(col("id"), col("pos"))
    val wDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    dup
      .withColumn("__prev_end",
        max(col("pos") + lit(L - 1)).over(wDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__brk",
        when(col("__prev_end").isNull || col("pos") > col("__prev_end"), 1L).otherwise(0L))
      .withColumn("__island", sum(col("__brk")).over(wDoc))
      .groupBy(col("id"), col("__island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(L - 1)).as("span_end"))
      .select(col("id"), col("span_start"), col("span_end"))
  }

  /** Cross-corpus duplicated-span statistics — the exact-substring dedup
    * signal of Lee et al., "Deduplicating Training Data Makes Language
    * Models Better" (2022), with the suffix array approximated at token-gram
    * granularity: a position is duplicated iff its `spanTokens`-token gram
    * repeats anywhere in the corpus, and overlapping duplicated grams merge
    * into maximal spans (exactly the paper's ≥-L-token repeated substrings,
    * at token rather than byte resolution).
    *
    * Output: one row per input document —
    * `(id, n_tokens, dup_spans, dup_tokens, dup_frac)`; documents shorter
    * than `spanTokens` or with no repeated gram report zeros.
    *
    * Scale shape: [[duplicateSpans]]' two linear keyed exchanges, then the
    * narrow per-doc span aggregate joins back to an `(id, n_tokens)` spine —
    * the doc text itself never shuffles anywhere. */
  def duplicateSpanStats(df: DataFrame, idCol: String, textCol: String,
                         spanTokens: Int = 8): DataFrame = {
    val spine = df.select(col(idCol).as("id"),
      size(split(col(textCol), " ")).cast("long").as("n_tokens"))
    val perDoc = duplicateSpans(df, idCol, textCol, spanTokens)
      .groupBy("id").agg(
        count(lit(1)).as("dup_spans"),
        sum(col("span_end") - col("span_start") + 1).cast("long").as("dup_tokens"))
    spine.join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_tokens"),
        coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
      .withColumn("dup_frac", col("dup_tokens").cast("double") / col("n_tokens"))
  }

  /** Remove every duplicated span found by [[duplicateSpanStats]] from the
    * text (the destructive half of the Lee et al. recipe): tokens covered by
    * any merged duplicated span are dropped, survivors re-join in order.
    *
    * Output: one row per input document — `(id, clean_text, n_removed)`;
    * a document that is one big duplicated span survives with
    * `clean_text = ""` so callers decide the drop policy (same contract as
    * [[paragraphDedup]]).
    *
    * Scale shape: spans collect into one small per-doc array (bounded by
    * n_tokens / spanTokens entries) under the island partitioning, then join
    * doc-keyed back to the input; token filtering is a map-side
    * higher-order-function pass — the text crosses the join exchange once
    * and nothing quadratic appears. */
  def stripDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
                          spanTokens: Int = 8): DataFrame = {
    val spans = duplicateSpans(df, idCol, textCol, spanTokens)
      .groupBy("id").agg(collect_list(
        struct(col("span_start").as("s"), col("span_end").as("e"))).as("__spans"))
    val emptySpans = array().cast("array<struct<s:int,e:int>>")
    df.select(col(idCol).as("id"), split(col(textCol), " ").as("__toks"))
      .join(spans, Seq("id"), "left")
      .withColumn("__spans", coalesce(col("__spans"), emptySpans))
      .withColumn("__kept", filter(
        transform(col("__toks"), (t, i) => struct(t.as("t"), i.as("i"))),
        x => !exists(col("__spans"),
          sp => x.getField("i") >= sp.getField("s") && x.getField("i") <= sp.getField("e"))))
      .select(col("id").as(idCol),
        concat_ws(" ", transform(col("__kept"), x => x.getField("t"))).as("clean_text"),
        (size(col("__toks")) - size(col("__kept"))).cast("long").as("n_removed"))
  }

  /** Exact dedup: keep the smallest id per content digest. One shuffle keyed
    * on the 16-byte digest; the raw payload never shuffles.
    *
    * Multi-column content digests a JSON rendering of the column struct, NOT
    * a separator-joined concat: field boundaries always survive (a value
    * containing the separator byte can't shift them — ("ab","c") ≠ ("a","bc")
    * for every input), and NULL stays distinct from "" because concat_ws
    * SKIPS nulls while JSON renders them. Single-column keeps the direct md5
    * (same digest any engine computes from the raw value). */
  def exactByContent(df: DataFrame, idCol: String, contentCols: Seq[String]): DataFrame = {
    val digest = contentCols match {
      case Seq(one) => md5(col(one).cast("string"))
      case cols     => md5(to_json(struct(cols.map(col): _*)))
    }
    df.withColumn("__digest", digest)
      .groupBy("__digest")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
  }
}
