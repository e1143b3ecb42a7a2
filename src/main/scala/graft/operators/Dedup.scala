package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard.
  *
  * Scale design:
  *   - signatures are pure map-stage expression trees (codegen'd, no UDFs);
  *   - candidate generation is a bucket equi-join (shuffle on bucket id),
  *     never an all-pairs product: at 100 TB the only quadratic work happens
  *     inside LSH buckets, whose expected size is controlled by the band/row
  *     parameters;
  *   - verification (exact Jaccard / Hamming) runs only on candidate pairs.
  */
object Dedup extends org.apache.spark.internal.Logging {

  /** Exact dedup: one representative (min of `tieBreak`) per `key`, with the
    * duplicate count. A single hash-aggregate — map-side partial combine
    * makes this shuffle only one row per distinct key. */
  def exact(df: DataFrame, key: Column, tieBreak: Column): DataFrame =
    df.groupBy(key.as("dup_key"))
      .agg(min(tieBreak).as("keep_id"), count(lit(1)).as("n_copies"))

  // --- MinHash + LSH ------------------------------------------------------

  /** MinHash signature over a shingle array: `numHashes` universal-hash
    * permutations h_i(x) = (a_i * x + b_i) mod p applied to
    * xxhash64(shingle); signature[i] = min over shingles.
    *
    * Evaluated by the native [[graft.functions.NativeHashes.MinHashSignature]]
    * expression (tight JVM loop; an interpreted HOF tree here costs ~ms per
    * document). Requires `NativeHashes.register` on the session — the
    * operator entry points below do it. */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column =
    call_function("minhash_signature", shinglesCol, lit(numHashes))

  /** Banded LSH buckets: split the signature into `bands` bands (band b =
    * signature positions p ≡ b mod bands, in position order) and hash each
    * band's content. Returns one row per (id, band) with a bucket id; docs
    * sharing any bucket are near-dup candidates.
    *
    * Computed entirely MAP-SIDE (r16 review): `sig` is already an ordered
    * array, so each band's hash is an element_at walk over the positions —
    * the fuzzyContaminationPairsFromShingles idiom. The previous
    * formulation posexploded the signature (numHashes rows per doc) and
    * reassembled bands with a groupBy + sort_array(collect_list) — an
    * entire avoidable corpus-scale shuffle. Bucket values are BIT-IDENTICAL
    * to that formulation (same positions, same order, same concat/hash),
    * so every pinned recall fact carries over unchanged. */
  def lshBuckets(df: DataFrame, id: Column, sig: Column, bands: Int): DataFrame = {
    // named validation (r16 advice): bands = 0 otherwise surfaces as an
    // opaque runtime 'sequence step must not be zero' from the band walk
    require(bands >= 1, s"lshBuckets needs bands >= 1, got $bands")
    val bandArr = when(size(sig) > 0,
      transform(sequence(lit(0), least(lit(bands), size(sig)) - 1), b =>
        xxhash64(concat_ws(",",
          transform(sequence(b, size(sig) - 1, lit(bands)),
            p => element_at(sig, p + 1).cast("string"))))))
      .otherwise(array().cast("array<bigint>"))
    df.select(id.as("id"), posexplode(bandArr).as(Seq("band", "bucket")))
  }

  /** Candidate pairs from LSH buckets: self-equi-join on (band, bucket).
    * The join shuffles on the bucket id — no cross product.
    *
    * `maxBucketSize` drops hot buckets before pair generation: a bucket with
    * k members contributes k² pairs, so one degenerate bucket (boilerplate,
    * near-constant docs) floods the candidate set. Standard LSH-at-scale
    * practice — a duplicate pair colliding in one hot band usually also
    * collides in a cooler one. */
  def lshCandidatePairs(
      buckets: DataFrame, maxBucketSize: Int = 100,
      checkpointInput: Boolean = true): DataFrame = {
    val capped = capBuckets(buckets, Seq("band", "bucket"), maxBucketSize,
      checkpointInput = checkpointInput)
    val l = capped.select(col("band"), col("bucket"), col("id").as("id1"))
    val r = capped.select(col("band"), col("bucket"), col("id").as("id2"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .distinct()
  }

  /** Drop groups larger than `cap` (skew guard for candidate generation).
    *
    * Shape: a groupBy-count (map-side partial combine — no task ever holds
    * more than its input split of a hot key) finds the over-cap keys, which
    * are broadcast into a `left_anti` against the input, so dropping is a
    * map-side filter with NO shuffle of the data rows at all. The previous
    * `Window.partitionBy(keys)` count routed every row of a bucket to ONE
    * task *before* the `count <= cap` filter could discard it — the skew
    * guard was itself skew-vulnerable (a degenerate bucket meant one task
    * sorting/spilling the whole bucket just to learn it must be dropped,
    * and AQE cannot split a window partition).
    *
    * The input is lazily localCheckpointed so the (expensive) upstream
    * signature subtree runs once: the broadcast side's count materializes
    * the checkpoint, every later consumer (including the candidate
    * self-joins, which read `capped` twice) replays stored partitions.
    *
    * Broadcast size: over-cap keys number at most N/cap for N input rows,
    * and in practice form the tiny Zipf head (hot LSH buckets / boilerplate
    * shingles). The guard is now ENFORCED, not assumed: the over-cap key
    * frame is checkpointed and counted (one tiny job — the count reads the
    * map-side-combined aggregate, never the data rows), and above
    * `maxBroadcastKeys` the broadcast list is swapped for a bloom filter of
    * the keys' xxhash64 (a few bits/key instead of a hash-table row, probed
    * map-side through the codegen'd [[graft.functions.NativeHashes
    * .BloomMightContainLong]]). Bloom false positives (rate `bloomFpp`)
    * only over-drop a cool bucket — they thin candidate RECALL by at most
    * fpp, never corrupt a result; false negatives don't exist, so every
    * genuinely hot bucket is still dropped.
    *
    * Null keys: both paths treat a NULL bucket key as a key like any other
    * (the anti-join compares null-safely; the bloom hash folds an explicit
    * is-null marker per key column), matching the groupBy that counted it —
    * an over-cap null group is dropped just like a hot non-null one. The
    * markers matter for MULTI-column keys (r16 review): Spark's xxhash64
    * SKIPS null children, so without them `(x, NULL)` and `(NULL, x)`
    * hash identically and a hot `(x, NULL)` would deterministically drop
    * every `(NULL, x)` row — a guaranteed collision, not an fpp-rate
    * event. All in-repo callers derive non-null keys anyway.
    *
    * `checkpointInput = false` skips the internal materialization — for
    * callers whose input is a cheap derivation (e.g. an explode) of an
    * already-checkpointed frame, where re-running that derivation for the
    * count side costs less than writing a second, larger checkpoint.
    *
    * EXECUTES EAGERLY: unlike most frame builders here, calling this runs
    * Spark jobs immediately (the input checkpoint and the over-cap-key
    * count that sizes the broadcast-vs-bloom decision) — construct it only
    * when the result will actually be consumed.
    *
    * Oracle scope: the DuckDB oracle SQL for queries built on this models
    * only the deterministic df/size cap (the broadcast anti-join path).
    * The bloom fallback's hash-dependent false positives are OUT of oracle
    * scope — it activates only above `maxBroadcastKeys` hot keys, far past
    * any oracle-checked corpus; if it ever fires on one, the logged
    * warning below is the tell for a hash-dependent oracle divergence. */
  private[graft] def capBuckets(
      df: DataFrame, keys: Seq[String], cap: Int,
      checkpointInput: Boolean = true,
      maxBroadcastKeys: Long = 1000000L,
      bloomFpp: Double = 0.001): DataFrame =
    capBucketsWithHotCount(df, keys, cap, checkpointInput, maxBroadcastKeys, bloomFpp)._1

  /** [[capBuckets]] plus the over-cap key count it measured — for callers
    * that can take a cheaper downstream plan when the guard provably
    * dropped nothing (r20: ngramJaccardPairsFromShingles derives per-doc
    * posting counts from the compact array sizes instead of re-exploding
    * the posting stream whenever the cap was a no-op). */
  private[graft] def capBucketsWithHotCount(
      df: DataFrame, keys: Seq[String], cap: Int,
      checkpointInput: Boolean = true,
      maxBroadcastKeys: Long = 1000000L,
      bloomFpp: Double = 0.001): (DataFrame, Long) = {
    val in = if (checkpointInput) df.localCheckpoint(false) else df
    // checkpointed so the aggregation runs ONCE: the sizing count
    // materializes it, the anti-join / bloom build replay stored rows
    val hot = in.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__bucket_n"))
      .filter(col("__bucket_n") > cap)
      .select(keys.map(col): _*)
      .localCheckpoint(false)
    val nHot = hot.count()
    // no over-cap key (the common, healthy-corpus case): dropping is the
    // identity — skip the broadcast build and the per-row anti-join probe
    // entirely (r20; the count above already ran, so this costs nothing)
    if (nHot == 0L) (in, 0L)
    else if (nHot <= maxBroadcastKeys) {
      val hotR = hot.select(keys.map(k => col(k).as(s"__hot_$k")): _*)
      val cond = keys.map(k => col(k) <=> col(s"__hot_$k")).reduce(_ && _)
      (in.join(broadcast(hotR), cond, "left_anti"), nHot)
    } else {
      logWarning(
        s"capBuckets: >$maxBroadcastKeys over-cap keys — using bloom fallback " +
          "(hash-dependent recall thinning; out of oracle scope)")
      // per-column is-null markers disambiguate which columns were null
      // (xxhash64 skips null children — see the null-keys doc above)
      val keyHash = xxhash64((keys.map(col) ++ keys.map(k => col(k).isNull)): _*)
      val bytes = BloomJoin.keyBloom(hot.select(keyHash.as("k")), "k", bloomFpp)
      graft.functions.NativeHashes.register(in.sparkSession)
      (in.filter(!call_function("bloom_might_contain", keyHash, lit(bytes))), nHot)
    }
  }

  /** Distinct-shingle frame `(id, shs)` — the shared upstream of the
    * MinHash and exact-Jaccard paths. Callers composing both over the same
    * corpus (e.g. a sketch run verified against an exact join) should build
    * this once, `localCheckpoint(false)` it, and feed both `FromShingles`
    * entry points: the corpus scan + tokenize + shingle pass then runs one
    * time instead of once per path. */
  def shingleFrame(
      df: DataFrame, id: Column, text: Column, shingleSize: Int = 3,
      rebalance: Boolean = true): DataFrame = {
    // tokenize+shingle is the expensive narrow stage of every dedup path —
    // spread a row-group-bound small scan over every core first (no-op at
    // scale; see Rebalance.smallInput). `rebalance = false` is for callers
    // shingling a frame KNOWN to be a handful of rows (an eval set of a few
    // dozen docs): the bytes gate can't see through a Filter (no CBO
    // selectivity, the estimate stays corpus-sized), and spreading 20 rows
    // over 32 tasks costs more in task setup than the shingling itself —
    // measured on q_decontaminate_fuzzy (driver r19: 0.74×).
    val in = df.select(id.as("id"), text.as("__text"))
    (if (rebalance) Rebalance.smallInput(in) else in)
      .select(col("id"), array_distinct(TextOps.shingles(col("__text"), shingleSize)).as("shs"))
  }

  /** End-to-end MinHash+LSH near-dup candidates over a text column. */
  def minhashCandidates(
      df: DataFrame, id: Column, text: Column,
      numHashes: Int = 32, bands: Int = 8, shingleSize: Int = 3,
      maxBucketSize: Int = 100): DataFrame =
    minhashCandidatesFromShingles(
      shingleFrame(df, id, text, shingleSize), numHashes, bands, maxBucketSize)

  /** [[minhashCandidates]] over a prebuilt [[shingleFrame]]. */
  def minhashCandidatesFromShingles(
      toks: DataFrame, numHashes: Int = 32, bands: Int = 8,
      maxBucketSize: Int = 100): DataFrame = {
    graft.functions.NativeHashes.register(toks.sparkSession)
    val withSig = toks.select(
      col("id"), minhashSignature(col("shs"), numHashes).as("sig"))
    lshCandidatePairs(lshBuckets(withSig, col("id"), col("sig"), bands), maxBucketSize)
  }

  /** Jaccard similarity estimated from two MinHash signatures: the fraction
    * of agreeing positions is an unbiased estimator of J(A,B). The standard
    * cheap pre-filter before exact verification — O(numHashes) per pair
    * instead of O(|shingle sets|). */
  def estimatedJaccard(sig1: Column, sig2: Column): Column =
    aggregate(
      zip_with(sig1, sig2, (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x
    ).cast("double") / greatest(size(sig1), lit(1))

  // --- SimHash ------------------------------------------------------------

  /** 64-bit SimHash over a token array, returned as 4 × 16-bit chunk values
    * (chunked for pigeonhole banding: Hamming distance ≤ 3 ⇒ at least one
    * of 4 chunks identical).
    *
    * bit_j = sign of Σ_tokens (bit_j(xxhash64(token)) ? +1 : -1).
    * Evaluated by the native [[graft.functions.NativeHashes.SimHashChunks]]
    * expression; requires `NativeHashes.register` on the session. */
  def simhashChunks(tokensCol: Column): Column =
    call_function("simhash_chunks", tokensCol)

  /** Hamming distance between two 4-chunk SimHash signatures. */
  def hammingDistance(sig1: Column, sig2: Column): Column =
    aggregate(zip_with(sig1, sig2, (a, b) => bit_count(a.bitwiseXOR(b)).cast("long")),
      lit(0L), (acc, x) => acc + x).cast("int")

  /** SimHash near-dup pairs: pigeonhole-band on chunks (candidates share at
    * least one chunk value), then verify Hamming ≤ maxDist exactly.
    *
    * Cost shape: the expensive signature expression is evaluated once per
    * doc (never per candidate row — candidates carry only ids and are
    * deduplicated BEFORE signatures are joined back for the Hamming
    * verify), and hot chunk buckets are capped like in LSH. */
  def simhashPairs(
      df: DataFrame, id: Column, text: Column,
      maxDist: Int = 6, maxBucketSize: Int = 100): DataFrame = {
    graft.functions.NativeHashes.register(df.sparkSession)
    // checkpoint the signature frame (r16 review): it feeds the pigeonhole
    // explode AND both verify-join sides — without materialization the
    // simhash+tokenize subtree re-ran 2-3× over the full corpus, the exact
    // cost shape the doc above promises to avoid. The explode re-derives
    // map-side from stored rows (checkpointInput = false below).
    // NOT rebalanced (r19): a pinned alternating A/B vs the round-start
    // tree measured the small-input spread as a consistent ~+0.2 s here —
    // the signature pass is lighter than the shingle paths and the
    // pigeonhole explode re-shuffles right after (tools/ab_simhash_r19.txt)
    val sigs = df.select(id.as("id"), simhashChunks(TextOps.tokens(text)).as("sig"))
      .localCheckpoint(false)
    // chunk pigeonhole = banded LSH with (band, bucket) = (chunk index,
    // chunk value): same cap + self-join + distinct pair generation
    val candidates = lshCandidatePairs(
      sigs.select(col("id"), posexplode(col("sig")).as(Seq("band", "bucket"))),
      maxBucketSize, checkpointInput = false)
    candidates
      .join(sigs.select(col("id").as("id1"), col("sig").as("sig1")), "id1")
      .join(sigs.select(col("id").as("id2"), col("sig").as("sig2")), "id2")
      .select(col("id1"), col("id2"), hammingDistance(col("sig1"), col("sig2")).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  // --- Corpus cleaning (pairs → representatives → deduped corpus) ---------

  /** Connected components over near-dup pairs by iterative min-label
    * propagation: every doc ends up labeled with the smallest id reachable
    * through the pair graph. Iterates to a FIXPOINT (labels are monotone
    * non-increasing, so "no label decreased" is convergence), with `maxIter`
    * as a safety cap — a component of diameter d converges in ≤ d rounds;
    * each round is one join + one aggregate, all shuffles on the id key.
    *
    * Throws if the cap is hit before the fixpoint: stopping early would
    * silently leave a long chain split across several representatives, i.e.
    * keep extra duplicate copies.
    *
    * **Driver union-find fast path** (the [[graft.operators.LanguageModel
    * .bpeTrainMerges]] host-choice pattern): the EDGE list of a near-dup
    * graph is orders of magnitude smaller than the corpus — O(candidate
    * pairs), already bucket-capped upstream — so when it fits a documented
    * driver threshold (`driverEdgeMax` pairs; probed with one bounded
    * `limit(max+1).collect()`), the whole fixpoint collapses to an
    * in-memory union-find plus ONE broadcast join labeling the corpus:
    * zero iterative jobs, where the distributed loop pays one join + one
    * aggregate job per graph-diameter round. Gated to integral id types
    * (driver Long ordering == engine ordering; strings would need
    * UTF8-binary comparison and fall back). Semantics are exactly the
    * distributed loop's, including its edge-cases: propagation only
    * traverses nodes PRESENT in `ids` (a bounded membership semi-join
    * against the collected endpoints mirrors the labels-frame join), and
    * NULL endpoints propagate nothing. `driverEdgeMax = 0` forces the
    * distributed loop (the corpus-shape fuzz family checks both hosts
    * against an independent union-find model on every random graph). */
  def connectedComponentsMin(
      ids: DataFrame, pairs: DataFrame, maxIter: Int = 100,
      driverEdgeMax: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.types._
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    val (pairsCk, fits) = ccDriverProbe(ids, pairs, driverEdgeMax, integral.contains)
    fits match {
      case Some(edgeRows) => return ccMinDriver(ids, edgeRows)
      case None =>
    }
    val edges = pairsCk.select(col("id1").as("a"), col("id2").as("b"))
      .unionAll(pairsCk.select(col("id2").as("a"), col("id1").as("b")))
      // hash-partition on the per-round join key BEFORE checkpointing:
      // LogicalRDD keeps the physical partitioning, so every iteration's
      // edge⋈label join shuffles only the (smaller) label side — the edge
      // set, the bulk of the data, is shuffled once for the whole fixpoint
      .repartition(col("b"))
      .localCheckpoint() // reused every round: cut off the pair-gen lineage
    var labels = ids.select(col("id"), col("id").as("rep")).localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges.join(labels.withColumnRenamed("id", "b2"), col("b") === col("b2"))
        .groupBy(col("a")).agg(min(col("rep")).as("nrep"))
      // LAZY checkpoint + a full-scan convergence aggregate as the
      // materializing action: ONE job per round computes the labels,
      // persists every partition (truncating lineage), and returns the
      // changed-row count. (An eager checkpoint + isEmpty costs 2-3 jobs:
      // isEmpty's take(1) may stop early, leaving partitions for
      // doCheckpoint to recompute in yet another job.)
      val next = labels.join(neighborMin, col("id") === col("a"), "left")
        .select(col("id"), col("rep").as("prev"),
          least(col("rep"), coalesce(col("nrep"), col("rep"))).as("rep"))
        .localCheckpoint(false)
      val changed = next
        .agg(count(when(col("rep") < col("prev"), 1)).as("c")).first().getLong(0)
      converged = changed == 0L
      labels = next.select(col("id"), col("rep"))
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsMin did not converge within $maxIter iterations")
    labels
  }

  /** Shared driver fast-path gate for both CC variants (extracted r16 — the
    * probe-bound arithmetic is subtle enough that two hand-kept copies were
    * a drift hazard): LAZILY checkpoint the pair frame, then, when the id
    * type passes `idOk`, the pair endpoint types are integral, and the cap
    * is probe-able, collect at most driverEdgeMax+1 edges — `Some(edges)`
    * means the driver host fits.
    *
    * The checkpoint is unconditional (r16 review): pair GENERATION (LSH
    * joins, distincts) is the expensive plan here, and EVERY downstream
    * host reads it at least twice — the probe-miss distributed loop, but
    * also the never-probing routes (string ids; `driverEdgeMax = 0`),
    * which previously re-ran the whole candidate pipeline once per
    * edges-union leg. */
  private def ccDriverProbe(
      ids: DataFrame, pairs: DataFrame, driverEdgeMax: Long,
      idOk: org.apache.spark.sql.types.DataType => Boolean)
      : (DataFrame, Option[Array[org.apache.spark.sql.Row]]) = {
    import org.apache.spark.sql.types._
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    val probing = driverEdgeMax > 0 && driverEdgeMax < Int.MaxValue - 1 &&
      idOk(ids.schema("id").dataType) &&
      integral.contains(pairs.schema("id1").dataType) &&
      integral.contains(pairs.schema("id2").dataType)
    val pairsCk = pairs.localCheckpoint(false)
    if (!probing) return (pairsCk, None)
    val probe = pairsCk
      .select(col("id1").cast("long").as("u"), col("id2").cast("long").as("v"))
      .limit(driverEdgeMax.toInt + 1).collect()
    (pairsCk, if (probe.length <= driverEdgeMax) Some(probe) else None)
  }

  /** The driver-hosted union-find over a collected edge list — path
    * compression + union by attachment, then a min-per-root resolve, so
    * every edge-endpoint node maps to the smallest id reachable. The
    * corpus-side labeling is one broadcast left join — `ids` itself never
    * shuffles and never reaches the driver.
    *
    * `restrictToIds` selects which distributed host's edge-case semantics
    * to replicate — the two hosts genuinely differ on edges through
    * endpoints NOT present in `ids`:
    *   - min-label (true): a label can only propagate through a node that
    *     HAS a label, so foreign endpoints bridge nothing (a bounded
    *     membership semi-join against the collected endpoints mirrors the
    *     labels-frame joins);
    *   - star contraction (false): contraction runs over the RAW edge
    *     node set before `ids` is ever consulted, so foreign endpoints DO
    *     bridge components. */
  private def ccMinDriver(
      ids: DataFrame, edgeRows: Array[org.apache.spark.sql.Row],
      restrictToIds: Boolean = true): DataFrame = {
    import scala.collection.mutable
    val spark = ids.sparkSession
    val idT = ids.schema("id").dataType
    // distinct non-null endpoints, then (min-label semantics) which of
    // them exist in `ids` — a semi-join of ids against the SMALL endpoint
    // set (broadcast), collected back bounded by the endpoint count,
    // never by |ids|
    val endpoints: Array[Long] = {
      val s = mutable.HashSet.empty[Long]
      edgeRows.foreach { r =>
        if (!r.isNullAt(0)) s += r.getLong(0)
        if (!r.isNullAt(1)) s += r.getLong(1)
      }
      s.toArray
    }
    val present: mutable.HashSet[Long] =
      if (endpoints.isEmpty) mutable.HashSet.empty[Long]
      else if (!restrictToIds) mutable.HashSet.empty[Long] ++ endpoints
      else {
        val epDf = spark.createDataFrame(
          java.util.Arrays.asList(endpoints.map(e =>
            org.apache.spark.sql.Row(e)): _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("ep",
              org.apache.spark.sql.types.LongType, nullable = false))))
        val got = ids.select(col("id").cast("long").as("ep"))
          .join(broadcast(epDf), Seq("ep"), "left_semi")
          .distinct().collect().map(_.getLong(0))
        mutable.HashSet.empty[Long] ++ got
      }
    val parent = mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    present.foreach(n => parent(n) = n)
    edgeRows.foreach { r =>
      if (!r.isNullAt(0) && !r.isNullAt(1)) {
        val u = r.getLong(0); val v = r.getLong(1)
        if (present.contains(u) && present.contains(v)) {
          val ru = find(u); val rv = find(v)
          if (ru != rv) parent(ru) = rv
        }
      }
    }
    val minOfRoot = mutable.HashMap.empty[Long, Long]
    present.foreach { n =>
      val r = find(n)
      minOfRoot.update(r, math.min(minOfRoot.getOrElse(r, Long.MaxValue), n))
    }
    val repRows = present.iterator.map { n =>
      org.apache.spark.sql.Row(n, minOfRoot(find(n)))
    }.toArray
    val repDf = spark.createDataFrame(
        java.util.Arrays.asList(repRows: _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("crep",
            org.apache.spark.sql.types.LongType, nullable = false))))
      .select(col("node").cast(idT).as("id"), col("crep").cast(idT).as("__ccrep"))
    ids.select(col("id"))
      .join(broadcast(repDf), Seq("id"), "left")
      .select(col("id"), coalesce(col("__ccrep"), col("id")).as("rep"))
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond") — O(log n) rounds regardless of component DIAMETER, where
    * [[connectedComponentsMin]] needs one round per hop.
    *
    * Choosing between the two (the heuristic [[removeDuplicates]] applies):
    *   - near-dup clusters from LSH/shingle/embedding candidates are dense
    *     and shallow (diameter ~2-3): min-label propagation converges in as
    *     many rounds and does less work per round (one join vs. two grouped
    *     passes + a distinct) — it is the default;
    *   - graphs with unknown or potentially long chains (transitive link
    *     graphs, follow-on merges of merge results) hit min-label's
    *     O(diameter) adversarially — a 1000-hop chain is 1000 rounds; star
    *     contraction folds it in O(log n) (OperatorsSpec pins ≤ 12 rounds
    *     for a 1000-node chain).
    *
    * Each round: large-star hangs every strictly-larger neighbor of a node
    * onto its minimum neighbor, small-star re-hangs the smaller ones; both
    * are groupBy-join passes shuffling on node id. Convergence = the
    * (count, sum-of-targets, sum-of-edge-hashes) triple of the edge
    * multiset is unchanged. Count+target-sum alone has a collision window
    * (targets redistributed across sources keep both fixed); the
    * order-independent sum of xxhash64(u, v) closes it — two distinct edge
    * multisets colliding on count AND target-sum AND hash-sum is a ~2⁻⁶⁴
    * event, not a reachable graph shape. Computed in the SAME single
    * aggregate, so the per-round job count is unchanged. Throws if
    * `maxIter` rounds pass without convergence, like
    * [[connectedComponentsMin]].
    *
    * Carries the same r13 **driver union-find fast path** as
    * [[connectedComponentsMin]] (edge list fits `driverEdgeMax` → one
    * bounded probe + in-memory union-find + one broadcast labeling join,
    * zero contraction rounds) — with star's OWN edge-case semantics:
    * contraction runs over the raw edge node set, so endpoints absent
    * from `ids` still bridge components (`restrictToIds = false`). Gated
    * to Long ids so the driver path's output schema matches the
    * distributed host's long-cast labels exactly. `driverEdgeMax = 0`
    * forces the distributed rounds (how the round-bound specs and the
    * 100k-chain rehearsal keep exercising them). */
  def connectedComponentsStar(
      ids: DataFrame, pairs: DataFrame, maxIter: Int = 50,
      driverEdgeMax: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.types._
    val (pairsCk, fits) = ccDriverProbe(ids, pairs, driverEdgeMax, _ == LongType)
    fits match {
      case Some(edgeRows) => return ccMinDriver(ids, edgeRows, restrictToIds = false)
      case None =>
    }
    var edges = pairsCk
      .select(col("id1").cast("long").as("u"), col("id2").cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint()
    var converged = edges.isEmpty
    var prev: (Long, java.math.BigDecimal, java.math.BigDecimal) = null
    var i = 0
    while (!converged && i < maxIter) {
      // large-star: for each node, every strictly-larger neighbor re-hangs
      // onto m = min(neighbors ∪ {self})
      val nbrs = edges.select(col("u"), col("v"))
        .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy(col("u")).agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val large = nbrs.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
      // small-star: orient large's output big→small, re-hang the smaller
      // neighbors (and the node itself) onto the minimum
      val dir = large
        .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
        .distinct()
      val smins = dir.groupBy(col("u")).agg(min(col("v")).as("m"))
      val next = dir.join(smins, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionAll(smins.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint(false) // lazy: the convergence agg materializes it
      val row = next
        .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(38,0)")).as("s"),
          sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")).as("h")).first()
      val sig = (row.getLong(0), row.getDecimal(1), row.getDecimal(2))
      converged = sig == prev
      prev = sig
      edges = next
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge within $maxIter rounds")
    // star state: every edge is (member, component-min); centers and
    // singletons label themselves
    ids.select(col("id"))
      .join(edges.select(col("u").as("id"), col("v").as("crep")), Seq("id"), "left")
      .select(col("id"), coalesce(col("crep"), col("id")).as("rep"))
  }

  /** The user-facing near-dedup operator: given candidate pairs (from any
    * of the signature schemes), keep one representative per duplicate
    * cluster — the smallest id — and drop the rest.
    *
    * Uses min-label propagation: near-dup candidate clusters are dense and
    * shallow, its best case (see [[connectedComponentsStar]] for the
    * heuristic and the O(log n) alternative for long-chain graphs). */
  def removeDuplicates(df: DataFrame, id: Column, pairs: DataFrame): DataFrame = {
    val reps = connectedComponentsMin(df.select(id.as("id")), pairs)
    // null-safe equality throughout (r16 review): a NULL id labels as
    // (null, null) — a plain `===` filter/join silently DROPPED such rows
    // (null === null is NULL) even though they were never anyone's
    // duplicate. With <=> they keep themselves, like any other singleton;
    // a NULL id cannot appear in a candidate pair (hash joins skip null
    // keys upstream), so it can never be a cluster member to drop.
    df.join(reps.filter(col("id") <=> col("rep")).select(col("id").as("__keep")),
        id <=> col("__keep"), "left_semi")
  }

  // --- Eval-set decontamination ------------------------------------------

  /** Eval-set contamination scan: for each corpus doc, the fraction of its
    * distinct word-`shingleSize`-grams that appear anywhere in the eval
    * set — the decontamination staple of LLM training pipelines. Long
    * shingles (default 8, vs 3 for dedup) make natural collisions ≈ 0, so
    * any overlap is lifted benchmark text, not shared phrasing.
    *
    * Scale shape: eval sets are small by nature, so the eval shingle
    * vocabulary rides a broadcast semi-join into the corpus posting stream
    * — a pure map-side filter, no corpus shuffle — followed by ONE
    * groupBy(doc) count. Docs with zero overlap drop out in the semi-join,
    * so the output (and the one shuffle's volume) is O(contaminated
    * postings), not O(corpus). */
  def contaminationScores(
      corpus: DataFrame, evalDocs: DataFrame, id: Column, text: Column,
      shingleSize: Int = 8): DataFrame = {
    val evalVocab = evalDocs
      .select(explode(array_distinct(TextOps.shingles(text, shingleSize))).as("sh"))
      .distinct()
    val posts = shingleFrame(corpus, id, text, shingleSize)
      .select(col("id"), size(col("shs")).cast("long").as("n_sh"),
        explode(col("shs")).as("sh"))
    posts.join(broadcast(evalVocab), Seq("sh"), "left_semi")
      .groupBy(col("id"), col("n_sh"))
      .agg(count(lit(1)).as("n_overlap"))
      .select(col("id"), col("n_overlap"), col("n_sh"),
        round(col("n_overlap").cast("double") / col("n_sh"), 6).as("overlap"))
  }

  /** Cross-source n-gram overlap matrix — the corpus-curation diagnostic
    * answering "which sources republish each other's text?" (mirrors,
    * scrapes of scrapes, cross-posted boilerplate): for every source pair,
    * the count of distinct word-`shingleSize`-grams they share and the
    * containment fraction `shared / min(|grams₁|, |grams₂|)`.
    *
    * Scale shape: the corpus collapses to the DISTINCT (source, gram)
    * frame FIRST — one corpus-scale hash-aggregate (map-side combine eats
    * repeated boilerplate before the shuffle). Everything after is bounded
    * by #sources, not corpus size: the self-join on the gram key fans out
    * at most (#sources choose 2) pairs PER GRAM — a gram present in every
    * source costs |S|²/2 rows, so no df cap is needed (the per-key bound
    * is structural, unlike doc-keyed n-gram joins) — and the matrix
    * aggregate emits ≤ |S|² rows. */
  def crossSourceOverlap(
      df: DataFrame, stratum: Column, text: Column, shingleSize: Int = 8): DataFrame = {
    graft.functions.NativeHashes.register(df.sparkSession)
    // the distinct (source, gram) frame feeds THREE consumers — the totals
    // aggregate and both self-join sides. Exchange reuse covers the two
    // identical join sides, but totals is a different plan shape, so
    // without materialization the corpus-scale distinct runs twice;
    // localCheckpoint it once (the duplicateSpans idiom)
    val grams = Rebalance.smallInput(df.select(stratum.as("src"), text.as("__text")))
      .select(col("src"), explode(array_distinct(
        TextOps.shingles(col("__text"), shingleSize))).as("g"))
      .distinct()
      .localCheckpoint(false)
    val totals = grams.groupBy(col("src")).agg(count(lit(1)).as("n"))
    grams.as("a")
      .join(grams.as("b"), col("a.g") === col("b.g") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src1"), col("b.src").as("src2"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(totals.select(col("src").as("src1"), col("n").as("n1"))), "src1")
      .join(broadcast(totals.select(col("src").as("src2"), col("n").as("n2"))), "src2")
      .select(col("src1"), col("src2"), col("n_shared"), col("n1"), col("n2"),
        round(col("n_shared").cast("double") / least(col("n1"), col("n2")), 6)
          .as("containment"))
  }

  /** Fuzzy eval-set decontamination: catches PARAPHRASED contamination
    * that [[contaminationScores]]' exact 8-gram scan misses (a one-token
    * edit breaks every 8-gram window crossing it, but barely moves 3-gram
    * Jaccard). MinHash-LSH between the corpus and a small eval set,
    * returning (id, eval_id, est_jaccard) candidate pairs.
    *
    * Scale shape — the corpus NEVER shuffles: the eval side (signatures +
    * banded bucket keys) is tiny and broadcast; each corpus row computes
    * its signature and its `bands` bucket keys entirely map-side (a bucket
    * is a hash of a signature SLICE — sig is already an ordered array, so
    * no posting explode / groupBy reassembly like the self-join path
    * needs), probes the broadcast, and only bucket-sharing rows continue.
    * The single shuffle (pair dedup across bands) carries O(candidate
    * pairs) ≤ |eval| × matched docs. No hot-bucket cap is needed: the
    * probe side is bounded by the eval set, so a degenerate bucket costs
    * ≤ |eval| output rows per corpus doc, never a self-join blowup.
    *
    * Operating point: `bands = 16` over 32 hashes (r = 2) targets the
    * fuzzy-match band J ∈ [0.5, 0.9] — P(pair at J missed) = (1−J²)¹⁶,
    * ≈ 2·10⁻⁵ at J = 0.7 — where dedup's r = 4 banding (tuned for J ≥ 0.9)
    * would miss half. `est_jaccard` is the signature-agreement estimate;
    * verify candidates exactly downstream if exactness matters. */
  def fuzzyContaminationPairs(
      corpus: DataFrame, evalDocs: DataFrame, id: Column, text: Column,
      numHashes: Int = 32, bands: Int = 16, shingleSize: Int = 3): DataFrame =
    fuzzyContaminationPairsFromShingles(
      shingleFrame(corpus, id, text, shingleSize),
      shingleFrame(evalDocs, id, text, shingleSize), numHashes, bands)

  /** [[fuzzyContaminationPairs]] over prebuilt [[shingleFrame]]s — for
    * callers that also run an exact truth side over one shared (usually
    * checkpointed) shingle pass. */
  def fuzzyContaminationPairsFromShingles(
      corpusToks: DataFrame, evalToks: DataFrame,
      numHashes: Int = 32, bands: Int = 16): DataFrame = {
    require(numHashes % bands == 0, s"bands ($bands) must divide numHashes ($numHashes)")
    graft.functions.NativeHashes.register(corpusToks.sparkSession)
    val r = numHashes / bands
    def bandKeys(sig: Column): Column =
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",",
          transform(slice(sig, b * lit(r) + lit(1), lit(r)), h => h.cast("string")))))
    def rows(toks: DataFrame, idAs: String, sigAs: String): DataFrame = toks
      .select(col("id").as(idAs), minhashSignature(col("shs"), numHashes).as(sigAs))
      .select(col(idAs), col(sigAs),
        posexplode(bandKeys(col(sigAs))).as(Seq("band", "bucket")))
    rows(corpusToks, "id", "sig")
      .join(broadcast(rows(evalToks, "eval_id", "eval_sig")), Seq("band", "bucket"))
      .groupBy(col("id"), col("eval_id"))
      .agg(max(round(estimatedJaccard(col("sig"), col("eval_sig")), 6)).as("est_jaccard"))
  }

  // --- Exact n-gram Jaccard ----------------------------------------------

  /** Exact n-gram Jaccard similarity join: pairs sharing ≥1 rare shingle,
    * scored |A∩B| / |A∪B| over the df-capped shingle sets, kept above
    * `threshold`.
    *
    * The shingle explode + equi-join is the classic inverted-index join.
    * `maxShingleDf` frequency-caps hot shingles BEFORE the join (standard
    * inverted-index practice): a shingle appearing in k docs contributes k²
    * candidate rows, so one boilerplate phrase across the corpus turns the
    * join quadratic. Near-dup pairs still share plenty of rarer shingles;
    * dropping hot postings makes the score a slight underestimate for pairs
    * dominated by boilerplate — the price of staying linear at 100 TB. */
  def ngramJaccardPairs(
      df: DataFrame, id: Column, text: Column,
      threshold: Double, shingleSize: Int = 3, maxShingleDf: Int = 128): DataFrame =
    ngramJaccardPairsFromShingles(
      shingleFrame(df, id, text, shingleSize), threshold, maxShingleDf)

  /** [[ngramJaccardPairs]] over a prebuilt [[shingleFrame]].
    *
    * Checkpoint placement: the COMPACT per-doc frame (one row per doc,
    * shingles as an array) is what gets materialized; the df-count side,
    * both self-join sides, and the per-doc sizes all re-derive the exploded
    * postings from it with a cheap map-side explode. Versus checkpointing
    * the exploded postings: equal warm time at sf0.1 (within run noise),
    * but ~6× fewer stored rows — the storage footprint scales with docs,
    * not postings, which is the difference that matters when the checkpoint
    * spills at corpus scale.
    *
    * `checkpointInput = false` for callers that ALREADY pass a
    * checkpointed shingle frame (q_dedup_minhash shares one across the
    * sketch and truth sides) — otherwise the same frame would be
    * materialized and stored twice. */
  def ngramJaccardPairsFromShingles(
      toks: DataFrame, threshold: Double, maxShingleDf: Int = 128,
      checkpointInput: Boolean = true): DataFrame = {
    val toksC = if (checkpointInput) toks.localCheckpoint(false) else toks
    val (sh, nHot) = capBucketsWithHotCount(
      toksC.select(col("id"), explode(col("shs")).as("sh")), Seq("sh"), maxShingleDf,
      checkpointInput = false)
    // Per-doc posting counts: when the df cap dropped NOTHING (the common
    // case — the cap is a skew guard, not a filter), every doc's surviving
    // posting count is exactly its distinct-shingle array size, so sizes
    // comes from the compact per-doc frame with no explode, no aggregate
    // and no shuffle (r20: this explode+count pass measured ~8 s of task
    // time on q_dedup_minhash at sf0.1 — a third full pass over the
    // posting stream). Docs with zero/NULL shingles get a 0/NULL n_sh row
    // here where the aggregate emitted none, but such ids cannot appear in
    // `common` (no postings → no pairs), so the inner joins below drop
    // them either way — output-identical, and the oracle re-checks it.
    val sizes =
      if (nHot == 0L) toksC.select(col("id"), size(col("shs")).cast("long").as("n_sh"))
      else sh.groupBy(col("id")).agg(count(lit(1)).as("n_sh"))
    val common = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("id", "id1").withColumnRenamed("n_sh", "n1"), "id1")
      .join(sizes.withColumnRenamed("id", "id2").withColumnRenamed("n_sh", "n2"), "id2")
      .withColumn("jaccard",
        round(col("n_common").cast("double") / (col("n1") + col("n2") - col("n_common")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("n_common"), col("jaccard"))
  }

  // --- Duplicate-substring spans -----------------------------------------

  /** Exact duplicate-substring detection: per document, the merged token
    * coverage of every `windowSize`-token window that also occurs in at
    * least one OTHER document — the token-window formulation of
    * suffix-array substring dedup ("Deduplicating Training Data Makes
    * Language Models Better", Lee et al. 2022). Whole-doc dedup misses a
    * boilerplate paragraph pasted into otherwise-distinct pages; this is
    * the operator that finds it.
    *
    * Returns one row per document that has any cross-document duplicated
    * window: (id, n_dup_windows, dup_tokens, n_tokens, dup_fraction),
    * where dup_tokens is the size of the UNION of the duplicated windows'
    * token intervals (overlapping windows are merged, not double-counted).
    *
    * Scale shape — linear end to end, no self-join:
    *   - window generation is a map-side posexplode (stride-1 W-grams);
    *   - "occurs in ≥2 docs" is two hash-aggregates over the window key
    *     ((win, id) distinct, then a window df count) — map-side combine
    *     absorbs within-doc repeats;
    *   - postings rejoin the duplicated-key set with a left-semi equi-join.
    *     A window duplicated across k docs contributes k posting rows —
    *     LINEAR in k, so unlike a similarity self-join a viral boilerplate
    *     window needs no df cap (probe-side skew is AQE-split);
    *   - interval merging is a per-doc array fold over the sorted start
    *     positions (sorted starts s_j with fixed width W cover
    *     Σ min(W, s_{j+1} − s_j) tokens, last term W) — pure codegen'd
    *     zip_with/aggregate, bounded by doc length, no window function.
    * Keys are the window STRINGS so the DuckDB oracle is value-exact; at
    * 100 TB swap the join key to xxhash64(win) (same plan shape, 8-byte
    * shuffle keys, collision odds ≪ corpus size squared / 2^64). */
  /** Shared front half of [[duplicateSpans]] / [[removeDuplicateSpans]]
    * (extracted r16 so the detector and the remover can never disagree
    * about WHICH windows count as duplicated): the stride-1 (id, win,
    * start) posting stream over docs with ≥ w tokens (1-based start;
    * `carryNTokens` keeps the doc length on each posting for the
    * detector's output) and the df ≥ 2 cross-document duplicated-window
    * key set. Executes nothing — both frames are lazy derivations of
    * `toks`. */
  private def dupWindowPostings(
      toks: DataFrame, w: Int, carryNTokens: Boolean): (DataFrame, DataFrame) = {
    val base = toks.filter(col("n_tokens") >= w)
    val exploded = posexplode(TextOps.shingles(col("text"), w)).as(Seq("pos0", "win"))
    val wins0 =
      if (carryNTokens) base.select(col("id"), col("n_tokens"), exploded)
      else base.select(col("id"), exploded)
    val wins = wins0.withColumn("start", col("pos0") + 1).drop("pos0")
    val dupWins = wins.select(col("win"), col("id")).distinct()
      .groupBy(col("win")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
      .select(col("win"))
    (wins, dupWins)
  }

  def duplicateSpans(
      df: DataFrame, id: Column, text: Column, windowSize: Int = 15): DataFrame = {
    val w = windowSize
    graft.functions.NativeHashes.register(df.sparkSession)
    // checkpoint the COMPACT per-doc frame (same placement rationale as
    // ngramJaccardPairsFromShingles): the window stream is consumed by
    // both the df-count side and the semi-join probe side, and re-deriving
    // it is a cheap map-side explode — while the stored footprint scales
    // with docs, not postings. Detection never needs the token ARRAY
    // downstream, so the frame keeps the raw text and the window stream
    // rides the native codegen'd word_shingles (identical windows — same
    // lower/trim/split — once n_tokens >= w holds; the interpreted
    // transform/slice/concat_ws tree costs ~ms per long document)
    val toks = Rebalance.smallInput(df.select(id.as("id"), text.as("text")))
      .select(col("id"), col("text"),
        size(TextOps.tokens(col("text"))).as("n_tokens"))
      .filter(col("n_tokens") >= w)
      .localCheckpoint(false)
    val (wins, dupWins) = dupWindowPostings(toks, w, carryNTokens = true)
    val starts = col("starts")
    val leads = concat(
      slice(starts, lit(2), size(starts) - 1), array(element_at(starts, -1) + w))
    val covered = aggregate(
      zip_with(starts, leads, (s, nx) => least(nx - s, lit(w))), lit(0), _ + _)
    wins.join(dupWins, Seq("win"), "left_semi")
      .groupBy(col("id"), col("n_tokens"))
      .agg(sort_array(collect_list(col("start"))).as("starts"))
      .select(col("id"), size(starts).as("n_dup_windows"), covered.as("dup_tokens"),
        col("n_tokens"),
        (floor(covered.cast("double") * 1e6 / col("n_tokens")) / 1e6).as("dup_fraction"))
  }

  /** The removal half of substring dedup: rewrite each document with its
    * cross-document duplicated spans (as found by [[duplicateSpans]]'
    * window scan) deleted — the actual corpus-cleaning step of Lee et al.
    * 2022, where only the duplicated SUBSTRING is removed and the
    * document's unique remainder survives (whole-doc dedup would throw
    * the remainder away).
    *
    * Same posting pipeline as [[duplicateSpans]]; the rewrite is a left
    * join of the per-doc duplicated-start lists back onto the token frame
    * plus a pure array-expression rebuild: the SORTED start list is walked
    * once — consecutive starts s, nx leave an uncovered gap iff
    * nx − s > W — emitting the kept POSITION ranges directly, and kept
    * text = one element_at per kept position. Per-row cost is
    * O(dup windows + kept tokens) = O(L + C); the earlier per-token
    * `array_contains(covered, i)` probe was O(L × C), quadratic for a
    * boilerplate-saturated long doc (a 100k-token doc with 100k covered
    * positions paid ~10¹⁰ comparisons, map-side).
    *
    * Returns (id, text, n_tokens, dup_tokens, clean_text, n_clean_tokens);
    * docs with no duplicated span pass through with their normalized
    * token stream intact. Note the output text is the NORMALIZED
    * (lowercased, whitespace-collapsed) token stream — span offsets are
    * token positions, so the rewrite happens in token space. */
  def removeDuplicateSpans(
      df: DataFrame, id: Column, text: Column, windowSize: Int = 15): DataFrame = {
    val w = windowSize
    graft.functions.NativeHashes.register(df.sparkSession)
    // the checkpoint carries BOTH the raw text and the token array: the
    // window stream (consumed twice — df-count and semi-join sides) rides
    // the native codegen'd word_shingles over text, while the rewrite
    // still needs element_at over the normalized token stream (re-joining
    // and re-splitting toks would lose empty edge tokens). The extra text
    // column costs ~the toks footprint again; the interpreted
    // transform/slice/concat_ws window tree it replaces cost ~ms per long
    // document per evaluation
    val toks = Rebalance.smallInput(df.select(id.as("id"), text.as("text")))
      .select(col("id"), col("text"), TextOps.tokens(col("text")).as("toks"))
      .select(col("id"), col("text"), size(col("toks")).as("n_tokens"), col("toks"))
      .localCheckpoint(false)
    val (wins, dupWins) = dupWindowPostings(toks, w, carryNTokens = false)
    val dupStarts = wins.join(dupWins, Seq("win"), "left_semi")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("start"))).as("starts"))
      .select(col("id"), size(col("starts")).as("n_dup_windows"), col("starts"))
    // kept positions from the SORTED starts in one pass — O(C) ranges,
    // O(L) element_at lookups, never a per-token membership probe:
    //   prefix  [1, s₁−1]            (guarded: sequence() REVERSES when
    //                                 stop < start, so an empty range must
    //                                 short-circuit, not evaluate)
    //   gaps    [sⱼ+W, s_{j+1}−1]    iff s_{j+1} − sⱼ > W
    //   suffix  via sentinel lead n_tokens+1 on the last start
    val starts = col("starts")
    val emptyInts = array().cast("array<int>")
    val leads = concat(
      slice(starts, lit(2), size(starts) - 1), array(col("n_tokens") + 1))
    val gaps = zip_with(starts, leads, (s, nx) =>
      when(nx - s > w, sequence(s + w, nx - 1)).otherwise(emptyInts))
    val prefix = when(element_at(starts, 1) > 1,
      sequence(lit(1), element_at(starts, 1) - 1)).otherwise(emptyInts)
    val keptPos = concat(prefix, flatten(gaps))
    toks.join(dupStarts, Seq("id"), "left")
      .select(col("id"), concat_ws(" ", col("toks")).as("text"), col("n_tokens"),
        coalesce(col("n_dup_windows"), lit(0)).as("n_dup_windows"),
        when(starts.isNull, col("toks"))
          .otherwise(transform(keptPos, p => element_at(col("toks"), p)))
          .as("clean_toks"))
      .select(col("id"), col("text"), col("n_tokens"), col("n_dup_windows"),
        (col("n_tokens") - size(col("clean_toks"))).as("dup_tokens"),
        concat_ws(" ", col("clean_toks")).as("clean_text"),
        size(col("clean_toks")).as("n_clean_tokens"))
  }
}
