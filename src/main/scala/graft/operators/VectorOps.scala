package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-vector operators: cosine similarity, brute-force top-k ANN,
  * LSH-bucketed ANN — over plain `array<float>` columns.
  *
  * Scale design:
  *   - similarity math is expression-level (native CosineSimilarity — no
  *     UDFs), accumulated in double, sequential fold order so results are
  *     deterministic;
  *   - brute-force top-k broadcasts the (small) query set and streams the
  *     corpus — one pass, no corpus shuffle; per-query ranking is the
  *     two-level `topKPerQuery` (per-source-partition prune, then a
  *     global rank over ≤ k × partitions survivors);
  *   - the LSH path buckets the corpus once (map stage) and probes only
  *     matching buckets — the 100 TB pattern where a full scan per query is
  *     unaffordable.
  */
/** Typed empty-corpus signal from [[VectorOps.kmeansFit]]'s seeding sample,
  * so callers folding their emptiness probe into the fit (semanticDedup)
  * catch a TYPE instead of string-matching a require() message — rewording
  * the message can't silently break the empty-slice convention, and an
  * unrelated IllegalArgumentException can't masquerade as "empty" (r16
  * review). Extends IllegalArgumentException to keep external catch
  * behavior unchanged. */
final class EmptyCorpusException(msg: String) extends IllegalArgumentException(msg)

object VectorOps extends org.apache.spark.internal.Logging {

  /** Dot product in double precision, sequential fold (generic: any numeric
    * array type). Dimension-mismatched inputs yield NULL (zip_with pads the
    * shorter side with nulls, which poison the fold) — unlike the native
    * cosine path, which throws a named dimension-mismatch error; callers
    * needing the loud contract should go through [[cosine]]. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity for float vectors — evaluated by the native
    * CosineSimilarity expression (same fold order/values as
    * dot/(norm·norm), single primitive loop). Registered by the operator
    * entry points and GraftExtensions. */
  def cosine(a: Column, b: Column): Column =
    call_function("cosine_similarity", a, b)

  /** Per-query top-k ranking of a scored (queryId, corpusId, cos) frame —
    * the shared tail of the three ANN paths.
    *
    * Two-level shape (r9): level 1 ranks within (query, INPUT PARTITION) —
    * the window keys include `spark_partition_id()`, so the shuffle spreads
    * one query's candidate scores across every input partition instead of
    * concentrating |candidates| rows on a single sorting task (with a
    * handful of queries over a large corpus, the single-key window IS a
    * near-serial sort of the corpus). Level 2 ranks the survivors — at most
    * k × #partitions rows per query — for the exact global `rnk`. Output
    * is identical: the global top-k is a subset of the per-partition
    * top-k, and (cos desc, corpusId) is a total order per query. Both
    * sorts stay in Spark's spillable window exec. */
  private def topKPerQuery(
      scored: DataFrame, queryId: String, corpusId: String, k: Int): DataFrame = {
    val w1 = Window.partitionBy(col(queryId), col("__pid"))
      .orderBy(col("cos").desc, col(corpusId))
    val pruned = scored
      // NaN guard (r15): Spark sorts NaN ABOVE every real double, so one
      // corrupted (NaN/Inf-element) corpus embedding would otherwise rank
      // #1 for EVERY query across all three ANN paths — undefined
      // similarity is a non-result. NULL cosines (zero vectors) stay: desc
      // ordering puts them last, returned only when real candidates run out.
      .filter(col("cos").isNull || !isnan(col("cos")))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= k)
      .drop("__pid", "__rn")
    val w = Window.partitionBy(col(queryId)).orderBy(col("cos").desc, col(corpusId))
    pruned.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Brute-force cosine top-k: every query row against every corpus row.
    * `queries` must be small (it is broadcast); corpus streams map-side.
    *
    * NULL-query-vector contract (documented r16): this path returns k rows
    * of NULL cosine for such a query (the fuzz-pinned zero-vector
    * semantics extend to it), while the bucketed paths (lshTopK/ivfTopK)
    * return ZERO rows — a NULL vector has no bucket/cell to probe. Callers
    * comparing paths should pre-filter NULL query vectors. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    graft.functions.NativeHashes.register(corpus.sparkSession)
    val scored = corpus.crossJoin(broadcast(queries))
      .select(
        col(queryId), col(corpusId),
        round(cosine(col(queryVec), col(corpusVec)), 6).as("cos"))
    topKPerQuery(scored, queryId, corpusId, k)
  }

  /** Random-hyperplane signature: `bits` sign bits of dot products with
    * deterministic pseudo-random ±1 planes, evaluated by the native
    * [[graft.functions.NativeHashes.HyperplaneSignature]] expression — one
    * primitive O(bits·dims) loop per row (the plane weights are derived
    * inside the expression, so there is still no stored model and every
    * executor computes identical buckets). Returns an int bucket id in
    * [0, 2^bits). */
  def hyperplaneBucket(vec: Column, dims: Int, bits: Int): Column =
    call_function("hyperplane_bucket", vec, lit(dims), lit(bits))

  /** LSH-bucketed ANN: corpus and queries are bucketed by hyperplane
    * signature; each query probes its own bucket plus every single-bit-flip
    * neighbor (multiprobe — near-misses on one hyperplane are the dominant
    * recall loss, and probing them costs query fan-out, not index size).
    * Candidates are ranked by exact cosine. Trades recall for a
    * ~2^bits/(bits+1)-fold reduction in comparisons. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, dims: Int, bits: Int = 8,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    graft.functions.NativeHashes.register(corpus.sparkSession)
    val bucketedCorpus = corpus.withColumn("bucket", hyperplaneBucket(col(corpusVec), dims, bits))
    val probes = queries
      .withColumn("__home", hyperplaneBucket(col(queryVec), dims, bits))
      .withColumn("bucket", explode(array(
        col("__home") +: (0 until bits).map(b => col("__home").bitwiseXOR(lit(1 << b))): _*)))
      .drop("__home")
    val scored = bucketedCorpus.join(broadcast(probes), "bucket")
      .select(
        col(queryId), col(corpusId),
        round(cosine(col(queryVec), col(corpusVec)), 6).as("cos"))
    topKPerQuery(scored, queryId, corpusId, k)
  }

  /** Spherical k-means (cosine metric) over a driver-side sample: assign to
    * the max-cosine centroid, recompute centroids as the normalized mean of
    * assigned unit vectors. Deterministic — seeds are the first k sample
    * vectors, the sample itself is hash-ordered. O(sampleN · k · dims · iters)
    * driver flops: microseconds next to any cluster job. Empty cells keep
    * their previous centroid. */
  private def kmeansCentroids(
      sample: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    val xs = sample.map(unit)
    var cents = xs.take(k).map(_.clone())
    for (_ <- 0 until iters) {
      val dims = cents(0).length
      val sums = Array.fill(cents.length)(new Array[Double](dims))
      val counts = new Array[Int](cents.length)
      xs.foreach { x =>
        var best = 0; var bestDot = Double.MinValue
        var c = 0
        while (c < cents.length) {
          var d = 0.0; var i = 0
          while (i < dims) { d += x(i) * cents(c)(i); i += 1 }
          if (d > bestDot) { bestDot = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dims) { sums(best)(i) += x(i); i += 1 }
        counts(best) += 1
      }
      cents = cents.indices.map { c =>
        if (counts(c) > 0) unit(sums(c)) else cents(c)
      }.toArray
    }
    cents
  }

  /** IVF (inverted-file) ANN: partition the corpus into `nCells` Voronoi
    * cells around centroid vectors, then answer queries by probing only the
    * `nProbe` nearest cells.
    *
    * Centroids come from spherical k-means over a deterministic hash-ordered
    * sample (`sampleN` vectors, `kmeansIters` Lloyd rounds) — driver-side
    * work, so the centroids become plan literals: cell assignment stays a
    * pure map stage and the probe an equi-join on cell id.
    *
    * Recall knobs: `nProbe` of `nCells` cells scanned per query, and
    * `assignN`-way corpus multi-assignment (each corpus vector indexed in
    * its `assignN` best cells — closure assignment, the standard answer to
    * boundary vectors whose best cell isn't the query's; costs assignN×
    * index size, not query time). A pair reachable through several probed
    * cells is deduplicated before ranking. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4, assignN: Int = 4,
      kmeansIters: Int = 5, sampleN: Int = 2048,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    graft.functions.NativeHashes.register(corpus.sparkSession)
    // SANITIZED sample (r16 review): a NULL embedding in the hash-ordered
    // head NPE'd the driver map, and a NaN/Inf-element vector poisons
    // kmeansCentroids permanently (its dots are all NaN, so it always
    // lands in centroid 0 and its elements enter the mean) — dead cell,
    // silent recall loss. NULL rows are filtered BEFORE the limit (r17,
    // closing the r16 advice note): dropping them after meant null rows
    // THINNED the seed — an all-null hash-ordered head over a corpus with
    // real vectors past sampleN returned zero neighbors despite real ones
    // existing. Non-finite rows drop from the SEED only (they still get
    // assigned and scored like any row).
    val allSampled: Array[Array[Double]] = corpus
      .filter(col(corpusVec).isNotNull)
      .orderBy(xxhash64(col(corpusId)), col(corpusId)).limit(sampleN)
      .select(col(corpusVec)).collect()
      .flatMap(r => Option(r.getSeq[Float](0)).map(_.map(_.toDouble).toArray))
    val finiteSampled = allSampled.filter(_.forall(java.lang.Double.isFinite))
    val sample = if (finiteSampled.nonEmpty) finiteSampled else allSampled
    if (sample.isEmpty) {
      // empty (or all-NULL-vector) corpus: no centroids to train and no
      // neighbors to return — an empty frame with the output schema, not
      // an NPE/AIOOBE from k-means
      return bruteForceTopK(corpus, queries.limit(0), k,
        corpusId, corpusVec, queryId, queryVec)
    }
    val centroids: Array[Seq[Float]] =
      kmeansCentroids(sample, math.min(nCells, sample.length), kmeansIters)
        .map(_.map(_.toFloat).toSeq)

    def bestCells(vec: Column, n: Int): Column =
      explode(call_function("nearest_cells", vec, typedLit(centroids.toSeq), lit(n)))

    val bucketedCorpus = corpus.withColumn("cell", bestCells(col(corpusVec), assignN))
    // each query probes its nProbe best cells
    val probes = queries.withColumn("cell", bestCells(col(queryVec), nProbe))
    // project to (query, corpus, cos) BEFORE the dedup shuffle: duplicate
    // candidates (a pair reachable through several probed cells) carry
    // identical cosines, so deduping after the projection is
    // output-identical and moves three scalars per row instead of two
    // full embedding vectors (r15)
    val scored = bucketedCorpus.join(broadcast(probes), "cell")
      .select(
        col(queryId), col(corpusId),
        round(cosine(col(queryVec), col(corpusVec)), 6).as("cos"))
      .dropDuplicates(queryId, corpusId)
    topKPerQuery(scored, queryId, corpusId, k)
  }

  /** Distributed spherical k-means (Lloyd): cluster a corpus too large to
    * sample meaningfully. Per iteration: assignment is a pure map stage
    * (centroids are plan literals — same trick as ivfTopK), and the
    * centroid update is ONE posexplode + hash-aggregate shuffle of
    * (cluster, dim) partial sums — k×dims rows to the driver, never the
    * vectors themselves. Seeding reuses the deterministic hash-ordered
    * sample so results are run- and partitioning-independent.
    *
    * Update-rule note (documented r15): the distributed rounds sum RAW
    * member vectors and normalize the sum — a NORM-WEIGHTED directional
    * mean (a member pulls the centroid in proportion to its magnitude) —
    * where the driver-side seeding round unit-normalizes members first
    * (the textbook spherical update). On unit-normalized embeddings (the
    * standard semantic-dedup input, and what cosine assignment implicitly
    * assumes) the two rules coincide exactly; on mixed-norm corpora the
    * trained centroids are the weighted variant, assignment stays pure
    * max-cosine either way, and the label contract (labels == argmax over
    * the RETURNED centroids) is unaffected — the corpus-shape fuzz family
    * pins that contract, not a specific update rule.
    *
    * Returns the trained centroids; pair with [[assignClusters]] for the
    * corpus labeling (topic balancing / cluster-stratified sampling). */
  def kmeansFit(
      corpus: DataFrame, vecCol: String, k: Int, iters: Int = 5,
      idCol: String = "vec_id", sampleN: Int = 2048): Array[Seq[Float]] = {
    graft.functions.NativeHashes.register(corpus.sparkSession)
    // NULL rows are filtered BEFORE the limit (r17, closing the r16 advice
    // note): filtering after meant null rows thinned the seed sample, and
    // an all-null hash-ordered head over a corpus with real vectors past
    // sampleN threw EmptyCorpusException despite trainable vectors
    // existing (semanticDedup then silently self-labeled the whole corpus).
    val sampledRows = corpus
      .filter(col(vecCol).isNotNull)
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(sampleN)
      .select(col(vecCol)).collect()
    if (sampledRows.isEmpty) throw new EmptyCorpusException(
      "kmeansFit: no row with a non-NULL embedding to seed from")
    // SANITIZED seed (r16 review): NULL rows NPE'd the driver map, and a
    // NaN/Inf-element vector poisons kmeansCentroids permanently (its dots
    // are all NaN so it always lands in centroid 0 and its elements enter
    // the mean — one dead cell, silent quality loss). PREFER finite seeds;
    // when nothing finite exists (an all-degenerate corpus — a shape the
    // semdedup fuzz family pins) fall back to the raw non-null sample:
    // centroids then carry NaN, every assignment resolves through the
    // deterministic -Inf-cosine rule, and the dedup guards (NaN pair
    // filter, nonZero collapse gate) still produce the contracted
    // self-labels. A corpus with no non-NULL vector at all has nothing to
    // seed from — typed emptiness from the pre-filtered sample collect
    // above, which semanticDedup converts to all-self labels.
    val allSampled: Array[Array[Double]] = sampledRows
      .flatMap(r => Option(r.getSeq[Float](0)).map(_.map(_.toDouble).toArray))
    val finiteSampled = allSampled.filter(_.forall(java.lang.Double.isFinite))
    val sample = if (finiteSampled.nonEmpty) finiteSampled else allSampled
    // unreachable since the isNotNull pre-filter (r17), kept as a typed
    // guard against a future sampling-path edit reintroducing NULLs
    if (sample.isEmpty) throw new EmptyCorpusException(
      "kmeansFit: no non-NULL embedding among the sampled rows")
    // seed from the driver-side sample (1 Lloyd round), then refine with
    // distributed rounds over the FULL corpus
    var cents: Array[Seq[Float]] =
      kmeansCentroids(sample, math.min(k, sample.length), 1)
        .map(_.map(_.toFloat).toSeq)
    // refinement reads only rows with a finite vector (r16 review): a NULL
    // row has no assignment, and a NaN/Inf element would poison its cell's
    // mean (or, under ANSI, kill the decimal cast outright) — excluded
    // rows still get labeled by assignClusters like any other row. The
    // probe is the NATIVE l2_norm (NaN iff any element is NaN; Inf iff any
    // is ±Inf — squaring folds the sign), not an interpreted per-element
    // HOF, so the per-row-per-round cost stays in codegen.
    val nrm = call_function("l2_norm", col(vecCol))
    val finiteVecs = corpus.filter(col(vecCol).isNotNull &&
      !isnan(nrm) && nrm =!= lit(Double.PositiveInfinity))
    for (_ <- 0 until iters) {
      val assigned = finiteVecs.withColumn("_cl", nearestCentroid(col(vecCol), cents))
      val stats = assigned
        .select(col("_cl"), posexplode(col(vecCol)).as(Seq("_pos", "_v")))
        .groupBy(col("_cl"), col("_pos"))
        // exact DECIMAL accumulation: partial-sum order varies with
        // partitioning, so a double sum would make the trained centroids
        // (and boundary assignments) partitioning-dependent
        .agg(sum(col("_v").cast(org.apache.spark.sql.types.DecimalType(28, 10)))
          .cast("double").as("_s"))
        .collect()
      val dims = cents(0).length
      val sums = Array.fill(cents.length)(new Array[Double](dims))
      stats.foreach { r =>
        sums(r.getAs[Int]("_cl"))(r.getAs[Int]("_pos")) = r.getAs[Double]("_s")
      }
      cents = cents.indices.map { c =>
        val n = math.sqrt(sums(c).map(x => x * x).sum)
        if (n == 0.0) cents(c) else sums(c).map(x => (x / n).toFloat).toSeq
      }.toArray
    }
    cents
  }

  /** Nearest-centroid id (0-based) as a pure map expression — native O(k)
    * argmax (NearestCells with n=1), not a per-row struct-array sort. */
  def nearestCentroid(vec: Column, centroids: Array[Seq[Float]]): Column =
    element_at(
      call_function("nearest_cells", vec, typedLit(centroids.toSeq), lit(1)), 1)

  /** Label every corpus row with its cluster — a codegen'd map stage, no
    * shuffle; feed the result to `Sampling.stratifiedSample` for
    * cluster-balanced corpus construction. */
  def assignClusters(
      corpus: DataFrame, centroids: Array[Seq[Float]], vecCol: String): DataFrame = {
    graft.functions.NativeHashes.register(corpus.sparkSession)
    corpus.withColumn("cluster", nearestCentroid(col(vecCol), centroids))
  }

  /** Embedding near-duplicate pairs: all pairs above a cosine threshold.
    * Brute-force — O(n²) pairs; only for small corpora or within buckets. */
  def cosineNearDupPairs(corpus: DataFrame, id: String, vec: String, threshold: Double): DataFrame = {
    graft.functions.NativeHashes.register(corpus.sparkSession)
    val l = corpus.select(col(id).as("id1"), col(vec).as("v1"))
    val r = corpus.select(col(id).as("id2"), col(vec).as("v2"))
    l.join(r, col("id1") < col("id2"))
      .withColumn("cos", round(cosine(col("v1"), col("v2")), 6))
      // !isnan: one NaN/Inf-element embedding would otherwise pair with
      // every row it meets (NaN >= threshold is true under Spark's NaN
      // ordering) — the semanticDedup pair-stage guard, applied here too
      .filter(!isnan(col("cos")) && col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("cos"))
  }

  /** Scale path for near-dup pairs: hyperplane-bucket the corpus (one map
    * pass), generate pairs only within buckets (equi-join on bucket id),
    * then verify with exact cosine. High-threshold pairs have tiny angles,
    * so they agree on every hyperplane sign with probability
    * ≈ 1 − bits·θ/π — and exact scale-copies always share a bucket. Turns
    * O(n²) pair generation into Σ_buckets O(k²). */
  def bucketedNearDupPairs(
      corpus: DataFrame, id: String, vec: String, threshold: Double,
      dims: Int, bits: Int = 8): DataFrame = {
    graft.functions.NativeHashes.register(corpus.sparkSession)
    val bucketed = corpus
      .withColumn("bucket", hyperplaneBucket(col(vec), dims, bits))
    val l = bucketed.select(col("bucket"), col(id).as("id1"), col(vec).as("v1"))
    val r = bucketed.select(col("bucket"), col(id).as("id2"), col(vec).as("v2"))
    l.join(r, Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .withColumn("cos", round(cosine(col("v1"), col("v2")), 6))
      // same NaN guard as the exact path: a corrupted embedding must not
      // fuse its whole bucket into one duplicate group
      .filter(!isnan(col("cos")) && col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("cos"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540: k-means the embedding space, prune near-duplicate
    * pairs WITHIN each cluster): [[kmeansFit]] clusters the corpus,
    * candidate pairs come only from co-clustered rows (the SemDeDup trade —
    * cross-cluster duplicates are assumed separated by the clustering,
    * which holds for scale-copies and paraphrase-grade cosines because
    * near-identical directions get identical centroid argmaxes), exact
    * cosine ≥ `threshold` verifies, connected components close duplicate
    * GROUPS (A≈B≈C chains), and the min-id member represents each group.
    *
    * Returns every corpus id labeled `(id, rep)` — `rep == id` for kept
    * rows, the representative's id for pruned ones; the deduped corpus is
    * `filter(col(id) === col("rep"))` against the labeling.
    *
    * Scale shape: clustering is one (cluster, dim) partial-sum shuffle per
    * Lloyd round plus a map-stage assignment (centroids are plan
    * literals); pair generation is an equi-join on cluster id —
    * O(Σ cluster²) cosine evaluations, not O(n²) — so pick `k` to a target
    * cluster size (n / 10k keeps a cluster's pair block inside one shuffle
    * task; SemDeDup's own k grows linearly with corpus size for the same
    * reason).
    *
    * Degenerate-mass defense, three layers (r11 — replaces the silent
    * over-cap drop):
    *   1. EXACT PRE-COLLAPSE: identical (non-zero) embeddings reduce to one
    *      delegate + linear star edges after cluster assignment (riding the
    *      assignment checkpoint) and before pair generation — members are
    *      mutual duplicates by definition (cosine = 1), so connectivity is
    *      preserved and the one blob no direction-based method can split
    *      never reaches pair generation. A hash probe gates the collapse:
    *      corpora with no repeated vector hash skip it entirely.
    *   2. HOT-CLUSTER SUB-SPLIT: a cluster of DISTINCT vectors above
    *      `maxClusterSize` is hyperplane-sub-bucketed (bits sized from the
    *      largest hot cluster) so its pair block becomes Σ subbucket².
    *      Positive scale-copies share every hyperplane sign, so exact-ray
    *      duplicates are never separated; angular pairs lose ≈ bits·θ/π
    *      recall (θ ≈ 0.0014 rad at threshold 0.999 — sub-1% at 12 bits),
    *      the same trade the LSH near-dup operator makes.
    *   3. RESIDUAL CAP, MEASURED: a (cluster, sub-bucket) still over cap
    *      (a near-identical-direction mass of distinct vectors) is dropped
    *      from pair generation as before, but the drop is now RETURNED
    *      ([[SemanticDedupResult]]) and logged, never silent.
    *
    * CC runs on the above-threshold pair graph plus the exact star edges —
    * O(duplicates), not O(corpus). */
  def semanticDedupLabels(
      corpus: DataFrame, id: String, vec: String,
      k: Int, threshold: Double, kmeansIters: Int = 3,
      maxClusterSize: Int = 100000): DataFrame =
    semanticDedupLabelsWithStats(
      corpus, id, vec, k, threshold, kmeansIters, maxClusterSize).labels

  /** [[semanticDedupLabels]] plus the hot-bucket drop accounting.
    * `droppedRows` counts corpus rows whose residual (cluster, sub-bucket)
    * exceeded `maxClusterSize` even after the exact pre-collapse and the
    * hyperplane sub-split — those rows keep `rep == id` (never pruned) and
    * represent the operator's only recall loss bound. Executes eagerly
    * (sizing + stats jobs), like [[Dedup.capBuckets]]. */
  def semanticDedupLabelsWithStats(
      corpus: DataFrame, id: String, vec: String,
      k: Int, threshold: Double, kmeansIters: Int = 3,
      maxClusterSize: Int = 100000): SemanticDedupResult = {
    graft.functions.NativeHashes.register(corpus.sparkSession)
    val rows = corpus.select(col(id).as("id"), col(vec).as("v"))

    // 1. Cluster the full corpus (as SemDeDup does — exact duplicates only
    // add weight to their own centroid) and CHECKPOINT the assignment:
    // every later pass (dup probe, collapse, sizing, pair generation)
    // replays stored partitions instead of re-scanning the corpus and
    // re-deriving embeddings.
    //
    // Empty corpus: nothing to cluster and nothing to label — return the
    // output schema (the ivfTopK convention; a daily-slice pipeline may
    // legitimately hand this operator zero rows). The emptiness probe is
    // FOLDED into kmeansFit's seeding sample — the first job this operator
    // runs anyway — instead of a separate `rows.isEmpty` limit-1 job that
    // would partially evaluate an expensive upstream plan twice on every
    // non-empty invocation (r16, closing the r15 advice note).
    val cents =
      try kmeansFit(rows, "v", k, kmeansIters, idCol = "id")
      catch {
        case _: EmptyCorpusException =>
          // truly empty corpus → empty labeling; a non-empty corpus with
          // NO non-NULL vector anywhere (r17: the seed sample pre-filters
          // NULLs, so a merely null-headed sample no longer lands here) →
          // every row labels ITSELF (no direction ⇒ nobody's duplicate; an
          // empty labeling here would silently drop the rows — r16
          // review). Both cases are the same select: self-labels over
          // whatever rows exist.
          return SemanticDedupResult(
            corpus.select(col(id), col(id).as("rep")), 0L, 0L)
      }
    // NULL-embedding rows are excluded from the clustering pipeline (r16
    // review: their null cluster key NPE'd the driver sizing collect) —
    // they re-enter through CC's full id frame below and label themselves,
    // which is the only defensible answer for a row with no direction
    val assigned = assignClusters(rows.filter(col("v").isNotNull), cents, "v")
      .localCheckpoint(false)

    // 2. Exact pre-collapse, gated to vectors whose cosine is DEFINED:
    // zero vectors produce NULL cosines (never >= threshold) and NaN/Inf
    // element vectors produce NaN cosines — which Spark's NaN ordering
    // would otherwise pass through a >= filter, letting one corrupted
    // embedding merge its entire cluster (see the pair-stage NaN guard
    // below). Neither class may collapse as "exact duplicates".
    //
    // Fast-path probe first: a 64-bit-hash groupBy over the checkpoint
    // (map-side combine, one LONG key per distinct vector — the vectors
    // themselves never shuffle) asks whether ANY hash repeats. Corpora
    // without exact duplicates — the common case — skip the collapse
    // entirely.
    // deliberately NOT dot(v, v): the single-pass fold squares in place,
    // where dot's zip_with would allocate an intermediate products array
    // per row on this corpus-scale probe path (same double-op order, so
    // values are identical — only the plan shape differs)
    val sumSq = aggregate(col("v"), lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    val nonZero = !isnan(sumSq) && sumSq > lit(0.0) &&
      sumSq =!= lit(Double.PositiveInfinity)
    // FUSED probe + sizing (r20, VERDICT r19 item 6): the dup-hash probe
    // and the cluster sizing were two driver jobs over the same
    // checkpoint; one two-level aggregate answers both — level 1 groups
    // by (cluster, vector hash) with map-side combine (nonZero-failing
    // rows keep a NULL hash so they never count as duplicates but still
    // count toward their cluster's size), level 2 collapses to ≤ k rows
    // carrying the cluster size and its max duplicate-hash multiplicity.
    // Identical vectors always share a cluster (same argmax), so
    // per-cluster grouping sees every true duplicate group whole; a
    // cross-cluster xxhash64 collision that the old global probe would
    // have (spuriously) fired on now doesn't — either way the precise
    // path below is value-exact, so results are unchanged. At the
    // measured ~127 ms of driver latency per job on this family, the
    // fused action is the point.
    val preSizes: Array[(Int, Long, Long)] = assigned
      .groupBy(col("cluster"), when(nonZero, xxhash64(col("v"))).as("__h"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("cluster"))
      .agg(
        sum(col("__n")).as("__size"),
        max(when(col("__h").isNotNull, col("__n")).otherwise(lit(0L))).as("__maxdup"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val anyDupHash = preSizes.exists(_._3 > 1L)
    // Precise path only when the probe fires: the groupBy's map-side
    // partial aggregation bounds the blob (each task emits one row per
    // distinct vector); the re-association join streams a blob through
    // one task linearly — no sort, no pair block. Hash collisions cannot
    // corrupt results (the join compares full vectors); a collision can
    // only trigger this path spuriously.
    val (exactEdges, distinctAssigned) =
      if (!anyDupHash)
        (rows.select(col("id").as("id1"), col("id").as("id2")).limit(0), assigned)
      else {
        val dupReps = assigned.filter(nonZero)
          .groupBy(col("v")).agg(min(col("id")).as("gid"), count(lit(1)).as("__n"))
          .filter(col("__n") > 1)
          .select(col("v").as("gv"), col("gid"))
        val joined = assigned.join(dupReps, col("v") === col("gv"), "left")
          .select(col("id"), col("v"), col("cluster"), col("gid"))
          // checkpointed (r16 review): BOTH split halves read this — the
          // star edges once, and the collapsed assignment from the sizing
          // collect, every sub-split escalation count, the overCap
          // materialization, AND pair generation. Without materialization
          // each of those actions re-ran the full-vector groupBy and
          // re-association join — the operator's widest shuffle.
          .localCheckpoint(false)
        (joined.filter(col("gid").isNotNull && col("gid") =!= col("id"))
          .select(col("gid").as("id1"), col("id").as("id2")),
          joined.filter(col("gid").isNull || col("gid") === col("id"))
            .select(col("id"), col("v"), col("cluster")))
      }

    // 3. Cluster sizes: when no exact collapse happened the fused
    // aggregate above already measured them (distinctAssigned == assigned
    // — no second job); after a collapse the post-collapse sizes are
    // re-counted as before. The sub-split + residual-cap machinery is
    // built only when some cluster is actually over cap, so the common
    // balanced case pays the one fused job and nothing else.
    val sizesArr: Array[(Int, Long)] =
      if (!anyDupHash) preSizes.map { case (c, n, _) => c -> n }
      else distinctAssigned.groupBy(col("cluster")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1))
    val maxHot = sizesArr.collect { case (_, n) if n > maxClusterSize => n }
      .maxOption.getOrElse(0L)

    val (capped, droppedBuckets, droppedRows) =
      if (maxHot == 0L) (distinctAssigned.withColumn("sub", lit(0)), 0L, 0L)
      else {
        // Bits start at ceil(log2(overload)) + 1 and ESCALATE (+2 per
        // round, to 12): ±1-weight hyperplane buckets are not uniform on
        // low-dimensional or correlated data, so a single computed width
        // can leave one bucket holding half the cluster — each escalation
        // is one cheap count job on the checkpointed assignment, and only
        // genuinely same-direction mass survives 12 bits (4096
        // sub-buckets) to reach the measured residual cap below.
        val spark = distinctAssigned.sparkSession
        import spark.implicits._
        val over = maxHot.toDouble / math.max(1, maxClusterSize)
        val dims = cents(0).length
        val hotIds = sizesArr.collect { case (c, n) if n > maxClusterSize => c }.toSeq
        val hotDf = hotIds.toDF("cluster").withColumn("__hot", lit(true))
        val withHot = distinctAssigned.join(broadcast(hotDf), Seq("cluster"), "left")
        def keyedWith(bits: Int) = withHot
          .withColumn("sub", when(col("__hot"),
            hyperplaneBucket(col("v"), dims, bits)).otherwise(lit(0)))
          .drop("__hot")
        def maxSubBucket(df: DataFrame): Long = df
          .groupBy(col("cluster"), col("sub")).count()
          .agg(max(col("count"))).head.getLong(0)
        var bits = math.min(12, math.max(1, math.ceil(math.log(over) / math.log(2)).toInt + 1))
        var keyed = keyedWith(bits)
        while (maxSubBucket(keyed) > maxClusterSize && bits < 12) {
          bits = math.min(12, bits + 2)
          keyed = keyedWith(bits)
        }
        // Residual cap with accounting (over-cap keys are <= n/cap — tiny;
        // broadcast anti-join, same shape as Dedup.capBuckets' primary path).
        val overCap = keyed.groupBy(col("cluster"), col("sub")).count()
          .filter(col("count") > maxClusterSize).localCheckpoint(false)
        val dropRow = overCap.agg(
          count(lit(1)), coalesce(sum(col("count")), lit(0L))).head
        val (nBuckets, nRows) = (dropRow.getLong(0), dropRow.getLong(1))
        if (nBuckets > 0) logWarning(
          s"semanticDedup: $nRows rows in $nBuckets near-identical-direction " +
            s"sub-buckets exceed maxClusterSize=$maxClusterSize even after exact collapse " +
            "and hyperplane sub-split — they skip pair generation (recall loss, measured)")
        (keyed.join(
          broadcast(overCap.select(col("cluster"), col("sub"))),
          Seq("cluster", "sub"), "left_anti"), nBuckets, nRows)
      }

    val l = capped.select(col("cluster"), col("sub"), col("id").as("id1"), col("v").as("v1"))
    val r = capped.select(col("cluster"), col("sub"), col("id").as("id2"), col("v").as("v2"))
    // !isnan: Spark orders NaN above every threshold, so an unguarded >=
    // would declare a corrupted (NaN/Inf-element) embedding a duplicate
    // of EVERYTHING it co-clusters with and fuse the cluster into one
    // component — undefined similarity is a non-match, never a match
    val pairs = l.join(r, Seq("cluster", "sub"))
      .filter(col("id1") < col("id2"))
      .withColumn("__cos", round(cosine(col("v1"), col("v2")), 6))
      .filter(!isnan(col("__cos")) && col("__cos") >= threshold)
      .select(col("id1"), col("id2"))
    val labels = Dedup.connectedComponentsMin(
      corpus.select(col(id).as("id")), pairs.unionAll(exactEdges))
      .select(col("id").as(id), col("rep"))
    SemanticDedupResult(labels, droppedBuckets, droppedRows)
  }
  /** Incremental SemDeDup: label an INCOMING slice against an existing
    * (already-deduped) corpus without ever re-pairing the existing corpus
    * with itself — the growing-corpus production shape, the semantic twin
    * of [[BloomJoin]]'s exact incremental dedup.
    *
    *   - Centroids fit on the EXISTING corpus only, so rep assignment of
    *     history is stable across increments (a new slice never
    *     re-clusters what previous runs already labeled).
    *   - Candidate pairs are (existing ∪ incoming) × incoming within a
    *     cluster: the existing×existing block — at steady state almost
    *     all of the quadratic work — is never generated.
    *   - Anchor priority: a duplicate component containing any existing
    *     id takes the MIN EXISTING id as rep (history is immutable;
    *     incoming rows prune toward the old corpus, never the reverse);
    *     an all-incoming component takes its min id, matching
    *     [[semanticDedupLabels]]. Transitive incoming chains reach their
    *     anchor through connected components over the (touched-existing ∪
    *     incoming) node set — O(duplicates), never O(existing corpus).
    *   - Skew: each side's over-cap clusters are dropped from pairing
    *     with a LOGGED row count (one ≤ k-row sizing collect per side) —
    *     the cap is [[Dedup.capBuckets]]'s refusal bound, not a knob.
    *
    * `existing` must be non-empty (bootstrap the first increment with
    * [[semanticDedupLabels]]); ids must be globally unique across both
    * frames. Returns `(id, rep)` for INCOMING ids only. */
  def semanticDedupIncrementalLabels(
      existing: DataFrame, incoming: DataFrame, id: String, vec: String,
      k: Int, threshold: Double, kmeansIters: Int = 3,
      maxClusterSize: Int = 100000): DataFrame = {
    graft.functions.NativeHashes.register(existing.sparkSession)
    val cents = kmeansFit(existing, vec, k, kmeansIters, idCol = id)
    // checkpoint the EXISTING side's assignment like newCk below (and like
    // the batch path): the fused sizing collect materializes it
    // once, and the pair stage then reads stored partitions instead of
    // re-scanning the (typically much larger) existing corpus and
    // re-running the nearest_cells argmax per row (r15)
    // NULL-embedding rows are excluded from clustering on BOTH sides (r16
    // review: a null cluster key NPE'd the sizing collect);
    // incoming null rows still receive a self-label through the full
    // `newIds` node frame below
    val oldCk = assignClusters(
      existing.select(col(id).as("id"), col(vec).as("v")).filter(col("v").isNotNull),
      cents, "v")
      .localCheckpoint(false)
    // CHECKPOINTED (r17, closing the r16 verdict's q_semantic_dedup_incr
    // watch item — pinned-commit A/B attributed a ~0.3 s regression to this
    // frame): `newIds` replaced the checkpointed newCk as the CC node set
    // when null-embedding rows were excluded from clustering (they must
    // still self-label), but the id subtree appears MULTIPLE times in the
    // final plan (cc feeds both the anchors aggregate and the outer
    // labeling join), and each occurrence re-executed the whole incoming
    // plan — scans and transforms — where the pre-r16 shape replayed
    // stored partitions. The frame is one id column of the incoming slice:
    // materializing it is strictly cheaper than re-deriving it even once.
    val newIds = incoming.select(col(id).as("id")).localCheckpoint(false)
    val newCk = assignClusters(
      incoming.select(col(id).as("id"), col(vec).as("v")).filter(col("v").isNotNull),
      cents, "v")
      .localCheckpoint(false)
    // FUSED sizing (r20, VERDICT r19 item 6): both sides' ≤ k-row cluster
    // sizes come from ONE driver job over the union of the two checkpoints
    // (which this action also materializes), instead of one sizing collect
    // per side — the family's wall is job latency, not task time.
    val sizesBoth: Array[(Boolean, Int, Long)] = oldCk
      .select(lit(true).as("__old"), col("cluster"))
      .unionAll(newCk.select(lit(false).as("__old"), col("cluster")))
      .groupBy(col("__old"), col("cluster")).count()
      .collect().map(r => (r.getBoolean(0), r.getInt(1), r.getLong(2)))
    val oldA = capClustersFromSizes(
      oldCk, sizesBoth.collect { case (true, c, n) => c -> n }, maxClusterSize, "existing")
    val newA = capClustersFromSizes(
      newCk, sizesBoth.collect { case (false, c, n) => c -> n }, maxClusterSize, "incoming")

    val l = oldA.withColumn("is_old", lit(true))
      .unionAll(newA.withColumn("is_old", lit(false)))
      .select(col("cluster"), col("id").as("id1"), col("v").as("v1"), col("is_old"))
    val r = newA.select(col("cluster"), col("id").as("id2"), col("v").as("v2"))
    // !isnan: same corrupted-embedding guard as the batch pair stage
    val pairs = l.join(r, Seq("cluster"))
      .filter(col("is_old") || col("id1") < col("id2"))
      .withColumn("__cos", round(cosine(col("v1"), col("v2")), 6))
      .filter(!isnan(col("__cos")) && col("__cos") >= threshold)
      .select(col("id1"), col("id2"), col("is_old"))
      .localCheckpoint(false)

    val oldTouched = pairs.filter(col("is_old")).select(col("id1").as("id")).distinct()
    val nodes = newIds.unionAll(oldTouched)
    val cc = Dedup.connectedComponentsMin(nodes, pairs.select(col("id1"), col("id2")))
    // anchor-priority fix-up: min EXISTING id per component, else min id
    val anchors = cc.join(oldTouched.withColumn("is_old", lit(true)), Seq("id"), "left")
      .groupBy(col("rep"))
      .agg(min(when(col("is_old"), col("id"))).as("old_min"))
    // no broadcast hint: anchors scales with the incoming slice, not the
    // corpus, but an increment can still be large — let AQE pick
    cc.join(anchors, Seq("rep"))
      .join(oldTouched.withColumn("is_old", lit(true)), Seq("id"), "left")
      .filter(col("is_old").isNull) // incoming rows only
      .select(col("id").as(id), coalesce(col("old_min"), col("rep")).as("rep"))
  }

  /** Over-cap-cluster refusal with accounting over pre-measured ≤ k-row
    * sizes (one fused sizing job for both sides — see the call sites),
    * then a broadcast anti-join against the hot cluster ids. Shared by the
    * incremental path (the batch path's richer three-layer defense lives
    * inline in [[semanticDedupLabelsWithStats]]). */
  private def capClustersFromSizes(
      df: DataFrame, sizes: Array[(Int, Long)],
      maxClusterSize: Int, side: String): DataFrame = {
    val hot = sizes.filter(_._2 > maxClusterSize)
    if (hot.isEmpty) df
    else {
      logWarning(s"semanticDedupIncremental: dropping ${hot.map(_._2).sum} $side rows " +
        s"in ${hot.length} over-cap clusters (> $maxClusterSize) from candidate pairing")
      val spark = df.sparkSession
      import spark.implicits._
      df.join(broadcast(hot.map(_._1).toSeq.toDF("cluster")), Seq("cluster"), "left_anti")
    }
  }
}

/** Labeling plus the hot-bucket drop accounting from
  * [[VectorOps.semanticDedupLabelsWithStats]]. */
final case class SemanticDedupResult(
    labels: DataFrame, droppedBuckets: Long, droppedRows: Long)
