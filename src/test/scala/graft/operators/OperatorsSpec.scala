package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.sources.Tables

/** Behavioral spec for the LLM-pipeline operators: planted-duplicate recall
  * for the dedup family, recall-vs-baseline for ANN, and decode-stub
  * semantics for multimodal columns. Runs on sf0.001 (500 docs / 500 vecs). */
class OperatorsSpec extends AnyFunSuite with BeforeAndAfterAll {

  val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-operators-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  def docs = Tables.table(spark, dir, "documents").select(col("doc_id"), col("text"))

  /** 50 exact copies planted at id+100000. */
  def withExactDups = docs.unionAll(
    docs.filter(col("doc_id") < 50)
      .select((col("doc_id") + 100000).as("doc_id"), col("text")))

  test("exact dedup recovers every planted duplicate") {
    val deduped = Dedup.exact(withExactDups, TextOps.fingerprint(col("text")), col("doc_id"))
    val dupGroups = deduped.filter(col("n_copies") >= 2).collect()
    assert(dupGroups.length == 50)
    assert(dupGroups.forall(_.getAs[Long]("keep_id") < 50)) // representative = original
  }

  test("minhash+LSH candidates include all identical pairs (J=1 ⇒ every band matches)") {
    val cands = Dedup.minhashCandidates(withExactDups, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 50L).map(i => (i, i + 100000)).toSet
    assert(planted.subsetOf(cands), s"missing: ${planted.diff(cands).take(5)}")
  }

  test("minhash signature Jaccard estimate: 1.0 for identical docs, sane for mutated") {
    graft.functions.NativeHashes.register(spark)
    val near = docs.filter(col("doc_id") < 30).unionAll(
      docs.filter(col("doc_id") < 30)
        .select((col("doc_id") + 500000).as("doc_id"),
          regexp_replace(col("text"), "\\bthe\\b", "thee").as("text")))
    val sigs = near.select(col("doc_id"),
      Dedup.minhashSignature(array_distinct(TextOps.shingles(col("text"))), 64).as("sig"))
    val joined = sigs.as("a")
      .join(sigs.as("b"), col("b.doc_id") === col("a.doc_id") + 500000)
      .select(col("a.doc_id").as("id"),
        Dedup.estimatedJaccard(col("a.sig"), col("b.sig")).as("est"))
    val toks = near.select(col("doc_id"), array_distinct(TextOps.shingles(col("text"))).as("shs"))
    val exact = joined.join(toks.withColumnRenamed("doc_id", "id"), "id")
      .join(toks.select((col("doc_id") - 500000).as("id"), col("shs").as("shs2")), "id")
      .select(col("id"), col("est"),
        (size(array_intersect(col("shs"), col("shs2"))).cast("double") /
          size(array_union(col("shs"), col("shs2")))).as("true_j"))
      .collect()
    for (r <- exact) {
      val (est, truth) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(est - truth) < 0.35, s"doc ${r.getLong(0)}: est=$est true=$truth")
    }
    // unmutated docs: identical signatures ⇒ estimate exactly 1
    val self = sigs.as("a").join(sigs.as("b"), col("a.doc_id") === col("b.doc_id"))
      .select(Dedup.estimatedJaccard(col("a.sig"), col("b.sig")).as("e")).collect()
    assert(self.forall(_.getDouble(0) == 1.0))
  }

  test("simhash pairs find identical docs at hamming 0") {
    val pairs = Dedup.simhashPairs(withExactDups, col("doc_id"), col("text"), maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 50L).map(i => (i, i + 100000)).toSet
    assert(planted.subsetOf(pairs), s"missing: ${planted.diff(pairs).take(5)}")
  }

  test("ngram jaccard finds mutated near-dups with correct score") {
    val near = docs.unionAll(
      docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 200000).as("doc_id"),
          regexp_replace(col("text"), "\\bthe\\b", "thee").as("text")))
    val pairs = Dedup.ngramJaccardPairs(near, col("doc_id"), col("text"), threshold = 0.3)
      .collect()
    val plantedFound = pairs.count(r => r.getLong(1) - r.getLong(0) == 200000)
    assert(plantedFound >= 15, s"only $plantedFound/20 mutated pairs above 0.3")
    assert(pairs.forall(r => r.getAs[Double]("jaccard") <= 1.0))
  }

  test("removeDuplicates: cluster-aware cleaning keeps exactly one representative") {
    // base ∪ exact copies (0-49 → +100000) ∪ copies-of-copies (0-19 → +300000)
    // forms chains {i, i+100000, i+300000}: representatives must be the originals
    val chained = withExactDups.unionAll(
      docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 300000).as("doc_id"), col("text")))
    // full pipeline: LSH candidates → exact-Jaccard verify → clean.
    // (unverified band collisions between distinct docs must NOT drop rows)
    val cands = Dedup.minhashCandidates(chained, col("doc_id"), col("text"))
    val toks = chained.select(col("doc_id"),
      array_distinct(TextOps.shingles(col("text"))).as("shs"))
    val pairs = cands
      .join(toks.select(col("doc_id").as("id1"), col("shs").as("sh1")), "id1")
      .join(toks.select(col("doc_id").as("id2"), col("shs").as("sh2")), "id2")
      .filter(size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
        size(array_union(col("sh1"), col("sh2"))) >= 0.9)
      .select(col("id1"), col("id2"))
    val cleaned = Dedup.removeDuplicates(chained, col("doc_id"), pairs)
    val keptIds = cleaned.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // planted copies always have a smaller-id original in their component
    assert((0L until 50L).forall(i => !keptIds.contains(i + 100000)), "copies must be dropped")
    assert((0L until 20L).forall(i => !keptIds.contains(i + 300000)), "chained copies must be dropped")
    assert(keptIds.contains(0L), "global min id must survive")
    // representatives are component minima ⇒ no two kept docs may be paired
    // (the corpus also has natural short-doc near-dups — that's real dedup work)
    val pairSet = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!pairSet.exists(p => keptIds.contains(p._1) && keptIds.contains(p._2)),
      "no duplicate pair may survive cleaning")
    assert(keptIds.size < 570 && keptIds.size > 400, s"implausible kept count ${keptIds.size}")
  }

  test("star-contraction CC: 1000-node chain folds in ≤ 12 rounds (min-label needs 999)") {
    import spark.implicits._
    val ids = (0L until 1000L).toDF("id")
    val pairs = (0L until 999L).map(i => (i, i + 1)).toDF("id1", "id2")
    // maxIter IS the round bound: connectedComponentsStar throws when it
    // does not reach the fixpoint within it. driverEdgeMax = 0 forces the
    // DISTRIBUTED contraction — the O(log n) round bound is what's under
    // test, and the default would absorb this chain into the driver host
    val labels = Dedup
      .connectedComponentsStar(ids, pairs, maxIter = 12, driverEdgeMax = 0L).collect()
    assert(labels.length == 1000)
    assert(labels.forall(_.getLong(1) == 0L), "every chain node must label to the minimum")
  }

  test("star-contraction CC ≡ min-label propagation on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 120 + trial * 40
      val ids = (0L until n.toLong).toDF("id")
      val pairs = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2).toDF("id1", "id2")
      // all FOUR hosts must agree: both operators, both driver/distributed
      val star = Dedup.connectedComponentsStar(ids, pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val starDist = Dedup.connectedComponentsStar(ids, pairs, driverEdgeMax = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val minLabel = Dedup.connectedComponentsMin(ids, pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val minDist = Dedup.connectedComponentsMin(ids, pairs, driverEdgeMax = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(star == minLabel && star == starDist && minLabel == minDist,
        s"trial $trial: hosts disagree")
    }
  }

  test("min-label CC: driver fast path matches the distributed host, incl. foreign endpoints") {
    import spark.implicits._
    // Edge (1,5),(5,3) where 5 is NOT in ids: the distributed fixpoint
    // cannot propagate through an unlabeled node, so 1 and 3 must stay
    // separate components — the driver union-find's membership filter has
    // to reproduce exactly that, not naive whole-edge-list connectivity.
    val ids = Seq(1L, 3L, 9L).toDF("id")
    val pairs = Seq((1L, 5L), (5L, 3L), (9L, 9L)).toDF("id1", "id2")
    val viaDriver = Dedup.connectedComponentsMin(ids, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaDist = Dedup.connectedComponentsMin(ids, pairs, driverEdgeMax = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaDriver == Map(1L -> 1L, 3L -> 3L, 9L -> 9L), s"driver: $viaDriver")
    assert(viaDriver == viaDist, s"hosts disagree: driver=$viaDriver dist=$viaDist")
    // probe-miss fallback: a threshold below the edge count must route to
    // the distributed loop and still produce the identical labeling
    val linked = Seq((1L, 3L), (3L, 9L)).toDF("id1", "id2")
    val fb = Dedup.connectedComponentsMin(ids, linked, driverEdgeMax = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fb == Map(1L -> 1L, 3L -> 1L, 9L -> 1L), s"fallback: $fb")
  }

  test("min-label CC probe miss: pair generation runs once, not once per union leg") {
    import spark.implicits._
    // The fallback's reversed-edge leg must read the lazily-checkpointed
    // pairs frame, not the raw pair-generation plan (the r13 verdict's one
    // found defect: `unionAll(pairs...)` re-ran the expensive LSH/shingle
    // plan a second time on exactly the at-scale probe-miss path). An
    // accumulator on a SINGLE-partition source RDD counts row computations
    // deterministically: the probe materializes the partition into the
    // checkpoint cache (one pass over the 4 rows), and both union legs must
    // then read the cached block — a re-derived reversed leg recomputes the
    // source from scratch, doubling the count to exactly 2×rows.
    val acc = spark.sparkContext.longAccumulator("cc-pairgen-rows")
    val srcRows = Seq((1L, 3L), (3L, 9L), (9L, 11L), (11L, 13L))
    val pairs = spark.sparkContext.parallelize(srcRows, 1)
      .map { p => acc.add(1); p }.toDF("id1", "id2")
    val ids = Seq(1L, 3L, 9L, 11L, 13L).toDF("id")
    val labels = Dedup.connectedComponentsMin(ids, pairs, driverEdgeMax = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels == Map(1L -> 1L, 3L -> 1L, 9L -> 1L, 11L -> 1L, 13L -> 1L),
      s"probe-miss labels: $labels")
    assert(acc.value < 2L * srcRows.length,
      s"pair-gen rows computed ${acc.value} times for ${srcRows.length} source rows — " +
        "a union leg is re-deriving the pair plan instead of reading the checkpoint")
  }

  test("star CC: foreign endpoints bridge components (unlike min-label); hosts agree") {
    import spark.implicits._
    // Star contracts over the RAW edge node set before `ids` is consulted,
    // so 1-5-3 links 1 and 3 even though 5 has no ids row — the documented
    // semantic difference from min-label (whose labels can only propagate
    // through labeled nodes). The driver union-find host must replicate
    // star's rule (no membership filter), and both hosts must agree.
    val ids = Seq(1L, 3L, 9L).toDF("id")
    val pairs = Seq((1L, 5L), (5L, 3L)).toDF("id1", "id2")
    val viaDriver = Dedup.connectedComponentsStar(ids, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaDist = Dedup.connectedComponentsStar(ids, pairs, driverEdgeMax = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaDriver == Map(1L -> 1L, 3L -> 1L, 9L -> 9L), s"driver: $viaDriver")
    assert(viaDriver == viaDist, s"hosts disagree: driver=$viaDriver dist=$viaDist")
  }

  test("star-contraction CC: empty pairs and self-loop-only pairs are all singletons") {
    import spark.implicits._
    val ids = (0L until 10L).toDF("id")
    val empty = Seq.empty[(Long, Long)].toDF("id1", "id2")
    val selfOnly = Seq((3L, 3L), (7L, 7L)).toDF("id1", "id2")
    for (pairs <- Seq(empty, selfOnly)) {
      val labels = Dedup.connectedComponentsStar(ids, pairs).collect()
      assert(labels.length == 10 && labels.forall(r => r.getLong(0) == r.getLong(1)))
    }
  }

  test("brute-force ANN: each query's own vector ranks first with cosine 1") {
    val emb = Tables.table(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val top = VectorOps.bruteForceTopK(emb, queries, k = 10).collect()
    for (q <- 0L until 5L) {
      val first = top.filter(r => r.getAs[Long]("query_id") == q && r.getAs[Int]("rnk") == 1).head
      assert(first.getAs[Long]("vec_id") == q)
      assert(first.getAs[Double]("cos") == 1.0)
    }
    assert(top.length == 50)
  }

  test("native hyperplane_bucket ≡ composable HOF formula (bucket ids preserved)") {
    graft.functions.NativeHashes.register(spark)
    val emb = Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).limit(200)
    // the retired HOF implementation, reconstructed verbatim as the oracle
    def planeWeights(dims: Int, bits: Int): Array[Array[Double]] =
      Array.tabulate(bits, dims) { (b, d) =>
        val seed = b.toLong * 1000003L + d.toLong * 7919L
        val x = seed * 6364136223846793005L + 1442695040888963407L
        if (x < 0) -1.0 else 1.0
      }
    val hof = planeWeights(64, 8).zipWithIndex.map { case (plane, b) =>
      val proj = aggregate(
        zip_with(col("embedding"), typedLit(plane.toSeq), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)
    val diff = emb.select(
      VectorOps.hyperplaneBucket(col("embedding"), 64, 8).as("native"), hof.as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0, s"$diff rows bucketed differently from the HOF formula")
  }

  test("native nearest_cells ≡ struct-sort HOF ordering (ties → larger cell, nulls last)") {
    graft.functions.NativeHashes.register(spark)
    import spark.implicits._
    // hand-built cases: clear winner, exact tie (duplicated centroid),
    // zero centroid (NULL cosine) and a zero vector (all-NULL cosines)
    val cents: Array[Seq[Float]] = Array(
      Seq(1f, 0f, 0f), Seq(0f, 1f, 0f), Seq(0f, 1f, 0f), Seq(0f, 0f, 0f))
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f)),   // cell 0 wins
      (1L, Seq(0f, 5f, 0f)),   // tie between cells 1 and 2 → larger id (2) first
      (2L, Seq(0f, 0f, 1f)),   // all real cosines 0, tie across 0,1,2 → 2 first
      (3L, Seq(0f, 0f, 0f)),   // zero vector: every cosine NULL → cells by id desc
    ).toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
    val hofOrder = {
      val scores = array(cents.zipWithIndex.map { case (c, i) =>
        struct(VectorOps.cosine(col("v"), typedLit(c)).as("cos"), lit(i).as("cell"))
      }: _*)
      transform(slice(reverse(array_sort(scores)), 1, 3), s => s.getField("cell"))
    }
    val rows = vecs.select(col("id"),
      call_function("nearest_cells", col("v"), typedLit(cents.toSeq), lit(3)).as("native"),
      hofOrder.as("hof"))
      .orderBy("id").collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"id ${r.getLong(0)}: native ${r.getSeq[Int](1)} vs hof ${r.getSeq[Int](2)}")
    }
    // argmax entry point agrees with the full ranking's head
    val top = vecs.select(col("id"),
      VectorOps.nearestCentroid(col("v"), cents).as("cl")).orderBy("id").collect()
    assert(top.map(_.getInt(1)).toSeq == rows.map(_.getSeq[Int](1).head).toSeq)
  }

  test("LSH ANN: self-match always found; recall vs brute force is reported") {
    val emb = Tables.table(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val brute = VectorOps.bruteForceTopK(emb, queries, k = 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val lsh = VectorOps.lshTopK(emb, queries, k = 10, dims = 64, bits = 8)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    for (q <- 0L until 5L) assert(lsh.contains((q, q)), s"query $q lost its own vector")
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    info(f"LSH recall@10 vs brute force: $recall%.2f (bucketed search trades recall for speed)")
    assert(recall > 0.0)
  }

  test("IVF ANN: self-match always found; recall vs brute force is reported") {
    val emb = Tables.table(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val brute = VectorOps.bruteForceTopK(emb, queries, k = 10)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val ivf = VectorOps.ivfTopK(emb, queries, k = 10, nCells = 16, nProbe = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    // a query vector is assigned to its own best cell, which is always probed
    for (q <- 0L until 5L) assert(ivf.contains((q, q)), s"query $q lost its own vector")
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    info(f"IVF recall@10 vs brute force (4/16 cells probed): $recall%.2f")
    // k-means centroids + 4-way closure assignment; uniform random vectors
    // are the worst case for IVF, so this bound is conservative for real
    // (clustered) embedding corpora
    assert(recall >= 0.95, f"IVF recall@10 regressed: $recall%.2f < 0.95")
  }

  test("multimodal decode stub: features are a normalized 16-bin histogram") {
    val mm = Multimodal.asMultimodal(Tables.table(spark, dir, "documents"))
    val feats = Multimodal.decodeFeatures(mm).select(col("doc_id"), col("features")).collect()
    assert(feats.length == 500)
    for (r <- feats.take(20)) {
      val v = r.getSeq[Float](1)
      assert(v.length == Multimodal.FeatureBins)
      assert(math.abs(v.sum - 1.0f) < 1e-3, s"doc ${r.getLong(0)}: histogram sum ${v.sum}")
    }
  }

  test("multimodal transforms: frame-sample count and resize length are exact") {
    val mm = Multimodal.asMultimodal(Tables.table(spark, dir, "documents"))
    val out = mm.select(
      col("doc_id"),
      length(col("payload")).as("len"),
      size(Multimodal.frameSample(col("payload"), 4)).as("n_frames"),
      length(Multimodal.resize(col("payload"), 64)).as("resized_len")).collect()
    for (r <- out) {
      val len = r.getAs[Int]("len")
      assert(r.getAs[Int]("n_frames") == math.max((len + 3) / 4, 1))
      assert(r.getAs[Int]("resized_len") == 64)
    }
  }

  test("multimodal decode: real PNG decoded via javax.imageio; non-image falls back to stub") {
    import java.awt.image.BufferedImage
    // 8×8 checkerboard: half the pixels pure white (luma bin 15), half pure
    // black (bin 0) — an exactly predictable luminance histogram
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 8; y <- 0 until 8)
      img.setRGB(x, y, if ((x + y) % 2 == 0) 0xFFFFFF else 0x000000)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray

    import spark.implicits._
    val mm = Seq((1L, png), (2L, "not an image".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val out = Multimodal.decodeFeatures(mm, tryImageCodec = true)
      .select(col("doc_id"), col("features")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val f1 = out(1L)
    assert(math.abs(f1(0) - 0.5f) < 1e-3, s"black bin: ${f1(0)}")
    assert(math.abs(f1(15) - 0.5f) < 1e-3, s"white bin: ${f1(15)}")
    assert(math.abs(f1.sum - 1.0f) < 1e-3)
    val f2 = out(2L)
    assert(f2.toArray.sameElements(Multimodal.byteHistogram("not an image".getBytes("UTF-8"))),
      "non-image payload must fall back to the byte-histogram stub")
  }

  test("asofBackward: latest at-or-before match per key, left-outer, tie-inclusive") {
    import spark.implicits._
    val left = Seq((1L, 1L, "a"), (1L, 5L, "b"), (1L, 10L, "c"), (2L, 3L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 2L, 100.0), (1L, 5L, 200.0), (1L, 7L, 300.0), (3L, 1L, 999.0))
      .toDF("k", "rt", "price")
    val out = TemporalJoins.asofBackward(left, right, "k", "t", "rt")
      .orderBy("k", "t")
      .collect()
      .map(r => (r.getAs[String]("tag"),
        if (r.isNullAt(r.fieldIndex("price"))) None else Some(r.getAs[Double]("price"))))
      .toSeq
    assert(out == Seq(
      ("a", None),         // t=1: no right row yet
      ("b", Some(200.0)),  // t=5: tie with rt=5 is inclusive
      ("c", Some(300.0)),  // t=10: rt=7 is latest
      ("d", None)))        // k=2: key has no right rows at all
  }

  test("temporal joins match their naive formulations on random data (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // --- range join vs naive inequality join ---
    val li = Seq.fill(200) {
      val s = rnd.nextInt(100); (rnd.nextInt(5).toLong, s, s + rnd.nextInt(20), rnd.nextInt(1000))
    }.toDF("k", "ls", "le", "lid")
    val ri = Seq.fill(200) {
      val s = rnd.nextInt(100); (rnd.nextInt(5).toLong, s, s + rnd.nextInt(20), rnd.nextInt(1000))
    }.toDF("k", "rs", "re", "rid")
    // multiset compare — duplicate input rows must yield duplicate join rows
    def multiset(rows: Array[org.apache.spark.sql.Row]): Map[(Long, Int, Int), Int] =
      rows.map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
    val naive = multiset(li.join(ri, li("k") === ri("k") &&
        col("ls") <= col("re") && col("rs") <= col("le"))
      .select(li("k"), col("lid"), col("rid")).collect())
    val binned = multiset(
      TemporalJoins.rangeOverlapJoin(li, ri, "k", "ls", "le", "rs", "re", binWidth = 7)
        .select(col("k"), col("lid"), col("rid")).collect())
    assert(binned == naive,
      s"missing=${(naive.toSet -- binned.toSet).take(5)} extra=${(binned.toSet -- naive.toSet).take(5)}")

    // --- as-of join vs naive latest-at-or-before aggregation ---
    val la = Seq.fill(150)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(1000)))
      .toDF("k", "t", "lid").distinct()
    val ra = Seq.fill(80)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, rnd.nextDouble()))
      .toDF("k", "rt", "price")
      .groupBy("k", "rt").agg(max("price").as("price")) // unique per (k, rt)
    val naiveAsof = la.as("l").join(ra.as("r"),
        col("l.k") === col("r.k") && col("r.rt") <= col("l.t"), "left")
      .groupBy(col("l.k").as("k"), col("l.t").as("t"), col("l.lid").as("lid"))
      .agg(max_by(struct(col("r.rt"), col("r.price")), col("r.rt")).as("m"))
      .select(col("k"), col("t"), col("lid"), col("m.rt"), col("m.price"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        Option(r.get(3)), Option(r.get(4)))).toSet
    val fast = TemporalJoins.asofBackward(la, ra, "k", "t", "rt")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("t"), r.getAs[Int]("lid"),
        Option(r.get(r.fieldIndex("rt"))), Option(r.get(r.fieldIndex("price"))))).toSet
    assert(fast == naiveAsof,
      s"missing=${(naiveAsof -- fast).take(5)} extra=${(fast -- naiveAsof).take(5)}")
  }

  test("asofBackward: segmented carry matches single-level on a hot key with boundary ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // One key owns 90% of the rows; timestamps cluster on segment-boundary
    // multiples so rows tie EXACTLY on the bin edges of targetSegments=4
    // (span 0..1200 → edges at 300/600/900) — the carry hand-off and the
    // side-0-before-side-1 tie rule both get exercised at the edges.
    def ts(i: Int): Long = if (i % 3 == 0) (rnd.nextInt(5) * 300).toLong else rnd.nextInt(1200).toLong
    val la = ((0 until 900).map(i => (1L, ts(i), i)) ++
      (900 until 1000).map(i => ((i % 7 + 2).toLong, ts(i), i)))
      .toDF("k", "t", "lid").distinct()
    val ra = (0 until 300).map(i => (if (i < 270) 1L else (i % 7 + 2).toLong, ts(i + 41), i.toDouble))
      .toDF("k", "rt", "price").groupBy("k", "rt").agg(max("price").as("price"))
    def runWith(segments: Int): Set[(Long, Long, Int, Option[Any], Option[Any])] =
      TemporalJoins.asofBackward(la, ra, "k", "t", "rt", targetSegments = segments,
          smallInputRows = 0L)
        .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("t"), r.getAs[Int]("lid"),
          Option(r.get(r.fieldIndex("rt"))), Option(r.get(r.fieldIndex("price"))))).toSet
    val single = runWith(1) // plain per-key window (reference semantics)
    val segmented = runWith(4)
    assert(segmented == single,
      s"missing=${(single -- segmented).take(5)} extra=${(segmented -- single).take(5)}")
    // and the segmented plan must not sort the hot key in one partition:
    // the main window's partition spec carries both __k and __seg
    val plan = TemporalJoins.asofBackward(la, ra, "k", "t", "rt", smallInputRows = 0L)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__seg"), "segmented path must be the plan above the gate")
    // below the small-input gate the default skips segmentation entirely:
    // no extra jobs, no carry join, just the per-key window
    val gated = TemporalJoins.asofBackward(la, ra, "k", "t", "rt")
      .queryExecution.optimizedPlan.toString
    assert(!gated.contains("__seg"),
      "small inputs must take the single-level window, not pay the carry pass")
  }

  test("multimodal audio: real PCM WAV decoded (rate/frames/duration/RMS); non-WAV is NULL") {
    // Synthesize a 0.5 s, 8 kHz mono 16-bit sine WAV in-memory: a full-swing
    // sine has RMS = 1/sqrt(2), exactly predictable.
    val rate = 8000
    val n = rate / 2
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(n * 2)
    for (i <- 0 until n)
      bb.putShort((math.sin(2 * math.Pi * 440 * i / rate) * 32767).toShort)
    val wav = bb.array()

    import spark.implicits._
    val mm = Seq((1L, wav), (2L, "not audio".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val out = Multimodal.wavFeatures(mm).select(col("doc_id"), col("audio")).collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    val a = out(1L).get
    assert(a.getAs[Int]("sample_rate") == rate)
    assert(a.getAs[Int]("channels") == 1)
    assert(a.getAs[Int]("n_frames") == n)
    assert(math.abs(a.getAs[Double]("duration_sec") - 0.5) < 1e-9)
    assert(math.abs(a.getAs[Double]("rms") - 1.0 / math.sqrt(2)) < 0.01,
      s"sine RMS should be ~0.707, got ${a.getAs[Double]("rms")}")
    assert(out(2L).isEmpty, "non-WAV payload must decode to NULL")
  }

  test("multimodal audio: malformed WAV payloads decode to NULL, never hang or crash") {
    import spark.implicits._
    def riffWave(len: Int): java.nio.ByteBuffer = {
      val bb = java.nio.ByteBuffer.allocate(len).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(len - 8).put("WAVE".getBytes("US-ASCII"))
    }
    // chunk size with the high bit set: as a signed Int it is -8, which once
    // made `pos += 8 + size + (size & 1)` advance by 0 — an infinite loop
    val highBit = riffWave(60)
    highBit.put("JUNK".getBytes("US-ASCII")).putInt(0xfffffff8)
    // fmt chunk declared but its 16-byte body runs past the payload end
    // (old code read bits-per-sample at pos+22 → AIOOBE)
    val truncatedFmt = riffWave(44)
    truncatedFmt.put("JUNK".getBytes("US-ASCII")).putInt(4).putInt(0)
    truncatedFmt.put("fmt ".getBytes("US-ASCII")).putInt(16)
    // chunk size larger than the whole payload
    val oversize = riffWave(48)
    oversize.put("data".getBytes("US-ASCII")).putInt(1 << 30)

    for ((name, bytes) <- Seq("highBit" -> highBit, "truncatedFmt" -> truncatedFmt,
        "oversize" -> oversize).map { case (n, bb) => (n, bb.array()) }) {
      assert(Multimodal.parseWav(bytes).isEmpty, s"$name must parse to None")
      val out = Multimodal.wavFeatures(Seq((1L, bytes)).toDF("doc_id", "payload"))
        .select(col("audio")).collect()
      assert(out.length == 1 && out(0).isNullAt(0), s"$name must reach NULL through wavFeatures")
    }
  }

  test("changelog snapshot: latest-per-key, retractions and correct-from kill the key") {
    import spark.implicits._
    // key A: append→correct pair → live with corrected value
    // key B: append→retract → gone
    // key C: append only → live
    // key D: retract→append (out-of-order op history; latest wins) → live
    val ledger = Seq(
      (1L, "A", 10.0, 0), (2L, "A", 11.0, 2), (3L, "A", 12.0, 3),
      (4L, "B", 20.0, 0), (5L, "B", 20.0, 1),
      (6L, "C", 30.0, 0),
      (7L, "D", 40.0, 1), (8L, "D", 41.0, 0),
    ).toDF("offset", "k", "v", "op")
    val snap = Changelog.snapshot(ledger, Seq("k"), versionCol = "offset", opCol = "op")
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Double]("v")).toMap
    assert(snap == Map("A" -> 12.0, "C" -> 30.0, "D" -> 41.0))

    val stats = Changelog.historyStats(ledger, Seq("k"), "offset", "op")
      .collect().map(r => r.getAs[String]("k") ->
        ((r.getAs[Long]("n_versions"), r.getAs[Boolean]("is_live")))).toMap
    assert(stats == Map("A" -> ((3L, true)), "B" -> ((2L, false)),
      "C" -> ((1L, true)), "D" -> ((2L, true))))
  }

  test("bloom semi-reduce: no false negatives, real pruning, join result unchanged") {
    import spark.implicits._
    val big = spark.range(0, 100000).select(col("id").as("k"), (col("id") * 2).as("payload"))
      .repartition(4)
    val small = spark.range(0, 100000, 97).select(col("id").as("sk")) // ~1031 keys
    val bloom = BloomJoin.keyBloom(small, "sk", fpp = 0.01)

    val kept = BloomJoin.semiReduce(big, col("k"), bloom)
    // no false negatives: every true join key survives the probe
    assert(kept.filter(col("k") % 97 === 0).count() == small.count())
    // real pruning: ~1% fpp over ~99k non-keys ⇒ kept well under 5% of big
    val keptN = kept.count()
    assert(keptN < 5000, s"bloom kept $keptN of 100000 — not pruning")
    // end-to-end result identical to the plain join (fp rows die in the join)
    val viaBloom = BloomJoin.bloomReducedJoin(big, small, "k", "sk")
      .select(col("k"), col("payload")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = big.join(small, col("k") === col("sk"))
      .select(col("k"), col("payload")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaBloom == plain)
  }

  test("bloom anti-join: bit-identical to plain anti-join, fast path skips the shuffle") {
    import spark.implicits._
    // incoming batch: 100k rows; corpus: every-97th key → ~1% of the batch
    // is "already seen" and must be dropped
    val batch = spark.range(0, 100000).select(col("id").as("k"), (col("id") * 3).as("payload"))
      .repartition(4)
    val corpus = spark.range(0, 100000, 97).select(col("id").as("ck"))
    val viaBloom = BloomJoin.bloomAntiJoin(
      batch, corpus,
      bigKey = col("k"), smallKey = col("ck"),
      condition = col("k") === col("ck"))
      .select(col("k"), col("payload")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = batch.join(corpus, col("k") === col("ck"), "left_anti")
      .select(col("k"), col("payload")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaBloom == plain)
    assert(viaBloom.size == 100000 - corpus.count())
    // the fast path carries the work: only maybe-seen rows (true keys + ~1%
    // false positives) reach the real anti-join
    val bloom = BloomJoin.keyBloom(corpus.select(col("ck").as("k")), "k", 0.01)
    val maybeSeen = BloomJoin.semiReduce(batch, col("k"), bloom).count()
    assert(maybeSeen < 5000, s"$maybeSeen of 100000 routed to the anti-join — bloom not pruning")
  }

  test("distributed k-means: planted orthogonal clusters recovered with full purity") {
    import spark.implicits._
    // 300 vectors in 3 well-separated clusters: dominant direction d = 2*c,
    // deterministic jitter on the remaining dims
    val vecs = spark.range(0, 300).select(
      col("id").as("vec_id"),
      (col("id") % 3).cast("int").as("truth"),
      transform(sequence(lit(0), lit(7)), d =>
        (when(d === (col("id") % 3).cast("int") * 2, 10.0).otherwise(0.0)
          + (pmod(xxhash64(col("id"), d), lit(100)).cast("double") / 100.0))
          .cast("float")).as("embedding"))
    val cents = VectorOps.kmeansFit(vecs, "embedding", k = 3, iters = 3)
    assert(cents.length == 3)
    val labeled = VectorOps.assignClusters(vecs, cents, "embedding")
      .select(col("truth"), col("cluster")).collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    // purity: every truth class maps to exactly one cluster and vice versa
    val byTruth = labeled.groupBy(_._1).map { case (t, rs) =>
      t -> rs.map(_._2).groupBy(identity).maxBy(_._2.length)._1
    }
    assert(byTruth.values.toSet.size == 3, s"clusters collapsed: $byTruth")
    val pure = labeled.count { case (t, c) => byTruth(t) == c }
    assert(pure == 300, s"only $pure/300 vectors in their class's cluster")
  }

  test("semantic dedup: planted scale-copies pruned to min-id reps, chains close via CC") {
    // 3-orthogonal-cluster corpus (k-means-test shape, but jitter amplitude
    // 3 so natural same-cluster cosines stay ~0.96, clear of the 0.999
    // threshold), plus: a half-scale copy of every vec_id < 30 (cosine
    // exactly 1 with its original) and a quarter-scale SECOND copy of
    // vec_id < 10 — those form 3-member chains the CC must collapse to ONE
    // representative
    val base = spark.range(0, 300).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)), d =>
        (when(d === (col("id") % 3).cast("int") * 2, 10.0).otherwise(0.0)
          + (pmod(xxhash64(col("id"), d), lit(300)).cast("double") / 100.0))
          .cast("float")).as("embedding"))
    def scaled(off: Long, n: Long, f: Float) = base.filter(col("vec_id") < n)
      .select((col("vec_id") + off).as("vec_id"),
        transform(col("embedding"), x => x * lit(f)).as("embedding"))
    val corpus = base
      .unionAll(scaled(1000, 30, 0.5f))
      .unionAll(scaled(2000, 10, 0.25f))
    val labels = VectorOps.semanticDedupLabels(
      corpus, "vec_id", "embedding", k = 3, threshold = 0.999).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 340)
    // every copy maps to its original; chains (orig, +1000, +2000) collapse
    (0L until 30L).foreach(i => assert(labels(1000 + i) == i, s"copy of $i"))
    (0L until 10L).foreach(i => assert(labels(2000 + i) == i, s"2nd copy of $i"))
    // everything else is its own representative
    assert(labels.count { case (id, rep) => id == rep } == 300)
  }

  test("incremental semantic dedup: anchors to existing ids, new-only components keep min new id") {
    // existing corpus = the 3-orthogonal-cluster shape; incoming slice:
    //   a (+1000, <20): half-scale copies of existing    -> prune to old id
    //   b (+2000, <10): quarter-scale copies of the SAME -> transitive chain,
    //      must anchor to the old id (not to a's smaller new id)
    //   c (+3000, <5): REVERSED vectors — new directions -> kept
    //   d (+4000, <5): half-scale of the reversed        -> all-incoming
    //      component, rep = min NEW id (the c member)
    val base = spark.range(0, 300).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)), d =>
        (when(d === (col("id") % 3).cast("int") * 2, 10.0).otherwise(0.0)
          + (pmod(xxhash64(col("id"), d), lit(300)).cast("double") / 100.0))
          .cast("float")).as("embedding"))
    def scaled(off: Long, n: Long, f: Float) = base.filter(col("vec_id") < n)
      .select((col("vec_id") + off).as("vec_id"),
        transform(col("embedding"), x => x * lit(f)).as("embedding"))
    def reversedScaled(off: Long, n: Long, f: Float) = base.filter(col("vec_id") < n)
      .select((col("vec_id") + off).as("vec_id"),
        transform(reverse(col("embedding")), x => x * lit(f)).as("embedding"))
    val incoming = scaled(1000, 20, 0.5f)
      .unionAll(scaled(2000, 10, 0.25f))
      .unionAll(reversedScaled(3000, 5, 1.0f))
      .unionAll(reversedScaled(4000, 5, 0.5f))
    val labels = VectorOps.semanticDedupIncrementalLabels(
      base, incoming, "vec_id", "embedding", k = 3, threshold = 0.999)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 40)
    (0L until 20L).foreach(i => assert(labels(1000 + i) == i, s"copy of $i"))
    (0L until 10L).foreach(i => assert(labels(2000 + i) == i, s"chained copy of $i"))
    (0L until 5L).foreach(i => assert(labels(3000 + i) == 3000 + i, s"new direction $i"))
    (0L until 5L).foreach(i => assert(labels(4000 + i) == 3000 + i, s"new-only dup of $i"))
  }

  test("semantic dedup: identical-embedding blob collapses exactly, nothing dropped") {
    // 2000 copies of ONE embedding (the degenerate no direction-based
    // split can separate) + 100 normal vectors, cap far below the blob.
    // The exact pre-collapse must reduce the blob to one delegate + star
    // edges: every member labeled with the min id, zero rows dropped, and
    // no O(blob²) pair block anywhere.
    val blobVec = typedLit((0 until 8).map(d => (d + 1).toFloat))
    val blob = spark.range(0, 2000).select(col("id").as("vec_id"), blobVec.as("embedding"))
    val normal = spark.range(10000, 10100).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)), d =>
        (pmod(xxhash64(col("id"), d), lit(1000)).cast("double") / 100.0 + 0.1)
          .cast("float")).as("embedding"))
    val res = VectorOps.semanticDedupLabelsWithStats(
      blob.unionAll(normal), "vec_id", "embedding",
      k = 4, threshold = 0.999, maxClusterSize = 100)
    assert(res.droppedRows == 0L && res.droppedBuckets == 0L)
    val labels = res.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 2100)
    (0L until 2000L).foreach(i => assert(labels(i) == 0L, s"blob member $i"))
  }

  test("semantic dedup: over-cap cluster of distinct vectors is sub-split, copies still found") {
    // k=1 forces one 400-vector cluster over cap=100. The r10 policy
    // dropped the whole cluster (planted pair missed, silently); the
    // hyperplane sub-split must carve it into under-cap sub-buckets and
    // still find the planted half-scale copy — positive scaling preserves
    // every hyperplane sign, so the pair cannot be separated.
    val base = spark.range(0, 400).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)), d =>
        ((pmod(xxhash64(col("id"), d), lit(2000)).cast("double") - 1000.0) / 100.0)
          .cast("float")).as("embedding"))
    val copies = base.filter(col("vec_id") < 20).select(
      (col("vec_id") + 5000).as("vec_id"),
      transform(col("embedding"), x => x * lit(0.5f)).as("embedding"))
    val res = VectorOps.semanticDedupLabelsWithStats(
      base.unionAll(copies), "vec_id", "embedding",
      k = 1, threshold = 0.999, maxClusterSize = 100)
    assert(res.droppedRows == 0L && res.droppedBuckets == 0L,
      s"sub-split left ${res.droppedRows} rows over cap")
    val labels = res.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 20L).foreach(i => assert(labels(5000 + i) == i, s"copy of $i"))
    assert(labels.count { case (id, rep) => id == rep } == 400)
  }

  test("semantic dedup: a corrupted NaN/Inf embedding never merges its cluster") {
    // Spark orders NaN above every threshold, so an unguarded `cos >=
    // 0.999` would declare the corrupted vector a duplicate of everything
    // it co-clusters with; two identical NaN vectors must also not
    // "exact-collapse" (their cosine is undefined, not 1).
    val normal = spark.range(0, 60).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)), d =>
        (pmod(xxhash64(col("id"), d), lit(500)).cast("double") / 50.0 + 0.5)
          .cast("float")).as("embedding"))
    val nanVec = typedLit(Seq(1.0f, Float.NaN, 3.0f, 4.0f, 5.0f, 6.0f, 7.0f, 8.0f))
    val infVec = typedLit(Seq(1.0f, Float.PositiveInfinity, 3.0f, 4.0f, 5.0f, 6.0f, 7.0f, 8.0f))
    val corrupted = spark.range(9000, 9002).select(col("id").as("vec_id"), nanVec.as("embedding"))
      .unionAll(spark.range(9100, 9101).select(col("id").as("vec_id"), infVec.as("embedding")))
    val res = VectorOps.semanticDedupLabelsWithStats(
      normal.unionAll(corrupted), "vec_id", "embedding",
      k = 2, threshold = 0.999, maxClusterSize = 1000)
    val labels = res.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 63)
    // nothing merges: normals are naturally distinct, corrupted vectors
    // have undefined cosines, and the two identical NaN vectors stay apart
    assert(labels.forall { case (id, rep) => id == rep },
      s"unexpected merges: ${labels.filter { case (id, rep) => id != rep }}")
  }

  test("semantic dedup: near-identical-direction mass reports its drop instead of silence") {
    // 300 DISTINCT scale-copies of one direction: exact collapse can't
    // merge them (different magnitudes) and hyperplanes can't split them
    // (same signs at every bit) — the residual cap must fire and say so.
    val ray = spark.range(0, 300).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)), d =>
        ((d + 1).cast("double") * (col("id") + 1).cast("double") / 100.0)
          .cast("float")).as("embedding"))
    val res = VectorOps.semanticDedupLabelsWithStats(
      ray, "vec_id", "embedding", k = 1, threshold = 0.999, maxClusterSize = 50)
    assert(res.droppedBuckets == 1L && res.droppedRows == 300L,
      s"expected measured drop, got buckets=${res.droppedBuckets} rows=${res.droppedRows}")
    // dropped rows are never pruned — kept as their own representatives
    val labels = res.labels.collect()
    assert(labels.length == 300 && labels.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("weighted sample: heavy rows dominate, membership is partitioning-independent") {
    import spark.implicits._
    // 500 heavy rows (w=1000) + 500 light rows (w=10): a draw lands heavy
    // with p ≈ 0.99, so 100 draws should contain only a handful of lights
    val rows = spark.range(0, 1000)
      .select(col("id"), when(col("id") < 500, 1000.0).otherwise(10.0).as("w"))
    val sample = Sampling.weightedSample(rows, col("id"), col("w"), k = 100)
      .collect().map(_.getLong(0)).toSet
    assert(sample.size == 100)
    val heavy = sample.count(_ < 500)
    assert(heavy > 80, s"only $heavy/100 heavy rows sampled — weights not honored")
    // pure function of (key, weight): any partitioning gives the same set
    val reparted = Sampling.weightedSample(rows.repartition(7), col("id"), col("w"), k = 100)
      .collect().map(_.getLong(0)).toSet
    assert(reparted == sample)
  }

  test("sequence packing: contiguous per-shard offsets, bins chunk at capacity") {
    import spark.implicits._
    val docs = spark.range(0, 300)
      .select(col("id").as("doc_id"), (col("id") % 3).cast("string").as("source"),
        (col("id") % 90 + 10).as("n_tokens"))
    val packed = Packing.packIntoBins(docs, Seq("source"), col("doc_id"),
      col("n_tokens"), capacity = 512)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("tok_start"), r.getAs[Long]("bin")))
    // per shard: offsets are the running sum in doc_id order (concatenation)
    packed.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      var expected = 0L
      sorted.foreach { case (_, id, n, start, bin) =>
        assert(start == expected, s"doc $id: tok_start $start != $expected")
        assert(bin == start / 512, s"doc $id: bin $bin != ${start / 512}")
        expected += n
      }
    }
    // partitioning independence
    val reparted = Packing.packIntoBins(docs.repartition(5), Seq("source"),
      col("doc_id"), col("n_tokens"), capacity = 512)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("tok_start"), r.getAs[Long]("bin")))
    assert(reparted.toSet == packed.toSet)
    // named validation (r17): capacity = 0 would NULL every bin silently
    assertThrows[IllegalArgumentException](
      Packing.packIntoBins(docs, Seq("source"), col("doc_id"), col("n_tokens"), 0))
  }

  test("skew ops: degenerate bucket counts are a named error, not a NULL-salt result") {
    import spark.implicits._
    // buckets = 0 previously made saltedJoin silently EMPTY (NULL left
    // salts never match the right's [0, -1] sequence) and collapsed
    // saltedAggregate into one NULL bucket — both are now rejected loudly
    val df = Seq((1L, 2L)).toDF("k", "v")
    assertThrows[IllegalArgumentException](
      SkewOps.saltedJoin(df, df, col("k"), col("k"), buckets = 0))
    assertThrows[IllegalArgumentException](
      SkewOps.saltedAggregate(df, Seq(col("k")), 0,
        Seq("s" -> sum(col("v"))), Seq(c => sum(c))))
    assertThrows[IllegalArgumentException](
      Dedup.lshBuckets(df, col("k"), array(lit(1L)), bands = 0))
  }

  test("compaction: many tiny files become few target-sized files, data unchanged") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val in = s"$tmp/in"; val out = s"$tmp/out"
    // 64 tiny files (~6 KB each)
    spark.range(0, 64000).select(col("id"), md5(col("id").cast("string")).as("payload"))
      .repartition(64).write.parquet(in)
    val fs = new java.io.File(in).listFiles().count(_.getName.endsWith(".parquet"))
    assert(fs == 64)
    val outFiles = Layout.compact(spark, in, out, targetBytes = 256L * 1024)
    assert(outFiles < 16, s"expected <16 compacted files, got $outFiles")
    // content survives bit-for-bit
    val a = spark.read.parquet(in).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = spark.read.parquet(out).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
  }

  test("z-order layout bounds BOTH dimensions per partition; single-column sort does not") {
    import spark.implicits._
    // uniform 2-d grid: 256 × 256 points
    val grid = spark.range(0, 65536)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    // Pruning metric: with file-level min/max stats, a filter reads only the
    // partitions whose range overlaps it. Count partitions touched by a
    // small range filter on each dimension.
    def touched(df: org.apache.spark.sql.DataFrame, dim: String): Int =
      df.mapPartitions { it =>
        val vals = it.map(r => if (dim == "x") r.getLong(0) else r.getLong(1)).toSeq
        Iterator.single(if (vals.nonEmpty && vals.min < 32) 1 else 0)
      }.collect().sum
    val zLayout = Layout.zorderRepartition(grid, "x", "y", 8).select(col("x"), col("y"))
    val xLayout = grid.repartitionByRange(8, col("x")).select(col("x"), col("y"))
    // single-column layout: perfect on its own column, useless on the other
    assert(touched(xLayout, "x") <= 2)
    assert(touched(xLayout, "y") == 8, "x-sorted layout cannot prune y filters")
    // z-order: a y<32 (or x<32) slab overlaps only the z-ranges whose
    // interleaved high bits match — a strict subset of partitions on BOTH dims
    val zx = touched(zLayout, "x"); val zy = touched(zLayout, "y")
    assert(zx <= 5 && zy <= 5, s"z-order should prune both dims: x=$zx y=$zy of 8")
  }

  test("deterministic sampling: exact size, partitioning-independent membership") {
    val d = Tables.table(spark, dir, "documents").select(col("doc_id"), col("lang"))
    val s1 = Sampling.fixedSizeSample(d.repartition(7), col("doc_id"), 100)
      .collect().map(_.getLong(0)).toSet
    val s2 = Sampling.fixedSizeSample(d.repartition(3), col("doc_id"), 100)
      .collect().map(_.getLong(0)).toSet
    assert(s1.size == 100 && s1 == s2, "fixed-size sample must not depend on partitioning")

    val strat = Sampling.stratifiedSample(d, col("doc_id"), col("lang"),
      thresholds = Map("en" -> 64), defaultThreshold = 192)
    val rates = strat.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = rates("en").toDouble / totals("en")
    assert(enRate > 0.10 && enRate < 0.40, s"en keep-rate $enRate far from 64/256")
    for ((l, n) <- totals if l != "en") {
      val r = rates.getOrElse(l, 0L).toDouble / n
      assert(r > 0.55 && r < 0.95, s"$l keep-rate $r far from 192/256")
    }
  }

  test("fixedSizeSample: duplicate keys get a content-deterministic survivor set") {
    import spark.implicits._
    // 50 duplicate classes × 3 DISTINCT payloads; n = 25 cuts inside the
    // 9th class in md5-key order (classes are contiguous blocks of 3), so
    // WHICH duplicate survives the boundary is exactly what the r18
    // full-row-hash tiebreak pins — pre-r18 this was partition-order
    // dependent (the r17 review caveat, now deleted with the fix).
    val rows = for { k <- 0 until 50; p <- Seq("a", "b", "c") }
      yield (k.toLong, s"payload_${p}_$k")
    val df = rows.toDF("id", "payload")
    def sample(parts: Int): Seq[(Long, String)] =
      Sampling.fixedSizeSample(df.repartition(parts), col("id"), 25)
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(identity).toSeq
    val got = sample(1)
    assert(got.size == 25)
    assert(sample(7) == got && sample(13) == got,
      s"survivor set must be a pure function of content, not partitioning: $got")
    // the fixture really does straddle a class: some key is present with
    // only 1 or 2 of its 3 payload variants (a vacuously-whole-classes
    // sample would not exercise the tiebreak at all)
    val classSizes = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(classSizes.values.exists(c => c == 1 || c == 2),
      s"fixture must cut inside a duplicate class at the n-boundary: $classSizes")
  }

  test("fixedSizeSample: dotted and duplicate column names survive the tiebreak (r18 ADVICE)") {
    import spark.implicits._
    // `col("a.b")` parses the dot as struct access, so the r18 tiebreak's
    // by-name column references broke any frame with a legal dotted
    // top-level name (and made duplicate names ambiguous) — a regression,
    // since pre-r18 fixedSizeSample never referenced data columns. The fix
    // renames positionally before referencing; both shapes must sample.
    val dotted = (0 until 60).map(i => (i.toLong, s"v$i")).toDF("id", "a.b")
    val gotDotted = Sampling.fixedSizeSample(dotted.repartition(5), col("id"), 20)
    assert(gotDotted.columns.toSeq == Seq("id", "a.b"), "original names restored")
    val d1 = gotDotted.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val d2 = Sampling.fixedSizeSample(dotted.repartition(11), col("id"), 20)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(d1.size == 20 && d1 == d2, "dotted-name frame samples deterministically")

    val dup = (0 until 60).map(i => (i.toLong, s"x$i", s"y$i")).toDF("id", "v", "v")
    val gotDup = Sampling.fixedSizeSample(dup.repartition(4), col("id"), 20)
    assert(gotDup.columns.toSeq == Seq("id", "v", "v"), "duplicate names restored")
    assert(gotDup.count() == 20, "duplicate-name frame samples without ambiguity errors")
  }

  test("count-min heavy hitters: one-sided eps-bounded estimates, planted hot tokens recovered") {
    import spark.implicits._
    // The synthetic corpus vocabulary is near-uniform (no true heavy
    // hitters), so plant an unambiguous zipf head on top of it.
    val base = Tables.table(spark, dir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("token"))
    // counts all above the base corpus's own most frequent token (~1000)
    val hot = Seq.tabulate(5)(i => (s"hot$i", 3000 - 300 * i))
    val planted = hot.flatMap { case (t, n) => Seq.fill(n)(t) }.toDF("token").repartition(4)
    val toks = base.unionAll(planted)
    val total = toks.count()
    val exact = toks.groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val eps = 1e-4
    val est = Sketches.heavyHitters(toks, "token", k = 20, eps = eps)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // CMS guarantee: never under, over by at most eps*N (w.h.p.)
    for ((t, n) <- est) {
      assert(n >= exact(t), s"CMS underestimated '$t': $n < ${exact(t)}")
      assert(n <= exact(t) + (eps * total).ceil.toLong + 1,
        s"CMS overestimated '$t' beyond eps*N: $n vs ${exact(t)} + ${(eps * total).ceil}")
    }
    // the planted head must come back as the top 5, in order
    assert(est.take(5).map(_._1).toSeq == hot.map(_._1),
      s"planted heavy hitters not recovered in order: ${est.take(5).toSeq}")
    // NULL tokens are not countable items (r17): a dirty token column must
    // degrade to the same answer over its non-NULL rows, not NPE the
    // executor inside CountMinSketch.addString
    val dirty = toks.unionAll(Seq.fill(50)(null: String).toDF("token"))
    val estDirty = Sketches.heavyHitters(dirty, "token", k = 5, eps = eps)
      .collect().map(_.getString(0)).toSeq
    assert(estDirty == hot.map(_._1),
      s"NULL tokens perturbed the heavy-hitter head: $estDirty")
  }

  test("approx sketches: HLL within 5% and t-digest median within 1% of exact (sf0.01)") {
    // Same shapes as q_approx_distinct / q_approx_percentile, checked
    // against the exact values so "approx" isn't "unchecked".
    val li = Tables.table(spark, "/root/testdata/sf0.01", "lineitem")
    val exact = li.groupBy(col("l_returnflag")).agg(
      countDistinct(col("l_partkey")).as("nd"),
      expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.5)").as("p50"))
    val approx = li.groupBy(col("l_returnflag")).agg(
      approx_count_distinct(col("l_partkey")).as("a_nd"),
      percentile_approx(col("l_extendedprice").cast("double"), lit(0.5), lit(1000)).as("a_p50"))
    val rows = exact.join(approx, "l_returnflag").collect()
    assert(rows.length == 3)
    for (r <- rows) {
      val flag = r.getAs[String]("l_returnflag")
      val nd = r.getAs[Long]("nd").toDouble
      val aNd = r.getAs[Long]("a_nd").toDouble
      assert(math.abs(aNd - nd) / nd <= 0.05,
        f"$flag: HLL ${aNd}%.0f vs exact ${nd}%.0f — error ${math.abs(aNd - nd) / nd}%.3f > 5%%")
      val p50 = r.getAs[Double]("p50")
      val aP50 = r.getAs[Double]("a_p50")
      assert(math.abs(aP50 - p50) / p50 <= 0.01,
        f"$flag: approx median $aP50%.2f vs exact $p50%.2f — error ${math.abs(aP50 - p50) / p50}%.4f > 1%%")
    }
  }

  test("capBuckets: hot bucket at 10× cap is dropped via broadcast anti-join, never a Window") {
    import spark.implicits._
    val cap = 50
    // one degenerate bucket at 10× cap + 20 normal buckets at half cap
    val hotRows = (0 until cap * 10).map(i => ("hot", i.toLong))
    val coldRows = for (b <- 0 until 20; i <- 0 until cap / 2) yield (s"b$b", (1000 * b + i).toLong)
    val df = (hotRows ++ coldRows).toDF("bucket", "id").repartition(4)
    val capped = Dedup.capBuckets(df, Seq("bucket"), cap)
    // semantics: the whole hot bucket is discarded, every cold row survives
    val kept = capped.groupBy("bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kept.contains("hot"), "over-cap bucket must be dropped entirely")
    assert(kept.size == 20 && kept.values.forall(_ == cap / 2))
    // plan shape: the skew guard must be a broadcast anti-join, NOT a window
    // count (a window routes the full hot bucket to one task before filtering)
    val plan = capped.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"capBuckets planned a Window:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastExchange") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join in:\n${plan.take(2000)}")
  }

  test("capBuckets: over-cap set above maxBroadcastKeys switches to the bloom map-side filter") {
    import spark.implicits._
    val cap = 10
    // 40 hot buckets (3× cap) + 60 cold buckets (half cap): the over-cap
    // key set (40) exceeds the forced maxBroadcastKeys=8, so the guard must
    // take the bloom path instead of driver-broadcasting the key list
    val hotRows = for (b <- 0 until 40; i <- 0 until cap * 3) yield (s"hot$b", (10000 * b + i).toLong)
    val coldRows = for (b <- 0 until 60; i <- 0 until cap / 2) yield (s"cold$b", (900000 + 100 * b + i).toLong)
    val df = (hotRows ++ coldRows).toDF("bucket", "id").repartition(4)
    val capped = Dedup.capBuckets(df, Seq("bucket"), cap, maxBroadcastKeys = 8L)
    val kept = capped.groupBy("bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // no false negatives by construction: every hot bucket IS dropped
    assert(kept.keys.forall(_.startsWith("cold")), s"hot bucket survived: ${kept.keys.take(5)}")
    // false positives only over-drop cool buckets, at rate bloomFpp=0.001 —
    // allow a couple, require the surviving counts untouched
    assert(kept.size >= 58, s"bloom over-dropped too many cool buckets: kept ${kept.size}/60")
    assert(kept.values.forall(_ == cap / 2))
    // plan shape: a pure codegen'd filter probing the bloom — no join, no
    // window, no shuffle of the data rows at all
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("bloommightcontain"), s"expected bloom probe in:\n${plan.take(2000)}")
    assert(!plan.contains("Window") && !plan.contains("LeftAnti"),
      s"bloom path must not join or window:\n${plan.take(2000)}")
  }

  test("capBuckets bloom path: multi-column keys differing only in WHICH column is null stay distinct") {
    import spark.implicits._
    val cap = 5
    // hot key (x, NULL) at 3× cap; cool mirror key (NULL, x) below cap.
    // xxhash64 SKIPS null children, so without per-column null markers both
    // keys hash identically and the hot key's bloom entry deterministically
    // drops every (NULL, x) row — a guaranteed collision, not an fpp event.
    // maxBroadcastKeys = 0 forces the bloom path.
    val hot = (0 until cap * 3).map(i => (Some("x"), Option.empty[String], i.toLong))
    val cool = (0 until 3).map(i => (Option.empty[String], Some("x"), (1000 + i).toLong))
    val df = (hot ++ cool).toDF("k1", "k2", "id").repartition(3)
    val capped = Dedup.capBuckets(df, Seq("k1", "k2"), cap, maxBroadcastKeys = 0L)
    val kept = capped.select("k1", "k2").collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)))).toSet
    assert(!kept.contains((Some("x"), None)), s"the hot (x, NULL) key must drop: $kept")
    assert(kept == Set((None, Some("x"))),
      s"the cool (NULL, x) key is a DIFFERENT key than (x, NULL) and must survive: $kept")
  }

  test("removeDuplicates: NULL-id rows pass through — they are nobody's duplicate") {
    import spark.implicits._
    // a NULL id labels as (null, null); the representative filter and the
    // keep semi-join must compare null-safely or these rows silently vanish
    // from the cleaned corpus (r16 review finding — data loss, not dedup)
    val corpus = Seq((Some(1L), "a"), (Some(2L), "b"), (Some(3L), "b-copy"),
      (Option.empty[Long], "orphan"), (Option.empty[Long], "orphan2"))
      .toDF("doc_id", "text")
    val pairs = Seq((2L, 3L)).toDF("id1", "id2")
    val kept = Dedup.removeDuplicates(corpus, col("doc_id"), pairs)
      .select("text").collect().map(_.getString(0)).toSet
    assert(kept == Set("a", "b", "orphan", "orphan2"),
      s"NULL-id rows must survive and the (2,3) pair must collapse to 2: $kept")
  }

  test("q_dedup_minhash truth-join df cap is far above the corpus's max shingle df") {
    // The truth join is capped at truthShingleDfCap so it stays linear at
    // scale; this pins that the cap is UNHIT on the test corpora (max df 27
    // at sf0.1 by DuckDB probe), i.e. output is bit-identical to uncapped.
    val corpus = docs.unionAll(
        docs.filter(col("doc_id") < 100)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      .unionAll(docs.filter(col("doc_id") < 60)
        .select((col("doc_id") + 200000).as("doc_id"),
          regexp_replace(col("text"), "\\bthe\\b", "thee").as("text")))
    val maxDf = corpus
      .select(explode(array_distinct(TextOps.shingles(col("text")))).as("sh"))
      .groupBy("sh").count().agg(max("count")).first().getLong(0)
    assert(maxDf * 10 < graft.queries.DedupQueries.truthShingleDfCap,
      s"max shingle df $maxDf too close to cap ${graft.queries.DedupQueries.truthShingleDfCap}")
  }

  test("contamination scan: planted eval copies score 1.0, clean docs stay under the flag") {
    val evalSet = docs.filter(col("doc_id") < 20)
    val train = docs.filter(col("doc_id") >= 20)
      .unionAll(evalSet.select((col("doc_id") + 500000).as("doc_id"), col("text")))
    val scores = Dedup.contaminationScores(train, evalSet, col("doc_id"), col("text"))
    val rows = scores.collect()
    val planted = rows.filter(_.getLong(0) >= 500000)
    assert(planted.length == 20, s"all 20 planted eval copies must surface, got ${planted.length}")
    assert(planted.forall(_.getAs[Double]("overlap") == 1.0),
      "verbatim eval text must score full overlap")
    // the semi-join drops zero-overlap docs: output is a small subset of
    // the ~510-doc corpus, not one row per doc. (Some natural docs DO
    // cross the 0.3 flag — the synthetic corpus contains genuine near-dups
    // of the eval docs, which is exactly what a contamination scan is for;
    // the oracle value-checks every score, so no bound is asserted here.)
    assert(rows.length < 60, s"semi-join must bound output to overlapping docs, got ${rows.length}")
    // plan: eval vocabulary broadcasts into a semi-join — the corpus never
    // shuffles before the per-doc count
    val plan = scores.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected broadcast semi-join:\n${plan.take(2000)}")
  }

  test("fuzzy contamination: paraphrases the 8-gram scan misses are recovered via MinHash-LSH") {
    val evalSet = docs.filter(col("doc_id") < 20)
    // heavy paraphrase: mutate every 8th WORD, so every 8-gram window
    // contains a mutation (exact scan overlap = 0, total blind spot) while
    // 5/8 of 3-gram windows survive untouched (3-gram Jaccard ≈ 0.45)
    val paraphrase = concat_ws(" ", transform(split(trim(lower(col("text"))), "\\s+"),
      (w, i) => when(i % 8 === 0, concat(w, lit("x"))).otherwise(w)))
    val train = docs.filter(col("doc_id") >= 20)
      .unionAll(docs.filter(col("doc_id") < 10)
        .select((col("doc_id") + 600000).as("doc_id"), paraphrase.as("text")))
    // exact 8-gram scan: the paraphrases are completely invisible
    val exactHits = Dedup.contaminationScores(train, evalSet, col("doc_id"), col("text"))
      .filter(col("overlap") >= 0.3 && col("id") >= 600000).count()
    assert(exactHits == 0, s"8-gram scan unexpectedly caught $exactHits paraphrases")
    // fuzzy scan: the banded sketch (16 bands of 2 rows) recovers the
    // planted pairs at J ≈ 0.45 — P(miss) = (1−J²)¹⁶ ≈ 3% per pair, and
    // signatures are deterministic, so the recovered set is a fixed fact;
    // require ≥ 8/10 (measured: 10/10) with a sane agreement estimate
    val fuzzy = Dedup.fuzzyContaminationPairs(train, evalSet, col("doc_id"), col("text"))
    val hits = fuzzy.filter(col("est_jaccard") >= 0.25).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val recovered = (0 until 10).count(i => hits.exists(h => h._1 == 600000 + i && h._2 == i))
    assert(recovered >= 8, s"only $recovered/10 paraphrases recovered: ${hits.take(10).toSeq}")
    // plan: eval buckets broadcast — the corpus side reaches the candidate
    // join with NO KEYED exchange (signature + band keys are all map-side;
    // the only exchange permitted below the probe is the bytes-gated
    // round-robin rebalance of a small input, Rebalance.smallInput r19,
    // which never fires at scale)
    val plan = fuzzy.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe:\n${plan.take(2000)}")
    val beforeJoin = plan.substring(plan.indexOf("BroadcastHashJoin"))
    val corpusSide = beforeJoin.split("BroadcastExchange")(0)
    // anchored (r19 ADVICE): without the lookbehind the pattern also
    // matched inside "BroadcastExchange <mode>", so a legitimate broadcast
    // would have been miscounted as a keyed corpus shuffle
    assert("(?<!Broadcast)Exchange (?!RoundRobinPartitioning)".r.findAllIn(corpusSide).isEmpty,
      s"corpus side must not hash/range-shuffle before the bucket probe:\n${plan.take(3000)}")
  }

  test("two-level top-k and inverted index are partitioning-independent") {
    // Both rank within (key, spark_partition_id()) before the global pass —
    // this pins that the partition id only shapes WHERE work happens, never
    // WHAT comes out: 1-partition and 8-partition runs must be row-identical
    // (ranks, dfs, postings included).
    val emb = Tables.table(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def topk(parts: Int) =
      VectorOps.bruteForceTopK(emb.repartition(parts), queries, k = 10)
        .select(col("query_id"), col("vec_id"), col("cos"), col("rnk"))
        .collect().map(_.toSeq).toSet
    assert(topk(1) == topk(8), "top-k must not depend on partitioning")
    def index(parts: Int) =
      SearchIndex.invertedIndex(docs.repartition(parts), col("doc_id"), col("text"))
        .collect().map(_.toSeq).toSet
    assert(index(1) == index(8), "inverted index must not depend on partitioning")
  }

  test("dedup candidate paths plan no Window over bucket keys") {
    // minhash, simhash, and ngram candidate generation all route through
    // capBuckets — none of their plans may contain a Window node (the
    // r8-verdict hot-partition shape). VectorOps top-k windows are per-query
    // ANN ranking, not dedup, and don't appear here.
    for ((name, df) <- Seq(
        "minhash" -> Dedup.minhashCandidates(withExactDups, col("doc_id"), col("text")),
        "simhash" -> Dedup.simhashPairs(withExactDups, col("doc_id"), col("text"), maxDist = 6),
        "ngram" -> Dedup.ngramJaccardPairs(withExactDups, col("doc_id"), col("text"), threshold = 0.3))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$name candidate plan contains a Window:\n${plan.take(2000)}")
    }
  }

  test("duplicate spans: shared paragraph found with merged coverage, unique text untouched") {
    import spark.implicits._
    // Docs 1/2 share a 20-token paragraph embedded in otherwise-unique
    // text; doc 3 repeats ITS OWN window twice (within-doc repeat must not
    // count); doc 4 is fully unique.
    val para = (1 to 20).map(i => s"shared$i").mkString(" ")
    def uniq(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val corpus = Seq(
      (1L, s"${uniq("a", 10)} $para ${uniq("b", 10)}"),
      (2L, s"${uniq("c", 5)} $para ${uniq("d", 25)}"),
      (3L, s"${uniq("e", 20)} ${uniq("e", 20)}"),
      (4L, uniq("f", 40)),
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(corpus, col("doc_id"), col("text"), windowSize = 15)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Int]("n_dup_windows"), r.getAs[Int]("dup_tokens"))).toMap
    // the 20-token paragraph yields 6 duplicated 15-windows per doc
    // (window must sit fully inside the paragraph), merging to 20 tokens
    assert(spans.keySet == Set(1L, 2L), s"unexpected flagged docs: $spans")
    assert(spans(1L) == (6, 20) && spans(2L) == (6, 20), s"coverage wrong: $spans")
  }

  test("duplicate spans: full-doc copy covers every token; fraction is exact") {
    val spans = Dedup.duplicateSpans(withExactDups, col("doc_id"), col("text"))
    val byId = spans.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("dup_fraction")).toMap
    // every planted full copy (and its original) is 100% duplicated tokens
    val copies = byId.view.filterKeys(_ >= 100000).toMap
    assert(copies.nonEmpty && copies.values.forall(_ == 1.0),
      s"full copies must be fully covered: ${copies.take(5)}")
  }

  test("bigram LM: hand-computed add-0.5 scores are exact; repetition scores below novelty") {
    import spark.implicits._
    // V = 3 (a,b,c). Contexts: c1(a)=4, c1(b)=3, c1(c)=2. Bigram counts:
    // ab=4, ba=2, bc=1, cc=2. Per-term scaled log-probs (floor(ln·1e4)):
    //   ab: ln(4.5/5.5) → -2007,  ba: ln(2.5/4.5) → -5878,
    //   bc: ln(1.5/4.5) → -10987, cc: ln(2.5/3.5) → -3365.
    val corpus = Seq(
      (1L, "a b a b a b"), // ab,ba,ab,ba,ab → sum 3·(-2007)+2·(-5878) = -17777
      (2L, "a b c"),       // ab,bc → -12994
      (3L, "c c c"),       // cc,cc → -6730
    ).toDF("doc_id", "text")
    val got = LanguageModel.bigramNllScores(corpus, col("doc_id"), col("text"), vocabSize = 3)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_logp_scaled"),
          r.getAs[Double]("avg_nll"))).toMap
    assert(got(1L) == ((5L, -17777L, 0.35554)), s"doc1: ${got(1L)}")
    assert(got(2L) == ((2L, -12994L, 0.6497)), s"doc2: ${got(2L)}")
    assert(got(3L) == ((2L, -6730L, 0.3365)), s"doc3: ${got(3L)}")
    // the semantic ordering the quality signal relies on: high-frequency
    // continuations (docs 1,3) perplex less than a novel continuation (doc 2)
    assert(got(2L)._3 > got(1L)._3 && got(2L)._3 > got(3L)._3)
  }

  test("duplicate-span removal: only the shared span is deleted, unique remainder survives") {
    import spark.implicits._
    val para = (1 to 20).map(i => s"shared$i").mkString(" ")
    def uniq(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val corpus = Seq(
      (1L, s"${uniq("a", 10)} $para ${uniq("b", 10)}"),
      (2L, s"${uniq("c", 5)} $para ${uniq("d", 25)}"),
      (3L, s"${uniq("e", 20)} ${uniq("e", 20)}"), // within-doc repeat: kept
      (4L, uniq("f", 40)),
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(corpus, col("doc_id"), col("text"), windowSize = 15)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("clean_text"), r.getAs[Int]("dup_tokens"))).toMap
    assert(got(1L) == ((s"${uniq("a", 10)} ${uniq("b", 10)}", 20)), s"doc1: ${got(1L)}")
    assert(got(2L) == ((s"${uniq("c", 5)} ${uniq("d", 25)}", 20)), s"doc2: ${got(2L)}")
    assert(got(3L)._2 == 0 && got(4L)._2 == 0, "non-cross-doc text must be untouched")
    assert(got(3L)._1 == s"${uniq("e", 20)} ${uniq("e", 20)}")
  }

  test("BPE merge candidates: corpus-weighted pair counts over the vocab are exact") {
    import spark.implicits._
    // wf: ab→2, abc→1, x→(dropped, single char). Pairs: 'ab' from both
    // words (2+1), 'bc' from abc (1) — the merge candidate must be 'ab'.
    val corpus = Seq((1L, "ab AB abc x")).toDF("doc_id", "text")
    val got = LanguageModel.bpeMergeCandidates(corpus, col("text"), k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("ab", 3L), ("bc", 1L)), s"got: ${got.toSeq}")
  }

  test("leakage-safe split: duplicate classes never straddle the split boundary") {
    import spark.implicits._
    val d = Tables.table(spark, dir, "documents").select(col("doc_id"), col("text"))
    val corpus = d.unionAll(d.select((col("doc_id") + 900000).as("doc_id"),
      concat(lit(" "), col("text"), lit("  ")).as("text"))) // every doc duplicated
    def splits(df: org.apache.spark.sql.DataFrame) =
      Sampling.leakageSafeSplit(df, col("doc_id"), TextOps.fingerprint(col("text")))
        .select(col("id"), col("split")).as[(Long, String)].collect().toMap
    val s = splits(corpus)
    d.select(col("doc_id")).as[Long].collect().foreach { i =>
      assert(s(i) == s(i + 900000), s"copy of doc $i crossed the split boundary")
    }
    // a function of content only — partitioning must not move anything
    assert(splits(corpus.repartition(7)) == s, "split must be partitioning-independent")
    // and the naive per-row hash split WOULD leak on this corpus — the
    // guard is load-bearing, not vacuous
    val naive = corpus.select(col("doc_id"),
      Sampling.hashBucket256(col("doc_id")).as("b")).as[(Long, Int)].collect().toMap
    val leaked = d.select(col("doc_id")).as[Long].collect().count(i =>
      (naive(i) < 205) != (naive(i + 900000) < 205))
    assert(leaked > 0, "corpus too small to demonstrate the naive-split leak")
  }

  test("cross-source overlap: a mirrored doc yields full containment, disjoint sources none") {
    import spark.implicits._
    val shared = (1 to 9).map(i => s"w$i").mkString(" ") // 9 tokens → two 8-grams
    val corpus = Seq(
      (1L, "A", shared),
      (2L, "B", shared),                                  // B mirrors A's doc
      (3L, "B", (1 to 9).map(i => s"x$i").mkString(" ")), // plus B-only text
      (4L, "C", (1 to 9).map(i => s"y$i").mkString(" "))  // disjoint source
    ).toDF("doc_id", "src", "text")
    val got = Dedup.crossSourceOverlap(corpus, col("src"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // A's whole gram set (2) is inside B's (4) → containment 1.0; C pairs
    // with nobody
    assert(got.toSeq == Seq(("A", "B", 2L, 2L, 4L, 1.0)), s"got: ${got.toSeq}")
  }

  test("mixture sampling: data-derived rates cap at 1, unlisted strata drop") {
    import spark.implicits._
    // a: mass 100, target 0.75 of budget 200 → desired 150 > 100 → capped
    //    (threshold 65536, every row kept — shortfall visible in the plan);
    // b: mass 200, target 0.25 → desired 50 → rate 0.25, thr 16384;
    // c: weight 0 → dropped entirely.
    val df = (
      (1 to 10).map(i => (i.toLong, "a", 10L)) ++
      (11 to 30).map(i => (i.toLong, "b", 10L)) ++
      (31 to 40).map(i => (i.toLong, "c", 10L))).toDF("id", "s", "m")
    val res = Sampling.mixtureSample(df, col("id"), col("s"), col("m"),
      targetWeights = Map("a" -> 0.75, "b" -> 0.25), budget = 200L)
    assert(res.plan == Seq(
      Sampling.MixtureRate("a", 100L, 1.0, 65536),
      Sampling.MixtureRate("b", 200L, 0.25, 16384)), s"plan: ${res.plan}")
    val kept = res.sampled.select("id", "s").as[(Long, String)].collect().toSet
    assert(kept.count(_._2 == "a") == 10, "capped stratum must keep every row")
    assert(kept.count(_._2 == "c") == 0, "unlisted stratum must drop")
    val bKept = kept.filter(_._2 == "b").map(_._1)
    // membership is the pure 16-bit md5 bucket — recompute it here
    val expB = (11 to 30).map(_.toLong).filter { i =>
      Integer.parseInt(org.apache.commons.codec.digest.DigestUtils.md5Hex(
        i.toString.getBytes("UTF-8")).substring(0, 4), 16) < 16384
    }.toSet
    assert(bKept == expB, s"b membership: got $bKept expected $expB")
  }

  test("mixture sampling: a per-row-unique hostile stratum column never reaches the driver collect") {
    import spark.implicits._
    // 50k rows, 49,970 of them in globally-unique strata (the
    // corpus-catalog assumption violated as hard as possible): the listed-
    // strata filter must prune them BEFORE the aggregate, so the collect
    // stays at |targetWeights| rows and the plan/membership are identical
    // to what the small-catalog contract promises
    val df = spark.range(50000).select(
      col("id"),
      when(col("id") < 15, lit("a"))
        .when(col("id") < 30, lit("b"))
        .otherwise(concat(lit("u"), col("id"))).as("s"),
      lit(10L).as("m"))
    val res = Sampling.mixtureSample(df, col("id"), col("s"), col("m"),
      targetWeights = Map("a" -> 0.5, "b" -> 0.5), budget = 20L)
    assert(res.plan.map(p => (p.stratum, p.total)) == Seq(("a", 150L), ("b", 150L)),
      s"hostile strata leaked into the plan: ${res.plan}")
    val kept = res.sampled.select("s").distinct().collect().map(_.getString(0)).toSet
    assert(kept.subsetOf(Set("a", "b")), s"unlisted hostile strata must drop: $kept")
    // pin the boundedness DIRECTLY (r16 review: the assertions above pass
    // even without the fix — plan only reads listed strata, and unlisted
    // rows fall to threshold 0): the totals frame the operator collects
    // must (a) return |targetWeights| rows, not corpus-many, and (b) carry
    // the listed-strata Filter BELOW its Aggregate so hostile strata prune
    // before the shuffle
    val totalsFrame = Sampling.strataTotalsFrame(df, col("s"), col("m"), Seq("a", "b"))
    assert(totalsFrame.collect().length == 2,
      "the driver collect must be capped at |targetWeights| rows")
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter}
    val agg = totalsFrame.queryExecution.optimizedPlan
      .collectFirst { case a: Aggregate => a }
      .getOrElse(fail("totals frame lost its Aggregate"))
    assert(agg.child.collectFirst { case f: Filter => f }.isDefined,
      s"the listed-strata filter must sit below the aggregate:\n${totalsFrame.queryExecution.optimizedPlan}")
  }

  test("BPE training: merge sequence on the Sennrich-style corpus is exact") {
    import spark.implicits._
    // wf: low×3, lower×2, newest×5, widest×3. Round-0 pair counts:
    // es 5+3=8, st 5+3=8 (tie → (e,s) wins lexicographically), we 7,
    // lo/ow/ne/ew 5, wi/id/de 3, er 2. After merging (e,s):
    // (es,t)=8 is the unique max. After merging (es,t): five pairs tie
    // at 5 — (e,w) is the lexicographic winner.
    val corpus = Seq(
      (1L, "low low low lower lower newest newest newest"),
      (2L, "newest newest widest widest widest")).toDF("doc_id", "text")
    val got = LanguageModel.bpeTrainMerges(corpus, col("text"), numMerges = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0, "e", "s", 8L), (1, "es", "t", 8L), (2, "e", "w", 5L)), s"got: ${got.toSeq}")
  }

  test("BPE training: a failed driver-fit probe falls back to the distributed loop, same table") {
    import spark.implicits._
    // driverVocabMax = 1 forces the probe to MISS (the vocab has 4 words >
    // 1), exercising the probe-then-fallback path — which since the
    // checkpointed-wf fix reads the SAME materialized (word, wf) frame the
    // probe materialized, not a second corpus aggregate. The merge table
    // must be identical to the default driver-hosted path's.
    val corpus = Seq(
      (1L, "low low low lower lower newest newest newest"),
      (2L, "newest newest widest widest widest")).toDF("doc_id", "text")
    def table(max: Long) = LanguageModel
      .bpeTrainMerges(corpus, col("text"), numMerges = 3, driverVocabMax = max)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val viaFallback = table(1L)
    assert(viaFallback == Seq((0, "e", "s", 8L), (1, "es", "t", 8L), (2, "e", "w", 5L)),
      s"probe-miss fallback table: $viaFallback")
    assert(viaFallback == table(4000000L), "fallback and driver hosts must agree")
  }

  test("BPE training: single-unit words leave the pair stream; merges stop when dry") {
    import spark.implicits._
    // "ab" fully merges in round 0; afterwards no word has ≥2 units, so
    // training stops early with exactly one merge row.
    val corpus = Seq((1L, "ab ab x y")).toDF("doc_id", "text")
    val got = LanguageModel.bpeTrainMerges(corpus, col("text"), numMerges = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((0, "a", "b", 2L)), s"got: ${got.toSeq}")
  }

  test("BPE encode: rank-ordered merge application yields exact unit counts") {
    import spark.implicits._
    // merges (l,o) then (lo,w): low → [low] (1 unit), lower → [low,e,r]
    // (3 units), wide → untouched (4 units). Rank order matters: (lo,w)
    // can only fire after (l,o) created the "lo" unit.
    val corpus = Seq((1L, "low low lower"), (2L, "wide low")).toDF("doc_id", "text")
    val got = LanguageModel.bpeEncode(corpus, col("doc_id"), col("text"),
      merges = Seq(("l", "o"), ("lo", "w")))
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 3L, 5L), (2L, 2L, 5L)), s"got: ${got.toSeq}")
  }

  test("bigram LM: scaled sums are partitioning-independent on the real corpus") {
    val d = docs
    val v = d.select(explode(split(trim(lower(col("text"))), "\\s+")).as("t"))
      .distinct().count()
    def sums(df: org.apache.spark.sql.DataFrame) =
      LanguageModel.bigramNllScores(df, col("doc_id"), col("text"), v)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("sum_logp_scaled")).toMap
    assert(sums(d.repartition(7)) == sums(d),
      "sum_logp_scaled must be partitioning-independent")
  }

  test("BPE train/encode invariants: partitioning-independent merges, monotone unit counts") {
    val d = docs.limit(120)
    def train(df: org.apache.spark.sql.DataFrame, n: Int) =
      LanguageModel.bpeTrainMerges(df, col("text"), numMerges = n)
        .collect().sortBy(_.getInt(0))
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // the merge sequence is an argmax chain over exact counts — it must
    // not depend on how the corpus is partitioned
    assert(train(d.repartition(7), 4) == train(d, 4),
      "merge sequence must be partitioning-independent")
    // encode with 0 merges counts characters; every further merge can only
    // shrink (or preserve) each doc's unit count
    def units(n: Int): Map[Long, Long] = {
      val m = train(d, n).map(t => (t._2, t._3))
      LanguageModel.bpeEncode(d, col("doc_id"), col("text"), m)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    }
    val u0 = units(0)
    val u2 = units(2)
    val u4 = units(4)
    val chars = d.select(col("doc_id"),
      expr("aggregate(split(trim(lower(text)), '\\\\s+'), 0L, (a, w) -> a + length(w))")
        .as("c")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(u0 == chars, "0-merge encode must count characters per doc")
    assert(u0.forall { case (k, v) => u2(k) <= v }, "2-merge units must not exceed 0-merge")
    assert(u2.forall { case (k, v) => u4(k) <= v }, "4-merge units must not exceed 2-merge")
    assert(u4.values.sum < u0.values.sum, "4 merges must shrink the corpus total")
  }

  test("fuzzy leakage-safe split: near-dup cluster labels co-assign what fingerprints miss") {
    import spark.implicits._
    // doc 200001 is a one-token edit of doc 1: exact fingerprints differ
    // (a naive exact-keyed split can separate them), but the minhash
    // near-dup CLUSTER label — the documented fuzzy groupKey extension —
    // puts them in one class, so they co-assign by construction
    val near = docs.filter(col("doc_id") < 40).unionAll(
      docs.filter(col("doc_id") < 40)
        .select((col("doc_id") + 200000).as("doc_id"),
          regexp_replace(col("text"), "\\bthe\\b", "thee").as("text")))
    val pairs = Dedup.minhashCandidates(near, col("doc_id"), col("text"))
    val labels = Dedup.connectedComponentsMin(
      near.select(col("doc_id").as("id")), pairs)
    val planted: Set[(Long, Long)] = pairs
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => p._2 == p._1 + 200000)
    assert(planted.nonEmpty, "minhash must surface at least one mutated pair")
    val withLabel = near.join(labels, near("doc_id") === labels("id"))
      .select(col("doc_id"), col("rep"))
    val splits = Sampling.leakageSafeSplit(withLabel, col("doc_id"), col("rep"))
      .select(col("id"), col("split")).as[(Long, String)].collect().toMap
    planted.foreach { case (a, b) =>
      assert(splits(a) == splits(b),
        s"near-dup pair ($a, $b) straddled the split despite a shared cluster label")
    }
    // and for the genuinely mutated pairs (docs containing "the") the
    // fingerprint key differs — the exact split has no class tying them
    val fps = near.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .as[(Long, String)].collect().toMap
    val mutated = planted.filter { case (a, b) => fps(a) != fps(b) }
    assert(mutated.nonEmpty,
      "at least one planted pair must be a true near-dup (not an exact copy)")
  }

  test("leakage-safe split: NULL group keys get an assignment instead of vanishing") {
    import spark.implicits._
    // fingerprint(NULL text) is NULL — a plain equi-join would silently
    // drop docs 3 and 4 from the split; the null-safe join keeps them as
    // one dup class with rep = min id
    val df = Seq((1L, Some("x")), (2L, Some("x")), (3L, None),
      (4L, None), (5L, Some("y"))).toDF("doc_id", "text")
    val got = Sampling.leakageSafeSplit(df, col("doc_id"), TextOps.fingerprint(col("text")))
      .select(col("id"), col("rep"), col("split"))
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L), s"every row must be assigned: $got")
    assert(got(3L) == got(4L), "NULL-keyed rows form one class")
    assert(got(3L)._1 == 3L, "NULL class rep must be its min id")
    assert(got(1L) == got(2L) && got(1L)._1 == 1L)
  }

  test("mixture sampling: non-string stratum and fractional mass collect safely") {
    import spark.implicits._
    // an Int stratum and a Double mass used to ClassCastException at the
    // totals collect; NULL stratum rows behave like any unlisted stratum
    val df = Seq((1L, Some(7), 10.5), (2L, Some(7), 10.5), (3L, Some(8), 21.0),
      (4L, None, 5.0)).toDF("id", "s", "m")
    val res = Sampling.mixtureSample(df, col("id"), col("s"), col("m"),
      targetWeights = Map("7" -> 1.0), budget = 100L)
    // mass sums truncate to long: stratum 7 → 21, capped at rate 1
    assert(res.plan == Seq(Sampling.MixtureRate("7", 21L, 1.0, 65536)), s"plan: ${res.plan}")
    val kept = res.sampled.select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L), s"listed stratum keeps all, NULL/unlisted drop: $kept")
  }

  test("duplicate-span removal: fully-duplicated 30k-token docs stay near-linear") {
    // adversarial long-doc shape for the rewrite step: every window of both
    // docs is duplicated, so covered ≈ L — the old per-token
    // array_contains probe was O(L×C) ≈ 9·10⁸ comparisons PER DOC here
    // (minutes); the interval-walk rewrite is O(L + C). Also pins the
    // empty-prefix/empty-suffix sequence() guard: coverage starts at
    // position 1 and runs to the end, so every kept-range is empty.
    val n = 30000
    val doc = (1 to n).map(i => s"t$i").mkString(" ")
    val corpus = spark.createDataFrame(Seq((1L, doc), (2L, doc)))
      .toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val got = Dedup.removeDuplicateSpans(corpus, col("doc_id"), col("text"), windowSize = 15)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("dup_tokens"),
        r.getAs[String]("clean_text"), r.getAs[Int]("n_clean_tokens")))
    val sec = (System.nanoTime() - t0) / 1e9
    assert(got.length == 2)
    got.foreach { case (id, dup, clean, nClean) =>
      assert(dup == n && nClean == 0 && clean == "", s"doc $id: dup=$dup nClean=$nClean")
    }
    assert(sec < 60.0, f"near-linear rewrite took $sec%.1f s — quadratic probe regressed?")
  }

  test("BPE entry points strip embedded sentinel control chars") {
    import spark.implicits._
    // / survive whitespace tokenization; unsanitized they
    // corrupt the sentinel segmentation silently. Training, encoding, and
    // pair counting must behave exactly as on the stripped corpus, and a
    // control-char-only token must drop rather than become an empty word.
    val dirty = Seq((1L, "ab\u0002 ab \u0002\u0003 ab\u0003cd abcd"))
      .toDF("doc_id", "text")
    val clean = Seq((1L, "ab ab abcd abcd")).toDF("doc_id", "text")
    def train(df: org.apache.spark.sql.DataFrame) =
      LanguageModel.bpeTrainMerges(df, col("text"), numMerges = 2)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(train(dirty) == train(clean), s"dirty: ${train(dirty)} clean: ${train(clean)}")
    assert(train(clean) == Seq((0, "a", "b", 4L), (1, "ab", "c", 2L)))
    def enc(df: org.apache.spark.sql.DataFrame) =
      LanguageModel.bpeEncode(df, col("doc_id"), col("text"),
        merges = Seq(("a", "b"), ("ab", "c")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(enc(dirty) == enc(clean) && enc(clean) == Seq((1L, 4L, 6L)),
      s"dirty: ${enc(dirty)} clean: ${enc(clean)}")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      LanguageModel.bpeMergeCandidates(df, col("text"), k = 5)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(pairs(dirty) == pairs(clean), s"dirty: ${pairs(dirty)} clean: ${pairs(clean)}")
  }

  test("BM25 top-k: rank order follows tf and idf; non-matching docs never appear") {
    import spark.implicits._
    // 'rare' appears in one doc, 'common' in all four; same-length docs so
    // the dl normalization drops out of the comparisons
    val corpus = Seq(
      (1L, "rare common filler pad"),   // rare + common
      (2L, "common common filler pad"), // common twice
      (3L, "common filler filler pad"), // common once
      (4L, "filler filler filler pad")  // no query term
    ).toDF("doc_id", "text")
    val got = SearchIndex.bm25TopK(corpus, col("doc_id"), col("text"),
        queryTerms = Seq("rare", "common"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L),
      s"rank order should be rare-hit, double-common, single-common: $got")
    assert(!got.exists(_._1 == 4L), "a doc with no query term must not appear")
    assert(got.map(_._2) == got.map(_._2).sorted(Ordering[Long].reverse),
      s"scores must be non-increasing: $got")
    // driver-side replica of the scoring formula, exact to the bit
    val n = 4.0; val avgdl = 4.0
    def idf(df: Double) = StrictMath.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def term(tf: Double, df: Double) =
      idf(df) * (tf * (1.2 + 1.0)) / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * 4.0 / avgdl))
    // doc 1: tf(common)=1 df(common)=3, then tf(rare)=1 df(rare)=1 —
    // summed in sorted term order (common, rare), exactly as the operator
    val expect1 = math.floor((term(1.0, 3.0) + term(1.0, 1.0)) * 1e4).toLong
    assert(got.head._2 == expect1, s"doc 1 score ${got.head._2} != replica $expect1")
  }

  test("ANN and near-dup paths treat NaN cosines as non-results — a corrupted embedding never matches") {
    import spark.implicits._
    // row 3 carries a NaN element (cosine = NaN, which Spark sorts ABOVE
    // 1.0); row 4 is a zero vector (cosine = NULL, sorts last). The guard
    // must drop the NaN row from every ranked/paired result while keeping
    // the NULL row's rank-last behavior.
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(Float.NaN, 1.0f)), (4L, Array(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((10L, Array(1.0f, 0.0f))).toDF("query_id", "query_vec")
    val bf = VectorOps.bruteForceTopK(corpus, queries, k = 4).collect()
      .map(r => (r.getAs[Int]("rnk"), r.getAs[Long]("vec_id"))).sortBy(_._1)
    assert(bf.map(_._2).toSeq == Seq(1L, 2L, 4L),
      s"want exact-match, near-match, zero-vector-last and NO NaN row: ${bf.toSeq}")
    for ((name, pairs) <- Seq(
        "exact" -> VectorOps.cosineNearDupPairs(corpus, "vec_id", "embedding", 0.9),
        "bucketed" -> VectorOps.bucketedNearDupPairs(corpus, "vec_id", "embedding", 0.9,
          dims = 2, bits = 4))) {
      val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!got.exists(p => p._1 == 3L || p._2 == 3L),
        s"$name: the NaN embedding paired with something: $got")
      assert(got.contains((1L, 2L)), s"$name must still find the real near-dup: $got")
    }
  }

  test("semanticDedupLabels on an empty corpus returns an empty labeling, not a crash") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val out = VectorOps.semanticDedupLabels(empty, "vec_id", "embedding", k = 4, threshold = 0.99)
    assert(out.columns.toSeq == Seq("vec_id", "rep") && out.count() == 0)
  }

  test("semanticDedup + ANN tolerate NULL and non-finite embeddings: bad rows self-label, seeds stay clean") {
    import spark.implicits._
    // 30 near-orthogonal good rows (distinct axes in 32 dims — pairwise
    // cos ≈ 0, so only PLANTED duplicates merge), one exact copy, and the
    // three hostile shapes: NULL embedding, all-NaN, all-Inf
    def axis(i: Int): Array[Float] = Array.tabulate(32)(d => if (d == i) 1.0f else 0.0f)
    val good = (0L until 30L).map(i => (i, axis((i % 30).toInt)))
    val corpus = (good ++ Seq(
        (100L, axis(1)), // exact duplicate of id 1
        (200L, null.asInstanceOf[Array[Float]]),
        (201L, Array.fill(32)(Float.NaN)),
        (202L, Array.fill(32)(Float.PositiveInfinity))))
      .toDF("vec_id", "embedding")
    // batch labels: no NPE from the null cluster key (r16), every row
    // labeled, the duplicate prunes to its original, hostile rows self-rep
    val labels = VectorOps.semanticDedupLabels(
        corpus, "vec_id", "embedding", k = 4, threshold = 0.999)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == corpus.count(), s"every row must be labeled: ${labels.size}")
    assert(labels(100L) == 1L, s"the exact duplicate must anchor to id 1: ${labels(100L)}")
    Seq(200L, 201L, 202L).foreach(i =>
      assert(labels(i) == i, s"hostile row $i must self-label: ${labels(i)}"))
    assert((0L until 30L).forall(i => labels(i) == i), "good rows must be kept")
    // incremental labels: same tolerance on both sides; a null-vec
    // incoming row still receives its self-label through the node frame
    val incoming = Seq(
      (300L, axis(2)), (301L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val incr = VectorOps.semanticDedupIncrementalLabels(
        corpus, incoming, "vec_id", "embedding", k = 4, threshold = 0.999)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(incr == Map(300L -> 2L, 301L -> 301L), s"incremental labels: $incr")
    // ivfTopK: hostile rows sit IN the seeding sample (whole corpus fits
    // sampleN) — the sanitized seed must not NPE or let the NaN row poison
    // centroid 0; a query copying a good row still ranks it first
    val queries = Seq((9000L, axis(5))).toDF("query_id", "query_vec")
    val ivf = VectorOps.ivfTopK(corpus, queries, k = 3, nCells = 4, nProbe = 4)
      .collect().sortBy(_.getAs[Int]("rnk"))
    assert(ivf.nonEmpty && ivf.head.getAs[Long]("vec_id") == 5L,
      s"planted match must rank first: ${ivf.map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("rnk"))).toSeq}")
    // an all-NULL-vector NON-empty corpus: kmeansFit signals typed
    // emptiness (nothing to seed from), and semanticDedup converts that to
    // ALL-SELF labels — never an empty labeling that would drop the rows
    val allNull = Seq((11L, null.asInstanceOf[Array[Float]]),
      (12L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
    assertThrows[EmptyCorpusException](VectorOps.kmeansFit(allNull, "embedding", k = 2))
    val nullLabels = VectorOps.semanticDedupLabels(
        allNull, "vec_id", "embedding", k = 2, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nullLabels == Map(11L -> 11L, 12L -> 12L),
      s"all-null corpus must self-label, not lose rows: $nullLabels")
    // an all-NaN corpus still labels (the fuzz-pinned degenerate shape):
    // the seed falls back to the raw sample and the NaN guards self-label
    val allNaN = Seq((21L, Array.fill(4)(Float.NaN)), (22L, Array.fill(4)(Float.NaN)))
      .toDF("vec_id", "embedding")
    val nanLabels = VectorOps.semanticDedupLabels(
        allNaN, "vec_id", "embedding", k = 1, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nanLabels == Map(21L -> 21L, 22L -> 22L),
      s"all-NaN corpus must self-label: $nanLabels")
  }

  test("rangeOverlapJoin rejects a non-positive binWidth instead of silently returning empty") {
    import spark.implicits._
    val iv = Seq(("A", 1L, 5L)).toDF("k", "s", "e")
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.rangeOverlapJoin(iv, iv.toDF("k", "s2", "e2"), "k", "s", "e", "s2", "e2", 0L)
    }
    assert(e.getMessage.contains("binWidth"))
  }

  test("bm25BatchTopK: every query's rows bit-match bm25TopK run per query") {
    import spark.implicits._
    // 10 real-corpus queries (every 50th doc's first 3 tokens): the batch
    // plan's shared stats/df/idf and its sort_array fold must reproduce the
    // per-query operator's driver-folded literals and reduceLeft EXACTLY —
    // the scaled-long compare tolerates zero ulps
    val corpus = docs
    val queries = corpus.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(TextOps.tokens(col("text")), 1, 3)).as("qtext"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(queries.size >= 8, s"corpus shape drifted: ${queries.size} queries")
    val got = SearchIndex.bm25BatchTopK(corpus, col("doc_id"), col("text"),
        queries.toDF("qid", "qtext"), col("qid"), col("qtext"), k = 7)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(identity).toSeq).toMap
    for ((qid, qtext) <- queries) {
      val terms = qtext.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty).distinct
      val want =
        if (terms.isEmpty) Seq.empty
        else SearchIndex.bm25TopK(corpus, col("doc_id"), col("text"), terms, k = 7)
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
      assert(got.getOrElse(qid, Seq.empty) == want,
        s"query $qid ('$qtext') diverged:\n  batch=${got.get(qid)}\n  single=$want")
    }
  }

  test("bm25BatchTopK: fold order matches bm25TopK across UTF-16/UTF-8 order divergence") {
    import spark.implicits._
    // three terms whose UTF-16 code-unit order (z < U+1F600's surrogates <
    // U+FFFD) differs from UTF-8 binary order (z < U+FFFD < U+1F600): the
    // non-associative 3-term double sum only matches if both operators fold
    // in the SAME order — the utf8BinaryOrder comparator under test
    val t2 = "\uFFFD"
    val t3 = new String(Character.toChars(0x1F600))
    assert(Seq("z", t2, t3).sorted !=
      Seq("z", t2, t3).sorted(SearchIndex.utf8BinaryOrder),
      "term triple no longer distinguishes the two orders — pick new terms")
    val corpus = (1L to 40L).map { i =>
      (i, (Seq.fill((i % 3 + 1).toInt)("z") ++ Seq.fill((i % 5 + 1).toInt)(t2) ++
        Seq.fill((i % 7 + 1).toInt)(t3) ++ Seq.fill((i % 4).toInt)("pad")).mkString(" "))
    }.toDF("doc_id", "text")
    val want = SearchIndex.bm25TopK(corpus, col("doc_id"), col("text"),
        Seq("z", t2, t3), k = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    val gotRows = SearchIndex.bm25BatchTopK(corpus, col("doc_id"), col("text"),
        Seq((9L, s"z $t2 $t3")).toDF("qid", "qtext"), col("qid"), col("qtext"), k = 40)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(identity).toSeq
    assert(gotRows == want, s"batch=$gotRows\nsingle=$want")
  }

  test("bm25BatchTopK: duplicate query rows collapse; empty-text queries and docs never match") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha beta"), (2L, "alpha alpha"), (3L, ""), (4L, "gamma"))
      .toDF("doc_id", "text")
    val qdf = Seq((10L, "alpha"), (10L, "alpha"), (11L, ""), (12L, "   "),
      (13L, null.asInstanceOf[String])).toDF("qid", "qtext")
    val out = SearchIndex.bm25BatchTopK(corpus, col("doc_id"), col("text"),
        qdf, col("qid"), col("qtext"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // empty text tokenizes to [""] on BOTH sides: queries 11/12/13 must
    // vanish (not match the empty-text doc 3), and the duplicated query 10
    // scores each matching doc exactly once
    assert(out.map(_._1).toSet == Set(10L), s"only the real query may emit rows: $out")
    assert(out.map(_._2).toSet == Set(1L, 2L), s"alpha matches docs 1,2 only: $out")
    assert(out.size == 2, s"duplicate query rows must collapse: $out")
  }

  test("bm25BatchTopK: empty corpus keeps both id types (string ids) and emits zero rows") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StringType}
    val corpus = Seq.empty[(String, String)].toDF("id", "text")
    val out = SearchIndex.bm25BatchTopK(corpus, col("id"), col("text"),
      Seq(("qa", "alpha beta")).toDF("qid", "qtext"), col("qid"), col("qtext"), k = 3)
    assert(out.schema.fieldNames.toSeq == Seq("query_id", "doc_id", "bm25_score_scaled"))
    // the empty branch must not invent LongType for a string-id corpus —
    // the main path's schema and the empty path's must be union-compatible
    assert(out.schema("query_id").dataType == StringType)
    assert(out.schema("doc_id").dataType == StringType)
    assert(out.schema("bm25_score_scaled").dataType == LongType)
    assert(out.count() == 0)
  }

  test("bm25BatchTopK: distributed fallback bit-equals the broadcast regime, with no query-side broadcast") {
    import spark.implicits._
    // broadcastQueryTermMax = 0 forces the large-query-table regime on a
    // corpus where the broadcast regime is known-good (the per-query
    // bit-match test above): scaled-long scores tolerate zero ulps, so this
    // pins the Bm25Idf expression + shuffle joins to the driver-folded
    // StrictMath.log path exactly
    val corpus = docs
    val queries = corpus.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("qid"),
        concat_ws(" ", slice(TextOps.tokens(col("text")), 1, 3)).as("qtext"))
    def rows(btm: Long) =
      SearchIndex.bm25BatchTopK(corpus, col("doc_id"), col("text"),
          queries, col("qid"), col("qtext"), k = 7, broadcastQueryTermMax = btm)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(identity).toSeq
    val broadcastRegime = rows(1000000L)
    val fallbackRegime = rows(0L)
    assert(broadcastRegime.nonEmpty && fallbackRegime == broadcastRegime,
      s"regimes diverged:\n  broadcast=$broadcastRegime\n  fallback=$fallbackRegime")
    // the fallback plan must not materialize ANY query-derived frame on the
    // driver or executors-as-broadcast: the gate exists so a 10M-prompt
    // sweep degrades to term-keyed shuffles instead of a multi-GB broadcast
    val fb = SearchIndex.bm25BatchTopK(corpus, col("doc_id"), col("text"),
      queries, col("qid"), col("qtext"), k = 7, broadcastQueryTermMax = 0L)
    fb.write.format("noop").mode("overwrite").save()
    val physical = fb.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastExchange"),
      s"fallback regime still broadcasts:\n$physical")
    // the bounded-build joins (vocab prune, idf attach: one build row per
    // (term, salt) key) stay shuffle-hash; the scoring join — whose per-key
    // query-side group is unbounded (a stopword can appear in every query)
    // — must be sort-merge so the key group buffers spillably instead of
    // as a memory-resident HashedRelation (r16 review finding)
    assert(physical.contains("ShuffledHashJoin"),
      s"fallback regime lost its bounded-build shuffle-hash joins:\n$physical")
    assert(physical.contains("SortMergeJoin"),
      s"fallback scoring join must be a spillable sort-merge join:\n$physical")
  }

  test("bm25BatchTopK: duplicate corpus ids merge per the documented tf-sum semantics") {
    import spark.implicits._
    // the re-ingested-row shape: id 2 appears twice with IDENTICAL text, so
    // the per-(term, doc, dl) tf aggregate merges the rows into one
    // candidate with their combined tf while N/Σdl count BOTH rows — the
    // documented divergence from bm25TopK (which scores rows separately).
    // Pinned against an independent in-memory replica of exactly that
    // contract, scaled-long-exact.
    val rows = Seq((1L, "alpha beta"), (2L, "alpha gamma"),
      (2L, "alpha gamma"), (3L, "beta beta alpha"))
    val corpus = rows.toDF("doc_id", "text")
    // BOTH regimes (r17): the broadcast path and the salted-join fallback
    // share the tf-merging cand aggregate, so their duplicate-id semantics
    // must pin to the SAME replica — a fallback-only divergence here would
    // otherwise hide behind the regime gate
    def got(btm: Long) = SearchIndex.bm25BatchTopK(corpus, col("doc_id"), col("text"),
        Seq((9L, "alpha beta")).toDF("qid", "qtext"), col("qid"), col("qtext"), k = 10,
        broadcastQueryTermMax = btm)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(identity).toSeq
    val k1 = 1.2; val b = 0.75
    val toks = rows.map { case (id, t) => (id, t.split("\\s+").toSeq) }
    val n = toks.size
    val avgdl = toks.map(_._2.size).sum.toDouble / n
    val terms = Seq("alpha", "beta") // UTF-8 ascending — the fold order
    // cand replica: one row per (term, doc_id, dl) with tf summed over
    // duplicate rows (identical text ⇒ identical dl ⇒ one group)
    val cand = for {
      t <- terms
      ((id, dl), tf) <- toks.groupBy(x => (x._1, x._2.size))
        .view.mapValues(_.map(_._2.count(_ == t)).sum).toSeq
      if tf > 0
    } yield (t, id, dl.toDouble, tf.toDouble)
    val dfByTerm = cand.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val idf = terms.map(t => t ->
      StrictMath.log((n - dfByTerm(t) + 0.5) / (dfByTerm(t) + 0.5) + 1.0)).toMap
    val want = cand.groupBy(_._2).view.mapValues { cs =>
      cs.map { case (t, _, dl, tf) =>
        (t, idf(t) * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl)))
      }.sortBy(_._1).map(_._2).foldLeft(0.0)(_ + _)
    }.toSeq.map { case (id, s) => (id, math.floor(s * 1e4).toLong) }
      .sortBy(identity)
    assert(got(1000000L) == want, s"broadcast regime: got=${got(1000000L)} want=$want")
    assert(got(0L) == want, s"fallback regime: got=${got(0L)} want=$want")
  }

  test("bm25BatchTopK: auto salt width derives from corpus size, explicit widths bypass") {
    import spark.implicits._
    // the derivation table (pure function): floor 32 below 8M docs, next
    // pow-2 of n/250k between, ceiling 1024 from 256M docs up — the worst
    // hot-term task is then bounded by max(250k, n/1024) at ANY corpus size
    assert(SearchIndex.autoSaltBuckets(0L) == 32)
    assert(SearchIndex.autoSaltBuckets(500000L) == 32)       // the rehearsed width
    assert(SearchIndex.autoSaltBuckets(8000000L) == 32)      // 32 × 250k — boundary
    assert(SearchIndex.autoSaltBuckets(8000001L) == 64)
    assert(SearchIndex.autoSaltBuckets(100000000L) == 512)   // 400 → next pow2
    assert(SearchIndex.autoSaltBuckets(1000000000L) == 1024) // the 100-TB stopword df
    assert(SearchIndex.autoSaltBuckets(Long.MaxValue / 2) == 1024) // ceiling holds
    // overflow hardening (r17 ADVICE): the (n + t - 1)/t ceiling-division
    // form wraps negative near Long.MaxValue and would silently derive the
    // 32 FLOOR for the largest corpora — the quotient+remainder form holds
    assert(SearchIndex.autoSaltBuckets(Long.MaxValue - 1L) == 1024)
    // the SCORING width (r18): minimal sufficient replication — derived
    // from the observed max df, n-bound as ceiling. A cold vocabulary over
    // a 1B-doc corpus stays at the ×32 floor instead of paying ×1024
    // replication of the query-derived join sides for hotness it no term has
    assert(SearchIndex.scoringSaltWidth(1000000000L, 100000L) == 32)     // cold vocab
    assert(SearchIndex.scoringSaltWidth(1000000000L, 30000000L) == 128)  // warm term
    assert(SearchIndex.scoringSaltWidth(1000000000L, 1000000000L) == 1024) // stopword
    assert(SearchIndex.scoringSaltWidth(8000000L, 1000000000L) == 32)    // n caps df
    // end-to-end: the default (0) derives prune width from n and scoring
    // width from max(df), the probes record both; an explicit width pins
    // BOTH joins — results identical at every width, including one far
    // above the floor (256: the wide literal-array explode path the 100-TB
    // fallback depends on executes here, not first on a 100M-doc corpus)
    val corpus = (0L until 40L).map(i => (i, s"tok$i shared")).toDF("doc_id", "text")
    val queries = Seq((1L, "shared tok3")).toDF("qid", "qtext")
    def run(salt: Int) = SearchIndex.bm25BatchTopK(corpus, col("doc_id"), col("text"),
        queries, col("qid"), col("qtext"), k = 5,
        broadcastQueryTermMax = 0L, fallbackSaltBuckets = salt)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(identity).toSeq
    val auto = run(0)
    assert(SearchIndex.lastFallbackSaltBuckets == 32,
      s"n=40 must derive the floor scoring width 32, got ${SearchIndex.lastFallbackSaltBuckets}")
    assert(SearchIndex.lastFallbackPruneSaltBuckets == 32,
      s"n=40 must derive the floor prune width 32, got ${SearchIndex.lastFallbackPruneSaltBuckets}")
    val explicit = run(7)
    assert(SearchIndex.lastFallbackSaltBuckets == 7 &&
        SearchIndex.lastFallbackPruneSaltBuckets == 7,
      s"explicit width must pin both joins, got scoring=${SearchIndex.lastFallbackSaltBuckets} " +
        s"prune=${SearchIndex.lastFallbackPruneSaltBuckets}")
    val wide = run(256)
    assert(SearchIndex.lastFallbackSaltBuckets == 256 &&
        SearchIndex.lastFallbackPruneSaltBuckets == 256,
      s"explicit 256 must be honored, got scoring=${SearchIndex.lastFallbackSaltBuckets} " +
        s"prune=${SearchIndex.lastFallbackPruneSaltBuckets}")
    assert(auto.nonEmpty && explicit == auto && wide == auto,
      s"salt width must never change results: auto=$auto explicit7=$explicit wide256=$wide")
    // the probes are FALLBACK-ONLY (r17 ADVICE): a broadcast-regime call
    // must not leave a stale fallback width visible
    SearchIndex.bm25BatchTopK(corpus, col("doc_id"), col("text"),
        queries, col("qid"), col("qtext"), k = 5,
        broadcastQueryTermMax = 1000000L).collect()
    assert(SearchIndex.lastFallbackSaltBuckets == -1 &&
        SearchIndex.lastFallbackPruneSaltBuckets == -1,
      "broadcast-regime call must reset the salt probes to -1")
    assertThrows[IllegalArgumentException](run(-1))
  }

  test("BPE vocabTopK: no-op at K >= vocab; truncation trains exactly on the head vocabulary") {
    import spark.implicits._
    // head words (wf 5) carry the merges; a distinct-word tail (wf 1)
    // inflates the vocabulary without mattering — the production shape
    // vocabTopK exists for. K = |head| must reproduce training on the
    // head alone; K >= |vocab| must reproduce the full training exactly.
    val head = Seq("alpha", "alps", "alto", "beta")
    val tail = (0 until 200).map(i => s"z${i}q${i % 7}")
    val corpus = Seq((1L, (head.flatMap(w => Seq.fill(5)(w)) ++ tail).mkString(" ")))
      .toDF("doc_id", "text")
    val headOnly = Seq((1L, head.flatMap(w => Seq.fill(5)(w)).mkString(" ")))
      .toDF("doc_id", "text")
    def table(df: org.apache.spark.sql.DataFrame, topK: Int) =
      LanguageModel.bpeTrainMerges(df, col("text"), numMerges = 4, vocabTopK = topK)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val full = table(corpus, 0)
    assert(table(corpus, 1000) == full, "K above the vocabulary must be a no-op")
    assert(table(corpus, head.length) == table(headOnly, 0),
      s"K=|head| must equal training on the head alone: " +
        s"${table(corpus, head.length)} vs ${table(headOnly, 0)}")
    // under truncation the head's most frequent pair leads: 'al' from
    // alpha/alps/alto (wf 15); in FULL training the 200-word tail's
    // aggregate pairs dominate instead — the two tables genuinely differ,
    // which is what makes the K=|head| equivalence above non-vacuous
    assert(table(corpus, head.length).head._2 == "a" &&
      table(corpus, head.length).head._3 == "l",
      s"truncated head merge should be (a,l): ${table(corpus, head.length)}")
    assert(full != table(corpus, head.length),
      "tail must matter in full training, or this spec tests nothing")
  }

  test("BPE byte-budget gate: a long-word corpus whose ROW count fits routes to the distributed host") {
    import spark.implicits._
    // the admission rule: BOTH gates must pass, each alone must refuse
    assert(LanguageModel.driverHostFits(100L, 100L, 4000000L, 6L << 30))
    assert(!LanguageModel.driverHostFits(100L, 1L << 26, 4000000L, 1L << 30),
      "67M chars x 160 B/char must overflow a 1 GiB budget at ANY row count")
    assert(!LanguageModel.driverHostFits(5000001L, 100L, 5000000L, 6L << 30))
    // overflow hardening (r16): a pathological chars count whose ×160
    // product wraps Long must still REFUSE — the gate compares divisively,
    // so a negative product can never admit the collect it guards against
    assert(!LanguageModel.driverHostFits(100L, Long.MaxValue / 100L, Long.MaxValue, 6L << 30),
      "a Long-overflowing chars x bytes product must refuse, not wrap negative and admit")
    // end-to-end: 40 rows of 2,000-char words — far inside the 4M row gate,
    // ~80k chars ≈ 13 MB estimated footprint — so with driverBytesMax = 1 MB
    // the BYTE gate alone must refuse the driver collect.
    val rnd = new scala.util.Random(7)
    val corpus = (0 until 40).map(i =>
        (i.toLong, (0 until 2000).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString))
      .toDF("doc_id", "text").localCheckpoint()
    def table(bytesMax: Long) =
      LanguageModel.bpeTrainMerges(corpus, col("text"), numMerges = 3,
          driverBytesMax = bytesMax)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // host selection is observed through the operator's own decision probe
    // (lastTrainHost), not persistent-RDD census deltas — those were
    // brittle against unrelated caching changes and ContextCleaner races
    val viaDriver = table(6L << 30)
    assert(LanguageModel.lastTrainHost == "driver",
      s"a fitting corpus should take the driver loop, took ${LanguageModel.lastTrainHost}")
    val viaGate = table(1L << 20)
    assert(LanguageModel.lastTrainHost == "distributed",
      s"the byte gate should route to the distributed loop, took ${LanguageModel.lastTrainHost}")
    assert(viaGate == viaDriver && viaGate.length == 3,
      s"fallback table diverged:\n  gate=$viaGate\n  driver=$viaDriver")
  }

  test("BPE distributed train: per-round cost stays flat (64 vs 32 ranks) and matches the driver host") {
    // CI twin of the BpeVolume replace-chain-depth rehearsal (2M words,
    // 256 ranks, offline): with the every-16-rounds vocab re-checkpoint the
    // distributed loop's per-round cost is flat, so t(64) ≈ 2·t(32); an
    // unbounded lineage chain grows per-round cost linearly (O(rounds²)
    // total → ratio ~4). driverVocabMax = 0 forces the distributed path —
    // this small vocab would otherwise be absorbed by the driver loop.
    // Synthetic corpus: deterministic words over a 12-letter alphabet so
    // 64 distinct merges are sustainable.
    val rnd = new scala.util.Random(42)
    val words = Array.fill(3000)(
      (0 until (4 + rnd.nextInt(7))).map(_ => ('a' + rnd.nextInt(12)).toChar).mkString)
    val corpus = spark.createDataFrame(
      words.grouped(20).zipWithIndex
        .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq)
      .toDF("doc_id", "text").localCheckpoint()
    def train(rounds: Int): (Double, Seq[(Int, String, String, Long)]) = {
      val t0 = System.nanoTime()
      val m = LanguageModel
        .bpeTrainMerges(corpus, col("text"), numMerges = rounds, driverVocabMax = 0L)
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      assert(m.length == rounds, s"corpus must sustain $rounds merges, got ${m.length}")
      ((System.nanoTime() - t0) / 1e9, m)
    }
    // The wall-clock half (t(64)/t(32) < 3.0) is noise-sensitive — GC or a
    // loaded neighbor can spuriously fail it and block unrelated CI runs —
    // so it runs only under GRAFT_TIMING_CHECKS=1 (the BpeVolume offline
    // rehearsal keeps the always-on version of this claim); the TABLE
    // equality below runs unconditionally.
    val dist64 =
      if (sys.env.get("GRAFT_TIMING_CHECKS").contains("1")) {
        train(16) // warmup: JIT + codegen caches, so the ratio reflects chain depth
        val (tHalf, _) = train(32)
        val (tFull, d64) = train(64)
        val ratio = tFull / tHalf
        info(f"t(64)=$tFull%.1fs t(32)=$tHalf%.1fs ratio=$ratio%.2f (bound 3.0)")
        assert(ratio < 3.0,
          f"replace-chain depth not bounded: doubling ranks cost $ratio%.2fx")
        d64
      } else train(64)._2
    // and the r13 driver in-memory host replays the identical merge table
    val drv64 = LanguageModel
      .bpeTrainMerges(corpus, col("text"), numMerges = 64)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(drv64 == dist64,
      s"driver/distributed 64-rank tables diverge:\n  drv=$drv64\n  dist=$dist64")
  }
}
