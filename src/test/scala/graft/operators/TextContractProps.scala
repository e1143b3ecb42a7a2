package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Corpus-SHAPE property fuzzing for the text/LLM operator family — the
  * verification layer the SQL grammar fuzzer (nine modes) and the ODF
  * request fuzzer (EngineContractProps) don't cover: random HOSTILE
  * corpora — empty docs, whitespace-only docs, single-token docs, huge
  * docs, unicode (combining marks, astral plane, CJK, NBSP), control
  * characters (including the BPE sentinel bytes U+0002/U+0003),
  * regex/quote metacharacters, duplicated texts and shared boilerplate
  * paragraphs — checked DIFFERENTIALLY against exact in-memory models.
  *
  * Each model re-implements the operator's documented CONTRACT over plain
  * Scala collections, mirroring the engine-visible semantics precisely:
  *   - tokens = split(trim(lower(text)), "\\s+"): Spark `trim` strips
  *     ASCII space ONLY, and Java-regex split with limit −1 KEEPS
  *     leading/trailing empty tokens — so "\tx" tokenizes to ["", "x"]
  *     and "" to [""] in both engine and model;
  *   - string ordering (BPE tie-breaks) is UTF8-binary = CODE POINT
  *     order, not Java's UTF-16 code-unit order (they differ for astral
  *     chars vs U+E000–U+FFFF);
  *   - `length`/`substring` count code points, so models iterate
  *     codePoints, never Java chars;
  *   - BPE merge application (literal sentinel-string replace,
  *     left-to-right non-overlapping) is modeled as the equivalent
  *     unit-list scan — sentinels can only match at unit boundaries
  *     because [[LanguageModel.bpeWords]] strips U+0000–U+0008;
  *   - md5-bucket arithmetic replays the exact double operations in the
  *     exact order (mixture rates) and the same hex-prefix parses.
  *
  * 505 random corpora run across the families in CI; the generator,
  * models, and per-family checks live in [[TextContractChecks]], and the
  * [[TextFuzz]] main sweeps arbitrary fresh-seed ranges offline (banked
  * in COVERAGE.md). Every failure message carries the seed and the
  * corpus, so a divergence reproduces with `new Random(seed)` directly.
  */
class TextContractProps extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-text-contract-props")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import TextContractChecks._

  test("duplicateSpans + removeDuplicateSpans match the model on random corpora") {
    for (seed <- 0L until 80L) checkSpans(spark, seed)
  }

  test("bigramNllScoresCorpusVocab matches the exact-integer model on random corpora") {
    for (seed <- 100L until 220L) checkBigram(spark, seed)
  }

  test("BPE train + encode match the Sennrich model on random hostile corpora") {
    for (seed <- 300L until 330L) checkBpe(spark, seed)
  }

  test("leakageSafeSplit matches the model and is stable under monotone-id growth") {
    for (seed <- 400L until 480L) checkSplit(spark, seed)
  }

  test("leakageSafeSplit: a non-monotone insertion re-elects the rep (documented hazard)") {
    import spark.implicits._
    // the documented growth caveat (Sampling.scala): a duplicate arriving
    // with a SMALLER id than its class rep re-elects the rep — assignments
    // are only stable under monotone id growth. Pin the mechanism.
    val df = Seq((10L, "same text"), (11L, "same text")).toDF("doc_id", "text")
    val before = Sampling.leakageSafeSplit(df, col("doc_id"), TextOps.fingerprint(col("text")))
      .select("id", "rep").as[(Long, Long)].collect().toMap
    assert(before.values.toSet == Set(10L))
    val grownBad = Seq((10L, "same text"), (11L, "same text"), (3L, "same text"))
      .toDF("doc_id", "text")
    val after = Sampling.leakageSafeSplit(grownBad, col("doc_id"), TextOps.fingerprint(col("text")))
      .select("id", "rep").as[(Long, Long)].collect().toMap
    assert(after.values.toSet == Set(3L),
      "smaller-id duplicate must re-elect the class rep (the documented hazard)")
  }

  test("mixtureSample matches the replayed rate arithmetic on random corpora") {
    for (seed <- 500L until 570L) checkMixture(spark, seed)
  }

  test("crossSourceOverlap matches the distinct-gram model on random corpora") {
    for (seed <- 600L until 720L) checkOverlap(spark, seed)
  }

  test("TextOps scalar primitives match their models on random corpora") {
    for (seed <- 900L until 1000L) checkTextOps(spark, seed)
  }

  test("text operators are partitioning-independent on hostile corpora") {
    for (seed <- 800L until 805L) checkPartitioning(spark, seed)
  }

  // --- dedup/decontamination family (r13): 500 random corpora in CI --------

  test("MinHash+LSH candidates + removeDuplicates match the model on random corpora") {
    for (seed <- 1100L until 1160L) checkMinhash(spark, seed)
  }

  test("SimHash pairs match the chunk/Hamming model on random corpora") {
    for (seed <- 1200L until 1300L) checkSimhash(spark, seed)
  }

  test("n-gram Jaccard pairs match the df-capped set model on random corpora") {
    for (seed <- 1300L until 1400L) checkJaccard(spark, seed)
  }

  test("exact + fuzzy decontamination match their models on planted-overlap corpora") {
    for (seed <- 1400L until 1500L) checkDecontaminate(spark, seed)
  }

  test("both connected-components hosts match union-find on random graphs") {
    for (seed <- 1500L until 1540L) checkComponents(spark, seed)
  }

  test("semanticDedupLabels (k=1) matches the label-contract model on hostile embeddings") {
    for (seed <- 1600L until 1700L) checkSemanticLabels(spark, seed)
  }

  // --- sampling/sketch/index family (r13): 500 random corpora in CI --------

  test("sampling operators match the exact md5-arithmetic models on hostile corpora") {
    for (seed <- 1700L until 1800L) checkSampling(spark, seed)
  }

  test("bloomAntiJoin / bloomReducedJoin stay bit-identical to the plain joins") {
    for (seed <- 1800L until 1900L) checkBloomDedup(spark, seed)
  }

  test("heavyHitters: exact top-k above the vocab cap; guarantees hold at tiny caps") {
    for (seed <- 1900L until 2000L) checkHeavyHitters(spark, seed)
  }

  test("packIntoBins matches the range-frame prefix-sum model") {
    for (seed <- 2000L until 2100L) checkPacking(spark, seed)
  }

  test("invertedIndex matches the exact postings model at hostile caps") {
    for (seed <- 2100L until 2200L) checkInvIndex(spark, seed)
  }

  test("bm25TopK matches the bit-exact scoring replica on hostile corpora") {
    for (seed <- 2200L until 2300L) checkBm25(spark, seed)
  }

  test("bm25BatchTopK matches bm25TopK per query on hostile corpora and query tables") {
    for (seed <- 2400L until 2460L) checkBm25Batch(spark, seed)
  }
}
