package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the CCNet/KenLM-style
  * perplexity quality signal, as a pure Spark plan: fit a bigram LM with
  * add-α smoothing on the corpus itself, then score every document by its
  * average per-bigram negative log-likelihood. Low-perplexity docs look
  * like the corpus (keep), high-perplexity docs are gibberish, boilerplate
  * code, or wrong-language text (filter or down-weight).
  *
  * Scale shape:
  *   - bigram occurrences are a map-side posexplode of stride-1 2-grams;
  *   - the model is two hash-aggregates over the SAME occurrence stream
  *     (bigram counts c12, left-context counts c1 = Σ_w2 c12) — map-side
  *     combine collapses the Zipf head before the shuffle;
  *   - the model tables join each other on the context word FIRST (both
  *     are ≤ |vocab²| aggregates, tiny next to the corpus), then the
  *     occurrence stream joins the enriched model ONCE on the bigram key.
  *     The build side is unique per key, so a hot bigram ("of the") only
  *     skews probe partition sizes — AQE skew-join splits those;
  *   - per-doc scoring is one count/sum aggregate.
  *
  * Determinism contract (the repo-wide oracle rule): ln() is libm-touching,
  * so each per-term log-prob is floor-truncated to 1e-4 and carried as an
  * exact BIGINT (`floor(ln(p)·1e4)`); per-doc sums and the final average
  * are integer arithmetic, so the result is independent of partial-
  * aggregation order AND of last-ulp libm differences between engines
  * (a term would have to sit within ~3e-15 of a 1e-4 grid line to differ —
  * odds ~3e-11 per term). `avg_nll = -Σterm·1e-4 / n` is reported with six
  * exact decimals; perplexity is `exp(avg_nll)`, left to the caller as a
  * display transform (exp would reintroduce the libm dependence).
  */
object LanguageModel {

  /** Per-document bigram-LM scores: (id, n_bigrams, sum_logp_scaled,
    * avg_nll). `vocabSize` is the smoothing denominator's V — pass the
    * corpus' distinct-token count (a bounded one-scalar action, same idiom
    * as TF-IDF's N). α is fixed at 0.5 so c+α stays exactly representable
    * in a double. */
  def bigramNllScores(df: DataFrame, id: Column, text: Column, vocabSize: Long): DataFrame =
    bigramNllFromTokens(
      df.select(id.as("id"), TextOps.tokens(text).as("toks")).localCheckpoint(false),
      vocabSize)

  /** [[bigramNllScores]] with V = the corpus' own distinct-token count,
    * computed from the SAME materialized token frame the scoring plan
    * reads — the whole operator touches `df` exactly once (callers that
    * ran a separate vocab-count scan paid a 4th corpus pass). */
  def bigramNllScoresCorpusVocab(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks =
      df.select(id.as("id"), TextOps.tokens(text).as("toks")).localCheckpoint(false)
    val v = toks.select(explode(col("toks")).as("tok")).distinct().count()
    bigramNllFromTokens(toks, v)
  }

  /** Scoring plan over a (id, toks) frame. The occurrence stream feeds
    * TWO consumers (the c12 aggregate and the probe join); the caller
    * materializes the compact token frame once (localCheckpoint — the
    * duplicateSpans idiom) so each consumer re-derives bigrams with a
    * cheap map-side explode over stored doc rows instead of re-scanning
    * the corpus. The context counts need NO third pass: c1(w1) = Σ_w2
    * c12(w1, w2) by definition (every bigram occurrence contributes once
    * to both), so c1 is a vocab²-sized re-aggregate of the c12 table —
    * at 100 TB that's a free third of the model-fit cost. */
  private def bigramNllFromTokens(toks: DataFrame, vocabSize: Long): DataFrame = {
    val occ = toks
      .filter(size(col("toks")) >= 2)
      .select(col("id"),
        explode(transform(sequence(lit(1), size(col("toks")) - 1),
          i => concat_ws(" ", slice(col("toks"), i, lit(2))))).as("bg"))
    val c12 = occ.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val c1 = c12
      .groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val model = c12
      .join(c1, "w1")
      .select(col("bg"),
        floor(log((col("c12").cast("double") + 0.5) /
          (col("c1").cast("double") + 0.5 * vocabSize)) * 1e4).cast("long")
          .as("logp_scaled"))
    occ.join(model, "bg")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("logp_scaled")).as("sum_logp_scaled"))
      .select(col("id"), col("n_bigrams"), col("sum_logp_scaled"),
        (floor((-col("sum_logp_scaled") * 100L) / col("n_bigrams")) / 1e6).as("avg_nll"))
  }

  /** BPE merge-candidate counting — the first iteration of byte-pair-
    * encoding tokenizer training, the part that touches the full corpus:
    * corpus-weighted adjacent-character-pair frequencies over the word
    * vocabulary, top `k` pairs = the merge candidates.
    *
    * The corpus collapses to its word-frequency table FIRST (one
    * hash-aggregate, map-side combine takes the Zipf head out of the
    * shuffle); pair explosion then runs over DISTINCT words only —
    * O(vocab · word-length), independent of corpus size. Subsequent BPE
    * iterations re-run this over the re-segmented vocabulary with the
    * chosen merge applied — each iteration stays vocab-sized, which is why
    * BPE training at 100 TB is one corpus pass + cheap vocab-local loops. */
  def bpeMergeCandidates(df: DataFrame, text: Column, k: Int = 20): DataFrame = {
    val wf = df
      .select(explode(bpeWords(text)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wf"))
      .filter(length(col("word")) >= 2)
    wf.select(col("wf"),
        explode(transform(sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("wf")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
  }

  /** Sentinels wrapping each sub-word unit in the segmentation string:
    * `"low" → "␂l␃␂o␃␂w␃"`. Distinct open/close markers make literal
    * `replace` of `␂a␃␂b␃ → ␂ab␃` consume whole adjacent units with NO
    * overlapping matches — left-to-right non-overlapping replace is
    * exactly BPE's merge application ("aaa" under (a,a) → "aa"+"a").
    * The sentinels are made structurally safe by [[bpeWords]]: every BPE
    * entry point strips U+0000-U+0008 from tokens first, so a sentinel
    * byte can never be CONTENT inside a segmentation string. */
  private[operators] val SegOpen = "\u0002"
  private[operators] val SegClose = "\u0003"

  /** The word stream every BPE entry point trains/encodes over: whitespace
    * tokens with U+0000-U+0008 stripped and then-empty tokens dropped.
    * Control characters DO survive whitespace tokenization (`\\s+` excludes
    * them), and on a hostile web corpus a literal U+0002/U+0003 inside a
    * token would silently corrupt the sentinel segmentation - the token is
    * mis-split at the embedded sentinel and the learned merges go wrong
    * with no error. U+0000-U+0008 carry no printable content, so stripping
    * them is a no-op on clean corpora (the DuckDB oracle replay stays
    * value-exact) and a correctness fix on dirty ones. TextContractProps
    * fuzzes this with control-char corpora. */
  private[operators] def bpeWords(text: Column): Column =
    filter(TextOps.tokens(regexp_replace(text, "[\\x00-\\x08]", "")),
      t => length(t) > 0)

  /** Full BPE tokenizer training (Sennrich-style): `numMerges` rounds of
    * (count corpus-weighted adjacent sub-word pairs over the vocabulary →
    * take the most frequent, ties broken lexicographically → merge it
    * everywhere). Returns the learned merge table (rank, a, b, n) — THE
    * artifact a BPE tokenizer ships.
    *
    * Scale shape: the corpus is touched ONCE (the word-frequency
    * hash-aggregate, map-side combine collapsing the Zipf head before the
    * shuffle); every training round after that is vocabulary-sized —
    * pair explosion over distinct words, one TakeOrdered(1) argmax, one
    * narrow literal `replace` re-segmentation. The vocabulary frame is
    * localCheckpoint-ed up front so the per-round jobs re-read
    * materialized rows, not the corpus. Driver state is one (a, b, n) row
    * per round plus the ≤numMerges merge table — bounded, the k-means
    * centroid idiom.
    *
    * Pair counting is overlapping (every adjacent index pair, the
    * classic get_stats), merge application non-overlapping left-to-right
    * — both via the sentinel-string representation, so the DuckDB oracle
    * can mirror each round with the same substr/split/replace calls.
    *
    * Replace-chain depth is BOUNDED: each round appends one literal
    * `replace` to the plan over the last checkpointed vocab, so round r
    * would re-apply r prior replaces — O(rounds²/2) replace evaluations
    * across training. Re-checkpointing the vocab every `checkpointEvery`
    * rounds truncates the chain to <`checkpointEvery`, making per-round
    * cost flat: O(rounds · checkpointEvery) total replace work plus one
    * vocab materialization per window — the shape that holds at a
    * production 32k-rank budget (BpeVolume rehearses 256 ranks and checks
    * the two-halves wall-time ratio). */
  def bpeTrainMerges(
      df: DataFrame, text: Column, numMerges: Int = 6,
      checkpointEvery: Int = 16): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    var vocab = df
      .select(explode(bpeWords(text)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wf"))
      .filter(length(col("word")) >= 2)
      .select(col("wf"),
        regexp_replace(col("word"), "(.)", s"$SegOpen$$1$SegClose").as("seg"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val tk = split(expr("substring(seg, 2, length(seg) - 2)"), s"$SegClose$SegOpen")
      val best = vocab
        .select(col("wf"), tk.as("tk"))
        .filter(size(col("tk")) >= 2)
        .select(col("wf"), explode(transform(sequence(lit(1), size(col("tk")) - 1),
          i => struct(element_at(col("tk"), i).as("a"),
            element_at(col("tk"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("wf")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (a, b, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Row(r, a, b, n)
        // lit() args, not SQL-literal splicing: tokens may contain quotes
        vocab = vocab.withColumn("seg", call_function("replace", col("seg"),
          lit(SegOpen + a + SegClose + SegOpen + b + SegClose),
          lit(SegOpen + a + b + SegClose)))
        r += 1
        if (r % checkpointEvery == 0) vocab = vocab.localCheckpoint()
      }
    }
    val schema = StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("a", StringType, nullable = false),
      StructField("b", StringType, nullable = false),
      StructField("n", LongType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(merges.toArray: _*), schema)
  }

  /** BPE ENCODE — apply a learned merge table to the corpus, returning
    * per-document (n_words, n_units): the token-budget accounting a
    * training-data pipeline runs after tokenizer training. Merges apply
    * in rank order (the BPE encode rule), each rank one left-to-right
    * non-overlapping pass, compiled into ONE native codegen'd expression
    * ([[graft.functions.NativeHashes.BpeUnits]]) applied over the
    * DISTINCT word vocabulary only; the corpus token stream then joins
    * the per-word unit count (build side unique per word, so Zipf-hot
    * words only skew probe partition sizes — AQE-split). One corpus pass
    * + vocab-sized merge work.
    *
    * The native expression holds the whole table in one plan literal and
    * skips inapplicable ranks in O(1) per rank (unit-membership set), so
    * a production 32k-rank tokenizer is one expression, not a 32k-call
    * replace chain — the r11 plan-literal chain's O(100)-rank ceiling is
    * gone (BpeVolume's `encode32k` mode rehearses it). Results are
    * bit-identical to the sentinel replace chain the DuckDB oracle still
    * replays — q_bpe_encode's hash match IS the cross-check, and the
    * corpus-shape fuzz family re-proves it on hostile corpora. */
  def bpeEncode(
      df: DataFrame, id: Column, text: Column, merges: Seq[(String, String)]): DataFrame = {
    graft.functions.NativeHashes.register(df.sparkSession)
    val toks = df.select(id.as("id"), explode(bpeWords(text)).as("word"))
    val mergesLit = graft.functions.NativeHashes.bpeMergesLiteral(merges)
    val vocab = toks.select(col("word")).distinct()
      .select(col("word"),
        size(call_function("bpe_units", col("word"), lit(mergesLit))).as("n_units"))
    toks.join(vocab, "word")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_units")).as("n_units"))
  }
}
