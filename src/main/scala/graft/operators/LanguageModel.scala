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
  def bigramNllScores(df: DataFrame, id: Column, text: Column, vocabSize: Long): DataFrame = {
    val occ = df
      .select(id.as("id"), TextOps.tokens(text).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("id"),
        explode(transform(sequence(lit(1), size(col("toks")) - 1),
          i => concat_ws(" ", slice(col("toks"), i, lit(2))))).as("bg"))
    val c12 = occ.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    val c1 = occ
      .select(substring_index(col("bg"), " ", 1).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val model = c12
      .withColumn("w1", substring_index(col("bg"), " ", 1))
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
      .select(explode(TextOps.tokens(text)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wf"))
      .filter(length(col("word")) >= 2)
    wf.select(col("wf"),
        explode(transform(sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("wf")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
  }
}
