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
    bigramNllFromText(
      df.select(id.as("id"), text.as("text"),
        size(TextOps.tokens(text)).as("n_tokens")).localCheckpoint(false),
      vocabSize)

  /** [[bigramNllScores]] with V = the corpus' own distinct-token count,
    * computed from the SAME materialized frame the scoring plan reads —
    * the whole operator touches `df` exactly once (callers that ran a
    * separate vocab-count scan paid a 4th corpus pass). */
  def bigramNllScoresCorpusVocab(df: DataFrame, id: Column, text: Column): DataFrame = {
    val frame = df.select(id.as("id"), text.as("text"),
      size(TextOps.tokens(text)).as("n_tokens")).localCheckpoint(false)
    val v = frame.select(explode(TextOps.tokens(col("text"))).as("tok"))
      .distinct().count()
    bigramNllFromText(frame, v)
  }

  /** Scoring plan over a checkpointed (id, text, n_tokens) frame. The
    * occurrence stream feeds TWO consumers (the c12 aggregate and the
    * probe join); the caller materializes the compact frame once
    * (localCheckpoint — the duplicateSpans idiom) so each consumer
    * re-derives bigrams with a cheap map-side explode. Bigrams ride the
    * native codegen'd word_shingles(text, 2) — byte-identical to the
    * interpreted transform/slice/concat_ws tree it replaces — guarded by
    * n_tokens >= 2, which both matches the old size-filter semantics and
    * keeps word_shingles' short-doc whole-text fallback out of the
    * stream. The context counts need NO third pass: c1(w1) = Σ_w2
    * c12(w1, w2) by definition (every bigram occurrence contributes once
    * to both), so c1 is a vocab²-sized re-aggregate of the c12 table —
    * at 100 TB that's a free third of the model-fit cost. */
  private def bigramNllFromText(frame: DataFrame, vocabSize: Long): DataFrame = {
    graft.functions.NativeHashes.register(frame.sparkSession)
    val occ = frame
      .filter(col("n_tokens") >= 2)
      .select(col("id"), explode(TextOps.shingles(col("text"), 2)).as("bg"))
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
    * shuffle) — everything after is vocabulary-sized, and the vocabulary
    * is TINY next to the corpus (distinct words only; ~10M entries covers
    * a web-scale corpus). That asymmetry picks the merge-loop host:
    *
    *   - **driver in-memory loop** (vocab ≤ `driverVocabMax` rows AND
    *     estimated boxed footprint ≤ `driverBytesMax`): the (word, wf)
    *     table is collected once and the merge rounds run as the classic
    *     incremental Sennrich loop — pair stats plus an inverted
    *     pair→words index, so a round touches ONLY the words containing
    *     the merged pair, with a lazy max-heap (stale entries discarded
    *     on pop) giving an O(log #pairs) argmax. No Spark jobs inside the
    *     loop at all: a production 32k-rank budget that cost ~32k
    *     sequential job launches (~14h of pure scheduling latency) in the
    *     distributed loop runs in minutes (BpeVolume `train4096`
    *     rehearses 4,096 ranks over the 2M-word vocab). Fitness is
    *     decided by ONE vocab-sized aggregate over the checkpointed frame
    *     — (row count, Σ word length) — BEFORE anything is collected: a
    *     row gate alone would green-light collecting a 4M-row vocabulary
    *     of pathologically long words whose per-code-point unit arrays
    *     and pair→words index run to tens of GB of boxed driver state
    *     (the loop's footprint is ≈[[DriverBytesPerChar]] per character,
    *     measured, not per ROW — see SCALE.md for driver sizing);
    *   - **distributed loop** (fallback): per round, pair explosion over
    *     the localCheckpoint-ed distinct-word frame, one TakeOrdered(1)
    *     argmax, one narrow literal `replace` re-segmentation. Driver
    *     state is one (a, b, n) row per round — bounded. Flat per-round
    *     cost but wall-clock-linear in rank count (one job per rank);
    *     correct at ANY vocabulary size.
    *
    * `vocabTopK > 0` truncates the TRAINING vocabulary to the top-K words
    * by (wf desc, word asc) first — one TakeOrdered (per-partition heaps,
    * no global sort) — which is how a 100 TB corpus whose distinct-word
    * table outgrows the driver threshold still trains there: merges are
    * then exact over the head vocabulary, and the excluded Zipf tail
    * (each word contributing its own tiny wf to pair counts) is the same
    * frequency floor production tokenizers apply before training. K at or
    * above the true vocabulary size is a no-op (the table is identical,
    * spec-pinned). Encoding is unaffected — it applies the learned table
    * to every word of the full corpus.
    *
    * Both hosts implement the SAME contract — overlapping pair counts
    * (every adjacent index pair, the classic get_stats), argmax ties
    * broken by (a, b) in UTF8-binary = code-point order, merge applied
    * left-to-right non-overlapping — so the path choice is invisible in
    * the output (the corpus-shape fuzz family checks driver vs
    * distributed vs the independent model on every random corpus, and
    * the DuckDB oracle replays the sentinel-replace formulation).
    *
    * Distributed-loop replace-chain depth is BOUNDED: each round appends
    * one literal `replace` to the plan over the last checkpointed vocab,
    * so round r would re-apply r prior replaces — O(rounds²/2) replace
    * evaluations across training. Re-checkpointing the vocab every
    * `checkpointEvery` rounds truncates the chain to <`checkpointEvery`,
    * making per-round cost flat (BpeVolume rehearses 256 ranks
    * distributed and checks the two-halves wall-time ratio). */
  def bpeTrainMerges(
      df: DataFrame, text: Column, numMerges: Int = 6,
      checkpointEvery: Int = 16,
      driverVocabMax: Long = 4000000L,
      vocabTopK: Int = 0,
      driverBytesMax: Long = 6L << 30): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val wfAll = df
      .select(explode(bpeWords(text)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wf"))
      .filter(length(col("word")) >= 2)
    val wfRaw =
      if (vocabTopK > 0) wfAll.orderBy(col("wf").desc, col("word")).limit(vocabTopK)
      else wfAll
    // materialize the (word, wf) table ONCE (lazy checkpoint — the first
    // action below runs the one corpus pass): the driver-fit probe and, on
    // a too-big vocab, the distributed fallback both read the checkpointed
    // frame, so a failed probe costs a vocab-sized re-read — NOT a second
    // corpus-scale scan+aggregate (the operator's one-corpus-pass contract)
    val driverWanted = driverVocabMax > 0 && driverVocabMax < Int.MaxValue - 1
    val wf = if (driverWanted) wfRaw.localCheckpoint(false) else wfRaw
    val collected: Option[Array[Row]] =
      if (driverWanted) {
        // fit probe: rows AND bytes, from one vocab-sized aggregate over
        // the checkpointed frame (this is the action that materializes the
        // checkpoint — the corpus-scale pass still runs exactly once). The
        // byte estimate must come BEFORE any collect: a long-word corpus
        // can blow the driver at a row count the gate would admit, and by
        // then the collect itself is the OOM.
        val fit = wf.agg(count(lit(1)).as("rows"),
          coalesce(sum(length(col("word")).cast("long")), lit(0L)).as("chars"))
          .collect()(0)
        val rows = fit.getLong(0)
        if (driverHostFits(rows, fit.getLong(1), driverVocabMax, driverBytesMax))
          Some(wf.collect())
        else None
      } else None
    trainHostProbe.set(if (collected.isDefined) "driver" else "distributed")
    if (collected.isDefined)
      return bpeTrainMergesDriver(
        spark, collected.get.map(r => (r.getString(0), r.getLong(1))), numMerges)
    var vocab = wf
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
    spark.createDataFrame(
      java.util.Arrays.asList(merges.toArray: _*), mergeSchema)
  }

  /** Test/diagnostic probe: which host ("driver" | "distributed") the last
    * [[bpeTrainMerges]] call ON THIS THREAD routed to. Written only at the
    * admission decision; never read by the operator itself. The gate spec
    * asserts on THIS instead of inferring the host from persistent-RDD
    * census deltas, which were brittle against unrelated caching changes
    * and ContextCleaner races (r15 advice). Thread-local, not JVM-global
    * (r16 review): concurrent trainings — parallel suites, two sessions in
    * one JVM — each observe their own call's decision, never a racing
    * write from the other. */
  private val trainHostProbe = new ThreadLocal[String]
  private[operators] def lastTrainHost: String = trainHostProbe.get

  /** Estimated driver-loop footprint per vocabulary CHARACTER: each code
    * point becomes a 1–2-char String in a per-word unit array (~56 B object
    * + 8 B ref), and each adjacent pair contributes a boxed-Int HashSet
    * node in the pair→words index plus its share of the stats map (~90 B)
    * — ~160 B/char of boxed state, dominating the flat per-ROW cost. The
    * default `driverBytesMax` of 6 GiB therefore admits ≈40M vocabulary
    * characters (a 4M-row vocab of ≤10-char words — the Zipf-typical
    * shape) and routes long-word corpora to the distributed loop that
    * handles any size with bounded driver state. */
  private val DriverBytesPerChar = 160L

  /** Driver-host admission: BOTH the row count and the estimated boxed
    * footprint must fit. Package-private so the gate spec can pin the
    * decision table without reflection. */
  private[operators] def driverHostFits(
      rows: Long, chars: Long, rowMax: Long, bytesMax: Long): Boolean =
    // divide, don't multiply: `chars * DriverBytesPerChar` overflows Long
    // for a pathological caller (rowMax raised toward Int.MaxValue with
    // hostile long words), and a negative product would ADMIT the very
    // collect the gate exists to prevent
    rows <= rowMax && chars <= bytesMax / DriverBytesPerChar

  private val mergeSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("a", StringType, nullable = false),
      StructField("b", StringType, nullable = false),
      StructField("n", LongType, nullable = false)))
  }

  /** UTF8-binary string order = code point order — the engine-visible tie
    * rule (Spark ORDER BY on strings compares UTF-8 bytes), NOT Java's
    * `String.compareTo` UTF-16 code-unit order, which ranks astral-plane
    * characters below U+E000–U+FFFF. */
  private def cpCompare(x: String, y: String): Int = {
    var i = 0
    var j = 0
    while (i < x.length && j < y.length) {
      val cx = x.codePointAt(i)
      val cy = y.codePointAt(j)
      if (cx != cy) return Integer.compare(cx, cy)
      i += Character.charCount(cx)
      j += Character.charCount(cy)
    }
    Integer.compare(x.length - i, y.length - j)
  }

  /** Initial sub-word units = code points (what both `regexp_replace("(.)")`
    * segmentation and DuckDB's RE2 `(.)` produce). */
  private def cpUnits(word: String): Array[String] = {
    val out = new Array[String](word.codePointCount(0, word.length))
    var i = 0
    var u = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out(u) = word.substring(i, i + n)
      u += 1
      i += n
    }
    out
  }

  /** One left-to-right non-overlapping merge pass — the unit-list
    * equivalent of the sentinel-string literal `replace`. */
  private def applyMergeUnits(us: Array[String], a: String, b: String): Array[String] = {
    val out = new Array[String](us.length)
    var w = 0
    var i = 0
    while (i < us.length) {
      if (i + 1 < us.length && us(i) == a && us(i + 1) == b) {
        out(w) = a + b; w += 1; i += 2
      } else { out(w) = us(i); w += 1; i += 1 }
    }
    if (w == us.length) us else java.util.Arrays.copyOf(out, w)
  }

  /** The driver-hosted merge loop over a collected (word, wf) vocabulary —
    * incremental Sennrich training:
    *
    *   - `stats`: corpus-weighted adjacent-pair counts (overlapping);
    *   - `index`: pair → ids of words currently containing it, so a merge
    *     round rebuilds ONLY the affected words' contributions — total
    *     work across all rounds is O(Σ affected-word lengths), not
    *     O(rounds · vocab);
    *   - `heap`: lazy max-priority-queue on (n, a, b) with the exact
    *     distributed tie rule (n DESC, then a, then b in code-point
    *     order). Entries go stale when a count changes; each entry carries
    *     the pair's GENERATION at push time and a popped entry is valid
    *     only if the generation still matches (r15 — strictly stronger
    *     than the old value-recheck: a count that drifts away and back
    *     can no longer revive an old entry, and validation never touches
    *     the count itself). Every count change re-enqueues at the new
    *     generation, so each live pair always has exactly one valid entry
    *     — the argmax over valid entries IS the argmax over `stats`.
    *     When stale entries outnumber live pairs 4:1 the heap REBUILDS
    *     from `stats` (one entry per live pair), bounding heap memory to
    *     O(#live pairs) across any rank budget — at 32k ranks over a
    *     2M-word vocab the un-pruned heap accumulates every per-round
    *     churn entry instead (BpeVolume `driver 32768` rehearses this).
    *
    * Semantics are bit-for-bit the distributed loop's: same pair counts,
    * same argmax, same left-to-right non-overlapping application
    * ([[TextContractChecks]] checks both hosts differentially against its
    * independent model on hostile corpora). */
  private def bpeTrainMergesDriver(
      spark: org.apache.spark.sql.SparkSession,
      vocabRows: Array[(String, Long)], numMerges: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import scala.collection.mutable
    val words: Array[Array[String]] = vocabRows.map(v => cpUnits(v._1))
    val freqs: Array[Long] = vocabRows.map(_._2)
    val stats = mutable.HashMap.empty[(String, String), Long]
    val index = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    // pair → generation, bumped on EVERY count change (including removal):
    // a heap entry is valid iff it carries the pair's current generation
    val gen = mutable.HashMap.empty[(String, String), Long]
    val heapOrd: Ordering[(Long, String, String, Long)] =
      (x: (Long, String, String, Long), y: (Long, String, String, Long)) => {
        if (x._1 != y._1) java.lang.Long.compare(x._1, y._1)
        else {
          val ca = cpCompare(x._2, y._2)
          if (ca != 0) -ca else -cpCompare(x._3, y._3)
        }
      }
    val heap = mutable.PriorityQueue.empty[(Long, String, String, Long)](heapOrd)

    def addWord(i: Int, changed: mutable.HashSet[(String, String)]): Unit = {
      val us = words(i)
      var k = 0
      while (k + 1 < us.length) {
        val p = (us(k), us(k + 1))
        stats.update(p, stats.getOrElse(p, 0L) + freqs(i))
        gen.update(p, gen.getOrElse(p, 0L) + 1L)
        index.getOrElseUpdate(p, mutable.HashSet.empty[Int]) += i
        changed += p
        k += 1
      }
    }

    def removeWord(i: Int, changed: mutable.HashSet[(String, String)]): Unit = {
      val us = words(i)
      var k = 0
      while (k + 1 < us.length) {
        val p = (us(k), us(k + 1))
        val n = stats(p) - freqs(i)
        if (n == 0L) stats.remove(p) else stats.update(p, n)
        gen.update(p, gen.getOrElse(p, 0L) + 1L)
        index.get(p).foreach { s => s -= i; if (s.isEmpty) index.remove(p) }
        changed += p
        k += 1
      }
    }

    def enqueueCurrent(p: (String, String)): Unit =
      stats.get(p).foreach(n => heap.enqueue((n, p._1, p._2, gen(p))))

    {
      val init = mutable.HashSet.empty[(String, String)]
      var i = 0
      while (i < words.length) { addWord(i, init); i += 1 }
      stats.keysIterator.foreach(p => enqueueCurrent(p))
    }

    val merges = mutable.ArrayBuffer.empty[Row]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      var best: (String, String, Long) = null
      while (best == null && heap.nonEmpty) {
        val (n, a, b, g) = heap.dequeue()
        // generation match ⇒ no count change since push ⇒ n == stats((a,b))
        if (gen.getOrElse((a, b), Long.MinValue) == g) best = (a, b, n)
      }
      if (best == null) done = true
      else {
        val (a, b, n) = best
        merges += Row(r, a, b, n)
        val affected = index.get((a, b)).map(_.toArray).getOrElse(Array.empty[Int])
        val changed = mutable.HashSet.empty[(String, String)]
        affected.foreach { i =>
          removeWord(i, changed)
          words(i) = applyMergeUnits(words(i), a, b)
          addWord(i, changed)
        }
        // one heap push per pair whose count changed this round (not per
        // word touched); its fresh generation invalidates every older entry
        changed.foreach(enqueueCurrent)
        // stale-entry bound: once dead entries dominate 4:1, rebuild from
        // the live pair set — heap memory stays O(#pairs) across any rank
        // budget instead of accumulating all per-round churn
        if (heap.size > 4 * stats.size + 1024) {
          heap.clear()
          // with the heap empty, no stale entry can ever validate again —
          // so gens of DEAD pairs are prunable here (and only here: between
          // rebuilds a dead pair's gen must survive, or its re-creation
          // restarting at gen 1 could falsely validate an old entry).
          // Without this the gen map keeps one entry per pair EVER seen —
          // exactly the unbounded-churn state the rebuild exists to drop.
          gen.filterInPlace((p, _) => stats.contains(p))
          stats.keysIterator.foreach(enqueueCurrent)
        }
        r += 1
      }
    }
    spark.createDataFrame(
      java.util.Arrays.asList(merges.toArray: _*), mergeSchema)
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
