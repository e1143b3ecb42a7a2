package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{BloomJoin, Dedup, Sampling, VectorOps}

/** End-to-end volume rehearsal of the INCREMENTAL production pipeline —
  * the steady-state shape a growing 100 TB corpus actually runs, chaining
  * the four incremental operators that are elsewhere rehearsed only in
  * isolation:
  *
  *   existing corpus (100k docs, already deduped)
  *     + incoming slice (25k docs: 5k exact dups, 2.5k near-dups, 17.5k
  *       new — 30% of the new carrying a shared boilerplate paragraph)
  *   A. exact incremental dedup — [[BloomJoin.bloomAntiJoin]] on the
  *      fingerprint hash: the ~all-new majority of the slice skips the
  *      anti-join shuffle entirely (bloom definite-miss fast path);
  *   B. incremental SemDeDup — [[VectorOps.semanticDedupIncrementalLabels]]:
  *      centroids fit on history only, existing×existing pairs never
  *      generated; half-scale embedding copies anchor to their originals;
  *   C. duplicate-span clean — [[Dedup.removeDuplicateSpans]] over the
  *      kept slice: the shared paragraph (a ~5k-occurrence viral window)
  *      is excised, unique remainders survive;
  *   D. leakage-safe split — [[Sampling.leakageSafeSplit]] with the
  *      NEAR-DUP CLUSTER LABEL as groupKey (the documented fuzzy
  *      extension): a kept near-dup and its existing anchor share a
  *      label, so they can never straddle train/test — exactly what a
  *      per-row fingerprint split would get wrong;
  *   E. token-budget accounting — [[LanguageModel.bpeTrainMerges]] (the
  *      driver in-memory loop, 256 ranks) over the cleaned slice, then
  *      [[LanguageModel.bpeEncode]] (native BpeUnits) for per-doc unit
  *      counts, aggregated per DOMAIN and fed to
  *      [[Sampling.mixtureSample]] as the token mass — closing the
  *      steady-state loop at ingest→dedup→clean→split→tokenize→mix.
  *      Word counts assert exactly (planted corpus shape), three docs
  *      spot-check end-to-end against a driver-side BPE replica, and
  *      the mixture plan's per-domain totals must equal the encode
  *      aggregate to the token;
  *   F. retrieval triage — [[graft.operators.SearchIndex.bm25BatchTopK]]
  *      over the CLEANED corpus: 20 planted eval prompts (each a prefix
  *      of one cleaned doc's globally-unique tokens) must each retrieve
  *      EXACTLY their source doc at rank 1 in one batch plan, and a
  *      21st probe made of the excised boilerplate paragraph must
  *      retrieve NOTHING — the decontamination-triage signal that stage
  *      C actually removed the viral text from the searchable corpus.
  *
  * Every stage's effect is asserted EXACTLY (planted counts, anchors,
  * coverage, co-assignment), and StageShuffleListener bounds the worst
  * shuffle task across the whole chain.
  */
object IncrementalVolume {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[incr-vol] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val listener = StageShuffleListener.install(spark)

    val dims = 64
    val boiler = (1 to 20).map(i => s"boiler$i").mkString(" ")

    // planted-direction embeddings with hash jitter (the SemdedupVolume
    // idiom: natural same-cluster cosines ≈ 0.96-0.98, far from 0.999;
    // half-scale copies co-cluster with exactly-1.0 cosine)
    def embed(idc: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(dims - 1)), d =>
        (when(d === (idc % dims).cast("int"), lit(8.0)).otherwise(lit(0.0))
          + pmod(xxhash64(idc, d), lit(1000)).cast("double") / 1000.0 - 0.5)
          .cast("float"))

    def filler(idc: org.apache.spark.sql.Column, tag: String, n: Int) =
      concat_ws(" ", (1 to n).map(i => concat(lit("u"), idc, lit(s"_$tag$i"))): _*)

    val existing = spark.range(100000).select(
      col("id"),
      filler(col("id"), "e", 8).as("text"),
      embed(col("id")).as("vec"))
      .localCheckpoint()

    // incoming index i in [0, 25000), ids offset by 1M:
    //   i <  5000  → exact dup of existing 50000+i (text copied verbatim)
    //   i < 7500   → near-dup of existing i-5000 (one appended token breaks
    //                the exact fingerprint; half-scale vec co-clusters)
    //   else       → new doc; i%10<3 embeds the shared boilerplate paragraph
    val incoming = spark.range(25000).select(
      (col("id") + 1000000L).as("id"), col("id").as("i"))
      .select(col("id"),
        when(col("i") < 5000, filler(col("i") + 50000L, "e", 8))
          .when(col("i") < 7500,
            concat(filler(col("i") - 5000L, "e", 8), lit(" mutated")))
          .when(col("i") % 10 < 3,
            concat_ws(" ", filler(col("id"), "n", 15), lit(boiler),
              filler(col("id"), "m", 15)))
          .otherwise(filler(col("id"), "n", 30)).as("text"),
        when(col("i") >= 5000 && col("i") < 7500,
          transform(embed(col("i") - 5000L), x => x * lit(0.5f)))
          .otherwise(embed(col("id"))).as("vec"),
        col("i"))
      .localCheckpoint()

    // --- A. exact incremental dedup (bloom anti-join on fingerprint hash)
    val exKeys = existing
      .select(xxhash64(graft.operators.TextOps.fingerprint(col("text"))).as("fh2"))
      .localCheckpoint()
    val survivorsA = time("A: bloom exact incremental dedup, 25k vs 100k")(
      BloomJoin.bloomAntiJoin(
        incoming.withColumn("fh", xxhash64(
          graft.operators.TextOps.fingerprint(col("text")))),
        exKeys, col("fh"), col("fh2"), col("fh") === col("fh2"),
        fpp = 0.001)
        .drop("fh").localCheckpoint())
    val nA = survivorsA.count()
    assert(nA == 20000L, s"stage A must drop exactly the 5k exact dups: $nA")
    assert(survivorsA.filter(col("i") < 5000).count() == 0L,
      "no exact dup may survive stage A")

    // --- B. incremental SemDeDup (new slice vs history, anchor-priority)
    val labelsB = time("B: incremental SemDeDup k=64, threshold 0.999")(
      VectorOps.semanticDedupIncrementalLabels(
        existing.select(col("id"), col("vec")),
        survivorsA.select(col("id"), col("vec")),
        "id", "vec", k = dims, threshold = 0.999)
        .localCheckpoint())
    val flagged = labelsB.filter(col("id") =!= col("rep"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.size == 2500, s"stage B must flag exactly the near-dups: ${flagged.size}")
    assert(flagged.forall { case (id, rep) => rep == id - 1000000L - 5000L },
      "every near-dup must anchor to its existing original (min EXISTING id)")
    val keptB = survivorsA.join(
      labelsB.filter(col("id") === col("rep")).select(col("id")), Seq("id"), "left_semi")
      .localCheckpoint()
    assert(keptB.count() == 17500L, "stage B keeps the 17.5k genuinely-new docs")

    // --- C. duplicate-span clean over the kept slice
    val cleaned = time("C: duplicate-span clean, 17.5k docs, ~5k-viral paragraph")(
      Dedup.removeDuplicateSpans(keptB, col("id"), col("text"), windowSize = 15)
        .localCheckpoint())
    val carriers = cleaned.filter(col("n_dup_windows") > 0)
      .agg(count(lit(1)), min(col("dup_tokens")), max(col("dup_tokens")),
        min(col("n_clean_tokens")), max(col("n_clean_tokens"))).collect()(0)
    assert(carriers.getLong(0) == 5250L,
      s"exactly the 30% boilerplate carriers are flagged: ${carriers.getLong(0)}")
    assert(carriers.getInt(1) == 20 && carriers.getInt(2) == 20,
      "excised coverage must be exactly the 20-token paragraph")
    assert(carriers.getInt(3) == 30 && carriers.getInt(4) == 30,
      "each carrier's unique 30-token remainder must survive")
    assert(cleaned.filter(col("n_dup_windows") === 0).count() == 12250L)

    // --- D. leakage-safe split with the near-dup cluster label as groupKey
    // history keeps its own id as label (already deduped); the incoming
    // slice CARRIES its stage-B label — so a kept near-dup and its anchor
    // form one class and can never straddle the split boundary
    val grown = existing.select(col("id"), col("id").as("label"))
      .unionAll(survivorsA.select(col("id")).join(labelsB, "id")
        .select(col("id"), col("rep").as("label")))
    val split = time("D: leakage-safe split over 120k grown corpus")(
      Sampling.leakageSafeSplit(grown, col("id"), col("label"))
        .localCheckpoint())
    assert(split.count() == 120000L, "every grown-corpus row gets an assignment")
    val straddle = split.as("a")
      .filter(col("a.id") >= 1005000L && col("a.id") < 1007500L)
      .join(split.as("b"), col("a.id") === col("b.id") + 1000000L + 5000L)
      .filter(col("a.split") =!= col("b.split")).count()
    assert(straddle == 0L,
      s"a near-dup pair straddles train/test despite the fuzzy label: $straddle")
    // the fuzzy label is LOAD-BEARING: the same split keyed on the exact
    // fingerprint separates at least one of the 2.5k mutated pairs
    val exactSplit = Sampling.leakageSafeSplit(
      existing.select(col("id"), col("text"))
        .unionAll(survivorsA.select(col("id"), col("text"))),
      col("id"), graft.operators.TextOps.fingerprint(col("text")))
    val leaked = exactSplit.as("a")
      .filter(col("a.id") >= 1005000L && col("a.id") < 1007500L)
      .join(exactSplit.as("b"), col("a.id") === col("b.id") + 1000000L + 5000L)
      .filter(col("a.split") =!= col("b.split")).count()
    assert(leaked > 0L, "corpus too small to demonstrate the exact-split leak")
    println(s"[incr-vol] fuzzy split: 0/2500 near-dup pairs straddle; " +
      s"exact-fingerprint split would leak $leaked/2500")

    // --- E. token-budget accounting: train (driver loop) → encode → mix
    // domains: the 30%-boilerplate carriers vs plain web docs — the
    // mixture a curation run would rebalance
    val domained = cleaned
      .select(col("id"), col("clean_text"),
        when(col("n_dup_windows") > 0, "boiler").otherwise("web").as("domain"))
      .localCheckpoint()
    val table = time("E1: BPE train, 256 ranks, driver loop over the cleaned slice")(
      graft.operators.LanguageModel
        .bpeTrainMerges(domained, col("clean_text"), numMerges = 256)
        .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq)
    assert(table.length == 256, s"cleaned slice must sustain 256 merges: ${table.length}")
    val encoded = time("E2: BPE encode (native BpeUnits) + per-domain budget")(
      graft.operators.LanguageModel
        .bpeEncode(domained, col("id"), col("clean_text"), table)
        .join(domained.select(col("id"), col("domain")), "id")
        .localCheckpoint())
    val perDomain = encoded.groupBy(col("domain"))
      .agg(count(lit(1)).as("docs"), sum(col("n_words")).as("words"),
        sum(col("n_units")).as("units"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // every cleaned doc carries exactly 30 surviving tokens (asserted in
    // stage C), so word budgets are exact; units compress below the raw
    // character count and can never go under one unit per word
    assert(perDomain("boiler") == ((5250L, 157500L, perDomain("boiler")._3)),
      s"boiler domain word budget: ${perDomain("boiler")}")
    assert(perDomain("web") == ((12250L, 367500L, perDomain("web")._3)),
      s"web domain word budget: ${perDomain("web")}")
    perDomain.foreach { case (d, (_, words, units)) =>
      assert(units >= words, s"$d: a word can never encode below one unit")
    }
    val totalUnits = perDomain.values.map(_._3).sum
    val totalChars = domained
      .agg(sum(length(regexp_replace(col("clean_text"), "\\s+", ""))))
      .collect()(0).getLong(0)
    assert(totalUnits < totalChars,
      s"256 ranks must compress below character units: $totalUnits vs $totalChars")
    println(s"[incr-vol] E: boiler ${perDomain("boiler")._3} units, " +
      s"web ${perDomain("web")._3} units ($totalChars chars)")
    // three docs end-to-end against a driver-side replica of the BPE
    // encode rule (the BpeVolume spot-check idiom)
    def encodeLocal(word: String): Long = {
      var units = word.codePoints.toArray
        .map(cp => new String(Character.toChars(cp)))
      val present = scala.collection.mutable.HashSet.empty[String] ++ units
      for ((a, b) <- table if units.length > 1) {
        if (present.contains(a) && present.contains(b)) {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < units.length) {
            if (i + 1 < units.length && units(i) == a && units(i + 1) == b) {
              out += (a + b); present += (a + b); i += 2
            } else { out += units(i); i += 1 }
          }
          units = out.toArray
        }
      }
      units.length.toLong
    }
    val sampleIds = Seq(1007500L, 1010001L, 1024999L)
    val sampleTexts = domained.filter(col("id").isin(sampleIds: _*))
      .select(col("id"), col("clean_text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sampleGot = encoded.filter(col("id").isin(sampleIds: _*))
      .select(col("id"), col("n_units")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sampleIds.foreach { id =>
      val want = sampleTexts(id).toLowerCase.trim.split("\\s+")
        .filter(_.nonEmpty).map(encodeLocal).sum
      assert(sampleGot(id) == want,
        s"doc $id: native encode ${sampleGot(id)} != driver replica $want")
    }
    println(s"[incr-vol] E: 3-doc spot check vs driver replica ok")
    // the budget the mixture sampler would consume: token mass per domain
    // must flow through UNCHANGED — the plan's totals ARE the aggregate
    val mix = Sampling.mixtureSample(
      encoded, col("id"), col("domain"), col("n_units"),
      Map("boiler" -> 0.2, "web" -> 0.8), budget = totalUnits / 2)
    val planTotals = mix.plan.map(m => m.stratum -> m.total).toMap
    assert(planTotals("boiler") == perDomain("boiler")._3 &&
      planTotals("web") == perDomain("web")._3,
      s"mixture plan totals must equal the encode aggregate to the token: " +
        s"$planTotals vs $perDomain")
    val consumed = mix.sampled.groupBy(col("domain")).agg(sum(col("n_units")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    mix.plan.foreach { m =>
      val target = m.rate * m.total
      val got = consumed.getOrElse(m.stratum, 0L).toDouble
      assert(math.abs(got - target) <= 0.15 * target + 1000.0,
        s"${m.stratum}: consumed $got vs target $target (rate ${m.rate})")
    }
    println(s"[incr-vol] E: mixture consumed $consumed of plan " +
      s"${mix.plan.map(m => f"${m.stratum}:${m.rate}%.4f×${m.total}")}")

    // --- F. retrieval triage over the CLEANED corpus (batch BM25) ---------
    // 20 eval prompts, each the 3-token prefix of one cleaned doc (tokens
    // embed the doc id, so they are globally unique to their source), plus
    // one probe made of the stage-C-excised boilerplate — all scored in ONE
    // query-count-independent batch plan
    val evalIds = (0 until 20).map(i => 1007500L + i * 800L)
    val queriesF = domained.filter(col("id").isin(evalIds: _*))
      .select((col("id") + 5000000L).as("qid"),
        concat_ws(" ",
          slice(graft.operators.TextOps.tokens(col("clean_text")), 1, 3)).as("qtext"))
      .unionAll(spark.range(1).select(
        lit(9999999L).as("qid"), lit(boiler).as("qtext")))
    val hits = time("F: batch BM25, 21 eval prompts vs 17.5k cleaned docs")(
      graft.operators.SearchIndex.bm25BatchTopK(
        domained, col("id"), col("clean_text"),
        queriesF, col("qid"), col("qtext"), k = 5).collect())
    val byQ = hits.groupBy(_.getLong(0))
    evalIds.foreach { id =>
      val rows = byQ.getOrElse(id + 5000000L, Array.empty)
      assert(rows.length == 1 && rows(0).getLong(1) == id,
        s"prompt for doc $id must retrieve exactly its source at rank 1: " +
          s"${rows.map(r => (r.getLong(1), r.getLong(2))).toSeq}")
    }
    assert(!byQ.contains(9999999L),
      s"excised boilerplate must retrieve 0 candidates post-clean: " +
        s"${byQ.get(9999999L).map(_.map(r => r.getLong(1)).toSeq)}")
    println("[incr-vol] F: 20/20 planted prompts rank-1 their source doc; " +
      "excised boilerplate retrieves 0 candidates")

    listener.drain(minTasks = 100L)
    val worst = listener.worstTaskRows
    println(s"[incr-vol] worst shuffle task rows across the chain: $worst (bound 500000)")
    assert(worst < 500000, s"a task read a corpus-scale row count: $worst")
    spark.stop()
  }
}
