package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.commons.codec.digest.DigestUtils

import scala.collection.mutable
import scala.util.Random

/** The shared machinery behind [[TextContractProps]]: the hostile-corpus
  * generator, the exact in-memory models of the text/LLM operator family,
  * and one `check*(spark, seed)` entry per family. The CI suite runs fixed
  * seed ranges through these; [[TextFuzz]] sweeps arbitrary ranges offline
  * (banked in COVERAGE.md) without inflating CI wall time.
  *
  * Model-fidelity notes live on [[TextContractProps]]; the short version:
  * Spark `trim` strips ASCII space only, Java-regex split keeps empty
  * tokens at limit −1, string order is UTF8-binary = code point order,
  * `length` counts code points, BPE merge application is the unit-list
  * left-to-right non-overlapping scan, and md5-bucket/rate arithmetic is
  * replayed double-op by double-op. */
object TextContractChecks {

  // --- corpus generator ----------------------------------------------------

  private val asciiPool = Vector(
    "the", "The", "CAT", "cat", "dog", "run", "data", "spark", "of", "and")
  private val unicodePool = Vector(
    "caf\u00e9", "Cafe\u0301", "\u4e2d\u6587", "\ud83d\ude00",
    "\ud83d\ude00\ud83d\ude01", "na\u00efve", "a\u00a0b", "\uf8ff\ue000",
    "σα")
  private val hostilePool = Vector(
    "a\u0002b", "\u0002\u0003", "x\u0003y", "\u0000", "quo\"te", "d'oh",
    "back\\slash", "(.*+[", "$var", "100%", "semi;colon", "a,b")
  private val punctPool = Vector("...", "!!!", "?!", ",,,", "---")
  private val paragraphs = Vector(
    (1 to 8).map(i => s"cookie$i").mkString(" "),
    Seq("please", "accept", "\ud83d\ude00", "our", "a\u0002b", "terms").mkString(" "),
    (1 to 5).map(i => s"Share$i").mkString(" "))

  private def randToken(rnd: Random): String = rnd.nextInt(10) match {
    case 0 | 1 | 2 | 3 => asciiPool(rnd.nextInt(asciiPool.length))
    case 4 | 5         => unicodePool(rnd.nextInt(unicodePool.length))
    case 6 | 7         => hostilePool(rnd.nextInt(hostilePool.length))
    case 8             => punctPool(rnd.nextInt(punctPool.length))
    case _             => "w" + rnd.nextInt(2000)
  }

  private[operators] def randText(rnd: Random): String = rnd.nextInt(20) match {
    case 0 => ""
    case 1 => Vector(" ", "\t", "\n", " \t ", "")(rnd.nextInt(5))
    case 2 => randToken(rnd)
    case 3 =>
      val p = paragraphs(rnd.nextInt(paragraphs.length))
      val n = 200 + rnd.nextInt(300)
      (1 to n).map(_ => randToken(rnd)).mkString(" ") + " " + p + " " + p
    case _ =>
      val n = 2 + rnd.nextInt(40)
      val sep = if (rnd.nextInt(8) == 0) "\t" else " "
      val body = (1 to n).map(_ => randToken(rnd)).mkString(sep)
      if (rnd.nextInt(10) < 3) {
        val p = paragraphs(rnd.nextInt(paragraphs.length))
        if (rnd.nextBoolean()) s"$p $body" else s"$body $p"
      } else body
  }

  /** (doc_id, text, src); ~15% of docs copy an earlier doc's text. */
  private def genCorpus(rnd: Random, maxDocs: Int,
      nullTextPct: Int = 0): Seq[(Long, Option[String], String)] = {
    val n = 1 + rnd.nextInt(maxDocs)
    val out = mutable.ArrayBuffer.empty[(Long, Option[String], String)]
    (0 until n).foreach { i =>
      val src = Vector("A", "B", "C")(rnd.nextInt(3))
      val text: Option[String] =
        if (rnd.nextInt(100) < nullTextPct) None
        else if (out.nonEmpty && rnd.nextInt(100) < 15)
          out(rnd.nextInt(out.length))._2
        else Some(randText(rnd))
      out += ((i.toLong, text, src))
    }
    out.toSeq
  }

  private def toDf(spark: SparkSession,
      docs: Seq[(Long, Option[String], String)]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(docs.map(d => Row(d._1, d._2.orNull, d._3)): _*),
      StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = true),
        StructField("src", StringType, nullable = false))))

  private def clue(seed: Long, docs: Seq[(Long, Option[String], String)]): String =
    s"seed=$seed corpus=${docs.map(d => s"(${d._1},${d._2.map("\"" + _ + "\"")},${d._3})")
      .mkString("[", ", ", "]")}"

  // --- model of the shared text primitives ---------------------------------

  /** Spark `trim`: strips ASCII space 0x20 only (NOT \t/\n). */
  private def trimSpaces(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  /** TextOps.tokens: split with limit −1 keeps leading/trailing empties;
    * "" yields [""]. */
  private def mTokens(text: String): Array[String] =
    trimSpaces(text.toLowerCase).split("\\s+", -1)

  /** UTF8-binary string order = code point order. */
  private def cpCompare(x: String, y: String): Int = {
    val a = x.codePoints.toArray; val b = y.codePoints.toArray
    var i = 0
    while (i < a.length && i < b.length) {
      if (a(i) != b(i)) return Integer.compare(a(i), b(i))
      i += 1
    }
    Integer.compare(a.length, b.length)
  }

  private def md5Hex(s: String): String = DigestUtils.md5Hex(s.getBytes("UTF-8"))

  private def check(cond: Boolean, msg: => String): Unit =
    if (!cond) throw new AssertionError(msg)

  // --- duplicate-substring spans -------------------------------------------

  private case class SpanRow(nDup: Int, dupTokens: Int, nTokens: Int, frac: Double)

  private def mDuplicateSpans(
      docs: Seq[(Long, String)], w: Int): Map[Long, SpanRow] = {
    val toks = docs.map { case (id, t) => id -> mTokens(t) }
    val wins = toks.collect { case (id, tk) if tk.length >= w =>
      id -> (0 to tk.length - w).map(i => tk.slice(i, i + w).mkString(" "))
    }
    val df = wins.flatMap { case (id, ws) => ws.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    wins.flatMap { case (id, ws) =>
      val starts = ws.zipWithIndex.collect {
        case (win, i) if df(win) >= 2 => i + 1
      }.sorted
      if (starts.isEmpty) None
      else {
        val n = toks.toMap.apply(id).length
        val leads = starts.drop(1) :+ (starts.last + w)
        val cov = starts.zip(leads).map { case (s, nx) => math.min(nx - s, w) }.sum
        Some(id -> SpanRow(starts.length, cov, n,
          math.floor(cov.toDouble * 1e6 / n) / 1e6))
      }
    }.toMap
  }

  private def mRemoveSpans(
      docs: Seq[(Long, String)], w: Int): Map[Long, (String, Int, String, Int)] =
    docs.map { case (id, t) =>
      val tk = mTokens(t)
      val starts: Seq[Int] =
        if (tk.length >= w) {
          val wins = (0 to tk.length - w).map(i => tk.slice(i, i + w).mkString(" "))
          val df = docs.flatMap { case (id2, t2) =>
            val tk2 = mTokens(t2)
            if (tk2.length >= w)
              (0 to tk2.length - w).map(i => tk2.slice(i, i + w).mkString(" "))
                .distinct.map(_ -> id2)
            else Seq.empty
          }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
          wins.zipWithIndex.collect { case (win, i) if df(win) >= 2 => i + 1 }
        } else Seq.empty
      val covered = starts.flatMap(s => s until (s + w)).toSet
      val kept = (1 to tk.length).filterNot(covered).map(p => tk(p - 1))
      id -> (tk.mkString(" "), starts.length, kept.mkString(" "), kept.length)
    }.toMap

  def checkSpans(spark: SparkSession, seed: Long): Unit = {
    val rnd = new Random(seed)
    val docs = genCorpus(rnd, maxDocs = 12)
    val w = 2 + rnd.nextInt(5)
    val plain = docs.map(d => (d._1, d._2.get))
    val df = toDf(spark, docs)
    val gotSpans = Dedup.duplicateSpans(df, col("doc_id"), col("text"), w)
      .collect().map(r => r.getAs[Long]("id") -> SpanRow(
        r.getAs[Int]("n_dup_windows"), r.getAs[Int]("dup_tokens"),
        r.getAs[Int]("n_tokens"), r.getAs[Double]("dup_fraction"))).toMap
    check(gotSpans == mDuplicateSpans(plain, w),
      s"duplicateSpans diverged (w=$w): got=$gotSpans " +
        s"want=${mDuplicateSpans(plain, w)} ${clue(seed, docs)}")
    val gotClean = Dedup.removeDuplicateSpans(df, col("doc_id"), col("text"), w)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("text"), r.getAs[Int]("n_dup_windows"),
          r.getAs[String]("clean_text"), r.getAs[Int]("n_clean_tokens"))).toMap
    check(gotClean == mRemoveSpans(plain, w),
      s"removeDuplicateSpans diverged (w=$w): got=$gotClean " +
        s"want=${mRemoveSpans(plain, w)} ${clue(seed, docs)}")
  }

  // --- bigram-LM perplexity ------------------------------------------------

  private def mBigramNll(
      docs: Seq[(Long, String)]): Map[Long, (Long, Long, Double)] = {
    val toks = docs.map { case (id, t) => id -> mTokens(t) }
    val vocab = toks.flatMap(_._2).distinct.size.toLong
    val occ = toks.collect { case (id, tk) if tk.length >= 2 =>
      id -> (0 until tk.length - 1).map(i => tk(i) + " " + tk(i + 1))
    }
    val c12 = occ.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = occ.flatMap(_._2).map(bg => bg.substring(0, bg.indexOf(' ')))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def logp(bg: String): Long = {
      val w1 = bg.substring(0, bg.indexOf(' '))
      math.floor(math.log(
        (c12(bg).toDouble + 0.5) / (c1(w1).toDouble + 0.5 * vocab)) * 1e4).toLong
    }
    occ.map { case (id, bgs) =>
      val sum = bgs.map(logp).sum
      val n = bgs.length.toLong
      id -> (n, sum, math.floor((-sum * 100L).toDouble / n) / 1e6)
    }.toMap
  }

  def checkBigram(spark: SparkSession, seed: Long): Unit = {
    val rnd = new Random(seed)
    val docs = genCorpus(rnd, maxDocs = 10)
    val plain = docs.map(d => (d._1, d._2.get))
    val got = LanguageModel
      .bigramNllScoresCorpusVocab(toDf(spark, docs), col("doc_id"), col("text"))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_logp_scaled"),
          r.getAs[Double]("avg_nll"))).toMap
    check(got == mBigramNll(plain),
      s"bigram NLL diverged: got=$got want=${mBigramNll(plain)} ${clue(seed, docs)}")
  }

  // --- BPE train / encode --------------------------------------------------

  private def stripCtl(w: String): String = w.replaceAll("[\\x00-\\x08]", "")

  private def mBpeWords(text: String): Seq[String] =
    mTokens(text).map(stripCtl).filter(_.nonEmpty).toSeq

  private def cpUnits(word: String): List[String] =
    word.codePoints.toArray.toList.map(cp => new String(Character.toChars(cp)))

  /** Literal sentinel-replace ≡ left-to-right non-overlapping unit-pair
    * scan (the replacement is never rescanned). */
  private def applyMerge(us: List[String], a: String, b: String): List[String] = {
    val out = mutable.ListBuffer.empty[String]
    var i = 0
    while (i < us.length) {
      if (i + 1 < us.length && us(i) == a && us(i + 1) == b) { out += (a + b); i += 2 }
      else { out += us(i); i += 1 }
    }
    out.toList
  }

  private def mBpeTrain(
      texts: Seq[String], numMerges: Int): Seq[(Int, String, String, Long)] = {
    val wf = texts.flatMap(mBpeWords)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter { case (w, _) => w.codePointCount(0, w.length) >= 2 }
    var vocab: Seq[(List[String], Long)] =
      wf.toSeq.map { case (w, f) => cpUnits(w) -> f }
    val merges = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val counts = mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (us, f) =>
        us.sliding(2).foreach {
          case List(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) = counts.toSeq.minBy(identity)(Ordering.fromLessThan {
          (x, y) =>
            if (x._2 != y._2) x._2 > y._2
            else if (cpCompare(x._1._1, y._1._1) != 0) cpCompare(x._1._1, y._1._1) < 0
            else cpCompare(x._1._2, y._1._2) < 0
        })
        merges += ((r, a, b, n))
        vocab = vocab.map { case (us, f) => applyMerge(us, a, b) -> f }
        r += 1
      }
    }
    merges.toSeq
  }

  private def mBpeEncode(docs: Seq[(Long, String)],
      merges: Seq[(String, String)]): Map[Long, (Long, Long)] = {
    val unitCount = mutable.Map.empty[String, Long]
    def unitsOf(w: String): Long = unitCount.getOrElseUpdate(w,
      merges.foldLeft(cpUnits(w)) { case (us, (a, b)) => applyMerge(us, a, b) }
        .length.toLong)
    docs.map { case (id, t) => id -> mBpeWords(t) }
      .collect { case (id, ws) if ws.nonEmpty =>
        id -> (ws.length.toLong, ws.map(unitsOf).sum)
      }.toMap
  }

  def checkBpe(spark: SparkSession, seed: Long): Unit = {
    val rnd = new Random(seed)
    val docs = genCorpus(rnd, maxDocs = 8)
    val plain = docs.map(d => (d._1, d._2.get))
    val numMerges = 1 + rnd.nextInt(4)
    val df = toDf(spark, docs)
    // BOTH merge-loop hosts on every corpus: the driver in-memory loop
    // (production default — tiny vocabs always fit) and the distributed
    // fallback (driverVocabMax = 0), each against the independent model —
    // the path choice must be invisible in the output
    val gotTrain = LanguageModel.bpeTrainMerges(df, col("text"), numMerges)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      .sortBy(_._1)
    val wantTrain = mBpeTrain(plain.map(_._2), numMerges)
    check(gotTrain == wantTrain,
      s"BPE train (driver loop) diverged (m=$numMerges): got=$gotTrain " +
        s"want=$wantTrain " + clue(seed, docs))
    val gotDist = LanguageModel
      .bpeTrainMerges(df, col("text"), numMerges, driverVocabMax = 0L)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      .sortBy(_._1)
    check(gotDist == wantTrain,
      s"BPE train (distributed loop) diverged (m=$numMerges): got=$gotDist " +
        s"want=$wantTrain " + clue(seed, docs))
    val table = wantTrain.map(m => (m._2, m._3))
    val gotEnc = LanguageModel.bpeEncode(df, col("doc_id"), col("text"), table)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    check(gotEnc == mBpeEncode(plain, table),
      s"BPE encode diverged: got=$gotEnc want=${mBpeEncode(plain, table)} " +
        clue(seed, docs))
  }

  // --- leakage-safe split --------------------------------------------------

  private def mFingerprint(text: Option[String]): Option[String] =
    text.map(t => md5Hex(trimSpaces(t.toLowerCase).replaceAll("\\s+", " ")))

  private def mSplit(
      docs: Seq[(Long, Option[String])]): Map[Long, (Long, String)] = {
    val reps = docs.groupBy(d => mFingerprint(d._2)).view.mapValues(_.map(_._1).min)
    docs.map { case (id, t) =>
      val rep = reps(mFingerprint(t))
      val bucket = Integer.parseInt(md5Hex(rep.toString).substring(0, 2), 16)
      id -> (rep,
        if (bucket < 205) "train" else if (bucket < 230) "val" else "test")
    }.toMap
  }

  def checkSplit(spark: SparkSession, seed: Long): Unit = {
    val rnd = new Random(seed)
    val docs = genCorpus(rnd, maxDocs = 14, nullTextPct = 10)
    val df = toDf(spark, docs)
    def run(d: DataFrame): Map[Long, (Long, String)] =
      Sampling.leakageSafeSplit(d, col("doc_id"), TextOps.fingerprint(col("text")))
        .collect().map(r => r.getAs[Long]("id") ->
          (r.getAs[Long]("rep"), r.getAs[String]("split"))).toMap
    val got = run(df)
    check(got == mSplit(docs.map(d => (d._1, d._2))),
      s"split diverged: got=$got want=${mSplit(docs.map(d => (d._1, d._2)))} " +
        clue(seed, docs))
    val base = docs.map(_._1).max + 1
    val appended = docs.zipWithIndex.collect {
      case ((_, t, s), i) if i % 3 == 0 => (base + i, t, s)
    } :+ ((base + 1000L, Some(randText(rnd)), "A"))
    val grown = run(toDf(spark, docs ++ appended))
    docs.foreach { case (id, _, _) =>
      check(grown(id) == got(id),
        s"monotone append moved row $id: ${got(id)} -> ${grown(id)} ${clue(seed, docs)}")
    }
    appended.dropRight(1).foreach { case (nid, t, _) =>
      val orig = docs.find(_._2 == t).get._1
      check(grown(nid)._2 == got(orig)._2,
        s"appended dup $nid split ${grown(nid)._2} != class split ${got(orig)._2}")
    }
  }

  // --- domain-mixture sampling ---------------------------------------------

  def checkMixture(spark: SparkSession, seed: Long): Unit = {
    val rnd = new Random(seed)
    val docs = genCorpus(rnd, maxDocs = 20)
    val srcs = docs.map(_._3).distinct.sorted
    val weights = srcs.take(1 + rnd.nextInt(srcs.length))
      .map(s => s -> (0.05 + rnd.nextDouble())).toMap
    val masses = docs.map(d => d._1 -> (d._1 % 7 + 1)).toMap
    val total = masses.values.sum
    val budget = 1L + rnd.nextLong(math.max(1L, 2L * total))
    val df = toDf(spark, docs).withColumn("mass", col("doc_id") % 7 + 1)
    val res = Sampling.mixtureSample(df, col("doc_id"), col("src"), col("mass"),
      weights, budget)
    val ordered = weights.toSeq.sortBy(_._1)
    val wsum = ordered.map(_._2).sum
    val wantPlan = ordered.map { case (s, w) =>
      val t = docs.filter(_._3 == s).map(d => masses(d._1)).sum
      val rate = if (t == 0L) 0.0 else math.min(1.0, ((w / wsum) * budget) / t)
      Sampling.MixtureRate(s, t, rate, math.floor(rate * 65536.0).toInt)
    }
    check(res.plan == wantPlan,
      s"plan diverged: got=${res.plan} want=$wantPlan ${clue(seed, docs)}")
    val thr = wantPlan.map(m => m.stratum -> m.threshold).toMap
    val want = docs.filter { d =>
      Integer.parseInt(md5Hex(d._1.toString).substring(0, 4), 16) <
        thr.getOrElse(d._3, 0)
    }.map(_._1).toSet
    val got = res.sampled.select("doc_id").collect().map(_.getLong(0)).toSet
    check(got == want, s"membership diverged: got=$got want=$want ${clue(seed, docs)}")
  }

  // --- cross-source n-gram overlap -----------------------------------------

  /** WordShingles contract: lowercase → trim spaces → split −1; docs
    * shorter than n tokens yield ONE shingle = all tokens joined. */
  private def mShingles(text: String, n: Int): Seq[String] = {
    val tk = mTokens(text)
    val count = math.max(tk.length - (n - 1), 1)
    (0 until count).map(i => tk.slice(i, math.min(i + n, tk.length)).mkString(" "))
  }

  def checkOverlap(spark: SparkSession, seed: Long): Unit = {
    val rnd = new Random(seed)
    val docs = genCorpus(rnd, maxDocs = 12)
    val n = 2 + rnd.nextInt(7)
    val bySrc = docs.groupBy(_._3).view.mapValues(
      _.flatMap(d => mShingles(d._2.get, n).distinct).toSet).toMap
    val want = (for {
      a <- bySrc.keys; b <- bySrc.keys if a < b
      shared = (bySrc(a) intersect bySrc(b)).size if shared > 0
    } yield {
      val (n1, n2) = (bySrc(a).size.toLong, bySrc(b).size.toLong)
      (a, b, shared.toLong, n1, n2,
        BigDecimal(shared.toDouble / math.min(n1, n2))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }).toSet
    val got = Dedup.crossSourceOverlap(toDf(spark, docs), col("src"), col("text"), n)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    check(got == want,
      s"overlap diverged (n=$n): got=$got want=$want ${clue(seed, docs)}")
  }

  // --- TextOps scalar primitives -------------------------------------------

  private def mNormalized(text: String): String =
    trimSpaces(text.toLowerCase).replaceAll("\\s+", " ")

  /** Independent model of the native RabinFingerprint expression: Horner
    * fold h = (h·B + byte) mod P over the normalized text's UTF-8 bytes. */
  private def mRollingFingerprint(text: String): Long = {
    val B = 1000003L; val P = 2147483647L
    var h = 0L
    mNormalized(text).getBytes("UTF-8").foreach { b => h = (h * B + (b & 0xff)) % P }
    h
  }

  private def mStopwordHits(tk: Array[String], lang: String): Int =
    tk.count(TextOps.stopwords(lang).toSet)

  private def mQualityScore(text: String): Double = {
    val len = text.codePointCount(0, text.length)
    val tk = mTokens(text)
    val stripped = text.replaceAll("[.,!?;:'\"()-]", "")
    val punct = (len - stripped.codePointCount(0, stripped.length)).toDouble /
      math.max(len, 1)
    val swr = mStopwordHits(tk, "en").toDouble / math.max(tk.length, 1)
    math.floor((math.min(len.toDouble / 500.0, 1.0) * 0.4 +
      math.min(swr * 5.0, 1.0) * 0.3 +
      (1.0 - math.min(punct * 10.0, 1.0)) * 0.3) * 1e6) / 1e6
  }

  private def mLangId(tk: Array[String]): String = {
    val (en, de, es, fr) = (mStopwordHits(tk, "en"), mStopwordHits(tk, "de"),
      mStopwordHits(tk, "es"), mStopwordHits(tk, "fr"))
    if (en >= de && en >= es && en >= fr) "en"
    else if (de >= es && de >= fr) "de"
    else if (es >= fr) "es"
    else "fr"
  }

  /** Scalar primitives vs their models — token counting (with the ""→[""]
    * quirk), heuristic language ID (tie priority en>de>es>fr), the
    * floor-truncated quality score (exact double-op replay, code-point
    * lengths), the md5 whole-doc fingerprint, the min-md5 1-hash MinHash
    * shingle fingerprint (hex string order = byte order), and the NATIVE
    * Rabin rolling fingerprint against an independent Horner fold. */
  def checkTextOps(spark: SparkSession, seed: Long): Unit = {
    val rnd = new Random(seed)
    val docs = genCorpus(rnd, maxDocs = 15)
    graft.functions.NativeHashes.register(spark)
    val got = toDf(spark, docs).select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("tc"),
        TextOps.langId(col("text")).as("lang"),
        TextOps.qualityScore(col("text")).as("q"),
        TextOps.fingerprint(col("text")).as("fp"),
        TextOps.shingleFingerprint(col("text")).as("sfp"),
        TextOps.rollingFingerprint(col("text")).as("rh"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getString(2), r.getDouble(3), r.getString(4),
          r.getString(5), r.getLong(6))).toMap
    val want = docs.map { case (id, t, _) =>
      val text = t.get
      val tk = mTokens(text)
      id -> (tk.length, mLangId(tk), mQualityScore(text),
        md5Hex(mNormalized(text)),
        mShingles(text, 3).map(sh => md5Hex(sh)).min,
        mRollingFingerprint(text))
    }.toMap
    check(got == want,
      s"TextOps primitives diverged: got=$got want=$want ${clue(seed, docs)}")
  }

  // --- partitioning independence (metamorphic) -----------------------------

  def checkPartitioning(spark: SparkSession, seed: Long): Unit = {
    val rnd = new Random(seed)
    val docs = genCorpus(rnd, maxDocs = 12)
    val df = toDf(spark, docs)
    val dfR = toDf(spark, docs).repartition(7)
    def rows(d: DataFrame): Set[String] = d.collect().map(_.toString).toSet
    check(rows(Dedup.duplicateSpans(dfR, col("doc_id"), col("text"), 3)) ==
      rows(Dedup.duplicateSpans(df, col("doc_id"), col("text"), 3)),
      s"duplicateSpans partitioning-dependent ${clue(seed, docs)}")
    check(rows(LanguageModel.bigramNllScoresCorpusVocab(dfR, col("doc_id"), col("text"))) ==
      rows(LanguageModel.bigramNllScoresCorpusVocab(df, col("doc_id"), col("text"))),
      s"bigram NLL partitioning-dependent ${clue(seed, docs)}")
    check(rows(Dedup.crossSourceOverlap(dfR, col("src"), col("text"), 3)) ==
      rows(Dedup.crossSourceOverlap(df, col("src"), col("text"), 3)),
      s"crossSourceOverlap partitioning-dependent ${clue(seed, docs)}")
  }

  val families: Seq[(String, (SparkSession, Long) => Unit)] = Seq(
    "spans" -> checkSpans _,
    "bigram" -> checkBigram _,
    "bpe" -> checkBpe _,
    "split" -> checkSplit _,
    "mixture" -> checkMixture _,
    "overlap" -> checkOverlap _,
    "textops" -> checkTextOps _,
    "partitioning" -> checkPartitioning _)
}

/** Offline sweep driver for [[TextContractChecks]] — run big fresh-seed
  * ranges without inflating CI:
  *
  *   sbt "Test/runMain graft.operators.TextFuzz <fromSeed> <countPerFamily>"
  *
  * Runs every family over [fromSeed, fromSeed + count) and prints a tally;
  * throws (nonzero exit) on the first divergence with the seed + corpus in
  * the message. Banked sweeps are recorded in COVERAGE.md. */
object TextFuzz {
  def main(args: Array[String]): Unit = {
    val from = args.headOption.map(_.toLong).getOrElse(10000L)
    val count = args.lift(1).map(_.toLong).getOrElse(300L)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    var n = 0L
    TextContractChecks.families.foreach { case (name, fn) =>
      val fam0 = System.nanoTime()
      (from until from + count).foreach { seed => fn(spark, seed); n += 1 }
      println(f"[text-fuzz] $name%-13s $count cases ok " +
        f"(${(System.nanoTime() - fam0) / 1e9}%.0f s)")
    }
    println(f"[text-fuzz] TOTAL $n cases green in ${(System.nanoTime() - t0) / 1e9}%.0f s " +
      s"(seeds $from..${from + count - 1} per family)")
    spark.stop()
  }
}
