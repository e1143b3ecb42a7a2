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

  // --- dedup/decontamination family ----------------------------------------

  /** xxhash64 seed 42 over a string — the hash primitive every signature
    * scheme builds on. The model reuses Spark's STATIC hash function (no
    * Spark job; the same way the text models reuse DigestUtils.md5Hex) —
    * what is independently re-derived is everything built ON it: signature
    * derivation, banding, bucket joins, caps, verification, components. */
  private def xxh(s: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType, 42L)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Model of the MinHashSignature native expression: h_i(x) =
    * (a_i·x + b_i) mod P over xxh(shingle), same a/b derivation. */
  private val MinhashP = 2147483647L
  private def pmod(a: Long, p: Long): Long = { val m = a % p; if (m < 0) m + p else m }
  private def mMinhashSig(shingles: Seq[String], numHashes: Int): Array[Long] = {
    val xs = shingles.map(sh => pmod(xxh(sh), MinhashP))
    Array.tabulate(numHashes) { i =>
      val a = pmod(xxh(s"mh-a-$i"), MinhashP - 1) + 1L
      val b = pmod(xxh(s"mh-b-$i"), MinhashP)
      if (xs.isEmpty) 0L else xs.map(x => pmod(a * x + b, MinhashP)).min
    }
  }

  /** Model of Dedup.lshBuckets' band id: positions with pos % bands == b,
    * ascending, h values joined with "," and xxhash64'd. */
  private def mLshBuckets(sig: Array[Long], bands: Int): Seq[(Int, Long)] =
    (0 until bands).map { b =>
      b -> xxh(sig.indices.filter(_ % bands == b).map(sig(_).toString).mkString(","))
    }

  /** Union-find min-label — the model for both CC operators and for every
    * rep/kept contract built on them. */
  private def mComponents(ids: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra); parent(hi) = lo }
    }
    ids.foreach(i => parent.getOrElseUpdate(i, i))
    pairs.foreach { case (a, b) => union(a, b) }
    ids.map(i => i -> find(i)).toMap
  }

  /** MinHash+LSH end to end: signatures, interleaved banding, hot-bucket
    * cap, candidate join — then removeDuplicates' kept set via union-find. */
  def checkMinhash(spark: SparkSession, seed: Long): Unit = {
    graft.functions.NativeHashes.register(spark)
    val rnd = new Random(seed)
    val docs = genCorpus(rnd, maxDocs = 12)
    val plain = docs.map(d => (d._1, d._2.get))
    val numHashes = Vector(8, 16)(rnd.nextInt(2))
    val bands = Vector(2, 4, 8)(rnd.nextInt(3))
    val shingleSize = 2 + rnd.nextInt(3)
    val cap = Vector(2, 3, 100)(rnd.nextInt(3))
    val df = toDf(spark, docs)
    val got = Dedup.minhashCandidates(df, col("doc_id"), col("text"),
        numHashes, bands, shingleSize, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // model: distinct shingles → signature → (band, bucket) rows → cap →
    // pairs sharing any surviving (band, bucket)
    val sigs = plain.map { case (id, t) =>
      id -> mMinhashSig(mShingles(t, shingleSize).distinct, numHashes)
    }
    val rows = sigs.flatMap { case (id, sig) =>
      mLshBuckets(sig, bands).map { case (b, bk) => (b, bk, id) }
    }
    val hot = rows.groupBy(r => (r._1, r._2)).filter(_._2.size > cap).keySet
    val kept = rows.filterNot(r => hot((r._1, r._2)))
    val want = (for {
      a <- kept; b <- kept
      if a._1 == b._1 && a._2 == b._2 && a._3 < b._3
    } yield (a._3, b._3)).toSet
    check(got == want,
      s"minhash candidates diverged (h=$numHashes bands=$bands sh=$shingleSize cap=$cap): " +
        s"got=$got want=$want ${clue(seed, docs)}")
    // the cleanup contract on top: keep min-id per candidate component
    val pairsDf = spark.createDataFrame(
      java.util.Arrays.asList(want.toSeq.sortBy(identity).map(p => Row(p._1, p._2)): _*),
      StructType(Seq(StructField("id1", LongType, nullable = false),
        StructField("id2", LongType, nullable = false))))
    val gotKept = Dedup.removeDuplicates(df, col("doc_id"), pairsDf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val reps = mComponents(plain.map(_._1), want.toSeq)
    val wantKept = plain.map(_._1).filter(id => reps(id) == id).toSet
    check(gotKept == wantKept,
      s"removeDuplicates kept set diverged: got=$gotKept want=$wantKept ${clue(seed, docs)}")
  }

  /** Model of the SimHashChunks native expression over mTokens. */
  private def mSimhashChunks(tokens: Seq[String]): Array[Long] = {
    val counters = new Array[Int](64)
    tokens.foreach { t =>
      val h = xxh(t)
      (0 until 64).foreach { j =>
        if (((h >>> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
      }
    }
    Array.tabulate(4) { c =>
      (0 until 16).foldLeft(0L) { (bits, j) =>
        if (counters(c * 16 + j) > 0) bits | (1L << j) else bits
      }
    }
  }

  def checkSimhash(spark: SparkSession, seed: Long): Unit = {
    graft.functions.NativeHashes.register(spark)
    val rnd = new Random(seed)
    val docs = genCorpus(rnd, maxDocs = 12)
    val plain = docs.map(d => (d._1, d._2.get))
    val maxDist = rnd.nextInt(11)
    val cap = Vector(2, 3, 100)(rnd.nextInt(3))
    val got = Dedup.simhashPairs(toDf(spark, docs), col("doc_id"), col("text"),
        maxDist, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sigs = plain.map { case (id, t) => id -> mSimhashChunks(mTokens(t).toSeq) }.toMap
    val rows = sigs.toSeq.flatMap { case (id, sig) =>
      sig.zipWithIndex.map { case (v, idx) => (idx, v, id) }
    }
    val hot = rows.groupBy(r => (r._1, r._2)).filter(_._2.size > cap).keySet
    val kept = rows.filterNot(r => hot((r._1, r._2)))
    val cand = (for {
      a <- kept; b <- kept
      if a._1 == b._1 && a._2 == b._2 && a._3 < b._3
    } yield (a._3, b._3)).toSet
    val want = cand.map { case (id1, id2) =>
      val ham = sigs(id1).zip(sigs(id2))
        .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      (id1, id2, ham)
    }.filter(_._3 <= maxDist)
    check(got == want,
      s"simhash pairs diverged (maxDist=$maxDist cap=$cap): got=$got want=$want " +
        clue(seed, docs))
  }

  /** Exact n-gram Jaccard: df-capped postings, inverted-index join, set
    * arithmetic, HALF_UP rounding, threshold. */
  def checkJaccard(spark: SparkSession, seed: Long): Unit = {
    graft.functions.NativeHashes.register(spark)
    val rnd = new Random(seed)
    val docs = genCorpus(rnd, maxDocs = 12)
    val plain = docs.map(d => (d._1, d._2.get))
    val shingleSize = 2 + rnd.nextInt(3)
    val threshold = Vector(0.1, 0.3, 0.5, 0.8)(rnd.nextInt(4))
    val maxDf = Vector(2, 4, 128)(rnd.nextInt(3))
    val got = Dedup.ngramJaccardPairs(toDf(spark, docs), col("doc_id"), col("text"),
        threshold, shingleSize, maxDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val posts = plain.flatMap { case (id, t) =>
      mShingles(t, shingleSize).distinct.map(sh => (id, sh))
    }
    val hot = posts.groupBy(_._2).filter(_._2.size > maxDf).keySet
    val kept = posts.filterNot(p => hot(p._2))
    val sizes = kept.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val want = kept.groupBy(_._2).values.flatMap { ps =>
      for (a <- ps; b <- ps if a._1 < b._1) yield (a._1, b._1)
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((id1, id2), nCommon) =>
        val j = round6(nCommon.toDouble / (sizes(id1) + sizes(id2) - nCommon))
        (id1, id2, nCommon, j)
      }
      .filter(_._4 >= threshold).toSet
    check(got == want,
      s"ngram jaccard diverged (sh=$shingleSize t=$threshold df=$maxDf): " +
        s"got=$got want=$want ${clue(seed, docs)}")
  }

  /** Exact + fuzzy eval-set decontamination against a small eval corpus
    * with planted (copied) contamination. */
  def checkDecontaminate(spark: SparkSession, seed: Long): Unit = {
    graft.functions.NativeHashes.register(spark)
    val rnd = new Random(seed)
    val docs = genCorpus(rnd, maxDocs = 12)
    val plain = docs.map(d => (d._1, d._2.get))
    // eval set: 1-4 docs, ~half lifted from the corpus (planted overlap)
    val evalDocs = (0 until 1 + rnd.nextInt(4)).map { i =>
      val text =
        if (plain.nonEmpty && rnd.nextBoolean()) plain(rnd.nextInt(plain.length))._2
        else randText(rnd)
      (1000L + i, Option(text), "E")
    }
    val shingleSize = 2 + rnd.nextInt(3)
    val df = toDf(spark, docs)
    val evalDf = toDf(spark, evalDocs)
    val got = Dedup.contaminationScores(df, evalDf, col("doc_id"), col("text"), shingleSize)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val evalVocab = evalDocs.flatMap(d => mShingles(d._2.get, shingleSize).distinct).toSet
    val want = plain.flatMap { case (id, t) =>
      val shs = mShingles(t, shingleSize).distinct
      val overlap = shs.count(evalVocab)
      if (overlap == 0) None
      else Some((id, overlap.toLong, shs.size.toLong,
        round6(overlap.toDouble / shs.size)))
    }.toSet
    check(got == want,
      s"contaminationScores diverged (sh=$shingleSize): got=$got want=$want " +
        s"eval=${evalDocs.map(_._2.get)} ${clue(seed, docs)}")
    // fuzzy: banded MinHash between corpus and eval (contiguous slices)
    val numHashes = Vector(8, 16)(rnd.nextInt(2))
    val bands = Vector(4, 8)(rnd.nextInt(2))
    val r = numHashes / bands
    val gotF = Dedup.fuzzyContaminationPairs(df, evalDf, col("doc_id"), col("text"),
        numHashes, bands, shingleSize)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    def bandKeys(sig: Array[Long]): Seq[(Int, Long)] =
      (0 until bands).map { b =>
        b -> xxh(sig.slice(b * r, b * r + r).map(_.toString).mkString(","))
      }
    val cSigs = plain.map { case (id, t) =>
      id -> mMinhashSig(mShingles(t, shingleSize).distinct, numHashes)
    }
    val eSigs = evalDocs.map { case (id, t, _) =>
      id -> mMinhashSig(mShingles(t.get, shingleSize).distinct, numHashes)
    }
    val wantF = (for {
      (cid, cs) <- cSigs
      (eid, es) <- eSigs
      if bandKeys(cs).toSet.intersect(bandKeys(es).toSet).nonEmpty
    } yield {
      val est = cs.zip(es).count { case (x, y) => x == y }.toDouble /
        math.max(numHashes, 1)
      (cid, eid, round6(est))
    }).toSet
    check(gotF == wantF,
      s"fuzzyContaminationPairs diverged (h=$numHashes bands=$bands sh=$shingleSize): " +
        s"got=$gotF want=$wantF eval=${evalDocs.map(_._2.get)} ${clue(seed, docs)}")
  }

  /** Both connected-components hosts vs union-find on random graphs —
    * including chain shapes (min-label's adversarial case, star's O(log n)
    * claim) and duplicate/self/reversed edges. */
  def checkComponents(spark: SparkSession, seed: Long): Unit = {
    val rnd = new Random(seed)
    val n = 2 + rnd.nextInt(30)
    val ids = (0 until n).map(_ => rnd.nextLong(1000000L)).distinct
    val edges = mutable.ArrayBuffer.empty[(Long, Long)]
    // random edges
    (0 until rnd.nextInt(2 * n)).foreach { _ =>
      edges += ((ids(rnd.nextInt(ids.length)), ids(rnd.nextInt(ids.length))))
    }
    // a chain over a random subset — diameter stress
    val chain = rnd.shuffle(ids).take(2 + rnd.nextInt(math.max(ids.length - 1, 1)))
    chain.sliding(2).foreach {
      case Seq(a, b) => edges += ((a, b))
      case _ =>
    }
    val idsDf = spark.createDataFrame(
      java.util.Arrays.asList(ids.map(Row(_)): _*),
      StructType(Seq(StructField("id", LongType, nullable = false))))
    val pairsDf = spark.createDataFrame(
      java.util.Arrays.asList(edges.toSeq.map(e => Row(e._1, e._2)): _*),
      StructType(Seq(StructField("id1", LongType, nullable = false),
        StructField("id2", LongType, nullable = false))))
    val want = mComponents(ids, edges.toSeq.filter(e => e._1 != e._2))
    // default params take the r13 driver union-find fast path (these
    // graphs are tiny); driverEdgeMax = 0 forces the distributed fixpoint
    // — BOTH hosts must match the model on every random graph
    val gotMin = Dedup.connectedComponentsMin(idsDf, pairsDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    check(gotMin == want,
      s"connectedComponentsMin (driver host) diverged: got=$gotMin want=$want seed=$seed " +
        s"ids=$ids edges=$edges")
    val gotMinDist = Dedup
      .connectedComponentsMin(idsDf, pairsDf, driverEdgeMax = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    check(gotMinDist == want,
      s"connectedComponentsMin (distributed host) diverged: got=$gotMinDist want=$want " +
        s"seed=$seed ids=$ids edges=$edges")
    val gotStar = Dedup.connectedComponentsStar(idsDf, pairsDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    check(gotStar == want,
      s"connectedComponentsStar (driver host) diverged: got=$gotStar want=$want seed=$seed " +
        s"ids=$ids edges=$edges")
    val gotStarDist = Dedup
      .connectedComponentsStar(idsDf, pairsDf, driverEdgeMax = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    check(gotStarDist == want,
      s"connectedComponentsStar (distributed host) diverged: got=$gotStarDist want=$want " +
        s"seed=$seed ids=$ids edges=$edges")
  }

  /** Semantic-dedup LABEL CONTRACT with k = 1 (one cluster — the
    * clustering heuristic drops out and the contract is fully decidable):
    * labels = min-label components over {exact-duplicate star edges among
    * non-degenerate vectors} ∪ {pairs with round₆(cosine) ≥ τ}, where
    * zero/NaN/Inf-degenerate vectors never match anything (the NaN/zero
    * guards), and -0.0 equals 0.0 in the exact-collapse key (SQL equality
    * semantics). Hostile embeddings: exact copies, scaled rays, zero
    * vectors, NaN/Inf elements, negated vectors. */
  def checkSemanticLabels(spark: SparkSession, seed: Long): Unit = {
    val rnd = new Random(seed)
    val dims = 2 + rnd.nextInt(3)
    val n = 2 + rnd.nextInt(12)
    val pool = Vector(0.0f, 1.0f, -1.0f, 0.5f, 2.0f, -0.0f, 0.25f, 3.0f)
    def randVec(): Array[Float] = {
      val v = Array.fill(dims)(pool(rnd.nextInt(pool.length)))
      rnd.nextInt(10) match {
        case 0 => v(rnd.nextInt(dims)) = Float.NaN; v
        case 1 => v(rnd.nextInt(dims)) = Float.PositiveInfinity; v
        case 2 => Array.fill(dims)(0.0f)
        case _ => v
      }
    }
    val vecs = mutable.ArrayBuffer.empty[Array[Float]]
    (0 until n).foreach { i =>
      val v =
        if (i > 0 && rnd.nextInt(100) < 30) {
          val base = vecs(rnd.nextInt(vecs.length))
          rnd.nextInt(3) match {
            case 0 => base.clone() // exact copy
            case 1 => base.map(_ * 2.0f) // same ray: cosine 1 when defined
            case _ => base.map(x => -x) // opposite ray: cosine -1
          }
        } else randVec()
      vecs += v
    }
    val threshold = Vector(0.9, 0.99, 1.0)(rnd.nextInt(3))
    val rows = vecs.zipWithIndex.map { case (v, i) => Row(i.toLong, v.toSeq) }
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows.toSeq: _*),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("emb", ArrayType(FloatType, containsNull = false), nullable = false))))
    val got = VectorOps.semanticDedupLabels(df, "id", "emb",
        k = 1, threshold = threshold, kmeansIters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // model
    def sumSq(v: Array[Float]): Double =
      v.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble)
    def nonDegenerate(v: Array[Float]): Boolean = {
      val ss = sumSq(v)
      !ss.isNaN && ss > 0.0 && ss != Double.PositiveInfinity
    }
    // -0.0 == 0.0 under SQL grouping/equality: normalize the collapse key
    def key(v: Array[Float]): Seq[Float] = v.map(x => if (x == 0.0f) 0.0f else x).toSeq
    val idsAll = vecs.indices.map(_.toLong)
    val exactEdges = vecs.zipWithIndex.filter(x => nonDegenerate(x._1))
      .groupBy(x => key(x._1)).values.filter(_.size > 1)
      .flatMap { g =>
        val gid = g.map(_._2.toLong).min
        g.map(_._2.toLong).filter(_ != gid).map(i => (gid, i))
      }.toSeq
    val collapsed = vecs.zipWithIndex.filter { case (v, i) =>
      if (!nonDegenerate(v)) true
      else {
        val g = vecs.zipWithIndex.filter(x => nonDegenerate(x._1) && key(x._1) == key(v))
        g.size < 2 || g.map(_._2).min == i
      }
    }
    def cosine(a: Array[Float], b: Array[Float]): Option[Double] = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < a.length) {
        val xi = a(i).toDouble; val yi = b(i).toDouble
        dot += xi * yi; nx += xi * xi; ny += yi * yi
        i += 1
      }
      if (nx == 0.0 || ny == 0.0) None else Some(dot / (math.sqrt(nx) * math.sqrt(ny)))
    }
    val simPairs = (for {
      a <- collapsed; b <- collapsed if a._2 < b._2
      // NaN cosine (corrupted element with nonzero norms) is a non-match —
      // the engine's !isnan guard; BigDecimal would throw on NaN/Inf
      c <- cosine(a._1, b._1) if !c.isNaN && !c.isInfinite
      if round6(c) >= threshold
    } yield (a._2.toLong, b._2.toLong)).toSeq
    val want = mComponents(idsAll, exactEdges ++ simPairs)
    check(got == want,
      s"semanticDedupLabels (k=1) diverged (t=$threshold): got=$got want=$want " +
        s"seed=$seed vecs=${vecs.map(_.toSeq)}")
  }

  // --- sampling family (deterministic md5 arithmetic) ----------------------

  private def mBucket256(key: String): Int =
    Integer.parseInt(md5Hex(key).substring(0, 2), 16)

  /** fraction / stratified / fixed-size / weighted sampling vs the exact
    * md5 models. Keys are the hostile TEXTS themselves (a NULL key hashes
    * to NULL: dropped by the bucket filters, sorted null-FIRST by the
    * fixed-size asc sort, null-LAST by the weighted desc sort), so
    * sampling runs through the same code-point shapes as the text family.
    * Duplicate texts make every sort boundary a MULTISET contract: the
    * kept sort-key multiset is deterministic, the ids on a tied boundary
    * are not. */
  def checkSampling(spark: SparkSession, seed: Long): Unit = {
    val rnd = new Random(seed)
    val docs = genCorpus(rnd, maxDocs = 14, nullTextPct = 10)
    val df = toDf(spark, docs)
    // fraction: bucket(md5) < threshold
    val t = Vector(0, 1, 64, 255, 256)(rnd.nextInt(5))
    val gotF = Sampling.fractionSample(df, col("text"), t)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val wantF = docs.filter(d => d._2.exists(x => mBucket256(x) < t)).map(_._1).toSet
    check(gotF == wantF,
      s"fractionSample t=$t: got=$gotF want=$wantF ${clue(seed, docs)}")
    // stratified: per-stratum thresholds with a default
    val thrs = Seq("A", "B", "C").filter(_ => rnd.nextBoolean())
      .map(s => s -> rnd.nextInt(257)).toMap
    val dflt = rnd.nextInt(257)
    val gotS = Sampling.stratifiedSample(df, col("text"), col("src"), thrs, dflt)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val wantS = docs.filter(d =>
      d._2.exists(x => mBucket256(x) < thrs.getOrElse(d._3, dflt))).map(_._1).toSet
    check(gotS == wantS,
      s"stratifiedSample thrs=$thrs dflt=$dflt: got=$gotS want=$wantS ${clue(seed, docs)}")
    // fixed-size: the n smallest md5 hex strings (asc sort, nulls first)
    val n = 1 + rnd.nextInt(docs.length + 2)
    val hashOf = docs.map(d => d._1 -> d._2.map(md5Hex)).toMap
    val gotN = Sampling.fixedSizeSample(df, col("text"), n)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    check(gotN.length == math.min(n, docs.length),
      s"fixedSizeSample n=$n returned ${gotN.length} rows ${clue(seed, docs)}")
    def nullsFirst(o: Option[String]): String = o.fold("")("h" + _)
    val wantKeys = docs.map(d => nullsFirst(hashOf(d._1))).sorted.take(n)
    check(gotN.map(id => nullsFirst(hashOf(id))).sorted == wantKeys,
      s"fixedSizeSample n=$n kept-key multiset diverged: got=$gotN ${clue(seed, docs)}")
    // weighted A-Res: k largest ln(u)/w; weight = code-point length, so
    // empty and NULL texts pin the non-positive-weight -Inf contract (the
    // w>0 guard that keeps ANSI's divide-by-zero out of the plan); ties
    // break by text asc with NULL first
    val k = 1 + rnd.nextInt(docs.length + 1)
    val gotW = Sampling.weightedSample(df, col("text"),
        length(col("text")).cast("double"), k)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    def wkOf(text: Option[String]): Double = text match {
      case Some(t) if t.codePointCount(0, t.length) > 0 =>
        val u = (java.lang.Long.parseLong(md5Hex(t).substring(0, 6), 16) + 1L) /
          16777216.0
        StrictMath.log(u) / t.codePointCount(0, t.length).toDouble
      case _ => Double.NegativeInfinity // NULL or zero weight never wins
    }
    val ordered = docs.sortWith { (a, b) =>
      val c = java.lang.Double.compare(wkOf(b._2), wkOf(a._2)) // desc, NaN greatest
      if (c != 0) c < 0
      else (a._2, b._2) match {
        case (None, None) => false
        case (None, _) => true // tie on _wk: text asc, NULLs first
        case (_, None) => false
        case (Some(x), Some(y)) => cpCompare(x, y) < 0
      }
    }
    check(gotW.length == math.min(k, docs.length),
      s"weightedSample k=$k returned ${gotW.length} rows ${clue(seed, docs)}")
    def wkey(id: Long): (String, Option[String]) = {
      val text = docs.find(_._1 == id).get._2
      (java.lang.Double.doubleToLongBits(wkOf(text)).toString, text)
    }
    check(gotW.map(wkey).sorted == ordered.take(k).map(d => wkey(d._1)).sorted,
      s"weightedSample k=$k kept-key multiset diverged: got=$gotW " +
        s"want=${ordered.take(k).map(_._1)} ${clue(seed, docs)}")
  }

  /** bloomAntiJoin / bloomReducedJoin vs the plain joins they claim
    * bit-identity with — hostile key sets: NULLs (must route to the exact
    * branch, not vanish with the NULL bloom probe), duplicates on both
    * sides, hot keys, values far outside the small side's range, and both
    * `===` and null-safe `<=>` conditions. */
  def checkBloomDedup(spark: SparkSession, seed: Long): Unit = {
    val rnd = new Random(seed)
    def key(): java.lang.Long = rnd.nextInt(8) match {
      case 0 => null
      case 1 => java.lang.Long.valueOf(1000000007L + rnd.nextInt(3))
      case _ => java.lang.Long.valueOf(rnd.nextInt(12).toLong)
    }
    val big = (0 until 1 + rnd.nextInt(20)).map(i => (i.toLong, key()))
    val small = (0 until rnd.nextInt(12)).map(i => (1000L + i, key()))
    def mk(rows: Seq[(Long, java.lang.Long)], id: String, k: String): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*),
        StructType(Seq(StructField(id, LongType, nullable = false),
          StructField(k, LongType, nullable = true))))
    val bigDf = mk(big, "bid", "bk")
    val smallDf = mk(small, "sid", "sk")
    val nullSafe = rnd.nextBoolean()
    val cond = if (nullSafe) col("bk") <=> col("sk") else col("bk") === col("sk")
    def matches(bk: java.lang.Long, sk: java.lang.Long): Boolean =
      if (nullSafe) (bk == null && sk == null) ||
        (bk != null && sk != null && bk.longValue == sk.longValue)
      else bk != null && sk != null && bk.longValue == sk.longValue
    val ctx = s"seed=$seed nullSafe=$nullSafe big=$big small=$small"
    val gotAnti = BloomJoin.bloomAntiJoin(bigDf, smallDf, col("bk"), col("sk"),
        cond, fpp = 0.01)
      .select("bid").collect().map(_.getLong(0)).sorted.toSeq
    val wantAnti = big.filter { case (_, bk) => !small.exists(s => matches(bk, s._2)) }
      .map(_._1).sorted
    check(gotAnti == wantAnti, s"bloomAntiJoin: got=$gotAnti want=$wantAnti $ctx")
    val gotJoin = BloomJoin.bloomReducedJoin(bigDf, smallDf, "bk", "sk", fpp = 0.01)
      .select("bid", "sid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    val wantJoin = (for {
      (bid, bk) <- big; (sid, sk) <- small
      if bk != null && sk != null && bk.longValue == sk.longValue
    } yield (bid, sid)).sorted
    check(gotJoin == wantJoin, s"bloomReducedJoin: got=$gotJoin want=$wantJoin $ctx")
  }

  /** heavyHitters: at a cap above the vocabulary Misra-Gries keeps exact
    * counts and the top-k is fully decidable (CMS row width 20k vs a <4k
    * vocab — a wrong estimate needs a same-bucket collision in every depth
    * row, deterministic per seed and astronomically unlikely; a seed that
    * ever trips it gets its expectation pinned, not loosened). At a tiny
    * cap the exact output is partitioning-dependent, so the check drops to
    * the operator's actual guarantees: CMS never undercounts a returned
    * candidate, and every token with count > N/(cap+1) survives the MG
    * sweep (checked with k = vocab so no top-k cut hides a survivor). */
  def checkHeavyHitters(spark: SparkSession, seed: Long): Unit = {
    val rnd = new Random(seed)
    val docs = genCorpus(rnd, maxDocs = 10)
    val toks = docs.flatMap(d => d._2.toSeq.flatMap(t => mTokens(t).toSeq))
    val tokDf = spark.createDataFrame(
      java.util.Arrays.asList(toks.map(Row(_)): _*),
      StructType(Seq(StructField("tok", StringType, nullable = false))))
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val k = 1 + rnd.nextInt(6)
    val got = Sketches.heavyHitters(tokDf, "tok", k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = exact.toSeq.sortBy { case (tok, c) => (-c, tok) }.take(k)
    check(got == want,
      s"heavyHitters k=$k diverged: got=$got want=$want ${clue(seed, docs)}")
    if (exact.nonEmpty) {
      val cap = 2 + rnd.nextInt(3)
      val gotLow = Sketches.heavyHitters(tokDf, "tok", k = exact.size, localCap = cap)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      gotLow.foreach { case (tok, est) =>
        check(est >= exact.getOrElse(tok, 0L),
          s"CMS undercounted '$tok': est=$est exact=${exact.get(tok)} ${clue(seed, docs)}")
      }
      val mustSurvive = exact.filter(_._2 > toks.size.toDouble / (cap + 1)).keySet
      check(mustSurvive.subsetOf(gotLow.map(_._1).toSet),
        s"MG cap=$cap lost a guaranteed heavy hitter: got=${gotLow.map(_._1).toSet} " +
          s"must=$mustSurvive ${clue(seed, docs)}")
    }
  }

  /** packIntoBins vs the range-frame prefix-sum model: the window's
    * default RANGE frame sums ALL order-key peers, so tied rows share
    * tok_start = (sum through every peer) − own size — the model replays
    * that, plus zero-size docs and docs larger than the bin capacity. */
  def checkPacking(spark: SparkSession, seed: Long): Unit = {
    val rnd = new Random(seed)
    val rows = (0 until 1 + rnd.nextInt(25)).map { i =>
      (i.toLong, Vector("A", "B", "C")(rnd.nextInt(3)),
        if (rnd.nextInt(5) == 0) i.toLong % 3 else i.toLong, // ties ~1 in 5
        rnd.nextInt(8) match {
          case 0 => 0L
          case 1 => 50L // larger than any capacity below
          case _ => 1L + rnd.nextInt(12)
        })
    }
    val capacity = 1 + rnd.nextInt(16)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2, r._3, r._4)): _*),
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("shard", StringType, nullable = false),
        StructField("ord", LongType, nullable = false),
        StructField("sz", LongType, nullable = false))))
    val got = Packing.packIntoBins(df, Seq("shard"), col("ord"), col("sz"), capacity)
      .select("id", "tok_start", "bin").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rows.foreach { case (id, shard, ord, sz) =>
      val cum = rows.filter(r => r._2 == shard && r._3 <= ord).map(_._4).sum
      val tokStart = cum - sz
      val bin = math.floor(tokStart.toDouble / capacity).toLong
      check(got(id) == ((tokStart, bin)),
        s"packIntoBins cap=$capacity id=$id: got=${got(id)} want=($tokStart,$bin) " +
          s"seed=$seed rows=$rows")
    }
  }

  /** invertedIndex vs the exact postings model — tiny caps stress the
    * two-level (token, partition)-window path, whose output must equal the
    * single-window formulation: exact document frequency, global first-cap
    * doc ids ascending. */
  def checkInvIndex(spark: SparkSession, seed: Long): Unit = {
    val rnd = new Random(seed)
    val docs = genCorpus(rnd, maxDocs = 12, nullTextPct = 10)
    val cap = Vector(1, 2, 3, 20)(rnd.nextInt(4))
    val got = SearchIndex.invertedIndex(toDf(spark, docs), col("doc_id"), col("text"), cap)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val postings = docs.flatMap(d =>
      d._2.toSeq.flatMap(t => mTokens(t).distinct.toSeq.map(tok => (tok, d._1))))
    val want = postings.groupBy(_._1).map { case (tok, ps) =>
      val ids = ps.map(_._2).sorted
      (tok, ids.size.toLong, ids.take(cap).mkString(","))
    }.toSet
    check(got == want,
      s"invertedIndex cap=$cap diverged: got=$got want=$want ${clue(seed, docs)}")
  }

  /** bm25TopK vs a bit-exact driver replica: same tokenization (mTokens),
    * same double-op order (sorted terms, left-assoc sum, StrictMath.log),
    * same floor-scaled score — the kept set compared as a (score, id)
    * multiset... which here is exact, since ids are unique and the scaled
    * tie-break is (score desc, id asc). Query terms are drawn from the
    * corpus' own hostile tokens (plus a guaranteed miss), so control-char
    * and astral-plane terms exercise the `===` array filter. */
  def checkBm25(spark: SparkSession, seed: Long): Unit = {
    val rnd = new Random(seed)
    val docs = genCorpus(rnd, maxDocs = 12, nullTextPct = 10)
    val toksOf = docs.map(d => d._1 -> d._2.map(t => mTokens(t).toSeq).getOrElse(Seq.empty)).toMap
    val allToks = toksOf.values.flatten.toVector
    val nTerms = 1 + rnd.nextInt(3)
    val terms0 = ((0 until nTerms).map { _ =>
      if (allToks.nonEmpty && rnd.nextInt(4) > 0) allToks(rnd.nextInt(allToks.length))
      else "nosuchterm" + rnd.nextInt(3)
    } :+ "neverpresent").distinct
    val k = 1 + rnd.nextInt(8)
    val got = SearchIndex.bm25TopK(toDf(spark, docs), col("doc_id"), col("text"),
        queryTerms = terms0, k = k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // model — NULL texts drop out of the frame entirely (tokens(NULL) is
    // NULL, so dl is NULL: the row never matches), and N/avgdl cover only
    // non-null docs because the aggregate counts the same frame
    val alive = docs.filter(_._2.isDefined).map(_._1)
    // the operator drops zero-length terms (the "" this generator can draw
    // from mTokens of tab-prefixed docs) and folds in UTF-8 binary term
    // order — the PRODUCTION comparator, reused so the model can't drift
    val terms = terms0.filter(_.nonEmpty).distinct
      .sorted(SearchIndex.utf8BinaryOrder)
    if (alive.isEmpty) {
      check(got.isEmpty, s"empty corpus must return no rows: $got ${clue(seed, docs)}")
      return
    }
    val n = alive.length.toDouble
    val avgdl = alive.map(id => toksOf(id).length.toDouble).sum / alive.length
    val idf = terms.map { t =>
      val df = alive.count(id => toksOf(id).contains(t)).toDouble
      t -> StrictMath.log((n - df + 0.5) / (df + 0.5) + 1.0)
    }.toMap
    val scored = alive.flatMap { id =>
      val tf = terms.map(t => t -> toksOf(id).count(_ == t).toDouble).toMap
      if (tf.values.sum > 0) {
        val dl = toksOf(id).length.toDouble
        val norm = 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)
        val s = terms.map(t => idf(t) * (tf(t) * (1.2 + 1.0)) / (tf(t) + norm))
          .reduceLeft(_ + _)
        Some(id -> math.floor(s * 1e4).toLong)
      } else None
    }
    val want = scored.sortBy { case (id, s) => (-s, id) }.take(k)
    check(got == want,
      s"bm25TopK diverged (terms=$terms k=$k): got=$got want=$want ${clue(seed, docs)}")
  }

  /** bm25BatchTopK vs bm25TopK run per query (which [[checkBm25]] pins to
    * the bit-exact replica): random HOSTILE query tables — NULL text,
    * empty/whitespace text, prefixes of the corpus' own hostile docs, raw
    * random texts, duplicated query rows — over the same hostile corpora.
    * Checks exact per-query row equality (scaled scores to the bit) AND
    * that the output's query-id set is exactly the queries with ≥1
    * candidate (no spurious rows for vanished queries). */
  def checkBm25Batch(spark: SparkSession, seed: Long): Unit = {
    val rnd = new Random(seed)
    val docs = genCorpus(rnd, maxDocs = 12, nullTextPct = 10)
    val corpusDf = toDf(spark, docs)
    val nQ = 1 + rnd.nextInt(5)
    val qrows = mutable.ArrayBuffer.empty[(Long, Option[String])]
    (0 until nQ).foreach { j =>
      val t: Option[String] = rnd.nextInt(6) match {
        case 0 => None
        case 1 => Some(Vector("", " ", "\t ")(rnd.nextInt(3)))
        case 2 | 3 =>
          val withText = docs.filter(_._2.isDefined)
          if (withText.nonEmpty) {
            val toks = mTokens(withText(rnd.nextInt(withText.length))._2.get)
            Some(toks.take(1 + rnd.nextInt(3)).mkString(" "))
          } else Some(randText(rnd))
        case _ => Some(randText(rnd))
      }
      qrows += ((100L + j, t))
      if (rnd.nextInt(4) == 0) qrows += ((100L + j, t)) // duplicate query row
    }
    val k = 1 + rnd.nextInt(6)
    val qDf = spark.createDataFrame(
      java.util.Arrays.asList(qrows.toSeq.map(q => Row(q._1, q._2.orNull)): _*),
      StructType(Seq(
        StructField("qid", LongType, nullable = false),
        StructField("qtext", StringType, nullable = true))))
    // half the seeds force the distributed large-query-table regime
    // (broadcastQueryTermMax = 0): both regimes must match bm25TopK on the
    // same hostile corpora/query tables, so the Bm25Idf + shuffle-join
    // fallback gets the same adversarial coverage as the broadcast path.
    // Salt width flips too (r17): 0 = the df-aware auto derivation, plus
    // the degenerate widths the boundary arithmetic must survive — 1 (no
    // spread at all: explode(array(0)) and pmod(·, 1) both collapse to a
    // single bucket), 2, and non-power-of-2 7. Results must be identical
    // at every width (the salt is partitioning, never semantics).
    val btm = if (rnd.nextBoolean()) 0L else 1000000L
    val saltB = Vector(0, 1, 2, 7)(rnd.nextInt(4))
    val got = SearchIndex.bm25BatchTopK(corpusDf, col("doc_id"), col("text"),
        qDf, col("qid"), col("qtext"), k, broadcastQueryTermMax = btm,
        fallbackSaltBuckets = saltB)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(identity).toSeq).toMap
    val wantKeys = mutable.HashSet.empty[Long]
    qrows.distinct.foreach { case (qid, t) =>
      val terms = t.map(x => mTokens(x).toSeq.filter(_.nonEmpty).distinct)
        .getOrElse(Seq.empty)
      val want =
        if (terms.isEmpty) Seq.empty
        else SearchIndex.bm25TopK(corpusDf, col("doc_id"), col("text"), terms, k)
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
      if (want.nonEmpty) wantKeys += qid
      check(got.getOrElse(qid, Seq.empty) == want,
        s"bm25BatchTopK diverged q=$qid terms=$terms k=$k: " +
          s"got=${got.get(qid)} want=$want ${clue(seed, docs)}")
    }
    check(got.keySet == wantKeys.toSet,
      s"query-id set mismatch: got=${got.keySet} want=$wantKeys ${clue(seed, docs)}")
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
    // invertedIndex computes per-(token, spark_partition_id) caps
    // internally — output-identity across partitionings IS its two-level
    // claim, and cap=2 forces the level-2 merge to actually truncate
    check(rows(SearchIndex.invertedIndex(dfR, col("doc_id"), col("text"), 2)) ==
      rows(SearchIndex.invertedIndex(df, col("doc_id"), col("text"), 2)),
      s"invertedIndex partitioning-dependent ${clue(seed, docs)}")
    check(rows(SearchIndex.bm25TopK(dfR, col("doc_id"), col("text"),
        Seq("the", "data"), 5)) ==
      rows(SearchIndex.bm25TopK(df, col("doc_id"), col("text"),
        Seq("the", "data"), 5)),
      s"bm25TopK partitioning-dependent ${clue(seed, docs)}")
  }

  val families: Seq[(String, (SparkSession, Long) => Unit)] = Seq(
    "spans" -> checkSpans _,
    "bigram" -> checkBigram _,
    "bpe" -> checkBpe _,
    "split" -> checkSplit _,
    "mixture" -> checkMixture _,
    "overlap" -> checkOverlap _,
    "textops" -> checkTextOps _,
    "partitioning" -> checkPartitioning _,
    "minhash" -> checkMinhash _,
    "simhash" -> checkSimhash _,
    "jaccard" -> checkJaccard _,
    "decontam" -> checkDecontaminate _,
    "components" -> checkComponents _,
    "semdedup" -> checkSemanticLabels _,
    "sampling" -> checkSampling _,
    "bloomdedup" -> checkBloomDedup _,
    "heavyhitters" -> checkHeavyHitters _,
    "packing" -> checkPacking _,
    "invindex" -> checkInvIndex _,
    "bm25" -> checkBm25 _,
    "bm25batch" -> checkBm25Batch _)
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
    // optional third arg: comma-separated family filter
    val only = args.lift(2).map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    var n = 0L
    // text families + the r15 structured families (ANN / k-means /
    // changelog / temporal) sweep under one banked protocol
    (TextContractChecks.families ++ StructuredContractChecks.families)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
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
