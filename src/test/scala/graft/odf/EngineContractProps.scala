package graft.odf

import java.nio.file.{Files, Path}
import java.sql.Timestamp
import java.time.Instant

import scala.util.Random

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Request-level property fuzzer for the engine-native ODF contract (A7-A17).
  *
  * The differential SQL fuzzer ([[graft.fuzz.FuzzHarness]]) covers the
  * delegated-SQL surface (engine.rs:287); this spec fuzzes the layer above
  * it — the `TransformRequest` contract itself (engine.rs:127-184):
  *
  *   - random dataset vocabularies (unicode names, SQL keywords, dots,
  *     backticks, case-sensitive spellings — input and output vocab drawn
  *     independently),
  *   - random offset intervals (full / partial / no-data schema-file
  *     fallback) over multi-slice inputs, optionally with schema evolution
  *     in the last slice,
  *   - random explicit-watermark sets across 1-2 inputs (the second input
  *     registered but unreferenced — it must still contribute to the
  *     min-of-max watermark, engine.rs:310-324),
  *   - random next offsets, system times, op propagation (including a
  *     narrow Int16 op that result normalization must widen,
  *     engine.rs:351-362),
  *
  * each checked against a trivial in-memory model (pure Scala over the
  * generated rows: interval filter → predicate → projection; offsets dense
  * from nextOffset; op/system-time constants; watermark = min of per-input
  * max) plus golden invariants on the written parquet (column order, logical
  * types, TIMESTAMP(MILLIS,true) physical annotation on a sample).
  *
  * A second loop fuzzes the rejection surface (engine.rs:375-476): mutated
  * output steps that collide with system columns, mistype the op or
  * event-time column, drop the event-time column, or fail to parse — each
  * must surface as [[InvalidQuery]] WITHOUT writing the output file.
  *
  * Cases are sampled with fixed seeds (no scalatest-scalacheck bridge in the
  * offline dependency set, same convention as [[PropertiesSpec]]).
  */
class EngineContractProps extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-odf-contract-props")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val engine = new Engine(spark)

  override def afterAll(): Unit = spark.stop()

  /** SQL identifier quoting for generated queries. */
  private def q(n: String): String = "`" + n.replace("`", "``") + "`"

  // Disjoint name pools (so the four picked names are always distinct):
  // defaults, case-sensitive spellings, dots, unicode, SQL keywords, a
  // backtick. Spaces are excluded — parquet-mr rejects them in field names.
  private val offsetNames = Seq("offset", "OFFSET_COL", "off.set", "смещение", "order")
  private val opNames = Seq("op", "op.type", "оп", "select", "OpCol")
  private val stNames = Seq("system_time", "sys.time", "системное_время", "group", "SysTime")
  private val etNames = Seq("event_time", "event.time", "時刻", "where", "et`col")
  private val aliasPool = Seq("in0", "events_in", "вход", "join", "Input")

  private val instPool: Seq[Instant] = Seq(
    "2024-01-01T00:00:00Z", "2024-03-15T12:30:00Z", "2024-06-01T06:00:00Z",
    "2024-09-09T09:09:09Z", "2025-01-01T00:00:01Z").map(Instant.parse)

  private def writeSlice(schema: StructType, rows: Seq[Row], path: Path): Unit = {
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    ParquetSink.writeSingleFile(df, path.toString)
    ()
  }

  private case class LRow(offset: Long, et: Instant, v: Long, w: String)

  /** One random success-path request, executed and checked against the model. */
  private def runOne(seed: Long, dir: Path): Unit = {
    val rnd = new Random(seed)
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.length))

    val iv = DatasetVocabulary(pick(offsetNames), pick(opNames), pick(stNames), pick(etNames))
    val ov = DatasetVocabulary(pick(offsetNames), pick(opNames), pick(stNames), pick(etNames))
    val alias = pick(aliasPool)
    val n = 1 + rnd.nextInt(12)
    val base = Seq(0L, 1L, 1000L)(rnd.nextInt(3))
    val opVal = rnd.nextInt(4)
    val opNarrow = rnd.nextBoolean()
    val evolve = rnd.nextInt(4) == 0
    val nSlices = 1 + rnd.nextInt(3)
    val et0 = pick(instPool)
    val sysTime = pick(instPool)
    val rows = (0 until n).map(i => LRow(base + i, et0.plusSeconds(60L * i), i.toLong, s"w$i"))

    // Contiguous random slice boundaries; empty slices allowed (an empty
    // parquet file in a multi-file scan is a legitimate ledger state).
    val cutPoints = (Seq.fill(nSlices - 1)(rnd.nextInt(n + 1)).sorted :+ n).+:(0)
    val slices = cutPoints.sliding(2).map { case Seq(a, b) => rows.slice(a, b) }.toSeq

    val opType: DataType = if (opNarrow) ShortType else IntegerType
    def baseFields: Seq[StructField] = Seq(
      StructField(iv.offsetColumn, LongType, nullable = false),
      StructField(iv.operationTypeColumn, opType, nullable = false),
      StructField(iv.systemTimeColumn, TimestampType, nullable = false),
      StructField(iv.eventTimeColumn, TimestampType, nullable = false),
      StructField("v", LongType, nullable = false),
      StructField("w", StringType, nullable = false))
    val ingestTime = Timestamp.from(Instant.parse("2023-12-01T00:00:00Z"))
    val paths = slices.zipWithIndex.map { case (slice, k) =>
      val last = k == slices.length - 1
      val fields = if (evolve && last) baseFields :+ StructField("extra", LongType, nullable = true)
      else baseFields
      val opBox: Long => Any = if (opNarrow) _ => opVal.toShort else _ => opVal
      val sliceRows = slice.map { r =>
        val core = Seq[Any](r.offset, opBox(r.v), ingestTime, Timestamp.from(r.et), r.v, r.w)
        Row.fromSeq(if (evolve && last) core :+ (r.v * 10) else core)
      }
      val p = dir.resolve(s"slice$k.parquet")
      writeSlice(StructType(fields.toIndexedSeq), sliceRows, p)
      p.toString
    }

    val mode = rnd.nextInt(4) // 0 full, 1-2 partial, 3 no-data fallback
    val (dataPaths, interval) = mode match {
      case 3 => (Nil, None)
      case 0 => (paths, Some(OffsetInterval(base, base + n - 1)))
      case _ =>
        val a = base + rnd.nextInt(n)
        val b = math.min(a + rnd.nextInt(n), base + n - 1)
        (paths, Some(OffsetInterval(a, b)))
    }

    def wmSet(): Seq[Watermark] = Seq.fill(rnd.nextInt(4))(
      Watermark(sysTime, pick(instPool).plusSeconds(rnd.nextInt(1000).toLong)))
    val wm1 = wmSet()
    val ghost = rnd.nextInt(3) == 0
    val wm2 = if (ghost) wmSet() else Nil

    val ghostPath = dir.resolve("ghost.parquet")
    if (ghost) writeSlice(
      StructType(Seq(
        StructField("offset", LongType, nullable = false),
        StructField("op", IntegerType, nullable = false),
        StructField("system_time", TimestampType, nullable = false),
        StructField("event_time", TimestampType, nullable = false),
        StructField("gv", LongType, nullable = false)).toIndexedSeq),
      Seq(Row(0L, 0, ingestTime, ingestTime, 1L)), ghostPath)

    val filterMod = 2 + rnd.nextInt(4)
    val filterRes = rnd.nextInt(filterMod)
    val twoSteps = rnd.nextBoolean()
    val addConst = if (twoSteps) rnd.nextInt(100).toLong else 0L
    val propagate = rnd.nextInt(3) == 0

    val opSel1 = if (propagate) s", ${q(iv.operationTypeColumn)} AS op_tmp" else ""
    val opSelN = if (propagate) ", op_tmp" else ""
    val opOut = if (propagate) s", op_tmp AS ${q(ov.operationTypeColumn)}" else ""
    val s1 = s"SELECT ${q(iv.eventTimeColumn)} AS et_tmp, v, w$opSel1 " +
      s"FROM ${q(alias)} WHERE v % $filterMod != $filterRes"
    val steps =
      if (twoSteps) Seq(
        SqlQueryStep.named("step1", s1),
        SqlQueryStep.named("step2", s"SELECT et_tmp, v + $addConst AS v, w$opSelN FROM step1"),
        SqlQueryStep.output(s"SELECT et_tmp AS ${q(ov.eventTimeColumn)}, v AS v2, w$opOut FROM step2"))
      else Seq(
        SqlQueryStep.named("step1", s1),
        SqlQueryStep.output(s"SELECT et_tmp AS ${q(ov.eventTimeColumn)}, v AS v2, w$opOut FROM step1"))

    val nextOffset = Seq(0L, 7L, 123456789L)(rnd.nextInt(3))
    val outPath = dir.resolve("out.parquet").toString
    val inputs = Seq(
      TransformRequestInput(
        datasetId = "did:odf:fuzz-in", datasetAlias = alias, queryAlias = alias,
        vocab = iv, offsetInterval = interval, dataPaths = dataPaths,
        schemaFile = paths.head, explicitWatermarks = wm1)) ++
      (if (ghost) Seq(TransformRequestInput(
        datasetId = "did:odf:fuzz-ghost", datasetAlias = "ghost_t", queryAlias = "ghost_t",
        vocab = DatasetVocabulary(), offsetInterval = Some(OffsetInterval(0, 0)),
        dataPaths = Seq(ghostPath.toString), schemaFile = ghostPath.toString,
        explicitWatermarks = wm2))
      else Nil)

    val res = engine.executeTransform(TransformRequest(
      datasetId = "did:odf:fuzz-out", datasetAlias = "fuzz_out",
      systemTime = sysTime, vocab = ov, queries = steps, queryInputs = inputs,
      nextOffset = nextOffset, newDataPath = outPath))

    // --- in-memory model -------------------------------------------------
    val selected = (interval match {
      case None => Nil
      case Some(iv0) => rows.filter(r => r.offset >= iv0.start && r.offset <= iv0.end)
    }).filter(_.v % filterMod != filterRes)
    val expectedN = selected.size.toLong
    val expectedInterval =
      if (expectedN > 0) Some(OffsetInterval(nextOffset, nextOffset + expectedN - 1)) else None
    val perInputMax = Seq(
      wm1.map(_.eventTime).maxOption,
      if (ghost) wm2.map(_.eventTime).maxOption else None).flatten
    val expectedWm = if (perInputMax.isEmpty) None else Some(perInputMax.min)

    val ctx = s"seed=$seed iv=$iv ov=$ov mode=$mode slices=$nSlices evolve=$evolve " +
      s"propagate=$propagate narrow=$opNarrow"
    assert(res == Right(TransformResponseSuccess(expectedInterval, expectedWm)), s"$ctx res=$res")

    // --- written-parquet invariants -------------------------------------
    val out = spark.read.parquet(outPath)
    assert(out.schema.fieldNames.toSeq == Seq(
      ov.offsetColumn, ov.operationTypeColumn, ov.systemTimeColumn, ov.eventTimeColumn,
      "v2", "w"), ctx)
    assert(out.schema.fields.map(_.dataType).toSeq == Seq(
      LongType, IntegerType, TimestampType, TimestampType, LongType, StringType), ctx)

    val got = out.collect()
    assert(got.length.toLong == expectedN, ctx)
    assert(got.map(_.getLong(0)).sorted.toSeq ==
      (nextOffset until nextOffset + expectedN), s"$ctx offsets not dense")
    val expectedOp = if (propagate) opVal else OperationType.Append
    assert(got.forall(_.getInt(1) == expectedOp), ctx)
    assert(got.forall(_.getTimestamp(2) == Timestamp.from(sysTime)), ctx)
    val gotData = got.map(r => (r.getTimestamp(3), r.getLong(4), r.getString(5))).toSeq
    val expData = selected.map(r => (Timestamp.from(r.et), r.v + addConst, r.w))
    assert(gotData.sortBy(t => (t._2, t._3)) == expData.sortBy(t => (t._2, t._3)),
      s"$ctx data multiset mismatch")
    // Ledger order is scan order; with a single slice, scan order is file
    // order, so offsets must preserve the generated row order exactly.
    if (nSlices == 1)
      assert(got.sortBy(_.getLong(0)).map(_.getLong(4)).toSeq == expData.map(_._2), s"$ctx order")

    // Physical-footer spot check (sampled — one footer read per 25 cases):
    // system_time must be annotated TIMESTAMP(MILLIS, adjustedToUTC=true).
    if (seed % 25 == 0 && expectedN > 0) {
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
      val in = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(outPath), spark.sessionState.newHadoopConf())
      val reader = ParquetFileReader.open(in)
      try {
        val sch = reader.getFooter.getFileMetaData.getSchema
        val t = sch.getType(sch.getFieldIndex(ov.systemTimeColumn))
        t.asPrimitiveType().getLogicalTypeAnnotation match {
          case ts: TimestampLogicalTypeAnnotation =>
            assert(ts.isAdjustedToUTC && ts.getUnit.toString == "MILLIS", ctx)
          case other => fail(s"$ctx system_time logical type: $other")
        }
      } finally reader.close()
    }
  }

  /** One mutated request against the rejection surface. Input reuses a fixed
    * default-vocabulary ledger; only the output step is wrecked. */
  private def runMutation(seed: Long, kind: Int, slice: Path, dir: Path): Unit = {
    val rnd = new Random(seed)
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.length))
    val ov = DatasetVocabulary(pick(offsetNames), pick(opNames), pick(stNames), pick(etNames))
    val et = s"event_time AS ${q(ov.eventTimeColumn)}"
    val (outSql, expectFragment) = kind match {
      case 0 => (s"SELECT $et, v AS v2, 1 AS ${q(ov.offsetColumn)} FROM t",
        "conflicts with the system column")
      case 1 => (s"SELECT $et, v AS v2, 1 AS ${q(ov.systemTimeColumn)} FROM t",
        "conflicts with the system column")
      case 2 => (s"SELECT $et, v AS v2, CAST(0 AS BIGINT) AS ${q(ov.operationTypeColumn)} FROM t",
        "should be Int32")
      case 3 => (s"SELECT v AS v2, w FROM t", "was not found amongst")
      case 4 => (s"SELECT v AS ${q(ov.eventTimeColumn)}, w FROM t",
        "should be either Date or Timestamp")
      case _ => (s"SELEKT broken FROM t", "") // parse error — any message
    }
    val outPath = dir.resolve(s"mut$seed.parquet").toString
    val res = engine.executeTransform(TransformRequest(
      datasetId = "did:odf:mut", datasetAlias = "mut",
      systemTime = instPool.head, vocab = ov,
      queries = Seq(
        SqlQueryStep.named("t", "SELECT event_time, v, w FROM fuzz_src"),
        SqlQueryStep.output(outSql)),
      queryInputs = Seq(TransformRequestInput(
        datasetId = "did:odf:src", datasetAlias = "fuzz_src", queryAlias = "fuzz_src",
        vocab = DatasetVocabulary(), offsetInterval = Some(OffsetInterval(0, 2)),
        dataPaths = Seq(slice.toString), schemaFile = slice.toString,
        explicitWatermarks = Nil)),
      nextOffset = 0L, newDataPath = outPath))
    res match {
      case Left(InvalidQuery(msg)) =>
        assert(msg.contains(expectFragment), s"seed=$seed kind=$kind ov=$ov msg=$msg")
      case other => fail(s"seed=$seed kind=$kind ov=$ov expected InvalidQuery, got $other")
    }
    assert(Files.notExists(java.nio.file.Paths.get(outPath)),
      s"seed=$seed kind=$kind: output written despite rejection")
  }

  test("contract fuzz: 450 random TransformRequests match the in-memory model") {
    val root = Files.createTempDirectory("odf-contract-fuzz")
    for (seed <- 0L until 450L) {
      val dir = Files.createDirectory(root.resolve(s"case$seed"))
      runOne(seed, dir)
    }
  }

  /** One random raw-query (ingest-preprocessing, A17) request: the path
    * registers inputs as `input` with NO offset filtering, applies the view
    * chain, normalizes with the DEFAULT vocabulary, and skips validation
    * and system columns entirely (engine.rs:56-125). The model is the
    * filtered projection over all concatenated input files. */
  private def runRawOne(seed: Long, dir: Path): Unit = {
    val rnd = new Random(seed)
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.length))
    val n = 1 + rnd.nextInt(15)
    val nSlices = 1 + rnd.nextInt(3)
    val et0 = pick(instPool)
    val rows = (0 until n).map(i => LRow(i.toLong, et0.plusSeconds(60L * i), i.toLong, s"w$i"))
    val schema = StructType(Seq(
      StructField("event_time", TimestampType, nullable = false),
      StructField("v", LongType, nullable = false),
      StructField("w", StringType, nullable = false)).toIndexedSeq)
    val cutPoints = (Seq.fill(nSlices - 1)(rnd.nextInt(n + 1)).sorted :+ n).+:(0)
    val paths = cutPoints.sliding(2).zipWithIndex.map { case (Seq(a, b), k) =>
      val p = dir.resolve(s"raw$k.parquet")
      writeSlice(schema, rows.slice(a, b).map(r =>
        Row(Timestamp.from(r.et), r.v, r.w)), p)
      p.toString
    }.toSeq
    val filterMod = 2 + rnd.nextInt(4)
    val filterRes = rnd.nextInt(filterMod)
    val mult = 1 + rnd.nextInt(5)
    val twoSteps = rnd.nextBoolean()
    val steps =
      if (twoSteps) Seq(
        SqlQueryStep.named("a", s"SELECT event_time, v * $mult AS v2, w FROM input"),
        SqlQueryStep.output(s"SELECT event_time, v2, w FROM a WHERE v2 % $filterMod != $filterRes"))
      else Seq(
        SqlQueryStep.output(
          s"SELECT event_time, v * $mult AS v2, w FROM input WHERE (v * $mult) % $filterMod != $filterRes"))
    val outPath = dir.resolve("raw-out.parquet").toString
    val res = engine.executeRawQuery(RawQueryRequest(paths, steps, outPath))
    val selected = rows.filter(r => (r.v * mult) % filterMod != filterRes)
    assert(res == Right(RawQueryResponseSuccess(selected.size.toLong)),
      s"seed=$seed slices=$nSlices res=$res")
    val out = spark.read.parquet(outPath)
    // raw path adds NOTHING: no system columns, no reordering, no offsets
    assert(out.schema.fieldNames.toSeq == Seq("event_time", "v2", "w"), s"seed=$seed")
    val got = out.collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2))).toSeq
    val exp = selected.map(r => (Timestamp.from(r.et), r.v * mult, r.w))
    assert(got.sortBy(t => (t._2, t._3)) == exp.sortBy(t => (t._2, t._3)), s"seed=$seed")
  }

  test("raw-query fuzz: 100 random ingest requests match the in-memory model") {
    val root = Files.createTempDirectory("odf-contract-raw")
    for (seed <- 0L until 100L) {
      val dir = Files.createDirectory(root.resolve(s"case$seed"))
      runRawOne(seed, dir)
    }
  }

  /** One random chained request SEQUENCE — the ODF model is a LEDGER, and
    * the single-request loop above never exercises state that only exists
    * ACROSS requests: an upstream ledger that grows a slice per round
    * (dataPaths accumulate, the offset interval walks forward), schema
    * evolution arriving mid-sequence, output nextOffset chaining
    * (round r+1's nextOffset = round r's end + 1), per-round retraction
    * pass-through, and watermarks advancing per input. Each round is
    * checked against the stepwise-evolved in-memory model; after the last
    * round the CONCATENATED output ledger must read back as one dense
    * append-only history. The query chain, vocabularies, and propagation
    * mode are fixed per case — a derived dataset's transform doesn't
    * change between pulls. */
  private def runSequence(seed: Long, dir: Path): Unit = {
    val rnd = new Random(seed)
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.length))
    val iv = DatasetVocabulary(pick(offsetNames), pick(opNames), pick(stNames), pick(etNames))
    val ov = DatasetVocabulary(pick(offsetNames), pick(opNames), pick(stNames), pick(etNames))
    val alias = pick(aliasPool)
    val rounds = 3 + rnd.nextInt(3)
    val propagate = rnd.nextInt(3) == 0
    val opNarrow = rnd.nextBoolean()
    val filterMod = 2 + rnd.nextInt(4)
    val filterRes = rnd.nextInt(filterMod)
    val twoSteps = rnd.nextBoolean()
    val addConst = if (twoSteps) rnd.nextInt(100).toLong else 0L
    // slices written from round `evolveFrom` on carry an extra column the
    // schema file (slice 0) doesn't know — may be ≥ rounds (no evolution)
    val evolveFrom = 1 + rnd.nextInt(rounds + 2)
    val ghost = rnd.nextInt(3) == 0
    val et0 = pick(instPool)
    val nextOffset0 = Seq(0L, 7L, 1000L)(rnd.nextInt(3))
    val ingestTime = Timestamp.from(Instant.parse("2023-12-01T00:00:00Z"))
    val opType: DataType = if (opNarrow) ShortType else IntegerType

    val ghostPath = dir.resolve("ghost.parquet")
    if (ghost) writeSlice(
      StructType(Seq(
        StructField("offset", LongType, nullable = false),
        StructField("op", IntegerType, nullable = false),
        StructField("system_time", TimestampType, nullable = false),
        StructField("event_time", TimestampType, nullable = false),
        StructField("gv", LongType, nullable = false)).toIndexedSeq),
      Seq(Row(0L, 0, ingestTime, ingestTime, 1L)), ghostPath)

    val opSel1 = if (propagate) s", ${q(iv.operationTypeColumn)} AS op_tmp" else ""
    val opSelN = if (propagate) ", op_tmp" else ""
    val opOut = if (propagate) s", op_tmp AS ${q(ov.operationTypeColumn)}" else ""
    val s1 = s"SELECT ${q(iv.eventTimeColumn)} AS et_tmp, v, w$opSel1 " +
      s"FROM ${q(alias)} WHERE v % $filterMod != $filterRes"
    val steps =
      if (twoSteps) Seq(
        SqlQueryStep.named("step1", s1),
        SqlQueryStep.named("step2", s"SELECT et_tmp, v + $addConst AS v, w$opSelN FROM step1"),
        SqlQueryStep.output(s"SELECT et_tmp AS ${q(ov.eventTimeColumn)}, v AS v2, w$opOut FROM step2"))
      else Seq(
        SqlQueryStep.named("step1", s1),
        SqlQueryStep.output(s"SELECT et_tmp AS ${q(ov.eventTimeColumn)}, v AS v2, w$opOut FROM step1"))

    var upOffset = 0L
    var outOffset = nextOffset0
    var slicePaths = Vector.empty[String]
    var wmA = pick(instPool)
    var wmB = pick(instPool)
    var allWmPresent = true
    val gotWms = scala.collection.mutable.ArrayBuffer.empty[Instant]
    val outPaths = scala.collection.mutable.ArrayBuffer.empty[String]
    val cumulative = scala.collection.mutable.ArrayBuffer.empty[(Timestamp, Long, String)]

    for (r <- 0 until rounds) {
      // round 0 always has data (the schema file must exist); later rounds
      // may be empty pulls (no new data — the None-interval path)
      val nR = if (r == 0) 1 + rnd.nextInt(6) else rnd.nextInt(7)
      val sysTime = et0.plusSeconds(3600L * (r + 1))
      val evolve = r >= evolveFrom
      val rows = (0 until nR).map { i =>
        val off = upOffset + i
        LRow(off, et0.plusSeconds(60L * off), off, s"w$off")
      }
      if (nR > 0) {
        val fields = Seq(
          StructField(iv.offsetColumn, LongType, nullable = false),
          StructField(iv.operationTypeColumn, opType, nullable = false),
          StructField(iv.systemTimeColumn, TimestampType, nullable = false),
          StructField(iv.eventTimeColumn, TimestampType, nullable = false),
          StructField("v", LongType, nullable = false),
          StructField("w", StringType, nullable = false)) ++
          (if (evolve) Seq(StructField("extra", LongType, nullable = true)) else Nil)
        val sliceRows = rows.map { row =>
          val opV: Any =
            if (opNarrow) (row.offset % 4).toShort else (row.offset % 4).toInt
          val core = Seq[Any](row.offset, opV, ingestTime, Timestamp.from(row.et),
            row.v, row.w)
          Row.fromSeq(if (evolve) core :+ (row.v * 10) else core)
        }
        val p = dir.resolve(s"slice$r.parquet")
        writeSlice(StructType(fields.toIndexedSeq), sliceRows, p)
        slicePaths :+= p.toString
      }

      wmA = wmA.plusSeconds(rnd.nextInt(500).toLong)
      wmB = wmB.plusSeconds(rnd.nextInt(500).toLong)
      val emitA = rnd.nextInt(5) != 0
      val emitB = ghost && rnd.nextInt(5) != 0
      if (!emitA || (ghost && !emitB)) allWmPresent = false
      val wm1 = if (emitA)
        Seq(Watermark(sysTime, wmA)) ++
          (if (rnd.nextBoolean()) Seq(Watermark(sysTime, wmA.minusSeconds(60))) else Nil)
      else Nil
      val wm2 = if (emitB) Seq(Watermark(sysTime, wmB)) else Nil

      val interval =
        if (nR > 0) Some(OffsetInterval(upOffset, upOffset + nR - 1)) else None
      val dataPaths = if (nR > 0) slicePaths else Nil
      val outPath = dir.resolve(s"out$r.parquet").toString
      val inputs = Seq(
        TransformRequestInput(
          datasetId = "did:odf:seq-in", datasetAlias = alias, queryAlias = alias,
          vocab = iv, offsetInterval = interval, dataPaths = dataPaths,
          schemaFile = slicePaths.head, explicitWatermarks = wm1)) ++
        (if (ghost) Seq(TransformRequestInput(
          datasetId = "did:odf:seq-ghost", datasetAlias = "ghost_t", queryAlias = "ghost_t",
          vocab = DatasetVocabulary(), offsetInterval = None, dataPaths = Nil,
          schemaFile = ghostPath.toString, explicitWatermarks = wm2))
        else Nil)

      // occasionally a BROKEN pull lands mid-sequence (bad transform
      // version, operator error): it must reject WITHOUT writing a file,
      // and the ledger must continue from the same nextOffset as if the
      // failed pull never happened — no partial state survives a failure
      if (rnd.nextInt(4) == 0) {
        val badPath = dir.resolve(s"bad$r.parquet").toString
        val badSteps = Seq(
          SqlQueryStep.named("step1", s1),
          SqlQueryStep.output(
            s"SELECT ${q(iv.eventTimeColumn)} AS ${q(ov.eventTimeColumn)}, " +
              s"1 AS ${q(ov.offsetColumn)} FROM ${q(alias)}"))
        val bad = engine.executeTransform(TransformRequest(
          datasetId = "did:odf:seq-out", datasetAlias = "seq_out",
          systemTime = sysTime, vocab = ov, queries = badSteps, queryInputs = inputs,
          nextOffset = outOffset, newDataPath = badPath))
        assert(bad.isLeft && bad.swap.exists(_.isInstanceOf[InvalidQuery]),
          s"seed=$seed round=$r broken pull must reject: $bad")
        assert(Files.notExists(java.nio.file.Paths.get(badPath)),
          s"seed=$seed round=$r broken pull wrote a file")
      }

      val res = engine.executeTransform(TransformRequest(
        datasetId = "did:odf:seq-out", datasetAlias = "seq_out",
        systemTime = sysTime, vocab = ov, queries = steps, queryInputs = inputs,
        nextOffset = outOffset, newDataPath = outPath))

      // --- stepwise model ------------------------------------------------
      val selected = rows.filter(_.v % filterMod != filterRes)
      val n = selected.size.toLong
      val expectedInterval =
        if (n > 0) Some(OffsetInterval(outOffset, outOffset + n - 1)) else None
      val perInputMax = Seq(
        wm1.map(_.eventTime).maxOption,
        if (ghost) wm2.map(_.eventTime).maxOption else None).flatten
      val expectedWm = if (perInputMax.isEmpty) None else Some(perInputMax.min)
      val ctx = s"seed=$seed round=$r/$rounds iv=$iv ov=$ov propagate=$propagate " +
        s"narrow=$opNarrow evolveFrom=$evolveFrom ghost=$ghost nR=$nR"
      assert(res == Right(TransformResponseSuccess(expectedInterval, expectedWm)),
        s"$ctx res=$res")
      expectedWm.foreach(gotWms += _)

      if (n > 0) {
        val out = spark.read.parquet(outPath)
        val got = out.collect()
        assert(got.length.toLong == n, ctx)
        assert(got.map(_.getLong(0)).sorted.toSeq ==
          (outOffset until outOffset + n), s"$ctx offsets not dense from $outOffset")
        if (propagate)
          assert(got.map(r2 => (r2.getLong(4) - addConst, r2.getInt(1))).toSet ==
            selected.map(row => (row.v, (row.offset % 4).toInt)).toSet,
            s"$ctx retraction ops not passed through")
        else assert(got.forall(_.getInt(1) == OperationType.Append), ctx)
        assert(got.forall(_.getTimestamp(2) == Timestamp.from(sysTime)), ctx)
        val gotData = got.map(r2 =>
          (r2.getTimestamp(3), r2.getLong(4), r2.getString(5))).toSeq
        val expData = selected.map(row =>
          (Timestamp.from(row.et), row.v + addConst, row.w))
        assert(gotData.sortBy(t => (t._2, t._3)) == expData.sortBy(t => (t._2, t._3)),
          s"$ctx data multiset mismatch")
        cumulative ++= expData
        outPaths += outPath
      } else {
        // an empty pull still writes the slice file (0 rows, full stamped
        // schema) — kamu decides what to do with it; the engine's contract
        // is the None interval in the response plus a readable empty file
        val out = spark.read.parquet(outPath)
        assert(out.count() == 0L, s"$ctx empty round wrote rows")
        assert(out.schema.fieldNames.take(4).toSeq == Seq(
          ov.offsetColumn, ov.operationTypeColumn,
          ov.systemTimeColumn, ov.eventTimeColumn), s"$ctx empty-slice schema")
      }

      upOffset += nR
      outOffset += n
    }

    // with every input emitting watermarks every round and per-input maxima
    // only advancing, min-of-max must be non-decreasing across the sequence
    if (allWmPresent && gotWms.length >= 2)
      gotWms.toSeq.sliding(2).foreach { w =>
        assert(!w(1).isBefore(w(0)), s"seed=$seed watermark regressed: $gotWms")
      }

    // the concatenated output ledger is one dense append-only history
    if (outPaths.nonEmpty) {
      val all = spark.read.parquet(outPaths.toSeq: _*).collect()
      assert(all.length == cumulative.size, s"seed=$seed ledger row count")
      assert(all.map(_.getLong(0)).sorted.toSeq ==
        (nextOffset0 until nextOffset0 + cumulative.size),
        s"seed=$seed ledger offsets not dense across rounds")
      assert(all.map(r2 => (r2.getTimestamp(3), r2.getLong(4), r2.getString(5)))
        .toSeq.sortBy(t => (t._2, t._3)) ==
        cumulative.toSeq.sortBy(t => (t._2, t._3)),
        s"seed=$seed ledger data mismatch")
    }
  }

  /** One random RAW-QUERY request sequence (the A17 ingest path, fuzzed
    * per-request above): 3-5 chained rounds of ingest preprocessing over a
    * growing source — each round ships only its new batch (1-2 files,
    * possibly zero rows), the view chain is fixed per case (a dataset's
    * ingest preprocessing doesn't change between pulls), and ~1-in-4
    * rounds first fires a BROKEN step that must reject without writing and
    * without disturbing the next good pull. After the last round the
    * concatenated round outputs must equal the model's cumulative
    * selection — the raw path adds no system columns, so the readback
    * check is the data multiset plus per-file schema. */
  private def runRawSequence(seed: Long, dir: Path): Unit = {
    val rnd = new Random(seed)
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.length))
    val rounds = 3 + rnd.nextInt(3)
    val et0 = pick(instPool)
    val filterMod = 2 + rnd.nextInt(4)
    val filterRes = rnd.nextInt(filterMod)
    val mult = 1 + rnd.nextInt(5)
    val twoSteps = rnd.nextBoolean()
    val steps =
      if (twoSteps) Seq(
        SqlQueryStep.named("a", s"SELECT event_time, v * $mult AS v2, w FROM input"),
        SqlQueryStep.output(s"SELECT event_time, v2, w FROM a WHERE v2 % $filterMod != $filterRes"))
      else Seq(
        SqlQueryStep.output(
          s"SELECT event_time, v * $mult AS v2, w FROM input WHERE (v * $mult) % $filterMod != $filterRes"))
    val schema = StructType(Seq(
      StructField("event_time", TimestampType, nullable = false),
      StructField("v", LongType, nullable = false),
      StructField("w", StringType, nullable = false)).toIndexedSeq)

    var upNext = 0L
    val cumulative = scala.collection.mutable.ArrayBuffer.empty[(Timestamp, Long, String)]
    val outPaths = scala.collection.mutable.ArrayBuffer.empty[String]
    for (r <- 0 until rounds) {
      val nR = if (r == 0) 1 + rnd.nextInt(6) else rnd.nextInt(7)
      val rows = (0 until nR).map { i =>
        val off = upNext + i
        LRow(off, et0.plusSeconds(60L * off), off, s"w$off")
      }
      // this round's batch: 1-2 files (zero-row batches still ship a file —
      // an empty parquet with the source schema is a legitimate pull)
      val nFiles = 1 + rnd.nextInt(2)
      val cut = if (nFiles == 2) rnd.nextInt(nR + 1) else nR
      val paths = Seq(rows.take(cut), rows.drop(cut)).take(nFiles).zipWithIndex
        .map { case (chunk, k) =>
          val p = dir.resolve(s"raw${r}_$k.parquet")
          writeSlice(schema, chunk.map(row =>
            Row(Timestamp.from(row.et), row.v, row.w)), p)
          p.toString
        }
      // a broken pull mid-sequence: must reject, write nothing, and leave
      // the next good pull over the SAME batch unaffected
      if (rnd.nextInt(4) == 0) {
        val badPath = dir.resolve(s"rawbad$r.parquet").toString
        val bad = engine.executeRawQuery(RawQueryRequest(paths,
          Seq(SqlQueryStep.output("SELECT nope FROM input")), badPath))
        assert(bad.isLeft && bad.swap.exists(_.isInstanceOf[InvalidQuery]),
          s"seed=$seed round=$r broken raw pull must reject: $bad")
        assert(Files.notExists(java.nio.file.Paths.get(badPath)),
          s"seed=$seed round=$r broken raw pull wrote a file")
      }
      val outPath = dir.resolve(s"rawout$r.parquet").toString
      val res = engine.executeRawQuery(RawQueryRequest(paths, steps, outPath))
      val selected = rows.filter(row => (row.v * mult) % filterMod != filterRes)
      val ctx = s"seed=$seed round=$r/$rounds files=$nFiles nR=$nR mult=$mult " +
        s"mod=$filterMod res=$filterRes"
      assert(res == Right(RawQueryResponseSuccess(selected.size.toLong)), s"$ctx res=$res")
      val out = spark.read.parquet(outPath)
      assert(out.schema.fieldNames.toSeq == Seq("event_time", "v2", "w"), ctx)
      val got = out.collect().map(r2 => (r2.getTimestamp(0), r2.getLong(1), r2.getString(2))).toSeq
      val exp = selected.map(row => (Timestamp.from(row.et), row.v * mult, row.w))
      assert(got.sortBy(t => (t._2, t._3)) == exp.sortBy(t => (t._2, t._3)), ctx)
      cumulative ++= exp
      outPaths += outPath
      upNext += nR
    }
    // the concatenated ingest outputs equal the cumulative model selection
    val all = spark.read.parquet(outPaths.toSeq: _*).collect()
      .map(r2 => (r2.getTimestamp(0), r2.getLong(1), r2.getString(2))).toSeq
    assert(all.sortBy(t => (t._2, t._3)) == cumulative.toSeq.sortBy(t => (t._2, t._3)),
      s"seed=$seed cumulative ingest mismatch")
  }

  test("raw-query sequence fuzz: 100 chained ingest sequences match the stepwise model") {
    val root = Files.createTempDirectory("odf-contract-rawseq")
    for (seed <- 0L until 100L) {
      val dir = Files.createDirectory(root.resolve(s"case$seed"))
      runRawSequence(seed, dir)
    }
  }

  test("sequence fuzz: 200 chained request sequences evolve the ledger model stepwise") {
    val root = Files.createTempDirectory("odf-contract-seq")
    for (seed <- 0L until 200L) {
      val dir = Files.createDirectory(root.resolve(s"case$seed"))
      runSequence(seed, dir)
    }
  }

  test("rejection fuzz: 60 mutated requests all surface InvalidQuery, no file written") {
    val root = Files.createTempDirectory("odf-contract-mut")
    val slice = root.resolve("src.parquet")
    writeSlice(
      StructType(Seq(
        StructField("offset", LongType, nullable = false),
        StructField("op", IntegerType, nullable = false),
        StructField("system_time", TimestampType, nullable = false),
        StructField("event_time", TimestampType, nullable = false),
        StructField("v", LongType, nullable = false),
        StructField("w", StringType, nullable = false)).toIndexedSeq),
      (0 until 3).map(i => Row(i.toLong, 0, Timestamp.from(instPool.head),
        Timestamp.from(instPool.head.plusSeconds(i.toLong)), i.toLong, s"w$i")),
      slice)
    for (seed <- 0L until 60L) runMutation(seed, (seed % 6).toInt, slice, root)
  }
}
