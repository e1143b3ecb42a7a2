package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Proves the NativeHashes expressions execute through REAL generated code,
  * not the CodegenFallback eval-call path, and that both paths agree.
  *
  * Three layers of evidence:
  *   1. the session forces codegen (`factoryMode=CODEGEN_ONLY`,
  *      `codegen.fallback=false`) — a Janino compile error in any doGenCode
  *      would fail the query instead of silently degrading;
  *   2. the generated source for a projection over every expression contains
  *      the direct `compute(`/`computeOrNull(` reference-object calls and no
  *      `.eval(` fallback for them;
  *   3. the codegen results equal the interpreted results obtained by
  *      eval'ing the same expressions directly on literals.
  */
class NativeCodegenSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-native-codegen")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .config("spark.sql.codegen.fallback", "false")
      // keep the projection an executed plan stage — otherwise
      // ConvertToLocalRelation evaluates it at optimize time and there is
      // no WholeStageCodegen stage left to inspect
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    NativeHashes.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val cents = Seq(Seq(1f, 0f, 0f), Seq(0f, 1f, 0f), Seq(0f, 0f, 1f))

  private def projected = {
    val s = spark
    import s.implicits._
    Seq(
      ("the quick brown fox jumps", Seq(0.6f, 0.8f, 0f), Seq(1f, 2f, 2f)),
      ("pack my box with jugs", Seq(0f, 0f, 0f), Seq(3f, 0f, 4f)))
      .toDF("text", "v1", "v2")
      .select(
        expr("simhash_chunks(split(text, ' '))").as("simhash"),
        expr("minhash_signature(split(text, ' '), 8)").as("minhash"),
        expr("word_shingles(text, 2)").as("shingles"),
        expr("rabin_fingerprint(text)").as("rabin"),
        expr("cosine_similarity(v1, v2)").as("cos"),
        expr("l2_norm(v2)").as("l2"),
        expr("quantize_int8(v2)").as("q8"),
        expr("hyperplane_bucket(v1, 3, 4)").as("bucket"),
        call_function("nearest_cells", col("v1"), typedLit(cents), lit(2)).as("cells"),
        call_function("bpe_units", col("text"),
          lit(NativeHashes.bpeMergesLiteral(Seq(("t", "h"), ("th", "e"))))).as("bpeu"))
  }

  test("generated source calls compute() directly — no CodegenFallback eval path") {
    val df = projected
    val plan = df.queryExecution.executedPlan
    assert(plan.exists(_.isInstanceOf[WholeStageCodegenExec]),
      s"projection must be whole-stage codegen'd:\n$plan")
    val generated = org.apache.spark.sql.execution.debug.codegenString(plan)
    assert(generated.contains(".compute("),
      "generated code must call the typed compute() methods")
    assert(generated.contains(".computeOrNull("),
      "cosine_similarity must call its boxed computeOrNull()")
    // CodegenFallback splices `references[i].eval(row)` casts per expression;
    // none of our expressions may take that path
    assert(!generated.contains("].eval("),
      "no expression may fall back to the eval-call (CodegenFallback) path")
  }

  test("codegen results ≡ interpreted eval on the same inputs") {
    val rows = projected.collect()
    val r = rows(0)

    def strArr(xs: Seq[String]): Literal =
      Literal.create(xs, ArrayType(StringType))
    def fltArr(xs: Seq[Float]): Literal =
      Literal.create(xs, ArrayType(FloatType))

    val tokens = "the quick brown fox jumps".split(' ').toSeq
    val simhash = NativeHashes.SimHashChunks(strArr(tokens))
      .eval(null).asInstanceOf[ArrayData].toLongArray.toSeq
    assert(r.getSeq[Long](0) == simhash)

    val minhash = NativeHashes.MinHashSignature(strArr(tokens), 8)
      .eval(null).asInstanceOf[ArrayData].toLongArray.toSeq
    assert(r.getSeq[Long](1) == minhash)

    val shingles = NativeHashes.WordShingles(Literal("the quick brown fox jumps"), 2)
      .eval(null).asInstanceOf[ArrayData].toArray[Any](StringType).map(_.toString).toSeq
    assert(r.getSeq[String](2) == shingles)

    val rabin = NativeHashes.RabinFingerprint(Literal("the quick brown fox jumps"))
      .eval(null).asInstanceOf[Long]
    assert(r.getLong(3) == rabin)

    val cos = NativeHashes.CosineSimilarity(
      fltArr(Seq(0.6f, 0.8f, 0f)), fltArr(Seq(1f, 2f, 2f)))
      .eval(null).asInstanceOf[Double]
    assert(r.getDouble(4) == cos)

    val l2 = NativeHashes.L2Norm(fltArr(Seq(1f, 2f, 2f))).eval(null).asInstanceOf[Double]
    assert(r.getDouble(5) == l2 && l2 == 3.0)

    val q8 = NativeHashes.QuantizeInt8(fltArr(Seq(1f, 2f, 2f)))
      .eval(null).asInstanceOf[ArrayData].toByteArray.toSeq
    assert(r.getSeq[Byte](6) == q8)

    val bucket = NativeHashes.HyperplaneSignature(fltArr(Seq(0.6f, 0.8f, 0f)), 3, 4)
      .eval(null).asInstanceOf[Int]
    assert(r.getInt(7) == bucket)

    val centsLit = Literal.create(cents, ArrayType(ArrayType(FloatType)))
    val cells = NativeHashes.NearestCells(fltArr(Seq(0.6f, 0.8f, 0f)), centsLit, 2)
      .eval(null).asInstanceOf[ArrayData].toIntArray.toSeq
    assert(r.getSeq[Int](8) == cells && cells == Seq(1, 0),
      "0.6/0.8 vector is nearest the y-axis centroid, then x")

    val bpeu = NativeHashes.BpeUnits(Literal("the quick brown fox jumps"),
      NativeHashes.bpeMergesLiteral(Seq(("t", "h"), ("th", "e"))))
      .eval(null).asInstanceOf[ArrayData].toArray[Any](StringType).map(_.toString).toSeq
    assert(r.getSeq[String](9) == bpeu && bpeu.head == "the",
      "rank-ordered merges (t,h) then (th,e) must fuse the leading 'the'")
  }

  test("type-derived dialect expressions (arrow_typeof, array_ndims) emit real codegen") {
    // Both are foldable and normally constant-fold away; excluding
    // ConstantFolding forces them through doGenCode, where (under this
    // session's CODEGEN_ONLY + fallback=false) a broken implementation
    // fails the query instead of silently degrading.
    val s = spark
    import s.implicits._
    DataFusionCompat.register(spark)
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation," +
        "org.apache.spark.sql.catalyst.optimizer.ConstantFolding")
    try {
      val df = Seq(Tuple1(Seq(1.0, 2.0))).toDF("arr")
        .select(expr("arrow_typeof(arr)").as("t"), expr("array_ndims(arr)").as("d"))
      val plan = df.queryExecution.executedPlan
      assert(plan.exists(_.isInstanceOf[WholeStageCodegenExec]),
        s"projection must be whole-stage codegen'd:\n$plan")
      val generated = org.apache.spark.sql.execution.debug.codegenString(plan)
      assert(!generated.contains("].eval("),
        "arrow_typeof/array_ndims must not take the CodegenFallback path")
      val r = df.collect()(0)
      assert(r.getString(0) == "List(Float64)")
      assert(r.getLong(1) == 1L)
    } finally {
      spark.conf.set("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    }
  }

  test("null semantics survive codegen: null inputs and zero-vector cosine") {
    val s = spark
    import s.implicits._
    val r = Seq((Option.empty[String], Option.empty[Seq[Float]], Seq(0f, 0f, 0f)))
      .toDF("text", "nv", "zero")
      .select(
        expr("simhash_chunks(split(text, ' '))"),
        expr("rabin_fingerprint(text)"),
        expr("l2_norm(nv)"),
        // zero vector: cosine undefined → NULL, not NaN (second operand real)
        expr("cosine_similarity(zero, array(1.0f, 2.0f, 2.0f))"),
        call_function("nearest_cells", col("nv"), typedLit(cents), lit(2)))
      .collect()(0)
    (0 until 5).foreach(i => assert(r.isNullAt(i), s"column $i must be NULL"))
  }

  test("r16 hardening: NaN centroids lose, null elements skip, malformed inputs fail with named errors") {
    // a NaN centroid (k-means over a corrupted embedding) maps to the
    // -Infinity sentinel — without it, the strict-'>' selection seeded on
    // the NaN cell could never be displaced and ONE bad centroid absorbed
    // every row (the NaN cell must have the LARGEST id to trigger: the
    // descending scan seeds on it)
    val nanPick = spark.sql(
      """SELECT nearest_cells(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |  array(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |        array(CAST('NaN' AS FLOAT), CAST('NaN' AS FLOAT))), 1) AS c""".stripMargin)
      .collect()(0).getSeq[Int](0)
    assert(nanPick == Seq(0), s"a NaN centroid must never win the slot: $nanPick")
    // null ELEMENTS are skipped, not hashed representation-dependently
    // (UnsafeArrayData yields empty bytes where GenericArrayData yields
    // null): signatures with and without the null slot must agree
    val sigs = spark.sql(
      """SELECT minhash_signature(array('a', CAST(NULL AS STRING), 'b'), 4) AS m1,
        |       minhash_signature(array('a', 'b'), 4) AS m2,
        |       simhash_chunks(array('a', CAST(NULL AS STRING), 'b')) AS s1,
        |       simhash_chunks(array('a', 'b')) AS s2""".stripMargin).collect()(0)
    assert(sigs.getSeq[Long](0) == sigs.getSeq[Long](1), "minhash must skip null elements")
    assert(sigs.getSeq[Long](2) == sigs.getSeq[Long](3), "simhash must skip null elements")
    // size parameters are rejected at expression construction, not as a
    // per-row NegativeArraySize/empty-window surprise at execution
    assertThrows[Exception](spark.sql("SELECT word_shingles('a b', 0)").collect())
    assertThrows[Exception](spark.sql("SELECT minhash_signature(array('a'), 0)").collect())
    // a NULL bloom-filter literal is an analysis error, not an NPE when the
    // lazy filter deserializes at codegen time
    assertThrows[Exception](
      spark.sql("SELECT bloom_might_contain(CAST(1 AS BIGINT), CAST(NULL AS BINARY))").collect())
    // a malformed merge literal (missing the U+0001 part separator) names
    // the problem instead of a bare StringIndexOutOfBoundsException
    val e = intercept[Exception](spark.sql("SELECT bpe_units('ab', 'xy')").collect())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("part separator")), s"unnamed failure: $msgs")
  }
}
