package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the dedup signature computations.
  *
  * The composable higher-order-function versions (aggregate/zip_with/
  * transform) are interpreted per array element with boxing — ~60 ms per
  * document for a 64-bit SimHash at 80 tokens. These expressions evaluate
  * the same math in a tight JVM loop (µs per document): the
  * "custom Catalyst `Expression` beats a UDF beats interpreted HOFs"
  * preference order from the build brief. Hash values are identical to the
  * HOF versions (same xxhash64 seed 42, same derivation), so results are
  * unchanged — only faster.
  *
  * CodegenFallback is deliberate: the per-row work is one compiled method
  * call on a primitive loop; splicing it into whole-stage codegen would gain
  * little next to the O(tokens·bits) loop body itself.
  */
object NativeHashes {

  private def requireStringArray(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name expects array<string>, got ${other.simpleString}")
    }

  private def xxh(s: Any): Long = XxHash64Function.hash(s, StringType, 42L)

  private def pmod(a: Long, p: Long): Long = { val m = a % p; if (m < 0) m + p else m }

  /** 64-bit SimHash over a token array as 4 × 16-bit chunks
    * (semantics of [[graft.operators.Dedup.simhashChunks]]). */
  case class SimHashChunks(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = requireStringArray(child, "simhash_chunks")

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val counters = new Array[Int](64)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        val h = xxh(arr.getUTF8String(i))
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
          j += 1
        }
        i += 1
      }
      val chunks = new Array[Long](4)
      var c = 0
      while (c < 4) {
        var bits = 0L
        var j = 0
        while (j < 16) {
          if (counters(c * 16 + j) > 0) bits |= (1L << j)
          j += 1
        }
        chunks(c) = bits
        c += 1
      }
      new GenericArrayData(chunks)
    }

    override protected def withNewChildInternal(newChild: Expression): SimHashChunks =
      copy(child = newChild)
  }

  /** MinHash signature over a shingle array: numHashes universal-hash
    * permutations (semantics of [[graft.operators.Dedup.minhashSignature]],
    * identical a_i/b_i derivation). */
  case class MinHashSignature(child: Expression, numHashes: Int)
      extends UnaryExpression with CodegenFallback {

    private val P = 2147483647L // 2^31 - 1

    // a_i ∈ [1, P-1], b_i ∈ [0, P) — same derivation as the HOF version
    private lazy val as: Array[Long] =
      Array.tabulate(numHashes)(i => pmod(xxh(org.apache.spark.unsafe.types.UTF8String.fromString(s"mh-a-$i")), P - 1) + 1L)
    private lazy val bs: Array[Long] =
      Array.tabulate(numHashes)(i => pmod(xxh(org.apache.spark.unsafe.types.UTF8String.fromString(s"mh-b-$i")), P))

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = requireStringArray(child, "minhash_signature")

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val xs = new Array[Long](n)
      var i = 0
      while (i < n) { xs(i) = pmod(xxh(arr.getUTF8String(i)), P); i += 1 }
      val sig = new Array[Long](numHashes)
      var k = 0
      while (k < numHashes) {
        val a = as(k); val b = bs(k)
        var m = Long.MaxValue
        i = 0
        while (i < n) {
          val v = pmod(a * xs(i) + b, P)
          if (v < m) m = v
          i += 1
        }
        sig(k) = if (n == 0) 0L else m
        k += 1
      }
      new GenericArrayData(sig)
    }

    override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
      copy(child = newChild)
  }

  /** Word n-gram shingles straight from raw text: lowercase, trim,
    * whitespace-split, join n-token windows with single spaces — byte-for-
    * byte the strings produced by the composable
    * `transform(sequence, slice, concat_ws)` version in TextOps (which
    * costs ~2 ms/doc interpreted; this is a single pass). Texts shorter
    * than n tokens yield one shingle of all tokens. */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_shingles expects string, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any = {
      // trim() trims ASCII spaces only — same as Spark's `trim` function,
      // keeping the output byte-identical to the composable version
      val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .toLowerCase.trim().toString
      val tokens = text.split("\\s+", -1)
      val count = math.max(tokens.length - (n - 1), 1)
      val out = new Array[org.apache.spark.unsafe.types.UTF8String](count)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i < count) {
        sb.setLength(0)
        val end = math.min(i + n, tokens.length)
        var j = i
        while (j < end) {
          if (j > i) sb.append(' ')
          sb.append(tokens(j))
          j += 1
        }
        out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out.asInstanceOf[Array[Any]])
    }

    override protected def withNewChildInternal(newChild: Expression): WordShingles =
      copy(child = newChild)
  }

  /** Rabin-style rolling polynomial fingerprint over normalized text bytes:
    * h = Σ byte_i · B^(n-1-i) mod P, computed in one pass with Horner's
    * rule. The same window-shiftable hash family used for content-defined
    * chunking; exposed directly as a whole-document fingerprint. */
  case class RabinFingerprint(child: Expression)
      extends UnaryExpression with CodegenFallback {

    private val B = 1000003L
    private val P = 2147483647L // 2^31 - 1

    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"rabin_fingerprint expects string, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
      var h = 0L
      var i = 0
      while (i < bytes.length) {
        h = (h * B + (bytes(i) & 0xff)) % P
        i += 1
      }
      h
    }

    override protected def withNewChildInternal(newChild: Expression): RabinFingerprint =
      copy(child = newChild)
  }

  /** Cosine similarity between two float vectors, accumulated in double in
    * index order — value-identical to the composable
    * `aggregate(zip_with(...))` fold (and to the DuckDB DOUBLE[] oracle
    * formula), but a single primitive loop instead of an interpreted tree.
    *
    * Conventions (explicit, not accidental): a dimension mismatch is a data
    * bug and throws rather than silently truncating to the shorter vector;
    * a zero vector has undefined cosine and yields NULL (not NaN — NaN
    * compares unequal to itself and poisons downstream filters). */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity expects (array<float>, array<float>), got $other")
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n)
        throw new IllegalArgumentException(
          s"cosine_similarity: dimension mismatch ($n vs ${y.numElements()})")
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi; nx += xi * xi; ny += yi * yi
        i += 1
      }
      if (nx == 0.0 || ny == 0.0) null
      else dot / (math.sqrt(nx) * math.sqrt(ny))
    }

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
      copy(left = newLeft, right = newRight)
  }

  /** L2 norm of a float vector, accumulated in double in index order. */
  case class L2Norm(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"l2_norm expects array<float>, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any = {
      val x = input.asInstanceOf[ArrayData]
      var acc = 0.0
      var i = 0
      while (i < x.numElements()) {
        val v = x.getFloat(i).toDouble
        acc += v * v
        i += 1
      }
      math.sqrt(acc)
    }

    override protected def withNewChildInternal(newChild: Expression): L2Norm =
      copy(child = newChild)
  }

  /** Max-abs int8 quantization of a float vector:
    * `q_i = floor(x_i * 127 / maxAbs + 0.5)` (explicit floor(+0.5) so the
    * tie rule is engine-independent, unlike HALF_UP/half-away rounding).
    * Zero vectors quantize to zeros. The storage-shrink op of an embedding
    * pipeline — 4× smaller at ~0.4% max error. */
  case class QuantizeInt8(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(ByteType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"quantize_int8 expects array<float>, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any = {
      val x = input.asInstanceOf[ArrayData]
      val n = x.numElements()
      var maxAbs = 0.0
      var i = 0
      while (i < n) {
        val a = math.abs(x.getFloat(i).toDouble)
        if (a > maxAbs) maxAbs = a
        i += 1
      }
      val scale = if (maxAbs == 0.0) 0.0 else 127.0 / maxAbs
      val out = new Array[Byte](n)
      i = 0
      while (i < n) {
        val q = math.floor(x.getFloat(i).toDouble * scale + 0.5)
        out(i) = math.max(-127.0, math.min(127.0, q)).toByte
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): QuantizeInt8 =
      copy(child = newChild)
  }

  /** Bloom-filter membership probe: `key` is a LONG, `bloomBytes` a foldable
    * BINARY literal holding a serialized `org.apache.spark.util.sketch
    * .BloomFilter` (the sketch `df.stat.bloomFilter` builds). Unlike the
    * loop-heavy expressions above this one does REAL `doGenCode`: the probe
    * sits in the scan-side filter of a join's big input — the hottest row
    * path there is — so it must stay inside whole-stage codegen, one virtual
    * call per row against a shared deserialized filter
    * (`ctx.addReferenceObj`, the same mechanism Spark's injected runtime
    * filters use). */
  case class BloomMightContainLong(key: Expression, bloomBytes: Expression)
      extends Expression {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._

    override def children: Seq[Expression] = Seq(key, bloomBytes)
    override def nullable: Boolean = key.nullable
    override def dataType: DataType = BooleanType

    override def checkInputDataTypes(): TypeCheckResult = (key.dataType, bloomBytes.dataType) match {
      case (LongType, BinaryType) if bloomBytes.foldable => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain expects (bigint, foldable binary)")
    }

    @transient private lazy val bloom: org.apache.spark.util.sketch.BloomFilter =
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bloomBytes.eval(null).asInstanceOf[Array[Byte]]))

    override def eval(input: InternalRow): Any = {
      val k = key.eval(input)
      if (k == null) null else bloom.mightContainLong(k.asInstanceOf[Long])
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bloomRef = ctx.addReferenceObj(
        "bloomFilter", bloom, classOf[org.apache.spark.util.sketch.BloomFilter].getName)
      val k = key.genCode(ctx)
      ev.copy(code = code"""
        ${k.code}
        boolean ${ev.isNull} = ${k.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = $bloomRef.mightContainLong(${k.value});
        }""")
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): BloomMightContainLong =
      copy(key = newChildren(0), bloomBytes = newChildren(1))
  }

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects an int literal, got $other")
  }

  /** Register all native expressions as session functions (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("simhash_chunks",
      args => SimHashChunks(args.head), "built-in")
    registry.createOrReplaceTempFunction("minhash_signature",
      args => MinHashSignature(args.head, intLit(args(1), "minhash_signature")), "built-in")
    registry.createOrReplaceTempFunction("word_shingles",
      args => WordShingles(args.head, intLit(args(1), "word_shingles")), "built-in")
    registry.createOrReplaceTempFunction("cosine_similarity",
      args => CosineSimilarity(args.head, args(1)), "built-in")
    registry.createOrReplaceTempFunction("rabin_fingerprint",
      args => RabinFingerprint(args.head), "built-in")
    registry.createOrReplaceTempFunction("l2_norm",
      args => L2Norm(args.head), "built-in")
    registry.createOrReplaceTempFunction("quantize_int8",
      args => QuantizeInt8(args.head), "built-in")
    registry.createOrReplaceTempFunction("bloom_might_contain",
      args => BloomMightContainLong(args.head, args(1)), "built-in")
  }
}
