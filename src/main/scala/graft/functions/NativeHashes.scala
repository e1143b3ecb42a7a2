package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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
  * Every expression here does real `doGenCode`: a typed `compute` method on
  * the expression holds the primitive loop, and the generated code calls it
  * through `ctx.addReferenceObj` on unboxed child values (the same mechanism
  * Spark's injected runtime filters use). The interpreted `nullSafeEval`
  * path calls the identical method, so both paths are one shared body. This
  * keeps the signature/bucketing map stages — the dominant scan cost of
  * every dedup/ANN query at 100 TB — inside whole-stage codegen: children
  * pipeline their values in registers instead of materializing an
  * `InternalRow` for a `CodegenFallback` eval, and there is no per-row
  * boxing of inputs.
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
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = requireStringArray(child, "simhash_chunks")

    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

    def compute(arr: ArrayData): ArrayData = {
      val counters = new Array[Int](64)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        // null elements are SKIPPED (r16 review): accessing a null slot is
        // representation-dependent (UnsafeArrayData yields empty bytes,
        // GenericArrayData yields null), so an explicit check keeps the
        // signature a pure function of the logical array. In-repo inputs
        // (tokens/shingles) never contain nulls.
        if (!arr.isNullAt(i)) {
          val h = xxh(arr.getUTF8String(i))
          var j = 0
          while (j < 64) {
            if (((h >>> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
            j += 1
          }
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

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("simhash", this, classOf[SimHashChunks].getName)
      defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
    }

    override protected def withNewChildInternal(newChild: Expression): SimHashChunks =
      copy(child = newChild)
  }

  /** MinHash signature over a shingle array: numHashes universal-hash
    * permutations (semantics of [[graft.operators.Dedup.minhashSignature]],
    * identical a_i/b_i derivation). */
  case class MinHashSignature(child: Expression, numHashes: Int)
      extends UnaryExpression {

    require(numHashes >= 1, s"minhash_signature: numHashes must be >= 1, got $numHashes")

    private val P = 2147483647L // 2^31 - 1

    // a_i ∈ [1, P-1], b_i ∈ [0, P) — same derivation as the HOF version
    @transient private lazy val as: Array[Long] =
      Array.tabulate(numHashes)(i => pmod(xxh(UTF8String.fromString(s"mh-a-$i")), P - 1) + 1L)
    @transient private lazy val bs: Array[Long] =
      Array.tabulate(numHashes)(i => pmod(xxh(UTF8String.fromString(s"mh-b-$i")), P))

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = requireStringArray(child, "minhash_signature")

    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

    def compute(arr: ArrayData): ArrayData = {
      val n = arr.numElements()
      val xs = new Array[Long](n)
      var m0 = 0
      var i = 0
      while (i < n) {
        // null elements are skipped — treated as absent from the shingle
        // set (same representation-dependence rationale as SimHashChunks)
        if (!arr.isNullAt(i)) { xs(m0) = pmod(xxh(arr.getUTF8String(i)), P); m0 += 1 }
        i += 1
      }
      val sig = new Array[Long](numHashes)
      var k = 0
      while (k < numHashes) {
        val a = as(k); val b = bs(k)
        var m = Long.MaxValue
        i = 0
        while (i < m0) {
          val v = pmod(a * xs(i) + b, P)
          if (v < m) m = v
          i += 1
        }
        sig(k) = if (m0 == 0) 0L else m
        k += 1
      }
      new GenericArrayData(sig)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSignature].getName)
      defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
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
      extends UnaryExpression {

    require(n >= 1, s"word_shingles: n must be >= 1, got $n")

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"word_shingles expects string, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

    def compute(input: UTF8String): ArrayData = {
      // trim() trims ASCII spaces only — same as Spark's `trim` function,
      // keeping the output byte-identical to the composable version
      val text = input.toLowerCase.trim().toString
      val tokens = text.split("\\s+", -1)
      val count = math.max(tokens.length - (n - 1), 1)
      val out = new Array[UTF8String](count)
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
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out.asInstanceOf[Array[Any]])
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("shingles", this, classOf[WordShingles].getName)
      defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
    }

    override protected def withNewChildInternal(newChild: Expression): WordShingles =
      copy(child = newChild)
  }

  /** Rabin-style rolling polynomial fingerprint over normalized text bytes:
    * h = Σ byte_i · B^(n-1-i) mod P, computed in one pass with Horner's
    * rule. The same window-shiftable hash family used for content-defined
    * chunking; exposed directly as a whole-document fingerprint. */
  case class RabinFingerprint(child: Expression)
      extends UnaryExpression {

    private val B = 1000003L
    private val P = 2147483647L // 2^31 - 1

    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"rabin_fingerprint expects string, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

    def compute(input: UTF8String): Long = {
      val bytes = input.getBytes
      var h = 0L
      var i = 0
      while (i < bytes.length) {
        h = (h * B + (bytes(i) & 0xff)) % P
        i += 1
      }
      h
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("rabin", this, classOf[RabinFingerprint].getName)
      defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
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
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity expects (array<float>, array<float>), got $other")
    }

    override def nullSafeEval(a: Any, b: Any): Any =
      computeOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    /** Boxed return — null encodes the undefined zero-vector cosine for both
      * the interpreted and the generated path. */
    def computeOrNull(x: ArrayData, y: ArrayData): java.lang.Double = {
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
      else java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("cosSim", this, classOf[CosineSimilarity].getName)
      val boxed = ctx.freshName("cosBoxed")
      nullSafeCodeGen(ctx, ev, (x, y) => s"""
        java.lang.Double $boxed = $ref.computeOrNull($x, $y);
        if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.doubleValue(); }""")
    }

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
      copy(left = newLeft, right = newRight)
  }

  /** L2 norm of a float vector, accumulated in double in index order. */
  case class L2Norm(child: Expression)
      extends UnaryExpression {

    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"l2_norm expects array<float>, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

    def compute(x: ArrayData): Double = {
      var acc = 0.0
      var i = 0
      while (i < x.numElements()) {
        val v = x.getFloat(i).toDouble
        acc += v * v
        i += 1
      }
      math.sqrt(acc)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("l2norm", this, classOf[L2Norm].getName)
      defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
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
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(ByteType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"quantize_int8 expects array<float>, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

    def compute(x: ArrayData): ArrayData = {
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

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("quantize", this, classOf[QuantizeInt8].getName)
      defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
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
      // the null probe is safe here: bloomBytes is foldable, and a NULL
      // filter would otherwise surface as a bare NPE when the lazy bloom
      // is first forced at codegen time (r16 review)
      case (LongType, BinaryType) if bloomBytes.foldable =>
        if (bloomBytes.eval(null) == null)
          TypeCheckResult.TypeCheckFailure("bloom_might_contain: bloom filter bytes are null")
        else TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain expects (bigint, foldable binary)")
    }

    @transient private lazy val bloom: org.apache.spark.util.sketch.BloomFilter =
      try org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bloomBytes.eval(null).asInstanceOf[Array[Byte]]))
      catch {
        case e: java.io.IOException => throw new IllegalArgumentException(
          "bloom_might_contain: malformed bloom filter bytes", e)
      }

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

  /** Random-hyperplane LSH signature: `bits` sign bits of dot products with
    * deterministic ±1 planes (LCG over (bit, dim) — no stored model, same
    * derivation as the composable version it replaces, so buckets are
    * identical). Returns an int bucket id in [0, 2^bits).
    *
    * This sits on the bucketing scan of every LSH ANN / near-dup query —
    * at 100 TB the bucketing map stage IS the cost — and replaces `bits`
    * interpreted `aggregate(zip_with(...))` folds per row (~ms/row on
    * ~100-dim vectors) with one primitive O(bits·dims) loop.
    *
    * A dims mismatch throws (a config bug should fail loudly; the HOF
    * version silently produced bucket 0). A NULL vector yields NULL. */
  case class HyperplaneSignature(child: Expression, dims: Int, bits: Int)
      extends UnaryExpression {

    require(bits >= 1 && bits <= 30, s"hyperplane_bucket: bits must be in [1,30], got $bits")

    // ±1 plane weights, flattened bits×dims; identical formula to the
    // retired VectorOps.planeWeights so existing bucket ids are preserved
    @transient private lazy val weights: Array[Double] = {
      val w = new Array[Double](bits * dims)
      var b = 0
      while (b < bits) {
        var d = 0
        while (d < dims) {
          val seed = b.toLong * 1000003L + d.toLong * 7919L
          val x = seed * 6364136223846793005L + 1442695040888963407L
          w(b * dims + d) = if (x < 0) -1.0 else 1.0
          d += 1
        }
        b += 1
      }
      w
    }

    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hyperplane_bucket expects array<float>, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

    def compute(x: ArrayData): Int = {
      if (x.numElements() != dims)
        throw new IllegalArgumentException(
          s"hyperplane_bucket: expected $dims dims, got ${x.numElements()}")
      var bucket = 0
      var b = 0
      while (b < bits) {
        var proj = 0.0
        val base = b * dims
        var d = 0
        while (d < dims) {
          proj += x.getFloat(d).toDouble * weights(base + d)
          d += 1
        }
        if (proj > 0) bucket |= (1 << b)
        b += 1
      }
      bucket
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("hyperplane", this, classOf[HyperplaneSignature].getName)
      defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
    }

    override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
      copy(child = newChild)
  }

  /** Top-`n` centroid ids for a vector by cosine similarity, descending —
    * ties and incomparable (NULL-cosine) cells ordered exactly as the
    * struct-array `slice(reverse(array_sort(...)))` pattern it replaces:
    * equal cosines break toward the LARGER cell id, NULL-cosine cells sort
    * after every real score, again by larger id. O(n·k) selection per row
    * instead of an O(k log k) interpreted sort over k allocated structs.
    *
    * `centroids` must be a foldable array<array<float>> literal (the
    * k-means output is driver-side, so centroid assignment stays a pure
    * map stage — no join, no shuffle). A NULL vector yields NULL (the HOF
    * version returned the last cell id — a meaningless label for a null
    * embedding). */
  case class NearestCells(vec: Expression, centroidsExpr: Expression, n: Int)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

    require(n >= 1, s"nearest_cells: n must be >= 1, got $n")

    override def left: Expression = vec
    override def right: Expression = centroidsExpr
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult =
      (vec.dataType, centroidsExpr.dataType) match {
        case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _))
          if centroidsExpr.foldable => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          "nearest_cells expects (array<float>, foldable array<array<float>>)")
      }

    @transient private lazy val centroids: Array[Array[Float]] = {
      val arr = centroidsExpr.eval(null).asInstanceOf[ArrayData]
      Array.tabulate(arr.numElements()) { c =>
        val cell = arr.getArray(c)
        // reject at first use with a named error instead of a bare NPE
        // from toFloatArray (r16 review)
        require(cell != null, s"nearest_cells: centroid $c is null")
        cell.toFloatArray()
      }
    }

    override def nullSafeEval(v: Any, ignored: Any): Any = compute(v.asInstanceOf[ArrayData])

    def compute(x: ArrayData): ArrayData = {
      // one O(dims) copy so the k×dims inner loop below reads a primitive
      // array instead of paying a virtual ArrayData accessor per element
      // (r16 review — this is ivfFlatTopK's per-row hot path)
      val xs = x.toFloatArray()
      val dims = xs.length
      val k = centroids.length
      // cosine per cell, double accumulation in index order (identical math
      // to CosineSimilarity); NULL and NaN cosines → -Infinity sentinel
      // (real cosines live in [-1, 1], so the sentinel is unambiguous).
      // The NaN mapping matters (r16 review): a NaN centroid — k-means over
      // data containing a corrupted embedding — yields NaN cosines, and the
      // strict-'>' selection below can never displace a NaN once seeded, so
      // without the sentinel ONE bad centroid would absorb every row.
      val cos = new Array[Double](k)
      var nx = 0.0
      var i = 0
      while (i < dims) { val xi = xs(i).toDouble; nx += xi * xi; i += 1 }
      var c = 0
      while (c < k) {
        val cent = centroids(c)
        if (cent.length != dims)
          throw new IllegalArgumentException(
            s"nearest_cells: dimension mismatch ($dims vs ${cent.length})")
        var dot = 0.0; var ny = 0.0
        i = 0
        while (i < dims) {
          val yi = cent(i).toDouble
          dot += xs(i).toDouble * yi; ny += yi * yi
          i += 1
        }
        val cv = if (nx == 0.0 || ny == 0.0) Double.NegativeInfinity
          else dot / (math.sqrt(nx) * math.sqrt(ny))
        cos(c) = if (java.lang.Double.isNaN(cv)) Double.NegativeInfinity else cv
        c += 1
      }
      val m = math.min(n, k)
      val out = new Array[Int](m)
      val used = new Array[Boolean](k)
      var s = 0
      while (s < m) {
        var best = -1
        var bestV = 0.0
        c = k - 1 // descending scan + strict '>' ⇒ ties pick the larger id
        while (c >= 0) {
          if (!used(c) && (best == -1 || cos(c) > bestV)) { best = c; bestV = cos(c) }
          c -= 1
        }
        used(best) = true
        out(s) = best
        s += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val arrayCls = classOf[ArrayData].getName
      // centroidsExpr is foldable (checkInputDataTypes), so its null check
      // folds at codegen time instead of re-evaluating a k×dims array
      // literal per row; a null centroid literal makes the whole expression
      // null (BinaryExpression.eval semantics)
      if (centroidsExpr.eval(null) == null) {
        ev.copy(code = code"""
          boolean ${ev.isNull} = true;
          $arrayCls ${ev.value} = null;""")
      } else {
        val ref = ctx.addReferenceObj("nearestCells", this, classOf[NearestCells].getName)
        val v = vec.genCode(ctx)
        ev.copy(code = code"""
          ${v.code}
          boolean ${ev.isNull} = ${v.isNull};
          $arrayCls ${ev.value} = null;
          if (!${ev.isNull}) {
            ${ev.value} = $ref.compute(${v.value});
          }""")
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): NearestCells =
      copy(vec = newLeft, centroidsExpr = newRight)
  }

  /** BPE merge application compiled into ONE native expression — the
    * production path for large merge tables, where a plan-literal
    * `replace` chain (one call per rank) stops being viable past O(100)
    * ranks. Semantics are EXACTLY the sentinel-replace chain it replaces
    * ([[graft.operators.LanguageModel.bpeEncode]]'s documented rule):
    * merges apply in rank order, each rank as one left-to-right
    * non-overlapping pass over the unit sequence — NOT the
    * lowest-rank-priority-queue variant some tokenizers use, whose result
    * can differ on hand-crafted (non-train-produced) tables. Output is
    * the final unit array.
    *
    * Per-word cost is O(Σ bucket(unit) + ranks/64 + applied·len) — NOT
    * O(ranks): a unit→ranks index (built once from the literal) means a
    * word only ever looks at ranks that mention one of ITS units. A rank
    * becomes a candidate when both its parts are in the unit-membership
    * set (chars up front, each merged unit as it lands — landing a unit
    * offers its ranks); candidates collect in a BitSet and are processed
    * in ascending rank order (`nextSetBit` — the forward-only walk), which
    * reproduces the sequential pass rule exactly: a candidate set BELOW
    * the walk position is a rank whose part only landed after its pass
    * already went by — sequential would have found nothing then, so the
    * walk correctly never revisits it. Only candidate ranks pay the
    * O(len) pair scan. At 100M distinct words × 32k ranks the r12
    * all-ranks probe loop was ~10¹² hash probes cluster-wide; the index
    * makes per-word work proportional to the word's OWN units' rank
    * buckets. Work runs over DISTINCT words (the caller's vocab frame),
    * so encode cost is corpus-size-independent.
    *
    * The merge table rides in ONE string literal: `a`␁`b` within a pair,
    * ␂ between pairs. Both separators sit inside U+0000–U+0008 — the
    * range [[graft.operators.LanguageModel.bpeWords]] strips from every
    * word — so they can never collide with unit content (the builder
    * rejects a table that contains them). */
  case class BpeUnits(child: Expression, mergesLit: String)
      extends UnaryExpression {

    // lazy for the same reason as unitToRanks below: parsed once on the
    // instance that evaluates (driver interpreted eval or post-
    // deserialization on the executor), not on every planning-time copy;
    // the compact literal is what rides the serialized expression
    // ONE tokenization pass feeds both part arrays (r16 review — a 32k-rank
    // table is multi-MB, and the per-pair separator is validated here with
    // a named error instead of a bare StringIndexOutOfBounds at first row)
    @transient private lazy val merges: (Array[String], Array[String]) =
      if (mergesLit.isEmpty) (Array.empty, Array.empty)
      else {
        val pairs = mergesLit.split("\u0002", -1)
        val a = new Array[String](pairs.length)
        val b = new Array[String](pairs.length)
        var r = 0
        while (r < pairs.length) {
          val p = pairs(r)
          val sep = p.indexOf('\u0001')
          if (sep < 0) throw new IllegalArgumentException(
            s"bpe_units: merge pair $r lacks the U+0001 part separator")
          a(r) = p.substring(0, sep)
          b(r) = p.substring(sep + 1)
          r += 1
        }
        (a, b)
      }
    @transient private lazy val mergesA: Array[String] = merges._1
    @transient private lazy val mergesB: Array[String] = merges._2

    /** unit → ascending ranks mentioning it (as either part; a == b
      * listed once). Read-only at eval time, so concurrent tasks share it
      * safely. `lazy`: Catalyst copies the expression on every
      * tree-transform rule (withNewChildInternal → copy), and an eager
      * index would be rebuilt per copy during PLANNING — for a 32k-rank
      * table that's repeated multi-MB churn before a row is evaluated;
      * lazy defers construction to the one instance that executes. */
    @transient private lazy val unitToRanks: java.util.HashMap[String, Array[Int]] = {
      val tmp = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Int]]()
      var r = 0
      while (r < mergesA.length) {
        tmp.computeIfAbsent(mergesA(r), _ => scala.collection.mutable.ArrayBuffer.empty[Int]) += r
        if (mergesB(r) != mergesA(r))
          tmp.computeIfAbsent(mergesB(r), _ => scala.collection.mutable.ArrayBuffer.empty[Int]) += r
        r += 1
      }
      val out = new java.util.HashMap[String, Array[Int]](tmp.size * 2)
      tmp.forEach((k, v) => out.put(k, v.toArray))
      out
    }

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_units expects string, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

    def compute(input: UTF8String): ArrayData = {
      val word = input.toString
      var units = new Array[String](word.codePointCount(0, word.length))
      val present = new java.util.HashSet[String](math.max(16, units.length * 2))
      var i = 0
      var u = 0
      while (i < word.length) {
        val n = Character.charCount(word.codePointAt(i))
        units(u) = word.substring(i, i + n)
        present.add(units(u))
        u += 1
        i += n
      }
      var len = units.length
      if (len > 1 && mergesA.length > 0) {
        // candidate ranks: set when both parts are in the membership set,
        // processed in ascending order via the forward-only BitSet walk
        val cand = new java.util.BitSet(mergesA.length)
        // offer the ranks of a just-landed unit: a rank becomes a
        // candidate once its OTHER part is also present (present only
        // grows, so the check at offer time stays valid at process time)
        def offer(u: String): Unit = {
          val rs = unitToRanks.get(u)
          if (rs != null) {
            var k = 0
            while (k < rs.length) {
              val r = rs(k)
              val other = if (mergesA(r) == u) mergesB(r) else mergesA(r)
              if (present.contains(other)) cand.set(r)
              k += 1
            }
          }
        }
        val it = present.iterator()
        while (it.hasNext) offer(it.next())
        var m = cand.nextSetBit(0)
        while (m >= 0 && len > 1) {
          val a = mergesA(m)
          val b = mergesB(m)
          var w = 0
          var r = 0
          var merged = false
          val out = new Array[String](len)
          while (r < len) {
            if (r + 1 < len && units(r) == a && units(r + 1) == b) {
              out(w) = a + b; merged = true; w += 1; r += 2
            } else { out(w) = units(r); w += 1; r += 1 }
          }
          if (merged) {
            units = out; len = w
            if (present.add(a + b)) offer(a + b)
          }
          m = cand.nextSetBit(m + 1)
        }
      }
      val res = new Array[AnyRef](len)
      var k = 0
      while (k < len) { res(k) = UTF8String.fromString(units(k)); k += 1 }
      new GenericArrayData(res)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeUnits", this, classOf[BpeUnits].getName)
      defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
    }

    override protected def withNewChildInternal(newChild: Expression): BpeUnits =
      copy(child = newChild)
  }

  /** Serialize a merge table into [[BpeUnits]]' literal form, rejecting
    * parts that contain the separators (impossible for tables trained
    * through [[graft.operators.LanguageModel.bpeWords]]' stripped words,
    * possible for hand-built ones — fail loudly, never corrupt). */
  def bpeMergesLiteral(merges: Seq[(String, String)]): String = {
    merges.foreach { case (a, b) =>
      require(!(a + b).exists(c => c == '\u0001' || c == '\u0002'),
        s"bpe merge parts must not contain U+0001/U+0002: ($a, $b)")
    }
    merges.map { case (a, b) => a + "\u0001" + b }.mkString("\u0002")
  }

  /** Lucene-variant BM25 idf from a document frequency:
    * `StrictMath.log((n − df + 0.5) / (df + 0.5) + 1.0)`.
    *
    * One expression instead of a Catalyst arithmetic tree so the operation
    * ORDER is pinned to the exact sequence
    * [[graft.operators.SearchIndex.bm25BatchTopK]]'s driver-side fold uses
    * (and `StrictMath.log`, where Spark's `log()` lowers to the
    * platform-intrinsic `Math.log` — a last-ulp divergence risk). The
    * distributed large-query-table fallback computes idf through this and
    * stays bit-equal to the broadcast path's collected fold. */
  case class Bm25Idf(child: Expression, n: Long) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bm25_idf expects bigint df, got ${other.simpleString}")
    }

    override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[Long])

    def compute(dfLong: Long): Double = {
      val df = dfLong.toDouble
      StrictMath.log((n - df + 0.5) / (df + 0.5) + 1.0)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bm25idf", this, classOf[Bm25Idf].getName)
      defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
    }

    override protected def withNewChildInternal(newChild: Expression): Bm25Idf =
      copy(child = newChild)
  }

  private def longLit(e: Expression, fn: String): Long = e match {
    case Literal(v: Long, LongType) => v
    case Literal(v: Int, IntegerType) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$fn expects a long literal, got $other")
  }

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects an int literal, got $other")
  }

  private def stringLit(e: Expression, fn: String): String = e match {
    case Literal(v: UTF8String, StringType) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn expects a string literal, got $other")
  }

  /** name -> builder for EVERY native expression — the single source of
    * truth shared by [[register]] (per-session temp functions, what the
    * operator entry points call) and [[graft.GraftExtensions]] (the
    * `spark.sql.extensions` deployment path). One list means the two
    * registration surfaces can never drift (r16 review: the extensions
    * path had been hand-maintained and was missing bloom_might_contain,
    * hyperplane_bucket, nearest_cells, bpe_units, and bm25_idf). */
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash_chunks" -> (args => SimHashChunks(args.head)),
    "minhash_signature" ->
      (args => MinHashSignature(args.head, intLit(args(1), "minhash_signature"))),
    "word_shingles" -> (args => WordShingles(args.head, intLit(args(1), "word_shingles"))),
    "cosine_similarity" -> (args => CosineSimilarity(args.head, args(1))),
    "rabin_fingerprint" -> (args => RabinFingerprint(args.head)),
    "l2_norm" -> (args => L2Norm(args.head)),
    "quantize_int8" -> (args => QuantizeInt8(args.head)),
    "bloom_might_contain" -> (args => BloomMightContainLong(args.head, args(1))),
    "hyperplane_bucket" -> (args => HyperplaneSignature(args.head,
      intLit(args(1), "hyperplane_bucket"), intLit(args(2), "hyperplane_bucket"))),
    "nearest_cells" ->
      (args => NearestCells(args.head, args(1), intLit(args(2), "nearest_cells"))),
    "bpe_units" -> (args => BpeUnits(args.head, stringLit(args(1), "bpe_units"))),
    "bm25_idf" -> (args => Bm25Idf(args.head, longLit(args(1), "bm25_idf"))),
  )

  /** Register all native expressions as session functions (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      registry.createOrReplaceTempFunction(name, b, "built-in")
    }
  }
}
