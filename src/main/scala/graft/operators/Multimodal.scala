package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators: opaque `binary` payloads with typed
  * metadata, plus decode / feature-extract / resize / frame-sample stages.
  *
  * The media codecs themselves are NOT available in this environment, so the
  * decode step is a clearly-marked deterministic stub (`decodeStub`) — the
  * Spark-side plumbing is real and is the part that matters at scale:
  *   - payloads travel as `BinaryType` columns next to a `StructType`
  *     metadata column (never parsed by Catalyst — opaque bytes);
  *   - per-row decode runs inside `mapPartitions` with a preserved schema
  *     and batch-shaped iteration (one partition = one batch, the same
  *     shape a vectorized/pandas-style UDF would see);
  *   - byte-level transforms (resize/frame-sample) are expression-level
  *     where possible so they stay in codegen.
  */
object Multimodal {

  val FeatureBins = 16

  /** Wrap a text table into a multimodal shape: payload bytes + metadata
    * struct (format/size/lang). Stand-in for reading real image/audio blobs. */
  def asMultimodal(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("utf8-blob").as("format"),
        length(col("text")).as("n_bytes"),
        col("lang").as("lang")).as("meta"))

  /** L1-normalized 16-bin byte histogram — the deterministic stand-in for
    * payloads with no decodable codec. */
  private[operators] def byteHistogram(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureBins)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) / (256 / FeatureBins)) += 1f; i += 1 }
    val total = math.max(bytes.length, 1).toFloat
    var b = 0
    while (b < FeatureBins) { hist(b) /= total; b += 1 }
    hist
  }

  /** L1-normalized 16-bin LUMINANCE histogram of a decoded image — a real
    * pixel-level feature (Rec.601 luma per pixel, binned). */
  private[operators] def luminanceHistogram(img: java.awt.image.BufferedImage): Array[Float] = {
    val hist = new Array[Float](FeatureBins)
    val (w, h) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)).toInt
        hist(math.min(lum, 255) / (256 / FeatureBins)) += 1f
        x += 1
      }
      y += 1
    }
    val total = math.max(w * h, 1).toFloat
    var b = 0
    while (b < FeatureBins) { hist(b) /= total; b += 1 }
    hist
  }

  /** Decode stage: payload bytes → 16-bin feature vector, per-partition
    * (batch-shaped), schema declared up front.
    *
    * When `tryImageCodec` is set, payloads are first decoded with
    * `javax.imageio` (JDK built-in codecs: PNG/BMP/GIF/JPEG — no external
    * native libs needed) and featurized as a pixel luminance histogram; any
    * payload ImageIO can't parse falls back to the deterministic byte
    * histogram STUB (media codecs beyond the JDK's are not available in this
    * environment). The plumbing — opaque binary column in, fixed-length
    * float vector out, one partition = one batch — is identical either way,
    * which is the part that matters at 100 TB. */
  def decodeFeatures(mm: DataFrame, tryImageCodec: Boolean = false): DataFrame = {
    val outSchema = StructType(mm.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false))
    val payloadIdx = mm.schema.fieldIndex("payload")
    mm.mapPartitions { rows =>
      rows.map { row =>
        // a NULL payload (e.g. encode() of a NULL text) featurizes like an
        // empty one — an all-zero histogram — instead of NPE-ing the task
        // (r16; found writing the multimodal fuzz family): the same
        // one-hostile-row-must-not-kill-the-job rule as the codec guards
        val raw = row.getAs[Array[Byte]](payloadIdx)
        val bytes = if (raw == null) Array.emptyByteArray else raw
        val img =
          if (!tryImageCodec) null
          // NonFatal, not just IOException: JDK image readers throw unchecked
          // exceptions (AIOOBE, CMMException, …) on malformed-but-header-valid
          // payloads, and one such row must not kill a 100 TB job
          else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case scala.util.control.NonFatal(_) => null }
        val hist = if (img != null) luminanceHistogram(img) else byteHistogram(bytes)
        Row.fromSeq(row.toSeq :+ hist.toSeq)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Real audio decode for PCM WAV payloads: RIFF/WAVE is a plain
    * little-endian container, so parsing needs no codec library at all —
    * fmt chunk (channels, sample rate, bit depth) + data chunk (int16
    * samples). Emits a typed feature struct per row:
    * (sample_rate, channels, n_frames, duration_sec, rms) with NULL for
    * payloads that aren't PCM WAV — same batch-shaped mapPartitions
    * plumbing as the image path. RMS is normalized to [0, 1]. */
  def wavFeatures(mm: DataFrame): DataFrame = {
    val featType = StructType(Seq(
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("duration_sec", DoubleType, nullable = false),
      StructField("rms", DoubleType, nullable = false)))
    val outSchema = StructType(mm.schema.fields :+
      StructField("audio", featType, nullable = true))
    val payloadIdx = mm.schema.fieldIndex("payload")
    mm.mapPartitions { rows =>
      rows.map { row =>
        // NonFatal guard mirrors decodeFeatures: one malformed payload must
        // not kill a 100 TB job
        val parsed =
          try parseWav(row.getAs[Array[Byte]](payloadIdx))
          catch { case scala.util.control.NonFatal(_) => None }
        val feat = parsed.map {
          case (rate, ch, frames, rms) =>
            Row(rate, ch, frames, frames.toDouble / rate, rms)
        }.orNull
        Row.fromSeq(row.toSeq :+ feat)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** (sampleRate, channels, frames, rms) for 16-bit PCM WAV; None otherwise. */
  private[operators] def parseWav(b: Array[Byte]): Option[(Int, Int, Int, Double)] = {
    def u16(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32(i: Int) = (b(i) & 0xff).toLong | ((b(i + 1) & 0xff).toLong << 8) |
      ((b(i + 2) & 0xff).toLong << 16) | ((b(i + 3) & 0xff).toLong << 24)
    def tag(i: Int) = new String(b, i, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    // pos and size stay Long: a chunk size is an unsigned u32, so an
    // adversarial size with the high bit set must not become a negative Int
    // (which would move pos backwards — an infinite loop inside a task)
    var pos = 12L
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var result: Option[(Int, Int, Int, Double)] = None
    while (pos + 8 <= b.length && result.isEmpty) {
      val p = pos.toInt
      val id = tag(p)
      val size = u32(p + 4) // unsigned: 0 .. 2^32-1, never negative
      if (size > b.length.toLong) return None // bogus header — chunk can't fit the payload
      if (id == "fmt ") {
        // reads up to p+23 (bits-per-sample), so require the full 16-byte
        // PCM fmt body to be present — not just the 8-byte chunk header
        if (size < 16 || p + 24 > b.length) return None
        if (u16(p + 8) != 1) return None // PCM only
        fmt = Some((u16(p + 10), u32(p + 12).toInt, u16(p + 22)))
      } else if (id == "data") {
        fmt match {
          case Some((ch, rate, bits)) if bits == 16 && ch > 0 && rate > 0 =>
            val start = p + 8
            val end = math.min(start.toLong + size, b.length.toLong).toInt
            val nSamples = (end - start) / 2
            var acc = 0.0
            var i = start
            while (i + 1 < end) {
              val s = ((b(i) & 0xff) | (b(i + 1) << 8)).toShort / 32768.0
              acc += s * s
              i += 2
            }
            val rms = if (nSamples == 0) 0.0 else math.sqrt(acc / nSamples)
            result = Some((rate, ch, nSamples / ch, rms))
          case _ => return None
        }
      }
      pos += 8L + size + (size & 1L) // chunks are 2-byte aligned; advance always >= 8
    }
    result
  }

  /** Frame-sample: every `stride`-th byte of the payload (video-frame
    * subsampling shape). Pure expression — stays in codegen. */
  def frameSample(payload: org.apache.spark.sql.Column, stride: Int): org.apache.spark.sql.Column = {
    val n = length(payload)
    transform(
      sequence(lit(1), greatest(((n + stride - 1) / stride).cast("int"), lit(1))),
      i => payload.substr(((i - 1) * stride + 1).cast("int"), lit(1)))
  }

  /** Resize: truncate-or-pad the payload to exactly `targetLen` bytes. */
  def resize(payload: org.apache.spark.sql.Column, targetLen: Int): org.apache.spark.sql.Column =
    substring(concat(payload, lit(Array.fill[Byte](targetLen)(0))), 1, targetLen)
}
