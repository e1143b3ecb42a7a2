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

  /** STUB decode: real implementation would run an image/audio codec here
    * (e.g. JPEG → pixels). Deterministic fake: 16-bin byte histogram,
    * L1-normalized to a feature vector. Runs per-partition (batch-shaped),
    * schema declared up front — exactly the plumbing a real decoder needs. */
  def decodeFeatures(mm: DataFrame): DataFrame = {
    val outSchema = StructType(mm.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false))
    val payloadIdx = mm.schema.fieldIndex("payload")
    mm.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        // ??? <- real codec call goes here; deterministic stand-in below
        val hist = new Array[Float](FeatureBins)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) / (256 / FeatureBins)) += 1f; i += 1 }
        val total = math.max(bytes.length, 1).toFloat
        var b = 0
        while (b < FeatureBins) { hist(b) /= total; b += 1 }
        Row.fromSeq(row.toSeq :+ hist.toSeq)
      }
    }(RowEncoder.encoderFor(outSchema))
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
