package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.NativeHashes

/** Session-extensions entry point: makes every engine function available in
  * any SparkSession via
  * `spark.sql.extensions=graft.GraftExtensions` — the standard deployment
  * path for a Spark-native library (no per-session registration calls).
  *
  * Injects: the DataFusion-name JSON functions (json_get, json_get_int, …)
  * and the native dedup signature expressions (simhash_chunks,
  * minhash_signature).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.JsonFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))
    }
    graft.functions.DataFusionCompat.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))
    }
    ext.injectFunction((FunctionIdentifier("simhash_chunks"), info("simhash_chunks"),
      (args: Seq[Expression]) => NativeHashes.SimHashChunks(args.head)))
    ext.injectFunction((FunctionIdentifier("minhash_signature"), info("minhash_signature"),
      (args: Seq[Expression]) => args(1) match {
        case Literal(v: Int, IntegerType) => NativeHashes.MinHashSignature(args.head, v)
        case other => throw new IllegalArgumentException(
          s"minhash_signature numHashes must be an int literal, got $other")
      }))
    ext.injectFunction((FunctionIdentifier("cosine_similarity"), info("cosine_similarity"),
      (args: Seq[Expression]) => NativeHashes.CosineSimilarity(args.head, args(1))))
    ext.injectFunction((FunctionIdentifier("rabin_fingerprint"), info("rabin_fingerprint"),
      (args: Seq[Expression]) => NativeHashes.RabinFingerprint(args.head)))
    ext.injectFunction((FunctionIdentifier("word_shingles"), info("word_shingles"),
      (args: Seq[Expression]) => args(1) match {
        case Literal(v: Int, IntegerType) => NativeHashes.WordShingles(args.head, v)
        case other => throw new IllegalArgumentException(
          s"word_shingles n must be an int literal, got $other")
      }))
    ext.injectFunction((FunctionIdentifier("l2_norm"), info("l2_norm"),
      (args: Seq[Expression]) => NativeHashes.L2Norm(args.head)))
    ext.injectFunction((FunctionIdentifier("quantize_int8"), info("quantize_int8"),
      (args: Seq[Expression]) => NativeHashes.QuantizeInt8(args.head)))
  }
}
