package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal-column queries (builder brief): binary payloads + typed
  * metadata, stubbed decode → feature extraction, frame sampling, resize.
  * The decode stub is deterministic, so these are stable rows-only checks;
  * MultimodalSpec asserts the feature semantics.
  */
object MultimodalQueries {

  private def docs(s: SparkSession, dir: String) = Tables.table(s, dir, "documents")

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_multimodal_features",
      // payload+metadata shaping → per-partition stub decode → 16-bin
      // feature vector; flattened lead features for inspection.
      (s, dir) => {
        val mm = Multimodal.asMultimodal(docs(s, dir))
        Multimodal.decodeFeatures(mm)
          .select(
            col("doc_id"),
            col("meta.format").as("format"),
            col("meta.n_bytes").as("n_bytes"),
            round(element_at(col("features"), 1).cast("double"), 6).as("f0"),
            round(element_at(col("features"), 2).cast("double"), 6).as("f1"),
            round(element_at(col("features"), 5).cast("double"), 6).as("f4"),
            size(col("features")).as("n_features"))
          .orderBy(col("doc_id"))
      },
      None,
    ),

    QueryDef(
      "q_multimodal_transform",
      // Pure-expression byte transforms: frame-sample stride 4, resize to a
      // fixed 64 bytes; md5 checksums prove determinism end-to-end.
      (s, dir) => {
        val mm = Multimodal.asMultimodal(docs(s, dir))
        mm.select(
            col("doc_id"),
            length(col("payload")).as("payload_len"),
            size(Multimodal.frameSample(col("payload"), 4)).as("n_frames"),
            md5(Multimodal.resize(col("payload"), 64)).as("resized_md5"))
          .orderBy(col("doc_id"))
      },
      None,
    ),
  )
}
