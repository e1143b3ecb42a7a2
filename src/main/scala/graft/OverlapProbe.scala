package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Sketches, TextOps, VectorOps}
import graft.sources.Tables

/** Scratch diagnostic for pinning the q_ann_lsh / q_ann_ivf /
  * q_heavy_hitters oracle bounds — prints per-query overlap with the exact
  * top-k and the CMS bound slack at each scale factor. */
object OverlapProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.table(spark, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val exact = VectorOps.bruteForceTopK(emb, queries, k = 10)
        .select(col("query_id"), col("vec_id"))
      for ((name, ann) <- Seq(
          "lsh" -> VectorOps.lshTopK(emb, queries, k = 10, dims = 64, bits = 8),
          "ivf" -> VectorOps.ivfTopK(emb, queries, k = 10, nCells = 16, nProbe = 4))) {
        val ov = ann.select(col("query_id"), col("vec_id"))
          .join(exact, Seq("query_id", "vec_id"))
          .groupBy("query_id").agg(count(lit(1)).as("n_overlap"))
          .orderBy("query_id").collect()
          .map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
        println(s"[probe] $dir $name overlap/10 per query: $ov")
      }
      val toks = Tables.table(spark, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("token"))
      val hh = Sketches.heavyHitters(toks, "token", k = 4096)
      val exactCnt = toks.groupBy("token").agg(count(lit(1)).as("exact_count"))
      val nTotal = toks.count()
      val joined = exactCnt.filter(col("exact_count") * 1000 > lit(nTotal))
        .join(hh, Seq("token"), "left").collect()
      val missing = joined.count(r => r.isNullAt(2))
      val under = joined.count(r => !r.isNullAt(2) && r.getLong(2) < r.getLong(1))
      val maxSlack = joined.filter(!_.isNullAt(2)).map(r => r.getLong(2) - r.getLong(1)).maxOption.getOrElse(-1L)
      println(s"[probe] $dir hh: heavy=${joined.length} missing=$missing under=$under " +
        s"maxSlack=$maxSlack epsN=${(1e-4 * nTotal).toLong} nTotal=$nTotal")
    }
    spark.stop()
  }
}
