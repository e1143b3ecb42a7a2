package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Sketches, TextOps, VectorOps}
import graft.sources.Tables

/** Diagnostic for pinning — and on a failure, re-measuring — the
  * exact+bound oracle operating points: per-query ANN overlap with the
  * exact top-k, CMS bound slack, dedup-truth recall, k-means cluster
  * shares, and the max shingle document-frequency (the q_dedup_minhash
  * truth-join cap margin), at each scale factor.
  *
  * The bound booleans in SparkEntry queries (overlap ≥ 1/≥ 8, cluster
  * shares 5–30%, HLL 5%, CMS ε·N) are measured-then-pinned to the driver
  * corpora. If one ever reads false on new data, run this probe FIRST:
  * it separates "the bound no longer holds on this corpus" (re-measure
  * and re-pin the operating point) from "the engine regressed" (the
  * probe's raw margins moved with no data change). */
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

      // dedup ground truth: does every true-Jaccard ≥ 0.9 pair (planted
      // corpus, uncapped distinct shingles) appear in the LSH candidate set
      // and in the simhash hamming ≤ 6 pairs?
      val d = Tables.table(spark, dir, "documents").select(col("doc_id"), col("text"))
      val exactCopies = d.filter(col("doc_id") < 100)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"))
      val nearCopies = d.filter(col("doc_id") < 60)
        .select((col("doc_id") + 200000).as("doc_id"),
          regexp_replace(col("text"), "\\bthe\\b", "thee").as("text"))
      val corpus = d.unionAll(exactCopies).unionAll(nearCopies)
      // inverted-index truth join (linear in postings, like ngramJaccardPairs
      // but uncapped): J ≥ 0.9 pairs share ≥ 90% of shingles, so every such
      // pair shares at least one shingle and survives the equi-join
      val toksG = corpus.select(col("doc_id"),
        array_distinct(TextOps.shingles(col("text"))).as("shs"))
      val shG = toksG.select(col("doc_id"), explode(col("shs")).as("sh"))
      val sizesG = toksG.select(col("doc_id"), size(col("shs")).as("n_sh"))
      val truth = shG.as("a").join(shG.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .agg(count(lit(1)).as("n_common"))
        .join(sizesG.select(col("doc_id").as("id1"), col("n_sh").as("n1")), "id1")
        .join(sizesG.select(col("doc_id").as("id2"), col("n_sh").as("n2")), "id2")
        .filter(col("n_common").cast("double") /
          (col("n1") + col("n2") - col("n_common")) >= 0.9)
        .select(col("id1"), col("id2")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val lshCands = graft.operators.Dedup.minhashCandidates(corpus, col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val shPairs = graft.operators.Dedup.simhashPairs(corpus, col("doc_id"), col("text"), maxDist = 6)
        .select(col("id1"), col("id2")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[probe] $dir dedup-truth: j90pairs=${truth.size} " +
        s"lshMissing=${truth.diff(lshCands).size} simhashMissing=${truth.diff(shPairs).size}")
      val fp = corpus.select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      val identical = fp.as("a").join(fp.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"[probe] $dir identical-fp pairs=${identical.size} " +
        s"simhashMissing=${identical.diff(shPairs).size} lshMissing=${identical.diff(lshCands).size}")

      // q_dedup_minhash truth-join cap margin: max shingle df on the
      // planted corpus vs truthShingleDfCap (cap must be unhit for the
      // capped truth join to stay bit-identical to uncapped)
      val maxDf = shG.groupBy(col("sh")).agg(count(lit(1)).as("df"))
        .agg(max(col("df"))).first().getLong(0)
      println(s"[probe] $dir max shingle df: $maxDf " +
        s"(truthShingleDfCap=${graft.queries.DedupQueries.truthShingleDfCap})")

      // k-means cluster accounting invariants (q_embedding_cluster bounds)
      val vecs = emb.select(col("vec_id"), col("embedding"))
      val cents = VectorOps.kmeansFit(vecs, "embedding", k = 8, iters = 3)
      val sizes = VectorOps.assignClusters(vecs, cents, "embedding")
        .groupBy(col("cluster")).agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getAs[Int]("cluster"), r.getAs[Long]("n")))
      val total = sizes.map(_._2).sum
      println(s"[probe] $dir kmeans: clusters=${sizes.length} total=$total " +
        s"minN=${sizes.map(_._2).min} maxShare=${sizes.map(_._2).max.toDouble / total}")
    }
    spark.stop()
  }
}
