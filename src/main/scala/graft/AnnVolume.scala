package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.VectorOps

/** Volume smoke for ANN: 200k deterministic synthetic 64-dim vectors
  * (`sin(id·dim)`-derived — reproducible, roughly uniform on the sphere,
  * IVF's worst case) and a 1000-query batch.
  *
  * Compares brute-force top-10 (queries × corpus evals) against IVF at a
  * speed-oriented operating point (64 cells, nProbe 4, 2-way assignment =
  * 12.5% effective scan fraction). IVF pays a fixed indexing pass (corpus ×
  * centroids assignments), so it amortizes with query-batch size — which is
  * exactly how an ANN index is used; the recall-oriented operating point
  * (4-way, 8 probes) is pinned separately by OperatorsSpec at 0.95+. */
object AnnVolume {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[ann-vol] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dims = 64
    val corpus = spark.range(200000).select(
      col("id").as("vec_id"),
      transform(sequence(lit(1), lit(dims)),
        d => sin(col("id") * d + d * lit(0.7)).cast("float")).as("embedding"))
    val queries = corpus.filter(col("vec_id") % 200 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    println(s"[ann-vol] corpus: ${corpus.count()}, queries: ${queries.count()}")

    val brute = time("brute-force top-10")(
      VectorOps.bruteForceTopK(corpus, queries, k = 10)
        .select(col("query_id"), col("vec_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet)

    val ivf = time("IVF top-10 (64 cells, 4 probes, 2-way)")(
      VectorOps.ivfTopK(corpus, queries, k = 10, nCells = 64, nProbe = 4, assignN = 2)
        .select(col("query_id"), col("vec_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet)

    val recall = brute.intersect(ivf).size.toDouble / brute.size
    println(f"[ann-vol] IVF recall@10 vs brute force: $recall%.3f")
    spark.stop()
  }
}
