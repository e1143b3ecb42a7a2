package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextOps}
import graft.sources.Tables
object PerfProbe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label: ${(System.nanoTime()-t0)/1e9}%.1f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val d = Tables.table(spark, dir, "documents").select(col("doc_id"), col("text"))
    val exact = d.filter(col("doc_id") < 100).select((col("doc_id")+100000).as("doc_id"), col("text"))
    val near = d.filter(col("doc_id") < 60).select((col("doc_id")+200000).as("doc_id"),
      regexp_replace(col("text"), "\\bthe\\b", "thee").as("text"))
    val corpus = d.unionAll(exact).unionAll(near)
    corpus.write.format("noop").mode("overwrite").save()

    // minhash stages
    graft.functions.NativeHashes.register(spark)
    val sigs = corpus.select(col("doc_id").as("id"),
      Dedup.minhashSignature(array_distinct(TextOps.shingles(col("text"))), 32).as("sig"))
    time("minhash signatures")(sigs.write.format("noop").mode("overwrite").save())
    val cands = Dedup.minhashCandidates(corpus, col("doc_id"), col("text"))
    println("[probe] minhash candidates count: " + time("minhash candidates")(cands.count()))
    val toks = corpus.select(col("doc_id"), array_distinct(TextOps.shingles(col("text"))).as("shs"))
    val verified = cands
      .join(toks.select(col("doc_id").as("id1"), col("shs").as("sh1")), "id1")
      .join(toks.select(col("doc_id").as("id2"), col("shs").as("sh2")), "id2")
      .withColumn("jaccard", round(size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
        size(array_union(col("sh1"), col("sh2"))), 6))
      .filter(col("jaccard") >= 0.3)
    println("[probe] minhash verified count: " + time("minhash verify")(verified.count()))

    // ngram stages
    val sh = toks.select(col("doc_id"), explode(col("shs")).as("sh"))
    println("[probe] exploded shingles: " + time("explode")(sh.count()))
    val common = sh.as("a").join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("n_common"))
    println("[probe] common pairs: " + time("ngram common-join")(common.count()))

    // hyperplane bucketing: native expression vs interpreted HOF folds,
    // 200k synthetic 64-dim vectors (the map stage every LSH ANN / near-dup
    // query pays once per corpus row)
    val vecs = spark.range(200000).select(col("id"),
      transform(sequence(lit(0), lit(63)),
        d => sin(col("id") * 37 + d * 131).cast("float")).as("v"))
      .localCheckpoint()
    val native = vecs.select(
      graft.operators.VectorOps.hyperplaneBucket(col("v"), 64, 8).as("b"))
    time("hyperplane native (200k x 64d x 8 bits)")(
      native.write.format("noop").mode("overwrite").save())
    def planeWeights(dims: Int, bits: Int): Array[Array[Double]] =
      Array.tabulate(bits, dims) { (b, d) =>
        val seed = b.toLong * 1000003L + d.toLong * 7919L
        val x = seed * 6364136223846793005L + 1442695040888963407L
        if (x < 0) -1.0 else 1.0
      }
    val hof = planeWeights(64, 8).zipWithIndex.map { case (plane, b) =>
      val proj = aggregate(
        zip_with(col("v"), typedLit(plane.toSeq), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)
    time("hyperplane HOF    (200k x 64d x 8 bits)")(
      vecs.select(hof.as("b")).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
