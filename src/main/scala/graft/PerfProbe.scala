package graft

import org.apache.spark.sql.functions._
import graft.plans.Materialize._

/** Scratch perf probe (not part of the library surface).
  *
  * Current experiment: DedupIndex per-batch cost vs store size. The
  * 8× probe corpus is 8 replicas with DISJOINT token spaces, so
  * ingesting one replica per batch grows the store 8× while keeping
  * cross-batch candidates ≈ 0 and same-batch output constant — any
  * per-batch cost growth would be store-size overhead, which the
  * O(batch) claim says must not exist. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft8x")
    // same env-driven fabric knobs as Bench/Verify — a
    // SPARK_GRAFT_MASTER/SHUFFLE/CONF passed to this probe must not
    // be silently ignored (it was, pre-r8-review: numbers would be
    // attributed to a fabric that was never used)
    val spark = SparkEnv.session()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("dedupix-probe")
      .toString
    val off = 10000000L
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "8").toInt
    // SPARK_GRAFT_PROBE=embed probes the cosine twin. The replica
    // corpus near-dups live ACROSS replicas of the same base vector,
    // so replica-per-batch would grow true output with the store;
    // batching by BASE id (vec_id mod off) instead gives each batch
    // its own dup-cluster family across all replicas — cross-batch
    // candidates ≈ 0, same-batch output constant, store still grows
    // — exactly the store-size-leakage experiment the text index
    // runs with its disjoint-token replicas.
    if (sys.env.get("SPARK_GRAFT_PROBE").contains("embed")) {
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding")).materialize()
      val nBase = vecs.select(pmod(col("vec_id"), lit(off)).as("b"))
        .agg(max("b")).head().getLong(0) + 1
      val per = (nBase + nBatches - 1) / nBatches
      for (k <- 0 until nBatches) {
        val batch = vecs.filter(
          pmod(col("vec_id"), lit(off)) >= k * per &&
            pmod(col("vec_id"), lit(off)) < (k + 1) * per)
        val t0 = System.nanoTime()
        val res = sources.EmbeddingDedupIndex.update(spark, root, batch,
          "vec_id", "embedding", dim = 64, threshold = 0.9, bits = 9)
        val nPairs = res.pairs.count()
        val dt = (System.nanoTime() - t0) / 1e9
        val store = sources.EmbeddingDedupIndex.currentVecs(spark, root)
          .count()
        println(f"batch $k: $dt%6.2f s  pairs=$nPairs%8d  store=$store%7d")
      }
      return
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").materialize()
    for (k <- 0 until nBatches) {
      val batch = docs.filter(
        col("doc_id") >= k * off && col("doc_id") < (k + 1) * off)
      val t0 = System.nanoTime()
      val res = sources.DedupIndex.update(spark, root, batch,
        "doc_id", "text", threshold = 0.8)
      val nPairs = res.pairs.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val store = sources.DedupIndex.currentSets(spark, root).count()
      println(f"batch $k: $dt%6.2f s  pairs=$nPairs%5d  store=$store%7d")
    }
  }
}
