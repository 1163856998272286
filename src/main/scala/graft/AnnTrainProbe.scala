package graft

import org.apache.spark.sql.functions._

/** Stage attribution for the ANN keys (r12): how much of
  * e_knn_ivf / e_knn_pq / e_knn_ivfpq is codebook TRAINING vs the
  * search join itself. Best-of-N legs in one JVM (ABBA-style order)
  * because this host's windows swing; compare mins.
  * `sbt "runMain graft.AnnTrainProbe"` (env: SPARK_GRAFT_SF_DIR).
  */
object AnnTrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEnv.session()
    spark.sparkContext.setLogLevel("ERROR")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val dim = 64
    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    // warm: executor + codegen + the embeddings scan
    Tables.embeddings(spark, sfDir).count()
    val out = new StringBuilder
    def rec(s: String): Unit = { println(s); out.append(s).append('\n') }
    for (r <- 1 to reps) {
      val emb = Tables.embeddings(spark, sfDir)
      val (tIvf, ivf) = time(ann.Ivf.train(emb, "vec_id", "embedding", dim, k = 16))
      val (tPq, pq) = time(ann.Pq.train(emb, "vec_id", "embedding", dim, m = 4, k = 16))
      val (tIvfS, _) = time(ann.Ivf.topK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", dim, k = 5, ivf, nprobe = 4).count())
      val (tPqS, _) = time(ann.Pq.topK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", dim, k = 5, pq).count())
      val (tBoth, _) = time(ann.Pq.topKWithIvf(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", dim, k = 5, pq, ivf, nprobe = 4).count())
      rec(f"rep$r ivf.train=$tIvf%6.2f pq.train=$tPq%6.2f " +
        f"ivf.search=$tIvfS%6.2f pq.search=$tPqS%6.2f ivfpq.search=$tBoth%6.2f")
    }
    spark.stop()
  }
}
