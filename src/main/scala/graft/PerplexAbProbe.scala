package graft

/** Scratch ABBA probe (r12): trigramPerplexity with its tokenize-once
  * checkpoint ON (mode local, the new shape) vs OFF (mode none makes
  * materialize() a pass-through — the old recompute shape, since the
  * function has exactly one materialize call). Same JVM, warmed
  * plans, conf flipped per leg. */
object PerplexAbProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEnv.session()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)
    docs.count()
    def run(): Long = graft.text.Retrieval
      .trigramPerplexity(docs, "doc_id", "text").count()
    // warm both plan shapes untimed
    spark.conf.set("graft.checkpoint.mode", "none"); run()
    spark.conf.unset("graft.checkpoint.mode"); run()
    for (leg <- Seq("ckpt", "lazy", "lazy", "ckpt", "ckpt", "lazy")) {
      if (leg == "lazy") spark.conf.set("graft.checkpoint.mode", "none")
      else spark.conf.unset("graft.checkpoint.mode")
      val t0 = System.nanoTime()
      val n = run()
      println(f"[pplx-ab] $leg rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
