package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ann.Knn

class AnnSpec extends AnyFunSuite with SparkFixture {

  private val dim = 64
  private lazy val emb = Tables.embeddings(spark, sfDir).cache()

  test("brute-force knn: ranks are by descending cosine, self excluded") {
    val res = Knn.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", dim, k = 5).cache()
    assert(res.filter(col("query_id") === col("neighbor_id")).count() == 0)
    val bad = res.as("r").groupBy("query_id")
      .agg(min(col("sim")).as("mn"), max(col("sim")).as("mx"),
        count(lit(1)).as("n"))
      .filter(col("n") =!= 5 || col("mn") > col("mx"))
    assert(bad.count() == 0)
    // rank 1 must carry the max sim of the query's result set
    val r1 = res.filter(col("rk") === 1).select("query_id", "sim")
      .withColumnRenamed("sim", "top")
    val mx = res.groupBy("query_id").agg(max("sim").as("mx"))
    assert(r1.join(mx, "query_id").filter(col("top") =!= col("mx")).count() == 0)
  }

  test("lsh knn: every neighbor shares the query's bucket and sims are exact") {
    val lsh = Knn.lshTopK(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", dim, k = 5).cache()
    val withBuckets = emb.select(col("vec_id"),
      Knn.lshBucket(col("embedding"), dim, 8).as("bucket"))
    val joined = lsh
      .join(withBuckets.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("bucket", "qb"), "query_id")
      .join(withBuckets.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("bucket", "nb"), "neighbor_id")
    assert(joined.filter(col("qb") =!= col("nb")).count() == 0)
    // sims agree with an independent brute-force computation
    val brute = Knn.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
      "vec_id", "embedding", dim, k = 500)
      .select(col("query_id"), col("neighbor_id"), col("sim").as("bsim"))
    val cmp = lsh.join(brute, Seq("query_id", "neighbor_id"))
      .filter(abs(col("sim") - col("bsim")) > 1e-12)
    assert(cmp.count() == 0)
  }
}
