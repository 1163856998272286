package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Cosine similarity is computed as an explicit left-to-right fold
  * in double precision — `aggregate(sequence(…))` — so the result
  * is bit-identical across engines (the oracle uses the same fold)
  * and stays inside codegen.
  *
  * Brute force = broadcast(queries) ⨯ one scan of the corpus — the
  * scalable baseline when the query set is small. The LSH variant
  * buckets both sides with deterministic random-hyperplane signs so
  * the per-bucket join is local; recall vs brute force is pinned in
  * AnnSpec.
  */
object Knn {

  /** Σ a[i]·b[i] over `dim` elements, double-precision left fold. */
  def dot(a: Column, b: Column, dim: Int): Column =
    aggregate(sequence(lit(1), lit(dim)), lit(0.0),
      (acc, i) => acc +
        element_at(a, i).cast("double") * element_at(b, i).cast("double"))

  def cosine(a: Column, b: Column, dim: Int): Column =
    dot(a, b, dim) / (sqrt(dot(a, a, dim)) * sqrt(dot(b, b, dim)))

  /** Exact top-k cosine neighbors of each query vector.
    * `queries` must be small (it is broadcast). Self-pairs excluded. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv"), dim).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup dedup). */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double): DataFrame = {
    val a = corpus.select(col(idCol).as("a"), col(vecCol).as("va"))
    val b = corpus.select(col(idCol).as("b"), col(vecCol).as("vb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"), cosine(col("va"), col("vb"), dim).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Random-hyperplane LSH bucket id: `bits` sign bits packed into a
    * long. Hyperplane j's i-th component is ±1 by the parity of
    * xxhash64(i, j) — deterministic, no stored model. */
  def lshBucket(v: Column, dim: Int, bits: Int): Column =
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L),
      (acc, j) => acc.bitwiseOR(
        when(aggregate(sequence(lit(1), lit(dim)), lit(0.0),
          (s, i) => s + element_at(v, i).cast("double") *
            (xxhash64(i, j).bitwiseAND(lit(1L)) * 2L - 1L).cast("double"))
          > 0.0,
          call_function("shiftleft", lit(1L), j.cast("int"))).otherwise(0L)))

  /** Approximate top-k: candidates limited to the query's LSH bucket
    * (single probe), ranked by exact cosine. Trades recall for a
    * bucket-local join; measured against brute force in AnnSpec. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, bits: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      lshBucket(col(vecCol), dim, bits).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshBucket(col(vecCol), dim, bits).as("bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.join(broadcast(q), "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv"), dim).as("sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }
}
