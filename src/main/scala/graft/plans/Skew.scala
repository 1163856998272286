package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed joins (SURVEY.md §5). AQE's skew-join
  * handles sort-merge skew at runtime; explicit salting is the
  * plan-level tool when one side has a handful of pathological keys
  * (the classic power-law graph hub): the skewed side gets a random
  * salt in [0, n), the other side is replicated n ways, and the join
  * key becomes (key, salt) — splitting each hot key across n tasks.
  */
object Skew {

  /** Inner-join `left` (skewed) with `right` (replicated) on
    * `key`, salted `n` ways. `right` is expected to be the smaller
    * side — it is exploded n×. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      n: Int): DataFrame = {
    val salted = left.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(n)).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
