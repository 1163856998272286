package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TopK

class TopKSpec extends AnyFunSuite with SparkFixture {

  test("custom TopKPerKey operator matches the window-function plan") {
    val orders = Tables.orders(spark, sfDir)
    val native = TopK.perKey(orders, Seq("o_custkey"),
        Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 3)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val reference = orders.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3).select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(native == reference)
  }

  test("TopKPerKeyExec plans exactly one exchange and no sort") {
    val orders = Tables.orders(spark, sfDir)
    val plan = TopK.perKey(orders, Seq("o_custkey"),
        Seq("o_totalprice" -> false), k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    assert(!plan.contains("Sort "), s"no sort expected:\n$plan")
    assert(plan.split("Exchange").length <= 2, s"one exchange expected:\n$plan")
  }

  test("ties and k larger than group size behave like row_number") {
    import spark.implicits._
    val df = Seq((1L, 10.0, 1L), (1L, 10.0, 2L), (1L, 5.0, 3L), (2L, 1.0, 4L))
      .toDF("key", "score", "id")
    val got = TopK.perKey(df, Seq("key"),
        Seq("score" -> false, "id" -> true), k = 2)
      .select("key", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (1L, 2L), (2L, 4L)))
  }
}
