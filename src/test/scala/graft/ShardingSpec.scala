package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.index.Sharding

class ShardingSpec extends AnyFunSuite with SparkFixture {

  test("shard ids stay within 2^bits and follow the low bits of the hash") {
    val n = graft.graph.GraphBuilder.nodes(spark, sfDir)
      .select(col("id"), Sharding.shardOfId(col("id")).as("shard"),
        Sharding.shardOfKey(col("key_data")).as("kshard"))
    assert(n.filter(col("shard") < 0 || col("shard") >= 2048).count() == 0)
    // key-based and id-based routing agree (id = xxhash64(key))
    assert(n.filter(col("shard") =!= col("kshard")).count() == 0)
  }

  test("co-sharded bucketed tables join without a shuffle") {
    import spark.implicits._
    Seq("shard_left", "shard_right").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"/tmp/graft-test-warehouse/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete()); dir.delete()
      }
    }
    val left = (1L to 1000L).map(i => (i, s"v$i")).toDF("id", "v")
    val right = (1L to 1000L).map(i => (i, i * 2)).toDF("id", "w")
    Sharding.writeSharded(left, "id", "shard_left", buckets = 4)
    Sharding.writeSharded(right, "id", "shard_right", buckets = 4)
    val l = spark.table("shard_left")
    val r = spark.table("shard_right")
    val joined = l.join(r, Seq("shard", "id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() == 1000)
  }
}
