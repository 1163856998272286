package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.Skew

class SkewSpec extends AnyFunSuite with SparkFixture {

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // one pathological hot key (90% of rows) + a long tail
    val left = ((1 to 900).map(_ => 1L) ++ (2L to 102L)).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("key", "payload")
    val right = (1L to 102L).map(k => (k, s"dim$k")).toDF("key", "attr")
    val plain = left.join(right, "key")
      .select("key", "payload", "attr")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(left, right, "key", n = 8)
      .select("key", "payload", "attr")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(plain.size == 1001)
  }
}
