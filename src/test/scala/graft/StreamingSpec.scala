package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Ev

class StreamingSpec extends AnyFunSuite with SparkFixture {

  private def eventsSample = Tables.events(spark, sfDir)
    .select("event_id", "ts", "user_id", "event_type", "value")
    .as[Ev](org.apache.spark.sql.Encoders.product[Ev])
    .collect().toSeq.sortBy(_.event_id)

  test("streaming sessionization equals the batch window form, across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val evs = eventsSample
    val stream = MemoryStream[Ev]
    val out = EventStreams.sessionizeStream(stream.toDS())
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    // two batches: state must carry user sessions across the boundary
    val (first, second) = evs.splitAt(evs.size / 2)
    stream.addData(first); q.processAllAvailable()
    stream.addData(second); q.processAllAvailable()
    val streamed = spark.table("sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    q.stop()
    val batch = EventStreams.sessionizeBatch(Tables.events(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed.size == batch.size)
    assert(streamed == batch)
  }

  test("streaming dedup drops repeated keys within the watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Ev]
    val deduped = EventStreams.dedupStream(
      stream.toDS().toDF(), Seq("user_id", "event_type"))
    val q = deduped.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    val e = eventsSample.head
    val dup = Seq(e, e.copy(event_id = e.event_id + 1000000),
      e.copy(event_id = e.event_id + 2000000, event_type = "other"))
    stream.addData(dup)
    q.processAllAvailable()
    val n = spark.table("dedup").count()
    q.stop()
    assert(n == 2, "same (user, type, ts) must be emitted once")
  }

  test("streaming windowed agg with watermark produces rows") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Ev]
    val agg = EventStreams.windowAggStream(
      stream.toDS().toDF())
    val q = agg.writeStream.format("memory").queryName("winagg")
      .outputMode("update").start()
    stream.addData(eventsSample.take(200))
    q.processAllAvailable()
    val n = spark.table("winagg").count()
    q.stop()
    assert(n > 0)
  }
}
