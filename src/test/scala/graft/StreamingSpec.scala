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

  // the operators' cross-batch order key is MICROseconds (tus,
  // event_id); splitting batches on Timestamp.getTime (milliseconds)
  // could separate two same-millisecond events out of event-time
  // order and make the stream/batch parity assertions flaky
  private def microKey(e: Ev): (Long, Long) =
    (e.ts.toInstant.getEpochSecond * 1000000L + e.ts.getNanos / 1000,
      e.event_id)

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

  test("as-of join: equal-ts visibility, tie-break, and null for no prior build") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val probe = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // after b1 → sees b1
      (2L, 10L, ts("2024-01-01 12:00:00")),  // exactly at b2/b3 → ties
      (3L, 20L, ts("2024-01-01 09:00:00")),  // user with no build → null
      (4L, 10L, ts("2024-01-01 08:00:00")))  // before any build → null
      .toDF("event_id", "user_id", "ts")
    val build = Seq(
      (10L, ts("2024-01-01 09:30:00"), 101L, 1.0),  // b1
      (10L, ts("2024-01-01 12:00:00"), 102L, 2.0),  // b2: equal ts…
      (10L, ts("2024-01-01 12:00:00"), 103L, 3.0))  // b3: …greater id wins
      .toDF("user_id", "ts", "event_id", "value")
    val out = graft.operators.AsOfJoin.asOf(probe, build,
        keyCols = Seq("user_id"), tsCol = "ts", buildTiebreak = "event_id",
        valueCols = Seq("event_id", "value"))
      .orderBy("event_id")
      .collect()
    assert(out.length == 4) // output is exactly the probe rows
    val byId = out.map(r => r.getLong(0) ->
      (Option(r.get(3)), Option(r.get(4)))).toMap
    assert(byId(1L) == (Some(101L), Some(1.0)))
    // an equal-ts build row IS visible; greatest event_id breaks the tie
    assert(byId(2L) == (Some(103L), Some(3.0)))
    assert(byId(3L) == (None, None))
    assert(byId(4L) == (None, None))
    // row integrity on nullable build values: the LATEST row's null
    // must win — per-column last(ignoreNulls) would stitch the stale
    // 1.0 onto event 202's id, a tuple belonging to no build row
    val probeN = Seq((9L, 30L, ts("2024-01-01 12:00:00")))
      .toDF("event_id", "user_id", "ts")
    val buildN = Seq(
      (30L, ts("2024-01-01 10:00:00"), 201L, Some(1.0)),
      (30L, ts("2024-01-01 11:00:00"), 202L, Option.empty[Double]))
      .toDF("user_id", "ts", "event_id", "value")
    val outN = graft.operators.AsOfJoin.asOf(probeN, buildN,
        keyCols = Seq("user_id"), tsCol = "ts", buildTiebreak = "event_id",
        valueCols = Seq("event_id", "value"))
      .collect().head
    assert(outN.getLong(3) == 202L && outN.isNullAt(4),
      s"expected (202, null), got $outN")
  }

  test("streaming attribution equals the batch interval join") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val clicks = Seq(
      Ev(1L, ts("2024-01-01 10:30:00"), 7L, "click", 0.0),   // in b1's day
      Ev(2L, ts("2024-01-02 09:59:00"), 7L, "click", 0.0),   // in b1's day (just)
      Ev(3L, ts("2024-01-02 10:00:00"), 7L, "click", 0.0),   // exactly at end → out
      Ev(4L, ts("2024-01-01 12:00:00"), 8L, "click", 0.0))   // other user → none
    val purchases = Seq(
      Ev(100L, ts("2024-01-01 10:00:00"), 7L, "purchase", 1.0))
    val cs = MemoryStream[Ev]; val ps = MemoryStream[Ev]
    val out = EventStreams.attributionStream(
      cs.toDF(), ps.toDF(), windowHours = 24)
    val q = out.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    ps.addData(purchases); cs.addData(clicks); q.processAllAvailable()
    val got = spark.table("attrib")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(got == Set((1L, 100L), (2L, 100L)), s"got $got")
  }

  test("interval join: bucketing matches the plain range join exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // intervals of varied span (some cross several buckets), points
    // dense enough to hit starts, ends and boundaries
    val intervals = Seq.tabulate(60) { i =>
      val start = rnd.nextInt(10000).toLong
      (i.toLong, (i % 5).toLong, start, start + 1 + rnd.nextInt(3000))
    }.toDF("iv_id", "k", "s", "e")
    val points = Seq.tabulate(400) { j =>
      (j.toLong, (j % 5).toLong, rnd.nextInt(14000).toLong)
    }.toDF("pt_id", "k", "t")
    val bucketed = graft.operators.IntervalJoin.bucketed(
        intervals, points, Seq("k"), "s", "e", "t", bucketWidthUs = 1024L)
      .select("iv_id", "pt_id")
    val plain = intervals.join(points, "k")
      .filter(col("t") >= col("s") && col("t") < col("e"))
      .select("iv_id", "pt_id")
    assert(bucketed.count() === plain.count())
    assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty)
    // a point on an interval's exclusive end is NOT matched
    val edge = graft.operators.IntervalJoin.bucketed(
      Seq((1L, 1L, 100L, 200L)).toDF("iv_id", "k", "s", "e"),
      Seq((1L, 1L, 200L), (2L, 1L, 100L)).toDF("pt_id", "k", "t"),
      Seq("k"), "s", "e", "t", bucketWidthUs = 64L)
    assert(edge.select("pt_id").as[Long].collect().toSeq == Seq(2L))
    // negative (pre-1970) values: toward-zero division would shift
    // them one bucket up and drop the match — floorDiv must not
    val neg = graft.operators.IntervalJoin.bucketed(
      Seq((1L, 1L, -250L, -50L)).toDF("iv_id", "k", "s", "e"),
      Seq((1L, 1L, -100L), (2L, 1L, -300L), (3L, 1L, -50L))
        .toDF("pt_id", "k", "t"),
      Seq("k"), "s", "e", "t", bucketWidthUs = 64L)
    assert(neg.select("pt_id").as[Long].collect().toSeq == Seq(1L))
    // straddling zero: bucket 0 covers [0, w) and bucket -1 covers
    // [-w, 0) — a point at -1 and one at 0 both land correctly
    val zero = graft.operators.IntervalJoin.bucketed(
      Seq((1L, 1L, -64L, 64L)).toDF("iv_id", "k", "s", "e"),
      Seq((1L, 1L, -1L), (2L, 1L, 0L), (3L, 1L, 64L)).toDF("pt_id", "k", "t"),
      Seq("k"), "s", "e", "t", bucketWidthUs = 64L)
    assert(zero.select("pt_id").as[Long].collect().toSeq.sorted == Seq(1L, 2L))
  }

  test("as-of join rejects reserved and colliding column names") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val probe = Seq((1L, 10L, ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val buildBad = Seq((10L, ts("2024-01-01 09:00:00"), 1L, 2.0))
      .toDF("user_id", "ts", "event_id", "__vs")
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.AsOfJoin.asOf(probe, buildBad, Seq("user_id"),
        "ts", "event_id", Seq("__vs"))
    }
    assert(e1.getMessage.contains("__vs"))
    val probeBad = probe.withColumnRenamed("event_id", "asof_value")
    val build = Seq((10L, ts("2024-01-01 09:00:00"), 1L, 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.AsOfJoin.asOf(probeBad, build, Seq("user_id"),
        "ts", "event_id", Seq("value"))
    }
    assert(e2.getMessage.contains("asof_value"))
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

  test("streaming hopping window agg matches batch counts (4 windows per event)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val evs = eventsSample.take(300)
    val stream = MemoryStream[Ev]
    val out = EventStreams.hoppingWindowAggStream(stream.toDF())
    val q = out.writeStream.format("memory").queryName("hopagg")
      .outputMode("complete").start()
    stream.addData(evs); q.processAllAvailable()
    val streamed = spark.table("hopagg")
      .agg(sum("n_events")).head().getLong(0)
    q.stop()
    // every event lands in exactly width/slide = 4 windows
    assert(streamed == 4L * evs.size)
  }

  test("overlap join: bucketing + first-shared-bucket matches the plain join exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val a = Seq.tabulate(80) { i =>
      val s = rnd.nextInt(10000).toLong
      (i.toLong, (i % 5).toLong, s, s + 1 + rnd.nextInt(3000))
    }.toDF("a_id", "k", "as", "ae")
    val b = Seq.tabulate(120) { j =>
      val s = rnd.nextInt(12000).toLong
      (j.toLong, (j % 5).toLong, s, s + 1 + rnd.nextInt(900))
    }.toDF("b_id", "k", "bs", "be")
    val bucketed = graft.operators.IntervalJoin.overlapBucketed(
        a, b, Seq("k"), "as", "ae", "bs", "be", bucketWidthUs = 1024L)
      .select("a_id", "b_id")
    val plain = a.join(b, "k")
      .filter(col("as") < col("be") && col("bs") < col("ae"))
      .select("a_id", "b_id")
    // exact multiset equality: no pair lost, none duplicated
    assert(bucketed.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(bucketed).count() == 0)
    assert(bucketed.count() == plain.count())
  }

  test("streaming pattern match equals the batch window form, across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val evs = eventsSample
    val stream = MemoryStream[Ev]
    val out = EventStreams.patternMatchStream(stream.toDS())
    val q = out.writeStream.format("memory").queryName("patterns")
      .outputMode("append").start()
    // split on EVENT TIME: per-user event-time order across batches
    // is the operator's documented assumption
    val sorted = evs.sortBy(microKey)
    val (first, second) = sorted.splitAt(sorted.size / 2)
    stream.addData(first); q.processAllAvailable()
    stream.addData(second); q.processAllAvailable()
    val streamed = spark.table("patterns")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()
    val batch = EventStreams.patternMatchBatch(Tables.events(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch, s"stream ${streamed.size} vs batch ${batch.size}")
    assert(batch.nonEmpty)
  }

  test("streaming funnel matches the batch funnel counts, across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val evs = eventsSample
    val steps = Seq("signup", "click", "purchase")
    val stream = MemoryStream[Ev]
    val out = graft.streaming.Funnels.funnelStream(
      stream.toDS(), steps, windowUs = 604800000000L)
    val q = out.writeStream.format("memory").queryName("funnel")
      .outputMode("append").start()
    // split on EVENT TIME, not arrival order: per-user event-time
    // order across batches is the operator's documented assumption
    val sorted = evs.sortBy(microKey)
    val (first, second) = sorted.splitAt(sorted.size / 2)
    stream.addData(first); q.processAllAvailable()
    stream.addData(second); q.processAllAvailable()
    val streamed = spark.table("funnel").groupBy("step")
      .agg(count(lit(1)).as("n_users"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    q.stop()
    val batch = graft.streaming.Funnels.funnel(
        Tables.events(spark, sfDir), steps, 604800000000L)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(streamed == batch.filter(_._2 > 0),
      s"streamed=$streamed batch=$batch")
  }

  test("streaming trending: windowed counts + per-batch top-k equals batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val evs = eventsSample
    val stream = MemoryStream[Ev]
    // daily counts maintained by the stream (complete mode: the day
    // totals grow as data arrives); the top-k cut runs on the tiny
    // aggregated state via the SAME custom TopKPerKeyExec as batch —
    // the standard "aggregate in the stream, rank at the sink" split
    val counts = stream.toDF()
      .groupBy(window(col("ts"), "1 day").getField("start").cast("date")
        .as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = counts.writeStream.format("memory").queryName("trend_counts")
      .outputMode("complete").start()
    val (first, second) = evs.splitAt(evs.size / 2)
    stream.addData(first); q.processAllAvailable()
    stream.addData(second); q.processAllAvailable()
    val topk = graft.plans.TopK.perKey(spark.table("trend_counts"),
        Seq("day"), Seq("n" -> false, "event_type" -> true), k = 2)
      .collect().map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2)))
      .toSet
    q.stop()
    val batch = SparkEntry.queries("s_trending")(spark, sfDir)
      .collect().map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2)))
      .toSet
    assert(topk == batch)
  }
}
