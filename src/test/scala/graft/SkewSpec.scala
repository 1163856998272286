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

  test("skew-safe sessionization equals the plain window on a " +
      "90%-hot-user stream, sessions spanning bucket boundaries") {
    import spark.implicits._
    import graft.streaming.EventStreams
    // one bot user emits 90% of events in bursts that STRADDLE the
    // 1-hour buckets (events every 10 min → continuous sessions
    // across many boundaries, with 40-min silences opening new ones);
    // 10 normal users emit sparse events
    val hot = (0 until 900).map { i =>
      // burst of 30 events (10-min cadence), then a 40-min gap
      val burst = i / 30; val j = i % 30
      val tus = burst * (30L * 600 + 2400) * 1000000L + j * 600000000L
      ("bot", f"e$i%04d", new java.sql.Timestamp(tus / 1000))
    }
    val cold = (0 until 100).map { i =>
      val u = s"u${i % 10}"
      ("c" + u, f"c$i%04d",
        new java.sql.Timestamp(i * 3700L * 1000))
    }
    val events = (hot ++ cold).toDF("user_id", "event_id", "ts")
    def collectSessions(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "event_id", "session_seq").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val plain = collectSessions(
      EventStreams.sessionizeBatch(events, gapMinutes = 30))
    val safe = collectSessions(
      EventStreams.sessionizeSkewSafe(events, gapMinutes = 30,
        bucketHours = 1))
    assert(safe == plain,
      "bucketed sessionization diverged from the per-user window")
    // the hot user really does cross boundaries: more than one bucket
    // and fewer sessions than buckets touched
    val hotSessions = plain.filter(_._1 == "bot").map(_._3).max
    assert(hotSessions == 30, s"expected 30 bot sessions, got $hotSessions")
  }
}
