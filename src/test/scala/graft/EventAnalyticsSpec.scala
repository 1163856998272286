package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{EventStreams, Funnels}

class EventAnalyticsSpec extends AnyFunSuite with SparkFixture {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: order matters, window binds to the FIRST step-1 event") {
    import spark.implicits._
    val ev = Seq(
      // u1 completes in order
      (1L, "signup", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-02 00:00:00")),
      (1L, "purchase", ts("2024-01-03 00:00:00")),
      // u2: purchase BEFORE click → no step-3 conversion
      (2L, "signup", ts("2024-01-01 00:00:00")),
      (2L, "purchase", ts("2024-01-02 00:00:00")),
      (2L, "click", ts("2024-01-03 00:00:00")),
      // u3: click outside the 7-day window of the FIRST signup,
      // even though a second signup is closer
      (3L, "signup", ts("2024-01-01 00:00:00")),
      (3L, "signup", ts("2024-01-10 00:00:00")),
      (3L, "click", ts("2024-01-11 00:00:00")),
      // u4: never signed up
      (4L, "click", ts("2024-01-01 00:00:00")))
      .toDF("user_id", "event_type", "ts")
    val got = Funnels.funnel(ev, Seq("signup", "click", "purchase"),
        windowUs = 7L * 86400000000L)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
  }

  test("funnel: equal timestamps qualify (>= semantics)") {
    import spark.implicits._
    val ev = Seq(
      (1L, "signup", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 00:00:00")))
      .toDF("user_id", "event_type", "ts")
    val got = Funnels.funnel(ev, Seq("signup", "click"), 86400000000L)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == Map(1 -> 1L, 2 -> 1L))
  }

  test("weekly retention: cohorts are first-seen weeks, offsets exact") {
    import spark.implicits._
    val ev = Seq(
      // u1 first seen week of Jan 1 (Mon), active again 2 weeks on
      (1L, "click", ts("2024-01-02 10:00:00")),
      (1L, "click", ts("2024-01-16 10:00:00")),
      // u2 first seen week of Jan 8, active same week twice (one row)
      (2L, "click", ts("2024-01-08 10:00:00")),
      (2L, "click", ts("2024-01-09 10:00:00")))
      .toDF("user_id", "event_type", "ts")
      .withColumn("ts", col("ts"))
    val got = Funnels.retentionWeekly(ev)
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("2024-01-01", 0) -> 1L, ("2024-01-01", 2) -> 1L,
      ("2024-01-08", 0) -> 1L))
  }

  test("watermark lateness agrees with an independent driver replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = ts("2024-01-01 00:00:00").getTime
    val ev = (1 to 60).map { i =>
      (i.toLong, (i % 3).toLong, "e" + (i % 2),
        new Timestamp(base + rnd.nextInt(3 * 86400) * 1000L))
    }
    val got = EventStreams.watermarkLateBatch(
        ev.toDF("event_id", "user_id", "event_type", "ts"),
        delaySeconds = 3600, maxJitterSeconds = 86400)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // independent replay: JVM md5 jitter + a per-user scan in
    // arrival order (the operator's contract, reimplemented without
    // window functions)
    def jitter(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(12), 16) % 86400000000L
    }
    var late = Map[String, Long]().withDefaultValue(0L)
    var total = Map[String, Long]().withDefaultValue(0L)
    ev.groupBy(_._2).values.foreach { es =>
      var maxTus = Long.MinValue
      es.map { case (id, _, et, t) =>
          val tus = t.getTime * 1000L
          (id, et, tus, tus + jitter(id))
        }.sortBy(e => (e._4, e._1))
        .foreach { case (_, et, tus, _) =>
          total += et -> (total(et) + 1)
          if (maxTus != Long.MinValue && tus < maxTus - 3600000000L)
            late += et -> (late(et) + 1)
          if (tus > maxTus) maxTus = tus
        }
    }
    assert(late.values.sum > 0, "test data must produce late events")
    assert(got.keySet == total.keySet)
    got.foreach { case (et, (n, nl)) =>
      assert(n == total(et) && nl == late(et), s"mismatch for $et")
    }
  }

  test("bloom decontamination is a superset of the exact check, per doc") {
    import graft.dedup.Dedup
    val docs = Tables.documents(spark, sfDir)
    val exact = Dedup.crossSplitContamination(docs, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Dedup.crossSplitContaminationBloom(docs, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // no false negatives: every exactly-contaminated doc is flagged,
    // with at least as many flagged grams as true shared grams
    exact.foreach { case (id, nShared) =>
      assert(bloom.contains(id), s"doc $id missed by bloom")
      assert(bloom(id) >= nShared)
    }
  }

  test("deterministic walks follow real edges and are stable") {
    import graft.graph.{Algorithms, GraphBuilder}
    val und = GraphBuilder.undirectedFor(spark, sfDir)
    val w = Algorithms.deterministicWalks(und, 3)
    // consecutive (node @ step t, node @ step t+1) must be an edge
    val hops = w.as("x").join(w.as("y"),
        col("x.start") === col("y.start") &&
        col("y.step") === col("x.step") + 1)
      .select(col("x.node").as("a"), col("y.node").as("b"))
    assert(hops.join(und, Seq("a", "b"), "left_anti").count() == 0)
    // same input → identical walk corpus (no RNG state anywhere)
    val again = Algorithms.deterministicWalks(und, 3)
    assert(w.exceptAll(again).count() == 0 && again.exceptAll(w).count() == 0)
    // regime equality: the per-step join form walks the same rows
    spark.conf.set("graft.walks.broadcastChoices", "0")
    val joined =
      try Algorithms.deterministicWalks(und, 3)
      finally spark.conf.unset("graft.walks.broadcastChoices")
    assert(w.exceptAll(joined).count() == 0 &&
      joined.exceptAll(w).count() == 0)
  }
}
