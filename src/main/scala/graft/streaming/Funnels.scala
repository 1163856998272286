package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-sequence analytics over the events table: ordered funnel
  * conversion and weekly cohort retention — the two queries every
  * event pipeline ships first. Both are exact-arithmetic (integer
  * microseconds / dates), so their oracles replay verbatim.
  */
object Funnels {

  /** Ordered funnel: how many users performed `steps` in order,
    * with every step inside `windowUs` of the user's FIRST step-1
    * event. Greedy earliest-qualifying semantics: each step matches
    * the user's earliest event of that type at-or-after the
    * previous step's match (the standard funnel approximation —
    * greedy is optimal here, since an earlier qualifying event can
    * only leave more room for later steps).
    *
    * Scale shape: step 1 is one groupBy(user) min; each later step
    * filters events to ONE type (pushed to the scan) and joins the
    * (shrinking) qualified-user frame — AQE broadcasts it as soon
    * as it fits. Output is `steps.length` rows.
    *
    * Step names must be distinct: the batch `tus >= tcur` bound lets
    * one event satisfy two consecutive steps of the SAME type, while
    * the streaming state machine consumes each event once — the
    * require keeps the two forms provably count-equal.
    */
  def funnel(events: DataFrame, steps: Seq[String],
      windowUs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      "funnel steps must be distinct (repeated step types break batch/stream parity)")
    val ev = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts").cast("timestamp")).as("tus"))
    val first = ev.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("tus").as("t1"))
      .withColumn("tcur", col("t1"))
    val frames = steps.tail.scanLeft(first) { (prev, stepName) =>
      ev.filter(col("event_type") === stepName)
        .join(prev.select("user_id", "t1", "tcur"), "user_id")
        .filter(col("tus") >= col("tcur") &&
          col("tus") - col("t1") <= windowUs)
        .groupBy(col("user_id"), col("t1"))
        .agg(min("tus").as("tcur"))
    }
    frames.zip(steps).zipWithIndex.map { case ((f, name), i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(name).as("step_name"),
          col("n_users"))
    }.reduce(_ unionByName _)
  }

  case class FunnelState(t1: Long, tcur: Long, reached: Int)
  case class FunnelOut(user_id: Long, step: Int, event_id: Long)

  /** Streaming form of [[funnel]]: a per-user state machine via
    * flatMapGroupsWithState — state is three numbers per user
    * regardless of event volume, and a row is emitted the moment a
    * user advances a step (so downstream counts-per-step equal the
    * batch funnel's, pinned in StreamingSpec). Same greedy
    * earliest-qualifying semantics: processing in event-time order,
    * the first qualifying event per step IS the minimum. Assumes
    * per-user event-time order across batches (within a batch the
    * group's slice is sorted), like sessionizeStream. */
  def funnelStream(events: Dataset[EventStreams.Ev], steps: Seq[String],
      windowUs: Long): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      "funnel steps must be distinct (repeated step types break batch/stream parity)")
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[EventStreams.Ev],
            state: GroupState[FunnelState]) =>
          def us(t: java.sql.Timestamp): Long =
            t.toInstant.getEpochSecond * 1000000L + t.getNanos / 1000L
          val sorted = evs.toSeq.sortBy(e => (us(e.ts), e.event_id))
          var st = state.getOption
            .getOrElse(FunnelState(Long.MinValue, Long.MinValue, 0))
          val out = scala.collection.mutable.ListBuffer.empty[FunnelOut]
          sorted.foreach { e =>
            val t = us(e.ts)
            if (st.reached == 0) {
              if (e.event_type == steps.head) {
                st = FunnelState(t, t, 1)
                out += FunnelOut(user, 1, e.event_id)
              }
            } else if (st.reached < steps.length &&
                e.event_type == steps(st.reached) &&
                t >= st.tcur && t - st.t1 <= windowUs) {
              st = FunnelState(st.t1, t, st.reached + 1)
              out += FunnelOut(user, st.reached, e.event_id)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** Daily and trailing-7-day distinct active users per day (the
    * DAU/WAU engagement pair). The rolling distinct is NOT a range
    * join: each (user, active-day) row explodes map-side to the 7
    * calendar days whose trailing window it falls in, then one
    * distinct + count — same shape at any scale, and the explode
    * factor is the window length, not the data. Leading days keep
    * their partial windows (standard practice). Only days with ≥1
    * active user are emitted: a zero-activity gap day inside the
    * range (which would still have a nonzero trailing WAU) is
    * omitted, by the inner join below — calendar densification is
    * the caller's generate-series join if they need it. */
  def dauWau(events: DataFrame): DataFrame = {
    val day = to_date(col("ts").cast("timestamp"))
    val ud = events.select(col("user_id"), day.as("d")).distinct()
    val dau = ud.groupBy("d").agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"), explode(sequence(lit(0), lit(6))).as("off"),
        col("d"))
      .select(col("user_id"), date_add(col("d"), col("off")).as("d"))
      .distinct()
      .groupBy("d").agg(count(lit(1)).as("wau"))
    // windows ending after the last active day describe no real day
    dau.join(wau, "d")
      .select(col("d").as("day"), col("dau"), col("wau"))
  }

  /** Per-type z-score anomaly flags: events whose value deviates
    * more than `sigmas` sample standard deviations from their
    * type's mean. Two-pass shape: one tiny per-type aggregate
    * (broadcast back), then a map-side flag — the scan is the whole
    * cost at any scale. Types with fewer than 2 events (σ undefined)
    * flag nothing. */
  def anomalies(events: DataFrame, sigmas: Double = 3.0): DataFrame = {
    val stats = events.groupBy("event_type")
      .agg(avg("value").as("mu"), stddev_samp(col("value")).as("sigma"))
    events.join(broadcast(stats), "event_type")
      .filter(col("sigma").isNotNull && col("sigma") > 0 &&
        abs(col("value") - col("mu")) > lit(sigmas) * col("sigma"))
      .select(col("event_id"), col("event_type"), col("value"),
        round((col("value") - col("mu")) / col("sigma"), 4).as("z"))
  }

  /** Weekly cohort retention: users bucketed by the ISO week of
    * their first activity; each cell counts that cohort's users
    * active `week_offset` weeks later. Week truncation is
    * Monday-start in Spark and DuckDB alike, and offsets divide
    * exactly (both endpoints are week-truncated), so every value is
    * an exact integer/date.
    *
    * Scale shape: distinct (user, week) one shuffle; the per-user
    * cohort min folds on the same key; the final cell aggregation
    * partial-aggregates before its shuffle. Nothing is ever
    * per-event after the first distinct.
    */
  def retentionWeekly(events: DataFrame): DataFrame = {
    val wk = to_date(date_trunc("week", col("ts").cast("timestamp")))
    val active = events.select(col("user_id"), wk.as("wk")).distinct()
    val cohort = active.groupBy("user_id").agg(min("wk").as("cohort_week"))
    active.join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / lit(7)).cast("int")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
  }
}
