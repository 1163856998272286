package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream operators. Each has a batch form (driver-verifiable
  * against SQL) and a Structured Streaming form (state bounded by
  * watermark / per-key state, pinned by StreamingSpec).
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type (batch form —
    * identical expression works under readStream). window_start is
    * surfaced as TIMESTAMP_NTZ so it lands in parquet as plain int64
    * microseconds (the session-tz'd type would be written as int96 /
    * nanos, which oracle engines type differently); values are exact
    * 2-dp decimals, so decimal accumulation → double is engine-exact. */
  def windowAggBatch(events: DataFrame): DataFrame =
    events.groupBy(
        window(col("ts"), "1 hour").getField("start").cast("timestamp_ntz")
          .as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** Sliding (hopping) window counts/sums per event type: 1-hour
    * windows every 15 minutes, so each event lands in exactly 4
    * overlapping windows (slide divides width ⇒ width/slide windows
    * per event — Spark materializes them map-side via the same
    * `window` expression, no self-join). Epoch-aligned starts, same
    * type/exactness conventions as [[windowAggBatch]]. The identical
    * expression runs under readStream, where the watermark expires a
    * window width/slide times later than its tumbling counterpart —
    * that (bounded) state growth is the cost of overlap. */
  def hoppingWindowAggBatch(events: DataFrame): DataFrame =
    events.groupBy(
        window(col("ts"), "1 hour", "15 minutes").getField("start")
          .cast("timestamp_ntz").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** Session assignment with a 30-minute inactivity gap: a new
    * session starts when the gap from the previous event of the
    * same user exceeds the threshold. Batch form = lag + running
    * sum over the per-user window. */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    // exact integer-microsecond gap: second-truncation (cast to long)
    // or fractional-second doubles make the ">gap" comparison depend
    // on engine/version truncation behavior at the boundary. The
    // cast makes NTZ inputs work (unix_micros rejects TIMESTAMP_NTZ;
    // for already-ltz inputs it is a no-op). PRECONDITION for NTZ
    // inputs: a fixed-offset session timezone (every entry point in
    // this library pins UTC) — under a DST zone, wall-times near a
    // transition cast to instants with a shifted gap, which could
    // split or merge a session near the changeover.
    val us = unix_micros(col("ts").cast("timestamp"))
    val gap = us - lag(us, 1).over(w)
    events
      .withColumn("new_session",
        when(gap.isNull || gap > gapMinutes * 60000000L, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("user_id"), col("event_id"), col("session_seq"))
  }

  /** Skew-safe sessionization — same output contract as
    * [[sessionizeBatch]], different shuffle shape. The plain form
    * windows on `user_id` alone, so ONE pathological user (a bot, a
    * load-test account) serializes 90 % of the partition's rows into
    * one task — and unlike a skewed JOIN (plans.Skew.saltedJoin),
    * a per-user ordered window cannot be salted: the gap rule needs
    * the user's whole ordered history. The scale fix is to cut the
    * history along TIME instead:
    *
    *  1. big pass windows on (user_id, time bucket) — the hot user
    *     splits across buckets, so no task exceeds one bucket of one
    *     user; the same exact-microsecond gap rule runs within each
    *     bucket (first event of a bucket provisionally starts a
    *     session);
    *  2. a per-(user, bucket) summary frame (rows = users × active
    *     buckets — orders of magnitude smaller than events) decides,
    *     per bucket, whether its first event actually CONTINUES the
    *     previous active bucket's last session (cross-boundary gap ≤
    *     threshold), and computes each bucket's global session-seq
    *     offset as a running sum of true session starts;
    *  3. events join their bucket's (continues, offset) row back —
    *     a broadcast-sized join — and the global seq is
    *     offset + local running count, with the continuing bucket's
    *     first event folded into the previous session.
    *
    * `bucketHours` trades skew headroom against summary size; any
    * value yields IDENTICAL output to the plain form (SkewSpec pins
    * equality on a 90 %-hot-user stream, including sessions that
    * span bucket boundaries). */
  def sessionizeSkewSafe(events: DataFrame, gapMinutes: Int = 30,
      bucketHours: Int = 24): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapUs = gapMinutes * 60000000L
    val bUs = bucketHours * 3600000000L
    val us = unix_micros(col("ts").cast("timestamp"))
    val wb = Window.partitionBy("user_id", "bucket")
      .orderBy("tus", "event_id")
    // pass 1: bucket-local gap rule (the only events-scale window)
    val local = events
      .withColumn("tus", us)
      .withColumn("bucket", (col("tus") / lit(bUs)).cast("long"))
      .withColumn("local_start",
        when(lag(col("tus"), 1).over(wb).isNull ||
          col("tus") - lag(col("tus"), 1).over(wb) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("local_seq",
        sum(col("local_start")).over(
          wb.rowsBetween(Window.unboundedPreceding, 0)))
    // pass 2: per-(user, bucket) summary — first/last ts and local
    // session-start count; `continues` = this bucket's first event
    // is within gap of the previous ACTIVE bucket's last event
    // (lag over existing rows handles empty buckets in between: a
    // whole silent bucket of width ≥ gap implies a new session, and
    // bUs ≥ gapUs is required below)
    require(bUs >= gapUs,
      s"bucket ($bucketHours h) must be at least the gap ($gapMinutes m)")
    val wu = Window.partitionBy("user_id").orderBy("bucket")
    val summary = local.groupBy("user_id", "bucket")
      .agg(min("tus").as("first_tus"), max("tus").as("last_tus"),
        sum("local_start").as("n_starts"))
      .withColumn("continues",
        when(col("first_tus") - lag(col("last_tus"), 1).over(wu) <= gapUs &&
          lag(col("bucket"), 1).over(wu) === col("bucket") - 1, 1L)
          .otherwise(0L))
      // true session starts this bucket; running sum over PRIOR
      // buckets = this bucket's global seq offset
      .withColumn("true_starts", col("n_starts") - col("continues"))
      .withColumn("offset",
        coalesce(sum(col("true_starts")).over(
          wu.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("user_id"), col("bucket"), col("continues"),
        col("offset"))
    // pass 3: events join their bucket row (summary ≪ events; AQE
    // broadcasts it at probe scale, and at cluster scale it shuffles
    // on the SAME (user, bucket) key the window already established)
    local.join(summary, Seq("user_id", "bucket"))
      .select(col("user_id"), col("event_id"),
        // a continuing bucket's first local session is the previous
        // bucket's last session: fold it by subtracting its start
        (col("offset") + col("local_seq") - col("continues"))
          .as("session_seq"))
  }

  /** Per-session statistics (event count + duration) on top of the
    * same gap rule as [[sessionizeBatch]] — the roll-up every
    * session pipeline computes next. Exact integer microseconds
    * throughout. */
  def sessionStatsBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val us = unix_micros(col("ts").cast("timestamp"))
    val gap = us - lag(us, 1).over(w)
    events
      .withColumn("tus", us)
      .withColumn("new_session",
        when(gap.isNull || gap > gapMinutes * 60000000L, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("tus")) - min(col("tus"))).as("duration_us"))
  }

  /** Top session paths — the funnel-DISCOVERY query (which journeys
    * actually happen, before you pin a funnel to measure): each
    * session's first `maxSteps` event types joined into a path
    * string, counted across all sessions, top `topK`. Same gap rule
    * as [[sessionizeBatch]].
    *
    * Plan shape: the step numbering windows on (user_id,
    * session_seq), which hash-partitioning on user_id already
    * satisfies (partition keys ⊂ cluster keys), so the whole
    * session→step→path chain rides ONE user shuffle; the path count
    * is a path-typed agg (bounded by type^maxSteps in practice) and
    * the cut is a TakeOrdered, never a global sort. The in-group
    * order is pinned by sorting (step, type) structs — collect_list
    * alone has no order contract. */
  def sessionPathsBatch(events: DataFrame, gapMinutes: Int = 30,
      maxSteps: Int = 5, topK: Int = 25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val us = unix_micros(col("ts").cast("timestamp"))
    val gap = us - lag(us, 1).over(w)
    val stepW = Window.partitionBy("user_id", "session_seq")
      .orderBy("tus", "event_id")
    events
      .withColumn("tus", us)
      .withColumn("new_session",
        when(gap.isNull || gap > gapMinutes * 60000000L, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("step", row_number().over(stepW))
      .filter(col("step") <= maxSteps)
      .groupBy("user_id", "session_seq")
      .agg(concat_ws(">", transform(
        array_sort(collect_list(struct(col("step"), col("event_type")))),
        x => x.getField("event_type"))).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(topK)
  }

  /** Calendar gap-fill with forward-fill — time-series
    * densification: one row per (user, day) over each user's
    * observed [first, last] day range, carrying the day's LAST
    * observed value forward across silent days (metrics dashboards,
    * feature snapshots, balance histories all need exactly this
    * before any window math). `observed` marks real vs filled rows.
    *
    * Determinism: the per-day "last" is the (tus, event_id)-max row
    * — replayed by the oracle as a row_number window, not an agg
    * with unspecified tie order. Scale shape: one (user, day)
    * shuffle for the day-last agg, the calendar explode is map-side
    * (sequence+explode, fan-out = day span), and the forward-fill
    * window rides the same user partitioning; nothing is
    * corpus-quadratic and silent users cost only their own span. */
  def gapFillDaily(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val us = unix_micros(col("ts").cast("timestamp"))
    val perDay = Window.partitionBy("user_id", "day")
      .orderBy(col("tus").desc, col("event_id").desc)
    val dayLast = events
      .withColumn("tus", us)
      .withColumn("day", to_date(col("ts").cast("timestamp")))
      .withColumn("rn", row_number().over(perDay))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("day"), col("value"))
    val span = dayLast.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
    val calendar = span.select(col("user_id"),
      explode(sequence(col("d0"), col("d1"))).as("day"))
    val fillW = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    calendar.join(dayLast, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        last(col("value"), ignoreNulls = true).over(fillW).as("value"),
        col("value").isNotNull.as("observed"))
  }

  /** Sessionization via Spark's NATIVE `session_window` operator —
    * the merging-window aggregate Structured Streaming uses for
    * session state (SPARK-10816), here in its batch form. Same
    * 30-minute gap rule as [[sessionizeBatch]], but expressed as a
    * groupBy over a dynamic window instead of lag + running sum —
    * one shuffle on (user_id, window), merged map-side like any
    * aggregation, and under readStream the SAME expression runs with
    * watermark-bounded state. Window bounds surface as NTZ (plain
    * int64 µs in parquet, the cross-engine-stable choice used by
    * every window op here); values are exact 2-dp decimals. The
    * oracle replays the gap rule with lag + running sum — proving
    * the native operator and the window formulation agree. */
  def sessionWindowNative(events: DataFrame,
      gapMinutes: Int = 30): DataFrame =
    events.groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
      .select(col("user_id"),
        col("sw.start").cast("timestamp_ntz").as("session_start"),
        col("sw.end").cast("timestamp_ntz").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Watermark-sizing stress harness — the batch replay of
    * Structured Streaming's `withWatermark` drop rule under
    * simulated arrival disorder, the number every streaming
    * deployment needs BEFORE picking its delay threshold ("how much
    * data would a 1-hour watermark drop if clients sync up to a day
    * late?"). The events table records event TIME only (and arrives
    * perfectly ordered — zero disorder at any scale, measured), so
    * arrival is simulated: each event's upload is delayed by a
    * deterministic md5-keyed jitter uniform in [0, maxJitter) — the
    * offline-mobile-client model, replayed bit-identically by any
    * engine. Per source partition (user_id, matching the per-key
    * state shape of the streaming operators here) the watermark is
    * max(event time seen so far in arrival order) − delay, and an
    * event is late iff its event time is below the watermark on
    * arrival. Exact integer microseconds; the only shuffle is the
    * same user_id window sessionization pays, then a type-sized
    * rollup. (A GLOBAL watermark — Spark's actual min across
    * partitions — would need a total order over arrivals: a
    * single-partition window at 100 TB. The per-partition form is
    * the scale-honest bound: the global watermark is ≤ each
    * partition's, so this never under-counts lateness.) */
  def watermarkLateBatch(events: DataFrame,
      delaySeconds: Long = 3600,
      maxJitterSeconds: Long = 86400): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // 48 md5 bits (12 hex chars): always positive, and wide enough
    // that % does not degenerate (a 32-bit draw is SMALLER than a
    // day of microseconds — the modulo would be the identity and
    // silently cap the jitter at ~71 min)
    val jitter = conv(substring(md5(col("event_id").cast("string")), 1, 12),
      16, 10).cast("long") % (maxJitterSeconds * 1000000L)
    val w = Window.partitionBy("user_id").orderBy("arrival_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wmBefore = max(col("tus")).over(w) - delaySeconds * 1000000L
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
      .withColumn("arrival_us", col("tus") + jitter)
      .withColumn("lateness_us",
        when(col("tus") < wmBefore, wmBefore - col("tus")).otherwise(0L))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("lateness_us") > 0, 1L).otherwise(0L)).as("n_late"),
        max(col("lateness_us")).as("max_lateness_us"))
  }

  /** Inter-arrival gap statistics: the time between each user's
    * consecutive events (lag over the per-user event-time order),
    * rolled up by the event type that ENDED the gap — the latency
    * profile behind session-gap tuning (is 30 min the right
    * threshold?) and arrival-rate anomaly baselines. Gaps are exact
    * integer microseconds; the mean is the only float and both
    * engines compute it by the same double division order. Scale
    * shape: one window shuffle on user_id + one small agg on
    * event_type — the same partitioning a sessionization pipeline
    * already pays, so this rides along free in practice. */
  def interArrivalBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
      .withColumn("gap_us", col("tus") - lag(col("tus"), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        round(sum(col("gap_us")).cast("double") / count(lit(1))
          / lit(1000000.0), 4).as("avg_gap_s"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"))
  }

  /** Event-type transition matrix (first-order Markov counts): for
    * each user's time-ordered event sequence, count consecutive
    * (from_type → to_type) pairs and their transition probability.
    * One window shuffle on user_id (the same partitioning
    * sessionization pays — lead() rides it), then one tiny agg on
    * the type pair; the per-from normalizer is a window sum over the
    * already-aggregated |types|² frame, so the probability division
    * costs nothing at any scale. Ordering and ties are pinned to
    * (integer µs, event_id) exactly like sessionize, and the
    * probability is one BIGINT/BIGINT double division — both engines
    * IEEE-divide identical operands. */
  def transitionsBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val pairs = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val wf = Window.partitionBy("from_type")
    pairs
      .withColumn("p",
        round(col("n").cast("double") / sum(col("n")).over(wf), 6))
      .select("from_type", "to_type", "n", "p")
  }

  /** CEP-style pattern match (a MATCH_RECOGNIZE-lite): clicks whose
    * most recent preceding signup (a) exists, (b) is more recent than
    * any preceding purchase, and (c) happened within `windowUs`.
    * The "most recent preceding X" states are running conditional
    * maxima over a ROWS UNBOUNDED..1 PRECEDING frame — ONE window
    * shuffle on user_id evaluates every state, the same partitioning
    * sessionize/transitions pay; no self-joins, no per-pattern scans.
    * A signup and purchase at the SAME microsecond count as a broken
    * pattern (tsig > tpur is strict) — deterministic in both engines
    * without depending on intra-tick row order. */
  def patternMatchBatch(events: DataFrame,
      windowUs: Long = 3600000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
      .withColumn("tsig",
        max(when(col("event_type") === "signup", col("tus"))).over(w))
      .withColumn("tpur",
        max(when(col("event_type") === "purchase", col("tus"))).over(w))
      .filter(col("event_type") === "click" && col("tsig").isNotNull &&
        (col("tpur").isNull || col("tsig") > col("tpur")) &&
        col("tus") - col("tsig") <= windowUs)
      .select(col("user_id"), col("event_id").as("click_id"),
        (col("tus") - col("tsig")).as("gap_us"))
  }

  /** Streaming exact dedup: drop events whose dedup key was already
    * seen, with the watermark bounding the dedup state (the
    * streaming form of the corpus exact-dedup operator). */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicates(keyCols :+ "ts")

  /** Streaming windowed aggregation with a watermark bounding state. */
  def windowAggStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))

  /** Streaming form of [[hoppingWindowAggBatch]]: same sliding
    * window expression under a watermark — each window closes
    * width/slide slides later than its tumbling counterpart, which
    * is the (bounded) extra state overlap costs. */
  def hoppingWindowAggStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").getField("start")
          .as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))

  /** Streaming attribution: the stream-stream form of the batch
    * interval join (operators.IntervalJoin) — every click pairs with
    * the same user's purchases at most `windowHours` before it.
    * Both sides are watermarked, and the time-range join condition
    * is what lets Spark BOUND the join state: purchase state older
    * than the window + watermark slack is evicted instead of
    * accumulating forever (state scales with the window span ×
    * arrival rate, not the stream's lifetime). */
  def attributionStream(clicks: DataFrame, purchases: DataFrame,
      windowHours: Int = 24): DataFrame = {
    val c = clicks.withWatermark("ts", "1 hour").alias("c")
    val p = purchases.withWatermark("ts", s"${windowHours + 1} hours")
      .alias("p")
    c.join(p, expr(
      s"""c.user_id = p.user_id AND
          c.ts >= p.ts AND
          c.ts < p.ts + interval $windowHours hours"""))
      .select(col("c.event_id").as("click_id"),
        col("p.event_id").as("purchase_id"),
        col("c.user_id").as("user_id"))
  }

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)
  case class SessionState(lastTs: Long, seq: Long)
  case class SessionOut(user_id: Long, event_id: Long, session_seq: Long)

  /** Streaming sessionization: per-user state via
    * flatMapGroupsWithState — state size scales with active users,
    * not event volume. Assumes per-user event-time order within a
    * batch (enforced by sorting each group's batch slice). */
  case class PatternState(tsig: Long, tpur: Long)
  case class PatternOut(user_id: Long, click_id: Long, gap_us: Long)

  /** Streaming form of [[patternMatchBatch]]: per-user state is just
    * the two running conditional maxima (latest signup / latest
    * purchase time — 2 longs, bounded regardless of stream length).
    * Each click is evaluated against the state BEFORE the current
    * event folds in, replaying the batch form's strictly-preceding
    * (ROWS ..1 PRECEDING) frame; the strict tsig > tpur compare is
    * on values, so same-microsecond signup+purchase breaks the
    * pattern identically in both forms. Assumes per-user event-time
    * order across batches, like sessionizeStream (within a batch the
    * group's slice is sorted). */
  def patternMatchStream(events: Dataset[Ev],
      windowUs: Long = 3600000000L): Dataset[PatternOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[PatternState, PatternOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[PatternState]) =>
          def us(t: java.sql.Timestamp): Long =
            t.toInstant.getEpochSecond * 1000000L + t.getNanos / 1000L
          val sorted = evs.toSeq.sortBy(e => (us(e.ts), e.event_id))
          var st = state.getOption
            .getOrElse(PatternState(Long.MinValue, Long.MinValue))
          val out = scala.collection.mutable.ListBuffer.empty[PatternOut]
          sorted.foreach { e =>
            val t = us(e.ts)
            e.event_type match {
              case "click"
                  if st.tsig != Long.MinValue && st.tsig > st.tpur &&
                    t - st.tsig <= windowUs =>
                out += PatternOut(user, e.event_id, t - st.tsig)
              case "signup" => st = st.copy(tsig = math.max(st.tsig, t))
              case "purchase" => st = st.copy(tpur = math.max(st.tpur, t))
              case _ => ()
            }
          }
          state.update(st)
          out.iterator
      }
  }

  def sessionizeStream(events: Dataset[Ev], gapMinutes: Int = 30)
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          // same integer-microsecond gap rule as sessionizeBatch
          def us(t: java.sql.Timestamp): Long =
            t.toInstant.getEpochSecond * 1000000L + t.getNanos / 1000L
          val sorted = evs.toSeq.sortBy(e => (us(e.ts), e.event_id))
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L))
          val out = sorted.map { e =>
            val newSession = st.lastTs == Long.MinValue ||
              us(e.ts) - st.lastTs > gapMinutes * 60000000L
            st = SessionState(us(e.ts), if (newSession) st.seq + 1 else st.seq)
            SessionOut(user, e.event_id, st.seq)
          }
          state.update(st)
          out.iterator
      }
  }
}
