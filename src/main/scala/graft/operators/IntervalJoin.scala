package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval join (attribution windows, validity ranges):
  * pair every point row with the same-key interval rows whose
  * `[start, end)` range contains the point's timestamp.
  *
  * A naive key-only equi-join re-pairs every point with every
  * interval of its key before the range filter — per-key quadratic,
  * which is exactly what dies on hot keys at scale. Here both sides
  * are mapped onto uniform time buckets first: an interval explodes
  * to the (few) buckets it overlaps, a point to exactly one, and the
  * equi-join runs on (key, bucket) — fan-out per interval is
  * ceil(span/width)+1 and each point meets only the intervals
  * overlapping its bucket, never the key's full history. One shuffle
  * per side on (key, bucket); the exact `[start, end)` containment
  * is re-checked after the join, so bucketing is purely an
  * acceleration and never changes semantics. A point matches each
  * containing interval exactly once (its single bucket row joins the
  * interval's single row for that bucket — no post-join dedup).
  *
  * Timestamps are integer microseconds (`unix_micros`) — long
  * arithmetic keeps bucket boundaries exact; `end` is exclusive.
  */
object IntervalJoin {

  /** @param intervals rows carrying `[startCol, endCol)` long-µs bounds
    * @param points    rows carrying a `tsCol` long-µs instant
    * @param keyCols   equality key shared by both sides
    * @param bucketWidthUs uniform bucket width in microseconds;
    *        choose ≈ the typical interval span so most intervals
    *        explode to ≤ 2 buckets */
  def bucketed(intervals: DataFrame, points: DataFrame,
      keyCols: Seq[String], startCol: String, endCol: String,
      tsCol: String, bucketWidthUs: Long): DataFrame = {
    require(bucketWidthUs > 0, "bucket width must be positive")
    // empty/inverted intervals match nothing by the [start, end)
    // contract — and MUST be dropped before the explode: Spark's
    // sequence(hi, lo) generates a DESCENDING range, so one malformed
    // row (swapped bounds, 0-sentinel end) would otherwise mint
    // billions of junk bucket rows instead of zero matches
    val valid = intervals.filter(col(endCol) > col(startCol))
    // [start, end) overlaps buckets floor(start/w) .. floor((end-1)/w)
    val ib = valid.withColumn("__bucket", explode(sequence(
      floorDiv(col(startCol), bucketWidthUs),
      floorDiv(col(endCol) - 1, bucketWidthUs))))
    val pb = points.withColumn("__bucket", floorDiv(col(tsCol), bucketWidthUs))
    ib.join(pb, keyCols :+ "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }

  /** Interval×interval overlap join: pair same-key rows whose
    * `[start, end)` ranges intersect — the temporal-overlap sibling
    * of [[bucketed]] (sessions × campaigns, validity × validity).
    *
    * Same uniform bucketing, with one extra subtlety: overlapping
    * intervals co-occupy EVERY shared bucket, so a naive bucket
    * equi-join emits a pair once per shared bucket. Rather than a
    * post-join `distinct` (a second shuffle over the full match
    * stream), each pair is kept only in the FIRST bucket both
    * intervals occupy — `bucket == max(floor(a.start/w),
    * floor(b.start/w))` — which every overlapping pair satisfies in
    * exactly one bucket and non-overlapping pairs never reach (the
    * exact overlap re-check runs first). One shuffle per side, no
    * dedup pass, hot keys bounded by bucket fan-out exactly like
    * the point form. */
  def overlapBucketed(left: DataFrame, right: DataFrame,
      keyCols: Seq[String], lStart: String, lEnd: String,
      rStart: String, rEnd: String, bucketWidthUs: Long): DataFrame = {
    require(bucketWidthUs > 0, "bucket width must be positive")
    val lv = left.filter(col(lEnd) > col(lStart))
    val rv = right.filter(col(rEnd) > col(rStart))
    val lb = lv.withColumn("__bucket", explode(sequence(
      floorDiv(col(lStart), bucketWidthUs),
      floorDiv(col(lEnd) - 1, bucketWidthUs))))
    val rb = rv.withColumn("__bucket", explode(sequence(
      floorDiv(col(rStart), bucketWidthUs),
      floorDiv(col(rEnd) - 1, bucketWidthUs))))
    lb.join(rb, keyCols :+ "__bucket")
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col("__bucket") === greatest(
        floorDiv(col(lStart), bucketWidthUs),
        floorDiv(col(rStart), bucketWidthUs)))
      .drop("__bucket")
  }

  /** Exact long floor-division, valid for negative values too
    * (pre-1970 timestamps): `pmod` is always in [0, b), so
    * subtracting it lands on the floor multiple for either sign —
    * a bare `%` is toward-zero and would shift negative values one
    * bucket up, silently dropping their matches. The subtract-first
    * form keeps the double division exact (a bare
    * `(a / b).cast("long")` can round across a bucket boundary at
    * epoch magnitudes). */
  private def floorDiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))) / lit(b)).cast("long")
}
