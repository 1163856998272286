package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed secondary indexes: the Spark re-expression of the
  * reference's per-type lookup shard tables
  * (`sql/egraph_table_creation.sql:56-160`,
  * `models/egraph_index_model.erl`) — `int | double | text | geo |
  * date | datetime` entries mapping an index key to a node id.
  *
  * Here an index is one DataFrame `(index_name, key_type, key_str,
  * node_key)`. At 100 TB it is written
  * `partitionBy(index_name, key_type)` so a probe prunes to a single
  * directory and pushes the key predicate into the parquet scan —
  * the moral equivalent of the reference's table-per-index sharding.
  */
object TypedIndexes {

  /** Typed index rows for the customer nodes, including the
    * `_lc__`-suffixed lowercase variant the reference derives
    * automatically (README "lowercase_indexes"). Keys are carried
    * as strings (numerics via DECIMAL casts) so one frame holds all
    * types, mirroring key_data blobs. */
  def build(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val key = concat(lit("c:"), col("c_custkey").cast("string"))
    def entry(name: String, typ: String, k: Column) =
      c.select(lit(name).as("index_name"), lit(typ).as("key_type"),
        k.cast("string").as("key_str"), key.as("node_key"))
    entry("name", "text", col("c_name"))
      .unionByName(entry("mktsegment", "text", col("c_mktsegment")))
      .unionByName(entry("mktsegment_lc__", "text", lower(col("c_mktsegment"))))
      .unionByName(entry("nationkey", "int", col("c_nationkey")))
      .unionByName(entry("acctbal", "double",
        col("c_acctbal").cast("decimal(12,2)")))
  }

  /** Write the index partitioned for probe-time pruning (scale path;
    * the query gate probes the in-plan frame instead). */
  def write(ix: DataFrame, path: String): Unit =
    ix.write.mode("overwrite").partitionBy("index_name", "key_type").parquet(path)

  /** Exact probe — index_name + key → node keys. */
  def probeExact(ix: DataFrame, name: String, typ: String, key: String): DataFrame =
    ix.filter(col("index_name") === name && col("key_type") === typ &&
        col("key_str") === key)
      .select("node_key")

  /** Range probe `[lo, hi]` on a numeric index (README's
    * two-element-array condition form). */
  def probeRangeDouble(ix: DataFrame, name: String, lo: Double, hi: Double): DataFrame =
    // try_cast: under ANSI mode the cast can be evaluated as a common
    // subexpression BEFORE the index_name conjunct short-circuits, so
    // a plain cast throws on entries of other (non-numeric) indexes
    ix.filter(col("index_name") === name && col("key_type") === "double" &&
        col("key_str").try_cast("double").between(lo, hi))
      .select(col("node_key"), col("key_str").try_cast("double").as("key_val"))

  /** Datetime-range probe over orders (reference datetime index
    * type), mapping to the order ids in range. */
  def probeDateRange(s: SparkSession, dir: String, lo: String, hi: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
        col("o_orderdate") < lit(hi).cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderdate"))

  /** Great-circle distance in km between two (lat, lon) points —
    * the metric a production geo index uses; the oracle-checked
    * probe uses the planar metric because trig libm results differ
    * across engines in the last ulp. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val r = lit(6371.0088)
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    r * lit(2.0) * asin(sqrt(a))
  }

  /** Geo probe with the haversine metric (spec-checked). A sargable
    * bounding box (lat/lon BETWEEN) prefilters before the exact
    * trig — at scale the box reaches the scan as a pushed range
    * predicate (or prunes geohash partitions), and haversine runs
    * only on rows inside it. */
  def geoRadiusKm(s: SparkSession, dir: String, lat0: Double, lon0: Double,
      radiusKm: Double): DataFrame = {
    val r = radiusKm / 6371.0088 // angular radius
    val dLat = math.toDegrees(r)
    // exact max longitude deviation of a great-circle cap:
    // asin(sin r / cos φ); undefined ⇔ the cap contains a pole, in
    // which case every longitude is inside
    val sinRatio = math.sin(r) / math.cos(math.toRadians(lat0))
    val capHitsPole = lat0 + dLat >= 90.0 || lat0 - dLat <= -90.0 ||
      math.abs(sinRatio) >= 1.0
    val latBox = col("lat").between(lat0 - dLat, lat0 + dLat)
    val box = if (capHitsPole) latBox else {
      val dLon = math.toDegrees(math.asin(sinRatio))
      val (lo, hi) = (lon0 - dLon, lon0 + dLon)
      if (lo < -180.0 || hi > 180.0)
        // antimeridian wrap: the lon interval splits in two
        latBox && (col("lon") >= ((lo + 540.0) % 360.0) - 180.0 ||
          col("lon") <= ((hi + 540.0) % 360.0) - 180.0)
      else latBox && col("lon").between(lo, hi)
    }
    val c = Tables.customer(s, dir)
      .withColumn("lat", (col("c_custkey") % 180).cast("double") - 90.0 + 0.5)
      .withColumn("lon", ((col("c_custkey") * 7) % 360).cast("double") - 180.0 + 0.5)
    c.filter(box)
      .filter(haversineKm(col("lat"), col("lon"), lit(lat0), lit(lon0)) <= radiusKm)
      .select(concat(lit("c:"), col("c_custkey").cast("string")).as("node_key"),
        col("lat"), col("lon"))
  }

  /** k-nearest geo probe (planar degree metric, exact IEEE
    * arithmetic like [[geoRadius]] so the oracle replays it) with the
    * expanding-ring prefilter: grow a sargable bounding box from
    * `r0`, doubling, until ≥ k points fall inside the inscribed
    * circle, then run the exact top-k only inside the final box —
    * a point probe reads the ring area, never the whole table. Each
    * ring is one count on a box-filtered scan; at 100 TB the box is a
    * pushed lat/lon range predicate (asserted in PlanAuditSpec on a
    * parquet layout), so the probe cost is proportional to the ring,
    * and the doubling loop terminates in O(log(extent/r0)) rounds.
    *
    * Correctness of the cut: the output ranks on ROUNDED distance
    * with a key tie-break (so the k boundary resolves identically in
    * any engine). With ≥ k points at exact distance ≤ r, every global
    * top-k member has rounded distance ≤ round(r, 4), hence exact
    * distance ≤ r + 1e-4 — the final pool takes the box and circle at
    * r + 1e-4 so rounding at the rim can never swap a member out of
    * the pool. */
  def geoKnnPoints(points: DataFrame, lat0: Double, lon0: Double,
      k: Int, r0: Double = 1.0, maxExtent: Double = 512.0): DataFrame = {
    require(k > 0 && r0 > 0 && maxExtent >= r0,
      s"need k > 0, r0 > 0 and maxExtent >= r0, got ($k, $r0, $maxExtent)")
    val distX = sqrt(pow(col("lat") - lat0, 2) + pow(col("lon") - lon0, 2))
    def ring(r: Double) = points
      .filter(col("lat").between(lat0 - r, lat0 + r) &&
        col("lon").between(lon0 - r, lon0 + r))
      .filter(distX <= r)
    // each count is a tiny box-pruned aggregate; the doubling is
    // capped at maxExtent (default: the demo grid's planar extent),
    // and if even that ring holds fewer than k points the pool falls
    // back to the UNBOXED exact scan — never a silent short answer
    var r = r0
    var enough = ring(r).limit(k).count() >= k
    while (!enough && r < maxExtent) {
      r = math.min(r * 2, maxExtent)
      enough = ring(r).limit(k).count() >= k
    }
    val pool = if (enough) ring(r + 1e-4) else points
    pool
      .select(col("node_key"), col("lat"), col("lon"),
        round(distX, 4).as("dist"))
      .orderBy(col("dist").asc, col("node_key").asc)
      .limit(k)
  }

  /** [[geoKnnPoints]] over the demo grid synthesized from customer
    * keys (coordinates derived deterministically so the oracle can
    * reproduce them). */
  def geoKnn(s: SparkSession, dir: String, lat0: Double, lon0: Double,
      k: Int): DataFrame =
    geoKnnPoints(
      Tables.customer(s, dir)
        .select(concat(lit("c:"), col("c_custkey").cast("string")).as("node_key"),
          ((col("c_custkey") % 180).cast("double") - 90.0 + 0.5).as("lat"),
          (((col("c_custkey") * 7) % 360).cast("double") - 180.0 + 0.5).as("lon")),
      lat0, lon0, k)

  /** Geo probe: nodes within `radius` (planar degree metric) of a
    * point — the reference's spatial index surface
    * (`egraph_lookup_geo_base`). Coordinates are synthesized
    * deterministically from the key so the oracle can reproduce
    * them; all arithmetic is exact in IEEE doubles. */
  def geoRadius(s: SparkSession, dir: String, lat0: Double, lon0: Double,
      radius: Double): DataFrame = {
    val c = Tables.customer(s, dir)
      .withColumn("lat", (col("c_custkey") % 180).cast("double") - 90.0 + 0.5)
      .withColumn("lon", ((col("c_custkey") * 7) % 360).cast("double") - 180.0 + 0.5)
    // sargable bounding box first (pushable range predicate), exact
    // circle test only inside it
    c.filter(col("lat").between(lat0 - radius, lat0 + radius) &&
        col("lon").between(lon0 - radius, lon0 + radius))
      .filter(pow(col("lat") - lat0, 2) + pow(col("lon") - lon0, 2)
        <= radius * radius)
      .select(concat(lit("c:"), col("c_custkey").cast("string")).as("node_key"),
        col("lat"), col("lon"))
  }
}
