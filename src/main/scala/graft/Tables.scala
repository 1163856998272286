package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * Every operator in this library takes the table directory as a
  * parameter and builds a declarative plan from these scans — column
  * pruning and predicate pushdown reach the parquet reader via
  * Catalyst, which is what keeps the same code viable at 100 TB.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** `events.ts` normalized to a µs-precision TIMESTAMP whatever the
    * writer produced: parquet TIMESTAMP(NANOS) (which Spark's reader
    * rejects — read as long via the legacy conf, then exact ns→µs
    * division), TIMESTAMP_NTZ (µs parquet from engines that write
    * no-timezone timestamps — downstream `unix_micros` rejects NTZ;
    * the cast interprets wall-clock in the session timezone, so this
    * REQUIRES the fixed-offset UTC session tz every entry point in
    * this library pins, a DST zone would shift instants near
    * transitions), or already TIMESTAMP. */
  def events(s: SparkSession, d: String): DataFrame = {
    try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => }
    val raw = apply(s, d, "events")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType =>
        // exact integer ns→µs division (`div`, not `/`): double
        // division has ~512 ns ulp at epoch-nanosecond magnitude, so
        // truncating it could land ±1 µs off the oracle engine's
        // exact truncation
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
