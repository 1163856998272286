package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet // optional subset of query names
    // a typo'd name would silently verify nothing — and the gate
    // could then PASS against the previous run's stale parquet
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.mkString(", ")}")
    // same env-driven fabric knobs as Bench (SPARK_GRAFT_MASTER etc.)
    // — lets the chaos probe run a CORRECTNESS dump on a real
    // multi-executor cluster and diff it against the local run
    val spark = SparkEnv.session()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Subset runs rewrite oracle_sql.json in full, so parquet left
    // over from a previous run's unselected queries would be compared
    // against FRESH oracle SQL — delete those dirs so check.py fails
    // loudly (missing output) instead of passing on stale results.
    if (only.nonEmpty) {
      (SparkEntry.queries.keySet -- only)
        .map(n => Paths.get(outDir, n)).filter(Files.exists(_))
        .foreach { p =>
          System.err.println(s"[verify] removing stale output $p (not in this subset run)")
          Files.walk(p).sorted(java.util.Comparator.reverseOrder())
            .forEach(f => Files.delete(f))
        }
    }
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
