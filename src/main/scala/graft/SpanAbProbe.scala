package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch ABBA probe (r12): duplicateSpans' dup-gram detection as
  * the current two-extraction groupBy+join shape vs a single-pass
  * window form (min/max over the gram partition — one gram
  * extraction, one exchange), with the gram key as 16-byte binary
  * md5 instead of the 32-char hex string. Verifies row equality
  * (EXCEPT both ways) before timing. Same JVM, warmed plans,
  * StageMeter for executed stages + shuffle bytes. */
object SpanAbProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEnv.session()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)
    docs.count()
    val n = 8
    val idCol = "doc_id"
    val textCol = "text"

    def windowForm(): DataFrame = {
      val toks = col("__toks")
      val grams = docs
        .select(col(idCol), graft.dedup.Dedup.tokens(col(textCol)).as("__toks"))
        .filter(size(toks) >= n)
        .select(col(idCol), posexplode(transform(
            sequence(lit(0), size(toks) - n),
            i => unhex(md5(concat_ws(" ", slice(toks, i + 1, lit(n))))))
          ).as(Seq("pos", "g")))
      val wg = org.apache.spark.sql.expressions.Window.partitionBy("g")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(idCol).orderBy("pos")
      val prevMaxEnd = max(col("pos") + (n - 1))
        .over(w.rowsBetween(Long.MinValue, -1))
      grams
        .withColumn("__mn", min(col(idCol)).over(wg))
        .withColumn("__mx", max(col(idCol)).over(wg))
        .filter(col("__mn") =!= col("__mx"))
        .select(col(idCol), col("pos"))
        .withColumn("__new",
          when(prevMaxEnd.isNull || col("pos") > prevMaxEnd + 1, 1)
            .otherwise(0))
        .withColumn("__island",
          sum("__new").over(w.rowsBetween(Long.MinValue, 0)))
        .groupBy(col(idCol), col("__island"))
        .agg(min(col("pos")).cast("long").as("span_start"),
          (max(col("pos")) + (n - 1)).cast("long").as("span_end"))
        .select(col(idCol), col("span_start"), col("span_end"),
          (col("span_end") - col("span_start") + 1).as("n_dup_tokens"))
    }

    def oldForm(): DataFrame =
      graft.dedup.Dedup.duplicateSpans(docs, idCol, textCol, n)

    // equality gate first: EXCEPT both ways must be empty
    val a = oldForm()
    val b = windowForm()
    val d1 = a.exceptAll(b).count()
    val d2 = b.exceptAll(a).count()
    println(s"[span-ab] equality old\\new=$d1 new\\old=$d2 " +
      s"rows_old=${a.count()} rows_new=${b.count()}")
    require(d1 == 0 && d2 == 0, "variant outputs differ")

    val meter = new graft.util.StageMeter(spark.sparkContext)
    for (leg <- Seq("old", "new", "new", "old", "old", "new")) {
      meter.reset()
      val t0 = System.nanoTime()
      val rows = (if (leg == "old") oldForm() else windowForm()).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val (st, sw, sr) = meter.snapshot()
      println(f"[span-ab] $leg rows=$rows wall=$wall%.2fs stages=$st " +
        f"shufW=${sw / 1e6}%.1fMB shufR=${sr / 1e6}%.1fMB")
    }
    spark.stop()
  }
}
