package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-dimensional layout for parquet —
  * the write-side half of file skipping at 100 TB.
  *
  * A table sorted on ONE column gives tight per-file min/max stats
  * on that column only: a query filtering on a second dimension
  * still touches every file. Interleaving the bits of two (or more)
  * quantized dimensions into a single sort key clusters rows that
  * are close in EVERY dimension into the same files, so parquet
  * footer stats prune multi-dimensional box queries down to a few
  * files — the same layout trick behind Delta/Iceberg `ZORDER BY`
  * and the classic UB-tree, here as a plain writer any engine can
  * read (the layout is just ordinary parquet + row order; nothing
  * to decode at query time).
  *
  * The z-value is built entirely from codegen'd built-ins
  * (shiftright / bitwise-and / shiftleft folded over the bit
  * positions) — no UDF anywhere, so the one-pass write stays inside
  * WholeStageCodegen. Quantization is linear on the column's
  * [min, max] envelope from a one-row stats pass (the standard
  * z-order writer shape: stats job + write job); rank/percentile
  * quantization slots in by replacing the envelope frame.
  */
object ZOrderLayout {

  /** Interleave the low `bits` of each quantized dimension into a
    * Morton code: output bit (d + i·D) = bit i of dimension d. Built
    * by folding shift/and/or built-ins — codegen-friendly, and exact
    * for `bits · dims ≤ 63`. */
  def interleave(qs: Seq[Column], bits: Int): Column = {
    require(qs.nonEmpty && bits * qs.size <= 63,
      s"${qs.size} dims × $bits bits must fit a signed 64-bit key")
    val terms = for {
      (q, d) <- qs.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(q, i).bitwiseAND(lit(1L)), i * qs.size + d)
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Linear [min, max] quantization of a numeric column to
    * `[0, 2^bits)` — the envelope arrives as literal doubles from
    * the stats pass. Degenerate envelopes (constant column) land
    * every row on 0. */
  def quantize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val levels = (1L << bits) - 1
    if (hi <= lo) lit(0L)
    else least(lit(levels),
      floor((c.cast("double") - lit(lo)) * lit(levels.toDouble)
        / lit(hi - lo)).cast("long"))
  }

  /** Write `df` z-ordered on `dims` as parquet: one stats pass for
    * the envelopes, then range-partition + sort by the Morton key
    * and write `nFiles` files. Range partitioning (not hash) keeps
    * the curve contiguous per file, which is what makes the footer
    * stats tight; the key column is dropped before the write, so
    * readers see the original schema. */
  def write(df: DataFrame, dims: Seq[String], path: String,
      nFiles: Int, bits: Int = 16): Unit = {
    val aggs = dims.flatMap(d => Seq(min(col(d)).cast("double"),
      max(col(d)).cast("double")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val qs = dims.zipWithIndex.map { case (d, i) =>
      quantize(col(d), stats.getDouble(2 * i), stats.getDouble(2 * i + 1),
        bits)
    }
    df.withColumn("__z", interleave(qs, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** How many files contain rows matching `pred` — the spec's layout
    * quality probe (a pruned file contributes no matching rows). */
  def filesTouched(spark: org.apache.spark.sql.SparkSession,
      path: String, pred: Column): Long =
    spark.read.parquet(path).where(pred)
      .select(input_file_name()).distinct().count()
}
