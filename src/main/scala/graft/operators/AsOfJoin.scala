package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every probe row, attach the most
  * recent build row with the same key whose timestamp is `<=` the
  * probe's — the feature-lookup join of event pipelines ("state of X
  * when Y happened") that Spark has no native operator for.
  *
  * Implementation is the union-merge form, NOT a range join: tag
  * both sides, union them, and run one `last(value) ignoreNulls`
  * window per key ordered by (ts, side). Cost at any scale is a
  * single shuffle on the key — the same exchange a plain equi-join
  * on the key would pay — with no range-condition row explosion and
  * no per-key skew beyond the key's own row count. Build rows are
  * dropped after the window, so output rows = probe rows exactly
  * (probes with no prior build row keep a null value, like a left
  * join).
  *
  * Ordering contract: a build row at exactly the probe's timestamp
  * IS visible (sorts before the probe via the side tag); among
  * equal-ts build rows the one with the greatest tiebreak column
  * wins, deterministically.
  */
object AsOfJoin {

  /** @param probe     rows to annotate (kept 1:1 in the output)
    * @param build     rows providing the as-of value
    * @param keyCols   equality key shared by both sides
    * @param tsCol     event-time column name (present on both sides)
    * @param buildTiebreak build-side column breaking equal-ts ties
    *                  (greatest wins); must be present on build
    * @param valueCols build-side columns to carry onto probe rows */
  def asOf(probe: DataFrame, build: DataFrame, keyCols: Seq[String],
      tsCol: String, buildTiebreak: String,
      valueCols: Seq[String]): DataFrame = {
    val probeCols = probe.columns.toSeq
    // Internal working columns and the asof_<col> outputs would
    // silently shadow (or fail analysis on) same-named caller
    // columns — reject them up front with a clear diagnostic.
    val reserved = Set("__side", "__tie", "__vs", "__asof")
    val clashes = (probe.columns ++ build.columns).filter(reserved)
    require(clashes.isEmpty,
      s"column name(s) ${clashes.distinct.mkString(", ")} are reserved by AsOfJoin")
    val outClashes = valueCols.map(c => s"asof_$c").filter(probeCols.contains)
    require(outClashes.isEmpty,
      s"probe already has output column(s) ${outClashes.mkString(", ")}; " +
        "rename them or the value columns")
    // side tag 0 = build, 1 = probe: with ascending (ts, side, tie)
    // ordering, an equal-ts build row sorts before its probe and is
    // therefore visible to it.
    // The build values travel as ONE struct, not per-column: a
    // per-column last(ignoreNulls) would stitch fields from
    // DIFFERENT build rows whenever a build value column holds a
    // null (and make "no prior build" indistinguishable from "prior
    // build value was null") — the struct is non-null exactly when a
    // build row exists, so row identity is preserved.
    val taggedBuild = build.select(
      keyCols.map(col) ++ Seq(col(tsCol), lit(0).as("__side"),
        col(buildTiebreak).as("__tie"),
        struct(valueCols.map(col): _*).as("__vs")): _*)
    val taggedProbe = probe.select(
      keyCols.map(col) ++ Seq(col(tsCol), lit(1).as("__side"),
        lit(null).cast(taggedBuild.schema("__tie").dataType).as("__tie"),
        lit(null).cast(taggedBuild.schema("__vs").dataType).as("__vs")) ++
        probeCols.filterNot(keyCols.contains).filterNot(_ == tsCol)
          .map(col): _*)
    val unioned = taggedProbe.unionByName(taggedBuild, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("__asof", last(col("__vs"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(probeCols.map(col) ++
        valueCols.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
  }
}
