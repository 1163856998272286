package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's generic search surface
  * (`models/egraph_v1_search_model.erl:176-205`, README "A Little
  * More Complex Search"): a query is
  *
  *   - `conditions.any`   — OR of typed index probes (exact or
  *                          `[lo, hi]` range);
  *   - `conditions.filters` — AND of JSON-path predicates applied to
  *                          the matched documents;
  *   - `selected_paths`   — JSON-path projection of the output.
  *
  * Re-expressed as a single declarative plan: the OR of probes is
  * one disjunctive filter (Catalyst pushes each disjunct to the
  * scan), filters conjoin, and the projection prunes columns.
  */
object Search {

  sealed trait Cond { def toColumn: Column }

  /** Exact typed-index probe: column = key. */
  final case class Exact(col0: Column, key: Any) extends Cond {
    def toColumn: Column = col0 === lit(key)
  }

  /** Range probe `[lo, hi]` (inclusive), the two-element-array form. */
  final case class Range(col0: Column, lo: Any, hi: Any) extends Cond {
    def toColumn: Column = col0.between(lit(lo), lit(hi))
  }

  /** JSON-path extraction: `jsonPath(col("props"), "k")` ≙ the
    * reference's `index_json_path` / `selected_paths` addressing. */
  def jsonPath(c: Column, path: String*): Column =
    get_json_object(c, "$." + path.mkString("."))

  final case class SearchQuery(
      any: Seq[Cond],
      filters: Seq[Cond] = Nil,
      selectedPaths: Map[String, Column] = Map.empty)

  def run(df: DataFrame, q: SearchQuery): DataFrame = {
    val anyCol = q.any.map(_.toColumn).reduceOption(_ || _).getOrElse(lit(true))
    val filterCol = q.filters.map(_.toColumn).reduceOption(_ && _).getOrElse(lit(true))
    val projected =
      if (q.selectedPaths.isEmpty) df.filter(anyCol && filterCol)
      else df.filter(anyCol && filterCol)
        .select(q.selectedPaths.toSeq.sortBy(_._1)
          .map { case (n, c) => c.as(n) }: _*)
    projected
  }
}
