package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.PlanBridge

/** Per-key top-k as a first-class operator: the
  * `row_number().over(partitionBy(key).orderBy(...)) <= k` pattern
  * without materializing or sorting whole partitions — each task
  * keeps a bounded heap per key, so memory is O(keys·k) and the
  * only shuffle is the clustering on the key.
  *
  * Relation to stock Spark: since 3.5 `InferWindowGroupLimit`
  * rewrites the same filtered-rank idiom into partial/final
  * `WindowGroupLimitExec` — but that form still SORTS every
  * partition on both sides of the exchange (rank semantics via
  * sorted scan). This operator is the sort-free variant: heap
  * selection only, no ordering of survivors. We deliberately do NOT
  * install an optimizer rule to auto-rewrite user windows (the
  * built-in rule already bounds the rows; duplicating it would
  * fight the stock optimizer) — callers opt in via [[TopK.perKey]]
  * when they don't need the rank column.
  *
  * Full custom-operator stack: logical node → planner strategy →
  * physical node, installed per-session via
  * `spark.experimental.extraStrategies` (or
  * `SparkSessionExtensions.injectPlannerStrategy` through
  * [[GraftExtensions]] at builder time).
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(keys.nonEmpty && k > 0)
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  /** All rows of a key must be co-located; Spark inserts the single
    * required Exchange (or elides it when the child is already
    * clustered, e.g. bucketed input). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keys, childOutput)
      val ordering = GenerateOrdering.generate(order, childOutput)
      // head of each heap = worst retained row for that key
      val groups = mutable.LinkedHashMap.empty[UnsafeRow,
        mutable.PriorityQueue[InternalRow]]
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        groups.get(key) match {
          case Some(pq) =>
            if (pq.size < k) pq.enqueue(row.copy())
            else if (ordering.compare(row, pq.head) < 0) {
              pq.dequeue(); pq.enqueue(row.copy())
            }
          case None =>
            val pq = mutable.PriorityQueue.empty[InternalRow](ordering)
            pq.enqueue(row.copy())
            groups.put(key.copy(), pq)
        }
      }
      groups.iterator.flatMap { case (_, pq) => pq.dequeueAll.reverseIterator }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Builder-time registration:
  * `SparkSession.builder().withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    e.injectPlannerStrategy(_ => TopKStrategy)
}

object TopK {

  private def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  /** Top `k` rows per `keyCols` group, ordered by `orderCols`
    * (each (column, ascending?)). */
  def perKey(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureStrategy(spark)
    val plan = PlanBridge.logicalPlan(df)
    // fail loudly on missing or ambiguous names — a toMap would let
    // duplicate column names silently resolve to the last attribute
    val byName = plan.output.groupBy(_.name)
    def attr(c: String) = byName.getOrElse(c,
      throw new IllegalArgumentException(
        s"TopK.perKey: column '$c' not found in ${plan.output.map(_.name)}")) match {
      case Seq(a) => a
      case many => throw new IllegalArgumentException(
        s"TopK.perKey: column '$c' is ambiguous (${many.size} attributes)")
    }
    val keys = keyCols.map(attr)
    val order = orderCols.map { case (c, asc) =>
      SortOrder(attr(c), if (asc) Ascending else Descending)
    }
    PlanBridge.ofRows(spark, TopKPerKey(keys, order, k, plan))
  }
}
