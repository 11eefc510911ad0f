package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.classic.ClassicConversions._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.DatasetBridge

/** Whole-operator Catalyst extension (SURVEY.md §2.4-J row c): top-k
  * rows per group as a first-class plan node instead of the
  * window-row_number-filter idiom.
  *
  * Why a custom operator: the window idiom SORTS every group fully
  * (O(n log n) per group, full materialization) and only then drops
  * rows. This operator keeps a bounded k-heap per group and — the
  * actual scale win — runs a PARTIAL top-k before the shuffle, the
  * top-k analogue of map-side combine: each input partition ships at
  * most k rows per locally-seen group, so the shuffle payload for a
  * hot group is k × #mappers, not the group size.
  *
  * Pipeline: logical [[TopKPerGroup]] → [[TopKStrategy]] (injected via
  * `spark.experimental.extraStrategies`) → partial [[TopKExec]] →
  * shuffle (ClusteredDistribution) → final [[TopKExec]].
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKPerGroup {
  /** Sort spec: column name + direction. The order columns must form a
    * total order within a group for deterministic results. */
  case class Ord(name: String, desc: Boolean = false)

  /** Public API: top `k` rows per group of `groupCols`, ranked by
    * `orderCols`. Columns are resolved by name against the input's
    * analyzed output, so the custom node carries only resolved,
    * serializable attribute references. */
  def apply(df: DataFrame, groupCols: Seq[String], orderCols: Seq[Ord], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    }
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute = plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n not in ${plan.output.map(_.name)}"))
    val sortOrder = orderCols.map { o =>
      SortOrder(attr(o.name),
        if (o.desc) org.apache.spark.sql.catalyst.expressions.Descending
        else org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    DatasetBridge.ofRows(spark, new TopKPerGroup(groupCols.map(attr(_)), sortOrder, k, plan))
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(group, order, k, child) =>
      val partial = TopKExec(group, order, k, partial = true, planLater(child))
      TopKExec(group, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class TopKExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Final pass needs all rows of a group co-located; the partial pass
    * runs wherever the data already is. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprsLocal = groupExprs
    val orderingExprs = order
    val childOutput = child.output
    val kLocal = k
    child.execute().mapPartitions({ rows =>
      // projection + codegen'd ordering built per partition — catalyst
      // projections are not thread-safe across tasks
      val gProj = UnsafeProjection.create(groupExprsLocal, childOutput)
      val ordering = GenerateOrdering.generate(orderingExprs, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      // heap keeps the CURRENT top-k; head = worst of the kept rows,
      // so compare against head to decide eviction (reverse ordering)
      val reverse = ordering.reversed()
      rows.foreach { row =>
        val key = gProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) {
          heap.add(row.copy())
        } else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.values().forEach { h =>
        out ++= scala.jdk.CollectionConverters.IteratorHasAsScala(h.iterator()).asScala
      }
      out.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKExec =
    copy(child = newChild)

  override def nodeName: String = if (partial) "TopKPartial" else "TopKFinal"
}
