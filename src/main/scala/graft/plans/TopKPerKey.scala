package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Per-key top-k as a first-class operator (SURVEY §2.6 extension).
  *
  * The declarative encoding — `row_number() OVER (PARTITION BY key
  * ORDER BY ord) <= k` then filter — forces a FULL sort of every key
  * group before discarding all but k rows. For "keep the best k
  * documents per domain" over 100 TB that sort is the dominant cost.
  * This operator keeps a bounded heap per key: O(n log k) time and
  * O(#keys·k) memory, no sort, one shuffle (the required clustering).
  *
  * This is the (c)-tier extension point justified by semantics Spark's
  * built-ins cannot plan efficiently: logical node → strategy →
  * physical node with a required child distribution, registered via
  * `SparkSessionExtensions` (GraftExtensions) or
  * `spark.experimental.extraStrategies`.
  */
case class TopKPerKeyPlan(
    groupingKeys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyPlan =
    copy(child = c)
}

case class TopKPerKeyExec(
    groupingKeys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // EnsureRequirements inserts the (single) hash shuffle on the keys
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupingKeys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = groupingKeys
    val sortExprs = ordering
    val kk = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // total order for the ranking; max-heap keeps the current worst
      // of the kept set at the head for O(log k) eviction
      val ord: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.codegen
          .GenerateOrdering.generate(sortExprs, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1, ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.add(row.copy())
        else if (ord.lt(row, heap.peek())) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      val it = heaps.values().iterator()
      while (it.hasNext) {
        val kept = it.next().toArray(Array.empty[InternalRow]).sorted(ord)
        out ++= kept
      }
      out.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

/** Plans [[TopKPerKeyPlan]] → [[TopKPerKeyExec]]. */
object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, ordering, k, child) =>
      TopKPerKeyExec(keys, ordering, k, planLater(child)) :: Nil
    case _ => Nil
  }
}
