package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Per-key top-k as a first-class operator (SURVEY §2.6 extension).
  *
  * Spark 4 plans the declarative encoding — `row_number() OVER
  * (PARTITION BY key ORDER BY ord) <= k` then filter — with
  * partial/final `WindowGroupLimit`, which already prunes the shuffle;
  * but each WindowGroupLimit still requires a FULL (key, ord) sort of
  * its input partition (O(n log n) map-side) before walking group
  * prefixes. This operator's partial pass keeps bounded per-key HEAPS
  * instead — no map-side sort at all, O(n log k) — and only the
  * already-pruned data is ever sorted (reduce side, spillable).
  * Measured on 1.5 M orders / 100 k keys, k=3, local[32]: 0.93 s vs
  * 1.18 s warm for the window encoding, with first-run (codegen-cold)
  * gaps larger.
  *
  * Physical shape (mirrors partial/final hash aggregation):
  *
  *   TopKPerKeyExec(final)          — streaming first-k-per-group scan,
  *     Sort [key, ord]                O(k) memory (spill-safe: the sort
  *       Exchange hashpartition(key)  is Spark's external SortExec over
  *         TopKPerKeyExec(partial)    ALREADY-PRUNED data)
  *           child
  *
  * The partial pass keeps a bounded heap per key on the MAP side, so
  * the shuffle carries at most k rows per key per mapper instead of
  * everything — the map-side-combine analogue for top-k. Its hash map
  * is capped at `maxKeysInMemory`: overflow keys pass rows through
  * unchanged (a correct superset, exactly like partial aggregation's
  * pass-through fallback when its hash map fills), so memory is bounded
  * no matter the key cardinality. The final pass needs no hash map at
  * all — it reads the sorted stream and emits the first k of each key
  * group.
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
    child: LogicalPlan,
    maxKeysInMemory: Int = TopKPerKey.DefaultMaxKeysInMemory) extends UnaryNode {
  require(k > 0, "k must be positive")
  // the final pass sorts on the grouping keys, so key types must be
  // orderable (MapType etc. would fail deep in planning otherwise)
  require(groupingKeys.forall(e =>
    org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(e.dataType)),
    s"TopKPerKey grouping keys must be orderable types, got " +
      groupingKeys.map(_.dataType.simpleString).mkString(", "))
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyPlan =
    copy(child = c)
}

object TopKPerKey {
  /** Partial-pass hash-map cap: ~128k keys × k rows held per task. */
  val DefaultMaxKeysInMemory: Int = 1 << 17

  /** Grouping keys normalized for BYTE-equality comparison: the execs
    * group by UnsafeRow equality while SortExec orders by VALUE, so
    * -0.0/0.0 (and NaN bit patterns) would sort adjacent yet compare as
    * two groups — the final pass would emit up to 2k rows for such a
    * key. The optimizer's NormalizeFloatingNumbers rule does this for
    * built-in aggregates/joins but not for custom nodes. */
  private[plans] def normalizedKeys(keys: Seq[Expression]): Seq[Expression] =
    keys.map(org.apache.spark.sql.graftbridge.ColumnBridge.normalizeFloats)
}

/** Map-side partial top-k: bounded per-key heaps, pass-through once the
  * key map is full. Emits an unordered superset containing every final
  * top-k row; never required to be exact — the final pass prunes. */
case class TopKPerKeyPartialExec(
    groupingKeys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    maxKeysInMemory: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = groupingKeys
    val sortExprs = ordering
    val kk = k
    val maxKeys = maxKeysInMemory
    val numOutputRows = longMetric("numOutputRows")
    child.execute().mapPartitions({ iter =>
      val keyProj =
        UnsafeProjection.create(TopKPerKey.normalizedKeys(keyExprs), childOutput)
      // total order for the ranking; max-heap keeps the current worst
      // of the kept set at the head for O(log k) eviction
      val ord: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.codegen
          .GenerateOrdering.generate(sortExprs, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      val passThrough = iter.flatMap { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null && heaps.size() < maxKeys) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1, ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap == null) Iterator.single(row) // map full → correct superset
        else {
          if (heap.size < kk) heap.add(row.copy())
          else if (ord.lt(row, heap.peek())) {
            heap.poll()
            heap.add(row.copy())
          }
          Iterator.empty
        }
      }
      // Iterator.++'s by-name argument defers the heap drain until the
      // input (and therefore the heap fill) is exhausted
      (passThrough ++ {
        import scala.jdk.CollectionConverters._
        heaps.values().asScala.iterator.flatMap(_.iterator().asScala)
      }).map { r => numOutputRows += 1; r }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyPartialExec =
    copy(child = c)
}

/** Final top-k: requires clustering on the keys and a (key, ord) child
  * sort — EnsureRequirements plans the hash Exchange and a spillable
  * external SortExec over the partial-pruned data — then streams the
  * first k rows of each key group in O(k) memory. */
case class TopKPerKeyFinalExec(
    groupingKeys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupingKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    (groupingKeys.map(SortOrder(_, Ascending)) ++ ordering) :: Nil

  // group-preserving filter: clustering and sort order survive
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = groupingKeys
    val kk = k
    val numOutputRows = longMetric("numOutputRows")
    child.execute().mapPartitions({ iter =>
      val keyProj =
        UnsafeProjection.create(TopKPerKey.normalizedKeys(keyExprs), childOutput)
      var currentKey: UnsafeRow = null
      var seen = 0
      iter.filter { row =>
        val key = keyProj(row)
        if (currentKey == null || key != currentKey) {
          currentKey = key.copy()
          seen = 0
        }
        seen += 1
        if (seen <= kk) { numOutputRows += 1; true } else false
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyFinalExec =
    copy(child = c)
}

/** Plans [[TopKPerKeyPlan]] → partial + final execs (EnsureRequirements
  * inserts the Exchange and the pruned-data sort between them). */
object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, ordering, k, child, maxKeys) =>
      TopKPerKeyFinalExec(keys, ordering, k,
        TopKPerKeyPartialExec(keys, ordering, k, maxKeys, planLater(child))) :: Nil
    case _ => Nil
  }
}
