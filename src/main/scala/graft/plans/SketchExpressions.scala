package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** `cms_estimate(sketch, item)` → long: probe a serialized Count-Min
  * sketch (the binary produced by Spark's `count_min_sketch` aggregate)
  * for an item's estimated frequency — WITHOUT collecting the sketch to
  * the driver.
  *
  * This is the read half of the distributed heavy-hitters pattern: the
  * sketch is built by a mergeable partial/final aggregate (each
  * executor sketches its partitions, the finals merge — counters, not
  * rows, cross the wire), and the 1-row sketch relation is then
  * broadcast and probed per candidate key by this expression. The whole
  * pipeline is expressible as a plan; no driver-side sketch object ever
  * exists.
  *
  * String items are probed as their UTF-8 bytes — exactly the
  * representation `CountMinSketchAgg` adds for string columns — so
  * estimates equal what a driver-side `estimateCount` would return.
  * Deserialization is memoized per sketch byte-array (reference
  * equality): a broadcast sketch deserializes once per task, not once
  * per row.
  */
case class CmsEstimateExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cms_estimate expects (binary sketch, string item), got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: CountMinSketch = _

  def compute(sketchBytes: Array[Byte], item: UTF8String): Long = {
    if (cachedSketch == null || (cachedBytes ne sketchBytes)) {
      cachedSketch = CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(sketchBytes))
      cachedBytes = sketchBytes
    }
    cachedSketch.estimateCount(item.getBytes)
  }

  override protected def nullSafeEval(sketch: Any, item: Any): Any =
    compute(sketch.asInstanceOf[Array[Byte]], item.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsEstimateExpr", this)
    nullSafeCodeGen(ctx, ev, (s, i) => s"${ev.value} = $ref.compute($s, $i);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CmsEstimateExpr = copy(left = l, right = r)
}
