package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `zorder_key(a, b)` → long: the Morton (Z-order) interleaving of the
  * low 31 bits of two integral columns (SURVEY §2.9 scale utilities).
  *
  * Why an expression and not a helper: the z-value is the write-side
  * clustering key for multi-dimensional data layout. Sorting a table by
  * `zorder_key(x, y)` before writing parquet makes the per-file (and
  * per-page) min/max ranges tight on BOTH x and y simultaneously, so a
  * downstream scan with a predicate on either dimension — or a box
  * predicate on both — skips most files. A lexicographic sort on
  * `(x, y)` only clusters the leading column; at 100 TB that is the
  * difference between pruning on one dimension and pruning on two.
  *
  * Bit layout: bit `i` of `a` lands at z-bit `2i`, bit `i` of `b` at
  * `2i + 1`. Inputs are masked to 31 bits (`& 0x7fffffff`) so the
  * interleaved value fits in bits 0..61 and stays non-negative in
  * engines with signed 64-bit integers — which is also what makes the
  * DuckDB oracle an exact bit-for-bit replay. The spread uses the
  * standard mask-shift cascade (5 shift/mask steps per operand, no
  * loop, no allocation) and `doGenCode` keeps rows inside the
  * surrounding whole-stage-codegen span.
  */
case class ZOrderKeyExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  // no annotation: AbstractDataType is private[sql] in Spark 4, the
  // inferred Seq[LongType.type] conforms
  override def inputTypes = Seq(LongType, LongType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKeyExpr.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.ZOrderKeyExpr.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ZOrderKeyExpr = copy(left = l, right = r)
}

object ZOrderKeyExpr {
  /** Spread the low 32 bits of `v` so bit `i` moves to bit `2i`. */
  private def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton-interleave the low 31 bits of each operand (a → even bits,
    * b → odd bits); result is non-negative. Public + static-shaped so
    * generated code can call it without a reference object. */
  def interleave(a: Long, b: Long): Long =
    spread(a & 0x7fffffffL) | (spread(b & 0x7fffffffL) << 1)
}
