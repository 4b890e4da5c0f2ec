package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for dense-vector math over `ArrayType`
  * embedding columns (SURVEY §2.9 X2 — the ANN / embedding-dedup hot
  * path).
  *
  * The declarative formulation in [[graft.functions.VectorFunctions]]
  * (`aggregate(zip_with(a, b, *), 0.0, +)`) is correct but routes every
  * row through the interpreted higher-order-function evaluator AND
  * materializes the zipped product array per row — the same shape that
  * cost the MinHash family 26× before it went native (BASELINE.md,
  * "Native expressions vs chained HOFs"). A brute-force scorer touches
  * |queries| × |bucket| pairs, so at corpus scale this per-pair
  * constant IS the job cost.
  *
  * These expressions fuse the element loop into one imperative pass —
  * no intermediate array, no lambda dispatch — and emit a plain method
  * call from `doGenCode`, so the scoring projection stays inside the
  * surrounding whole-stage-codegen span.
  *
  * Value-compatibility contract (bit-identical to the HOF form and to
  * the DuckDB oracle's `list_*` replays):
  *   - each element is widened to double BEFORE any arithmetic
  *     (float→double widening is exact), matching the HOF form's
  *     up-front `cast("array<double>")`;
  *   - accumulation is a sequential left fold in index order — the
  *     same summation order as `aggregate`'s left fold;
  *   - cosine = dot / (sqrt(dot(a,a)) * sqrt(dot(b,b))) with exactly
  *     that association, matching `dot / (norm * norm)`;
  *   - zip_with pads the shorter array with nulls and `null * x` is
  *     null, so the HOF form yields NULL on length mismatch or any
  *     null element — these expressions preserve that.
  */
abstract class VectorFoldExpr extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  // AbstractDataType is private[sql]; the inferred type conforms
  override def inputTypes = Seq(ArrayType, ArrayType)
  // NULL on length mismatch / null element even when inputs are non-null
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = super.checkInputDataTypes()
    if (!ok.isSuccess) return ok
    Seq(left, right).map(_.dataType.asInstanceOf[ArrayType].elementType).find {
      case _: NumericType => false
      case _ => true
    } match {
      case Some(bad) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"${prettyName} requires numeric array elements, got ${bad.catalogString}")
      case None => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }

  // element-type dispatch codes baked once at resolution; @switch in the
  // loop is a tableswitch the JIT hoists
  private def code(dt: DataType): Int = dt.asInstanceOf[ArrayType].elementType match {
    case DoubleType => 0
    case FloatType => 1
    case LongType => 2
    case IntegerType => 3
    case ShortType => 4
    case ByteType => 5
    case d: DecimalType => 6
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }
  // decimal gets a side-specific code so `read` can recover the scale
  @transient protected lazy val lCode: Int =
    code(left.dataType) match { case 6 => 6; case c => c }
  @transient protected lazy val rCode: Int =
    code(right.dataType) match { case 6 => 7; case c => c }
  @transient protected lazy val checkNulls: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  @transient private lazy val lElem =
    left.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val rElem =
    right.dataType.asInstanceOf[ArrayType].elementType

  protected final def read(a: ArrayData, i: Int, c: Int): Double =
    (c: @annotation.switch) match {
      case 0 => a.getDouble(i)
      case 1 => a.getFloat(i).toDouble
      case 2 => a.getLong(i).toDouble
      case 3 => a.getInt(i).toDouble
      case 4 => a.getShort(i).toDouble
      case 5 => a.getByte(i).toDouble
      case 6 => a.get(i, lElem).asInstanceOf[Decimal].toDouble
      case _ => a.get(i, rElem).asInstanceOf[Decimal].toDouble
    }

  /** Boxed so NULL (length mismatch / null element) can flow out of the
    * generated call. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecFoldExpr", this)
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val tmp = ctx.freshName("vecFold")
      s"""
         |java.lang.Double $tmp = $ref.compute($l, $r);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
  }
}

/** `vec_dot(a, b)` → double: Σ aᵢ·bᵢ, sequential left fold. */
case class DotProductExpr(left: Expression, right: Expression)
    extends VectorFoldExpr {
  override def prettyName: String = "vec_dot"

  override def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (a.isNullAt(i) || b.isNullAt(i))) return null
      acc += read(a, i, lCode) * read(b, i, rCode)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : DotProductExpr = copy(left = l, right = r)
}

/** `vec_cosine(a, b)` → double: dot, ‖a‖ and ‖b‖ accumulated in ONE
  * pass over both arrays — a 3× read reduction over even three native
  * dot products, and ~9 HOF evaluations fused when replacing the
  * declarative form. */
case class CosineSimExpr(left: Expression, right: Expression)
    extends VectorFoldExpr {
  override def prettyName: String = "vec_cosine"

  override def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (a.isNullAt(i) || b.isNullAt(i))) return null
      val x = read(a, i, lCode)
      val y = read(b, i, rCode)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : CosineSimExpr = copy(left = l, right = r)
}

/** `vec_l2(a, b)` → double: √Σ (aᵢ−bᵢ)², sequential left fold. */
case class L2DistanceExpr(left: Expression, right: Expression)
    extends VectorFoldExpr {
  override def prettyName: String = "vec_l2"

  override def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (a.isNullAt(i) || b.isNullAt(i))) return null
      val d = read(a, i, lCode) - read(b, i, rCode)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(math.sqrt(acc))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : L2DistanceExpr = copy(left = l, right = r)
}

/** `jl_project(vec, k)` → array<long>: Johnson–Lindenstrauss random
  * projection to k dimensions in ONE pass, over micro-quantized
  * elements so the result is INTEGER-EXACT and oracle-replayable.
  *
  * Each element is widened to double, scaled by 1e6 and floored to a
  * long (exact in both engines); output j accumulates Σᵢ qᵢ·s(j,i)
  * with the Rademacher sign s(j,i) ∈ {+1,−1} drawn from the parity of
  * `md5("j|i")`'s leading-15-hex-digit value — a seedable, engine-
  * replayable sign matrix (the DuckDB oracle regenerates it with the
  * same md5 strings). Because every addend is an integer, the sum is
  * associative — no float-order hazard — and |q| ≤ 1e6·d·k bounds the
  * accumulator far below 2^63 for any realistic (d, k).
  *
  * Scale shape: a map-only per-row projection (the relational
  * formulation explodes n·d·k rows through a shuffle; this fuses the
  * whole matrix multiply into one codegen'd call). The sign matrix is
  * built once per (d) per expression instance (k·d md5s, cached in a
  * ConcurrentHashMap — thread-safe under shared codegen references).
  *
  * NULL on null input; a null ELEMENT yields a null result (stricter
  * than SQL sum-skips-null — embeddings are REQUIRED non-null; the
  * gate corpus has none).
  */
case class JlProjectExpr(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  require(k > 0, "jl_project needs k > 0")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(ArrayType)
  override def nullable: Boolean = true
  override def prettyName: String = "jl_project"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = super.checkInputDataTypes()
    if (!ok.isSuccess) return ok
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case _: NumericType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jl_project requires numeric array elements, got ${other.catalogString}")
    }
  }

  @transient private lazy val elemType =
    child.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val checkNulls =
    child.dataType.asInstanceOf[ArrayType].containsNull

  private def readD(a: ArrayData, i: Int): Double = elemType match {
    case DoubleType => a.getDouble(i)
    case FloatType => a.getFloat(i).toDouble
    case LongType => a.getLong(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case ShortType => a.getShort(i).toDouble
    case ByteType => a.getByte(i).toDouble
    case d: DecimalType => a.get(i, d).asInstanceOf[Decimal].toDouble
    case other => throw new IllegalStateException(s"unsupported $other")
  }

  @transient private lazy val signCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Long]]]()

  /** Parity of md5("j|i")'s leading 15 hex digits — the same draw the
    * oracle's `('0x' || substr(md5(...), 1, 15))::BIGINT % 2` makes. */
  private[plans] def signFor(j: Int, i: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$j|$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 0) 1L else -1L
  }

  private def signsFor(d: Int): Array[Array[Long]] =
    signCache.computeIfAbsent(d,
      _ => Array.tabulate(k, d)((j, i) => signFor(j, i)))

  def compute(a: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val d = a.numElements()
    val s = signsFor(d)
    val out = new Array[Long](k)
    var i = 0
    while (i < d) {
      if (checkNulls && a.isNullAt(i)) return null
      val q = math.floor(readD(a, i) * 1000000d).toLong
      var j = 0
      while (j < k) {
        out(j) += q * s(j)(i)
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jlProjectExpr", this)
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("jlOut")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $tmp = $ref.compute($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): JlProjectExpr =
    copy(child = c)
}
