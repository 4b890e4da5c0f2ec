package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ArrayType` embedding columns (SURVEY §2.9
  * X2/X3). The three primitives route through native one-pass Catalyst
  * expressions ([[graft.plans.DotProductExpr]] and friends) — the
  * earlier higher-order-function formulation (`aggregate(zip_with(...))`)
  * was interpreted per element and materialized the zipped array per
  * pair, which on a brute-force scorer is a per-pair constant that
  * dominates at corpus scale (see BASELINE.md "Native expressions vs
  * chained HOFs" for the measured gap on the MinHash family).
  *
  * Value semantics are unchanged and bit-identical: elements widen to
  * double before any arithmetic, folds run left-to-right, and NULL is
  * produced on length mismatch or null elements exactly as
  * `zip_with`'s null-padding did.
  */
object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  import graft.plans.{CosineSimExpr, DotProductExpr, L2DistanceExpr}

  /** Cast any numeric array column to array<double> (the native
    * expressions widen internally; this remains for callers that need
    * a double array value, e.g. quantization stats). */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Σ aᵢ·bᵢ — sequential left fold, deterministic. */
  def dot(a: Column, b: Column): Column =
    column(DotProductExpr(expression(a), expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in ONE fused pass over both arrays (dot and the
    * two norms share the element reads); null-safe on zero vectors is
    * the caller's concern (testdata embeddings are non-degenerate). */
  def cosine(a: Column, b: Column): Column =
    column(CosineSimExpr(expression(a), expression(b)))

  def l2Distance(a: Column, b: Column): Column =
    column(L2DistanceExpr(expression(a), expression(b)))

  /** Johnson–Lindenstrauss random projection to k dims, native
    * one-pass and integer-exact over micro-quantized elements (see
    * [[graft.plans.JlProjectExpr]]): the standard dimensionality
    * reduction before ANN/clustering when d is large — distances are
    * preserved within (1 ± ε) for k = O(log n / ε²). */
  def jlProject(v: Column, k: Int): Column =
    column(graft.plans.JlProjectExpr(expression(v), k))

  /** Random-hyperplane LSH bucket (SimHash for vectors): the sign bit
    * of the dot product against each fixed hyperplane, concatenated to
    * a bucket key. Two vectors with high cosine land in the same bucket
    * with probability 1 − θ/π per bit. At 100 TB this turns the O(n²)
    * similarity join into an equi-join on `bucket` — a plain shuffle
    * hash join on a low-cardinality key.
    */
  def hyperplaneBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    concat(planes.map { p =>
      val planeCol = typedLit(p)
      when(dot(v, planeCol) >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** Deterministic pseudo-random hyperplanes (fixed seed — the same
    * literals are embedded in the DuckDB oracle SQL). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    // 4-decimal literals keep the generated SQL compact and make the
    // Spark and DuckDB sides byte-identical.
    Seq.fill(nPlanes)(Seq.fill(dim)(
      math.rint((rnd.nextGaussian()) * 1e4) / 1e4))
  }
}
