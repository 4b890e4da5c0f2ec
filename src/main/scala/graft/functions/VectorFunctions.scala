package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ArrayType` embedding columns (SURVEY §2.9
  * X2/X3), built purely from codegen-friendly higher-order built-ins —
  * no UDFs, so whole-stage codegen and column pruning survive.
  *
  * All arithmetic is forced to double (the testdata embeddings are
  * float32) so results are reproducible against any double-precision
  * oracle, and folds run left-to-right giving deterministic sums.
  */
object VectorFunctions {

  /** Cast any numeric array column to array<double>. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Σ aᵢ·bᵢ — sequential left fold, deterministic. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe on zero vectors is the caller's
    * concern (testdata embeddings are non-degenerate). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

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
