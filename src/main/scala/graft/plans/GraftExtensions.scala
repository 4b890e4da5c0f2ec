package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.TextFunctions.minhashCoefs

/** Session extension registering the native expressions as SQL
  * functions, so `spark.sql("SELECT minhash_sig(text) ...")` works
  * alongside the Column API:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * // or on an existing session:
  * GraftExtensions.register(spark)
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectPlannerStrategy(_ => TopKPerKeyStrategy)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.plans", name, usage)

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("shingle_set",
      info("shingle_set", "shingle_set(text[, k]) - distinct word k-shingles"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => ShingleSetExpr(c)
        case Seq(c, k) => ShingleSetExpr(c,
          k.eval().asInstanceOf[Number].intValue())
      }),
    ("minhash_sig",
      info("minhash_sig", "minhash_sig(text[, n]) - MinHash signature (n hashes)"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) => MinHashSigExpr(c, minhashCoefs(8))
        case Seq(c, n) => MinHashSigExpr(c,
          minhashCoefs(n.eval().asInstanceOf[Number].intValue()))
      }),
    ("vec_dot",
      info("vec_dot", "vec_dot(a, b) - dense-vector dot product (double)"),
      { case Seq(a, b) => DotProductExpr(a, b) }),
    ("vec_cosine",
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity, one fused pass"),
      { case Seq(a, b) => CosineSimExpr(a, b) }),
    ("vec_l2",
      info("vec_l2", "vec_l2(a, b) - Euclidean distance"),
      { case Seq(a, b) => L2DistanceExpr(a, b) }),
    ("zorder_key",
      info("zorder_key", "zorder_key(a, b) - Morton interleave of the low 31 bits"),
      { case Seq(a, b) => ZOrderKeyExpr(a, b) }),
    ("cms_estimate",
      info("cms_estimate", "cms_estimate(sketch, item) - probe a count_min_sketch binary"),
      { case Seq(s, i) => CmsEstimateExpr(s, i) }),
    ("canonical_digest",
      info("canonical_digest", "canonical_digest(text) - md5 of ASCII-canonicalized text"),
      { case Seq(c) => CanonicalDigestExpr(c) }),
    ("jl_project",
      info("jl_project", "jl_project(vec, k) - integer-exact JL random projection to k dims"),
      { case Seq(v, k) =>
        JlProjectExpr(v, k.eval().asInstanceOf[Number].intValue()) }))

  /** Install into an already-built session (extensions normally apply
    * only at builder time). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, i, builder) =>
      org.apache.spark.sql.graftbridge.ColumnBridge
        .registerFunction(spark, name, i, builder)
    }
}
