package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.VectorQueries

/** Properties of the per-subspace Lloyd PQ trainer
  * (`VectorQueries.pqTrain`) that the DuckDB oracle replay of
  * `q_ann_pq_trained_recall` cannot express:
  *
  *  - the k-means contraction invariant — each Lloyd iteration never
  *    INCREASES total quantization error (sum over subvectors of the
  *    squared distance to their assigned sub-centroid), because the
  *    assign step is an arg-min and the mean is the SSE-minimizing
  *    representative of each cell;
  *  - codebook shape stability — training never invents, drops, or
  *    re-keys (m, code) entries (emptied codes keep their previous
  *    centroid via the left-join coalesce).
  */
class PqTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val m = 4
  private val subDim = 4

  private def corpus(n: Int, seed: Long): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    // two gaussian-ish clusters per subspace so training has structure
    // to exploit (a pure-uniform cloud can leave the mean ~where the
    // sample sat and the SSE drop near zero)
    (1 to n).map { i =>
      val c = if (rnd.nextBoolean()) 1.0f else -1.0f
      (i.toLong,
        Array.fill(m * subDim)(c + rnd.nextFloat() * 0.5f))
    }.toDF("vec_id", "embedding")
  }

  private def sse(sub: DataFrame, cb: DataFrame): Double =
    sub.join(broadcast(cb), col("m") === col("cb_m"))
      .withColumn("__d", VectorQueries.pqSqd(col("sv"), col("cv")))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(col("__d")).as("d"))
      .agg(sum(col("d"))).head().getDouble(0)

  test("each Lloyd iteration is a contraction: quantization SSE never increases") {
    val sub = VectorQueries.pqSub(corpus(400, seed = 7), "vec_id", m, subDim)
    val cb0 = sub.filter(col("vec_id") <= 8)
      .select(col("m").as("cb_m"), col("vec_id").as("code"), col("sv").as("cv"))
    var prev = sse(sub, cb0)
    var cb = cb0
    for (it <- 1 to 3) {
      cb = VectorQueries.pqTrain(sub, cb, 1)
      val cur = sse(sub, cb)
      assert(cur <= prev + 1e-9,
        s"iteration $it increased SSE: $prev -> $cur")
      prev = cur
    }
    // and on clustered data the first iteration strictly improves
    val afterOne = sse(sub, VectorQueries.pqTrain(sub, cb0, 1))
    assert(afterOne < sse(sub, cb0))
  }

  test("training preserves the (m, code) key set exactly") {
    val sub = VectorQueries.pqSub(corpus(200, seed = 13), "vec_id", m, subDim)
    val cb0 = sub.filter(col("vec_id") <= 6)
      .select(col("m").as("cb_m"), col("vec_id").as("code"), col("sv").as("cv"))
    val keys0 = cb0.select(col("cb_m"), col("code")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val trained = VectorQueries.pqTrain(sub, cb0, 2)
    val keys1 = trained.select(col("cb_m"), col("code")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys1 == keys0)
    // every centroid stays subDim wide
    val widths = trained.select(size(col("cv"))).collect().map(_.getInt(0)).toSet
    assert(widths == Set(subDim))
  }
}
