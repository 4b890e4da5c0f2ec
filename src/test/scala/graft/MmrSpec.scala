package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantics spec for q_mmr_diversify: on a planted frame with an
  * exact-duplicate pair of top candidates and one equally-relevant but
  * diverse candidate, MMR must pick the diverse vector at rank 2 and
  * demote the duplicate to rank 3 — the exact inversion a pure
  * relevance top-k would never produce.
  */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mmr demotes an exact duplicate below a diverse equal-relevance pick") {
    // query 8 = [1,0,0]; corpus: 20 and 21 identical [0.8,0.6,0]
    // (rel = cos 0.8, mutual sim 1.0), 22 = [0.8,-0.6,0] (rel 0.8,
    // sim to 20 = 0.64-0.36 = 0.28). Pure relevance ties → id order
    // 20,21,22. MMR λ=0.7: after 20, candidate 21 scores
    // 7·8000-3·10000 = 26000 < 22's 7·8000-3·2800 = 47600.
    val rows = Seq(
      (8L, Seq(1.0f, 0.0f, 0.0f), 0),
      (20L, Seq(0.8f, 0.6f, 0.0f), 0),
      (21L, Seq(0.8f, 0.6f, 0.0f), 0),
      (22L, Seq(0.8f, -0.6f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val tmp = java.nio.file.Files.createTempDirectory("mmrtest").toString
    rows.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = SparkEntry.queries("q_mmr_diversify")(spark, tmp)
      .collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("mmr_scaled")))
      .toList
    assert(got.map(t => (t._1, t._2)) == List((1L, 20L), (2L, 22L), (3L, 21L)))
    // rank-1 score is λ·rel; the duplicate's score carries the full
    // (1−λ)·sim(=1.0) penalty
    val byRank = got.map(t => t._1 -> t._3).toMap
    assert(byRank(1L) == 7 * 7999 || byRank(1L) == 7 * 8000) // cos 0.8 floor
    assert(byRank(3L) < byRank(2L))
  }
}
