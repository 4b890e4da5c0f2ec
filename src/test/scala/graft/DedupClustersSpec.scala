package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DedupQueries

/** Convergence contract of the min-label-propagation connected
  * components: a component whose diameter exceeds the round cap must
  * fail loudly — silently returning partially-propagated labels would
  * be wrong cluster ids. */
class DedupClustersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pathGraph(edges: Int) = {
    import spark.implicits._
    (0L until edges.toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
  }

  test("df-capped inverted index bounds a boilerplate shingle's pair blowup") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 100 docs all share one boilerplate shingle (m=100 → 4950 pairs
    // uncapped); docs 2i/2i+1 also share a rare distinguishing shingle
    val boiler = (0L until 100L).map(i => (i, "BOILER"))
    val rare = (0L until 100L).map(i => (i, s"rare${i / 2}"))
    val inv = (boiler ++ rare).toDF("doc_id", "sh")
    val capped = DedupQueries.invertedIndexPairs(inv, dfCap = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // only the 50 rare-shingle pairs survive; the hot shingle
    // contributes nothing — candidate count is bounded by the rare df
    assert(capped.length == 50, s"got ${capped.length} pairs")
    assert(capped.forall { case (a, b, inter) => b == a + 1 && inter == 1 })
    // and without the cap the same index explodes quadratically
    // (every doc pair shares BOILER, so all C(100,2) pairs materialize)
    val uncapped = DedupQueries.invertedIndexPairs(inv, dfCap = 1000).count()
    assert(uncapped == 4950, s"got $uncapped")
  }

  test("a path deeper than the round cap throws instead of mislabeling") {
    // min labels travel one hop per round: a 12-edge path needs 12
    // rounds; cap at 5 must abort
    val e = intercept[IllegalStateException] {
      DedupQueries.connectedComponents(pathGraph(12), maxRounds = 5)
    }
    assert(e.getMessage.contains("converge"), e.getMessage)
  }

  test("split-by-cluster never lets a near-dup cluster straddle splits") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q_split_by_cluster")(
      spark, "/root/testdata/sf0.001")
    val straddling = out.groupBy(col("group_id"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1).count()
    assert(straddling == 0)
    // and it is a real split: all three partitions populated
    assert(out.select(col("split")).distinct().count() == 3)
  }

  test("the same path converges to one cluster with a sufficient cap") {
    val rows = DedupQueries.connectedComponents(pathGraph(12), maxRounds = 20)
      .collect()
    assert(rows.length == 13)
    assert(rows.forall(_.getLong(1) == 0L), rows.mkString(","))
    assert(rows.count(_.getBoolean(2)) == 1) // exactly one canonical doc
    assert(rows.forall(_.getLong(3) == 13L)) // n_members
  }

  test("convergence checks are amortized: ~half the driver actions of per-round checking") {
    val perRound = DedupQueries.connectedComponents(
      pathGraph(12), maxRounds = 30, checkEvery = 1).collect()
    val roundsPerRound = DedupQueries.lastCcRounds
    val checksPerRound = DedupQueries.lastCcChecks
    assert(checksPerRound == roundsPerRound) // every round checked

    val amortized = DedupQueries.connectedComponents(
      pathGraph(12), maxRounds = 30, checkEvery = 2).collect()
    val checksAmortized = DedupQueries.lastCcChecks
    // same labels either way (propagation past the fixpoint is a no-op)
    assert(amortized.map(_.toString).sorted.toSeq ==
      perRound.map(_.toString).sorted.toSeq)
    // and at most one extra round's worth of checks beyond the half
    assert(checksAmortized <= roundsPerRound / 2 + 1,
      s"expected ~${roundsPerRound / 2} checks, got $checksAmortized")
  }
}
