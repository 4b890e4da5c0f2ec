package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ScaleOps
import graft.plans.ZOrderKeyExpr

/** Morton (Z-order) key: bit-exactness of the mask-cascade interleave
  * and the write-layout guarantees of [[ScaleOps.zorderSorted]]. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Naive reference: place bit i of a at 2i, bit i of b at 2i+1. */
  private def slowInterleave(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 31) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("interleave matches the bit-by-bit reference on random inputs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val a = rnd.nextLong() & 0x7fffffffL
      val b = rnd.nextLong() & 0x7fffffffL
      assert(ZOrderKeyExpr.interleave(a, b) == slowInterleave(a, b), s"($a, $b)")
    }
    // masking: bits above 31 are ignored, result is never negative
    assert(ZOrderKeyExpr.interleave(-1L, -1L) ==
      slowInterleave(0x7fffffffL, 0x7fffffffL))
    assert(ZOrderKeyExpr.interleave(Long.MinValue, Long.MaxValue) >= 0)
  }

  test("z-order locality: adjacent cells differ in low bits only") {
    // the defining property the layout exploits: a unit step in either
    // dimension changes only z-bits at/below that dimension's position,
    // so nearby (x, y) cells share z-prefixes and land in the same file
    assert(ZOrderKeyExpr.interleave(0, 0) == 0L)
    assert(ZOrderKeyExpr.interleave(1, 0) == 1L)
    assert(ZOrderKeyExpr.interleave(0, 1) == 2L)
    assert(ZOrderKeyExpr.interleave(1, 1) == 3L)
    assert(ZOrderKeyExpr.interleave(2, 2) == 12L)
  }

  test("zorder_key is registered for SQL and equals the Column API") {
    graft.plans.GraftExtensions.register(spark)
    val rows = spark.sql("SELECT zorder_key(5, 9) AS z").collect()
    assert(rows.head.getLong(0) == ZOrderKeyExpr.interleave(5, 9))
  }

  test("zorderSorted yields a globally z-ordered frame with both dims clustered") {
    val df = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val sorted = ScaleOps.zorderSorted(df, "x", "y", partitions = 4)
    assert(sorted.columns.toSeq == Seq("x", "y"), "helper column leaked")
    val zs = sorted.collect()
      .map(r => ZOrderKeyExpr.interleave(r.getLong(0), r.getLong(1)))
    // range partition + per-partition sort = global total order on z
    assert(zs.zip(zs.tail).forall { case (a, b) => a <= b })
    // the layout claim: per-partition (= per-file) min/max envelopes
    // cover far less (x, y) area than unclustered partitions would —
    // a lexicographic sort on x alone leaves every partition spanning
    // all of y (area ≈ full-domain). Sampled range bounds may straddle
    // a quadrant boundary, so assert on total envelope area, not on
    // each partition.
    val areas = sorted.withColumn("p", spark_partition_id())
      .groupBy("p").agg(
        ((max("x") - min("x")) * (max("y") - min("y"))).as("a"))
      .collect().map(_.getLong(1))
    assert(areas.length == 4, areas.mkString(", "))
    val full = 63L * 63L
    assert(areas.sum < 3 * full, s"no 2-d clustering: ${areas.mkString(", ")}")
  }
}
