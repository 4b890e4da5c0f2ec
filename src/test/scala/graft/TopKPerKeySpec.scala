package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.ScaleOps

/** Native per-key top-k operator: equal to the window encoding, planned
  * without a sort. */
class TopKPerKeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def viaWindow(k: Int) = {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  private def viaNative(k: Int) = {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    ScaleOps.topKPerKey(o, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey")), k)
  }

  test("matches the window-function encoding exactly") {
    for (k <- Seq(1, 3, 7)) {
      val expected = viaWindow(k).orderBy("o_custkey", "o_orderkey").collect()
      val got = viaNative(k).orderBy("o_custkey", "o_orderkey").collect()
      assert(got.length == expected.length, s"k=$k row count")
      got.zip(expected).foreach { case (g, e) => assert(g == e, s"k=$k") }
    }
  }

  test("plan contains the native exec and no sort below it") {
    val plan = viaNative(3).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Sort "), s"unexpected sort in:\n$plan")
  }

  test("downstream operations compose (filter + aggregate over top-k)") {
    val n = viaNative(3)
      .filter(col("o_orderstatus") =!= "X")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).collect().head.getLong(0)
    assert(n <= 3)
  }
}
