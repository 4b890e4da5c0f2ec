package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.ScaleOps
import graft.plans.{TopKPerKeyFinalExec, TopKPerKeyPartialExec}

/** Native per-key top-k operator: equal to the window encoding, planned
  * as partial (map-side pruning) + final (streaming group scan). */
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

  private def viaNative(k: Int, maxKeys: Int = graft.plans.TopKPerKey.DefaultMaxKeysInMemory) = {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    ScaleOps.topKPerKey(o, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey")), k, maxKeys)
  }

  test("matches the window-function encoding exactly") {
    for (k <- Seq(1, 3, 7)) {
      val expected = viaWindow(k).orderBy("o_custkey", "o_orderkey").collect()
      val got = viaNative(k).orderBy("o_custkey", "o_orderkey").collect()
      assert(got.length == expected.length, s"k=$k row count")
      got.zip(expected).foreach { case (g, e) => assert(g == e, s"k=$k") }
    }
  }

  test("plan is partial below the exchange, final above it") {
    val plan = viaNative(3).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), plan)
    assert(plan.contains("TopKPerKeyFinal"), plan)
    // partial runs BEFORE the shuffle: the Exchange must sit between
    // final and partial in the tree printout
    val iFinal = plan.indexOf("TopKPerKeyFinal")
    val iExchange = plan.indexOf("Exchange", iFinal)
    val iPartial = plan.indexOf("TopKPerKeyPartial", iFinal)
    assert(iExchange >= 0 && iPartial > iExchange,
      s"expected Final > Exchange > Partial order in:\n$plan")
  }

  test("partial pass prunes the shuffle to at most k rows per key per mapper") {
    // AQE wraps stages in AdaptiveSparkPlanExec, hiding the exec from
    // collectFirst — disable it here to read the partial's metric
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (rows, exec) =
      try {
        val df = viaNative(3)
        val r = df.collect()
        (r, df.queryExecution.executedPlan.collectFirst {
          case p: TopKPerKeyPartialExec => p
        }.get)
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val inputRows = spark.read.parquet(s"$sf/orders.parquet").count()
    val partialOut = exec.metrics("numOutputRows").value
    assert(partialOut < inputRows,
      s"partial shipped $partialOut of $inputRows input rows — no pruning")
    // sf0.001 orders fit in few partitions; kept set must be within
    // k × #keys × #mappers
    val nKeys = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey").distinct().count()
    val nMappers = spark.read.parquet(s"$sf/orders.parquet").rdd.getNumPartitions
    assert(partialOut <= 3L * nKeys * nMappers)
    assert(rows.nonEmpty)
  }

  test("bounded key map: tiny cap still yields exact results (pass-through)") {
    // cap of 2 keys against ~hundreds of customers forces the overflow
    // path on almost every mapper
    val expected = viaWindow(3).orderBy("o_custkey", "o_orderkey").collect()
    val got = viaNative(3, maxKeys = 2).orderBy("o_custkey", "o_orderkey").collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g == e) }
  }

  test("high-cardinality grouping key stays exact and bounded") {
    // every row its own key (o_orderkey): top-1 per key == all rows;
    // the capped partial map cannot hold them all → pass-through must
    // carry the remainder correctly
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val n = o.count()
    val got = ScaleOps.topKPerKey(o, Seq(col("o_orderkey")),
      Seq(col("o_totalprice").desc), 1, maxKeysInMemory = 16).count()
    assert(got == n)
  }

  test("float grouping keys: -0.0 and 0.0 form ONE group") {
    // the execs compare keys by UnsafeRow bytes while the planner's
    // sort orders by value — without normalization -0.0/0.0 sort
    // adjacent but count as two groups, emitting up to 2k rows
    import spark.implicits._
    val df = Seq((-0.0, 1L), (0.0, 2L), (0.0, 3L), (1.5, 4L))
      .toDF("key", "v")
    val got = ScaleOps.topKPerKey(df, Seq(col("key")), Seq(col("v")), 2)
      .select("v").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 4L), got)
  }

  test("non-orderable grouping key types are rejected at construction") {
    import spark.implicits._
    val df = Seq((Map("a" -> 1), 1L)).toDF("m", "v")
    val e = intercept[IllegalArgumentException] {
      ScaleOps.topKPerKey(df, Seq(col("m")), Seq(col("v")), 1)
    }
    assert(e.getMessage.contains("orderable"), e.getMessage)
  }

  test("downstream operations compose (filter + aggregate over top-k)") {
    val n = viaNative(3)
      .filter(col("o_orderstatus") =!= "X")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).collect().head.getLong(0)
    assert(n <= 3)
  }
}
