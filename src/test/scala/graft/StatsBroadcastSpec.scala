package graft

import org.scalatest.funsuite.AnyFunSuite

/** Statistics-driven join selection (VERDICT r7 #8): the dim-table
  * broadcast reasoning the README's 100 TB notes describe in prose,
  * pinned as executable evidence. The fixture write is `saveAsTable` +
  * `ANALYZE TABLE ... COMPUTE STATISTICS [FOR ALL COLUMNS]` — exactly
  * what a production deployment runs after each load — and the spec
  * asserts two things:
  *
  *  1. SURVIVAL: the dim-side broadcast the battery relies on
  *     (customer ⋈ nation) is chosen identically with CBO on and off —
  *     catalog size stats and file-size estimates agree on the build
  *     side, so flipping `spark.sql.cbo.enabled` can't regress the
  *     plan.
  *  2. UPGRADE: a selective filter over the fact table is only
  *     broadcastable when column stats exist — without CBO the filter's
  *     size estimate stays the full scan (sort-merge join); with CBO +
  *     ANALYZE FOR ALL COLUMNS the estimated output shrinks below the
  *     threshold and the join flips to broadcast. At 100 TB this is
  *     the difference between shuffling a 100 TB probe side and
  *     shipping a KB-scale build side — the reason the fixture write
  *     runs ANALYZE at all.
  */
class StatsBroadcastSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def withConfs(kv: (String, String)*)(body: => Unit): Unit = {
    val saved = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kv.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private lazy val fixtures: Unit = {
    for (tbl <- Seq("orders", "customer", "nation", "lineitem")) {
      spark.sql(s"DROP TABLE IF EXISTS stats_$tbl")
      spark.read.parquet(s"$sf/$tbl.parquet")
        .write.mode("overwrite").saveAsTable(s"stats_$tbl")
      spark.sql(s"ANALYZE TABLE stats_$tbl COMPUTE STATISTICS")
      spark.sql(s"ANALYZE TABLE stats_$tbl COMPUTE STATISTICS FOR ALL COLUMNS")
    }
  }

  private def dimJoinPlan(): String = {
    import org.apache.spark.sql.functions._
    spark.table("stats_customer")
      .join(spark.table("stats_nation"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
      .queryExecution.executedPlan.toString
  }

  test("dim broadcast survives stats-on vs stats-off") {
    fixtures
    for (cbo <- Seq("true", "false")) {
      withConfs("spark.sql.cbo.enabled" -> cbo,
        "spark.sql.adaptive.enabled" -> "false") {
        val p = dimJoinPlan()
        assert(p.contains("BroadcastHashJoin"), s"cbo=$cbo:\n$p")
        assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
          s"cbo=$cbo:\n$p")
      }
    }
  }

  test("column stats upgrade a selectively-filtered fact join to broadcast") {
    fixtures
    import org.apache.spark.sql.functions._
    // threshold between the CBO post-filter estimate (~1/1000 of the
    // table) and the full-scan estimate the no-CBO path must fall back
    // to — derived from the catalog stats so the spec tracks the data
    val fullBytes = spark.table("stats_orders")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    val threshold = (fullBytes / 4).toLong.max(1L)
    val maxKey = spark.table("stats_orders")
      .agg(max(col("o_orderkey"))).head().getLong(0)
    def joinPlan(): String = {
      // probe side = lineitem (the largest table, always over the
      // threshold); build candidate = the selectively-filtered orders
      val build = spark.table("stats_orders")
        .filter(col("o_orderkey") <= maxKey / 1000)
      spark.table("stats_lineitem")
        .join(build, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .queryExecution.executedPlan.toString
    }
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> threshold.toString,
      "spark.sql.adaptive.enabled" -> "false") {
      withConfs("spark.sql.cbo.enabled" -> "false") {
        val p = joinPlan()
        assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
          s"no-CBO plan should shuffle (size estimate = full scan):\n$p")
      }
      withConfs("spark.sql.cbo.enabled" -> "true") {
        val p = joinPlan()
        assert(p.contains("BroadcastHashJoin"),
          s"CBO + column stats should broadcast the filtered fact side:\n$p")
      }
    }
  }
}
