package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Runtime-filter behavior the 100 TB deployment leans on: a selective
  * predicate on the build side of a shuffle join is turned into a bloom
  * filter applied to the probe side BEFORE the shuffle, so the fact
  * table ships only rows that can possibly match. Local thresholds are
  * lowered to exercise the path on test-scale data; at cluster scale
  * the defaults (10 MB creation side / 10 GB application side) trigger
  * on their own.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("selective dim predicate injects a bloom filter on the fact side") {
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val p = spark.read.parquet(s"$sf/part.parquet")
        .filter(col("p_partkey") % 100 === 0)
      val j = li.join(p, col("l_partkey") === col("p_partkey"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter") ||
        optimized.contains("BloomFilter"),
        s"no runtime bloom filter injected:\n$optimized")
      // and the filtered join is still correct
      val expected = li.join(p.hint("broadcast"),
        col("l_partkey") === col("p_partkey")).count()
      assert(j.count() == expected)
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
