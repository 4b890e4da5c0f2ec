package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-independence of the whole battery: every query must return
  * bit-identical rows when the shuffle partition count and AQE mode
  * change. Partitioning changes aggregation/merge ORDER, so this is
  * the test that catches unstable float accumulation, missing total
  * ORDER BYs, and tie-dependent rankings — exactly the failures that
  * appear only when a job moves from local[32] to a 1000-executor
  * cluster.
  */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("every battery query is deterministic across partition counts and AQE modes") {
    val configs = Seq(("4", "true"), ("13", "false"))
    val restoreParts = spark.conf.get("spark.sql.shuffle.partitions")
    val restoreAqe = spark.conf.get("spark.sql.adaptive.enabled")
    def runAll(): Map[String, String] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val rows = fn(spark, sf).collect().map(_.toString).mkString("\n")
        name -> java.util.Base64.getEncoder.encodeToString(
          java.security.MessageDigest.getInstance("MD5")
            .digest(rows.getBytes("UTF-8")))
      }.toMap
    try {
      val results = configs.map { case (parts, aqe) =>
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        runAll()
      }
      val base = results.head
      results.tail.foreach { other =>
        val diff = base.keys.filter(k => base(k) != other(k))
        assert(diff.isEmpty,
          s"plan-dependent results (partitioning/AQE changed the rows): " +
            diff.toSeq.sorted.mkString(", "))
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", restoreParts)
      spark.conf.set("spark.sql.adaptive.enabled", restoreAqe)
    }
  }
}
