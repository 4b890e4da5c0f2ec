package graft.examples

import org.apache.spark.sql.SparkSession

/** Plan inspection + single-query timing harness:
  * `sbt "runMain graft.examples.ExplainRunner <query> [sfDir] [--explain]"`.
  * Prints the formatted physical plan (check: PushedFilters, ReadSchema
  * pruning, WholeStageCodegen spans, broadcast vs sort-merge) and the
  * wall time of a count().
  */
object ExplainRunner {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1 && !args(1).startsWith("--")) args(1)
      else "/root/testdata/sf0.1"
    val doExplain = args.contains("--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    val df = fn(spark, sfDir)
    if (doExplain) df.explain("formatted")
    val t0 = System.nanoTime()
    // noop sink: full materialization, same methodology as Bench
    df.write.format("noop").mode("overwrite").save()
    println(f"[explain-runner] $name in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
