package graft.examples

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: print every Join line of the executed physical
  * plan for the named battery queries — the quick check that a row's
  * join strategy matches its scale contract (broadcast direction,
  * no accidental SortMergeJoin where one side is small by contract,
  * BNLJ only on whitelisted audit legs; PlanAssertSpec sweeps the
  * hard invariants, this prints the full picture for a human).
  *
  * Usage: runMain graft.examples.ExplainProbe <sfDir> <query> [...]
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // AQE off (ADVICE r13): executedPlan.toString on an un-executed
      // query prints the INITIAL AdaptiveSparkPlan (isFinalPlan=false),
      // whose join lines can differ from the runtime strategy this
      // probe exists to audit — match PlanAssertSpec's static-plan view
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.tail) {
      val p = graft.SparkEntry.queries(q)(spark, args(0))
        .queryExecution.executedPlan.toString
      println(s"== $q ==")
      println(p.linesIterator.filter(_.contains("Join")).mkString("\n"))
    }
    spark.stop()
  }
}
