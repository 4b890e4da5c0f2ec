package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.winnowSetFast
import graft.operators.Q

/** Stage timing for q_contamination_span (temporary diagnostic). */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val docs = Q.spread(spark, spark.read.parquet(s"$sfDir/documents.parquet"))
      .select(col("doc_id"), winnowSetFast(col("text")).as("ws"))
    time("winnow all docs (count)")(docs.count())
    time("winnow all docs again")(docs.count())
    val exploded = docs.select(col("doc_id"), explode(col("ws")).as("wfp"))
    time("explode fps (count)")(exploded.count())
    val bench = docs.filter(col("doc_id") < 20)
      .select(explode(col("ws")).as("wfp")).distinct()
    time("bench distinct fps")(bench.count())
    val q = graft.SparkEntry.queries("q_contamination_span")
    time("full query noop")(q(spark, sfDir).write.format("noop").mode("overwrite").save())
    time("full query noop 2nd")(q(spark, sfDir).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
