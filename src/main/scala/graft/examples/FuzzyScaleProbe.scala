package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the blocked fuzzy join: the blocking-key space
  * (prefix alphabet × length bands) is fixed, so block-local pair
  * counts grow quadratically with the corpus — `prefixLen` is the
  * selectivity knob that restores block sizes (each extra prefix char
  * multiplies key cardinality by the alphabet size). Run at the 10×
  * replica with prefixLen 1 vs 2 vs 3 to see the knob working; the
  * recall trade (pairs differing inside the prefix are missed) is the
  * documented blocking compromise.
  *
  * Usage: runMain graft.examples.FuzzyScaleProbe <dir> <prefixLen>
  */
object FuzzyScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val prefixLen = args(1).toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 4)).as("k"))
    def once(): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = graft.operators.ScaleOps.blockedFuzzyJoin(
          docs.select(col("doc_id").as("id_a"), col("k").as("s_a")),
          docs.select(col("doc_id").as("id_b"), col("k").as("s_b")),
          "s_a", "s_b", maxDist = 4, prefixLen = prefixLen)
        .filter(col("id_a") < col("id_b")).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    once()
    val (sec, matches) = once()
    println(f"""{"dir":"$dir","prefixLen":$prefixLen,""" +
      f""""matches":$matches,"sec":$sec%.2f}""")
    spark.stop()
  }
}
