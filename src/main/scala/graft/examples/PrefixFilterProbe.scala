package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.DedupQueries
import graft.functions.TextFunctions.shingleSetFast

/** Stage-by-stage timing of the prefix-filter join
  * (`sbt "runMain graft.examples.PrefixFilterProbe [sfDir]"`) — which
  * leg of scan→df→prefix→self-join→verify carries the cost.
  */
object PrefixFilterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), shingleSetFast(col("text")).as("s"))
    time("docs count")(docs.count())
    val inv = docs.select(col("doc_id"), explode(col("s")).as("sh"))
    time("inv count")(inv.count())
    val dfTab = inv.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    time("dfTab count")(dfTab.count())
    val ranked = inv.join(dfTab, "sh")
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("df"), col("sh"))).as("ts"),
        count(lit(1)).as("n"))
    time("ranked (collect_list)")(ranked.count())
    val cand = DedupQueries.prefixFilterCandidates(docs, 0.5)
    val nCand = time("candidates")(cand.count())
    println(s"[probe] n_candidates = $nCand")
    val pairs = DedupQueries.prefixFilterPairs(docs, 0.5)
    val nPairs = time("verified pairs")(pairs.count())
    println(s"[probe] n_pairs = $nPairs")
    time("full query 2nd run")(pairs.count())
    // threshold sensitivity: prefix length, candidate volume, and cost
    // all scale with (1 - t) — the knob a user tunes
    for (thr <- Seq(0.3, 0.5, 0.7, 0.9)) {
      val t0 = System.nanoTime()
      val c = DedupQueries.prefixFilterCandidates(docs, thr).count()
      val p = DedupQueries.prefixFilterPairs(docs, thr).count()
      println(f"[probe] thr=$thr%.1f candidates=$c%8d pairs=$p%6d " +
        f"in ${(System.nanoTime() - t0) / 1e9}%5.2f s")
    }
    spark.stop()
  }
}
