package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Skew-robustness probe for the MinHash band join (SURVEY §7 risk:
  * "salting for skew"): against a documents table carrying a hot band
  * bucket (see ScaleUp's `hotDocs` arg — thousands of boilerplate docs
  * whose bands all collide), run the band-candidate self-join with
  * AQE's skew-split disabled and then enabled, recording wall time,
  * max task duration, and task count from a task-end listener.
  *
  * The skew thresholds are scaled to local data volumes (the defaults
  * are tuned for 256 MB cluster partitions, this probe shuffles a few
  * MB) — the point is mechanism evidence: one hot reduce partition vs
  * the same partition split across tasks. The broadcast path is
  * disabled so the join is the shuffle join it would be at corpus
  * scale, where neither side broadcasts.
  *
  * Usage: runMain graft.examples.SkewProbe <dir-with-hot-documents>
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    final case class Probe(wallSec: Double, maxTaskSec: Double, tasks: Int,
                           rows: Long)
    def run(skewSplit: Boolean): Probe = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewSplit)
      // local-scale thresholds: detect a partition as skewed when it
      // exceeds 2x the median AND 32 kB, split toward ~32 kB chunks
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32k")
      val durations = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val listener = new SparkListener {
        override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
          if (te.taskInfo != null) durations.add(te.taskInfo.duration)
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = graft.operators.DedupQueries.bandCandidates(docs).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // listener bus drains asynchronously
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val ds = durations.asScala.toSeq
      Probe(wall, if (ds.isEmpty) 0.0 else ds.max / 1e3, ds.size, n)
    }

    run(skewSplit = false) // warm JIT/codegen so the comparison is fair
    val off = run(skewSplit = false)
    val on = run(skewSplit = true)
    def j(p: Probe) =
      f"""{"wall_sec":${p.wallSec}%.2f,"max_task_sec":${p.maxTaskSec}%.2f,"tasks":${p.tasks},"rows":${p.rows}}"""
    println(s"""{"skew_split_off":${j(off)},"skew_split_on":${j(on)}}""")
    spark.stop()
  }
}
