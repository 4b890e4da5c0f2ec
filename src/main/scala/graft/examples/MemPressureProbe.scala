package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Constrained-heap spill evidence (VERDICT r7 gap #3: "all scale runs
  * had 48 g heap headroom; no run demonstrates graceful spill").
  *
  * At 100 TB the interesting failure mode is not a wrong answer but an
  * OOM when a shuffle/agg/sort partition no longer fits the executor —
  * the design answer is Spark's spillable operator implementations
  * (UnsafeExternalSorter & friends) plus partition sizing, and the
  * evidence is a run whose task metrics show memory AND disk spill
  * bytes > 0 with zero task failures. This probe runs the
  * shuffle/sort/agg-heaviest battery queries on a replica dir under
  * whatever heap the caller sets (SPARK_DRIVER_MEM, e.g. 3g against a
  * 10× replica whose working set exceeds it), records per-query wall
  * time, spilled bytes (both kinds), peak execution memory, and failed
  * task count from a task-end listener, and prints one JSON line.
  *
  * A graceful run = every query completes, `failed_tasks` is 0, and
  * `disk_spill_mb` is materially > 0 — the engine degraded to disk
  * instead of dying. Pair with a roomy-heap run of the same queries to
  * show the plans are identical and only the spill behavior differs.
  *
  * Usage: SPARK_DRIVER_MEM=3g sbt "runMain graft.examples.MemPressureProbe <sfDir> [q1,q2,...]"
  */
object MemPressureProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).toSeq
      else Seq(
        // widest shuffles + biggest sort/agg hash tables in the battery
        "q_join_equi", "q_agg_pricing_summary",
        "q_window_running_sum", "q_topk", "q_dedup_exact",
        "q_except_all", "q_agg_distinct", "q_sessionize",
        "q_dedup_minhash", "q_tfidf")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val memSpill = new AtomicLong(0L)
    val diskSpill = new AtomicLong(0L)
    val peakExecMem = new AtomicLong(0L)
    val failed = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (!t.taskInfo.successful) failed.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          peakExecMem.updateAndGet(p => math.max(p, m.peakExecutionMemory))
        }
      }
    })
    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    val results = names.map { name =>
      val fn = graft.SparkEntry.queries(name)
      val m0 = memSpill.get(); val d0 = diskSpill.get()
      val t0 = System.nanoTime()
      val outcome =
        try {
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          "ok"
        } catch { case e: Throwable => e.getClass.getSimpleName }
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously — settle before reading
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      val mMb = (memSpill.get() - m0) / (1024 * 1024)
      val dMb = (diskSpill.get() - d0) / (1024 * 1024)
      System.err.println(f"$name%-28s $sec%8.1f s  spill mem ${mMb}%6d MB disk ${dMb}%6d MB  $outcome")
      (name, sec, mMb, dMb, outcome)
    }
    val qj = results.map { case (n, s, m, d, o) =>
      s""""$n":{"sec":${f"$s%.1f"},"mem_spill_mb":$m,"disk_spill_mb":$d,"outcome":"$o"}"""
    }.mkString("{", ",", "}")
    println(
      s"""{"probe":"mem_pressure","heap_mb":$heapMb,"sf":"$dir","failed_tasks":${failed.get()},""" +
        s""""total_mem_spill_mb":${memSpill.get() / (1024 * 1024)},"total_disk_spill_mb":${diskSpill.get() / (1024 * 1024)},""" +
        s""""peak_exec_mem_mb":${peakExecMem.get() / (1024 * 1024)},"queries":$qj}""")
    spark.stop()
  }
}
