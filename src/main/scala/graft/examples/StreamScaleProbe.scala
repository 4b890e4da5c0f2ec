package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the composed STREAMING pipeline (VERDICT r11 #4):
  * the batch compositions have 100×/48 g/8 g runs, but
  * [[graft.streaming.ComposedPipeline]] shipped with only an sf0.1
  * parity probe — its scale claims ("state bounded by arrival rate ×
  * delay") were argued, not measured. This probe measures, at a
  * replica scale (10× by default):
  *
  *  1. sustained BACKLOG drain rate: a pre-written backlog of
  *     `nFiles` parquet files drained by the curate query
  *     (ingest → watermarked dedup → scrub → per-batch LM scoring →
  *     idempotent silver append), docs/sec over the whole drain;
  *  2. dedup STATE size vs watermark delay: the same backlog drained
  *     under a short and a long delay — state rows after the drain
  *     come from the query's own StateOperatorProgress, showing
  *     eviction (short delay ⇒ rows ≪ corpus) vs full retention;
  *  3. RESTART recovery: half the backlog drained, both queries
  *     killed, the other half PLUS duplicates of pre-restart docs
  *     dropped while down, queries restarted from their checkpoints —
  *     wall time to first batch (state reload) and to full drain,
  *     with the recovered-state suppression verified by row count.
  *
  * Event times are deterministic (`ets = epoch + doc_id seconds`), so
  * with N docs the event-time span is N seconds and a `delaySec ≪ N`
  * watermark must evict aggressively while `delaySec ≫ N` retains one
  * fingerprint per distinct doc — the two operating points probed.
  *
  * Usage: runMain graft.examples.StreamScaleProbe <docsParquet>
  *   <workDir> [nFiles] [maxFilesPerTrigger]
  * Emits one JSON line per measurement (tee to bench/).
  */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val docsPath = args(0)
    val work = args(1)
    val nFiles = if (args.length > 2) args(2).toInt else 64
    val mft = if (args.length > 3) args(3).toInt else 4
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import java.nio.file.{Files, Paths}

    val docs0 = spark.read.parquet(docsPath)
    val docs = docs0.withColumn("ets",
      timestamp_micros((col("doc_id") % 10000000L + 3600L) * 1000000L))
    val schema = docs.schema
    val nDocs = docs.count()
    val (freq0, scal0) = graft.operators.TextQueries.trainUnigramLm(docs0)
    val lmFreq = freq0.localCheckpoint()
    val lmScal = scal0.localCheckpoint()

    def path(parts: String*): String =
      Paths.get(work, parts: _*).toString
    def jline(kv: (String, Any)*): Unit =
      println(kv.map {
        case (k, v: String) => s""""$k":"$v""""
        case (k, v: Double) => f""""$k":$v%.2f"""
        case (k, v) => s""""$k":$v"""
      }.mkString("{", ",", "}"))

    def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
        .map(_.numRowsTotal).sum
    def stateBytes(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
        .map(_.memoryUsedBytes).sum

    def startCurate(inDir: String, tag: String, delay: String) = {
      val deduped = graft.streaming.StreamingDedup.dedupeByContent(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", mft.toString).parquet(inDir),
        "ets", delay)
      graft.operators.TextQueries.redactInPlace(deduped)
        .writeStream.outputMode("append")
        .option("checkpointLocation", path(tag, "cp1"))
        .foreachBatch { (mb: DataFrame, batchId: Long) =>
          val scored = graft.operators.TextQueries
            .scoreAgainstLm(mb, lmFreq, lmScal)
          mb.select(col("doc_id"), col("source"))
            .join(scored.select(col("doc_id"), col("tier")), Seq("doc_id"))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(path(tag, "silver"))
          ()
        }
        .start()
    }

    // ---- 1+2: full-backlog drain at two watermark delays ------------
    for ((delay, delayTag) <- Seq(
        ("100 seconds", "short"), ("1000 days", "long"))) {
      val tag = s"drain_$delayTag"
      Files.createDirectories(Paths.get(path(tag)))
      docs.repartition(nFiles).write.mode("overwrite")
        .parquet(path(tag, "in"))
      val t0 = System.nanoTime()
      val q = startCurate(path(tag, "in"), tag, delay)
      try q.processAllAvailable() finally q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      val drained = spark.read.parquet(path(tag, "silver")).count()
      jline("probe" -> "backlog_drain", "delay" -> delay,
        "n_docs" -> nDocs, "files" -> nFiles, "max_files_per_trigger" -> mft,
        "sec" -> sec, "docs_per_sec" -> nDocs / sec,
        "silver_rows" -> drained,
        "state_rows" -> stateRows(q), "state_bytes" -> stateBytes(q))
    }

    // ---- 3: kill/restart with backlog queued while down -------------
    {
      val tag = "restart"
      Files.createDirectories(Paths.get(path(tag)))
      val half = docs.filter(col("doc_id") % 2 === 0)
      val rest = docs.filter(col("doc_id") % 2 === 1)
      val dups = docs.filter(col("doc_id") % 20 === 0) // pre-restart dups
      half.repartition(nFiles / 2).write.mode("append").parquet(path(tag, "in"))
      val qa = startCurate(path(tag, "in"), tag, "1000 days")
      try qa.processAllAvailable() finally qa.stop()
      val silverBefore = spark.read.parquet(path(tag, "silver")).count()

      rest.repartition(nFiles / 2).write.mode("append").parquet(path(tag, "in"))
      dups.repartition(2).write.mode("append").parquet(path(tag, "in"))
      val t0 = System.nanoTime()
      val qb = startCurate(path(tag, "in"), tag, "1000 days")
      // time-to-first-batch = checkpoint + state reload cost
      var firstBatchSec = -1.0
      while (firstBatchSec < 0) {
        Thread.sleep(50)
        if (Option(qb.lastProgress).exists(_.numInputRows > 0))
          firstBatchSec = (System.nanoTime() - t0) / 1e9
      }
      try qb.processAllAvailable() finally qb.stop()
      val totalSec = (System.nanoTime() - t0) / 1e9
      val silverAfter = spark.read.parquet(path(tag, "silver")).count()
      val expectedNew = rest.count()
      jline("probe" -> "restart_recovery",
        "queued_rows" -> (rest.count() + dups.count()),
        "first_batch_sec" -> firstBatchSec, "drain_sec" -> totalSec,
        "new_silver_rows" -> (silverAfter - silverBefore),
        "expected_new_rows" -> expectedNew,
        "dups_suppressed_by_recovered_state" ->
          (silverAfter - silverBefore == expectedNew),
        "state_rows" -> stateRows(qb), "state_bytes" -> stateBytes(qb))
    }
    spark.stop()
  }
}
