package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.ComposedPipeline

/** Scale probe for the composed STREAMING pipeline (VERDICT r11 #4 /
  * r12 #3): the batch compositions have 100×/48 g/8 g runs, but
  * [[graft.streaming.ComposedPipeline]] shipped with only an sf0.1
  * parity probe — its scale claims ("state bounded by arrival rate ×
  * delay") were argued, not measured. Every leg drives the SHIPPED
  * entry points ([[ComposedPipeline.startCurate]] /
  * [[ComposedPipeline.startCounts]]) — no inline re-implementation
  * (VERDICT r12 "What's wrong #3"), so the numbers describe the
  * production pipeline. This probe measures, at a replica scale (10×
  * by default):
  *
  *  1. sustained BACKLOG drain rate: a pre-written backlog of
  *     `nFiles` parquet files drained by the curate query
  *     (ingest → watermarked dedup → scrub → per-batch LM scoring →
  *     idempotent silver append). The backlog is written in EVENT-TIME
  *     order (`repartitionByRange(ets)` + sort within partitions —
  *     ADVICE r12: a round-robin backlog puts the full event-time
  *     range in every file, so the first trigger jumps the watermark
  *     to ~max(ets) and later rows are dropped as late, confounding
  *     the drain rate with late-dropping), approximating the arrival
  *     order a live stream would have. Reports input docs/sec AND
  *     silver rows/sec (survivor throughput).
  *  2. dedup STATE size vs watermark delay: the same backlog drained
  *     under a short and a long delay — state rows after the drain
  *     come from the query's own StateOperatorProgress, showing
  *     eviction (short delay ⇒ rows ≪ corpus) vs full retention;
  *  3. RESTART recovery of BOTH queries: half the backlog drained
  *     through Q1+Q2, both killed, the other half PLUS duplicates of
  *     pre-restart docs dropped while down, both restarted from their
  *     checkpoints — wall time to Q1's first batch (state reload) and
  *     to full drain, recovered-state dup suppression verified
  *     against the DISTINCT-TEXT count (the corpus may carry
  *     intrinsic duplicate texts; ADVICE r12), and Q2's recovered
  *     counter frontier checked monotone against its pre-kill total.
  *
  * Event times are deterministic (`ets = epoch + doc_id seconds`), so
  * with N docs the event-time span is ~N seconds and a `delaySec ≪ N`
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
    // locale-pinned double formatting (ADVICE r12: f"%.2f" is
    // locale-sensitive — a comma-decimal default locale would emit
    // invalid JSON)
    def jline(kv: (String, Any)*): Unit =
      println(kv.map {
        case (k, v: String) => s""""$k":"$v""""
        case (k, v: Double) =>
          s""""$k":${String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))}"""
        case (k, v) => s""""$k":$v"""
      }.mkString("{", ",", "}"))

    def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
        .map(_.numRowsTotal).sum
    def stateBytes(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
        .map(_.memoryUsedBytes).sum

    // event-time-ordered backlog: range-partition on ets so file k
    // holds the k-th slice of event time, then re-stamp file mtimes in
    // path order — FileStreamSource orders discovered files by
    // MODIFICATION TIME, and a parallel parquet write lands all parts
    // within the same few ms, so without the re-stamp arrival order is
    // an mtime-tie coin flip and the ADVICE r12 late-drop confound
    // returns through the back door. With both, arrival approximates
    // the live stream the state-bound argument assumes.
    var mtimeBase = System.currentTimeMillis() - 7200L * 1000
    // stamp only the files THIS call wrote (append mode interleaves
    // job UUIDs in the names, so a name sort across jobs would not be
    // arrival order). Freshness is tracked by an explicit set of
    // already-stamped paths, NOT an mtime cutoff (ADVICE r13): with a
    // cutoff, a run stamping more than ~1800 files walks mtimeBase
    // past now-1h and later calls would re-stamp earlier files,
    // scrambling the event-time arrival order the drain/restart
    // measurements depend on.
    val stamped = scala.collection.mutable.Set.empty[String]
    def writeBacklog(rows: DataFrame, files: Int, dir: String,
                     mode: String): Unit = {
      rows.repartitionByRange(math.max(files, 1), col("ets"))
        .sortWithinPartitions("ets")
        .write.mode(mode).parquet(dir)
      val parts = new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          !stamped.contains(f.getAbsolutePath))
        .sortBy(_.getName)
      parts.foreach { f =>
        f.setLastModified(mtimeBase); mtimeBase += 2000L
        stamped += f.getAbsolutePath
      }
    }

    def startCurate(inDir: String, tag: String, delay: String) =
      ComposedPipeline.startCurate(spark, schema, inDir,
        path(tag, "silver"), path(tag, "cp1"), lmFreq, lmScal,
        delay, maxFilesPerTrigger = mft)

    // ---- 1+2: full-backlog drain at two watermark delays ------------
    for ((delay, delayTag) <- Seq(
        ("100 seconds", "short"), ("1000 days", "long"))) {
      val tag = s"drain_$delayTag"
      Files.createDirectories(Paths.get(path(tag)))
      writeBacklog(docs, nFiles, path(tag, "in"), "overwrite")
      val t0 = System.nanoTime()
      val q = startCurate(path(tag, "in"), tag, delay)
      try q.processAllAvailable() finally q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      val drained = spark.read.parquet(path(tag, "silver")).count()
      jline("probe" -> "backlog_drain", "delay" -> delay,
        "n_docs" -> nDocs, "files" -> nFiles, "max_files_per_trigger" -> mft,
        "sec" -> sec, "docs_per_sec" -> nDocs / sec,
        "silver_rows" -> drained, "silver_rows_per_sec" -> drained / sec,
        "state_rows" -> stateRows(q), "state_bytes" -> stateBytes(q))
    }

    // ---- 3: kill/restart of BOTH queries, backlog queued while down -
    {
      val tag = "restart"
      Files.createDirectories(Paths.get(path(tag)))
      val halfFiles = math.max(nFiles / 2, 1)
      // split on BLOCK parity, not doc_id parity: `source` derives
      // from doc_id mod the source count, so a doc_id%2 split gives
      // each half a DISJOINT source set and the counter-recovery
      // check below could never observe a recovered count advancing
      // (the first probe run hit exactly that — every post-restart
      // source legitimately started from zero)
      val blockPar = pmod(floor(col("doc_id") / 32), lit(2))
      val half = docs.filter(blockPar === 0)
      val rest = docs.filter(blockPar === 1)
      val dups = half.filter(col("doc_id") % 10 === 0) // pre-restart dups
      writeBacklog(half, halfFiles, path(tag, "in"), "append")
      val qa = startCurate(path(tag, "in"), tag, "1000 days")
      try qa.processAllAvailable() finally qa.stop()
      val q2a = ComposedPipeline.startCounts(spark, path(tag, "silver"),
        path(tag, "gold_a"), path(tag, "cp2"))
      try q2a.processAllAvailable() finally q2a.stop()
      val silverBefore = spark.read.parquet(path(tag, "silver")).count()
      // per-source pre-kill frontier (the latest row per source)
      def frontier(goldDir: String): Map[String, Long] = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("batch_id").desc)
        spark.read.parquet(goldDir)
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .select(col("source"), col("n_total")).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      val frontBefore = frontier(path(tag, "gold_a"))

      writeBacklog(rest, halfFiles, path(tag, "in"), "append")
      writeBacklog(dups, 2, path(tag, "in"), "append")
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
      val q2b = ComposedPipeline.startCounts(spark, path(tag, "silver"),
        path(tag, "gold_b"), path(tag, "cp2"))
      try q2b.processAllAvailable() finally q2b.stop()
      val silverAfter = spark.read.parquet(path(tag, "silver")).count()
      // the dedup keys on content fingerprint, so the expected NEW
      // silver rows are the DISTINCT texts of `rest` not already seen
      // in `half` — not rest.count(): the corpus may carry intrinsic
      // duplicate texts (ADVICE r12)
      val expectedNew = rest.select(col("text")).distinct()
        .join(half.select(col("text")).distinct(), Seq("text"), "left_anti")
        .count()
      // Q2's recovered counters must have counted EVERY silver row
      // exactly once across both runs: final frontier per source
      // (gold_b, falling back to gold_a for sources untouched after
      // the restart) == total silver rows per source. A reset state
      // store would leave post-restart totals counting only new rows.
      val frontAfter = frontier(path(tag, "gold_b"))
      val silverPerSource = spark.read.parquet(path(tag, "silver"))
        .groupBy(col("source")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val counterRecovered = silverPerSource.forall { case (src, total) =>
        frontAfter.getOrElse(src, frontBefore.getOrElse(src, 0L)) == total
      }
      jline("probe" -> "restart_recovery",
        "queued_rows" -> (rest.count() + dups.count()),
        "first_batch_sec" -> firstBatchSec, "drain_sec" -> totalSec,
        "new_silver_rows" -> (silverAfter - silverBefore),
        "expected_new_rows" -> expectedNew,
        "dups_suppressed_by_recovered_state" ->
          (silverAfter - silverBefore == expectedNew),
        "gold_sources_before" -> frontBefore.size,
        "gold_total_before_kill" -> frontBefore.values.sum,
        "gold_total_after_restart" ->
          silverPerSource.keys.toSeq.map(s =>
            frontAfter.getOrElse(s, frontBefore.getOrElse(s, 0L))).sum,
        "counter_state_recovered" -> counterRecovered,
        "state_rows" -> stateRows(qb), "state_bytes" -> stateBytes(qb))
    }
    spark.stop()
  }
}
