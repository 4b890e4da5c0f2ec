package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.{ComposedPipeline, SilverCompaction}

/** Price the silver-compaction protocol at replica scale (VERDICT r18
  * next #1: "a probe row pricing the rewrite at 10×"). The silver
  * handoff accumulates one parquet partition per micro-batch; this
  * probe builds a 10×-documents silver as 24 curate micro-batches plus
  * one takedown batch, lets Q2 commit it, and measures:
  *
  *   1. `read_all_small`    — an aggregate over the 25-partition
  *                            small-files silver (the read tax the
  *                            compaction exists to remove);
  *   2. `compact_wall`      — the [[SilverCompaction.compact]] run
  *                            itself (plan parse + one-shuffle rewrite
  *                            + parity counts + stats sidecar +
  *                            deletes) with files before/after;
  *   3. `read_all_after`    — the same aggregate over live ∪
  *                            compacted (few files);
  *   4. `victim_read_full` / `victim_read_pruned` — the compacted-
  *                            region read a takedown victim scan does,
  *                            whole-region vs `_stats`-file-pruned for
  *                            a 100-id request (the stretch-#6
  *                            mechanism, isolated; at THIS scale the
  *                            shipped advisor routes takedownBatch to
  *                            the plain join — silver is only a few MB
  *                            — so the pruning delta is measured on
  *                            the mechanism directly);
  *   5. `seed_state_wall`   — aggregating the compacted region into
  *                            the per-source rebuild seed;
  *   6. `advise`            — [[SilverCompaction.adviseSilver]] read
  *                            before the first compact (expect
  *                            compact) and after (expect carry);
  *   7. `recompact_runs`    — a second batch wave + second [[
  *                            SilverCompaction.compact]] cycle leaves
  *                            TWO `run=` partitions, then
  *                            [[SilverCompaction.recompactRuns]]
  *                            merges them (the region's own lifecycle)
  *                            with the merge wall and file counts.
  *
  * Walls inherit the session's box state; the load-bearing quantities
  * are the DELTAS between legs within one run (the standing probe
  * convention).
  *
  * Usage: runMain graft.examples.SilverCompactionProbe [sfDir] [out]
  * Artifact: bench/silver_compaction_r19.jsonl (legs 1–5, banked);
  * bench/silver_compaction_r19b.jsonl (this version, legs 1–7)
  */
object SilverCompactionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/tmp/sf10")
    val outPath = args.lift(1)
      .getOrElse("/root/repo/bench/silver_compaction_r19b.jsonl")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = scala.collection.mutable.Buffer.empty[String]
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    val work = "/root/repo/tmp/scp_work"
    fs.delete(new org.apache.hadoop.fs.Path(work), true)
    val silver = s"$work/silver"
    val cp2 = s"$work/cp2"
    val gold = s"$work/gold"

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    val (freq0, scal0) = graft.operators.TextQueries.trainUnigramLm(docs)
    val freq = freq0.localCheckpoint()
    val scal = scal0.localCheckpoint()

    def timeMin2(f: () => Unit): Double = {
      def once(): Double = {
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }

    // ---- 200 curate micro-batches + 1 takedown batch, Q2-committed:
    // enough per-trigger partitions that the live table is genuinely
    // in the small-files regime the compaction exists for.
    // Slice by doc_id residue, not range: the replica's ids are sparse
    // over [0, ~1e9], so range slices would leave most batches empty.
    val nBatches = 200L
    for (b <- 0L until nBatches)
      ComposedPipeline.curateBatch(
        docs.filter(pmod(col("doc_id"), lit(nBatches)) === b),
        b, silver, freq, scal)
    ComposedPipeline.takedownBatch(
      spark.range(0L, 2000L).select(col("id").as("doc_id")), 0L, silver)
    val q2 = ComposedPipeline.startCounts(spark, silver, gold, cp2)
    try q2.processAllAvailable() finally q2.stop()

    def aggAll(df: org.apache.spark.sql.DataFrame): Unit = {
      df.withColumn("delta", coalesce(col("delta"), lit(1L)))
        .groupBy("source").agg(sum("delta")).collect(); ()
    }
    val readSmall = timeMin2(() => aggAll(
      spark.read.schema(ComposedPipeline.SilverSchema).parquet(silver)))
    out += f"""{"probe":"silver_compaction","leg":"read_all_small","n_docs":$nDocs,"n_batches":${nBatches + 1},"sec":$readSmall%.3f,"sf":"$sfDir"}"""
    println(out.last)

    // ---- advisor readout on the small-files table (leg 6): ~200
    // committed skinny files collapse to 1 at the production target
    val adv1 = SilverCompaction.adviseSilver(spark, silver, cp2)
    out += s"""{"probe":"silver_compaction","leg":"advise","when":"small_files","compact":${adv1.compact},"files":${adv1.compactableFiles},"files_after":${adv1.filesAfter}}"""
    println(out.last)

    // ---- the compaction run (single-shot wall: the op is one-time
    // maintenance, not a steady-state path)
    // 64 KiB target (not the 128 MiB production default): this silver
    // is ~500 k skinny metadata rows, and the victim_read pruning leg
    // needs a multi-file compacted run to have anything to prune —
    // the scale-relevant readout there is files_selected/files_total
    // (each skipped file is real I/O once files are 128 MiB)
    val t0 = System.nanoTime()
    val stats = SilverCompaction.compact(spark, silver, cp2,
      targetFileBytes = 64L << 10).get
    val compactWall = (System.nanoTime() - t0) / 1e9
    out += f"""{"probe":"silver_compaction","leg":"compact_wall","sec":$compactWall%.3f,"batches":${stats.batches},"rows":${stats.rows},"files_before":${stats.filesBefore},"files_after":${stats.filesAfter},"bytes":${stats.bytes}}"""
    println(out.last)

    val compacted = ComposedPipeline.compactedSilverDir(silver)
    def unionAll(): org.apache.spark.sql.DataFrame = {
      val live = spark.read.schema(ComposedPipeline.SilverSchema).parquet(silver)
      SilverCompaction.readCompactedForIds(spark, compacted, None)
        .map(live.unionByName(_)).getOrElse(live)
    }
    val readAfter = timeMin2(() => aggAll(unionAll()))
    out += f"""{"probe":"silver_compaction","leg":"read_all_after","sec":$readAfter%.3f,"small_files_tax_sec":${readSmall - readAfter}%.3f}"""
    println(out.last)

    // ---- victim-scan mechanism: whole compacted region vs pruned.
    // Request ids that EXIST, clustered in one narrow doc_id band so
    // the span pruning has something to prune to.
    val reqIds = docs.select(col("doc_id"))
      .filter(col("doc_id") >= 500000000L)
      .orderBy(col("doc_id")).limit(100)
      .collect().map(_.getLong(0)).sorted
    val full = timeMin2(() =>
      SilverCompaction.readCompactedForIds(spark, compacted, None)
        .foreach(_.filter(col("doc_id").isin(reqIds: _*)).count()))
    val pruned = timeMin2(() =>
      SilverCompaction.readCompactedForIds(spark, compacted, Some(reqIds))
        .foreach(_.filter(col("doc_id").isin(reqIds: _*)).count()))
    val nSel = SilverCompaction.selectFilesForIds(spark, compacted, reqIds)
      .map(_.size).getOrElse(-1)
    out += f"""{"probe":"silver_compaction","leg":"victim_read","full_sec":$full%.3f,"pruned_sec":$pruned%.3f,"files_selected":$nSel,"files_total":${stats.filesAfter}}"""
    println(out.last)

    // ---- rebuild seed aggregation
    val seedWall = timeMin2(() =>
      SilverCompaction.seedState(spark, compacted).foreach(_.collect()))
    out += f"""{"probe":"silver_compaction","leg":"seed_state_wall","sec":$seedWall%.3f}"""
    println(out.last)

    // ---- advisor after the rewrite: nothing compactable → carry
    val advAfter = SilverCompaction.adviseSilver(spark, silver, cp2)
    out += s"""{"probe":"silver_compaction","leg":"advise","when":"compacted","compact":${advAfter.compact},"files":${advAfter.compactableFiles},"files_after":${advAfter.filesAfter}}"""
    println(out.last)

    // ---- the region's OWN lifecycle (leg 7): a second batch wave +
    // second compact cycle leaves TWO run= partitions; recompactRuns
    // merges the region back to one. Q2 resumes its existing
    // checkpoint across the first compaction — the protocol's
    // committed-only rule at work, not a test fixture convenience.
    val nMore = 50L
    for (b <- nBatches until (nBatches + nMore))
      ComposedPipeline.curateBatch(
        docs.filter(pmod(col("doc_id"), lit(nBatches)) === (b % nBatches)),
        b, silver, freq, scal)
    val q2b = ComposedPipeline.startCounts(spark, silver, gold, cp2)
    try q2b.processAllAvailable() finally q2b.stop()
    val adv2 = SilverCompaction.adviseSilver(spark, silver, cp2)
    out += s"""{"probe":"silver_compaction","leg":"advise","when":"second_wave","compact":${adv2.compact},"files":${adv2.compactableFiles},"files_after":${adv2.filesAfter}}"""
    println(out.last)
    val stats2 = SilverCompaction.compact(spark, silver, cp2,
      targetFileBytes = 64L << 10).get
    val t1 = System.nanoTime()
    val merged = SilverCompaction.recompactRuns(spark, compacted,
      targetFileBytes = 64L << 10).get
    val mergeWall = (System.nanoTime() - t1) / 1e9
    out += f"""{"probe":"silver_compaction","leg":"recompact_runs","sec":$mergeWall%.3f,"runs_merged":${merged.batches},"rows":${merged.rows},"files_before":${merged.filesBefore},"files_after":${merged.filesAfter},"second_run_files":${stats2.filesAfter}}"""
    println(out.last)

    fs.delete(new org.apache.hadoop.fs.Path(work), true)
    val txt = out.mkString("\n") + "\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      txt.getBytes("UTF-8"))
    print(txt)
    spark.stop()
  }
}
