package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The streaming COMPOSITION (VERDICT r10 #6): one session chaining
  * ingest → canonical content dedup (`dropDuplicatesWithinWatermark`)
  * → PII scrub → LM perplexity scoring → stateful per-source stage
  * counters, as two checkpointed queries joined by a parquet handoff
  * (bronze → silver → gold — the production shape for chaining a
  * watermarked dedup with a `flatMapGroupsWithState` tier, which
  * Structured Streaming does not allow inside one query plan). Every
  * stage is the SAME member operator the batch battery gates
  * ([[StreamingDedup.dedupeByContent]],
  * [[graft.operators.TextQueries.redactInPlace]],
  * [[graft.operators.TextQueries.scoreAgainstLm]],
  * [[StageCounts.running]]); [[batchComposition]] is the parity
  * oracle — the identical stages composed as one batch plan — and
  * StreamingSpec pins stream == batch across a kill/restart of BOTH
  * queries (r10 proved batch composition; this is the streaming
  * analog).
  *
  * Scale notes: the dedup state is one fingerprint per doc inside the
  * watermark (bounded by arrival rate × delay, not corpus size); the
  * LM is a fixed broadcast asset; the counter state is one row per
  * SOURCE. The handoff parquet is the only materialization, exactly
  * the silver table a lakehouse deployment would keep anyway.
  */
object ComposedPipeline {

  /** Schema of the silver (scored-docs) handoff table. */
  val SilverSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("tier", StringType)))

  /** Q1 — curate: file-source ingest of document batches (must carry
    * an `ets` event-time column) → content dedup within `delay` →
    * in-place scrub → per-micro-batch LM scoring (per-doc independent,
    * so batch boundaries cannot change a score) → silver append.
    * Restartable: the checkpoint tracks source offsets + dedup state;
    * recovered state must keep suppressing duplicates of docs ingested
    * before the restart. */
  def startCurate(spark: SparkSession, inSchema: StructType,
                  inDir: String, silverDir: String, checkpointDir: String,
                  lmFreq: DataFrame, lmScal: DataFrame,
                  delay: String): StreamingQuery = {
    val deduped = StreamingDedup.dedupeByContent(
      spark.readStream.schema(inSchema)
        .option("maxFilesPerTrigger", "1").parquet(inDir),
      "ets", delay)
    graft.operators.TextQueries.redactInPlace(deduped)
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (mb: DataFrame, _: Long) =>
        val scored = graft.operators.TextQueries
          .scoreAgainstLm(mb, lmFreq, lmScal)
        mb.select(col("doc_id"), col("source"))
          .join(scored.select(col("doc_id"), col("tier")), Seq("doc_id"))
          .write.mode("append").parquet(silverDir)
        ()
      }
      .start()
  }

  /** Q2 — frontier: silver file source → stateful per-source running
    * tier counters → gold append (Update mode: latest row per source
    * is its current frontier). The gold SINK may differ across
    * restarts; the checkpoint carries the counter state. */
  def startCounts(spark: SparkSession, silverDir: String,
                  goldDir: String, checkpointDir: String): StreamingQuery = {
    import spark.implicits._
    implicit val s: SparkSession = spark
    StageCounts.running(
        spark.readStream.schema(SilverSchema)
          .option("maxFilesPerTrigger", "1").parquet(silverDir)
          .select(col("source"), col("tier")).as[StageCounts.DocTier])
      .writeStream.outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch {
        (ds: org.apache.spark.sql.Dataset[StageCounts.Counts], _: Long) =>
          ds.write.mode("append").parquet(goldDir); ()
      }
      .start()
  }

  /** The SAME stages composed as one batch plan — the parity oracle:
    * distinct content → scrub → LM score → per-source tier counts.
    * Returns (source, n_total, n_head, n_middle, n_tail). */
  def batchComposition(allInput: DataFrame,
                       lmFreq: DataFrame, lmScal: DataFrame): DataFrame = {
    val deduped = allInput
      .withColumn("fp", md5(col("text")))
      .dropDuplicates("fp").drop("fp")
    val scrubbed = graft.operators.TextQueries.redactInPlace(deduped)
    val scored = graft.operators.TextQueries
      .scoreAgainstLm(scrubbed, lmFreq, lmScal)
    scrubbed.select(col("doc_id"), col("source"))
      .join(scored.select(col("doc_id"), col("tier")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("tier") === "head", 1L).otherwise(0L)).as("n_head"),
        sum(when(col("tier") === "middle", 1L).otherwise(0L)).as("n_middle"),
        sum(when(col("tier") === "tail", 1L).otherwise(0L)).as("n_tail"))
  }
}
