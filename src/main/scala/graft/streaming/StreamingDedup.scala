package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup (SURVEY §2.9 X1, streaming form): the batch
  * battery dedups by content hash with a groupBy (`q_dedup_exact`);
  * a continuous ingest needs the same guarantee without unbounded
  * state. `dropDuplicatesWithinWatermark` keeps one state entry per
  * fingerprint only until the watermark passes it — duplicates are
  * suppressed while they can still arrive (the delay window), state is
  * bounded, and the checkpoint recovers it across restarts.
  *
  * At 100 TB-scale ingest the fingerprint (md5) — not the document —
  * is the state key and shuffle key: 16 bytes per in-flight document.
  */
object StreamingDedup {

  /** Deduplicate a document stream by content fingerprint. `eventTime`
    * must be a timestamp column on `docs`; duplicates arriving within
    * `delay` of the original are dropped, later re-arrivals (state
    * already reclaimed) pass — the standard bounded-state contract.
    */
  def dedupeByContent(docs: DataFrame, eventTime: String,
                      delay: String): DataFrame =
    docs
      .withColumn("fp", md5(col("text")))
      .withWatermark(eventTime, delay)
      .dropDuplicatesWithinWatermark("fp")
}
