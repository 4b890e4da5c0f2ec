package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful event-time sessionization over a stream (SURVEY §2.8
  * extension; the brief's `flatMapGroupsWithState` custom-state tier).
  *
  * The batch battery already proves gap-based sessionization as a
  * window function (`q_sessionize`); this is the streaming form a
  * 100 TB ingest actually runs: per-user session state held by the
  * state store, sessions closed by EVENT-time timeout (watermark
  * passing last-event + gap), emitted exactly once in append mode.
  * State is O(#open sessions), checkpointed, and recovers across
  * restarts — the properties the batch window encoding cannot give a
  * continuous pipeline.
  */
object StatefulSessions {

  /** One event: user, event-time micros, value. */
  final case class Ev(user_id: Long, ts_us: Long, value: Double)

  /** Open-session state kept per user in the state store. */
  final case class SessionState(
      startUs: Long, lastUs: Long, nEvents: Long, total: Double)

  /** A closed session. */
  final case class ClosedSession(
      user_id: Long, session_start_us: Long, session_end_us: Long,
      n_events: Long, total_value: Double)

  /** Sessionize a (possibly streaming) Dataset[Ev] whose `ets`
    * timestamp column already carries the watermark. `gapMinutes`
    * matches the batch query's 30-minute gap rule: an event within the
    * gap extends the session, beyond it closes the session and opens a
    * new one; the event-time timer closes the last session once the
    * watermark passes lastEvent + gap.
    */
  def sessionize(events: Dataset[Ev], gapMinutes: Int)(
      implicit spark: SparkSession): Dataset[ClosedSession] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastEvent + gap: the open session closed
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(uid, s.startUs, s.lastUs, s.nEvents, s.total))
          } else {
            // micro-batch delivery order is not time order
            val evs = it.toSeq.sortBy(e => (e.ts_us, e.value))
            val closed = Seq.newBuilder[ClosedSession]
            var cur = state.getOption.orNull
            evs.foreach { e =>
              cur match {
                case null =>
                  cur = SessionState(e.ts_us, e.ts_us, 1L, e.value)
                case s if e.ts_us - s.lastUs <= gapUs =>
                  // bounds only WIDEN: an out-of-order event that the
                  // watermark still admits (arriving in a later
                  // micro-batch with ts < lastUs) must not drag lastUs
                  // backwards — that would make the next in-gap event
                  // appear beyond the gap and spuriously split the
                  // session, and would corrupt session_end_us
                  cur = SessionState(math.min(s.startUs, e.ts_us),
                    math.max(s.lastUs, e.ts_us), s.nEvents + 1, s.total + e.value)
                case s =>
                  closed += ClosedSession(uid, s.startUs, s.lastUs, s.nEvents, s.total)
                  cur = SessionState(e.ts_us, e.ts_us, 1L, e.value)
              }
            }
            state.update(cur)
            // fire once the watermark passes session end + gap; the
            // timer must sit strictly beyond the current watermark
            val fireAt = math.max(
              cur.lastUs / 1000L + gapMinutes * 60L * 1000L,
              state.getCurrentWatermarkMs() + 1L)
            state.setTimeoutTimestamp(fireAt)
            closed.result().iterator
          }
      }
  }

  /** Events parquet/stream → watermarked Dataset[Ev]. `ts` is the
    * events-table time column on either testdata generation (nanos
    * Long under `nanosAsLong`, or parquet timestamp[us] read as
    * Timestamp/NTZ) — resolved via the schema-adaptive [[Q.tsUs]]. */
  def toEvents(df: DataFrame, watermarkDelay: String = "1 minute")(
      implicit spark: SparkSession): Dataset[Ev] = {
    import spark.implicits._
    // `ets` stays in the frame (projected out by the typed view) so the
    // EventTimeWatermark node sits upstream of the stateful operator
    df.select(col("user_id"),
        graft.operators.Q.tsUs(df).as("ts_us"),
        timestamp_micros(graft.operators.Q.tsUs(df)).as("ets"),
        col("value"))
      .withWatermark("ets", watermarkDelay)
      .as[Ev]
  }
}
