package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming form of the ordered-step conversion funnel
  * (`q_event_funnel`: signup → view → click → purchase, each step
  * strictly after the previous). The batch query recomputes staged
  * per-user minima over the whole history; a continuous pipeline
  * instead holds FOUR timestamps per user in the state store and
  * fills them forward as events arrive — O(1) state per user, no
  * rescans, updated rows emitted per micro-batch.
  *
  * Parity contract (proved in StreamingSpec): when each user's events
  * are delivered in event-time order across micro-batches — the
  * normal shape of log shipping; within a batch the transition sorts,
  * so only CROSS-batch inversions matter — the fill-forward state
  * equals the batch staged-minima exactly: the first qualifying event
  * encountered in time order IS the stage minimum. A deployment whose
  * feed can invert order across batches puts a watermark re-order
  * buffer (sort within `withWatermark` window) in front, the standard
  * mitigation; the state transition itself never moves a filled slot,
  * so replays/duplicates are harmless (idempotent).
  */
object StatefulFunnel {

  /** One event: user, event-time micros, type. */
  final case class Ev(user_id: Long, ts_us: Long, event_type: String)

  /** Per-user funnel frontier; -1 = stage not reached. */
  final case class FunnelState(t1: Long, t2: Long, t3: Long, t4: Long)

  /** Emitted per micro-batch for users whose frontier advanced. */
  final case class FunnelRow(
      user_id: Long, t_signup: Long, t_view: Long, t_click: Long,
      t_purchase: Long, reached: Long)

  private val Steps = Array("signup", "view", "click", "purchase")

  /** Advance the frontier with one event (fills at most one slot; a
    * filled slot never moves — idempotent under replay). */
  private def step(s: FunnelState, e: Ev): FunnelState = e.event_type match {
    case "signup" if s.t1 < 0 => s.copy(t1 = e.ts_us)
    case "view" if s.t1 >= 0 && s.t2 < 0 && e.ts_us > s.t1 => s.copy(t2 = e.ts_us)
    case "click" if s.t2 >= 0 && s.t3 < 0 && e.ts_us > s.t2 => s.copy(t3 = e.ts_us)
    case "purchase" if s.t3 >= 0 && s.t4 < 0 && e.ts_us > s.t3 => s.copy(t4 = e.ts_us)
    case _ => s
  }

  /** Run the funnel over a (streaming) Dataset[Ev]; emits the updated
    * frontier for every user the micro-batch touched (Update mode —
    * the latest row per user is the current funnel position). */
  def funnel(events: Dataset[Ev])(
      implicit spark: SparkSession): Dataset[FunnelRow] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[FunnelState]) =>
          // micro-batch delivery order is not time order: sort the batch
          val evs = it.toSeq.sortBy(e => (e.ts_us, e.event_type))
          var cur = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L, -1L))
          evs.foreach(e => cur = step(cur, e))
          state.update(cur)
          if (cur.t1 < 0) Iterator.empty
          else Iterator.single(FunnelRow(uid, cur.t1, cur.t2, cur.t3, cur.t4,
            1L + Seq(cur.t2, cur.t3, cur.t4).count(_ >= 0)))
      }
  }
}
