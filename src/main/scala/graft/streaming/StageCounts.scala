package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-source running stage counters — the stateful TAIL of the
  * composed streaming curation pipeline (VERDICT r10 #6): after
  * ingest → canonical dedup → scrub → LM scoring have produced a
  * (source, tier) stream, this stage maintains each source's corpus
  * "funnel" — how many docs arrived and how many landed in each
  * perplexity tier — as monotone counters in the state store, emitting
  * the updated frontier per micro-batch (Update mode). Counters only
  * grow and grow by exactly the rows delivered, so a checkpoint
  * restart must hand back every source's counts intact for parity
  * with the batch composition to hold — which is exactly what the
  * composed-parity StreamingSpec asserts across a kill/restart.
  */
object StageCounts {

  /** One scored doc: its source and perplexity tier. */
  final case class DocTier(source: String, tier: String)

  /** A source's running frontier; emitted per touched source per
    * micro-batch — the latest row per source is its current state. */
  final case class Counts(source: String, n_total: Long, n_head: Long,
                          n_middle: Long, n_tail: Long)

  /** Fold one micro-batch's rows into the running counters. */
  private def fold(s: Counts, rows: Iterator[DocTier]): Counts =
    rows.foldLeft(s) { (c, r) =>
      c.copy(
        n_total = c.n_total + 1,
        n_head = c.n_head + (if (r.tier == "head") 1 else 0),
        n_middle = c.n_middle + (if (r.tier == "middle") 1 else 0),
        n_tail = c.n_tail + (if (r.tier == "tail") 1 else 0))
    }

  /** Run the running counters over a (streaming) Dataset[DocTier]. */
  def running(docs: Dataset[DocTier])(
      implicit spark: SparkSession): Dataset[Counts] = {
    import spark.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[Counts, Counts](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (src: String, it: Iterator[DocTier], state: GroupState[Counts]) =>
          val cur = fold(state.getOption.getOrElse(Counts(src, 0, 0, 0, 0)), it)
          state.update(cur)
          Iterator.single(cur)
      }
  }
}
