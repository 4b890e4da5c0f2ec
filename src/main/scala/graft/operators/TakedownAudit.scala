package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten request AUDIT (VERDICT r17 stretch #7): one
  * classification shared by all four delete surfaces — ANN tombstone
  * ([[ScaleOps.tombstone]] over the frozen-codebook cells/codes),
  * dedup prefix tombstone
  * ([[DedupQueries.prefixFilterIncremental]]'s `tombstones`), scrub
  * count-decrement ([[TextQueries.scrubIncremental]]'s `deletedDocs`
  * + `appliedTakedowns` ledger), and the streaming delta=−1 leg
  * ([[graft.streaming.ComposedPipeline.takedownBatch]]). A takedown
  * list submitted to a surface splits three ways:
  *
  *   - APPLIED — present in the surface's state and not yet deleted:
  *     the ids this submission actually removes. The four surfaces
  *     MUST agree on this set when driven by one list against state
  *     built from the same corpus (RtbfSpec asserts it) — that
  *     agreement is the audit a compliance reviewer wants.
  *   - ALREADY GONE — a prior takedown got them; re-submission is a
  *     no-op on every surface (anti-join on tombstones / the applied
  *     ledger / existing −1 rows).
  *   - NEVER PRESENT — never crawled, deduped away before indexing,
  *     or out of range: nothing to remove. The streaming surface
  *     still LEDGERS these so a late arrival is suppressed.
  *
  * Priority: a ledgered/tombstoned id counts as ALREADY GONE even
  * while its dead rows physically remain in a carried index — the
  * carry-vs-compact distinction ([[ScaleOps.adviseCompaction]]) is
  * storage layout, not deletion status.
  *
  * Scale shape: `requested` is takedown-sized by definition; every
  * classification is a semi/anti-join of the request against id-only
  * projections of surface state, and the returned id lists are
  * request-bounded (the collect is part of the audit contract — an
  * audit line IS driver-side output). */
object TakedownAudit {

  final case class SurfaceAudit(surface: String, nRequested: Long,
                                applied: Seq[Long], alreadyGone: Seq[Long],
                                neverPresent: Seq[Long]) {
    /** The one audit line per surface the demo prints. */
    def line: String =
      f"$surface%-10s requested=$nRequested%-5d applied=${applied.size}%-5d " +
        f"already_gone=${alreadyGone.size}%-4d never_present=${neverPresent.size}%-4d " +
        s"applied_ids=[${idsPreview(applied)}]"
    private def idsPreview(ids: Seq[Long]): String =
      if (ids.size <= 8) ids.mkString(",")
      else ids.take(8).mkString(",") + s",… (${ids.size} total)"
  }

  /** Classify one request list against one surface. All three frames
    * must carry the id column `idCol`; `present` is the surface's
    * indexed/counted id projection, `alreadyGone` its deletion record
    * (tombstone table / applied ledger / existing −1 rows). */
  def audit(surface: String, requested: DataFrame, present: DataFrame,
            alreadyGone: DataFrame, idCol: String = "doc_id"): SurfaceAudit = {
    val req = requested.select(col(idCol)).distinct()
    val pres = present.select(col(idCol)).distinct()
    val gone0 = alreadyGone.select(col(idCol)).distinct()
    def ids(df: DataFrame): Seq[Long] =
      df.collect().map(_.getLong(0)).sorted.toSeq
    val gone = req.join(gone0, Seq(idCol), "left_semi")
    val applied = req.join(gone0, Seq(idCol), "left_anti")
      .join(pres, Seq(idCol), "left_semi")
    val never = req.join(gone0, Seq(idCol), "left_anti")
      .join(pres, Seq(idCol), "left_anti")
    SurfaceAudit(surface, req.count(), ids(applied), ids(gone), ids(never))
  }
}
