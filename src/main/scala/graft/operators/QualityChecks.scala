package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (the Deequ/dbt-tests shape): a
  * constraint list evaluated against a frame, returning one row per
  * constraint with its violation count — the gate a production ETL
  * runs between ingest and publish.
  *
  * Scale design: ALL row-level predicates evaluate in ONE scan — each
  * is a `sum(violation indicator)` in a single aggregate, so adding a
  * 50th check costs one more codegen'd column, not another pass over
  * 100 TB. Uniqueness checks are each one hash aggregation on their key
  * (the minimum possible: duplicate detection IS a groupBy); their
  * surplus counts merge with the row-check row via a tiny union. No
  * driver-side evaluation anywhere — the report is itself a DataFrame.
  */
object QualityChecks {
  sealed trait Check { def name: String }

  /** Violated by any row where `predicate` is FALSE **or NULL** (a
    * null predicate means the check could not prove the row valid —
    * counting it keeps `passed` honest on dirty data). */
  final case class RowCheck(name: String, predicate: Column) extends Check

  /** Violated by every surplus row beyond the first per key group. */
  final case class UniqueCheck(name: String, cols: Seq[String]) extends Check

  /** One row per check: (check, violations, passed), ordered by name. */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validate needs at least one check")
    require(checks.map(_.name).distinct.size == checks.size,
      "check names must be unique")
    val rowChecks = checks.collect { case c: RowCheck => c }
    val uniqueChecks = checks.collect { case c: UniqueCheck => c }

    val parts = new scala.collection.mutable.ArrayBuffer[DataFrame]
    if (rowChecks.nonEmpty) {
      // one scan, one aggregate row, then stack() to long form
      val aggs = rowChecks.map(c =>
        sum(when(c.predicate, 0L).otherwise(1L)).as(c.name))
      val wide = df.agg(aggs.head, aggs.tail: _*)
      val stackArgs = rowChecks
        .map(c => s"'${c.name}', `${c.name}`").mkString(", ")
      parts += wide.selectExpr(
        s"stack(${rowChecks.size}, $stackArgs) AS (check, violations)")
    }
    uniqueChecks.foreach { c =>
      parts += df.groupBy(c.cols.map(col): _*)
        .agg(count(lit(1)).as("__n"))
        .agg(coalesce(sum(col("__n") - 1L), lit(0L)).as("violations"))
        .select(lit(c.name).as("check"), col("violations"))
    }
    parts.reduce(_.unionAll(_))
      .select(col("check"), col("violations"),
        (col("violations") === 0L).as("passed"))
      .orderBy(col("check"))
  }
}
