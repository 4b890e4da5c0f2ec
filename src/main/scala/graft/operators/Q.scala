package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plumbing for the harness query battery (SURVEY §7 step 5).
  *
  * Every operator in SURVEY §2 is declared as a [[Q.Spec]]: a named
  * Spark query over the `/root/testdata` star schema plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle query.
  * Column names are aligned on both sides (the driver's compare sorts
  * columns by name), every query carries a total ORDER BY so row order
  * is deterministic, and floating aggregates are rounded so the two
  * engines' accumulation orders can't flip a hash.
  */
object Q {
  final case class Spec(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  /** Load one star-schema table from the per-SF dir (TESTDATA.md). */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}
