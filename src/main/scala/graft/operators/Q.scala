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

  /** Spread a narrow source across the cluster before CPU-heavy per-row
    * work. A parquet scan cannot split below one row group, so a
    * single-row-group file serializes everything downstream onto one
    * task no matter how expensive the map is; an explicit round-robin
    * repartition costs one tiny shuffle of the raw rows and buys full
    * parallelism for the hash/regex work that follows. At real scale
    * (many files/row groups) the same call is a cheap no-op-ish
    * rebalance rather than a correctness risk — it changes partitioning
    * only, never values. */
  def spread(s: SparkSession, df: DataFrame): DataFrame =
    df.repartition(s.sparkContext.defaultParallelism)
}
