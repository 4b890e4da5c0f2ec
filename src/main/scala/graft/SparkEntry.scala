package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY §2 (reference surface + delegated-SQL
  * proofs + north-star extension ops) is declared as a [[Q.Spec]] in
  * the operator modules; this object is just the registry the harness
  * reads. Specs with `oracle = None` are genuinely non-SQL-replayable
  * (engine-private sketches like HLL/SimHash) and get the driver's
  * rows-only check.
  */
object SparkEntry {

  private lazy val allSpecs: Seq[Q.Spec] =
    EtlQueries.specs ++
      RelationalQueries.specs ++
      AdvancedQueries.specs ++
      DedupQueries.specs ++
      SimilarityQueries.specs ++
      ExtraSimilarityQueries.specs ++
      TextQueries.specs ++
      MultimodalQueries.specs ++
      VectorQueries.specs ++
      CurationQueries.specs ++
      WarehouseQueries.specs ++
      GraphQueries.specs ++
      AnalyticsQueries.specs ++
      PipelineQueries.specs ++
      TakedownAudit.specs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The 3-way join + revenue aggregate (the reference's delegated-SQL
    * centerpiece shape, SURVEY §2.4). */
  def entry(spark: SparkSession): DataFrame =
    allSpecs.find(_.name == "q_join_equi").get.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(s => s.name -> s.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allSpecs.flatMap(s => s.oracle.map(o => s.name -> o)).toMap
}
