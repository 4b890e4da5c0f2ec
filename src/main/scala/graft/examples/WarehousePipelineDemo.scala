package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The warehouse-maintenance pipeline, composed end-to-end from the
  * operator battery: column profile → data-quality expectations gate →
  * SCD2 status history → golden customer records → incremental
  * aggregate refresh. Each stage is the same code the oracle gate
  * verifies query-by-query; this main proves they compose into the
  * nightly dimension-maintenance job a user would actually run, and
  * prints one JSON line of stage counts.
  *
  * Usage: runMain graft.examples.WarehousePipelineDemo [sfDir]
  */
object WarehousePipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(run(spark, sfDir))
    spark.stop()
  }

  /** Runs the composed pipeline; returns the JSON stage summary. */
  def run(spark: SparkSession, sfDir: String): String = {
    val q = graft.SparkEntry.queries

    // 1. profile the incoming snapshot (one scan; the operational
    //    "what did we receive" report)
    val profile = q("q_profile_columns")(spark, sfDir)
    val nProfiled = profile.count()

    // 2. expectations gate: hard validity predicates must pass before
    //    anything downstream is refreshed — a failed check aborts the
    //    run loudly rather than publishing bad history
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    import graft.operators.QualityChecks.{RowCheck, UniqueCheck}
    val checks = graft.operators.QualityChecks.validate(orders, Seq(
      RowCheck("orderkey_not_null", col("o_orderkey").isNotNull),
      RowCheck("custkey_not_null", col("o_custkey").isNotNull),
      RowCheck("orderdate_not_null", col("o_orderdate").isNotNull),
      RowCheck("positive_price", col("o_totalprice") > 0),
      RowCheck("known_status", col("o_orderstatus").isin("O", "F", "P")),
      UniqueCheck("orderkey_unique", Seq("o_orderkey"))))
    val failed = checks.filter(!col("passed")).count()
    require(failed == 0, s"expectations gate failed $failed checks")

    // 3. SCD2 status history for the tracked customer range
    val history = q("q_scd2_history")(spark, sfDir)
    val nVersions = history.count()
    val nOpen = history.filter(col("valid_to").isNull).count()

    // 4. golden customer records (field-wise survivorship)
    val golden = q("q_golden_record")(spark, sfDir)
    val nGolden = golden.count()

    // 5. incremental refresh of the maintained aggregate (merge of
    //    already-aggregated partials — the corpus is never rescanned)
    val refreshed = q("q_incremental_agg")(spark, sfDir)
    val nAggRows = refreshed.count()

    s"""{"n_profiled":$nProfiled,"n_checks_failed":$failed,""" +
      s""""n_versions":$nVersions,"n_open_versions":$nOpen,""" +
      s""""n_golden":$nGolden,"n_agg_rows":$nAggRows}"""
  }
}
