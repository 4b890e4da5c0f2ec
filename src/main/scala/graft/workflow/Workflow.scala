package graft.workflow

import org.apache.spark.sql.SparkSession
import graft.sources.{CsvIngest, FilePick, NameTemplate, SchemaIO, SqlSource, TableSink}

/** Error taxonomy (SURVEY §2.8 W7): the reference's eight HTTP-coded
  * exception types (`functions/load_csv/exceptions.py:4-26`,
  * `functions/load_query/exceptions.py:4-16`) as a sealed hierarchy —
  * same messages, same codes, so the workflow's typed error
  * discrimination (`workflows/etl_cars.yaml:48-56` matches
  * `e.body.description == "CSV file not found"`) is expressible.
  */
sealed abstract class EtlError(val description: String, val code: Int)
    extends RuntimeException(description)

object EtlError {
  final case class CsvNotFound()    extends EtlError("CSV file not found", 404)
  final case class SchemaNotFound() extends EtlError("Schema file not found", 404)
  final case class CsvInvalid()     extends EtlError("CSV file is invalid", 400)
  final case class SchemaInvalid()  extends EtlError("Schema file is invalid", 400)
  final case class LoadJobError()   extends EtlError("Load job error", 500)
  final case class QueryNotFound()  extends EtlError("Query file not found", 404)
  final case class QueryInvalid()   extends EtlError("Query file is invalid", 400)
  final case class CreationFailed() extends EtlError("Creation job error", 500)
}

/** Job configs (SURVEY §1.2 "dynamic typing at the edges"): the
  * reference's JSON request bodies with defaulted optionals become
  * typed case classes; defaults mirror the code
  * (`functions/load_csv/main.py:195-202`:
  * archiveFiles=true, skipHeaders=true;
  * `functions/load_query/main.py:70-75`: useLegacySql=false,
  * append=false — `useLegacySql` is accepted-but-ignored, Spark SQL ≈
  * standard SQL, SURVEY §3.2).
  */
final case class LoadCsvConfig(
    dir: String,
    prefix: String,
    schemaFile: String,
    destinationTable: String,
    // the reference keeps schema files in a SEPARATE bucket
    // (`SCHEMAS_BUCKET`, functions/load_csv/main.py:24,141) — a shared
    // location would make the prefix file-pick grab the schema itself
    schemaDir: String,
    sep: String = ";",
    archiveFiles: Boolean = true,
    skipHeaders: Boolean = true,
    // S9: also emit the repaired FIXED_<name> CSV artifact
    // (`functions/load_csv/main.py:90,134-137`)
    writeFixed: Boolean = false)

final case class LoadQueryConfig(
    queryDir: String,
    queryFile: String,
    destinationTable: String,
    useLegacySql: Boolean = false,
    append: Boolean = false)

/** The ETL driver (SURVEY §2.8 W2–W6, §3.1/§3.2): straight-line Scala
  * replacing the workflow YAML's sequential steps + conditional
  * short-circuit (`workflows/etl_cars.yaml:2-30`).
  *
  * Step results are `val`s; the conditional switch (`etl_cars.yaml:
  * 17-22`) becomes an early return; the subworkflow's typed error
  * mapping (`etl_cars.yaml:48-56`: CsvNotFound → "Not found", anything
  * else re-raised) becomes a `catch` on the sealed hierarchy.
  */
object Etl {
  import EtlError._

  /** `loadCsvToBq` equivalent (SURVEY §3.1 steps 4–5): pick newest file
    * by prefix → template destination name → parse schema file → strict
    * CSV read + repair → overwrite destination → archive consumed
    * files. Returns the workflow-visible status string.
    */
  def loadCsv(spark: SparkSession, cfg: LoadCsvConfig): String = {
    val pick = FilePick.mostRecentCsv(spark, cfg.dir, cfg.prefix)
    val destination = NameTemplate.expand(cfg.destinationTable, pick.getName)
    val schemaPath = java.nio.file.Paths.get(cfg.schemaDir, cfg.schemaFile)
    if (!java.nio.file.Files.exists(schemaPath)) throw SchemaNotFound()
    val schema =
      try SchemaIO.parseFile(schemaPath)
      catch { case _: SchemaIO.SchemaInvalid => throw SchemaInvalid() }
    val repaired = CsvIngest.read(spark, pick.toString, schema,
      CsvIngest.Options(sep = cfg.sep, skipHeaders = cfg.skipHeaders))
    try TableSink.save(repaired, destination, append = false)
    catch { case scala.util.control.NonFatal(_) => throw LoadJobError() }
    if (cfg.writeFixed) // before archive — the source must still exist
      CsvIngest.writeFixed(spark, pick.toString, schema,
        CsvIngest.Options(sep = cfg.sep, skipHeaders = cfg.skipHeaders), cfg.dir)
    if (cfg.archiveFiles) FilePick.archive(spark, cfg.dir, cfg.prefix)
    "Success"
  }

  /** `loadQueryToBq` equivalent (SURVEY §3.2): read `.sql` text →
    * `spark.sql` (parse/analyze/optimize/execute — the lifecycle the
    * reference delegates to BigQuery at `functions/load_query/main.py:57`)
    * → materialize with append/truncate disposition.
    */
  def loadQuery(spark: SparkSession, cfg: LoadQueryConfig): String = {
    val sql = SqlSource.readQuery(spark, cfg.queryDir, cfg.queryFile)
    val result =
      try spark.sql(sql)
      catch { case scala.util.control.NonFatal(_) => throw CreationFailed() }
    try TableSink.save(result, cfg.destinationTable, cfg.append)
    catch { case scala.util.control.NonFatal(_) => throw CreationFailed() }
    "Success"
  }

  /** The `main` workflow (`workflows/etl_cars.yaml:2-30`): CSV load,
    * conditional switch, then SQL materialization with append=true.
    * CsvNotFound maps to "Not found" exactly like the subworkflow's
    * except block (`etl_cars.yaml:48-56`); other errors propagate (the
    * query subworkflow has no try/except — SURVEY §3.2).
    */
  def carsWorkflow(spark: SparkSession, csvCfg: LoadCsvConfig,
                   queryCfg: LoadQueryConfig): String = {
    val loadResult =
      try loadCsv(spark, csvCfg)
      catch { case CsvNotFound() => "Not found" }
    if (loadResult != "Success") return loadResult // conditionalSwitch → end
    loadQuery(spark, queryCfg)
  }
}
