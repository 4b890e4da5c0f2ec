package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.workflow._
import java.nio.file.{Files, Path}

/** W2–W8 (SURVEY §2.8): error taxonomy, conditional short-circuit,
  * append-disposition doubling — the golden end-to-end of §5.3. */
class WorkflowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("error taxonomy carries the reference's descriptions and codes") {
    val all: Seq[(EtlError, String, Int)] = Seq(
      (EtlError.CsvNotFound(), "CSV file not found", 404),
      (EtlError.SchemaNotFound(), "Schema file not found", 404),
      (EtlError.CsvInvalid(), "CSV file is invalid", 400),
      (EtlError.SchemaInvalid(), "Schema file is invalid", 400),
      (EtlError.LoadJobError(), "Load job error", 500),
      (EtlError.QueryNotFound(), "Query file not found", 404),
      (EtlError.QueryInvalid(), "Query file is invalid", 400),
      (EtlError.CreationFailed(), "Creation job error", 500))
    all.foreach { case (e, msg, code) =>
      assert(e.description == msg && e.code == code)
    }
  }

  private def fixture(): Path = {
    val dir = Files.createTempDirectory("wf")
    Files.createDirectories(dir.resolve("schemas"))
    Files.writeString(dir.resolve("schemas/s.yaml"),
      """fields:
        |  - name: NAME
        |    type: STRING
        |  - name: W
        |    type: FLOAT
        |""".stripMargin)
    Files.write(dir.resolve("cars_202109.csv"),
      "NAME;W\nbig;5000.0\nsmall;1000.0\n".getBytes("ISO-8859-1"))
    Files.writeString(dir.resolve("q.sql"),
      s"SELECT * FROM wf_cars WHERE W > 4500")
    dir
  }

  test("golden workflow: load → query; append disposition doubles (§5.3)") {
    val dir = fixture()
    val csvCfg = LoadCsvConfig(dir.toString, "cars_", "s.yaml", "wf_cars",
      schemaDir = dir.resolve("schemas").toString)
    val qCfg = LoadQueryConfig(dir.toString, "q.sql", "wf_big", append = true)
    assert(Etl.carsWorkflow(spark, csvCfg, qCfg) == "Success")
    assert(spark.table("wf_cars").count() == 2)
    assert(spark.table("wf_big").count() == 1)

    // consumed file was archived → second run short-circuits at the
    // conditional switch (etl_cars.yaml:17-22) without running the query
    assert(Etl.carsWorkflow(spark, csvCfg, qCfg) == "Not found")
    assert(spark.table("wf_big").count() == 1)

    // re-seed the csv: append disposition doubles the query table
    Files.write(dir.resolve("cars_202110.csv"),
      "NAME;W\nbig;5000.0\nsmall;1000.0\n".getBytes("ISO-8859-1"))
    assert(Etl.carsWorkflow(spark, csvCfg, qCfg) == "Success")
    assert(spark.table("wf_big").count() == 2)

    // truncate disposition instead: back to 1
    assert(Files.exists(dir.resolve("ARCHIVED/cars_202110.csv")))
    Files.write(dir.resolve("cars_202111.csv"),
      "NAME;W\nbig;5000.0\n".getBytes("ISO-8859-1"))
    assert(Etl.carsWorkflow(spark, csvCfg, qCfg.copy(append = false)) == "Success")
    assert(spark.table("wf_big").count() == 1)
  }

  test("query error surfaces (no try/except in loadQueryToBq — SURVEY §3.2)") {
    val dir = fixture()
    intercept[EtlError.QueryNotFound](
      Etl.loadQuery(spark,
        LoadQueryConfig(dir.toString, "missing.sql", "t")))
  }

  test("invalid query extension → QueryInvalid; broken SQL → CreationFailed") {
    val dir = fixture()
    intercept[EtlError.QueryInvalid](
      Etl.loadQuery(spark, LoadQueryConfig(dir.toString, "q.txt", "t")))
    Files.writeString(dir.resolve("bad.sql"), "SELEKT nonsense FROM nowhere")
    intercept[EtlError.CreationFailed](
      Etl.loadQuery(spark, LoadQueryConfig(dir.toString, "bad.sql", "t")))
  }

  test("missing schema → SchemaNotFound") {
    val dir = fixture()
    intercept[EtlError.SchemaNotFound](
      Etl.loadCsv(spark, LoadCsvConfig(dir.toString, "cars_", "nope.yaml",
        "t", schemaDir = dir.resolve("schemas").toString)))
  }
}
