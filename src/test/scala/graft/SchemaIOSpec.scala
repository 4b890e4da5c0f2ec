package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.sources.SchemaIO

class SchemaIOSpec extends AnyFunSuite {

  private val yaml =
    """fields:
      |  - name: NAME
      |    type: STRING
      |    mode: NULLABLE
      |  - name: CYLINDERS
      |    type: INTEGER
      |  - name: MPG
      |    type: FLOAT
      |    mode: REQUIRED
      |  - name: TS
      |    type: TIMESTAMP
      |  - name: TAGS
      |    type: STRING
      |    mode: REPEATED
      |""".stripMargin

  test("yaml schema parses to the reference type mapping") {
    val st = SchemaIO.parseYaml(yaml)
    assert(st.fields.map(_.name).toSeq ==
      Seq("NAME", "CYLINDERS", "MPG", "TS", "TAGS"))
    assert(st("NAME").dataType == StringType)
    assert(st("CYLINDERS").dataType == LongType) // BQ INTEGER is 64-bit
    assert(st("MPG").dataType == DoubleType && !st("MPG").nullable)
    assert(st("TS").dataType == TimestampType)
    assert(st("TAGS").dataType == ArrayType(StringType))
  }

  test("json schema parses identically") {
    val json =
      """{"fields": [
        |  {"name": "NAME", "type": "STRING", "mode": "NULLABLE"},
        |  {"name": "WEIGHT", "type": "FLOAT"}
        |]}""".stripMargin
    val st = SchemaIO.parseJson(json)
    assert(st.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("NAME", StringType), ("WEIGHT", DoubleType)))
  }

  test("unsupported extension / shape raise SchemaInvalid") {
    val dir = java.nio.file.Files.createTempDirectory("schemas")
    val bad = dir.resolve("cars_schema.txt")
    java.nio.file.Files.writeString(bad, "fields:\n")
    intercept[SchemaIO.SchemaInvalid](SchemaIO.parseFile(bad))
    intercept[SchemaIO.SchemaInvalid](SchemaIO.parseYaml("no_fields_here: 1\n"))
    intercept[SchemaIO.SchemaInvalid](SchemaIO.parseJson("""{"fields": []}"""))
    intercept[SchemaIO.SchemaInvalid](SchemaIO.sparkType("GEOGRAPHY"))
  }
}
