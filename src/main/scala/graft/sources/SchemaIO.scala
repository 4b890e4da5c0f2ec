package graft.sources

import org.apache.spark.sql.types._

/** Schema-file handling (SURVEY §1.1/§2.1 S5).
  *
  * The reference loads an external YAML or JSON schema file of shape
  * `{fields: [{name, type, mode}]}` (reference
  * `functions/load_csv/main.py:49-53`, `assets/cars_schema.yaml:1-29`)
  * and rejects any other extension
  * (`functions/load_csv/main.py:140-154`, SchemaNotFound at :146).
  * Types are BigQuery legacy names; the reference converts them to
  * `SchemaField(name, type, mode)` (`main.py:159-162`).
  *
  * Here the same shape becomes a Spark [[StructType]]. The YAML subset
  * accepted is the flat list-of-maps the reference uses — parsed by
  * hand (no external YAML dependency); JSON is parsed with Jackson
  * (ships with Spark).
  */
object SchemaIO {

  /** BigQuery legacy type name → Spark type (SURVEY §1.2 table). */
  def sparkType(refType: String): DataType = refType.toUpperCase match {
    case "STRING"                 => StringType
    case "INTEGER" | "INT64"      => LongType // BQ INTEGER is 64-bit
    case "FLOAT" | "FLOAT64"      => DoubleType
    case "TIMESTAMP"              => TimestampType
    case "DATE"                   => DateType
    case "BOOLEAN" | "BOOL"       => BooleanType
    case "BYTES"                  => BinaryType
    case "NUMERIC"                => DecimalType(38, 9)
    case other =>
      throw SchemaInvalid(s"unsupported field type: $other")
  }

  final case class FieldSpec(name: String, typ: String, mode: String) {
    def toStructField: StructField = {
      val base = SchemaIO.sparkType(typ)
      mode.toUpperCase match {
        // REPEATED is the BQ convention for arrays (SURVEY §1.2)
        case "REPEATED" => StructField(name, ArrayType(base), nullable = true)
        case "REQUIRED" => StructField(name, base, nullable = false)
        case _          => StructField(name, base, nullable = true)
      }
    }
  }

  final case class SchemaInvalid(msg: String)
      extends RuntimeException(s"Schema file is invalid: $msg")

  /** Dispatch on extension like the reference (`main.py:147-154`):
    * `.yaml`/`.yml` → YAML, `.json` → JSON, anything else is invalid.
    */
  def parseFile(path: java.nio.file.Path): StructType = {
    val name = path.getFileName.toString.toLowerCase
    val text = java.nio.file.Files.readString(path)
    if (name.endsWith(".yaml") || name.endsWith(".yml")) parseYaml(text)
    else if (name.endsWith(".json")) parseJson(text)
    else throw SchemaInvalid(s"unsupported schema extension: $name")
  }

  /** Parse the flat `fields:` YAML list the reference uses.
    * Accepts exactly the shape of `assets/cars_schema.yaml`:
    * {{{
    * fields:
    *   - name: NAME
    *     type: STRING
    *     mode: NULLABLE
    * }}}
    */
  def parseYaml(text: String): StructType = {
    val entries = scala.collection.mutable.ArrayBuffer.empty[
      scala.collection.mutable.Map[String, String]]
    var inFields = false
    val kv = """^\s*(?:-\s+)?([A-Za-z_]+)\s*:\s*(.*?)\s*$""".r
    text.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#')
      if (line.trim == "fields:") inFields = true
      else if (inFields && line.trim.nonEmpty) line match {
        case kv(k, v) =>
          val value = v.stripPrefix("\"").stripSuffix("\"")
            .stripPrefix("'").stripSuffix("'")
          if (raw.trim.startsWith("-")) // new list item
            entries += scala.collection.mutable.Map(k -> value)
          else if (entries.nonEmpty) entries.last(k) = value
        case _ => () // tolerate unknown lines outside the shape
      }
    }
    if (entries.isEmpty) throw SchemaInvalid("no fields: list found")
    toStruct(entries.map(m => FieldSpec(
      m.getOrElse("name", throw SchemaInvalid("field missing name")),
      m.getOrElse("type", throw SchemaInvalid("field missing type")),
      m.getOrElse("mode", "NULLABLE"))).toSeq)
  }

  /** JSON variant `{"fields": [{"name": …, "type": …, "mode": …}]}`
    * (reference `functions/load_csv/main.py:52-53`). Jackson ships with
    * Spark, so no extra dependency.
    */
  def parseJson(text: String): StructType = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(text)
    val fields = root.get("fields")
    if (fields == null || !fields.isArray || fields.isEmpty)
      throw SchemaInvalid("no fields array found")
    val specs = (0 until fields.size()).map { i =>
      val f = fields.get(i)
      if (f.get("name") == null || f.get("type") == null)
        throw SchemaInvalid("field missing name/type")
      FieldSpec(
        f.get("name").asText(),
        f.get("type").asText(),
        if (f.get("mode") == null) "NULLABLE" else f.get("mode").asText())
    }
    toStruct(specs)
  }

  private def toStruct(specs: Seq[FieldSpec]): StructType =
    StructType(specs.map(_.toStructField))
}
