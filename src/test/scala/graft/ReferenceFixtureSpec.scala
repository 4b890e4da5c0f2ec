package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{CsvIngest, SchemaIO}

/** Golden test against the reference's OWN fixture triple (SURVEY §5):
  * `assets/cars_202109.csv` (header + 406 rows; ORIGIN US:254 Japan:79
  * Europe:73) through schema-driven load + repair, then the flagship
  * query `assets/big_US_cars.sql` predicate (`ORIGIN='US' AND
  * WEIGHT>4500`) which must select exactly 17 rows.
  *
  * The shipped sample is COMMA-delimited (SURVEY §3.3 quirk: the
  * reference parser hardcodes `;` and would yield an empty table on its
  * own sample); delimiter is config here, so the test uses `sep=","`.
  * Files are read in place from /root/reference (data assets, never
  * copied).
  */
class ReferenceFixtureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val assets = "/root/reference/assets"

  private lazy val available = new java.io.File(s"$assets/cars_202109.csv").exists()

  test("cars_202109.csv loads 406 repaired rows with the reference schema") {
    assume(available, "reference assets not present")
    val schema = SchemaIO.parseFile(
      java.nio.file.Paths.get(s"$assets/cars_schema.yaml"))
    assert(schema.fields.length == 9)
    val cars = CsvIngest.read(spark, s"$assets/cars_202109.csv", schema,
      CsvIngest.Options(sep = ","))
    assert(cars.count() == 406)
    val byOrigin = cars.groupBy("ORIGIN").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byOrigin == Map("US" -> 254L, "Japan" -> 79L, "Europe" -> 73L))
  }

  test("flagship big_US_cars query selects exactly 17 rows") {
    assume(available, "reference assets not present")
    val schema = SchemaIO.parseFile(
      java.nio.file.Paths.get(s"$assets/cars_schema.yaml"))
    val cars = CsvIngest.read(spark, s"$assets/cars_202109.csv", schema,
      CsvIngest.Options(sep = ","))
    cars.createOrReplaceTempView("ref_cars")
    // the predicate of assets/big_US_cars.sql:1-2
    val big = spark.sql(
      "SELECT * FROM ref_cars WHERE ORIGIN = 'US' AND WEIGHT > 4500")
    assert(big.count() == 17)
    // and typed repair held: WEIGHT is a double, MODEL a long
    assert(cars.schema("WEIGHT").dataType ==
      org.apache.spark.sql.types.DoubleType)
  }
}
