package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink format breadth: the engine's tables round-trip through
  * every bundled columnar/text format with schema and values intact
  * (the reference only speaks CSV; a Spark-native deployment reads and
  * writes whatever the lake holds). */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def roundTrip(fmt: String): Unit = {
    val dir = Files.createTempDirectory(s"fmt_$fmt").resolve("out").toString
    val src = spark.read.parquet(s"$sf/orders.parquet")
      // JSON/CSV carry timestamps as strings; pin a lossless wire form
      .withColumn("o_orderdate", date_format(col("o_orderdate"),
        "yyyy-MM-dd HH:mm:ss"))
    src.write.format(fmt).option("header", "true").save(dir)
    // read back under the declared schema (inference would narrow
    // small longs to ints on text formats)
    val back = spark.read.format(fmt).schema(src.schema)
      .option("header", "true").load(dir)
    assert(back.count() == src.count(), s"$fmt row count")
    val a = src.orderBy("o_orderkey").collect()
    val b = back.select(src.columns.map(col): _*)
      .orderBy("o_orderkey").collect()
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0), fmt)
      // totalprice survives with full double fidelity
      assert(x.getDouble(3) == y.getDouble(3), s"$fmt price fidelity")
      assert(x.getString(4) == y.getString(4), s"$fmt date wire form")
    }
  }

  test("orders round-trips through parquet")(roundTrip("parquet"))
  test("orders round-trips through orc")(roundTrip("orc"))
  test("orders round-trips through json")(roundTrip("json"))
  test("orders round-trips through csv")(roundTrip("csv"))
}
