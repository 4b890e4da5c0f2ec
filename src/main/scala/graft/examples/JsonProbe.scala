package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off profile probe for the q_scalar_json regression (VERDICT r6
  * §What's-wrong 3): times the parse, the sort, and the scan layout
  * separately at sf0.1 to attribute the 0.53→3.3 s driver delta.
  */
object JsonProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val ev = spark.read.parquet(s"$dir/events.parquet")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warmup
    ev.select(col("event_id")).write.format("noop").mode("overwrite").save()
    time("scan only") {
      ev.select(col("event_id"), col("props"))
        .write.format("noop").mode("overwrite").save()
    }
    time("parse, no sort") {
      ev.select(col("event_id"),
          get_json_object(col("props"), "$.k").try_cast("long").as("k"))
        .write.format("noop").mode("overwrite").save()
    }
    time("parse, no sort, repartitioned") {
      ev.repartition(32).select(col("event_id"),
          get_json_object(col("props"), "$.k").try_cast("long").as("k"))
        .write.format("noop").mode("overwrite").save()
    }
    time("sort only") {
      ev.select(col("event_id"), col("props")).orderBy(col("event_id"))
        .write.format("noop").mode("overwrite").save()
    }
    time("full q_scalar_json") {
      ev.select(col("event_id"),
          get_json_object(col("props"), "$.k").try_cast("long").as("k"))
        .orderBy(col("event_id"))
        .write.format("noop").mode("overwrite").save()
    }
    (2 to 7).foreach { i =>
      time(s"full, run $i") {
        ev.select(col("event_id"),
            get_json_object(col("props"), "$.k").try_cast("long").as("k"))
          .orderBy(col("event_id"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    (1 to 3).foreach { i =>
      time(s"parse-only again, run $i") {
        ev.select(col("event_id"),
            get_json_object(col("props"), "$.k").try_cast("long").as("k"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    (1 to 3).foreach { i =>
      time(s"sort-only again, run $i") {
        ev.select(col("event_id"), col("props")).orderBy(col("event_id"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
