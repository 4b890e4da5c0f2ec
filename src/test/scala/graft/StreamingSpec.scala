package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.streaming.IncrementalIngest
import java.nio.file.{Files, Path}

/** Incremental file ingest: exactly-once pickup across "cron ticks",
  * archive-on-consume, schema-driven repair in-stream. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("NAME", StringType), StructField("N", LongType)))

  test("watermarked event-time window aggregation matches batch") {
    import org.apache.spark.sql.functions._
    // stage the events table as a streaming file source
    val dir = Files.createTempDirectory("evstream")
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch.write.mode("overwrite").parquet(dir.resolve("in").toString)
    val evSchema = batch.schema

    def windowed(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("ets", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ets", "1 hour")
      .groupBy(window(col("ets"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))

    val q = windowed(spark.readStream.schema(evSchema)
        .parquet(dir.resolve("in").toString))
      .writeStream.outputMode("complete")
      .format("memory").queryName("ev_windows")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("ev_windows")
      .orderBy("window", "event_type").collect()
    val expected = windowed(batch).orderBy("window", "event_type").collect()
    assert(streamed.length == expected.length && streamed.nonEmpty)
    streamed.zip(expected).foreach { case (s, e) => assert(s == e) }
  }

  test("availableNow drains new files, archives them, never re-reads") {
    val root = Files.createTempDirectory("stream")
    val in = Files.createDirectories(root.resolve("in"))
    val cfg = IncrementalIngest.Config(
      inputDir = in.toString,
      checkpointDir = root.resolve("ckpt").toString,
      archiveDir = root.resolve("archived").toString,
      outputDir = root.resolve("out").toString)

    def drop(name: String, rows: Seq[String]): Unit =
      Files.write(in.resolve(name),
        ("NAME;N\n" + rows.mkString("", "\n", "\n")).getBytes("ISO-8859-1"))

    drop("cars_1.csv", Seq("a;1", "b;notanum"))
    assert(IncrementalIngest.runOnce(spark, schema, cfg) == 2)

    // tick 2: only the new file is read (checkpointed tracking);
    // totals accumulate in the sink
    drop("cars_2.csv", Seq("c;3"))
    assert(IncrementalIngest.runOnce(spark, schema, cfg) == 3)

    // tick 3: nothing new → no change
    assert(IncrementalIngest.runOnce(spark, schema, cfg) == 3)

    // repair semantics applied in-stream
    val out = spark.read.parquet(cfg.outputDir).orderBy("NAME").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    assert(out(1).isNullAt(1)) // "notanum" → NULL

    // consumed files eventually move to the archive dir (cleanSource
    // archives asynchronously, so poll briefly)
    def archivedCount: Long = {
      val d = root.resolve("archived")
      if (!Files.exists(d)) 0L
      else Files.walk(d).filter(p => p.toString.endsWith(".csv")).count()
    }
    val deadline = System.nanoTime() + 30e9.toLong
    while (archivedCount < 2 && System.nanoTime() < deadline) Thread.sleep(200)
    assert(archivedCount >= 1, "expected consumed csvs under the archive dir")
  }
}
