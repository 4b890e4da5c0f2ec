package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.ScaleOps

/** Measure what the Z-order write layout buys a 2-dimensional box
  * predicate at the parquet reader level (row-group / page skipping via
  * min/max statistics), against the two layouts a pipeline would
  * otherwise use:
  *
  *   natural  — insertion order (no clustering on either dimension)
  *   lex(x,y) — range-partition + sort by x then y (clusters x only)
  *   zorder   — [[ScaleOps.zorderSorted]] on (x, y)
  *
  * Each layout writes the SAME 4M-row (x, y) grid to parquet across the
  * same file count, then runs the same `x BETWEEN … AND y BETWEEN …`
  * box scan (1/16 of each dimension, so 1/256 of the data matches).
  * The reported `scan rows` is the FileSourceScan's numOutputRows —
  * rows the reader actually surfaced after statistics-based skipping —
  * and is the number that determines scan cost at 100 TB.
  *
  * Usage: runMain graft.examples.ZOrderProbe [rows] [outDir]
  */
object ZOrderProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 4L * 1024 * 1024
    val out = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("zorder_probe").toString
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val side = 2048L // x, y ∈ [0, 2048)
    val grid = spark.range(n)
      .select((col("id") % side).as("x"),
        expr(s"(id div $side) % $side").as("y"),
        col("id").as("payload"))

    // natural: the id-order grid — consecutive rows share y, so y is
    // accidentally clustered; shuffle by payload hash to get the
    // genuinely unclustered layout a mixed-source corpus has
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    grid.repartition(64, col("payload")).write.mode("overwrite")
      .parquet(s"$out/natural")
    grid.repartitionByRange(64, col("x"))
      .sortWithinPartitions(col("x"), col("y"))
      .write.mode("overwrite").parquet(s"$out/lex")
    ScaleOps.zorderSorted(grid, "x", "y", partitions = 64)
      .write.mode("overwrite").parquet(s"$out/zorder")

    def probe(layout: String): (Long, Double) = {
      val df = spark.read.parquet(s"$out/$layout")
        .filter(col("x").between(512, 639) && col("y").between(1024, 1151))
      val t0 = System.nanoTime()
      // collect THIS df so the metric below comes from the same
      // execution (an .agg() would build and run a different plan)
      val kept = df.collect().length.toLong
      val secs = (System.nanoTime() - t0) / 1e9
      val scanRows = df.queryExecution.executedPlan.collectLeaves()
        .head.metrics("numOutputRows").value
      require(kept == n / 256,
        s"box must match 1/256 of the grid, got $kept") // same answer everywhere
      (scanRows, secs)
    }
    // warm the reader path once, then measure
    probe("natural")
    val rows = Seq("natural", "lex", "zorder").map { l =>
      val (scanRows, secs) = probe(l)
      f"| $l%-8s | $scanRows%,12d | ${100.0 * scanRows / n}%6.2f%% | $secs%5.2f s |"
    }
    println(s"rows=$n  box = 1/256 of the (x, y) domain")
    println("| layout   |    scan rows | of data |  time |")
    println("|---|---|---|---|")
    rows.foreach(println)
    spark.stop()
  }
}
