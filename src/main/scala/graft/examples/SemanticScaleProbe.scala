package graft.examples

import org.apache.spark.sql.SparkSession

/** Scale probe for semantic dedup (DedupQueries.semanticKeep): times
  * the full keep-set computation at a given corpus dir and cell count.
  * SemDeDup's scaling contract is cells ∝ corpus (constant cell size),
  * so the honest 10× experiment is 10× data WITH 10× cells — run this
  * at sf0.1/8 cells and at the ScaleUp 10× replica/80 cells and
  * compare walls. Running the replica at the UNSCALED 8 cells shows
  * the quadratic within-cell blowup the contract exists to prevent.
  *
  * Usage: runMain graft.examples.SemanticScaleProbe <dir> <nCells>
  */
object SemanticScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nCells = args(1).toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    // warm (JIT + file listing), then measure
    def once(): (Double, Long) = {
      val t0 = System.nanoTime()
      val kept = graft.operators.DedupQueries
        .semanticKeep(e, nCells, theta = 0.4).count()
      ((System.nanoTime() - t0) / 1e9, kept)
    }
    once()
    val (sec, kept) = once()
    val total = e.count()
    println(f"""{"dir":"$dir","cells":$nCells,"total":$total,""" +
      f""""kept":$kept,"dropped":${total - kept},"sec":$sec%.2f}""")
    spark.stop()
  }
}
