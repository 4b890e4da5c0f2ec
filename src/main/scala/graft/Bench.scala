package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // testdata events.ts is TIMESTAMP(NANOS) parquet, unreadable by
      // Spark's converter unless mapped to long
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup so the first timed query doesn't absorb
    // session + compiler startup (a scan, a shuffle join, an agg)
    try {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("l_returnflag").count().count()
      ()
    } catch { case _: Throwable => () }
    // stable execution order (Map iteration order is hash-dependent);
    // min of two passes per query — this box is shared and single runs
    // vary ~2x, which would poison the cross-round 2x comparison
    // optional subset (comma-separated names) — e.g. the 10 hottest
    // queries for a scale-up run
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results: Seq[(String, Either[String, Double])] =
      selected.map { case (name, fn) =>
        // a failing query is an ERROR, not 0 s — swallowing it would
        // record ~0 and "improve" the total
        def once(): Either[String, Double] = {
          val t0 = System.nanoTime()
          // noop sink fully materializes every projected column and keeps
          // top-level sorts (count() would let Catalyst prune projections
          // and eliminate the ORDER BY — under-measuring scalar batteries
          // and sorts)
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            Right((System.nanoTime() - t0) / 1e9)
          } catch {
            case e: Throwable =>
              Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
          }
        }
        val r = (once(), once()) match {
          case (Right(a), Right(b)) => Right(math.min(a, b))
          case (Right(a), Left(_))  => Right(a)
          case (Left(_), Right(b))  => Right(b)
          case (Left(a), Left(_))   => Left(a)
        }
        name -> r
      }
    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      }
    val ok = results.collect { case (k, Right(v)) => k -> v }
    val errs = results.collect { case (k, Left(e)) => k -> e }
    val qs = ok.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val es = errs.map { case (k, e) => s"\"" + k + "\":\"" + esc(e) + "\"" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":${errs.size},"queries":$qs,"errors":$es,"sf":"$sfDir"}"""
    // full artifact on disk — the driver's stdout capture has truncated
    // the head of the battery before (BENCH_r02 kept 63/80 queries);
    // the file is the canonical record
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/bench_latest.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, (json + "\n").getBytes("UTF-8"))
    }
    catch { case e: Throwable =>
      System.err.println(s"bench: could not write $outPath: $e") }
    println(json)
    spark.stop()
  }
}
