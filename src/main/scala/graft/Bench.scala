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
    // two passes per query, and a THIRD tie-breaker pass when the two
    // disagree by > 2x — this box is shared, and a minutes-long
    // contention window can cover both passes (round 3's driver
    // artifact recorded 5-23x inflation on an alphabetical band of
    // queries); the median of three rejects one poisoned pass. All
    // per-pass times are persisted so a poisoned artifact is
    // self-diagnosing.
    // optional subset (comma-separated names) — e.g. the 10 hottest
    // queries for a scale-up run
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // value per query + every pass outcome (time or error string)
    case class QueryResult(value: Either[String, Double],
                           passes: Seq[Either[String, Double]]) {
      def flaky: Boolean = value.isRight && passes.exists(_.isLeft)
    }
    val results: Seq[(String, QueryResult)] =
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
        val two = Seq(once(), once())
        val r = two match {
          case Seq(Right(a), Right(b)) if math.max(a, b) > 2 * math.min(a, b) =>
            // contention suspect: median of three
            once() match {
              case Right(c) =>
                QueryResult(Right(Seq(a, b, c).sorted.apply(1)),
                  two :+ Right(c))
              case l @ Left(_) =>
                QueryResult(Right(math.min(a, b)), two :+ l)
            }
          case Seq(Right(a), Right(b)) =>
            QueryResult(Right(math.min(a, b)), two)
          // one pass failed: keep the surviving time, but the mixed
          // outcome is recorded in `flaky` below — a query that OOMs
          // every other run must not look healthy
          case Seq(Right(a), Left(_)) => QueryResult(Right(a), two)
          case Seq(Left(_), Right(b)) => QueryResult(Right(b), two)
          case Seq(Left(a), Left(_))  => QueryResult(Left(a), two)
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
    def passJson(p: Either[String, Double]): String = p match {
      case Right(v) => v.toString
      case Left(e) => "\"" + esc(e) + "\""
    }
    val ok = results.collect { case (k, q) if q.value.isRight =>
      k -> q.value.toOption.get }
    val errs = results.collect { case (k, QueryResult(Left(e), _)) => k -> e }
    val flaky = results.collect { case (k, q) if q.flaky =>
      k -> q.passes.collectFirst { case Left(e) => e }.get }
    val qs = ok.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val es = errs.map { case (k, e) => s"\"" + k + "\":\"" + esc(e) + "\"" }
      .mkString("{", ",", "}")
    val fl = flaky.map { case (k, e) => s"\"" + k + "\":\"" + esc(e) + "\"" }
      .mkString("{", ",", "}")
    val ps = results.map { case (k, q) =>
      s"\"" + k + "\":" + q.passes.map(passJson).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":${errs.size},"n_flaky":${flaky.size},"queries":$qs,"errors":$es,"flaky":$fl,"passes":$ps,"sf":"$sfDir"}"""
    // full artifact on disk — the driver's stdout capture has truncated
    // the head of the battery before (BENCH_r02 kept 63/80 queries);
    // the file is the canonical record
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench_latest.json")
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
