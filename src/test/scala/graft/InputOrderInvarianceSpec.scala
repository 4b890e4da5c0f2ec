package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Input-layout independence of the whole battery.
  *
  * On a real cluster a table arrives as many files read in arbitrary
  * order; the driver's testdata is one single-row-group file per
  * table, so every scan feeds rows in exactly file order — and a query
  * whose ORDER BY is not a total order can hash-match the oracle by
  * that luck alone (q_scalar_math did, until spread() exposed it).
  * [[DeterminismSpec]] varies shuffle partitioning; this spec varies
  * the INPUT: each table is rewritten as multiple files with shuffled
  * row order, and every battery query must return bit-identical rows
  * on the rewritten copy. Failures here are exactly the bugs that
  * appear when a job moves from one file on one laptop to a thousand
  * splits on a thousand executors.
  */
class InputOrderInvarianceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val src = "/root/testdata/sf0.001"

  test("every battery query is invariant to input file count and row order") {
    import org.apache.spark.sql.functions._
    val dir = TestSpark.scratchDir("graft_shuf_sf")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      // deterministic but thorough scramble: hash-order the rows, then
      // round-robin them across 7 files — both the file count and the
      // within-file order differ from the source
      df.orderBy(hash(df.columns.map(col).toIndexedSeq: _*))
        .repartition(7)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val a = fn(spark, src).collect().map(_.toString)
        val b = fn(spark, dir).collect().map(_.toString)
        if (a.sameElements(b)) None
        else {
          val firstDiff = a.zip(b).indexWhere { case (x, y) => x != y }
          val i = if (firstDiff >= 0) firstDiff else math.min(a.length, b.length)
          Some(s"$name (rows ${a.length}/${b.length}, first diff at $i: " +
            s"src=${a.lift(i)} shuf=${b.lift(i)})")
        }
    }
    assert(failures.isEmpty,
      s"input-layout-dependent results:\n  ${failures.mkString("\n  ")}")
  }
}
