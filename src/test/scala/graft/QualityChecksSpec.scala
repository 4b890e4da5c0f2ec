package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.QualityChecks
import graft.operators.QualityChecks.{RowCheck, UniqueCheck}

class QualityChecksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("null predicates count as violations; surplus counts duplicates beyond the first") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "a"), (3L, "b"), (null, "b"), (null, "b"))
      .toDF("v", "k")
    val report = QualityChecks.validate(df, Seq(
      RowCheck("v_positive", col("v") > 0), // 2 nulls → 2 violations
      RowCheck("always", lit(true)),
      UniqueCheck("k_unique", Seq("k")) // 5 rows, 2 keys → 3 surplus
    )).collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(report.toSeq == Seq(
      ("always", 0L, true),
      ("k_unique", 3L, false),
      ("v_positive", 2L, false)))
  }

  test("row checks share one aggregate: no extra scan per check") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val report = QualityChecks.validate(df, Seq(
      RowCheck("a", col("doc_id").isNotNull),
      RowCheck("b", col("n_chars") >= 0),
      RowCheck("c", length(col("text")) > 0)))
    // one scan → exactly one HashAggregate pair below the stack
    val p = report.queryExecution.executedPlan.toString
    assert(p.sliding("Scan parquet".length).count(_ == "Scan parquet") == 1, p)
    // duplicate names rejected loudly
    intercept[IllegalArgumentException] {
      QualityChecks.validate(df, Seq(
        RowCheck("x", lit(true)), RowCheck("x", lit(false))))
    }
  }
}
