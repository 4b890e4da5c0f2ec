package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphQueries

/** Plan probe for the LPA arg-max aggregate strategy: the packed-long
  * formulation must keep every per-round aggregate in HashAggregate —
  * the semantically-equivalent `max(struct(c, -lab))` arg-max planned a
  * partial+final SortAggregate PAIR per round (a sort of the (dst, lab)
  * counts every iteration), measured 1.6× slower on the gate graph.
  */
class LpaPlanProbe extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("LPA rounds aggregate hash-side only — no SortAggregate anywhere") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val e = (tri ++ tri.map(_.swap)).toDF("src", "dst")
    val p = GraphQueries.labelPropagation(e, 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SortAggregate"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("packed arg-max range guard throws loudly past 32-bit ids") {
    val e = Seq((4294967296L, 1L), (1L, 4294967296L)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      GraphQueries.labelPropagation(e, 1).collect()
    }
    assert(ex.getMessage.contains("32 bits"))
  }
}
