package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextQueries

/** The q_bpe_merges merge-application invariants the DuckDB oracle
  * replay cannot pin on its own: the §-anchored string encoding plus
  * one non-overlapping `replace` must implement EXACT greedy
  * left-to-right BPE pair merging (Sennrich et al. 2016 §3.2) — no
  * partial-symbol matches, all disjoint occurrences in one pass,
  * self-pair runs collapsing floor(run/2) times.
  */
class BpeMergesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Apply one merge exactly as the Spec does (same replace shape). */
  private def applyMerge(seg: String, l: String, r: String): String = {
    import spark.implicits._
    Seq(seg).toDF("seg")
      .select(call_function("replace", col("seg"),
        lit("§" + l + "§§" + r + "§"), lit("§" + l + r + "§")).as("seg"))
      .head().getString(0)
  }

  private def enc(syms: String*): String = "§" + syms.mkString("§§") + "§"

  test("merge replaces every disjoint occurrence in one pass " +
      "(consecutive occurrences regenerate the shared boundary)") {
    assert(applyMerge(enc("a", "b", "a", "b"), "a", "b") === enc("ab", "ab"))
    assert(applyMerge(enc("a", "b", "c", "a", "b"), "a", "b") ===
      enc("ab", "c", "ab"))
  }

  test("self-pair runs merge greedily left-to-right: run of 3 -> aa,a; " +
      "run of 4 -> aa,aa") {
    assert(applyMerge(enc("a", "a", "a"), "a", "a") === enc("aa", "a"))
    assert(applyMerge(enc("a", "a", "a", "a"), "a", "a") === enc("aa", "aa"))
  }

  test("anchored pattern never matches a partial symbol") {
    // symbols (xa, b): pair (a, b) must NOT merge — 'a' is a suffix
    // of the symbol 'xa', not a symbol
    assert(applyMerge(enc("xa", "b"), "a", "b") === enc("xa", "b"))
    // symbols (a, bx): pair (a, b) must NOT merge either
    assert(applyMerge(enc("a", "bx"), "a", "b") === enc("a", "bx"))
  }

  test("merged symbols participate in later merges (the loop is real)") {
    val once = applyMerge(enc("e", "r", "»"), "e", "r")
    assert(once === enc("er", "»"))
    assert(applyMerge(once, "er", "»") === enc("er»"))
  }

  test("q_bpe_merges on sf0.001: budget rows, ranks total-ordered, " +
      "merged = l || r, counts non-increasing") {
    val out = TextQueries.bpeMergesSpec
      .run(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === TextQueries.BpeMergeBudget)
    assert(out.map(_.getLong(0)).toSeq ===
      (1L to TextQueries.BpeMergeBudget.toLong))
    out.foreach { r =>
      assert(r.getString(3) === r.getString(1) + r.getString(2))
    }
    // each later arg-max was available (or dominated by an ancestor)
    // earlier, so the weighted count can never increase across ranks
    val ns = out.map(_.getLong(4)).toSeq
    assert(ns === ns.sorted.reverse, s"counts increased: $ns")
    // symbols stay separator-free: the encoding invariant that makes
    // the anchored replace exact
    out.foreach { r =>
      assert(!r.getString(3).contains("§"))
    }
  }
}
