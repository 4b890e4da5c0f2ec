package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}

/** Unit tests for the extension-op building blocks (SURVEY §2.9). */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("shingles: word 3-grams; short docs collapse to whole text") {
    val df = Seq("a b c d e", "a b").toDF("text")
      .select(TF.shingles(col("text")).as("s"))
    val rows = df.as[Seq[String]].collect()
    assert(rows(0) == Seq("a b c", "b c d", "c d e"))
    assert(rows(1) == Seq("a b"))
  }

  test("minhash: identical docs → identical signature; permutation-independent order") {
    val df = Seq("the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog",
      "an entirely different document about spark engines at scale")
      .toDF("text")
      .select(TF.minhash(TF.shingleSet(col("text")), 0).as("m0"),
        TF.minhash(TF.shingleSet(col("text")), 1).as("m1"))
    val rows = df.collect()
    assert(rows(0) == rows(1))
    assert(rows(0) != rows(2))
  }

  test("simhash: identical → hamming 0; similar < dissimilar") {
    val texts = Seq(
      "spark streaming batch window join filter agg" ,
      "spark streaming batch window join filter agg",
      "spark streaming batch window join filter scan",  // 1 token differs
      "totally unrelated words about cooking pasta tonight")
    val sigs = texts.toDF("text").select(TF.simhash(col("text"))).as[Long].collect()
    assert(sigs(0) == sigs(1))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0), sigs(2)) < ham(sigs(0), sigs(3)))
  }

  test("rolling fingerprint is shift-robust where md5-of-text is not") {
    val base = "abcdefghijklmnopqrstuvwxyz0123456789"
    val df = Seq(base, "XX" + base, base.reverse).toDF("text")
      .select(TF.fingerprint(col("text")).as("fp"),
        TF.rollingMinFingerprint(col("text")).as("w"))
    val rows = df.collect()
    assert(rows(0).getString(0) != rows(1).getString(0)) // md5 differs on prefix
    assert(rows(0).getString(1) == rows(1).getString(1)) // winnow min survives
    assert(rows(0).getString(1) != rows(2).getString(1))
  }

  test("vector dot/cosine/l2 on known values") {
    val df = Seq((Seq(1.0f, 2.0f, 2.0f), Seq(2.0f, 4.0f, 4.0f)),
      (Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f)))
      .toDF("a", "b")
      .select(VF.dot(col("a"), col("b")).as("dot"),
        VF.cosine(col("a"), col("b")).as("cos"),
        VF.l2Distance(col("a"), col("b")).as("l2"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 18.0)
    assert(math.abs(rows(0).getDouble(1) - 1.0) < 1e-12) // parallel
    assert(rows(1).getDouble(0) == 0.0 && rows(1).getDouble(1) == 0.0)
    assert(math.abs(rows(1).getDouble(2) - math.sqrt(2)) < 1e-12)
  }

  test("hyperplane bucket: deterministic, same vector → same bucket") {
    val planes = VF.hyperplanes(8, 3)
    assert(planes == VF.hyperplanes(8, 3)) // seeded
    val df = Seq(Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f),
      Seq(-1.0f, -2.0f, -3.0f)).toDF("v")
      .select(VF.hyperplaneBucket(col("v"), planes).as("b"))
    val rows = df.as[String].collect()
    assert(rows(0).length == 8 && rows(0).forall(c => c == '0' || c == '1'))
    assert(rows(0) == rows(1))
    assert(rows(2) == rows(0).map(c => if (c == '1') '0' else '1')) // antipodal flips every bit
  }

  test("vocabHits counts with multiplicity") {
    val n = Seq("the cat and the hat").toDF("text")
      .select(TF.vocabHits(TF.tokens(col("text")), Seq("the", "and")))
      .as[Int].head()
    assert(n == 3)
  }
}
