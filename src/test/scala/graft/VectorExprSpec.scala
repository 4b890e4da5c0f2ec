package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** The native vector expressions (graft.plans.VectorExpressions) must
  * be bit-identical to the declarative HOF formulation they replaced —
  * same double widening, same left-fold summation order, same NULL
  * semantics (zip_with's null padding on length mismatch, null
  * propagation from null elements).
  */
class VectorExprSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // the pre-native formulation, kept verbatim as the semantics oracle
  private def asD(v: Column) = v.cast("array<double>")
  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(asD(a), asD(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
  private def hofCosine(a: Column, b: Column): Column =
    hofDot(a, b) / (sqrt(hofDot(a, a)) * sqrt(hofDot(b, b)))
  private def hofL2(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(asD(a), asD(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  private def randomPairs(n: Int, dim: Int, seed: Long) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      (i.toLong,
        Array.fill(dim)(rnd.nextFloat() * 2f - 1f),
        Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    }.toDF("id", "a", "b")
  }

  test("dot/cosine/l2 are bit-identical to the HOF formulation on float arrays") {
    val df = randomPairs(500, 64, seed = 11)
      .select(col("id"),
        VectorFunctions.dot(col("a"), col("b")).as("nd"),
        hofDot(col("a"), col("b")).as("hd"),
        VectorFunctions.cosine(col("a"), col("b")).as("nc"),
        hofCosine(col("a"), col("b")).as("hc"),
        VectorFunctions.l2Distance(col("a"), col("b")).as("nl"),
        hofL2(col("a"), col("b")).as("hl"))
    // bit-identical: compare raw long bits, not within-epsilon
    val bad = df.filter(
      (col("nd").cast("string") =!= col("hd").cast("string")) ||
        (col("nc").cast("string") =!= col("hc").cast("string")) ||
        (col("nl").cast("string") =!= col("hl").cast("string")))
    assert(bad.count() == 0, s"native != HOF on: ${bad.limit(5).collect().mkString}")
  }

  test("mixed float/double sides (embedding vs literal hyperplane) match") {
    val planes = VectorFunctions.hyperplanes(4, 16)
    val df = randomPairs(100, 16, seed = 23)
    val plane = typedLit(planes.head)
    val out = df.select(
      VectorFunctions.dot(col("a"), plane).as("nd"),
      hofDot(col("a"), plane).as("hd"))
    assert(out.filter(col("nd").cast("string") =!= col("hd").cast("string"))
      .count() == 0)
  }

  test("NULL semantics: null array, length mismatch, null element") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0, 2.0), Array(3.0, 4.0)),
      (2L, null.asInstanceOf[Array[Double]], Array(3.0, 4.0)),
      (3L, Array(1.0, 2.0, 5.0), Array(3.0, 4.0))
    ).toDF("id", "a", "b")
    val withNullElem = df.withColumn("a2",
      when(col("id") === 1, array(lit(1.0), lit(null).cast("double")))
        .otherwise(col("a")))
    val out = df.select(col("id"),
      VectorFunctions.dot(col("a"), col("b")).as("d"),
      VectorFunctions.cosine(col("a"), col("b")).as("c"),
      VectorFunctions.l2Distance(col("a"), col("b")).as("l"))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) == 11.0)
    assert(!out(0).isNullAt(2) && !out(0).isNullAt(3))
    assert(out(1).isNullAt(1) && out(1).isNullAt(2) && out(1).isNullAt(3))
    assert(out(2).isNullAt(1) && out(2).isNullAt(2) && out(2).isNullAt(3),
      "length mismatch must yield NULL (zip_with pad semantics)")
    val nullElem = withNullElem
      .filter(col("id") === 1)
      .select(VectorFunctions.dot(col("a2"), col("b")).as("d")).collect()
    assert(nullElem(0).isNullAt(0), "null element must yield NULL")
  }

  test("integer-typed arrays widen like cast('array<double>')") {
    import spark.implicits._
    val df = Seq((Array(1L, 2L, 3L), Array(4, 5, 6))).toDF("a", "b")
    val r = df.select(
      VectorFunctions.dot(col("a"), col("b")).as("nd"),
      hofDot(col("a"), col("b")).as("hd")).collect()(0)
    assert(r.getDouble(0) == 32.0 && r.getDouble(0) == r.getDouble(1))
  }

  test("non-array input fails at analysis, not at runtime") {
    import spark.implicits._
    val df = Seq((1, 2)).toDF("a", "b")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorFunctions.dot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
  }

  test("ANN scoring stays inside whole-stage codegen with no lambda evaluator") {
    val e = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = e.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val scored = q.crossJoin(broadcast(c))
      .select(VectorFunctions.cosine(col("qv"), col("cv")).as("cos"))
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("LambdaFunction") && !plan.contains("lambdafunction"),
      s"interpreted HOF survived in:\n$plan")
    assert(plan.contains("vec_cosine"), s"native expression missing in:\n$plan")
    assert(scored.count() > 0)
  }

  test("jl_project matches an independent driver-side integer replay") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (0 until 50).map(id =>
      (id.toLong, Array.fill(16)(rng.nextFloat() * 2f - 1f)))
    val got = rows.toDF("id", "v")
      .select(col("id"), VectorFunctions.jlProject(col("v"), 4).as("p"))
      .as[(Long, Seq[Long])].collect().toMap
    // independent sign replay: parity of md5("j|i")'s 15 leading hex
    def sign(j: Int, i: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$j|$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex.take(15), 16) % 2 == 0) 1L else -1L
    }
    rows.foreach { case (id, v) =>
      val q = v.map(x => math.floor(x.toDouble * 1000000d).toLong)
      val want = (0 until 4).map(j =>
        q.indices.map(i => q(i) * sign(j, i)).sum)
      assert(got(id) == want, s"vec $id")
    }
  }

  test("jl_project projections of identical vectors are identical; ks differ") {
    import spark.implicits._
    val v = Array.fill(64)(0.25f)
    val df = Seq((1L, v), (2L, v)).toDF("id", "v")
    val ps = df.select(VectorFunctions.jlProject(col("v"), 8))
      .as[Seq[Long]].collect()
    assert(ps(0) == ps(1) && ps(0).length == 8)
    val p4 = df.select(VectorFunctions.jlProject(col("v"), 4))
      .as[Seq[Long]].collect()(0)
    assert(p4 == ps(0).take(4)) // sign rows are j-indexed: prefix-stable
  }

  test("jl_project stays inside whole-stage codegen") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val proj = e.select(VectorFunctions.jlProject(col("embedding"), 8).as("p"))
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("lambdafunction"))
    assert(plan.contains("jl_project"), s"native expression missing in:\n$plan")
    assert(proj.count() > 0)
  }
}
