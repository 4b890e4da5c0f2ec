package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}
import graft.plans.GraftExtensions

/** SQL-facing registration of the native expressions. */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("minhash_sig / shingle_set callable from SQL, equal to Column API") {
    GraftExtensions.register(spark)
    Seq("the quick brown fox jumps over the lazy dog")
      .toDF("text").createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      "SELECT shingle_set(text) AS s, minhash_sig(text, 8) AS mh FROM ext_docs")
      .collect().head
    val viaCol = Seq("the quick brown fox jumps over the lazy dog").toDF("text")
      .select(TF.shingleSetFast(col("text")).as("s"),
        TF.minhashSigFast(col("text"), 8).as("mh"))
      .collect().head
    assert(viaSql.getSeq[String](0) == viaCol.getSeq[String](0))
    assert(viaSql.getSeq[Long](1) == viaCol.getSeq[Long](1))
  }

  test("jl_project callable from SQL, equal to Column API") {
    GraftExtensions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("ext_emb")
    val viaSql = spark.sql(
      "SELECT vec_id, jl_project(embedding, 4) AS p FROM ext_emb ORDER BY vec_id")
      .as[(Long, Seq[Long])].collect()
    val viaCol = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.jlProject(col("embedding"), 4).as("p"))
      .orderBy("vec_id").as[(Long, Seq[Long])].collect()
    assert(viaSql.nonEmpty && viaSql.toSeq == viaCol.toSeq)
  }

  test("cms_estimate probes a count_min_sketch binary from SQL") {
    GraftExtensions.register(spark)
    Seq("a", "a", "a", "b", "b", "c").toDF("term")
      .createOrReplaceTempView("cms_terms")
    val rows = spark.sql(
      """WITH sk AS (SELECT count_min_sketch(term, 0.01d, 0.99d, 7) AS s
                     FROM cms_terms)
         SELECT term, cms_estimate(sk.s, term) AS est
         FROM (SELECT DISTINCT term FROM cms_terms) t, sk
         ORDER BY term""").collect()
    val est = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    // sketch never undercounts; at this tiny cardinality it is exact
    assert(est == Map("a" -> 3L, "b" -> 2L, "c" -> 1L), est)
  }

  test("count_min_sketch is merge-associative: 32-partition aggregate equals 1-partition") {
    // the property that makes the heavy-hitters pipeline distributed:
    // per-executor partial sketches merged by the final aggregate are
    // BIT-identical to sketching the stream serially — estimates are
    // therefore independent of partitioning / cluster size
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def sketch(parts: Int): Array[Byte] = docs.repartition(parts)
      .selectExpr("explode(split(lower(text), ' ')) AS term")
      .selectExpr("count_min_sketch(term, 0.001d, 0.99d, 7) AS sk")
      .collect().head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(sketch(32), sketch(1)))
  }

  test("builder-time extension injects the same functions") {
    // new session object sharing the context, with extensions applied
    // via the documented withExtensions path
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    GraftExtensions.register(s2) // getOrCreate may return the shared session
    assert(s2.sql("SELECT size(minhash_sig('a b c d')) AS n")
      .collect().head.getInt(0) == 8)
  }
}
