package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CurationQueries, TextQueries}

/** Unit specs for the round-6 curation operators: crawl-style URL
  * canonicalization (variant collapse, tracking-param stripping,
  * blocklist host extraction) and the Gopher within-document
  * repetition/quality rule battery (hand-computed ppm metrics).
  */
class CurationRulesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(CurationQueries.canonicalizeUrl(col("u")))
      .as[String].collect().toSeq

  test("canonicalizeUrl collapses case/port/www/fragment/tracking variants") {
    val got = canon(
      "HTTPS://WWW.src0.Example.COM:443/Doc/3/?utm_source=feed&utm_medium=rss#top",
      "http://src0.example.com:80/doc/3?utm_campaign=x",
      "https://src0.example.com/doc/3/")
    assert(got == Seq.fill(3)("https://src0.example.com/doc/3"))
  }

  test("canonicalizeUrl keeps real params, drops interleaved utm params") {
    assert(canon("https://h.example.com/p?utm_source=a&id=7&utm_term=b") ==
      Seq("https://h.example.com/p?id=7"))
    // param survives with its value intact; '/?' folds into '?'
    assert(canon("https://h.example.com/p/?id=7&x=B#frag") ==
      Seq("https://h.example.com/p?id=7&x=b"))
  }

  test("urlHost extracts the blocklist key from a canonical url") {
    val hosts = Seq("https://src3.example.com/doc/1?id=2",
      "https://src9.example.com/doc/4")
      .toDF("u").select(CurationQueries.urlHost(col("u")))
      .as[String].collect().toSeq
    assert(hosts == Seq("src3.example.com", "src9.example.com"))
  }

  test("gopherRules hand-computed metrics on planted repetition") {
    // doc 0: "a b a b c" — dup 2-block "a b"×2 → 4 of 5 tokens;
    //   bigrams (a b, b a, a b, b c) → top 2 of 4 positions
    // doc 1: clean 60-token doc of 4-char words → keep
    val clean = (0 until 60).map(i => f"w${i}%03d").mkString(" ")
    val docs = Seq((0L, "a b a b c"), (1L, clean)).toDF("doc_id", "text")
    val got = TextQueries.gopherRules(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    // doc 0: sum_wlen = 9 - 4 = 5 → mean 1000000; dup 4*1e6/5 = 800000;
    //   top bigram 2*1e6/4 = 500000; fails min-tokens + all caps
    assert(got(0) == (0L, 5L, 1000000L, 800000L, 500000L, false))
    // doc 1: 60 tokens, mean word length 4 → 4000000 ppm, no repeated
    //   2-block, every bigram unique → top = 1 of 59 positions
    assert(got(1) == (1L, 60L, 4000000L, 0L, 1000000L / 59L, true))
  }

  test("temperature mixing keeps a larger share of low-resource classes") {
    // τ = 0.5 flattens: keep-rate_c ∝ w_c/toks_c ∝ 1/sqrt(toks_c), so
    // the smallest class must keep a strictly higher FRACTION of its
    // docs than the largest (both rates < 1 on this corpus).
    val q = graft.SparkEntry.queries("q_mix_temperature")
    val kept = q(spark, "/root/testdata/sf0.01")
      .select(col("lang"), col("n_kept")).as[(String, Long)].collect().toMap
    val totals = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .groupBy(col("lang")).count().as[(String, Long)].collect().toMap
    val rate = totals.map { case (l, n) => l -> kept.getOrElse(l, 0L).toDouble / n }
    val largest = totals.maxBy(_._2)._1 // en
    val smallest = totals.minBy(_._2)._1
    assert(rate(smallest) > rate(largest),
      s"expected flattening, got rates $rate")
  }

  test("domain filter verdict is uniform within a host") {
    val q = graft.SparkEntry.queries("q_domain_quality_filter")
    val perHost = q(spark, "/root/testdata/sf0.01")
      .groupBy(col("host"))
      .agg(countDistinct(col("kept")).as("v"), countDistinct(col("host_mean_ppm")).as("m"))
      .as[(String, Long, Long)].collect()
    assert(perHost.nonEmpty && perHost.forall(r => r._2 == 1L && r._3 == 1L))
  }

  test("gopherRules exercises both keep branches on the gate corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val keeps = TextQueries.gopherRules(docs)
      .groupBy(col("keep")).count().as[(Boolean, Long)].collect().toMap
    assert(keeps.getOrElse(true, 0L) > 0 && keeps.getOrElse(false, 0L) > 0)
  }

  test("dsir weights select target-vocab raw docs and reject raw-vocab ones") {
    // buckets of the four tokens are distinct mod 64 (59/43/60/63), so
    // no hash collision muddies the semantics: doc 10 shares the
    // target's vocabulary (positive log-ratio → selected), doc 11 uses
    // vocabulary the target never emits (negative → rejected)
    val docs = Seq(
      (0L, "en", "alpha beta alpha beta alpha beta"),
      (1L, "en", "beta alpha beta alpha"),
      (10L, "de", "alpha beta alpha"),
      (11L, "de", "zulu yankee zulu")
    ).toDF("doc_id", "lang", "text")
    val got = CurationQueries.dsirWeights(docs, col("lang") === "en")
      .orderBy("doc_id")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(got.map(_._1) == Seq(10L, 11L))
    assert(got(0)._3 > 0 && got(0)._4, s"target-like doc: ${got(0)}")
    assert(got(1)._3 < 0 && !got(1)._4, s"raw-only doc: ${got(1)}")
  }

  test("lm perplexity equals a driver-side add-one unigram replay") {
    // independent scalar replay of q_lm_perplexity on the sf0.001
    // corpus: same md5 split, same smoothing, same 1e-4 floor
    def bucket(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(s"lm|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 100
    }
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val freq = docs.filter(d => bucket(d._1) < 50)
      .flatMap(_._2.split(" ", -1)).groupBy(identity)
      .map { case (k, v) => k -> v.length.toLong }
    val T = freq.values.sum.toDouble
    val V = freq.size.toDouble
    val want = docs.filter(d => bucket(d._1) >= 50).map { case (id, text) =>
      val toks = text.split(" ", -1)
      val s = toks.groupBy(identity).map { case (tok, g) =>
        g.length * (math.log(T + V) - math.log(freq.getOrElse(tok, 0L) + 1.0))
      }.sum
      id -> (toks.length.toLong,
        math.floor(s / toks.length * 10000) / 10000)
    }.toMap
    val got = TextQueries.lmPerplexitySpec
      .run(spark, "/root/testdata/sf0.001")
      .select("doc_id", "n_toks", "avg_nll")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet == want.keySet)
    for ((id, (n, a)) <- want) {
      assert(got(id)._1 == n, s"doc $id token count")
      assert(math.abs(got(id)._2 - a) < 1.0001e-4, s"doc $id avg_nll")
    }
  }
}
