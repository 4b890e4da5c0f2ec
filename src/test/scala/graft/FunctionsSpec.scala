package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF, VectorFunctions => VF}

/** Unit tests for the extension-op building blocks (SURVEY §2.9). */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("canonical digest: native one-pass equals the declarative regex chain") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(23)
    val alphabet = "abcXYZ0189 ,.!?;:-_'\"\t()" // letters, digits, punct, runs
    val cases = ((1 to 200).map { _ =>
      (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    } ++ Seq("", "   ", "...", "  Hello,  WORLD!  ", "a", "7",
      "MiXeD CaSe 42!")).map(Tuple1(_))
    val df = cases.toDF("text")
    val declarative = md5(trim(regexp_replace(regexp_replace(
      lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")))
    val rows = df.select(col("text"),
        graft.functions.TextFunctions.canonicalDigestFast(col("text")).as("fast"),
        declarative.as("slow"))
      .collect()
    rows.foreach(r => assert(r.getString(1) == r.getString(2),
      s"diverged on ${r.getString(0).replace("\t", "\\t")}"))
  }

  test("winnowing guarantee: a shared span of >= w+k-1 chars shares a fingerprint") {
    val rnd = new scala.util.Random(19)
    def randStr(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    // planted 11-char (= w+k-1 for k=8, w=4) span at random offsets in
    // otherwise-unrelated strings — winnowing MUST select at least one
    // common fingerprint in every case
    val cases = (1 to 50).map { _ =>
      val span = randStr(11)
      (randStr(rnd.nextInt(30)) + span + randStr(rnd.nextInt(30)),
        randStr(rnd.nextInt(30)) + span + randStr(rnd.nextInt(30)))
    }
    val df = cases.toDF("a", "b").select(
      org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.array_intersect(
          TF.winnowSetFast(col("a")), TF.winnowSetFast(col("b")))).as("n"))
    val mins = df.as[Int].collect()
    assert(mins.forall(_ >= 1), s"guarantee violated: ${mins.count(_ == 0)} of 50 pairs")
    // and a doc shorter than w+k-1 yields the empty set
    val empty = Seq("tencharstr").toDF("a")
      .select(org.apache.spark.sql.functions.size(TF.winnowSetFast(col("a"))).as("n"))
      .as[Int].head()
    assert(empty == 0)
  }

  test("winnow set matches a host-side reference on ASCII and multi-byte text") {
    // pins BOTH code paths of WinnowSetExpr (ASCII byte-slice fast
    // path and the UTF8String.substring fallback) to the char-gram
    // semantics the DuckDB oracle replays with substr()
    def ref(text: String, k: Int = 8, w: Int = 4): Seq[String] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val nGrams = text.length - k + 1
      if (nGrams < w) return Seq.empty
      val grams = (0 until nGrams).map { i =>
        md.reset()
        md.digest(text.substring(i, i + k).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      }
      (0 to nGrams - w).map(j => grams.slice(j, j + w).min).distinct
    }
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "café déjà vu über naïve — un café über tout déjà",
      "ascii and ünïcode mixed in the same document body")
    val got = texts.toDF("text").select(TF.winnowSetFast(col("text")))
      .as[Seq[String]].collect()
    texts.zip(got).foreach { case (t, g) =>
      assert(g == ref(t), s"winnow diverged on: ${t.take(30)}")
    }
  }

  test("shingles: word 3-grams; short docs collapse to whole text") {
    val df = Seq("a b c d e", "a b").toDF("text")
      .select(TF.shingles(col("text")).as("s"))
    val rows = df.as[Seq[String]].collect()
    assert(rows(0) == Seq("a b c", "b c d", "c d e"))
    assert(rows(1) == Seq("a b"))
  }

  test("minhash: identical docs → identical signature; values in [0, P)") {
    val df = Seq("the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog",
      "an entirely different document about spark engines at scale")
      .toDF("text")
      .select(TF.minhashes(TF.shingleHashes(TF.shingleSet(col("text"))), 8).as("mh"),
        TF.lshBands(
          TF.minhashes(TF.shingleHashes(TF.shingleSet(col("text"))), 8), 4, 2)
          .as("bands"))
    val rows = df.collect()
    assert(rows(0) == rows(1))
    assert(rows(0) != rows(2))
    val mh = rows(0).getSeq[Long](0)
    assert(mh.length == 8 && mh.forall(v => v >= 0 && v < TF.MinhashP))
    assert(rows(0).getSeq[Long](1).length == 4)
  }

  test("native expressions match the declarative HOF formulation") {
    val texts = Seq("a b c d e f g h", "one two", "x", "",
      "the quick brown fox jumps over the lazy dog again and again")
    val df = texts.toDF("text").select(
      TF.shingleSet(col("text")).as("s_hof"),
      TF.shingleSetFast(col("text")).as("s_fast"),
      TF.minhashes(TF.shingleHashes(TF.shingleSet(col("text"))), 8).as("mh_hof"),
      TF.minhashSigFast(col("text"), 8).as("mh_fast"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
      assert(r.getSeq[Long](2) == r.getSeq[Long](3))
    }
  }

  test("minhash jaccard estimate tracks true jaccard") {
    // two docs sharing most shingles should agree on most minhashes
    val near = Seq(
      "a b c d e f g h i j k l m n o p q r s t",
      "a b c d e f g h i j k l m n o p q r s z")
    val far = Seq(near.head, "z y x w v u t s r q p o n m l k j i h g")
    def agree(ts: Seq[String]): Int = {
      val sigs = ts.toDF("text")
        .select(TF.minhashes(TF.shingleHashes(TF.shingleSet(col("text"))), 8))
        .as[Seq[Long]].collect()
      sigs(0).zip(sigs(1)).count { case (x, y) => x == y }
    }
    assert(agree(near) > agree(far))
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

  test("native SimHashSigExpr matches the declarative md5 simhash") {
    val texts = Seq(
      "spark streaming batch window join filter agg",
      "a b  c", // double space → empty token, both paths must keep it
      "single",
      "totally unrelated words about cooking pasta tonight")
    val rows = texts.toDF("text")
      .select(TF.simhash(col("text")).as("slow"),
        TF.simhashFast(col("text")).as("fast"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // 60-bit contract: the top nibble is always clear
    rows.foreach(r => assert((r.getLong(1) >>> 60) == 0L))
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

  test("HLL approx distinct is within 5% of exact (quantitative guard " +
      "for the one remaining rows-only query)") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val exact = li.select(countDistinct(col("l_partkey"))).as[Long].head()
    val approx = li.select(approx_count_distinct(col("l_partkey")))
      .as[Long].head()
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr < 0.05, s"approx=$approx exact=$exact relErr=$relErr")
    // and per-group (the q_agg_approx_distinct shape)
    val joined = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey")).as("approx"))
      .collect()
    joined.foreach { r =>
      val e = r.getLong(1).toDouble
      assert(math.abs(r.getLong(2) - e) / e < 0.05, r.toString)
    }
  }

  test("native BigramsExpr: consecutive pairs, empty for short docs") {
    val rows = Seq("a b c d", "one two", "single", "")
      .toDF("text").select(TF.bigramsFast(col("text")))
      .as[Seq[String]].collect()
    assert(rows(0) == Seq("a b", "b c", "c d"))
    assert(rows(1) == Seq("one two"))
    assert(rows(2).isEmpty) // declarative sequence(1,0) would descend
    assert(rows(3).isEmpty || rows(3) == Seq()) // "" splits to one token
  }

  test("approx_percentile tracks exact percentile within 1% of the " +
      "value range (sketch-family guard alongside HLL)") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val row = li.select(
      expr("percentile(l_extendedprice, array(0.5D, 0.9D))"),
      expr("approx_percentile(l_extendedprice, array(0.5D, 0.9D), 1000)"),
      max(col("l_extendedprice")) - min(col("l_extendedprice"))).head()
    val exact = row.getSeq[Double](0)
    val approx = row.getSeq[Double](1)
    val range = row.getDouble(2)
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(e - a) / range < 0.01, s"exact=$e approx=$a range=$range")
    }
  }

  test("randomized parity: native simhash/fingerprint/bigrams match " +
      "their declarative forms on arbitrary ASCII docs") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc XY12.@-  " // repeated spaces → empty tokens
    val docs = Seq.fill(40)(
      (0 until (1 + rnd.nextInt(60)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      .filter(_.nonEmpty)
    val rows = docs.toDF("text")
      .select(
        TF.simhash(col("text")).as("sh_slow"),
        TF.simhashFast(col("text")).as("sh_fast"),
        TF.rollingMinFingerprint(col("text")).as("fp_slow"),
        TF.rollingMinFingerprintFast(col("text")).as("fp_fast"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"simhash diverged: $r")
      assert(r.getString(2) == r.getString(3), s"fingerprint diverged: $r")
    }
    // bigrams vs an independent host-side model
    val got = docs.toDF("text").select(TF.bigramsFast(col("text")))
      .as[Seq[String]].collect()
    docs.zip(got).foreach { case (d, bs) =>
      val toks = d.split(" ", -1)
      val want = if (toks.length < 2) Seq.empty
        else toks.sliding(2).map(_.mkString(" ")).toSeq
      assert(bs == want, s"bigrams diverged for ${d.take(30)}")
    }
  }

  test("native RollingMinFingerprintExpr matches the declarative form") {
    val texts = Seq(
      "abcdefghijklmnopqrstuvwxyz0123456789",
      "short", // < k chars → whole-text gram
      "", // empty → md5 of empty string
      "café déjà vu über naïve" // multi-byte chars: substr is per-char
    )
    val rows = texts.toDF("text")
      .select(TF.rollingMinFingerprint(col("text")).as("slow"),
        TF.rollingMinFingerprintFast(col("text")).as("fast"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
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
