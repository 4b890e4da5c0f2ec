package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DedupQueries

/** Prefix-filter set-similarity join (q_dedup_prefix_filter): the
  * no-false-negative theorem checked against brute force on a corpus
  * built to punish weaker blockings, and the pruning claim (prefix
  * candidates ≪ all pairs) checked under a universal boilerplate
  * shingle — the shape that breaks a plain inverted-index join.
  */
class PrefixFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 40 docs, every one carrying the same boilerplate shingle "bp";
  // docs 2k/2k+1 are near-dup twins sharing {x_k, y_k, z_k} with one
  // private element each -> J = 3/5 = 0.6; unrelated docs share ONLY
  // the boilerplate -> J = 1/7.
  private def corpus = (0 until 40).map { i =>
    val k = i / 2
    val priv = s"priv_$i"
    (i.toLong, Seq("bp", s"x_$k", s"y_$k", s"z_$k", priv))
  }.toDF("doc_id", "s")

  test("pairs equal brute force at the threshold (zero false negatives)") {
    val got = DedupQueries.prefixFilterPairs(corpus, 0.5)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    val d = corpus.collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val want = (for {
      (a, sa) <- d; (b, sb) <- d if a < b
      j = (sa & sb).size.toDouble / (sa | sb).size if j >= 0.5
    } yield (a, b, math.round(j * 10000) / 10000.0)).toSet
    assert(want.size == 20, s"fixture should plant 20 twin pairs, got ${want.size}")
    assert(got == want)
    // derived verify granularity (np) is physical only: widening the
    // prefix join and set-attach shuffles far past the session
    // constant yields the identical verified pair set
    val widened = DedupQueries.prefixFilterPairs(corpus, 0.5, np = 257)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    assert(widened == want,
      "partition-widened prefixFilterPairs must equal the default plan")
  }

  test("universal boilerplate shingle does not quadratically blow up candidates") {
    val cand = DedupQueries.prefixFilterCandidates(corpus, 0.5).count()
    // all-pairs would be 40*39/2 = 780, every pair sharing "bp"; the
    // df-ordered prefix (3 of 5 elements, rarest first) excludes the
    // universal shingle from every prefix, so candidates collapse to
    // the twin pairs only
    assert(cand == 20, s"expected 20 candidates, got $cand (all-pairs = 780)")
  }

  test("incremental form keeps exactly the batch docs brute force keeps") {
    // deterministic word-soup corpus over a 10-word vocabulary, with
    // planted cross-side near-dups (batch doc 4k+1 = corpus doc 4k
    // with a one-word tail edit -> high 3-gram overlap); the other
    // batch docs are independent word soup and should survive
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val rng = new scala.util.Random(7)
    def sentence() = Seq.fill(12 + rng.nextInt(8))(vocab(rng.nextInt(10)))
    val base = (0 until 30).map(i => i.toLong -> sentence()).toMap
    val texts = base.map { case (i, toks) =>
      if (i % 4 == 1) i -> (base(i - 1).dropRight(1) :+ "omega")
      else i -> toks
    }
    val df = texts.toSeq.map { case (i, toks) => (i, toks.mkString(" ")) }
      .toDF("doc_id", "text")
    val batch = df.filter($"doc_id" % 2 === 1)
    val corp = df.filter($"doc_id" % 2 === 0)
    val kept = graft.operators.DedupQueries
      .prefixFilterIncremental(batch, corp, 0.5)
      .select("doc_id").as[Long].collect().toSet
    // brute force with the same shingling (3-gram windows, distinct)
    def shingles(toks: Seq[String]): Set[String] =
      if (toks.size >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else Set(toks.mkString(" "))
    def jac(a: Set[String], b: Set[String]) =
      (a & b).size.toDouble / (a | b).size
    val want = texts.collect { case (i, toks) if i % 2 == 1 &&
      !texts.exists { case (j, c) =>
        j % 2 == 0 && jac(shingles(toks), shingles(c)) >= 0.5 } => i
    }.toSet
    assert(want.nonEmpty && want.size < 15,
      s"fixture should drop some but not all batch docs (kept ${want.size}/15)")
    assert(kept == want)
    // derived verify granularity (np) is physical only here too
    val widened = graft.operators.DedupQueries
      .prefixFilterIncremental(batch, corp, 0.5, np = 257)
      .select("doc_id").as[Long].collect().toSet
    assert(widened == want,
      "partition-widened prefixFilterIncremental must equal the default plan")
  }

  test("delete path: tombstoned corpus docs stop witnessing drops; " +
    "stale df equals rebuild-without-deleted (VERDICT r16 #2)") {
    // same planted fixture as the incremental test: batch doc 4k+1 is
    // a near-dup of corpus doc 4k
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val rng = new scala.util.Random(7)
    def sentence() = Seq.fill(12 + rng.nextInt(8))(vocab(rng.nextInt(10)))
    val base = (0 until 30).map(i => i.toLong -> sentence()).toMap
    val texts = base.map { case (i, toks) =>
      if (i % 4 == 1) i -> (base(i - 1).dropRight(1) :+ "omega")
      else i -> toks
    }
    val df = texts.toSeq.map { case (i, toks) => (i, toks.mkString(" ")) }
      .toDF("doc_id", "text")
    val batch = df.filter($"doc_id" % 2 === 1)
    val corp = df.filter($"doc_id" % 2 === 0)
    // retract every 4k corpus doc — the planted twins' sole designed
    // witnesses — via the tombstone path (df left stale inside)
    val tomb = corp.filter($"doc_id" % 4 === 0).select($"doc_id")
    val keptDel = graft.operators.DedupQueries
      .prefixFilterIncremental(batch, corp, 0.5, tombstones = Some(tomb))
      .select("doc_id").as[Long].collect().toSet
    // brute force over corpus WITHOUT the tombstoned docs — the
    // rebuild the stale-df tombstone path must equal
    def shingles(toks: Seq[String]): Set[String] =
      if (toks.size >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else Set(toks.mkString(" "))
    def jac(a: Set[String], b: Set[String]) =
      (a & b).size.toDouble / (a | b).size
    val want = texts.collect { case (i, toks) if i % 2 == 1 &&
      !texts.exists { case (j, c) =>
        j % 2 == 0 && j % 4 != 0 &&
          jac(shingles(toks), shingles(c)) >= 0.5 } => i
    }.toSet
    assert(keptDel == want)
    // non-vacuous: the delete flipped real decisions — kept strictly
    // grows vs the pre-delete run (drops are monotone in the corpus)
    val keptPre = graft.operators.DedupQueries
      .prefixFilterIncremental(batch, corp, 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(keptPre.subsetOf(keptDel) && (keptDel -- keptPre).nonEmpty,
      s"tombstoning the planted witnesses must recover batch docs " +
        s"(pre=${keptPre.size}, post=${keptDel.size})")
  }

  test("incremental form: empty corpus keeps the whole batch, empty batch yields empty") {
    val batch = Seq((1L, "alpha beta gamma delta"), (2L, "eps zeta eta theta"))
      .toDF("doc_id", "text")
    val none = batch.filter($"doc_id" < 0)
    val keptAll = graft.operators.DedupQueries
      .prefixFilterIncremental(batch, none, 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(keptAll == Set(1L, 2L))
    val keptNone = graft.operators.DedupQueries
      .prefixFilterIncremental(none, batch, 0.5).count()
    assert(keptNone == 0)
  }

  test("boundary threshold 0.55: J-exactly-at-threshold pair survives FP rounding") {
    // double(0.55)*20 = 11.000000000000002 > the rational 11: without
    // the epsilon slack the length filter prunes a TRUE pair (min=11 <
    // 20*double(0.55)) and the prefix of the 20-element doc is one
    // element too short. Fixture: B's 11 elements are a subset of A's
    // 20 -> J = 11/20 = 0.55 exactly; filler docs give the shared
    // elements df > 1 variety so the prefix ordering is exercised.
    val docs = Seq(
      (0L, (0 until 20).map(i => s"e_$i")),
      (1L, (0 until 11).map(i => s"e_$i")),
      (2L, Seq("e_0", "q_1", "q_2", "q_3")),
      (3L, Seq("e_19", "r_1", "r_2", "r_3"))
    ).toDF("doc_id", "s")
    val got = DedupQueries.prefixFilterPairs(docs, 0.55)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    assert(got == Set((0L, 1L, 0.55)),
      s"pair at J == thr must survive the boundary arithmetic, got $got")
  }

  test("threshold 1.0 degenerates to single-element prefixes, still exact") {
    val got = DedupQueries.prefixFilterPairs(corpus, 1.0).count()
    assert(got == 0) // twins differ in one element each, J = 0.6 < 1
    val withClone = corpus.union(Seq((100L, Seq("bp", "x_0", "y_0", "z_0",
      "priv_0"))).toDF("doc_id", "s"))
    val exact = DedupQueries.prefixFilterPairs(withClone, 1.0)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact == Set((0L, 100L, 1.0)))
  }
}
