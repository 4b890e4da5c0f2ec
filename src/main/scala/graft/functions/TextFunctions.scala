package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines (SURVEY
  * §2.9 X1/X4): tokenization, shingling, MinHash signatures, SimHash,
  * fingerprinting, language/quality heuristics.
  *
  * Everything row-local is a composition of built-in (codegen'd or
  * vectorized higher-order) expressions — per-document work stays
  * narrow, shuffles happen only at the band-bucket / inverted-index
  * joins in the operators that use these.
  *
  * Cross-engine reproducibility: hashing uses `md5` (bit-identical in
  * every engine) rather than engine-private hash functions, so the
  * DuckDB oracle can replay signatures exactly. A lexicographic min
  * over `md5(i ++ "|" ++ shingle)` hex strings is a valid min-hash
  * family: each i defines an independent uniform permutation of the
  * shingle space.
  */
object TextFunctions {

  /** Whitespace tokenizer (testdata documents are single-spaced). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokenizer: alpha runs, digit runs, single symbols. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Word k-shingles (k consecutive tokens, space-joined); documents
    * shorter than k tokens collapse to one whole-text shingle. */
  def shingles(text: Column, k: Int = 3): Column = {
    val t = tokens(text)
    when(size(t) >= k,
      transform(sequence(lit(1), size(t) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(o => element_at(t, i + o)): _*)))
      .otherwise(array(text))
  }

  /** Distinct shingle set — the unit of Jaccard similarity. */
  def shingleSet(text: Column, k: Int = 3): Column = array_distinct(shingles(text, k))

  /** Native-expression variants (graft.plans) — identical values, one
    * imperative pass instead of interpreted HOF chains; use these on
    * hot paths. */
  private def expr(c: Column) =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)
  private def asCol(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)

  def shingleSetFast(text: Column, k: Int = 3): Column =
    asCol(graft.plans.ShingleSetExpr(expr(text), k))

  /** Consecutive token pairs, native one-pass (empty array for <2
    * tokens — see [[graft.plans.BigramsExpr]]). */
  def bigramsFast(text: Column): Column =
    asCol(graft.plans.BigramsExpr(expr(text)))

  /** Occurrences of whitespace-split tokens belonging to `words`,
    * native one-pass — replaces the interpreted
    * `size(filter(tokens, t -> t IN set))` HOF on hot paths
    * (see [[graft.plans.TokenInSetCountExpr]]). */
  def tokenInSetCount(text: Column, words: Seq[String]): Column =
    asCol(graft.plans.TokenInSetCountExpr(expr(text), words))

  def minhashSigFast(text: Column, n: Int, k: Int = 3): Column =
    asCol(graft.plans.MinHashSigExpr(expr(text), minhashCoefs(n), k))

  /** Hex md5 of ASCII-canonicalized text (lowercase, punctuation →
    * space, runs collapsed, trimmed) in one native byte pass — parity
    * with the declarative regex chain is spec-tested
    * (see [[graft.plans.CanonicalDigestExpr]]). */
  def canonicalDigestFast(text: Column): Column =
    asCol(graft.plans.CanonicalDigestExpr(expr(text)))

  /** MinHash is computed as ONE md5 per shingle (the only expensive
    * hash) reduced to a 31-bit integer, followed by cheap affine
    * permutations `(aᵢ·h + bᵢ) mod P` per hash function — k hash
    * functions cost k·N integer ops, not k·N md5s. P = 2³¹−1 keeps
    * every product under 2⁶² (no ANSI overflow), and the whole chain is
    * exact integer arithmetic any engine replays bit-identically.
    */
  val MinhashP: Long = 2147483647L // 2^31 - 1

  /** Deterministic affine coefficients (0 < aᵢ,bᵢ < P — any such a is a
    * permutation of Z_P since P is prime), seeded so the DuckDB oracle
    * embeds the same literals. */
  def minhashCoefs(n: Int, seed: Long = 7L): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((rnd.nextInt((MinhashP - 1).toInt).toLong + 1L,
      rnd.nextInt((MinhashP - 1).toInt).toLong + 1L))
  }

  /** 31-bit shingle hashes: md5 hex prefix (60 bits) → long → mod P. */
  def shingleHashes(shingleSetCol: Column): Column =
    transform(shingleSetCol,
      x => conv(substring(md5(x), 1, 15), 16, 10).cast("long") % MinhashP)

  /** All `n` MinHash values in one pass over the 31-bit hashes. */
  def minhashes(shingleHashesCol: Column, n: Int): Column = {
    val as = typedLit(minhashCoefs(n).map(_._1))
    val bs = typedLit(minhashCoefs(n).map(_._2))
    transform(sequence(lit(1), lit(n)), i =>
      array_min(transform(shingleHashesCol,
        h => (element_at(as, i) * h + element_at(bs, i)) % MinhashP)))
  }

  /** LSH band keys from the minhash array: rowsPerBand consecutive
    * minhashes packed into one integer key (base-P positional combine —
    * collision-free, and an 8-byte join key instead of a string). */
  def lshBands(minhashesCol: Column, bands: Int, rowsPerBand: Int): Column = {
    require(rowsPerBand == 2, "band packing implemented for r=2")
    array((0 until bands).map { b =>
      element_at(minhashesCol, b * rowsPerBand + 1) * MinhashP +
        element_at(minhashesCol, b * rowsPerBand + 2)
    }: _*)
  }

  /** 60-bit md5-derived SimHash, declarative reference implementation:
    * per token, bit b of the token's 60-bit md5 prefix contributes ±1;
    * the signature takes the sign of each bit-sum. md5 (not xxhash64)
    * so the DuckDB oracle replays signatures bit-identically — the same
    * replay pattern as MinHash. Hot paths use [[simhashFast]] (identical
    * values, one imperative pass). */
  def simhash(text: Column): Column = {
    // one md5 per token (hoisted into the outer transform), then cheap
    // bit probes per vote
    val tokenHashes = transform(tokens(text),
      tok => conv(substring(md5(tok), 1, 15), 16, 10).cast("long"))
    val bitVotes = aggregate(
      tokenHashes,
      array_repeat(lit(0L), 60),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(0), lit(59)),
          // shiftright with a Column shift amount needs the SQL-level
          // function (the Scala helper only takes a literal Int)
          b => call_function("shiftright", h, b).bitwiseAND(1) * 2 - 1),
        (a, v) => a + v))
    // assemble bits with shift+or (acc*2+bit would ANSI-overflow on
    // the top bit)
    aggregate(
      zip_with(bitVotes, sequence(lit(0), lit(59)),
        (v, pos) => when(v > 0, call_function("shiftleft", lit(1L), pos))
          .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Native-expression SimHash (graft.plans.SimHashSigExpr) — identical
    * values to [[simhash]], one imperative pass per document. */
  def simhashFast(text: Column): Column =
    asCol(graft.plans.SimHashSigExpr(expr(text)))

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Whole-document fingerprint — md5 of the text. */
  def fingerprint(text: Column): Column = md5(text)

  /** Winnowing-style rolling fingerprint: minimum md5 over all
    * character k-grams — robust to document reordering at the edges,
    * replayable in any engine with md5 + substr. Declarative reference
    * form; hot paths use [[rollingMinFingerprintFast]]. */
  def rollingMinFingerprint(text: Column, k: Int = 8): Column =
    array_min(transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => md5(text.substr(i, lit(k)))))

  /** Native-expression rolling fingerprint
    * (graft.plans.RollingMinFingerprintExpr) — identical values, one
    * imperative pass, no per-gram array allocation. */
  def rollingMinFingerprintFast(text: Column, k: Int = 8): Column =
    asCol(graft.plans.RollingMinFingerprintExpr(expr(text), k))

  /** DISTINCT winnowing-selected fingerprints (window `w` over char
    * `k`-gram md5s) — the verbatim-span detection artifact: any shared
    * literal substring of ≥ w+k−1 chars guarantees a shared selected
    * fingerprint (graft.plans.WinnowSetExpr). */
  def winnowSetFast(text: Column, k: Int = 8, w: Int = 4): Column =
    asCol(graft.plans.WinnowSetExpr(expr(text), k, w))

  /** Count of tokens (with multiplicity) that appear in `vocab`. */
  def vocabHits(toks: Column, vocab: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(vocab)))
}
