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

  /** One MinHash value: min over the shingle set of md5("<i>|" ++ s). */
  def minhash(shingleSetCol: Column, i: Int): Column =
    array_min(transform(shingleSetCol, s => md5(concat(lit(s"$i|"), s))))

  /** LSH band hashes: H = bands·rowsPerBand minhashes, each band hashed
    * to one bucket key. Banding trades precision/recall: a pair agrees
    * on a band with probability jaccardʳ. */
  def bandHashes(shingleSetCol: Column, bands: Int, rowsPerBand: Int): Column = {
    val mh = (0 until bands * rowsPerBand).map(minhash(shingleSetCol, _))
    array((0 until bands).map { b =>
      md5(concat_ws("|", (0 until rowsPerBand).map(r => mh(b * rowsPerBand + r)): _*))
    }: _*)
  }

  /** 64-bit SimHash over token xxhash64s, no UDF: per token, bit b
    * contributes ±1; the signature takes the sign of each bit-sum.
    * (xxhash64 is fine here — SimHash has no cross-engine oracle.) */
  def simhash(text: Column): Column = {
    val bitVotes = aggregate(
      tokens(text),
      array_repeat(lit(0L), 64),
      (acc, tok) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          // shiftright with a Column shift amount needs the SQL-level
          // function (the Scala helper only takes a literal Int)
          b => call_function("shiftright", xxhash64(tok), b)
            .bitwiseAND(1) * 2 - 1),
        (a, v) => a + v))
    // assemble bits with shift+or (acc*2+bit would ANSI-overflow on
    // the sign bit)
    aggregate(
      zip_with(bitVotes, sequence(lit(63), lit(0), lit(-1)),
        (v, pos) => when(v > 0, call_function("shiftleft", lit(1L), pos))
          .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Whole-document fingerprint — md5 of the text. */
  def fingerprint(text: Column): Column = md5(text)

  /** Winnowing-style rolling fingerprint: minimum md5 over all
    * character k-grams — robust to document reordering at the edges,
    * replayable in any engine with md5 + substr. */
  def rollingMinFingerprint(text: Column, k: Int = 8): Column =
    array_min(transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => md5(text.substr(i, lit(k)))))

  /** Count of tokens (with multiplicity) that appear in `vocab`. */
  def vocabHits(toks: Column, vocab: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(vocab)))
}
