package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the MinHash dedup pipeline
  * (SURVEY §2.9 X1).
  *
  * The declarative formulation (split → transform → array_distinct →
  * md5 → array_min chains) is correct but interpreted per element by
  * the higher-order-function evaluator, allocating intermediate arrays
  * at every step — profiled at ~50 ms/document. These expressions
  * compute identical values in one imperative pass (~100× less work),
  * which is the difference between hours and minutes over a 100 TB
  * corpus.
  *
  * Value-compatibility contract (bit-identical to the SQL oracle):
  *   tokens   = split(text, ' ')            (trailing empties kept)
  *   shingles = distinct k-token joins; whole text when < k tokens
  *   h31      = (first 15 md5 hex digits as u60) mod (2³¹−1)
  *   minhashᵢ = min over shingles of (aᵢ·h31 + bᵢ) mod (2³¹−1)
  */
object MinHash {
  val P: Long = 2147483647L

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit prefix of md5(utf8(s)) — equal to parsing the first 15 hex
    * chars of the digest — reduced mod P. */
  def hash31(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var be = 0L
    var i = 0
    while (i < 8) { be = (be << 8) | (d(i) & 0xffL); i += 1 }
    (be >>> 4) % P
  }

  /** Distinct word k-shingles in first-occurrence order (matches
    * array_distinct / list_distinct semantics). */
  def shingleSet(text: UTF8String, k: Int): Array[UTF8String] = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < k) return Array(text)
    val out = new java.util.LinkedHashSet[String]((toks.length - k + 1) * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out.add(sb.toString)
      i += 1
    }
    val arr = new Array[UTF8String](out.size)
    val it = out.iterator()
    var n = 0
    while (it.hasNext) { arr(n) = UTF8String.fromString(it.next()); n += 1 }
    arr
  }
}

/** `shingle_set(text)` → array<string>: distinct word k-shingles.
  *
  * doGenCode emits a call to the compiled compute method — the row stays
  * inside the surrounding whole-stage-codegen span (a CodegenFallback
  * here would split the span and force interpreted evaluation of every
  * enclosing expression).
  */
case class ShingleSetExpr(child: Expression, k: Int = 3)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  def compute(text: UTF8String): GenericArrayData =
    new GenericArrayData(
      MinHash.shingleSet(text, k).asInstanceOf[Array[Any]])

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleSetExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): ShingleSetExpr =
    copy(child = c)
}

/** `bigrams(text)` → array<string>: consecutive token pairs
  * (multiplicities kept) in one pass. The declarative form
  * (`transform(sequence(1, n-1), i -> concat_ws(' ', t[i], t[i+1]))`)
  * is interpreted per element AND silently breaks on 1-token documents
  * (Spark's `sequence(1, 0)` DESCENDS to [1, 0]); this returns the
  * empty array there, matching DuckDB's `generate_series(1, 0)`. */
case class BigramsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  def compute(text: UTF8String): GenericArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < 2)
      return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - 1)
    val sb = new java.lang.StringBuilder(48)
    var i = 0
    while (i < toks.length - 1) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1))
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramsExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): BigramsExpr =
    copy(child = c)
}

/** `minhash_sig(text)` → array<long>: the full MinHash signature in one
  * pass — shingle, hash, and all `coefs.length` affine mins fused. */
case class MinHashSigExpr(child: Expression, coefs: Seq[(Long, Long)], k: Int = 3)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val as: Array[Long] = coefs.map(_._1).toArray
  private lazy val bs: Array[Long] = coefs.map(_._2).toArray

  def compute(text: UTF8String): GenericArrayData = {
    val shingles = MinHash.shingleSet(text, k)
    val n = as.length
    val mins = Array.fill(n)(Long.MaxValue)
    var s = 0
    while (s < shingles.length) {
      val h = MinHash.hash31(shingles(s))
      var i = 0
      while (i < n) {
        val v = (as(i) * h + bs(i)) % MinHash.P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSigExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
    copy(child = c)
}

/** `token_in_set_count(text)` → long: occurrences (multiplicities
  * kept) of whitespace-split tokens that belong to a fixed word set,
  * in one pass. The declarative form
  * (`size(filter(split(text, ' '), t -> t IN (...)))`) routes through
  * the interpreted higher-order-function evaluator per token AND
  * materializes the filtered array just to take its size; this counts
  * in place and stays inside whole-stage codegen. Token semantics
  * match `split(text, ' ')`: consecutive separators yield empty
  * tokens, which never match a non-empty word set.
  */
case class TokenInSetCountExpr(child: Expression, words: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  // non-string children fail at analysis time, not with a runtime
  // ClassCastException inside codegen
  override def inputTypes = Seq(StringType)

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def compute(text: UTF8String): Long = {
    // manual byte scan: UTF8String.split is regex-backed (Pattern per
    // row), which defeats the hot-path purpose. A 0x20 byte never
    // occurs inside a multi-byte UTF-8 sequence, so splitting on the
    // raw byte is exact; fromAddress wraps each token as a zero-copy
    // view for the set probe — no arrays materialized.
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val n = text.numBytes()
    var c = 0L
    var tokStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || text.getByte(i) == 0x20.toByte) {
        if (set.contains(UTF8String.fromAddress(base, off + tokStart, i - tokStart)))
          c += 1
        tokStart = i + 1
      }
      i += 1
    }
    c
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenInSetCountExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): TokenInSetCountExpr =
    copy(child = c)
}
