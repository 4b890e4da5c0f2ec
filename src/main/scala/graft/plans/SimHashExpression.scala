package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `simhash(text)` → long: 60-bit md5-derived SimHash signature in one
  * imperative pass (SURVEY §2.9 X1).
  *
  * Value-compatibility contract (bit-identical to the DuckDB oracle —
  * the same md5-replay pattern proven for MinHash in
  * [[MinHashSigExpr]]):
  *   tokens  = split(text, ' ')                  (trailing empties kept)
  *   h60     = first 15 md5 hex digits of token as u60
  *   votes_b = Σ over tokens (with multiplicity) of ((h60>>b)&1)·2−1
  *   sig     = Σ over b in [0,60) with votes_b > 0 of 2^b
  *
  * 60 bits (not 64) because one md5 prefix yields exactly 15 hex
  * digits — enough for near-dup bucketing while keeping the whole
  * derivation a single cross-engine-replayable hash per token.
  *
  * doGenCode emits a call to the compiled compute method so the row
  * stays inside the surrounding whole-stage-codegen span.
  */
case class SimHashSigExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  def compute(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val votes = new Array[Int](60)
    var i = 0
    while (i < toks.length) {
      val h = SimHashSigExpr.hash60(toks(i))
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHashSigExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): SimHashSigExpr =
    copy(child = c)
}

object SimHashSigExpr {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit prefix of md5(utf8(s)) — equal to parsing the first 15 hex
    * chars of the digest (same derivation as [[MinHash.hash31]] without
    * the mod-P reduction). */
  def hash60(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var be = 0L
    var i = 0
    while (i < 8) { be = (be << 8) | (d(i) & 0xffL); i += 1 }
    be >>> 4
  }
}
