package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `canonical_digest(text)` → hex md5 of the canonicalized text: ASCII
  * lowercase, every char outside `[a-z0-9 ]` becomes a space, space
  * runs collapse, leading/trailing space trimmed — the normalization
  * in front of canonicalizing exact dedup (X1).
  *
  * The declarative form (`md5(trim(regexp_replace(regexp_replace(
  * lower(text), "[^a-z0-9 ]", " "), " +", " ")))`) walks the text
  * through two java.util.regex passes and three intermediate strings
  * per row; this expression produces the identical digest in ONE byte
  * pass with zero intermediate allocation beyond the canonical buffer,
  * and `doGenCode` keeps rows inside whole-stage codegen. Parity with
  * the declarative chain is spec-tested (FunctionsSpec) — the DuckDB
  * oracle keeps replaying the regex formulation.
  *
  * Unicode note: a non-ASCII code point is outside `[a-z0-9 ]`, so it
  * canonicalizes to a space exactly like the regex; its UTF-8
  * continuation bytes are consumed silently (one char → one space,
  * before collapsing). Exotic lowercasings that map non-ASCII INTO
  * `[a-z]` (e.g. İ) diverge from `lower()`-first engines by design —
  * both sides of that char are punctuation-stripped here.
  */
case class CanonicalDigestExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes = Seq(StringType)

  private val hexDigits = "0123456789abcdef".toCharArray

  def compute(text: UTF8String): UTF8String = {
    val n = text.numBytes()
    val buf = new Array[Byte](n)
    var out = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      val b = text.getByte(i)
      val u = b & 0xff
      if (u >= 0x80) {
        // one non-ASCII code point = one space trigger; continuation
        // bytes (10xxxxxx) ride along silently
        if ((u & 0xc0) != 0x80 && out > 0) pendingSpace = true
      } else {
        val c: Int =
          if (u >= 'A' && u <= 'Z') u + 32
          else if ((u >= 'a' && u <= 'z') || (u >= '0' && u <= '9')) u
          else -1 // space trigger (space, punctuation, controls)
        if (c < 0) {
          if (out > 0) pendingSpace = true
        } else {
          if (pendingSpace) { buf(out) = ' '; out += 1; pendingSpace = false }
          buf(out) = c.toByte
          out += 1
        }
      }
      i += 1
    }
    val md = RollingMinFingerprintExpr.md5Local.get()
    md.reset()
    md.update(buf, 0, out)
    val d = md.digest()
    val hex = new Array[Char](d.length * 2)
    var j = 0
    while (j < d.length) {
      hex(j * 2) = hexDigits((d(j) >> 4) & 0xf)
      hex(j * 2 + 1) = hexDigits(d(j) & 0xf)
      j += 1
    }
    UTF8String.fromString(new String(hex))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("canonicalDigestExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): CanonicalDigestExpr =
    copy(child = c)
}
