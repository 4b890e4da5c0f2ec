package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_min_fingerprint(text)` → string: winnowing-style rolling
  * fingerprint — the minimum md5 hex over all character k-grams — in
  * one imperative pass (SURVEY §2.9 X4).
  *
  * The declarative form (`array_min(transform(sequence(...),
  * i -> md5(substr(text, i, k))))`) materializes an array of hex
  * strings and evaluates the lambda interpreted per gram; profiled as
  * the second-slowest query in the battery once the bench materialized
  * real output. This expression computes the identical value — md5 of
  * the UTF-8 bytes of each k-character substring, minimum by hex-string
  * (= unsigned digest byte) order — without allocating the array.
  *
  * doGenCode emits a call to the compiled compute method so the row
  * stays inside the surrounding whole-stage-codegen span.
  */
case class RollingMinFingerprintExpr(child: Expression, k: Int = 8)
    extends UnaryExpression {
  override def dataType: DataType = StringType

  private val hexDigits = "0123456789abcdef".toCharArray

  def compute(text: UTF8String): UTF8String = {
    val md = RollingMinFingerprintExpr.md5Local.get()
    val n = text.numChars()
    // mirror greatest(length - (k-1), 1): at least one (possibly short)
    // gram so empty/short docs still fingerprint
    val grams = math.max(n - (k - 1), 1)
    // same ASCII fast path as WinnowSetExpr: hash byte slices in place
    // instead of quadratic UTF8String.substring walks
    val ascii = text.numBytes() == n
    val bytes = if (ascii) text.getBytes else null
    var min: Array[Byte] = null
    var i = 0
    while (i < grams) {
      md.reset()
      val d = if (ascii) {
        md.update(bytes, i, math.min(k, n - i))
        md.digest()
      } else md.digest(text.substring(i, i + k).getBytes)
      if (min == null || RollingMinFingerprintExpr.unsignedLess(d, min)) min = d
      i += 1
    }
    val hex = new Array[Char](min.length * 2)
    var j = 0
    while (j < min.length) {
      hex(j * 2) = hexDigits((min(j) >> 4) & 0xf)
      hex(j * 2 + 1) = hexDigits(min(j) & 0xf)
      j += 1
    }
    UTF8String.fromString(new String(hex))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rollingMinFingerprintExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): RollingMinFingerprintExpr =
    copy(child = c)
}

/** `winnow_set(text)` → array<string>: the DISTINCT winnowing-selected
  * fingerprints — minimum md5 hex per sliding window of `w` consecutive
  * character-`k`-gram hashes — in one imperative pass.
  *
  * This is the document-side artifact of verbatim-span detection
  * (Schleimer/Wilkerson/Aiken winnowing): any literal shared substring
  * of ≥ w + k − 1 characters between two documents GUARANTEES a shared
  * selected fingerprint, regardless of alignment. Documents shorter
  * than w + k − 1 characters yield the empty set (mirrored by the
  * empty generate_series ranges in the SQL replay).
  */
case class WinnowSetExpr(child: Expression, k: Int = 8, w: Int = 4)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val hexDigits = "0123456789abcdef".toCharArray

  private def toHex(d: Array[Byte]): String = {
    val hex = new Array[Char](d.length * 2)
    var j = 0
    while (j < d.length) {
      hex(j * 2) = hexDigits((d(j) >> 4) & 0xf)
      hex(j * 2 + 1) = hexDigits(d(j) & 0xf)
      j += 1
    }
    new String(hex)
  }

  def compute(text: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = text.numChars()
    val nGrams = n - k + 1
    if (nGrams < w)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val md = RollingMinFingerprintExpr.md5Local.get()
    // window-min over raw digests (unsigned byte order == hex string
    // order), hex-converting only the SELECTED mins — no per-gram
    // String allocation. ASCII fast path: one byte in UTF-8 per char,
    // so the k-char gram IS the byte slice [i, i+k) — hash it in place
    // (UTF8String.substring re-walks the string from position 0 on
    // EVERY call, which made gram extraction quadratic per document
    // and dominated the whole contamination scan).
    val ascii = text.numBytes() == n
    val bytes = if (ascii) text.getBytes else null
    val grams = new Array[Array[Byte]](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      if (ascii) {
        md.update(bytes, i, k)
        grams(i) = md.digest()
      } else {
        grams(i) = md.digest(text.substring(i, i + k).getBytes)
      }
      i += 1
    }
    val out = new java.util.LinkedHashSet[String]()
    var j = 0
    while (j <= nGrams - w) {
      var min = grams(j)
      var t = j + 1
      while (t < j + w) {
        if (RollingMinFingerprintExpr.unsignedLess(grams(t), min)) min = grams(t)
        t += 1
      }
      out.add(toHex(min))
      j += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var m = 0
    while (it.hasNext) { arr(m) = UTF8String.fromString(it.next()); m += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowSetExpr", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression): WinnowSetExpr =
    copy(child = c)
}

object RollingMinFingerprintExpr {
  private[plans] val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Unsigned lexicographic digest compare == hex-string compare. */
  def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    a.length < b.length
  }
}
