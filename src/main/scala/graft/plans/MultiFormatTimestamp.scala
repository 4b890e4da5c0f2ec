package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TimeZoneAwareExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.TimestampFormatter
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `multi_ts(text)` → timestamp: the reference's ordered multi-format
  * lenient timestamp parse (`functions/load_csv/main.py:121-130`) as
  * ONE native expression.
  *
  * The declarative form — `coalesce(try_to_timestamp(c, f1), ...,
  * try_to_timestamp(c, f4))` — attempts up to `formats.length` full
  * parser runs per row; on a repair pass over a raw corpus that is the
  * dominant per-row cost. This expression pre-dispatches on string
  * shape with SOUND feasibility checks (a format is skipped only when
  * it provably cannot parse the input):
  *
  *   - every literal separator character in the pattern (`-`, `/`,
  *     `:`, ` `) must occur in the input — a DateTimeFormatter literal
  *     is non-optional;
  *   - a pattern consisting purely of numeric field letters
  *     (`[yMdHms]+`, no text-month `MMM` run) can only parse all-digit
  *     inputs.
  *
  * Feasible formats are then tried in the ORIGINAL declared order with
  * Spark's own `TimestampFormatter.parseOptional` (the same parser
  * `try_to_timestamp` uses, exception-free) — so the first-hit-wins
  * semantics and every parse result are identical to the coalesce
  * chain; typically exactly one parser attempt runs instead of ~2.5.
  */
case class MultiFormatTimestampExpr(child: Expression, formats: Seq[String],
    timeZoneId: Option[String] = None)
    extends UnaryExpression with TimeZoneAwareExpression with ExpectsInputTypes {

  override def dataType: DataType = TimestampType
  override def inputTypes = Seq(StringType)
  override def nullable: Boolean = true
  override def prettyName: String = "multi_ts"

  override def withTimeZone(tz: String): TimeZoneAwareExpression =
    copy(timeZoneId = Some(tz))

  @transient private lazy val formatters: Array[TimestampFormatter] =
    formats.map(f => TimestampFormatter(f, zoneId, isParsing = true)).toArray

  // (required separator bytes, input-must-be-all-digits)
  @transient private lazy val reqs: Array[(Array[Char], Boolean)] =
    formats.map { f =>
      val seps = f.filterNot(_.isLetter).distinct.toArray
      val digitsOnly = f.nonEmpty && f.forall("yMdHms".contains(_)) &&
        !f.contains("MMM")
      (seps, digitsOnly)
    }.toArray

  private def feasible(s: String, seps: Array[Char],
                       digitsOnly: Boolean): Boolean = {
    var i = 0
    while (i < seps.length) {
      if (s.indexOf(seps(i)) < 0) return false
      i += 1
    }
    if (digitsOnly) {
      var j = 0
      while (j < s.length) {
        val c = s.charAt(j)
        if (c < '0' || c > '9') return false
        j += 1
      }
    }
    true
  }

  /** Boxed so NULL (no format parsed) can flow out of codegen. */
  def compute(t: UTF8String): java.lang.Long = {
    val s = t.toString
    var i = 0
    while (i < formatters.length) {
      val (seps, digitsOnly) = reqs(i)
      if (feasible(s, seps, digitsOnly)) {
        val r = formatters(i).parseOptional(s)
        if (r.isDefined) return java.lang.Long.valueOf(r.get)
      }
      i += 1
    }
    null
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("multiTsExpr", this)
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("multiTs")
      s"""
         |java.lang.Long $tmp = $ref.compute($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MultiFormatTimestampExpr =
    copy(child = c)
}
