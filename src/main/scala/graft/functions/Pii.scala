package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Credit-card-candidate scrubbing with a Luhn checksum gate — the one
  * PII family a plain `regexp_replace` cannot express, because whether
  * a 16-digit candidate is PII depends on integer math over its
  * digits (ISO/IEC 7812 Luhn check — public knowledge), not on its
  * shape alone.
  *
  * One kernel pass per row: find `\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}\b`
  * candidates with a precompiled matcher, Luhn-check each, splice the
  * replacement over the valid ones. Candidates that fail the checksum
  * are left untouched (a 16-digit order id is not a card). `doGenCode`
  * delegates to the static methods so the surrounding projection stays
  * in whole-stage codegen.
  *
  * Cross-engine contract: the candidate pattern uses only constructs
  * with identical Java/RE2 semantics (char classes, bounded
  * quantifiers, `\b`), and the Luhn sum is pure integer math — the
  * q_pii_scrub_extended oracle replays both in DuckDB
  * (`list_transform` + `generate_series` over the digit string).
  */
object Pii {

  /** 16-digit card candidates, optionally ' ' or '-' grouped in 4s. */
  val CardPattern = "\\b\\d{4}[ -]?\\d{4}[ -]?\\d{4}[ -]?\\d{4}\\b"

  private val CardRe = java.util.regex.Pattern.compile(CardPattern)

  /** Luhn checksum over a digit-only string (ISO/IEC 7812): double
    * every second digit from the right, subtract 9 when that doubles
    * past 9, valid iff the total is ≡ 0 (mod 10). */
  def luhnValid(digits: String): Boolean = {
    var sum = 0
    var i = digits.length - 1
    var second = false
    while (i >= 0) {
      var d = digits.charAt(i) - '0'
      if (d < 0 || d > 9) return false
      if (second) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      second = !second
      i -= 1
    }
    sum % 10 == 0
  }

  private def stripSeps(cand: String): String = {
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    while (i < cand.length) {
      val c = cand.charAt(i)
      if (c != ' ' && c != '-') sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Replace Luhn-valid card candidates with `repl` — also called from
    * generated code. */
  def cardScrub(s: UTF8String, repl: UTF8String): UTF8String = {
    val str = s.toString
    val m = CardRe.matcher(str)
    var sb: java.lang.StringBuilder = null
    var last = 0
    while (m.find()) {
      if (luhnValid(stripSeps(m.group()))) {
        if (sb == null) sb = new java.lang.StringBuilder(str.length)
        sb.append(str, last, m.start()).append(repl.toString)
        last = m.end()
      }
    }
    if (sb == null) s
    else {
      sb.append(str, last, str.length)
      UTF8String.fromString(sb.toString)
    }
  }

  /** Count of Luhn-valid card candidates — also called from generated
    * code. */
  def cardCount(s: UTF8String): Int = {
    val m = CardRe.matcher(s.toString)
    var n = 0
    while (m.find()) if (luhnValid(stripSeps(m.group()))) n += 1
    n
  }

  def cardScrubCol(text: Column, replacement: String): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      CardScrubExpr(ColumnBridge.expression(text), replacement))
  }

  def cardCountCol(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(CardCountExpr(ColumnBridge.expression(text)))
  }
}

/** See [[Pii.cardScrub]]. */
case class CardScrubExpr(child: Expression, replacement: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"card_scrub needs a string column, got ${other.catalogString}")
    }

  private val replUtf8 = UTF8String.fromString(replacement)

  override protected def nullSafeEval(input: Any): Any =
    Pii.cardScrub(input.asInstanceOf[UTF8String], replUtf8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val repl = ctx.addReferenceObj("cardRepl", replUtf8,
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c => s"graft.functions.Pii.cardScrub($c, $repl)")
  }

  override protected def withNewChildInternal(newChild: Expression): CardScrubExpr =
    copy(child = newChild)

  override def prettyName: String = "card_scrub"
}

/** See [[Pii.cardCount]]. */
case class CardCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"card_count needs a string column, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    Pii.cardCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Pii.cardCount($c)")

  override protected def withNewChildInternal(newChild: Expression): CardCountExpr =
    copy(child = newChild)

  override def prettyName: String = "card_count"
}
