package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{coalesce, typedLit}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams of a text column — the blocking unit for
  * n-gram Jaccard, MinHash and decontamination.
  *
  * Why a custom expression: the equivalent SQL formulation
  * `array_distinct(transform(sequence(1, size(w)-n+1), i ->
  * concat_ws(' ', element_at(w, i), ...)))` with `w = split(trim(t))`
  * INLINES the split into every `element_at` lambda call — Catalyst
  * performs no common-subexpression elimination inside lambda bodies,
  * so a 54-token document re-tokenizes ~200 times (~2ms/doc
  * interpreted; a bare shingle explode over 5,000 docs measured 10.8s
  * at sf0.1). This kernel tokenizes once per row and runs inside
  * whole-stage codegen: same output, ~20x less work.
  *
  * Semantics match `split(trim(text), "\\s+")` + first-occurrence
  * `array_distinct` + single-space `concat_ws` exactly (equivalence
  * pinned in ExtensionsSpec) so existing DuckDB oracle SQL replays
  * unchanged.
  */
object Shingles {

  /** The kernel — also called from generated code. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    // UTF8String.trim trims ASCII spaces only, exactly like SQL trim
    val txt = s.trim().toString
    // Tok.splitWs == Pattern.split(str, -1) == Spark split (limit -1),
    // without the regex engine or String.split's per-call re-compile
    val toks = Tok.splitWs(txt)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String]
      var i = 0
      while (i <= toks.length - n) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    }
  }

  /** Column API: distinct word n-grams of `text`. NULL text yields an
    * EMPTY array — matching the `when(size(w) >= n, ...).otherwise([])`
    * SQL formulation this kernel replaced (`size(NULL)` is -1, so the
    * otherwise-branch fired), so `size(shingles(c)) === 0` keeps
    * finding shingle-less docs. The bare expression keeps standard
    * null-in-null-out SQL semantics. */
  def shingles(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    val expr = ColumnBridge.column(ShinglesExpr(ColumnBridge.expression(text), n))
    coalesce(expr, typedLit(Seq.empty[String]))
  }

  /** The kernel's occurrence-keeping sibling — also called from
    * generated code. */
  def computeAll(s: UTF8String, n: Int): ArrayData = {
    val txt = s.trim().toString
    val toks = Tok.splitWs(txt)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](toks.length - n + 1)
      var i = 0
      while (i <= toks.length - n) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** ALL n-gram occurrences in document order, duplicates kept — the
    * counting unit for frequency reports ([[graft.ops.TextAnalysis
    * .topNgrams]]), where "how often" matters as much as "whether".
    * Same kernel economics as [[shingles]] (tokenize once per row,
    * whole-stage codegen) and the same NULL/short-document → empty
    * array convention; semantics match the
    * `transform(sequence(1, size(w)-n+1), i -> concat_ws(' ', ...))`
    * SQL formulation exactly (equivalence pinned in ExtensionsSpec),
    * which re-tokenized the document once per element_at — the blowup
    * that made a 5,000-doc report measure ~10s at sf0.1. */
  def allShingles(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    val expr = ColumnBridge.column(
      AllShinglesExpr(ColumnBridge.expression(text), n))
    coalesce(expr, typedLit(Seq.empty[String]))
  }
}

case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingles needs a string column, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    Shingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)

  override def prettyName: String = "shingles"
}

case class AllShinglesExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"all_shingles needs a string column, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    Shingles.computeAll(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingles.computeAll($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): AllShinglesExpr =
    copy(child = newChild)

  override def prettyName: String = "all_shingles"
}
