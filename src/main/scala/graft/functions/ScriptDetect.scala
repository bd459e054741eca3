package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Dominant writing system of a document in ONE codegen'd pass — the
  * kernel twin of [[graft.ops.TextAnalysis.detectScript]]'s reference
  * formulation (one `regexp_count` per script folded through a
  * when-chain). The fold's accumulator appeared twice per level, so
  * ten scripts produced a ~2^10-node expression tree: ~1.8s of
  * planning + codegen per QUERY before a single row was read, plus ten
  * regex scans per row. The kernel walks the code points once and
  * classifies each by binary search over the flattened sorted range
  * table; argmax keeps the EARLIER script on ties (strict >), count 0
  * yields "und" — the exact reference semantics, OpsSpec-pinned
  * against the regexp_count fold.
  *
  * `regexp_count(t, "[ranges]")` counts code points inside the class
  * (Java regex matches code points; supplementary characters fall
  * outside every BMP class), which is exactly what the code-point walk
  * counts.
  */
object ScriptDetect {

  def table(ranges: Seq[(String, Seq[(Int, Int)])]): ScriptDetectTable = {
    val flat = ranges.zipWithIndex.flatMap { case ((_, rs), i) =>
      rs.map { case (a, b) => (a, b, i) }
    }.sortBy(_._1).toArray
    // disjointness makes binary search by lo sufficient
    flat.sliding(2).foreach {
      case Array((_, h1, _), (l2, _, _)) =>
        require(h1 < l2, s"script ranges overlap: ..$h1 vs $l2..")
      case _ => ()
    }
    new ScriptDetectTable(ranges.map(_._1).toArray,
      flat.map(_._1), flat.map(_._2), flat.map(_._3))
  }

  /** Also called from generated code. */
  def detect(s: UTF8String, t: ScriptDetectTable): UTF8String = {
    val str = s.toString
    val counts = new Array[Int](t.names.length)
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      // binary search: greatest lo <= cp, then check hi
      var a = 0
      var b = t.lo.length - 1
      var hit = -1
      while (a <= b) {
        val m = (a + b) >>> 1
        if (t.lo(m) <= cp) { hit = m; a = m + 1 } else b = m - 1
      }
      if (hit >= 0 && cp <= t.hi(hit)) counts(t.idx(hit)) += 1
      i += Character.charCount(cp)
    }
    var best = 0
    var bi = -1
    i = 0
    while (i < counts.length) {
      // strict >: the earlier (higher-priority) script keeps ties
      if (counts(i) > best) { best = counts(i); bi = i }
      i += 1
    }
    if (bi < 0) UTF8String.fromString("und")
    else UTF8String.fromString(t.names(bi))
  }

  import org.apache.spark.sql.graft.ColumnBridge

  def of(text: Column, ranges: Seq[(String, Seq[(Int, Int)])]): Column =
    ColumnBridge.column(
      ScriptDetectExpr(ColumnBridge.expression(text), ranges))
}

/** See [[ScriptDetect.detect]]. `ranges` is config, not a child — the
  * case-class field stays the VALUE-equal Seq form (ADVICE r16: a
  * reference-equal table field defeated Catalyst canonicalization /
  * common-subexpression elimination between identical detectScript
  * expressions); the flattened lookup table is derived lazily and
  * reaches generated code as a referenced object. */
case class ScriptDetectExpr(child: Expression,
    ranges: Seq[(String, Seq[(Int, Int)])])
    extends UnaryExpression {

  @transient private lazy val table: ScriptDetectTable =
    ScriptDetect.table(ranges)

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"script_detect needs a string column, got ${other.catalogString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    ScriptDetect.detect(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("scriptTable", table,
      "graft.functions.ScriptDetectTable")
    defineCodeGen(ctx, ev, c => s"graft.functions.ScriptDetect.detect($c, $t)")
  }

  override protected def withNewChildInternal(newChild: Expression): ScriptDetectExpr =
    copy(child = newChild)

  override def prettyName: String = "script_detect"
}

/** Flattened [[ScriptDetect]] config: sorted disjoint
  * (lo, hi, scriptIdx) rows. Top-level (not nested in the object) so
  * generated code can name the type. */
final class ScriptDetectTable(val names: Array[String], val lo: Array[Int],
    val hi: Array[Int], val idx: Array[Int]) extends Serializable
