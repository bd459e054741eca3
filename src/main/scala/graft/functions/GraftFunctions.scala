package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SQL registration for graft's custom Catalyst expressions, so user
  * feature SQL (the reference's `{source}` queries) can call them:
  *
  *   SELECT simhash64(split(text, '\\s+')), vec_dot(a, b) FROM t
  *
  * Two registration paths:
  *  - [[GraftExtensions]] for session construction:
  *    `SparkSession.builder().withExtensions(new GraftExtensions)` or
  *    `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *  - [[GraftFunctions.register]] for an already-built session.
  */
object GraftFunctions {

  private def builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> {
      case Seq(c) => SimHash64Expr(c)
      case args => throw new IllegalArgumentException(
        s"simhash64 takes 1 argument, got ${args.length}")
    },
    "simhash60md5" -> {
      case Seq(c) => SimHashMd5Expr(c)
      case args => throw new IllegalArgumentException(
        s"simhash60md5 takes 1 argument, got ${args.length}")
    },
    "vec_dot" -> {
      case Seq(a, b) => VecDotExpr(a, b)
      case args => throw new IllegalArgumentException(
        s"vec_dot takes 2 arguments, got ${args.length}")
    },
    "unicode_normalize" -> {
      case Seq(text, form) =>
        val f = form match {
          case other if other.foldable && other.dataType == org.apache.spark.sql.types.StringType =>
            Option(other.eval()).map(_.toString).getOrElse(throw new IllegalArgumentException(
              "unicode_normalize(text, form): form must not be NULL"))
          case _ => throw new IllegalArgumentException(
            "unicode_normalize(text, form): form must be a string literal (NFC/NFD/NFKC/NFKD)")
        }
        NormalizeExpr(text, f)
      case Seq(text) => NormalizeExpr(text, "NFKC")
      case args => throw new IllegalArgumentException(
        s"unicode_normalize takes 1-2 arguments (text[, form]), got ${args.length}")
    },
    "shingles" -> {
      case Seq(text, n) =>
        import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
        val size = n match {
          case other if other.foldable &&
              Seq(ByteType, ShortType, IntegerType, LongType).contains(other.dataType) =>
            other.eval() match {
              case v: Number if v.longValue() == v.intValue() => v.intValue()
              case null => throw new IllegalArgumentException(
                "shingles(text, n): n must not be NULL")
              case v => throw new IllegalArgumentException(
                s"shingles(text, n): n=$v out of Int range")
            }
          case _ => throw new IllegalArgumentException(
            "shingles(text, n): n must be an integer literal")
        }
        ShinglesExpr(text, size)
      case args => throw new IllegalArgumentException(
        s"shingles takes 2 arguments (text, n), got ${args.length}")
    }
  )

  /** Register on a live session (temp functions, session-scoped). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  private[functions] def injected: Seq[
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    builders.map { case (name, builder) =>
      (FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder)
    }
}

/** `spark.sql.extensions`-compatible injector. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.injected.foreach(ext.injectFunction)
}
