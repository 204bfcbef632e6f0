package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import org.apache.spark.unsafe.types.UTF8String

import graft.ops.{Fingerprint64Expression, LangIdExpression, MinHashExpression, SimHash64Expression}
import graft.parse.{CssExtractExpression, TrimHtmlExpression}

/** SQL surface for the engine's custom Catalyst expressions.
  *
  * Cluster use:
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * Embedded use:
  *   GraftFunctions.register(spark)
  *
  * Registered functions:
  *   graft_trim_html(html)          -> string   (F1 five-pass normalize)
  *   graft_lang_id(text)            -> string
  *   graft_fingerprint64(text)      -> bigint
  *   graft_simhash64(tokens array)  -> bigint
  *   graft_minhash(tokens array, k) -> array<bigint>
  *   graft_css_text(html, selector) -> string   (P5 selector engine)
  *   graft_css_attr(html, selector, attr) -> string
  */
object GraftFunctions {

  private def strLit(e: Expression, what: String): String = e match {
    case Literal(v: UTF8String, _) => v.toString
    case other =>
      throw new IllegalArgumentException(s"$what must be a string literal, got $other")
  }

  private[graft] val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_css_text" -> ((args: Seq[Expression]) =>
      CssExtractExpression(args.head, strLit(args(1), "selector"), "text", "", 0)),
    "graft_css_attr" -> ((args: Seq[Expression]) =>
      CssExtractExpression(args.head, strLit(args(1), "selector"), "attr",
                           strLit(args(2), "attr"), 0)),
    "graft_trim_html" -> ((args: Seq[Expression]) => TrimHtmlExpression(args.head)),
    "graft_lang_id" -> ((args: Seq[Expression]) => LangIdExpression(args.head)),
    "graft_fingerprint64" -> ((args: Seq[Expression]) => Fingerprint64Expression(args.head)),
    "graft_simhash64" -> ((args: Seq[Expression]) => SimHash64Expression(args.head)),
    "graft_minhash" -> ((args: Seq[Expression]) => {
      val k = args(1) match {
        case Literal(v: Int, _) => v
        case other =>
          throw new IllegalArgumentException(
            s"graft_minhash(tokens, k): k must be an integer literal, got $other")
      }
      MinHashExpression(args.head, k)
    })
  )

  /** Register into an already-running session's function registry. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}

/** spark.sql.extensions entry point — injects the same functions at
  * session build time on every executor-facing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.GraftExtensions", name),
        builder))
    }
}
