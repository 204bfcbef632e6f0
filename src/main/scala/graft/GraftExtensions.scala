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

  /** Analysis-time arity check: a SQL call with the wrong argument count
    * must surface as a clean error naming the function, not an
    * IndexOutOfBoundsException from the builder indexing args.
    */
  private def arity(name: String, expected: Int, args: Seq[Expression]): Unit =
    if (args.length != expected)
      throw new IllegalArgumentException(
        s"$name expects $expected argument(s), got ${args.length}")

  private[graft] val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_css_text" -> ((args: Seq[Expression]) => {
      arity("graft_css_text", 2, args)
      CssExtractExpression(args.head, strLit(args(1), "selector"), "text", "", 0)
    }),
    "graft_css_attr" -> ((args: Seq[Expression]) => {
      arity("graft_css_attr", 3, args)
      CssExtractExpression(args.head, strLit(args(1), "selector"), "attr",
                           strLit(args(2), "attr"), 0)
    }),
    "graft_trim_html" -> ((args: Seq[Expression]) => {
      arity("graft_trim_html", 1, args); TrimHtmlExpression(args.head)
    }),
    "graft_lang_id" -> ((args: Seq[Expression]) => {
      arity("graft_lang_id", 1, args); LangIdExpression(args.head)
    }),
    "graft_fingerprint64" -> ((args: Seq[Expression]) => {
      arity("graft_fingerprint64", 1, args); Fingerprint64Expression(args.head)
    }),
    "graft_simhash64" -> ((args: Seq[Expression]) => {
      arity("graft_simhash64", 1, args); SimHash64Expression(args.head)
    }),
    "graft_minhash" -> ((args: Seq[Expression]) => {
      arity("graft_minhash", 2, args)
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
