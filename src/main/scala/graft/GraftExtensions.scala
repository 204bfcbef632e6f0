package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.ops.{Fingerprint64Expression, LangIdExpression, MinHashExpression, SimHash64Expression}
import graft.parse.TrimHtmlExpression

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
  */
object GraftFunctions {

  private[graft] val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
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
