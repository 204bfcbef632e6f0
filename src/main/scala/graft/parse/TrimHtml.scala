package graft.parse

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's HTML-stripping normalization, reproduced behaviorally.
  *
  * Reference: `trimHtml` at apna/main.go:179-196 (verbatim duplicates at
  * indeed/main.go:227-244, jobstreet/main.go:175-192,
  * kitalulus/main.go:179-196, loker/main.go:150-167,
  * olx_c226/main.go:278-295). Five passes, order significant:
  *
  *   1. every `<...>` tag lowercased in place (non-greedy `<[\S\s]+?>`)
  *   2. `<style ...</style>` blocks removed (non-greedy)
  *   3. `<script ...</script>` blocks removed (non-greedy)
  *   4. remaining tags replaced by `\n`
  *   5. runs of 2+ whitespace collapsed to `\n`; result trimmed
  *
  * Pass order matters: pass 1 exists so that `<STYLE>`/`<Script>` match
  * the lowercase patterns of passes 2-3. Go's RE2 `[\S\s]+?` is
  * semantically identical to Java's here (no backtracking subtleties for
  * these patterns); property tests in TrimHtmlSpec assert idempotence and
  * no surviving `<tag>` pairs.
  */
object TrimHtml {
  private val pTag = Pattern.compile("<[\\S\\s]+?>")
  private val pStyle = Pattern.compile("<style[\\S\\s]+?</style>")
  private val pScript = Pattern.compile("<script[\\S\\s]+?</script>")
  private val pWs = Pattern.compile("\\s{2,}")

  /** Pure function form — shared by the span parser, the crawl oracle and
    * the Catalyst expression below, so all three normalize identically.
    */
  def apply(src: String): String = {
    if (src == null) return null
    // pass 1: lowercase each tag match in place
    val m = pTag.matcher(src)
    val sb = new StringBuffer(src.length)
    while (m.find())
      m.appendReplacement(
        sb,
        java.util.regex.Matcher.quoteReplacement(m.group().toLowerCase))
    m.appendTail(sb)
    var s = sb.toString
    // pass 2-3: drop style/script blocks
    s = pStyle.matcher(s).replaceAll("")
    s = pScript.matcher(s).replaceAll("")
    // pass 4: tags -> newline
    s = pTag.matcher(s).replaceAll("\n")
    // pass 5: collapse whitespace runs
    s = pWs.matcher(s).replaceAll("\n")
    s.trim
  }

  /** Whitespace-only normalization (passes 5 semantics) for raw text runs
    * that never contained tags.
    */
  def normalizeWs(src: String): String =
    if (src == null) null else pWs.matcher(src).replaceAll("\n").trim

  /** Column form: a single custom Catalyst expression that stays inside
    * whole-stage codegen (doGenCode emits a static call — no fallback,
    * no UDF serialization overhead, null-safe).
    */
  def trim_html(c: Column): Column = {
    import org.apache.spark.sql.GraftExprs
    GraftExprs.toColumn(TrimHtmlExpression(GraftExprs.toExpr(c)))
  }

  /** Pure-`regexp_replace` chain implementing passes 2-5 (valid when tags
    * are already lowercase — e.g. machine-generated HTML). This variant
    * is expressible 1:1 in ANSI SQL, so it backs the DuckDB-oracle query;
    * the full 5-pass behavior is [[trim_html]].
    */
  def trimHtmlLowerChain(c: Column): Column = {
    val noStyle = regexp_replace(c, "<style[\\S\\s]+?</style>", "")
    val noScript = regexp_replace(noStyle, "<script[\\S\\s]+?</script>", "")
    val noTags = regexp_replace(noScript, "<[\\S\\s]+?>", "\n")
    trim(regexp_replace(noTags, "\\s{2,}", "\n"))
  }
}

/** Codegen-friendly wrapper: whole-stage codegen emits a direct static
  * call to [[TrimHtml.apply]], so projection chains containing it stay in
  * one WholeStageCodegen span (verified via .explain in specs).
  */
case class TrimHtmlExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(TrimHtml(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.parse.TrimHtml.apply($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
