package graft.parse

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExprs
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Minimal CSS-selector engine over a lightweight DOM (P5,
  * SURVEY.md §2.3) — covers exactly the selector grammar the reference
  * uses with goquery (topkarir/main.go:43,55-79):
  *
  *   - `#id`, `.class`, `tag`, compounds (`a.lightblue`, `div#x.y`)
  *   - descendant combinator: `#comp-detail .jobdesc .desc`
  *   - positional `tag:nth-of-type(k)` (1-based, per parent, per tag):
  *     `.detail div:nth-of-type(2)`
  *   - goquery `Contents()` positional child access (text and element
  *     nodes interleaved, index i==2 / i==4 at topkarir/main.go:61-69)
  *   - attribute projection: `e.DOM.Find("#detail-comprof a").Attr("href")`
  *
  * The DOM builder reuses the same tokenizer conventions as
  * [[HtmlSpans]] (attribute regex, void elements, script/style capture)
  * so both parse paths agree on malformed input. Column-level operators
  * are codegen'd custom expressions — scalar, shuffle-free, fused into
  * whole-stage codegen like the rest of the extraction family.
  */
object CssSelect {

  sealed trait Node
  final case class Text(text: String) extends Node
  final case class Elem(tag: String, attrs: Map[String, String],
                        children: Vector[Node]) extends Node

  private val voidTags = Set("img", "br", "hr", "input", "meta", "link",
                             "area", "base", "col", "embed", "source",
                             "track", "wbr")

  /** Parse HTML into a node tree under a synthetic root element. */
  def parseDom(html: String): Elem = {
    final class Open(val tag: String, val attrs: Map[String, String]) {
      val children = ArrayBuffer.empty[Node]
    }
    val stack = ArrayBuffer(new Open("", Map.empty))
    def top = stack.last
    def closeOne(): Unit = {
      val o = stack.remove(stack.length - 1)
      top.children += Elem(o.tag, o.attrs, o.children.toVector)
    }
    var i = 0
    val n = html.length
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) {
        if (i < n) top.children += Text(html.substring(i))
        i = n
      } else {
        if (lt > i) top.children += Text(html.substring(i, lt))
        if (html.startsWith("<!--", lt)) {
          // comment: skip to the first --> AFTER the opener's dashes —
          // searching from lt+2 closes HTML5 empty comments <!--> and
          // <!---> correctly (to end when unterminated)
          val ce = html.indexOf("-->", lt + 2)
          i = if (ce < 0) n else ce + 3
        } else if (html.startsWith("<![CDATA[", lt)) {
          // CDATA may contain '>' — skip to ]]> (to end when unterminated)
          val ce = html.indexOf("]]>", lt + 9)
          i = if (ce < 0) n else ce + 3
        } else if (lt + 1 < n && (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?')) {
          // DOCTYPE / processing instruction: skip the tag (internal
          // DTD subsets with embedded '>' are out of scope — lenient
          // browsers treat these as bogus comments the same way)
          val gt = html.indexOf('>', lt + 1)
          i = if (gt < 0) n else gt + 1
        } else {
        val gt = html.indexOf('>', lt + 1)
        if (gt < 0) i = n
        else {
          val rawTag = html.substring(lt + 1, gt)
          val isClose = rawTag.startsWith("/")
          val selfClose = rawTag.endsWith("/")
          val body = if (isClose) rawTag.substring(1) else rawTag
          val e = body.indexWhere(c => c.isWhitespace || c == '/')
          val name = (if (e >= 0) body.substring(0, e) else body).toLowerCase
          i = gt + 1
          if (isClose) {
            // pop to the matching open tag; ignore strays
            val at = stack.lastIndexWhere(_.tag == name)
            if (at > 0) while (stack.length > at) closeOne()
          } else if (name == "script" || name == "style") {
            // raw-content elements: body is a single text child
            val ci = indexOfIgnoreCase(html, s"</$name", i)
            val end = if (ci < 0) n else ci
            top.children += Elem(name, HtmlSpans.parseAttrs(rawTag),
                                 Vector(Text(html.substring(i, end))))
            i = if (ci < 0) n else html.indexOf('>', ci).max(ci) + 1
          } else if (voidTags.contains(name) || selfClose) {
            top.children += Elem(name, HtmlSpans.parseAttrs(rawTag), Vector.empty)
          } else {
            stack += new Open(name, HtmlSpans.parseAttrs(rawTag))
          }
        }
        }
      }
    }
    while (stack.length > 1) closeOne()
    Elem("", Map.empty, top.children.toVector)
  }

  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    var i = from
    val last = hay.length - needle.length
    while (i <= last) {
      if (hay.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  /** One compound selector step: tag?, #id?, .classes*, :nth-of-type(k)? */
  private final case class Step(tag: String, id: String,
                                classes: Seq[String], nthOfType: Int)

  private val stepRe =
    """([a-zA-Z0-9_-]+)?(?:#([\w-]+))?((?:\.[\w-]+)*)(?::nth-of-type\((\d+)\))?""".r

  private def parseSelector(sel: String): Seq[Step] =
    sel.trim.split("\\s+").toSeq.map {
      case stepRe(tag, id, cls, nth) =>
        Step(Option(tag).getOrElse(""), Option(id).getOrElse(""),
             Option(cls).filter(_.nonEmpty).map(_.split("\\.").toSeq
               .filter(_.nonEmpty)).getOrElse(Nil),
             Option(nth).map(_.toInt).getOrElse(0))
      case other => throw new IllegalArgumentException(s"bad selector step: $other")
    }

  private def matchesLocal(e: Elem, s: Step): Boolean = {
    (s.tag.isEmpty || e.tag == s.tag) &&
    (s.id.isEmpty || e.attrs.get("id").contains(s.id)) &&
    s.classes.forall(c =>
      e.attrs.getOrElse("class", "").split("\\s+").contains(c))
  }

  /** All elements matching a descendant-combinator selector, in document
    * order. `:nth-of-type(k)` filters to the k-th same-tag child of its
    * parent (CSS semantics, 1-based).
    */
  def select(root: Elem, selector: String): Vector[Elem] = {
    def matchStep(scopes: Vector[Elem], s: Step): Vector[Elem] = {
      val out = ArrayBuffer.empty[Elem]
      val seen = java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[Elem, java.lang.Boolean]())
      def walk(e: Elem): Unit = {
        val typeCount = scala.collection.mutable.Map.empty[String, Int]
        e.children.foreach {
          case c: Elem =>
            val k = typeCount.updateWith(c.tag)(v => Some(v.getOrElse(0) + 1)).get
            if (matchesLocal(c, s) && (s.nthOfType == 0 || s.nthOfType == k)
                && seen.add(c)) out += c
            walk(c)
          case _ => ()
        }
      }
      scopes.foreach(walk)
      out.toVector
    }
    parseSelector(selector).foldLeft(Vector(root))(matchStep)
  }

  /** Concatenated descendant text of an element (goquery `.Text()`),
    * whitespace-normalized via the shared trimHtml convention.
    */
  def text(e: Elem): String = {
    val sb = new StringBuilder
    def walk(n: Node): Unit = n match {
      case Text(t)                        => sb.append(t)
      case el: Elem if el.tag == "script" => ()
      case el: Elem if el.tag == "style"  => ()
      case el: Elem                       => el.children.foreach(walk)
    }
    walk(e)
    TrimHtml.normalizeWs(sb.toString)
  }

  /** Direct children including text nodes — goquery `Contents()`. */
  def contents(e: Elem): Vector[Node] = e.children

  // ------------------------------------------------------------------
  // scalar extraction entry points (static, codegen-callable)
  // ------------------------------------------------------------------

  /** Text of the first selector match ("" when none). */
  def extractText(html: String, selector: String): String =
    select(parseDom(html), selector).headOption.map(text).getOrElse("")

  /** Attribute of the first selector match ("" when none/absent). */
  def extractAttr(html: String, selector: String, attr: String): String =
    select(parseDom(html), selector).headOption
      .flatMap(_.attrs.get(attr)).getOrElse("")

  /** Normalized text of Contents()(idx) of the first match — the
    * positional mixed-node projection (topkarir/main.go:61-69).
    */
  def extractContentsText(html: String, selector: String, idx: Int): String =
    select(parseDom(html), selector).headOption
      .flatMap(e => contents(e).lift(idx))
      .map {
        case Text(t)   => TrimHtml.normalizeWs(t)
        case el: Elem  => text(el)
      }
      .getOrElse("")

  // ------------------------------------------------------------------
  // Column operators
  // ------------------------------------------------------------------
  def css_text(html: Column, selector: String): Column =
    GraftExprs.toColumn(
      CssExtractExpression(GraftExprs.toExpr(html), selector, "text", "", 0))

  def css_attr(html: Column, selector: String, attr: String): Column =
    GraftExprs.toColumn(
      CssExtractExpression(GraftExprs.toExpr(html), selector, "attr", attr, 0))

  def css_contents_text(html: Column, selector: String, idx: Int): Column =
    GraftExprs.toColumn(
      CssExtractExpression(GraftExprs.toExpr(html), selector, "contents", "", idx))
}

/** Codegen'd scalar CSS extraction. The selector/attr strings ride as
  * codegen references (not string-escaped literals), keeping arbitrary
  * selector syntax safe in generated Java.
  */
case class CssExtractExpression(child: Expression, selector: String,
                                mode: String, attr: String, idx: Int)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  private def run(html: String): String = mode match {
    case "text"     => CssSelect.extractText(html, selector)
    case "attr"     => CssSelect.extractAttr(html, selector, attr)
    case "contents" => CssSelect.extractContentsText(html, selector, idx)
  }

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(run(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val selRef = ctx.addReferenceObj("cssSelector", selector)
    val attrRef = ctx.addReferenceObj("cssAttr", attr)
    val call = mode match {
      case "text" =>
        (c: String) => s"graft.parse.CssSelect.extractText($c.toString(), (String) $selRef)"
      case "attr" =>
        (c: String) =>
          s"graft.parse.CssSelect.extractAttr($c.toString(), (String) $selRef, (String) $attrRef)"
      case "contents" =>
        (c: String) =>
          s"graft.parse.CssSelect.extractContentsText($c.toString(), (String) $selRef, $idx)"
    }
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(${call(c)})")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
