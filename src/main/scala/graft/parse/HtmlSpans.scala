package graft.parse

import scala.collection.mutable.ArrayBuffer

import graft.model.Span

/** Pure-Scala HTML → interleaved span extraction.
  *
  * Produces the canonical interleaved text+media span sequence:
  * text runs (trimHtml-normalized), images, videos and links, in document
  * order with 0-based offsets. Also surfaces `<script>` payloads (id ->
  * body) for the JSON-extraction operators (reference pattern:
  * `script#__NEXT_DATA__` at apna/main.go:52-58, positional script
  * dispatch at olx_c226/main.go:89-122).
  *
  * This parser is a deterministic single-pass tokenizer (no external DOM
  * library is available in the sandbox). It is shared verbatim by the
  * distributed parse stage and the sequential crawl oracle, which is what
  * makes per-row span-sequence equality a pure test of the *scheduler*,
  * not of parsing drift.
  *
  * Scale note: parsing runs inside `mapPartitions` on the fetch-result
  * Dataset — per-row, allocation-light, no shuffle.
  */
object HtmlSpans {

  final case class Parsed(
      spans: Vector[Span],
      scripts: Vector[(Map[String, String], String)], // (attrs, body) in doc order
      links: Vector[String] // href targets in document order (pre-canonicalization)
  )

  private val attrRe =
    "([a-zA-Z_:][-a-zA-Z0-9_:.]*)\\s*=\\s*\"([^\"]*)\"".r

  def parseAttrs(tagBody: String): Map[String, String] =
    attrRe.findAllMatchIn(tagBody).map(m => m.group(1).toLowerCase -> m.group(2)).toMap

  /** Resolve an href against the page URL. Handles absolute, protocol-
    * relative, root-relative and naive relative forms.
    */
  def resolveUrl(baseUrl: String, href: String): String = {
    if (href.contains("://")) href
    else if (href.startsWith("//")) {
      val scheme = baseUrl.substring(0, baseUrl.indexOf("://"))
      scheme + ":" + href
    } else if (href.startsWith("/")) {
      val si = baseUrl.indexOf("://")
      val pe = baseUrl.indexOf('/', si + 3)
      val origin = if (pe >= 0) baseUrl.substring(0, pe) else baseUrl
      origin + href
    } else {
      val q = baseUrl.indexOf('?')
      val base = if (q >= 0) baseUrl.substring(0, q) else baseUrl
      val lastSlash = base.lastIndexOf('/')
      if (lastSlash > base.indexOf("://") + 2) base.substring(0, lastSlash + 1) + href
      else base + "/" + href
    }
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

  def parse(pageUrl: String, html: String): Parsed = {
    val spans = ArrayBuffer.empty[Span]
    val scripts = ArrayBuffer.empty[(Map[String, String], String)]
    val links = ArrayBuffer.empty[String]
    val text = new StringBuilder
    // pending <a href>: accumulate anchor text until </a>
    var pendingHref: String = null
    val anchorText = new StringBuilder

    def flushText(): Unit = {
      val t = TrimHtml.normalizeWs(text.toString)
      if (t.nonEmpty) spans += Span("text", t, "", spans.length)
      text.setLength(0)
    }

    var i = 0
    val n = html.length
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) {
        (if (pendingHref != null) anchorText else text).append(html.substring(i))
        i = n
      } else {
        (if (pendingHref != null) anchorText else text)
          .append(html.substring(i, lt))
        if (html.startsWith("<!--", lt)) {
          // comment (may contain '>'): skip whole construct, same rules
          // as CssSelect.parseDom so both parse paths agree
          val ce = html.indexOf("-->", lt + 2)
          i = if (ce < 0) n else ce + 3
        } else if (html.startsWith("<![CDATA[", lt)) {
          val ce = html.indexOf("]]>", lt + 9)
          i = if (ce < 0) n else ce + 3
        } else if (lt + 1 < n &&
                   (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?')) {
          val gt = html.indexOf('>', lt + 1)
          i = if (gt < 0) n else gt + 1
        } else {
        val gt = html.indexOf('>', lt + 1)
        if (gt < 0) { i = n } // truncated tag: drop remainder
        else {
          val rawTag = html.substring(lt + 1, gt)
          val isClose = rawTag.startsWith("/")
          val name = {
            val body = if (isClose) rawTag.substring(1) else rawTag
            val e = body.indexWhere(c => c.isWhitespace || c == '/')
            (if (e >= 0) body.substring(0, e) else body).toLowerCase
          }
          i = gt + 1
          name match {
            case "script" | "style" if !isClose =>
              val closeTag = s"</$name"
              val ci = indexOfIgnoreCase(html, closeTag, i)
              val end = if (ci < 0) n else ci
              if (name == "script")
                scripts += ((parseAttrs(rawTag), html.substring(i, end)))
              val cgt = if (ci < 0) n else html.indexOf('>', ci).max(ci) + 1
              i = cgt
            case "a" if !isClose =>
              val href = parseAttrs(rawTag).get("href")
              if (href.isDefined) {
                flushText()
                pendingHref = resolveUrl(pageUrl, href.get)
                anchorText.setLength(0)
              }
            case "a" if isClose =>
              if (pendingHref != null) {
                val t = TrimHtml.normalizeWs(anchorText.toString)
                spans += Span("link", t, pendingHref, spans.length)
                links += pendingHref
                pendingHref = null
                anchorText.setLength(0)
              }
            case "img" =>
              val src = parseAttrs(rawTag).get("src")
              if (src.isDefined) {
                flushText()
                val alt = parseAttrs(rawTag).getOrElse("alt", "")
                spans += Span("image", TrimHtml.normalizeWs(alt),
                              resolveUrl(pageUrl, src.get), spans.length)
              }
            case "video" | "source" =>
              val src = parseAttrs(rawTag).get("src")
              if (src.isDefined) {
                flushText()
                spans += Span("video", "", resolveUrl(pageUrl, src.get), spans.length)
              }
            case _ =>
              // block-ish boundary: tags separate text runs (trimHtml pass 4)
              (if (pendingHref != null) anchorText else text).append('\n')
          }
        }
        }
      }
    }
    if (pendingHref != null) { // unclosed anchor: treat as link anyway
      spans += Span("link", TrimHtml.normalizeWs(anchorText.toString), pendingHref, spans.length)
      links += pendingHref
    }
    flushText()
    Parsed(spans.toVector, scripts.toVector, links.toVector)
  }
}
