package graft.polite

import graft.model.RobotsRule

/** Minimal robots.txt handling (reference analogue: colly honors robots
  * via temoto/robotstxt, go.mod:19).
  *
  * Policy: a host's URLs are held in the frontier until its robots.txt
  * has been fetched (the robots entry itself rides at priority 0, so it
  * is always a host's first fetch); thereafter URLs matching any
  * Disallow prefix are dropped and counted.
  */
object Robots {

  /** Parse `Disallow:` prefixes that apply to `User-agent: *`.
    * Group-aware enough for the synthetic corpus: collects Disallow lines
    * in the active `*` group; empty Disallow (= allow all) ignored.
    */
  def parse(host: String, body: String): RobotsRule = {
    var inStar = false
    val prefixes = Vector.newBuilder[String]
    body.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val lower = line.toLowerCase
      if (lower.startsWith("user-agent:"))
        inStar = line.substring("user-agent:".length).trim == "*"
      else if (inStar && lower.startsWith("disallow:")) {
        val p = line.substring("disallow:".length).trim
        if (p.nonEmpty) prefixes += p
      }
    }
    RobotsRule(host, prefixes.result())
  }

  /** True iff `canonicalUrl` on `host` passes the given disallow
    * prefixes (path-prefix match, canonical path starts at first '/'
    * after the authority).
    */
  def allowed(canonicalUrl: String, disallowPrefixes: Seq[String]): Boolean = {
    if (disallowPrefixes.isEmpty) return true
    val si = canonicalUrl.indexOf("://")
    val pathStart =
      if (si < 0) 0 else canonicalUrl.indexOf('/', si + 3)
    val path = if (pathStart < 0) "/" else canonicalUrl.substring(pathStart)
    !disallowPrefixes.exists(path.startsWith)
  }
}
