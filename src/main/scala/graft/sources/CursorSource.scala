package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** S5: opaque sequential cursor paging (SURVEY.md §2.1-S5).
  *
  * The reference walks `metadata.next_page_url` returned in each API
  * response (olx_c226/main.go:183-184): page k+1's URL exists ONLY in
  * page k's body — a client cannot construct it. The Spark shape is the
  * per-facet sequential chain inside `flatMapGroups`: facets distribute
  * across tasks (that's the parallelism), while each facet's chain
  * walks sequentially inside its task, O(1) state per chain. At
  * 10^4-10^5 facets (the reference's 110-facet split scaled up) this
  * saturates a cluster without ever needing intra-chain parallelism,
  * which the cursor contract makes impossible by construction.
  */
object CursorSource {

  final case class CursorItem(facet: String, page_no: Long, id: Long,
                              title: String)
  final case class CursorPage(items: Seq[CursorItem], next_url: String)

  /** The paged-API boundary: one fetch per cursor URL. A live HTTP
    * implementation slots in outside the sandbox (Fetcher pattern).
    */
  trait CursorApi extends Serializable {
    def startUrl(facet: String): String
    def fetch(url: String): CursorPage
  }

  /** Deterministic in-sandbox API. The cursor token is an opaque blob
    * (seeded keystream XOR of the page index, hex): the engine never
    * parses it — only `fetch` can, which is what makes the chain
    * genuinely sequential. Items carry SQL-reconstructible values
    * (page_no * itemsPerPage + i) so the DuckDB oracle can verify the
    * scan end-to-end without replicating the cursor walk.
    */
  final case class SyntheticCursorApi(seed: Long,
                                      pagesPerFacet: Map[String, Int],
                                      itemsPerPage: Int) extends CursorApi {
    import graft.synthweb.SyntheticWeb.{hashOf, mix64}
    private def key(facet: String): Long = mix64(seed ^ hashOf(seed, facet))
    private def cursor(facet: String, k: Long): String =
      f"${key(facet) ^ k}%016x"
    override def startUrl(facet: String): String =
      s"https://api.test/search?facet=$facet&cursor=${cursor(facet, 0L)}"
    override def fetch(url: String): CursorPage = {
      val facet = url.split("facet=")(1).split("&")(0)
      val k = java.lang.Long.parseUnsignedLong(
        url.split("cursor=")(1), 16) ^ key(facet)
      val pages = pagesPerFacet.getOrElse(facet, 0)
      if (k < 0 || k >= pages) CursorPage(Nil, "")
      else {
        val items = (0 until itemsPerPage).map { i =>
          val id = k * itemsPerPage + i
          CursorItem(facet, k, id, s"$facet#$id")
        }
        val next =
          if (k + 1 < pages)
            s"https://api.test/search?facet=$facet&cursor=${cursor(facet, k + 1)}"
          else ""
        CursorPage(items, next)
      }
    }
  }

  /** Scan every facet's full cursor chain. One task walks one (or a
    * few) facets; a runaway chain is bounded by `maxPages`.
    */
  def scan(spark: SparkSession, facets: Seq[String], api: CursorApi,
           maxPages: Int = 100000): Dataset[CursorItem] = {
    import spark.implicits._
    facets.toDS()
      .groupByKey(identity)
      .flatMapGroups { (facet: String, _: Iterator[String]) =>
        // the sequential chain: next page's URL comes only from the
        // previous response — the defining S5 constraint
        Iterator.unfold((api.startUrl(facet), 0)) { case (url, n) =>
          if (url.isEmpty || n >= maxPages) None
          else {
            val page = api.fetch(url)
            if (page.items.isEmpty && page.next_url.isEmpty) None
            else Some((page.items, (page.next_url, n + 1)))
          }
        }.flatten
      }
  }
}
