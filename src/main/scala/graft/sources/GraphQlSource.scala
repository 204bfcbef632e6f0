package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** S2/S3: GraphQL POST scan with variable-templated paging
  * (SURVEY.md §2.1-S2; reference kitalulus/main.go:95-151 — POST body
  * `{query, variables: {page, limit}}`, a `totalJobCount` probe sizes
  * the page loop, 5 items per page).
  *
  * Spark shape: one driver-side probe POST reads the total; the page
  * grid `spark.range(nPages)` then distributes; each task builds its
  * page's body from the template and POSTs inside `mapPartitions` (one
  * API client per partition, like the Fetcher pattern); responses parse
  * declaratively with `from_json` + `explode`, so Catalyst prunes the
  * projection into the response schema. Unlike the cursor source (S5),
  * pages here are independent — the grid IS the parallelism, exactly
  * what makes the POST scan distinct from the sequential chain.
  */
object GraphQlSource {

  /** The POST boundary; a real HTTP client implements this outside the
    * sandbox (30 s timeout etc., apna/main.go:33-45 transport).
    */
  trait GqlApi extends Serializable {
    def post(url: String, body: String): String
  }

  /** Deterministic in-sandbox endpoint: understands the reference's
    * variable protocol and answers with SQL-reconstructible items so
    * the DuckDB oracle can verify the scan end-to-end.
    * Response shape: {"data":{"jobs":{"total":N,"items":[...]}}}
    */
  final case class SyntheticGqlApi(total: Int) extends GqlApi {
    private val pageRe = """"page"\s*:\s*(\d+)""".r
    private val limitRe = """"limit"\s*:\s*(\d+)""".r
    override def post(url: String, body: String): String = {
      val page = pageRe.findFirstMatchIn(body).map(_.group(1).toInt).getOrElse(0)
      val limit = limitRe.findFirstMatchIn(body).map(_.group(1).toInt).getOrElse(5)
      val from = page * limit
      val items = (from until math.min(from + limit, total)).map { id =>
        s"""{"id":$id,"title":"job-$id","company":"co-${id % 7}"}"""
      }
      s"""{"data":{"jobs":{"total":$total,"items":[${items.mkString(",")}]}}}"""
    }
  }

  private val responseSchema: StructType = DataType.fromDDL(
    "struct<data:struct<jobs:struct<total:int," +
      "items:array<struct<id:long,title:string,company:string>>>>>")
    .asInstanceOf[StructType]

  /** Template placeholders: %PAGE% and %LIMIT% (the reference templates
    * the same two variables via fmt.Sprintf, kitalulus/main.go:100-102).
    */
  def body(template: String, page: Long, limit: Int): String =
    template.replace("%PAGE%", page.toString).replace("%LIMIT%", limit.toString)

  /** Full paged scan: probe total, distribute the page grid, POST per
    * page, parse + flatten. Returns (page, id, title, company).
    */
  def pagedScan(spark: SparkSession, endpoint: String, template: String,
                limit: Int, api: GqlApi): DataFrame = {
    import spark.implicits._
    // probe (kitalulus/main.go:119-125: first response's totalJobCount)
    val probe = api.post(endpoint, body(template, 0L, limit))
    val total = spark.range(1).select(
      from_json(lit(probe), responseSchema)("data")("jobs")("total"))
      .as[Int].head()
    val nPages = (total + limit - 1) / limit
    val responses = spark.range(nPages)
      .select(col("id").as("page"))
      .as[Long]
      .mapPartitions { it =>
        val client = api // one client per partition
        it.map(p => (p, client.post(endpoint, body(template, p, limit))))
      }
      .toDF("page", "response")
    responses
      .select(col("page"),
              explode(from_json(col("response"), responseSchema)("data")("jobs")("items"))
                .as("item"))
      .select(col("page"), col("item.id").as("id"),
              col("item.title").as("title"), col("item.company").as("company"))
  }
}
