package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, MapType, StringType, StructType}

import graft.ops.Extract

/** Per-module extraction fixtures (FIXTURES.md §5): tiny synthetic
  * strings with the same *structure* as the reference targets, each
  * exercising one SURVEY.md §2 extraction operator.
  */
class ExtractSpec extends SparkSuite {
  import spark.implicits._

  test("P4: window._initialData regex capture + json projection") {
    val page =
      """<html><script>junk</script><script>
        |window._initialData={"jobTitle":"Warehouse Op","salary":"4jt","loc":"Jakarta"};
        |</script></html>""".stripMargin
    val got = Seq(page).toDF("body")
      .select(Extract.window_initial_data(col("body")).as("blob"))
      .select(get_json_object(col("blob"), "$.jobTitle").as("title"),
              get_json_object(col("blob"), "$.loc").as("loc"))
      .as[(String, String)].head()
    assert(got == ("Warehouse Op", "Jakarta"))
  }

  test("P6: jobstreet id from data-search-sol-meta attribute") {
    val attr = """{"searchRequestToken":"x","token":"jobstreet-id-job-7431288","jobId":"x"}"""
    val got = Seq(attr).toDF("a")
      .select(Extract.jobstreet_id(col("a"))).as[String].head()
    assert(got == "7431288")
  }

  test("F7 + J1: window.__APP repair then dynamic-key item-user join") {
    // bare keys props/states must be quoted before from_json parses it
    val blob =
      """window.__APP = {props:1,states:{"items":{"elements":{"i9":
        |{"user_id":"u3","title":"Bolt"}}},"users":{"elements":{"u3":
        |{"name":"Budi","created_at":"2024-01-01"}}}}};""".stripMargin.replace("\n", "")
    val stateSchema = DataType.fromDDL(
      "struct<props:string,states:struct<" +
        "items:struct<elements:map<string,struct<user_id:string,title:string>>>," +
        "users:struct<elements:map<string,struct<name:string,created_at:string>>>>>")
      .asInstanceOf[StructType]
    val df = Seq(("i9", blob)).toDF("item_id", "raw")
      .withColumn("app", from_json(Extract.repair_window_app(col("raw")), stateSchema))
      .withColumn("item", element_at(col("app.states.items.elements"), col("item_id")))
      .withColumn("user", element_at(col("app.states.users.elements"), col("item.user_id")))
      .select(col("item.title"), col("user.name"), col("user.created_at"))
    val got = df.as[(String, String, String)].head()
    assert(got == ("Bolt", "Budi", "2024-01-01"))
  }

  test("F2: unix-ms to timestamp truncates to seconds") {
    val got = Seq("1700000001999").toDF("ms")
      .select(date_format(Extract.unix_ms_to_ts(col("ms")), "yyyy-MM-dd HH:mm:ss"))
      .as[String].head()
    assert(got == "2023-11-14 22:13:21") // UTC, ms truncated
  }

  test("F3/F4: slug url round-trips its id") {
    val got = Seq(("Kitchen Staff Hotel", 4217L)).toDF("title", "id")
      .select(Extract.slug_url("https://x.test/item/", col("title"), col("id")).as("u"))
      .withColumn("back", Extract.id_from_url(col("u")))
      .as[(String, String)].head()
    assert(got._1 == "https://x.test/item/kitchen-staff-hotel-iid-4217")
    assert(got._2 == "4217")
  }

  test("ST5: UA pick is deterministic and url-keyed") {
    val uas = Seq("ua-a", "ua-b", "ua-c")
    val urls = (0 until 50).map(i => s"https://h.test/p$i")
    val got1 = urls.toDF("u").select(Extract.ua_pick(col("u"), uas)).as[String].collect()
    val got2 = urls.toDF("u").select(Extract.ua_pick(col("u"), uas)).as[String].collect()
    assert(got1.toSeq == got2.toSeq, "deterministic")
    assert(got1.toSet.subsetOf(uas.toSet))
    assert(got1.toSet.size > 1, "rotation actually varies")
  }

  test("W1: forward-fill matches the loker hierarchical option semantics") {
    // level-0 parents forward-filled onto level-1 children
    // (loker/main.go:37-49)
    val rows = Seq(
      (0, 0, "Administrasi"), (1, 1, "Data Entry"), (2, 1, "Sekretaris"),
      (3, 0, "Pendidikan"), (4, 1, "Guru"), (5, 1, "Dosen"))
      .toDF("pos", "level", "title")
    val w = org.apache.spark.sql.expressions.Window.orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val got = rows
      .withColumn("parent",
        Extract.forward_fill(when(col("level") === 0, col("title")), w))
      .filter(col("level") === 1)
      .select(col("parent"), col("title"))
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("Administrasi", "Data Entry"), ("Administrasi", "Sekretaris"),
                      ("Pendidikan", "Guru"), ("Pendidikan", "Dosen")))
  }
}

class XXH64OracleSpec extends SparkSuite {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("independent xxHash64 equals Spark's xxhash64 column on varied inputs") {
    // lengths straddling every tail path: <4, 4-7, 8-31, >=32 bytes,
    // plus multi-byte UTF-8
    val inputs = Seq("", "a", "abc", "abcd", "abcdefg", "abcdefgh",
                     "https://shop.test/item/x-iid-1",
                     "a" * 31, "a" * 32, "a" * 33, "a" * 100,
                     "warehouse operator jakarta bandung surabaya medan",
                     "héllo wörld — ünïcode ☂")
    val viaSpark = inputs.toDF("s")
      .select(col("s"), xxhash64(col("s")).as("h"))
      .as[(String, Long)].collect().toMap
    inputs.foreach { s =>
      val mine = graft.oracle.SeqOracles.XXH64.hash(s.getBytes("UTF-8"), 42L)
      assert(mine == viaSpark(s), s"xxh64 mismatch on [$s]")
    }
  }
}

class FacetSplitSpec extends SparkSuite {
  import graft.ops.FacetSplit

  test("splits until every partition is under threshold; count preserved") {
    val api = FacetSplit.SyntheticFacetApi(seed = 55L)
    val got = FacetSplit.split(spark, Seq(("root", 17099L), ("alt", 420L)),
                               api, threshold = 1000L)
    val rows = got.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
    assert(rows.map(_._2).sum == 17099L + 420L, "item count preserved")
    assert(rows.filter(!_._4).forall(_._2 < 1000L),
           s"hot unsettled leaf survived: ${rows.filter(r => !r._4 && r._2 >= 1000).take(3).toSeq}")
    assert(rows.exists(_._3 > 0), "at least one split happened")
    assert(rows.map(_._1).distinct.length == rows.length, "unique facet ids")
    // deterministic
    val again = FacetSplit.split(spark, Seq(("root", 17099L), ("alt", 420L)),
                                 api, threshold = 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }
}
