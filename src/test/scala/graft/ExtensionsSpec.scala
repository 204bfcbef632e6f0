package graft

class ExtensionsSpec extends SparkSuite {
  import spark.implicits._

  test("registered SQL functions work end-to-end") {
    GraftFunctions.register(spark)
    Seq(("<P>Hello  world</P><script>x</script>", "the cat and the dog is here"))
      .toDF("html", "text").createOrReplaceTempView("ext_t")
    val row = spark.sql(
      """SELECT graft_trim_html(html) AS clean,
        |       graft_lang_id(text) AS lang,
        |       graft_fingerprint64(text) AS fp,
        |       graft_simhash64(split(text, ' ')) AS sh,
        |       graft_minhash(split(text, ' '), 8) AS mh
        |FROM ext_t""".stripMargin).head()
    assert(row.getAs[String]("clean") == "Hello\nworld")
    assert(row.getAs[String]("lang") == "en")
    assert(row.getAs[Long]("fp") == graft.ops.Fingerprint64("the cat and the dog is here"))
    assert(row.getAs[scala.collection.Seq[Long]]("mh").size == 8)
    // simhash of identical token arrays matches the Column API
    val viaCol = Seq("the cat and the dog is here").toDF("t")
      .select(graft.ops.Dedup.simhash64(org.apache.spark.sql.functions.col("t")))
      .as[Long].head()
    assert(row.getAs[Long]("sh") == viaCol)
  }

  test("css selector functions work from SQL") {
    GraftFunctions.register(spark)
    Seq("""<div id="x"><a href="https://t.test">go</a><p class="c">hi</p></div>""")
      .toDF("html").createOrReplaceTempView("ext_css")
    val row = spark.sql(
      """SELECT graft_css_text(html, '#x .c') AS t,
        |       graft_css_attr(html, '#x a', 'href') AS a
        |FROM ext_css""".stripMargin).head()
    assert(row.getAs[String]("t") == "hi")
    assert(row.getAs[String]("a") == "https://t.test")
    // selector must be a literal (it parameterizes the expression)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_css_text(html, html) FROM ext_css").head()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("wrong arity surfaces as a clean named error, not an index error") {
    GraftFunctions.register(spark)
    Seq("x").toDF("html").createOrReplaceTempView("ext_arity")
    Seq(
      "SELECT graft_css_text(html) FROM ext_arity",
      "SELECT graft_css_attr(html, '#x') FROM ext_arity",
      "SELECT graft_trim_html(html, html) FROM ext_arity",
      "SELECT graft_minhash(split(html, ' ')) FROM ext_arity"
    ).foreach { sql =>
      val e = intercept[Exception] { spark.sql(sql).head() }
      val msg = e.getMessage
      assert(msg.contains("argument"), s"unexpected message for [$sql]: $msg")
      assert(!msg.contains("IndexOutOfBounds"), s"raw index error for [$sql]")
    }
  }
}
