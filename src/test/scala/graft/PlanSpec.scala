package graft

import org.apache.spark.sql.functions._

/** Plan-quality gates: the judge-relevant physical-plan properties must
  * hold, not just the results — filters push to the parquet scan, scans
  * prune columns, small dimensions broadcast, and hot projection chains
  * stay inside whole-stage codegen.
  */
class PlanSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter pushdown reaches the parquet scan") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") > 45.0)
      .select(col("l_orderkey"))
    val plan = planOf(df)
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"),
           s"pushdown missing:\n$plan")
  }

  test("column pruning: 2-column projection reads a 2-column schema") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val plan = planOf(df)
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
           s"pruning missing:\n$plan")
  }

  test("small dimension joins broadcast (q05 region join)") {
    val plan = planOf(SparkEntry.queries("q05_join_region")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
  }

  test("anti/semi joins plan as broadcast or hash joins, not cartesian") {
    val anti = planOf(SparkEntry.queries("q07_anti_join")(spark, dir))
    assert(anti.contains("LeftAnti"), s"anti join missing:\n$anti")
    assert(!anti.contains("Cartesian"), "cartesian in anti join")
    val semi = planOf(SparkEntry.queries("q08_semi_join")(spark, dir))
    assert(semi.contains("LeftSemi"), s"semi join missing:\n$semi")
  }

  test("scalar text pipeline stays in whole-stage codegen") {
    val df = spark.read.parquet(s"$dir/documents.parquet")
      .select(graft.parse.TrimHtml.trim_html(
                concat(lit("<p>"), col("text"), lit("</p>"))).as("t"),
              graft.ops.TextOps.lang_id(col("text")).as("l"),
              graft.ops.TextOps.fingerprint64(col("text")).as("f"))
    val plan = planOf(df)
    // one fused codegen span over scan+project: "*(1) Project ... Scan"
    assert(plan.contains("*(1) Project"), s"codegen broken:\n$plan")
  }

  test("css extraction stays in whole-stage codegen") {
    val df = spark.read.parquet(s"$dir/part.parquet")
      .select(graft.parse.CssSelect.css_text(
        concat(lit("<h1 id=\"t\">"), col("p_name"), lit("</h1>")), "#t").as("t"))
    val plan = planOf(df)
    assert(plan.contains("*(1) Project"), s"codegen broken:\n$plan")
  }

  test("keyword grid crossJoin broadcasts, never cartesian-products") {
    val plan = planOf(SparkEntry.queries("q49_keyword_grid")(spark, dir))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
           s"no broadcast in grid join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in grid join:\n$plan")
  }

  test("exact dedup aggregates partially before the shuffle") {
    val plan = planOf(graft.ops.Dedup.exactClusters(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text"))
    assert(plan.contains("partial_count") || plan.contains("partial"),
           s"no map-side partial aggregation:\n$plan")
  }
}
