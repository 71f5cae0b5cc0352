package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MarkupSpec extends SparkSpec {
  import spark.implicits._

  test("stripTags + decodeEntities produce the visible prose") {
    val got = Seq(
      "<html><p class=\"a\">hi &amp; bye</p></html>",
      "no markup at all",
      "a &lt;tag&gt; literal &quot;quoted&quot; &#39;s",
      "<br/><br/>")
      .toDF("t").select(Markup.visibleText($"t")).as[String].collect()
    assert(got(0) == "hi & bye")
    assert(got(1) == "no markup at all")
    assert(got(2) == "a <tag> literal \"quoted\" 's")
    assert(got(3) == "")
  }

  test("double-encoded entities decode exactly one level") {
    val got = Seq("&amp;amp;").toDF("t")
      .select(Markup.visibleText($"t")).as[String].head()
    assert(got == "&amp;")
  }

  test("visibleLengths are integer-exact and consistent") {
    val (vis, raw) = Markup.visibleLengths($"t")
    val got = Seq("<b>abc</b>").toDF("t")
      .select(vis, raw).as[(Int, Int)].head()
    assert(got == ((3, 10)))
  }

  test("scan-stage only: no shuffle, no UDF in the plan") {
    val df = Seq("<p>x</p>").toDF("t")
      .select(Markup.visibleText($"t").as("clean"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }
}
