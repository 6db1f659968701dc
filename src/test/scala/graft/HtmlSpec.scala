package graft

import graft.text.{Html, Urls}
import org.apache.spark.sql.functions._

/** text/Html: WARC→WET extraction + href link extraction — chained
  * codegen regexps in the Java∩RE2 common subset (q132/q133 gates). */
class HtmlSpec extends SparkSpec {

  private def extract(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(Html.extractText(col("h"))).collect()(0)
      .getString(0)
  }

  it("strips script/style/comment blocks including their content") {
    extract("<p>a</p><script>var x = 1 < 2; if (x > 0) {}</script>" +
      "<style>p { color: red; }</style><!-- secret --><p>b</p>") shouldBe
      "a b"
  }

  it("script blocks span newlines and close at the FIRST closer") {
    extract("<script>\nline1();\nline2();\n</script>keep" +
      "<script>more</script>tail") shouldBe "keep tail"
  }

  it("drops tags (attributes, uppercase, newlines inside) and keeps " +
      "text") {
    extract("<DIV class=\"x\"\n data-y='1'>hello <b>world</b></DIV>") shouldBe
      "hello world"
  }

  it("decodes entities in the standard order — &amp;lt; stays literal " +
      "&lt;") {
    extract("A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;" +
      "&nbsp;end &amp;lt;") shouldBe "A & B <tag> \"q\" 's' end &lt;"
      .replace(' ', ' ')
  }

  it("collapses runs of whitespace and trims") {
    extract("  <p>a\n\n\t b </p>\r\n ") shouldBe "a b"
  }

  it("null html extracts to null") {
    import spark.implicits._
    Seq((1, null: String)).toDF("i", "h")
      .select(Html.extractText(col("h"))).collect()(0).isNullAt(0) shouldBe
      true
  }

  it("metaRobotsNoindex honors the robots meta in any attribute order " +
      "or case, and only that tag") {
    import spark.implicits._
    val cases = Seq(
      ("<meta name=\"robots\" content=\"noindex, nofollow\">", true),
      ("<META CONTENT='NOINDEX' NAME='robots'>", true),
      ("<meta name=\"robots\" content=\"index, follow\">", false),
      ("<meta name=\"viewport\" content=\"noindex\">", false), // wrong tag
      ("no meta at all, the word noindex in text", false))
    val got = cases.zipWithIndex
      .map { case ((h, _), i) => (i, s"<html><head>$h</head></html>") }
      .toDF("i", "h")
      .select(col("i"), Html.metaRobotsNoindex(col("h")).as("b"))
      .collect().sortBy(_.getInt(0)).map(_.getBoolean(1)).toSeq
    got shouldBe cases.map(_._2)
  }

  it("canonicalizeUrl: scheme/authority lowercase, default ports and " +
      "fragments drop, tracking params strip in place, garbage passes " +
      "through") {
    import spark.implicits._
    val cases = Seq(
      // default port + mixed case + fragment + mixed params
      "HTTP://WWW.Ex.COM:80/Path/X?utm_source=a&ref=B&gclid=z#frag" ->
        "http://www.ex.com/Path/X?ref=B",
      // https default port; path case preserved
      "HTTPS://A.B:443/Case/Kept" -> "https://a.b/Case/Kept",
      // non-default port survives
      "http://a.b:8080/x" -> "http://a.b:8080/x",
      // :443 on http is NOT a default port
      "http://a.b:443/x" -> "http://a.b:443/x",
      // all-tracking query → bare ? dropped
      "https://a.b/p?utm_campaign=x&fbclid=1" -> "https://a.b/p",
      // params keep their order
      "https://a.b/p?z=1&utm_x=0&a=2" -> "https://a.b/p?z=1&a=2",
      // not a URL → trimmed passthrough
      "  not a url  " -> "not a url")
    val got = cases.map(_._1).zipWithIndex.map(_.swap).toDF("i", "u")
      .select(col("i"), Urls.canonicalizeUrl(col("u")).as("c"))
      .collect().sortBy(_.getInt(0)).map(_.getString(1)).toSeq
    got shouldBe cases.map(_._2)
  }

  it("links finds hrefs in either quote style, any case, any " +
      "attribute spacing; host() drops relative links") {
    import spark.implicits._
    val html = "<a href=\"https://www.ex.com/a\">1</a> " +
      "<A HREF='http://sub.ex.org/b'>2</A> " +
      "<a class='z' href = \"/relative/c\">3</a> " +
      "<area href=\"ftp://files.ex.net/d\">"
    val urls = Seq(html).toDF("h")
      .select(explode(Html.links(col("h"))).as("url"))
    urls.collect().map(_.getString(0)) shouldBe Array(
      "https://www.ex.com/a", "http://sub.ex.org/b", "/relative/c",
      "ftp://files.ex.net/d")
    urls.select(Urls.host(col("url")).as("host"))
      .collect().map(r => Option(r.getString(0))) shouldBe Array(
      Some("ex.com"), Some("sub.ex.org"), None, Some("files.ex.net"))
  }
}
