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

  // ---- fused-scanner byte-parity (the r15 single-pass twins) ----

  /** Pass-order traps, unterminated constructs, glue shapes, entity
    * corners, unicode whitespace — every divergence class the fused
    * scanner's design analysis named. */
  private val adversarial = Seq(
    "",
    "       ",
    "plain text no markup",
    "a < b and c > d",                       // bare <> stay when untagged
    "<p>a</p><script>if(1<2){}</script><style>p{}</style><!--x--><p>b</p>",
    "<style><script></style>X</script>Y",    // script pass wins: "Y"
    "<style><script></style></script></style>end", // style spans nested script
    "<script> <!-- </script> -->",           // comment open consumed: "-->"
    "<!-- <script>x</script> -->tail",       // comment swallows script span
    "<script>no closer",                     // unterminated: tag-stripped only
    "<style>no closer either",
    "<!-- unterminated comment",
    "<abc no closing angle",                 // unterminated tag stays literal
    "<foo <script>x</script> bar>kept",      // tag close sought in stripped text
    "<a x=<p>text</a>",                      // block tag inside anchor open
    "A &amp; B &lt;t&gt; &quot;q&quot; &#39;s&#39;&nbsp;end &amp;lt;",
    "&am&amp;p; &&lt; &gt",                  // partial/overlapping entities
    "<ScRiPt>X</sCrIpT><STYLE>y</style>ok",  // case-insensitive blocks
    "<scripts>not a script</scripts>in",     // \b guard
    "<script	defer>tab attr</script>z",
    "　wide ws collapse",
    "emoji 😀 <b>kept</b>",
    "<p>first</p><div><a href='/x'>nav nav nav</a></div><p>" +
      "a longer body paragraph that should be kept as content</p>",
    "<ul><li>one</li><li>two</li></ul><h3>head</h3>trail",
    "<a  href='x'>two spaces not one</a>",   // <a needs exactly one ws? class allows run via [^>]*
    "<a>no ws anchor</a>",                   // not an AnchorTagRe match
    "<a x>inner<b></a>",                     // nested tag breaks the anchor
    "<a x>text</a  >tail",                   // ws before the anchor closer
    "<table><tr><td><a n>link</a></td></tr></table>",
    "<br/><p/>self closing",
    "<h7>not a block</h7><h1>block</h1>")

  private def parityFrames(inputs: Seq[String]) = {
    import spark.implicits._
    inputs.toDF("h")
  }

  it("fused extractText is byte-identical to the chained regexp form " +
      "on the adversarial corpus") {
    val df = parityFrames(adversarial)
    val got = df.select(Html.extractText(col("h"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
    val want = df.select(Html.extractTextChained(col("h"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      withClue(s"input #$i [${adversarial(i)}]: ") { g shouldBe w }
    }
    // and the documented pass-order trap extracts exactly as analyzed
    extract("<style><script></style>X</script>Y") shouldBe "Y"
  }

  it("fused mainContent is field-identical to the chained column form " +
      "on the adversarial corpus (incl. null → struct of nulls)") {
    import spark.implicits._
    val df = parityFrames(adversarial)
    def rows(c: org.apache.spark.sql.Column) =
      df.select(c.as("mc"))
        .selectExpr("mc.content", "mc.n_blocks", "mc.n_kept")
        .collect().map(_.toString)
    rows(Html.mainContent(col("h"))) shouldBe
      rows(Html.mainContentChained(col("h")))
    // null html: the struct itself is non-null with null fields in
    // BOTH forms (struct() is not null-propagating)
    val nulls = Seq((1, null: String)).toDF("i", "h")
    val fused = nulls.select(Html.mainContent(col("h")).as("mc"))
      .selectExpr("mc IS NULL", "mc.content IS NULL", "mc.n_blocks IS NULL")
      .collect()(0)
    (fused.getBoolean(0), fused.getBoolean(1), fused.getBoolean(2)) shouldBe
      ((false, true, true))
  }

  it("fused forms match chained on randomized html-fragment soup") {
    val frags = Array("<p>", "</p>", "<div id='x'>", "</div>", "<script>",
      "</script>", "<style>", "</style>", "<!--", "-->", "<a h>", "<a ",
      "</a>", "</a >", "<b>", "</b>", ">", "<", "&", "&amp;", "&lt;",
      "&nbsp;", ";", "txt", "word ", "\n", "\t", " ", " ", "x=1",
      "<li>", "<h2>", "<br>", "'", "\"", "<span", "emoji😀")
    val rnd = new scala.util.Random(1517)
    val soup = (0 until 300).map { _ =>
      val k = 1 + rnd.nextInt(40)
      (0 until k).map(_ => frags(rnd.nextInt(frags.length))).mkString
    }
    val df = parityFrames(soup)
    val gotE = df.select(Html.extractText(col("h"))).collect()
      .map(_.getString(0))
    val wantE = df.select(Html.extractTextChained(col("h"))).collect()
      .map(_.getString(0))
    gotE.zip(wantE).zipWithIndex.foreach { case ((g, w), i) =>
      withClue(s"soup #$i [${soup(i)}]: ") { g shouldBe w }
    }
    def rows(c: org.apache.spark.sql.Column) =
      df.select(c.as("mc"))
        .selectExpr("mc.content", "mc.n_blocks", "mc.n_kept")
        .collect().map(_.toString)
    val gotM = rows(Html.mainContent(col("h")))
    val wantM = rows(Html.mainContentChained(col("h")))
    gotM.zip(wantM).zipWithIndex.foreach { case ((g, w), i) =>
      withClue(s"soup #$i [${soup(i)}]: ") { g shouldBe w }
    }
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
